package graft

/** The driver's t1 smoke gate, pinned locally: `entry` must return
  * rows on sf0.001.
  */
class EntrySpec extends SparkSpec {
  test("flagship entry returns rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 4, "one shard summary row per IVF cluster")
    assert(rows.map(_.getAs[Long]("n_vectors")).sum === 500L,
      "every surviving vector lands in exactly one shard")
  }

  test("every declared key has a runnable query and every oracle key is declared") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    assert(qs.size >= 100)
  }

  test("COVERAGE.md matches the declared key set (regen: runMain graft.GenCoverage)") {
    val keyRow = "^\\| `([a-z0-9_]+)` \\|.*".r
    val documented = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").getLines()
      .collect { case keyRow(k) => k }.toSet - "Key"
    val declared = SparkEntry.queries.keySet
    assert(documented === declared,
      s"COVERAGE.md is stale — missing: ${declared -- documented}, " +
        s"extra: ${documented -- declared}")
  }
}
