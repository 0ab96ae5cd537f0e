package graft

/** Dev tool: regenerate COVERAGE.md from SparkEntry (run after adding
  * keys): `sbt -batch "runMain graft.GenCoverage"`. */
object GenCoverage {
  def main(args: Array[String]): Unit = {
    val hdr = """# COVERAGE — declared query key → implementation
      |
      |Auto-generated map (SparkEntry.implementingObject) of every
      |`SparkEntry.queries` key to its implementing operator object (all under
      |`src/main/scala/graft/operators/`). Oracle = `SQL` (DuckDB-checked by the
      |driver) or `omit` (property/unit-tested; see SURVEY.md §2 notes).
      |
      || Key | Object | Oracle |
      ||---|---|---|""".stripMargin
    val rows = SparkEntry.queries.keys.toSeq.sorted.map { k =>
      val o = if (SparkEntry.oracleSql.contains(k)) "SQL" else "omit"
      s"| `$k` | `${SparkEntry.implementingObject(k)}` | $o |"
    }
    val ftr = s"""
      |
      |Total: ${rows.size} declared keys, ${rows.count(_.endsWith("| SQL |"))} oracle-checked, ${rows.count(_.endsWith("| omit |"))} oracle-omitted.
      |
      |Test-only streaming semantics (no declared key, `StreamingSpec`): watermark
      |late-data drop, within-watermark dedup, flatMapGroupsWithState running stats,
      |transformWithState (RocksDB; ValueState + MapState + processing-time TIMER
      |eviction), stream-stream join (inner + left-outer timeout),
      |file-source AvailableNow, foreachBatch idempotent sink,
      |cross-batch session merge.""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("COVERAGE.md"),
      (hdr +: rows).mkString("", "\n", ftr + "\n"))
    println(s"${rows.size} keys")
  }
}
