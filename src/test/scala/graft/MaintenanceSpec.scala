package graft

/** Filesystem-level contract of the small-file compaction key: the
  * declared output (oracle-checked) proves CONTENT parity; this spec
  * pins the part the oracle cannot see — that the fragmented snapshot
  * really had many files per partition directory and the compacted
  * rewrite has exactly one.
  */
class MaintenanceSpec extends SparkSpec {

  private def perDir(base: java.io.File): Map[String, Int] =
    base.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      .map { p =>
        p.getName -> p.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap

  test("sink_compact_files collapses fragmented partitions to one file each") {
    val d = sf("sf0.001")
    graft.operators.Maintenance.defs("sink_compact_files")(spark, d).collect()
    val tag = graft.sources.WriteOnce.inputTag(d, "events")
    val small = new java.io.File(graft.sources.WriteOnce.dirFor(
      "/root/repo/target/tmp/compact_small", tag))
    val comp = new java.io.File(graft.sources.WriteOnce.dirFor(
      "/root/repo/target/tmp/compact_out", tag))
    val before = perDir(small)
    val after = perDir(comp)
    assert(before.keySet == after.keySet, "same partition directories")
    assert(after.values.forall(_ == 1), s"compacted to 1 file/dir: $after")
    assert(before.values.forall(_ > 1), s"fragmented input: $before")
    assert(spark.read.parquet(small.toString).count() ==
      spark.read.parquet(comp.toString).count(), "row parity")
  }
}
