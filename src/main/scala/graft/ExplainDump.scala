package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for declared keys to files — the
  * optimization rounds' plan-evidence tool (plans/rNN/<key>_before/
  * after.txt). Usage:
  *   runMain graft.ExplainDump <sfDir> <outDir> <suffix> [keySubstrings]
  * e.g. runMain graft.ExplainDump /root/testdata/sf0.1 plans/r18 before louvain,hnsw
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val filter = if (args.length > 3)
      args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val keys = SparkEntry.queries.toSeq.filter { case (n, _) =>
      filter.isEmpty || filter.exists(n.contains) }
    for ((name, fn) <- keys) {
      try {
        // Record the pre-checkpoint optimized plans of every ckpt'd
        // stage too — declared keys truncate at LogicalRDD, which
        // hides exactly the stages optimization rounds change.
        val rec = scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]()
        CkptAudit.sink = rec
        val df = try fn(spark, sfDir) finally CkptAudit.sink = null
        val txt = df.queryExecution.explainString(FormattedMode)
        val stages = rec.zipWithIndex.map { case (p, i) =>
          s"=== checkpointed stage $i (optimized logical) ===\n$p" }
          .mkString("\n")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          (txt + (if (stages.nonEmpty) s"\n\n$stages" else ""))
            .getBytes("UTF-8"))
        println(s"wrote $outDir/${name}_$suffix.txt (${rec.size} stages)")
      } catch { case e: Throwable =>
        println(s"FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
