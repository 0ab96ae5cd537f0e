import org.apache.spark.sql.DataFrame

/** Package-level helpers — consumers `import graft.CkptOps`. */
package object graft {

  /** Checkpoint interceptor (PlanSpec's window-audit hook — VERDICT
    * r15 "what's wrong" #1): `df.ckpt()` behaves exactly like
    * `df.localCheckpoint()`, but when the audit enables recording it
    * first captures the PRE-checkpoint optimized logical plan, so
    * windows INSIDE checkpointed stages stay visible to the
    * mechanical unpartitioned-window sweep (localCheckpoint truncates
    * lineage, which was the sweep's one blind spot). Recording off —
    * the production state — costs one null check.
    */
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = {
      val rec = CkptAudit.sink
      if (rec ne null) rec.synchronized {
        rec += df.queryExecution.optimizedPlan
      }
      df.localCheckpoint()
    }
  }
}
