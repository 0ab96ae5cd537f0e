package graft

/** Recording sink for [[graft.CkptOps.ckpt]] — null (off) outside the
  * PlanSpec unpartitioned-window audit. The audit installs a buffer,
  * rebuilds every declared key in a fresh session (so SessionMemo'd
  * stages re-run their builders through the interceptor), and sweeps
  * the recorded pre-checkpoint plans alongside the key plans.
  */
object CkptAudit {
  @volatile var sink: scala.collection.mutable.Buffer[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = null
}
