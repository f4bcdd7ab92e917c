package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Lineage-truncating snapshots for iterative loops and read-before-mutate
 * pins, with the cluster-scale story made explicit (VERDICT r11 follow-up
 * to the despike finding):
 *
 *  - With `spark.sparkContext.setCheckpointDir(...)` configured (the
 *    cluster operating mode on a preemptible fleet), snapshots become
 *    RELIABLE checkpoints: blocks live in the checkpoint dir, so a lost
 *    executor re-reads instead of killing the job.
 *  - Without one (local runs, tests), `localCheckpoint` keeps the old
 *    executor-local behavior — correct, and fail-stop under executor
 *    loss: iterative lineage is truncated so recompute isn't possible,
 *    and the job dies rather than answering wrong.
 *
 * Callers that snapshot purely as a CACHE over intact lineage (despike's
 * input snapshot) should use `persist(MEMORY_AND_DISK)` instead — that
 * path recomputes on loss with no checkpoint dir needed.
 *
 * **Checkpoint-file retention.** Non-streaming checkpoint files are NOT
 * deleted by default; an iterative loop checkpointing once per round
 * would otherwise accumulate one full materialization per round on the
 * checkpoint filesystem for the application's life. Cluster deployments
 * that set a checkpoint dir should also set
 * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so each
 * round's files are reclaimed when its RDD goes out of scope (i.e. the
 * next round replaces it).
 */
object Snapshots {
  /** Eager snapshot that truncates lineage; reliable when a checkpoint
    * dir is configured, executor-local otherwise. */
  def truncateLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
