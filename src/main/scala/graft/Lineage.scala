package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Lineage truncation with a reliability switch.
  *
  * Iterative jobs (BlockLU's q-step factorization, P5's label
  * propagation) must cut lineage each round or the DAG grows without
  * bound (SURVEY.md §7 hazard #1). `localCheckpoint` does that at
  * memory speed but stores the truncated blocks only in executor
  * storage — on a real cluster, losing an executor (preemption,
  * dynamic allocation) makes them unrecomputable and fails the job.
  * When the user has called `sc.setCheckpointDir(...)`, these helpers
  * switch to RELIABLE checkpointing (HDFS/object-store-backed, the
  * Spark analog of the reference's per-level HDFS materialization,
  * /root/reference/Matrix/LUDecomposition.java:148-150); otherwise
  * they keep the fast local default.
  */
object Lineage {

  /** Truncate an RDD's lineage in place: reliable checkpoint when the
    * context has a checkpoint dir, else local checkpoint. Call BEFORE
    * the materializing action, and pair with `persist()` so the
    * reliable write reads cached blocks instead of recomputing. */
  def truncate[T](rdd: RDD[T]): rdd.type = {
    if (rdd.sparkContext.getCheckpointDir.isDefined) rdd.checkpoint()
    else rdd.localCheckpoint()
    rdd
  }

  /** DataFrame form — eager in both modes (returns the truncated frame;
    * unlike the RDD form, `DataFrame.checkpoint` is not in-place). */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
