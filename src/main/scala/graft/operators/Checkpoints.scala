package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for `localCheckpoint()` frames. A local checkpoint
  * persists its RDD (MEMORY_AND_DISK) with lineage truncated, and the
  * Dataset API exposes no way to release those blocks — in an iterative
  * peel or a long-lived serving session the dead generations accumulate
  * in the block manager (memory, then disk) without bound (ADVICE r11).
  * The checkpointed plan is a [[LogicalRDD]] over exactly the persisted
  * RDD, so unpersisting that RDD releases the blocks.
  *
  * Only call this when the frame is provably dead: a localCheckpoint's
  * lineage is CUT, so a post-unpersist action cannot recompute — it
  * fails. Callers therefore unpersist generation N only after
  * generation N+1 is materialized (the ktruss round loop, the serving
  * report cache). */
object Checkpoints {

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * frame. No-op on frames that are not local checkpoints. */
  def unpersist(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking); ()
      case _ => ()
    }
}
