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
    * frame. No-op on frames that are not local checkpoints.
    *
    * Spark's `RDD.unpersist` WARNs on every locally-checkpointed RDD
    * ("lineage has been truncated and cannot be recomputed") — correct
    * in general, but here the caller's contract above IS the proof the
    * release is safe, and an iterative peel emits the warning every
    * round, burying real warnings (VERDICT r12). The specific RDD
    * class's logger is therefore lowered to ERROR for exactly the
    * unpersist call and restored after; the window is narrow enough
    * that suppressing an unrelated same-class warning in another
    * thread is a theoretical, accepted trade. */
  def unpersist(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        quietly(lr.rdd.getClass.getName) { lr.rdd.unpersist(blocking) }; ()
      case _ => ()
    }

  // serialize the save/lower/restore sequence: two concurrent callers
  // would otherwise interleave as A-saves-WARN, B-saves-ERROR,
  // A-restores-WARN, B-"restores"-ERROR — pinning the class logger at
  // ERROR for the JVM's lifetime (r13 review find). unpersist itself is
  // cheap, so the lock costs nothing measurable.
  private val quietLock = new Object
  private def quietly[T](loggerName: String)(body: => T): T =
    quietLock.synchronized {
      val restore: Option[() => Unit] =
        try {
          import org.apache.logging.log4j.{Level, LogManager}
          import org.apache.logging.log4j.core.config.Configurator
          val prev = LogManager.getLogger(loggerName).getLevel
          Configurator.setLevel(loggerName, Level.ERROR)
          Some(() => Configurator.setLevel(loggerName, prev))
        } catch { // not the log4j2 backend: keep the warning, stay correct
          case _: Throwable => None
        }
      try body finally restore.foreach(_.apply())
    }
}
