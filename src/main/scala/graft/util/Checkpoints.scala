package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint` storage.
  *
  * `Dataset.unpersist` is a no-op for checkpointed frames — the blocks
  * belong to the materialized RDD, not the CacheManager — so without an
  * explicit release they pin block-manager storage until the frame is
  * garbage-collected, which in a long-lived 100 TB pipeline session means
  * unbounded accumulation (and, in the bench, cleanup storms that landed on
  * unrelated queries). Operators that checkpoint internally call
  * [[Checkpoints.release]] at their natural completion point (a driver
  * collect, the next round's materialization). */
object Checkpoints {
  /** Drop the blocks behind every checkpointed leaf of `ds`'s plan. Safe
    * ONLY once nothing will read the frame again: checkpoint lineage is
    * truncated, so released blocks cannot be recomputed. */
  def release(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
