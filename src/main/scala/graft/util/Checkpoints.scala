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
  /** Session conf key: when set to a path (HDFS/S3/local dir), iterative
    * operators pin each round with a RELIABLE `checkpoint()` against it
    * instead of `localCheckpoint`. */
  val DirConf = "graft.checkpoint.dir"

  /** Truncate lineage for an iterative round — the per-round fixpoint of
    * pageRank / labelPropagation / bfsHops / distributed
    * connected-components.
    *
    * `localCheckpoint` (the default) materializes to EXECUTOR storage:
    * fastest, but on a real cluster an executor loss makes the truncated
    * lineage non-recomputable and kills the job — acceptable for a
    * local[32] bench, not for a 100 TB PageRank hours into its rounds.
    * Setting `graft.checkpoint.dir` switches every round to a reliable
    * `checkpoint()` against that path (first use wires it into
    * `SparkContext.setCheckpointDir` if unset), which survives executor
    * loss at the price of a write to shared storage per round. Both
    * paths produce identical results (suite-pinned). */
  def pin[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        ds.checkpoint(eager = eager)
      case None => ds.localCheckpoint(eager = eager)
    }
  }

  /** `ds.pin()` syntax for [[pin]] — reads like the `localCheckpoint`
    * call it replaces at every iterative round site. */
  implicit class PinOps[T](private val ds: Dataset[T]) {
    def pin(eager: Boolean = true): Dataset[T] = Checkpoints.pin(ds, eager)
  }

  /** Drop the blocks behind every checkpointed leaf of `ds`'s plan. Safe
    * ONLY once nothing will read the frame again: checkpoint lineage is
    * truncated, so released blocks cannot be recomputed. (For reliable
    * checkpoints this releases the block-manager copy; the files under
    * `graft.checkpoint.dir` are reclaimed by the context cleaner or the
    * job's dir cleanup, not here.) */
  def release(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
