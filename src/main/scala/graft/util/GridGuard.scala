package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{approx_count_distinct, col}

/** Runtime enforcement of the rank/ECDF/KS GRID DISCIPLINE.
  *
  * The rank-statistic family ([[graft.ext.Eval.ksTest]], `ksTestBy`,
  * `rankSumTest`, `quantileNormalize`, `mutualInfo`, `spearman`,
  * `prCurve`, `aucRoc`, `ecdfTable` — and through the last, `ecdf`,
  * `blend` and `Outliers.discretize`; `Outliers.chiSquareDrift` for
  * categories) collapses the corpus to a
  * per-distinct-value table and runs an order-statistic window over it.
  * That shape is 100 TB-safe ONLY while the distinct-value table is bounded
  * by score GRANULARITY (rounded scores, counts) rather than corpus size:
  * feed raw continuous doubles and the "bounded" table approaches corpus
  * size, at which point the single-partition `Window.orderBy` cumulative
  * becomes a one-task sort of the corpus — a real scale-killer that, before
  * this guard, was prevented only by a doc comment.
  *
  * The guard is ON by default (the [[graft.ext.Dedup]] hot-bucket-cap
  * posture: scale protections default-on, opt-out by conf): a cheap
  * `approx_count_distinct` pre-check (map-side HLL, one column-pruned pass;
  * ~5% relative error, fine for a threshold comparison) runs against
  * `graft.grid.maxDistinct` (default 10⁶ — the grain of a 6 dp-rounded
  * [0, 1] score) and FAILS LOUDLY with a "round your scores" remedy before
  * any corpus-sized grid is built. Cost note: the pre-check re-evaluates
  * the guarded column's projection once — operators whose input is already
  * pinned run it on the materialized pin, others pay one narrow scan;
  * sessions that have validated their scorer's grain can switch the guard
  * off (`graft.grid.guard=false`) or raise the ceiling. */
object GridGuard {
  /** Session conf: distinct-value ceiling per guarded column (long). */
  val MaxDistinctConf = "graft.grid.maxDistinct"

  /** Session conf: set "false" to skip the pre-check entirely. */
  val EnabledConf = "graft.grid.guard"

  val DefaultMaxDistinct = 1000000L

  /** The ceiling as a HARD CAP for windowed-drift aggregate state
    * ([[graft.agg.KsDriftAgg]] and siblings): unbounded when the guard is
    * conf'd off, else the conf'd (or default) distinct-value ceiling. */
  def streamStateCap(spark: org.apache.spark.sql.SparkSession): Long = {
    val conf = spark.conf
    if (!conf.getOption(EnabledConf).forall(_.toBoolean)) Long.MaxValue
    else conf.getOption(MaxDistinctConf).map(_.toLong)
      .getOrElse(DefaultMaxDistinct)
  }

  /** Pre-check `cols`' approximate distinct counts on `df`; throws
    * `IllegalArgumentException` naming the operator, column, estimate and
    * remedy when any exceeds the ceiling. One aggregation pass covers all
    * requested columns. */
  def check(df: DataFrame, op: String, cols: String*): Unit = {
    val conf = df.sparkSession.conf
    if (!conf.getOption(EnabledConf).forall(_.toBoolean)) return
    val cap = conf.getOption(MaxDistinctConf).map(_.toLong)
      .getOrElse(DefaultMaxDistinct)
    val aggs = cols.map(c => approx_count_distinct(col(c)).as(s"_g_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      val est = row.getLong(i)
      require(est <= cap,
        s"$op: column '$c' has ~$est distinct values, over " +
          s"$MaxDistinctConf=$cap. The per-value grid would approach " +
          "corpus size and its single-partition rank window would become " +
          "a one-task sort of the corpus. Feed scores ROUNDED to a " +
          "bounded granularity (e.g. round(score, 6)), raise " +
          s"$MaxDistinctConf, or set $EnabledConf=false if the grain is " +
          "already validated.")
    }
  }
}
