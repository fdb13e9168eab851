package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust outlier detection over a keyed numeric stream — the data-quality
  * gate an event/metric pipeline runs before training on or alerting over
  * a value column. Mean/stddev z-scores break down exactly when needed
  * most (the outliers drag the mean); the robust form scores against the
  * MEDIAN and the median absolute deviation (MAD), whose breakdown point
  * is 50% — half the data can be corrupt before the gate moves
  * (Iglewicz & Hoaglin 1993, the modified z-score M = 0.6745·(x−med)/MAD).
  *
  * Shape at 100 TB: two aggregations over the value column grouped by the
  * key (exact `percentile` — switch to `percentile_approx` for sketch-
  * mergeable single-pass medians when the per-key value sets stop fitting
  * an aggregation buffer), each producing a KEY-CARDINALITY-sized table
  * that broadcast-joins back to the stream; the flagging pass itself is a
  * narrow codegen filter. No shuffle touches the full rows.
  *
  * Keys whose MAD is 0 (over half the values identical) yield no flags —
  * the modified z-score is undefined there, and "the majority value" is
  * the wrong thing to flag. Output: (key, id, value, mz) for |M| > cut.
  *
  * mz is emitted UNROUNDED, deliberately: median and MAD are order
  * statistics (no accumulation-order divergence — an external engine
  * computing the same interpolated percentile gets the bit-identical
  * double), and the score is one fixed-order IEEE expression on top, so
  * the raw double is cross-engine stable. Rounding would make it LESS
  * stable: the 2-decimal inputs park many scores exactly on decimal
  * half-boundaries, where different engines' rounding implementations
  * (BigDecimal HALF_UP vs scale-multiply-round) legitimately disagree
  * about the same double. */
object Outliers {

  /** Per-key (median, MAD) threshold table — the trained state of the
    * gate. KEY-CARDINALITY-sized output; computed over a batch (or a
    * representative history window) and handed to [[flagsWith]], which is
    * where the streaming twin comes from: percentiles are a stateful
    * aggregation a stream cannot run, but a trained threshold table
    * applied per-row is stateless. */
  def thresholds(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(percentile(col(valCol), lit(0.5)).as("_med"))
    df.join(broadcast(med), Seq(keyCol))
      .groupBy(col(keyCol), col("_med"))
      .agg(percentile(abs(col(valCol) - col("_med")), lit(0.5)).as("_mad"))
  }

  /** Flag rows against a pre-trained [[thresholds]] table: broadcast join
    * + narrow codegen filter — stateless, so `data` may be a STREAMING
    * DataFrame (score live events against batch-trained thresholds, the
    * standard deploy shape) or the training batch itself (then ≡
    * [[robustFlags]], pinned in Round8OpsSuite). */
  def flagsWith(data: DataFrame, thresholds: DataFrame, keyCol: String,
      idCol: String, valCol: String, cut: Double = 3.5): DataFrame = {
    val mz = lit(0.6745) * (col(valCol) - col("_med")) / col("_mad")
    data.join(broadcast(thresholds), Seq(keyCol))
      .filter(col("_mad") > 0 && abs(mz) > cut)
      .select(col(keyCol), col(idCol), col(valCol), mz.as("mz"))
  }

  def robustFlags(df: DataFrame, keyCol: String, idCol: String,
      valCol: String, cut: Double = 3.5): DataFrame =
    flagsWith(df, thresholds(df, keyCol, valCol), keyCol, idCol, valCol, cut)
}
