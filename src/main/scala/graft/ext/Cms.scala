package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) expressed RELATIONALLY:
  * the sketch is its d×w cell table, built by one hash-explode +
  * `groupBy(j, bucket)` whose partial aggregation collapses map-side to at
  * most d·w groups PER PARTITION — the fixed-memory guarantee of the
  * sketch, delivered by Catalyst's existing hash aggregate instead of an
  * imperative buffer. The final shuffle moves ≤ d·w·partitions tiny rows
  * no matter how many corpus tokens fed it; probing and inner products
  * then broadcast-join the ≤ d·w-row cell table.
  *
  * Why this beats Spark's built-in `count_min_sketch` aggregate here: the
  * hash family is the repo's md5-prefix scheme, so every cell — and every
  * estimate — is replayable bit-for-bit by an external SQL engine (the
  * oracle discipline), and the cell table is a plain DataFrame that can be
  * persisted, unioned (sketch merge = cell-wise sum), or diffed like any
  * other relation.
  *
  * Guarantees (ε = e/w, δ = e^−d): estimate ≥ true count always;
  * ≤ true + ε·N with probability 1 − δ. */
object Cms {

  /** Row j's bucket for `key`: first 15 md5 hex chars of "j:key" as a
    * 60-bit integer, mod `width` — the engine-portable hash family used
    * across the dedup stack. */
  def bucket(j: Int, key: Column, width: Int): Column = {
    require(width > 0, s"CMS width must be positive, got $width")
    conv(substring(md5(concat(lit(j.toString + ":"), key)), 1, 15), 16, 10)
      .cast("long") % width
  }

  private def explodeBuckets(key: Column, depth: Int, width: Int) =
    posexplode(array((0 until depth).map(j => bucket(j, key, width)): _*))

  /** Build the d×w cell table `(j, b, cell)` over a key column. One scan,
    * map-side collapse to ≤ d·w cells, one tiny shuffle. Merge two
    * sketches by unioning cell tables and re-summing. */
  def cells(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame =
    df.select(explodeBuckets(col(keyCol), depth, width).as(Seq("j", "b")))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cell"))

  /** Point estimates for `probes`: min over the d rows of each probe's
    * cells (absent cell = 0). The cell table broadcasts — a probe batch
    * never shuffles. */
  def estimates(cellTable: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame =
    probes.select(col(keyCol),
        explodeBuckets(col(keyCol), depth, width).as(Seq("j", "b")))
      .join(broadcast(cellTable), Seq("j", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cell"), lit(0L))).as("est"))

  /** Windowed cell table — the SAME call runs batch or Structured
    * Streaming (add `withWatermark` upstream on a stream): per event-time
    * window the aggregation state is AT MOST d·w cells no matter how many
    * distinct keys flow through — the fixed-state property
    * [[graft.streaming.EventStream.hotValues]] (Misra–Gries) provides for
    * heavy keys, extended here to point-estimates of ANY key. Partial
    * aggregation per micro-batch is exactly the sketch's cell-wise merge. */
  def cellsWindowed(df: DataFrame, keyCol: String, tsCol: String = "ts",
      dur: String = "1 hour", depth: Int = 4,
      width: Int = 1024): DataFrame =
    df.select(col(tsCol),
        explodeBuckets(col(keyCol), depth, width).as(Seq("j", "b")))
      .groupBy(window(col(tsCol), dur), col("j"), col("b"))
      .agg(count(lit(1)).as("cell"))
      .select(col("window.start").as("ws"), col("j"), col("b"), col("cell"))

  /** Join-size / inner-product estimate between two sketched key columns:
    * min over j of Σ_b cellA·cellB (Cormode & Muthukrishnan §4.2) — an
    * upper-biased estimate of Σ_key cntA(key)·cntB(key), i.e. the exact
    * row count of the equi-join A ⋈ B on the key. THE cardinality
    * estimator for planning a 100 TB join without scanning either side:
    * both inputs collapse to d·w cells first, the product runs on cells
    * only. Output: one row (est_join_size). */
  def innerProduct(cellsA: DataFrame, cellsB: DataFrame): DataFrame =
    cellsA.join(cellsB.select(col("j"), col("b"),
        col("cell").as("cell_b")), Seq("j", "b"))
      .groupBy(col("j"))
      .agg(sum(col("cell") * col("cell_b")).as("dot"))
      .agg(min(col("dot")).as("est_join_size"))
}
