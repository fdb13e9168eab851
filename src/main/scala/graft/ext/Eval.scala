package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators — the audit side of every model gate in
  * the curation pipelines ([[TextAnalysis.nbQualityScore]], the
  * `trainingMix` classifier gate): threshold sweeps and ranking quality,
  * computed exactly.
  *
  * Scale discipline: both operators first collapse the corpus to ONE row
  * per distinct score (map-side-combined groupBy — scores are rounded by
  * the scorer, so this table is bounded by score granularity, not corpus
  * size), then run the order-statistic window over that aggregate. The
  * single-partition window is over the per-score table only; the corpus
  * itself never globally sorts.
  */
object Eval {

  /** PRECISION/RECALL CURVE: one row per distinct score, classifying
    * `score >= threshold` as positive. `tp`/`fp` are running totals down
    * the score-descending sweep; precision and recall are emitted as
    * unrounded integer-ratio doubles (exact divisions — bit-identical in
    * any engine). `labelCol` must be 0/1. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("threshold"))
      .agg(sum(col(labelCol)).cast("long").as("npos"),
        count(lit(1)).as("n"))
    val totPos = sum(col("npos")).over(Window.partitionBy())
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("tp", sum(col("npos")).over(w))
      .withColumn("fp", sum(col("n") - col("npos")).over(w))
      .withColumn("p_total", totPos)
      .select(col("threshold"), col("tp"), col("fp"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        // all-negative corpus: recall is undefined (NULL), not a fault —
        // ANSI mode would raise on the 0 divisor otherwise
        when(col("p_total") > 0,
          col("tp").cast("double") / col("p_total").cast("double"))
          .as("recall"))
  }

  /** Empirical-CDF (percentile-rank) TRANSFORM with the mid-rank tie
    * convention: `ecdf(x) = (#below + #equal/2) / N` — the rank
    * normalization that puts heterogeneous quality signals on one [0, 1]
    * scale before blending (a weighted sum of raw scores is dominated by
    * whichever signal has the widest units; percentile ranks are
    * unit-free). Ties take the group midpoint — the same convention as
    * [[aucRoc]]'s average ranks.
    *
    * Every term is an exact 0.5-multiple over an exact total, so the
    * unrounded output is bit-identical across engines. The per-score
    * table (bounded by score granularity) carries the window; the corpus
    * pays one groupBy and one score-keyed join back. */
  def ecdf(df: DataFrame, scoreCol: String,
      outCol: String = "pct"): DataFrame =
    // LEFT join: a NULL score has no rank — the row survives with NULL
    // pct instead of silently vanishing from the output
    df.join(ecdfTable(df, scoreCol, outCol), Seq(scoreCol), "left")

  /** [[ecdf]]'s (score → percentile) side table alone — join it back
    * yourself when composing several rank transforms over one scored
    * projection ([[blend]] does): `df.join(table)` inside [[ecdf]]
    * references `df` twice, so CHAINING k ecdf calls re-evaluates the
    * upstream scoring projection ~2^k times (measured 2× per level on
    * the regex-heavy quality signals). Building the k tables from the
    * ORIGINAL frame and joining them in one chain keeps it at one full
    * evaluation plus k column-pruned ones. */
  def ecdfTable(df: DataFrame, scoreCol: String,
      outCol: String = "pct"): DataFrame = {
    // NULL scores are excluded from the ranking AND the total — they
    // can't equi-join back anyway, and counting them in N would skew
    // every surviving row's percentile
    val per = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol)).agg(count(lit(1)).as("_n"))
    val w = Window.orderBy(col(scoreCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("_cum", sum(col("_n")).over(w))
      .withColumn("_tot", sum(col("_n")).over(Window.partitionBy()))
      .withColumn(outCol,
        ((col("_cum") - col("_n")).cast("double") +
          col("_n").cast("double") / lit(2.0)) / col("_tot").cast("double"))
      .select(col(scoreCol), col(outCol))
  }

  /** Per-class PRECISION/RECALL/F1 from the confusion matrix — the eval
    * companion to a k-way classifier ([[TextAnalysis.nbMulticlass]]).
    * The class list is the TRUE label set; a class never predicted gets
    * NULL precision/F1 (not 0 — "undefined" and "bad" are different
    * audit outcomes). Metrics are unrounded integer-ratio doubles; F1 is
    * the one fixed form `2·p·r / (p + r)`.
    *
    * Shape at 100 TB: the corpus collapses to the k²-row confusion
    * matrix map-side; every downstream join/aggregate runs on that. */
  def classMetrics(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val cm = df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val byLabel = cm.groupBy(col("label")).agg(sum("n").as("n_label"))
    val byPred = cm.groupBy(col("pred")).agg(sum("n").as("n_pred"))
    val tp = cm.filter(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val p = col("tp").cast("double") / col("n_pred").cast("double")
    val r = col("tp").cast("double") / col("n_label").cast("double")
    byLabel.select(col("label").as("cls"), col("n_label"))
      .join(byPred.select(col("pred").as("cls"), col("n_pred")),
        Seq("cls"), "left")
      .join(tp, Seq("cls"), "left")
      .na.fill(0L, Seq("n_pred", "tp"))
      .withColumn("precision", when(col("n_pred") > 0, p))
      .withColumn("recall", r)
      .withColumn("f1",
        when(col("n_pred") > 0 && (p + r) > 0,
          lit(2.0) * p * r / (p + r)))
      .select("cls", "n_label", "n_pred", "tp",
        "precision", "recall", "f1")
  }

  /** COHEN'S KAPPA — chance-corrected agreement between two raters
    * (e.g. two quality gates): `κ = (p_o − p_e) / (1 − p_e)`. The
    * expected agreement is computed from the EXACT integer sum
    * `Σ_c n_a(c)·n_b(c)` (order-free) over N², so the unrounded double
    * is engine-identical. Guard: the product sum overflows int64 past
    * ~3·10⁹ rows — aggregate per-partition or switch the marginals to
    * doubles at that scale (ANSI mode faults loudly, never wraps).
    * Returns one row: (n, p_o, p_e, kappa). */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cm = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val marg = cm.groupBy(col("a")).agg(sum("n").as("na"))
      .join(cm.groupBy(col("b")).agg(sum("n").as("nb")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("prod"))
    val agree = cm.filter(col("a") === col("b"))
      .agg(coalesce(sum("n"), lit(0L)).as("n_agree"))
    val total = cm.agg(sum("n").as("n_total"))
    val po = col("n_agree").cast("double") / col("n_total").cast("double")
    val pe = col("prod").cast("double") /
      (col("n_total").cast("double") * col("n_total").cast("double"))
    agree.crossJoin(total).crossJoin(marg)
      .select(col("n_total").as("n"), po.as("p_o"), pe.as("p_e"),
        // both raters constant and agreeing → p_e = 1 → 0/0; kappa is
        // undefined there (NULL), matching classMetrics/aucRocBy's
        // degenerate-input convention rather than an ANSI fault
        when(pe < 1.0, (po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** CALIBRATION (reliability) BINS: log-odds scores map through the
    * sigmoid to probabilities, bin on the 6 dp-ROUNDED probability
    * (engine-stable bin edges — the PSI discipline), and each bin
    * reports observed positive rate vs mean stated confidence. A gate
    * can rank perfectly (AUC 1) and still lie about its probabilities;
    * this is the audit that catches it. `pos_rate` is an exact integer
    * ratio (unrounded); `mean_conf` averages rounded values and rounds
    * at 6 dp (summation-order grain).
    *
    * One corpus pass with map-side combine into nBins rows. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0)
    val prob = round(lit(1.0) / (lit(1.0) + exp(-col(scoreCol))), 6)
    df.select(prob.as("p"), col(labelCol).cast("long").as("y"))
      .withColumn("bin",
        least(floor(col("p") * nBins).cast("int"), lit(nBins - 1)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("p")), 6).as("mean_conf"),
        (sum(col("y")).cast("double") / count(lit(1)).cast("double"))
          .as("pos_rate"))
  }

  /** GROUP-SLICED ROC-AUC — [[aucRoc]] per `groupCol` slice (per
    * language, per source, per cohort): the fairness/robustness view a
    * single corpus-level AUC hides (a gate can rank well globally and
    * invert on one language). Same exact Mann–Whitney arithmetic; a
    * slice missing a class gets NULL auc (undefined, not 0.5).
    *
    * Scale note: unlike the global [[aucRoc]] (whose order-statistic
    * window is single-partition over the per-score table), every stage
    * here keys on the group — the rank window partitions by slice, so
    * parallelism grows with slice count. */
  def aucRocBy(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol).as("g"), col(scoreCol).as("s"))
      .agg(sum(col(labelCol)).cast("long").as("npos"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = per
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("avg_rank",
        (col("cum") - col("n")).cast("double") +
          (col("n") + lit(1L)).cast("double") / lit(2.0))
    val auc =
      (col("prs") -
        (col("n_pos").cast("double") * (col("n_pos") + lit(1L)).cast("double"))
          / lit(2.0)) /
        (col("n_pos").cast("double") * col("n_neg").cast("double"))
    ranked.groupBy(col("g"))
      .agg(sum(col("npos").cast("double") * col("avg_rank")).as("prs"),
        sum(col("npos")).cast("long").as("n_pos"),
        sum(col("n") - col("npos")).cast("long").as("n_neg"))
      .select(col("g").as(groupCol),
        when(col("n_pos") > 0 && col("n_neg") > 0, auc).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** COMPOSITE signal BLEND: each score column rank-normalizes through
    * [[ecdf]] and the weighted left-associated sum becomes `outCol` —
    * the unit-free way to combine heterogeneous quality signals (a
    * weighted sum of RAW scores is dominated by whichever signal has the
    * widest numeric range; percentile ranks weight signals by what the
    * weights say). Weights are applied in the given order with one fixed
    * expression shape, so the result is reproducible bit-for-bit.
    *
    * Shape: one per-score aggregate + score-keyed join back per signal —
    * k bounded side tables, the corpus never sorts. */
  def blend(df: DataFrame, weights: Seq[(String, Double)],
      outCol: String = "blended"): DataFrame = {
    require(weights.nonEmpty, "need at least one (scoreCol, weight)")
    // every rank table derives from the ORIGINAL frame (not the running
    // join), so the scoring projection evaluates once full-width plus
    // one column-pruned pass per signal — never 2^k times (see
    // [[ecdfTable]])
    // LEFT joins, matching [[ecdf]]'s convention: a row with a NULL in
    // any signal column survives with NULL `outCol` (the weighted sum
    // propagates the NULL) instead of silently vanishing
    val withPcts = weights.zipWithIndex.foldLeft(df) {
      case (acc, ((c, _), i)) =>
        acc.join(ecdfTable(df, c, s"_p$i"), Seq(c), "left")
    }
    val expr = weights.zipWithIndex
      .map { case ((_, w), i) => lit(w) * col(s"_p$i") }
      .reduce(_ + _)
    weights.indices.foldLeft(withPcts.withColumn(outCol, expr)) {
      (d, i) => d.drop(s"_p$i")
    }
  }

  /** [[blend]]'s SHARED-SCAN form for a unique-keyed frame: the scoring
    * projection — typically the expensive part (regex-heavy quality
    * signals) — evaluates exactly ONCE. Each row explodes into
    * (signal, value) pairs; one (signal, value)-keyed aggregate replaces
    * the k per-signal aggregates, the mid-rank window partitions by
    * signal, ranks join back on (signal, value), and a final pivot on
    * `idCol` reassembles (id, signals..., outCol). [[blend]] instead
    * re-evaluates `df` once full-width plus once column-pruned per
    * signal (k+1 scans) — at corpus scale the scan dominates, so this
    * shape is the one a 100 TB blend runs. Same arithmetic as [[ecdf]]
    * (exact 0.5-multiples over exact totals, NULL signals rank as NULL
    * and the row survives with NULL `outCol`); same left-assoc weighted
    * sum, so results are bit-identical with [[blend]]'s.
    *
    * Requires `idCol` unique (the pivot reassembles one row per id) and
    * returns only (idCol, signal columns, outCol) — callers needing other
    * columns join back on the id. */
  def blendKeyed(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)],
      outCol: String = "blended"): DataFrame = {
    require(weights.nonEmpty, "need at least one (scoreCol, weight)")
    val sigs = weights.map(_._1)
    val exploded = df.select(col(idCol).as("_id"),
      posexplode(array(sigs.map(c => col(c).cast("double")): _*))
        .as(Seq("_sig", "_v")))
    val per = exploded.filter(col("_v").isNotNull)
      .groupBy(col("_sig"), col("_v")).agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(col("_sig")).orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val table = per
      .withColumn("_cum", sum(col("_n")).over(w))
      .withColumn("_tot",
        sum(col("_n")).over(Window.partitionBy(col("_sig"))))
      .withColumn("_p",
        ((col("_cum") - col("_n")).cast("double") +
          col("_n").cast("double") / lit(2.0)) / col("_tot").cast("double"))
      .select(col("_sig"), col("_v"), col("_p"))
    val ranked = exploded.join(table, Seq("_sig", "_v"), "left")
    val vCols = sigs.indices.map(i =>
      max(when(col("_sig") === i, col("_v"))).as(s"_v$i"))
    val pCols = sigs.indices.map(i =>
      max(when(col("_sig") === i, col("_p"))).as(s"_p$i"))
    val expr = weights.zipWithIndex
      .map { case ((_, wt), i) => lit(wt) * col(s"_p$i") }
      .reduce(_ + _)
    ranked.groupBy(col("_id"))
      .agg((vCols ++ pCols).head, (vCols ++ pCols).tail: _*)
      .select(col("_id").as(idCol) +:
        sigs.zipWithIndex.map { case (c, i) => col(s"_v$i").as(c) } :+
        expr.as(outCol): _*)
  }

  /** ROC-AUC, exactly, as the Mann–Whitney rank statistic: the
    * probability a random positive outranks a random negative, ties at
    * half credit. Tie groups take their AVERAGE rank
    * (`ranks_below + (n+1)/2`), so every per-group term `npos · avgRank`
    * is an exact multiple of 0.5 — partial sums stay exact in doubles
    * (below 2⁵³), which makes the aggregation order-independent and the
    * unrounded result bit-identical across engines.
    * Returns one row: (auc, n_pos, n_neg). */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("s"))
      .agg(sum(col(labelCol)).cast("long").as("npos"),
        count(lit(1)).as("n"))
    val w = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perScore
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("avg_rank",
        (col("cum") - col("n")).cast("double") +
          (col("n") + lit(1L)).cast("double") / lit(2.0))
    ranked.agg(
        sum(col("npos").cast("double") * col("avg_rank")).as("pos_rank_sum"),
        sum(col("npos")).cast("long").as("n_pos"),
        sum(col("n") - col("npos")).cast("long").as("n_neg"))
      .select(
        // single-class input → AUC undefined (NULL), same guard as
        // aucRocBy — not an ANSI divide-by-zero fault
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("pos_rank_sum") -
            (col("n_pos").cast("double") * (col("n_pos") + lit(1L)).cast("double"))
              / lit(2.0)) /
            (col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"),
        col("n_pos"), col("n_neg"))
  }
}
