package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * Everything here derives from a content hash, not an RNG: the same
  * (id, salt) always lands in the same sample/split, on any cluster, at
  * any parallelism, on any engine that can compute md5 — the property a
  * training pipeline needs for reproducible corpus builds, leak-free
  * train/val/test separation, and incremental re-runs (new rows join the
  * right split without reshuffling old ones). `rand()`-based sampling
  * guarantees none of that.
  *
  * Scale shapes: [[hashFraction]] and [[hashSplit]] are narrow codegen
  * filters/projections — no shuffle, no state, 100 TB-indifferent.
  * [[stratifiedSampleN]] shuffles on the strata key; Spark's
  * WindowGroupLimit pushes the `rank <= n` cut into each partition before
  * the final merge, so per-stratum cost is a partial top-n, not a full
  * sort.
  */
object Sampling {

  /** Sample space: 16^15 = 2^60 (15 md5 hex chars — exact in a signed
    * long, and the same parse both Spark's `conv` and DuckDB's UBIGINT
    * cast produce). */
  val Space: Long = 1L << 60

  /** Uniform bucket in [0, 2^60) from (salt, id) — the single source of
    * determinism for every op here. */
  def hashBucket(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Keep each row iff its bucket falls below `fraction` of the space.
    * Deterministic in (idCol, salt): re-runs and late-arriving data agree. */
  def hashFraction(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    df.filter(hashBucket(col(idCol), salt) < (fraction * Space).toLong)
  }

  /** Cumulative bucket thresholds for `weights` — public so an external
    * checker (e.g. a SQL oracle) can reproduce the exact split boundaries
    * from one source of truth. */
  def thresholds(weights: Seq[Double]): Seq[Long] = {
    require(weights.nonEmpty && weights.forall(_ >= 0) && weights.sum > 0,
      s"bad weights $weights")
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail.map(c => (c / total * Space).toLong)
  }

  /** Assign a split index 0..weights.size-1 (train/val/test …) by bucket
    * thresholds at the cumulative weight boundaries. Weights are
    * normalized; determinism as above — a document NEVER migrates between
    * splits across runs, the leak-safety property. */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[Double],
      salt: String = "", splitCol: String = "split"): DataFrame = {
    val th = thresholds(weights)
    val b = hashBucket(col(idCol), salt)
    val assign = th.init.zipWithIndex.foldRight(
        lit(th.size - 1): Column) { case ((t, i), acc) =>
      when(b < t, lit(i)).otherwise(acc)
    }
    df.withColumn(splitCol, assign)
  }

  /** Deterministic weighted corpus mixture: sample each source at the
    * rate that makes the output approximate `totalRows` rows in the
    * proportions of `weights` ("60% web, 30% wiki, 10% books"). Sources
    * absent from `weights` are dropped; a source too small for its target
    * share contributes everything it has (rate caps at 1 — the output is
    * then short, never reweighted silently). One count aggregation to
    * size the rates, then a shuffle-free [[hashBucket]] filter —
    * deterministic in (idCol, salt) like every op here, so a mixture is
    * exactly reproducible given the same corpus.
    *
    * Rate arithmetic is plain IEEE doubles in a fixed evaluation order
    * (weight/Σweights*totalRows/count, floor to the bucket space) so an
    * external SQL checker reproduces the exact cut. */
  def mixture(df: DataFrame, sourceCol: String, weights: Map[String, Double],
      totalRows: Long, idCol: String, salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, s"bad weights $weights")
    require(totalRows > 0, s"totalRows $totalRows")
    val wtot = weights.values.sum
    val counts = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = hashBucket(col(idCol), salt)
    weights.toSeq.sortBy(_._1).map { case (src, w) =>
      val cnt = counts.getOrElse(src, 0L)
      val rate =
        if (cnt == 0L) 0.0 else math.min(w / wtot * totalRows / cnt, 1.0)
      col(sourceCol) === src && b < (rate * Space).toLong
    }.reduce(_ || _) match { case keep => df.filter(keep) }
  }

  /** Deterministic training-output sharding — the "global shuffle" a
    * corpus needs before sequence packing / training-data writes, without
    * a global sort: `shardCol` = hash-bucket mod `nShards` (uniform,
    * reproducible shard assignment) and `orderCol` = an INDEPENDENT
    * second hash (different salt) giving a content-deterministic
    * within-shard order that correlates with nothing about the input
    * layout. Writers then `repartition(shardCol)` +
    * `sortWithinPartitions(orderCol)` for a byte-reproducible shuffled
    * corpus on any cluster at any parallelism — `rand()`-shuffling
    * guarantees none of that. Both columns are narrow codegen
    * projections; the only shuffle is the writer's own repartition. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "", shardCol: String = "shard",
      orderCol: String = "shard_order"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn(shardCol,
        pmod(hashBucket(col(idCol), salt), lit(nShards.toLong)).cast("int"))
      .withColumn(orderCol, hashBucket(col(idCol), salt + "#o"))
  }

  /** The `n` rows of each stratum with the smallest (bucket, id) — a
    * deterministic uniform sample of exactly min(n, |stratum|) rows per
    * stratum (hash order is uniform; the id tiebreak makes the cut total).
    * One shuffle on the strata columns; the window's `rank <= n` compiles
    * to a WindowGroupLimit partial top-n. */
  def stratifiedSampleN(df: DataFrame, strata: Seq[String], n: Int,
      idCol: String, salt: String = ""): DataFrame = {
    require(n > 0 && strata.nonEmpty)
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("_samp_rnk", row_number().over(w))
      .filter(col("_samp_rnk") <= n)
      .drop("_samp_rnk")
  }

  /** Per-group cap by a SCORE: keep the `cap` best rows of each group,
    * ranked (scoreCol DESC, idCol ASC) — the "keep the N best documents
    * per domain" guard a web corpus runs before training (a handful of
    * mirror/spam domains otherwise dominate the token budget).
    *
    * Semantics: `row_number() OVER (PARTITION BY group ORDER BY score
    * DESC, id) <= cap`. The scale shape comes from Catalyst's
    * WindowGroupLimit rewrite: a rank-limit window compiles to a PARTIAL
    * per-input-partition top-`cap` (a bounded heap, no sort) BEFORE the
    * shuffle and a final top-`cap` after it, so a hot domain with 10⁹
    * pages ships at most `cap` rows per map task — the shuffle carries
    * O(cap · partitions) rows per group, never the group itself.
    * SamplingSuite pins the WindowGroupLimit node in the physical plan so
    * a regression back to a full-sort window is caught. */
  def capPerGroupByScore(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("_cap_rnk", row_number().over(w))
      .filter(col("_cap_rnk") <= cap)
      .drop("_cap_rnk")
  }

  /** Weighted sampling WITHOUT replacement, k rows, deterministic
    * (Efraimidis–Spirakis A-ES): each row draws `u` uniform on (0,1) from
    * the content hash and keeps key = −ln(u)/w; the k smallest keys win.
    * Inclusion probability is proportional to weight at every prefix, the
    * draw is reproducible on any engine that can compute md5, and the
    * plan is a TakeOrderedAndProject — per-partition top-k then a driver
    * merge of k·P rows, never a global sort. Ties (same key, possible
    * only for equal (u, w) pairs) break on the id.
    *
    * `u` is (bucket + 0.5) / 2⁶⁰ — strictly inside (0,1), so the log is
    * finite; weights must be strictly positive. */
  def weightedSampleK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (hashBucket(col(idCol), salt).cast("double") + lit(0.5)) /
      lit(Space.toDouble)
    val key = -log(u) / col(weightCol).cast("double")
    df.withColumn("_wsk", key)
      .orderBy(col("_wsk").asc, col(idCol).asc)
      .limit(k)
      .drop("_wsk")
  }

  /** TEMPERATURE (α-)sampling — the mT5/data-mixing recipe for smoothing
    * source imbalance without a target-proportion table: each source is
    * kept at rate `min(k · n_s^(τ−1), 1)`, so τ = 1 keeps everything at
    * rate k, τ < 1 UP-weights small sources relative to large ones (the
    * hot web crawl shrinks, the small curated set survives), τ > 1
    * sharpens toward the big sources. The cut is the same deterministic
    * md5 bucket as [[hashFraction]]/[[mixture]]: reproducible on any
    * layout, monotone in k (raising k only ADDS documents).
    *
    * τ = 0.5 evaluates via sqrt (IEEE-correctly-rounded in every engine —
    * exact cross-engine parity for the oracle gate); other τ go through
    * pow, whose last-ulp behavior is libm-specific (fine in production,
    * suite-tested rather than oracle-gated).
    *
    * Shape at 100 TB: one count per source (map-side combined, S rows
    * collected), then a shuffle-free narrow filter — the keep decision is
    * a pure function of (source, id, salt). */
  def temperatureMixture(df: DataFrame, sourceCol: String, tau: Double,
      k: Double, idCol: String, salt: String = ""): DataFrame = {
    require(tau > 0 && k > 0, s"need tau > 0 and k > 0, got tau=$tau k=$k")
    // NULL sources carry no rate (they'd NPE the sort and match nothing
    // anyway) and an empty frame has no conditions to reduce — both
    // degrade to "keep nothing", never to a crash
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    if (counts.isEmpty) return df.filter(lit(false))
    val b = hashBucket(col(idCol), salt)
    counts.map { case (src, n) =>
      val factor =
        if (tau == 0.5) 1.0 / math.sqrt(n.toDouble)
        else math.pow(n.toDouble, tau - 1.0)
      val rate = math.min(k * factor, 1.0)
      col(sourceCol) === src && b < (rate * Space.toDouble).toLong
    }.reduce(_ || _) match { case keep => df.filter(keep) }
  }

  /** LEAKAGE-SAFE SPLIT: [[hashSplit]] keyed by NEAR-DUP GROUP instead
    * of document id. A plain per-id split puts two near-duplicates on
    * opposite sides of the train/test boundary — the eval then scores
    * memorization, not generalization (the classic contamination bug a
    * per-id hash split cannot prevent). Here the duplicate-pair list
    * ([[Dedup.minhashLsh]] output, or any (id_a, id_b) edge set) closes
    * into components ([[Dedup.connectedComponents]]); every member of a
    * component shares the component's canonical id as its `group_id`,
    * singletons group as themselves, and the split buckets on
    * `group_id` — a whole duplication cluster always lands in ONE split.
    *
    * Determinism is [[hashSplit]]'s: a (group, salt) never migrates.
    * NOTE the incremental caveat: new edges can MERGE two components,
    * moving the merged group's rows to min-id's split — re-splitting
    * after re-mining pairs is correct but not append-only (document the
    * snapshot the split was cut from).
    *
    * Shape at 100 TB: the component solve touches only the PAIR list
    * (tiny vs the corpus); the corpus pays one left join against it plus
    * the shuffle-free bucket filter. Output: input columns +
    * (group_id, splitCol). */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      weights: Seq[Double], salt: String = "",
      splitCol: String = "split"): DataFrame = {
    val canon = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as(idCol), col("canonical_id"))
    val grouped = df
      .join(canon, Seq(idCol), "left")
      .withColumn("group_id",
        coalesce(col("canonical_id"), col(idCol).cast("long")))
      .drop("canonical_id")
    hashSplit(grouped, "group_id", weights, salt, splitCol)
  }
}
