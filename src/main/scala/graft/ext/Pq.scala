package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NearestCentroid, PqAdc}

/** Product quantization for embedding compression + two-stage ANN — the
  * FAISS-style IVFPQ construction from public literature (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", PAMI 2011).
  *
  * The vector dim is split into `m` subspaces of `dsub = dim/m`; each
  * subspace gets its own `ksub`-centroid k-means codebook; a vector is
  * stored as the `m` per-subspace nearest-centroid indices. At 100 TB the
  * point is storage/shuffle compression: a 768-dim float64 row (6 KB)
  * becomes `m` small ints (≈`m` bytes semantically) — the candidate scan
  * and its shuffle shrink ~100×, and only the final re-rank touches full
  * vectors, for exactly the top-R candidate rows per query.
  *
  * Search = asymmetric distance (full query vs reconstructed code,
  * [[graft.functions.PqAdc]] — one static codegen call per pair) → per-query
  * top-R candidate cut → exact cosine re-rank of candidates only. */
object Pq {

  /** m × ksub × dsub codebooks. */
  final case class Codebooks(m: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]])

  /** Train all m codebooks JOINTLY — one Lloyd iteration is ONE shuffle
    * over (subspace, cell) keys, not m sequential k-means runs. The
    * corpus explodes once into (s, id, subvector) rows; assignment picks
    * the subspace's codebook by a when-chain of per-subspace
    * [[NearestCentroid]] kernels (m static branches in one codegen stage);
    * recompute is a single groupBy(s, b) [[graft.agg.VectorMeanAgg]].
    * Same deterministic hash-init as [[Ivf.train]]. Requires dim % m == 0.
    */
  def train(df: DataFrame, m: Int, ksub: Int, iters: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): Codebooks = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // (s, id, subvector) — one narrow explode, reused every iteration
    val sub = df.select(col(idCol).as("id"),
        posexplode(array((0 until m).map { s =>
          slice(col(vecCol).cast("array<double>"), s * dsub + 1, dsub)
        }: _*)))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "v")
      .localCheckpoint(true) // explode once, not once per iteration
    def recompute(assigned: DataFrame,
        prev: Array[Array[Array[Double]]]): Array[Array[Array[Double]]] = {
      val got = assigned.groupBy(col("s"), col("b"))
        .agg(graft.agg.VectorMeanAgg.column(col("v")).as("c")).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      Array.tabulate(m, ksub)((s, j) => got.getOrElse((s, j), prev(s)(j)))
    }
    def assign(cbs: Array[Array[Array[Double]]]): DataFrame = {
      // subspace-dispatched nearest centroid: m codegen branches
      val nearest = (0 until m).map { s =>
        (s, NearestCentroid.column(col("v"), cbs(s)))
      }.foldRight(lit(-1): org.apache.spark.sql.Column) {
        case ((s, nc), acc) => when(col("s") === s, nc).otherwise(acc)
      }
      sub.withColumn("b", nearest)
    }
    val zero = Array.fill(m, ksub)(Array.fill(dsub)(0.0))
    var cbs = recompute(
      sub.withColumn("b", pmod(hash(col("id")), lit(ksub)).cast("int")), zero)
    var it = 0
    while (it < iters) {
      cbs = recompute(assign(cbs), cbs)
      it += 1
    }
    Codebooks(m, dsub, cbs)
  }

  /** Corpus rows → PQ codes: `m` per-subspace [[NearestCentroid]] calls
    * (each a static codegen scan of ksub·dsub doubles), no shuffle. */
  def encode(df: DataFrame, cb: Codebooks,
      vecCol: String = "embedding", codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, array((0 until cb.m).map { s =>
      NearestCentroid.column(
        slice(col(vecCol).cast("array<double>"), s * cb.dsub + 1, cb.dsub),
        cb.centroids(s))
    }: _*))

  /** Two-stage top-k: ADC over codes → top-`rerank` candidates per query →
    * exact cosine re-rank (same output shape/rounding as
    * [[Similarity.bruteForceTopK]]). `rerank` trades recall for the number
    * of full vectors touched; `rerank >= corpus size` degenerates to exact
    * brute force through a compressed first pass. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, cb: Codebooks,
      rerank: Int, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(rerank >= k, s"rerank $rerank < k $k")
    // candidate stage reads (id, code) only — the compressed representation
    val c = encode(corpus, cb, vecCol)
      .select(col(idCol).as("corpus_id"), col("pq_code"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("corpus_id"))
    val cand = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("adc", PqAdc.column(col("pq_code"), col("qvec"), cb.centroids))
      .withColumn("crank", row_number().over(wAdc))
      .filter(col("crank") <= rerank)
      .select("query_id", "corpus_id")
    // re-rank stage joins full vectors for the R surviving rows only
    val cv = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("cnorm", Similarity.norm(col("cvec")))
    val qv = q.withColumn("qnorm", Similarity.norm(col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("corpus_id"))
    cand.join(cv, "corpus_id").join(broadcast(qv), "query_id")
      .withColumn("cos",
        Similarity.dot(col("cvec"), col("qvec")) / (col("cnorm") * col("qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("cos"), 6).as("cos"))
  }
}
