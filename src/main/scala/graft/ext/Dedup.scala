package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines. Each is designed
  * around its 100 TB shape:
  *
  *   - exact: hash-groupBy — one shuffle on a 128-bit digest;
  *   - MinHash+LSH: per-row signature (shuffle-free map) → band-bucket
  *     self-join (shuffle on band keys only, candidates ≪ n²) → verify;
  *   - SimHash: per-row 64-bit sketch, near-dup = small Hamming distance;
  *   - n-gram Jaccard: exact pairwise verify, used on LSH candidates (the
  *     all-pairs variant exists for oracle-checkable small corpora only);
  *   - embedding cosine: see [[Similarity]].
  */
object Dedup {

  /** Exact duplicate groups by content digest: canonical = min id. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  // deterministic affine hash family over a prime field (fits signed 64-bit:
  // a,b < p = 1e9+7, h < p → a*h+b < ~1e18)
  val Prime = 1000000007L
  def hashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map(i => (2L * i + 3L, 5L * i + 7L))

  /** 64-bit-safe base hash of a shingle string: first 60 bits of md5 mod p.
    * Identical in DuckDB: CAST(concat('0x', substr(md5(s),1,15)) AS UBIGINT) % p. */
  private def baseHash(s: String): String =
    s"CAST(conv(substr(md5($s), 1, 15), 16, 10) AS BIGINT) % ${Prime}L"

  /** MinHash + LSH banding: returns candidate duplicate pairs
    * (id_a < id_b) with their verified n-gram Jaccard similarity.
    * bands × rowsPerBand = numHashes; candidate iff some band matches. */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 16, bands: Int = 4, minJaccard: Double = 0.0): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val withSig = df.select(col(idCol).as("doc_id"),
        TextAnalysis.shingles(textCol).as("sh"))
      .withColumn("hv", expr(s"transform(sh, s -> ${baseHash("s")})"))
      .withColumn("sig", array(hashParams(numHashes).map { case (a, b) =>
        expr(s"array_min(transform(hv, h -> (${a}L * h + ${b}L) % ${Prime}L))")
      }: _*))
    val banded = withSig.select(col("doc_id"), col("sh"),
        posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> concat_ws(',', transform(slice(sig, b * $r + 1, $r), x -> CAST(x AS STRING))))"))
          .as(Seq("band", "band_key")))
    // distinct on the id pair FIRST (cheap long columns through the
    // shuffle), then join the shingle arrays back for the verify pass
    val cand = banded.select(col("doc_id"), col("band"), col("band_key")).as("l")
      .join(banded.select(col("doc_id"), col("band"), col("band_key")).as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
    val sh = withSig.select(col("doc_id"), col("sh"))
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccardArr(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard of two distinct-element arrays. */
  def jaccardArr(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** All-pairs n-gram Jaccard within a blocking key. The block bounds the
    * quadratic cost (shuffle on the block key, pairs within a block only) —
    * the 100 TB discipline is: tight blocks here, cross-block recall via
    * [[minhashLsh]]. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], minJaccard: Double): DataFrame = {
    val t = df.select(concat_ws("", blockCols.map(col): _*).as("blk"),
      col(idCol).as("doc_id"), TextAnalysis.shingles(textCol).as("sh"))
    t.as("l").join(t.as("r"),
        col("l.blk") === col("r.blk") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
        jaccardArr(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 64-bit SimHash over word tokens: bit b of the sketch is the sign of
    * Σ_tokens (±1 per token-hash bit b). Near-duplicates have small Hamming
    * distance. Pure expression (no UDF): the token array is reduced with
    * aggregate() over a 64-long bit-count state. */
  def simhash(t: String): Column = {
    val toks = s"array_distinct(regexp_extract_all(lower($t), '[a-z0-9]+', 0))"
    val h = "CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"
    // acc: array of 60 counts; each token adds ±1 per bit (bit 0 = MSB of
    // the final sketch: the fold below is sig = sig*2 + sign(cnt_b))
    expr(s"""
      aggregate(
        aggregate($toks,
          array_repeat(0L, 60),
          (acc, tok) -> zip_with(acc,
            transform(sequence(0, 59), b -> (shiftright($h, b) % 2L) * 2L - 1L),
            (a, v) -> a + v)),
        0L,
        (sig, cnt) -> sig * 2L + CASE WHEN cnt > 0 THEN 1L ELSE 0L END)""")
  }

  /** Hamming distance between two simhash sketches. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))
}
