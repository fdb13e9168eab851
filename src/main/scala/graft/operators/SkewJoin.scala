package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins — the manual counterpart of
  * AQE's runtime skew-join split, for the places AQE can't reach: a
  * stream-static join (no runtime re-plan), a skewed aggregation feeding
  * the join, or a key whose skew is KNOWN up front (the null-key/default
  * -key megarow every warehouse table has).
  *
  * Mechanics: the big side appends a deterministic salt in [0, salts)
  * hashed from a row-identifying column (md5-prefix — the repo's
  * engine-portable hash family, so a re-run salts identically); the small
  * side replicates each row `salts` times. The join key becomes
  * (key, salt), splitting each hot key's rows across `salts` reducers.
  * Cost: small side inflates `salts`×; correctness is UNCHANGED (every
  * big row still meets every matching small row exactly once — suite-
  * pinned against the plain join). */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, bigIdCol: String): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // NULL ids must still salt deterministically: md5(NULL) is NULL, and a
    // NULL salt would silently drop big-side rows a plain join on `key`
    // alone would have matched. Coalesce to a sentinel no real cast
    // produces (a NUL-prefixed tag) so NULL-id rows land in one bucket.
    val idStr = coalesce(col(bigIdCol).cast("string"), lit("\u0000null"))
    val b = big.withColumn("_salt",
      pmod(conv(substring(md5(idStr), 1, 15), 16, 10)
        .cast("long"), lit(salts.toLong)).cast("int"))
    val sm = small.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    b.join(sm, Seq(key, "_salt")).drop("_salt")
  }
}
