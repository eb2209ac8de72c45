package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * At 100 TB a fact-fact join on a power-law key (one hot user, one hot
  * table name) routes the hot key's entire partition to a single reducer.
  * AQE's skew-join split handles sort-merge cases automatically; this helper
  * is the explicit salting form for when AQE can't (e.g. aggregate-after-join
  * pipelines or stream-static joins): the skewed side gets a random-ish salt
  * in [0, buckets), the other side is exploded `buckets`-fold so every
  * (key, salt) pair finds its match. Deterministic salt (hash of a unique
  * column) keeps results reproducible.
  */
object SkewJoin {

  /** Inner-join `big` (skewed on `key`) with `other`, salting `buckets`-way.
    * `saltBy` must be a column of `big` that distributes uniformly (a row id,
    * an event id) — the salt is `pmod(xxhash64(saltBy), buckets)`. */
  def saltedInnerJoin(big: DataFrame, other: DataFrame, key: String,
      buckets: Int, saltBy: Column): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(buckets)).cast("int"))
    val exploded = other.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
