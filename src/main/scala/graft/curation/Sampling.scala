package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset mixing for training-data curation.
  *
  * Every decision here is a pure function of the row's key — no RNG, no
  * partition-dependent state — which is what a 100 TB curation pipeline
  * actually needs: re-running a stage reproduces byte-identical shards,
  * adding data doesn't reshuffle previous keep/drop decisions, and any
  * other engine (the DuckDB oracle included) can replay the exact sample
  * from the same expression. The hash bucket is the first 16 bits of
  * md5(key) — md5 is available and bit-identical everywhere, unlike
  * engine-specific hashes (Spark xxhash64 has no DuckDB counterpart).
  *
  * All of it is plain column algebra: the filters push into the scan and
  * sampling never shuffles.
  */
object Sampling {

  /** The native bucket space: first 4 hex chars of md5 = 16 bits. Using
    * the full 65536 keeps thresholds free of modulo bias (any smaller
    * modulus maps 7-vs-6 hash values onto different buckets — a
    * systematic ~7 % rate skew at modulus 10000). */
  val DefaultBuckets = 65536

  /** Deterministic bucket in [0, buckets): first 4 hex chars of
    * md5(key) → int. */
  def bucket(key: Column, buckets: Int = DefaultBuckets): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10)
      .cast("int") % buckets

  /** Keep ~`fraction` of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
      buckets: Int = DefaultBuckets): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    df.where(bucket(col(keyCol), buckets) <
      math.round(fraction * buckets).toInt)
  }

  /** Per-stratum sampling fractions; strata not listed are dropped —
    * the curation semantic (a source without a weight is excluded). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double],
      buckets: Int = DefaultBuckets): DataFrame = {
    val threshold = fractions.foldLeft(lit(0)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k),
        lit(math.round(f * buckets).toInt)).otherwise(acc)
    }
    df.where(bucket(col(keyCol), buckets) < threshold)
  }

  /** Mix strata toward target proportions: sample stratum `s` at rate
    * `min(1, targetRows · w_s / n_s)`. Stratum sizes are one
    * partial-aggregated count per stratum (bounded — a corpus has a
    * handful of sources); the sampling itself stays a pushed-down
    * filter. Oversubscribed strata (fewer rows than their target share)
    * keep everything rather than upsampling. */
  def mixToWeights(df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, Double], targetRows: Long,
      buckets: Int = DefaultBuckets): DataFrame = {
    val totalW = weights.values.sum
    require(totalW > 0, "weights must be positive")
    val counts = df
      .where(col(strataCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = weights.flatMap { case (s, w) =>
      counts.get(s).map { n =>
        s -> math.min(1.0, targetRows * (w / totalW) / n.toDouble)
      }
    }
    stratifiedSample(df, keyCol, strataCol, fractions, buckets)
  }
}
