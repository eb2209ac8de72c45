package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for DuckDB-oracle hash parity.
  *
  * Floating-point SUM/AVG over a shuffled dataset is order-dependent, so a
  * Spark double aggregate will not bit-match DuckDB's. We route money/measure
  * aggregates through DecimalType(38, 6): each input double casts to the SAME
  * decimal in both engines (per-row, order-free), decimal addition is exact,
  * and the final cast back to double is again deterministic. The oracle SQL
  * mirrors the same casts (see [[SparkEntry.oracleSql]]).
  */
object Det {
  private val D = DecimalType(38, 6)

  /** Order-independent, engine-exact sum of a double column (result double). */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent average: exact decimal sum → double, then double
    * division by count (decimal÷long would stay decimal in Spark but promote
    * to double in DuckDB — divide as doubles on both sides instead). */
  def davg(c: Column): Column =
    sum(c.cast(D)).cast("double") / count(c)

  private val L = DecimalType(38, 0)

  /** Overflow-safe long sum (result long): Spark's sum(LONG) is LONG and
    * ANSI-crashes past 2^63 where DuckDB's SUM(BIGINT) widens to
    * HUGEINT silently — route the accumulation through DECIMAL(38,0) so
    * both engines accumulate exactly, then take the same BIGINT cast the
    * oracle applies. (The q142/q257 class: any sum of squared or
    * length-scaled counts crosses int64 at corpus scale.) */
  def lsum(c: Column): Column = sum(c.cast(L)).cast("long")

  /** SQL fragment for the oracle side of [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"

  /** SQL fragment for the oracle side of [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE) / COUNT($expr)"
}
