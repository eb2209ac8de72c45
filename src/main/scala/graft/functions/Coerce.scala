package graft.functions

import graft.schema.{DataTypeSchema, SeqType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-driven type-coercion layer — the reference's only scalar
  * "expression engine" (reference sources/worker/worker.js:911-1011),
  * re-expressed as one generated `select` of Catalyst column expressions so
  * the whole pass stays inside whole-stage codegen.
  *
  * Faithful semantics (FIXTURES.md "coercion golden cases"):
  *  - `null`, `"null"`, `"NULL"` (any case), missing → SQL NULL, any type
  *    (worker.js:947-949);
  *  - INTEGER/BIGINT: JS `parseInt` semantics — leading numeric prefix parsed,
  *    `"-"`/`""`/non-numeric → NULL (worker.js:951-968);
  *  - FLOAT/DOUBLE: JS `parseFloat` semantics, same null rules
  *    (worker.js:979-995);
  *  - BOOLEAN: the *intended* semantics — "true"→true, "false"→false, else
  *    NULL. (The reference's `indexOf`-based test is order-dependent and
  *    arguably buggy, worker.js:969-978; we implement the intent and document
  *    the deviation here.)
  *  - STRING/TEXT: CRLF collapsed to a space (worker.js:996-1000);
  *  - DATE: ISO-ish timestamp parse, unparseable → NULL;
  *  - JSON: kept as the raw string (queryable via from_json downstream).
  */
object Coerce {

  private def nullTokens(c: Column): Column =
    when(c.isNull || lower(c) === "null", lit(null)).otherwise(c)

  /** JS parseInt: optional sign + leading digits; anything after ignored.
    * Fast path: a plain `try_cast` (codegen'd, no regex) handles well-formed
    * values; the regex prefix-extraction only evaluates for rows the cast
    * rejects (coalesce short-circuits in codegen), so dirty tokens pay the
    * regex cost, clean data doesn't. */
  def asLong(c: Column): Column = {
    val cleaned = nullTokens(trim(c))
    coalesce(
      cleaned.try_cast("long"),
      regexp_extract(cleaned, "^[-+]?\\d+", 0).try_cast("long"))
  }

  def asInt(c: Column): Column = asLong(c).try_cast("int")

  /** JS parseFloat: optional sign, decimal, exponent prefix (same fast-path
    * structure as [[asLong]]). */
  def asDouble(c: Column): Column = {
    val cleaned = nullTokens(trim(c))
    coalesce(
      cleaned.try_cast("double"),
      regexp_extract(cleaned, "^[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?", 0)
        .try_cast("double"))
  }

  def asFloat(c: Column): Column = asDouble(c).try_cast("float")

  def asBoolean(c: Column): Column = {
    val cleaned = lower(trim(nullTokens(c)))
    when(cleaned === "true", lit(true))
      .when(cleaned === "false", lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  def asString(c: Column): Column =
    regexp_replace(nullTokens(c), "\r\n", " ")

  def asTimestamp(c: Column): Column = nullTokens(trim(c)).try_cast("timestamp")

  def forType(t: SeqType, c: Column): Column = t match {
    case SeqType.SInteger => asInt(c)
    case SeqType.SBigint => asLong(c)
    case SeqType.SFloat => asFloat(c)
    case SeqType.SDouble => asDouble(c)
    case SeqType.SBoolean => asBoolean(c)
    case SeqType.SDate => asTimestamp(c)
    case SeqType.SString(_) | SeqType.SText => asString(c)
    case SeqType.SJson => nullTokens(c) // opaque JSON string column
  }

  /** Apply the coercion pass: all-string parsed batch → typed DataFrame.
    * One narrow projection — no shuffle, codegen-friendly, scale-free. */
  def apply(df: DataFrame, schema: DataTypeSchema): DataFrame = {
    val cols = schema.fields.map { f =>
      val in = if (df.columns.contains(f.name)) col(f.name)
               else lit(null).cast("string")
      forType(f.stype, in).as(f.name)
    }
    df.select(cols: _*)
  }
}
