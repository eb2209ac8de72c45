package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Structured find-DSL → Catalyst [[Column]] compiler.
  *
  * The reference ships a "find" query mode whose wire format is a nested JSON
  * object using angle-bracket operator markers — `<and> <or> <eq> <ne> <gt>
  * <lt> <gte> <lte> <like> <notLike> <is> <not> <startsWith>` — which it
  * reconstructs into a Sequelize operator tree (reference
  * sources/webrtcproxy/sqlproxy.mjs:197-436). This is a re-implementation from
  * the *wire format*: one recursive descent straight to a Catalyst `Column`
  * predicate, so the filter participates in pushdown/pruning like any native
  * predicate (no staging table, no per-row interpretation).
  *
  * Wire semantics kept from the reference:
  *  - `{"field": primitive}` → equality; several fields in one object → AND;
  *  - `{"field": {"<op>": v, ...}}` → op applications, ANDed;
  *  - `{"<and>": [t1, t2, ...]}` / `{"<or>": [...]}` → boolean combinators;
  *  - `{"field": {"<is>": null}}` → IS NULL; `{"<not>": null}` → IS NOT NULL;
  *    `{"<not>": v}` → NOT(field = v);
  *  - numeric strings auto-cast to int/float; the string "null" → SQL NULL
  *    (sqlproxy.mjs:239-252 equivalents).
  *
  * At scale the compiled predicate is a plain expression tree: it reaches the
  * parquet scan as PushedFilters where the columns allow, costs no shuffle,
  * and stays inside whole-stage codegen.
  */
object FindDsl {
  private val mapper = new ObjectMapper()

  /** Compile a find-DSL JSON document to a boolean Column. */
  def compile(json: String): Column = node(mapper.readTree(json))

  /** `findAll` execution mode (enginesharedv3.mjs:110-128 analog). */
  def findAll(df: DataFrame, json: String): DataFrame = df.where(compile(json))

  /** `findOne`: first match only. */
  def findOne(df: DataFrame, json: String): DataFrame =
    findAll(df, json).limit(1)

  /** `findByPk`: primary-key point lookup. */
  def findByPk(df: DataFrame, pkColumn: String, value: Any): DataFrame =
    df.where(col(pkColumn) === lit(value)).limit(1)

  private def node(n: JsonNode): Column = {
    require(n.isObject, s"find-DSL node must be an object, got: $n")
    val parts = n.properties().asScala.map { e =>
      (e.getKey, e.getValue) match {
        case ("<and>", v) => combine(v, _ && _)
        case ("<or>", v)  => combine(v, _ || _)
        case ("<not>", v) if v.isObject => !node(v)
        case (field, v)   => fieldPredicate(field, v)
      }
    }.toSeq
    parts.reduce(_ && _)
  }

  private def combine(arr: JsonNode, op: (Column, Column) => Column): Column = {
    require(arr.isArray && arr.size > 0, s"<and>/<or> needs a non-empty array")
    arr.elements().asScala.map(node).reduce(op)
  }

  private def fieldPredicate(field: String, v: JsonNode): Column = {
    val c = col(field)
    if (!v.isObject) c === literal(v)
    else v.properties().asScala.map { e =>
      val value = e.getValue
      e.getKey match {
        case "<eq>" => if (value.isNull) c.isNull else c === literal(value)
        case "<ne>" => c =!= literal(value)
        case "<gt>" => c > literal(value)
        case "<lt>" => c < literal(value)
        case "<gte>" => c >= literal(value)
        case "<lte>" => c <= literal(value)
        case "<like>" => c.like(value.asText)
        case "<notLike>" => !c.like(value.asText)
        case "<is>" => if (isNullish(value)) c.isNull else c === literal(value)
        case "<not>" =>
          if (isNullish(value)) c.isNotNull else c =!= literal(value)
        case "<startsWith>" => c.startsWith(value.asText)
        case other => throw new IllegalArgumentException(
          s"unknown find-DSL operator '$other' on field '$field'")
      }
    }.reduce(_ && _)
  }

  private def isNullish(v: JsonNode): Boolean =
    v.isNull || (v.isTextual && v.asText == "null")

  /** Reference auto-cast: numeric strings → numbers, "null" → NULL. */
  private def literal(v: JsonNode): Column = v match {
    case n if n.isNull => lit(null)
    case n if n.isIntegralNumber => lit(n.asLong)
    case n if n.isNumber => lit(n.asDouble)
    case n if n.isBoolean => lit(n.asBoolean)
    case n =>
      val s = n.asText
      if (s == "null") lit(null)
      else if (s.matches("-?\\d+")) lit(s.toLong)
      else if (s.matches("-?\\d*\\.\\d+")) lit(s.toDouble)
      else lit(s)
  }
}
