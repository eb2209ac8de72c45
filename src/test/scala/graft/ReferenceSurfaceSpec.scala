package graft

import graft.functions.Coerce
import graft.operators.FindDsl
import graft.plans.ReadOnlyGuard
import graft.schema.{SchemaRegistry, SeqType}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden-case tests for the reference-parity surfaces (FIXTURES.md §A). */
class ReferenceSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // ---- coercion golden cases (worker.js:911-1011 semantics) --------------
  private def coerceOne(v: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Any =
    Seq(Option(v)).toDF("v").select(f(col("v")).as("r")).collect()(0).get(0)

  test("null tokens coerce to NULL for every type") {
    for (tok <- Seq(null, "null", "NULL", "Null")) {
      assert(coerceOne(tok, Coerce.asLong) == null, s"long($tok)")
      assert(coerceOne(tok, Coerce.asDouble) == null, s"double($tok)")
      assert(coerceOne(tok, Coerce.asBoolean) == null, s"bool($tok)")
      assert(coerceOne(tok, Coerce.asString) == null, s"string($tok)")
    }
  }

  test("dash and empty string coerce to NULL for numeric types") {
    for (tok <- Seq("-", "")) {
      assert(coerceOne(tok, Coerce.asLong) == null, s"long('$tok')")
      assert(coerceOne(tok, Coerce.asInt) == null)
      assert(coerceOne(tok, Coerce.asDouble) == null, s"double('$tok')")
      assert(coerceOne(tok, Coerce.asFloat) == null)
    }
  }

  test("JS parseInt/parseFloat prefix semantics") {
    assert(coerceOne("42abc", Coerce.asLong) == 42L)
    assert(coerceOne("  -17 ", Coerce.asLong) == -17L)
    assert(coerceOne("3.14xyz", Coerce.asDouble) == 3.14)
    assert(coerceOne("1.5e3ms", Coerce.asDouble) == 1500.0)
    assert(coerceOne("abc", Coerce.asLong) == null)
    assert(coerceOne("abc", Coerce.asDouble) == null)
  }

  test("boolean intended semantics (documented deviation from indexOf bug)") {
    assert(coerceOne("true", Coerce.asBoolean) == true)
    assert(coerceOne("FALSE", Coerce.asBoolean) == false)
    assert(coerceOne("yes", Coerce.asBoolean) == null)
  }

  test("CRLF collapsed to space in strings") {
    assert(coerceOne("a\r\nb", Coerce.asString) == "a b")
  }

  // ---- schema registry ---------------------------------------------------
  test("wire-format column specs parse") {
    val f = SchemaRegistry.parseColumn("'errorMessage':{type: Sequelize.STRING(8192)},")
    assert(f.name == "errorMessage" && f.stype == SeqType.SString(8192))
    val j = SchemaRegistry.parseColumn("'userIdentity':{type: Sequelize.JSON}")
    assert(j.stype == SeqType.SJson)
  }

  test("full schema document parses (CloudTrail shape)") {
    val doc =
      """{"Schema":["'eventTime':{type: Sequelize.DATE},",
        |"'eventName':{type: Sequelize.STRING}"],
        |"StgSelectParameters":{"IO":{"InputSerialization":{
        |  "Compression":"GZIP","JsonType":true,"RootElement":"Records"}}},
        |"Views":[{"Default":["eventTime","eventName"]}],
        |"Indexes":[],"TransForms":[]}""".stripMargin
    val s = SchemaRegistry.parseDocument("CT", doc)
    assert(s.fields.map(_.name) == Seq("eventTime", "eventName"))
    assert(s.input.rootElement == "Records" && s.input.jsonType)
    assert(s.view("Default") == Seq("eventTime", "eventName"))
    assert(s.sparkSchema.fields.head.dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("builtin VPCFlow has 29 columns with hyphenated names") {
    assert(SchemaRegistry.vpcFlow.fields.size == 29)
    assert(SchemaRegistry.vpcFlow.fields.exists(_.name == "account-id"))
  }

  test("all 11 reference schema documents parse with expected shapes") {
    val b = SchemaRegistry.builtins
    val expectedCols = Map("VPCFlow" -> 29, "CloudTrail" -> 21,
      "ClassicLB" -> 15, "ApplicationLB" -> 29, "NetworkLB" -> 21,
      "CloudFront" -> 33, "CostDemoAWS" -> 126, "CostDemoAzure" -> 96,
      "WindowsDemoEvents" -> 27, "Invocations" -> 6, "ProcessingErrors" -> 7)
    expectedCols.foreach { case (n, c) =>
      assert(b(n).fields.size == c, s"$n column count")
    }
    assert(b("CloudFront").input.fieldDelimiter == "\t") // normalized \t
    assert(b("CloudTrail").input.rootElement == "Records")
    assert(b("VPCFlow").input.csvHeader)
    assert(b("ApplicationLB").fields.count(_.stype == SeqType.SDouble) == 3)
    // the reference's own ProcessingErrors typo (missing brace) is tolerated
    assert(b("ProcessingErrors").fields.last.name == "logstream")
  }

  // ---- find-DSL ----------------------------------------------------------
  private lazy val findDf =
    Seq((1L, "alpha", 10.0, Some("x")), (2L, "beta", 20.0, None),
      (3L, "alphabet", 30.0, Some("y")), (4L, "gamma", 40.0, None))
      .toDF("id", "name", "score", "tag")

  test("find-DSL: and/or/gt/like tree") {
    val got = FindDsl.findAll(findDf,
      """{"<or>": [{"name": {"<startsWith>": "alpha"}},
        |          {"score": {"<gt>": "25"}}]}""".stripMargin)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L, 4L))
  }

  test("find-DSL: is-null / not-null / ne / notLike") {
    assert(FindDsl.findAll(findDf, """{"tag": {"<is>": null}}""")
      .count() == 2)
    assert(FindDsl.findAll(findDf, """{"tag": {"<not>": null}}""")
      .count() == 2)
    assert(FindDsl.findAll(findDf,
      """{"name": {"<notLike>": "%alpha%"}, "id": {"<ne>": 2}}""")
      .select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("find-DSL: numeric-string auto-cast and 'null' literal") {
    assert(FindDsl.findAll(findDf, """{"score": {"<gte>": "30"}}""")
      .count() == 2)
    assert(FindDsl.findAll(findDf, """{"tag": {"<is>": "null"}}""")
      .count() == 2)
  }

  test("find-DSL: unknown operator rejected") {
    intercept[IllegalArgumentException] {
      FindDsl.compile("""{"id": {"<explode>": 1}}""")
    }
  }

  // ---- read-only guard ---------------------------------------------------
  test("guard passes SELECT and extracts tables incl. subqueries") {
    val v = ReadOnlyGuard.validate(spark,
      "SELECT * FROM a JOIN b ON a.x = b.x WHERE a.y IN (SELECT y FROM c)")
    assert(v.tables == Set("a", "b", "c"))
  }

  test("guard rejects DML/DDL") {
    for (sql <- Seq(
      "INSERT INTO t VALUES (1)",
      "DROP TABLE t",
      "CREATE TABLE t (x INT)",
      "UPDATE t SET x = 1",
      "DELETE FROM t"))
      intercept[SecurityException] { ReadOnlyGuard.validate(spark, sql) }
  }

  test("guard enforces table ACL") {
    Seq((1, 2)).toDF("x", "y").createOrReplaceTempView("acl_t")
    intercept[SecurityException] {
      ReadOnlyGuard.query(spark, "SELECT * FROM acl_t",
        allowed = Some(Set("other")))
    }
    assert(ReadOnlyGuard.query(spark, "SELECT * FROM acl_t",
      allowed = Some(Set("acl_t"))).count() == 1)
  }

  // ---- S3Object dialect shim --------------------------------------------
  test("S3Object dialect rewrites to the dataset view") {
    import graft.jobs.CollectJob.rewriteS3ObjectDialect
    assert(rewriteS3ObjectDialect(
      "select * from S3Object[*].Records[*] s Where s.errorMessage != 'null'",
      "ds") == "select * from ds s Where s.errorMessage != 'null'")
    assert(rewriteS3ObjectDialect("SELECT * FROM s3object s", "ds")
      == "SELECT * FROM ds s")
  }
}
