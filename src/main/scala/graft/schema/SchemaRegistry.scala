package graft.schema

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Sequelize-style declared column types (reference type census: SURVEY §1.2;
  * definitions in reference sources/shared/enginesharedv3.mjs:51-77). */
sealed trait SeqType
object SeqType {
  final case class SString(length: Int = 255) extends SeqType
  case object SText extends SeqType
  case object SInteger extends SeqType
  case object SBigint extends SeqType
  case object SFloat extends SeqType
  case object SDouble extends SeqType
  case object SBoolean extends SeqType
  case object SDate extends SeqType
  case object SJson extends SeqType

  /** Declared type → Spark type. JSON stays a string column (opaque, queried
    * via from_json/get_json_object — strictly more capable than the
    * reference's engine-dependent JSON handling). */
  def toSpark(t: SeqType): DataType = t match {
    case SString(_) | SText | SJson => StringType
    case SInteger => IntegerType
    case SBigint => LongType
    case SFloat => FloatType
    case SDouble => DoubleType
    case SBoolean => BooleanType
    case SDate => TimestampType
  }

  /** Per-engine model downgrade — the reference's `convertschema`
    * (enginesharedv3.mjs:182-193): for MSSQL every JSON, STRING(n) and
    * STRING column becomes TEXT (the tedious driver has no JSON type,
    * sized strings cap at 8000 chars, and Sequelize TEXT lands
    * NVARCHAR(MAX)). Other engines keep the declared types. */
  def convertFor(engine: String, t: SeqType): SeqType =
    if (engine.equalsIgnoreCase("mssql")) t match {
      case SString(_) | SJson | SText => SText
      case other => other
    } else t
}

/** Parse/serialization config of a DataType (reference
  * `StgSelectParameters.IO.InputSerialization`). */
final case class InputSerialization(
    compression: String = "NONE", // NONE | GZIP | ZIP
    jsonType: Boolean = false,
    rootElement: String = "",
    csvHeader: Boolean = false,
    fieldDelimiter: String = ",",
    recordDelimiter: String = "\n",
    quoteCharacter: String = "\"")

final case class FieldSpec(name: String, stype: SeqType)

/** A named log schema — the reference's central metadata object, stored in
  * SSM `/Logverz/Engine/Schemas/<DataType>` (reference
  * infrastructure/templates/Logverz-Engine.json:1606-1770, consumed at
  * sources/jobproducer/jobproducer.js:173-186). */
final case class DataTypeSchema(
    name: String,
    fields: Seq[FieldSpec],
    input: InputSerialization = InputSerialization(),
    views: Map[String, Seq[String]] = Map.empty) {

  def sparkSchema: StructType =
    StructType(fields.map(f => StructField(f.name, SeqType.toSpark(f.stype))))

  /** This schema downgraded for a destination engine —
    * [[SeqType.convertFor]] applied field-wise (reference `convertschema`
    * runs on the model source right before `ConnectDBserver` builds it,
    * enginesharedv3.mjs:196-198). */
  def convertFor(engine: String): DataTypeSchema =
    copy(fields = fields.map(f =>
      f.copy(stype = SeqType.convertFor(engine, f.stype))))

  /** The schema the raw reader produces before coercion: all strings. */
  def rawSchema: StructType =
    StructType(fields.map(f => StructField(f.name, StringType)))

  def view(name: String): Seq[String] =
    views.getOrElse(name, fields.map(_.name))
}

/** Registry of DataType schemas + codec for the reference's wire format.
  *
  * The wire format stores each column as the literal string
  * `"'col':{type: Sequelize.T},"` inside a JSON array — the reference turns
  * these into generated JS model modules (enginesharedv3.mjs:92-108); here
  * they parse straight into [[DataTypeSchema]] / Spark `StructType`, no
  * codegen needed.
  */
object SchemaRegistry {
  private val mapper = new ObjectMapper()
  // closing brace optional: the reference's ProcessingErrors doc ships with
  // a literal `'logstream':{type: Sequelize.STRING` typo that its own
  // regex-based parser tolerates (Logverz-Engine.json:1761).
  private val colRe =
    """'([^']+)'\s*:\s*\{\s*type:\s*Sequelize\.([A-Z]+)(?:\((\d+)\))?\s*\}?\s*,?""".r

  def parseSeqType(name: String, len: Option[Int]): SeqType = name match {
    case "STRING" => SeqType.SString(len.getOrElse(255))
    case "TEXT" => SeqType.SText
    case "INTEGER" => SeqType.SInteger
    case "BIGINT" => SeqType.SBigint
    case "FLOAT" => SeqType.SFloat
    case "DOUBLE" => SeqType.SDouble
    case "BOOLEAN" => SeqType.SBoolean
    case "DATE" => SeqType.SDate
    case "JSON" => SeqType.SJson
    case other => throw new IllegalArgumentException(s"unknown type $other")
  }

  /** Parse one `'col':{type: Sequelize.T}` entry. */
  def parseColumn(s: String): FieldSpec = s.trim match {
    case colRe(name, t, len) =>
      FieldSpec(name, parseSeqType(t, Option(len).map(_.toInt)))
    case other =>
      throw new IllegalArgumentException(s"unparseable column spec: $other")
  }

  /** Parse a full schema document in the reference's SSM JSON format. */
  def parseDocument(name: String, json: String): DataTypeSchema = {
    val root = mapper.readTree(json)
    val fields = root.get("Schema").elements().asScala
      .map(n => parseColumn(n.asText)).toSeq
    val input = Option(root.at("/StgSelectParameters/IO/InputSerialization"))
      .filter(!_.isMissingNode).map { is =>
        val csv = Option(is.get("CSV"))
        InputSerialization(
          compression = Option(is.get("Compression")).map(_.asText)
            .getOrElse("NONE"),
          jsonType = Option(is.get("JsonType")).exists(_.asBoolean(false)),
          rootElement = Option(is.get("RootElement")).map(_.asText)
            .getOrElse(""),
          csvHeader = csv.flatMap(c => Option(c.get("FileHeaderInfo")))
            .exists(h => h.asBoolean(false) || h.asText == "USE"),
          // CloudFront's doc carries the two-char string "\t" (escaped in
          // the CFN JSON); normalize to a real tab for the CSV reader.
          fieldDelimiter = csv.flatMap(c => Option(c.get("FieldDelimiter")))
            .map(_.asText.replace("\\t", "\t")).getOrElse(","),
          recordDelimiter = csv.flatMap(c => Option(c.get("RecordDelimiter")))
            .map(_.asText).getOrElse("\n"),
          quoteCharacter = csv.flatMap(c => Option(c.get("QuoteCharacter")))
            .map(_.asText).getOrElse("\""))
      }.getOrElse(InputSerialization())
    val views: Map[String, Seq[String]] =
      Option(root.get("Views")).filter(_.isArray).map { vs =>
        vs.elements().asScala.flatMap { v =>
          v.properties().asScala.map { e =>
            e.getKey -> e.getValue.elements().asScala.map(_.asText).toSeq
          }
        }.toMap
      }.getOrElse(Map.empty)
    DataTypeSchema(name, fields, input, views)
  }

  import SeqType._

  /** Built-in schemas, ported from the reference's SSM parameter definitions
    * (Logverz-Engine.json:1606-1770). Column names/types are data, verbatim;
    * a few representative ones here, the rest parse via [[parseDocument]]. */
  val vpcFlow: DataTypeSchema = DataTypeSchema(
    "VPCFlow",
    Seq("version" -> SInteger, "account-id" -> SBigint,
      "interface-id" -> SString(255), "srcaddr" -> SString(64),
      "dstaddr" -> SString(64), "srcport" -> SInteger, "dstport" -> SInteger,
      "protocol" -> SInteger, "packets" -> SBigint, "bytes" -> SBigint,
      "start" -> SBigint, "end" -> SBigint, "action" -> SString(8),
      "log-status" -> SString(8), "vpc-id" -> SString(32),
      "subnet-id" -> SString(32), "instance-id" -> SString(32),
      "tcp-flags" -> SString(8), "type" -> SString(8),
      "pkt-srcaddr" -> SString(64), "pkt-dstaddr" -> SString(64),
      "region" -> SString(32), "az-id" -> SString(32),
      "sublocation-type" -> SString(32), "sublocation-id" -> SString(32),
      "pkt-src-aws-service" -> SString(64), "pkt-dst-aws-service" -> SString(64),
      "flow-direction" -> SString(16), "traffic-path" -> SInteger)
      .map { case (n, t) => FieldSpec(n, t) },
    InputSerialization(compression = "GZIP", csvHeader = true,
      fieldDelimiter = " "),
    Map("Default" -> Seq("srcaddr", "dstaddr", "srcport", "dstport", "action"),
      "Extended" -> Seq("version", "account-id", "interface-id", "srcaddr",
        "dstaddr", "srcport", "dstport", "protocol", "packets", "bytes",
        "start", "end", "action", "log-status")))

  val cloudTrail: DataTypeSchema = DataTypeSchema(
    "CloudTrail",
    Seq("eventVersion" -> SFloat, "userIdentity" -> SJson,
      "eventTime" -> SDate, "eventSource" -> SString(255),
      "eventName" -> SString(255), "awsRegion" -> SString(255),
      "sourceIPAddress" -> SString(255), "userAgent" -> SString(512),
      "errorCode" -> SString(255), "errorMessage" -> SString(8192),
      "requestParameters" -> SJson, "responseElements" -> SJson,
      "additionalEventData" -> SJson, "requestID" -> SString(255),
      "eventID" -> SString(255), "eventType" -> SString(255),
      "recipientAccountId" -> SString(255), "vpcEndpointId" -> SString(255),
      "serviceEventDetails" -> SJson, "readOnly" -> SString(255),
      "resources" -> SJson).map { case (n, t) => FieldSpec(n, t) },
    InputSerialization(compression = "GZIP", jsonType = true,
      rootElement = "Records"),
    Map("Default" -> Seq("eventTime", "sourceIPAddress", "eventName",
      "errorCode")))

  val classicLB: DataTypeSchema = DataTypeSchema(
    "ClassicLB",
    Seq("timestamp" -> SString(64), "elb" -> SString(64),
      "client:port" -> SString(64), "backend:port" -> SString(255),
      "request_processing_time" -> SDouble,
      "backend_processing_time" -> SDouble,
      "response_processing_time" -> SDouble, "elb_status_code" -> SInteger,
      "backend_status_code" -> SInteger, "received_bytes" -> SBigint,
      "sent_bytes" -> SBigint, "request" -> SString(8192),
      "user_agent" -> SString(8192), "ssl_cipher" -> SString(255),
      "ssl_protocol" -> SString(8)).map { case (n, t) => FieldSpec(n, t) },
    InputSerialization(compression = "NONE", fieldDelimiter = " "),
    Map("Default" -> Seq("timestamp", "request", "backend_status_code",
      "backend_processing_time")))

  /** All 11 reference DataType schema documents, shipped as resources in the
    * reference's exact SSM wire format and parsed by [[parseDocument]]
    * (Logverz-Engine.json:1606-1770; the SetDataTypePlease placeholder is
    * excluded). */
  lazy val builtins: Map[String, DataTypeSchema] = {
    val names = Seq("VPCFlow", "CloudTrail", "ClassicLB", "ApplicationLB",
      "NetworkLB", "CloudFront", "CostDemoAWS", "CostDemoAzure",
      "WindowsDemoEvents", "Invocations", "ProcessingErrors")
    names.map { n =>
      val in = getClass.getResourceAsStream(s"/graft/schemas/$n.json")
      require(in != null, s"missing schema resource $n")
      val doc = new String(in.readAllBytes(), "UTF-8")
      n -> parseDocument(n, doc)
    }.toMap
  }
}
