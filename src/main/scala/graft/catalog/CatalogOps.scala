package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DDL-ish catalog helpers — the reference's list/describe/drop surface
  * (reference sources/webrtcproxy/sqlproxy.mjs:79-133, sources/shared/
  * enginesharedv3.mjs:319-438), expressed over `spark.catalog`.
  */
object CatalogOps {

  /** ListTables with the DSL's LIKE filter (sqlproxy.mjs:79-94: a
    * `Table Name: {<like>: pattern}` post-filter over showAllTables).
    * SQL LIKE wildcards (%/_) are honored. */
  def listTables(spark: SparkSession, likePattern: Option[String] = None)
      : DataFrame = {
    val all = spark.catalog.listTables()
      .select(col("name"), col("tableType"), col("isTemporary"))
    likePattern.fold(all)(p => all.where(col("name").like(p)))
      .orderBy(col("name"))
  }

  /** Describe: column name/type rows for a table (sqlproxy.mjs Describe
    * mode). */
  def describeTable(spark: SparkSession, table: String): DataFrame =
    spark.catalog.listColumns(table)
      .select(col("name"), col("dataType"), col("nullable"))
      .orderBy(col("name"))

  /** Drop + registry deactivation analog (enginesharedv3.mjs:409-438:
    * `Query.drop()` then mark the registry row inactive). Returns whether
    * the table existed. */
  def dropTable(spark: SparkSession, table: String): Boolean = {
    val existed = spark.catalog.tableExists(table)
    if (existed) spark.sql(s"DROP TABLE IF EXISTS `$table`")
    existed
  }

  /** Create-or-replace from a DataFrame — `sync({force:true})` analog
    * (enginesharedv3.mjs:319-336). */
  def createOrReplace(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(table)
}
