package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe data generator: replicates a TESTDATA sf directory N× with
  * per-copy key offsets, preserving join relationships within each copy
  * and colliding nowhere across copies. Used to probe the heavy bench
  * tail one decade above the driver's largest fixture (sf0.1 × 10 ≈ sf1)
  * — wall time should grow ≲ linearly and no plan should flip to a
  * broadcast overflow or single-task stage.
  *
  * Copied documents get a per-copy suffix token (and n_chars updated), so
  * the dedup pipelines see 10-member near-dup clusters per source doc —
  * deliberately exercising the bucket-cap/star path rather than handing
  * byte-identical text to every stage. Copied embeddings stay
  * byte-identical: 10-deep LSH buckets stress candidate generation.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <factor>
  */
object ScaleUp {
  /** Key offset between copies — far above every source key range, so
    * joins never cross copies. */
  val CopyOffset = 10000000000L

  val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def scaleTable(df: DataFrame, table: String, factor: Int): DataFrame =
    keyCols.get(table) match {
      case None => df // region/nation are dimensions; keep them
      case Some(keys) =>
        (0 until factor).map { i =>
          val shifted = keys.foldLeft(df)((d, k) =>
            d.withColumn(k, col(k) + lit(i * CopyOffset)))
          if (table == "documents" && i > 0) {
            val suffix = s" copy$i"
            shifted
              .withColumn("text", concat(col("text"), lit(suffix)))
              .withColumn("n_chars", col("n_chars") + lit(suffix.length.toLong))
          } else if (table == "customer" && i > 0) {
            // per-copy 3-char tag of one repeated letter: cross-copy name
            // pairs sit at edit distance 3 (> the fuzzy-join threshold),
            // so the true pair count scales linearly with the copy factor
            // instead of quadratically (10 byte-identical copies of every
            // name would plant 45 extra true pairs per name — workload
            // growth, not operator growth)
            val tag = ('a' + (i - 1) % 26).toChar.toString * 3
            shifted.withColumn("c_name", concat(col("c_name"), lit(tag)))
          } else shifted
        }.reduce(_ unionByName _)
    }

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .appName("graft-scaleup")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      for (t <- graft.Tables.all) {
        // raw read: events ts stays long nanos, exactly what Tables.t
        // expects to find and convert
        val df = spark.read.parquet(s"$src/$t.parquet")
        val scaled = scaleTable(df, t, factor)
        if (t == "events") {
          // q37's streaming source globs the literal FILE name
          // "events.parquet", so events must be a single file — written
          // with small row groups so the scan still splits (a
          // single-row-group file scans as ONE task, which measures the
          // layout artifact, not the operator).
          val stage = s"$dst/.stage_$t"
          scaled.coalesce(1).write.mode("overwrite")
            .option("parquet.block.size", (4 * 1024 * 1024).toString)
            .parquet(stage)
          val part = new java.io.File(stage).listFiles()
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"no part file for $t"))
          val target = java.nio.file.Paths.get(dst, s"$t.parquet")
          java.nio.file.Files.deleteIfExists(target)
          java.nio.file.Files.move(part.toPath, target)
          new java.io.File(stage).listFiles().foreach(_.delete())
          new java.io.File(stage).delete()
        } else {
          // batch reads accept a directory named <t>.parquet; many part
          // files give the scan the per-file parallelism a real 100 TB
          // lake has
          scaled.write.mode("overwrite").parquet(s"$dst/$t.parquet")
        }
        println(s"[scaleup] $t x$factor -> $dst/$t.parquet")
      }
    } finally spark.stop()
  }
}
