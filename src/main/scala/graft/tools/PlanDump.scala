package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for registry queries to files — the
  * optimization-round evidence trail (plans/r08/<query>_{before,after}.txt).
  *
  * Usage:
  *   SPARK_GRAFT_ONLY=q99,q135 runMain graft.tools.PlanDump <sfDir> <outDir> <suffix>
  *
  * Runs under the same session confs as Bench (shuffle.partitions = cpus,
  * AQE on) so the captured initial plan matches what the bench executes.
  * Queries whose build path is not a single lazily-planned frame (e.g.
  * bounded streaming runs that execute during construction) still execute;
  * the dump then captures the plan of the RESULT frame, which is what the
  * timed `count()` recomputes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r08"
    val suffix = if (args.length > 2) args(2) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = graft.Scratch.sparkLocalDir("graft_plandump_local")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    if (only.exists(_.contains("internals"))) {
      // Building-block plans for operators whose registry queries execute
      // during construction (streaming twins, iterative descents) — the
      // final frame's explain hides the interesting stages behind
      // localCheckpoint scans, so dump the blocks the optimization round
      // actually rewrote.
      import org.apache.spark.sql.functions._
      val emb = graft.Tables.t(spark, sfDir, "embeddings")
      dump("internal_hnsw_adjacency",
        graft.similarity.Similarity.hnswAdjacency(emb))
      dump("internal_capped_pairs", {
        val buckets = emb.select((col("vec_id") % 97).as("bk"),
          col("vec_id").as("id"))
        graft.dedup.Dedup.cappedSelfJoinPairs(buckets, Seq("bk"), 256)
      })
      dump("internal_hnsw_append_edges", {
        val newV = emb.where(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("node"), col("embedding").as("cv"))
        val exV = emb.where(col("vec_id") % 10 =!= 0)
          .select(col("vec_id").as("node"), col("embedding").as("cv"))
        graft.similarity.Similarity.appendEdges(newV, exV, 3, 12, 8, 6, 64)
      })
      // q292 proof (round 9, verdict item 7): the registry query's final
      // explain hides every doubling round behind localCheckpoint scans,
      // so dump ONE round's real body (window-keyed representative min —
      // what q292 executes) beside the round-7 groupBy + join-back shape
      // it replaced, reconstructed here for the exchange-count contrast.
      locally {
        import org.apache.spark.sql.expressions.Window
        val toks = graft.operators.SpanQueries.suffixTokens(spark, sfDir)
        val posCap = 1L << 20
        val r1 = toks.withColumn("r",
          min(col("did") * posCap + col("p")).over(
            Window.partitionBy(col("w"))))
          .select(col("did"), col("p"), col("r"))
        dump("internal_suffix_round_window",
          graft.operators.SpanQueries.doublingPlan(r1, 1))
        dump("internal_suffix_round_joinback", {
          val paired = r1.select(col("did"), col("p"), col("r").as("ra"))
            .join(r1.select(col("did"), (col("p") - 1).as("p"),
              col("r").as("rb")), Seq("did", "p"))
          val reps = paired.groupBy(col("ra"), col("rb"))
            .agg(min(col("did") * posCap + col("p")).as("r2"))
          paired.join(reps, Seq("ra", "rb"))
            .select(col("did"), col("p"), col("r2").as("r"))
        })
      }
    }
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        only.forall(_.exists(p => p != "internals" && n.startsWith(p))) }
    selected.foreach { case (name, fn) => dump(name, fn(spark, sfDir)) }
    spark.stop()
  }
}
