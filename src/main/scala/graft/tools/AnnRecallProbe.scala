package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw ANN recall measurement across index classes — the numbers behind
  * q176/q308's committed recall bounds (the gate queries emit BOOLEANS
  * so the oracle stays SQL-expressible; this probe prints the measured
  * values the bounds must sit under, per sf).
  *
  * Usage: runMain graft.tools.AnnRecallProbe <sfDir> [<sfDir> ...]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.local.dir",
        graft.Scratch.sparkLocalDir("graft_probe_local"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try dirs.foreach { d =>
      val k = 10
      val emb = graft.Tables.embeddings(spark, d)
      val qs = emb.where(col("vec_id") < 10)
      val truth = graft.similarity.Similarity.bruteForceTopK(qs, emb, k)
        .select(col("query_id"), col("neighbor_id"))
      def recall(approx: org.apache.spark.sql.DataFrame): Double = {
        val hits = truth.join(approx.select(col("query_id"),
          col("neighbor_id")), Seq("query_id", "neighbor_id")).count()
        hits.toDouble / truth.count()
      }
      val hnsw = recall(graft.similarity.Similarity.hnswTopK(qs, emb, k))
      val ivf = recall(graft.similarity.Similarity
        .ivfTopK(qs, emb, k, nCells = 16, nProbe = 4))
      val lsh = recall(graft.similarity.Similarity
        .lshTopK(qs, emb, k, nTables = 8, bitsPerTable = 4))
      // incrementally-appended store (build 90% + append 10%), fresh dir
      val adir = graft.Scratch.runDir("graft_hnsw_append_probe")
      graft.similarity.Similarity.saveHnswIndex(
        emb.where(col("vec_id") % 10 =!= 0), adir)
      graft.similarity.Similarity.appendHnswIndex(
        emb.where(col("vec_id") % 10 === 0), adir)
      val app = recall(graft.similarity.Similarity
        .hnswTopKIndexed(qs, adir, k))
      // streamed store (3 micro-batch continuous build)
      val stream = recall(graft.operators.ScaleQueries.streamHnswRun(
        spark, d, graft.Scratch.runDir("graft_hnsw_stream_probe"), None))
      println(f"RECALL $d hnsw=$hnsw%.3f ivf=$ivf%.3f lsh=$lsh%.3f " +
        f"hnsw_append=$app%.3f hnsw_stream=$stream%.3f")
    } finally spark.stop()
  }
}
