package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-probe runner: like Bench but per-query it also reports OUTPUT
  * ROWS, which is what separates workload growth from operator growth
  * when probing replicated data (ScaleUp plants 10-member near-dup
  * clusters, so pair-producing queries' true output grows ~C(10,2)/copy
  * — a wall-time ratio is only meaningful next to the row ratio).
  *
  * Usage: SPARK_GRAFT_ONLY=q135,q191 runMain graft.tools.Probe <sfDir>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // shuffle/spill scratch on tmpfs like Bench: a decade-probe query
    // shuffles GBs, and the container disk writes ~10 MB/s — without
    // this the probe measures the disk, not the operator (q30 at sf10
    // measured 782 s with /tmp scratch vs ~200 s on tmpfs)
    val localDir = graft.Scratch.sparkLocalDir("graft_probe_local")
    val spark = SparkSession.builder()
      .appName("graft-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val rows =
          try fn(spark, sfDir).count()
          catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name rows=$rows%d sec=$sec%.1f")
      }
    } finally spark.stop()
  }
}
