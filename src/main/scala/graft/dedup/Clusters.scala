package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster formation: connected components over the verified
  * pair list, and survivor selection (keep the lowest-id member per
  * cluster) — the step that turns [[Dedup]]'s pairs into an actual
  * deduplicated corpus.
  *
  * The algorithm is alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014): each round
  * is two groupBy-join passes over the edge list keyed by node id, and the
  * edge set provably converges to one star per component (every node
  * pointing at the component minimum) in O(log² n) rounds — in practice a
  * handful, since LSH candidate generation already emits star-shaped pair
  * sets for oversized buckets ([[Dedup.cappedSelfJoinPairs]]). This is the
  * shape that survives 100 TB: no driver-side union-find (the component
  * table never visits the driver), no O(diameter) label propagation (a
  * chain of n near-dup docs converges in log rounds, not n), and every
  * pass is a plain shuffled aggregate/join on long-pair rows.
  *
  * Each round materializes via `localCheckpoint` — the loop is iterative,
  * so without truncation the lineage (and closure size) doubles per round;
  * on a cluster this would be `checkpoint` to reliable storage.
  */
object Clusters {

  /** Connected components of the undirected graph given as an edge list
    * `(idA, idB)`. Returns `(id, comp)` for every node that appears in an
    * edge, where `comp` is the minimum id in the node's component.
    * Nodes not present in any edge are absent (callers treat them as
    * singleton components — see [[survivors]]). */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxRounds: Int = 30): DataFrame = {
    var e = pairs
      .select(col(idA).cast("long").as("u"), col(idB).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull &&
        col("v").isNotNull)
      .distinct()
      .localCheckpoint()
    // The loop runs ~6 shuffled stages per round over an edge list that
    // is usually tiny relative to the corpus (dedup pair graphs are
    // sparse); at the session's corpus-sized shuffle partitioning each
    // round is mostly empty-task overhead. Size the loop's shuffles from
    // the materialized edge count (≥ ~100k edges per partition), restore
    // after. On a 100 TB run with billions of edges this leaves the
    // session setting untouched.
    val spark = pairs.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    var sig = signature(e)
    val loopParts = math.max(1L, math.min(prev.toLong,
      sig._1 / 100000L + 1L))
    spark.conf.set(key, loopParts.toString)
    var converged = false
    var round = 0
    try {
      while (!converged && round < maxRounds) {
        val next = smallStar(largeStar(e)).localCheckpoint()
        val nsig = signature(next)
        converged = nsig == sig
        sig = nsig
        e = next
        round += 1
      }
    } finally spark.conf.set(key, prev)
    require(converged,
      s"connectedComponents: no fixpoint after $maxRounds rounds")
    // At the fixpoint the edge set is one star per component; a node's
    // component is the least of itself and its neighbors.
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("comp"))
      .select(col("u").as("id"), col("comp"))
  }

  /** Large-star: every node attaches its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). Keeps components
    * connected while strictly shrinking large-id fan-out. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node attaches its smaller-or-equal neighbors (and
    * itself) to the minimum among them. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    dir.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Order-insensitive fingerprint of an edge set, for the convergence
    * check: row count plus a sum of per-edge hashes (commutative, so
    * partitioning doesn't matter; summed as decimal(38,0) — a long sum of
    * 64-bit hashes overflows under ANSI). One lightweight action per
    * round. */
  private def signature(e: DataFrame): (Long, String) = {
    val r = e.agg(count(lit(1)),
      sum(xxhash64(col("u"), col("v"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .collect()(0)
    (r.getLong(0), String.valueOf(r.get(1)))
  }

  /** Survivor selection: every doc keeps its cluster id (its own id when it
    * appears in no pair), and `kept` marks the cluster's minimum-id member
    * — the row a dedup pass would retain. The join is broadcast-friendly
    * when the pair graph is sparse (components ≪ corpus), which is the
    * normal crawl-dedup regime. */
  def survivors(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comp = connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    docs.join(comp, Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .withColumn("kept", col(idCol) === col("comp"))
  }
}
