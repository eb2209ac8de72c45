package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value- and plan-level checks for the graph layer (GraphQueries). The
  * DuckDB gate proves engine equivalence; these prove the SEMANTICS (rank
  * mass conservation, degree/wedge arithmetic, an independent brute-force
  * triangle recount) and the scale shape (equi-joins only — a nested-loop
  * closing join is the classic triangle-count scale killer).
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q251 ranks cover every nation and conserve mass up to integer " +
    "truncation") {
    val rows = run("q251_pagerank").collect()
    assert(rows.length == 25)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ > 0))
    // each of the 3 iterations loses < 1 unit per edge-div + per-damping
    // div per node; with |V|=25 the total drift stays well inside 5%
    val mass = ranks.sum
    assert(mass <= 1000000L && mass >= 950000L,
      s"rank mass must stay near 1e6, got $mass")
    // output is rank-descending, name-tiebroken
    val sorted = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(sorted == sorted.sorted)
  }

  test("q252 triangle arithmetic holds and matches a brute-force recount") {
    val r = run("q252_triangles").head()
    val (nv, ne, nWedges, nTri, clus) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(nv <= 25 && ne <= nv * (nv - 1) / 2)
    assert(3 * nTri <= nWedges, "each triangle closes exactly 3 wedges")
    assert(clus == 3000 * nTri / nWedges && clus <= 1000)
    // brute-force recount over the (tiny here, test-only) edge set
    val edges = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").as("src"))
      .join(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, sf)
        .select(col("s_suppkey"), col("s_nationkey").as("dst")),
        col("l_suppkey") === col("s_suppkey"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).toSet
    val verts = edges.flatMap(e => Set(e._1, e._2)).toSeq.sorted
    var brute = 0L
    for {
      i <- verts.indices; j <- (i + 1) until verts.length
      if edges.contains((verts(i), verts(j)))
      k <- (j + 1) until verts.length
      if edges.contains((verts(j), verts(k))) &&
        edges.contains((verts(i), verts(k)))
    } brute += 1
    assert(nTri == brute, s"triangle count $nTri vs brute-force $brute")
  }

  /** Nested-loop joins are only acceptable as the Cross glue between
    * 1-row aggregates; any keyed join falling back to a nested loop is
    * the scale killer these pins exist for. */
  private def assertKeyedJoinsHashed(p: String): Unit =
    p.linesIterator.filter(_.contains("NestedLoopJoin")).foreach { l =>
      assert(l.contains("Cross"),
        s"keyed join must not nested-loop: $l")
    }

  test("q252 closing join is an equi-join, never a nested loop") {
    val p = run("q252_triangles").queryExecution.executedPlan.toString
    assertKeyedJoinsHashed(p)
    assert(p.contains("LeftSemi"),
      s"wedge closing must be a semi equi-join:\n$p")
  }

  test("q251 iterations stay equi-joined with partial aggregation") {
    val p = run("q251_pagerank").queryExecution.executedPlan.toString
    assertKeyedJoinsHashed(p)
    assert(!p.contains("CartesianProduct"),
      s"PageRank iterations must stay equi-joined:\n$p")
    assert(p.contains("HashAggregate"),
      "contribution sums must partial-aggregate")
  }

  test("q286 label propagation matches an independent synchronous " +
      "recomputation and finds the planted 10-key groups") {
    val keys = Tables.customer(spark, TestSession.sfDir)
      .select(org.apache.spark.sql.functions.col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    val eo = (for {
      k <- keys.toSeq; d <- Seq(1L, 2L, 3L)
      if (k - d) / 10 == k / 10 && keys(k - d)
    } yield (k, k - d)) ++
      keys.toSeq.filter(k => k % 97 == 0 && keys(k - 7)).map(k => (k, k - 7))
    val adj = (eo ++ eo.map(_.swap)).distinct
      .groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    def step(l: Map[Long, Long]): Map[Long, Long] =
      keys.iterator.map { k =>
        adj.get(k) match {
          case None => k -> l(k)
          case Some(ns) =>
            val counts = ns.map(l).groupBy(identity)
              .map { case (lb, xs) => (lb, xs.size) }
            k -> counts.toSeq.minBy { case (lb, c) => (-c, lb) }._1
        }
      }.toMap
    val l0 = keys.iterator.map(k => k -> k).toMap
    val l3 = step(step(step(l0)))
    val want = l3.values.groupBy(identity).map(_._2.size)
      .groupBy(identity).map { case (sz, cs) =>
        (sz.toLong, cs.size.toLong) }
    val got = SparkEntry.queries("q286_label_propagation")(
        spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    // the planted 10-key near-cliques dominate: most nodes converge to
    // size-10 communities within three rounds
    val n = keys.size.toLong
    val inTens = got.getOrElse(10L, 0L) * 10
    assert(inTens * 10 >= n * 8,
      s"only $inTens of $n nodes in size-10 communities")
  }
}
