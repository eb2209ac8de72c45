package graft

import graft.dedup.Clusters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** Driver-side union-find reference implementation. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("connected components on hand-built shapes") {
    // two triangles bridged, one chain, one isolated pair, self-loop noise
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),          // triangle -> comp 1
      (10, 11), (11, 12), (12, 10),    // triangle -> comp 10
      (3, 10),                         // bridge: both triangles -> comp 1
      (20, 21), (21, 22), (22, 23),    // chain -> comp 20
      (30, 31),                        // pair -> comp 30
      (40, 40))                        // self loop: dropped, node absent
    val got = ccOf(edges)
    val want = Map[Long, Long](
      1L -> 1, 2L -> 1, 3L -> 1, 10L -> 1, 11L -> 1, 12L -> 1,
      20L -> 20, 21L -> 20, 22L -> 20, 23L -> 20, 30L -> 30, 31L -> 30)
    assert(got == want)
  }

  test("connected components match union-find on random graphs") {
    val rnd = new Random(42)
    for (trial <- 0 until 3) {
      val n = 200
      val edges = Seq.fill(150 + trial * 50)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(edges)
      assert(ccOf(edges) == want, s"trial $trial diverged from union-find")
    }
  }

  test("long chain converges (log rounds, not diameter rounds)") {
    // a 128-node path: naive min-label propagation needs 127 rounds;
    // alternating star must finish well under the 30-round guard
    val edges = (0L until 127L).map(i => (i, i + 1))
    val got = ccOf(edges)
    assert(got.size == 128 && got.values.forall(_ == 0L))
  }

  test("survivors keep exactly the min id per cluster, singletons kept") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Clusters.survivors(docs, pairs)
      .select(col("doc_id"), col("comp"), col("kept"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (9L, 9L, true)))
  }
}
