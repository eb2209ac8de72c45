package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("heap top-k equals window row_number on the full dataset") {
    val o = Tables.orders(spark, TestSession.sfDir)
    val viaAgg = o.groupBy($"o_custkey")
      .agg(TopKAgg.topkAgg($"o_totalprice", $"o_orderkey", 3).as("top"))
      .select($"o_custkey", posexplode($"top"))
      .select($"o_custkey", ($"pos" + 1).as("rnk"), $"col.id".as("k"))
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = o.withColumn("rnk", row_number().over(w))
      .where($"rnk" <= 3)
      .select($"o_custkey", $"rnk".cast("long"), $"o_orderkey")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("buffer: bounded size, ordering, merge and serde round-trip") {
    val b = new TopKAgg.Buffer(3)
    Seq((1.0, 10L), (5.0, 2L), (3.0, 7L), (5.0, 1L), (0.5, 99L))
      .foreach { case (s, i) => b.offer(s, i) }
    // ties: score 5.0 → lower id first
    assert(b.sortedDesc.toSeq == Seq((5.0, 1L), (5.0, 2L), (3.0, 7L)))
    // merge keeps global best
    val c = new TopKAgg.Buffer(3)
    Seq((4.0, 3L), (6.0, 4L)).foreach { case (s, i) => c.offer(s, i) }
    c.foreach((s, i) => b.offer(s, i))
    assert(b.sortedDesc.toSeq == Seq((6.0, 4L), (5.0, 1L), (5.0, 2L)))
    // serde via the aggregate
    import org.apache.spark.sql.GraftSqlBridge.{expression => e}
    val agg = graft.functions.TopKAgg(e(lit(0.0)), e(lit(0L)), 3)
    val round = agg.deserialize(agg.serialize(b))
    assert(round.sortedDesc.toSeq == b.sortedDesc.toSeq)
  }
}
