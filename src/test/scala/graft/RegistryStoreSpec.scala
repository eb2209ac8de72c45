package graft

import java.nio.file.Files

import graft.registry.{QueryRegistry, RegistryStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RegistryStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def entry(q: String, t: Long, table: String) =
    QueryRegistry.Entry(q, t, "db", table, "VPCFlow", s"n$t", "C",
      "alice", "", Active = true, Archive = false)

  test("append/replay: last writer wins per key, tombstones delete") {
    val path = Files.createTempDirectory("graft_reglog").toString + "/log"
    val keys = Seq("UsersQuery", "UnixTime")
    RegistryStore.append(Seq(entry("q1", 1L, "t1"),
      entry("q2", 2L, "t2")).toDF(), path, seq = 0)
    // update q1 (same key, new table) at seq 1; delete q2 at seq 2
    RegistryStore.append(Seq(entry("q1", 1L, "t1b")).toDF(), path, seq = 1)
    RegistryStore.append(Seq(entry("q2", 2L, "t2")).toDF(), path, seq = 2,
      delete = true)
    val state = RegistryStore.replay(spark, path, keys)
    assert(state.count() == 1)
    val r = state.collect().head
    assert(r.getAs[String]("UsersQuery") == "q1" &&
      r.getAs[String]("TableName") == "t1b")
    assert(RegistryStore.latestSeq(spark, path) == 2L)
    // re-adding a deleted key at a later seq resurrects it
    RegistryStore.append(Seq(entry("q2", 2L, "t2c")).toDF(), path, seq = 3)
    val state2 = RegistryStore.replay(spark, path, keys)
    assert(state2.count() == 2)
    assert(state2.where($"UsersQuery" === "q2").collect().head
      .getAs[String]("TableName") == "t2c")
  }

  test("compact folds the log without changing state or latest seq") {
    val path = Files.createTempDirectory("graft_reglog2").toString + "/log"
    val keys = Seq("UsersQuery", "UnixTime")
    (0 until 5).foreach { i =>
      RegistryStore.append(Seq(entry("q1", 1L, s"t$i")).toDF(), path,
        seq = i.toLong)
    }
    RegistryStore.append(Seq(entry("gone", 9L, "x")).toDF(), path, seq = 5)
    RegistryStore.append(Seq(entry("gone", 9L, "x")).toDF(), path, seq = 6,
      delete = true)
    val before = RegistryStore.replay(spark, path, keys)
      .orderBy("UsersQuery").collect().map(_.toString).toSeq
    RegistryStore.compact(spark, path, keys)
    val after = RegistryStore.replay(spark, path, keys)
      .orderBy("UsersQuery").collect().map(_.toString).toSeq
    assert(before == after)
    assert(RegistryStore.latestSeq(spark, path) == 6L)
    // compacted log holds only live rows
    assert(spark.read.parquet(path).count() == 1)
  }

  test("registry round-trip: record, persist, replay, query") {
    val path = Files.createTempDirectory("graft_reglog3").toString + "/log"
    var reg = QueryRegistry.empty(spark)
    reg = QueryRegistry.record(reg, entry("SELECT 1", 1L, "t1"))
    reg = QueryRegistry.record(reg, entry("SELECT 2", 2L, "t1"))
    RegistryStore.append(reg, path, seq = 0)
    val loaded = RegistryStore.replay(spark, path,
      Seq("UsersQuery", "UnixTime"))
    // deactivation of the earlier same-table query survives persistence
    val active = QueryRegistry.activeQueries(loaded)
      .select($"UsersQuery").as[String].collect().toSeq
    assert(active == Seq("SELECT 2"))
  }
}
