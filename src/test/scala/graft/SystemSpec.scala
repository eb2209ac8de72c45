package graft

import graft.ops.Audit
import graft.registry.QueryRegistry
import graft.similarity.Similarity
import graft.sources.FolderWalk
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SystemSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("query registry deactivates prior queries on the same table") {
    import QueryRegistry._
    var reg = empty(spark)
    reg = record(reg, Entry("q1", 1L, "db", "t", "D", "a", "Batch", "o", "",
      Active = true, Archive = false))
    reg = record(reg, Entry("q2", 2L, "db", "t", "D", "b", "Batch", "o", "",
      Active = true, Archive = false))
    val active = activeQueries(reg).select("UsersQuery").as[String].collect()
    assert(active.toSeq == Seq("q2"))
    assert(byTable(reg, "db", "t").count() == 2)
  }

  test("audit latestStatus picks the newest heartbeat per invocation") {
    val rows = Audit.toDF(spark, Seq(
      Audit.StatusRow("j1", "i1", 10L, "INVOKED", "g", "s"),
      Audit.StatusRow("j1", "i1", 20L, "RUNNING", "g", "s"),
      Audit.StatusRow("j1", "i1", 30L, "COMPLETED", "g", "s"),
      Audit.StatusRow("j1", "i2", 15L, "RUNNING", "g", "s")))
    val latest = Audit.latestStatus(rows)
      .select("invocationid", "status").as[(String, String)].collect().toMap
    assert(latest == Map("i1" -> "COMPLETED", "i2" -> "RUNNING"))
    val done = Audit.completedJobs(rows).select("jobid").as[String].collect()
    assert(done.isEmpty) // i2 still RUNNING
  }

  test("folder walk respects depth and finds partition leaves") {
    val root = java.nio.file.Files.createTempDirectory("graft_walk").toString
    Tables.documents(spark, TestSession.sfDir).limit(50)
      .select($"doc_id", $"lang", $"source")
      .write.mode("overwrite").partitionBy("lang").parquet(root)
    val depth1 = FolderWalk.walk(spark, Seq(root), 1)
    assert(depth1.nonEmpty && depth1.forall(_.contains("lang=")))
    val depth0 = FolderWalk.walk(spark, Seq(root), 0)
    assert(depth0.map(_.stripPrefix("file:")) == Seq(root))
  }

  test("NoSQL visibility filter: owner/access/admin semantics (P7)") {
    import graft.operators.NoSqlDsl
    val df = Seq(
      ("q1", "alice,bob", "carol"),
      ("q2", "dave", "alice"),
      ("q3", "dave", "eve")).toDF("name", "Owners", "Access")
    def vis(u: String, admin: Boolean = false) =
      NoSqlDsl.visibilityFilter(df, u, admin).select("name")
        .as[String].collect().toSet
    assert(vis("alice") == Set("q1", "q2"))
    assert(vis("carol") == Set("q1"))
    assert(vis("nobody") == Set.empty)
    assert(vis("nobody", admin = true) == Set("q1", "q2", "q3"))
  }

  test("NoSQL PutItem guard: C-type rows keep DatabaseName/TableName") {
    import graft.operators.NoSqlDsl
    import graft.registry.QueryRegistry._
    val reg = record(record(empty(spark),
      Entry("q1", 1L, "prod", "secure", "VPCFlow", "c1", "C", "alice", "",
        Active = true, Archive = false)),
      Entry("q2", 2L, "prod", "open", "VPCFlow", "a1", "A", "bob", "",
        Active = true, Archive = false))
    // escalation attempt on the collection row: both guarded fields stick
    val afterEsc = NoSqlDsl.putItem(reg,
      Map("UsersQuery" -> "q1", "UnixTime" -> 1L),
      Map("DatabaseName" -> "evil", "TableName" -> "stolen",
        "QueryName" -> "ok"))
    val r1 = afterEsc.where($"UsersQuery" === "q1").collect().head
    assert(r1.getAs[String]("DatabaseName") == "prod")
    assert(r1.getAs[String]("TableName") == "secure")
    assert(r1.getAs[String]("QueryName") == "ok") // non-guarded field moved
    // analysis row: payload wins (reference else-branch)
    val afterMove = NoSqlDsl.putItem(reg,
      Map("UsersQuery" -> "q2", "UnixTime" -> 2L),
      Map("DatabaseName" -> "archive", "TableName" -> "moved"))
    val r2 = afterMove.where($"UsersQuery" === "q2").collect().head
    assert(r2.getAs[String]("DatabaseName") == "archive")
    assert(r2.getAs[String]("TableName") == "moved")
    // payload can never rewrite key attributes
    val afterKeySmuggle = NoSqlDsl.putItem(reg,
      Map("UsersQuery" -> "q2", "UnixTime" -> 2L),
      Map("UnixTime" -> 999L, "QueryName" -> "renamed"))
    assert(afterKeySmuggle.where($"UnixTime" === 999L).isEmpty)
    assert(afterKeySmuggle.where($"UsersQuery" === "q2")
      .collect().head.getAs[String]("QueryName") == "renamed")
    // insert-if-absent, then point delete removes exactly that row
    val inserted = NoSqlDsl.putItem(reg,
      Map("UsersQuery" -> "q3", "UnixTime" -> 3L),
      Map("DatabaseName" -> "dev", "TableName" -> "t", "DataType" -> "X",
        "QueryName" -> "new", "QueryType" -> "A", "Owners" -> "eve",
        "Access" -> "", "Active" -> true, "Archive" -> false))
    assert(inserted.count() == 3)
    val deleted = NoSqlDsl.deleteItem(inserted,
      Map("UsersQuery" -> "q3", "UnixTime" -> 3L))
    assert(deleted.count() == 2 &&
      deleted.where($"UsersQuery" === "q3").isEmpty)
  }

  test("catalog create-or-replace and drop round-trip") {
    import graft.catalog.CatalogOps
    val df = Tables.region(spark, TestSession.sfDir)
    CatalogOps.createOrReplace(df, "graft_cat_test")
    assert(spark.catalog.tableExists("graft_cat_test"))
    assert(CatalogOps.describeTable(spark, "graft_cat_test").count() == 2)
    assert(CatalogOps.dropTable(spark, "graft_cat_test"))
    assert(!CatalogOps.dropTable(spark, "graft_cat_test")) // already gone
  }

  test("q266 identity sync: noise-only change filtered, cascades minus " +
    "planned set, removals name-keyed") {
    val d = TestSession.sfDir
    val plan = operators.SystemQueries
      .queries("q266_identity_sync")(spark, d).collect()
    // an entity appears at most once in the plan (rundiff precedence)
    assert(plan.groupBy(r => (r.getString(0), r.getString(1)))
      .forall(_._2.length == 1))
    val users = plan.filter(_.getString(0) == "user")
    def names(reason: String) =
      users.filter(_.getString(3) == reason).map(_.getString(1)).toSet
    // independent derivation straight from the planted predicates
    val c = Tables.customer(spark, d).select("c_custkey", "c_name")
      .as[(Long, String)].collect()
    def inOld(k: Long) = k % 19 != 3
    def inNew(k: Long) = k % 23 != 5
    val changedExp =
      c.collect { case (k, n) if inOld(k) && inNew(k) && k % 11 == 0 => n }
        .toSet
    // k % 13 == 0 attach-only mutations exist but must NOT plan rows —
    // the filterproperties AttachmentCount omission
    assert(c.exists { case (k, _) =>
      inOld(k) && inNew(k) && k % 13 == 0 && k % 11 != 0 })
    assert(names("changed") == changedExp)
    assert(names("new") ==
      c.collect { case (k, n) if !inOld(k) && inNew(k) => n }.toSet)
    assert(names("removed") ==
      c.collect { case (k, n) if inOld(k) && !inNew(k) => n }.toSet)
    val casc = names("group_cascade") ++ names("policy_cascade")
    assert(casc.nonEmpty)
    assert(casc.intersect(names("changed") ++ names("new")).isEmpty)
    assert(names("group_cascade").intersect(names("policy_cascade")).isEmpty)
  }

  test("IVF assigns every vector to a cell and recall is sane") {
    val emb = Tables.embeddings(spark, TestSession.sfDir)
    val cents = Similarity.ivfCentroids(emb, 8)
    assert(cents.length == 8)
    val assigned = Similarity.ivfAssign(emb, cents)
    assert(assigned.count() == emb.count())
    assert(assigned.select("cell").distinct().count() <= 8)
    val rec = Similarity.ivfRecall(emb.where($"vec_id" < 5), emb, 5,
      nCells = 8, nProbe = 8) // probe all cells → recall must be 1.0
    assert(rec.collect().forall(_.getAs[Double]("recall") == 1.0))
  }
}
