package graft.operators

import graft.{Det, Tables => T}
import graft.jobs.CollectJob
import graft.ops.Audit
import graft.registry.QueryRegistry
import graft.similarity.Similarity
import graft.sources.FolderWalk
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** System-surface queries: transforms seam, query registry lifecycle, audit
  * status views, folder enumeration, BPE token counting, IVF ANN. */
object SystemQueries {

  /** Partitioned-directory fixture for the folder walk (lang=X/source=Y
    * leaves — the S3-prefix layout log producers use). */
  private[graft] def walkFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "walk")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.documents(s, d).select(col("doc_id"), col("lang"), col("source"))
        .write.mode("overwrite")
        .partitionBy("lang", "source").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TransForms seam, live (SURVEY §2.10) ---------------------------
    "q40_transforms" -> ((s, d) => {
      val dir = ReferenceQueries.csvFixture(s, d)
      CollectJob.run(s, CollectJob.Spec(
        schema = ReferenceQueries.lineitemSchema,
        paths = Seq(dir),
        datasetName = "lineitem_transformed",
        transforms = Seq(
          "revenue" -> col("l_extendedprice") * (lit(1) - col("l_discount")),
          "ship_year" -> year(col("l_shipdate")))))
        .groupBy(col("ship_year"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("revenue")).as("sum_revenue"))
        .orderBy(col("ship_year"))
    }),

    // ---- query-registry lifecycle (SURVEY §1.1) -------------------------
    "q41_query_registry" -> ((s, d) => {
      import QueryRegistry._
      var reg = empty(s)
      reg = record(reg, Entry("SELECT 1", 1000L, "db1", "t1", "VPCFlow",
        "first", "Batch", "alice", "bob", Active = true, Archive = false))
      reg = record(reg, Entry("SELECT 2", 2000L, "db1", "t2", "CloudTrail",
        "second", "Batch", "alice", "", Active = true, Archive = false))
      reg = record(reg, Entry("SELECT 3", 3000L, "db1", "t1", "VPCFlow",
        "third", "Continuous", "carol", "", Active = true, Archive = false))
      activeQueries(reg)
        .select(col("UsersQuery"), col("UnixTime"), col("TableName"),
          col("QueryName"), col("QueryType"))
        .orderBy(col("UnixTime"))
    }),

    // ---- NoSQL write path: PutItem merge + escalation guard, DeleteItem
    // (nosql.js:309-354,169-196). The final registry state after a blocked
    // escalation attempt (C-type row keeps its DatabaseName/TableName), a
    // legitimate analysis-row move, an insert, and a point delete — the
    // oracle is the independently-derived expected end state.
    "q54_nosql_put" -> ((s, d) => {
      import QueryRegistry._
      var reg = empty(s)
      reg = record(reg, Entry("SELECT *", 1000L, "proddb", "secure_t",
        "VPCFlow", "collect1", "C", "alice", "", Active = true,
        Archive = false))
      reg = record(reg, Entry("SELECT a", 2000L, "proddb", "open_t",
        "CloudTrail", "analysis1", "A", "bob", "", Active = true,
        Archive = false))
      reg = record(reg, Entry("SELECT b", 3000L, "devdb", "t3",
        "VPCFlow", "collect2", "C", "carol", "", Active = true,
        Archive = false))
      // escalation attempt: payload tries to re-point the C-type row at a
      // different database/table — the guard restores both
      reg = NoSqlDsl.putItem(reg,
        key = Map("UsersQuery" -> "SELECT *", "UnixTime" -> 1000L),
        payload = Map("DatabaseName" -> "evil_db", "TableName" -> "stolen",
          "QueryName" -> "renamed"))
      // analysis rows may move (reference else-branch merges payload as-is)
      reg = NoSqlDsl.putItem(reg,
        key = Map("UsersQuery" -> "SELECT a", "UnixTime" -> 2000L),
        payload = Map("DatabaseName" -> "archive_db",
          "QueryName" -> "analysis1v2"))
      // insert-if-absent
      reg = NoSqlDsl.putItem(reg,
        key = Map("UsersQuery" -> "SELECT c", "UnixTime" -> 4000L),
        payload = Map("DatabaseName" -> "newdb", "TableName" -> "new_t",
          "DataType" -> "Custom", "QueryName" -> "fresh",
          "QueryType" -> "A", "Owners" -> "dave", "Access" -> "",
          "Active" -> true, "Archive" -> false))
      // point delete (Logverz-Queries key pair)
      reg = NoSqlDsl.deleteItem(reg,
        Map("UsersQuery" -> "SELECT b", "UnixTime" -> 3000L))
      reg.select(col("UsersQuery"), col("UnixTime"), col("DatabaseName"),
        col("TableName"), col("QueryName"), col("QueryType"))
        .orderBy(col("UnixTime"))
    }),

    // ---- identities: association + end-to-end auth decisions ------------
    // Two users resolved against a group/policy registry
    // (AssociateUserPolicies semantics); the output row per user carries
    // the expanded policy counts and the final deny-first decisions, and
    // the oracle states the independently-derived expected results.
    "q58_identity_assoc" -> ((s, d) => {
      import graft.auth.{Identities => I}
      import graft.auth.IamPolicy
      val allowSelect = "{'Statement':[{'Effect':'Allow'," +
        "'Action':'sql:Select','Resource':'*'}]}"
      val denyDrop = "{'Statement':[{'Effect':'Deny'," +
        "'Action':'sql:Drop','Resource':'*'}]}"
      val managed = "{'Statement':[{'Effect':'Allow'," +
        "'Action':'sql:Describe','Resource':'*'}]}"
      val reg = I.toDF(s, Seq(
        I.Entry("analysts", "GroupAWS", IAM = true, Nil, Nil,
          Seq(denyDrop), Seq(allowSelect), Nil, None),
        I.Entry("admins", "GroupAWS", IAM = true, Nil, Nil,
          Nil, Seq("{'Statement':[{'Effect':'Allow','Action':'*'," +
            "'Resource':'*'}]}"), Nil, None),
        I.Entry("ReadOnlyAccess", "PolicyAWS", IAM = true, Nil, Nil,
          Nil, Nil, Nil, Some(managed))))
      val users = Seq(
        I.addUser("dana", "UserGoogle", iamGroups = Seq("analysts"),
          iamPolicies = Seq("ReadOnlyAccess")),
        I.addUser("root", "UserAWS", iamGroups = Seq("admins")))
      import s.implicits._
      users.map { u =>
        val e = I.associateUserPolicies(reg, u)
        (u.Name,
          e.GroupInline.length, e.GroupAttached.length,
          e.UserAttached.length,
          I.decide(reg, u, "sql:Select", "*").toString,
          I.decide(reg, u, "sql:Drop", "*").toString)
      }.toDF("Name", "n_inline", "n_attached", "n_user",
        "select_decision", "drop_decision")
        .orderBy(col("Name"))
    }),

    // ---- identity sync: IAM snapshot diff -> registry action plan -------
    // The engine analog of the reference's identitysync Lambda
    // (sources/identitysync/identitysync.js:383 `rundiff` + :263
    // `processidentitiesneworchanged` + :221 `processidentitiesremoved`):
    // two AccountAuthorizationDetails snapshots (users/groups/policies)
    // diff into a put/delete action plan. Semantics mirrored exactly:
    // new+changed entries key on Arn, removals key on Name
    // (identitysync.js:443-455 uses UserName/PolicyName/GroupName),
    // change detection ignores the AttachmentCount-class noise column
    // (:496 `filterproperties` omits it before the deep-equal), members
    // of new-or-changed GROUPS cascade into the changed-user list unless
    // already listed (:466-485), and users linked to new-or-changed
    // POLICIES are re-persisted unless already planned (:283-292
    // `getlinkedidentities` -> PersistAWSUserChange; we model every
    // linked identity as an AWS user). Snapshots derive from customer/
    // nation/supplier with deterministic planted rules so the oracle
    // reconstructs them virtually. Scale shape: each entity class is one
    // key-co-partitioned full-outer/anti join projected to (arn, name,
    // compare-cols) in the scan; the cascade joins broadcast tiny
    // changed-key sets against the new snapshot; output is bounded by
    // change volume, never snapshot size — the CDC-diff shape that holds
    // when the identity store is 10^9 rows.
    "q266_identity_sync" -> ((s, d) => {
      val cst = T.customer(s, d)
      val ns = T.supplier(s, d).agg(count(lit(1)).as("ns"))
      def users(pred: org.apache.spark.sql.Column, mutate: Boolean) =
        cst.where(pred).crossJoin(broadcast(ns)).select(
          concat(lit("arn:user/"), col("c_name")).as("arn"),
          col("c_name").as("name"), col("c_nationkey").as("gkey"),
          (if (mutate)
             when(col("c_custkey") % 11 === 0, lit("MOVED"))
               .otherwise(col("c_mktsegment"))
           else col("c_mktsegment")).as("seg"),
          (lit(1L) + col("c_custkey") % col("ns")).as("pkey"),
          (if (mutate)
             when(col("c_custkey") % 13 === 0, lit(2)).otherwise(lit(1))
           else lit(1)).as("attach"))
      val oldU = users(col("c_custkey") % 19 =!= 3, mutate = false)
      val newU = users(col("c_custkey") % 23 =!= 5, mutate = true)
      val nat = T.nation(s, d)
      val oldG = nat.select(
        concat(lit("arn:group/"), col("n_name")).as("arn"),
        col("n_name").as("name"), col("n_nationkey").as("gkey"),
        col("n_regionkey").as("rk"))
      val newG = nat.where(col("n_nationkey") % 11 =!= 9).select(
        concat(lit("arn:group/"), col("n_name")).as("arn"),
        col("n_name").as("name"), col("n_nationkey").as("gkey"),
        when(col("n_nationkey") % 7 === 2, col("n_regionkey") + 10)
          .otherwise(col("n_regionkey")).as("rk"))
      val sup = T.supplier(s, d)
      val oldP = sup.where(col("s_suppkey") % 10 =!= 7).select(
        concat(lit("arn:policy/"), col("s_name")).as("arn"),
        col("s_name").as("name"), col("s_suppkey").as("pkey"),
        col("s_nationkey").as("pv"))
      val newP = sup.where(col("s_suppkey") % 17 =!= 4).select(
        concat(lit("arn:policy/"), col("s_name")).as("arn"),
        col("s_name").as("name"), col("s_suppkey").as("pkey"),
        when(col("s_suppkey") % 9 === 1, col("s_nationkey") + 50)
          .otherwise(col("s_nationkey")).as("pv"))
      // generic rundiff: Arn-keyed new/changed, Name-keyed removed
      def diff(o: DataFrame, n: DataFrame, ety: String,
               changed: org.apache.spark.sql.Column)
          : (DataFrame, DataFrame, DataFrame) = {
        val j = o.as("o").join(n.as("n"),
          col("o.arn") === col("n.arn"), "full_outer")
        (j.where(col("o.arn").isNull)
           .select(lit(ety).as("entity_type"), col("n.name").as("name"),
             lit("put").as("action"), lit("new").as("reason")),
         j.where(col("o.arn").isNotNull && col("n.arn").isNotNull &&
             changed)
           .select(lit(ety).as("entity_type"), col("n.name").as("name"),
             lit("put").as("action"), lit("changed").as("reason")),
         o.join(n, Seq("name"), "left_anti")
           .select(lit(ety).as("entity_type"), col("name"),
             lit("delete").as("action"),
             lit("removed").as("reason")))
      }
      // attach is deliberately ABSENT from the user change predicate —
      // filterproperties' AttachmentCount omission
      val (uNew, uChg, uDel) =
        diff(oldU, newU, "user", col("o.seg") =!= col("n.seg"))
      val (gNew, gChg, gDel) =
        diff(oldG, newG, "group", col("o.rk") =!= col("n.rk"))
      val (pNew, pChg, pDel) =
        diff(oldP, newP, "policy", col("o.pv") =!= col("n.pv"))
      // new-or-changed group/policy keys (tiny -> broadcast) cascade
      // into the new-snapshot membership, minus already-planned users
      val gKeys = newG.join(
        gNew.unionByName(gChg).select(col("name")), Seq("name"))
        .select(col("gkey")).distinct()
      val pKeys = newP.join(
        pNew.unionByName(pChg).select(col("name")), Seq("name"))
        .select(col("pkey")).distinct()
      val uListed = uNew.unionByName(uChg).select(col("name"))
      val uGCasc = newU.join(broadcast(gKeys), Seq("gkey"))
        .join(uListed, Seq("name"), "left_anti")
        .select(lit("user").as("entity_type"), col("name"),
          lit("put").as("action"), lit("group_cascade").as("reason"))
      val uPCasc = newU.join(broadcast(pKeys), Seq("pkey"))
        .join(uListed.unionByName(uGCasc.select(col("name"))),
          Seq("name"), "left_anti")
        .select(lit("user").as("entity_type"), col("name"),
          lit("put").as("action"), lit("policy_cascade").as("reason"))
      Seq(uNew, uChg, uDel, uGCasc, uPCasc, gNew, gChg, gDel,
        pNew, pChg, pDel)
        .reduce(_ unionByName _)
        .orderBy(col("entity_type"), col("name"))
    }),

    // ---- as-of join (custom LogicalPlan + Strategy + SparkPlan) ---------
    // Enrich every event with the latest purchase checkpoint of its user
    // at or before the event time, then aggregate per event type. The
    // oracle is DuckDB's native ASOF LEFT JOIN — an independent engine's
    // implementation of the same operator. Times compare as epoch
    // microseconds on both sides; checkpoints pre-aggregate to one row
    // per (user, time) so the as-of pick is unique.
    "q55_asof_join" -> ((s, d) => {
      val ev = T.events(s, d)
        .select(col("event_id"), col("event_type"), col("user_id"),
          unix_micros(col("ts")).as("t"))
      val cp = T.events(s, d)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id").as("cp_user"),
          unix_micros(col("ts")).as("cp_t"))
        .agg(max(col("value")).as("pval")) // max is exact, no Det routing
      graft.plans.AsofJoin.asof(ev, cp,
          Seq("user_id"), Seq("cp_user"), "t", "cp_t")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("cp_t").isNotNull, 1).otherwise(0)).cast("long")
            .as("n_matched"),
          Det.dsum(coalesce(col("pval"), lit(0.0))).as("sum_matched_val"))
        .orderBy(col("event_type"))
    }),

    // ---- audit / invocation status view (SURVEY §2.9) -------------------
    "q42_audit_status" -> ((s, d) => {
      // Deterministic synthetic heartbeat stream derived from events.
      val rows = T.events(s, d).select(
        concat(lit("job"), (col("user_id") % 5).cast("string")).as("jobid"),
        concat(lit("inv"), (col("user_id") % 40).cast("string"))
          .as("invocationid"),
        col("event_id").as("updateunixtime"),
        when(col("event_type") === "error", "FAILED")
          .when(col("event_type") === "purchase", "COMPLETED")
          .otherwise("RUNNING").as("status"),
        lit("lg").as("loggroup"), lit("ls").as("logstream"))
      Audit.latestStatus(rows)
        .groupBy(col("jobid"), col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("jobid"), col("status"))
    }),

    // ---- folder enumeration to depth (SURVEY §2.1 S1) -------------------
    "q43_folder_walk" -> ((s, d) => {
      import s.implicits._
      val root = walkFixture(s, d)
      val leaves = FolderWalk.walk(s, Seq(root), depth = 2)
        .map(_.stripPrefix("file:").stripPrefix(root).stripPrefix("/"))
        .filter(_.nonEmpty)
      leaves.toDF("prefix").orderBy(col("prefix"))
    }),

    // ---- BPE-ish token counting (text analysis) -------------------------
    "q44_bpe_tokens" -> ((s, d) => {
      T.documents(s, d)
        .select(col("lang"),
          TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
          TextAnalysis.tokenCount(col("text")).as("ws"))
        .groupBy(col("lang"))
        .agg(sum(col("bpe")).cast("long").as("total_bpe_tokens"),
          sum(col("ws")).cast("long").as("total_ws_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // ---- IVF ANN (similarity, scale path #2) ----------------------------
    // Gate configuration: nProbe = nCells probes every cell, so the IVF
    // candidate set is the whole corpus and the top-k must equal brute
    // force (assignment, probe ranking, and re-rank all exercised; the
    // oracle is the exact SQL top-k). Partial-probe recall is covered by
    // PipelineSpec.
    "q45_ann_ivf_fullprobe" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, k = 5,
        nCells = 16, nProbe = 16)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- single-entry ZIP ingest (SURVEY §2.1 S5) -----------------------
    "q46_ingest_zip" -> ((s, d) => {
      val dir = zipFixture(s, d)
      graft.sources.IngestReader.zipCsv(s, ReferenceQueries.lineitemSchema, dir)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_discount")).as("sum_disc"))
        .orderBy(col("l_linestatus"))
    }),

    // ---- extended datetime scalars (SURVEY §2.8 timeConverter family) ---
    "q47_datetime_extended" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(
          weekofyear(col("o_orderdate")).as("wk"),
          date_format(col("o_orderdate"), "EEEE").as("day_name"))
        .agg(count(lit(1)).as("n"))
        .filter(col("wk") <= 4)
        .orderBy(col("wk"), col("day_name"))
    }),

    // ---- distinct counting (SURVEY §2.4) --------------------------------
    "q48_distinct_count" -> ((s, d) => {
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey"), col("l_suppkey"))
            .as("n_part_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- approximate distinct via mergeable HLL sketches (§2.4 at 100 TB)
    // q48 is the exact path; this is the sketch path a 100 TB pipeline
    // actually runs: per-(group, day) Datasketches HLL sketches built in
    // one pass, then re-aggregated by sketch union to answer the
    // all-time distinct — the build-once/re-aggregate-any-range pattern,
    // exercising hll_sketch_agg's partial-merge machinery across two
    // aggregation levels. Gate: the estimate must land within 5% of the
    // exact distinct (lgK=12 gives σ≈1.6%, and the sketch hash is
    // deterministic, so the boolean is stable run-to-run); the oracle
    // computes the exact count and expects TRUE.
    "q66_sketch_distinct" -> ((s, d) => {
      val ev = T.events(s, d)
      val daily = ev
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(merged, "event_type")
        .select(col("event_type"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("sketch_ok"))
        .orderBy(col("event_type"))
    }),

    // ---- percentiles (exact + approx sketch path) -----------------------
    // One percentile() pass computes all three quantiles (single sort per
    // group); emitted as scalar columns so the driver's hash gate can
    // compare rows (array-typed outputs are unhashable on the oracle side).
    "q51_percentiles" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))")
            .as("__q"),
          Det.davg(col("o_totalprice")).as("mean_price"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
          element_at(col("__q"), 1).as("p25"),
          element_at(col("__q"), 2).as("p50"),
          element_at(col("__q"), 3).as("p75"),
          col("mean_price"), col("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // The sketch companion to q51: approx_percentile is a mergeable
    // KLL-style quantile summary (partial-aggregable, so a 100 TB run
    // builds per-partition sketches and merges — never a global sort the
    // way exact percentile() requires). Gate: with accuracy 10000 the
    // returned element's rank is within ±0.01% of the target, so its
    // VALUE must lie between the exact 0.49 and 0.51 quantiles — checked
    // here with wide margin, and the oracle recomputes the exact median
    // and expects TRUE.
    "q71_sketch_percentile" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("approx_p50"),
          expr("percentile(o_totalprice, array(0.49D, 0.5D, 0.51D))")
            .as("__q"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
          element_at(col("__q"), 2).as("p50_exact"), col("n"),
          (col("approx_p50") >= element_at(col("__q"), 1) &&
            col("approx_p50") <= element_at(col("__q"), 3))
            .as("sketch_ok"))
        .orderBy(col("o_orderpriority"))
    }),

    // Salted skew join through the oracle gate: events join users-dim on a
    // power-law key (user_id % 10 — every event lands on ten hot keys),
    // 8-way salted so each hot key spreads over 8 reducers instead of
    // melting one. The oracle is the plain SQL join — salting must be
    // invisible in the result.
    "q72_salted_join" -> ((s, d) => {
      val ev = T.events(s, d)
        .select((col("user_id") % 10).as("hot_key"), col("event_id"),
          col("value"))
      val dim = T.events(s, d)
        .select((col("user_id") % 10).as("hot_key"))
        .distinct()
        .withColumn("dim_tag", concat(lit("seg"), col("hot_key")))
      SkewJoin.saltedInnerJoin(ev, dim, "hot_key",
          buckets = 8, saltBy = col("event_id"))
        .groupBy(col("dim_tag"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("dim_tag"))
    }),

    // ---- bounded-heap top-k per group (vs window sort) ------------------
    "q52_topk_agg" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(graft.functions.TopKAgg.topkAgg(
          col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rnk"),
          col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
        .filter(col("o_custkey") <= 200)
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // ---- custom kernels on the SQL surface ------------------------------
    "q49_sql_kernel" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      T.embeddings(s, d).createOrReplaceTempView("embeddings")
      s.sql(
        """SELECT vec_id, label
          |FROM (SELECT vec_id, label,
          |        dot_product_f(embedding, embedding) AS norm2
          |      FROM embeddings)
          |ORDER BY norm2 DESC, vec_id LIMIT 20""".stripMargin)
    })
  )

  /** Single-entry ZIP fixture: first 2000 lineitem rows as one CSV member
    * per archive (the reference's yauzl constraint, worker.js:546-552). */
  private[graft] def zipFixture(s: SparkSession, d: String): String = {
    val outDir = graft.Scratch.fixtureDir(d, "zip")
    val marker = new java.io.File(s"$outDir/_SUCCESS")
    if (!marker.exists()) {
      new java.io.File(outDir).mkdirs()
      val rows = T.lineitem(s, d)
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(2000)
        .select(concat_ws(",",
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"),
          format_string("%.6f", col("l_quantity")),
          format_string("%.6f", col("l_extendedprice")),
          format_string("%.6f", col("l_discount")),
          format_string("%.6f", col("l_tax")),
          col("l_returnflag"), col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")))
        .collect().map(_.getString(0))
      import java.util.zip.{ZipEntry, ZipOutputStream}
      val groups = rows.grouped(500).zipWithIndex
      groups.foreach { case (chunk, i) =>
        val zos = new ZipOutputStream(
          java.nio.file.Files.newOutputStream(
            java.nio.file.Paths.get(s"$outDir/part$i.zip")))
        zos.putNextEntry(new ZipEntry(s"part$i.csv"))
        zos.write((chunk.mkString("\n") + "\n").getBytes("UTF-8"))
        zos.closeEntry()
        zos.close()
      }
      marker.createNewFile()
    }
    outDir
  }

  def oracleSql: Map[String, String] = Map(
    "q40_transforms" ->
      s"""SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
         |  COUNT(*) AS n,
         |  ${Det.sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_revenue
         |FROM lineitem
         |GROUP BY ship_year ORDER BY ship_year""".stripMargin,

    "q41_query_registry" ->
      """SELECT * FROM (VALUES
        |  ('SELECT 2', CAST(2000 AS BIGINT), 't2', 'second', 'Batch'),
        |  ('SELECT 3', CAST(3000 AS BIGINT), 't1', 'third', 'Continuous'))
        |  t(UsersQuery, UnixTime, TableName, QueryName, QueryType)
        |ORDER BY UnixTime""".stripMargin,

    "q58_identity_assoc" ->
      """SELECT * FROM (VALUES
        |  ('dana', 1, 1, 1, 'Allowed', 'ExplicitDeny'),
        |  ('root', 0, 1, 0, 'Allowed', 'Allowed'))
        |  t(Name, n_inline, n_attached, n_user, select_decision,
        |    drop_decision)
        |ORDER BY Name""".stripMargin,

    // snapshots reconstructed virtually from the same planted rules;
    // removals join on name, new/changed on arn, cascades minus the
    // already-planned set — mirroring rundiff's precedence exactly
    "q266_identity_sync" ->
      """WITH nsup AS (SELECT COUNT(*) AS ns FROM supplier),
        |old_u AS (
        |  SELECT 'arn:user/' || c_name AS arn, c_name AS name,
        |    c_nationkey AS gkey, c_mktsegment AS seg,
        |    1 + (c_custkey % (SELECT ns FROM nsup)) AS pkey
        |  FROM customer WHERE c_custkey % 19 <> 3),
        |new_u AS (
        |  SELECT 'arn:user/' || c_name AS arn, c_name AS name,
        |    c_nationkey AS gkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED'
        |      ELSE c_mktsegment END AS seg,
        |    1 + (c_custkey % (SELECT ns FROM nsup)) AS pkey
        |  FROM customer WHERE c_custkey % 23 <> 5),
        |old_g AS (
        |  SELECT 'arn:group/' || n_name AS arn, n_name AS name,
        |    n_nationkey AS gkey, n_regionkey AS rk FROM nation),
        |new_g AS (
        |  SELECT 'arn:group/' || n_name AS arn, n_name AS name,
        |    n_nationkey AS gkey,
        |    CASE WHEN n_nationkey % 7 = 2 THEN n_regionkey + 10
        |      ELSE n_regionkey END AS rk
        |  FROM nation WHERE n_nationkey % 11 <> 9),
        |old_p AS (
        |  SELECT 'arn:policy/' || s_name AS arn, s_name AS name,
        |    s_suppkey AS pkey, s_nationkey AS pv
        |  FROM supplier WHERE s_suppkey % 10 <> 7),
        |new_p AS (
        |  SELECT 'arn:policy/' || s_name AS arn, s_name AS name,
        |    s_suppkey AS pkey,
        |    CASE WHEN s_suppkey % 9 = 1 THEN s_nationkey + 50
        |      ELSE s_nationkey END AS pv
        |  FROM supplier WHERE s_suppkey % 17 <> 4),
        |u_new AS (SELECT n.name FROM new_u n LEFT JOIN old_u o
        |  ON o.arn = n.arn WHERE o.arn IS NULL),
        |u_chg AS (SELECT n.name FROM old_u o JOIN new_u n
        |  ON o.arn = n.arn WHERE o.seg <> n.seg),
        |u_del AS (SELECT o.name FROM old_u o LEFT JOIN new_u n
        |  ON o.name = n.name WHERE n.name IS NULL),
        |g_new AS (SELECT n.name FROM new_g n LEFT JOIN old_g o
        |  ON o.arn = n.arn WHERE o.arn IS NULL),
        |g_chg AS (SELECT n.name FROM old_g o JOIN new_g n
        |  ON o.arn = n.arn WHERE o.rk <> n.rk),
        |g_del AS (SELECT o.name FROM old_g o LEFT JOIN new_g n
        |  ON o.name = n.name WHERE n.name IS NULL),
        |p_new AS (SELECT n.name FROM new_p n LEFT JOIN old_p o
        |  ON o.arn = n.arn WHERE o.arn IS NULL),
        |p_chg AS (SELECT n.name FROM old_p o JOIN new_p n
        |  ON o.arn = n.arn WHERE o.pv <> n.pv),
        |p_del AS (SELECT o.name FROM old_p o LEFT JOIN new_p n
        |  ON o.name = n.name WHERE n.name IS NULL),
        |g_keys AS (SELECT DISTINCT g.gkey FROM new_g g
        |  WHERE g.name IN (SELECT name FROM g_new
        |                   UNION SELECT name FROM g_chg)),
        |p_keys AS (SELECT DISTINCT p.pkey FROM new_p p
        |  WHERE p.name IN (SELECT name FROM p_new
        |                   UNION SELECT name FROM p_chg)),
        |u_listed AS (SELECT name FROM u_new UNION SELECT name FROM u_chg),
        |u_gcasc AS (SELECT n.name FROM new_u n
        |  JOIN g_keys k ON n.gkey = k.gkey
        |  WHERE n.name NOT IN (SELECT name FROM u_listed)),
        |u_pcasc AS (SELECT n.name FROM new_u n
        |  JOIN p_keys k ON n.pkey = k.pkey
        |  WHERE n.name NOT IN (SELECT name FROM u_listed
        |                       UNION SELECT name FROM u_gcasc))
        |SELECT entity_type, name, action, reason FROM (
        |  SELECT 'user' AS entity_type, name, 'put' AS action,
        |    'new' AS reason FROM u_new
        |  UNION ALL SELECT 'user', name, 'put', 'changed' FROM u_chg
        |  UNION ALL SELECT 'user', name, 'delete', 'removed' FROM u_del
        |  UNION ALL SELECT 'user', name, 'put', 'group_cascade'
        |    FROM u_gcasc
        |  UNION ALL SELECT 'user', name, 'put', 'policy_cascade'
        |    FROM u_pcasc
        |  UNION ALL SELECT 'group', name, 'put', 'new' FROM g_new
        |  UNION ALL SELECT 'group', name, 'put', 'changed' FROM g_chg
        |  UNION ALL SELECT 'group', name, 'delete', 'removed' FROM g_del
        |  UNION ALL SELECT 'policy', name, 'put', 'new' FROM p_new
        |  UNION ALL SELECT 'policy', name, 'put', 'changed' FROM p_chg
        |  UNION ALL SELECT 'policy', name, 'delete', 'removed' FROM p_del)
        |ORDER BY entity_type, name""".stripMargin,

    "q55_asof_join" -> {
      s"""WITH cp AS (
         |  SELECT user_id AS cp_user, epoch_us(ts) AS cp_t,
         |    MAX(value) AS pval
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
         |), ev AS (
         |  SELECT event_id, event_type, user_id, epoch_us(ts) AS t
         |  FROM events)
         |SELECT ev.event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CASE WHEN cp.cp_t IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_matched,
         |  ${Det.sqlSum("COALESCE(cp.pval, 0)")} AS sum_matched_val
         |FROM ev ASOF LEFT JOIN cp
         |  ON ev.user_id = cp.cp_user AND ev.t >= cp.cp_t
         |GROUP BY ev.event_type ORDER BY ev.event_type""".stripMargin
    },

    "q54_nosql_put" ->
      """SELECT * FROM (VALUES
        |  ('SELECT *', CAST(1000 AS BIGINT), 'proddb', 'secure_t',
        |   'renamed', 'C'),
        |  ('SELECT a', CAST(2000 AS BIGINT), 'archive_db', 'open_t',
        |   'analysis1v2', 'A'),
        |  ('SELECT c', CAST(4000 AS BIGINT), 'newdb', 'new_t',
        |   'fresh', 'A'))
        |  t(UsersQuery, UnixTime, DatabaseName, TableName, QueryName,
        |    QueryType)
        |ORDER BY UnixTime""".stripMargin,

    "q42_audit_status" ->
      """WITH rows AS (
        |  SELECT 'job' || CAST(user_id % 5 AS VARCHAR) AS jobid,
        |    'inv' || CAST(user_id % 40 AS VARCHAR) AS invocationid,
        |    event_id AS updateunixtime,
        |    CASE WHEN event_type = 'error' THEN 'FAILED'
        |         WHEN event_type = 'purchase' THEN 'COMPLETED'
        |         ELSE 'RUNNING' END AS status
        |  FROM events),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT jobid, invocationid, status,
        |      ROW_NUMBER() OVER (PARTITION BY jobid, invocationid
        |        ORDER BY updateunixtime DESC, status) AS rn
        |    FROM rows) WHERE rn = 1)
        |SELECT jobid, status, COUNT(*) AS n FROM latest
        |GROUP BY jobid, status ORDER BY jobid, status""".stripMargin,

    "q43_folder_walk" ->
      """SELECT DISTINCT 'lang=' || lang || '/source=' || source AS prefix
        |FROM documents ORDER BY prefix""".stripMargin,

    "q46_ingest_zip" ->
      s"""WITH sub AS (SELECT * FROM lineitem
         |             ORDER BY l_orderkey, l_linenumber LIMIT 2000)
         |SELECT l_linestatus, COUNT(*) AS n,
         |  ${Det.sqlSum("l_discount")} AS sum_disc
         |FROM sub GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q47_datetime_extended" ->
      """SELECT CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
        |  dayname(o_orderdate) AS day_name, COUNT(*) AS n
        |FROM orders
        |GROUP BY wk, day_name
        |HAVING wk <= 4
        |ORDER BY wk, day_name""".stripMargin,

    "q48_distinct_count" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT (l_partkey, l_suppkey)) AS BIGINT)
        |    AS n_part_supp,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q66_sketch_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q71_sketch_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50_exact,
        |  COUNT(*) AS n, TRUE AS sketch_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q72_salted_join" -> {
      s"""WITH ev AS (SELECT user_id % 10 AS hot_key, event_id, value
         |            FROM events),
         |dim AS (SELECT DISTINCT user_id % 10 AS hot_key FROM events),
         |d2 AS (SELECT hot_key, 'seg' || hot_key AS dim_tag FROM dim)
         |SELECT d2.dim_tag, COUNT(*) AS n,
         |  ${Det.sqlSum("ev.value")} AS sum_value
         |FROM ev JOIN d2 USING (hot_key)
         |GROUP BY d2.dim_tag ORDER BY d2.dim_tag""".stripMargin
    },

    "q52_topk_agg" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 AND o_custkey <= 200
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q51_percentiles" ->
      s"""SELECT o_orderpriority,
         |  quantile_cont(o_totalprice, 0.25) AS p25,
         |  quantile_cont(o_totalprice, 0.5) AS p50,
         |  quantile_cont(o_totalprice, 0.75) AS p75,
         |  ${Det.sqlAvg("o_totalprice")} AS mean_price,
         |  COUNT(*) AS n
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q49_sql_kernel" ->
      """SELECT vec_id, label FROM (
        |  SELECT vec_id, label,
        |    list_inner_product(CAST(embedding AS DOUBLE[]),
        |                       CAST(embedding AS DOUBLE[])) AS norm2
        |  FROM embeddings)
        |ORDER BY norm2 DESC, vec_id LIMIT 20""".stripMargin,

    "q44_bpe_tokens" -> {
      s"""SELECT lang,
         |  CAST(SUM(${TextAnalysis.sqlBpeTokenCount}) AS BIGINT)
         |    AS total_bpe_tokens,
         |  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
         |    AS total_ws_tokens,
         |  COUNT(*) AS n_docs
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Full-probe IVF is exhaustive, so the answer is exact top-k — the
    // same oracle as brute force.
    "q45_ann_ivf_fullprobe" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND c.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  )
}
