package graft.operators

import graft.{Det, Tables => T}
import graft.streaming.StreamingCollect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 frontier surface: recursive-CTE graph walks, deterministic
  * train/val/test splits, blocked fuzzy matching, SCD2 history builds,
  * and calendar gap-fill — the remaining batch-SQL operators a curation
  * pipeline leans on.
  *
  * Scale notes are per-query; the common theme is that every operator
  * here is pure declarative DataFrame/SQL (Catalyst plans all of it:
  * partial aggregation, shuffle on explicit keys, no driver loops).
  */
object FrontierQueries {

  /** Orders table round-tripped through Spark 4's built-in XML source
    * (one <order> element per row), written once per SF. XML is a text
    * format: types are declared on read, not inferred, so the round
    * trip is exact. */
  private[graft] def xmlFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "orders_xml")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
        .repartition(8)
        .write.mode("overwrite")
        .option("rowTag", "order").option("rootTag", "orders")
        .format("xml").save(out)
    }
    out
  }

  /** Bit-interleave the low 16 bits of two non-negative ints into a
    * 32-bit Z-value (Morton order) — pure column algebra, codegen'd:
    * 16 shift/mask/or terms per input column. */
  private[graft] def zValue(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Lineitem rewritten in Z-order on (l_partkey, l_suppkey): range-
    * partitioned and sorted by the interleaved key, so any 2-D box
    * predicate maps to a small set of Z-ranges → most parquet row
    * groups/files fail their min/max stats and are skipped at scan
    * time. Same rows as the source table, only the layout changes. */
  private[graft] def zorderFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "lineitem_zorder")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.lineitem(s, d)
        .withColumn("z", zValue(col("l_partkey"), col("l_suppkey")))
        .repartitionByRange(16, col("z"))
        .sortWithinPartitions(col("z"))
        .drop("z")
        .write.mode("overwrite").parquet(out)
    }
    out
  }

  /** Events copied into four parquet files so `maxFilesPerTrigger = 1`
    * yields a genuinely multi-batch bounded stream. */
  private[graft] def eventsSplitFixture(s: SparkSession, d: String)
      : String = {
    val out = graft.Scratch.fixtureDir(d, "events_split4")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(out)
    }
    out
  }

  /** Events plus a second file holding two far-future flush rows (one
    * 'view', one 'purchase', user_id -1, max(ts) + 72 h). The flush
    * batch pushes BOTH join-side watermarks past every real row's
    * 24-hour join window, so the left-outer join emits all of its
    * null-extended rows before the bounded run ends. */
  private[graft] def outerFlushFixture(s: SparkSession, d: String)
      : String = {
    val out = graft.Scratch.fixtureDir(d, "events_outer_flush")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      val ev = T.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      ev.coalesce(1).write.mode("overwrite").parquet(out)
      val maxTs = ev.agg(unix_micros(max(col("ts")))).collect()(0).getLong(0)
      val flushTs = maxTs + 72L * 3600000000L
      import s.implicits._
      Seq((-1L, flushTs, -1L, "view", 0.0),
          (-2L, flushTs, -1L, "purchase", 0.0))
        .toDF("event_id", "t", "user_id", "event_type", "value")
        .select(col("event_id"), timestamp_micros(col("t")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(1).write.mode("append").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Probabilistic record linkage (Fellegi & Sunter 1969, public):
    // the structured-record twin of q99's fuzzy text matching — two
    // files of entity records, blocking, per-field agreement vectors,
    // m/u-probability likelihood ratios, link/possible/nonlink classes.
    // File B derives from customer with planted perturbations (1/11
    // name typo, 1/5 segment change, 1/7 balance shift; 1/3 of
    // entities absent) so truth = custkey equality. Everything is
    // integer-exact: m_f = P(agree_f | match) and u_f = P(agree_f |
    // unmatch) estimated as clipped permilles from the candidate pairs
    // (supervised by the planted truth — production systems fit the
    // same quantities with EM), and instead of summing float log2(m/u)
    // weights, each pair's likelihood ratio is kept as the RATIONAL
    // num/den = prod(agree ? m : 1000-m) / prod(agree ? u : 1000-u)
    // (three factors <= 995 -> products < 1e9, safely int64) and the
    // thresholds R >= 8 (link) / R <= 1/8 (nonlink) compare by
    // cross-multiplication — no floats, no logs, bit-equal to the
    // oracle. Scale shape: blocks are fixed-width custkey-centile
    // prefixes, so on genuinely renumbered entities per-block pair
    // counts are constant and candidates grow linearly with the corpus
    // (measured ~67 pairs/record at sf0.001/sf0.01/sf0.1 — the q99
    // lesson: never block on a fixed key space). The ScaleUp replica
    // collapses name digits across copies, so its decade probe is the
    // quadratic block-skew WORST case instead: 100x candidates for 10x
    // rows at 2.3x warm wall (BENCH_sf1.json record_linkage_addendum).
    // The m/u stats are a 1-row broadcast; output is 3 class rows.
    "q268_record_linkage" -> ((s, d) => {
      val a = T.customer(s, d).select(col("c_custkey").as("ka"),
        col("c_name").as("na"), col("c_mktsegment").as("sa"),
        col("c_acctbal").as("ba"),
        expr("substr(c_name, 10, 7)").as("blk"))
      val b = T.customer(s, d).where(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("kb"),
          expr("CASE WHEN c_custkey % 11 = 0 THEN c_name || 'X' " +
            "ELSE c_name END").as("nb"),
          expr("CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' " +
            "ELSE c_mktsegment END").as("sb"),
          expr("CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 5.0 " +
            "ELSE c_acctbal END").as("bb"),
          expr("substr(c_name, 10, 7)").as("blk"))
      val cand = a.join(b, "blk").select(
        (col("ka") === col("kb")).as("tr"),
        (col("na") === col("nb")).as("g1"),
        (col("sa") === col("sb")).as("g2"),
        (abs(col("ba") - col("bb")) < 1.0).as("g3"))
      def cnt(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      // m/u permilles, clipped to [5, 995] (zero-factor smoothing)
      def rate(num: String, den: String) =
        expr(s"CASE WHEN $den > 0 THEN greatest(5L, least(995L, " +
          s"(1000 * $num) div $den)) ELSE 500L END")
      val st = cand.agg(cnt(col("tr")).as("nm"),
          cnt(!col("tr")).as("nu"),
          cnt(col("tr") && col("g1")).as("a1m"),
          cnt(col("tr") && col("g2")).as("a2m"),
          cnt(col("tr") && col("g3")).as("a3m"),
          cnt(!col("tr") && col("g1")).as("a1u"),
          cnt(!col("tr") && col("g2")).as("a2u"),
          cnt(!col("tr") && col("g3")).as("a3u"))
        .select(
          rate("a1m", "nm").as("m1"), rate("a2m", "nm").as("m2"),
          rate("a3m", "nm").as("m3"), rate("a1u", "nu").as("u1"),
          rate("a2u", "nu").as("u2"), rate("a3u", "nu").as("u3"))
      def f(g: String, r: String) =
        when(col(g), col(r)).otherwise(lit(1000L) - col(r))
      val scored = cand.crossJoin(broadcast(st)).select(col("tr"),
        (f("g1", "m1") * f("g2", "m2") * f("g3", "m3")).as("num"),
        (f("g1", "u1") * f("g2", "u2") * f("g3", "u3")).as("den"))
      scored.select(col("tr"),
          when(col("num") >= lit(8L) * col("den"), "link")
            .when(lit(8L) * col("num") <= col("den"), "nonlink")
            .otherwise("possible").as("class"))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n_pairs"), cnt(col("tr")).as("n_true"),
          cnt(!col("tr")).as("n_false"))
        .orderBy(col("class"))
    }),

    // Golden-record survivorship — the consolidation step after q268's
    // pair classification (the reference's identity layer persists ONE
    // canonical row per identity: sources/identitysync/identitysync.js
    // mirrors IAM entities into a single registry table). Three derived
    // source files (A = base, prio 1; B = q268's perturbations on the
    // %3!=0 subset, prio 2; C = upper-cased/moved/discounted variants on
    // the %4!=0 subset, prio 3) consolidate per entity key under
    // deterministic survivorship rules: name = longest value (tie →
    // lexicographically smallest), segment = majority vote (tie →
    // lowest source priority), balance = max, plus a source-presence
    // bitmask. Scale shape: ONE groupBy on the entity key over the
    // 3-file union — map-side-combined aggregates and a per-key
    // collect_list bounded by |sources| = 3 structs of slim fields
    // (never whole source rows), no windows, no joins; at 100 TB this
    // is a single co-partitioned exchange of (key, prio, name, seg)
    // rows. The vote/tiebreak algebra runs entirely inside ≤3-element
    // arrays (array_sort on (−votes, prio) / (−length, name) structs —
    // binary collation on both engines).
    "q272_golden_record" -> ((s, d) => {
      val cust = T.customer(s, d)
      val a = cust.select(col("c_custkey").as("ck"),
        col("c_name").as("nm"), col("c_mktsegment").as("sg"),
        col("c_acctbal").as("bal"), lit(1).as("prio"))
      val b = cust.where(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("ck"),
          expr("CASE WHEN c_custkey % 11 = 0 THEN c_name || 'X' " +
            "ELSE c_name END").as("nm"),
          expr("CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' " +
            "ELSE c_mktsegment END").as("sg"),
          expr("CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 5.0 " +
            "ELSE c_acctbal END").as("bal"), lit(2).as("prio"))
      val c = cust.where(col("c_custkey") % 4 =!= 0)
        .select(col("c_custkey").as("ck"),
          expr("CASE WHEN c_custkey % 9 = 0 THEN upper(c_name) " +
            "ELSE c_name END").as("nm"),
          expr("CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' " +
            "WHEN c_custkey % 6 = 0 THEN 'ONLINE' " +
            "ELSE c_mktsegment END").as("sg"),
          expr("CASE WHEN c_custkey % 8 = 0 THEN c_acctbal - 3.0 " +
            "ELSE c_acctbal END").as("bal"), lit(3).as("prio"))
      a.unionByName(b).unionByName(c)
        .groupBy(col("ck"))
        .agg(
          collect_list(struct(col("prio"), col("nm"), col("sg")))
            .as("arr"),
          max(col("bal")).as("g_balance"),
          expr("CAST(bit_or(shiftleft(1, prio)) AS BIGINT)")
            .as("src_mask"),
          count(lit(1)).as("n_src"))
        .select(col("ck"),
          expr("element_at(array_sort(transform(arr, x -> " +
            "struct(-length(x.nm) AS nl, x.nm AS v))), 1).v")
            .as("g_name"),
          expr("element_at(array_sort(transform(arr, x -> " +
            "struct(-size(filter(arr, y -> y.sg = x.sg)) AS nv, " +
            "x.prio AS p, x.sg AS v))), 1).v").as("g_segment"),
          col("g_balance"), col("src_mask"), col("n_src"))
        .orderBy(col("ck"))
    }),

    // foreachBatch fan-out: ONE bounded stream lands in TWO sinks per
    // micro-batch — a raw parquet landing zone partitioned by batch_id
    // (dynamic-partition overwrite → a replayed batch rewrites its own
    // partition, never duplicates it) and an incrementally-maintained
    // totals snapshot (previous snapshot ⊎ this batch's partial agg,
    // written as snapshot_v{batchId}). This is the incremental-view-
    // maintenance shape: each batch does O(batch + |agg|) work, never
    // re-reads the history, and the running sums stay in DECIMAL(38,6)
    // so the merge order can't perturb the result. The query returns
    // the final snapshot cross-checked against the landing zone; the
    // oracle is the plain batch aggregate over events.
    "q105_foreach_batch" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
      graft.Confs.pinNanosAsLong(s)
      val dir = eventsSplitFixture(s, d)
      val schema = s.read.parquet(dir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .select(col("event_id"), col("event_type"), col("value"))
      val base = graft.Scratch.runDir("graft_multisink")
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.persist()
          try {
            // sink 1: raw landing zone, exactly-once per batch partition
            batch.withColumn("batch_id", graft.functions.RefLit.long(id))
              .write.mode("overwrite").partitionBy("batch_id")
              .parquet(s"$base/landing")
            // sink 2: incremental totals snapshot
            val cur = batch.groupBy(col("event_type"))
              .agg(count(lit(1)).as("n"),
                sum(col("value").cast(dec)).as("sv"))
            val ss = batch.sparkSession
            val prevDirs = Option(new java.io.File(s"$base/totals")
              .listFiles()).getOrElse(Array.empty)
              .filter(f => f.getName.startsWith("snapshot_v") &&
                f.getName.stripPrefix("snapshot_v").toLong < id)
            val merged = prevDirs.sortBy(
                _.getName.stripPrefix("snapshot_v").toLong).lastOption
              .map(p => ss.read.parquet(p.getAbsolutePath)
                .unionByName(cur)
                .groupBy(col("event_type"))
                .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv")))
              .getOrElse(cur)
            merged.coalesce(1).write.mode("overwrite")
              .parquet(s"$base/totals/snapshot_v$id")
          } finally batch.unpersist()
        }
        .start()
      q.awaitTermination()
      val last = new java.io.File(s"$base/totals").listFiles()
        .filter(_.getName.startsWith("snapshot_v"))
        .maxBy(_.getName.stripPrefix("snapshot_v").toLong)
      val totals = s.read.parquet(last.getAbsolutePath)
      val landed = s.read.parquet(s"$base/landing")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_landed"))
      totals.join(landed, Seq("event_type"))
        .select(col("event_type"), col("n"),
          col("sv").cast("double").as("sum_value"),
          (col("n") === col("n_landed")).as("sinks_agree"))
        .orderBy(col("event_type"))
    }),

    // Stream-stream LEFT OUTER interval join: every view pairs with the
    // same user's purchases in the following 24 h, and views with NO
    // such purchase surface as null-extended rows once the watermark
    // proves no match can still arrive — the streaming form of funnel
    // drop-off analysis. Both sides are watermarked and the join is
    // time-bounded, so state evicts continuously (unbounded-safe); the
    // far-future flush batch closes every real window before the
    // bounded run ends, which is what makes the batch left join a valid
    // oracle.
    "q106_stream_outer_join" -> ((s, d) => {
      graft.Confs.pinNanosAsLong(s)
      val dir = outerFlushFixture(s, d)
      val schema = s.read.parquet(dir).schema
      def src() = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
      val views = src().where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val buys = src().where(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id").as("b_user"),
          col("ts").as("b_ts"))
        .withWatermark("b_ts", "1 hour")
      val joined = views.join(buys,
        col("v_user") === col("b_user") &&
          col("b_ts") >= col("v_ts") &&
          col("b_ts") <= col("v_ts") + expr("INTERVAL 24 HOURS"),
        "leftOuter")
      StreamingCollect.runBounded(s, joined, "q106_stream_outer_sink",
          outputMode = "append")
        .where(col("v_user") >= 0)
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("buy_id")).as("n_matched"),
          sum(when(col("buy_id").isNull, 1L).otherwise(0L))
            .as("n_orphans"))
        .orderBy(col("user_id"))
    }),

    // XML ingest via the built-in Spark 4 XML source (read AND write):
    // one <order> element per row, schema declared on read (no
    // inference pass over 100 TB), distributed text scan like any other
    // file source. The oracle is the same aggregate over the original
    // parquet — i.e. the XML round trip must be lossless.
    "q97_ingest_xml" -> ((s, d) => {
      val dir = xmlFixture(s, d)
      s.read
        .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
          "o_totalprice DOUBLE, o_orderpriority STRING")
        .option("rowTag", "order")
        .format("xml").load(dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderpriority"))
    }),

    // Z-order clustering + file skipping: a 2-D box predicate over the
    // Morton-ordered copy of lineitem. Correctness side: identical rows
    // to filtering the unclustered table (the oracle). Scale side: the
    // box touches only the row groups whose (partkey, suppkey) min/max
    // ranges intersect it — FrontierSpec asserts the clustered scan
    // reads a fraction of the rows the unclustered one does. This is
    // the standard layout trick for multi-dimensional pruning when one
    // sort column can't serve both predicates.
    "q102_zorder_skip" -> ((s, d) => {
      val dir = zorderFixture(s, d)
      s.read.parquet(dir)
        .where(col("l_partkey").between(100, 300) &&
          col("l_suppkey").between(2, 5))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Recursive CTE (Spark 4's UnionLoop execution): walk a synthetic
    // ownership hierarchy (parent(k) = k div 2, root = 1) from every
    // customer to the root and aggregate by depth. Each iteration is one
    // distributed self-join of the frontier — rows in flight shrink
    // geometrically, and the loop is planned once (no driver-side
    // collect between steps). Depth is O(log n): 100 TB of customers is
    // still < 60 iterations.
    "q96_recursive_cte" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("q96_customer")
      s.sql("""
        WITH RECURSIVE walk(c_custkey, anc, depth) AS (
          SELECT c_custkey, c_custkey AS anc, 0 AS depth
          FROM q96_customer
          UNION ALL
          SELECT w.c_custkey, w.anc div 2 AS anc, w.depth + 1 AS depth
          FROM walk w WHERE w.anc > 1
        )
        SELECT depth, COUNT(*) AS n,
          CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
            AS sum_bal
        FROM walk w JOIN q96_customer c ON w.c_custkey = c.c_custkey
        WHERE w.anc = 1
        GROUP BY depth ORDER BY depth""")
    }),

    // Deterministic train/val/test split: bucket on the first hex digit
    // of md5(doc_id) — 12/16 train, 2/16 val, 2/16 test. Stable across
    // engines, re-runs, and cluster sizes (no RNG, no sampling order
    // dependence), which is the property a training pipeline needs so
    // that the split never leaks when the corpus is re-partitioned or
    // appended to. Scan-speed: one hash per row, agg is partial.
    "q98_hash_split" -> ((s, d) => {
      val ch = substring(md5(col("doc_id").cast("string")), 1, 1)
      T.documents(s, d)
        .withColumn("split",
          when(ch < "c", "train").when(ch < "e", "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    }),

    // Blocked fuzzy matching: near-identical customer names via
    // levenshtein <= 2, candidate pairs restricted to equal
    // (nation, name-length) blocks so the self-join is per-block
    // quadratic, never corpus-quadratic. Real corpora block on shingle
    // or phonetic keys (see Dedup.lshCandidates for the scaled form);
    // the verify step and the dedup-pair semantics are identical. The
    // comparator is the THRESHOLDED levenshtein (banded DP, O(k·n) per
    // pair with early exit instead of O(n²)) — same pair set, ~6x less
    // comparator work; it returns -1 above the bound, so "dist <= 2"
    // becomes "result >= 0".
    "q99_fuzzy_pairs" -> ((s, d) => {
      // Candidate generation is a FastSS/SymSpell deletion-neighborhood
      // join (Bocek et al. 2007; public technique): dist(a,b) ≤ 2 ⟹ the
      // depth-≤2 deletion neighborhoods of a and b intersect, so pairs
      // sharing a (nation, variant-hash) bucket are an EXACT superset of
      // the true pair set and the thresholded-levenshtein verify keeps
      // the semantics identical to the oracle's blocked join. Why not
      // block on (nation, length) directly: that key space is FIXED
      // (25 nations × a few lengths), so block sizes — and the per-block
      // quadratic pair count — grow with the corpus; the sf1 scale probe
      // measured 28x wall time for 10x rows. Deletion-variant buckets
      // group only strings within ≤2 aligned deletions of each other, so
      // bucket sizes track genuine near-clusters, variants per row are a
      // constant ~1+L+L²/2, and the candidate exchange carries bare
      // (nation, hash, id) rows — linear corpus scaling end to end.
      // Exact-dup collapse first: variants are generated per DISTINCT
      // (nation, name) — a boilerplate name repeated m times (crawl-dup
      // skew; the scale probe planted exactly this) costs ONE variant
      // set instead of m· and its C(m,2) intra pairs are analytic;
      // inter-name pair counts recover as m_a·m_b. The per-pair minimum
      // a_key is least(minid_a, minid_b): the smaller groups' minimum id
      // is the smaller element of at least one cross pair.
      val g = T.customer(s, d)
        .groupBy(col("c_nationkey").as("nat"), col("c_name").as("name"))
        .agg(count(lit(1)).as("m"), min(col("c_custkey")).as("minid"))
        .withColumn("len", length(col("name")))
        .localCheckpoint() // feeds variants + both verify re-joins
      // depth 0/1/2 deletion variants, hashed; short-string guards keep
      // sequence() ascending (the q178/q195/q198 hazard class)
      val vh = expr(
        """array_distinct(transform(flatten(array(
          |  array(name),
          |  CASE WHEN len >= 1 THEN
          |    transform(sequence(1, len), i ->
          |      concat(substr(name, 1, i - 1), substr(name, i + 1, len)))
          |  ELSE CAST(array() AS ARRAY<STRING>) END,
          |  CASE WHEN len >= 2 THEN
          |    flatten(transform(sequence(1, len - 1), i ->
          |      transform(sequence(i + 1, len), j ->
          |        concat(substr(name, 1, i - 1),
          |               substr(name, i + 1, j - i - 1),
          |               substr(name, j + 1, len)))))
          |  ELSE CAST(array() AS ARRAY<STRING>) END)),
          |  v -> xxhash64(v)))""".stripMargin)
      // the deletion-variant expansion is the query's heavy per-row work
      // (~1+L+L²/2 string slices per name); g is a post-aggregation frame
      // whose BYTES are tiny, so AQE coalesces it to one partition and
      // the expansion ran single-threaded (measured: cpu ≈ 24 s against
      // wall ≈ 11-13 s at sf0.1 — parallelism 2 on 32 cores). Spread the
      // group frame by its stable key before expanding: one narrow
      // exchange of (nat, name, m, minid) rows, explicit count so AQE
      // keeps the parallelism (guide §2.5 — cost the per-row work, not
      // the bytes). defaultParallelism locally = cores; on a cluster,
      // the executor total.
      val gSpread = g.repartition(s.sparkContext.defaultParallelism,
        col("nat"), col("name"))
      val variants = gSpread.select(col("minid").as("gid"), col("nat"),
        col("len"), explode(vh).as("v"))
      // ONE exchange, not a two-sided self-join: variants group into
      // (nation, len, hash) buckets — len in the key because only
      // equal-length names can pair (oracle blocking), so cross-length
      // hash-bucket coincidences never become candidates — and each
      // bucket expands its C(k,2) pairs in place. The self-join form
      // shuffles the exploded frame twice and emits the same k² rows
      // per bucket out of the join; this shape moves half the exchange
      // volume and all the probe-side hashing. Bucket sizes track
      // genuine near-clusters (that is the SymSpell invariant), so the
      // in-place expansion is skew-safe exactly where the join was.
      // Measured funnel at sf0.1 (TPC-H names are a DENSE near-dup
      // field — zero-padded digit strings): 1.59M variant rows → 189k
      // k≥2 buckets → 1.27M raw pairs → 695k distinct candidates →
      // 163,383 true pairs. 23% verify precision, 4.2x multiplicity
      // collapsed by the distinct — the wall cost is real workload.
      val cand = variants
        .groupBy(col("nat"), col("len"), col("v"))
        .agg(sort_array(collect_set(col("gid"))).as("gids"))
        .where(size(col("gids")) >= 2)
        .select(col("nat"), explode(expr(
          """flatten(transform(sequence(1, size(gids) - 1), i ->
            |  transform(sequence(i + 1, size(gids)), j ->
            |    struct(element_at(gids, i) AS a_gid,
            |           element_at(gids, j) AS b_gid))))""".stripMargin))
          .as("p"))
        .select(col("nat"), col("p.a_gid"), col("p.b_gid")).distinct()
      val na = g.select(col("minid").as("a_gid"), col("name").as("a_name"),
        col("m").as("m_a"))
      val nb = g.select(col("minid").as("b_gid"), col("name").as("b_name"),
        col("m").as("m_b"))
      val inter = cand.join(na, "a_gid").join(nb, "b_gid")
        .where(levenshtein(col("a_name"), col("b_name"), 2) >= 0)
        .select(col("nat"), (col("m_a") * col("m_b")).as("pairs"),
          least(col("a_gid"), col("b_gid")).as("cand_min"))
      val intra = g.where(col("m") >= 2)
        .select(col("nat"),
          expr("m * (m - 1) DIV 2").as("pairs"), // integer div: `/` is double
          col("minid").as("cand_min"))
      inter.unionByName(intra)
        .groupBy(col("nat").as("c_nationkey"))
        .agg(sum(col("pairs")).as("n_pairs"),
          min(col("cand_min")).as("min_key"))
        .orderBy(col("c_nationkey"))
    }),

    // SCD2 history build from a change log: per user, each run of equal
    // event_type values becomes one version row with [valid_from,
    // valid_to) micros; the open version has valid_to NULL. Classic
    // lag-compare → run-id cumsum → per-run min/max — three window
    // passes over ONE partitioning (user_id), so Catalyst plans a
    // single shuffle + sort for all of them.
    "q100_scd2_history" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      val e = T.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"), col("event_type"))
      val marked = e.withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser) === col("event_type"),
          0).otherwise(1))
      val versions = marked
        .withColumn("ver", sum(col("chg")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("ver"))
        .agg(min(col("event_type")).as("event_type"),
          min(col("t")).as("valid_from"), count(lit(1)).as("n_events"))
      versions
        .withColumn("valid_to", lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ver"))))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_versions"),
          sum(col("n_events")).as("n_events"),
          max(when(col("valid_to").isNull, col("event_type")))
            .as("open_type"))
        .orderBy(col("user_id"))
    }),

    // Calendar gap-fill: daily order counts per priority with missing
    // (priority, day) slots restored as explicit zero rows. The date
    // spine is sequence()/explode of the min..max range (tiny: days ×
    // priorities) cross-joined against the distinct keys, left-joined
    // to the pre-aggregated daily counts — the only wide shuffle is on
    // the already-reduced (priority, day) aggregate, never on raw rows.
    "q101_gapfill" -> ((s, d) => {
      val o = T.orders(s, d).select(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      val daily = o.groupBy(col("prio"), col("day"))
        .agg(count(lit(1)).as("cnt"), Det.dsum(col("o_totalprice")).as("rev"))
      val bounds = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = bounds
        .select(explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
        .crossJoin(o.select(col("prio")).distinct())
      spine.join(daily, Seq("prio", "day"), "left")
        .select(col("prio"), col("day"),
          coalesce(col("cnt"), lit(0L)).as("n"),
          coalesce(col("rev"), lit(0.0d)).as("revenue"),
          col("cnt").isNull.as("filled"))
        .orderBy(col("prio"), col("day"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // identical blocking/agreement/m-u/ratio construction; likelihood
    // thresholds compare by cross-multiplication on both engines
    "q268_record_linkage" ->
      """WITH a AS (
        |  SELECT c_custkey AS ka, c_name AS na, c_mktsegment AS sa,
        |    c_acctbal AS ba, substr(c_name, 10, 7) AS blk
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey AS kb,
        |    CASE WHEN c_custkey % 11 = 0 THEN c_name || 'X'
        |      ELSE c_name END AS nb,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
        |      ELSE c_mktsegment END AS sb,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 5.0
        |      ELSE c_acctbal END AS bb,
        |    substr(c_name, 10, 7) AS blk
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |cand AS (
        |  SELECT ka = kb AS tr, na = nb AS g1, sa = sb AS g2,
        |    abs(ba - bb) < 1.0 AS g3
        |  FROM a JOIN b USING (blk)),
        |st AS (
        |  SELECT
        |    SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS nm,
        |    SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS nu,
        |    SUM(CASE WHEN tr AND g1 THEN 1 ELSE 0 END) AS a1m,
        |    SUM(CASE WHEN tr AND g2 THEN 1 ELSE 0 END) AS a2m,
        |    SUM(CASE WHEN tr AND g3 THEN 1 ELSE 0 END) AS a3m,
        |    SUM(CASE WHEN NOT tr AND g1 THEN 1 ELSE 0 END) AS a1u,
        |    SUM(CASE WHEN NOT tr AND g2 THEN 1 ELSE 0 END) AS a2u,
        |    SUM(CASE WHEN NOT tr AND g3 THEN 1 ELSE 0 END) AS a3u
        |  FROM cand),
        |mu AS (
        |  SELECT
        |    CASE WHEN nm > 0 THEN greatest(5, least(995,
        |      (1000 * a1m) // nm)) ELSE 500 END AS m1,
        |    CASE WHEN nm > 0 THEN greatest(5, least(995,
        |      (1000 * a2m) // nm)) ELSE 500 END AS m2,
        |    CASE WHEN nm > 0 THEN greatest(5, least(995,
        |      (1000 * a3m) // nm)) ELSE 500 END AS m3,
        |    CASE WHEN nu > 0 THEN greatest(5, least(995,
        |      (1000 * a1u) // nu)) ELSE 500 END AS u1,
        |    CASE WHEN nu > 0 THEN greatest(5, least(995,
        |      (1000 * a2u) // nu)) ELSE 500 END AS u2,
        |    CASE WHEN nu > 0 THEN greatest(5, least(995,
        |      (1000 * a3u) // nu)) ELSE 500 END AS u3
        |  FROM st),
        |scored AS (
        |  SELECT tr,
        |    (CASE WHEN g1 THEN m1 ELSE 1000 - m1 END)
        |    * (CASE WHEN g2 THEN m2 ELSE 1000 - m2 END)
        |    * (CASE WHEN g3 THEN m3 ELSE 1000 - m3 END) AS num,
        |    (CASE WHEN g1 THEN u1 ELSE 1000 - u1 END)
        |    * (CASE WHEN g2 THEN u2 ELSE 1000 - u2 END)
        |    * (CASE WHEN g3 THEN u3 ELSE 1000 - u3 END) AS den
        |  FROM cand CROSS JOIN mu)
        |SELECT
        |  CASE WHEN num >= 8 * den THEN 'link'
        |    WHEN 8 * num <= den THEN 'nonlink'
        |    ELSE 'possible' END AS class,
        |  COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_true,
        |  CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_false
        |FROM scored GROUP BY 1 ORDER BY class""".stripMargin,

    // identical derived sources and survivorship algebra; vote/tiebreak
    // via list_sort on (−votes, prio) / (−length, name) structs
    "q272_golden_record" ->
      """WITH a AS (
        |  SELECT c_custkey AS ck, c_name AS nm, c_mktsegment AS sg,
        |    c_acctbal AS bal, 1 AS prio FROM customer),
        |b AS (
        |  SELECT c_custkey AS ck,
        |    CASE WHEN c_custkey % 11 = 0 THEN c_name || 'X'
        |      ELSE c_name END AS nm,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
        |      ELSE c_mktsegment END AS sg,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 5.0
        |      ELSE c_acctbal END AS bal, 2 AS prio
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |c AS (
        |  SELECT c_custkey AS ck,
        |    CASE WHEN c_custkey % 9 = 0 THEN upper(c_name)
        |      ELSE c_name END AS nm,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
        |      WHEN c_custkey % 6 = 0 THEN 'ONLINE'
        |      ELSE c_mktsegment END AS sg,
        |    CASE WHEN c_custkey % 8 = 0 THEN c_acctbal - 3.0
        |      ELSE c_acctbal END AS bal, 3 AS prio
        |  FROM customer WHERE c_custkey % 4 <> 0),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b
        |      UNION ALL SELECT * FROM c),
        |g AS (
        |  SELECT ck,
        |    list(struct_pack(prio := prio, nm := nm, sg := sg)) AS arr,
        |    MAX(bal) AS g_balance,
        |    CAST(bit_or(1 << prio) AS BIGINT) AS src_mask,
        |    COUNT(*) AS n_src
        |  FROM u GROUP BY ck)
        |SELECT ck,
        |  list_sort(list_transform(arr, x -> struct_pack(
        |    nl := -length(x.nm), v := x.nm)))[1].v AS g_name,
        |  list_sort(list_transform(arr, x -> struct_pack(
        |    nv := -len(list_filter(arr, y -> y.sg = x.sg)),
        |    p := x.prio, v := x.sg)))[1].v AS g_segment,
        |  g_balance, src_mask, n_src
        |FROM g ORDER BY ck""".stripMargin,

    "q105_foreach_batch" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value")} AS sum_value, TRUE AS sinks_agree
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q106_stream_outer_join" ->
      """SELECT v.user_id, COUNT(*) AS n_rows,
        |  COUNT(b.event_id) AS n_matched,
        |  CAST(COUNT(*) FILTER (b.event_id IS NULL) AS BIGINT)
        |    AS n_orphans
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON v.user_id = b.user_id
        |  AND epoch_us(b.ts) >= epoch_us(v.ts)
        |  AND epoch_us(b.ts) <= epoch_us(v.ts) + 86400000000
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    "q97_ingest_xml" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${Det.sqlSum("o_totalprice")} AS sum_price,
         |  MAX(o_orderkey) AS max_key
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q102_zorder_skip" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${Det.sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_partkey BETWEEN 100 AND 300
         |  AND l_suppkey BETWEEN 2 AND 5
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q96_recursive_cte" ->
      """WITH RECURSIVE walk(c_custkey, anc, depth) AS (
        |  SELECT c_custkey, c_custkey AS anc, 0 AS depth FROM customer
        |  UNION ALL
        |  SELECT w.c_custkey, w.anc // 2 AS anc, w.depth + 1 AS depth
        |  FROM walk w WHERE w.anc > 1
        |)
        |SELECT depth, COUNT(*) AS n,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
        |    AS sum_bal
        |FROM walk w JOIN customer c ON w.c_custkey = c.c_custkey
        |WHERE w.anc = 1
        |GROUP BY depth ORDER BY depth""".stripMargin,

    "q98_hash_split" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
        |            THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
        |            THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY split ORDER BY split""".stripMargin,

    "q99_fuzzy_pairs" ->
      """SELECT a.c_nationkey, COUNT(*) AS n_pairs,
        |  MIN(a.c_custkey) AS min_key
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey
        | AND length(a.c_name) = length(b.c_name)
        | AND a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 2
        |GROUP BY a.c_nationkey ORDER BY a.c_nationkey""".stripMargin,

    "q100_scd2_history" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t, event_type,
        |    CASE WHEN lag(event_type) OVER w = event_type THEN 0 ELSE 1
        |      END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), versions AS (
        |  SELECT user_id, ver, MIN(event_type) AS event_type,
        |    MIN(t) AS valid_from, COUNT(*) AS n_events
        |  FROM (SELECT *, SUM(chg) OVER (PARTITION BY user_id
        |          ORDER BY t, event_id) AS ver FROM marked)
        |  GROUP BY user_id, ver
        |), closed AS (
        |  SELECT *, lead(valid_from) OVER (PARTITION BY user_id
        |    ORDER BY ver) AS valid_to FROM versions
        |)
        |SELECT user_id, COUNT(*) AS n_versions,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  MAX(CASE WHEN valid_to IS NULL THEN event_type END) AS open_type
        |FROM closed GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q101_gapfill" ->
      s"""WITH o AS (SELECT o_orderpriority AS prio,
         |    CAST(o_orderdate AS DATE) AS day, o_totalprice FROM orders),
         |daily AS (
         |  SELECT prio, day, COUNT(*) AS cnt,
         |    ${Det.sqlSum("o_totalprice")} AS rev
         |  FROM o GROUP BY prio, day),
         |spine AS (
         |  SELECT p.prio, CAST(g.day AS DATE) AS day
         |  FROM (SELECT DISTINCT prio FROM o) p,
         |    (SELECT unnest(generate_series(
         |       (SELECT MIN(day) FROM o), (SELECT MAX(day) FROM o),
         |       INTERVAL 1 DAY)) AS day) g)
         |SELECT s.prio, s.day,
         |  COALESCE(d.cnt, 0) AS n, COALESCE(d.rev, 0.0) AS revenue,
         |  d.cnt IS NULL AS filled
         |FROM spine s LEFT JOIN daily d
         |  ON s.prio = d.prio AND s.day = d.day
         |ORDER BY s.prio, s.day""".stripMargin
  )
}
