package graft.operators

import scala.collection.mutable.ArrayBuffer

import graft.{Det, Tables => T}
import graft.functions.{BloomPrune, FreqAgg}
import graft.streaming.StreamingCollect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Round-3 operator surface: custom-state streaming sessionization,
  * bloom-pruned joins, ORC ingest, sketch-then-exact heavy hitters, URL
  * curation, bin-bucketed range join, grouping sets.
  */
object ExtendedQueries {

  /** Per-user state for q73: the currently-open session. */
  final case class SessState(start: Long, last: Long, n: Long)

  /** Per-user state for q85 (transformWithState). */
  final case class TwsState(n: Long, nPurchase: Long)

  /** Update row emitted per touched user per micro-batch (q85). */
  final case class TwsUpdate(user_id: Long, n_events: Long,
      n_purchases: Long)

  /** q85's StatefulProcessor: the Spark 4 arbitrary-state API
    * (successor to mapGroupsWithState — typed state handles from a
    * StatefulProcessorHandle, RocksDB-backed, TTL-capable). One
    * ValueState[TwsState] per user; emits the running totals for every
    * touched key per batch (update mode), so the monotone max post-agg
    * collapses any batch split to the final state. */
  final class TwsCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Boolean), TwsUpdate] {
    @transient private var st
        : org.apache.spark.sql.streaming.ValueState[TwsState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      st = getHandle.getValueState[TwsState]("totals",
        org.apache.spark.sql.Encoders.product[TwsState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Boolean)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsUpdate] = {
      var s = Option(st.get()).getOrElse(TwsState(0L, 0L))
      rows.foreach { case (_, purch) =>
        s = TwsState(s.n + 1, s.nPurchase + (if (purch) 1L else 0L))
      }
      st.update(s)
      Iterator.single(TwsUpdate(key, s.n, s.nPurchase))
    }
  }

  /** 12 h in microseconds — q56/q73 share the gap so both check against
    * the same gaps-and-islands oracle. */
  private val GapUs = 43200000000L

  /** Build a frame under a planning-time conf override, FORCE the
    * physical plan while the override is live, then restore the previous
    * value — the returned frame keeps its planned form (QueryExecution
    * caches executedPlan) while later registry queries see an untouched
    * session. A bare conf.set here was a one-way mutation that made
    * every subsequent query's plan depend on registry iteration order. */
  private def withPlannedConf(s: SparkSession, key: String, value: String)(
      build: => DataFrame): DataFrame =
    graft.Confs.withPlannedConf(s, key, value)(build)

  /** Bucketed + per-bucket-sorted orders/customer tables (8 buckets on the
    * join/filter key), written once per sf: the layout that replaces the
    * join shuffle (q87) and lets a key-equality scan read ONE bucket file
    * instead of the table (q185). One writer task per bucket → one file
    * per bucket, the only layout whose sort order Spark trusts. */
  private[graft] def bucketedTables(s: SparkSession, d: String)
      : (String, String) = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val to = s"graft_bkt_orders$tag"
    val tc = s"graft_bkt_cust$tag"
    // a previous JVM's in-memory catalog is gone but its warehouse dir
    // survives — saveAsTable refuses the orphaned location, so clear it
    def freshTable(name: String)(write: => Unit): Unit =
      if (!s.catalog.tableExists(name)) {
        // resolve the REAL warehouse location: a hardcoded relative
        // "spark-warehouse" misses the orphan when the JVM runs from a
        // different cwd or spark.sql.warehouse.dir is configured
        val wh = java.nio.file.Paths.get(java.net.URI.create(
          s.conf.get("spark.sql.warehouse.dir")
            match { case u if u.contains(":") => u
                    case p => new java.io.File(p).toURI.toString })).toFile
        val orphan = new java.io.File(wh, name)
        if (orphan.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory)
              Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(): Unit
          }
          rm(orphan)
        }
        write
      }
    freshTable(to) {
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8, col("o_custkey"))
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(to)
    }
    freshTable(tc) {
      T.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        .repartition(8, col("c_custkey"))
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(tc)
    }
    (to, tc)
  }

  /** q76/q95's planted heavy-hitter keying (~10% of rows on each of 5
    * hot keys, the rest spread over 100k) — ONE definition, Spark and
    * SQL, so the two sketch queries always share the distribution their
    * candidate-set proofs rely on. */
  private def heavyKeyed(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).select(
      when(col("l_orderkey") % 2 === 0, col("l_orderkey") % 5)
        .otherwise(lit(100) + (col("l_orderkey") % 100000))
        .cast("long").as("hk"))

  private val heavyKeySql =
    """SELECT CASE WHEN l_orderkey % 2 = 0 THEN l_orderkey % 5
      |              ELSE 100 + (l_orderkey % 100000) END AS hk
      |  FROM lineitem""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bucket pruning on read: a key-equality filter over the bucketed
    // table touches ONE bucket file of 8 — the scan-side dividend of the
    // bucketed layout (q87 shows the join-side one). At 100 TB the
    // difference is reading 1/8 of the files for point lookups with zero
    // shuffle; ExtendedSpec pins SelectedBucketsCount in the plan.
    "q185_bucket_pruning" -> ((s, d) => {
      val (to, _) = bucketedTables(s, d)
      // auto-bucketed-scan turns the bucketed layout OFF when no join
      // needs the distribution — but pruning is exactly the case where
      // the layout pays without a join, so keep the scan bucketed.
      // Scoped: the conf is restored once the plan is forced, so the
      // planning override never leaks into later registry queries.
      withPlannedConf(s,
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
        s.table(to)
          .where(col("o_custkey") === 107)
          .agg(count(lit(1)).as("n"),
            Det.dsum(col("o_totalprice")).as("sum_price"))
      }
    }),


    // Custom-state sessionization via flatMapGroupsWithState — the typed
    // escape hatch where q56's built-in session_window is the declarative
    // form. State = the one open session per user; a closed session is
    // emitted the moment a ≥ 12 h gap appears, which is what Append-mode
    // flatMapGroupsWithState allows without any watermark coupling. Same
    // two-batch fixture as q56 (real events, then a far-future flush per
    // user): the flush closes every real session; the flush's own
    // singleton session stays open in state and is never emitted. Rows
    // within a batch arrive unordered, so each invocation sorts its
    // group's timestamps — memory is bounded by one user's events per
    // micro-batch (a real deployment bounds that via maxFilesPerTrigger /
    // source admission, same as here).
    "q73_sessions_flatmap" -> ((s, d) => {
      import s.implicits._
      val dir = StreamCatalogQueries.sessionFixture(s, d)
      val schema = s.read.parquet(dir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .select(col("user_id").cast("long").as("uid"),
          unix_micros(col("ts")).as("t"))
        .as[(Long, Long)]
      val closed = stream.groupByKey(_._1)
        .flatMapGroupsWithState[SessState, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (uid, rows, state) =>
            val ts = rows.map(_._2).toArray
            java.util.Arrays.sort(ts)
            var st = state.getOption.getOrElse(SessState(0L, 0L, 0L))
            val out = ArrayBuffer.empty[(Long, Long)]
            ts.foreach { t =>
              if (st.n == 0L) st = SessState(t, t, 1L)
              else if (t - st.last >= GapUs) {
                out += ((uid, st.n)); st = SessState(t, t, 1L)
              } else st = SessState(st.start, t, st.n + 1)
            }
            state.update(st)
            out.iterator
        }.toDF("user_id", "n_events")
      StreamingCollect.runBounded(s, closed, "q73_sessions_flatmap_sink",
          outputMode = "append")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).cast("long").as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Bloom-pruned dimension join: the filtered dim's keys become a
    // compact membership sketch, fact rows that cannot match are dropped
    // at scan speed before any join/shuffle, then the exact broadcast
    // join runs on the survivors. The pruning is correctness-transparent
    // (false positives die in the exact join), so the oracle is the
    // plain join.
    "q74_bloom_join" -> ((s, d) => {
      val dim = T.part(s, d)
        .where(col("p_type") === "PROMO" && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_retailprice"))
      BloomPrune.prunedJoin(T.lineitem(s, d), dim,
          "l_partkey", "p_partkey", expectedItems = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // ORC ingest (columnar source beyond parquet/CSV/JSON/ZIP): the
    // fixture round-trips lineitem through ORC files, and the query
    // reads them back with a pushable predicate — ExplainSpec asserts
    // the filter reaches the ORC scan just like the parquet paths.
    "q75_ingest_orc" -> ((s, d) => {
      val dir = orcFixture(s, d)
      s.read.orc(dir)
        .where(col("l_quantity") <= 25 && col("l_discount") > 0.02)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Heavy hitters, sketch-then-exact: a mergeable Misra–Gries pass
    // nominates candidate keys (≤ k per map task cross the shuffle — see
    // [[graft.functions.FreqAgg]]), then one exact counting pass
    // restricted to the candidates. Any key above n/(k+1) of the mass is
    // guaranteed nominated, and the synthesized key column puts ~10 % of
    // all rows on each of 5 keys (k = 32), so the exact top-5 is
    // provably inside the candidate set — which is why the plain SQL
    // top-5 is a valid oracle for the two-pass pipeline.
    "q76_heavy_hitters" -> ((s, d) => {
      val keyed = heavyKeyed(s, d)
      val cands = keyed
        .agg(FreqAgg.freqSketch(col("hk"), 32).as("cand"))
        .select(explode(col("cand")).as("hk"))
      keyed.join(broadcast(cands), "hk")
        .groupBy(col("hk")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("hk"))
        .limit(5)
    }),

    // URL/domain extraction over planted URLs (the raw corpus has none —
    // checked): the Spark side finds the URL with a regexp, parses the
    // host with parse_url (codegen'd built-in), and reduces it to the
    // registrable domain; the oracle derives the same domain
    // analytically from the planting schedule, so any extraction bug
    // breaks the hash.
    "q77_url_extract" -> ((s, d) => {
      val planted = T.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" see https://www"),
            (col("doc_id") % 7).cast("string"), lit(".example"),
            (col("doc_id") % 50).cast("string"),
            lit(".org/a/b?x=1&y=2 next")))
          .otherwise(col("text")).as("text"))
      planted
        .select(regexp_extract(col("text"), "https://[^ ]+", 0).as("url"))
        .where(col("url") =!= "")
        .select(parse_url(col("url"), lit("HOST")).as("host"))
        .select(regexp_extract(col("host"), "[^.]+\\.[^.]+$", 0)
          .as("domain"))
        .groupBy(col("domain")).agg(count(lit(1)).as("n"))
        .orderBy(col("domain"))
    }),

    // Bin-bucketed range join: overlapping 9 h windows on a 6 h stride
    // vs the event stream. The naive plan is a broadcast-nested-loop on
    // the range predicate; bucketing both sides to 6 h bins (each window
    // covers exactly two bins) turns it into an equi-join on bin with a
    // residual range filter — the shape that scales to 100 TB because
    // the join explodes by windows-per-bin (2), not by windows (100).
    "q78_range_join" -> ((s, d) => {
      val H6 = 21600000000L
      val H9 = 32400000000L
      val ev = T.events(s, d)
        .select(unix_micros(col("ts")).as("t"), col("value"))
      val origin = ev.agg(min(col("t")).as("o"))
      val windows = s.range(0, 100).select(col("id").as("w"))
        .crossJoin(broadcast(origin))
        .select(col("w"), (col("o") + col("w") * H6).as("ws"),
          (col("o") + col("w") * H6 + H9).as("we"))
      val wBins = windows.select(col("w"), col("ws"), col("we"),
        explode(sequence(col("w"), col("w") + 1)).as("wbin"))
      val evBins = ev.crossJoin(broadcast(origin))
        .select(col("t"), col("value"),
          ((col("t") - col("o")) / H6).cast("long").as("ebin"))
      evBins.join(broadcast(wBins),
          col("ebin") === col("wbin") &&
            col("t") >= col("ws") && col("t") < col("we"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("w"))
    }),

    // Stream-static enrichment join: the streaming event feed joined to
    // a static dimension (broadcast per micro-batch, no state store —
    // Spark re-plans the static side into each batch). The §2.9 pattern
    // q37-q73 didn't cover: enrichment, not correlation, so no
    // watermarks and no join state to evict.
    "q80_stream_enrich" -> ((s, d) => {
      graft.Confs.pinNanosAsLong(s)
      val batchSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
      val dim = T.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = stream
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      StreamingCollect.runBounded(s, enriched, "q80_stream_enrich_sink")
        .orderBy(col("c_mktsegment"), col("event_type"))
    }),

    // Unpivot (melt): wide per-flag aggregates back to long form — the
    // inverse of q68's pivot, through the dedicated Dataset API (a
    // single Expand over the value columns, no union of re-scans).
    "q81_unpivot" -> ((s, d) => {
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_price"),
          Det.dsum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "val")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist
    // over a unique total order (price, orderkey) so every rank is
    // deterministic — rounding out q06/q07's rank/running-sum coverage.
    "q82_window_ntile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_orderkey"))
        .limit(500)
    }),

    // Multiset set operations — INTERSECT ALL / EXCEPT ALL preserve
    // duplicate multiplicities (min/difference of per-value counts),
    // where q08's distinct variants collapse them. Counted afterwards so
    // the gate compares multiplicities, which is exactly what
    // distinguishes ALL from DISTINCT.
    "q83_setops_all" -> ((s, d) => {
      val o = T.orders(s, d)
      val open = o.where(col("o_orderstatus") === "O")
        .select(col("o_orderpriority").as("pri"))
      val done = o.where(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("pri"))
      val inter = open.intersectAll(done)
        .groupBy(col("pri")).agg(count(lit(1)).as("n_intersect_all"))
      val exc = open.exceptAll(done)
        .groupBy(col("pri")).agg(count(lit(1)).as("n_except_all"))
      inter.join(exc, Seq("pri"), "full_outer")
        .select(col("pri"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
        .orderBy(col("pri"))
    }),

    // Full-outer join with presence flags — the join shape q03-q09
    // (inner/semi/anti/broadcast) didn't cover. Nation keys present on
    // only one side survive with nulls; the aggregation counts each
    // presence combination per region so the gate checks the outer
    // semantics, not just the matched rows.
    "q84_outer_join" -> ((s, d) => {
      val cust = T.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = T.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, col("c_nationkey") === col("s_nationkey"),
          "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          (col("c_nationkey").isNotNull &&
            col("s_nationkey").isNotNull).as("both_sides"))
        .orderBy(col("nationkey"))
    }),

    // Arbitrary stateful streaming through transformWithState — the
    // Spark 4 successor to q70's mapGroupsWithState: typed state handles
    // (ValueState/ListState/MapState) acquired from a
    // StatefulProcessorHandle, mandatory RocksDB state store, TTL
    // support. Integer-only state so the oracle is exact; the provider
    // conf is scoped to this query and restored after.
    "q85_transform_with_state" -> ((s, d) => {
      import s.implicits._
      graft.Confs.pinNanosAsLong(s)
      val batchSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .select(col("user_id").cast("long").as("uid"),
          (col("event_type") === "purchase").as("purch"))
        .as[(Long, Boolean)]
      val updates = stream.groupByKey(_._1)
        .transformWithState(new TwsCountProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update)
        .toDF("user_id", "n_events", "n_purchases")
      graft.Confs.withRunConf(s,
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider") {
        // fewer state partitions than the HDFS-backed queries: each one
        // is a full RocksDB instance (native alloc + changelog), and the
        // keyspace (1 user state per partition-row) never needs 8 of them
        // on a bounded replay
        StreamingCollect.runBounded(s, updates,
            "q85_transform_with_state_sink", statePartitions = 2,
            outputMode = "update")
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"),
            max(col("n_purchases")).as("n_purchases"))
          .orderBy(col("user_id"))
      }
    }),

    // Dynamic partition overwrite: full partitioned load, then an
    // overwrite that rewrites ONLY the partitions present in the new
    // data (the purchase partition, values doubled) while every other
    // partition survives untouched — the warehouse-maintenance primitive
    // for incremental re-loads at 100 TB (rewrite one day/type, not the
    // table). The conf is scoped to the query and restored.
    "q86_partition_overwrite" -> ((s, d) => {
      // per-run scratch, NOT a fixture dir: this query REWRITES its
      // table by design (it is the partition-overwrite demo), and a
      // mid-loop write into the fixture tree would make Bench's
      // fixture_writes_during_queries flag (0 = no timed query paid a
      // build) permanently noisy
      val out = graft.Scratch.runDir("graft_q86_bytype")
      val ev = T.events(s, d)
        .select(col("event_id"), col("value"), col("event_type"))
      ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
      graft.Confs.dynamicOverwrite(s) {
        ev.where(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .write.mode("overwrite").partitionBy("event_type").parquet(out)
      }
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Bucketed co-located join: both tables pre-bucketed and pre-sorted
    // on the join key, so the sort-merge join needs neither an exchange
    // nor a sort — the data layout IS the shuffle, paid once at write
    // time and amortized over every subsequent join. ExtendedSpec
    // asserts the join subtree contains no shuffle. The merge hint keeps
    // the demo honest (a broadcast would also avoid the shuffle, but
    // only because the test data is small).
    "q87_bucketed_join" -> ((s, d) => {
      val (to, tc) = bucketedTables(s, d)
      // since 3.0 Spark ignores the buckets' sort order unless told the
      // layout guarantees it (exactly one file per bucket, which the
      // repartition above ensures) — without this the SMJ re-sorts.
      // Scoped like q185: restored once the plan is forced.
      withPlannedConf(s,
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
        s.table(to).hint("merge")
          .join(s.table(tc), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            Det.dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("c_mktsegment"))
      }
    }),

    // Variant semi-structured data (Spark 4): parse_json into the
    // binary-encoded VariantType, then typed path extraction — the
    // shredded-JSON path that replaces string get_json_object re-parsing
    // (q14's form) at scale: parse once, extract many.
    "q88_variant_json" -> ((s, d) => {
      T.events(s, d)
        .select(variant_get(parse_json(col("props")), "$.k", "int")
          .as("k"), col("value"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"),
          Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("k_mod"))
    }),

    // RANGE window frame: per-user trailing 1 h sum over event time —
    // the frame is value-based (all rows within the time distance), not
    // row-count-based like q07's running sum. Decimal-routed so the
    // in-frame addition order can't break the hash gate.
    "q89_window_range_frame" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val D = org.apache.spark.sql.types.DecimalType(38, 6)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"))
        .rangeBetween(-3600000000L, Window.currentRow)
      T.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t"), col("value"))
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(D)).over(w).cast("double")
            .as("trailing_1h"))
        .orderBy(col("event_id"))
        .limit(500)
    }),

    // LATERAL correlated subquery: top-2 orders per customer, expressed
    // as a per-row dependent subquery with ORDER BY + LIMIT — the form
    // Catalyst decorrelates into a ranked window join rather than
    // executing per-row (which is what makes it admissible at scale).
    "q90_lateral_topk" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer c,
          |LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |WHERE c.c_custkey < 200
          |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
    }),

    // Count-min sketch: point-frequency estimates from a fixed-size
    // grid (the update-heavy counterpart to Misra–Gries — CMS answers
    // "how often did THIS key occur", MG answers "which keys are
    // heavy"). Distributed build via the stat API (mergeable grid,
    // fixed seed), probed for the five planted heavy keys; the gate
    // checks the one-sided CMS bound (estimate ≥ exact, overshoot ≤
    // eps·N with eps 10× headroom), which a fixed seed makes
    // deterministic. Completes the sketch family: HLL (q66), quantile
    // (q71), MG (q76), bloom (q74), minhash/simhash (q30/q31).
    "q95_countmin_sketch" -> ((s, d) => {
      import s.implicits._
      val keyed = heavyKeyed(s, d)
      val cms = keyed.stat.countMinSketch("hk", eps = 0.0001,
        confidence = 0.99, seed = 42)
      val n = keyed.count()
      val exact = keyed.where(col("hk") < 5)
        .groupBy(col("hk")).agg(count(lit(1)).as("n_exact"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      exact.toSeq.sortBy(_._1).map { case (k, ex) =>
        val est = cms.estimateCount(k)
        (k, ex, est >= ex && (est - ex) <= (0.001 * n).toLong)
      }.toDF("hk", "n_exact", "within_bound")
    }),

    // The native streaming FILE sink: append-mode pass-through into a
    // partitioned parquet layout with the sink's transactional commit
    // log providing exactly-once (the _spark_metadata manifest, not
    // best-effort directory listing) — the production landing-zone shape
    // for continuous collection, complementing q38's foreachBatch path
    // and q37's memory sink. Fresh output+checkpoint per invocation so a
    // replay can't double-append.
    "q94_stream_file_sink" -> ((s, d) => {
      graft.Confs.pinNanosAsLong(s)
      val batchSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .select(col("event_id"), col("event_type"), col("value"))
      val base = graft.Scratch.runDir("graft_stream_sink")
      val q = stream.writeStream
        .format("parquet")
        .option("path", s"$base/data")
        .option("checkpointLocation", s"$base/ckpt")
        .partitionBy("event_type")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/data")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Observed metrics: per-scan counters collected as a side channel of
    // the ONE pass that computes the real result (the Observation API —
    // Spark's AccumulatorV2-backed answer to "how many rows did this
    // stage actually see", the audit signal the reference's worker
    // heartbeats carry). No second scan: the observe node's metrics
    // materialize when the downstream action runs.
    "q93_observe_metrics" -> ((s, d) => {
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation()
      val observed = T.lineitem(s, d)
        .observe(obs, count(lit(1)).as("rows_seen"),
          Det.dsum(col("l_quantity")).as("qty_seen"))
      val nFiltered = observed.where(col("l_returnflag") === "R")
        .agg(count(lit(1))).collect()(0).getLong(0)
      val m = obs.get
      Seq((m("rows_seen").asInstanceOf[Long],
        m("qty_seen").asInstanceOf[Double], nFiltered))
        .toDF("rows_seen", "qty_seen", "n_filtered")
    }),

    // Sketches inside the streaming engine: per-window approximate
    // distinct users via HLL++ (approx_count_distinct is the only
    // distinct aggregate Structured Streaming admits — exact DISTINCT
    // needs unbounded state). The bounded result joins to the batch
    // exact counts and the gate checks the 5 % envelope (1 % target rsd
    // → 5× headroom; at these cardinalities HLL++ runs in its sparse,
    // effectively-exact regime, so the boolean is stable).
    "q92_stream_sketch_window" -> ((s, d) => {
      graft.Confs.pinNanosAsLong(s)
      val batchSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .transform(T.normalizeEventTs)
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("n_approx"))
        .select(col("window.start").as("window_start"), col("n_approx"))
      val streamed = StreamingCollect.runBounded(s, agg,
        "q92_stream_sketch_window_sink")
      val exact = T.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      streamed.join(exact, Seq("window_start"))
        .select(col("window_start"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) <=
            col("n_exact") * 0.05).as("within_5pct"))
        .orderBy(col("window_start"))
    }),

    // IVF index lifecycle: build once (partitioned-by-cell assignment
    // table + centroid table on disk), reload, query. Gate configuration
    // probes every cell, so the result must equal brute force (the q45
    // oracle); the scale property — a real probe reads only the probed
    // cells' partitions — is asserted separately in ExtendedSpec.
    "q91_ivf_index" -> ((s, d) => {
      val dir = ivfIndexFixture(s, d)
      val emb = T.embeddings(s, d)
      graft.similarity.Similarity.ivfTopKIndexed(
          emb.where(col("vec_id") < 10), dir, k = 5, nProbe = 16)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Grouping sets — the general form behind q10's rollup and q67's
    // cube, through the dedicated Dataset API (one Expand, no union of
    // re-scans).
    "q79_grouping_sets" -> ((s, d) => {
      T.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    })
  )

  /** Persisted IVF index fixture (built once per sf). */
  private[graft] def ivfIndexFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "ivf_index")
    if (!new java.io.File(s"$out/assignments/_SUCCESS").exists()) {
      graft.similarity.Similarity.saveIvfIndex(
        T.embeddings(s, d), out, nCells = 16)
    }
    out
  }

  /** ORC round-trip fixture: lineitem re-landed as 8 ORC files. */
  private[graft] def orcFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "lineitem_orc")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.lineitem(s, d).repartition(8).write.mode("overwrite").orc(out)
    }
    out
  }

  def oracleSql: Map[String, String] = Map(
    // same sessionization oracle as q56 — deliberately: two independent
    // implementations (built-in session_window vs custom state machine)
    // must land on the same answer.
    "q73_sessions_flatmap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |m AS (
        |  SELECT user_id, t,
        |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |      >= 43200000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, COUNT(DISTINCT sid) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q74_bloom_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${Det.sqlSum("l_quantity")} AS sum_qty,
         |  ${Det.sqlSum("p_retailprice")} AS sum_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_type = 'PROMO' AND p_size <= 10
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q75_ingest_orc" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${Det.sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_quantity <= 25 AND l_discount > 0.02
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q76_heavy_hitters" ->
      s"""SELECT hk, COUNT(*) AS n FROM (
        |  $heavyKeySql)
        |GROUP BY hk ORDER BY n DESC, hk LIMIT 5""".stripMargin,

    "q77_url_extract" ->
      """SELECT 'example' || CAST(doc_id % 50 AS VARCHAR) || '.org'
        |    AS domain,
        |  COUNT(*) AS n
        |FROM documents WHERE doc_id % 3 = 0
        |GROUP BY domain ORDER BY domain""".stripMargin,

    "q78_range_join" ->
      s"""WITH o AS (SELECT MIN(epoch_us(ts)) AS o FROM events),
         |w AS (SELECT g.w, o.o + g.w * 21600000000 AS ws,
         |        o.o + g.w * 21600000000 + 32400000000 AS we
         |      FROM generate_series(0, 99) g(w), o)
         |SELECT w.w AS w, COUNT(*) AS n,
         |  ${Det.sqlSum("e.value")} AS sum_value
         |FROM w JOIN events e
         |  ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
         |GROUP BY w.w ORDER BY w.w""".stripMargin,

    "q95_countmin_sketch" ->
      s"""SELECT hk, COUNT(*) AS n_exact, TRUE AS within_bound FROM (
        |  $heavyKeySql)
        |WHERE hk < 5 GROUP BY hk ORDER BY hk""".stripMargin,

    "q94_stream_file_sink" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q93_observe_metrics" ->
      s"""SELECT COUNT(*) AS rows_seen,
         |  ${Det.sqlSum("l_quantity")} AS qty_seen,
         |  COUNT(*) FILTER (l_returnflag = 'R') AS n_filtered
         |FROM lineitem""".stripMargin,

    "q92_stream_sketch_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  COUNT(DISTINCT user_id) AS n_exact, TRUE AS within_5pct
        |FROM events GROUP BY window_start ORDER BY window_start""".stripMargin,

    // full-probe over the persisted index ≡ brute force — same oracle
    // shape as q45
    "q91_ivf_index" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND c.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q88_variant_json" ->
      s"""SELECT CAST(json_extract(props, '$$.k') AS INTEGER) % 10
         |    AS k_mod,
         |  COUNT(*) AS n,
         |  MAX(CAST(json_extract(props, '$$.k') AS INTEGER)) AS max_k,
         |  ${Det.sqlSum("value")} AS sum_value
         |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin,

    "q89_window_range_frame" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_1h
        |FROM events
        |ORDER BY event_id LIMIT 500""".stripMargin,

    "q90_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey < 200
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,

    "q86_partition_overwrite" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum(
              "CASE WHEN event_type = 'purchase' THEN value * 2 " +
                "ELSE value END")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q185_bucket_pruning" -> {
      val q = Det.sqlSum("o_totalprice")
      s"""SELECT COUNT(*) AS n, $q AS sum_price
         |FROM orders WHERE o_custkey = 107""".stripMargin
    },

    "q87_bucketed_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |  ${Det.sqlSum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q83_setops_all" ->
      """WITH open AS (SELECT o_orderpriority AS pri FROM orders
        |  WHERE o_orderstatus = 'O'),
        |done AS (SELECT o_orderpriority AS pri FROM orders
        |  WHERE o_orderstatus = 'F'),
        |i AS (SELECT pri, COUNT(*) AS n_intersect_all FROM (
        |  SELECT pri FROM open INTERSECT ALL SELECT pri FROM done)
        |  GROUP BY pri),
        |e AS (SELECT pri, COUNT(*) AS n_except_all FROM (
        |  SELECT pri FROM open EXCEPT ALL SELECT pri FROM done)
        |  GROUP BY pri)
        |SELECT COALESCE(i.pri, e.pri) AS pri,
        |  COALESCE(n_intersect_all, 0) AS n_intersect_all,
        |  COALESCE(n_except_all, 0) AS n_except_all
        |FROM i FULL OUTER JOIN e ON i.pri = e.pri
        |ORDER BY pri""".stripMargin,

    "q84_outer_join" ->
      """WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
        |  GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
        |  GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust,
        |  COALESCE(n_supp, 0) AS n_supp,
        |  (c_nationkey IS NOT NULL AND s_nationkey IS NOT NULL)
        |    AS both_sides
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q85_transform_with_state" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
        |    AS n_purchases
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q80_stream_enrich" ->
      s"""SELECT c_mktsegment, event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment, event_type
         |ORDER BY c_mktsegment, event_type""".stripMargin,

    "q81_unpivot" ->
      s"""WITH agg AS (
         |  SELECT l_returnflag,
         |    ${Det.sqlSum("l_quantity")} AS sum_qty,
         |    ${Det.sqlSum("l_extendedprice")} AS sum_price,
         |    ${Det.sqlSum("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, metric, val FROM (
         |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val
         |    FROM agg
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_price', sum_price FROM agg
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_disc', sum_disc FROM agg)
         |ORDER BY l_returnflag, metric""".stripMargin,

    "q82_window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey LIMIT 500""".stripMargin,

    "q79_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  GROUPING(l_returnflag, l_linestatus) AS gid,
         |  COUNT(*) AS n, ${Det.sqlSum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |  (l_returnflag), ())
         |ORDER BY gid, l_returnflag ASC NULLS FIRST,
         |  l_linestatus ASC NULLS FIRST""".stripMargin
  )
}
