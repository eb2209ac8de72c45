package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value- and plan-level checks for the storage-layout layer
  * (StorageQueries). The DuckDB gate proves engine equivalence; these prove
  * the SEMANTICS (zone-map soundness, bin accounting, code-width arithmetic,
  * PQ estimate-vs-exact behavior) and the scale shape (no unpartitioned
  * window in the compaction prefix sum, PQ scan stays a single projection
  * with a bounded TakeOrdered).
  */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q263 snapshot diff matches the planted change schedule exactly") {
    val rows = run("q263_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val removed = ids.count(_ % 17 == 0)
    val added = ids.count(_ % 13 == 0)
    val changed = ids.count(i => i % 17 != 0 && i % 10 == 0)
    assert(rows("removed") == removed)
    assert(rows("added") == added)
    assert(rows("changed") == changed)
    assert(rows("unchanged") == ids.length - removed - changed)
    // every v1 ∪ v2 key classified exactly once
    assert(rows.values.sum == ids.length + added)
  }

  test("q241 zone map is sound and the clustered layout actually skips") {
    val r = run("q241_zonemap_prune").head()
    val (insBlocks, insScanned) = (r.getLong(0), r.getLong(1))
    val (srtBlocks, srtScanned) = (r.getLong(2), r.getLong(3))
    val (rowsMatching, insRows, srtRows) =
      (r.getLong(5), r.getLong(6), r.getLong(7))
    assert(insScanned <= insBlocks && srtScanned <= srtBlocks)
    // soundness on BOTH layouts: every matching row is in a scanned block
    assert(rowsMatching <= insRows && rowsMatching <= srtRows)
    // the sort-on-write story: clustered layout skips, insertion barely
    assert(srtBlocks - srtScanned > 0,
      "clustered layout must skip at least one block")
    assert(srtRows < insRows,
      "clustered layout must scan strictly fewer rows")
    val independent = Tables.documents(spark, sf)
      .where(col("n_chars").between(200, 260)).count()
    assert(rowsMatching == independent)
  }

  test("q242 bins partition the files and respect the running-sum bound") {
    val r = run("q242_compaction_plan").head()
    val (nFiles, nBins, total, maxBin) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nFiles > 0 && nBins > 0 && nBins <= nFiles)
    // every bin except possibly the last is filled past the target by at
    // most one file: max bin <= target + max single file size. Files here
    // are ~64 rows * (50*91+137) < 400k, far under the 16 MB target.
    assert(maxBin <= 16000000L + 400000L)
    assert(total >= (nBins - 1) * 16000000L,
      "closing a bin requires its prefix to have crossed the target")
    // compaction must reduce the small-file count
    assert(r.getLong(5) <= r.getLong(4))
    assert(r.getLong(6) >= 1 && r.getLong(6) <= 1100, "fill permille sane")
  }

  test("q242 prefix sum never runs an unpartitioned window over the files") {
    // structural pin, same contract as q150: the only unpartitioned window
    // may range over the <= 8 bucket-offset rows
    val plan = run("q242_compaction_plan")
      .queryExecution.optimizedPlan.toString
    val globalWindows = plan.linesIterator
      .filter(_.contains("windowspecdefinition("))
      .filterNot(_.contains("partitionspec"))
    // offsets window orders by pid (8 rows); per-file window partitions
    // by pid — no window may order by fid without a pid partition
    globalWindows.foreach { l =>
      assert(!l.contains("fid#") || l.contains("pid#"),
        s"file-level window must be pid-partitioned: $l")
    }
  }

  test("q243 code widths are exact floor-log2+1 and encoding always wins") {
    val rows = run("q243_dictionary_audit").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("l_linestatus", "l_returnflag", "o_orderpriority",
        "o_orderstatus"))
    rows.foreach { r =>
      val (nd, codeBits) = (r.getLong(2), r.getLong(3))
      assert(codeBits ==
        (63 - java.lang.Long.numberOfLeadingZeros(nd)) + 1)
      assert(r.getLong(4) < r.getLong(5),
        s"${r.getString(0)}: dictionary must beat plain on these columns")
      assert(r.getLong(6) < 1000)
    }
  }

  test("q254 trigram index is sound, precise enough to price, and " +
    "matches the exact scan") {
    val r = run("q254_trigram_index").head()
    val (nTris, nDocs, nCand, nVer) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nTris == 12, "pattern 'scan slow fast' has 12 distinct trigrams")
    // soundness: every true match survives the posting intersection
    val exact = Tables.documents(spark, sf)
      .where(lower(col("text")).contains("scan slow fast")).count()
    assert(nVer == exact, "index + verify must equal the full scan")
    assert(nVer <= nCand && nCand <= nDocs)
    // word-soup text shares trigrams heavily, yet the 12-way
    // intersection still prunes 85% here; the precision permille prices
    // what remains for the verify step
    assert(r.getLong(4) >= 500,
      "the posting intersection must prune most of the corpus")
    assert(r.getLong(5) >= 1,
      "at least one candidate must verify (the pattern exists)")
  }

  test("q254 pattern filter runs before the posting shuffle") {
    // q211's term-filter discipline: the trigram stream must filter to
    // the pattern's trigrams in the SCAN stage (below every Exchange in
    // the printed tree), so the candidate groupBy only ever sees
    // <= |pattern| rows per doc
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val plan = run("q254_trigram_index").queryExecution.optimizedPlan
    val triFilters = plan.collect {
      case f: Filter if f.condition.toString.contains("sca") => f
    }
    assert(triFilters.nonEmpty,
      "the trigram IN-filter must exist in the optimized plan")
    // the filter must apply to the raw trigram stream — no aggregate
    // (i.e. nothing already shuffled) may sit beneath it
    triFilters.foreach { f =>
      assert(f.child.collectFirst { case a: Aggregate => a }.isEmpty,
        s"trigram filter must run pre-aggregation (map-side):\n$f")
    }
  }

  test("q250 PQ retrieves every planted near-copy and the estimate " +
    "separates them from the background by orders of magnitude") {
    val rows = run("q250_pq_ann").collect()
    assert(rows.length == 10)
    // est ranks ascending by construction
    val ests = rows.map(_.getLong(1))
    assert(ests.sameElements(ests.sorted))
    // the 10 planted vectors at sf0.01 (vec_id % 50 == 30) are the
    // retrieval ground truth — PQ must surface exactly them
    val planted = (30L to 480L by 50L).toSet
    assert(rows.map(_.getLong(0)).toSet == planted,
      s"PQ top-10 must be the planted set, got " +
        rows.map(_.getLong(0)).mkString(","))
    // exact distance of a planted vector is its perturbation squared
    rows.foreach { r =>
      val k = 1 + r.getLong(0) / 50
      assert(r.getLong(2) == k * k,
        s"planted ${r.getLong(0)}: exact must be $k²")
    }
    // planted vectors differ from the query by <= 10 micro-units on one
    // coordinate, so they quantize to the query's own codes: every ADC
    // estimate is the SAME value (the query's self-quantization error)
    assert(ests.distinct.length == 1,
      s"planted vectors must share the query's codes, got ${ests.toSeq}")
  }

  test("PqAdc kernel matches an independent Scala recomputation on every " +
    "corpus vector") {
    import graft.functions.PqAdcF
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val quant = emb.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.floor((x * 1000.0f).toDouble).toLong).toArray
    }.toMap
    val cents = (0L to 15L).map(quant(_)).map(_.clone).toArray
    val qv = quant(20L).clone
    val qd = (0 until 8).map { sp =>
      cents.map { cv =>
        (0 until 8).map { j =>
          val d = qv(8 * sp + j) - cv(8 * sp + j); d * d
        }.sum
      }
    }.toArray
    val got = emb
      .withColumn("adc", PqAdcF(col("embedding"), cents, qv, qd))
      .select(col("vec_id"), col("adc.est"), col("adc.exact"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == quant.size)
    got.foreach { case (id, est, exact) =>
      val ev = quant(id)
      // independent argmin + table walk
      var expEst = 0L
      for (sp <- 0 until 8) {
        var best = Long.MaxValue; var bc = 0
        for (c <- 0 until 16) {
          var d = 0L
          for (j <- 0 until 8) {
            val diff = ev(8 * sp + j) - cents(c)(8 * sp + j)
            d += diff * diff
          }
          if (d < best) { best = d; bc = c }
        }
        expEst += qd(sp)(bc)
      }
      val expExact =
        ev.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(est == expEst && exact == expExact,
        s"vec $id: kernel ($est, $exact) vs recomputed ($expEst, $expExact)")
    }
  }

  test("q250 plan is one scan-side projection + bounded top-k: no join, " +
    "no window, no explode") {
    val p = run("q250_pq_ann").queryExecution.executedPlan.toString
    info(p.linesIterator.take(10).mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be the bounded-heap operator:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"ADC scan must not join:\n$p")
    assert(!p.contains("Window"), s"ADC scan must not window:\n$p")
    assert(!p.contains("Generate"), s"ADC scan must not explode:\n$p")
  }
}
