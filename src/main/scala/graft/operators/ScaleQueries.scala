package graft.operators

import graft.{Det, Scratch, Tables => T}
import graft.curation.Sampling
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-3 scale surface: the remaining operations a 100 TB training-data
  * pipeline leans on that are not yet on the registry — RAG chunking,
  * sweep-line concurrency, corpus n-gram statistics, integer-exact outlier
  * screening, size-proportional sampling, single-scan data profiling,
  * unrolled iterative PageRank, small-file compaction, interval-union
  * coverage, and minority-class upsampling.
  *
  * Everything is declarative column algebra or plain Spark SQL (Catalyst
  * plans the shuffles; no driver loops, no UDFs), and every query keeps its
  * arithmetic in BIGINT / DECIMAL so the DuckDB oracle hash-matches exactly.
  */
object ScaleQueries {

  private val ChunkLen = 500L
  private val ChunkStride = 400L
  private val SessionUs = 1800000000L // 30 minutes in microseconds

  /** Events projected to (user_id, event_id, event_type, t micros). */
  private def eventTimes(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("t"))

  /** Real P6 PPM images, one per document, generated from a deterministic
    * pixel schedule so the oracle can recompute every decoded statistic
    * analytically. Written once per sf. */
  private[graft] def ppmFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_ppm")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      import org.apache.spark.sql.{Encoder, Encoders}
      implicit val enc: Encoder[graft.multimodal.Multimodal.MediaRow] =
        Encoders.product[graft.multimodal.Multimodal.MediaRow]
      import s.implicits._
      T.documents(s, d).select(col("doc_id")).as[Long]
        // pre-split the media fixture across 32 files at BUILD time so
        // the timed decode reads get one partition per file with no
        // query-time shuffle of media bytes (a single-file media table
        // decodes near-serially: parquet splits by row group, and these
        // fall under one maxPartitionBytes split)
        .repartition(32)
        .mapPartitions { it =>
          it.map { id =>
            val w = (16 + id % 17).toInt
            val h = (16 + id % 13).toInt
            val bytes = graft.multimodal.Multimodal.PpmCodec.encode(w, h,
              (x, y) => (((x * 31 + y * 17 + id) % 256).toInt,
                ((x * 7 + y * 3) % 256).toInt,
                ((x + y + id) % 256).toInt))
            graft.multimodal.Multimodal.MediaRow(id, bytes)
          }
        }.toDF().write.mode("overwrite").parquet(out)
    }
    out
  }

  /** Real PNG images (javax.imageio) from the SAME deterministic pixel
    * schedule as [[ppmFixture]] — PNG is lossless, so the analytic oracle
    * transfers verbatim to the mainstream format. */
  private[graft] def pngFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_png")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      import org.apache.spark.sql.{Encoder, Encoders}
      implicit val enc: Encoder[graft.multimodal.Multimodal.MediaRow] =
        Encoders.product[graft.multimodal.Multimodal.MediaRow]
      import s.implicits._
      T.documents(s, d).select(col("doc_id")).as[Long]
        // pre-split the media fixture across 32 files at BUILD time so
        // the timed decode reads get one partition per file with no
        // query-time shuffle of media bytes (a single-file media table
        // decodes near-serially: parquet splits by row group, and these
        // fall under one maxPartitionBytes split)
        .repartition(32)
        .mapPartitions { it =>
          it.map { id =>
            val w = (16 + id % 17).toInt
            val h = (16 + id % 13).toInt
            val bytes = graft.multimodal.Multimodal.PngCodec.encode(w, h,
              (x, y) => (((x * 31 + y * 17 + id) % 256).toInt,
                ((x * 7 + y * 3) % 256).toInt,
                ((x + y + id) % 256).toInt))
            graft.multimodal.Multimodal.MediaRow(id, bytes)
          }
        }.toDF().write.mode("overwrite").parquet(out)
    }
    out
  }

  /** Paired JPEG + PNG encodings of the SAME pixel schedule, one row per
    * document — the lossy-format fixture: PNG is the lossless baseline
    * the JPEG decode is graded against (bounded deviation, q192), and the
    * JPEG bytes also feed the codegen'd SOF header peek (q193). */
  private[graft] def jpegFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_jpeg")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      import org.apache.spark.sql.{Encoder, Encoders}
      implicit val enc: Encoder[graft.multimodal.Multimodal.JpegPair] =
        Encoders.product[graft.multimodal.Multimodal.JpegPair]
      import s.implicits._
      T.documents(s, d).select(col("doc_id")).as[Long]
        // pre-split the media fixture across 32 files at BUILD time so
        // the timed decode reads get one partition per file with no
        // query-time shuffle of media bytes (a single-file media table
        // decodes near-serially: parquet splits by row group, and these
        // fall under one maxPartitionBytes split)
        .repartition(32)
        .mapPartitions { it =>
          it.map { id =>
            val w = (16 + id % 17).toInt
            val h = (16 + id % 13).toInt
            val pix = (x: Int, y: Int) =>
              (((x * 31 + y * 17 + id) % 256).toInt,
                ((x * 7 + y * 3) % 256).toInt,
                ((x + y + id) % 256).toInt)
            graft.multimodal.Multimodal.JpegPair(id,
              graft.multimodal.Multimodal.PngCodec.encode(w, h, pix),
              graft.multimodal.Multimodal.JpegCodec.encode(w, h, pix))
          }
        }.toDF().write.mode("overwrite").parquet(out)
    }
    out
  }

  /** PNG corpus with PLANTED DUPLICATES: image content is keyed by
    * `doc_id % 40`, so every 40th document is byte-identical — the
    * image-dedup fixture (same schedule family as [[pngFixture]]). */
  private[graft] def pngDupFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_png_dups")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      import org.apache.spark.sql.{Encoder, Encoders}
      implicit val enc: Encoder[graft.multimodal.Multimodal.MediaRow] =
        Encoders.product[graft.multimodal.Multimodal.MediaRow]
      import s.implicits._
      T.documents(s, d).select(col("doc_id")).as[Long]
        // pre-split the media fixture across 32 files at BUILD time so
        // the timed decode reads get one partition per file with no
        // query-time shuffle of media bytes (a single-file media table
        // decodes near-serially: parquet splits by row group, and these
        // fall under one maxPartitionBytes split)
        .repartition(32)
        .mapPartitions { it =>
          it.map { id =>
            val k = id % 40
            val w = (16 + k % 17).toInt
            val h = (16 + k % 13).toInt
            // k varies the GRADIENT, not a uniform offset — adding a
            // constant to every pixel shifts each luma cell and the
            // thumbnail mean equally, which aHash (by design) ignores
            val bytes = graft.multimodal.Multimodal.PngCodec.encode(w, h,
              (x, y) => (((x * (31 + k) + y * 17) % 256).toInt,
                ((x * 7 + y * (3 + k)) % 256).toInt,
                ((x * (1 + k) + y) % 256).toInt))
            graft.multimodal.Multimodal.MediaRow(id, bytes)
          }
        }.toDF().write.mode("overwrite").parquet(out)
    }
    out
  }

  /** Animated GIFs, one per document, frames from a deterministic gray
    * schedule — the multi-frame (video-shaped) fixture. */
  private[graft] def gifFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_gif")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      import org.apache.spark.sql.{Encoder, Encoders}
      implicit val enc: Encoder[graft.multimodal.Multimodal.MediaRow] =
        Encoders.product[graft.multimodal.Multimodal.MediaRow]
      import s.implicits._
      T.documents(s, d).select(col("doc_id")).as[Long]
        // pre-split the media fixture across 32 files at BUILD time so
        // the timed decode reads get one partition per file with no
        // query-time shuffle of media bytes (a single-file media table
        // decodes near-serially: parquet splits by row group, and these
        // fall under one maxPartitionBytes split)
        .repartition(32)
        .mapPartitions { it =>
          it.map { id =>
            val w = (12 + id % 5).toInt
            val h = (10 + id % 3).toInt
            val nf = (3 + id % 4).toInt
            val bytes = graft.multimodal.Multimodal.GifCodec.encode(w, h, nf,
              (x, y, f) => ((x * (3 + f) + y * (5 + f) + id) % 256).toInt)
            graft.multimodal.Multimodal.MediaRow(id, bytes)
          }
        }.toDF().write.mode("overwrite").parquet(out)
    }
    out
  }

  /** MJPEG-in-AVI videos, one per document: real JPEG frames (encoded by
    * the shipped pure-JDK codec from a deterministic gradient) inside a
    * real AVI container, dims / fps / frame count on planted analytic
    * schedules. */
  private[graft] def aviFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_avi")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      import org.apache.spark.sql.{Encoder, Encoders}
      implicit val enc: Encoder[graft.multimodal.Multimodal.MediaRow] =
        Encoders.product[graft.multimodal.Multimodal.MediaRow]
      import s.implicits._
      T.documents(s, d).select(col("doc_id")).as[Long]
        // pre-split the media fixture across 32 files at BUILD time so
        // the timed decode reads get one partition per file with no
        // query-time shuffle of media bytes (a single-file media table
        // decodes near-serially: parquet splits by row group, and these
        // fall under one maxPartitionBytes split)
        .repartition(32)
        .mapPartitions { it =>
          it.map { id =>
            val w = (16 + id % 5).toInt
            val h = (12 + id % 3).toInt
            val fps = (2 + id % 3).toInt
            val nf = (5 + id % 7).toInt
            val frames = (0 until nf).map { f =>
              graft.multimodal.Multimodal.JpegCodec.encode(w, h,
                (x, y) => (((x * (3 + f) + id) % 256).toInt,
                  ((y * (5 + f)) % 256).toInt, ((x + y + f) % 256).toInt))
            }
            graft.multimodal.Multimodal.MediaRow(id,
              graft.multimodal.Multimodal.AviCodec.encode(w, h, fps, frames))
          }
        }.toDF().write.mode("overwrite").parquet(out)
    }
    out
  }

  /** Incrementally-built IVF index: base index over history vectors
    * (vec_id with a nonzero last digit), then the held-out tenth
    * assigned to the SAME centroids and appended cell-partitioned —
    * the index-maintenance contract mirroring [[dedupIndexFixture]]. */
  private[graft] def ivfAppendFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "ivf_incr")
    if (!new java.io.File(s"$out/_APPENDED").exists()) {
      val emb = T.embeddings(s, d)
      graft.similarity.Similarity.saveIvfIndex(
        emb.where(col("vec_id") % 10 =!= 0), out)
      val cents = graft.similarity.Similarity.loadIvfCentroids(s, out)
      graft.similarity.Similarity
        .ivfAssign(emb.where(col("vec_id") % 10 === 0), cents)
        .write.mode("append").partitionBy("cell")
        .parquet(s"$out/assignments")
      new java.io.File(s"$out/_APPENDED").createNewFile()
    }
    out
  }

  /** Query-vector stream (two files → two AvailableNow micro-batches:
    * vec_id < 5, then 5 ≤ vec_id < 10) plus a persisted IVF index over
    * the full embeddings table, built once per sf — the serving-side
    * fixture for q202's streaming retrieval. */
  /** Persisted HNSW index (adjacency layer-partitioned + vectors +
    * entry), built once per sf — q309's serving-side store. */
  private[graft] def hnswIndexFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "hnsw_index")
    if (!new java.io.File(s"$out/_DONE").exists()) {
      graft.similarity.Similarity.saveHnswIndex(T.embeddings(s, d), out)
      new java.io.File(s"$out/_DONE").createNewFile()
    }
    out
  }

  /** Incrementally-built HNSW store: base index over the history slice
    * (vec_id % 10 != 0), then ONE append batch (the held-out tenth) —
    * q310's fixture, the graph-index analog of the q117 dedup split and
    * q157's IVF append. */
  private[graft] def hnswAppendFixture(s: SparkSession, d: String)
      : String = {
    val out = graft.Scratch.fixtureDir(d, "hnsw_append")
    if (!new java.io.File(s"$out/_DONE").exists()) {
      val emb = T.embeddings(s, d)
      graft.similarity.Similarity.saveHnswIndex(
        emb.where(col("vec_id") % 10 =!= 0), out)
      graft.similarity.Similarity.appendHnswIndex(
        emb.where(col("vec_id") % 10 === 0), out)
      new java.io.File(s"$out/_DONE").createNewFile()
    }
    out
  }

  /** One bounded run of the q311 CONTINUOUS HNSW index build: embedding
    * micro-batches arrive (maxFilesPerTrigger=1 over the 3-file split),
    * each trigger computes its batch's edges against the vectors of
    * EARLIER batches only (Similarity.appendEdges — the bootstrap batch
    * degenerates to the one-shot adjacency) and lands edges + vectors
    * under batch_id-partitioned dynamic overwrite, so a replayed trigger
    * overwrites exactly its own partitions (exactly-once under
    * failures) and the exclude-current-batch read never sees a failed
    * attempt's output. Per-trigger work is O(batch): history vectors
    * are re-read but never re-indexed, like the other index-building
    * twins. Returns the search results served from the streamed store;
    * StreamingSpec kills it mid-run and gates bit-equal recovery. */
  private[graft] def streamHnswRun(s: SparkSession, d: String,
      base: String, failAfter: Option[Int]): DataFrame = {
    // every intermediate here is id/edge-sized (<= corpus x M rows);
    // the session's default partition count turns the ~50 stages per
    // trigger into pure scheduling overhead at small inputs (measured
    // 100 s wall / 181 s cpu at sf0.1 before scoping, fewer reducers cut
    // both). Round 9: the count is DERIVED from the split fixture's
    // bytes (Confs.scaledShufflePartitions — 1–2 at sf0.1, the session's
    // own count at cluster scale) instead of the round-8 constant 8.
    // Scoped and restored; heavy stages all execute inside the scope
    // (foreachBatch bodies + localCheckpoints are eager).
    val src0 = CalibrationQueries.embSplitFixture(s, d)
    val parts = graft.Confs.scaledShufflePartitions(s, s.read.parquet(src0))
    graft.Confs.withRunConf(s, "spark.sql.shuffle.partitions",
        parts.toString) {
    graft.Confs.dynamicOverwrite(s) {
      val src = src0
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          if (failAfter.exists(bid >= _))
            graft.streaming.PlannedStop.fail()
          val newVecs = batch
            .select(col("vec_id").as("node"), col("embedding").as("cv"))
            .localCheckpoint()
          // this batch's per-layer buckets, computed ONCE (O(batch)) and
          // persisted beside the vectors: later triggers READ history
          // buckets instead of recomputing hyperplane signatures over
          // every earlier batch — the same identical-bucket values, so
          // the edge set (and the served result) is unchanged, but the
          // per-trigger signature work stops growing with history
          // (round 8; see Similarity.layerSignatures)
          val newSigs = graft.similarity.Similarity
            .layerSignatures(newVecs, maxLevel = 3, nTables = 8,
              bitsPerTable = 6, dim = 64)
            .localCheckpoint()
          val (existing, exSigs) =
            try {
              (s.read.parquet(s"$base/vectors")
                 .where(col("batch_id") < bid)
                 .select(col("node"), col("cv")),
               s.read.parquet(s"$base/signatures")
                 .where(col("batch_id") < bid)
                 .select(col("layer"), col("table"), col("bucket"),
                   col("id")))
            } catch { case _: org.apache.spark.sql.AnalysisException =>
              (newVecs.where(lit(false)), // bootstrap: no store yet
               newSigs.where(lit(false)))
            }
          graft.similarity.Similarity
            .appendEdgesFrom(newVecs, newSigs, existing, exSigs,
              maxLevel = 3, m = 12)
            .withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id", "layer")
            .parquet(s"$base/adjacency")
          newSigs.withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/signatures")
          newVecs.withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/vectors")
          ()
        }
        .start()
      graft.streaming.PlannedStop.await(q, failAfter.nonEmpty)
      // serve from the streamed store: entry is a pure id function of
      // the stored node set, so no per-batch entry state is needed
      val cv = s.read.parquet(s"$base/vectors").select(col("node"),
        col("cv"))
      val adj = s.read.parquet(s"$base/adjacency")
      val entry = graft.similarity.Similarity.hnswLevels(cv, 3, "node")
        .orderBy(col("level").desc, col("node")).limit(1)
        .collect()(0).getLong(0)
      val qs = T.embeddings(s, d).where(col("vec_id") < 10)
      graft.similarity.Similarity
        .hnswSearch(qs, adj, cv, entry, k = 10, maxLevel = 3, ef = 32,
          hops = 3, "vec_id", "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }
    }
  }

  private[graft] def streamAnnFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "stream_ann")
    if (!new java.io.File(s"$out/_DONE").exists()) {
      val emb = T.embeddings(s, d)
      graft.similarity.Similarity.saveIvfIndex(emb, s"$out/index")
      val qs = emb.where(col("vec_id") < 10)
      qs.where(col("vec_id") < 5)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/qs")
      qs.where(col("vec_id") >= 5)
        .coalesce(1).write.mode("append").parquet(s"$out/qs")
      new java.io.File(s"$out/_DONE").createNewFile()
    }
    out
  }

  /** Mixed-format landing zone: lineitem routed disjointly into gzip CSV
    * (k%3=0, plus the k%3=2 overflow above the zip cap), JSON lines
    * (k%3=1), and single-entry ZIP archives (k%3=2 below the cap — the
    * zip build collects, so it stays bounded). The three slices are
    * disjoint and complete, so their union must equal the source table. */
  private[graft] def mixedZoneFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "mixed_zone")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      val zipCap = 30000L
      val li = T.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity"), col("l_returnflag"))
      val k = col("l_orderkey")
      li.where(k % 3 === 0 || (k % 3 === 2 && k >= zipCap))
        .select(concat_ws(",", col("l_orderkey"),
          format_string("%.6f", col("l_quantity")),
          col("l_returnflag")).as("value"))
        .write.option("compression", "gzip").mode("overwrite")
        .text(s"$out/csv")
      li.where(k % 3 === 1)
        .select(to_json(struct(col("l_orderkey"), col("l_quantity"),
          col("l_returnflag"))).as("value"))
        .write.mode("overwrite").text(s"$out/json")
      val zipRows = li.where(k % 3 === 2 && k < zipCap)
        .orderBy(col("l_orderkey"))
        .select(concat_ws(",", col("l_orderkey"),
          format_string("%.6f", col("l_quantity")),
          col("l_returnflag")).as("v"))
        .collect().map(_.getString(0))
      new java.io.File(s"$out/zip").mkdirs()
      import java.util.zip.{ZipEntry, ZipOutputStream}
      zipRows.grouped(5000).zipWithIndex.foreach { case (chunk, i) =>
        val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(s"$out/zip/part$i.zip")))
        zos.putNextEntry(new ZipEntry(s"part$i.csv"))
        zos.write((chunk.mkString("\n") + "\n").getBytes("UTF-8"))
        zos.closeEntry()
        zos.close()
      }
      new java.io.File(s"$out/_SUCCESS").createNewFile()
    }
    out
  }

  /** Real PCM16 WAV clips, one per document, samples from a deterministic
    * schedule (the audio analog of [[ppmFixture]]). */
  private[graft] def wavFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_wav")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      import org.apache.spark.sql.{Encoder, Encoders}
      implicit val enc: Encoder[graft.multimodal.Multimodal.MediaRow] =
        Encoders.product[graft.multimodal.Multimodal.MediaRow]
      import s.implicits._
      T.documents(s, d).select(col("doc_id")).as[Long]
        // pre-split the media fixture across 32 files at BUILD time so
        // the timed decode reads get one partition per file with no
        // query-time shuffle of media bytes (a single-file media table
        // decodes near-serially: parquet splits by row group, and these
        // fall under one maxPartitionBytes split)
        .repartition(32)
        .mapPartitions { it =>
          it.map { id =>
            val n = (1000 + id % 501).toInt
            val samples = Array.tabulate(n)(i =>
              (((i.toLong * 37 + id * 11) % 4096) - 2048).toShort)
            graft.multimodal.Multimodal.MediaRow(id,
              graft.multimodal.Multimodal.WavCodec.encode(samples))
          }
        }.toDF().write.mode("overwrite").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // REAL audio decode: PCM16 WAV clips parsed by the RIFF chunk walk
    // on the executors, signal features (abs-sum, peak, integer energy,
    // decimate-by-4 checksum) extracted in the same pass. Oracle
    // recomputes everything from the sample schedule — a single decoded
    // sample out of place fails the gate.
    "q145_wav_decode" -> ((s, d) => {
      val media = s.read.parquet(wavFixture(s, d))
      // per-clip values are clip-bounded, but the corpus totals of
      // squared/abs sample sums cross int64 at scale — Det.lsum routes
      // the accumulation through DECIMAL(38,0) exactly like the
      // oracle's HUGEINT SUM, then takes the same BIGINT cast
      graft.multimodal.Multimodal.decodeWav(media)
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).as("n_samples"),
          Det.lsum(col("sum_abs")).as("sum_abs"),
          max(col("peak")).as("peak"),
          Det.lsum(col("sum_sq")).as("sum_sq"),
          Det.lsum(col("downsample_sum")).as("downsample_sum"))
    }),

    // Order-invariant table digest: a corpus fingerprint from the SUM
    // of per-row hashes (sum is commutative, so partitioning and row
    // order cannot change it) — the O(1)-output primitive that lets
    // two engines, two clusters, or two snapshots prove byte-equality
    // without sorting or moving a table. Row hash = integer value of
    // the first 12 md5 hex digits over engine-stable fields (keys +
    // integer cents), summed exactly in decimal. The digest leaves the
    // query as a STRING: the ~63-bit value is exact in DECIMAL(38,0)
    // but silently loses precision in any float64 canonicalization
    // downstream — a digest that can be corrupted in transit defeats
    // its purpose, so the wire type is text.
    "q171_table_digest" -> ((s, d) => {
      val cents = org.apache.spark.sql.types.DecimalType(30, 2)
      val dig = conv(substring(md5(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity").cast(cents) * 100).cast("long"),
        col("l_returnflag"))), 1, 12), 16, 10)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
      T.lineitem(s, d)
        .agg(count(lit(1)).as("n_rows"),
          sum(dig).cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .cast("string").as("digest"))
    }),

    // Inverted-index build: per-term posting lists (sorted doc-id
    // arrays) — the search-index construction step. The (word, doc)
    // matrix is distinct-reduced before the group-by, postings
    // materialize as sorted arrays capped at 20 entries (a real index
    // shards long postings; the cap keeps the gate row bounded), and
    // document frequency rides along. The posting list crosses the
    // gate as a comma-joined string — element ORDER is still part of
    // the contract (a reordered list produces a different string), but
    // scalar columns survive any downstream canonicalizer; ScaleSpec
    // pins the element-wise array semantics.
    "q165_postings" -> ((s, d) => {
      val t = T.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), " ")).as("word"))
        .distinct()
      // the 20-smallest head comes from the bounded-heap TopKAgg (k
      // entries of state per group), NOT collect_list + slice: a
      // stopword's posting list is corpus-sized, and collecting it into
      // one aggregation buffer before slicing is an executor OOM at the
      // 100 TB design point. Score = -doc_id makes the heap's
      // score-desc order the ascending id head.
      t.groupBy(col("word"))
        .agg(count(lit(1)).as("df"),
          graft.functions.TopKAgg.topkAgg(
            -col("doc_id").cast("double"), col("doc_id"), 20).as("topk"))
        .select(col("word"), col("df"),
          concat_ws(",",
            expr("transform(topk, x -> CAST(x.id AS STRING))"))
            .as("postings"))
        .orderBy(col("word"))
    }),

    // Deterministic k-per-group sampling: exactly 3 "random" documents
    // per language, chosen by md5 order — the reservoir-sampling
    // semantic with none of the nondeterminism (any engine, any
    // partitioning, any re-run picks the same rows). A count-reduced
    // rank over (lang, md5) — the window sorts only (lang, hash) pairs.
    "q158_group_sample" -> ((s, d) => {
      val h = md5(col("doc_id").cast("string"))
      T.documents(s, d)
        .select(col("lang"), col("doc_id"), h.as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
        .where(col("rn") <= 3)
        .select(col("lang"), col("rn"), col("doc_id"))
        .orderBy(col("lang"), col("rn"))
    }),

    // Incremental ANN indexing: the persisted IVF index built over the
    // history vectors, then a NEW batch assigned to the EXISTING
    // centroids and appended into the cell-partitioned layout — the
    // index grows by O(batch) per increment (one assignment pass + a
    // partitioned append), centroids and history rows untouched. A
    // full-probe query over the appended index must equal brute force
    // over the whole corpus — proof no vector was lost or mis-celled
    // on the append path.
    "q157_ivf_append" -> ((s, d) => {
      val dir = ivfAppendFixture(s, d)
      val emb = T.embeddings(s, d)
      graft.similarity.Similarity.ivfTopKIndexed(
          emb.where(col("vec_id") < 10), dir, k = 5, nProbe = 16)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Nested-document round trip: order-line documents ASSEMBLED
    // (collect_list of structs → to_json) and then DEEP-FLATTENED
    // (from_json with a declared schema → explode) — the two directions
    // of the nested/relational boundary every document pipeline crosses,
    // all in column algebra. The oracle aggregates the original flat
    // table, so the nested round trip must be lossless: a dropped line,
    // a mangled number, or a mis-parsed array fails the hash.
    "q155_nested_json" -> ((s, d) => {
      val docs = T.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"),
          col("l_quantity").as("qty")))).as("lines"))
        .select(to_json(struct(col("l_orderkey").as("order"),
          col("lines"))).as("doc"))
      docs
        .select(from_json(col("doc"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "order BIGINT, lines ARRAY<STRUCT<ln: INT, qty: DOUBLE>>"))
          .as("o"))
        .select(col("o.order").as("order"),
          explode(col("o.lines")).as("line"))
        .agg(count(lit(1)).as("n_lines"),
          countDistinct(col("order")).as("n_orders"),
          Det.dsum(col("line.qty")).as("sum_qty"),
          sum(col("line.ln").cast("long")).as("sum_ln"))
    }),

    // Mixed-format landing zone, ONE ingest pass: the reference's full
    // format matrix (gzip CSV, JSON lines, single-entry ZIP) lands in
    // one union — each source parses with its native distributed reader
    // and the three partitions of the corpus reunite losslessly (the
    // oracle is the aggregate over the ORIGINAL table, so a row lost or
    // mangled by any format path fails the gate).
    "q154_mixed_ingest" -> ((s, d) => {
      val dir = mixedZoneFixture(s, d)
      val schemaDDL = "l_orderkey LONG, l_quantity DOUBLE, l_returnflag STRING"
      val csvSide = s.read.schema(schemaDDL).csv(s"$dir/csv")
      val jsonSide = s.read.schema(schemaDDL).json(s"$dir/json")
      val zipSide = graft.sources.IngestReader.zipLines(s, s"$dir/zip")
        .select(split(col("line"), ",").as("f"))
        .select(col("f").getItem(0).cast("long").as("l_orderkey"),
          col("f").getItem(1).cast("double").as("l_quantity"),
          col("f").getItem(2).as("l_returnflag"))
      csvSide.unionByName(jsonSide).unionByName(zipSide)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // Join-skew pre-flight: the diagnosis a salted join (SkewJoin /
    // AQE skew handling) needs BEFORE it runs — per-key share of the
    // join input, hot keys flagged by integer cross-multiplication
    // (20·n_k > n ⇔ share > 5%), no division anywhere. One partial-
    // aggregated pass; the key histogram is the only shuffled data.
    // A planted routing key gives one genuinely hot key (~50% share).
    "q152_skew_diagnose" -> ((s, d) => {
      val k = when(col("event_id") % 4 < 2, lit(-1L))
        .otherwise(col("user_id"))
      val counts = T.events(s, d).select(k.as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
      val total = counts.agg(sum(col("n_k")).as("n"))
      counts.crossJoin(broadcast(total))
        .withColumn("hot", col("n_k") * 20 > col("n"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("hot"), 1L).otherwise(0L)).as("n_hot"),
          max(when(col("hot"), col("n_k"))).as("hottest_n"),
          min(when(col("hot"), col("k"))).as("hottest_k"))
    }),

    // Bloom-filter quality audit: membership over the even customer
    // keys, probed with the DISJOINT odd keys. The zero-false-negative
    // guarantee is exact (every member passes); the false-positive rate
    // on non-members must stay within 2x the configured fpp — emitted
    // as deterministic booleans (the bloom bit pattern is a pure
    // function of the inserted key set), the same one-sided bound gate
    // as the count-min sketch (q95).
    "q153_bloom_fpp" -> ((s, d) => {
      import graft.functions.BloomPrune
      val members = T.customer(s, d).where(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"))
      val nonMembers = T.customer(s, d).where(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"))
      val bloom = BloomPrune.buildLong(members, "c_custkey",
        expectedItems = 10000L, fpp = 0.03)
      val pass = BloomPrune.mightContainLong(bloom, col("c_custkey"))
      val m = members.agg(count(lit(1)).as("n_members"),
        sum(when(pass, 1L).otherwise(0L)).as("n_members_pass"))
      val f = nonMembers.agg(count(lit(1)).as("n_probes"),
        sum(when(pass, 1L).otherwise(0L)).as("n_fp"))
      m.crossJoin(f)
        .select(col("n_members"),
          (col("n_members_pass") === col("n_members"))
            .as("members_all_pass"),
          (col("n_fp") * 100 <= col("n_probes") * 6).as("fp_bound_ok"))
    }),

    // Token-balanced training shards via a SCALABLE global prefix sum:
    // a naive cumulative sum is a single-partition window (one task owns
    // the whole corpus); the two-pass form — per-bucket subtotals, tiny
    // broadcast of bucket offsets, per-bucket running sum — computes the
    // identical cumsum with every bucket working in parallel. The bucket
    // id is a PURE FUNCTION of doc_id (equal-width ranges over the
    // [min, max] span fetched as two scalars) — NOT spark_partition_id():
    // this subplan is referenced twice (offsets aggregate + main join),
    // and two physical evaluations of a range exchange sample their
    // boundaries independently, so a partition-id bucket only agrees
    // between the two subtrees when exchange reuse happens to kick in.
    // A value-derived bucket agrees by construction under any core
    // count, AQE decision, or plan reuse. Shard id = floor(prefix /
    // target): each shard closes as its token budget fills, the
    // standard packing for training shards.
    "q150_token_shards" -> ((s, d) => {
      val target = 20000L
      val nb = 8
      val docs = T.documents(s, d).select(col("doc_id"), col("n_chars"))
      val bounds = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val span = hi - lo + 1
      val chunk = math.max(1L, (span + nb - 1) / nb)
      val parts = docs
        .withColumn("pid", expr(s"(doc_id - $lo) div $chunk"))
        .repartition(nb, col("pid"))
      val offsets = parts.groupBy(col("pid"))
        .agg(sum(col("n_chars")).as("psum"))
        .withColumn("offset",
          coalesce(sum(col("psum")).over(
            Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("pid"), col("offset"))
      val byDoc = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      parts.join(broadcast(offsets), "pid")
        .withColumn("cum", col("offset") + sum(col("n_chars")).over(byDoc))
        .withColumn("shard", expr(s"(cum - n_chars) div $target"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("shard"))
    }),

    // Metadata peek WITHOUT decode: a codegen'd Catalyst expression
    // (functions.MediaOps.PpmDim) parses only the PPM header bytes
    // inside whole-stage codegen, so pruning the corpus by image
    // dimensions never touches pixel data — at 100 TB the difference
    // between reading 15 header bytes and copying w*h*3 per row IS the
    // scan budget. Oracle recomputes from the generation schedule.
    "q149_ppm_peek" -> ((s, d) => {
      val media = s.read.parquet(ppmFixture(s, d))
      media.select(
          graft.functions.MediaOps.ppmWidth(col("content")).as("w"),
          graft.functions.MediaOps.ppmHeight(col("content")).as("h"))
        .where(col("w") >= 24)
        .agg(count(lit(1)).as("n_large"),
          sum(col("w").cast("long")).as("sum_w"),
          sum(col("h").cast("long")).as("sum_h"),
          min(col("w")).as("min_w"))
    }),

    // REAL image decode: the PPM corpus is decoded byte-for-byte on the
    // executors (PpmCodec — an actual P6 parser, not the FakeCodec
    // stub), features (per-channel sums) and an 8x8 nearest-neighbor
    // thumbnail checksum extracted in the same partition pass, no
    // shuffle until the final tiny aggregate. The oracle recomputes
    // every statistic from the pixel schedule — so a single decoded
    // byte out of place fails the gate.
    "q144_ppm_decode" -> ((s, d) => {
      val media = s.read.parquet(ppmFixture(s, d))
      graft.multimodal.Multimodal.decodePpm(media)
        .agg(count(lit(1)).as("n_images"),
          sum(col("width").cast("long") * col("height")).as("n_pixels"),
          sum(col("sum_r")).as("sum_r"),
          sum(col("sum_g")).as("sum_g"),
          sum(col("sum_b")).as("sum_b"),
          sum(col("thumb_sum")).as("thumb_sum"))
    }),

    // REAL JPEG decode — the most common crawl-image format, via the
    // same pure-JDK ImageIO stack as q174. JPEG is lossy, so the gate is
    // the q153 TRUE-bounds pattern graded against the LOSSLESS baseline:
    // each row carries both encodings of one pixel schedule, dimensions
    // must match exactly (headers are lossless; the analytic sums gate
    // them), and the per-image mean absolute pixel deviation is bounded
    // at 40/255: the measured quantization loss on this deliberately
    // high-frequency schedule tops out at ~18 (ScaleSpec pins a 28
    // margin), while a channel swap, stride bug, or flipped axis
    // produces ~85 — so the booleans are stable, discriminating facts.
    "q192_jpeg_decode" -> ((s, d) => {
      val media = s.read.parquet(jpegFixture(s, d))
      graft.multimodal.Multimodal.decodeJpegVsPng(media)
        .agg(count(lit(1)).as("n_images"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"),
          bool_and(col("dims_match")).as("dims_ok"),
          bool_and(col("abs_err") <= col("n_channel_values") * 40)
            .as("err_ok"))
    }),

    // JPEG metadata peek WITHOUT decode (q175 for the lossy format):
    // the codegen'd SOF-marker walk (functions.MediaOps.JpegDim) reads
    // dimensions from the frame header by hopping segment lengths — a
    // few dozen byte compares per row, never an entropy decode. JPEG
    // headers are lossless, so the analytic schedule oracle is exact.
    "q193_jpeg_peek" -> ((s, d) => {
      val media = s.read.parquet(jpegFixture(s, d))
      media.select(
          graft.functions.MediaOps.jpegWidth(col("jpg")).as("w"),
          graft.functions.MediaOps.jpegHeight(col("jpg")).as("h"))
        .where(col("w") >= 24)
        .agg(count(lit(1)).as("n_large"),
          sum(col("w").cast("long")).as("sum_w"),
          sum(col("h").cast("long")).as("sum_h"),
          min(col("w")).as("min_w"))
    }),

    // BPE vocabulary INDUCTION (tokenizer training, not just token
    // counting like q44): three rounds of most-frequent-adjacent-pair
    // merging over the corpus word-frequency table. The corpus reduces
    // once to |vocab| rows; each round is a pair-count aggregate plus a
    // one-row argmax collect (k-means||-style bounded driver action) and
    // a column-fold merge — no UDFs. The oracle replays the identical
    // induction in SQL (same §-seq representation, same greedy fold,
    // same tie-break), so a wrong count, wrong argmax, or wrong merge
    // application in ANY round shifts every later round and fails the
    // gate. tokens_before/after pin the compression the learned merges
    // actually achieve on the corpus.
    "q190_bpe_merges" -> ((s, d) => {
      import s.implicits._
      val (merges, words) =
        graft.text.Bpe.learnMerges(T.documents(s, d), "text", rounds = 3)
      val before = words
        .agg(sum(col("freq") * length(col("word"))).cast("long")
          .as("tokens_before"))
      val after = words.agg(graft.text.Bpe.tokenCount.as("tokens_after"))
      merges.map(m => (m.round, s"${m.a}+${m.b}", m.pairFreq))
        .toDF("round", "merge", "pair_freq")
        .crossJoin(broadcast(before))
        .crossJoin(broadcast(after))
        .orderBy(col("round"))
    }),

    // Content-defined chunking (the Rabin-fingerprint boundary rule
    // behind dedup-friendly storage and incremental sync): a position is
    // a chunk boundary when the rolling polynomial hash of the trailing
    // 8 characters ≡ 0 (mod 64), so boundaries are a pure function of
    // LOCAL content — insert a byte early in a document and every chunk
    // after the next boundary still re-aligns (the property fixed-size
    // chunking lacks). All column algebra: per-char codes, an 8-term
    // polynomial per position, boundary positions filtered, chunk
    // lengths by zipping boundary arrays — no UDFs, no shuffle until
    // the corpus-level aggregate. The boundary-position checksum gates
    // every boundary decision exactly.
    "q198_cdc_chunking" -> ((s, d) => {
      val perDoc = T.documents(s, d)
        .select(col("doc_id"), length(col("text")).as("L"),
          // empty-text guard: sequence(1, 0) silently descends, leaving
          // a two-element garbage cs; it is never read (L < 8 short-
          // circuits below) but the empty doc should carry cs = []
          expr("CASE WHEN length(text) >= 1 THEN " +
            "transform(sequence(1, length(text)), " +
            "i -> ascii(substr(text, i, 1))) " +
            "ELSE CAST(array() AS ARRAY<INT>) END").as("cs"))
        .select(col("doc_id"), col("L"),
          // L < 8 guard: sequence(8, L) defaults to step -1 when L < 8
          // (reaching element_at index 0 → runtime error); a doc shorter
          // than the rolling window simply has no interior boundaries.
          expr("CASE WHEN L >= 8 THEN filter(sequence(8, L), i -> " +
            "aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, j) -> " +
            "acc + element_at(cs, i - j) * element_at(array(" +
            "1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, " +
            "27512614111L), j + 1)) % 64 = 0) " +
            "ELSE CAST(array() AS ARRAY<INT>) END").as("bp"))
        .select(col("L"),
          (size(col("bp")) + 1).cast("long").as("n_chunks"),
          expr("coalesce(aggregate(bp, CAST(0 AS BIGINT), " +
            "(acc, x) -> acc + x), 0L)").as("bp_sum"),
          expr("array_max(zip_with(concat(array(0), bp), " +
            "concat(bp, array(L)), (a, b) -> b - a))").as("max_chunk"))
      perDoc.agg(count(lit(1)).as("n_docs"),
        sum(col("n_chunks")).as("n_chunks"),
        sum(col("L").cast("long")).as("n_chars"),
        expr("sum(CAST(L AS BIGINT)) * 1000 div sum(n_chunks)")
          .as("mean_chunk_milli"),
        max(col("max_chunk")).cast("long").as("max_chunk"),
        sum(col("bp_sum")).as("boundary_checksum"))
    }),

    // Epoch-deterministic corpus shuffling: every training epoch needs a
    // DIFFERENT order that is nonetheless reproducible on any engine,
    // any partitioning, any re-run — order by md5(epoch:doc_id). The
    // per-epoch heads surface through the bounded-heap TopKAgg (q52's
    // single-buffer aggregate), so the proof-of-order is one partial-
    // aggregated pass: no global sort, no per-epoch window over the
    // corpus, k·|epochs| rows of state total at any scale.
    "q197_epoch_shuffle" -> ((s, d) => {
      import s.implicits._
      val epochs = s.range(1, 4).toDF("epoch")
      val key = conv(substring(
        md5(concat_ws(":", col("epoch"), col("doc_id"))), 1, 12), 16, 10)
        .cast("long")
      T.documents(s, d).select(col("doc_id"))
        .crossJoin(broadcast(epochs))
        .withColumn("score", -key.cast("double"))
        .groupBy(col("epoch"))
        .agg(graft.functions.TopKAgg.topkAgg(
          col("score"), col("doc_id"), 5).as("top"))
        .select(col("epoch"), posexplode(col("top")))
        .select(col("epoch").cast("int").as("epoch"),
          (col("pos") + 1).cast("int").as("rnk"),
          col("col.id").as("doc_id"))
        .orderBy(col("epoch"), col("rnk"))
    }),

    // Tokenizer APPLICATION (the other half of q190's training loop):
    // the learned vocabulary — a |vocab|-row (word → token count) table —
    // broadcasts onto the corpus word stream, the production shape for
    // tokenizing 100 TB with a trained tokenizer (the corpus never
    // re-derives merges; one equi-join against the broadcast asset).
    // Per-language fertility (tokens per word, integer millis) is the
    // metric multilingual-tokenizer evaluations report. The oracle
    // replays the induction AND the application, so a wrong merge, a
    // wrong fold, or a dropped word in either phase fails the gate.
    "q196_bpe_fertility" -> ((s, d) => {
      val (_, words) =
        graft.text.Bpe.learnMerges(T.documents(s, d), "text", rounds = 3)
      val vocab = words.select(col("word"),
        size(filter(split(col("seq"), "§"), x => x =!= "")).as("n_sym"))
      val corpus = T.documents(s, d)
        .select(col("lang"),
          explode(split(trim(col("text")), " ")).as("word"))
        .where(col("word") =!= "")
      corpus.join(broadcast(vocab), "word")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sym").cast("long")).as("n_tokens"))
        .withColumn("fertility_milli",
          expr("n_tokens * 1000 div n_words"))
        .orderBy(col("lang"))
    }),

    // Windowed audio analysis: REAL WAV decode exploded to fixed 256-
    // sample analysis windows (the VAD/energy-gating shape), per-window
    // abs-sum and peak, plus a loudness gate (mean abs ≥ 1024) counted
    // integer-exactly. One partition pass; the oracle recomputes every
    // window boundary and sample from the schedule.
    "q189_audio_windows" -> ((s, d) => {
      val media = s.read.parquet(wavFixture(s, d))
      graft.multimodal.Multimodal.decodeWavWindows(media)
        .agg(count(lit(1)).as("n_windows"),
          sum(col("n_samples")).as("n_samples"),
          sum(col("sum_abs")).as("sum_abs"),
          max(col("peak")).as("max_peak"),
          sum(when(col("sum_abs") >= col("n_samples") * 1024, 1L)
            .otherwise(0L)).as("n_loud"))
    }),

    // Mixed-media landing zone routed by MAGIC BYTES: one binary stream
    // (PNG + GIF + WAV + PPM corpora unioned) classified by its first
    // bytes inside whole-stage codegen — the router that decides which
    // decoder each row reaches, costing a few byte compares per row,
    // never a decode. Every fixture contributes exactly one object per
    // document, so the per-format accounting is analytic.
    "q188_media_router" -> ((s, d) => {
      val zone = s.read.parquet(ppmFixture(s, d))
        .unionByName(s.read.parquet(pngFixture(s, d)))
        .unionByName(s.read.parquet(wavFixture(s, d)))
        .unionByName(s.read.parquet(gifFixture(s, d)))
      zone.withColumn("format",
          graft.multimodal.Multimodal.mediaFormat(col("content")))
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("format"))
    }),

    // REAL multi-frame (video-shaped) decode + frame sampling: animated
    // GIFs — the one multi-frame container pure-JDK ImageIO both writes
    // and reads — decode to one row per frame on the executors, every
    // second frame is sampled, per-frame gray sums aggregate. The
    // frame-pixel schedule is analytic, so the oracle recomputes every
    // sampled byte; real video codecs need native libs, but this IS the
    // video pipeline's Spark plumbing on actual container bytes.
    "q187_gif_frames" -> ((s, d) => {
      val media = s.read.parquet(gifFixture(s, d))
      graft.multimodal.Multimodal.decodeGifFrames(media)
        .agg(countDistinct(col("doc_id")).as("n_gifs"),
          count(lit(1)).as("n_frames"),
          sum(when(col("frame_idx") % 2 === 0, 1L).otherwise(0L))
            .as("n_sampled"),
          sum(when(col("frame_idx") % 2 === 0, col("sum_gray"))
            .otherwise(0L)).as("gray_sampled"))
    }),

    // REAL video container end-to-end: MJPEG-in-AVI — RIFF walk to the
    // avih/strh/strf headers and 00dc frame chunks, frames-per-second
    // sampling (one frame per second of video), and a REAL JPEG pixel
    // decode of exactly the sampled frames. Every gated number is
    // analytic from the planted schedule; the decoded dims feeding
    // px_sampled prove the sampled frames actually went through the
    // pixel decoder (a header-only shortcut would still pass n_* but
    // any decode/dims bug breaks px_sampled). Decode cost scales with
    // the sampling schedule, not the frame count — the property that
    // matters against 100 TB of video.
    "q200_mjpeg_avi" -> ((s, d) => {
      val media = s.read.parquet(aviFixture(s, d))
      graft.multimodal.Multimodal.decodeAviFrames(media)
        .agg(countDistinct(col("doc_id")).as("n_videos"),
          count(lit(1)).as("n_frames"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("sampled"),
            col("dec_width").cast("long") * col("dec_height") * 3L)
            .otherwise(0L)).as("px_sampled"))
    }),

    // Streaming ANN retrieval against a PERSISTED IVF index — the
    // online-serving shape of a retrieval deployment: query vectors
    // arrive in micro-batches, each batch probes the cell-partitioned
    // on-disk index (q91's layout; literal partition filters resolved
    // per batch) and lands its top-k in an exactly-once batch-
    // partitioned sink (dynamic partition overwrite, so a replayed
    // batch rewrites itself). Per-trigger work is O(batch × probed
    // cells), never O(corpus) — the index build is never rescanned by
    // the stream. Gate: nProbe = nCells makes every probe exhaustive,
    // so the union across batches must equal the exact top-k (the q45
    // oracle) while the full stream → probe → sink path (checkpoint,
    // AvailableNow, foreachBatch idempotence) is exercised.
    "q202_stream_ann" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
      val fix = streamAnnFixture(s, d)
      val base = graft.Scratch.runDir("graft_streamann")
      val schema = s.read.parquet(s"$fix/qs").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$fix/qs")
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.similarity.Similarity
            .ivfTopKIndexed(batch, s"$fix/index", k = 5, nProbe = 16)
            .withColumn("batch_id", graft.functions.RefLit.long(id))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/results")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/results")
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Image dedup via perceptual average-hash over REAL decoded PNGs:
    // decode → 8x8 luma thumbnail → mean-threshold → 64-bit signature,
    // then a hash-groupBy — the q29 exact-dedup shape applied to pixels,
    // scale-free (no pairwise anything). The fixture plants byte-identical
    // duplicates every 40 documents; identical bytes hash identically and
    // the 40 distinct schedules produce 40 distinct signatures, so the
    // cluster accounting is analytic.
    "q186_image_dedup" -> ((s, d) => {
      val media = s.read.parquet(pngDupFixture(s, d))
      graft.multimodal.Multimodal
        .aHash(media, graft.multimodal.Multimodal.PngCodec.decode)
        .groupBy(col("ahash"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_images"),
          count(lit(1)).as("n_clusters"),
          sum(col("n") - 1).as("n_dup_images"),
          max(col("n")).as("max_cluster"))
    }),

    // Unicode NFC normalization — the FIRST pass of any text pipeline:
    // composed ("é") and decomposed ("e"+U+0301) encodings of the same
    // text fragment every exact downstream operation (dedup fingerprints,
    // vocab joins, PII patterns) unless normalized at ingest. The
    // codegen'd NormalizeNfc expression (JDK normalizer, no UDF
    // boundary) runs over text with decomposed sequences planted on a
    // schedule; lengths count code points in both engines, so the
    // composition deltas gate exactly.
    "q182_nfc_normalize" -> ((s, d) => {
      // decomposed plants: 'e'+U+0301 (combining acute), 'A'+U+030A
      // (combining ring), 'o'+U+0308 (combining diaeresis) — NFC
      // composes each pair to one code point
      val t2 = concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" cafe\u0301")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit(" A\u030Angstro\u0308m"))
          .otherwise(lit("")))
      T.documents(s, d).select(col("doc_id"), t2.as("t2"))
        .withColumn("norm", graft.functions.NormalizeNfc(col("t2")))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("norm") =!= col("t2"), 1L).otherwise(0L))
            .as("n_changed"),
          sum(length(col("t2"))).as("len_before"),
          sum(length(col("norm"))).as("len_after"))
    }),

    // HTML boilerplate stripping (the crawl-cleaning pass): script-block
    // removal, tag removal, whitespace collapse — three codegen'd
    // regexp_replace passes at scan speed. A wrapper is planted around
    // every third document; stripping must round-trip to EXACTLY the
    // original text (bool_and-gated), so an off-by-one in any pattern
    // fails the gate.
    "q183_html_strip" -> ((s, d) => {
      val t2 = when(col("doc_id") % 3 === 0,
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><script>var x=1;</script></body></html>")))
        .otherwise(col("text"))
      val stripped = trim(regexp_replace(regexp_replace(regexp_replace(
        t2, "<script[^>]*>.*?</script>", " "), "<[^>]*>", " "), " +", " "))
      T.documents(s, d)
        .select(col("doc_id"), col("text"), stripped.as("stripped"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") % 3 === 0, 1L).otherwise(0L))
            .as("n_wrapped"),
          sum(length(col("stripped"))).as("len_total"),
          bool_and(col("stripped") === col("text")).as("roundtrip_ok"))
    }),

    // Compression-ratio quality signal (CCNet/Gopher-style proxy):
    // repetitive text compresses far better than prose, so the deflate
    // ratio ranks quality without a model. Executor-side JDK Deflater,
    // one instance reused per partition; a highly repetitive suffix is
    // planted on every tenth document and the gate asserts the aggregate
    // ratio ordering (integer cross-multiply — no float division) plus
    // that every planted document actually compresses below raw.
    "q184_compression_quality" -> ((s, d) => {
      val planted = T.documents(s, d).select(col("doc_id"),
        concat(col("text"), when(col("doc_id") % 10 === 0,
          lit(" " + "spam ham " * 50)).otherwise(lit(""))).as("t2"))
      val stats = graft.text.TextAnalysis
        .compressionStats(planted, "doc_id", "t2")
      stats.withColumn("flag", col("doc_id") % 10 === 0)
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"), sum(col("raw_len")).as("raw"),
          sum(col("comp_len")).as("comp"),
          bool_and(col("comp_len") < col("raw_len")).as("all_shrink"))
        .agg(sum(col("n")).as("n_docs"),
          sum(when(col("flag"), col("n")).otherwise(0L)).as("n_planted"),
          // planted ratio < unplanted ratio, by integer cross-multiply
          (max(when(col("flag"), col("comp"))) *
            max(when(!col("flag"), col("raw"))) <
            max(when(!col("flag"), col("comp"))) *
              max(when(col("flag"), col("raw"))))
            .as("ratio_ordering_ok"),
          bool_and(when(col("flag"), col("all_shrink")).otherwise(lit(true)))
            .as("planted_all_shrink"))
    }),

    // Exact AUC of a quality-classifier score (the calibration step
    // behind every classifier-filtered corpus): a graded repetition
    // plant gives genuinely overlapping score distributions, the score
    // is an integer repetition permille (1000·(nw-nd) div nw), and AUC
    // comes out RANK-FREE: scores bucket into a domain-bounded table
    // (≤1001 rows regardless of corpus size), concordant pairs are a
    // tiny bucket-level range join, ties one product sum — no global
    // sort, no window, no per-row pairing anywhere. auc_x1e6 in integer
    // micro-units: (2·concordant + ties)·1e6 div (2·P·N) — engine-exact.
    "q191_auc_quality" -> ((s, d) => {
      val planted = T.documents(s, d).select(col("doc_id"),
        expr("trim(concat(text, CASE WHEN doc_id % 10 = 0 THEN " +
          "concat(' ', repeat('spam ', CAST(doc_id % 30 AS INT))) " +
          "ELSE '' END))").as("t2"))
      val ws = split(col("t2"), " ")
      val scored = planted
        .select((col("doc_id") % 10 === 0).as("pos"),
          size(ws).cast("long").as("nw"),
          size(array_distinct(ws)).cast("long").as("nd"))
        .select(col("pos"), expr("1000 * (nw - nd) div nw").as("score"))
      val b = scored.groupBy(col("score"))
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
      val conc = b.as("hi").join(broadcast(b.as("lo")),
          col("hi.score") > col("lo.score"))
        .agg(coalesce(sum(col("hi.np") * col("lo.nn")), lit(0L))
          .as("concordant"))
      b.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
          coalesce(sum(col("np") * col("nn")), lit(0L)).as("ties"))
        .crossJoin(broadcast(conc))
        .select(col("n_pos"), col("n_neg"), col("concordant"), col("ties"),
          // concordant ≤ P·N, so 2·concordant·1e6 crosses int64 around
          // 2e6 docs per class — form the ratio in DECIMAL(38,0) like
          // the oracle's HUGEINT arithmetic (q142/q257 rule); operands
          // non-negative, so truncating div == DuckDB's flooring //.
          // One-class corpora guard to 0 on both engines (q224 rule:
          // ANSI div throws where DuckDB // yields NULL)
          expr("CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN " +
            "(2 * CAST(concordant AS DECIMAL(38,0)) + ties) " +
            "* 1000000 div " +
            "(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) " +
            "ELSE 0 END AS BIGINT)")
            .as("auc_x1e6"))
    }),

    // Retrieval-eval harness: recall@k and MRR of a candidate ranking
    // against exact truth — the metrics every ANN/retrieval deployment
    // reports. Reciprocal ranks accumulate in integer MICRO-UNITS
    // (1000000 div rank) so the mean is engine-exact — a double 1/3
    // would be the one non-reproducible term in the pipeline. Gated on
    // the int8-quantized ranking as the system under eval (DuckDB
    // replicates the quantization bit-for-bit, q59), scored against
    // float brute force as truth — so BOTH sides of the metric are
    // oracle-computable and the whole metric pipeline is hash-gated.
    "q180_retrieval_metrics" -> ((s, d) => {
      val k = 5
      val emb = T.embeddings(s, d)
      val qs = emb.where(col("vec_id") < 10)
      val truth = graft.similarity.Similarity.bruteForceTopK(qs, emb, k)
        .select(col("query_id"), col("rank").as("t_rank"),
          col("neighbor_id"))
      val sys = graft.similarity.Similarity.quantizedTopK(qs, emb, k)
        .select(col("query_id"), col("rank").as("s_rank"),
          col("neighbor_id"))
      val perQuery = truth.join(sys, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("s_rank")).as("hits"),
          // reciprocal rank of the TRUE top-1 in the system ranking
          coalesce(max(when(col("t_rank") === 1,
            expr("1000000 div s_rank"))), lit(0L)).as("rr_micro"))
      perQuery.agg(count(lit(1)).as("n_queries"),
          sum(col("hits")).as("n_hits"),
          sum(col("rr_micro")).as("sum_rr_micro"))
        .withColumn("recall_pct_x100",
          expr("n_hits * 10000 div (n_queries * 5)"))
        .withColumn("mrr_micro", expr("sum_rr_micro div n_queries"))
    }),

    // k-anonymity audit (privacy gate before a corpus ships): group
    // sizes over the quasi-identifier tuple, rows in groups smaller
    // than k, and the smallest group — one partial-aggregated groupBy
    // plus a tiny re-aggregate, the same shape at any scale.
    "q181_k_anonymity" -> ((s, d) => {
      val k = 5
      T.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_groups"),
          sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"),
          min(col("n")).as("min_group"))
    }),

    // Exact substring (span-level) dedup statistics: whole-document dedup
    // (q29) misses the dominant crawl pathology — boilerplate SPANS
    // repeated across distinct documents. The pass materializes every
    // word 10-gram with its occurrence count and cross-document spread:
    // explode → one partial-aggregated groupBy, no windows, no joins
    // until the tiny doc-level semi join — the plan shape that survives
    // a corpus-sized gram table. Output: corpus dup-mass accounting +
    // how many documents carry at least one cross-document span.
    "q178_span_dedup" -> ((s, d) => {
      val ws = split(trim(col("text")), " ")
      // the gram table feeds BOTH the stats aggregate and the
      // affected-docs join; materialize it once (localCheckpoint) so
      // the corpus-sized explode is not evaluated twice — on a cluster
      // this would be a persist(DISK_ONLY) of the same frame
      // two-level aggregate instead of countDistinct-with-count (which
      // Catalyst plans as an Expand, doubling the corpus-sized gram
      // stream): the (gram, doc) level collapses first, then nd/occ
      // are plain counts — and the (gram, doc) table is exactly what
      // the affected-docs step needs, so it is materialized once
      // size(ws) < 10 guard: sequence(0, size-10) steps -1 for short
      // docs and slice then throws; such docs simply have no 10-grams.
      val gd = T.documents(s, d)
        .select(col("doc_id"),
          explode(when(size(ws) >= 10,
            transform(sequence(lit(0), size(ws) - 10),
              i => array_join(slice(ws, i + 1, lit(10)), " ")))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("gram"))
        .groupBy(col("gram"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val stats = gd.groupBy(col("gram"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("occ"))
      val affected = gd
        .join(stats.where(col("nd") > 1).select(col("gram")), "gram")
        .select(col("doc_id")).distinct()
        .agg(count(lit(1)).as("docs_affected"))
      stats.agg(count(lit(1)).as("n_grams_distinct"),
          sum(col("occ")).as("n_grams_total"),
          sum(when(col("nd") > 1, col("occ")).otherwise(0L))
            .as("n_dup_occurrences"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
        .crossJoin(affected)
    }),

    // Span REMOVAL accounting (the action q178's statistics inform —
    // the suffix-array-dedup shape of "Deduplicating Training Data
    // Makes Language Models Better", re-expressed Spark-first): every
    // cross-document 10-gram occurrence becomes a token interval
    // [i, i+10), and the tokens a span-level dedup pass would excise
    // are the per-document INTERVAL UNION of those spans — classic
    // gaps-and-islands with windows partitioned by doc_id (never
    // global), over an interval table already reduced to duplicated
    // grams only. The oracle replays the identical island construction.
    "q195_span_removal" -> ((s, d) => {
      val ws = split(trim(col("text")), " ")
      val docs = T.documents(s, d).select(col("doc_id"), ws.as("ws"))
      // size(ws) < 10 guard: sequence(0, size-10) would step -1 and
      // slice(ws, 0, 10) throws on start 0; short docs contribute no
      // grams (explode drops the empty array), matching the oracle's
      // empty generate_series.
      val g = docs.select(col("doc_id"),
          explode(when(size(col("ws")) >= 10,
            transform(sequence(lit(0), size(col("ws")) - 10),
              i => struct(i.as("i"),
                array_join(slice(col("ws"), i + 1, lit(10)), " ")
                  .as("gram"))))
            .otherwise(expr(
              "CAST(array() AS ARRAY<STRUCT<i: INT, gram: STRING>>)")))
            .as("p"))
        .select(col("doc_id"), col("p.i").as("i"), col("p.gram").as("gram"))
        // feeds both the dup-gram aggregate and the interval join;
        // materialized once (a persist(DISK_ONLY) on a cluster)
        .localCheckpoint()
      val dup = g.groupBy(col("gram"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("gram")).agg(count(lit(1)).as("nd"))
        .where(col("nd") > 1).select(col("gram"))
      val iv = g.join(dup, "gram")
        .select(col("doc_id"), col("i").as("s"), (col("i") + 10).as("e"))
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      val pm = iv.withColumn("prev_max",
        coalesce(max(col("e")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, -1)), lit(-1)))
      val isl = pm.withColumn("island",
        sum(when(col("s") > col("prev_max"), 1).otherwise(0)).over(byDoc))
      val spans = isl.groupBy(col("doc_id"), col("island"))
        .agg((max(col("e")) - min(col("s"))).cast("long").as("covered"))
      val tot = docs
        .agg(sum(size(col("ws"))).cast("long").as("tokens_total"))
      spans.agg(
          coalesce(sum(col("covered")), lit(0L)).as("tokens_covered"),
          countDistinct(col("doc_id")).as("n_docs_affected"),
          count(lit(1)).as("n_spans"))
        .crossJoin(broadcast(tot))
    }),

    // Temperature-balanced language mixing (the multilingual-corpus
    // rebalancing step): sampling weight per language ∝ sqrt(share) —
    // alpha = 0.5, computed with sqrt (correctly-rounded IEEE, so the
    // rate arithmetic is engine-exact) — then deterministic md5-bucket
    // selection at the computed per-language rate, the same
    // hash-threshold machinery as q60/q61: any engine, any partitioning,
    // any re-run selects the same documents.
    "q179_temperature_mix" -> ((s, d) => {
      val target = 100.0
      val counts = T.documents(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
      // sw as order-free INTEGER micro-units: a raw double sum of the
      // sqrt terms is accumulation-order-dependent (Spark's partial-agg
      // order vs DuckDB's scan order), and a last-ulp difference at a
      // .5 rounding boundary would flip the 16-bit threshold. Each
      // floor(sqrt(n)·1e6) term is deterministic per value; the BIGINT
      // sum is exact in any order.
      val rates = counts
        .crossJoin(broadcast(counts.agg(
          sum(expr("CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) " +
            "AS BIGINT)")).as("swm"))))
        .withColumn("thr", round(least(lit(1.0),
            sqrt(col("n").cast("double")) * 1000000.0 /
              col("swm").cast("double") * target / col("n"))
          * 65536).cast("int"))
        .select(col("lang"), col("thr"))
      val bucketed = T.documents(s, d)
        .withColumn("bk",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int") % 65536)
      bucketed.join(broadcast(rates), "lang")
        .where(col("bk") < col("thr"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_selected"))
        .orderBy(col("lang"))
    }),

    // Production-config ANN recall gate: q34/q45/q91 pin the EXHAUSTIVE
    // configurations (bitsPerTable=0, full probe) to exact oracles — the
    // proof of mechanism; this row puts the configuration a user actually
    // runs (IVF nProbe=4 of 16 cells, LSH 8 tables x 8 bits) behind the
    // same hash gate, as deterministic recall-bound booleans vs brute
    // force (the q153 pattern: every input is deterministic — k-means||
    // seeding, Random(42) planes — so the booleans are stable facts of
    // the dataset, and FALSE fails the gate).
    // HNSW-style graph ANN — the one published ANN index class the
    // brute/LSH/IVF/PQ family didn't cover: a layered M-bounded
    // neighbor graph (deterministic geometric levels, adjacency from
    // capped LSH-bucket joins, greedy descent as iterative equi-joins;
    // Similarity.hnswTopK). Gated like q176: recall@10 vs exact brute
    // force, with the bound under every measured sf with margin
    // (AnnRecallProbe: 96/96/92% at sf0.001/0.01/0.1, vs IVF's 55-66%
    // and LSH's 65-71% at these settings) so a broken layer assignment,
    // disconnected adjacency, or descent regression flips the boolean.
    // Row identity (n_truth) pins the truth set size.
    "q308_ann_hnsw" -> ((s, d) =>
        // id/edge-sized intermediates: reducer count DERIVED from the
        // corpus bytes (same scoping rationale as streamHnswRun; round 9
        // replaced the constant 8 with the data-scaled derivation); the
        // build/search stages execute eagerly inside the scope via
        // localCheckpoint
        graft.Confs.withRunConf(s, "spark.sql.shuffle.partitions",
          graft.Confs.scaledShufflePartitions(s,
            T.embeddings(s, d)).toString) {
      val k = 10
      val emb = T.embeddings(s, d)
      val qs = emb.where(col("vec_id") < 10)
      val truth = graft.similarity.Similarity
        .bruteForceTopK(qs, emb, k)
        .select(col("query_id"), col("neighbor_id"))
      val hnsw = graft.similarity.Similarity
        .hnswTopK(qs, emb, k)
        .select(col("query_id"), col("neighbor_id"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(truth.join(hnsw, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hnsw_hits")))
        .select(col("n_truth"),
          (col("hnsw_hits") * 100 >= col("n_truth") * 80)
            .as("hnsw_recall_ok"))
        .localCheckpoint()
    }),

    // Persisted-index HNSW lifecycle — q91's IVF discipline applied to
    // the graph index: build once into a layer-partitioned store
    // (adjacency + vectors + entry), serve from the store alone. The
    // gate is stronger than a recall bound: the deterministic
    // construction means the indexed search must equal the in-memory
    // search BIT-EXACTLY (query_id, rank, neighbor_id), and both must
    // clear the q308 recall floor.
    "q309_ann_hnsw_indexed" -> ((s, d) =>
        graft.Confs.withRunConf(s, "spark.sql.shuffle.partitions",
          graft.Confs.scaledShufflePartitions(s,
            T.embeddings(s, d)).toString) {
      val k = 10
      val emb = T.embeddings(s, d)
      val qs = emb.where(col("vec_id") < 10)
      val dir = hnswIndexFixture(s, d)
      val indexed = graft.similarity.Similarity
        .hnswTopKIndexed(qs, dir, k)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
      val mem = graft.similarity.Similarity.hnswTopK(qs, emb, k)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
      val truth = graft.similarity.Similarity
        .bruteForceTopK(qs, emb, k)
        .select(col("query_id"), col("neighbor_id"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(indexed.agg(count(lit(1)).as("n_indexed")))
        .crossJoin(indexed.join(mem, Seq("query_id", "rank",
          "neighbor_id")).agg(count(lit(1)).as("n_both")))
        .crossJoin(truth.join(indexed.select(col("query_id"),
            col("neighbor_id")), Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hits")))
        .select(col("n_truth"),
          (col("n_indexed") === col("n_both") &&
            col("n_indexed") === col("n_truth"))
            .as("index_matches_memory"),
          (col("hits") * 100 >= col("n_truth") * 80)
            .as("hnsw_recall_ok"))
        .localCheckpoint()
    }),

    // Incremental HNSW insert — build on 90% of the corpus, APPEND the
    // held-out tenth (O(batch) work: new nodes take candidates from the
    // existing layers through the same capped index-join as incremental
    // dedup, history rows never rewritten), then serve the combined
    // store. Gates: the store is COMPLETE (vector count = corpus), and
    // search recall over queries answered from the appended store
    // clears the same floor as the one-shot build (q308) —
    // AnnRecallProbe measures 96/96/91% at sf0.001/0.01/0.1, within a
    // point of the one-shot 96/96/92.
    "q310_ann_hnsw_append" -> ((s, d) =>
        graft.Confs.withRunConf(s, "spark.sql.shuffle.partitions",
          graft.Confs.scaledShufflePartitions(s,
            T.embeddings(s, d)).toString) {
      val k = 10
      val emb = T.embeddings(s, d)
      val qs = emb.where(col("vec_id") < 10)
      val dir = hnswAppendFixture(s, d)
      val indexed = graft.similarity.Similarity
        .hnswTopKIndexed(qs, dir, k)
        .select(col("query_id"), col("neighbor_id"))
      val truth = graft.similarity.Similarity
        .bruteForceTopK(qs, emb, k)
        .select(col("query_id"), col("neighbor_id"))
      val stored = s.read.parquet(s"$dir/vectors")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(stored.agg(count(lit(1)).as("n_stored")))
        .crossJoin(emb.agg(count(lit(1)).as("n_corpus")))
        .crossJoin(truth.join(indexed, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hits")))
        .select(col("n_truth"),
          (col("n_stored") === col("n_corpus")).as("store_complete"),
          (col("hits") * 100 >= col("n_truth") * 80)
            .as("hnsw_recall_ok"))
        .localCheckpoint()
    }),

    // CONTINUOUS HNSW index build — the streaming twin of q310 (see
    // streamHnswRun): per-trigger O(batch) edge computation against the
    // earlier-batch store, batch_id-partitioned exactly-once state,
    // serving straight from the streamed store. Recall floor as q308;
    // AnnRecallProbe measures the streamed store at 100/100/90% across
    // sf0.001/0.01/0.1 (vs 96/96/91 for the one-append store). Mid-run
    // kill + checkpoint-restart recovery is gated bit-for-bit in
    // StreamingSpec.
    "q311_stream_hnsw_build" -> ((s, d) => {
      val res = streamHnswRun(s, d,
        graft.Scratch.runDir("graft_streamhnsw"), failAfter = None)
        .select(col("query_id"), col("neighbor_id"))
      val emb = T.embeddings(s, d)
      val truth = graft.similarity.Similarity
        .bruteForceTopK(emb.where(col("vec_id") < 10), emb, 10)
        .select(col("query_id"), col("neighbor_id"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(res.agg(count(lit(1)).as("n_res")))
        .crossJoin(truth.join(res, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hits")))
        .select(col("n_truth"),
          (col("n_res") === col("n_truth")).as("result_complete"),
          (col("hits") * 100 >= col("n_truth") * 80)
            .as("hnsw_recall_ok"))
    }),

    "q176_ann_recall" -> ((s, d) => {
      val k = 10
      val emb = T.embeddings(s, d)
      val qs = emb.where(col("vec_id") < 10)
      val truth = graft.similarity.Similarity
        .bruteForceTopK(qs, emb, k)
        .select(col("query_id"), col("neighbor_id"))
      val ivf = graft.similarity.Similarity
        .ivfTopK(qs, emb, k, nCells = 16, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"))
      val lsh = graft.similarity.Similarity
        .lshTopK(qs, emb, k, nTables = 8, bitsPerTable = 4)
        .select(col("query_id"), col("neighbor_id"))
      // measured recall across sf0.001/0.01/0.1: IVF 55-66%, LSH 65-71%;
      // the bounds sit under every measurement with margin, so a recall
      // regression (mis-celled vectors, broken probe order, bad seeding)
      // flips a boolean and fails the hash gate
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(truth.join(ivf, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("ivf_hits")))
        .crossJoin(truth.join(lsh, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("lsh_hits")))
        .select(col("n_truth"),
          (col("ivf_hits") * 100 >= col("n_truth") * 50).as("ivf_recall_ok"),
          (col("lsh_hits") * 100 >= col("n_truth") * 55).as("lsh_recall_ok"))
    }),

    // REAL mainstream-format image decode: the PNG corpus (encoded by
    // javax.imageio, the format an actual crawl arrives in) is decoded
    // on the executors through the same ImageIO stack, features and the
    // 8x8 thumbnail checksum extracted in the q144 partition pass. PNG
    // is lossless, so the analytic pixel-schedule oracle gates every
    // decoded byte — this closes the FakeCodec stub for images: PPM
    // proved the byte-level path, PNG proves the production format.
    "q174_png_decode" -> ((s, d) => {
      val media = s.read.parquet(pngFixture(s, d))
      graft.multimodal.Multimodal.decodePng(media)
        .agg(count(lit(1)).as("n_images"),
          sum(col("width").cast("long") * col("height")).as("n_pixels"),
          sum(col("sum_r")).as("sum_r"),
          sum(col("sum_g")).as("sum_g"),
          sum(col("sum_b")).as("sum_b"),
          sum(col("thumb_sum")).as("thumb_sum"))
    }),

    // PNG metadata peek WITHOUT decode (q149 for the mainstream format):
    // IHDR is mandatory and first, so width/height are eight fixed-offset
    // byte reads inside whole-stage codegen (functions.MediaOps.PngDim) —
    // dimension pruning never inflates a scanline.
    "q175_png_peek" -> ((s, d) => {
      val media = s.read.parquet(pngFixture(s, d))
      media.select(
          graft.functions.MediaOps.pngWidth(col("content")).as("w"),
          graft.functions.MediaOps.pngHeight(col("content")).as("h"))
        .where(col("w") >= 24)
        .agg(count(lit(1)).as("n_large"),
          sum(col("w").cast("long")).as("sum_w"),
          sum(col("h").cast("long")).as("sum_h"),
          min(col("w")).as("min_w"))
    }),

    // RAG document chunking: fixed-size overlapping character windows
    // (len 500, stride 400) via sequence()+explode — one generated row
    // per chunk, no UDF, no driver involvement. At 100 TB this is a
    // narrow map stage: chunk starts derive from n_chars alone, and the
    // substring is computed where the text already lives. The aggregate
    // proves chunk accounting (count, covered chars, per-doc max).
    "q107_doc_chunks" -> ((s, d) => {
      val chunks = T.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        .withColumn("start", explode(sequence(
          lit(0L), greatest(col("n_chars") - 1, lit(0L)), lit(ChunkStride))))
        .withColumn("chunk_len",
          length(col("text").substr((col("start") + 1).cast("int"),
            lit(ChunkLen.toInt))))
      val perDoc = chunks.groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("nc"), sum(col("chunk_len")).as("chars"))
      perDoc.groupBy(col("lang"))
        .agg(sum(col("nc")).as("n_chunks"),
          sum(col("chars")).as("sum_chunk_chars"),
          max(col("nc")).as("max_chunks_per_doc"))
        .orderBy(col("lang"))
    }),

    // Sweep-line peak concurrency: each event opens a 30-minute
    // interval; peak overlap per event_type is the max of the running
    // sum of +1/-1 boundary deltas. Boundaries collapse by (type, t)
    // BEFORE the window pass, so the cumulative sum runs over a unique
    // total order (deterministic) and the windowed data is already the
    // reduced boundary set, not the raw 100 TB of events.
    "q108_concurrency" -> ((s, d) => {
      val e = eventTimes(s, d)
      val deltas = e.select(col("event_type"), col("t"), lit(1L).as("delta"))
        .unionAll(e.select(col("event_type"),
          (col("t") + SessionUs).as("t"), lit(-1L).as("delta")))
      val net = deltas.groupBy(col("event_type"), col("t"))
        .agg(sum(col("delta")).as("net"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      net.withColumn("cur", sum(col("net")).over(w))
        .groupBy(col("event_type"))
        .agg(max(col("cur")).as("peak"), count(lit(1)).as("n_points"))
        .orderBy(col("event_type"))
    }),

    // Corpus bigram statistics: tokenize (lowercase, [a-z]+ runs),
    // form adjacent pairs with transform(sequence(...)) — pure array
    // algebra inside codegen — and count globally. The groupBy shuffles
    // only (bigram, partial count): map-side partial aggregation has
    // already collapsed each partition's duplicates, which is what
    // makes corpus-wide n-gram LM stats feasible at 100 TB.
    "q109_ngram_stats" -> ((s, d) => {
      val words = filter(
        split(lower(col("text")), "[^a-z]+"), w => w =!= lit(""))
      T.documents(s, d)
        .select(words.as("w"))
        .where(size(col("w")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => concat(element_at(col("w"), i), lit(" "),
            element_at(col("w"), i + 1)))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)
    }),

    // Mean-multiple outlier screen, integer-exact: flag rows whose
    // value exceeds 3x the per-type mean WITHOUT dividing — compare
    // vi * n > 3 * sum(vi) in micro-units (BIGINT), so the decision is
    // bit-identical in any engine (float means are not). Per-type stats
    // are a tiny aggregate broadcast back onto the scan: two passes
    // over the fact table, zero wide shuffles.
    "q110_outlier_screen" -> ((s, d) => {
      val vi = col("value").cast(DecimalType(20, 6))
        .*(lit(1000000L)).cast("long")
      val e = T.events(s, d).select(col("event_type"), vi.as("vi"))
      val stats = e.groupBy(col("event_type"))
        .agg(sum(col("vi")).as("sv"), count(lit(1)).as("n"))
      val heavy = col("vi") * col("n") > col("sv") * 3
      e.join(broadcast(stats), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(heavy, 1L).otherwise(0L)).as("n_heavy"),
          max(when(heavy, col("vi"))).as("max_heavy_vi"))
        .orderBy(col("event_type"))
    }),

    // Size-proportional (token-budget) sampling: keep a document with
    // probability n_chars / max(n_chars), decided by the same
    // deterministic md5 bucket the curation sampler uses — integer
    // cross-multiplication (bucket * max < 65536 * n_chars), no floats,
    // no RNG. Long documents are preferentially retained, the exact
    // semantic of sampling toward a token budget. The corpus max is a
    // one-row aggregate broadcast into the scan filter.
    "q111_weighted_sample" -> ((s, d) => {
      val docs = T.documents(s, d)
      val m = docs.agg(max(col("n_chars")).as("m"))
      docs.crossJoin(broadcast(m))
        .where(Sampling.bucket(col("doc_id")) * col("m") <
          lit(65536L) * col("n_chars"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    }),

    // Single-scan data profiling: null counts, exact distinct counts,
    // and min/max for four orders columns in ONE aggregate (Catalyst
    // plans the multi-distinct via a single Expand — one pass over the
    // table, not one scan per column), then stack() pivots the 1-row
    // result into the per-column profile shape.
    "q112_profile" -> ((s, d) => {
      val o = T.orders(s, d)
        .withColumn("o_orderday", to_date(col("o_orderdate")))
      val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderday")
      val aggs = cols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
      }
      o.agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(col("n_rows"), expr(
          s"stack(${cols.length}, " + cols.map(c =>
            s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
            .mkString(", ") +
          ") as (col_name, n_nulls, n_distinct, min_val, max_val)"))
        .orderBy(col("col_name"))
    }),

    // Iterative PageRank, loop-unrolled and integer-exact: a synthetic
    // ownership DAG over customer keys (k -> k div 2, k -> k div 3),
    // three damped iterations with all arithmetic in BIGINT floor
    // division so every engine agrees bit-for-bit. Each iteration is
    // one shuffle on the destination key with partial aggregation of
    // contributions; a production loop (see dedup/Clusters) would
    // checkpoint between iterations to cut the lineage.
    "q113_pagerank" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("q113_customer")
      def iter(prev: String, out: String): String =
        s"""i$out AS (
           |  SELECT e.dst AS node, SUM(r.r div d.outdeg) AS m
           |  FROM edges e JOIN deg d ON e.src = d.src
           |  JOIN $prev r ON e.src = r.node
           |  GROUP BY e.dst),
           |$out AS (
           |  SELECT n.node, 150000 + (85 * COALESCE(i.m, 0)) div 100 AS r
           |  FROM nodes n LEFT JOIN i$out i ON n.node = i.node)""".stripMargin
      s.sql(
        s"""WITH nodes AS (SELECT c_custkey AS node FROM q113_customer),
           |edges AS (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT node AS src, node div 2 AS dst FROM nodes
           |    WHERE node div 2 >= 1
           |    UNION ALL
           |    SELECT node AS src, node div 3 AS dst FROM nodes
           |    WHERE node div 3 >= 1)),
           |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
           |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")}
           |SELECT node, CAST(r AS BIGINT) AS rank FROM r3
           |ORDER BY r DESC, node LIMIT 10""".stripMargin)
    }),

    // Small-file compaction: rewrite the documents table with a
    // per-file record cap (maxRecordsPerFile — the knob that bounds
    // file sizes on a real landing zone), read it back, and prove the
    // rewrite is lossless (row count + exact char sum) and produced
    // exactly ceil(n / cap) files. Single-writer here so the file
    // count is analytic; at scale the same cap applies per task and
    // bounds every output file identically.
    "q114_compaction" -> ((s, d) => {
      val out = Scratch.runDir("graft_compact")
      T.documents(s, d).coalesce(1)
        .write.option("maxRecordsPerFile", 100)
        .mode("overwrite").parquet(out)
      s.read.parquet(out)
        .select(col("n_chars"), input_file_name().as("f"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("f")).as("n_files"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // Interval-union coverage (uptime semantics): merge each user's
    // overlapping 30-minute activity intervals into islands, then
    // report islands, covered microseconds, and events per user. The
    // running max-end uses a ROWS frame over the unique (t, event_id)
    // order; all arithmetic is integer microseconds. One shuffle on
    // user_id serves every window pass and the final aggregate.
    "q115_interval_cover" -> ((s, d) => {
      val byU = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      val e = eventTimes(s, d)
        .withColumn("e", col("t") + SessionUs)
      val marked = e
        .withColumn("pmax", max(col("e")).over(
          byU.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ni",
          when(col("pmax").isNull || col("t") > col("pmax"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("ni")).over(
          byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      marked.groupBy(col("user_id"), col("island"))
        .agg(min(col("t")).as("t0"), max(col("e")).as("t1"),
          count(lit(1)).as("n_ev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("t1") - col("t0")).as("covered_us"),
          sum(col("n_ev")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Shingle-containment detection (asymmetric near-dup): finds pairs
    // where one document CONTAINS the other (crawl boilerplate wrapping
    // a page) — containment |A∩B|/|A| ≥ 0.9 in either direction, a
    // relation plain Jaccard misses when sizes differ. Candidates come
    // from the inverted shingle index (equi-join on shingle hash), with
    // a document-frequency cap on the join key: a shingle occurring in
    // more than dfCap docs is a stopword-shingle whose postings list
    // would blow up the self-join quadratically — production drops
    // them (they carry no discriminative signal); the cap here is
    // sized above the corpus max so the oracle stays exhaustive.
    "q135_containment" -> ((s, d) => {
      val sh = graft.dedup.Dedup.shingles(T.documents(s, d))
        .localCheckpoint()
      val dfCap = 100000
      val keep = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .where(col("df") <= dfCap).select(col("sh"))
      val filtered = sh.join(keep, "sh")
      val common = filtered.toDF("sh", "id_a")
        .join(filtered.toDF("sh", "id_b"), "sh")
        .where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"))
      val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      common
        .join(sizes.toDF("id_a", "sz_a"), "id_a")
        .join(sizes.toDF("id_b", "sz_b"), "id_b")
        .withColumn("cont_a",
          col("common").cast("double") / col("sz_a"))
        .withColumn("cont_b",
          col("common").cast("double") / col("sz_b"))
        .where(col("cont_a") >= 0.9 || col("cont_b") >= 0.9)
        .select(col("id_a"), col("id_b"), col("common"),
          col("cont_a"), col("cont_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Log-free TF-IDF: rank terms by tf · N / df (the log only squashes
    // the ordering at equal tf, and ln() is NOT bit-stable across math
    // libraries — the rational score is, because it is one IEEE divide
    // of exact integers). Each doc's top term is a min_by over a
    // (-score, word) struct (partial aggregation, no per-doc sort);
    // the result counts docs per winning term.
    "q136_top_terms" -> ((s, d) => {
      val docs = T.documents(s, d)
      val n = docs.count() // bounded action: one scalar for the formula
      val tf = docs.select(col("doc_id"),
          explode(split(trim(lower(col("text"))), " ")).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("word"))
        .agg(countDistinct(col("doc_id")).as("df"))
      tf.join(df, "word")
        .withColumn("score",
          (col("tf") * lit(n)).cast("double") / col("df"))
        .groupBy(col("doc_id"))
        .agg(min_by(col("word"),
          struct((-col("score")).as("neg"), col("word"))).as("top_word"))
        .groupBy(col("top_word"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("top_word"))
        .limit(20)
    }),

    // Deterministic contrastive negative sampling: k pseudo-random
    // negatives per document from a hash ring — neg_j(id) = (id + j·step)
    // mod M — joined back against the corpus so only real ids survive.
    // No RNG, no cartesian: the candidate set is generated in the map
    // stage and resolved by ONE equi-join, which is what negative
    // sampling has to look like at 100 TB (a per-row random sample of
    // another table is otherwise a shuffle-everything operation).
    "q137_negative_pairs" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"))
      val m = docs.agg((max(col("doc_id")) + 1).as("m"))
      val cands = docs.crossJoin(broadcast(m))
        .withColumn("j", explode(sequence(lit(1L), lit(3L))))
        .withColumn("neg_id",
          (col("doc_id") + col("j") * (expr("m div 4") + 1)) % col("m"))
        .where(col("neg_id") =!= col("doc_id"))
      cands.join(docs.select(col("doc_id").as("neg_id")), "neg_id")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_pairs"),
          countDistinct(col("doc_id"), col("neg_id"))
            .as("n_distinct_pairs"),
          sum(when(col("neg_id") === col("doc_id"), 1L).otherwise(0L))
            .as("n_self_pairs"))
    }),

    // Minority-class upsampling (dataset rebalancing): replicate each
    // language's documents toward the majority count with an integer
    // boost factor (capped at 4), materialized by explode(sequence) —
    // the standard replay trick that upsamples WITHOUT shuffling: the
    // replication happens in the map stage where the row lives. Factors
    // are a handful of rows, broadcast onto the scan.
    "q116_minority_boost" -> ((s, d) => {
      val docs = T.documents(s, d)
      val counts = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_orig"))
      val target = counts.agg(max(col("n_orig")).as("tgt"))
      val factors = counts.crossJoin(broadcast(target))
        .withColumn("factor", least(
          expr("(tgt + n_orig - 1) div n_orig"), lit(4L)))
        .select(col("lang"), col("factor"))
      docs.join(broadcast(factors), Seq("lang"))
        .withColumn("rep", explode(sequence(lit(1L), col("factor"))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_after"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("factor")).as("factor"))
        .orderBy(col("lang"))
    })
  )

  /** The three-round BPE induction CTE chain (w0 char-split word table,
    * p/t pair-count + argmax, w1..w3 folded merges) shared by the q190
    * and q196 oracles — kept as one constant so the two gates can never
    * drift apart on the induction semantics. */
  private val BpeInductionCtes: String =
    """WITH w0 AS (
      |  SELECT word, COUNT(*) AS freq,
      |    regexp_replace(word, '(.)', '§\1', 'g') AS seq
      |  FROM (SELECT unnest(string_split(trim(text), ' ')) AS word
      |        FROM documents)
      |  WHERE word <> '' GROUP BY word),
      |p1 AS (
      |  SELECT s[i] AS a, s[i+1] AS b, SUM(freq) AS cnt
      |  FROM (SELECT freq, string_split(seq, '§')[2:] AS s FROM w0) t,
      |    LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS i) i_
      |  GROUP BY 1, 2),
      |t1 AS (SELECT a AS ma, b AS mb, cnt FROM p1
      |       ORDER BY cnt DESC, a, b LIMIT 1),
      |w1 AS (
      |  SELECT word, freq,
      |    list_reduce(list_prepend('', string_split(seq, '§')[2:]),
      |      (acc, x) -> CASE WHEN ends_with(acc, '§' || ma) AND x = mb
      |        THEN acc || mb ELSE acc || '§' || x END) AS seq
      |  FROM w0, t1),
      |p2 AS (
      |  SELECT s[i] AS a, s[i+1] AS b, SUM(freq) AS cnt
      |  FROM (SELECT freq, string_split(seq, '§')[2:] AS s FROM w1) t,
      |    LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS i) i_
      |  GROUP BY 1, 2),
      |t2 AS (SELECT a AS ma, b AS mb, cnt FROM p2
      |       ORDER BY cnt DESC, a, b LIMIT 1),
      |w2 AS (
      |  SELECT word, freq,
      |    list_reduce(list_prepend('', string_split(seq, '§')[2:]),
      |      (acc, x) -> CASE WHEN ends_with(acc, '§' || ma) AND x = mb
      |        THEN acc || mb ELSE acc || '§' || x END) AS seq
      |  FROM w1, t2),
      |p3 AS (
      |  SELECT s[i] AS a, s[i+1] AS b, SUM(freq) AS cnt
      |  FROM (SELECT freq, string_split(seq, '§')[2:] AS s FROM w2) t,
      |    LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS i) i_
      |  GROUP BY 1, 2),
      |t3 AS (SELECT a AS ma, b AS mb, cnt FROM p3
      |       ORDER BY cnt DESC, a, b LIMIT 1),
      |w3 AS (
      |  SELECT word, freq,
      |    list_reduce(list_prepend('', string_split(seq, '§')[2:]),
      |      (acc, x) -> CASE WHEN ends_with(acc, '§' || ma) AND x = mb
      |        THEN acc || mb ELSE acc || '§' || x END) AS seq
      |  FROM w2, t3),
      |""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q145_wav_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 1000 + doc_id % 501 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, ((i * 37 + doc_id * 11) % 4096) - 2048 AS v, i
        |  FROM d, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i)
        |    i_)
        |SELECT (SELECT COUNT(*) FROM d) AS n_clips,
        |  (SELECT CAST(SUM(n) AS BIGINT) FROM d) AS n_samples,
        |  CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(abs(v)) AS BIGINT) AS peak,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |  CAST(SUM(CASE WHEN i % 4 = 0 THEN v ELSE 0 END) AS BIGINT)
        |    AS downsample_sum
        |FROM s""".stripMargin,

    "q171_table_digest" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|',
        |    l_orderkey, l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT),
        |    l_returnflag)), 1, 12)) AS BIGINT)) AS DECIMAL(38,0))
        |    AS VARCHAR) AS digest
        |FROM lineitem""".stripMargin,

    "q165_postings" ->
      """WITH t AS (
        |  SELECT DISTINCT word, doc_id FROM (
        |    SELECT unnest(string_split(trim(lower(text)), ' ')) AS word,
        |      doc_id
        |    FROM documents))
        |SELECT word, COUNT(*) AS df,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',')
        |    AS postings
        |FROM t GROUP BY word ORDER BY word""".stripMargin,

    "q158_group_sample" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 3 ORDER BY lang, rn""".stripMargin,

    "q157_ivf_append" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND c.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q155_nested_json" -> {
      val q = Det.sqlSum("l_quantity")
      s"""SELECT COUNT(*) AS n_lines,
         |  COUNT(DISTINCT l_orderkey) AS n_orders,
         |  $q AS sum_qty,
         |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
         |FROM lineitem""".stripMargin
    },

    "q154_mixed_ingest" -> {
      val q = Det.sqlSum("l_quantity")
      s"""SELECT l_returnflag, COUNT(*) AS n, $q AS sum_qty,
         |  COUNT(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin
    },

    "q152_skew_diagnose" ->
      """WITH c AS (
        |  SELECT CASE WHEN event_id % 4 < 2 THEN -1 ELSE user_id END AS k,
        |    COUNT(*) AS n_k
        |  FROM events GROUP BY k
        |), t AS (SELECT SUM(n_k) AS n FROM c)
        |SELECT COUNT(*) AS n_keys,
        |  CAST(SUM(CASE WHEN n_k * 20 > n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hot,
        |  MAX(CASE WHEN n_k * 20 > n THEN n_k END) AS hottest_n,
        |  MIN(CASE WHEN n_k * 20 > n THEN k END) AS hottest_k
        |FROM c, t""".stripMargin,

    "q153_bloom_fpp" ->
      """SELECT (SELECT COUNT(*) FROM customer WHERE c_custkey % 2 = 0)
        |    AS n_members,
        |  TRUE AS members_all_pass, TRUE AS fp_bound_ok""".stripMargin,

    "q150_token_shards" ->
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS cum
        |  FROM documents)
        |SELECT CAST((cum - n_chars) // 20000 AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM c GROUP BY shard ORDER BY shard""".stripMargin,

    "q149_ppm_peek" ->
      """SELECT COUNT(*) AS n_large,
        |  CAST(SUM(16 + doc_id % 17) AS BIGINT) AS sum_w,
        |  CAST(SUM(16 + doc_id % 13) AS BIGINT) AS sum_h,
        |  CAST(MIN(16 + doc_id % 17) AS INTEGER) AS min_w
        |FROM documents WHERE 16 + doc_id % 17 >= 24""".stripMargin,

    // q153 pattern: dimensions and counts are analytic (JPEG headers
    // are lossless); the decode-accuracy booleans are deterministic
    // TRUE facts of the dataset + pinned encoder quality.
    "q192_jpeg_decode" ->
      """SELECT COUNT(*) AS n_images,
        |  CAST(SUM(16 + doc_id % 17) AS BIGINT) AS sum_w,
        |  CAST(SUM(16 + doc_id % 13) AS BIGINT) AS sum_h,
        |  TRUE AS dims_ok, TRUE AS err_ok
        |FROM documents""".stripMargin,

    "q193_jpeg_peek" ->
      """SELECT COUNT(*) AS n_large,
        |  CAST(SUM(16 + doc_id % 17) AS BIGINT) AS sum_w,
        |  CAST(SUM(16 + doc_id % 13) AS BIGINT) AS sum_h,
        |  CAST(MIN(16 + doc_id % 17) AS INTEGER) AS min_w
        |FROM documents WHERE 16 + doc_id % 17 >= 24""".stripMargin,

    // Replays the identical BPE induction: same §-seq representation,
    // same greedy leftmost fold (list_reduce with the ends_with test),
    // same (cnt DESC, a, b) argmax tie-break, three chained rounds.
    "q190_bpe_merges" ->
      (BpeInductionCtes +
      """|tb AS (SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS n FROM w0),
        |ta AS (SELECT CAST(SUM(freq * len(string_split(seq, '§')[2:]))
        |         AS BIGINT) AS n FROM w3)
        |SELECT * FROM (
        |  SELECT 1 AS round, ma || '+' || mb AS merge,
        |    CAST(cnt AS BIGINT) AS pair_freq,
        |    (SELECT n FROM tb) AS tokens_before,
        |    (SELECT n FROM ta) AS tokens_after FROM t1
        |  UNION ALL
        |  SELECT 2, ma || '+' || mb, CAST(cnt AS BIGINT),
        |    (SELECT n FROM tb), (SELECT n FROM ta) FROM t2
        |  UNION ALL
        |  SELECT 3, ma || '+' || mb, CAST(cnt AS BIGINT),
        |    (SELECT n FROM tb), (SELECT n FROM ta) FROM t3)
        |ORDER BY round""".stripMargin),

    "q198_cdc_chunking" ->
      """WITH c AS (
        |  SELECT doc_id, length(text) AS L,
        |    list_transform(generate_series(1, length(text)),
        |      i -> ascii(substr(text, i, 1))) AS cs
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, L,
        |    list_filter(generate_series(8, L),
        |      i -> list_sum(list_transform(generate_series(0, 7),
        |        j -> cs[i - j] * ([1,31,961,29791,923521,28629151,
        |          887503681,27512614111])[j + 1])) % 64 = 0) AS bp
        |  FROM c),
        |s AS (
        |  SELECT doc_id, L, len(bp) + 1 AS n_chunks,
        |    COALESCE(list_sum(bp), 0) AS bp_sum,
        |    list_max(list_transform(generate_series(1, len(bp) + 1),
        |      k -> COALESCE(bp[k], L) - COALESCE(bp[k - 1], 0)))
        |      AS max_chunk
        |  FROM b)
        |SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
        |  CAST(SUM(L) AS BIGINT) AS n_chars,
        |  CAST(SUM(L) AS BIGINT) * 1000 // CAST(SUM(n_chunks) AS BIGINT)
        |    AS mean_chunk_milli,
        |  CAST(MAX(max_chunk) AS BIGINT) AS max_chunk,
        |  CAST(SUM(bp_sum) AS BIGINT) AS boundary_checksum
        |FROM s""".stripMargin,

    "q197_epoch_shuffle" ->
      """WITH e AS (SELECT unnest(generate_series(1, 3)) AS epoch),
        |k AS (
        |  SELECT e.epoch, d.doc_id,
        |    CAST('0x' || substr(md5(e.epoch || ':' || d.doc_id), 1, 12)
        |      AS BIGINT) AS key
        |  FROM e, documents d),
        |r AS (
        |  SELECT epoch, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY key, doc_id)
        |      AS rnk
        |  FROM k)
        |SELECT CAST(epoch AS INTEGER) AS epoch, CAST(rnk AS INTEGER) AS rnk,
        |  doc_id
        |FROM r WHERE rnk <= 5 ORDER BY epoch, rnk""".stripMargin,

    // The induction chain (shared with q190) plus the APPLICATION join:
    // corpus words against the trained w3 vocabulary, per-language
    // token accounting.
    "q196_bpe_fertility" ->
      (BpeInductionCtes +
      """|corpus AS (
        |  SELECT lang, unnest(string_split(trim(text), ' ')) AS word
        |  FROM documents)
        |SELECT c.lang, COUNT(*) AS n_words,
        |  CAST(SUM(len(string_split(w3.seq, '§')[2:])) AS BIGINT)
        |    AS n_tokens,
        |  CAST(SUM(len(string_split(w3.seq, '§')[2:])) AS BIGINT) * 1000
        |    // COUNT(*) AS fertility_milli
        |FROM corpus c JOIN w3 ON c.word = w3.word
        |WHERE c.word <> ''
        |GROUP BY c.lang ORDER BY c.lang""".stripMargin),

    "q189_audio_windows" ->
      """WITH d AS (SELECT doc_id, 1000 + doc_id % 501 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, i, i // 256 AS wi,
        |    ((i*37 + doc_id*11) % 4096) - 2048 AS v
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(0, n - 1)) AS i) s_),
        |w AS (
        |  SELECT doc_id, wi, COUNT(*) AS ns, SUM(ABS(v)) AS sa,
        |    MAX(ABS(v)) AS pk
        |  FROM s GROUP BY doc_id, wi)
        |SELECT COUNT(*) AS n_windows,
        |  CAST(SUM(ns) AS BIGINT) AS n_samples,
        |  CAST(SUM(sa) AS BIGINT) AS sum_abs,
        |  CAST(MAX(pk) AS BIGINT) AS max_peak,
        |  CAST(SUM(CASE WHEN sa >= ns * 1024 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_loud
        |FROM w""".stripMargin,

    "q188_media_router" ->
      """SELECT f.format, (SELECT COUNT(*) FROM documents) AS n,
        |  (SELECT COUNT(*) FROM documents) AS n_docs
        |FROM (VALUES ('gif'), ('png'), ('ppm'), ('wav')) f(format)
        |ORDER BY f.format""".stripMargin,

    // Planted AVI schedule: w=16+id%5, h=12+id%3, fps=2+id%3, nf=5+id%7;
    // sampling takes frames 0, fps, 2·fps, … → (nf-1)//fps + 1 per video;
    // sampled frames decode to w×h×3 channel values each.
    "q200_mjpeg_avi" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 5 AS w, 12 + doc_id % 3 AS h,
        |    2 + doc_id % 3 AS fps, 5 + doc_id % 7 AS nf
        |  FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_videos,
        |  CAST(SUM(nf) AS BIGINT) AS n_frames,
        |  CAST(SUM((nf - 1) // fps + 1) AS BIGINT) AS n_sampled,
        |  CAST(SUM(((nf - 1) // fps + 1) * w * h * 3) AS BIGINT)
        |    AS px_sampled
        |FROM d""".stripMargin,

    // Full-probe streaming retrieval is exhaustive per batch and the
    // batches partition the query set, so the streamed union equals
    // the exact top-k — the q45 oracle.
    "q202_stream_ann" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND c.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q187_gif_frames" ->
      """WITH d AS (
        |  SELECT doc_id, 12 + doc_id % 5 AS w, 10 + doc_id % 3 AS h,
        |    3 + doc_id % 4 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, w, h, f
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(0, nf - 1)) AS f) fs),
        |px AS (
        |  SELECT doc_id, f,
        |    (x*(3+f) + y*(5+f) + doc_id) % 256 AS v
        |  FROM fr,
        |    LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
        |    LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys)
        |SELECT (SELECT COUNT(*) FROM d) AS n_gifs,
        |  (SELECT COUNT(*) FROM fr) AS n_frames,
        |  (SELECT COUNT(*) FROM fr WHERE f % 2 = 0) AS n_sampled,
        |  (SELECT CAST(SUM(CASE WHEN f % 2 = 0 THEN v ELSE 0 END)
        |     AS BIGINT) FROM px) AS gray_sampled""".stripMargin,

    // cluster accounting over the planted %40 duplicate schedule (the
    // 40 distinct pixel schedules give 40 distinct signatures — pinned
    // by ScaleSpec — so clusters ≡ doc_id % 40 groups)
    "q186_image_dedup" ->
      """WITH g AS (
        |  SELECT doc_id % 40 AS k, COUNT(*) AS n
        |  FROM documents GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM documents) AS n_images,
        |  (SELECT COUNT(*) FROM g) AS n_clusters,
        |  (SELECT CAST(SUM(n - 1) AS BIGINT) FROM g) AS n_dup_images,
        |  (SELECT CAST(MAX(n) AS BIGINT) FROM g) AS max_cluster""".stripMargin,

    // chr(769)=U+0301 combining acute, chr(778)=U+030A combining ring,
    // chr(776)=U+0308 combining diaeresis — the same decomposed plants
    "q182_nfc_normalize" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' cafe' || chr(769)
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 6 = 0
        |      THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
        |      ELSE '' END AS t2
        |  FROM documents),
        |n AS (SELECT t2, nfc_normalize(t2) AS norm FROM p)
        |SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN norm <> t2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed,
        |  CAST(SUM(length(t2)) AS BIGINT) AS len_before,
        |  CAST(SUM(length(norm)) AS BIGINT) AS len_after
        |FROM n""".stripMargin,

    "q183_html_strip" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN '<html><body><p>' || text ||
        |        '</p><script>var x=1;</script></body></html>'
        |      ELSE text END AS t2
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, trim(regexp_replace(regexp_replace(
        |    regexp_replace(t2, '<script[^>]*>.*?</script>', ' ', 'g'),
        |    '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS stripped
        |  FROM p)
        |SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_wrapped,
        |  CAST(SUM(length(stripped)) AS BIGINT) AS len_total,
        |  bool_and(stripped = text) AS roundtrip_ok
        |FROM s""".stripMargin,

    // deflate output is not SQL-expressible; the oracle pins the
    // oracle-computable facts and the deterministic TRUE bounds
    // (q153 pattern)
    "q184_compression_quality" ->
      """SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_planted,
        |  TRUE AS ratio_ordering_ok, TRUE AS planted_all_shrink
        |FROM documents""".stripMargin,

    "q191_auc_quality" ->
      """WITH p AS (
        |  SELECT doc_id, trim(text || CASE WHEN doc_id % 10 = 0
        |    THEN ' ' || repeat('spam ', CAST(doc_id % 30 AS INTEGER))
        |    ELSE '' END) AS t2
        |  FROM documents),
        |s AS (
        |  SELECT doc_id % 10 = 0 AS pos,
        |    1000 * (len(string_split(t2, ' ')) -
        |            len(list_distinct(string_split(t2, ' ')))) //
        |      len(string_split(t2, ' ')) AS score
        |  FROM p),
        |b AS (
        |  SELECT score, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS nn
        |  FROM s GROUP BY score),
        |c AS (SELECT COALESCE(SUM(hi.np * lo.nn), 0) AS concordant
        |      FROM b hi JOIN b lo ON hi.score > lo.score),
        |t AS (SELECT COALESCE(SUM(np * nn), 0) AS ties,
        |       SUM(np) AS n_pos, SUM(nn) AS n_neg FROM b)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(n_neg AS BIGINT) AS n_neg,
        |  CAST(concordant AS BIGINT) AS concordant,
        |  CAST(ties AS BIGINT) AS ties,
        |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN (2*concordant + ties) * 1000000 // (2 * n_pos * n_neg)
        |    ELSE 0 END AS BIGINT) AS auc_x1e6
        |FROM t, c""".stripMargin,

    // both the truth ranking (float brute force) and the system ranking
    // (int8-quantized dot) replicate exactly in DuckDB, so the metric
    // pipeline itself is hash-gated end-to-end
    "q180_retrieval_metrics" ->
      """WITH t AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS t_rank
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |tt AS (SELECT * FROM t WHERE t_rank <= 5),
        |e AS (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> greatest(-127, least(127, round(x * 127.0)))) AS qv
        |  FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_inner_product(q.qv, c.qv) DESC, c.vec_id) AS s_rank
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ss AS (SELECT * FROM s WHERE s_rank <= 5),
        |pq AS (
        |  SELECT tt.query_id, COUNT(ss.s_rank) AS hits,
        |    COALESCE(MAX(CASE WHEN tt.t_rank = 1
        |      THEN 1000000 // ss.s_rank END), 0) AS rr
        |  FROM tt LEFT JOIN ss ON tt.query_id = ss.query_id
        |    AND tt.neighbor_id = ss.neighbor_id
        |  GROUP BY tt.query_id)
        |SELECT COUNT(*) AS n_queries, CAST(SUM(hits) AS BIGINT) AS n_hits,
        |  CAST(SUM(rr) AS BIGINT) AS sum_rr_micro,
        |  CAST(SUM(hits) AS BIGINT) * 10000 // (COUNT(*) * 5)
        |    AS recall_pct_x100,
        |  CAST(SUM(rr) AS BIGINT) // COUNT(*) AS mrr_micro
        |FROM pq""".stripMargin,

    "q181_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_small_groups,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(MIN(n) AS BIGINT) AS min_group
        |FROM g""".stripMargin,

    "q195_span_removal" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, i, array_to_string(ws[i+1:i+10], ' ') AS gram
        |  FROM w, LATERAL (
        |    SELECT unnest(generate_series(0, len(ws) - 10)) AS i) s),
        |dup AS (
        |  SELECT gram FROM g GROUP BY gram
        |  HAVING COUNT(DISTINCT doc_id) > 1),
        |iv AS (
        |  SELECT g.doc_id, g.i AS s, g.i + 10 AS e
        |  FROM g JOIN dup ON g.gram = dup.gram),
        |pm AS (
        |  SELECT doc_id, s, e,
        |    COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      AS prev_max
        |  FROM iv),
        |isl AS (
        |  SELECT doc_id, s, e,
        |    SUM(CASE WHEN s > prev_max THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s) AS island
        |  FROM pm),
        |spans AS (
        |  SELECT doc_id, island, MAX(e) - MIN(s) AS covered
        |  FROM isl GROUP BY doc_id, island),
        |tot AS (SELECT CAST(SUM(len(ws)) AS BIGINT) AS tokens_total FROM w)
        |SELECT CAST(COALESCE(SUM(covered), 0) AS BIGINT) AS tokens_covered,
        |  COUNT(DISTINCT doc_id) AS n_docs_affected,
        |  COUNT(*) AS n_spans,
        |  (SELECT tokens_total FROM tot) AS tokens_total
        |FROM spans""".stripMargin,

    "q178_span_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(ws[i+1:i+10], ' ') AS gram
        |  FROM w, LATERAL (
        |    SELECT unnest(generate_series(0, len(ws) - 10)) AS i) s),
        |st AS (
        |  SELECT gram, COUNT(DISTINCT doc_id) AS nd, COUNT(*) AS occ
        |  FROM g GROUP BY gram)
        |SELECT (SELECT COUNT(*) FROM st) AS n_grams_distinct,
        |  (SELECT CAST(SUM(occ) AS BIGINT) FROM st) AS n_grams_total,
        |  (SELECT CAST(SUM(CASE WHEN nd > 1 THEN occ ELSE 0 END) AS BIGINT)
        |     FROM st) AS n_dup_occurrences,
        |  (SELECT CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |     FROM st) AS n_dup_grams,
        |  (SELECT COUNT(DISTINCT g.doc_id) FROM g
        |     JOIN st ON g.gram = st.gram WHERE st.nd > 1)
        |    AS docs_affected""".stripMargin,

    "q179_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |t AS (
        |  SELECT lang, CAST(round(LEAST(1.0,
        |      sqrt(CAST(n AS DOUBLE)) * 1000000.0 /
        |        CAST((SELECT SUM(CAST(floor(sqrt(CAST(n AS DOUBLE))
        |          * 1000000) AS BIGINT)) FROM c) AS DOUBLE)
        |      * 100.0 / n) * 65536) AS INTEGER) AS thr
        |  FROM c),
        |b AS (
        |  SELECT d.lang, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |    1, 4) AS INTEGER) % 65536 AS bk
        |  FROM documents d)
        |SELECT b.lang, COUNT(*) AS n_selected
        |FROM b JOIN t ON b.lang = t.lang AND b.bk < t.thr
        |GROUP BY b.lang ORDER BY b.lang""".stripMargin,

    // q153 pattern: the oracle-expressible fact (truth-set size: 10
    // queries x k=10 exact neighbors) is computed for real; the recall
    // bounds are deterministic TRUE facts of the dataset + config.
    "q176_ann_recall" ->
      """SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id < 10) * 10
        |    AS n_truth,
        |  TRUE AS ivf_recall_ok, TRUE AS lsh_recall_ok""".stripMargin,

    // same contract as q176: truth-set size is data-derived, the recall
    // bound is a boolean the Spark side must earn
    "q308_ann_hnsw" ->
      """SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id < 10) * 10
        |    AS n_truth,
        |  TRUE AS hnsw_recall_ok""".stripMargin,

    "q309_ann_hnsw_indexed" ->
      """SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id < 10) * 10
        |    AS n_truth,
        |  TRUE AS index_matches_memory, TRUE AS hnsw_recall_ok"""
        .stripMargin,

    "q310_ann_hnsw_append" ->
      """SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id < 10) * 10
        |    AS n_truth,
        |  TRUE AS store_complete, TRUE AS hnsw_recall_ok""".stripMargin,

    "q311_stream_hnsw_build" ->
      """SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id < 10) * 10
        |    AS n_truth,
        |  TRUE AS result_complete, TRUE AS hnsw_recall_ok""".stripMargin,

    // Same analytic pixel-schedule oracle as q144: the PNG fixture plants
    // the identical schedule and PNG is lossless, so the expected sums
    // are format-independent.
    "q174_png_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h
        |  FROM documents),
        |full_px AS (
        |  SELECT doc_id,
        |    ((x*31 + y*17 + doc_id) % 256) AS r,
        |    ((x*7 + y*3) % 256) AS g,
        |    ((x + y + doc_id) % 256) AS b
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
        |    LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys),
        |thumb AS (
        |  SELECT doc_id,
        |    (((i*w//8)*31 + (j*h//8)*17 + doc_id) % 256)
        |    + (((i*w//8)*7 + (j*h//8)*3) % 256)
        |    + (((i*w//8) + (j*h//8) + doc_id) % 256) AS v
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(0, 7)) AS i) i_,
        |    LATERAL (SELECT unnest(generate_series(0, 7)) AS j) j_)
        |SELECT (SELECT COUNT(*) FROM d) AS n_images,
        |  (SELECT CAST(SUM(w*h) AS BIGINT) FROM d) AS n_pixels,
        |  (SELECT CAST(SUM(r) AS BIGINT) FROM full_px) AS sum_r,
        |  (SELECT CAST(SUM(g) AS BIGINT) FROM full_px) AS sum_g,
        |  (SELECT CAST(SUM(b) AS BIGINT) FROM full_px) AS sum_b,
        |  (SELECT CAST(SUM(v) AS BIGINT) FROM thumb) AS thumb_sum"""
        .stripMargin,

    "q175_png_peek" ->
      """SELECT COUNT(*) AS n_large,
        |  CAST(SUM(16 + doc_id % 17) AS BIGINT) AS sum_w,
        |  CAST(SUM(16 + doc_id % 13) AS BIGINT) AS sum_h,
        |  CAST(MIN(16 + doc_id % 17) AS INTEGER) AS min_w
        |FROM documents WHERE 16 + doc_id % 17 >= 24""".stripMargin,

    "q144_ppm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h
        |  FROM documents),
        |full_px AS (
        |  SELECT doc_id,
        |    ((x*31 + y*17 + doc_id) % 256) AS r,
        |    ((x*7 + y*3) % 256) AS g,
        |    ((x + y + doc_id) % 256) AS b
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
        |    LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys),
        |thumb AS (
        |  SELECT doc_id,
        |    (((i*w//8)*31 + (j*h//8)*17 + doc_id) % 256)
        |    + (((i*w//8)*7 + (j*h//8)*3) % 256)
        |    + (((i*w//8) + (j*h//8) + doc_id) % 256) AS v
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(0, 7)) AS i) i_,
        |    LATERAL (SELECT unnest(generate_series(0, 7)) AS j) j_)
        |SELECT (SELECT COUNT(*) FROM d) AS n_images,
        |  (SELECT CAST(SUM(w*h) AS BIGINT) FROM d) AS n_pixels,
        |  (SELECT CAST(SUM(r) AS BIGINT) FROM full_px) AS sum_r,
        |  (SELECT CAST(SUM(g) AS BIGINT) FROM full_px) AS sum_g,
        |  (SELECT CAST(SUM(b) AS BIGINT) FROM full_px) AS sum_b,
        |  (SELECT CAST(SUM(v) AS BIGINT) FROM thumb) AS thumb_sum"""
        .stripMargin,

    "q107_doc_chunks" ->
      """WITH chunks AS (
        |  SELECT doc_id, lang,
        |    length(substr(text, CAST(gs.s AS INTEGER) + 1, 500))
        |      AS chunk_len
        |  FROM documents, LATERAL (
        |    SELECT unnest(generate_series(0, greatest(n_chars - 1, 0), 400))
        |      AS s) gs
        |), per_doc AS (
        |  SELECT doc_id, lang, COUNT(*) AS nc, SUM(chunk_len) AS chars
        |  FROM chunks GROUP BY doc_id, lang)
        |SELECT lang, CAST(SUM(nc) AS BIGINT) AS n_chunks,
        |  CAST(SUM(chars) AS BIGINT) AS sum_chunk_chars,
        |  CAST(MAX(nc) AS BIGINT) AS max_chunks_per_doc
        |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin,

    "q108_concurrency" ->
      """WITH pts AS (
        |  SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 1800000000, -1 FROM events
        |), net AS (
        |  SELECT event_type, t, SUM(delta) AS net FROM pts
        |  GROUP BY event_type, t)
        |SELECT event_type, CAST(MAX(cur) AS BIGINT) AS peak,
        |  COUNT(*) AS n_points
        |FROM (SELECT event_type,
        |        SUM(net) OVER (PARTITION BY event_type ORDER BY t) AS cur
        |      FROM net)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q109_ngram_stats" ->
      """WITH w AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |    x -> x <> '') AS w
        |  FROM documents
        |), bg AS (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i + 1])) AS bigram
        |  FROM w WHERE len(w) >= 2)
        |SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "q110_outlier_screen" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(20,6)) * 1000000 AS BIGINT) AS vi
        |  FROM events
        |), stats AS (
        |  SELECT event_type, SUM(vi) AS sv, COUNT(*) AS n
        |  FROM e GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN e.vi * s.n > 3 * s.sv THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_heavy,
        |  MAX(CASE WHEN e.vi * s.n > 3 * s.sv THEN e.vi END)
        |    AS max_heavy_vi
        |FROM e JOIN stats s USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q111_weighted_sample" ->
      """WITH m AS (SELECT MAX(n_chars) AS m FROM documents),
        |b AS (
        |  SELECT *, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |    AS INTEGER) % 65536 AS bk
        |  FROM documents)
        |SELECT source, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM b, m WHERE bk * m.m < 65536 * n_chars
        |GROUP BY source ORDER BY source""".stripMargin,

    "q112_profile" -> {
      def row(c: String, ex: String) =
        s"""SELECT COUNT(*) AS n_rows, '$c' AS col_name,
           |  CAST(SUM(CASE WHEN $ex IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  CAST(COUNT(DISTINCT $ex) AS BIGINT) AS n_distinct,
           |  CAST(MIN($ex) AS VARCHAR) AS min_val,
           |  CAST(MAX($ex) AS VARCHAR) AS max_val
           |FROM orders""".stripMargin
      Seq(row("o_custkey", "o_custkey"),
        row("o_orderstatus", "o_orderstatus"),
        row("o_orderpriority", "o_orderpriority"),
        row("o_orderday", "CAST(o_orderdate AS DATE)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q113_pagerank" -> {
      def iter(prev: String, out: String): String =
        s"""i$out AS (
           |  SELECT e.dst AS node, SUM(r.r // d.outdeg) AS m
           |  FROM edges e JOIN deg d ON e.src = d.src
           |  JOIN $prev r ON e.src = r.node
           |  GROUP BY e.dst),
           |$out AS (
           |  SELECT n.node, 150000 + (85 * COALESCE(i.m, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN i$out i ON n.node = i.node)""".stripMargin
      s"""WITH nodes AS (SELECT c_custkey AS node FROM customer),
         |edges AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT node AS src, node // 2 AS dst FROM nodes
         |    WHERE node // 2 >= 1
         |    UNION ALL
         |    SELECT node AS src, node // 3 AS dst FROM nodes
         |    WHERE node // 3 >= 1)),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, CAST(r AS BIGINT) AS rank FROM r3
         |ORDER BY r DESC, node LIMIT 10""".stripMargin
    },

    "q114_compaction" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS n_files,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents""".stripMargin,

    "q115_interval_cover" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    epoch_us(ts) + 1800000000 AS e
        |  FROM events
        |), marked AS (
        |  SELECT *,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM e
        |), islands AS (
        |  SELECT user_id, island, MIN(t) AS t0, MAX(e) AS t1,
        |    COUNT(*) AS n_ev
        |  FROM (SELECT *,
        |          SUM(CASE WHEN pmax IS NULL OR t > pmax THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY user_id ORDER BY t, event_id)
        |            AS island
        |        FROM marked)
        |  GROUP BY user_id, island)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(t1 - t0) AS BIGINT) AS covered_us,
        |  CAST(SUM(n_ev) AS BIGINT) AS n_events
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Truth via OracleSql.blockedPairs (containment >= 0.9 implies a
    // shared shingle, so the blocked pair set is exhaustive; parity
    // pinned at sf0.01 by tools/oracle_parity.py). Near-linear, so the
    // sf0.1 sweep value-gates it inside the slot timeout instead of the
    // round-7 skip-and-note (~9 min standalone quadratic).
    "q135_containment" ->
      s"""WITH ${OracleSql.blockedPairs("documents")}
         |SELECT id_a, id_b, common,
         |  CAST(common AS DOUBLE) / sz_a AS cont_a,
         |  CAST(common AS DOUBLE) / sz_b AS cont_b
         |FROM pairs
         |WHERE CAST(common AS DOUBLE) / sz_a >= 0.9
         |   OR CAST(common AS DOUBLE) / sz_b >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    "q136_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(trim(lower(text)), ' '))
        |      AS word
        |    FROM documents) GROUP BY doc_id, word
        |), df AS (
        |  SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
        |), n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.word, CAST(t.tf * n.n AS DOUBLE) / d.df
        |    AS score
        |  FROM tf t JOIN df d ON t.word = d.word, n),
        |top AS (
        |  SELECT doc_id, word FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, word) AS rn FROM scored)
        |  WHERE rn = 1)
        |SELECT word AS top_word, COUNT(*) AS n_docs
        |FROM top GROUP BY word
        |ORDER BY n_docs DESC, top_word LIMIT 20""".stripMargin,

    "q137_negative_pairs" ->
      """WITH m AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
        |cands AS (
        |  SELECT d.doc_id,
        |    (d.doc_id + j.j * (m.m // 4 + 1)) % m.m AS neg_id
        |  FROM documents d, m,
        |    (SELECT unnest(generate_series(1, 3)) AS j) j
        |  WHERE (d.doc_id + j.j * (m.m // 4 + 1)) % m.m <> d.doc_id)
        |SELECT COUNT(DISTINCT c.doc_id) AS n_docs,
        |  COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT (c.doc_id, c.neg_id)) AS n_distinct_pairs,
        |  CAST(SUM(CASE WHEN c.neg_id = c.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_self_pairs
        |FROM cands c JOIN documents e ON c.neg_id = e.doc_id""".stripMargin,

    "q116_minority_boost" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS n_orig, COUNT(DISTINCT doc_id) AS n_docs
        |  FROM documents GROUP BY lang
        |), t AS (SELECT MAX(n_orig) AS tgt FROM c)
        |SELECT lang,
        |  CAST(n_orig * LEAST((tgt + n_orig - 1) // n_orig, 4) AS BIGINT)
        |    AS n_after,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(LEAST((tgt + n_orig - 1) // n_orig, 4) AS BIGINT) AS factor
        |FROM c, t ORDER BY lang""".stripMargin
  )
}
