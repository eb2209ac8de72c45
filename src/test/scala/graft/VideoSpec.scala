package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Video near-dup (VideoQueries / Multimodal.aviFrameHashes): the planted
  * even/odd clip pairs must be recovered exactly, and the per-frame aHash
  * must survive the LOSSY JPEG round trip bit-for-bit (the fixture's 8x8
  * block construction exists precisely to make that provable). */
class VideoSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sfDir

  test("q260 recovers every planted clip pair with the analytic overlap") {
    val rows = SparkEntry.queries("q260_video_neardup")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs / 2, "one pair per even/odd doc couple")
    rows.foreach { r =>
      val (a, b, nfA, nfB, shared, overlap) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      assert(b == a + 1 && a % 2 == 0, s"unexpected pair ($a, $b)")
      val nf = 4 + (a / 2) % 4
      assert(nfA == nf && nfB == nf)
      assert(shared == nf - 1,
        s"pair ($a, $b) must share all frames but the re-shot one")
      assert(overlap == 1000 * (nf - 1) / nf)
    }
  }

  test("q265 recovers every planted audio pair with the analytic overlap") {
    val rows = SparkEntry.queries("q265_audio_neardup")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs / 2, "one pair per even/odd doc couple")
    rows.foreach { r =>
      val (a, b, nwA, nwB, shared, overlap) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      assert(b == a + 1 && a % 2 == 0, s"unexpected pair ($a, $b)")
      val nw = 4 + (a / 2) % 4
      assert(nwA == nw && nwB == nw)
      assert(shared == nw - 1,
        s"pair ($a, $b) must share all windows but the re-recorded one")
      assert(overlap == 1000 * (nw - 1) / nw)
    }
  }

  test("q262 streaming decomposition equals the q260 batch result exactly") {
    val batch = SparkEntry.queries("q260_video_neardup")(spark, sf)
      .collect().map(_.toSeq)
    val stream = SparkEntry.queries("q262_stream_video_neardup")(spark, sf)
      .collect().map(_.toSeq)
    assert(batch.nonEmpty)
    assert(stream.toSeq == batch.toSeq,
      "per-trigger pair union must equal the one-shot batch pairs " +
        "row-for-row")
  }

  test("frame aHash survives the lossy JPEG round trip bit-for-bit") {
    // the fixture encodes framePattern(gid, key) as 8x8 blocks; decoding
    // + thresholding must recover EXACTLY those 64 bits despite JPEG
    // quantization — the analytic foundation of the q260 oracle
    val fix = operators.VideoQueries.aviDupFixture(spark, sf)
    val got = graft.multimodal.Multimodal
      .aviFrameHashes(spark.read.parquet(fix))
      .where(col("doc_id") < 16)
      .select(col("doc_id"), col("frame_idx"), col("ahash"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    got.foreach { case ((id, f), h) =>
      val key = if (id % 2 == 1 && f == 0) 64L else f.toLong
      val want = operators.VideoQueries.framePattern(id / 2, key)
      assert(h == want,
        f"doc $id frame $f: ahash $h%016x != planted pattern $want%016x")
    }
  }

  test("q293 finds exactly the planted clip-contains-image matches") {
    val got = SparkEntry.queries("q293_clip_image_match")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // image d (d % 5 = 0) renders frame 1 of group d/2; both twin clips
    // of the group carry frame 1, so the truth is analytic
    val expected = (for {
      d <- ids.toSeq.sorted if d % 5 == 0
      c <- Seq(2 * (d / 2), 2 * (d / 2) + 1) if ids.contains(c)
    } yield (d, c)).sorted
    assert(got.sorted == expected)
    // exclusivity: no unplanted still (disjoint pattern key space)
    // matched any frame, and every planted one matched its two twins
    assert(got.map(_._1).forall(_ % 5 == 0))
    val perImage = got.groupBy(_._1).view.mapValues(_.size)
    assert(perImage.values.forall(_ == 2),
      s"every planted image must match exactly its twin clips: " +
        s"${perImage.filter(_._2 != 2)}")
  }

  test("q304 recovers exactly the planted shot-cut schedule, two cuts " +
      "per clip, none inside a shot") {
    val ids = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val want = ids.flatMap(id =>
      Seq((id, 3 + id % 2), (id, 6 + id % 3))).sorted.toSeq
    val got = SparkEntry.queries("q304_shot_boundaries")(
        spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    got.groupBy(_._1).foreach { case (id, cuts) =>
      assert(cuts.length === 2, s"clip $id: ${cuts.length} cuts")
    }
  }

  test("q305 picks exactly one md5-min keyframe per planted shot") {
    val ids = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = ids.flatMap { id =>
      val nf = (9 + id % 4).toInt
      val (c1, c2) = (3 + id % 2, 6 + id % 3)
      (0 until nf)
        .map(f => (f, (if (f >= c1) 1L else 0L) + (if (f >= c2) 1L else 0L)))
        .groupBy(_._2).map { case (shot, fs) =>
          (id, shot, fs.map(_._1)
            .minBy(f => (md5hex(s"kf:$id:$f"), f)).toLong)
        }
    }.toSeq.sorted
    val got = SparkEntry.queries("q305_keyframe_sample")(
        spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === want)
    // exactly three shots per clip (two planted cuts)
    got.groupBy(_._1).foreach { case (id, ss) =>
      assert(ss.map(_._2).sorted === Seq(0L, 1L, 2L), s"clip $id: $ss")
    }
  }

  test("q306 recovers exactly the planted audio-segment schedule") {
    val ids = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val want = ids.flatMap(id =>
      Seq((id, 3 + id % 2), (id, 6 + id % 3))).sorted.toSeq
    val got = SparkEntry.queries("q306_audio_segments")(
        spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }
}
