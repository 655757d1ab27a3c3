package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalQueries
import graft.operators.MultimodalQueries.{MediaFeatures, MediaRecord}

/** The multimodal plumbing contract: deterministic stub decode, batched
  * per-partition execution, resize/frame-sample invariants. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decode is deterministic and total on empty/binary input") {
    val a = MultimodalQueries.fakeDecode(MediaRecord(1L, Array[Byte](7, 8, 9), 3))
    val b = MultimodalQueries.fakeDecode(MediaRecord(1L, Array[Byte](7, 8, 9), 3))
    assert(a == b || (a.doc_id == b.doc_id && a.width == b.width &&
      a.height == b.height && a.n_frames == b.n_frames && a.feature.sameElements(b.feature)))
    val empty = MultimodalQueries.fakeDecode(MediaRecord(2L, Array.emptyByteArray, 0))
    assert(empty.width >= 64 && empty.height >= 64 && empty.n_frames >= 1)
  }

  test("resize: fits within bounds, never upscales, keeps aspect direction") {
    val f = MediaFeatures(1L, 120, 80, 4, Array.empty)
    val r = MultimodalQueries.resize(f, 60, 60)
    assert(r.width <= 60 && r.height <= 60)
    assert(r.width == 60 && r.height == 40) // scale = 0.5
    val small = MultimodalQueries.resize(MediaFeatures(2L, 30, 20, 1, Array.empty), 60, 60)
    assert(small.width == 30 && small.height == 20) // no upscale
  }

  test("frame sampling: every k-th frame, bounded by frame count") {
    val f = MediaFeatures(1L, 64, 64, 7, Array.empty)
    assert(MultimodalQueries.sampleFrames(f, 3) == Seq(0, 3, 6))
    assert(MultimodalQueries.sampleFrames(f, 1) == (0 until 7))
  }

  test("batched pipeline over real documents (distributed path)") {
    import spark.implicits._
    val feats = MultimodalQueries.extractFeatures(
      MultimodalQueries.mediaTable(spark, "/root/testdata/sf0.001"))
    val out = MultimodalQueries.resizeAndSample(feats, 96, 96, 2).collect()
    assert(out.length == 500)
    assert(out.forall { case (_, w, h, frames) => w <= 96 && h <= 96 && frames.nonEmpty })
  }

  test("ppm codec: encode→decode recovers exact dimensions and closed-form channel means") {
    for (id <- Seq(0L, 1L, 17L, 63L, 64L, 499L)) {
      val (w, h, a) = ((8 + id % 9).toInt, (8 + id % 25).toInt, (id % 64).toInt)
      val Some((dw, dh, mr, mg, mb)) = MultimodalQueries.ppmDecode(MultimodalQueries.ppmEncode(id))
      assert((dw, dh) == (w, h), s"doc $id dims")
      val base = a + (h - 1) + (w - 1) / 2.0
      assert(mr == base && mg == base + 48 && mb == base + 96,
        s"doc $id means ($mr,$mg,$mb) vs closed form $base")
    }
  }

  test("ppm parser: tolerates netpbm comments/whitespace; rejects malformed payloads without throwing") {
    // a hand-written P6 with a header comment and mixed whitespace —
    // 2×1 image, pixels (10,20,30) and (40,50,60)
    val handWritten = ("P6 # a netpbm comment\n 2\t1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    assert(MultimodalQueries.ppmDecode(handWritten) == Some((2, 1, 25.0, 35.0, 45.0)))
    val good = MultimodalQueries.ppmEncode(7L)
    // wrong magic
    assert(MultimodalQueries.ppmDecode("P5".getBytes ++ good.drop(2)).isEmpty)
    // truncated raster
    assert(MultimodalQueries.ppmDecode(good.dropRight(1)).isEmpty)
    // header garbage
    assert(MultimodalQueries.ppmDecode("P6\nxx yy\n255\n".getBytes).isEmpty)
    // absurd dims must not allocate/sum past the buffer
    assert(MultimodalQueries.ppmDecode("P6\n70000 70000\n255\n ".getBytes).isEmpty)
    assert(MultimodalQueries.ppmDecode(Array.emptyByteArray).isEmpty)
  }

  test("q19c: corrupt payloads DROP (permissive decode); intact ones all decode") {
    import spark.implicits._
    // mediaPpm with injected corruption on doc_id % 50 == 0: decode
    // must drop exactly those rows and keep the rest
    val media = MultimodalQueries.mediaPpm(spark, "/root/testdata/sf0.001")
      .map { r =>
        if (r.doc_id % 50 == 0) r.copy(media = r.media.take(5)) else r
      }
    val decoded = media.mapPartitions(_.flatMap { r =>
      MultimodalQueries.ppmDecode(r.media).map(d => (r.doc_id, d._1))
    }).collect().map(_._1).toSet
    assert(decoded.size == 500 - 10, s"expected 490 survivors, got ${decoded.size}")
    assert(decoded.forall(_ % 50 != 0))
    // and the declared query decodes the full intact corpus
    assert(MultimodalQueries.q19cFeatures(spark, "/root/testdata/sf0.001").count() == 500)
  }

  test("q19d: one row per sampled frame, stride-2 indices, resized dims within bounds") {
    import org.apache.spark.sql.functions._
    val df = MultimodalQueries.q19dFrameSample(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(3) % 2 == 0), "frame indices must step by 2")
    assert(rows.forall(r => r.getInt(1) <= 96 && r.getInt(2) <= 96))
    // every doc appears (nf >= 1 always samples frame 0)
    assert(df.select("doc_id").distinct().count() == 500)
  }
}
