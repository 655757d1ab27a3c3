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
