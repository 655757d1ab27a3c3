package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** O10 watermark semantics under actual lateness: a row older than the
  * advanced watermark must be dropped from an update-mode aggregation
  * (the q20 replay is in-order by construction, so it never exercises
  * the drop path — this does). */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("v", LongType)))

  test("late row beyond the watermark is dropped in update mode") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wm-in")
    val ckpt = Files.createTempDirectory("wm-ckpt").toString

    def writeChunk(name: String, order: Int, rows: Seq[(String, Long)]): Unit = {
      val p = dir.resolve(name)
      rows.toDF("ts", "v").select(col("ts").cast("timestamp"), col("v"))
        .coalesce(1).write.mode("overwrite").parquet(p.toString)
      // one file per chunk dir won't do — file source lists leaf files;
      // order the part files by modtime
      Files.list(p).iterator().forEachRemaining { f =>
        if (f.getFileName.toString.endsWith(".parquet"))
          Files.setLastModifiedTime(f, FileTime.fromMillis(1700000000000L + order * 1000L))
      }
    }
    // batch 0: one row in the 00:01 window, one far ahead at 00:20 —
    // the watermark for batch 1 becomes 00:20:00 - 10s = 00:19:50
    writeChunk("c0", 0, Seq(("2024-01-01 00:01:30", 1L), ("2024-01-01 00:20:00", 1L)))
    // batch 1: fresh row; during this batch the advanced watermark
    // evicts the 00:01 window's state
    writeChunk("c1", 1, Seq(("2024-01-01 00:21:00", 1L)))
    // batch 2: a LATE row back in the (evicted) 00:01 window
    writeChunk("c2", 2, Seq(("2024-01-01 00:01:40", 1L)))

    val sink = scala.collection.concurrent.TrieMap.empty[java.sql.Timestamp, Long]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.collect().foreach(r => sink.put(r.getTimestamp(0), r.getLong(1)))
      }.start()
    q.awaitTermination()

    // Pinned Spark semantics (observed, Spark 4.1): a late row arriving
    // in the very batch where the watermark FIRST passes it may still
    // aggregate (input filtering lags one eviction cycle); once the
    // advanced watermark has evicted the window's state, late rows for
    // it are dropped — which is what this asserts. Consequence for the
    // engine: exact stream/batch parity requires sources that respect
    // watermark order (the q20 replay chunks in event-time order).
    val w0001 = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
    assert(sink(w0001) == 1L,
      s"late row for an evicted window must be dropped; count = ${sink(w0001)}")
    assert(sink(java.sql.Timestamp.valueOf("2024-01-01 00:20:00")) == 1L)
    assert(sink(java.sql.Timestamp.valueOf("2024-01-01 00:21:00")) == 1L)
  }
}
