package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Event-time window semantics the engine pins down (SURVEY §5.2):
  * boundary inclusivity [start, end), sliding-window membership, and
  * the deterministic argmax tie-break replacing the reference's
  * HashMap-iteration-order nondeterminism (S:187-196). */
class WindowSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window boundary is [start, end): boundary event opens the next window") {
    val df = Seq(
      ts("2024-01-01 00:00:59.999"), // last instant of window 0
      ts("2024-01-01 00:01:00.000")  // first instant of window 1
    ).toDF("ts")
    val out = df.groupBy(window(col("ts"), "1 minute"))
      .count()
      .select(col("window.start").cast("string"), col("count"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("2024-01-01 00:00:00" -> 1L, "2024-01-01 00:01:00" -> 1L))
  }

  test("sliding window: event belongs to window/slide overlapping windows") {
    val df = Seq(ts("2024-01-01 00:04:30")).toDF("ts")
    val starts = df.groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .count().select(col("window.start").cast("string"))
      .as[String].collect().toSeq.sorted
    assert(starts == Seq(
      "2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00",
      "2024-01-01 00:03:00", "2024-01-01 00:04:00"))
  }

  test("windowed top-1 tie-break: highest count, then lexicographically smallest key") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (ts("2024-01-01 00:00:10"), "zebra"),
      (ts("2024-01-01 00:00:20"), "apple"),
      (ts("2024-01-01 00:00:30"), "mango")).toDF("ts", "tag")
    val counts = df.groupBy(window(col("ts"), "1 minute").as("w"), col("tag"))
      .agg(count(lit(1)).as("cnt"))
    val rankW = Window.partitionBy("w").orderBy(col("cnt").desc, col("tag").asc)
    val top = counts.withColumn("rn", row_number().over(rankW))
      .where(col("rn") === 1).select("tag").as[String].collect().toSeq
    assert(top == Seq("apple")) // all tied at 1 → lexicographic
  }

  test("sessionize: strict gap cut — exactly-gap stays in session, per-user ids independent") {
    val gap = 3600L // 1 h
    val df = Seq(
      // user 1: 00:00, +1h exactly (stays — strict >), +1h+1s later (breaks)
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 01:00:00"), 2.0),
      (1L, 3L, ts("2024-01-01 02:00:01"), 4.0),
      // user 2: single event — its own session 0, untouched by user 1's cuts
      (2L, 4L, ts("2024-01-01 05:00:00"), 8.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = graft.operators.WindowQueries.sessionize(df, gap)
      .select("user_id", "session_id", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 0L, 2L, 3.0), // events 1+2 merge across the exactly-1h gap
      (1L, 1L, 1L, 4.0), // event 3 opens session 1
      (2L, 0L, 1L, 8.0)))
  }

  test("sessionize matches an independent reference implementation on seeded random inputs") {
    // randomized differential check (fixed seed — deterministic in CI):
    // the reference is a direct per-user scan, no Spark machinery shared
    val rnd = new scala.util.Random(42)
    val gapSec = 600L
    for (trial <- 1 to 5) {
      val events = (1 to 60).map { i =>
        (1L + rnd.nextInt(3),                     // user
         i.toLong,                                // unique event id
         rnd.nextLong(86400L) * 1000000L,         // second-aligned micros in one day
         rnd.nextInt(10000) / 100.0)              // 2dp value: decimal(18,4) cast is exact
      }
      val reference: Set[(Long, Long, Long, Long, Long, Double)] =
        events.groupBy(_._1).flatMap { case (u, es) =>
          val sorted = es.sortBy(e => (e._3, e._2))
          var sid = -1L; var prev = Long.MinValue
          val assigned = sorted.map { e =>
            if (prev == Long.MinValue || e._3 - prev > gapSec * 1000000L) sid += 1
            prev = e._3
            (sid, e)
          }
          assigned.groupBy(_._1).map { case (s, grp) =>
            val ts = grp.map(_._2._3)
            (u, s, ts.min, ts.max, grp.size.toLong,
             grp.map(g => BigDecimal(g._2._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
               .sum.toDouble)
          }
        }.toSet
      val df = events.toDF("user_id", "event_id", "us", "value")
        .select(col("user_id"), col("event_id"),
                timestamp_micros(col("us")).as("ts"), col("value"))
      val engine = graft.operators.WindowQueries.sessionize(df, gapSec)
        .select(col("user_id"), col("session_id"),
                unix_micros(col("session_start")).as("s0"),
                unix_micros(col("session_end")).as("s1"),
                col("n_events"), col("sum_value"))
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(engine == reference, s"trial $trial diverged")
    }
  }

  test("gap-fill: an observed hour with all-NULL values forward-fills and flags is_gap") {
    // hour 00 observed (avg 2.0), hour 01 missing, hour 02 observed but
    // every value NULL, hour 03 observed (avg 5.0). The all-NULL hour
    // must carry 2.0 forward and flag is_gap=1 — the oracle's
    // last_value(IGNORE NULLS) + `avg_v IS NULL` semantics (ADVICE r6 #1)
    val df = Seq(
      ("click", ts("2024-01-01 00:10:00"), Some(2.0)),
      ("click", ts("2024-01-01 02:15:00"), None),
      ("click", ts("2024-01-01 02:45:00"), None),
      ("click", ts("2024-01-01 03:05:00"), Some(5.0))
    ).toDF("event_type", "ts", "value")
    val out = graft.operators.WindowQueries.gapFill(df)
      .orderBy("hour")
      .select(hour(col("hour")), col("n_events"), col("filled_avg"), col("is_gap"))
      .as[(Int, Long, Option[Double], Long)].collect().toSeq
    assert(out == Seq(
      (0, 1L, Some(2.0), 0L),  // observed
      (1, 0L, Some(2.0), 1L),  // synthesized gap
      (2, 2L, Some(2.0), 1L),  // observed but all-NULL: carried + flagged
      (3, 1L, Some(5.0), 0L))) // observed
  }

  test("interpolate: gap hours draw the line between anchors; all-NULL hours are gaps; tail keeps its anchor") {
    // anchors at hour 00 (10.0) and hour 03 (16.0): hours 01/02
    // interpolate to 12.0/14.0. Hour 01 is OBSERVED but all-NULL — it
    // must interpolate like a missing hour, not anchor at NULL. Hour 05
    // (22.0) is the last anchor: no successor, stays itself, and hour
    // 04 interpolates on the 03→05 segment (19.0).
    val df = Seq(
      ("click", ts("2024-01-01 00:10:00"), Some(10.0)),
      ("click", ts("2024-01-01 01:15:00"), None),
      ("click", ts("2024-01-01 03:05:00"), Some(16.0)),
      ("click", ts("2024-01-01 05:30:00"), Some(22.0))
    ).toDF("event_type", "ts", "value")
    val out = graft.operators.WindowQueries.interpolate(df)
      .orderBy("hour")
      .select(hour(col("hour")), col("interp_avg"), col("is_interp"))
      .as[(Int, Double, Long)].collect().toSeq
    assert(out == Seq(
      (0, 10.0, 0L),
      (1, 12.0, 1L),
      (2, 14.0, 1L),
      (3, 16.0, 0L),
      (4, 19.0, 1L),
      (5, 22.0, 0L)))
  }
}
