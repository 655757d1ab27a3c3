package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** As-of join edge semantics on constructed inputs: inclusive bound,
  * left rows with no match, tie resolution, and plan shape (one keyed
  * window, no range-join explosion). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of picks the latest right at-or-before each left, null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:10"), 100L), // after r1 → r1
      (1L, ts("2024-01-01 00:00:30"), 101L), // equal to r2 → r2 (inclusive)
      (1L, ts("2024-01-01 00:00:05"), 102L), // before any right → null
      (2L, ts("2024-01-01 00:01:00"), 103L)  // key with no rights → null
    ).toDF("key", "ts", "left_id")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:08"), 7L),
      (1L, ts("2024-01-01 00:00:30"), 9L)
    ).toDF("key", "ts", "right_val")
    val got = AsofJoin.asof(left, right)
      .select("left_id", "asof_val")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(100L -> Some(7L), 101L -> Some(9L), 102L -> None, 103L -> None))
  }

  test("later rights never leak backward; progression follows event time") {
    val left = (0 until 6).map(i => (1L, ts(f"2024-01-01 00:0$i:30"), 200L + i)).toDF("key", "ts", "left_id")
    val right = (0 until 6).map(i => (1L, ts(f"2024-01-01 00:0$i:00"), 10L + i)).toDF("key", "ts", "right_val")
    val got = AsofJoin.asof(left, right)
      .select("left_id", "asof_val").as[(Long, Long)].collect().toMap
    assert(got == (0 until 6).map(i => (200L + i) -> (10L + i)).toMap)
  }

  test("tolerant as-of: in-horizon matches join, stale matches NULL out, pick never differs from plain as-of") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 300L), // right 1h old → within 2h tolerance
      (1L, ts("2024-01-01 13:00:00"), 301L), // same right now 4h old → stale, NULL
      (2L, ts("2024-01-01 10:00:00"), 302L)  // no right at all → NULL
    ).toDF("key", "ts", "left_id")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 7L)).toDF("key", "ts", "right_val")
    val got = AsofJoin.asofTolerant(left, right, toleranceSec = 2 * 3600)
      .select("left_id", "asof_val").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(300L -> Some(7L), 301L -> None, 302L -> None))
    // admissibility is the ONLY difference: wherever tolerant is
    // non-null it equals the plain as-of pick
    val plain = AsofJoin.asof(left, right)
      .select("left_id", "asof_val").as[(Long, Option[Long])].collect().toMap
    got.foreach { case (id, v) => if (v.isDefined) assert(v == plain(id)) }
  }

  test("q22 plan: no cartesian or nested-loop range join — one keyed window") {
    val df = AsofJoin.q22AsofJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a range-explosion join")
    assert(p.contains("Window"), "as-of lowers to the union-tag keyed window")
  }

  test("stratified sample: bounded aggregator matches the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.TextQueries
      .q18hStratifiedSample(spark, "/root/testdata/sf0.001")
    // independent formulation: row_number window over the same ordering
    val w = Window.partitionBy("lang").orderBy(col("fp"), col("doc_id"))
    val want = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("lang"),
        graft.functions.TextFunctions.fingerprint(
          graft.functions.TextFunctions.tokens(col("text"))).as("fp"),
        col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 20)
      .select("lang", "rk", "doc_id", "fp")
      .orderBy("lang", "rk")
    assert(got.collect().toSeq == want.collect().toSeq)
    // partial aggregation: the ObjectHashAggregate pair means only k
    // rows per stratum per partition cross the shuffle
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
  }
}
