package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** The pure-SQL lifecycle (SURVEY §3.4): registered catalog views +
  * `spark.sql` strings must produce the same results as the DataFrame
  * DSL — including the engine's custom SQL function. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("spark.sql over registered views equals the DataFrame plan") {
    Tables.registerAll(spark, dir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect().toSeq
    val viaDsl = {
      import org.apache.spark.sql.functions._
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    }
    assert(viaSql == viaDsl)
  }

  test("custom hashtags() function composes inside SQL pipelines") {
    import spark.implicits._
    graft.functions.ExtractHashtags.ensureRegistered(spark)
    Tables.registerAll(spark, dir)
    val out = spark.sql(
      """SELECT tag, COUNT(*) AS cnt
        |FROM (SELECT explode(hashtags(concat('#', event_type))) AS tag FROM events)
        |GROUP BY tag ORDER BY cnt DESC, tag""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._1.startsWith("#")))
    assert(out.map(_._2).sum == 1000L) // every event contributes exactly one tag
  }
}
