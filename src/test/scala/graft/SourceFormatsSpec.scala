package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Source-format coverage beyond parquet: the same relation read back
  * from CSV and JSON-lines with explicit schemas must match. */
class SourceFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csv and json round-trip the nation table exactly") {
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val base = Files.createTempDirectory("fmt")
    nation.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$base/csv")
    nation.coalesce(1).write.mode("overwrite").json(s"$base/json")

    val fromCsv = spark.read.schema(nation.schema)
      .option("header", "true").csv(s"$base/csv")
    val fromJson = spark.read.schema(nation.schema).json(s"$base/json")

    val want = nation.orderBy("n_nationkey").collect().toSeq
    assert(fromCsv.orderBy("n_nationkey").collect().toSeq == want)
    assert(fromJson.orderBy("n_nationkey").collect().toSeq == want)
    assert(fromCsv.schema == nation.schema && fromJson.schema == nation.schema)
  }

  test("malformed json lines follow the permissive corrupt-record policy") {
    import spark.implicits._
    val base = Files.createTempDirectory("fmt2")
    Files.write(base.resolve("data.json"),
      Seq("""{"a": 1, "b": "x"}""", """{broken""", """{"a": 2, "b": "y"}""")
        .mkString("\n").getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType)))
    val good = spark.read.schema(schema).json(base.toString)
      .where(col("a").isNotNull).as[(Long, String)].collect().toSet
    assert(good == Set((1L, "x"), (2L, "y")))
  }
}
