package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Scored, TopKByScore}

/** Similarity search over the `embeddings` table (SURVEY.md §2.3 Q17):
  * brute-force cosine top-k as the exact baseline, expressed so the plan
  * scales: probes are broadcast (no shuffle of the big side), scoring is
  * native array arithmetic inside codegen, and top-k per probe is a
  * bounded typed Aggregator with partial aggregation — only k rows per
  * probe per partition cross the shuffle, never all N scored candidates.
  * (The sublinear path at 100 TB is LSH/IVF bucketing — reusing the
  * banded-bucket join pattern from [[DedupQueries]] — over the same
  * scoring expressions.)
  */
object SimilarityQueries {

  /** dot(a,b) over array<double> columns — native, codegen-friendly. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Q17 — for probe vectors vec_id < 10: top-5 cosine neighbors,
    * tie-break by neighbor id, scores rounded to 6dp for cross-engine
    * hash stability. */
  def q17CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

    val probes = emb.select(
      col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pnrm"))
      .where(col("probe_id") < 10)

    val scored = emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(
        col("probe_id").as("probe"),
        col("vec_id").as("id"),
        (dot(col("v"), col("pv")) / (col("nrm") * col("pnrm"))).as("score"))

    import spark.implicits._
    val topk = new TopKByScore(5).toColumn
    scored.as[Scored]
      .groupByKey(_.probe)
      .agg(topk.name("topk"))
      .toDF("probe_id", "topk")
      .select(col("probe_id"), posexplode(col("topk")))
      .select(
        col("probe_id"),
        col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.score"), 6).as("cos_sim"))
      .orderBy("probe_id", "rank")
  }
}
