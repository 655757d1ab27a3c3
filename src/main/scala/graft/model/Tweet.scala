package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's record model (Tweet.java:11-51): a declared projection
  * over an open JSON document — `text`, `createdAt` (renamed to
  * `timestamp`), `lang`; unknown fields dropped
  * (@JsonIgnoreProperties(ignoreUnknown=true), Tweet.java:10).
  */
case class Tweet(text: String, timestamp: java.sql.Timestamp, lang: String)

object Tweet {

  /** Wire schema: what the upstream producer emits (camelCase
    * `createdAt`, per the @JsonProperty rename at Tweet.java:17). */
  val wireSchema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("createdAt", TimestampType),
    StructField("lang", StringType)))

  /** O4 — JSON deserialization as a native expression. Resolves the
    * reference's corrupt-record divergence (DStream path swallows to
    * null, TwitterDStreamTrendingHashtag.java:228-232; Dataset path
    * throws, TwitterDatasetTrendingHashtag.java:389-396) toward the
    * permissive path: `from_json` yields null on corrupt input, which is
    * then filtered. Never a typed lambda — pruning, pushdown and codegen
    * all survive. */
  def parse(json: Column): Column = from_json(json, wireSchema)

  /** Parse a DataFrame with a `value` JSON string column into tweet
    * columns (text, timestamp, lang), dropping corrupt records. */
  def fromJsonLines(df: DataFrame): DataFrame =
    df.select(parse(col("value")).as("t"))
      .where(col("t").isNotNull && col("t.text").isNotNull)
      .select(
        col("t.text").as("text"),
        col("t.createdAt").as("timestamp"),
        col("t.lang").as("lang"))
}
