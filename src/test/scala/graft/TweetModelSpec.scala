package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Tweet

/** O4 ingestion semantics: declared projection over open JSON, corrupt
  * records dropped (the permissive DStream-path resolution of the
  * reference's divergence — TwitterDStreamTrendingHashtag.java:228-232
  * swallows vs TwitterDatasetTrendingHashtag.java:389-396 throws). */
class TweetModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(lines: String*) =
    Tweet.fromJsonLines(lines.toDF("value")).as[Tweet].collect().toSeq

  test("valid record: createdAt renamed to timestamp, unknown fields dropped") {
    val out = parse(
      """{"text":"hello #spark","createdAt":"2024-01-01T00:00:01Z","lang":"en","favorited":false,"id":123}""")
    assert(out.size == 1)
    assert(out.head.text == "hello #spark")
    assert(out.head.lang == "en")
    assert(out.head.timestamp == java.sql.Timestamp.valueOf("2024-01-01 00:00:01"))
  }

  test("corrupt JSON is dropped, not thrown") {
    val out = parse("""not json at all""", """{"text":"ok","createdAt":"2024-01-01T00:00:01Z","lang":"en"}""")
    assert(out.map(_.text) == Seq("ok"))
  }

  test("raw Twitter-shaped payload (snake_case created_at): kept, null timestamp") {
    // The embedded sample at Tweet.java:65 uses created_at — the wire
    // contract expects the producer's camelCase createdAt; raw payloads
    // parse with text/lang populated and a null event time (SURVEY §1.2).
    val out = parse("""{"text":"raw","created_at":"Thu Apr 06 15:24:15 +0000 2017","lang":"en"}""")
    assert(out.size == 1)
    assert(out.head.timestamp == null)
  }

  test("missing text is dropped (no analyzable record)") {
    assert(parse("""{"lang":"en","createdAt":"2024-01-01T00:00:01Z"}""").isEmpty)
  }
}
