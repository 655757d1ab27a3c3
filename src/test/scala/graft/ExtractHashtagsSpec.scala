package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.functions.ExtractHashtags

/** The custom Catalyst expression must be indistinguishable from the
  * regex composition `regexp_extract_all(text, '#\w+', 0)` — checked on
  * targeted edges and on seeded random strings over a hashtag-dense
  * alphabet. */
class ExtractHashtagsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def both(texts: Seq[String]): Seq[(Seq[String], Seq[String])] = {
    ExtractHashtags.ensureRegistered(spark)
    texts.toDF("text").select(
      call_function("hashtags", col("text")).as("native"),
      regexp_extract_all(col("text"), lit("#\\w+"), lit(0)).as("regex"))
      .as[(Seq[String], Seq[String])].collect().toSeq
  }

  test("edge cases match the regex composition") {
    val cases = Seq(
      "", "#", "##", "###a", "#a#b", "a#b", "#tag_1, #x-y #42",
      "trailing #", "#ok", "#a #b #c", "no tags", "#_", "#über #ascii",
      "x##y#z", "#1#2#3")
    both(cases).zip(cases).foreach { case ((n, r), c) =>
      assert(n == r, s"mismatch on '$c'")
    }
  }

  test("seeded random strings: native == regex (500 trials)") {
    val alphabet = "ab#_ 1.#"
    val rnd = new Random(42)
    val texts = Seq.fill(500)(
      (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    both(texts).zip(texts).foreach { case ((n, r), t) =>
      assert(n == r, s"mismatch on '$t'")
    }
  }

  test("SQL surface: hashtags() resolves through the session extension") {
    val out = spark.sql("SELECT hashtags('go #spark #scala') AS h")
      .as[Seq[String]].head()
    assert(out == Seq("#spark", "#scala"))
  }
}
