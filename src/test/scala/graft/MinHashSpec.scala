package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{MinHash, TextFunctions}
import graft.operators.DedupQueries

/** The native MinHash expressions must reproduce the r2 declarative
  * formulation bit-for-bit: explode shingles → pmod(xxhash64(s), p) →
  * min(pmod(a_i*h + b_i, p)) per i — same base hash (xxhash64 seed 42),
  * same Carter-Wegman family (Random(42)), same Mersenne modulus. That
  * equality is the whole safety argument for swapping the aggregate
  * plan out of the hot path. */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = MinHash.MersenneP

  /** The r2 aggregate formulation, kept here as the reference semantics. */
  private def referenceSigs(docShingles: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
    val rnd = new scala.util.Random(42)
    val fam = Seq.fill(MinHash.NumHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
    val hashed = docShingles
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), pmod(xxhash64(col("s")), lit(P)).as("h"))
    val mins = fam.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(P))).as(s"m$i")
    }
    hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until MinHash.NumHashes).map(i => col(s"m$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
  }

  test("minhash_sig == r2 aggregate formulation on real documents (sf0.001)") {
    val docs = DedupQueries.wordShingleDocs(spark, "/root/testdata/sf0.001")
    val expected = referenceSigs(docs)
    val actual = DedupQueries.minhashSignatures(docs).as[(Long, Seq[Long])].collect().toMap
    assert(actual.keySet == expected.keySet)
    actual.foreach { case (id, sig) =>
      assert(sig == expected(id), s"signature mismatch for doc $id")
      assert(sig.forall(v => v >= 0 && v < P))
    }
  }

  test("minhash_char_ngrams == minhash_sig over the materialized char-5-gram shingles") {
    MinHash.ensureRegistered(spark)
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "abcdef",
      3L -> "exact", // exactly one 5-gram window
      4L -> ("x" * 200 + " repeated tail segments " + "y" * 50))
    val df = texts.toDF("doc_id", "text")
    val viaArray = df.select(col("doc_id"),
      call_function(MinHash.sigFnName,
        array_distinct(transform(sequence(lit(0), length(col("text")) - 5),
          i => col("text").substr(i + 1, lit(5))))).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaChar = df.select(col("doc_id"),
      call_function(MinHash.charFnName, col("text"), lit(5)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.foreach { case (id, _) => assert(viaChar(id) == viaArray(id), s"doc $id") }
  }

  test("minhash_char_ngrams multibyte path matches substring semantics") {
    MinHash.ensureRegistered(spark)
    // ü is 2 bytes in UTF-8 → byte windows ≠ char windows; the expression
    // must take the char-based path and agree with substr shingles
    val df = Seq(1L -> "grüße aus münchen überall", 2L -> "日本語のテキストです").toDF("doc_id", "text")
    val viaArray = df.select(col("doc_id"),
      call_function(MinHash.sigFnName,
        array_distinct(transform(sequence(lit(0), length(col("text")) - 5),
          i => col("text").substr(i + 1, lit(5))))).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaChar = df.select(col("doc_id"),
      call_function(MinHash.charFnName, col("text"), lit(5)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaChar(1L) == viaArray(1L))
    assert(viaChar(2L) == viaArray(2L))
  }

  test("simhash_fp == r2 column formulation (poly hash + ±1 bit sums), incl. multibyte") {
    graft.functions.SimHash.ensureRegistered(spark)
    val docs = Seq(
      1L -> Seq("the quick brown", "quick brown fox", "brown fox jumps"),
      2L -> Seq("grüße aus münchen", "überall gleich"),
      3L -> Seq("z")).toDF("doc_id", "sh")
    // reference: the r2 declarative pipeline kept as spec-level semantics
    val hashed = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), DedupQueries.charPolyHash(col("s")).as("h"))
    val bitSums = (0 until DedupQueries.simhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val fpCol = (0 until DedupQueries.simhashBits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val expected = hashed.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fpCol.as("fp")).as[(Long, Long)].collect().toMap
    val actual = docs.select(col("doc_id"),
      call_function(graft.functions.SimHash.fnName, col("sh")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(actual == expected)
  }

  test("char_ngram_jaccard == array_intersect/array_union formulation, incl. multibyte") {
    graft.functions.TextSim.ensureRegistered(spark)
    val pairs = Seq(
      (1L, "the quick brown fox jumps over", "the quick brown fox jumped over"),
      (2L, "grüße aus münchen überall", "grüße aus münchen anders"),
      (3L, "abcdefgh", "zyxwvuts"), // disjoint → 0.0
      (4L, "same!", "same!")) // identical single window → 1.0
    val df = pairs.toDF("id", "a", "b")
    def shOf(c: org.apache.spark.sql.Column) =
      array_distinct(transform(sequence(lit(0), length(c) - 5), i => c.substr(i + 1, lit(5))))
    val expected = df.select(col("id"),
      (size(array_intersect(shOf(col("a")), shOf(col("b")))).cast("double") /
        size(array_union(shOf(col("a")), shOf(col("b"))))).as("jac"))
      .as[(Long, Double)].collect().toMap
    val actual = df.select(col("id"),
      call_function(graft.functions.TextSim.jacFnName, col("a"), col("b"), lit(5)).as("jac"))
      .as[(Long, Double)].collect().toMap
    assert(actual == expected)
    assert(actual(3L) == 0.0 && actual(4L) == 1.0)
  }

  test("null text → null signature; zero shingles → sentinel signature") {
    MinHash.ensureRegistered(spark)
    val df = Seq((1L, null: String), (2L, "abc")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      call_function(MinHash.charFnName, col("text"), lit(5)).as("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(Seq.fill(MinHash.NumHashes)(Long.MaxValue)))
  }
}
