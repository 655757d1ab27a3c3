package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{DedupQueries, SimilarityQueries}

/** MinHash/LSH and cosine-similarity behavior on constructed inputs. */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sigs(docs: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .where(size(col("sh")) > 0)
    DedupQueries.minhashSignatures(df)
      .as[(Long, Seq[Long])].collect().toMap
  }

  test("identical texts produce identical signatures") {
    val s = sigs(Seq(1L -> "the quick brown fox jumps over the lazy dog",
                     2L -> "the quick brown fox jumps over the lazy dog"))
    assert(s(1L) == s(2L))
    assert(s(1L).size == DedupQueries.numHashes)
  }

  test("near-duplicates agree on most signature positions; disjoint texts on none") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w20", "XX") // 3 of 38 shingles changed
    val disjoint = (1 to 40).map(i => s"z$i").mkString(" ")
    val s = sigs(Seq(1L -> base, 2L -> nearDup, 3L -> disjoint))
    val agreeNear = s(1L).zip(s(2L)).count { case (a, b) => a == b }
    val agreeFar  = s(1L).zip(s(3L)).count { case (a, b) => a == b }
    assert(agreeNear > 100, s"near-dup agreement too low: $agreeNear/128")
    assert(agreeFar == 0, s"disjoint docs should share no minima, got $agreeFar")
  }

  test("exact Jaccard via array ops matches hand computation") {
    val df = Seq((1L, Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("id", "x", "y")
    val jac = df.select((size(array_intersect(col("x"), col("y"))).cast("double") /
        size(array_union(col("x"), col("y")))).as("j")).as[Double].head()
    assert(jac == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("cosine: identity 1.0, orthogonal 0.0, known angle") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 1.0), Seq(1.0, 0.0))).toDF("a", "b")
    val cos = df.select(
      (SimilarityQueries.dot(col("a"), col("b")) /
        (sqrt(SimilarityQueries.dot(col("a"), col("a"))) *
         sqrt(SimilarityQueries.dot(col("b"), col("b"))))).as("c"))
      .as[Double].collect().toSeq
    assert(cos(0) == 1.0 && cos(1) == 0.0)
    assert(math.abs(cos(2) - math.sqrt(0.5)) < 1e-12)
  }
}
