package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** The subword tokenizer's contract: the spec-embedded merge table is
  * learning-order consistent (the invariant that makes rank-exhaustive
  * application equal classical iterative BPE), the two algorithms agree
  * on the real corpus vocabulary, and the native expression matches the
  * driver-side encoder through codegen. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference implementation: CLASSICAL iterative BPE — repeatedly
    * find the lowest-ranked merge whose pair occurs adjacently, merge
    * all its occurrences leftmost non-overlapping, repeat to fixpoint.
    * Deliberately a different algorithm from Bpe.encodeWord's
    * rank-exhaustive pass. */
  private def iterativeBpe(word: String): Seq[String] = {
    var toks: Vector[String] = word.map(_.toString).toVector
    val ranked = Bpe.merges.zipWithIndex
    var done = false
    while (!done) {
      val present = ranked.filter { case ((a, b), _) =>
        toks.zip(toks.drop(1)).contains((a, b))
      }
      if (present.isEmpty) done = true
      else {
        val ((a, b), _) = present.minBy(_._2)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (t <- toks) {
          if (out.nonEmpty && out.last == a && t == b) out(out.length - 1) = a + b
          else out += t
        }
        toks = out.toVector
      }
    }
    toks
  }

  test("merge table is learning-order consistent") {
    assert(Bpe.learningOrderConsistent,
      "every merge's parts must be single chars or earlier outputs, " +
        "and no later output may collide with an earlier part")
  }

  test("known encodings: vocabulary words assemble, others split into real pieces") {
    assert(Bpe.encodeWord("the").toSeq == Seq("the"))
    assert(Bpe.encodeWord("scan").toSeq == Seq("scan"))
    assert(Bpe.encodeWord("column").toSeq == Seq("column"))
    assert(Bpe.encodeWord("window").toSeq == Seq("window"))
    assert(Bpe.encodeWord("spark").toSeq == Seq("spark"))
    assert(Bpe.encodeWord("merge").toSeq == Seq("m", "er", "g", "e"))
    assert(Bpe.encodeWord("sort").toSeq == Seq("s", "or", "t"))
    assert(Bpe.encodeWord("a").toSeq == Seq("a"))
    // leftmost non-overlapping within a rank
    assert(Bpe.encodeWord("ananan").toSeq == Seq("an", "an", "an"))
  }

  test("rank-exhaustive application equals classical iterative BPE on the corpus vocabulary") {
    import spark.implicits._
    val vocab = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect()
    assert(vocab.nonEmpty)
    for (w <- vocab ++ Seq("thethe", "valueless", "scanscan", "windowing", "queryquery"))
      assert(Bpe.encodeWord(w).toSeq == iterativeBpe(w),
        s"algorithms diverge on '$w'")
  }

  test("native expression matches the driver-side encoder (codegen path), splits on non-letters") {
    import spark.implicits._
    Bpe.ensureRegistered(spark)
    val rows = Seq((1L, "The QUERY: sort, merge!"), (2L, ""), (3L, "spark123spark"))
      .toDF("id", "text")
      .select(col("id"), call_function(Bpe.fnName, col("text")).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    assert(rows(1L) == Seq("the", "query", "s", "or", "t", "m", "er", "g", "e"))
    assert(rows(2L) == Seq.empty)
    assert(rows(3L) == Seq("spark", "spark"))
  }

  test("q18r: BPE billing differs from word billing, sampling stays deterministic and monotone") {
    val df = graft.operators.TextQueries
      .q18rBpeBudgetSample(spark, "/root/testdata/sf0.001").collect()
    assert(df.length == 500)
    val again = graft.operators.TextQueries
      .q18rBpeBudgetSample(spark, "/root/testdata/sf0.001").collect()
    assert(df.toSeq == again.toSeq, "resampling must be reproducible")
    // subword billing is strictly coarser than word billing on this
    // corpus (non-vocab words split into >1 piece)
    val words = graft.operators.TextQueries
      .q18nTokenBudgetSample(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getLong(r.fieldIndex("n_tokens"))).toMap
    assert(df.forall(r =>
      r.getLong(r.fieldIndex("n_tokens")) > words(r.getLong(r.fieldIndex("doc_id")))),
      "every doc must bill more subword tokens than words")
    // every slice samples its first doc; the budget actually cuts somewhere
    def sampled(r: org.apache.spark.sql.Row) = r.getLong(r.fieldIndex("sampled"))
    val bySlice = df.groupBy(r => (r.getString(0), r.getString(1)))
    assert(bySlice.values.forall(_.exists(sampled(_) == 1L)),
      "every (source, lang) slice must sample at least one doc")
    assert(df.exists(sampled(_) == 0L),
      "the 400-token budget must cut at least one doc (else the knob is dead)")
  }
}
