package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair (subword) tokenizer (VERDICT r10 next #6):
  * real training pipelines budget and bill in TOKENIZER tokens, not
  * whitespace words — a corpus mix or token-budget sample computed over
  * word counts is systematically wrong for any BPE-vocabulary model.
  *
  * The merge table is FIXED and spec-embedded (no learned state, no
  * RNG): ranked pairs in learning order, meaning every merge's two
  * parts are single characters or the outputs of strictly earlier
  * merges, and no later merge produces a string any earlier merge
  * consumes. Under that invariant (asserted in BpeSpec), applying the
  * merges one rank at a time exhaustively is EQUIVALENT to the
  * classical iterative algorithm ("repeatedly merge the lowest-ranked
  * adjacent pair present"), because a later merge can neither create
  * nor feed an earlier pair — which is exactly what makes the tokenizer
  * recomputable by the DuckDB oracle as a rank-indexed recursion.
  *
  * Within one rank, occurrences merge left-to-right, non-overlapping,
  * re-reading the just-merged token (the standard leftmost fold:
  * `l l l l` → `ll ll`). Words are lowercased maximal `[a-z]+` runs;
  * everything else is a separator.
  *
  * Reference anchor: the reference counts whatever `split(" ")` yields
  * (TwitterDStreamTrendingHashtag.java:62-66) — the word-count posture
  * this operator upgrades.
  */
object Bpe {

  /** Ranked merge table, learning order. Chosen for the fixture corpus:
    * high-frequency words assemble fully (the, scan, column, window,
    * join, query, value, spark), the rest split into genuine subword
    * pieces — both behaviors exercised on every document. */
  val merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("a", "n"),        //  1 an
    ("e", "r"),        //  2 er
    ("t", "h"),        //  3 th
    ("th", "e"),       //  4 the
    ("i", "n"),        //  5 in
    ("o", "r"),        //  6 or
    ("s", "t"),        //  7 st
    ("a", "r"),        //  8 ar
    ("l", "e"),        //  9 le
    ("r", "o"),        // 10 ro
    ("o", "w"),        // 11 ow
    ("u", "e"),        // 12 ue
    ("s", "c"),        // 13 sc
    ("sc", "an"),      // 14 scan
    ("c", "o"),        // 15 co
    ("co", "l"),       // 16 col
    ("u", "m"),        // 17 um
    ("um", "n"),       // 18 umn
    ("col", "umn"),    // 19 column
    ("w", "in"),       // 20 win
    ("win", "d"),      // 21 wind
    ("wind", "ow"),    // 22 window
    ("j", "o"),        // 23 jo
    ("jo", "in"),      // 24 join
    ("q", "u"),        // 25 qu
    ("qu", "er"),      // 26 quer
    ("quer", "y"),     // 27 query
    ("v", "a"),        // 28 va
    ("va", "l"),       // 29 val
    ("val", "ue"),     // 30 value
    ("s", "p"),        // 31 sp
    ("sp", "ar"),      // 32 spar
    ("spar", "k"))     // 33 spark

  /** The learning-order invariant the rank-exhaustive application
    * depends on: every part is a single char or an earlier output, and
    * no output collides with a part consumed at an earlier-or-equal
    * rank. Exposed so the spec can fail the build if the table is ever
    * edited into an inconsistent state. */
  def learningOrderConsistent: Boolean =
    merges.zipWithIndex.forall { case ((a, b), i) =>
      val earlier = merges.take(i).map { case (x, y) => x + y }.toSet
      Seq(a, b).forall(p => p.length == 1 || earlier.contains(p)) &&
        !merges.drop(i).map { case (x, y) => x + y }.exists(o => o == a || o == b)
    }

  /** One exhaustive leftmost-fold pass of a single merge over a word's
    * token sequence. */
  private def applyMerge(toks: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (out.nonEmpty && out.last == a && toks(i) == b) {
        out(out.length - 1) = a + b
      } else out += toks(i)
      i += 1
    }
    out.toArray
  }

  // the HuggingFace word-cache trick: the token stream repeats a small
  // working vocabulary, so per-word results memoize; bounded so an
  // adversarial corpus cannot grow driver/executor heaps
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 1 << 16

  /** BPE-encode one lowercase word. */
  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var toks = Array.tabulate(word.length)(i => word.substring(i, i + 1))
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      // cheap guard: a pair can only fire if the word still has >1 token
      if (toks.length > 1) toks = applyMerge(toks, a, b)
      m += 1
    }
    if (cache.size < CacheCap) cache.put(word, toks)
    toks
  }

  /** Tokenize a full text: lowercase, words = maximal `[a-z]+` runs,
    * each BPE-encoded, pieces concatenated in order. Static entry point
    * shared by the interpreted eval and the generated code (one
    * non-virtual call per row keeps the projection inside the
    * whole-stage codegen span). */
  def encode(text: UTF8String): GenericArrayData = {
    val s = if (text == null) "" else text.toString.toLowerCase
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var j = i + 1
        while (j < s.length && s.charAt(j) >= 'a' && s.charAt(j) <= 'z') j += 1
        val pieces = encodeWord(s.substring(i, j))
        var k = 0
        while (k < pieces.length) { out += UTF8String.fromString(pieces(k)); k += 1 }
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  val fnName = "bpe_tokens"

  def ensureRegistered(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(fnName)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[BpeTokens].getCanonicalName, fnName),
        (exprs: Seq[Expression]) => BpeTokens(exprs.head))
  }
}

/** `bpe_tokens(text)` — ARRAY<STRING> of subword tokens, as a native
  * Catalyst expression (the declared custom-UDF surface, like
  * [[ExtractHashtags]]): optimizer-visible null handling, and codegen
  * that emits one static call so token-budget projections stay inside
  * whole-stage codegen. */
case class BpeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = Bpe.fnName

  override def nullSafeEval(input: Any): Any =
    Bpe.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Bpe.encode($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
