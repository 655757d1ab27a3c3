package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signatures as native Catalyst expressions.
  *
  * The declarative formulation (explode shingles → 128 `min()` aggregate
  * columns, DedupQueries r2) is algebraically right but pays per-row
  * per-aggregate update overhead × numHashes over millions of exploded
  * shingle rows, plus a full shuffle of (doc_id, hash) pairs — measured
  * as the dominant bench cost (q16d 9.5–77 s at sf0.1 depending on
  * memory pressure). A typed Aggregator is worse still (ObjectHashAggregate
  * falls back to sort-based; measured 5×). This expression computes all
  * 128 minima in one tight loop per document: no explode, no aggregate,
  * no shuffle — the signature stage becomes a pure map, embarrassingly
  * parallel at any scale.
  *
  * Hash scheme (identical values to the r2 aggregate formulation, so
  * signatures are regression-comparable): base = xxhash64(shingle, seed
  * 42) mod p, then the fixed-seed Carter-Wegman family
  * g_i(h) = (a_i·h + b_i) mod p over the Mersenne prime p = 2^31-1.
  * The Mersenne modulus reduces with two shift-add folds instead of a
  * 64-bit division — the loop is ~6 simple ALU ops per (shingle, i).
  *
  * Zero-shingle inputs yield the all-sentinel signature (Long.MaxValue);
  * callers pre-filter empties (≥1 shingle ⟺ the filters q16b/q16d
  * already carry). Duplicate shingles are harmless: min is idempotent,
  * so no `array_distinct` is needed on the signature path.
  */
object MinHash {
  val NumHashes = 128
  val MersenneP = 2147483647L // 2^31 - 1
  private val Seed = 42L // xxhash64's default Column-function seed

  /** Same fixed-seed family as the r2 hashFamily (Random(42), draw order
    * a then b per function) — keeps signature values bit-identical. */
  val (coefA, coefB) = {
    val rnd = new scala.util.Random(42)
    val a = new Array[Long](NumHashes)
    val b = new Array[Long](NumHashes)
    var i = 0
    while (i < NumHashes) {
      a(i) = 1L + rnd.nextInt(Int.MaxValue - 1).toLong
      b(i) = rnd.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }

  /** x mod (2^31-1) for 0 ≤ x < 2^62+2^31: 2^31 ≡ 1 (mod p), so folding
    * the high bits onto the low bits preserves the residue. */
  @inline private def fold31(x: Long): Long = {
    var y = (x >>> 31) + (x & MersenneP)
    y = (y >>> 31) + (y & MersenneP)
    if (y >= MersenneP) y - MersenneP else y
  }

  /** Fold one shingle's raw 64-bit hash into the 128 running minima. */
  def updateMins(mins: Array[Long], hRaw: Long): Unit = {
    var h = hRaw % MersenneP
    if (h < 0) h += MersenneP
    val a = coefA
    val b = coefB
    var i = 0
    while (i < NumHashes) {
      val y = fold31(a(i) * h + b(i))
      if (y < mins(i)) mins(i) = y
      i += 1
    }
  }

  /** Signature of a shingle set given as array<string>. */
  def sigFromArray(arr: ArrayData): ArrayData = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        updateMins(mins, XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed))
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Signature over all character n-grams of `text` (the q16d shingle
    * universe: substr(i+1, n) for i in 0..numChars-n — identical windows
    * to `transform(sequence(0, length-n), i -> substr(i+1, n))`). For
    * all-ASCII strings char windows are byte windows: hashed in place,
    * zero allocation. */
  def sigFromCharNgrams(text: UTF8String, n: Int): ArrayData = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val nb = text.numBytes
    val nc = text.numChars
    if (nc == nb) {
      val base = text.getBaseObject
      val off = text.getBaseOffset
      var i = 0
      while (i + n <= nb) {
        updateMins(mins, XXH64.hashUnsafeBytes(base, off + i, n, Seed))
        i += 1
      }
    } else {
      var i = 0
      while (i + n <= nc) {
        val s = text.substringSQL(i + 1, n)
        updateMins(mins, XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed))
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  val sigFnName = "minhash_sig"
  val charFnName = "minhash_char_ngrams"

  /** Runtime registration (idempotent), mirroring ExtractHashtags. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val sigId = FunctionIdentifier(sigFnName)
    if (!reg.functionExists(sigId))
      reg.registerFunction(sigId,
        new ExpressionInfo(classOf[MinHashSig].getCanonicalName, sigFnName),
        (exprs: Seq[Expression]) => MinHashSig(exprs.head))
    val charId = FunctionIdentifier(charFnName)
    if (!reg.functionExists(charId))
      reg.registerFunction(charId,
        new ExpressionInfo(classOf[MinHashCharNgrams].getCanonicalName, charFnName),
        (exprs: Seq[Expression]) => MinHashCharNgrams(exprs(0), exprs(1)))
  }
}

/** `minhash_sig(sh: array<string>) -> array<bigint>` — 128-long MinHash
  * signature of a shingle set. Codegen emits a single static call, so
  * projections using it stay inside whole-stage codegen spans. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${MinHash.sigFnName} expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = MinHash.sigFnName

  override def nullSafeEval(input: Any): Any =
    MinHash.sigFromArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.MinHash.sigFromArray($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `minhash_char_ngrams(text, n) -> array<bigint>` — MinHash signature
  * over the character n-gram shingles of `text`, without materializing
  * the shingle array (the q16d hot path). */
case class MinHashCharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"${MinHash.charFnName} expects (string, int), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = MinHash.charFnName

  override def nullSafeEval(text: Any, n: Any): Any =
    MinHash.sigFromCharNgrams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (t, n) => s"${ev.value} = graft.functions.MinHash.sigFromCharNgrams($t, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinHashCharNgrams =
    copy(left = newLeft, right = newRight)
}
