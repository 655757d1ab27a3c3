package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 48-bit SimHash fingerprint as a native expression.
  *
  * Replaces the r2 plan (explode shingles → char-poly hash column → 48
  * conditional-sum aggregate columns → sign-bit assembly) with one tight
  * loop per document — same reasoning as [[MinHash]]: the aggregate
  * update overhead over exploded shingle rows, not the arithmetic, was
  * the cost.
  *
  * The math is bit-identical to the r2 column formulation AND to the
  * DuckDB oracle (q16c recomputes fingerprints independently): per
  * shingle h = fold over characters of (acc·131 + codepoint) mod
  * 9007199254740881 starting at 1; per bit j a ±1 counter over all
  * shingles; fp bit j set iff the counter is positive. Characters
  * contribute their code point (Spark's `split('')`+`ascii()` pipeline
  * yields code points for BMP text; the corpus and oracle agree on
  * ASCII).
  */
object SimHash {
  val Bits = 48
  val CharPolyP = 9007199254740881L // largest prime < 2^53: 131*P + 255 < 2^63

  /** Char-polynomial hash of one shingle — the UTF8String twin of
    * DedupQueries.charPolyHash / the oracle's list_reduce. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 1L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 131L + cp) % CharPolyP
      i += Character.charCount(cp)
    }
    acc
  }

  def fpFromArray(arr: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = polyHash(arr.getUTF8String(i))
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  val fnName = "simhash_fp"

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(fnName)
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[SimHashFp].getCanonicalName, fnName),
        (exprs: Seq[Expression]) => SimHashFp(exprs.head))
  }
}

/** `simhash_fp(sh: array<string>) -> bigint` — 48-bit SimHash
  * fingerprint of a shingle set. */
case class SimHashFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${SimHash.fnName} expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = SimHash.fnName

  override def nullSafeEval(input: Any): Any =
    SimHash.fpFromArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SimHash.fpFromArray($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}
