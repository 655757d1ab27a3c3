package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact set-Jaccard between the character n-gram shingle sets of two
  * texts, computed pairwise in one pass — the q16d verification step
  * without ever materializing a shingle array.
  *
  * Joining per-doc `array_distinct(transform(...))` shingle frames costs
  * an O(corpus) array build per join side (measured 2×1.7 s at sf0.1)
  * even when only a few hundred screened pairs need verification; this
  * expression instead joins the narrow text columns and does two hash-set
  * passes per pair. The result is the same exact rational |A∩B| / |A∪B|
  * (real string equality, not hashed — bit-identical to the DuckDB
  * oracle's list_intersect/list_distinct computation as a double).
  *
  * Windows are code-point based, matching `substr(i+1, n)` semantics
  * (pinned against the array formulation, incl. multibyte, in
  * MinHashSpec). Returns null if either side has no window (0/0).
  */
object TextSim {
  /** Code-point n-gram windows of `s` as Strings, appended to `into`;
    * returns the count of distinct windows seen by `into`. */
  private def addWindows(s: String, n: Int, into: java.util.HashSet[String]): Unit = {
    val len = s.length
    // char index of each code point start (ASCII fast path: identity)
    var cpCount = 0
    var i = 0
    var ascii = true
    while (i < len && ascii) { if (s.charAt(i) >= 0x80 || Character.isHighSurrogate(s.charAt(i))) ascii = false else i += 1 }
    if (ascii && i == len) {
      var j = 0
      while (j + n <= len) { into.add(s.substring(j, j + n)); j += 1 }
    } else {
      val starts = new Array[Int](len + 1)
      var ci = 0
      while (ci < len) {
        starts(cpCount) = ci
        ci += Character.charCount(s.codePointAt(ci))
        cpCount += 1
      }
      starts(cpCount) = len
      var j = 0
      while (j + n <= cpCount) { into.add(s.substring(starts(j), starts(j + n))); j += 1 }
    }
  }

  def charNgramJaccard(a: UTF8String, b: UTF8String, n: Int): Any = {
    val sa = new java.util.HashSet[String]()
    addWindows(a.toString, n, sa)
    val sb = new java.util.HashSet[String]()
    addWindows(b.toString, n, sb)
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) null else inter.toDouble / union
  }

  val jacFnName = "char_ngram_jaccard"

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(jacFnName)
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[CharNgramJaccard].getCanonicalName, jacFnName),
        (exprs: Seq[Expression]) => CharNgramJaccard(exprs(0), exprs(1), exprs(2)))
  }
}

/** `char_ngram_jaccard(a, b, n) -> double` (null when both sides have
  * no n-gram window). */
case class CharNgramJaccard(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"${TextSim.jacFnName} expects (string, string, int), got (${a.sql}, ${b.sql}, ${c.sql})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = TextSim.jacFnName

  override def nullSafeEval(a: Any, b: Any, n: Any): Any =
    TextSim.charNgramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n) => s"""
      |Object jacRes = graft.functions.TextSim.charNgramJaccard($a, $b, $n);
      |if (jacRes == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) jacRes).doubleValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CharNgramJaccard =
    copy(first = f, second = s, third = t)
}
