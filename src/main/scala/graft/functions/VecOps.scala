package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native dense-vector kernels for the embedding hot paths.
  *
  * The similarity/dedup operators previously expressed the dot product
  * and unit normalization through higher-order array functions
  * (`aggregate(zip_with(…))`, `transform(v, x / n)`). Those are
  * CodegenFallback expressions: every evaluation walks an interpreted
  * expression tree with a boxed lambda variable PER ELEMENT — measured
  * as the dominant per-row cost of the PQ train/encode jobs and a tax
  * on every cosine verification (optimization guide §4: prefer
  * codegen-capable expressions in the hot path; the per-element lambda
  * here is the JVM analogue of the row-at-a-time Python UDF). These
  * expressions run the same arithmetic as a tight while-loop over the
  * array — same element order, same left fold from 0.0, so every
  * produced double is BIT-IDENTICAL to the lambda pipeline's — and
  * null semantics are preserved exactly:
  *  - `vec_dot`: mismatched lengths or any null element → NULL (the
  *    zip_with null-padding / null-poisoned-sum behavior);
  *  - `vec_unit`: null elements stay null per element (the transform
  *    lambda's x/n on a null x).
  */
object VecOps {
  val dotFnName = "vec_dot"
  val unitFnName = "vec_unit"
  val agreeFnName = "sig_agree"

  /** Count of positions where two MinHash signatures agree — the LSH
    * candidate screen's estimator. Matches
    * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)), 0, _ + _)`
    * exactly: zip_with pads the shorter side with nulls and a null
    * comparison falls to the otherwise(0) branch, so positions beyond
    * the shorter array (and null elements) contribute 0. */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) s += 1
      i += 1
    }
    s
  }

  /** Σ aᵢ·bᵢ, left fold from 0.0 in element order. Boxed so a length
    * mismatch / null element can yield NULL like the lambda pipeline. */
  def dotArrays(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** v / divisor per element — `transform(v, x => x / n)` semantics
    * (null elements stay null; same FP division per element). */
  def unitArray(v: ArrayData, divisor: Double): ArrayData = {
    val n = v.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = v.getDouble(i) / divisor; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (v.isNullAt(i)) null
          else java.lang.Double.valueOf(v.getDouble(i) / divisor)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Idempotent runtime registration — the [[graft.functions
    * .GraftExtensions]] injection covers GraftSession-built sessions;
    * this covers driver-owned ones (the Tables.load discipline). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val did = FunctionIdentifier(dotFnName)
    if (!reg.functionExists(did))
      reg.registerFunction(did,
        new ExpressionInfo(classOf[VecDot].getCanonicalName, dotFnName),
        (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1)))
    val uid = FunctionIdentifier(unitFnName)
    if (!reg.functionExists(uid))
      reg.registerFunction(uid,
        new ExpressionInfo(classOf[VecUnit].getCanonicalName, unitFnName),
        (exprs: Seq[Expression]) => VecUnit(exprs(0), exprs(1)))
    val aid = FunctionIdentifier(agreeFnName)
    if (!reg.functionExists(aid))
      reg.registerFunction(aid,
        new ExpressionInfo(classOf[VecSigAgree].getCanonicalName, agreeFnName),
        (exprs: Seq[Expression]) => VecSigAgree(exprs(0), exprs(1)))
  }
}

/** `sig_agree(a: array<bigint>, b: array<bigint>) -> int` — MinHash
  * position-agreement count (the candidate screen's Jaccard
  * estimator), evaluated per CANDIDATE PAIR — the former
  * aggregate(zip_with(…)) form was interpreted per element per pair. */
case class VecSigAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${VecOps.agreeFnName} expects (array<bigint>, array<bigint>), got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = VecOps.agreeFnName

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.sigAgree($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecSigAgree =
    copy(left = newLeft, right = newRight)
}

/** `vec_dot(a: array<double>, b: array<double>) -> double` */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${VecOps.dotFnName} expects (array<double>, array<double>), got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = VecOps.dotFnName

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecOps.dotArrays($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_unit(v: array<double>, n: double) -> array<double>` — v scaled
  * by 1/n (the unit-normalization projection). */
case class VecUnit(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${VecOps.unitFnName} expects (array<double>, double), got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = VecOps.unitFnName

  override def nullSafeEval(v: Any, n: Any): Any =
    VecOps.unitArray(v.asInstanceOf[ArrayData], n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = graft.functions.VecOps.unitArray($v, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecUnit =
    copy(left = newLeft, right = newRight)
}
