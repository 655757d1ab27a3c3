package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-bit) LSH bucket keys as a native expression.
  *
  * r2 computed the projections relationally (posexplode embedding dims ⋈
  * broadcast plane rows → two grouped sums) to avoid a 2048-literal
  * expression tree — the right call versus literals, but it still built
  * ~dims × planes intermediate rows per vector and shuffled twice. With
  * the plane matrix as a static array inside one expression the whole
  * thing is a pure map: 8 table keys per vector in one pass, no explode,
  * no join, no shuffle.
  *
  * Plane weights use the same fixed-seed draw as r2 (Random(7),
  * nextGaussian, plane-major then dim) so bucket assignments stay
  * comparable run to run. Projection sums here are sequential per plane;
  * the relational formulation summed in shuffle order — sign flips from
  * float reassociation can only occur at |proj| ≈ 0, which moves a
  * borderline vector between buckets and is absorbed by the exact
  * verification / rows-only contracts of q16e/q17b.
  */
object HyperplaneLsh {
  val Tables = 8
  val BitsPerTable = 6
  val Dim = 64

  /** planes(p)(d): generation order matches the r2 relational version. */
  val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(Tables * BitsPerTable)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  def keysFromVector(arr: ArrayData): ArrayData = {
    val dims = math.min(arr.numElements(), Dim)
    val keys = new Array[Long](Tables)
    var t = 0
    while (t < Tables) {
      var key = 0L
      var b = 0
      while (b < BitsPerTable) {
        val row = planes(t * BitsPerTable + b)
        var proj = 0.0
        var d = 0
        while (d < dims) {
          proj += arr.getDouble(d) * row(d)
          d += 1
        }
        if (proj > 0) key |= 1L << b
        b += 1
      }
      keys(t) = key
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  val fnName = "hyperplane_keys"

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(fnName)
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[HyperplaneKeys].getCanonicalName, fnName),
        (exprs: Seq[Expression]) => HyperplaneKeys(exprs.head))
  }
}

/** `hyperplane_keys(v: array<double>) -> array<bigint>` — one 6-bit LSH
  * bucket key per hash table (8 tables), index = table id. */
case class HyperplaneKeys(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${HyperplaneLsh.fnName} expects array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = HyperplaneLsh.fnName

  override def nullSafeEval(input: Any): Any =
    HyperplaneLsh.keysFromVector(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HyperplaneLsh.keysFromVector($c);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneKeys =
    copy(child = newChild)
}
