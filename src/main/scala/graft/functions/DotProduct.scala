package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: double-precision dot product of two
  * numeric arrays, with `doGenCode` emitting a primitive fused loop.
  *
  * This is the one place the engine drops below the DataFrame API
  * (custom-operator preference (b), after composition): the built-in
  * route — `aggregate(zip_with(...))` — is CodegenFallback, i.e.
  * interpreted per row with per-element boxing, and measured ~10-80×
  * slower inside quadratic similarity joins. This expression stays
  * inside whole-stage codegen in ANY context (projections, join
  * conditions, filters), needs no broadcast-collect, and preserves the
  * sequential left-fold summation order — results stay bit-identical
  * to the fold and to DuckDB's `list_dot_product` over DOUBLE[].
  *
  * Array elements are assumed non-null (embedding vectors); mismatched
  * lengths dot the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |  ? $a.numElements() : $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Registration: either per-session ([[GraftFunctions.register]]) or
  * cluster-wide via `spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftFunctions {
  val dotInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(dotInfo._1, dotInfo._2, dotInfo._3)
    spark.sessionState.functionRegistry
      .registerFunction(EwmaE4.info._1, EwmaE4.info._2, EwmaE4.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(BloomProbe.aggInfo._1, BloomProbe.aggInfo._2,
        BloomProbe.aggInfo._3)
    spark.sessionState.functionRegistry
      .registerFunction(BloomProbe.mightInfo._1, BloomProbe.mightInfo._2,
        BloomProbe.mightInfo._3)
    SqlSurface.register(spark)
  }

  /** Column API over the registered functions. */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Fused codegen EWMA fold ([[EwmaE4]]); requires [[register]]. */
  def ewmaE4Native(arr: Column): Column = call_function("graft_ewma_e4", arr)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotInfo)
    ext.injectFunction(EwmaE4.info)
    ext.injectFunction(BloomProbe.aggInfo)
    ext.injectFunction(BloomProbe.mightInfo)
    ext.injectFunction(SqlSurface.sliceInfo)
    ext.injectFunction(SqlSurface.weekInfo)
  }
}
