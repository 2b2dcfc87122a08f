package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the α=1/2 EWMA Horner fold over a
  * trailing frame's long values — `floor(10⁴·num/den)` where
  * `num = fold(acc·2 + x)` oldest→newest and `den = 2^len − 1`.
  *
  * The composed route (`graft.operators.Anomaly.ewma`'s two
  * `aggregate` higher-order folds) is CodegenFallback — interpreted
  * per element with a Column-tree eval per step (the
  * [[DotProduct]] rationale, SCALE.md §7's HOF hazard). This
  * expression fuses both folds and the final ratio into one primitive
  * loop inside whole-stage codegen, bit-identical to the HOF pair by
  * construction (same exact-long folds, same single double division;
  * spec-pinned equivalent in AnomalySpec).
  *
  * Array elements are assumed non-null (the caller feeds scaled
  * cents); an empty array yields NULL. Lengths > 62 would overflow
  * `2^len` and are rejected by the callers' `w ≤ 62` contract.
  */
case class EwmaE4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ewma_e4 expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      var num = 0L
      var den = 0L
      var i = 0
      while (i < n) {
        num = num * 2L + arr.getLong(i)
        den = den * 2L + 1L
        i += 1
      }
      math.floor((10000.0 * num) / den).toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val num = ctx.freshName("num")
      val den = ctx.freshName("den")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $num = 0L;
         |  long $den = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $num = $num * 2L + $a.getLong($i);
         |    $den = $den * 2L + 1L;
         |  }
         |  ${ev.value} = (long) java.lang.Math.floor((10000.0 * $num) / $den);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EwmaE4 =
    copy(child = newChild)

  override def prettyName: String = "graft_ewma_e4"
}

object EwmaE4 {
  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_ewma_e4"),
    new ExpressionInfo(classOf[EwmaE4].getName, "graft_ewma_e4"),
    (children: Seq[Expression]) => EwmaE4(children.head))
}
