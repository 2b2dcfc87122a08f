package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** SQL-surface registration of the engine's time kernel: pure SQL
  * users (BI tools, notebooks over `spark.sql`) get the reference's
  * bucketing semantics as session functions, composed ENTIRELY from
  * built-in Catalyst expressions — codegen'd and optimizer-visible
  * (constant-folded over literals, pushdown-transparent), never a UDF.
  *
  *  - `graft_slice(ts, minutes)` — within-hour slice floor, the
  *    Catalyst mirror of [[TimeKernel.sliceFloor]] (`get-slice`,
  *    postgres/common.clj:7-23); `minutes` must be a foldable
  *    1..60 literal (it parameterizes the expression tree).
  *  - `graft_week(ts)` — the reference's NON-ISO week floor, mirror
  *    of [[TimeKernel.weekFloor]] (`query.clj:24-30`): midnight of
  *    (date − Joda day-of-week), every day maps to the PREVIOUS
  *    Sunday. Deliberately not `date_trunc('week', …)`.
  *
  * A spec pins both mirrors expression-for-expression equal to the
  * Column kernels on a timestamp sweep; the `ts_sql_surface` driver
  * query runs the slice floor through `spark.sql` text under the
  * DuckDB oracle. Install per session via [[GraftFunctions.register]]
  * or cluster-wide with
  * `spark.sql.extensions=graft.GraftExtensions`. */
object SqlSurface {

  /** Foldable integer literal, else a loud analysis-time error. */
  private def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got ${other.sql}")
  }

  /** Catalyst mirror of [[TimeKernel.sliceFloor]]:
    * `timestamp_seconds(unix_timestamp(date_trunc('hour', ts)) +
    * floor(minute(ts) / m) * (m * 60))`. */
  def sliceFloorExpr(ts: Expression, minutes: Int): Expression = {
    require(minutes > 0 && minutes <= 60,
      "graft_slice minutes must be in 1..60")
    val hourFloor = TruncTimestamp(Literal("hour"), ts)
    val hourSecs = UnixTimestamp(hourFloor, Literal("yyyy-MM-dd HH:mm:ss"))
    val slot = Multiply(
      Cast(Floor(Divide(Cast(Minute(ts), DoubleType),
        Literal(minutes.toDouble))), LongType),
      Literal(minutes * 60L))
    SecondsToTimestamp(Add(hourSecs, slot))
  }

  /** Catalyst mirror of [[TimeKernel.weekFloor]] ∘ isoDayOfWeek:
    * `cast(date_sub(cast(ts as date), ((dayofweek(ts)+5)%7)+1) as
    * timestamp)`. */
  def weekFloorExpr(ts: Expression): Expression = {
    val isoDow = Add(
      Remainder(Add(DayOfWeek(ts), Literal(5)), Literal(7)), Literal(1))
    Cast(DateSub(Cast(ts, DateType), isoDow), TimestampType)
  }

  val sliceInfo: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
    FunctionIdentifier("graft_slice"),
    new ExpressionInfo(SqlSurface.getClass.getName, "graft_slice"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_slice(ts, minutes) takes 2 args")
      sliceFloorExpr(children(0), literalInt(children(1), "graft_slice minutes"))
    })

  val weekInfo: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
    FunctionIdentifier("graft_week"),
    new ExpressionInfo(SqlSurface.getClass.getName, "graft_week"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_week(ts) takes 1 arg")
      weekFloorExpr(children(0))
    })

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(sliceInfo._1, sliceInfo._2, sliceInfo._3)
    spark.sessionState.functionRegistry
      .registerFunction(weekInfo._1, weekInfo._2, weekInfo._3)
  }
}
