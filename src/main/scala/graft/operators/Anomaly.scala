package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing-baseline anomaly detection over per-entity event streams —
  * the monitoring-side twin of the rollup read path (a user of the
  * reference's counters would alert on exactly these series; the
  * reference itself stops at storage, cf.
  * /root/reference/src/time_series_storage/core.clj which exposes only
  * get-timeseries / get-histogram reads).
  *
  * Semantics: an observation is anomalous when it deviates from the
  * mean of the entity's previous `baseN` observations by more than `k`
  * trailing standard deviations, given at least `minN` prior points.
  *
  * Everything is integer-exact: values arrive as scaled longs (cents),
  * and the z-score test `|x - mean| > k·sd` is evaluated in
  * cross-multiplied form with no division or sqrt —
  *
  *   (n·x − S)² > k² · (n·Σx² − S²)
  *
  * where S and Σx² range over the trailing frame. Both sides are
  * evaluated in DecimalType(38,0) (DuckDB mirrors with HUGEINT), so
  * the test is exact — no float mean/stddev summation-order drift, and
  * no int64 overflow: a pure-long pipeline breaks once either side
  * exceeds 2⁶³, which an adversarial single outlier reaches near
  * |x| ~ 10⁸ at baseN=20, k=3 (9·(n·Σx²−S²) ≈ 171·x² for a
  * lone spike over a near-zero base). The decimal form is exact for
  * |x| ≤ ~3·10¹⁵ at baseN ≤ 1000, k ≤ 3 (both cross-products stay
  * under 10³⁸); beyond that, decimal overflow raises under ANSI mode
  * (`spark.sql.ansi.enabled`, the Spark 4 default — [[anomalies]]
  * asserts it, since with ANSI off overflow yields NULL and
  * `.where(is_anomaly)` would silently drop rows), and DuckDB's
  * HUGEINT (≈1.7·10³⁸) errors at the same domain edge.
  *
  * Scale shape: ONE hash partitioning on the entity key serves the
  * count/sum/sum-of-squares frames (a single window spec), the frame
  * is ROWS-bounded (state is O(baseN) per open frame, independent of
  * series length), and the test itself is row-local codegen'd
  * arithmetic. At 100 TB this is the same single per-entity shuffle as
  * any sessionization / rolling-feature pass — no join, no collect, no
  * second exchange.
  */
object Anomaly {

  /** Flag rows whose value deviates > `k` trailing sigmas from the
    * entity's previous-`baseN` baseline.
    *
    * @param df       input frame
    * @param entityCol  partition key (e.g. user_id)
    * @param orderCols  deterministic within-entity order (e.g. ts, id)
    * @param valueCol   integral (pre-scaled) observation column
    * @param baseN    trailing baseline size (frame is the `baseN` rows
    *                 BEFORE the current row — the observation under
    *                 test never contaminates its own baseline)
    * @param minN     minimum prior observations for a verdict
    * @param k        sigma threshold (integer, cross-multiplied as k²)
    * @return input columns + `n_base`, `base_sum`, `is_anomaly`
    */
  def trailingZFlags(df: DataFrame, entityCol: Column, orderCols: Seq[Column],
      valueCol: Column, baseN: Int, minN: Int, k: Int): DataFrame = {
    // With ANSI off, decimal overflow yields NULL → is_anomaly NULL →
    // `.where(is_anomaly)` silently drops rows. Fail loudly instead:
    // the exactness contract above requires ANSI (Spark 4's default).
    // Read the RESOLVED conf value — a string get with a literal
    // fallback would shadow SQLConf's real default on builds where it
    // differs (Spark 3.x defaulted ANSI off).
    require(df.sparkSession.sessionState.conf.ansiEnabled,
      "Anomaly.trailingZFlags requires spark.sql.ansi.enabled=true: " +
      "with ANSI off, decimal overflow beyond the documented |x| " +
      "domain becomes NULL and silently drops rows instead of raising")
    val frame = Window.partitionBy(entityCol).orderBy(orderCols: _*)
      .rowsBetween(-baseN.toLong, -1L)
    val dec = DecimalType(38, 0)
    val x = valueCol.cast("long")
    val xd = x.cast(dec)
    val n = count(x).over(frame)
    val s = sum(xd).over(frame)
    val sxx = sum(xd * xd).over(frame)
    // (n·x − S)² > k²·(n·Σx² − S²), guarded on minN prior points;
    // all products in decimal(38,0) — exact, overflow-raising, and
    // hash-identical to the DuckDB HUGEINT oracle
    val nd = n.cast(dec)
    val lhs = (nd * xd - s) * (nd * xd - s)
    val rhs = lit(k.toLong * k).cast(dec) * (nd * sxx - s * s)
    df.withColumn("n_base", n)
      .withColumn("base_sum", s.cast("long"))
      .withColumn("is_anomaly", n >= minN && lhs > rhs)
  }

  /** Exponentially-weighted trailing mean (EWMA, α = 1/2) — the
    * smoothing companion to [[trailingZFlags]]'s flat baseline: recent
    * observations dominate, so the smoothed series tracks level shifts
    * a plain moving average lags on.
    *
    * Exactness: with α = 1/2 the weights over the trailing `w`-row
    * frame are powers of two, so the weighted numerator is a HORNER
    * FOLD over the frame's values (`acc·2 + x`, oldest → newest) and
    * the denominator is `2^len − 1` — both exact longs, no float
    * accumulation anywhere. Only the final `1e4·num/den` ratio is a
    * double (exactly-representable operands both engines divide
    * identically), floored to an e4 integer. Short leading frames
    * (series start) use the same rule over the rows that exist, so
    * the first observation's EWMA is itself.
    *
    * Scale shape: the ONE per-entity hash partitioning every
    * per-entity pass shares; the frame is ROWS-bounded (O(w) state
    * per open frame); the fold is row-local over a ≤`w`-element
    * array. `w` is capped at 62 so `2^len` stays in a long.
    *
    * `valueCol` must be non-null: `collect_list` silently drops null
    * elements, which would shrink the frame without shrinking the
    * ROWS window — filter or coalesce nulls upstream (the driver
    * queries use scaled cents, never null).
    *
    * @param foldFn frame-array → e4 column. The default is the
    *   composed higher-order fold (no registration needed);
    *   [[graft.functions.GraftFunctions.ewmaE4Native]] is the fused
    *   codegen form (the DotProduct rationale — the HOF pair is
    *   CodegenFallback), bit-identical by construction and
    *   spec-pinned equivalent.
    * @return input columns + `ewma_e4` (×10⁴, floored) */
  def ewma(df: DataFrame, entityCol: Column, orderCols: Seq[Column],
      valueCol: Column, w: Int = 8,
      foldFn: Column => Column = ewmaFoldHof): DataFrame = {
    require(w >= 1 && w <= 62, s"ewma window must be in [1, 62], got $w")
    val frame = Window.partitionBy(entityCol).orderBy(orderCols: _*)
      .rowsBetween(-(w - 1).toLong, 0L)
    val l = collect_list(valueCol.cast("long")).over(frame)
    df.withColumn("ewma_e4", foldFn(l))
  }

  /** Two-sided CUSUM change-point statistics per entity — the DRIFT
    * detector beside [[trailingZFlags]]'s spike detector: a z-test
    * sees single outliers, CUSUM accumulates small sustained shifts
    * away from a known target level until the evidence crosses a
    * decision threshold (Page 1954's sequential test, the standard
    * SPC form).
    *
    * Semantics (classical tabular CUSUM, all integer):
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (x_t − target − slack))   upward shift
    *   S⁻_t = max(0, S⁻_{t−1} + (target − slack − x_t))   downward shift
    *   shift flagged when S⁺_t ≥ threshold or S⁻_t ≥ threshold
    *
    * The recursion is NOT computed recursively: `max(0, acc + d)` has
    * the closed form  S_t = C_t − min(0, min_{j≤t} C_j)  over the
    * prefix sums C of the drift terms, so both statistics are two
    * window passes (running sum, then running min of that sum) over
    * ONE per-entity sort — the same shape every per-entity pass in
    * this module shares, no recursion, no UDAF, no state. That closed
    * form is also what makes the operator ORACLE-EXACT: the identical
    * window algebra runs in any ANSI SQL engine, where a recursive
    * definition would need per-series recursive CTEs.
    *
    * Exactness/overflow: inputs are scaled longs (cents); prefix sums
    * grow at most |x−target−slack|·seriesLength, raising under ANSI on
    * long overflow (asserted like [[trailingZFlags]]) rather than
    * wrapping — at cents scale that admits series beyond 10¹⁴ rows.
    *
    * Scale shape: one hash partitioning on the entity key, two
    * same-spec window passes (Spark plans one Sort + one Exchange;
    * the second pass reuses the first's ordering), O(1) state per
    * open frame. No join, no collect.
    *
    * @param target    known reference level (same scale as valueCol)
    * @param slack     allowance k — drifts smaller than `slack` per
    *                  observation never accumulate (noise deadband)
    * @param threshold decision interval h — flag once a side's
    *                  statistic reaches it
    * @return input columns + `s_pos`, `s_neg`, `is_shift` */
  def cusumFlags(df: DataFrame, entityCol: Column, orderCols: Seq[Column],
      valueCol: Column, target: Long, slack: Long,
      threshold: Long): DataFrame = {
    require(slack >= 0, s"cusum slack must be >= 0, got $slack")
    require(threshold > 0, s"cusum threshold must be > 0, got $threshold")
    require(df.sparkSession.sessionState.conf.ansiEnabled,
      "Anomaly.cusumFlags requires spark.sql.ansi.enabled=true: with " +
      "ANSI off, a prefix-sum long overflow wraps silently and the " +
      "statistics (and every downstream alarm) corrupt instead of raising")
    val w = Window.partitionBy(entityCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = valueCol.cast("long")
    val withPrefix = df
      .withColumn("graft_cusum_cpos", sum(x - lit(target + slack)).over(w))
      .withColumn("graft_cusum_cneg", sum(lit(target - slack) - x).over(w))
    val sPos = col("graft_cusum_cpos") -
      least(min(col("graft_cusum_cpos")).over(w), lit(0L))
    val sNeg = col("graft_cusum_cneg") -
      least(min(col("graft_cusum_cneg")).over(w), lit(0L))
    withPrefix
      .withColumn("s_pos", sPos)
      .withColumn("s_neg", sNeg)
      .withColumn("is_shift",
        col("s_pos") >= threshold || col("s_neg") >= threshold)
      .drop("graft_cusum_cpos", "graft_cusum_cneg")
  }

  /** HOLT double-exponential smoothing per series — the TREND-aware
    * level tracker beside [[ewma]]: EWMA follows a level, Holt keeps a
    * (level, trend) state pair so a steadily climbing series is
    * predicted ahead instead of lagged behind; `forecast_e4` is the
    * h-step-ahead linear extrapolation `level + h·trend`, the
    * capacity-planning read.
    *
    * Semantics (α = 1/2, β = 1/4 — power-of-two gains, so the whole
    * recursion is integer):
    *
    *   L_1 = x_1·10⁴,  B_1 = 0
    *   L_t = ⌊(x_t·10⁴ + L_{t−1} + B_{t−1}) / 2⌋
    *   B_t = ⌊(L_t − L_{t−1} + 3·B_{t−1}) / 4⌋
    *
    * with FLOOR division (negative trends round toward −∞ — both
    * engines state it as `floor(a / 2.0)`, exact while the operands
    * stay below 2⁵³, i.e. |value| ≲ 5·10⁸ at the e4 scale — far past
    * cents-scale money). Unlike [[ewma]]'s ROWS-bounded frame, this
    * recursion is inherently FULL-HISTORY (state at t depends on
    * every prior row), so the operator returns the per-series FINAL
    * state — one row per entity — rather than a per-row column: that
    * is the serving shape (current level/trend/forecast per series),
    * and it is what keeps the aggregation a single fold instead of a
    * quadratic per-row re-fold.
    *
    * Scale shape: one hash aggregation on the entity key;
    * `sort_array(collect_list(...))` holds ONE series in memory per
    * group (the same bound any per-series state pass has — a series
    * too big for one executor's heap needs pre-aggregation to a
    * coarser grain first, cf. the rollup path), then a linear
    * higher-order fold. No window, no join, no shuffle beyond the one
    * aggregation exchange.
    *
    * `valueCol` must be non-null ([[ewma]]'s contract — collect_list
    * drops nulls silently).
    *
    * @param horizon  forecast steps ahead (h in `level + h·trend`)
    * @return one row per entity: entity col, `n_obs`, `level_e4`,
    *         `trend_e4`, `forecast_e4` */
  def holt(df: DataFrame, entityCol: Column, orderCols: Seq[Column],
      valueCol: Column, horizon: Int = 1): DataFrame = {
    require(horizon >= 0 && horizon <= 1000000,
      s"holt horizon in [0, 1e6], got $horizon")
    val item = struct(orderCols :+ valueCol.cast("long").as("x"): _*)
    val init = struct(lit(0L).as("l"), lit(0L).as("b"), lit(0L).as("n"))
    def stepFn(acc: Column, e: Column): Column = {
      val x4 = e.getField("x") * lit(10000L)
      val lPrev = acc.getField("l")
      val bPrev = acc.getField("b")
      val n = acc.getField("n")
      val lNew = floor((x4 + lPrev + bPrev).cast("double") / lit(2.0))
        .cast("long")
      val bNew = floor((lNew - lPrev + lit(3L) * bPrev).cast("double") / lit(4.0))
        .cast("long")
      when(n === 0L,
        struct(x4.as("l"), lit(0L).as("b"), lit(1L).as("n")))
        .otherwise(
          struct(lNew.as("l"), bNew.as("b"), (n + lit(1L)).as("n")))
    }
    df.groupBy(entityCol)
      .agg(aggregate(sort_array(collect_list(item)), init, stepFn).as("st"))
      .select(entityCol,
        col("st.n").as("n_obs"),
        col("st.l").as("level_e4"),
        col("st.b").as("trend_e4"),
        (col("st.l") + lit(horizon.toLong) * col("st.b")).as("forecast_e4"))
  }

  /** The composed (higher-order-function) Horner fold — the default
    * `foldFn` of [[ewma]] and the semantic reference its codegen twin
    * is pinned against. */
  def ewmaFoldHof(l: Column): Column = {
    val num = aggregate(l, lit(0L), (acc, x) => acc * lit(2L) + x)
    val den = aggregate(l, lit(0L), (acc, _) => acc * lit(2L) + lit(1L))
    // empty frame (all-null values collapsed by collect_list despite
    // the documented contract) → NULL, matching the codegen twin —
    // without the guard this branch would emit floor(0/0 = NaN) → 0
    // and the two foldFns would disagree exactly on dirty data
    when(size(l) === 0, lit(null).cast("long"))
      .otherwise(floor((lit(10000.0) * num) / den).cast("long"))
  }
}
