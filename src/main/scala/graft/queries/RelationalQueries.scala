package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Relational breadth over the TPC-H-ish star schema — scans, filters,
  * joins (broadcast for small dims), aggregations, windows, top-k.
  *
  * Scale posture: joins put the small side in a `broadcast()` hint
  * (region/nation/supplier/customer are orders of magnitude smaller than
  * lineitem at every SF — at 100 TB, lineitem shuffles ONCE on its join
  * key and every dimension table ships to executors); money stays in
  * integral cents (`round(x*100/ x*10000)` per row, then LONG sums) so
  * aggregates are exact and insensitive to partial-aggregation order.
  */
object RelationalQueries {

  private def read(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  /** revenue scaled ×10⁴: extendedprice(2dp) × (1−discount)(2dp) is exact
    * at 4 decimals; per-row rounding then LONG sum is order-independent. */
  private val revE4: Column =
    round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
      .cast(LongType)

  /** q1 revenue-MV registration, once per (session, sf dir). */
  private val q1MvDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** The part CO-PURCHASE graph both graph queries read: one edge per
    * unordered part pair sharing at least one order. One derivation —
    * the triangle and hop queries must never diverge on what the
    * graph IS. Pair duplicates across orders are emitted as-is; the
    * graph operators dedup (support-weighted variants belong to
    * [[graft.operators.Itemsets]]). */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      // ONE aggregation builds each basket's (dedup'd, sorted) item
      // array, then pair generation is row-local higher-order-function
      // work — no per-order self-join, no separate distinct pass. The
      // per-row cost is C(basket,2): fine wherever baskets are
      // human-scale (TPC-H orders ≤7 items; retail baskets ~10²); a
      // corpus with degenerate mega-baskets (>~10⁴ items) should fall
      // back to the self-join form, which spreads the same quadratic
      // output across tasks instead of inside one row.
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items) - i - 1), " +
          "y -> struct(x AS pa, y AS pb))))")).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MARKET-BASKET frequent pairs (graft.operators.Itemsets —
    // a-priori): parts co-purchased in ≥3 distinct orders. The Spark
    // plan prunes to individually-frequent items BEFORE the per-order
    // self-join (exact by support monotonicity), so the oracle states
    // the UNPRUNED plain pair count and must still hash-match — the
    // a-priori theorem is itself under test
    "basket_frequent_pairs" -> ((s, dir) =>
      graft.operators.Itemsets.frequentPairs(
        read(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 3L)),

    // association rules over the same frequent pairs: confidence and
    // lift as ×10⁴ integers via INTEGRAL division (exact across
    // engines — no float-quotient drift), both rule directions
    "basket_rules" -> ((s, dir) =>
      graft.operators.Itemsets.associationRules(
        read(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 3L)),

    // level-2 a-priori: frequent TRIPLES, every sub-pair pruned
    // against the frequent-pair set before counting — again the
    // unpruned oracle must hash-match (monotonicity at level 2)
    "basket_frequent_triples" -> ((s, dir) =>
      graft.operators.Itemsets.frequentTriples(
        read(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2L)),

    // TRIANGLE counts + exact local clustering coefficient
    // (graft.operators.Graph.triangleStats) on the part co-purchase
    // graph — orders are cliques, so neighborhood cohesion separates
    // parts bought in broad mixed baskets from parts in recurring
    // bundles. The Spark plan degree-orients edges before the wedge
    // join (out-degree capped at O(√m), no hub skew); the oracle is
    // the plain unoriented 3-way self-join, so orientation must be
    // answer-invisible
    "basket_triangles" -> ((s, dir) =>
      graft.operators.Graph.triangleStats(
        coPurchaseEdges(s, dir), "pa", "pb")),

    // the SERVED ×100-regime form of the triangle read: DOULION edge
    // sampling (keep p=0.25 of edges by deterministic seeded hash,
    // exact count on the sample, unbiased 1/p³ scale-up in
    // decimal-exact integer arithmetic) — the wedge join shrinks ~p²
    // and the closures ~p³ where exact basket_triangles is inherently
    // corpus-shaped (280 s isolated at the ×100 fixture). The oracle
    // replays the SAME md5 membership hash and scale-up, so the
    // actual sampled path hash-gates, not just its degenerate p=1
    // form (that degeneracy is GraphSpec-pinned). Exact stays the
    // audit key.
    "basket_triangles_approx" -> ((s, dir) =>
      graft.operators.Graph.approxTriangleCount(
        coPurchaseEdges(s, dir), "pa", "pb", pE4 = 2500, seed = 7)),

    // BFS hop distances (graft.operators.Graph.hopDistances) from one
    // seed part over the same co-purchase graph — the "related
    // products radius" read (hop 1 = bought together, hop 2 = bought
    // with something bought together…). Frontier-sized iterative
    // expansion on the Spark side; the oracle walks a recursive CTE
    // and min-aggregates hops
    "basket_hops" -> ((s, dir) =>
      graft.operators.Graph.hopDistances(
        coPurchaseEdges(s, dir), "pa", "pb",
        sources = Seq("42"), maxHops = 6, undirected = true)),

    // DATA-QUALITY release gate (graft.operators.Quality): declared
    // constraints → exact violation report. The row-local checks ride
    // ONE fused aggregation; uniqueness gets its own key agg and the
    // FK an anti-join. The list deliberately mixes passing invariants
    // of the fixture (pk, fk, not-null) with failing ones (l_orderkey
    // alone is not unique; quantities do reach 50) so both statuses
    // are exercised
    "quality_report" -> ((s, dir) => {
      import graft.operators.Quality
      val li = read(s, dir, "lineitem")
      val ord = read(s, dir, "orders")
      Quality.report(li, Seq(
        Quality.NotNull("l_orderkey"),
        Quality.Satisfies("quantity_le_49", col("l_quantity") <= 49),
        Quality.Unique(Seq("l_orderkey", "l_linenumber")),
        Quality.Unique(Seq("l_orderkey")),
        Quality.ForeignKey("l_orderkey", ord, "o_orderkey", "orders")))
    }),

    // the SAME release gate consumed from pure SQL text (the
    // graft.sql.PipelineViews notebook surface) — shared oracle: the
    // view must be the Scala read, verbatim
    "quality_report_sql" -> ((s, dir) => {
      import graft.operators.Quality
      graft.sql.PipelineViews.installQualityReport(s, read(s, dir, "lineitem"),
        Seq(
          Quality.NotNull("l_orderkey"),
          Quality.Satisfies("quantity_le_49", col("l_quantity") <= 49),
          Quality.Unique(Seq("l_orderkey", "l_linenumber")),
          Quality.Unique(Seq("l_orderkey")),
          Quality.ForeignKey("l_orderkey", read(s, dir, "orders"),
            "o_orderkey", "orders")))
      s.sql("SELECT * FROM graft_quality_report")
    }),

    // TPC-H Q1 shape: single-pass grouped scan aggregation
    "q1_pricing_summary" -> ((s, dir) =>
      read(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast(LongType).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast(LongType)).as("sum_base_cents"),
          sum(revE4).as("sum_disc_e4"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: 3-way join, filtered, grouped, deterministic top-k
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = read(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
      val ord = read(s, dir, "orders")
        .where(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      val li = read(s, dir, "lineitem")
        .where(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(revE4).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way star join with broadcast dimensions
    "q5_local_supplier_volume" -> ((s, dir) => {
      val region = read(s, dir, "region").where(col("r_name") === "ASIA")
      val nation = read(s, dir, "nation")
      val supplier = read(s, dir, "supplier")
      val customer = read(s, dir, "customer")
      val orders = read(s, dir, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      val li = read(s, dir, "lineitem")
      // customer is deliberately UNHINTED: it is the one "dimension"
      // that grows with scale factor (15k rows at sf0.1, 15M at
      // sf100) — a forced broadcast would OOM the driver at cluster
      // scale. AQE's size estimate picks broadcast while it fits and
      // degrades to a shuffled join when it doesn't. The fixed-size
      // catalogs (supplier/nation/region) stay hinted.
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
        .join(customer.withColumnRenamed("c_nationkey", "cn"),
          col("o_custkey") === col("c_custkey") && col("cn") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(revE4).as("revenue_e4"))
    }),

    // TPC-H Q10 shape: returned-item revenue ranking — fact filtered
    // on the return flag, quarter-bounded orders, customer + nation
    // dims; customer UNHINTED (scales with SF — AQE sizes it), the
    // fixed nation catalog broadcast
    "q10_returned_items" -> ((s, dir) => {
      val li = read(s, dir, "lineitem").where(col("l_returnflag") === "R")
      val ord = read(s, dir, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(read(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(read(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(revE4).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: large-volume orders — a HAVING-style aggregate
    // gate (per-order quantity > threshold) feeding the order/customer
    // join; the gate output is order keys only, so the join input is
    // pre-shrunk before any wide row moves
    "q18_large_volume" -> ((s, dir) => {
      val big = read(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast(LongType).as("total_qty"))
        .where(col("total_qty") > 250)
      read(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(read(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100).cast(LongType).as("total_cents"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q4 shape: EXISTS-style priority check — orders in a
    // quarter with at least one returned lineitem, counted per
    // priority. The left_semi join materializes only order keys on
    // the probe side; lineitem never widens the output
    "q4_order_priority" -> ((s, dir) => {
      val ord = read(s, dir, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      val returned = read(s, dir, "lineitem")
        .where(col("l_returnflag") === "R").select(col("l_orderkey"))
      ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q6 shape: pure filtered scan aggregation — every predicate
    // (shipdate year, discount band, quantity cap) pushes into the
    // parquet reader; the whole query is one codegen'd scan + one
    // scalar agg, the pushdown-showcase query
    "q6_forecast_revenue" -> ((s, dir) =>
      read(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          sum(round(col("l_extendedprice") * col("l_discount") * 10000)
            .cast(LongType)).as("revenue_e4"),
          count(lit(1)).as("n_rows"))),

    // TPC-H Q14 shape: promo revenue share — lineitem × part on
    // partkey over one ship month. part is UNHINTED (it grows with
    // SF like customer — AQE broadcasts while it fits); the month
    // filter pre-shrinks the fact side before the join
    "q14_promo_revenue" -> ((s, dir) => {
      val li = read(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-09-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-10-01 00:00:00")))
      li.join(read(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revE4).otherwise(lit(0L)))
            .cast(LongType).as("promo_e4"),
          sum(revE4).as("total_e4"))
    }),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // join so zero-order customers keep their bucket, then a second
    // aggregation over the (SF-sized → tiny) per-customer counts; the
    // expensive first join shuffles once on custkey
    "q13_order_distribution" -> ((s, dir) => {
      val perCust = read(s, dir, "customer")
        .join(read(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q17 shape: small-quantity revenue — lineitems of one
    // brand's parts whose quantity is under 20% of that part's average
    // quantity (the correlated-subquery pattern as an aggregate
    // self-join on partkey). Quantities are integer-valued doubles, so
    // the per-part average is an exact-integer sum over a count —
    // deterministic across partial-aggregation orders, which is what
    // lets a float threshold survive the hash compare.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val brandParts = read(s, dir, "part")
        .where(col("p_brand") === "Brand#4").select(col("p_partkey"))
      val li = read(s, dir, "lineitem")
        .join(brandParts, col("l_partkey") === col("p_partkey"))
      val avgQ = li.groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("aq"))
      li.join(avgQ, Seq("l_partkey"))
        .where(col("l_quantity") < lit(0.2) * col("aq"))
        .agg(
          sum(round(col("l_extendedprice") * 100).cast(LongType))
            .as("sum_cents"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q7 shape: volume shipping between two nations — the
    // bidirectional nation-pair filter composes under both dimension
    // joins; nation/supplier broadcast, customer UNHINTED (scales
    // with SF), lineitem shuffles once on orderkey
    "q7_nation_volume" -> ((s, dir) => {
      val nations = Seq("NATION_10", "NATION_11", "NATION_12", "NATION_20")
      val nat = read(s, dir, "nation")
        .where(col("n_name").isin(nations: _*))
      val sup = read(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = read(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val li = read(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      li.join(read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("l_year"))
        .agg(sum(revE4).as("revenue_e4"))
    }),

    // TPC-H Q8 shape: national market share — one star join feeds a
    // per-year conditional revenue split; the share ratio is the only
    // double (two exact longs divided once, identically both engines)
    "q8_market_share" -> ((s, dir) => {
      val asia = read(s, dir, "nation")
        .join(broadcast(read(s, dir, "region")
          .where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))
      val cust = read(s, dir, "customer")
        .join(broadcast(asia), col("c_nationkey") === col("cnk"))
        .select(col("c_custkey"))
      val promo = read(s, dir, "part").where(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val ord = read(s, dir, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      val supNation = read(s, dir, "supplier")
        .join(broadcast(read(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      read(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(promo, col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_10", revE4)
            .otherwise(lit(0L))).as("nation_e4"),
          sum(revE4).as("total_e4"))
        .withColumn("share_e6",
          floor(lit(1000000.0) *
            (col("nation_e4").cast("double") / col("total_e4").cast("double")))
            .cast(LongType))
    }),

    // TPC-H Q12 shape: shipping-priority profile — join + conditional
    // aggregation (CASE inside SUM); the date window pre-shrinks the
    // fact side before the single orderkey shuffle
    "q12_priority_shipping" -> ((s, dir) => {
      val li = read(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      li.join(read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
    }),

    // TPC-H Q15 shape: top supplier by quarter revenue — agg, then a
    // scalar MAX over the agg joined back (the view + subquery
    // pattern); revenue is integral e4 so the max gate is exact
    "q15_top_supplier" -> ((s, dir) => {
      val rev = read(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(sum(revE4).as("total_e4"))
      val top = rev.agg(max(col("total_e4")).as("__max"))
      rev.crossJoin(broadcast(top))
        .where(col("total_e4") === col("__max"))
        .join(broadcast(read(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_e4"))
    }),

    // TPC-H Q19 shape: disjunctive multi-attribute predicate (OR of
    // brand × size × quantity bands) spanning the lineitem × part
    // join — the OR must evaluate post-join, but each disjunct's
    // single-table conjuncts (quantity cap, size floor) still push
    // into the scans as derived range filters
    "q19_banded_revenue" -> ((s, dir) => {
      val li = read(s, dir, "lineitem")
      li.join(read(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#1" &&
            col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" &&
            col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" &&
            col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(revE4).as("revenue_e4"), count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q22 shape: idle above-average customers — a scalar AVG
    // subquery (broadcast 1-row) gating the dimension, then an
    // anti-join against recent orders; balances stay in integral
    // cents so the average threshold is an exact-integer division
    "q22_idle_balances" -> ((s, dir) => {
      val cust = read(s, dir, "customer")
        .withColumn("bal_cents",
          round(col("c_acctbal") * 100).cast(LongType))
      val thr = cust.where(col("bal_cents") > 0)
        .agg((sum(col("bal_cents")).cast("double") / count(lit(1)))
          .as("__avg"))
      val recent = read(s, dir, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(thr))
        .where(col("bal_cents") > col("__avg"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("bal_cents")).as("total_cents"))
    }),

    // the routing rule crossing into the RELATIONAL plane: a revenue
    // materialized view over lineitem (slice partials keyed on
    // (returnflag, linestatus), bucketed by ship date) registered with
    // the SAME Catalyst rule that serves event rollups — the user
    // writes a plain filtered GROUP BY over lineitem and the rewrite
    // swaps in the MV, so at 100 TB the pricing summary scans
    // O(flags × statuses × days) partial rows, never a lineitem. The
    // oracle computes from raw lineitem: routed ≡ raw is the gate
    "q1_routed_mv" -> ((s, dir) => {
      import graft.operators.Rollups
      import graft.plans.RollupRouting
      val li = read(s, dir, "lineitem").withColumn("rev_e4", revE4)
      val dims = Seq("l_returnflag", "l_linestatus")
      q1MvDirs.getOrElseUpdate((s, dir), {
        val out = java.nio.file.Files
          .createTempDirectory("graft_mv_q1").toString
        Rollups.materializePartials(li, dims, out,
          tsCol = "l_shipdate", valueCol = "rev_e4")
        RollupRouting.install(s)
        RollupRouting.register(s, li, Rollups.read(s, out), dims,
          tsCol = "l_shipdate", valueCol = "rev_e4")
        out
      })
      li.where(col("l_shipdate") <
          lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("count_order"),
          sum(col("rev_e4")).as("sum_disc_e4"),
          min(col("rev_e4")).as("min_disc_e4"),
          max(col("rev_e4")).as("max_disc_e4"))
    }),

    // TPC-H Q21 shape: suppliers who kept orders waiting — the classic
    // EXISTS + NOT-EXISTS double self-join on the fact table, rewritten
    // as ONE per-order aggregate (n_supps, n_fault_supps): a lineitem
    // qualifies iff its order has ≥2 suppliers and exactly one faulting
    // supplier (itself). At 100 TB this replaces two shuffled fact-side
    // self-joins with a single orderkey groupBy + one re-join — the
    // fact table shuffles twice total instead of four times, and the
    // per-order aggregate is two small longs per order. The synthetic
    // lineitem has no receipt/commit dates, so "fault" is the return
    // flag; the shape (multi-supplier order, sole guilty party) is Q21's.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val li = read(s, dir, "lineitem")
      val perOrder = li.groupBy(col("l_orderkey").as("ok"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("n_fault_supps"))
      val fOrders = read(s, dir, "orders")
        .where(col("o_orderstatus") === "F").select(col("o_orderkey"))
      li.where(col("l_returnflag") === "R")
        .join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .join(perOrder, col("l_orderkey") === col("ok"))
        .where(col("n_supps") >= 2 && col("n_fault_supps") === 1)
        .join(broadcast(read(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    }),

    // TPC-H Q2 shape: minimum-cost supplier — the correlated-MIN
    // subquery over a region-scoped supplier set. The reference Q2
    // reads partsupp; this schema's part↔supplier relation IS lineitem,
    // so "cost" is the cheapest line (integral cents) a supplier ever
    // quoted for the part. Region×nation×supplier composes to a tiny
    // broadcast; the two aggregates (per-(part,supplier) min, then
    // per-part min) REUSE one partkey-clustered shuffle — the second
    // groupBy is a re-aggregation of the first's output, never a second
    // lineitem pass — and the argmin join is partkey-co-partitioned.
    // The top-100 is a TakeOrdered on the unique (part, supplier) key,
    // never a global sort.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val esupp = read(s, dir, "supplier")
        .join(broadcast(read(s, dir, "nation")
          .join(broadcast(read(s, dir, "region")
            .where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val stdParts = read(s, dir, "part")
        .where(col("p_type") === "STANDARD").select(col("p_partkey"))
      val pc = read(s, dir, "lineitem")
        .join(stdParts, col("l_partkey") === col("p_partkey"))
        .join(broadcast(esupp.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") * 100).cast(LongType))
          .as("cost_cents"))
      val mc = pc.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("cost_cents")).as("min_cents"))
      pc.join(mc, col("l_partkey") === col("mk") &&
          col("cost_cents") === col("min_cents"))
        .join(broadcast(esupp), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"),
          col("l_suppkey").as("s_suppkey"),
          col("s_name"), col("n_name"), col("cost_cents"))
        .orderBy(col("p_partkey"), col("s_suppkey"))
        .limit(100)
    }),

    // TPC-H Q9 shape: product-type profit — the LIKE-filtered part scan
    // under the full 5-way star (lineitem⋈part⋈supplier⋈nation⋈orders),
    // grouped by supplier nation × order year. No supplycost column
    // exists, so profit = discounted revenue minus the tax amount, each
    // term rounded e4 PER ROW before the LONG sum (exact, order-free).
    // The LIKE conjunct can't prune the parquet scan to a range, but it
    // pre-shrinks the build side before the partkey shuffle; supplier
    // and nation broadcast.
    "q9_product_profit" -> ((s, dir) => {
      val redParts = read(s, dir, "part")
        .where(col("p_name").like("%red%")).select(col("p_partkey"))
      val supNation = read(s, dir, "supplier")
        .join(broadcast(read(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      read(s, dir, "lineitem")
        .join(redParts, col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(sum(
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast(LongType) -
          round(col("l_extendedprice") * col("l_tax") * 10000)
            .cast(LongType)).as("profit_e4"))
    }),

    // TPC-H Q11 shape: important stock — per-group value share against
    // a GLOBAL scalar total (the HAVING sum(...) > fraction × Σ
    // pattern). Scoped to one region's suppliers (broadcast semi); the
    // per-part values aggregate once and the total re-aggregates THAT
    // output (1 row, broadcast crossJoin — q15/q22's idiom), so
    // lineitem is scanned and shuffled exactly once. The share gate is
    // exact integer arithmetic: value×1000 > total in LONGs (value_e4
    // sums stay < 2⁶³/1000 through SF-10), so no float threshold ever
    // enters the hash compare. Fraction 1/1000 ≈ 2× the mean share at
    // 2000 parts — scale-invariant under fixture cloning because value
    // and total grow together.
    "q11_important_parts" -> ((s, dir) => {
      val rsupp = read(s, dir, "supplier")
        .join(broadcast(read(s, dir, "nation")
          .join(broadcast(read(s, dir, "region")
            .where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val v = read(s, dir, "lineitem")
        .join(broadcast(rsupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(sum(revE4).as("value_e4"))
      val total = v.agg(sum(col("value_e4")).as("total_e4"))
      v.crossJoin(broadcast(total))
        .where(col("value_e4") * 1000 > col("total_e4"))
        .select(col("p_partkey"), col("value_e4"))
    }),

    // TPC-H Q16 shape: supplier-part relationship counts — COUNT
    // DISTINCT suppliers per part attribute combo with a NOT-IN
    // excluded supplier set. The exclusion (negative balance standing
    // in for Q16's complaint LIKE) is a broadcast ANTI join on the fact
    // side — row-local, no shuffle — and the attribute filters shrink
    // part before its partkey join. The distinct count rides Spark's
    // partial-dedup expand on the single (brand,type,size) shuffle.
    "q16_supplier_counts" -> ((s, dir) => {
      val badSupp = read(s, dir, "supplier")
        .where(col("s_acctbal") < 0).select(col("s_suppkey"))
      val parts = read(s, dir, "part")
        .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      read(s, dir, "lineitem")
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q20 shape: excess-threshold suppliers — the nested-IN
    // pattern (suppliers IN (… partkey IN (LIKE-filtered parts) AND
    // qty > fraction × correlated SUM)). Without availqty the excess
    // test becomes "shipped a MAJORITY of the part's 1997 volume":
    // per-(supplier,part) sums re-aggregate to per-part totals on the
    // same partkey clustering (one lineitem pass, date-pruned at the
    // scan), the majority gate is exact integer 2×sq > tq on LONG
    // quantities, and the region scope is a broadcast semi at the END —
    // it prunes suppliers, not lineitems, exactly like Q20's outer
    // nation filter. Output counts dominated parts per supplier, so the
    // result discriminates rather than just listing the region.
    "q20_excess_suppliers" -> ((s, dir) => {
      val rp = read(s, dir, "part")
        .where(col("p_name").like("red%")).select(col("p_partkey"))
      val sq = read(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .join(rp, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast(LongType)).as("supp_qty"))
      val tq = sq.groupBy(col("l_partkey").as("tk"))
        .agg(sum(col("supp_qty")).as("part_qty"))
      val asupp = read(s, dir, "supplier")
        .join(broadcast(read(s, dir, "nation")
          .join(broadcast(read(s, dir, "region")
            .where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      sq.join(tq, col("l_partkey") === col("tk"))
        .where(col("supp_qty") * 2 > col("part_qty"))
        .join(broadcast(asupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_dominated"))
    }),

    // numeric-pair CORRELATION profile (the dataset-card association
    // read): Pearson r between quantity, price cents, and discount
    // bps over one single-pass aggregation — every Σx/Σx²/Σxy stays
    // exact decimal(38,0); r's numerator and the two variance factors
    // convert to double ONCE each and the sqrt is IEEE
    // correctly-rounded, so both engines floor the same e6 value. No
    // second scan, no window: one map-side-combined aggregate row
    "lineitem_corr" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val dec = DecimalType(38, 0)
      val li = read(s, dir, "lineitem").select(
        col("l_quantity").cast(LongType).as("q"),
        round(col("l_extendedprice") * 100).cast(LongType).as("p"),
        round(col("l_discount") * 10000).cast(LongType).as("d"))
      def sd(c: Column) = sum(c.cast(dec))
      val agg = li.agg(
        count(lit(1)).as("n"),
        sd(col("q")).as("sq"), sd(col("p")).as("sp"), sd(col("d")).as("sd"),
        sd(col("q") * col("q")).as("sqq"),
        sd(col("p") * col("p")).as("spp"),
        sd(col("d") * col("d")).as("sdd"),
        sd(col("q") * col("p")).as("sqp"),
        sd(col("q") * col("d")).as("sqd"),
        sd(col("p") * col("d")).as("spd"))
      def corrE6(sxy: Column, sx: Column, sy: Column,
          sxx: Column, syy: Column) = {
        val n = col("n").cast(dec)
        val num = (n * sxy - sx * sy).cast(DoubleType)
        val vx = (n * sxx - sx * sx).cast(DoubleType)
        val vy = (n * syy - sy * sy).cast(DoubleType)
        floor(lit(1000000.0) * (num / sqrt(vx * vy))).cast(LongType)
      }
      agg.select(col("n"),
        corrE6(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp"))
          .as("corr_qty_price_e6"),
        corrE6(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd"))
          .as("corr_qty_disc_e6"),
        corrE6(col("spd"), col("sp"), col("sd"), col("spp"), col("sdd"))
          .as("corr_price_disc_e6"))
    }),

    // window function: top-3 orders per customer, deterministic tie-break
    "topk_orders_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      read(s, dir, "orders")
        .where(col("o_custkey") < 100)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("total_cents"),
          col("rn"))
    }),

    // set-operation breadth: customers ordering in 1996 but not 1997
    // (EXCEPT on key sets, then a broadcast-joined segment roll-up)
    "churned_customers_1997" -> ((s, dir) => {
      val ord = read(s, dir, "orders")
      def inYear(y: Int) = ord.where(year(col("o_orderdate")) === y)
        .select(col("o_custkey"))
      val churned = inYear(1996).except(inYear(1997))
      read(s, dir, "customer")
        .join(churned, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // window-frame breadth: running spend per customer over order time
    // (ROWS UNBOUNDED PRECEDING cumulative sum, deterministic ordering)
    "cumulative_customer_spend" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      read(s, dir, "orders")
        .where(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(round(col("o_totalprice") * 100).cast(LongType)).over(w)
            .as("cum_cents"))
    }),

    // semi/anti-join breadth: customers with no orders in the window
    "customers_without_orders" -> ((s, dir) => {
      val ord = read(s, dir, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
      read(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // ENTITY RESOLUTION (graft.operators.EntityResolution): fuzzy
    // matches between distinct part names — token blocking (df-capped
    // posting join, never |names|²) verified by threshold levenshtein
    // (early-exit codegen). All pairwise work at attribute
    // cardinality; the 20k/2M/200M-row part table never pairs.
    "er_part_matches" -> ((s, dir) =>
      graft.operators.EntityResolution.matches(
        read(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 1, maxTokenDf = 1000)),

    // transitive entity per part record: value-level match graph →
    // connected components (labels = min partkey reachable) → one
    // equality join back onto records
    "er_part_entities" -> ((s, dir) =>
      graft.operators.EntityResolution.entities(
        read(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 1, maxTokenDf = 1000)
        .withColumnRenamed("p_partkey", "partkey")),

    // multi-blocker form (token ∪ prefix-2 ∪ suffix-2 blocks): full
    // 1-edit recall even inside single-token values; on this fixture
    // the match SET must equal the token-blocked one — two blockers,
    // one truth
    "er_part_matches_multi" -> ((s, dir) =>
      graft.operators.EntityResolution.matchesMulti(
        read(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 1, maxBlockDf = 1000)),

    // INCREMENTAL resolution (the daily-arrivals path): parts with
    // key%5=0 arrive as a new batch against the corpus resolved over
    // the rest — batch-vs-corpus blocking only, the corpus never
    // re-pairs against itself; unmatched values become singletons
    "er_incremental" -> ((s, dir) => {
      val (build, readPhase) = erIncrementalPhases(s, dir)
      build(); readPhase()
    }),

    // blocking observability: the read that tunes maxTokenDf before
    // paying for a bad blocking run — counts only, 1-row output
    "er_block_profile" -> ((s, dir) =>
      graft.operators.EntityResolution.blockingProfile(
        read(s, dir, "part"), "p_partkey", "p_name", maxTokenDf = 1000)),

    // survivorship: canonical name per entity (max record support,
    // tie → lexicographically smallest), sized by value and record
    // counts — one window at attribute cardinality
    "er_part_canonical" -> ((s, dir) =>
      graft.operators.EntityResolution.canonicalValues(
        read(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 1, maxTokenDf = 1000)))

  /** Two-phase decomposition of the INCREMENTAL entity resolution for
    * the bench (r14 VERDICT #6 — the other lifecycle keys' split
    * discipline): BUILD resolves the standing corpus into the pinned
    * (value, entity) store — attribute-cardinality rows, referenced by
    * blocking AND scoring AND assignment, so the eager checkpoint also
    * stops the corpus-resolve DAG (CC rounds included) re-executing
    * once per reference; READ folds the daily batch against it
    * (batch-vs-corpus blocking only — the corpus never re-pairs).
    * The combined `er_incremental` query is exactly build(); read(). */
  private def erIncrementalPhases(s: SparkSession,
      dir: String): (() => Unit, () => DataFrame) = {
    val part = read(s, dir, "part")
    val corpus = part.where(col("p_partkey") % 5 =!= 0)
    val batch = part.where(col("p_partkey") % 5 === 0)
    var resolved: DataFrame = null
    val build = () => {
      resolved = graft.operators.EntityResolution
        .entities(corpus, "p_partkey", "p_name", maxDist = 1,
          maxTokenDf = 1000)
        .select(col("value"), col("entity")).distinct()
        .localCheckpoint(true)
      ()
    }
    val readPhase = () => graft.operators.EntityResolution
      .resolveIncremental(
        batch, "p_partkey", "p_name", resolved, maxDist = 1,
        maxTokenDf = 1000,
        // batch ids ≡ 0 (mod 5), corpus entity ids ≢ 0 — provably
        // disjoint, so the contract guard is free to leave on
        validateDisjoint = true)
      .withColumnRenamed("p_partkey", "partkey")
    (build, readPhase)
  }

  /** The lifecycle queries' two-phase forms, consumed by
    * [[graft.Bench]] for separate `__build` / `__read` timings. */
  val lifecycleSplits
      : Map[String, (SparkSession, String) => (() => Unit, () => DataFrame)] =
    Map("er_incremental" -> (erIncrementalPhases _))

  /** Shared ER pipeline head: distinct normalized part names with
    * min-partkey node ids, token blocking (df ≤ 1000), and the
    * levenshtein-verified match set — the entity/canonical oracles
    * extend this with the recursive reachability closure. */
  private val erHeadSql: String =
    """names AS (
      |  SELECT lower(trim(p_name)) AS value, min(p_partkey) AS node_id,
      |         count(*) AS n_records
      |  FROM part
      |  WHERE length(lower(trim(p_name))) > 0
      |  GROUP BY 1),
      |tok AS (SELECT value,
      |  unnest(list_distinct(string_split_regex(value, '\s+'))) AS t
      |  FROM names),
      |keep AS (SELECT t FROM tok GROUP BY t HAVING count(*) <= 1000),
      |cand AS (SELECT DISTINCT a.value AS val_a, b.value AS val_b
      |  FROM tok a JOIN keep USING (t) JOIN tok b USING (t)
      |  WHERE a.value < b.value),
      |m AS (SELECT val_a, val_b,
      |  CAST(levenshtein(val_a, val_b) AS BIGINT) AS dist
      |  FROM cand WHERE levenshtein(val_a, val_b) <= 1)""".stripMargin

  /** Reachability closure over the ER match graph → (node_id, entity). */
  private val erCompSql: String =
    """e AS (SELECT na.node_id AS a, nb.node_id AS b
      |  FROM m JOIN names na ON na.value = m.val_a
      |         JOIN names nb ON nb.value = m.val_b),
      |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
      |reach AS (SELECT node_id AS a, node_id AS b FROM names
      |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b),
      |comp AS (SELECT a AS node_id, min(b) AS entity FROM reach GROUP BY 1)""".stripMargin

  /** Shared by `quality_report` and its SQL-view twin: each
    * constraint recomputed independently; null predicate values
    * count as violations (unknown does not pass a gate), uniqueness
    * counts surplus rows per key (null keys participate), the FK
    * uses NOT EXISTS so reference duplicates cannot multiply
    * counts. */
  private val qualityReportSql: String =
      """WITH v AS (
        |  SELECT 'not_null(l_orderkey)' AS "check",
        |    CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END)
        |      AS BIGINT) AS violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'satisfies(quantity_le_49)',
        |    CAST(count(CASE WHEN NOT coalesce(l_quantity <= 49, false)
        |      THEN 1 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique(l_orderkey,l_linenumber)',
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |      AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique(l_orderkey)',
        |    CAST(count(*) - count(DISTINCT (l_orderkey)) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'foreign_key(l_orderkey->orders.o_orderkey)',
        |    CAST(count(CASE WHEN l.l_orderkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM orders o
        |                      WHERE o.o_orderkey = l.l_orderkey)
        |      THEN 1 END) AS BIGINT)
        |  FROM lineitem l)
        |SELECT "check", violations,
        |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM v""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "er_part_matches" ->
      s"""WITH $erHeadSql
         |SELECT val_a, val_b, dist,
         |  CAST(floor(10000 * (greatest(length(val_a), length(val_b)) - dist)
         |    / greatest(length(val_a), length(val_b))) AS BIGINT) AS sim_e4
         |FROM m""".stripMargin,

    "er_part_matches_multi" ->
      s"""WITH names AS (
         |  SELECT lower(trim(p_name)) AS value FROM part
         |  WHERE length(lower(trim(p_name))) > 0 GROUP BY 1),
         |keys AS (
         |  SELECT value, unnest(list_distinct(list_concat(
         |    list_transform(list_distinct(string_split_regex(value, '\\s+')),
         |      t -> 't' || chr(1) || t),
         |    ['p' || chr(1) || left(value, 2),
         |     's' || chr(1) || right(value, 2)]))) AS t
         |  FROM names),
         |keep AS (SELECT t FROM keys GROUP BY t HAVING count(*) <= 1000),
         |cand AS (SELECT DISTINCT a.value AS val_a, b.value AS val_b
         |  FROM keys a JOIN keep USING (t) JOIN keys b USING (t)
         |  WHERE a.value < b.value)
         |SELECT val_a, val_b,
         |  CAST(levenshtein(val_a, val_b) AS BIGINT) AS dist,
         |  CAST(floor(10000 * (greatest(length(val_a), length(val_b))
         |      - levenshtein(val_a, val_b))
         |    / greatest(length(val_a), length(val_b))) AS BIGINT) AS sim_e4
         |FROM cand WHERE levenshtein(val_a, val_b) <= 1""".stripMargin,

    "er_incremental" ->
      """WITH RECURSIVE names AS (
        |  SELECT lower(trim(p_name)) AS value, min(p_partkey) AS node_id
        |  FROM part
        |  WHERE p_partkey % 5 <> 0 AND length(lower(trim(p_name))) > 0
        |  GROUP BY 1),
        |tok AS (SELECT value,
        |  unnest(list_distinct(string_split_regex(value, '\s+'))) AS t
        |  FROM names),
        |keep AS (SELECT t FROM tok GROUP BY t HAVING count(*) <= 1000),
        |cand AS (SELECT DISTINCT a.value AS val_a, b.value AS val_b
        |  FROM tok a JOIN keep USING (t) JOIN tok b USING (t)
        |  WHERE a.value < b.value),
        |m AS (SELECT val_a, val_b FROM cand
        |      WHERE levenshtein(val_a, val_b) <= 1),
        |e AS (SELECT na.node_id AS a, nb.node_id AS b
        |  FROM m JOIN names na ON na.value = m.val_a
        |         JOIN names nb ON nb.value = m.val_b),
        |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        |reach AS (SELECT node_id AS a, node_id AS b FROM names
        |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b),
        |comp AS (SELECT a AS node_id, min(b) AS entity FROM reach GROUP BY 1),
        |resolved AS (SELECT n.value, c.entity
        |             FROM names n JOIN comp c USING (node_id)),
        |newrec AS (SELECT p_partkey, lower(trim(p_name)) AS value FROM part
        |  WHERE p_partkey % 5 = 0 AND length(lower(trim(p_name))) > 0),
        |newvals AS (SELECT value, min(p_partkey) AS node_id
        |            FROM newrec GROUP BY 1),
        |ctok AS (SELECT value,
        |  unnest(list_distinct(string_split_regex(value, '\s+'))) AS t
        |  FROM (SELECT DISTINCT value FROM resolved)),
        |ckeep AS (SELECT t FROM ctok GROUP BY t HAVING count(*) <= 1000),
        |ntok AS (SELECT value AS val_new,
        |  unnest(list_distinct(string_split_regex(value, '\s+'))) AS t
        |  FROM newvals),
        |cand2 AS (SELECT DISTINCT n.val_new, c.value AS val_old
        |  FROM ntok n JOIN ckeep USING (t) JOIN ctok c USING (t)),
        |scored AS (SELECT c2.val_new, c2.val_old,
        |    levenshtein(c2.val_new, c2.val_old) AS dist, r.entity
        |  FROM cand2 c2 JOIN resolved r ON r.value = c2.val_old
        |  WHERE levenshtein(c2.val_new, c2.val_old) <= 1),
        |best AS (SELECT val_new AS value, entity, row_number() OVER (
        |    PARTITION BY val_new ORDER BY dist, entity) AS rk FROM scored)
        |SELECT nr.p_partkey AS partkey, nr.value,
        |  coalesce(b.entity, nv.node_id) AS entity
        |FROM newrec nr
        |JOIN newvals nv USING (value)
        |LEFT JOIN (SELECT value, entity FROM best WHERE rk = 1) b
        |  USING (value)""".stripMargin,

    "er_block_profile" ->
      s"""WITH $erHeadSql,
         |dfc AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
         |nv AS (SELECT count(*) AS n_values FROM names),
         |ts AS (SELECT count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN c > 1000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hot FROM dfc),
         |nc AS (SELECT count(*) AS n_candidates FROM cand)
         |SELECT nv.n_values, ts.n_tokens, ts.n_hot, nc.n_candidates,
         |  (10000 * nc.n_candidates)
         |    // ((nv.n_values * (nv.n_values - 1)) // 2) AS reduction_e4
         |FROM nv, ts, nc""".stripMargin,

    "er_part_entities" ->
      s"""WITH RECURSIVE $erHeadSql,
         |$erCompSql
         |SELECT p.p_partkey AS partkey, n.value, c.entity
         |FROM part p
         |JOIN names n ON n.value = lower(trim(p.p_name))
         |JOIN comp c ON c.node_id = n.node_id""".stripMargin,

    "er_part_canonical" ->
      s"""WITH RECURSIVE $erHeadSql,
         |$erCompSql,
         |vals AS (SELECT n.value, n.n_records, c.entity
         |         FROM names n JOIN comp c USING (node_id)),
         |agg AS (SELECT entity, count(*) AS n_values,
         |        CAST(sum(n_records) AS BIGINT) AS n_records
         |        FROM vals GROUP BY 1),
         |best AS (SELECT entity, value AS canonical, row_number() OVER (
         |    PARTITION BY entity ORDER BY n_records DESC, value ASC) AS rk
         |  FROM vals)
         |SELECT b.entity, b.canonical, a.n_values, a.n_records
         |FROM best b JOIN agg a USING (entity) WHERE rk = 1""".stripMargin,

    // the UNPRUNED pair count — hash-matching the a-priori-pruned
    // Spark plan is exactly the monotonicity guarantee
    "basket_frequent_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |           FROM lineitem)
        |SELECT a.i AS item_a, b.i AS item_b, count(*) AS support
        |FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    "basket_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |           FROM lineitem),
        |pairs AS (
        |  SELECT a.i AS item_a, b.i AS item_b, count(*) AS support
        |  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |directed AS (
        |  SELECT item_a AS antecedent, item_b AS consequent, support FROM pairs
        |  UNION ALL
        |  SELECT item_b, item_a, support FROM pairs),
        |isup AS (SELECT i, count(*) AS s FROM bi GROUP BY 1),
        |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM bi)
        |SELECT d.antecedent, d.consequent, d.support,
        |  (10000 * d.support) // sa.s AS confidence_e4,
        |  CAST((10000::HUGEINT * d.support * nb.n_baskets)
        |    // (sa.s::HUGEINT * sc.s) AS BIGINT) AS lift_e4
        |FROM directed d
        |JOIN isup sa ON sa.i = d.antecedent
        |JOIN isup sc ON sc.i = d.consequent
        |CROSS JOIN nb""".stripMargin,

    "basket_frequent_triples" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |           FROM lineitem)
        |SELECT a.i AS item_a, c.i AS item_b, d.i AS item_c,
        |  count(*) AS support
        |FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        |JOIN bi d ON a.b = d.b AND c.i < d.i
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin,

    // the UNORIENTED 3-way self-join triangle enumeration — the
    // degree-oriented Spark plan must be answer-invisible
    "basket_triangles" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b,
        |             l_partkey AS i FROM lineitem),
        |und AS (SELECT DISTINCT least(a.i, c.i) AS u, greatest(a.i, c.i) AS v
        |        FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i),
        |tris AS (
        |  SELECT e1.u AS a, e1.v AS b2, e2.v AS c
        |  FROM und e1 JOIN und e2 ON e2.u = e1.v
        |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (
        |  SELECT a AS id FROM tris
        |  UNION ALL SELECT b2 FROM tris
        |  UNION ALL SELECT c FROM tris),
        |deg AS (
        |  SELECT id, count(*) AS degree FROM (
        |    SELECT u AS id FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY 1),
        |tcnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY 1)
        |SELECT d.id, d.degree, coalesce(t.triangles, 0) AS triangles,
        |  CASE WHEN d.degree >= 2 THEN (10000 * 2 * coalesce(t.triangles, 0))
        |    // (d.degree * (d.degree - 1)) END AS cc_e4
        |FROM deg d LEFT JOIN tcnt t USING (id)""".stripMargin,

    // the estimator replayed end to end: same seeded-md5 membership
    // (hex-cast ≡ Spark conv(substring(md5,1,15),16,10)), same plain
    // 3-way triangle join on the kept edges, same ⌊t·10¹²/2500³⌋
    // decimal-exact scale-up
    "basket_triangles_approx" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b,
        |             l_partkey AS i FROM lineitem),
        |und AS (SELECT DISTINCT least(a.i, c.i) AS u, greatest(a.i, c.i) AS v
        |        FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i),
        |kept AS (SELECT u, v FROM und
        |  WHERE CAST(('0x'||substr(md5('7:' || u || ':' || v), 1, 15))
        |          AS BIGINT) % 10000 < 2500),
        |tri AS (SELECT count(*) AS t FROM kept e1
        |        JOIN kept e2 ON e2.u = e1.v
        |        JOIN kept e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
        |  CAST((SELECT count(*) FROM kept) AS BIGINT) AS kept_edges,
        |  CAST(t AS BIGINT) AS sampled_triangles,
        |  CAST(floor((CAST(t AS DECIMAL(38,0)) * 1000000000000)
        |    / 15625000000) AS BIGINT) AS est_triangles
        |FROM tri""".stripMargin,

    // recursive-CTE walk, hop-capped, min hops per node — the
    // iterative frontier expansion must agree with the declarative
    // transitive closure
    "basket_hops" ->
      """WITH RECURSIVE bi AS (SELECT DISTINCT l_orderkey AS b,
        |             l_partkey AS i FROM lineitem),
        |und AS (SELECT DISTINCT least(a.i, c.i) AS u, greatest(a.i, c.i) AS v
        |        FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i),
        |e AS (SELECT u AS src, v AS dst FROM und
        |      UNION ALL SELECT v, u FROM und),
        |walk(id, hops) AS (
        |  SELECT CAST(42 AS BIGINT), 0
        |  UNION
        |  SELECT e.dst, walk.hops + 1
        |  FROM walk JOIN e ON e.src = walk.id
        |  WHERE walk.hops < 6)
        |SELECT id, CAST(min(hops) AS BIGINT) AS hops
        |FROM walk GROUP BY 1""".stripMargin,

    "quality_report" -> qualityReportSql,

    // the SQL-view twin shares the gate verbatim
    "quality_report_sql" -> qualityReportSql,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY ALL""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o.o_orderkey, o.o_orderdate,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY ALL
        |ORDER BY revenue_e4 DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY ALL""".stripMargin,

    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY ALL
        |ORDER BY revenue_e4 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q18_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING CAST(sum(l_quantity) AS BIGINT) > 250)
        |SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
        |  b.total_qty
        |FROM orders o
        |JOIN big b ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY ALL""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT
        |  CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_e4,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_e4
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH bl AS (
        |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#4'),
        |aq AS (
        |  SELECT l_partkey, avg(l_quantity) AS aq FROM bl GROUP BY 1)
        |SELECT
        |  CAST(sum(CAST(round(bl.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  count(*) AS n_rows
        |FROM bl JOIN aq USING (l_partkey)
        |WHERE bl.l_quantity < 0.2 * aq.aq""".stripMargin,

    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_10', 'NATION_11', 'NATION_12', 'NATION_20')
        |  AND cn.n_name IN ('NATION_10', 'NATION_11', 'NATION_12', 'NATION_20')
        |  AND sn.n_name <> cn.n_name
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY ALL""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN sn.n_name = 'NATION_10'
        |    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS nation_e4,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_e4,
        |  CAST(floor(CAST(1000000.0 AS DOUBLE) *
        |    (CAST(sum(CASE WHEN sn.n_name = 'NATION_10'
        |       THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
        |       ELSE 0 END) AS DOUBLE)
        |     / CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS DOUBLE)))
        |    AS BIGINT) AS share_e6
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region r ON cn.n_regionkey = r.r_regionkey
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "q12_priority_shipping" ->
      """SELECT l.l_linestatus,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, rev.total_e4
        |FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        |WHERE rev.total_e4 = (SELECT max(total_e4) FROM rev)""".stripMargin,

    "q19_banded_revenue" ->
      """SELECT
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_rows
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE
        |  (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q22_idle_balances" ->
      """WITH cb AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |thr AS (
        |  SELECT CAST(sum(bal_cents) AS DOUBLE) / count(*) AS avg_cents
        |  FROM cb WHERE bal_cents > 0)
        |SELECT cb.c_mktsegment, count(*) AS n_custs,
        |  CAST(sum(cb.bal_cents) AS BIGINT) AS total_cents
        |FROM cb CROSS JOIN thr
        |WHERE cb.bal_cents > thr.avg_cents
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = cb.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |GROUP BY 1""".stripMargin,

    // routed ≡ raw is the gate: the oracle never sees the MV
    "q1_routed_mv" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  CAST(min(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS min_disc_e4,
        |  CAST(max(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS max_disc_e4
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    // Independently-written correlated-subquery form (the literal Q21
    // text) — validates the aggregate rewrite, not just the numbers.
    "q21_waiting_suppliers" ->
      """SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE l1.l_returnflag = 'R' AND o.o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 20""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH esupp AS (
        |  SELECT s.s_suppkey, s.s_name, n.n_name
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |pc AS (
        |  SELECT l.l_partkey, l.l_suppkey,
        |    CAST(min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cost_cents
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN esupp e ON l.l_suppkey = e.s_suppkey
        |  WHERE p.p_type = 'STANDARD'
        |  GROUP BY 1, 2),
        |mc AS (
        |  SELECT l_partkey, min(cost_cents) AS min_cents FROM pc GROUP BY 1)
        |SELECT pc.l_partkey AS p_partkey, pc.l_suppkey AS s_suppkey,
        |  e.s_name, e.n_name, pc.cost_cents
        |FROM pc
        |JOIN mc ON pc.l_partkey = mc.l_partkey
        |  AND pc.cost_cents = mc.min_cents
        |JOIN esupp e ON pc.l_suppkey = e.s_suppkey
        |ORDER BY p_partkey, s_suppkey
        |LIMIT 100""".stripMargin,

    "q9_product_profit" ->
      """SELECT n.n_name AS nation,
        |  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(
        |    CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
        |    - CAST(round(l.l_extendedprice * l.l_tax * 10000) AS BIGINT))
        |    AS BIGINT) AS profit_e4
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,

    "q11_important_parts" ->
      """WITH rsupp AS (
        |  SELECT s.s_suppkey FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |v AS (
        |  SELECT l.l_partkey AS p_partkey,
        |    CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
        |      AS value_e4
        |  FROM lineitem l JOIN rsupp ON l.l_suppkey = rsupp.s_suppkey
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(value_e4) AS BIGINT) AS total_e4 FROM v)
        |SELECT v.p_partkey, v.value_e4
        |FROM v CROSS JOIN t
        |WHERE v.value_e4 * 1000 > t.total_e4""".stripMargin,

    "q16_supplier_counts" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l.l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH rp AS (
        |  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        |sq AS (
        |  SELECT l.l_suppkey, l.l_partkey,
        |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
        |  FROM lineitem l JOIN rp ON l.l_partkey = rp.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |tq AS (
        |  SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
        |  FROM sq GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, count(*) AS n_dominated
        |FROM sq
        |JOIN tq ON sq.l_partkey = tq.l_partkey
        |JOIN supplier s ON sq.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' AND sq.supp_qty * 2 > tq.part_qty
        |GROUP BY 1, 2""".stripMargin,

    // exact HUGEINT moments; one double conversion per factor, IEEE
    // sqrt — identical floors on both engines
    "lineitem_corr" ->
      """WITH e AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
        |    CAST(round(l_discount * 10000) AS BIGINT) AS d
        |  FROM lineitem),
        |a AS (
        |  SELECT count(*) AS n, sum(q) AS sq, sum(p) AS sp, sum(d) AS sd,
        |    sum(q * q) AS sqq, sum(p * p) AS spp, sum(d * d) AS sdd,
        |    sum(q * p) AS sqp, sum(q * d) AS sqd, sum(p * d) AS spd
        |  FROM e)
        |SELECT n,
        |  CAST(floor(1000000.0 * (CAST(n * sqp - sq * sp AS DOUBLE) /
        |    sqrt(CAST(n * sqq - sq * sq AS DOUBLE) *
        |         CAST(n * spp - sp * sp AS DOUBLE)))) AS BIGINT)
        |    AS corr_qty_price_e6,
        |  CAST(floor(1000000.0 * (CAST(n * sqd - sq * sd AS DOUBLE) /
        |    sqrt(CAST(n * sqq - sq * sq AS DOUBLE) *
        |         CAST(n * sdd - sd * sd AS DOUBLE)))) AS BIGINT)
        |    AS corr_qty_disc_e6,
        |  CAST(floor(1000000.0 * (CAST(n * spd - sp * sd AS DOUBLE) /
        |    sqrt(CAST(n * spp - sp * sp AS DOUBLE) *
        |         CAST(n * sdd - sd * sd AS DOUBLE)))) AS BIGINT)
        |    AS corr_price_disc_e6
        |FROM a""".stripMargin,

    "topk_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders WHERE o_custkey < 100)
        |WHERE rn <= 3""".stripMargin,

    "churned_customers_1997" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |JOIN (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |) churned ON c_custkey = churned.o_custkey
        |GROUP BY ALL""".stripMargin,

    "cumulative_customer_spend" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |FROM orders WHERE o_custkey < 50""".stripMargin,

    "customers_without_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY ALL""".stripMargin)

  /** Plan-capture probes (tooling only — consumed by [[graft.PlanDump]],
    * never by the driver): the census-mode kept-edge frames of
    * `basket_triangles_approx`, whose work lives in internal count()
    * actions the declared query's 1-row explain can't show. */
  val planProbes: Map[String, (SparkSession, String) => DataFrame] = {
    def pairs(s: SparkSession, dir: String) = coPurchaseEdges(s, dir)
      .select(least(col("pa"), col("pb")).as("a"),
        greatest(col("pa"), col("pb")).as("b"))
      .where(col("a") =!= col("b"))
    def membership = pmod(graft.operators.Dedup.seededHash(
      concat_ws(":", col("a"), col("b")), 7), lit(10000L)) < lit(2500L)
    Map(
      // OLD census-mode kept set: second full scan + dedup shuffle of
      // the raw pair stream, beside the census's own distinct pass
      "basket_triangles_approx__kept_before" -> ((s: SparkSession, dir: String) =>
        pairs(s, dir).where(membership).dropDuplicates("a", "b")),
      // NEW: the census's distinct pass is pinned once and the kept
      // set is a row-local filter over it (scan shows ExistingRDD)
      "basket_triangles_approx__kept_after" -> ((s: SparkSession, dir: String) =>
        pairs(s, dir).dropDuplicates("a", "b").localCheckpoint(true)
          .where(membership)))
  }
}
