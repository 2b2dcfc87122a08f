package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over basket-shaped data — the co-occurrence
  * companion to the event-type affinity query (EventQueries
  * `event_type_affinity` counts ALL pairs over a tiny closed domain;
  * this operator is the open-domain form where the item universe is
  * large — parts, SKUs, tokens — and unpruned pair enumeration is the
  * scale killer).
  *
  * Semantics: a basket contains each item at most once (multiplicity
  * inside one basket does not add support — the standard market-basket
  * convention), the support of an itemset is the number of distinct
  * baskets containing ALL its items, and [[frequentPairs]] returns
  * every unordered pair with support ≥ `minSupport`.
  *
  * The A-PRIORI step (Agrawal & Srikant, VLDB'94) is what makes the
  * pair join survive scale: support is monotone (a pair's support is
  * ≤ each member's support), so items below `minSupport` on their own
  * can be removed BEFORE the per-basket self-join without changing the
  * answer — the prune is exact, not approximate, which is why the
  * driver query's oracle states the UNPRUNED plain pair count and
  * still hash-matches.
  *
  * Scale shape: one distinct pass (hash agg on (basket, item)), one
  * item-count agg, a broadcast semi-join against the frequent-item
  * set — bounded by N/minSupport items and therefore broadcastable BY
  * CONSTRUCTION at any corpus size (each frequent item needs
  * `minSupport` distinct baskets, so their count is at most
  * total-basket-item rows / minSupport) — then each basket's
  * surviving items collect into ONE sorted array and pair generation
  * is row-local higher-order-function work (no per-basket self-join;
  * candidate pairs never shuffle, only their counted aggregate does).
  * The per-basket pair blowup is quadratic in the basket's
  * FREQUENT-item count only, and it materializes inside a single
  * exploding row; a pathological mega-basket (say a crawl page
  * listing 10⁶ items) still quadratically explodes and should be
  * capped upstream — that is a semantic choice (dropping a basket
  * changes supports), so this operator refuses to make it silently
  * and documents it instead (for such data, prune harder or fall
  * back to a self-join form that at least spreads the blowup across
  * tasks).
  */
object Itemsets {

  /** Row-local unordered-pair generation over a sorted item array:
    * each element pairs with every LATER element, so (item_a < item_b)
    * holds by construction and every in-basket pair appears exactly
    * once. Higher-order functions only — stays inside codegen, no
    * shuffle, no UDF. Per-row cost is C(|items|, 2): the quadratic
    * blowup lives INSIDE one row here, where the self-join form
    * spreads it across tasks — fine for human-scale baskets (after
    * the a-priori prune), the self-join form is the fallback for
    * degenerate mega-baskets (see the object doc's capping note). */
  private val pairHof =
    "flatten(transform(items, (x, i) -> " +
      "transform(slice(items, i + 2, size(items) - i - 1), " +
      "y -> struct(x AS item_a, y AS item_b))))"

  /** Distinct (basket, item) stream with each basket's a-priori
    * surviving items collected into one sorted array — the shared
    * prologue of pair and triple mining. ONE extra aggregation
    * (already partitioned: the semi-join preserves the distinct's
    * hashing on (b, i)... close enough for AQE) replaces the
    * per-basket self-join downstream. */
  private def frequentItemArrays(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("i").isNotNull).distinct()
    // a-priori: only items frequent on their own can appear in a
    // frequent pair; the set is ≤ |bi|/minSupport rows — broadcast it
    val frequentItems = bi.groupBy(col("i"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minSupport)
      .select(col("i"))
    bi.join(broadcast(frequentItems), Seq("i"), "left_semi")
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
  }

  /** All unordered item pairs with basket support ≥ `minSupport`,
    * a-priori pruned. Output: (item_a, item_b, support) with
    * item_a < item_b.
    *
    * @param baskets   frame with one row per basket-item occurrence
    * @param basketCol basket key column name
    * @param itemCol   item column name (any orderable type)
    */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    frequentItemArrays(baskets, basketCol, itemCol, minSupport)
      .select(explode(expr(pairHof)).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** All item TRIPLES with basket support ≥ `minSupport` — the level-2
    * a-priori step: candidate triples extend in-basket pairs that are
    * themselves frequent, and every one of the triple's THREE sub-pairs
    * must be frequent before the candidate is counted (monotonicity
    * again — exact, the unpruned oracle hash-matches). Output:
    * (item_a, item_b, item_c, support) with item_a < item_b < item_c.
    *
    * Scale shape: the frequent-pair set is ≤ pair-rows/minSupport and
    * broadcasts (same by-construction bound as the item set); the
    * in-basket pairs generate row-locally from the basket's sorted
    * item array, the extension join re-reads the ONE-row-per-basket
    * array frame (never the per-occurrence stream), and the two
    * pair-level semi-joins strip candidates BEFORE the counting
    * aggregation — the classic reason a-priori survives where naive
    * k-way enumeration explodes. */
  def frequentTriples(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val basketArr =
      frequentItemArrays(baskets, basketCol, itemCol, minSupport)
        .localCheckpoint(true)
    val freqPairs = basketArr
      .select(explode(expr(pairHof)).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .select(col("item_a"), col("item_b"))
      .localCheckpoint(true)
    // in-basket pairs (row-local gen), kept only when the pair is
    // globally frequent
    val ab = basketArr
      .select(col("b"), explode(expr(pairHof)).as("p"))
      .select(col("b"), col("p.item_a").as("item_a"),
        col("p.item_b").as("item_b"))
      .join(broadcast(freqPairs), Seq("item_a", "item_b"), "left_semi")
    // extend by a third in-basket item: re-join the ONE-row-per-basket
    // array frame (not the per-occurrence stream — far fewer rows move)
    // and explode only the items ordered after item_b; both new
    // sub-pairs must be frequent too before the candidate reaches the
    // count
    ab.join(basketArr, Seq("b"))
      .select(col("item_a"), col("item_b"),
        explode(filter(col("items"), y => y > col("item_b"))).as("item_c"))
      .join(broadcast(freqPairs.select(col("item_a"),
        col("item_b").as("item_c"))), Seq("item_a", "item_c"), "left_semi")
      .join(broadcast(freqPairs.select(col("item_a").as("item_b"),
        col("item_b").as("item_c"))), Seq("item_b", "item_c"), "left_semi")
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Association rules a→b from the frequent pairs: confidence and
    * lift as EXACT scaled integers (×10⁴, floored) so the result is
    * reproducible bit-for-bit across engines — no float division
    * drift. Emits BOTH directions of each frequent pair.
    *
    *   confidence(a→b) = support(a,b) / support(a)
    *   lift(a→b)       = support(a,b)·|baskets| / (support(a)·support(b))
    *
    * Scale shape: pair supports come from [[frequentPairs]] (already
    * pruned/aggregated); singleton supports re-aggregate the distinct
    * basket-item frame and join onto the pair table — the pair table
    * is the small side (≤ pairs above minSupport), so both joins
    * broadcast it; the basket total is a 1-row cross join.
    */
  def associationRules(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("i").isNotNull).distinct()
    val itemSupport = bi.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val nBaskets = bi.select(countDistinct(col("b")).as("n_baskets"))
    val pairs = frequentPairs(baskets, basketCol, itemCol, minSupport)
    // both directions: (antecedent, consequent)
    val directed = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("support"))
      .unionAll(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("support")))
    directed
      .join(broadcast(itemSupport.select(col("i").as("antecedent"),
        col("s").as("s_ante"))), Seq("antecedent"))
      .join(broadcast(itemSupport.select(col("i").as("consequent"),
        col("s").as("s_cons"))), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      // all-positive operands, so floor(x/y) is INTEGRAL division —
      // `div`, not `/` (long / long is double division in Spark SQL,
      // and beyond 2^53 the float quotient drifts off the exact one);
      // the lift products run in decimal(38,0) so they can't overflow
      // a long at corpus scale before the divide
      .select(col("antecedent"), col("consequent"), col("support"),
        expr("(10000L * support) div s_ante").as("confidence_e4"),
        expr("""(cast(10000 as decimal(38,0)) * support * n_baskets)
                div (cast(s_ante as decimal(38,0)) * s_cons)""")
          .as("lift_e4"))
  }
}
