package graft

import org.apache.spark.sql.functions._

import graft.operators.Itemsets

/** Pins [[Itemsets.frequentPairs]] / [[Itemsets.associationRules]]
  * against brute-force JVM replicas on synthetic baskets where the
  * a-priori prune REMOVES items (the lineitem driver fixture is too
  * uniform to prune) — the prune must be invisible in the answer. */
class ItemsetsSpec extends SparkTestBase {

  private def bruteForcePairs(rows: Seq[(Long, String)],
      minSupport: Long): Map[(String, String), Long] = {
    val byBasket = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byBasket.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minSupport).toMap
  }

  private def seeded(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    // skewed item popularity: a few hot items, a long rare tail the
    // prune actually removes
    (0 until n).map { _ =>
      val basket = rnd.nextInt(40).toLong
      val item =
        if (rnd.nextInt(3) == 0) s"hot${rnd.nextInt(4)}"
        else s"rare${rnd.nextInt(200)}"
      (basket, item)
    }
  }

  test("frequentPairs matches brute force; a-priori prune is invisible") {
    import spark.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val rows = seeded(600, seed)
      val got = Itemsets.frequentPairs(rows.toDF("basket", "item"),
          "basket", "item", minSupport = 4L)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === bruteForcePairs(rows, 4L), s"seed $seed")
      // sanity that the fixture actually HAS infrequent singletons —
      // otherwise this spec would not exercise the prune at all
      val singletons = rows.distinct.groupBy(_._2).view.mapValues(_.size)
      assert(singletons.values.exists(_ < 4))
    }
  }

  test("duplicate item occurrences in one basket count support once") {
    import spark.implicits._
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "b"))
    val got = Itemsets.frequentPairs(rows.toDF("basket", "item"),
        "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", "b", 2L)))
  }

  test("associationRules: exact integral confidence/lift, both directions") {
    import spark.implicits._
    // a in baskets {1,2,3}, b in {1,2}, pair {a,b} in {1,2}; 4 baskets
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "c"))
    val got = Itemsets.associationRules(rows.toDF("basket", "item"),
        "basket", "item", minSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a→b: conf = 2/3, lift = 2·4/(3·2) = 4/3
    assert(got(("a", "b")) === ((2L, 10000L * 2 / 3, 10000L * 4 / 3)))
    // b→a: conf = 2/2 = 1, lift same
    assert(got(("b", "a")) === ((2L, 10000L, 13333L)))
    assert(got.size === 2)
  }

  private def bruteForceTriples(rows: Seq[(Long, String)],
      minSupport: Long): Map[(String, String, String), Long] = {
    val byBasket = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byBasket.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(3)
        .map(t => (t(0), t(1), t(2))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minSupport).toMap
  }

  test("frequentTriples matches brute force; level-2 prune is invisible") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      // denser baskets than the pair fixture so real triples recur
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 500).map { _ =>
        (rnd.nextInt(25).toLong,
          if (rnd.nextInt(2) == 0) s"hot${rnd.nextInt(5)}"
          else s"rare${rnd.nextInt(60)}")
      }
      val got = Itemsets.frequentTriples(rows.toDF("basket", "item"),
          "basket", "item", minSupport = 3L)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          r.getLong(3)).toMap
      val want = bruteForceTriples(rows, 3L)
      assert(got === want, s"seed $seed")
      assert(want.nonEmpty, s"seed $seed fixture has no frequent triples")
    }
  }

  test("a frequent triple requires all three sub-pairs frequent — and " +
      "a basket-co-occurring triple of frequent pairs can still miss support") {
    import spark.implicits._
    // {a,b,c} together in exactly 1 basket, but each sub-pair frequent
    // via 2-item baskets: the triple must NOT surface at minSupport 2
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "b"), (3L, "c"), (4L, "a"), (4L, "c"))
    val got = Itemsets.frequentTriples(rows.toDF("basket", "item"),
        "basket", "item", minSupport = 2L)
    assert(got.count() === 0L)
    // and the same sets twice over IS a frequent triple
    val twice = rows ++ Seq((5L, "a"), (5L, "b"), (5L, "c"))
    val got2 = Itemsets.frequentTriples(twice.toDF("basket", "item"),
        "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got2.toSeq === Seq(("a", "b", "c", 2L)))
  }

  test("minSupport filters pairs even when both members are frequent") {
    import spark.implicits._
    // a and b each appear 3 times, but only co-occur once
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"))
    val got = Itemsets.frequentPairs(rows.toDF("basket", "item"),
        "basket", "item", minSupport = 2L)
    assert(got.count() === 0L)
  }
}
