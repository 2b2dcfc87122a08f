package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Skew-posture pins (SCALE.md): the two hot-key joins of the text
  * plane against a synthetic 10⁶-row corpus with ONE key at 50% —
  * the Zipfian head that a real corpus always has. Each operator has
  * a DIFFERENT guard and each is asserted directly:
  *
  *  - `rareTokenStats`: the Zipf head (tokens in > hotDocFrac of
  *    docs — pigeonhole-bounded, broadcastable) is anti-joined out
  *    ROW-LOCALLY before the shuffle join, so every shuffled key has
  *    bounded multiplicity: the hot token never enters an exchange.
  *    (AQE skew-split structurally cannot rescue the naive single-join
  *    form — the df aggregation sits on the join's own exchange — so
  *    the guard must be in the plan shape, and is.)
  *  - `jaccardPairsKernel`: the `maxDf` cap drops ubiquitous shingles
  *    BEFORE the quadratic self-join — structural, not runtime: with
  *    500k docs sharing one shingle, an uncapped self-join would emit
  *    ~1.25·10¹¹ pairs and never finish; completion plus the
  *    no-hot-pair assertion is the guard's proof.
  */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("rare-token stats at 1e6 rows, one token in 50% of docs: " +
      "hot token broadcast-excluded from the shuffle join, exact result") {
    // every doc carries a unique token (rare, df=1); even ids also
    // carry the hot token (df = 500k — the Zipfian head)
    val docs = spark.range(1000000L).select(col("id").as("doc_id"),
      concat(
        when(col("id") % 2 === 0, lit("the ")).otherwise(lit("")),
        lit("u"), col("id").cast("string")).as("text"))
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      // force the shuffle-join shape a billion-token vocabulary forces
      // at corpus scale (the df table stops being AUTO-broadcastable —
      // the explicit hot-set broadcast hint must still win over this)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.shuffle.partitions", "32")
      val out = TextAnalysis.rareTokenStats(docs, "text", "doc_id",
        maxDf = 2L)
      // execute THIS plan (AQE finalizes it) before auditing it
      val rows = out.collect()
      // evens: 2 tokens (hot + unique), odds: 1; the hot token has
      // df=500k (not rare), every unique token is rare
      assert(rows.length == 1000000, s"row count: ${rows.length}")
      assert(rows.map(_.getLong(1)).sum == 1500000L, "n_tokens sum")
      assert(rows.map(_.getLong(2)).sum == 1000000L, "n_rare sum")
      val plan = out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the Zipf head leaves the pair table through a row-local
      // broadcast anti-join — the only joins that shuffle are the
      // bounded-multiplicity rare join and the unique-key id join
      assert(plan.contains("LeftAnti, BuildRight"),
        "hot set not broadcast-anti-joined:\n" + plan.take(4000))
      // the repeated tf/df subtrees cost ONE physical shuffle each
      assert(plan.contains("ReusedExchange") ||
          plan.contains("ReusedQueryStage") ||
          plan.contains("TableCacheQueryStage"),
        "tf/df subtrees not deduplicated:\n" + plan.take(4000))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("jaccard at 1e6 docs, one shingle in 50% of docs: df cap " +
      "keeps the hot key out of the self-join") {
    // evens all share the SAME 3-word text (one shingle, df=500k ≫
    // maxDf); odds are unique except two planted near-dup partners
    val docs = spark.range(1000000L).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit("alpha beta gamma"))
        .when(col("id").isin(1L, 3L), lit("delta epsilon zeta"))
        .otherwise(concat(lit("w"), col("id").cast("string"),
          lit(" x"), col("id").cast("string"),
          lit(" y"), col("id").cast("string"))).as("text"))
    val pairs = Dedup.jaccardPairsKernel(docs, "text", "doc_id", k = 3,
      thresholdE4 = 8000, maxDf = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the planted duplicate pair survives; NO pair between hot-text
    // docs (they share only the capped shingle — without the cap this
    // stage would emit ~1.25e11 rows and the test could never pass)
    assert(pairs == Set((1L, 3L)), s"pairs: ${pairs.take(10)}")
  }

  test("salted join at 1e6 rows, one key at 50%: result equals the " +
      "plain join and the hot key fans across every salt bucket") {
    import graft.operators.SkewJoin
    // fact: 1e6 rows, half on key 0 (the hot key), rest uniform over
    // 1..999; dim: 1000 keys with a payload
    val fact = spark.range(1000000L).select(col("id").as("row_id"),
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(col("id"), lit(999L)) + 1L).as("k"))
    val dim = spark.range(1000L).select(col("id").as("k"),
      (col("id") * 7L).as("payload"))
    val buckets = 16
    val salted = SkewJoin.saltedInnerJoin(
      fact, dim, Seq("k"), col("row_id"), buckets)
    val plain = fact.join(dim, "k")
    // exactness: same aggregate fingerprint over all columns
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)), sum(col("row_id")), sum(col("payload")),
        sum(col("k") * col("payload"))).head.toSeq
    assert(fp(salted) == fp(plain), "salted join changed the result")
    // layout: the hot key's rows actually spread over ALL buckets —
    // recompute the salt assignment the operator uses and count
    // distinct salts for k=0
    val hotSalts = fact.where(col("k") === 0L)
      .select(pmod(xxhash64(col("row_id")), lit(buckets.toLong))
        .cast("int").as("s"))
      .distinct().count()
    assert(hotSalts == buckets.toLong,
      s"hot key used $hotSalts of $buckets salt buckets")
  }

  test("bloom semi-join equals the plain semi-join, duplicates and " +
      "multi-key tuples included") {
    import graft.operators.BloomJoin
    // fact with duplicate keys and rows that must NOT match; key side
    // with duplicate entries (distinct'd internally)
    val fact = spark.range(100000L).select(col("id").as("row_id"),
      pmod(col("id"), lit(977L)).as("k1"),
      pmod(col("id"), lit(13L)).as("k2"))
    val keys = spark.range(4000L).select(
      pmod(col("id"), lit(977L)).as("k1"), // dup tuples on purpose
      pmod(col("id"), lit(13L)).as("k2"))
    val got = BloomJoin.bloomSemiJoin(fact, keys, Seq("k1", "k2"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = fact.join(keys.distinct(), Seq("k1", "k2"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"sizes ${got.size} vs ${want.size}")
    // empty key set → empty result, not an error
    assert(BloomJoin.bloomSemiJoin(fact, keys.where(lit(false)),
      Seq("k1", "k2")).count() == 0L)
  }
}
