package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Unit coverage for the training-data-pipeline operators (dedup +
  * text analysis) on tiny hand-built corpora with known answers. */
class DedupTextSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup of 1
    (4L, "completely different words appear here today friends"),
    (5L, "ab")) // shorter than shingle k
    .toDF("doc_id", "text")

  test("incremental pairs == full pairs restricted to the batch boundary") {
    import org.apache.spark.sql.functions.col
    // no shingle is hot in this corpus, so the df caps are inert and
    // the incremental (new×old) set must equal the symmetric full
    // pair set filtered to pairs crossing the split
    val newDf = corpus.where(col("doc_id") % 2 === 1)
    val oldDf = corpus.where(col("doc_id") % 2 === 0)
    val inc = Dedup.jaccardPairsAgainst(newDf, oldDf, "text", "doc_id",
        k = 3, thresholdE4 = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.jaccardPairsKernel(corpus, "text", "doc_id",
        k = 3, thresholdE4 = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossFull = full.collect {
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
      case (a, b) if b % 2 == 1 && a % 2 == 0 => (b, a)
    }
    assert(inc == crossFull)
    assert(inc.contains((1L, 2L))) // exact dup across the boundary
    // and nothing pairs old×old or new×new
    assert(inc.forall { case (n, o) => n % 2 == 1 && o % 2 == 0 })
  }

  test("duplicatedSpanStats flags cross-doc spans, not unique content") {
    // doc 1/2 identical → every span duplicated; doc 3 shares the
    // 3-token tail change so w=3 spans mostly overlap doc 1; doc 4
    // is fully unique; doc 5 is a whole-doc span (short fallback)
    val got = Dedup.duplicatedSpanStats(corpus, "text", "doc_id", w = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((7L, 7L, 10000L))) // identical twin: all 7 dup
    assert(got(2L) == got(1L))
    // doc 3 shares {the quick brown, quick brown fox, over the lazy,
    // the lazy dog} with docs 1/2 — 4 of its 7 spans
    assert(got(3L) == ((7L, 4L, 5714L)))
    assert(got(4L) == ((5L, 0L, 0L))) // 7 tokens → 5 spans, all unique
    assert(got(5L) == ((1L, 0L, 0L))) // whole-doc fallback span
  }

  test("star contraction == min-label components on random graphs") {
    for (seed <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      val n = 120L
      val nodes = (0L until n).toDF("id")
      val edges = (0 until 150).map { _ =>
        (rnd.nextLong(n), rnd.nextLong(n))
      }.filter(p => p._1 != p._2).toDF("a", "b")
      val byLabel = Dedup.connectedComponents(nodes, "id", edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byStar = Dedup.connectedComponentsStar(nodes, "id", edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byStar == byLabel, s"seed $seed")
    }
  }

  test("star contraction converges on a chain min-label cannot finish") {
    val n = 400L
    val nodes = (0L until n).toDF("id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    // min-label moves the minimum one hop per round: a 400-link chain
    // exceeds the 50-round cap — the documented depth limitation
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, "id", chain, "a", "b").collect()
    }
    // star contraction is O(log^2 n) rounds regardless of diameter
    val got = Dedup.connectedComponentsStar(nodes, "id", chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L) && got.size == n)
  }

  test("min-label components: empty nodes frame returns empty labels") {
    // sum over zero rows is SQL NULL — the convergence check must not
    // dereference it (regression: NPE on empty input)
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(nodes, "id", edges, "a", "b").isEmpty)
  }

  test("incremental pairs: shared ids are rejected / never self-pair") {
    val batch = corpus.where(col("doc_id") <= 2)
    // validateDisjoint: overlapping id spaces fail fast
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairsAgainst(batch, corpus, "text", "doc_id",
        k = 3, thresholdE4 = 5000, validateDisjoint = true).collect()
    }
    // without validation the join-side guard still suppresses the
    // j=1 self-pair a doc would otherwise form with itself
    val loose = Dedup.jaccardPairsAgainst(batch, corpus, "text", "doc_id",
        k = 3, thresholdE4 = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(loose.forall { case (n, o) => n != o })
  }

  test("star contraction: empty edge set yields all-singleton components") {
    val nodes = Seq(10L, 20L, 30L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = Dedup.connectedComponentsStar(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 20L -> 20L, 30L -> 30L))
  }

  test("exact dedup maps identical texts to the minimum id") {
    val got = Dedup.exact(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("shingles: 3-grams, distinct, whole-doc fallback for short texts") {
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).head == "the quick brown")
    assert(sh(1L).size == 7)
    assert(sh(5L) == Seq("ab"))
  }

  test("ngram jaccard finds exact and near dup pairs, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(corpus, "text", "doc_id", k = 3,
        thresholdE4 = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical: j = 1
    // 1 vs 3: one word changed → 3 of 7 shingles survive; j = 3/11 < 0.5
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH recovers the exact-dup pair and verifies jaccard") {
    val pairs = Dedup.minhashLshPairs(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical texts identical prints; near dups close in hamming") {
    val sh = corpus.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // hamming 0
  }

  test("kernel shingle hashing == declarative hash60(shingles)") {
    val decl = corpus.select(col("doc_id"),
        org.apache.spark.sql.functions.transform(
          Dedup.shingles(col("text"), 3), Dedup.hash60(_)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kern = Dedup.shingleHashKernel(corpus, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(decl == kern)
  }

  test("kernel jaccard == declarative jaccard; kernel minhash == declarative") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(
      norm(Dedup.jaccardPairsKernel(corpus, "text", "doc_id", 3, 5000)) ==
        norm(Dedup.jaccardPairs(corpus, "text", "doc_id", 3, 5000)))
    val k = Dedup.minhashLshPairsKernel(corpus, "text", "doc_id")
      .select("id_a", "id_b").collect().map(_.toSeq).toSet
    val d = Dedup.minhashLshPairs(corpus, "text", "doc_id")
      .select("id_a", "id_b").collect().map(_.toSeq).toSet
    assert(k == d)
  }

  test("prefix-filtered jaccard == index-join jaccard (incl. df cap)") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // a corpus with heavy shingle sharing so prefixes actually prune
    val docs = (1L to 40L).map { i =>
      val tail = if (i % 4 == 0) "xx yy zz" else s"tail $i unique$i"
      (i, s"the quick brown fox jumps over wall $tail")
    }.toDF("doc_id", "text")
    for (t <- Seq(3000, 5000, 8000); cap <- Seq(5L, 1000L)) {
      val base = norm(Dedup.jaccardPairsKernel(docs, "text", "doc_id", 3, t, cap))
      val pref = norm(Dedup.jaccardPairsPrefixKernel(docs, "text", "doc_id", 3, t, cap))
      assert(pref == base, s"threshold=$t cap=$cap")
    }
    assert(
      norm(Dedup.jaccardPairsPrefixKernel(corpus, "text", "doc_id", 3, 5000)) ==
        norm(Dedup.jaccardPairs(corpus, "text", "doc_id", 3, 5000)))
  }

  test("posting-list jaccard == index-join jaccard (incl. df cap)") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val docs = (1L to 40L).map { i =>
      val tail = if (i % 4 == 0) "xx yy zz" else s"tail $i unique$i"
      (i, s"the quick brown fox jumps over wall $tail")
    }.toDF("doc_id", "text")
    for (t <- Seq(3000, 5000, 8000); cap <- Seq(5L, 1000L)) {
      val base = norm(Dedup.jaccardPairsKernel(docs, "text", "doc_id", 3, t, cap))
      val post = norm(Dedup.jaccardPairsPostingKernel(docs, "text", "doc_id", 3, t, cap))
      assert(post == base, s"threshold=$t cap=$cap")
    }
    assert(
      norm(Dedup.jaccardPairsPostingKernel(corpus, "text", "doc_id", 3, 5000)) ==
        norm(Dedup.jaccardPairs(corpus, "text", "doc_id", 3, 5000)))
  }

  test("posting kernel is fully lazy: no job runs at plan-build time") {
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = Dedup.jaccardPairsPostingKernel(corpus, "text", "doc_id", 3, 5000)
      Thread.sleep(500) // job-start events post asynchronously
      assert(jobs == 0, s"plan construction ran $jobs eager job(s)")
      assert(df.limit(1).collect().nonEmpty) // the plan still executes
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("packIds contract: wide ids fail fast packed, work unpacked") {
    val wide = Seq(
      (5000000000L, "aa bb cc dd"),
      (5000000001L, "aa bb cc dd"))
      .toDF("doc_id", "text")
    val err = intercept[org.apache.spark.SparkException] {
      Dedup.jaccardPairsPostingKernel(wide, "text", "doc_id", 3, 5000).collect()
    }
    assert(err.getMessage.contains("packIds"))
    val ok = Dedup.jaccardPairsPostingKernel(wide, "text", "doc_id", 3, 5000,
      packIds = false).collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((5000000000L, 5000000001L)))
  }

  test("hot-bucket caps drop over-cap buckets in one pass") {
    // minhash: the dup pair shares every band; cap 1 drops all its band
    // buckets, so no candidates survive — cap 1000 finds the pairs
    assert(Dedup.minhashLshPairsKernel(corpus, "text", "doc_id",
      maxBandSize = 1).count() == 0)
    assert(Dedup.minhashLshPairsKernel(corpus, "text", "doc_id")
      .count() >= 1)
    // simhash: identical prints share every chunk bucket; cap 1 drops them
    assert(Dedup.simhashPairs(corpus, "text", "doc_id",
      maxBucketSize = 1).count() == 0)
    assert(Dedup.simhashPairs(corpus, "text", "doc_id").count() >= 1)
    // jaccard: df cap 1 keeps only singleton posting lists — no pairs
    assert(Dedup.jaccardPairsPostingKernel(corpus, "text", "doc_id", 3, 5000,
      packIds = true) // corpus ids are small; exercise the packed path
      .sparkSession != null) // plan builds lazily
    assert(Dedup.jaccardPairsPostingKernel(corpus, "text", "doc_id", 3,
      5000, maxDf = 1L).count() == 0)
  }

  test("connected components: transitive clusters, chains, isolates") {
    // components: {1,2,3} via chain 1-2, 2-3; {4,5}; {6} isolated —
    // the chain needs >1 propagation round
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    // a long chain converges too (diameter 9)
    val chainN = (0L to 9L).toDF("id")
    val chainE = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chain = Dedup.connectedComponents(chainN, "id", chainE, "id_a", "id_b")
      .collect().map(_.getLong(1)).toSet
    assert(chain == Set(0L))
    // composes with the pair kernel: exact dups + near dup (j = 0.4,
    // so threshold 0.3 links it) collapse into one cluster with the
    // min id canonical
    val pairs = Dedup.jaccardPairsPostingKernel(corpus, "text", "doc_id", 3, 3000)
    val comp = Dedup.connectedComponents(corpus.select(col("doc_id")), "doc_id",
        pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(4L) == 4L && comp(5L) == 5L)
  }

  test("token counting: whitespace and bpe-ish") {
    val df = Seq("hello world", "don't stop-me now2", " padded  spaces ")
      .toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.bpeishCount(col("text")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(df(0) == ((2L, 2L)))
    // don't → don,',t ; stop-me → stop,-,me ; now2 → now,2 → 8 pieces
    assert(df(1) == ((3L, 8L)))
    assert(df(2) == ((2L, 2L)))
  }

  test("langId picks the dominant stopword language, und when none") {
    val got = Seq(
      ("the cat is in the house and it sleeps", "en"),
      ("el gato que duerme en la casa y una siesta", "es"),
      ("der hund und die katze das ist gut", "de"),
      ("xyzzy plugh frobozz", "und"))
      .toDF("text", "expect")
      .select(TextAnalysis.langId(col("text")).as("got"), col("expect"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score is bounded and monotone in stopword density") {
    val rows = Seq(
      "the a of to and in is it the a of to and in is it",
      "zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz")
      .toDF("text")
      .select(TextAnalysis.qualityScoreE4(col("text")).as("q"))
      .collect().map(_.getLong(0))
    assert(rows.forall(q => q >= 0 && q <= 10000))
    assert(rows(0) > rows(1)) // stopword-rich scores higher
  }

  // stress corpus for kernel-parity pins: mixed scripts, punctuation,
  // digits, padding, single token
  private val kcorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "el gato que duerme en la casa y una siesta"),
    (3L, "的 了 是 我 不 在 有 人 der und"),
    (4L, "  padded   don't stop-me now2  "),
    (5L, "x"))
    .toDF("doc_id", "text")

  test("kernel text stats == declarative langId/tokenCount/bpeish/quality") {
    val decl = kcorpus.select(col("doc_id"),
        TextAnalysis.langId(col("text")),
        TextAnalysis.tokenCount(col("text")),
        TextAnalysis.bpeishCount(col("text")),
        TextAnalysis.qualityScoreE4(col("text")))
      .collect().map(_.toSeq).toSet
    val kern = TextAnalysis.statsKernel(kcorpus, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(decl == kern)
  }

  test("kernel repetition == declarative repetitionE4 (incl. short docs, repeats)") {
    val rep = Seq(
      (10L, "a b c a b c a b c"), // heavy 3-gram repetition
      (11L, "all words unique here today friend"),
      (12L, "x y"), // shorter than k -> 0
      (13L, "w w w w w w w w")) // single repeated gram
      .toDF("doc_id", "text")
    val corpus = kcorpus.unionByName(rep)
    val decl = corpus.select(col("doc_id"),
        TextAnalysis.repetitionE4(col("text")).as("rep3_e4"))
      .collect().map(_.toSeq).toSet
    val kern = TextAnalysis.repetitionKernel(corpus, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(decl == kern)
  }

  test("kernel fingerprints == declarative md5/rolling fingerprints") {
    val decl = kcorpus.select(col("doc_id"),
        TextAnalysis.md5Fingerprint(col("text")),
        TextAnalysis.rollingFingerprint(col("text")))
      .collect().map(_.toSeq).toSet
    val kern = TextAnalysis.fingerprintKernel(kcorpus, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(decl == kern)
  }

  test("kernel simhash == declarative simhash column and table forms") {
    val decl = kcorpus.select(col("doc_id"), Dedup.simhash(col("text")))
      .collect().map(_.toSeq).toSet
    val tbl = Dedup.simhashTable(kcorpus, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val kern = Dedup.simhashKernel(kcorpus, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(decl == kern)
    assert(tbl == kern)
  }

  test("keepBest keeps the highest-quality member per cluster, ties to min id") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L))
      .toDF("doc_id", "component")
    val scores = Seq((1L, 70L), (2L, 90L), (3L, 90L), (4L, 10L), (5L, 0L))
      .toDF("doc_id", "q")
    val got = Dedup.keepBest(comps, scores, "doc_id", "q")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cluster 1: docs 2 and 3 tie at 90 → doc 2 (lower id) wins
    assert(got == Map(
      1L -> ((2L, 90L, 3L)),
      4L -> ((4L, 10L, 1L)),
      5L -> ((5L, 0L, 1L))))
  }

  test("rareTokenStats counts occurrences of low-df tokens per doc") {
    // corpus dfs: shared=3, common=2, x/y/z/q/w/v df=1 each
    val rcorpus = Seq(
      (1L, "shared common x y"),
      (2L, "shared common z"),
      (3L, "shared q w v q")) // q repeats: 2 occurrences, df still 1
      .toDF("doc_id", "text")
    val got = TextAnalysis.rareTokenStats(rcorpus, "text", "doc_id", maxDf = 1L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((4L, 2L, 5000L))) // x y rare
    assert(got(2L) == ((3L, 1L, 3333L))) // z rare
    assert(got(3L) == ((5L, 4L, 8000L))) // q q w v rare (df counts DOCS)
    // at maxDf=3 every token qualifies
    val all = TextAnalysis.rareTokenStats(rcorpus, "text", "doc_id", maxDf = 3L)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(all.forall { case (_, e4) => e4 == 10000L })
  }

  test("removeDuplicatedSpans cuts covered tokens, keeps the rest in order") {
    // an 8-token boilerplate sentence planted in two docs; unique
    // prose around it survives, the shared window (and every token it
    // covers) is cut from BOTH docs
    val boiler = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"epsilon $boiler zeta"),
      (3L, "unique prose with no duplication at all here"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .removeDuplicatedSpans(corpus, "text", "doc_id", w = 8, minDf = 2L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("alpha beta gamma delta", 12L, 8L)), got(1L))
    assert(got(2L) == (("epsilon zeta", 10L, 8L)), got(2L))
    assert(got(3L) == (("unique prose with no duplication at all here",
      8L, 0L)), got(3L))
    // whole-doc duplication (short docs) removes everything
    val shorts = Seq((1L, "same tiny doc"), (2L, "same tiny doc"),
      (3L, "another tiny doc")).toDF("doc_id", "text")
    val g2 = graft.operators.Dedup
      .removeDuplicatedSpans(shorts, "text", "doc_id", w = 8, minDf = 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(g2(1L) == (("", 3L)) && g2(2L) == (("", 3L)))
    assert(g2(3L) == (("another tiny doc", 0L)))
  }

  test("bigramLmScore: common-pair text scores high, out-of-LM text zero") {
    // corpus pairs: (a,b)×5, (b,a)×3 dominate; doc 3's pairs are all
    // singletons and fall outside the top-2 LM → 0-backoff
    val docs = Seq(
      (1L, "a b a b a b"),   // 5 pairs, all in the LM
      (2L, "a b a b"),       // 3 pairs, all in the LM
      (3L, "x y z w"))       // 3 pairs, none in the LM
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "text", "doc_id", lmK = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // ctx(a) = 5 all (a,b); ctx(b) = 3 all (b,a) ⇒ both cond = 10⁶
    assert(got(1L) == ((5L, 5L, 1000000L)), s"doc1 ${got(1L)}")
    assert(got(2L) == ((3L, 3L, 1000000L)), s"doc2 ${got(2L)}")
    assert(got(3L) == ((3L, 0L, 0L)), s"doc3 ${got(3L)}")
  }

  test("incremental CC: label fold == full recompute, incl. cluster MERGE") {
    // old corpus: clusters {1,2}, {10,11}, singleton {20}
    val oldNodes = Seq(1L, 2L, 10L, 11L, 20L).toDF("id")
    val oldPairs = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val oldLabels = Dedup.connectedComponents(oldNodes, "id",
      oldPairs, "id_a", "id_b")
    // new batch {30, 31}: 30 pairs with BOTH 2 and 11 — one batch
    // bridges the two old clusters (the case a naive "assign new docs
    // to an existing label" scheme gets wrong); 31 is near 20 only
    val newPairs = Seq((30L, 2L), (30L, 11L), (31L, 20L), (30L, 31L))
      .toDF("id_a", "id_b")
    val allNodes = Seq(1L, 2L, 10L, 11L, 20L, 30L, 31L).toDF("id")
    val inc = Dedup.connectedComponentsIncremental(allNodes, "id",
        oldLabels, "id", "component", newPairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(allNodes, "id",
        oldPairs.unionByName(newPairs), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full, s"inc $inc vs full $full")
    // everything merged transitively into one component rooted at 1
    assert(inc.values.toSet == Set(1L), s"got $inc")
  }

  test("lineLangStats: per-line votes, blank lines skipped, multilingual flag") {
    val docs = Seq(
      // English line + German line + a blank + an unidentifiable line
      (1L, "the cat is of the house\nder hund ist von der strasse\n\nxyzzy qwerty"),
      (2L, "the dog is in the park\nthe end of the story"),  // en only
      (3L, "\n\n  \n")).toDF("doc_id", "text")               // all blank
    val got = TextAnalysis.lineLangStats(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // doc 1: 3 non-blank lines, 2 identified (en + de), multilingual
    assert(got(1L) == ((3L, 2L, 2L, true)), s"doc1 ${got(1L)}")
    // doc 2: 2 lines, both en, one distinct language
    assert(got(2L) == ((2L, 2L, 1L, false)), s"doc2 ${got(2L)}")
    // doc 3: all-blank doc contributes no rows at all
    assert(!got.contains(3L))
  }

  test("containmentPairs: catches the quote Jaccard misses, exact ratios") {
    // doc 1 is quoted WHOLESALE inside doc 2, which is ~4× longer:
    // containment(1→2) = 100%, but Jaccard ≈ 1/4 — below any sensible
    // near-dup threshold. doc 3 is unrelated.
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val host = quote + " " + (1 to 24).map(i => s"filler$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, host), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "text", "doc_id",
        k = 3, thresholdE4 = 9000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // 6 shingles of the quote (8 tokens, k=3), all present in the host
    assert(cont.keySet == Set((1L, 2L)), s"got ${cont.keySet}")
    val (common, szA, szB, contA, contB) = cont((1L, 2L))
    assert(common == 6L && szA == 6L)
    assert(contA == 10000L, s"cont_a_e4 $contA") // fully contained
    assert(contB == (common * 10000L) / szB)
    // symmetric Jaccard at a typical 50% near-dup threshold finds NO
    // pair here — the union term drowns the quote
    assert(Dedup.jaccardPairsKernel(docs, "text", "doc_id",
      k = 3, thresholdE4 = 5000).count() == 0L)
  }

  test("bigramLm: exact pair/context counts, ppm conditionals, short docs skip") {
    val docs = Seq(
      (1L, "a b a b c"),   // pairs: (a,b) (b,a) (a,b) (b,c)
      (2L, "a b"),         // pair: (a,b)
      (3L, "x"),           // <2 tokens: contributes nothing
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(docs, "text", k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // heads: a → 3 pairs (all (a,b)); b → 2 pairs ((b,a), (b,c))
    assert(got == Map(
      ("a", "b") -> ((3L, 3L, 1000000L)),
      ("b", "a") -> ((1L, 2L, 500000L)),
      ("b", "c") -> ((1L, 2L, 500000L))), s"got $got")
    // top-k cut is deterministic under count ties: (w1, w2) order
    val top2 = TextAnalysis.bigramLm(docs, "text", k = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top2 == Seq(("a", "b"), ("b", "a")))
  }

  test("topTermsApprox: heavy hitter survives MG decrement churn, " +
      "exact counts, equals the exact operator") {
    // 500 docs: 40% carry the hot token, every doc carries a unique
    // singleton — capacity 4 forces constant decrement churn in every
    // partition, yet the hitter must come back with its EXACT count
    // (pass 2 recounts; MG only has to keep it as a CANDIDATE)
    val docs = spark.range(500).select(
      concat(when(col("id") % 5 < 2, lit("hot ")).otherwise(lit("")),
        lit("u"), col("id").cast("string")).as("text"))
    val got = TextAnalysis.topTermsApprox(docs, "text", k = 1, capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("hot", 200L)), s"got $got")
    // at a realistic capacity the approximate operator reproduces the
    // exact top-k verbatim on a real corpus
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = corpus
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val approx = TextAnalysis.topTermsApprox(corpus, "text", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(approx == exact)
  }

  test("fingerprints: md5 normalizes whitespace; rolling is order-sensitive") {
    val fp = Seq((1L, "a b c"), (2L, " a  b   c "), (3L, "c b a"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.md5Fingerprint(col("text")).as("m"),
        TextAnalysis.rollingFingerprint(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(fp(1L)._1 == fp(2L)._1) // whitespace-insensitive
    assert(fp(1L)._2 == fp(2L)._2)
    assert(fp(1L)._1 != fp(3L)._1) // order-sensitive
    assert(fp(1L)._2 != fp(3L)._2)
  }

  test("tokenizeWithVocab: ids in order, unk fallback, digest pins order") {
    val vocab = Map("the" -> 1L, "quick" -> 2L, "fox" -> 3L)
    val got = TextAnalysis
      .tokenizeWithVocab(corpus, "text", "doc_id", vocab)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // doc 1: 9 tokens; the/quick/fox known (the twice), rest unk
    assert(got(1L)._1 == 9L && got(1L)._2 == 5L)
    // identical text → identical digest; docs 1 and 3 differ only in
    // an UNK token (jumps vs leaps), so their ID sequences — and
    // digests — legitimately coincide; doc 4 (different shape) differs
    assert(got(1L)._3 == got(2L)._3)
    assert(got(1L)._3 == got(3L)._3)
    assert(got(1L)._3 != got(4L)._3)
    // digest equals the hand-computed id sequence for doc 1:
    // the quick brown fox jumps over the lazy dog → 1,2,0,3,0,0,1,0,0
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("1,2,0,3,0,0,1,0,0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(1L)._3 == expect)
    // unk-id collision with a vocab id is rejected loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenizeWithVocab(corpus, "text", "doc_id", vocab,
        unkId = 1L)
    }
    // buildVocab ids follow (count desc, term asc) with ids from 1:
    // "the" leads with 6 occurrences; brown/dog/fox/lazy/over/quick
    // tie at 3 and "brown" wins the term tie-break
    val built = TextAnalysis.buildVocab(corpus, "text", k = 2)
    assert(built == Map("the" -> 1L, "brown" -> 2L), s"got $built")
  }

  test("bm25TopK ranks term-matching docs and matches the closed form") {
    val got = TextAnalysis.bm25TopK(corpus, "text", "doc_id",
        queries = Seq(
          "q_fox" -> Seq("fox", "jumps"),
          "q_none" -> Seq("zebra")),
        topK = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // zebra appears nowhere → no rows for q_none
    assert(!got.exists(_._1 == "q_none"))
    val fox = got.filter(_._1 == "q_fox").sortBy(_._2)
    // docs 1/2 match both terms, doc 3 only "fox"; two-term matches
    // outrank the one-term match, ties broken by doc id
    assert(fox.map(_._3).toSeq == Seq(1L, 2L, 3L))
    assert(fox.map(_._4).toSeq == Seq(2L, 2L, 1L))
    assert(fox(0)._5 == fox(1)._5 && fox(0)._5 > fox(2)._5)
    // closed form for doc 1's score: N=5, dl=9, avgdl=35/5 (9+9+9+7+1);
    // fox: df=3, tf=1; jumps: df=2, tf=1 — per-term e6 floors summed
    val n = 5L; val avgdl = 35.0 / 5
    def term(df: Long, tf: Long, dl: Long): Long = {
      val idf = math.log((((n - df) + 0.5) / (df + 0.5)) + 1.0)
      val den = tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)
      math.floor((1000000.0 * idf) * ((tf * 2.2) / den)).toLong
    }
    assert(fox(0)._5 == term(3, 1, 9) + term(2, 1, 9))
  }

  test("bm25: unknown query terms contribute nothing, in both regimes") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_unk")
    try {
      TextAnalysis.buildTextIndex(corpus, "text", "doc_id",
        dir.toString, nBuckets = 4)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      // a term absent from the corpus must not change scores, ranks,
      // or n_terms — and an all-unknown query returns no rows
      val withUnk = Seq("q" -> Seq("fox", "zzz_not_a_token"))
      val without = Seq("q" -> Seq("fox"))
      assert(rows(TextAnalysis.bm25TopK(corpus, "text", "doc_id",
          withUnk, topK = 5)) ==
        rows(TextAnalysis.bm25TopK(corpus, "text", "doc_id",
          without, topK = 5)))
      assert(rows(TextAnalysis.bm25TopKFromIndex(spark, dir.toString,
          withUnk, topK = 5)) ==
        rows(TextAnalysis.bm25TopKFromIndex(spark, dir.toString,
          without, topK = 5)))
      assert(TextAnalysis.bm25TopKFromIndex(spark, dir.toString,
        Seq("q" -> Seq("zzz_not_a_token")), topK = 5).count() == 0L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("tokenDrift: identical corpora drift zero; one-sided tokens penalize") {
    import graft.operators.Profiling
    val same = Profiling.tokenDrift(corpus, corpus, "text", k = 100)
      .collect()
    // p == q for every token → ln(1) = 0 → every contribution 0
    assert(same.nonEmpty && same.forall(_.getLong(3) == 0L))
    // a token present only in A gets a POSITIVE contribution (p > q)
    val a = corpus.where(col("doc_id") === 4L) // unique-word doc
    val b = corpus.where(col("doc_id") =!= 4L)
    val drift = Profiling.tokenDrift(a, b, "text", k = 100)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(drift("completely") > 0L)
    // and a token only in B reads negative from A's perspective
    assert(drift("fox") < 0L)
  }

  test("bm25TopKFromIndex ≡ bm25TopK, including after incremental append") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx_spec")
    try {
      // build on the even half, APPEND the odd half — the served
      // index must be indistinguishable from a full one-shot build
      TextAnalysis.buildTextIndex(corpus.where(col("doc_id") % 2 === 0),
        "text", "doc_id", dir.toString, nBuckets = 8)
      TextAnalysis.appendToTextIndex(corpus.where(col("doc_id") % 2 === 1),
        "text", "doc_id", dir.toString)
      val qs = Seq("q_fox" -> Seq("fox", "jumps"), "q_dog" -> Seq("dog"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val scan = rows(TextAnalysis.bm25TopK(corpus, "text", "doc_id",
        qs, topK = 4))
      val idx = rows(TextAnalysis.bm25TopKFromIndex(spark, dir.toString,
        qs, topK = 4).withColumnRenamed("id", "doc_id"))
      assert(idx == scan, s"indexed=$idx scan=$scan")
      // and the probe really prunes: only the query terms' buckets read
      val plan = TextAnalysis.bm25TopKFromIndex(spark, dir.toString,
        qs, topK = 4).queryExecution.executedPlan.toString
      assert(plan.contains("part"), plan.take(500))
      // positional postings: the index-served phrase fold counts the
      // same (overlapping) occurrences as scan-time gram counting —
      // "the quick" occurs in docs 1/2/3; "the lazy" likewise; a
      // 3-term phrase exercises the multi-step fold
      val phrases = Seq("the quick", "quick brown fox", "lazy dog")
      val fromIdx = TextAnalysis.phraseHitsFromIndex(spark, dir.toString,
          phrases)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val grams3 = corpus.collect().flatMap { r =>
        val toks = r.getString(1).trim.split("\\s+")
        phrases.map { ph =>
          val pts = ph.split(" ")
          val n = toks.sliding(pts.length)
            .count(w => w.sameElements(pts))
          (r.getLong(0), ph, n.toLong)
        }
      }.filter(_._3 > 0).toSet
      assert(fromIdx == grams3, s"idx=$fromIdx scan=$grams3")
      // compaction: whole history re-lands as batch 0 in a fresh
      // store — identical answers, fewer files, appends still work
      val cdir = java.nio.file.Files.createTempDirectory("bm25idx_cmp")
      try {
        TextAnalysis.compactTextIndex(spark, dir.toString, cdir.toString,
          targetFiles = 1)
        def files(p: String) = {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(p))
            .iterator().asScala.count(_.toString.endsWith(".parquet"))
        }
        assert(rows(TextAnalysis.bm25TopKFromIndex(spark, cdir.toString,
          qs, topK = 4).withColumnRenamed("id", "doc_id")) == scan)
        assert(files(s"$cdir/postings") < files(s"$dir/postings"),
          "compaction must reduce the postings file count")
        // append into the compacted store continues at batch 1
        import spark.implicits._
        TextAnalysis.appendToTextIndex(
          Seq((99L, "a fox epilogue")).toDF("doc_id", "text"),
          "text", "doc_id", cdir.toString)
        val dogNow = TextAnalysis.bm25TopKFromIndex(spark, cdir.toString,
            Seq("q_fox" -> Seq("fox")), topK = 10)
          .collect().map(_.getLong(2)).toSet
        assert(dogNow.contains(99L), s"appended doc missing: $dogNow")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(cdir).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bpeTrain: hand-computed merge tables, greedy overlap, exhaustion") {
    import spark.implicits._
    // aa×2, ab×1 — exercises the </w> tie-break ('<' sorts below 'a'),
    // merge chaining, and EXHAUSTION (only 4 merges exist; asking for
    // 6 must stop at 4, not loop)
    val tiny = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(tiny, "text", nMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1, "a", "</w>", 2L), (2, "a", "a</w>", 2L),
      (3, "a", "b", 1L), (4, "ab", "</w>", 1L)))

    // the classic shape: shared stems merge first, by frequency
    val classic = Seq((1L, "low lowest low"), (2L, "low")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(classic, "text", nMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(m == Seq((1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "low", "</w>", 3L)))

    // greedy left-to-right overlap: [a,a,a] under (a,a) → [aa, a]
    assert(TextAnalysis.mergePair(IndexedSeq("a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "a"))
  }

  test("bpeTokenize: lowest-rank-first application, unknown chars pass") {
    import spark.implicits._
    // merges learned from the classic corpus: (l,o), (lo,w), (low,</w>)
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val df = Seq((1L, "low"), (2L, "lower"), (3L, "xyz low"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenize(df, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // "low" → [low</w>]; "lower" → [low, e, r, </w>] (rank of (l,o)
    // beats nothing else; (low,</w>) never applies mid-word);
    // "xyz" has no learned pairs → [x, y, z, </w>]
    assert(got(1L)._1 == 1L)
    assert(got(2L)._1 == 4L)
    assert(got(3L)._1 == 4L + 1L)
    assert(got(1L)._2 == graft.operators.Dedup.md5Hex("low</w>"))
    assert(got(2L)._2 == graft.operators.Dedup.md5Hex("low e r </w>"))
    assert(got(3L)._2 ==
      graft.operators.Dedup.md5Hex("x y z </w> low</w>"))
  }

  test("sourceOverlapKmv: exact at k >= universe; sane bounds under sketching") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(5)
    def sentence(n: Int) =
      Seq.fill(n)("w" + rnd.nextInt(400)).mkString(" ")
    // A and B share half their docs; C is disjoint vocabulary
    val shared = Seq.fill(20)(sentence(30))
    val rows =
      shared.zipWithIndex.flatMap { case (t, i) =>
        Seq((i * 2L, t, "A"), (i * 2L + 1, t, "B")) } ++
      (0 until 20).map(i => (1000L + i, sentence(30), "A")) ++
      (0 until 20).map(i => (2000L + i, sentence(30), "B")) ++
      (0 until 20).map(i =>
        (3000L + i, Seq.fill(30)("z" + rnd.nextInt(400)).mkString(" "), "C"))
    val df = rows.toDF("doc_id", "text", "source")
    // k larger than the distinct-shingle universe: estimator is EXACT
    val exact = Dedup.sourceOverlapMatrix(df, "text", "doc_id", "source",
      1000).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (10000L * r.getLong(2) /
          (r.getLong(3) + r.getLong(4) - r.getLong(2)))).toMap
    val full = Dedup.sourceOverlapKmv(df, "text", "doc_id", "source",
      1000, k = 100000).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    exact.foreach { case (pair, j) =>
      assert(math.abs(full(pair) - j) <= 1, s"$pair: ${full(pair)} vs $j")
    }
    // sketched at k=256: within KMV error (~1/sqrt(k) ~ 6e2 in e4)
    val est = Dedup.sourceOverlapKmv(df, "text", "doc_id", "source",
      1000, k = 256).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    exact.foreach { case (pair, j) =>
      assert(math.abs(est(pair) - j) <= 1500, s"$pair: ${est(pair)} vs $j")
    }
    assert(est(("A", "C")) == 0L || !est.contains(("A", "C")))
  }

  test("contentManifest: partition-independent digest; any change moves it") {
    import graft.operators.Dedup
    val df = Seq((1L, "aaa", "A"), (2L, "bbb", "A"), (3L, "ccc", "B"))
      .toDF("doc_id", "text", "source")
    def digest(d: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] =
      Dedup.contentManifest(d, "text", "source").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val base = digest(df)
    assert(base("A")._1 == 2L && base("A")._2 == 6L)
    // commutative: any partitioning/order yields the same digest
    assert(digest(df.repartition(3).orderBy(col("doc_id").desc)) == base)
    // a one-char change in one doc moves ONLY that group's digest
    val changed = digest(Seq((1L, "aaa", "A"), (2L, "bbx", "A"),
      (3L, "ccc", "B")).toDF("doc_id", "text", "source"))
    assert(changed("B") == base("B") && changed("A") != base("A"))
    // digest is the mod-2^60 sum of per-doc hash60 values
    val expA = (Dedup.md5Hash60("aaa") + Dedup.md5Hash60("bbb")) &
      ((1L << 60) - 1)
    assert(base("A")._3 == expA)
  }

  test("compressionStats: repetition deflates hard, noise barely, empty is 0") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(2000)((33 + rnd.nextInt(94)).toChar).mkString
    val rep = "lorem ipsum dolor sit amet " * 80
    val df = Seq((1L, rep), (2L, noise), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionStats(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L)._1 == rep.length && got(3L) == ((0L, 0L, 0L)))
    assert(got(1L)._3 < 1000, s"repetition compresses hard: ${got(1L)}")
    assert(got(2L)._3 > 7000, s"noise barely compresses: ${got(2L)}")
    // determinism: a second run produces identical sizes
    val again = TextAnalysis.compressionStats(df.repartition(3), "text",
      "doc_id").collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == got)
  }

  test("sourceOverlapMatrix counts shared distinct shingles per source pair") {
    val df = Seq(
      // A and B share doc 1's content verbatim; C is disjoint
      (1L, "the quick brown fox jumps over the lazy dog", "A"),
      (2L, "the quick brown fox jumps over the lazy dog", "B"),
      (3L, "a wholly different sentence lives in here now", "C"),
      // duplicate WITHIN A — must not inflate A's distinct size
      (4L, "the quick brown fox jumps over the lazy dog", "A"))
      .toDF("doc_id", "text", "source")
    val m = Dedup.sourceOverlapMatrix(df, "text", "doc_id", "source", 100)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // 9 tokens → 7 distinct 3-gram shingles per copy
    assert(m(("A", "B")) == ((7L, 7L, 7L, 10000L)))
    assert(!m.contains(("A", "C")) && !m.contains(("B", "C")))
  }

  test("clustersCanonical: clones inherit, near-dup at content cardinality") {
    // a ≈ b (near-dups), c unique; a is cloned twice — the clones must
    // join a's cluster purely through the exact-group collapse, and
    // labels stay the min doc id of the merged content groups
    val ta = "the quick brown fox jumps over the lazy dog tonight"
    val tb = "the quick brown fox jumps over the lazy dog today"
    val df = Seq(
      (1L, ta), (2L, tb), (3L, "completely unrelated text about ships"),
      (10L, ta), (20L, ta)).toDF("doc_id", "text")
    val got = Dedup.clustersCanonical(df, "text", "doc_id",
        thresholdE4 = 5000, maxDf = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 10L -> 1L, 20L -> 1L),
      got.toString)
    // clone-free corpus: identical labels to the all-docs pair closure
    val clean = df.where(col("doc_id") < 10L)
    val canonical = Dedup.clustersCanonical(clean, "text", "doc_id",
        thresholdE4 = 5000, maxDf = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allDocs = Dedup.connectedComponents(clean.select(col("doc_id")),
        "doc_id",
        Dedup.jaccardPairsPostingKernelFromShingles(
          Dedup.shingleHashKernel(clean, "text", "doc_id", 3), 5000, 100),
        "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canonical == allDocs)
  }

  test("clustersCanonicalIncremental == full re-resolve; adoption and bridges") {
    val ta = "the quick brown fox jumps over the lazy dog tonight"
    val tb = "the quick brown fox jumps over the lazy dog today"
    val tc = "a completely different story about sailing ships at dawn"
    val td = "a completely different story about sailing ships at dusk"
    val corpus = Seq(
      (1L, ta), (2L, tb),  // near-dup component {1,2}
      (3L, tc),            // singleton component {3}
      (5L, td))            // singleton component {5} (≈ tc but unlinked
                           // only if threshold high — with 5000 they link;
                           // use them as a standing component {3,5})
      .toDF("doc_id", "text")
    val labels = Dedup.clustersCanonical(corpus, "text", "doc_id", 5000, 100)
    val batch = Seq(
      (10L, ta),                                   // content ADOPTION → comp 1
      (11L, "the quick brown fox jumps over the lazy dog forever"), // novel near-dup → comp 1
      (12L, "an entirely new subject never seen before today okay"), // novel singleton
      (13L, "an entirely new subject never seen before today yes")) // batch-internal pair with 12
      .toDF("doc_id", "text")
    val inc = Dedup.clustersCanonicalIncremental(batch, "text", "doc_id",
        corpus, labels, thresholdE4 = 5000, maxDf = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.clustersCanonical(corpus.unionByName(batch), "text",
        "doc_id", thresholdE4 = 5000, maxDf = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full, s"inc $inc vs full $full")
    assert(inc(10L) == 1L && inc(11L) == 1L) // adoption + novel link
    assert(inc(12L) == 12L && inc(13L) == 12L) // batch-internal pair
  }

  test("cooccurrenceLift: window semantics, exact lift, df cap, self-pairs") {
    // doc: "a b a" — window 1 pairs: (a,b)@(0,1), (a,b)@(1,2) → n_ab=2
    // totals a=2, b=1, N=3 → lift(a,b) = 10000·2·3 / (2·1) = 30000
    val d1 = Seq((1L, "a b a")).toDF("doc_id", "text")
    val w1 = TextAnalysis.cooccurrenceLift(d1, "text", "doc_id",
      window = 1, maxDf = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5))).toSet
    assert(w1 == Set(("a", "b", 2L, 30000L)))
    // window 2 adds the SELF pair (a,a)@(0,2): lift = 10000·1·3/(2·2)
    val w2 = TextAnalysis.cooccurrenceLift(d1, "text", "doc_id",
      window = 2, maxDf = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5))).toSet
    assert(w2 == Set(("a", "b", 2L, 30000L), ("a", "a", 1L, 7500L)))
    // df cap: a token in > maxDf docs never pairs, and the totals
    // universe excludes it ("x y" survives with N over kept tokens)
    val d2 = Seq((1L, "the x y"), (2L, "the z"), (3L, "the q"))
      .toDF("doc_id", "text")
    val capped = TextAnalysis.cooccurrenceLift(d2, "text", "doc_id",
      window = 3, maxDf = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // kept universe: x y z q (N=4); only (x,y) is within a window
    assert(capped == Set(("x", "y", 1L, 1L, 1L, 40000L)))
    // minCount prunes the rare-pair noise floor
    assert(TextAnalysis.cooccurrenceLift(d2, "text", "doc_id",
      window = 3, maxDf = 2, minCount = 2).count() == 0L)
  }

  test("cooccurrenceLiftFrac: in-plan fractional df cap, scale-stable") {
    val d = Seq((1L, "the x y"), (2L, "the z"), (3L, "the q"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // fracE4=5000 at N=3 docs → cap = 3·5000 DIV 10⁴ = 1 ≡ absolute 1:
    // "the" (df 3) is hot, x/y/z/q kept
    assert(rows(TextAnalysis.cooccurrenceLiftFrac(d, "text", "doc_id",
        window = 3, maxDfFracE4 = 5000, minCount = 1)) ==
      rows(TextAnalysis.cooccurrenceLift(d, "text", "doc_id",
        window = 3, maxDf = 1, minCount = 1)))
    // the scale-stability point: clone the corpus 10× with re-keyed
    // docs — every df inflates 10× and an absolute cap tuned above
    // ("the" hot at df>1) now blanks EVERYTHING (df ≥ 10 > 1), while
    // the fractional cap keeps the same kept-token universe
    val cloned = (0 until 10).map(i =>
        d.select((col("doc_id") + i * 100).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    assert(TextAnalysis.cooccurrenceLift(cloned, "text", "doc_id",
      window = 3, maxDf = 1, minCount = 1).count() == 0L)
    val frac = TextAnalysis.cooccurrenceLiftFrac(cloned, "text", "doc_id",
      window = 3, maxDfFracE4 = 5000, minCount = 1)
    // same pairs as the unit corpus, counts scaled 10× and lift
    // invariant: n_ab·N/(n_a·n_b) = 10·1·30/(10·10) = the unit value
    assert(frac.select("tok_a", "tok_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("x", "y")))
    assert(frac.select("lift_e4").collect().head.getLong(0) == 40000L)
    // bounds enforced
    intercept[IllegalArgumentException] {
      TextAnalysis.cooccurrenceLiftFrac(d, "text", "doc_id",
        window = 3, maxDfFracE4 = 0, minCount = 1)
    }
  }

  test("bpeTrain delta-maintained counts == naive full-recount reference") {
    // the delta fold must be indistinguishable from recounting every
    // pair each step — randomized dictionaries over a tiny alphabet
    // (maximizing merged-symbol string collisions and zero-then-revive
    // count keys), plus exhaustion (fewer pairs than requested merges)
    def naive(wordFreq: Seq[(String, Long)],
        n: Int): Seq[(Int, String, String, Long)] = {
      var dict = wordFreq.map { case (w, f) =>
        (w.map(_.toString).toIndexedSeq :+ "</w>", f) }
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, Long)]
      var step = 1
      var done = false
      while (step <= n && !done) {
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long].withDefaultValue(0L)
        dict.foreach { case (syms, f) =>
          if (syms.length >= 2)
            syms.sliding(2).foreach(p => counts((p(0), p(1))) += f)
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), f) = counts.toSeq
            .sortBy { case ((l, r), f) => (-f, l, r) }.head
          out += ((step, l, r, f))
          dict = dict.map { case (syms, fr) =>
            (TextAnalysis.mergePair(syms, l, r), fr) }
          step += 1
        }
      }
      out.toSeq
    }
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      val words = (0 until 40).map { _ =>
        (1 to (1 + rnd.nextInt(5))).map(_ =>
          if (rnd.nextBoolean()) "a" else "b").mkString
      }
      // corpus text: words with skewed repetition → realistic freqs
      val text = rnd.shuffle(words.flatMap(w =>
        Seq.fill(1 + rnd.nextInt(4))(w))).mkString(" ")
      val df = Seq(Tuple1(text)).toDF("text")
      val got = TextAnalysis.bpeTrain(df, "text", nMerges = 8)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val freq = text.split(" ").filter(_.nonEmpty)
        .groupBy(identity).toSeq.map { case (w, g) => (w, g.length.toLong) }
      assert(got == naive(freq, 8), s"seed $seed")
    }
  }

  test("buildVocabTable: PlanLint-clean at k=250k, loud past the maxK bound") {
    val df = Seq((1L, "a b c a"), (2L, "b c d")).toDF("doc_id", "text")
    // the rank window runs AFTER limit(k) — PlanLint's bounded-input
    // exemption must hold even at the BPE-scale k (the project's own
    // linter can't flag its own operator under user composition)
    val findings = graft.plans.PlanLint.audit(
      TextAnalysis.buildVocabTable(df, "text", k = 250000))
    assert(findings.isEmpty, findings.toString)
    // and the k-row one-task envelope is a loud contract, not implicit
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.buildVocabTable(df, "text", k = 2000000)
    }
    assert(ex.getMessage.contains("prefix-sum"))
  }

  test("sourceOverlapMatrix df cap drops boilerplate shared by hot docs") {
    // the shared shingle set appears in 3 docs; cap at 2 removes it
    val df = Seq(
      (1L, "common boiler plate line", "A"),
      (2L, "common boiler plate line", "B"),
      (3L, "common boiler plate line", "C"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.sourceOverlapMatrix(df, "text", "doc_id", "source", 2)
      .count() == 0L)
    assert(Dedup.sourceOverlapMatrix(df, "text", "doc_id", "source", 3)
      .count() == 3L)
  }
}
