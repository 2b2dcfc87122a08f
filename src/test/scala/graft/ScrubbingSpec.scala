package graft

import org.apache.spark.sql.functions._

import graft.operators.{Boilerplate, Pii, Sampling}

/** The corpus-scrubbing pipeline operators: PII redaction, boilerplate
  * line removal, source-mixture rebalancing. */
class ScrubbingSpec extends SparkTestBase {
  import spark.implicits._

  test("Pii.redact replaces each class with its tag, email first") {
    val df = Seq(
      (1L, "write to a.b+c@ex-ample.org today"),
      (2L, "dial +1-555-0199 or +44-202-7946"),
      (3L, "server 10.0.0.1 and 255.255.255.255"),
      (4L, "no pii here"),
      // the dotted quad inside the email domain is consumed by the
      // email tag, not double-redacted
      (5L, "x@10.0.0.1.net plus bare 10.0.0.2")
    ).toDF("id", "t")
    val out = df.select(col("id"), Pii.redact(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write to <EMAIL> today")
    assert(out(2L) == "dial <PHONE> or <PHONE>")
    assert(out(3L) == "server <IP> and <IP>")
    assert(out(4L) == "no pii here")
    // the dotted quad inside the email domain redacts as part of the
    // email (pass order), never as a second <IP>
    assert(out(5L) == "<EMAIL> plus bare <IP>")
  }

  test("piiStats counts non-overlapping matches per class") {
    val df = Seq((7L, "a@b.co c@d.io +1-555-1234 1.2.3.4 5.6.7.8 plain"))
      .toDF("id", "t")
    val r = Pii.piiStats(df, "t", "id").collect().head
    assert(r.getAs[Long]("n_emails") == 2L)
    assert(r.getAs[Long]("n_phones") == 1L)
    assert(r.getAs[Long]("n_ips") == 2L)
    val clean = "<EMAIL> <EMAIL> <PHONE> <IP> <IP> plain"
    assert(r.getAs[Long]("clean_len") == clean.length.toLong)
  }

  test("kAnonymousAggregate suppresses small groups by CONTRIBUTORS, not rows") {
    // group "a": 2 users × 3 rows (6 rows, 2 contributors → suppressed
    // at k=3 even though rows ≥ k); group "b": 3 users → released
    val rows = (Seq.tabulate(6)(i => ("a", (i % 2).toLong, 10L)) ++
      Seq(("b", 10L, 1L), ("b", 11L, 2L), ("b", 12L, 4L)))
      .toDF("g", "uid", "v")
    val got = Pii.kAnonymousAggregate(rows, Seq("g"), "uid", k = 3,
        Seq("n_rows" -> count(lit(1)), "sum_v" -> sum(col("v"))))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_contributors"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("sum_v"))).toSeq
    assert(got == Seq(("b", 3L, 3L, 7L)))
  }

  test("Boilerplate.strip drops df>=minDf lines, preserves order, keeps empty docs") {
    val docs = Seq(
      (1L, "HEADER\nbody one\nmiddle\nFOOTER"),
      (2L, "HEADER\nbody two\nFOOTER"),
      (3L, "HEADER\nFOOTER"), // everything boilerplate → empty clean view
      (4L, "unique only")
    ).toDF("doc_id", "text")
    val out = Boilerplate.strip(docs, "text", "doc_id", minDf = 3L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
    // HEADER and FOOTER both reach df=3 → dropped everywhere
    assert(out(1L) == ((4L, 2L, "body one\nmiddle")))
    assert(out(2L)._3 == "body two")
    assert(out(3L) == ((2L, 0L, "")))
    assert(out(4L) == ((1L, 1L, "unique only")))
  }

  test("Boilerplate.lineDf counts distinct docs, not occurrences") {
    val docs = Seq(
      (1L, "dup\ndup\ndup"), // 3 occurrences, 1 doc
      (2L, "dup\nother")
    ).toDF("doc_id", "text")
    val df = Boilerplate.lineDf(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("dup") == 2L)
    assert(df("other") == 1L)
  }

  test("mixToTarget hits the target mix via closed-form integer rates") {
    val rows = (0L until 3000L).map { i =>
      (i, if (i < 2000) "web" else if (i < 2800) "code" else "math")
    }
    val df = rows.toDF("id", "src")
    // target 50/25/25 — math (200 docs vs 25% weight) binds: T = 800
    val (mixed, rates) = Sampling.mixToTarget(df, "id", "src",
      Map("web" -> 5000, "code" -> 2500, "math" -> 2500))
    assert(rates("math") == 10000) // the binding stratum keeps itself
    assert(rates("web") == 800L * 5000L / 2000L)  // 2000
    assert(rates("code") == 800L * 2500L / 800L)  // 2500
    val counts = mixed.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // binding stratum kept whole; others near their target share of 800
    assert(counts("math") == 200L)
    assert(math.abs(counts("web") - 400L) < 80)
    assert(math.abs(counts("code") - 200L) < 60)
  }

  test("writeSharded: one file per shard, lossless, partitioning-independent") {
    import graft.sources.CorpusSink
    val dir = java.nio.file.Files.createTempDirectory("shard_spec").toString
    val df = (0L until 500L).map(i => (i, s"doc $i")).toDF("id", "text")
    // scramble the input partitioning: shard layout must not care
    CorpusSink.writeSharded(df.repartition(7), "id", dir, nShards = 4)
    val back = CorpusSink.readSharded(spark, dir)
    assert(back.count() == 500L)
    assert(back.select("id").as[Long].collect().toSet == (0L until 500L).toSet)
    // each shard dir holds exactly one parquet file
    val shardFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(
        _.listFiles().count(_.getName.endsWith(".parquet")))
    assert(shardFiles.length == 4 && shardFiles.forall(_ == 1))
    // membership matches the closed-form column on any layout
    val expected = df.select(col("id"),
      Sampling.shardColumn(col("id"), 4).as("shard"))
    assert(back.select(col("id"), col("shard").cast("long").as("shard"))
      .except(expected).count() == 0L)
  }

  test("ORC roundtrip is lossless and the pinned schema is enforced") {
    import graft.sources.CorpusSink
    val dir = java.nio.file.Files.createTempDirectory("orc_spec").toString
    val df = Seq(
      (1L, "plain ascii"),
      (2L, "unicode ü中文 text"),
      (3L, "embedded \"quotes\" and\nnewline"))
      .toDF("doc_id", "text")
    CorpusSink.writeOrc(df, dir)
    val back = CorpusSink.readOrc(spark, dir, df.schema)
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // pinned schema is the caller's contract: renamed column → nulls
    // would be silent with inference; with the pin the mismatch shows
    // as an all-null column the caller can assert on (ORC reads by
    // name)
    val renamed = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("body", org.apache.spark.sql.types.StringType)
    val nulls = CorpusSink.readOrc(spark, dir, renamed)
    assert(nulls.where(col("body").isNull).count() == 3L)
  }

  test("normalizeWs: controls to spaces, runs collapsed, lines trimmed") {
    val df = Seq(
      (1L, "\t a\u0000b  c \r\n  d  "),
      (2L, "already clean"),
      (3L, "keep\n\nblank lines")
    ).toDF("id", "t")
    val out = df.select(col("id"),
        graft.operators.TextAnalysis.normalizeWs(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c\nd")
    assert(out(2L) == "already clean")
    assert(out(3L) == "keep\n\nblank lines")
  }

  test("scrub operators run unchanged on a stream (row-local)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("id", "t")
      .select(col("id"), Pii.redact(
        graft.operators.TextAnalysis.normalizeWs(col("t"))).as("clean"))
      .writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").start()
    try {
      source.addData((1L, "  mail \t x@y.org  now"), (2L, "ip 10.0.0.7 ok"))
      q.processAllAvailable()
      val got = spark.table("scrub_stream").as[(Long, String)]
        .collect().toMap
      assert(got(1L) == "mail <EMAIL> now")
      assert(got(2L) == "ip <IP> ok")
    } finally q.stop()
  }

  test("selectByBudget keeps best-priority docs starting under the budget") {
    import graft.operators.Packing
    // priorities: doc 3 best, then 1, then 2, then 4; tokens 4/3/5/2
    val df = Seq(
      (1L, 3L, 10L), (2L, 5L, 20L), (3L, 4L, 0L), (4L, 2L, 30L)
    ).toDF("id", "nt", "pr")
    // order: 3 (off 0), 1 (off 4), 2 (off 7), 4 (off 12)
    val sel = Packing.selectByBudget(df, "id", "nt", "pr", budget = 12L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sel == Map(3L -> 0L, 1L -> 4L, 2L -> 7L)) // 4 starts AT 12 → out
    // a doc may straddle the boundary (2 ends at 12 > budget) — the
    // contract is starts-inside, matching the oracle's cumsum cut
    val all = Packing.selectByBudget(df, "id", "nt", "pr", budget = 13L)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(3L, 1L, 2L, 4L))
  }

  test("selectByBudgetByGroup cuts each group in its own token space") {
    import graft.operators.Packing
    val df = Seq(
      ("g1", 1L, 5L, 1L), ("g1", 2L, 5L, 2L), ("g1", 3L, 5L, 3L),
      ("g2", 4L, 5L, 1L), ("g2", 5L, 5L, 2L)
    ).toDF("grp", "id", "nt", "pr")
    val sel = Packing.selectByBudgetByGroup(df, "grp", "id", "nt", "pr",
        Map("g1" -> 10L, "g2" -> 5L))
      .collect().map(r => r.getLong(1)).toSet
    // g1 budget 10: ids 1 (off 0), 2 (off 5); 3 starts at 10 → out
    // g2 budget 5: id 4 (off 0); 5 starts at 5 → out
    assert(sel == Set(1L, 2L, 4L))
    // a group without a budget is dropped entirely
    val sel2 = Packing.selectByBudgetByGroup(df, "grp", "id", "nt", "pr",
        Map("g1" -> 10L))
      .collect().map(_.getLong(1)).toSet
    assert(sel2 == Set(1L, 2L))
    // out-of-contract priority raises instead of silently reordering
    val bad = Seq(("g1", 1L, 5L, -1L)).toDF("grp", "id", "nt", "pr")
    val ex = intercept[Exception] {
      Packing.selectByBudgetByGroup(bad, "grp", "id", "nt", "pr",
        Map("g1" -> 10L)).collect()
    }
    assert(ex.getMessage.contains("selectByBudget contract")
      || Option(ex.getCause).exists(_.getMessage != null
        && ex.getCause.getMessage.contains("selectByBudget contract")))
  }

  test("mixToTarget drops unlisted strata and nests under weight changes") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val (m1, _) = Sampling.mixToTarget(df, "id", "src", Map("a" -> 10000))
    assert(m1.where(col("src") === "b").count() == 0L)
    assert(m1.count() == 500L) // sole stratum keeps itself entirely
    // halving a's effective rate via a second stratum: kept set nests
    val (m2, _) = Sampling.mixToTarget(df, "id", "src",
      Map("a" -> 5000, "b" -> 5000))
    val a2 = m2.where(col("src") === "a").select("id").as[Long].collect().toSet
    val a1 = m1.select("id").as[Long].collect().toSet
    assert(a2.subsetOf(a1))
    // weights naming only absent strata → empty result, no crash
    val (m3, r3) = Sampling.mixToTarget(df, "id", "src", Map("zz" -> 10000))
    assert(m3.count() == 0L && r3.isEmpty)
  }
}
