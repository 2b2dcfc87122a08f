package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.EntityResolution

/** Pins [[EntityResolution]]: blocking recall for 1-edit typos, the
  * df-cap drop, threshold-levenshtein verification, transitive entity
  * labels, and the survivorship tie-break. */
class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def records(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "name")

  test("matches finds 1-edit pairs and scores them integrally") {
    val df = records(
      1L -> "Acme Corp", 2L -> "acme korp", 3L -> "beta llc",
      4L -> "ACME CORP ")
    val m = EntityResolution.matches(df, "id", "name", maxDist = 1,
      maxTokenDf = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // normalization folds 1 and 4 into one value; korp↔corp is dist 1;
    // sim_e4 = 10⁴·(9−1)/9 = 8888 (floor)
    assert(m.toSeq == Seq(("acme corp", "acme korp", 1L, 8888L)))
  }

  test("blocking recall: a 1-edit typo in a multi-token value always pairs") {
    // one edit touches at most one token — the other survives verbatim
    val base = Seq("global data systems", "prime metal works",
      "union freight lines")
    val typo = base.map(s => s.updated(s.length - 1, 'x'))
    val df = records((base ++ typo).zipWithIndex.map {
      case (s, i) => (i.toLong, s)
    }: _*)
    val m = EntityResolution.matches(df, "id", "name", maxDist = 1,
      maxTokenDf = 100).collect()
    assert(m.length == base.size)
  }

  test("df cap drops hot block keys: values sharing only a hot token never pair") {
    // "inc" is shared by every value; with maxTokenDf = 2 it is not a
    // block key, and no other token is shared — zero candidates even
    // though some pairs would verify at dist 1
    val df = records(
      1L -> "alpha inc", 2L -> "alphq inc", 3L -> "gamma inc",
      4L -> "delta inc")
    val capped = EntityResolution.matches(df, "id", "name", maxDist = 1,
      maxTokenDf = 2).count()
    assert(capped == 0L)
    // raising the cap restores the alpha/alphq match
    val open = EntityResolution.matches(df, "id", "name", maxDist = 1,
      maxTokenDf = 100)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(open.toSeq == Seq(("alpha inc", "alphq inc")))
  }

  test("entities are transitive and labeled by min record id") {
    // chain: "north mill co" ~1~ "north mall co" ~1~ "north mall cq"
    // (ends are dist 2 apart — only transitivity merges them)
    val df = records(
      10L -> "north mill co", 11L -> "north mall co",
      12L -> "north mall cq", 13L -> "south mill co", 14L -> "north mall co")
    val e = EntityResolution.entities(df, "id", "name", maxDist = 1,
      maxTokenDf = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // "south mill co" is dist 2 from "north mill co" — separate entity
    assert(e(13L) == 13L)
    assert(Set(10L, 11L, 12L, 14L).map(e) == Set(10L))
  }

  test("canonical value: record support wins, ties break lexicographically") {
    val df = records(
      1L -> "acme corp", 2L -> "acme corp", 3L -> "acme korp",
      4L -> "zeta ltd", 5L -> "zetq ltd")
    val c = EntityResolution.canonicalValues(df, "id", "name", maxDist = 1,
      maxTokenDf = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // acme corp has support 2 > korp's 1; zeta/zetq tie at 1 → "zeta ltd"
    assert(c.toSeq == Seq(
      (1L, "acme corp", 2L, 3L), (4L, "zeta ltd", 2L, 2L)))
  }

  test("blockingProfile counts blocks, hot drops, and the reduction ratio") {
    // 4 values; "inc" hot at cap 2 (df 4) → only the alpha/alphq and
    // gamma/gamow pairs survive via their distinctive tokens... none
    // share one, so candidates = 0; with cap 100, all C(4,2)=6 pair
    val df = records(
      1L -> "alpha inc", 2L -> "alphq inc", 3L -> "gamma inc",
      4L -> "delta inc")
    val capped = EntityResolution.blockingProfile(df, "id", "name", 2)
      .collect().head
    assert((capped.getLong(0), capped.getLong(1), capped.getLong(2),
      capped.getLong(3), capped.getLong(4)) == ((4L, 5L, 1L, 0L, 0L)))
    val open = EntityResolution.blockingProfile(df, "id", "name", 100)
      .collect().head
    assert((open.getLong(2), open.getLong(3), open.getLong(4)) ==
      ((0L, 6L, 10000L)))
  }

  test("multi-blocker: full 1-edit recall inside single-token values") {
    // single-token values (no whitespace) of length >= 5 with one
    // substitution at EACH position in turn — token blocking finds
    // none of these, prefix/suffix blocking must find all
    val bases = Seq("alphabet", "kryptonite", "wavelength")
    val rows = bases.zipWithIndex.flatMap { case (s, bi) =>
      val typos = s.indices.map(i => s.updated(i, 'z'))
      (s +: typos).zipWithIndex.map { case (v, j) => (bi * 1000L + j, v) }
    }
    val df = records(rows: _*)
    assert(EntityResolution.matches(df, "id", "name", 1, 10000).count()
      == 0L, "token blocking is blind to single-token typos")
    val multi = EntityResolution.matchesMulti(df, "id", "name", 1, 10000)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // every (base, typo) pair must be found (typo pairs among
    // themselves are dist 2 — filtered by verification)
    bases.foreach { b =>
      val found = multi.count(p => p._1 == b || p._2 == b)
      assert(found == b.length, s"$b: $found of ${b.length} typos found")
    }
  }

  test("resolveIncremental adopts the best entity; unmatched become singletons") {
    val corpus = records(
      1L -> "acme corp", 2L -> "acme korp", 3L -> "zeta ltd")
    val resolved = EntityResolution.entities(corpus, "id", "name", 1, 100)
      .select(col("value"), col("entity")).distinct()
    val batch = records(
      // dist 1 to "acme corp" → adopts the merged acme entity (1)
      10L -> "acme c0rp",
      // dist 1 to zeta ltd only
      11L -> "zetq ltd",
      // matches nothing — singleton labeled by its own record id
      12L -> "omega gmbh")
    val got = EntityResolution.resolveIncremental(batch, "id", "name",
      resolved, maxDist = 1, maxTokenDf = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(10L -> 1L, 11L -> 3L, 12L -> 12L), got.toString)
  }

  test("resolveIncremental never merges two existing entities") {
    // corpus values exactly 2 apart: separate entities at maxDist 1
    val corpus = records(1L -> "abcd co", 2L -> "axyd co")
    val resolved = EntityResolution.entities(corpus, "id", "name", 1, 100)
      .select(col("value"), col("entity")).distinct()
    assert(resolved.select("entity").distinct().count() == 2L)
    // the new value is 1 edit from BOTH — it adopts the smallest
    // entity and the two corpus entities stay distinct (an ingest
    // never makes the merge decision)
    val got = EntityResolution.resolveIncremental(
      records(10L -> "axcd co"), "id", "name", resolved, 1, 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(10L -> 1L))
  }

  test("resolveIncremental validateDisjoint trips on overlapping id spaces") {
    val corpus = records(1L -> "acme corp", 3L -> "zeta ltd")
    val resolved = EntityResolution.entities(corpus, "id", "name", 1, 100)
      .select(col("value"), col("entity")).distinct()
    // batch record id 1 collides with corpus entity id 1: its
    // unmatched value would silently fuse with the acme entity
    val batch = records(1L -> "omega gmbh")
    val ex = intercept[IllegalArgumentException] {
      EntityResolution.resolveIncremental(batch, "id", "name", resolved,
        maxDist = 1, maxTokenDf = 100, validateDisjoint = true).collect()
    }
    assert(ex.getMessage.contains("disjoint id spaces"))
    // disjoint ids pass the guard unchanged
    val ok = EntityResolution.resolveIncremental(
      records(10L -> "omega gmbh"), "id", "name", resolved,
      maxDist = 1, maxTokenDf = 100, validateDisjoint = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ok == Map(10L -> 10L))
  }

  test("multi-blocker key spaces are disjoint: ^/$-leading tokens never alias blocks") {
    // old '^'-marker scheme: the TOKEN "^ab" of value "^ab" equals the
    // PREFIX key of any value starting "ab" — a cross-kind collision
    // that perturbs block df counts. Kind-tagged keys make the spaces
    // strictly disjoint: these two values share no block.
    val df = records(1L -> "^ab", 2L -> "abzzzz")
    val cand = EntityResolution.candidatePairsMulti(
      df.select(col("name").as("value")), maxBlockDf = 1000)
    assert(cand.count() == 0L,
      "a token equal to a would-be prefix key must not form a block")
    // and real prefix blocking still pairs values sharing a prefix
    val cand2 = EntityResolution.candidatePairsMulti(
      records(1L -> "alphabet", 2L -> "alphabez")
        .select(col("name").as("value")), maxBlockDf = 1000)
    assert(cand2.count() == 1L)
  }

  test("null and empty values are dropped, never resolved") {
    val df = Seq((1L, "acme corp"), (2L, null.asInstanceOf[String]),
      (3L, "  ")).toDF("id", "name")
    val e = EntityResolution.entities(df, "id", "name", maxDist = 1,
      maxTokenDf = 100).collect()
    assert(e.map(_.getLong(0)).toSeq == Seq(1L))
  }
}
