package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkTestBase {

  test("report: fused row-local checks, unique with null keys, FK dups") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(10L), "a"),
      (Some(1L), Some(10L), "b"),   // dup (k1,k2)
      (Some(2L), None, "c"),
      (Some(2L), None, "d"),        // dup with a NULL key component
      (None, Some(30L), "e"),       // null k1
      (Some(9L), Some(40L), "f"))   // k1=9 missing from the reference
      .toDF("k1", "k2", "tag")
    val ref = Seq(1L, 1L, 2L, 2L).toDF("rk") // duplicated reference keys
    val rep = Quality.report(df, Seq(
        Quality.NotNull("k1"),
        Quality.Satisfies("tag_lt_e", col("tag") < "e"),
        Quality.Unique(Seq("k1", "k2")),
        Quality.ForeignKey("k1", ref, "rk", "ref")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rep("not_null(k1)") == ((1L, "fail")))
    // e and f violate; null predicate would count too
    assert(rep("satisfies(tag_lt_e)") == ((2L, "fail")))
    // two duplicated keys, one surplus row each — the (2,null) pair
    // MUST count (a count-distinct formulation would drop it)
    assert(rep("unique(k1,k2)") == ((2L, "fail")))
    // only k1=9 dangles; duplicate reference rows must not multiply,
    // and the null k1 row is exempt (not-null is its own check)
    assert(rep("foreign_key(k1->ref.rk)") == ((1L, "fail")))
  }

  test("empty batch passes every check; duplicate constraints collapse") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    // an empty batch has ZERO violations, not a failed gate (sum over
    // no rows is NULL — must coalesce, for keyed and fused alike)
    val rep = Quality.report(empty, Seq(
        Quality.NotNull("id"),
        Quality.Satisfies("t_short", length(col("t")) <= 5),
        Quality.Unique(Seq("id"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rep.length == 3)
    assert(rep.forall { case (_, v, st) => v == 0L && st == "pass" })
    // a machine-generated list repeating a check is one check, not an
    // ambiguous-reference crash
    val dup = Quality.report(Seq((1L, "x")).toDF("id", "t"), Seq(
        Quality.NotNull("id"), Quality.NotNull("id"),
        Quality.Unique(Seq("id")), Quality.Unique(Seq("id"))))
      .collect()
    assert(dup.length == 2)
  }

  test("clean frame passes every check; null predicate is a violation") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    val rep = Quality.report(df, Seq(
        Quality.NotNull("id"), Quality.Unique(Seq("id")),
        Quality.Satisfies("t_short", length(col("t")) <= 5)))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(rep.values.toSet == Set("pass"))
    // unknown does not pass a gate: a null predicate value violates
    val withNull = Seq((1L, Some("x")), (2L, None))
      .toDF("id", "t")
    val v = Quality.report(withNull,
        Seq(Quality.Satisfies("t_short", length(col("t")) <= 5)))
      .collect().head
    assert(v.getLong(1) == 1L && v.getString(2) == "fail")
  }
}
