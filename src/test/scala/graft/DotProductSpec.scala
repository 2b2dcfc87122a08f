package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Similarity

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot == higher-order fold dot, bit for bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f),
        Array.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("id", "a", "b")
    val both = rows.select(
      GraftFunctions.dotNative(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("fold"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // exact, not approx
    }
  }

  test("native dot works in a join condition (codegen context)") {
    GraftFunctions.register(spark)
    val s2 = math.sqrt(0.5).toFloat
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(s2, s2, 0f))).toDF("id", "v")
    val pairs = vecs.as("a").join(vecs.as("b"),
        col("a.id") < col("b.id") &&
          GraftFunctions.dotNative(col("a.v"), col("b.v")) > 0.5)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 2L), (1L, 2L)))
  }

  test("registered in SQL via graft_dot") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("dot_test")
    val v = spark.sql("SELECT graft_dot(a, b) FROM dot_test").head().getDouble(0)
    assert(v == 11.0)
  }

  test("double arrays and mixed float/double accepted") {
    GraftFunctions.register(spark)
    val v = Seq((Array(1.0, 2.0), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(GraftFunctions.dotNative(col("a"), col("b")))
      .head().getDouble(0)
    assert(v == 11.0)
  }
}
