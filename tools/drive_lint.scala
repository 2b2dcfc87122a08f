import org.apache.spark.sql.functions._
val sf = "/root/testdata/sf0.001"
val flagged = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
var failed = 0
graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
  try {
    val findings = graft.plans.PlanLint.audit(fn(spark, sf))
    if (findings.nonEmpty) flagged += ((n, findings.map(_.rule).distinct.mkString(",")))
  } catch { case e: Throwable => failed += 1; println(s"[lint-err] $n: ${e.getMessage.take(80)}") }
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
}
println(s"[lint-sweep] flagged=${flagged.size} failed=$failed of ${graft.SparkEntry.queries.size}")
flagged.foreach { case (n, r) => println(s"[lint-flag] $n: $r") }
sys.exit(0)
