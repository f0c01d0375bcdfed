package graft

/** Whole-surface plan audit: every SparkEntry query is planned and
  * screened for scale anti-patterns. This is a standing guard — a new
  * query that sneaks in a cartesian product or an interpreted Python
  * UDF fails here before it ever reaches a cluster. */
class PlanAuditSpec extends SparkSpec {

  test("no query plans a cartesian product or a Python UDF") {
    val d = "/root/testdata/sf0.001"
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, d).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING ERROR: ${e.getMessage}" }
      Seq(
        Option.when(plan.contains("CartesianProduct"))(s"$name: CartesianProduct"),
        Option.when(plan.contains("BatchEvalPython") || plan.contains("PythonUDF"))(
          s"$name: Python UDF"),
        Option.when(plan.startsWith("PLANNING ERROR"))(s"$name: $plan")
      ).flatten
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
