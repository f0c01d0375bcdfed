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

  test("qNgramJaccard stays ground-truth-only (no production caller)") {
    // The exact all-pairs Jaccard is the oracle's ground truth for the
    // LSH path; its join is quadratic in shingle document-frequency, so
    // a production query must never depend on it. Source-level guard:
    // the symbol may appear only at its definition (Dedup.scala) and
    // its own queries-map registration (SparkEntry.scala).
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala")
    val walk = Files.walk(root)
    val offenders =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .filterNot(p => p.getFileName.toString == "Dedup.scala" ||
          p.getFileName.toString == "SparkEntry.scala")
        .filter(p => new String(Files.readAllBytes(p)).contains("qNgramJaccard"))
        .toList
      finally walk.close()
    assert(offenders.isEmpty,
      s"qNgramJaccard referenced outside its definition/registration: $offenders")
    // and within SparkEntry, only the single registration line
    val entry = new String(Files.readAllBytes(
      Paths.get("src/main/scala/graft/SparkEntry.scala")))
    assert(entry.linesIterator.count(_.contains("qNgramJaccard")) == 1,
      "qNgramJaccard must appear exactly once in SparkEntry (its registration)")
  }
}
