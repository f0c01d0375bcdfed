package graft

import org.apache.spark.sql.functions._
import graft.operators.CleanJob

/** Edge semantics of the DataClean analog (reference citations in
  * CleanJob's scaladoc; edge cases from FIXTURES.md A1). */
class CleanJobSpec extends SparkSpec {
  import spark.implicits._

  private def enrichLines(lines: Seq[String]) =
    CleanJob.enrich(lines.toDF("line"), CleanJob.dimTable(spark))

  test("known countryCode is enriched with its area") {
    val out = enrichLines(Seq(
      """{"dt":"2018-01-01 10:11:11","countryCode":"US","data":[{"type":"s1","score":0.3,"level":"A"}]}"""))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("area") == "AREA_US")
    assert(out.head.getAs[String]("type") == "s1")
    assert(out.head.getAs[Double]("score") == 0.3)
  }

  test("dim covers the full inverted Redis fixture") {
    val dim = CleanJob.dimTable(spark).collect()
      .map(r => r.getAs[String]("countryCode") -> r.getAs[String]("area")).toMap
    assert(dim == Map("US" -> "AREA_US", "TW" -> "AREA_CT", "HK" -> "AREA_CT",
      "PK" -> "AREA_AR", "KW" -> "AREA_AR", "SA" -> "AREA_AR", "IN" -> "AREA_IN"))
  }

  test("unknown or missing countryCode defaults to 'other' (Scala-side semantics)") {
    val out = enrichLines(Seq(
      """{"dt":"2018-01-01 10:11:11","countryCode":"JP","data":[{"type":"s1","score":0.1,"level":"B"}]}""",
      """{"dt":"2018-01-01 10:11:12","data":[{"type":"s2","score":0.2,"level":"C"}]}"""))
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("area") == "other"))
  }

  test("empty data array yields zero output rows; multi-element fans out") {
    val out = enrichLines(Seq(
      """{"dt":"2018-01-01 10:11:11","countryCode":"US","data":[]}""",
      """{"dt":"2018-01-01 10:11:12","countryCode":"IN","data":[{"type":"s1","score":0.3,"level":"A"},{"type":"s2","score":0.2,"level":"B"}]}"""))
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("area") == "AREA_IN"))
  }

  test("malformed JSON is dropped silently (forgiving from_json semantics)") {
    val out = enrichLines(Seq("not json at all", """{"broken":""")).collect()
    assert(out.isEmpty)
  }

  test("json output form carries the reference's five fields") {
    val lines = Seq(
      """{"dt":"2018-01-01 10:11:11","countryCode":"TW","data":[{"type":"s3","score":0.5,"level":"A+"}]}""")
    val out = CleanJob.enrich(lines.toDF("line"), CleanJob.dimTable(spark))
      .select(to_json(struct(col("type"), col("score"), col("level"), col("area"), col("dt"))).as("value"))
      .collect().head.getAs[String]("value")
    assert(out == """{"type":"s3","score":0.5,"level":"A+","area":"AREA_CT","dt":"2018-01-01 10:11:11"}""")
  }
}
