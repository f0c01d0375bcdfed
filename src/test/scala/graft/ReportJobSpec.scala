package graft

import graft.operators.ReportJob

/** Window/parse semantics of the DataReport analog (FIXTURES.md A4
  * edge cases). */
class ReportJobSpec extends SparkSpec {
  import spark.implicits._

  private def line(dt: String, tp: String = "shelf", area: String = "AREA_US") =
    s"""{"dt":"$dt","type":"$tp","username":"shenhe1","area":"$area"}"""

  test("unparseable dt is filtered out (P4/P6)") {
    val parsed = ReportJob.parse(Seq(
      line("2018-01-01 10:11:22"), line("garbage"), line("")).toDF("line"))
    assert(parsed.count() == 1)
  }

  test("30s tumbling windows split on the boundary; max ts formatted (A2/A3/P8)") {
    val parsed = ReportJob.parse(Seq(
      line("2018-01-01 10:00:00"), line("2018-01-01 10:00:29"),
      line("2018-01-01 10:00:30"), line("2018-01-01 10:00:59"),
      line("2018-01-01 10:01:00")).toDF("line"))
    val rows = ReportJob.windowAgg(parsed).collect()
      .map(r => (r.getAs[String]("wstart"), r.getAs[Long]("cnt"), r.getAs[String]("time")))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("2018-01-01 10:00:00", 2L, "2018-01-01 10:00:29"),
      ("2018-01-01 10:00:30", 2L, "2018-01-01 10:00:59"),
      ("2018-01-01 10:01:00", 1L, "2018-01-01 10:01:00")))
  }

  test("grouping is per (type, area) within a window (A1)") {
    val parsed = ReportJob.parse(Seq(
      line("2018-01-01 10:00:01", "shelf", "AREA_US"),
      line("2018-01-01 10:00:02", "shelf", "AREA_IN"),
      line("2018-01-01 10:00:03", "unshelf", "AREA_US"),
      line("2018-01-01 10:00:04", "shelf", "AREA_US")).toDF("line"))
    val rows = ReportJob.windowAgg(parsed).collect()
      .map(r => ((r.getAs[String]("type"), r.getAs[String]("area")), r.getAs[Long]("cnt")))
      .toMap
    assert(rows == Map(("shelf", "AREA_US") -> 2L, ("shelf", "AREA_IN") -> 1L,
      ("unshelf", "AREA_US") -> 1L))
  }
}
