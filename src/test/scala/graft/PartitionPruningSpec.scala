package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Writers

/** Partition layout + pruning: the other half of the scan-reduction
  * story (predicate pushdown prunes row groups; partitioning prunes
  * whole directories before any I/O). The harness fixtures are single
  * files, so this spec writes a date-partitioned copy of events and
  * proves the pruned plan. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write is pruned to one partition by a day filter") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    // filesPerDay=1: pin one file per partition dir, so numFiles == 1
    // below tests PRUNING, not the incidental input split count
    Writers.writeDayPartitioned(
      Tables.events(spark, "/root/testdata/sf0.001"), "ts", dir)
    try {
    val days = ev.select("day").distinct().count()
    assert(days > 1, "fixture spans multiple days")

    val read = spark.read.parquet(dir)
    val oneDay = read.filter(col("day") === "2024-01-02")
    val plan = oneDay.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory
    // pruning), not in PushedFilters / post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"expected partition filter in plan:\n$plan")

    val expected = ev.filter(col("day") === "2024-01-02").count()
    // execute THIS dataframe's plan (count() would build a separate
    // physical plan whose metrics we couldn't read back)
    assert(oneDay.collect().length == expected && expected > 0)

    // and the executed scan's own metric confirms exactly one file was
    // read (Dataset.inputFiles would be wrong here: it reports the
    // relation's full FileIndex, not the pruned selection)
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value == 1,
      s"expected 1 file read, got ${scan.metrics("numFiles").value}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
