package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Writers

/** Writers.compactBucketed must shrink an append-accreted bucketed
  * table back to one file per non-empty bucket WITHOUT changing its
  * contents or its zero-exchange read plans. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def warehouseDir(table: String) =
    new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)

  private def parquetFiles(table: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(warehouseDir(table)).count(_.getName.endsWith(".parquet"))
  }

  test("compactBucketed drops file count, keeps rows and the bucketed zero-exchange plan") {
    val table = "graft_spec_pairs_compact"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    new scala.reflect.io.Directory(warehouseDir(table)).deleteRecursively()

    Writers.writeBucketed(
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), "doc_b", Dedup.PairIndexBuckets, table)
    // simulate gate-time maintenance: repeated appends, each batch
    // spanning several buckets, each leaving its own file set per
    // touched bucket
    for (batch <- 0L until 6L)
      Dedup.appendPairs(spark, table,
        (0L until 8L).map(j => (1000L + batch * 16 + 2 * j, 1001L + batch * 16 + 2 * j))
          .toDF("doc_a", "doc_b"))
    val before = spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val filesBefore = parquetFiles(table)
    assert(filesBefore > Dedup.PairIndexBuckets,
      s"append did not accrete files ($filesBefore); the compaction test has nothing to prove")

    Writers.compactBucketed(spark, table)

    val after = spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "compaction changed table contents")
    val filesAfter = parquetFiles(table)
    assert(filesAfter < filesBefore && filesAfter <= Dedup.PairIndexBuckets,
      s"compaction did not shrink to <=1 file per bucket: $filesBefore -> $filesAfter")

    // the read-plan contract survives the rewrite: distinct on the
    // bucket key still plans bucketed with zero shuffle exchanges
    val plan = spark.table(table).select(col("doc_b")).distinct()
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"compaction lost the bucketed layout:\n$plan")
    assert(!plan.contains("Exchange"), s"post-compaction distinct shuffles:\n$plan")

    // and appendPairs keeps working against the compacted table
    Dedup.appendPairs(spark, table, Seq((100L, 3L)).toDF("doc_a", "doc_b"))
    assert(spark.table(table).count() == before.size + 1,
      "append after compaction failed")
  }
}
