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

  test("soak: 50 append rounds with periodic compaction keep contents, clusters, and plan") {
    // The long-running-gate lifecycle at test scale: 50 appendPairs
    // rounds (the gate's per-batch maintenance), compaction every 10
    // (the snapshot-cadence maintenance window), and after EVERY
    // compaction: file count back to <=1 per bucket, zero-exchange
    // bucketed plan, exact contents, and connected-components
    // equivalence against an independent union-find oracle — the
    // downstream cluster query is the consumer the compaction contract
    // exists for. Mid-soak bridge pairs merge earlier clusters so the
    // equivalence is exercised on merging, not just fresh, components.
    val table = "graft_spec_pairs_soak"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    new scala.reflect.io.Directory(warehouseDir(table)).deleteRecursively()
    Writers.writeBucketed(
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), "doc_b", Dedup.PairIndexBuckets, table)

    val truth = scala.collection.mutable.Set[(Long, Long)]((1L, 2L))
    def unionFindClusters(): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      truth.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      truth.flatMap(p => Seq(p._1, p._2)).map(v => v -> find(v)).toMap
    }

    for (round <- 0L until 50L) {
      // 3 fresh pairs per round + every 5th round a bridge pair
      // merging two clusters born ~2 rounds apart
      val fresh = (0L until 3L).map(j =>
        (1000L + round * 10 + 2 * j, 1001L + round * 10 + 2 * j))
      val bridge = if (round % 5 == 4 && round >= 2)
        Seq((1000L + round * 10, 1000L + (round - 2) * 10)) else Seq.empty
      val pairs = fresh ++ bridge
      Dedup.appendPairs(spark, table, pairs.toDF("doc_a", "doc_b"))
      pairs.foreach(p => truth +=
        ((math.min(p._1, p._2), math.max(p._1, p._2))))

      if (round % 10 == 9) {
        Writers.compactBucketed(spark, table)
        val files = parquetFiles(table)
        assert(files <= Dedup.PairIndexBuckets,
          s"round $round: compaction left $files files (> 1 per bucket)")
        val rows = spark.table(table).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rows == truth.toSet,
          s"round $round: compaction changed contents (" +
            s"missing ${truth.toSet -- rows}, phantom ${rows -- truth.toSet})")
        val plan = spark.table(table).select(col("doc_b")).distinct()
          .queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true") && !plan.contains("Exchange"),
          s"round $round: compaction lost the zero-exchange bucketed plan:\n$plan")
        val cc = Dedup.connectedComponents(spark.table(table)).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(cc == unionFindClusters(),
          s"round $round: cluster query diverged from the union-find oracle")
      }
    }
    // 50 rounds x ~4 pairs accreted and 5 rewrites later, the table is
    // still exactly the pair set — the lifecycle leaves no residue
    assert(spark.table(table).count() == truth.size.toLong)
  }
}
