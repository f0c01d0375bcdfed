package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side layout tools — the storage half of the scan-reduction
  * story. How a table is WRITTEN decides which query-side machinery
  * can engage:
  *
  *  - day-partitioned directories → partition pruning (a time-range
  *    filter skips whole directories before any I/O; proven by
  *    `PartitionPruningSpec`, which asserts the pruned scan reads
  *    exactly one file);
  *  - key-bucketed + sorted tables → co-located sort-merge joins with
  *    zero shuffle on either side (`BucketingSpec`, `BucketedIvfSpec`);
  *  - both compose: a 100 TB fact table is typically day-partitioned
  *    AND bucketed on its join key.
  *
  * These are thin, opinionated wrappers — the value is pinning the
  * layout contract (one deterministic partition column format, sorted
  * buckets) in one place rather than per call site.
  */
object Writers {

  /** Materialize `df` as a day-partitioned parquet table derived from
    * `tsCol` (UTC, `yyyy-MM-dd` directory values). `filesPerDay`
    * controls the file fan-out inside each partition directory
    * (1 for small reference data; higher for parallel-write
    * throughput at scale). */
  def writeDayPartitioned(
      df: DataFrame,
      tsCol: String,
      path: String,
      filesPerDay: Int = 1): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .coalesce(math.max(1, filesPerDay))
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Materialize `df` as a bucketed, in-bucket-sorted table in the
    * session catalog — the layout that lets repeated equi-joins on
    * `key` plan without a shuffle exchange on either side. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite").saveAsTable(table)
}
