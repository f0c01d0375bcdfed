package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog for the harness star schema + events/documents/
  * embeddings tables (see TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through here so every operator benefits from the same
  * scan behavior: parquet vectorized reader, predicate pushdown and
  * column pruning happen automatically because callers express filters/
  * projections on the returned DataFrame (Catalyst pushes them into the
  * scan). At 100 TB the only change is the path and partitioning of the
  * underlying table — the operator code is unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects outright. Read it as raw nanos
    * (legacy flag) and floor-convert to a microsecond timestamp —
    * integer `div`, not `/`, because epoch-nanos (~1.7e18) exceed
    * double's 2^53 exact-integer range. DuckDB truncates ns->us the
    * same way, so oracle timestamps agree.
    *
    * Known trade-off: the legacy flag is session-global and set here
    * as a side effect (it only changes how TIMESTAMP(NANOS) columns
    * are read — no other harness table has one). It must live in the
    * accessor because the driver's smoke test calls entry() with a
    * session this library does not construct; restoring it after the
    * (lazy) read would be unsound. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
