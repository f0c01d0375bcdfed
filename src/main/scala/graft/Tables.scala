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
  /** ONE-TIME session initializer for reading parquet TIMESTAMP(NANOS)
    * columns (only `events.ts` in this harness). Spark's vectorized
    * reader rejects nanos timestamps outright; the legacy flag makes
    * them readable as raw `long` nanos, which [[events]] then
    * floor-converts to microseconds. The flag is session-scoped conf —
    * calling this is an explicit, documented contract (it only changes
    * how TIMESTAMP(NANOS) parquet columns decode; no other read is
    * affected), idempotent per session, so a co-hosted library sharing
    * the session sees one deliberate init rather than a repeated
    * hidden side effect. It cannot be scoped tighter: the driver's
    * smoke test calls entry() with a session this library does not
    * construct, and un-setting after a *lazy* read would be unsound. */
  def initTimestampNanosRead(s: SparkSession): Unit =
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS); see
    * [[initTimestampNanosRead]]. Floor-convert raw nanos to a
    * microsecond timestamp — integer `div`, not `/`, because
    * epoch-nanos (~1.7e18) exceed double's 2^53 exact-integer range.
    * DuckDB truncates ns->us the same way, so oracle timestamps agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    initTimestampNanosRead(s)
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
