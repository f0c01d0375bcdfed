package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Data-LAYOUT operators: how rows are assigned to files decides how
  * much of a 100 TB table a selective scan must read, because parquet
  * scans prune on per-file (row-group) min/max statistics before any
  * I/O. Sorting by one column gives perfect pruning on that column
  * and none on any other; Z-ORDER interleaving the bits of two
  * columns gives useful pruning on BOTH — the standard layout lever
  * for fact tables queried by more than one dimension.
  *
  * [[qZorderPrune]] measures the effect instead of asserting it: it
  * lays the same rows out three ways (linear by each dimension,
  * Z-order over both), computes each file's min/max box — exactly the
  * statistics parquet would store — and counts the files and rows a
  * stats-pruned scan of one selective 2-D box query would touch under
  * each layout. Everything is integer arithmetic on quantized values
  * (engine-exact), so the oracle hash-checks the full comparison.
  */
object Layout {

  /** Quantization width (bits per dimension) and file fan-out. 64
    * files here is harness-sized; production uses the same math with
    * file counts set by target file size. */
  val Bits = 16
  val FileShiftLinear: Int = Bits - 6 // 64 files from a 16-bit key
  val FileShiftZ: Int = 2 * Bits - 6  // 64 files from a 32-bit z-value

  /** The benchmark box query, in quantized coordinates: the middle
    * 1/8 of each dimension's range — selective in BOTH dimensions,
    * the case where a single-column sort must scan everything the
    * other dimension would have excluded. */
  val BoxLo: Long = 7L * (1L << Bits) / 16  // 28672
  val BoxHi: Long = 9L * (1L << Bits) / 16 - 1 // 36863

  /** Equal-width quantization of x in [mn, mx] to [0, 2^Bits) — SQL
    * `div`, not `/`: integer floor division stays exact at any key
    * range, where the double division `/` would round past 2^53. */
  private def quant(x: String, mn: String, mx: String): Column =
    expr(s"(($x - $mn) * ${1L << Bits}) div ($mx - $mn + 1)")

  /** Bit-interleave two [[Bits]]-bit keys (x → even positions, y →
    * odd): the Z-value. Plain shift/mask/add — whole-stage-codegen
    * arithmetic, no UDF. */
  private def zValue(xq: Column, yq: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(xq, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yq, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Per-layout pruning stats for the box query over
    * (o_custkey, order day): one row per layout with the total file
    * count, the files a min/max-stats scan must touch, the rows those
    * files hold (= rows actually read), and the rows that match (the
    * same number under every layout — layout moves rows between
    * files, it cannot change the answer).
    *
    * Scale shape: one pass to quantize (two 1-row min/max scalars
    * broadcast), a 3-way explode to tag layouts, one hash agg per
    * (layout, file) — 3·64 groups — and a 3-group rollup. The fact
    * table is never sorted and never shuffled on values; at 100 TB
    * the same query IS the layout-decision tool (run it on a sample,
    * pick the layout with the smallest rows_scanned for your query
    * mix). */
  def qZorderPrune(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("x"),
      datediff(col("o_orderdate").cast(DateType),
        lit("1992-01-01").cast(DateType)).cast(LongType).as("y"))
    val bounds = o.agg(
      min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"))
    val q = o.crossJoin(broadcast(bounds))
      .select(
        quant("x", "mnx", "mxx").as("xq"),
        quant("y", "mny", "mxy").as("yq"))
      .withColumn("z", zValue(col("xq"), col("yq")))
    val tagged = q.select(col("xq"), col("yq"), explode(array(
        struct(lit("linear_cust").as("layout"),
          shiftright(col("xq"), FileShiftLinear).as("file")),
        struct(lit("linear_date").as("layout"),
          shiftright(col("yq"), FileShiftLinear).as("file")),
        struct(lit("zorder").as("layout"),
          shiftright(col("z"), FileShiftZ).as("file")))).as("t"))
      .select(col("t.layout").as("layout"), col("t.file").as("file"),
        col("xq"), col("yq"))
    val inBox = col("xq").between(BoxLo, BoxHi) && col("yq").between(BoxLo, BoxHi)
    val perFile = tagged.groupBy(col("layout"), col("file"))
      .agg(count(lit(1)).as("cnt"),
        min(col("xq")).as("mn_x"), max(col("xq")).as("mx_x"),
        min(col("yq")).as("mn_y"), max(col("yq")).as("mx_y"),
        sum(when(inBox, 1L).otherwise(0L)).as("matched"))
    val touch = col("mx_x") >= BoxLo && col("mn_x") <= BoxHi &&
      col("mx_y") >= BoxLo && col("mn_y") <= BoxHi
    perFile.groupBy(col("layout"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(when(touch, 1L).otherwise(0L)).as("files_touched"),
        sum(when(touch, col("cnt")).otherwise(0L)).as("rows_scanned"),
        sum(col("matched")).as("rows_matched"))
      .orderBy(col("layout"))
  }
}
