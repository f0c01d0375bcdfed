package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** approx_percentile sketch vs exact order statistics: the sketch
  * returns an actual data value whose RANK is within n/accuracy of the
  * target rank (interpolating `percentile` values are not comparable
  * directly — they fall between elements). */
class ApproxQuantileSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val acc = Relational.QuantileAccuracy

  test("sketch quantiles are data values within the rank-error bound") {
    def sortedVals(colName: String): Map[String, Array[Double]] =
      Tables.lineitem(spark, d)
        .select(col("l_returnflag"), col(colName).cast("double"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (f, rows) => f -> rows.map(_.getDouble(1)).sorted }

    def checkRank(vals: Array[Double], v: Double, q: Double, label: String): Unit = {
      val n = vals.length
      // rank interval the value occupies in the sorted data
      val lo = vals.indexWhere(_ >= v)
      val hi = vals.lastIndexWhere(_ <= v)
      assert(lo >= 0 && hi >= 0 && vals.contains(v),
        s"$label: $v is not a data value")
      // target rank +- (n/accuracy, but at least 1 element granularity)
      val tol = math.max(1.0, n.toDouble / acc)
      val target = q * (n - 1)
      assert(lo - tol <= target && target <= hi + tol,
        s"$label: value $v occupies ranks [$lo,$hi] of $n, target $target tol $tol")
    }

    val approx = Relational.approxQuantileRaw(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.nonEmpty)
    val qty = sortedVals("l_quantity")
    val price = sortedVals("l_extendedprice")
    for ((flag, (a50, a90, a99)) <- approx) {
      checkRank(qty(flag), a50, 0.5, s"$flag p50")
      checkRank(qty(flag), a90, 0.9, s"$flag p90")
      checkRank(price(flag), a99, 0.99, s"$flag p99")
    }
  }
}
