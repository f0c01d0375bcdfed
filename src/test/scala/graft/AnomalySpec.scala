package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.operators.Relational

/** Event anomaly detection: the z-score chain must agree bit-for-bit
  * with an independent driver-side reference that replicates the
  * decimal-exact sums (DECIMAL(38,6) = HALF_UP at scale 6), and the
  * planted-outlier semantics must hold. */
class AnomalySpec extends SparkSpec {

  private def dec6(x: Double): JBigDecimal =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  test("qEventAnomaly at sf0.001 matches an exact driver-side reference") {
    val d = "/root/testdata/sf0.001"
    val rows = Tables.events(spark, d)
      .select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val stats = rows.groupBy(_._2).map { case (t, rs) =>
      val s1 = rs.map(r => dec6(r._3)).reduce(_.add(_)).doubleValue()
      val s2 = rs.map(r => dec6(r._3 * r._3)).reduce(_.add(_)).doubleValue()
      t -> (s1, s2, rs.size.toLong)
    }
    val want = rows.flatMap { case (id, t, v) =>
      val (s1, s2, n) = stats(t)
      val z = (v - s1 / n) / math.sqrt((s2 - s1 * s1 / n) / n)
      Option.when(math.abs(z) > Relational.AnomalyZ)((id, t, v, z))
    }.sortBy(_._1).toSeq
    val got = Relational.qEventAnomaly(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == want, s"sizes ${got.size} vs ${want.size}; " +
      s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.nonEmpty, "sf0.001 should surface at least one |z|>3 event")
  }
}
