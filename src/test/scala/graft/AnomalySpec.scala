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
      val variance = (s2 - s1 * s1 / n) / n
      val z = (v - s1 / n) / math.sqrt(variance)
      // degenerate types (n < 2 or variance <= 0) carry no verdict —
      // same guard as the operator, stated explicitly here so the
      // reference does not lean on JVM NaN-comparison semantics
      Option.when(n >= 2 && variance > 0 &&
        math.abs(z) > Relational.AnomalyZ)((id, t, v, z))
    }.sortBy(_._1).toSeq
    val got = Relational.qEventAnomaly(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == want, s"sizes ${got.size} vs ${want.size}; " +
      s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.nonEmpty, "sf0.001 should surface at least one |z|>3 event")
  }

  test("degenerate types (constant value, single event) flag nothing") {
    import spark.implicits._
    val ev = Seq(
      (1L, "constant", 5.0),    // variance exactly 0: z would be NaN
      (2L, "constant", 5.0),
      (3L, "constant", 5.0),
      (4L, "single", 42.0),     // n = 1: variance 0, z NaN
      (5L, "tight", 1.0e9),     // high-mean/low-variance: the spread is
      (6L, "tight", 1.0e9),     // below the DECIMAL(38,6) quantum, so
      (7L, "tight", 1.0e9 + 1e-7), // E[x²]−E[x]² lands exactly on 0
      (8L, "live", 0.0), (9L, "live", 0.0), (10L, "live", 0.0),
      (11L, "live", 0.0), (12L, "live", 0.0), (13L, "live", 0.0),
      (14L, "live", 0.0), (15L, "live", 0.0), (16L, "live", 0.0),
      (17L, "live", 0.0), (18L, "live", 0.0), (19L, "live", 100.0))
      .toDF("event_id", "event_type", "value")
    val got = Relational.eventAnomaly(ev).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // the genuine outlier in the healthy type is flagged; none of the
    // degenerate types contribute rows (no NaN > 3 admits)
    assert(got.map(_._1) == Seq(19L), s"got $got")
    assert(!got.exists(t => Set("constant", "single", "tight")(t._2)),
      s"degenerate types must carry no verdict: $got")
  }
}
