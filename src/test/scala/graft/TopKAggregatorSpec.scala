package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator

/** Typed Aggregator surface: bounded top-k with O(k) state per group. */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k matches the window-function top-k") {
    val agg = new TopKAggregator(3).toColumn
    val parts = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_brand"), col("p_retailprice"), col("p_partkey"))
      .as[(String, Double, Long)]
    val typed = parts
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .collect()
      .map { case (brand, topk) => brand -> topk.map(_._2).toList }
      .toMap
    val windowed = graft.operators.Relational.qWindowTopN(spark, "/root/testdata/sf0.001")
      .collect()
      .groupBy(_.getAs[String]("p_brand"))
      .map { case (b, rows) =>
        b -> rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("p_partkey")).toList
      }
    assert(typed == windowed)
  }
}
