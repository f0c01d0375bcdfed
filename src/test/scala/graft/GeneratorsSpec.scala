package graft

import org.apache.spark.sql.functions._
import graft.operators.{CleanJob, ReportJob, SkewJoin}
import graft.streaming.Generators

/** Generator fixtures (S3/S4) + skew-join utility. */
class GeneratorsSpec extends SparkSpec {
  import spark.implicits._

  test("clean generator lines parse under the job schema with generator domains") {
    val parsed = Generators.cleanInputBatch(spark, 100)
      .select(from_json(col("line"), CleanJob.cleanSchema).as("j"))
      .select(col("j.countryCode").as("cc"), explode(col("j.data")).as("d"))
      .select(col("cc"), col("d.type"), col("d.score"), col("d.level"))
      .collect()
    assert(parsed.length == 200) // 2-element data array, like the reference
    assert(parsed.map(_.getAs[String]("cc")).toSet.subsetOf(Generators.countryCodes.toSet))
    assert(parsed.map(_.getAs[String]("type")).toSet == Generators.types.toSet)
    assert(parsed.map(_.getAs[Double]("score")).toSet == Generators.scores.toSet)
    assert(parsed.map(_.getAs[String]("level")).toSet == Generators.levels.toSet)
  }

  test("audit generator feeds the report pipeline end to end") {
    val agg = ReportJob.windowAgg(
      ReportJob.parse(Generators.auditLogBatch(spark, 300)))
      .collect()
    assert(agg.nonEmpty)
    assert(agg.map(_.getAs[Long]("cnt")).sum == 300)
    val types = agg.map(_.getAs[String]("type")).toSet
    assert(types == Generators.auditTypes.toSet)
  }

  test("generator determinism: same n, same lines") {
    val a = Generators.cleanInputBatch(spark, 50).collect().map(_.getString(0)).toSeq
    val b = Generators.cleanInputBatch(spark, 50).collect().map(_.getString(0)).toSeq
    assert(a == b)
  }

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of facts share one key — the classic hot-key shape
    val facts = spark.range(1000)
      .select((when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 20)).as("k"),
        col("id").as("v"))
    val dim = spark.range(20).select(col("id").as("dk"),
      concat(lit("d"), col("id")).as("label"))
    val plain = facts.join(dim, col("k") === col("dk"))
      .groupBy(col("label")).agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(facts, dim, "k", "dk", col("v"), 8)
      .groupBy(col("label")).agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
