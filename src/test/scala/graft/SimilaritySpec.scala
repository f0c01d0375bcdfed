package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Vector math + ANN semantics. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("exact dot/cosine on known vectors") {
    val df = Seq((Array(1.0f, 0.0f, 0.0f), Array(0.6f, 0.8f, 0.0f)))
      .toDF("a", "b")
      .select(dotExact(col("a"), col("b")).as("dot"),
        cosineFromParts(dotExact(col("a"), col("b")),
          norm2Exact(col("a")), norm2Exact(col("b"))).as("cos"))
    val r = df.collect().head
    // float32 literals carry ~1e-8 representation error into the
    // double-exact dot product; tolerance reflects that, not the math
    assert(math.abs(r.getAs[Double]("dot") - 0.6) < 1e-6)
    assert(math.abs(r.getAs[Double]("cos") - 0.6) < 1e-6)
  }

  test("brute-force knn on sf0.001 ranks self-similar vectors sanely") {
    val out = graft.operators.Similarity.qKnnBrute(spark, "/root/testdata/sf0.001")
      .collect()
    val perQuery = out.groupBy(_.getAs[Long]("qid"))
    assert(perQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    perQuery.values.foreach { rows =>
      assert(rows.length == graft.operators.Similarity.K)
      val cosines = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("IVF results are a subset-ranked view consistent with brute force on probed cells") {
    val brute = graft.operators.Similarity.qKnnBrute(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val ivf = graft.operators.Similarity.qKnnIvf(spark, "/root/testdata/sf0.001")
      .collect()
    assert(ivf.nonEmpty)
    // every IVF hit must carry the exact cosine (spot check one row vs
    // brute ranking membership is probabilistic; recall isn't asserted)
    ivf.groupBy(_.getAs[Long]("qid")).values.foreach { rows =>
      val cosines = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }
}
