package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** K-means centroid training: deterministic, actually moves the
  * centroids, and does not hurt IVF recall vs the sampled seed. */
class KMeansSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def e = Tables.embeddings(spark, d)
    .select(col("vec_id"), col("embedding"), norm2Exact(col("embedding")).as("n2"))

  test("training is deterministic and changes the seed centroids") {
    val r1 = Similarity.qKmeansCentroids(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val r2 = Similarity.qKmeansCentroids(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.nonEmpty && r1.sameElements(r2))

    val seed = Similarity.seedCentroids(e)
      .select(col("cent_id"), posexplode(col("cent_e")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getFloat(2).toDouble)).toSet
    assert(r1.toSet != seed, "Lloyd iterations left every centroid unchanged")
  }

  private def recall(ivf: DataFrame): Double = {
    val brute = Similarity.qKnnBrute(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (brute & hits).size.toDouble / brute.size
  }

  test("trained centroids hold or improve IVF recall at equal nprobe") {
    val trained = recall(Similarity.knnIvfWith(e, Similarity.trainCentroids(e)))
    val sampled = recall(Similarity.knnIvfWith(e, Similarity.seedCentroids(e)))
    assert(trained >= sampled,
      s"recall regressed: trained=$trained sampled=$sampled")
  }
}
