package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  *  - qKnnBrute: exact brute-force cosine top-k — the correctness
  *    baseline. Query set x full table; fine when one side is small
  *    enough to broadcast (it is: queries).
  *  - qKnnIvf: IVF-style two-stage search — assign every vector to its
  *    nearest centroid (coarse quantizer), probe only the closest
  *    `nprobe` cells per query. This is the 100 TB path: the assign
  *    step is a broadcast join against the (tiny) centroid set, and
  *    probing turns the all-pairs join into an equi-join on cell id,
  *    cutting candidates by ~|cells|/nprobe.
  *
  * All final scores use decimal-exact cosine (see VectorFunctions) and
  * ranks break ties deterministically, so results are engine-portable.
  */
object Similarity {

  val K = 10
  val NumQueries = 5
  val NProbe = 2

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"), norm2Exact(col("embedding")).as("n2"))

  /** Exact brute-force cosine top-K for the first NumQueries vectors. */
  def qKnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("n2").as("cn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    broadcast(q).join(c, col("qid") =!= col("cid"))
      .withColumn("cosine",
        cosineFromParts(dotExact(col("qe"), col("ce")), col("qn2"), col("cn2")))
      .select(col("qid"), col("cid"), col("cosine"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= K)
      .orderBy(col("qid"), col("rn"))
  }

  /** ANN quality evaluation: per-query recall of the IVF result
    * against the exact brute-force ground truth — the metric that
    * decides nprobe/cell-count trade-offs at scale. */
  def qIvfRecall(s: SparkSession, d: String): DataFrame = {
    val brute = qKnnBrute(s, d).select(col("qid"), col("cid"))
    val ivf = qKnnIvf(s, d).select(col("qid").as("iqid"), col("cid").as("icid"))
    brute
      .join(ivf, col("qid") === col("iqid") && col("cid") === col("icid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("icid").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("qid"), col("k"), col("n_hit"),
        (col("n_hit").cast("double") / col("k")).as("recall"))
      .orderBy(col("qid"))
  }

  /** IVF(-flat) search: centroids sampled deterministically (every
    * 100th vec_id), nearest-centroid assignment, probe NProbe cells. */
  def qKnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val cent = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_e"),
        col("n2").as("cent_n2"))

    // coarse assignment: nearest centroid per vector (broadcast join —
    // no shuffle of the vector table; ties broken by centroid id)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val assign = e.join(broadcast(cent), lit(true))
      .withColumn("ccos",
        cosineFromParts(dotExact(col("embedding"), col("cent_e")),
          col("n2"), col("cent_n2")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))

    // probe list: NProbe nearest centroids per query
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cent_id"))
    val probes = broadcast(q).join(broadcast(cent), lit(true))
      .withColumn("pcos",
        cosineFromParts(dotExact(col("qe"), col("cent_e")), col("qn2"), col("cent_n2")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= NProbe)
      .select(col("qid"), col("qe"), col("qn2"), col("cent_id").as("cell"))

    // candidates = vectors living in probed cells; exact rerank
    val cands = probes.join(assign, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .join(e.select(col("vec_id"), col("embedding").as("ce"), col("n2").as("cn2")), "vec_id")
    val wRank = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    cands
      .withColumn("cosine",
        cosineFromParts(dotExact(col("qe"), col("ce")), col("qn2"), col("cn2")))
      .select(col("qid"), col("vec_id").as("cid"), col("cosine"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .filter(col("rn") <= K)
      .orderBy(col("qid"), col("rn"))
  }
}
