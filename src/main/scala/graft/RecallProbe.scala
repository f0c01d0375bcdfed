package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{avg, col, count, lit}

/** Dev-only quiet-machine probe for the SAMPLED ANN recall audit (the
  * BuildProbe protocol applied to quality instead of wall time):
  * generate the IDENTICAL 10x corpus the judged bench section uses,
  * run the three sampled recall audits with the SAME derived stride,
  * and print (n_queries, mean_recall) against the declared floors —
  * so a floor change is validated in ~minutes on a fresh JVM instead
  * of a 30-minute full bench.
  *
  * Usage: runMain graft.RecallProbe <sfDir> [alsoMainSf]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val alsoMain = args.lift(1).contains("1")
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.OFF)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("OFF")

    def audit(tag: String, dir: String): Unit = {
      val nq = operators.Similarity.numQueriesFor(
        operators.Similarity.corpusCount(spark, dir))
      val stride = operators.Similarity.auditStrideFor(nq)
      def row(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val r = df.agg(count(lit(1)).as("n"), avg(col("recall")).as("r"))
          .collect()(0)
        val mean = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
        println(f"RECALLPROBE $tag%-8s $name%-8s n=${r.getLong(0)}%3d " +
          f"mean=$mean%.4f  [${(System.nanoTime() - t0) / 1e9}%.1f s]")
      }
      println(s"RECALLPROBE $tag nq=$nq stride=$stride")
      row("ivfpq", operators.Similarity.qIvfPqRecallSampled(spark, dir, stride))
      row("opq", operators.Similarity.qOpqRecallSampled(spark, dir, stride))
      row("hybrid", operators.Retrieval.qHybridRecallSampled(spark, dir, stride))
    }

    if (alsoMain) audit("main", sfDir)
    val sf1Path = BenchCorpus.generate10x(spark, sfDir)
    try audit("sf1", sf1Path.toString)
    finally BenchCorpus.cleanup10x(spark, sf1Path)
    spark.stop()
  }
}
