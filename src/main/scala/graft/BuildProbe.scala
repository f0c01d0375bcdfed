package graft
import org.apache.spark.sql.SparkSession

/** Isolated fresh-JVM build-ratio probe (dev-only; the
  * bench_variance.md protocol, mechanized): for each named
  * memoized-builder query, measure
  *   - the BUILD-INCLUSIVE single shot at the main SF (the first
  *     invocation pays the memoized build — same pricing as the
  *     bench's warmup sample),
  *   - `reps` steady shots at the main SF (memo now hot),
  *   - one build-inclusive single shot at the 10x corpus
  *     ([[BenchCorpus.generate10x]] — the IDENTICAL corpus the judged
  *     sf1 section uses),
  * and print the build ratio sf1_build / sf_build — the number the
  * bench's `build_ratios` field reports, but measured on a quiet
  * fresh JVM instead of 30 minutes into a 212-query run. A flagged
  * `superlinear_build` entry that probes ≤ ~10x here is main-run
  * neighbor pressure, not a scaling defect.
  *
  * Usage: runMain graft.BuildProbe <sfDir> <q1,q2,...> [steadyReps] */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
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
    spark.range(1000).selectExpr("sum(id)").collect()
    def shot(n: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      System.gc()
      t
    }
    // main-SF passes first (build + steady), THEN the 10x generation:
    // the generation's own shuffle/scan pressure must not sit between
    // a query's build shot and its steady shots
    val sfBuild = names.map(n => n -> shot(n, sfDir)).toMap
    val sfSteady = names.map(n => n -> (1 to reps).map(_ => shot(n, sfDir))).toMap
    val sf1Path = BenchCorpus.generate10x(spark, sfDir)
    try {
      for (n <- names) {
        val b1 = shot(n, sf1Path.toString)
        val b0 = sfBuild(n)
        println(f"BUILDPROBE $n%-24s sf_build=$b0%.2f steady=[${
          sfSteady(n).map(t => f"$t%.2f").mkString(" ")}] sf1_build=$b1%.2f ratio=${b1 / b0}%.2f")
      }
    } finally BenchCorpus.cleanup10x(spark, sf1Path)
    spark.stop()
  }
}
