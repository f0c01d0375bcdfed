package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool (round-20): time a NAMED SUBSET
  * of SparkEntry.queries with the Bench methodology (same session
  * config, same untimed first pass to pay memoized builds, median of
  * SPARK_GRAFT_REPS counts) and optionally dump explain("formatted")
  * plans for the plans/r20 deliverable.
  *
  * This is a dev tool only — the driver contract lives in
  * [[graft.Bench]], which is unchanged. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   SPARK_GRAFT_PLAN_DIR=/root/repo/plans/r20 \
  *   sbt "runMain graft.QProbe q_pagerank q_bm25_rm3 ..."
  * With no args, probes every query (timing only).
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toIntOption.getOrElse(3).max(1)
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.OFF)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("OFF")
    // --- pre-localCheckpoint SEGMENT plans (round-21, VERDICT r20
    // #2/#6): the shingle fan-out is checkpointed at its consumers'
    // seam (qMinhashLsh, the gates, contamination, curation), so the
    // per-query dumps start at an ExistingRDD and cannot show what the
    // round-20 §4 change removed. Dump the segment's OWN plan — the
    // current row-local array_distinct shape, and a reconstruction of
    // the pre-round-20 frame-level .distinct() shape (clearly labeled
    // `framedistinct_r20before`) — so the plan evidence for the
    // removed HashAggregate/Exchange/HashAggregate block exists as
    // committed text. Plan-only (never executed); runs once per
    // invocation when a plan dir is set.
    planDir.foreach { pd =>
      import org.apache.spark.sql.functions.{col, explode, expr, size, trim, lower, split}
      def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        try {
          val p = java.nio.file.Paths.get(pd, s"$name.txt")
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, df.queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
            .getBytes("UTF-8"))
        } catch { case e: Throwable =>
          System.err.println(s"[qprobe] segment $name dump failed: ${e.getMessage}")
        }
      val docs = Tables.documents(spark, sfDir)
      dump("seg_shingles_rowlocal_current",
        graft.functions.TextFunctions.shingles(docs, "doc_id", "text"))
      // the pre-round-20 shape: explode first, then a frame-level
      // distinct — the removed exchange block is visible here
      val parts = (0 until 3).map(j => s"toks[i+$j]").mkString(", ' ', ")
      dump("seg_shingles_framedistinct_r20before",
        docs.select(col("doc_id"),
            split(trim(lower(col("text"))), "\\s+").as("toks"))
          .where(size(col("toks")) >= 3)
          .select(col("doc_id"), explode(expr(
            s"transform(sequence(0, size(toks)-3), i -> concat($parts))")).as("shingle"))
          .distinct())
    }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val out = new StringBuilder("{")
    var first = true
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      spark.sparkContext.setJobDescription(n)
      // untimed first pass: pays memoized builds + codegen, like the
      // bench's builder warmup
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[qprobe] $n warm failed: ${e.getMessage}")
      }
      planDir.foreach { pd =>
        try {
          val plan = fn(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
          val p = java.nio.file.Paths.get(pd, s"${n}_$planSuffix.txt")
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
        } catch { case e: Throwable =>
          System.err.println(s"[qprobe] $n plan dump failed: ${e.getMessage}")
        }
      }
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.gc()
      val med = samples(samples.size / 2)
      if (!first) out ++= ","
      first = false
      out ++= s""""$n":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(med))}"""
      println(s"[qprobe] $n median=${"%.3f".format(med)} samples=${samples.map("%.3f".format(_)).mkString(",")}")
    }
    out ++= "}"
    println(s"""{"metric":"qprobe","queries":${out.toString},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
