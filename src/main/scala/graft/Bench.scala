package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max, xxhash64}

/** Benchmark main — driver contract: ONE JSON line on stdout with the
  * per-query seconds at SPARK_GRAFT_SF_DIR.
  *
  * Round-2 hygiene additions:
  *  - Spark logging is forced OFF for the timed region AND shutdown:
  *    round-1's BENCH tail carried an sbt-prefixed `[error]` stack
  *    fragment that was just log4j stderr noise (benign local-mode
  *    DAGScheduler accumulator/EventLoop chatter sbt labels [error]).
  *    Real failures don't hide: every query runs in a try/catch that
  *    records the name in `errors` and prints a `[bench] ... failed`
  *    line itself.
  *  - `delta_vs_baseline`: per-query fractional change vs the queries
  *    map embedded in SPARK_GRAFT_BASELINE (default BENCH_r01.json), so
  *    regressions are visible per query, not just in the total.
  *  - `scaling`: headline queries additionally timed at the smaller
  *    scale factors — a quadratic operator shows up as curve shape
  *    (sec ratio >> row ratio) even when the absolute total looks fine.
  */
object Bench {
  // q_kmeans_centroids precedes q_knn_ivf here AND alphabetically in
  // the (sorted) main loop, so the memoized centroid training is
  // always paid by the kmeans entry and IVF timings measure search
  // only — at every scale factor, keeping the curve comparable
  // q_embed_neardup vs q_embed_neardup_lsh are BOTH headline on
  // purpose: their scaling curves are the standing record of the
  // all-pairs vs bucketed-candidate trade at the 0.4 threshold (the
  // SRP pair index itself is charged to q_embed_clusters, its first
  // alphabetical consumer — the LSH entry always measures a fresh
  // build, it IS the builder benchmark)
  private val Headline = Seq(
    "q7_volume_shipping", "q_late_split", "q_clean_corpus",
    "q_kmeans_centroids", "q_knn_ivf",
    "q_report_agg", "q_minhash_lsh", "q_embed_neardup",
    "q_embed_neardup_lsh", "q_embed_neardup_strict", "q10_returned_items")

  // Locale.ROOT: a comma-decimal default locale must not corrupt the
  // single-JSON-line driver contract
  private def jnum(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // silence log4j BEFORE SparkContext init — session-startup INFO
    // otherwise lands on stderr where sbt labels it [error]
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
    // untimed warmup: JVM/codegen/parquet-reader init and the first
    // cold read of every table otherwise land entirely on whichever
    // query happens to run first. xxhash64 over ALL columns defeats
    // column pruning (a bare count() reads only footers and warms
    // nothing) and drives every table through the Tables catalog, so
    // a newly added table is warmed automatically.
    spark.range(1000).selectExpr("sum(id)").collect()
    def warm(dir: String): Unit = for (t <- Tables.all) {
      val df = if (t == "events") Tables.events(spark, dir) else Tables.load(spark, dir, t)
      df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(max(col("h"))).collect()
      ()
    }
    warm(sfDir)
    // a failed query must NOT masquerade as a fast success — track it
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, dir).count() } catch {
        case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // deterministic execution order: index BUILDERS first (so the
    // memoized centroid training is always charged to
    // q_kmeans_centroids, never to whichever consumer happens to sort
    // first), then the rest alphabetically. The LSH pair index is
    // charged to q_clean_corpus, its first consumer (q_minhash_lsh
    // always measures a fresh build — it IS the builder benchmark).
    val results = scala.collection.immutable.ListMap(
      SparkEntry.queries.toSeq
        .sortBy { case (n, _) => (n != "q_kmeans_centroids", n) }
        .map { case (name, fn) => name -> time(name, fn, sfDir) }: _*)

    // scaling curve: headline queries at every available smaller SF
    val scaling: Seq[(String, Seq[(String, Double)])] =
      if (sys.env.get("SPARK_GRAFT_SCALE_PROBE").contains("0")) Seq.empty
      else {
        val parent = new java.io.File(sfDir).getParentFile
        val probeDirs = Seq("sf0.001", "sf0.01")
          .map(n => new java.io.File(parent, n))
          .filter(f => f.isDirectory && f.getAbsolutePath != new java.io.File(sfDir).getAbsolutePath)
        probeDirs.map { dir =>
          warm(dir.getAbsolutePath) // same untimed warmup as the main SF
          dir.getName -> Headline.flatMap(n =>
            SparkEntry.queries.get(n).map(fn => n -> time(s"${dir.getName}/$n", fn, dir.getAbsolutePath)))
        } :+ (new java.io.File(sfDir).getName -> Headline.flatMap(n =>
          results.get(n).map(n -> _)))
      }

    // per-query delta vs the captured baseline round (fractional)
    val deltas: Seq[(String, Double)] = try {
      val basePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "/root/repo/BENCH_r01.json")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(new java.io.File(basePath))
      val tail = root.path("tail").asText("")
      val start = tail.indexOf("{\"metric\"")
      if (start < 0) Seq.empty
      else {
        val lineEnd = tail.indexOf('\n', start)
        val line = if (lineEnd < 0) tail.substring(start) else tail.substring(start, lineEnd)
        val qs = mapper.readTree(line).path("queries")
        results.toSeq.collect {
          case (name, sec) if qs.has(name) && qs.get(name).asDouble() > 0 =>
            name -> (sec - qs.get(name).asDouble()) / qs.get(name).asDouble()
        }
      }
    } catch { case _: Throwable => Seq.empty }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val deltaJson = deltas.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val scalingJson = scaling.map { case (sf, m) =>
      "\"" + sf + "\":" + m.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // the standing record of the strict-threshold SRP pruning claim:
    // wide-band candidate count vs the all-pairs space on the
    // planted-cluster corpus (untimed instrumentation — the query's
    // wall time is already in `queries`)
    val srpStrict = try {
      val n = graft.operators.Dedup.augmentedEmbeddings(spark, sfDir).count()
      val cand = graft.operators.Dedup.strictCandidates(spark, sfDir).count()
      val all = n * (n - 1) / 2
      // cand == 0 would render NaN/Infinity — bare tokens that corrupt
      // the single-JSON-line driver contract
      val reduction = if (cand == 0) 0.0 else all.toDouble / cand
      s"""{"all_pairs":$all,"candidates":$cand,"reduction":${jnum(reduction)}}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] srp_strict probe failed: ${e.getMessage}")
      """{"all_pairs":0,"candidates":0,"reduction":0}""" // 0 = probe failed
    }
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"errors":$errs,"delta_vs_baseline":$deltaJson,"scaling":$scalingJson,"srp_strict":$srpStrict,"sf":"$sfDir"}""")
    // the full line above can exceed the driver's 2 KB output-tail
    // capture, leaving the headline invisible (BENCH_r3/r4 `parsed:
    // null`) — repeat the totals in a tiny final line that always fits
    val (worstName, worstDelta) =
      if (deltas.nonEmpty) deltas.maxBy(_._2) else ("none", 0.0)
    println(s"""{"metric":"total_summary","total":${jnum(total)},"n_queries":${results.size},"n_errors":${errors.size},"worst_query":"$worstName","worst_delta":${jnum(worstDelta)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
