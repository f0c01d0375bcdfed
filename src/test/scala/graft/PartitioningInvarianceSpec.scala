package graft

/** Mechanical pin for the engine-wide claim "fixed-point arithmetic
  * makes every result order-independent under any partitioning":
  * representative queries from each family run in two cloned sessions
  * with coprime shuffle-partition counts and must collect
  * BIT-IDENTICAL results. A float summed in shuffle order, a
  * non-total ORDER BY, or an aggregation whose merge is
  * order-sensitive fails here before it can flake the oracle gate on
  * a differently-sized cluster. */
class PartitioningInvarianceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** One query per exactness mechanism: decimal-exact sums
    * (q1_pricing), windowed time agg (q_report_agg), fixed-point BM25
    * (q_bm25), fixed-point surprisal (q_perplexity), Lloyd-round
    * k-means + IVF search (q_knn_ivf), min-hash banding
    * (q_minhash_lsh), integer PageRank (q_pagerank), capped top-K
    * (q_word_count), span-hash dedup (q_span_dedup), CMS verdicts
    * (q_heavy_hitters), TF-IDF single-division ranking (q_tfidf_topk),
    * sqrt-reweighted mixture (q_mixture_weights). */
  private val names = Seq(
    "q1_pricing", "q_report_agg", "q_bm25", "q_perplexity",
    "q_knn_ivf", "q_minhash_lsh", "q_pagerank", "q_word_count",
    "q_span_dedup", "q_heavy_hitters", "q_tfidf_topk",
    "q_mixture_weights",
    // plus: JSON enrich join, watermark split, iterative BPE trainer,
    // bit-majority SimHash, CC clusters over the shared pair index,
    // int8 quantization
    "q_clean_enrich", "q_late_split", "q_bpe_merges", "q_simhash_md5",
    "q_dedup_clusters", "q_embed_quantize",
    // KMV bottom-k sketch algebra (sharded two-level bottom-K)
    "q_kmv_overlap",
    // round-15 mechanisms: fixed-point DSIR importance weights,
    // value-histogram order statistics (terciles / decile cutoff),
    // codec byte-diff motion, dHash banding, weighted two-pass RM3
    "q_dsir_weights", "q_ppl_buckets", "q_embed_prune",
    "q_video_motion", "q_image_neardup", "q_bm25_rm3")

  test("results are bit-identical under coprime shuffle-partition counts") {
    val a = spark.newSession()
    a.conf.set("spark.sql.shuffle.partitions", "3")
    val b = spark.newSession()
    b.conf.set("spark.sql.shuffle.partitions", "7")
    val diffs = names.flatMap { n =>
      val fn = SparkEntry.queries(n)
      val ra = fn(a, d).collect().map(_.toString).toSeq
      val rb = fn(b, d).collect().map(_.toString).toSeq
      if (ra == rb) None
      else Some(s"$n: first diff ${ra.zip(rb).find(p => p._1 != p._2)}" +
        s" (sizes ${ra.size}/${rb.size})")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
