package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.Tables
import graft.functions.TextFunctions._

/** The composed batch curation pipeline — the actual 100 TB job the
  * north star describes, run END TO END as one oracle-checked chain:
  *
  *   raw documents
  *     -> quality funnel        ([[TextAnalysis.withFunnelStage]] — the
  *                               same Gopher/C4 rules `q_filter_funnel`
  *                               reports, now enforced)
  *     -> near-dup keep-best    (MinHash-LSH pair graph restricted to
  *                               funnel survivors, connected components,
  *                               longest-member representative — the
  *                               `q_dedup_keep_best` resolution)
  *     -> split + decontam      (keep the md5 13/16 'train' split; drop
  *                               any kept doc sharing a distinct word-
  *                               5-gram with the fixed eval suite — the
  *                               `q_bloom_decontam` shape, bloom
  *                               prefilter + exact verify)
  *     -> token budget          (deterministic md5-order prefix until
  *                               half the surviving token mass — the
  *                               `q_token_budget` primitive)
  *     -> sequence pack         (chunk + data-sized-bucket packing, the
  *                               `q_seq_pack` shape)
  *     -> shard manifest        (multiset content digest per shard, the
  *                               `q_pack_shards` artifact).
  *
  * Every stage is individually oracle-green elsewhere; what THIS query
  * proves is the COMPOSITION — key compatibility between stages, the
  * funnel->dedup->decontam attrition algebra, and that the end-to-end
  * plan reuses one corpus scan per text-consuming stage rather than
  * re-deriving everything from scratch. Output is the per-stage
  * attrition table a curation run publishes (stage, name, n_in,
  * n_dropped, n_out, tokens_out) plus the corpus-level content digest
  * on the final row — so the oracle verifies document conservation,
  * token accounting, AND the packed artifact's exact content in one
  * hash-matched result.
  *
  * Stage-composition semantics (each a deliberate choice, mirrored in
  * the oracle):
  *  - Dedup runs AFTER the funnel and only among survivors: the pair
  *    graph is the memoized corpus-snapshot LSH index restricted to
  *    survivor endpoints (two semi-joins — no re-shingle, no rebuild),
  *    and the representative is the longest SURVIVING member. A dead
  *    cluster member can neither representative-win nor chain two
  *    survivor clusters together (edges through it are dropped) —
  *    matching a pipeline that dedups its post-filter corpus.
  *  - The eval suite for decontamination is the RAW corpus's val/test
  *    split (fixed by construction, independent of upstream attrition
  *    — a benchmark does not shrink because the training filter got
  *    stricter). The split stage folds into decontam: non-train docs
  *    leave here (they ARE the eval suite), and train docs sharing a
  *    5-gram with it are scrubbed.
  *  - The token budget is half the SURVIVING token mass (the upstream
  *    stages already shrank the corpus; the budget prices what's left).
  *
  * Scale shape: ONE checkpointed verdict scan of the corpus (doc_id,
  * counts, funnel stage — text never enters a checkpoint); the pair
  * graph rides the bucketed pair index; decontam re-reads text only
  * for the two shingle passes (eval side + kept-train side, both
  * column-pruned scans) with the corpus side never shuffled (bloom
  * prefilter, eval-bounded verify + broadcast-back); the budget is the
  * distributed 256-bucket prefix sum; packing windows sort a constant
  * ~[[TextAnalysis.TargetBucketTokens]] per data-sized bucket. All
  * stage totals are 1-row aggregates cross-joined at the end — no
  * driver rows beyond bounded scalars.
  *
  * Reference pedigree: composes the operator families surveyed from
  * the reference's clean->enrich->aggregate job chain (SURVEY.md §2.5)
  * into the LLM-curation shape of §2.7; the stage list follows the
  * public curation recipes (Gopher, C4, CCNet, RefinedWeb).
  */
object Curation {

  /** Stage names, pinned: the attrition table is a public artifact
    * and downstream dashboards key on these strings. */
  val StageNames: Seq[String] = Seq("raw", "quality_funnel",
    "neardup_keep_best", "decontam_split", "token_budget", "seq_pack",
    "shard_manifest")

  /** Stages 1-5 as materialized frames: (base, s1, s2, s3, s4) —
    * shared by the attrition query and [[exportShards]], so the
    * artifact writer provably applies the SAME chain the report
    * describes. Each frame is localCheckpoint-pinned exactly once. */
  private[graft] def stageFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.functions.expressions.BloomFunctions._

    // ---- stage 1: per-doc verdict base — ONE corpus text scan.
    // Checkpointed WITHOUT text: at 100 TB the checkpoint holds five
    // longs per doc, not the corpus.
    val base = TextAnalysis.withFunnelStage(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars"), col("text")))
      .select(col("doc_id"), col("n_chars"), col("n_tok"), col("fstage"),
        md5Bucket16(col("doc_id")).as("bkt"))
      .localCheckpoint(false) // feeds the raw agg + the survivor chain

    val s1 = base.filter(col("fstage") === 5L)
      .select(col("doc_id"), col("n_chars"), col("n_tok"), col("bkt"))
      .localCheckpoint(false) // feeds pair restriction (x2), members, agg

    // ---- stage 3: near-dup keep-best among survivors. The pair graph
    // is the memoized bucketed LSH index (build-once per snapshot)
    // restricted to survivor endpoints — two semi-joins, no re-shingle.
    val pairs = Dedup.lshPairs(s, d)
      .join(s1.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(s1.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      .select(col("doc_a"), col("doc_b"))
    val m = s1
      .join(Dedup.connectedComponents(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("n_chars"), col("n_tok"), col("bkt"))
    // argmax aggregation (max struct), not a per-cluster window sort —
    // the qDedupKeepBest scale shape
    val best = m.groupBy(col("cluster_id"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("b"))
      .select(col("cluster_id"), (-col("b").getField("neg_id")).as("rep"))
    val s2 = m.join(best, Seq("cluster_id"))
      .filter(col("rep") === col("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("bkt"))
      .localCheckpoint(false) // feeds train filter + agg

    // ---- stage 4: split + decontam. Eval suite = the RAW corpus's
    // val/test split; bloom over its distinct 5-grams (bounded scalar),
    // one might_contain scan of the kept-train shingles, exact verify
    // join removes every false positive (q_bloom_decontam's contract).
    val evalDistinct = shingles(
        Tables.documents(s, d)
          .filter(splitFromBucket(md5Bucket16(col("doc_id"))) =!= "train"),
        "doc_id", "text", TextAnalysis.ContamNgram)
      .select(col("shingle")).distinct()
      .localCheckpoint(false) // counted, then bloom-aggregated, then verify side
    val nEval = math.max(evalDistinct.count(), 1024L)
    val bloom = evalDistinct
      .agg(bloom_agg(xxhash64(col("shingle")), nEval,
        nEval * TextAnalysis.ContamBloomBitsPerItem).as("bf"))
      .head().getAs[Array[Byte]](0)
    val s2train = s2.filter(col("bkt") < 13)
      .select(col("doc_id"), col("n_tok"))
      .localCheckpoint(false) // feeds shingle scan + anti-join + agg path
    val candSh = shingles(
        Tables.documents(s, d)
          .join(s2train.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        "doc_id", "text", TextAnalysis.ContamNgram)
      .localCheckpoint(false) // feeds bloom scan + contaminated-doc lookup
    // eval-bounded by fpp design: true overlaps + ~1e-4 residue
    val verified = candSh.select(col("shingle"))
      .filter(bloom_might_contain(bloom, xxhash64(col("shingle"))))
      .distinct()
      .join(evalDistinct, Seq("shingle"), "left_semi")
      .localCheckpoint(false)
    val contaminated = candSh
      .join(broadcast(verified), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
    val s3 = s2train.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(false) // feeds budget chain + agg

    // ---- stage 5: token budget — TextAnalysis.tokenBudgetCore (ONE
    // implementation of the md5-order distributed prefix sum) over the
    // surviving token mass, bucket-key length derived from the
    // survivor count (round-18, VERDICT r17 #5; the count rides the
    // already-materialized s3 checkpoint). s3 is the chain's one
    // corpus-sized checkpoint — the core adds only projections.
    val docsB = s3.withColumn("k", md5(col("doc_id").cast(StringType)))
    val s4 = TextAnalysis.tokenBudgetCore(docsB,
        TextAnalysis.budgetPrefixLen(s3.count()), tokCol = "n_tok")
      .select(col("doc_id"), col("n_tok"))
      .localCheckpoint(false) // feeds chunking + agg

    (base, s1, s2, s3, s4)
  }

  /** Chunk rows (doc_id, chunk_id, ct) of the kept set — the
    * qDocChunks shape on (doc_id, n_tok) longs only (chunk TEXT is
    * not needed for the manifest; [[exportShards]] joins it back for
    * the artifact). Checkpointed: feeds the bucket-count scalar, the
    * packing window, and the doc-count aggregate. */
  private[graft] def chunkFrame(s4: DataFrame): DataFrame =
    s4.filter(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(lit(0),
          ((col("n_tok") - 1) / lit(TextAnalysis.ChunkStride))
            .cast(IntegerType))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
        least(lit(TextAnalysis.ChunkTokens.toLong),
          col("n_tok") - col("chunk_id") * TextAnalysis.ChunkStride)
          .cast(LongType).as("ct"))
      .localCheckpoint(false)

  /** Chunk rows with their (bucket, pack_id) assignment — the
    * qSeqPack data-sized-bucket packing, shared by the manifest
    * aggregation and the artifact writer (one definition, so the
    * written rows and the digest can never disagree on packing). */
  private[graft] def packedChunks(ch: DataFrame): DataFrame = {
    val nb = ch.agg(
      greatest(coalesce(ceil(sum(col("ct")) / TextAnalysis.TargetBucketTokens.toDouble),
        lit(1L)), lit(1L)).cast(LongType).as("n_buckets"))
    val wPack = Window.partitionBy(col("bucket"))
      .orderBy(col("doc_id"), col("chunk_id"))
    ch.crossJoin(broadcast(nb)) // 1-row scalar
      .withColumn("bucket", pmod(md5Value24(col("doc_id")), col("n_buckets")))
      .withColumn("cum_before",
        coalesce(sum(col("ct")).over(wPack.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("pack_id", (col("cum_before") / TextAnalysis.PackBudget).cast(LongType))
  }

  def qCurationE2e(s: SparkSession, d: String): DataFrame = {
    val (base, s1, s2, s3, s4) = stageFrames(s, d)

    // ---- stage 6: chunk + pack (qDocChunks/qSeqPack shape, counts
    // only — chunk TEXT is never needed for the manifest, so the
    // whole packing stage runs on (doc_id, n_tok) longs).
    val ch = chunkFrame(s4)
    val packs = packedChunks(ch)
      .groupBy(col("bucket").cast(LongType).as("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("ct")).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))

    // ---- stage 7: shard manifest rollup. The digest is the multiset
    // XOR of 60-bit md5 prefixes per pack row (qPackShards) — XOR is
    // associative, so the corpus digest is bit_xor over ALL packs.
    val shardKey = concat_ws(":", col("bucket"), col("pack_id"),
      col("n_chunks"), col("n_tokens"), col("n_docs"))
    val pk = packs
      .withColumn("shard",
        pmod(col("bucket") * 31 + col("pack_id"), lit(TextAnalysis.NumShards)))
      .withColumn("h", conv(substring(md5(shardKey), 1, 15), 16, 10).cast(LongType))

    // ---- attrition assembly: seven 1-row aggregates, cross-joined
    // (all broadcast scalars), exploded into the stage table.
    def cnt(df: DataFrame, n: String, t: String): DataFrame =
      df.agg(count(lit(1)).as(n),
        coalesce(sum(col("n_tok")), lit(0L)).as(t))
    val a0 = cnt(base, "n0", "t0")
    val a1 = cnt(s1, "n1", "t1")
    val a2 = cnt(s2, "n2", "t2")
    val a3 = cnt(s3, "n3", "t3")
    val a4 = cnt(s4, "n4", "t4")
    val a5 = ch.agg(countDistinct(col("doc_id")).as("nd"))
    val a6 = pk.agg(count(lit(1)).as("n_packs"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("pack_toks"),
      countDistinct(col("shard")).as("n_shards"),
      coalesce(expr("bit_xor(h)"), lit(0L)).as("digest"))

    def row(st: Long, nm: String, nIn: Column, nDrop: Column, nOut: Column,
        toks: Column, dg: Column): Column =
      struct(lit(st).as("stage"), lit(nm).as("name"),
        nIn.cast(LongType).as("n_in"), nDrop.cast(LongType).as("n_dropped"),
        nOut.cast(LongType).as("n_out"), toks.cast(LongType).as("tokens_out"),
        dg.cast(LongType).as("digest"))
    a0.crossJoin(broadcast(a1)).crossJoin(broadcast(a2))
      .crossJoin(broadcast(a3)).crossJoin(broadcast(a4))
      .crossJoin(broadcast(a5)).crossJoin(broadcast(a6))
      .select(explode(array(
        row(1L, StageNames(0), col("n0"), lit(0L), col("n0"), col("t0"), lit(0L)),
        row(2L, StageNames(1), col("n0"), col("n0") - col("n1"), col("n1"),
          col("t1"), lit(0L)),
        row(3L, StageNames(2), col("n1"), col("n1") - col("n2"), col("n2"),
          col("t2"), lit(0L)),
        row(4L, StageNames(3), col("n2"), col("n2") - col("n3"), col("n3"),
          col("t3"), lit(0L)),
        row(5L, StageNames(4), col("n3"), col("n3") - col("n4"), col("n4"),
          col("t4"), lit(0L)),
        row(6L, StageNames(5), col("n4"), col("n4") - col("nd"), col("n_packs"),
          col("pack_toks"), lit(0L)),
        row(7L, StageNames(6), col("n_packs"), lit(0L), col("n_shards"),
          col("pack_toks"), col("digest")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.name").as("name"),
        col("r.n_in").as("n_in"), col("r.n_dropped").as("n_dropped"),
        col("r.n_out").as("n_out"), col("r.tokens_out").as("tokens_out"),
        col("r.digest").as("digest"))
      .orderBy(col("stage"))
  }

  /** EXPORT — write the pipeline's final ARTIFACT: every packed
    * training chunk as a shard-partitioned parquet dataset (one
    * directory per shard, the WebDataset/Megatron layout a training
    * job consumes), rows (shard, bucket, pack_id, doc_id, chunk_id,
    * n_tok, chunk_text). The manifest digest is recomputable from the
    * WRITTEN rows alone — group by (bucket, pack_id), rebuild the
    * pack stats, fold the md5 prefixes — so any reader can re-verify
    * the artifact against the attrition table's final row WITHOUT
    * trusting this engine (CurationExportSpec does exactly that).
    *
    * Scale shape: the kept set's chunk assignment is the shared
    * [[packedChunks]] frame (identical to the manifest's by
    * construction); text joins back ONCE via a semi-join-pruned
    * column scan of the kept documents; the write is a distributed
    * parquet write partitioned by the bounded shard key. Nothing
    * passes through the driver. */
  def exportShards(s: SparkSession, d: String, outDir: String): DataFrame = {
    val (_, _, _, _, s4) = stageFrames(s, d)
    val toksOf = Tables.documents(s, d)
      .join(s4.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    packedChunks(chunkFrame(s4))
      .withColumn("shard",
        pmod(col("bucket") * 31 + col("pack_id"), lit(TextAnalysis.NumShards)))
      .join(toksOf, Seq("doc_id"))
      .select(col("shard"), col("bucket").cast(LongType).as("bucket"),
        col("pack_id"), col("doc_id"), col("chunk_id"),
        col("ct").as("n_tok"),
        array_join(slice(col("toks"),
          (col("chunk_id") * TextAnalysis.ChunkStride + 1).cast(IntegerType),
          lit(TextAnalysis.ChunkTokens)), " ").as("chunk_text"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    s.read.parquet(outDir)
  }
}
