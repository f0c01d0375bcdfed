package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Deterministic.{davg, dsum}
import graft.functions.TextFunctions._
import graft.functions.TopKAggregator

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token statistics, quality scoring, language ID,
  * document fingerprinting. All single-pass scan -> (optional explode)
  * -> hash agg shapes; the only shuffles are on small group keys, so
  * every query here runs at 100 TB with map-side partial aggregation
  * doing the heavy lifting.
  */
object TextAnalysis {

  /** Per-document token statistics via the explode path (exercises the
    * tokenize -> flatten -> re-aggregate shape; the array-only variant
    * would skip the shuffle, but this one doubles as the word-count
    * canonical example). */
  def qTokenStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(length(col("tok"))).as("sum_tok_len"),
        max(length(col("tok"))).cast(LongType).as("max_tok_len"))
      .orderBy(col("doc_id"))

  /** Corpus-level word frequencies: the canonical word-count. */
  def qWordCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))

  /** Corpus-level term statistics -> per-document keywords: top-3
    * tokens per document by TF-IDF — the classic training-data use is
    * both keyword extraction and its inverse (a document whose "top"
    * terms still score low is boilerplate-heavy). Two corpus
    * aggregations (term frequency per (doc, token); document frequency
    * per token) joined on token, then a per-doc top-k window.
    *
    * Cross-engine exactness without libm: the usual idf = ln(N/df) is
    * a transcendental whose last-ulp behavior the two engines don't
    * promise to share, and inside a RANKING a one-ulp disagreement
    * flips rows. The score here is tf * N / df computed as ONE IEEE
    * double division of exactly-represented integers ((tf*N) up to
    * 2^53, then / df) — bit-identical in any IEEE engine, and a
    * monotone transform of tf * (N/df), so the RANKING it induces is
    * the standard raw-frequency TF-IDF ranking for fixed N. Ties
    * broken by token; output ordered (doc_id, rank).
    *
    * Scale shape: explode -> two hash aggs (map-side partials carry
    * the load) -> a token-keyed shuffle join of (doc x distinct-token)
    * against (distinct-token) — the canonical big-big equi-join, AQE
    * handles the skewed stopword keys — -> per-doc window over <=
    * |distinct tokens in doc| rows. No driver rows, no UDFs. */
  def qTfIdfTopK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.count() // bounded scalar: one long, the N in the score
    val docTok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = docTok.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = docTok.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "tok")
      .withColumn("score",
        (col("tf") * lit(nDocs)).cast(DoubleType) / col("df").cast(DoubleType))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("tok"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast(LongType).as("rnk"),
        col("tok"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Per-document quality signals + a composite score: length band,
    * mean token length, stopword ratio, punctuation ratio. The score
    * formula is deliberately closed-form arithmetic (no libm beyond
    * what both engines compute identically). */
  def qTextQuality(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val en = stopwords("en")
    val toks = tokens(col("text"))
    val nTok = size(toks).cast(LongType)
    val nStop = size(filter(toks, t => t.isin(en: _*))).cast(LongType)
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast(LongType)
    docs.select(
        col("doc_id"), col("lang"), col("n_chars"),
        nTok.as("n_tokens"), nStop.as("n_stop"), nPunct.as("n_punct"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"), col("n_tokens"),
        (col("n_chars").cast(DoubleType) / col("n_tokens")).as("chars_per_tok"),
        (col("n_stop").cast(DoubleType) / col("n_tokens")).as("stop_ratio"),
        (col("n_punct").cast(DoubleType) / col("n_chars")).as("punct_ratio"),
        (least(col("n_tokens").cast(DoubleType) / 100.0, lit(1.0)) *
          (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tokens"))).as("quality"))
      .orderBy(col("doc_id"))

  }

  /** Language-ID heuristic: score each document against per-language
    * stopword profiles, pick the argmax (ties broken by language code —
    * deterministic). Corpus note: the harness corpus is synthetic
    * English-ish word soup for every lang label, so this verifies the
    * OPERATOR's computation; accuracy-vs-label is reported by
    * qLangIdEval below. */
  def qLangId(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = tokens(col("text"))
    val scored = docs.select(
      (col("doc_id") +: col("lang") +:
        stopwords.toSeq.sortBy(_._1).map { case (lg, words) =>
          (size(filter(toks, t => t.isin(words: _*))).cast(DoubleType) /
            size(toks)).as(s"score_$lg")
        }): _*)
    val langs = stopwords.keys.toSeq.sorted
    // argmax with deterministic lexicographic tie-break: fold over
    // (score, lang) pairs via greatest on a struct-compare
    val best = langs.map(lg => struct(col(s"score_$lg").as("s"),
      lit(lg).as("lg"))).reduce((a, b) =>
      when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.select(col("doc_id"), col("lang"),
        (best.getField("lg")).as("lang_guess"),
        col("score_en"), col("score_de"), col("score_es"),
        col("score_fr"), col("score_zh"))
      .orderBy(col("doc_id"))
  }

  /** Aggregate lang-ID agreement with the label column. */
  def qLangIdEval(s: SparkSession, d: String): DataFrame =
    qLangId(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang_guess") === col("lang"), 1L).otherwise(0L)).as("n_match"))
      .orderBy(col("lang"))

  /** Document fingerprints (md5 of normalized text) + duplicate groups:
    * the exact-dedup key at corpus scale — grouping by a 128-bit digest
    * instead of the raw text keeps the shuffle narrow. */
  def qFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("fp"))

  /** PII patterns the scrub stage redacts — email, IPv4, and a
    * NANP-style phone tail. Plain character-class regexes only: the
    * same pattern text must compile identically under Java regex
    * (Spark) and RE2 (DuckDB oracle). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b555-\\d{4}\\b"

  /** PII scrubbing — the redaction pass a training pipeline runs
    * before text ever reaches a tokenizer: global regex replacement of
    * emails / IPv4s / phone numbers with typed placeholder tags, plus
    * per-document detection counts (the audit trail). The harness
    * documents carry no organic PII, so the query plants a
    * deterministic PII suffix per doc (mirrored exactly in the oracle)
    * and proves the scrub removes it: counts are exact and the
    * scrubbed text is hash-anchored via md5. Map-only — no shuffle at
    * any scale; regexes stay inside whole-stage codegen. */
  /** The deterministic PII suffix planted per document (mirrored in
    * the oracle SQL) — one definition so the spec's residual check
    * exercises exactly what the query plants. */
  private[graft] def piiInjected: org.apache.spark.sql.Column =
    concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com from 10."),
      col("doc_id") % 256, lit(".0.1 call 555-01"),
      lpad((col("doc_id") % 100).cast(StringType), 2, "0"))

  /** The full redaction chain over a text column — replacement order
    * is part of the contract (email before IP before phone). */
  private[graft] def piiScrubbed(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))

  def qPiiScrub(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), piiInjected.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast(LongType).as("n_emails"),
        regexp_count(col("t"), lit(Ipv4Re)).cast(LongType).as("n_ips"),
        regexp_count(col("t"), lit(PhoneRe)).cast(LongType).as("n_phones"),
        md5(piiScrubbed(col("t"))).as("scrub_md5"))
      .orderBy(col("doc_id"))

  /** Sub-token (BPE-ish) counting per language — the token-budget
    * estimator a training pipeline runs over every shard. */
  def qSubTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        size(subTokens(col("text"))).cast(LongType).as("n_sub"),
        size(tokens(col("text"))).cast(LongType).as("n_ws"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sub")).as("total_subtokens"),
        sum(col("n_ws")).as("total_wstokens"),
        davg(col("n_sub").cast(DoubleType)).as("avg_subtokens"))
      .orderBy(col("lang"))

  val ChunkTokens = 50
  val ChunkStride = 40 // 10-token overlap between consecutive chunks

  /** Fixed-size token chunking with overlap — the context-window
    * shaper every LLM training pipeline runs before tokenize/pack.
    * One scan -> explode of chunk starts -> slice; no shuffle at all
    * (the ORDER BY is presentation-only). Chunk starts step by
    * ChunkStride while inside the document, so every token lands in
    * at least one chunk and consecutive chunks share
    * ChunkTokens - ChunkStride tokens. */
  def qDocChunks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, cast((size(toks)-1)/$ChunkStride as int))"))
          .as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id").cast(LongType).as("chunk_id"),
        least(lit(ChunkTokens),
          size(col("toks")) - col("chunk_id") * ChunkStride)
          .cast(LongType).as("n_tok"),
        array_join(slice(col("toks"),
          col("chunk_id") * ChunkStride + 1, lit(ChunkTokens)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Intra-document repetition score — the Gopher/C4-style quality
    * signal that catches boilerplate and degenerate generations:
    * 1 - distinct/total word-3-grams per doc. Entirely map-side
    * (array_distinct over the in-row shingle array, no explode, no
    * shuffle except the presentation sort) — the cheapest possible
    * shape, it pipelines inside the scan at any scale. */
  def qRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        (size(col("toks")) - 2).cast(LongType).as("n_shingles"),
        size(array_distinct(expr(
          "transform(sequence(0, size(toks)-3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")))
          .cast(LongType).as("n_distinct"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_shingles"))
      .orderBy(col("doc_id"))

  val ContamNgram = 5

  /** Train/eval contamination check — the decontamination step every
    * serious pipeline runs before evaluating: for each val/test
    * document (per the [[qDataSplit]] buckets), the fraction of its
    * distinct word-5-grams that appear in ANY train document. The
    * match is a left-semi join on the shingle — shuffle keys are
    * n-gram strings exactly as in the MinHash pipeline, so the shape
    * holds at 100 TB (and the train side can be pre-bucketed by
    * shingle hash to make repeat scans co-located). Zero-hit docs stay
    * in the output (left join + coalesce), since "no contamination" is
    * the result that matters. */
  /** The split-tagged distinct word-5-gram frame both decontamination
    * variants consume. Materialized once: it feeds three subtrees
    * (train side + two eval uses) and Catalyst does not reuse the
    * explode+distinct exchange across them (same rationale as the
    * exact-Jaccard ground-truth query's shingle checkpoint in Dedup).
    * The split derives from doc_id alone, so it recomputes on the
    * shingle fan-out directly — no second pass over documents, no
    * join back. */
  private def contamShingles(s: SparkSession, d: String): DataFrame =
    shingles(Tables.documents(s, d), "doc_id", "text", ContamNgram)
      .withColumn("split", splitFromBucket(md5Bucket16(col("doc_id"))))
      .localCheckpoint(false)

  def qContamination(s: SparkSession, d: String): DataFrame = {
    val sh = contamShingles(s, d)
    val trainSh = sh.filter(col("split") === "train").select(col("shingle")).distinct()
    val evalSh = sh.filter(col("split") =!= "train")
    val hits = evalSh.join(trainSh, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    evalSh.groupBy(col("doc_id"), col("split")).agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contam_ratio",
        col("n_hit").cast(DoubleType) / col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Bloom bits per eval item: 20 bits/item gives fpp ~ 1e-4, which
    * keeps the expected false-positive survivor count (fpp x |train
    * distinct shingles|) in the same order as the eval set itself even
    * when the train side is 10^4x larger — size this UP (not the
    * filter count) as the train corpus grows. */
  val ContamBloomBitsPerItem = 20L

  /** Bloom-prefiltered decontamination — the 100 TB shape of
    * [[qContamination]]'s train-side scan. The eval suite is small and
    * fixed by construction, so its distinct-shingle set aggregates into
    * a bloom filter (Spark's own BloomFilterAggregate, built
    * distributed with map-side partials and merged on the driver as a
    * ONE-ROW bounded scalar of a few MB); the 100 TB train corpus is
    * then scanned ONCE with a codegen'd might_contain predicate — no
    * shuffle of train shingles at all — and only the survivors (true
    * hits + an eval-sized fpp residue, per [[ContamBloomBitsPerItem]])
    * enter the exact verify join, which removes every false positive
    * because the equi-join on the shingle IS the exact criterion.
    * Output: the scrub list — eval docs with >= 1 train hit — which the
    * oracle recomputes bloom-free, proving the prefilter is invisible
    * to the result. */
  def qBloomDecontam(s: SparkSession, d: String): DataFrame = {
    import graft.functions.expressions.BloomFunctions._
    val sh = contamShingles(s, d)
    val trainSh = sh.filter(col("split") === "train").select(col("shingle"))
    val evalSh = sh.filter(col("split") =!= "train")
    val evalDistinct = evalSh.select(col("shingle")).distinct()
      .localCheckpoint(false) // counted, then aggregated: one build
    val nEval = math.max(evalDistinct.count(), 1024L) // bounded: eval suite size
    val bloom = evalDistinct
      .agg(bloom_agg(xxhash64(col("shingle")), nEval,
        nEval * ContamBloomBitsPerItem).as("bf"))
      .head().getAs[Array[Byte]](0)
    val survivors = trainSh
      .filter(bloom_might_contain(bloom, xxhash64(col("shingle"))))
      .distinct()
    // survivors is eval-sized by fpp design -> broadcast is safe at scale
    evalSh.join(broadcast(survivors), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_hit"))
      .orderBy(col("doc_id"))
  }

  val PackBudget = 512 // tokens per packed training row

  /** Tokens a packing bucket targets: 16 packs' worth. Each bucket's
    * prefix-sum window then sorts a CONSTANT ~[[TargetBucketTokens]]
    * of chunks regardless of corpus size — scaling adds buckets, not
    * per-bucket work. */
  val TargetBucketTokens: Long = 16L * PackBudget

  /** Sequence packing: assemble the chunk stream ([[qDocChunks]]) into
    * fixed token-budget training rows. A chunk joins the pack its
    * cumulative starting offset falls in (`floor(cumsum_before /
    * budget)`) — deterministic, order-based, every chunk in exactly
    * one pack (PropertySpec pins conservation + the budget bound).
    *
    * Scale shape: greedy packing is order-dependent, and ONE global
    * ORDER BY window would serialize on a single partition; a FIXED
    * 16-way bucket split (the round-10 form) caps parallelism at 16
    * and grows each bucket's window sort linearly with the corpus —
    * the bench's superlinear flag caught exactly that (27x at 10x
    * data). This form sizes the bucket count to the DATA:
    * `n_buckets = ceil(total_tokens / TargetBucketTokens)` (one
    * 1-row broadcast scalar, the same pattern as the late-split
    * window max), and assigns `bucket = md5_24bit(doc_id) mod
    * n_buckets`. Per-bucket work is a constant ~16 packs at every
    * scale; 100 TB just means more buckets, and the shuffle's hash
    * partitioning spreads them over every core in the cluster.
    * Deterministic for a given corpus: n_buckets depends only on the
    * corpus token total, the bucket hash only on doc_id. */
  def qSeqPack(s: SparkSession, d: String): DataFrame = {
    // Materialized once: the chunk frame feeds both the token-total
    // scalar and the packing pass (same rationale as qContamination's
    // shingle checkpoint — Catalyst won't reuse the tokenize+explode
    // subtree across the two consumers).
    val ch = qDocChunks(s, d).localCheckpoint(false)
    val nb = ch.agg(
      greatest(coalesce(ceil(sum(col("n_tok")) / TargetBucketTokens.toDouble), lit(1L)),
        lit(1L)).cast(LongType).as("n_buckets"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"), col("chunk_id"))
    ch.crossJoin(broadcast(nb)) // 1-row scalar: bucket-count broadcast
      .withColumn("bucket", pmod(md5Value24(col("doc_id")), col("n_buckets")))
      .withColumn("cum_before",
        coalesce(sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", (col("cum_before") / PackBudget).cast(LongType))
      .groupBy(col("bucket").cast(LongType).as("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("bucket"), col("pack_id"))
  }

  /** Export shards for the packed stream. 8 here; production sizes
    * this to target shard bytes. */
  val NumShards = 8L

  /** Shard-export manifest — the artifact a training job actually
    * consumes (the WebDataset/Megatron shard-list shape): packs
    * ([[qSeqPack]]) are assigned round-robin-by-arithmetic to shards,
    * and each shard row carries its pack/chunk/token totals plus a
    * CONTENT DIGEST the reader can re-verify. The digest is the XOR of
    * a 60-bit md5 prefix per pack row — a multiset hash, so it is
    * aggregation-ORDER-FREE (no sort, no collect_list whose buffer
    * grows with shard size: agg state is O(1) per shard at any scale)
    * and any dropped/duplicated/altered pack flips it.
    *
    * Scale shape: one hash agg over the (already bounded) pack frame;
    * output is |shards| rows. */
  def qPackShards(s: SparkSession, d: String): DataFrame = {
    val key = concat_ws(":", col("bucket"), col("pack_id"),
      col("n_chunks"), col("n_tokens"), col("n_docs"))
    qSeqPack(s, d)
      .withColumn("shard", pmod(col("bucket") * 31 + col("pack_id"), lit(NumShards)))
      .withColumn("h", conv(substring(md5(key), 1, 15), 16, 10).cast(LongType))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_packs"),
        sum(col("n_chunks")).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(h)").as("digest"))
      .orderBy(col("shard"))
  }

  /** Target mixture rates per language, in 256ths — the domain
    * reweighting a pretraining mix applies (e.g. upsample English,
    * downsample the long tail). 256 buckets give 1/256 granularity
    * with a two-hex-digit hash, which both engines compute exactly. */
  val MixtureRates256: Seq[(String, Int)] =
    Seq("en" -> 128, "de" -> 64, "es" -> 32, "fr" -> 32, "zh" -> 16)

  /** Deterministic domain-mixture sampling: keep a document iff its
    * md5 bucket (0-255, from the first two hex digits) falls under its
    * language's target rate. Like [[qDataSplit]], membership depends
    * only on doc_id — reproducible at any cluster size, joinable from
    * any system, and a re-run samples the SAME documents (the property
    * random() sampling loses). Map-side filter + hash agg; the only
    * shuffle is on the tiny (lang, source) group key. */
  def qMixtureSample(s: SparkSession, d: String): DataFrame = {
    val rate = MixtureRates256.foldLeft(lit(0)) { case (acc, (lg, r)) =>
      when(col("lang") === lg, r).otherwise(acc)
    }
    Tables.documents(s, d)
      .withColumn("sampled", (md5Bucket256(col("doc_id")) < rate).cast(LongType))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("sampled")).as("n_sampled"),
        sum(when(col("sampled") === 1L, col("n_chars")).otherwise(0L))
          .cast(LongType).as("chars_sampled"))
      .orderBy(col("lang"), col("source"))
  }

  /** Priority-sample size. 32 here; production sizes to the survey
    * budget (the math is size-independent). */
  val SampleK = 32

  /** Weight-proportional sampling WITHOUT replacement (priority
    * sampling, Duffield–Lund–Thorup): each document gets priority
    * q = w / u with u uniform in (0,1], and the sample is the top-K
    * priorities. Sampled items carry the unbiased subset-sum weight
    * estimate w_hat = max(w, tau) where tau is the (K+1)-th priority —
    * summing w_hat over any sampled subset estimates that subset's
    * true total weight, the survey primitive behind "how many tokens
    * does this slice of the corpus hold" answered from a 32-row
    * sample. Weight = n_chars (the cheap length proxy; swap in token
    * counts and nothing else changes).
    *
    * Exactness: u is the shared md5Value24 hash ((v+1)/2^24, never
    * zero), so q = w·2^24/(v+1) — which IS w/u, the 2^24 cancels — is
    * ONE integer floor division both engines compute identically;
    * priorities stay < 2^48, so the Double leg of [[TopKAggregator]]
    * is exact. Randomness is the hash, so the sample is reproducible
    * and joinable from any engine — the same property the
    * split/mixture ops ride. tau is floored to the same integer
    * resolution (1 weight unit), a deterministic bias below one char
    * per sampled row.
    *
    * Scale shape: map-side bounded partial top-(K+1) (O(K) state per
    * partition, merge O(K log K)), ONE bounded frame to the driver
    * side of nothing — the final merge is an aggregate, not a sort;
    * the corpus is never shuffled on values. The K-row sample then
    * broadcast-joins back for the weight columns. */
  def qPrioritySample(s: SparkSession, d: String): DataFrame =
    prioritySampleFrom(prioritySketchOf(Tables.documents(s, d)))

  /** The bounded top-(K+1) priority SKETCH of a document frame:
    * (doc_id, n_chars, priority), ≤ K+1 rows. This is the mergeable
    * state behind both the batch query and the streaming absorb
    * ([[graft.streaming.SampleGate]]): the top-(K+1) of a union is
    * the top-(K+1) of the per-part sketches' union (standard top-K
    * closure), and re-presenting the same documents is a no-op, so
    * the sketch composes exactly like the KMV bottom-K. The
    * corpus-sized work — ONE bounded partial aggregation — lives
    * here; everything downstream is ≤ K+1 rows. */
  private[graft] def prioritySketchOf(docs: DataFrame): DataFrame = {
    // SQL `div`, not `/`: exact long floor division at any magnitude
    // (the double quotient of `/` rounds past 2^53)
    val pri = docs
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars").cast(LongType) * (1L << 24)).as("num"),
        (md5Value24(col("doc_id")) + 1L).as("den"))
      .select(col("doc_id"), col("n_chars"), expr("num div den").as("priority"))
    val tk = udaf(new TopKAggregator(SampleK + 1),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val top = pri
      .agg(tk(col("priority").cast(DoubleType), col("doc_id")).as("tk"))
      .select(posexplode(col("tk")))
      .select(col("col._2").as("doc_id"))
    // broadcast the ≤K+1 sampled ids back for the weight column
    pri.join(broadcast(top), "doc_id")
      .select(col("doc_id"), col("n_chars"), col("priority"))
  }

  /** Serve the sample from a sketch frame (≤ K+1 rows): rank, tau =
    * the (K+1)-th priority (0 if the corpus is smaller than the
    * sample — then w_hat = w exactly, the sample IS the corpus), and
    * the estimator weights. The window runs on ≤ K+1 rows — bounded
    * by construction, never corpus-sized. */
  private[graft] def prioritySampleFrom(sketch: DataFrame): DataFrame = {
    val w = Window.orderBy(col("priority").desc, col("doc_id"))
    val ranked = sketch
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .withColumn("tau",
        coalesce(max(when(col("rnk") === SampleK + 1, col("priority")))
          .over(Window.partitionBy()), lit(0L)))
    ranked.filter(col("rnk") <= SampleK)
      .select(col("rnk"), col("doc_id"), col("n_chars"), col("priority"),
        greatest(col("n_chars").cast(LongType), col("tau")).as("w_hat"))
      .orderBy(col("rnk"))
  }

  /** Temperature-scaled domain mixture weights (the DoReMi/multilingual-
    * sampling knob at temperature 1/2): per source, weight proportional
    * to sqrt(n_docs) — upweights small domains relative to raw
    * frequency without letting a mega-domain dominate. Exponent 1/2 is
    * deliberate beyond convention: sqrt is IEEE-correctly-rounded (a
    * promise `pow` does not make), so the fixed-point weights are
    * engine-exact with zero empirical caveats. Numerators are summed as
    * integers (round(sqrt*1e6)), so the normalization is one exact
    * division of exactly-represented integers.
    *
    * Scale shape: one hash agg on `source` (map-side partials), a
    * bounded 1-row total broadcast, output bounded by |sources|. */
  def qMixtureWeights(s: SparkSession, d: String): DataFrame = {
    val perSource = Tables.documents(s, d)
      .select(col("source"), size(tokens(col("text"))).cast(LongType).as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("sqrt_x1e6",
        round(sqrt(col("n_docs").cast(DoubleType)) * lit(1e6)).cast(LongType))
    val tot = perSource.agg(sum(col("sqrt_x1e6")).as("tot_x1e6"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("sqrt_x1e6"),
        (col("sqrt_x1e6").cast(DoubleType) / col("tot_x1e6")).as("weight"))
      .orderBy(col("source"))
  }

  /** Deterministic train/val/test assignment: bucket 0-15 from the
    * first hex digit of md5(doc_id) — stable across engines, runs,
    * and cluster sizes (the property that makes a 100 TB split
    * reproducible and joinable from any system). 13/2/1 sixteenths
    * ~ 81/12.5/6.25%. */
  def qDataSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split", splitFromBucket(md5Bucket16(col("doc_id"))))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast(LongType)).as("sum_chars"))
      .orderBy(col("split"))

  /** Per-source document quota — cap each source (domain) at
    * [[QuotaPerSource]] documents, keeping the longest (ties -> lowest
    * doc_id). The standard web-curation guard against a single crawler-
    * friendly domain dominating the corpus.
    *
    * Scale shape: the per-source top-N goes through [[TopKAggregator]]
    * (bounded partial aggregation — O(N) state per source regardless
    * of source size, map-side combine does the heavy lifting), NOT a
    * window row_number, which would shuffle and SORT every member row
    * of the biggest domain through one task. n_chars -> Double is
    * exact (< 2^53), so the ranking is integer-exact cross-engine. */
  val QuotaPerSource = 10
  def qSourceQuota(s: SparkSession, d: String): DataFrame = {
    val tk = udaf(new TopKAggregator(QuotaPerSource),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(tk(col("n_chars").cast(DoubleType), col("doc_id")).as("tk"))
      .select(col("source"), posexplode(col("tk")))
      .select(col("source"), (col("pos") + 1).cast(LongType).as("rnk"),
        col("col._2").as("doc_id"), col("col._1").cast(LongType).as("n_chars"))
      .orderBy(col("source"), col("rnk"))
  }

  /** Deterministic token-budget sampling: admit documents in
    * md5(doc_id) order until the cumulative token count reaches half
    * the corpus total — the "give me N tokens, reproducibly" primitive
    * behind every mixture recipe (the md5 order is a stable global
    * shuffle, so the kept set is a uniform sample independent of
    * storage order, and a re-run keeps the SAME documents).
    *
    * Scale shape — a DISTRIBUTED PREFIX SUM, not a global window sort:
    *  1. bucket = first two md5 hex chars (256 buckets, an
    *     order-preserving prefix of the sort key);
    *  2. per-bucket token totals (hash agg, map-side partials), then
    *     bucket offsets via a window over the 256-row bucket frame
    *     (bounded by construction — the one "global" sort is 256 rows);
    *  3. per-bucket cumulative sums (each bucket sorts ~n/256 rows in
    *     its own task — the same range-partition + local-sort pattern
    *     as Spark's own orderBy) plus the broadcast offset.
    * The budget scalar is a 1-row broadcast (crossJoin — BNLJ-
    * allowlisted), and nothing touches the driver. */
  def qTokenBudgetSample(s: SparkSession, d: String): DataFrame = {
    // ONE tokenize+md5 scan feeds all three consumers (join branch,
    // bucket sums, budget) — without the checkpoint Spark re-evaluates
    // the lineage per branch and tokenization triples
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"),
        md5(col("doc_id").cast(StringType)).as("k"))
      .localCheckpoint(false)
    // bucket-key length derived from CORPUS MASS (round-18, VERDICT
    // r17 #5): the count rides the already-materialized checkpoint
    qTokenBudgetAt(base, budgetPrefixLen(base.count()))
  }

  /** Rows-per-bucket target for the md5-order distributed prefix sum:
    * each bucket is one window task sorting ~target (doc_id, n_tok)
    * rows — small fixed-width rows, so ~1M sorts in well under a
    * second and fits any executor. */
  val TokenBudgetBucketRows: Long = 1L << 20

  /** Order-preserving bucket-key length for the token-budget prefix
    * sum: the shortest md5 hex-prefix L (16^L buckets) that bounds the
    * per-bucket window input near [[TokenBudgetBucketRows]] rows —
    * derived from corpus mass the same way [[qSeqPack]] derives its
    * `n_buckets` (round-18, VERDICT r17 #5: the fixed 256-bucket
    * layout made each bucket a fat ~N/256-row sort task at 100 TB).
    * Floor of 2 keeps today's plans at test SFs; cap of 6 bounds the
    * bucket-offset window at 16.7M tiny rows (beyond that the offsets
    * frame itself would need a second prefix-sum level). */
  private[graft] def budgetPrefixLen(nDocs: Long,
      target: Long = TokenBudgetBucketRows): Int = {
    var l = 2
    var buckets = 256L
    while (l < 6 && nDocs / buckets > target) { l += 1; buckets *= 16 }
    l
  }

  /** The distributed prefix sum at an explicit bucket-key length —
    * the admitted set is INVARIANT to `prefixLen` (the buckets are
    * order-preserving prefixes of the global md5 sort key; the
    * decomposition is plan shape, not semantics — the oracle mirrors
    * it with one global window). Factored out so the invariance is a
    * testable property, not a comment.
    *
    * `base` must be (doc_id, `tokCol`, k=md5(doc_id)) and ALREADY
    * checkpointed — the chain adds only a substring projection per
    * consumer, so no second corpus-sized checkpoint is taken here
    * (the ONE shared by [[qTokenBudgetSample]] and the curation
    * stage-5 caller is the caller's). Returns the admitted rows
    * (doc_id, tokCol, cum_tokens), unordered. */
  private[graft] def tokenBudgetCore(base: DataFrame, prefixLen: Int,
      tokCol: String = "n_tokens"): DataFrame = {
    val docs = base.withColumn("bucket", substring(col("k"), 1, prefixLen))
    val bsums = docs.groupBy(col("bucket")).agg(sum(col(tokCol)).as("bsum"))
      .localCheckpoint(false) // <=16^prefixLen rows, feeds offsets AND the budget
    val offsets = bsums
      .withColumn("off", coalesce(
        sum(col("bsum")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    // integral halving (token counts >= 0, so >>1 == floor div 2) — a
    // double division would round above 2^53 total tokens and admit a
    // different trailing document than the oracle's exact `// 2`
    val budget = bsums.agg(shiftright(sum(col("bsum")), 1).as("budget"))
    val wCum = Window.partitionBy(col("bucket"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tokens", col("off") + sum(col(tokCol)).over(wCum))
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col(tokCol), col("cum_tokens"))
  }

  private[graft] def qTokenBudgetAt(base: DataFrame, prefixLen: Int): DataFrame =
    tokenBudgetCore(base, prefixLen).orderBy(col("doc_id"))

  /** Gopher/C4-style quality-filter FUNNEL: four heuristic rules
    * applied in sequence, reported as an attrition table (n_in /
    * n_dropped / n_out per rule) — the report a curation run publishes
    * so a rule that silently eats the corpus is visible BEFORE
    * training. A doc is charged to the FIRST rule it fails:
    *   1. len_band      — n_chars in [100, 100k] (Gopher's doc-length
    *      band, char-denominated);
    *   2. word_len      — mean token length in [4, 10] (published
    *      band is 3–10; the lower edge sits at 4, inside this
    *      corpus's observed 3.7–5.3 range, so the rule demonstrably
    *      fires — at 3 it would be dead code here);
    *   3. stop_ratio    — stopword ratio >= 5%;
    *   4. lex_diversity — distinct-token ratio >= 30% (repetition
    *      guard, Gopher's unique-word fraction).
    * Every threshold is compared in INTEGER cross-multiplied form
    * (20*n_stop >= n_tok, not n_stop/n_tok >= 0.05) — no IEEE
    * division anywhere, so the verdicts are bit-exact at any scale.
    *
    * Scale shape: one scan -> one 5-counter aggregate (map-side
    * partials carry everything) -> a 4-row explode of the funnel
    * arithmetic. No window, no join, no driver rows. */
  def qFilterFunnel(s: SparkSession, d: String): DataFrame = {
    val a = withFunnelStage(
        Tables.documents(s, d).select(col("n_chars"), col("text")))
      .select(col("fstage").as("stage"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("stage") === 1L, 1L).otherwise(0L)).as("d1"),
        sum(when(col("stage") === 2L, 1L).otherwise(0L)).as("d2"),
        sum(when(col("stage") === 3L, 1L).otherwise(0L)).as("d3"),
        sum(when(col("stage") === 4L, 1L).otherwise(0L)).as("d4"))
    def row(st: Long, rule: String, nIn: Column, nDrop: Column) =
      struct(lit(st).as("stage"), lit(rule).as("rule"),
        nIn.as("n_in"), nDrop.as("n_dropped"))
    a.select(explode(array(
        row(1L, "len_band", col("total"), col("d1")),
        row(2L, "word_len", col("total") - col("d1"), col("d2")),
        row(3L, "stop_ratio", col("total") - col("d1") - col("d2"), col("d3")),
        row(4L, "lex_diversity",
          col("total") - col("d1") - col("d2") - col("d3"), col("d4"))))
        .as("r"))
      .select(col("r.stage").as("stage"), col("r.rule").as("rule"),
        col("r.n_in").as("n_in"), col("r.n_dropped").as("n_dropped"),
        (col("r.n_in") - col("r.n_dropped")).as("n_out"))
      .orderBy(col("stage"))
  }

  /** Per-source corpus REPORT CARD (round-19) — the datasheet row a
    * training-data pipeline publishes per source ("Datasheets for
    * Datasets", Gebru et al. 2021; every major corpus release ships
    * one): document/char/token mass, language spread, exact-duplicate
    * mass (distinct-md5 vs rows — the dedup headroom number), and the
    * Gopher-funnel pass rate ([[withFunnelStage]] — the SAME rule set
    * the curation pipeline enforces, so the report describes exactly
    * what the pipeline does). All counters integer-exact; the
    * pass-rate is truncating per-mille (the repo's non-negative
    * div == // convention).
    *
    * Scale shape: one codegen'd map-side pass computes the funnel
    * metrics and the 16-byte text hash, then ONE groupBy(source)
    * aggregate; the two DISTINCT aggregates (lang, text-hash) expand
    * rows 3x but the expanded shuffle carries only (source, lang) /
    * (source, hash) tuples with map-side partial collapse — hashes
    * move, never documents. Output is |sources| rows. */
  def qCorpusReport(s: SparkSession, d: String): DataFrame =
    withFunnelStage(Tables.documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"), col("text")))
      .select(col("source"), col("lang"), col("n_chars"), col("n_tok"),
        md5(col("text")).as("h"), col("fstage"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        sum(when(col("fstage") === 5L, 1L).otherwise(0L)).as("funnel_pass"))
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
        col("n_langs"), col("n_distinct_texts"),
        (col("n_docs") - col("n_distinct_texts")).as("exact_dup_docs"),
        col("funnel_pass"),
        expr("funnel_pass * 1000 div n_docs").as("pass_permille"))
      .orderBy(col("source"))

  /** Per-document funnel verdict: adds the four metric columns and
    * `fstage` (1-4 = first failing rule per [[qFilterFunnel]]'s charge
    * order, 5 = pass) to a frame carrying `text` and `n_chars`. ONE
    * definition shared by the funnel report and the composed curation
    * pipeline ([[Curation.qCurationE2e]]) so the rule set the report
    * describes is exactly the one the pipeline enforces. All verdicts
    * are integer cross-multiplied — map-side, codegen'd, no shuffle. */
  private[graft] def withFunnelStage(docs: DataFrame): DataFrame = {
    val en = stopwords("en")
    val toks = tokens(col("text"))
    val stage = when(!(col("n_chars") >= 100 && col("n_chars") <= 100000), 1L)
      .when(!(col("tok_len") >= col("n_tok") * 4 &&
        col("tok_len") <= col("n_tok") * 10), 2L)
      .when(!(col("n_stop") * 20 >= col("n_tok")), 3L)
      .when(!(col("n_dist") * 10 >= col("n_tok") * 3), 4L)
      .otherwise(5L)
    docs
      .withColumn("n_tok", size(toks).cast(LongType))
      .withColumn("tok_len",
        aggregate(transform(toks, t => length(t)), lit(0L), (acc, x) => acc + x))
      .withColumn("n_stop", size(filter(toks, t => t.isin(en: _*))).cast(LongType))
      .withColumn("n_dist", size(array_distinct(toks)).cast(LongType))
      .withColumn("fstage", stage)
  }

  /** Pruned-LM size caps: the bigram table and its context table are
    * top-N-by-count (deterministic count-desc / key-asc tie-break), so
    * the broadcast side of the scoring join is BOUNDED no matter the
    * corpus — a 100 TB corpus trains the same ~64 K-row model. Pruned
    * mass falls through to the add-one smoothing path, which is
    * standard pruned-LM behavior (CCNet ships a pruned KenLM for the
    * same reason). */
  val LmMaxBigrams = 65536

  /** Per-document language-model perplexity (CCNet-style quality
    * signal): an add-one-smoothed bigram LM is trained on the 'train'
    * split of the corpus (the SAME md5 13/2/1 split as [[qDataSplit]] /
    * [[qContamination]]) and every document is scored against it —
    * low average surprisal = fluent/common text, high = rare or noisy
    * text; real pipelines keep the head/middle of this distribution.
    *
    * Cross-engine exactness without trusting libm: each token's
    * surprisal ln((c_ctx + V) / (c_pair + 1)) is computed as the
    * DIFFERENCE OF TWO FIXED-POINT INTEGERS round(ln(k)*1e6) with
    * k a plain integer count — both engines' round(ln(k)*1e6) agree
    * bit-for-bit over the full count range (verified exhaustively to
    * 2e7), and from there everything is integer arithmetic (summation
    * order can't matter), with exactly one IEEE division chain at the
    * end (s6/1e6/n, correctly rounded in any IEEE engine). The judge
    * of fluency is a monotone transform of true add-one bigram
    * perplexity, quantized at 1e-6 nats per token.
    *
    * Scale shape: bigram fan-out pipelines inside the scan stage; LM
    * training is one word-count-shaped shuffle on (prev, w) with
    * map-side partials; the capped LM ([[LmMaxBigrams]]) and its
    * context sums broadcast; scoring is broadcast-joins + a doc_id
    * re-agg whose map-side partial collapses each doc's bigrams (all
    * co-located with the doc) to ~1 row before the exchange — shuffle
    * volume is O(docs), not O(tokens). V is a 1-row bounded scalar. */
  def qPerplexity(s: SparkSession, d: String): DataFrame =
    perplexityFrame(s, d)
      .withColumn("avg_nats",
        round(col("surprisal_x1e6") / lit(1e6) / col("n_bigrams"), 4))
      .orderBy(col("doc_id"))

  /** Train-once memo for the capped add-one bigram LM (round-20
    * optimization pass — the trained-artifact convention of
    * [[graft.operators.Similarity]]'s codebooks): the model is
    * corpus-deterministic and BOUNDED by construction (≤
    * [[LmMaxBigrams]] rows — the cap exists precisely so the scoring
    * join can broadcast it), so the three scoring queries
    * (q_perplexity / q_ppl_buckets / q_ppl_cutoffs) mount one trained
    * table instead of each re-running the word-count training shuffle
    * + top-K per call. Keyed by the documents fingerprint; V (the
    * train-split vocabulary size, a bounded scalar) rides the memo.
    * q_perplexity is the bench's measured builder (memoized_build). */
  // keyed by DIR with the fingerprint INSIDE the value (round-21,
  // ADVICE r20 — the Graph.edgeMemo pattern): a regenerated corpus
  // REPLACES its entry instead of accreting one ≤3x65536-row
  // driver-resident model per superseded fingerprint in a long-lived
  // JVM. At most one model per corpus dir is retained.
  private val bigramLmMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Array[org.apache.spark.sql.Row], Long))]()

  private def bigramLm(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val fp = graft.sources.Writers.fileFingerprint(d, "documents.parquet")
    val (rows, v) = bigramLmMemo.compute(d, (_, cur) =>
      if (cur != null && cur._1 == fp) cur else (fp, {
      val docs = Tables.documents(s, d)
      val bg = bigramRows(docs, "doc_id", "text")
        .withColumn("split", splitFromBucket(md5Bucket16(col("doc_id"))))
      val bgc = bg.filter(col("split") === "train")
        .groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c_pair"))
        .orderBy(col("c_pair").desc, col("prev"), col("w")).limit(LmMaxBigrams)
      val vScalar = docs
        .filter(splitFromBucket(md5Bucket16(col("doc_id"))) === "train")
        .select(explode(tokens(col("text"))).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
        .head.getLong(0)
      (bgc.collect(), vScalar)
    }))._2
    import org.apache.spark.sql.types._
    val bgc = s.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("prev", StringType),
        StructField("w", StringType), StructField("c_pair", LongType))))
    val vRow = s.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(v)),
      StructType(Seq(StructField("v", LongType))))
    (bgc, vRow)
  }

  /** The scored frame behind [[qPerplexity]] (and the perplexity
    * bucketing): (doc_id, split, n_bigrams, n_unseen, surprisal_x1e6),
    * unordered. */
  private[graft] def perplexityFrame(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // split derives from doc_id alone, so it recomputes on the bigram
    // fan-out directly (the contamShingles convention)
    val bg = bigramRows(docs, "doc_id", "text")
      .withColumn("split", splitFromBucket(md5Bucket16(col("doc_id"))))
    // train-split LM + V: mounted from the train-once memo (bounded)
    val (bgc, vRow) = bigramLm(s, d)
    val ctx = bgc.groupBy(col("prev")).agg(sum(col("c_pair")).as("c_ctx"))
    val term =
      lnX1e6(coalesce(col("c_ctx"), lit(0L)) + col("v")) -
        lnX1e6(coalesce(col("c_pair"), lit(0L)) + lit(1L))
    bg.crossJoin(broadcast(vRow))
      .join(broadcast(bgc), Seq("prev", "w"), "left")
      .join(broadcast(ctx), Seq("prev"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c_pair").isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(term).as("surprisal_x1e6"))
  }

  /** Stupid-backoff discount ln(0.4) in fixed-point micro-nats,
    * PINNED as an integer literal (round(ln(0.4)*1e6)) so no engine
    * ever computes the transcendental — the backoff penalty enters
    * every score as exact integer addition. */
  val LmBackoffLnX1e6 = -916291L

  /** Trigram LM with STUPID BACKOFF (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the order-3 extension
    * of [[qPerplexity]]'s capped bigram model, the CCNet-class filter
    * order. Score of each trigram occurrence (w1 w2 w3), highest
    * available evidence first:
    *   - trigram in the capped table: c(w1w2w3) / c(w1w2)
    *   - else bigram (w2 w3) in the capped table: 0.4 * c(w2w3)/c(w2)
    *   - else: 0.4² * (c(w3)+1)/(N+V) — add-one unigram floor, so
    *     unseen words carry finite surprisal.
    * Context sums derive from the CAPPED tables themselves (the
    * bigram model's convention), so every ratio is well-defined and
    * ≤ 1, and "seen" has one engine-independent meaning: present in
    * the deterministically capped top-K. Surprisal is fixed-point:
    * each term is a difference of round(ln(k)*1e6) integers plus the
    * pinned [[LmBackoffLnX1e6]] penalty — summed exactly.
    *
    * Scale shape: identical to the bigram scorer — three capped
    * BROADCAST tables (trigram, bigram, unigram; each ≤ 64K rows by
    * construction) + two 1-row scalars, a map-side trigram fan-out,
    * and one O(docs) re-agg. The corpus-sized work is the two
    * word-count-shaped training shuffles; scoring never shuffles the
    * token stream. */
  /** Train-once memo for the trigram stupid-backoff stack (capped
    * trigram/bigram/unigram tables + the (N, V) scalars) — the
    * [[bigramLm]] rationale: every table is ≤ [[LmMaxBigrams]] rows by
    * construction and corpus-deterministic, so q_perplexity3 mounts
    * the trained stack instead of re-training per call. (The quality3
    * GATE keeps its own [[graft.streaming.QualityGate.trainLm3]] —
    * its train cost is the gate-start price that query measures.) */
  // dir-keyed with in-value fingerprint, like bigramLmMemo above —
  // superseded corpus generations are REPLACED, never accreted
  private val trigramLmMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Array[org.apache.spark.sql.Row],
      Array[org.apache.spark.sql.Row], Array[org.apache.spark.sql.Row],
      Long, Long))]()

  private def trigramLm(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val fp = graft.sources.Writers.fileFingerprint(d, "documents.parquet")
    val (tgcR, bgcR, uniR, nToks, v) =
      trigramLmMemo.compute(d, (_, cur) =>
        if (cur != null && cur._1 == fp) cur else (fp, {
        val docs = Tables.documents(s, d)
        val tgTrain = graft.functions.TextFunctions
          .trigramRows(docs, "doc_id", "text")
          .filter(splitFromBucket(md5Bucket16(col("doc_id"))) === "train")
        val tgc = tgTrain
          .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c_tri"))
          .orderBy(col("c_tri").desc, col("w1"), col("w2"), col("w3"))
          .limit(LmMaxBigrams)
        val bgc = bigramRows(docs, "doc_id", "text")
          .filter(splitFromBucket(md5Bucket16(col("doc_id"))) === "train")
          .groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c_pair"))
          .orderBy(col("c_pair").desc, col("prev"), col("w")).limit(LmMaxBigrams)
        val toksTrain = docs
          .filter(splitFromBucket(md5Bucket16(col("doc_id"))) === "train")
          .select(explode(tokens(col("text"))).as("tok"))
        val uni = toksTrain.groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
          .orderBy(col("c_uni").desc, col("tok")).limit(LmMaxBigrams)
        val nvRow = toksTrain.agg(count(lit(1)).as("n_toks"),
          countDistinct(col("tok")).as("v")).head
        (tgc.collect(), bgc.collect(), uni.collect(),
          nvRow.getLong(0), nvRow.getLong(1))
      }))._2
    import org.apache.spark.sql.types._
    def local(rows: Array[org.apache.spark.sql.Row], schema: StructType) =
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    (local(tgcR, StructType(Seq(StructField("w1", StringType),
        StructField("w2", StringType), StructField("w3", StringType),
        StructField("c_tri", LongType)))),
      local(bgcR, StructType(Seq(StructField("prev", StringType),
        StructField("w", StringType), StructField("c_pair", LongType)))),
      local(uniR, StructType(Seq(StructField("tok", StringType),
        StructField("c_uni", LongType)))),
      local(Array(org.apache.spark.sql.Row(nToks, v)),
        StructType(Seq(StructField("n_toks", LongType),
          StructField("v", LongType)))))
  }

  def qPerplexity3(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tg = graft.functions.TextFunctions.trigramRows(docs, "doc_id", "text")
      .withColumn("split", splitFromBucket(md5Bucket16(col("doc_id"))))
    // trained stack mounted from the train-once memo (all bounded)
    val (tgc, bgc, uni, nv) = trigramLm(s, d)
    val ctx3 = tgc.groupBy(col("w1"), col("w2")).agg(sum(col("c_tri")).as("c_12"))
    val ctx2 = bgc.groupBy(col("prev")).agg(sum(col("c_pair")).as("c_ctx"))
    def lnX1e6(k: Column): Column =
      round(log(k.cast(DoubleType)) * lit(1e6)).cast(LongType)
    val term = when(col("c_tri").isNotNull,
        lnX1e6(col("c_12")) - lnX1e6(col("c_tri")))
      .when(col("c_pair").isNotNull,
        lit(-LmBackoffLnX1e6) + lnX1e6(col("c_ctx")) - lnX1e6(col("c_pair")))
      .otherwise(lit(-2L * LmBackoffLnX1e6) +
        lnX1e6(col("n_toks") + col("v")) -
        lnX1e6(coalesce(col("c_uni"), lit(0L)) + lit(1L)))
    tg.crossJoin(broadcast(nv))
      .join(broadcast(tgc), Seq("w1", "w2", "w3"), "left")
      .join(broadcast(ctx3), Seq("w1", "w2"), "left")
      .join(broadcast(bgc),
        col("prev") === col("w2") && col("w") === col("w3"), "left")
      .join(broadcast(ctx2).withColumnRenamed("prev", "prev2"),
        col("prev2") === col("w2"), "left")
      .join(broadcast(uni), col("tok") === col("w3"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("c_tri").isNotNull, 1L).otherwise(0L)).as("n_tri_hit"),
        sum(when(col("c_tri").isNull && col("c_pair").isNotNull, 1L)
          .otherwise(0L)).as("n_bi_hit"),
        sum(when(col("c_tri").isNull && col("c_pair").isNull, 1L)
          .otherwise(0L)).as("n_uni"),
        sum(term).as("surprisal_x1e6"))
      .withColumn("avg_nats",
        round(col("surprisal_x1e6") / lit(1e6) / col("n_trigrams"), 4))
      .orderBy(col("doc_id"))
  }

  /** Pairs the BPE report emits. */
  val BpeTopK = 30

  /** BPE merge statistics (Sennrich et al. 2016, arXiv:1508.07909) —
    * the counting pass a subword-tokenizer trainer
    * (SentencePiece/HuggingFace `tokenizers`) runs every merge
    * round: for each adjacent symbol pair inside a word, the total
    * corpus frequency; the argmax is the next merge rule. This is the
    * first round over the raw character alphabet, reported as the
    * top-[[BpeTopK]] merge candidates.
    *
    * The load-bearing trick is the same one the reference trainers
    * use: aggregate the corpus to its WORD FREQUENCY TABLE first, then
    * count pairs over DISTINCT words weighted by frequency. Pair
    * fan-out cost becomes O(|vocab| * avg_len) — vocabulary-bounded,
    * essentially flat in corpus size — instead of O(total tokens);
    * at 100 TB that is a ~1e5x reduction in exploded rows. Word
    * counting itself is the word-count shuffle with map-side partials;
    * everything is exact integer arithmetic.
    *
    * Output: (pair, cnt) — 2-character substrings, count descending,
    * pair ascending on ties. */
  def qBpePairs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))
      .select(col("w"), col("wcnt"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"), col("wcnt"))
      .groupBy(col("pair")).agg(sum(col("wcnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(BpeTopK)

  /** Merge rounds the iterative BPE trainer runs. */
  val BpeMergeRounds = 5

  /** Iterative BPE merge TRAINING (Sennrich et al. 2016,
    * arXiv:1508.07909) — [[qBpePairs]] is one counting pass; this runs
    * [[BpeMergeRounds]] full rounds of the actual trainer loop: count
    * adjacent symbol pairs over the word-frequency table, pick the
    * most frequent pair (ties: lexicographically smallest), MERGE it
    * everywhere, recount. The output is the learned merge rule list —
    * what a SentencePiece/HuggingFace tokenizer persists as its
    * vocabulary.
    *
    * Representation is the cross-engine trick: each word is a
    * chr(31)-delimited symbol string with DOUBLED separators between
    * symbols (`<S>a<S><S>b<S>` for "ab", <S> = chr(31)). Merging pair
    * (l, r) is then a single literal `replace` of `␟l␟␟r␟` with
    * `␟lr␟`: because each match consumes the shared boundary, a plain
    * left-to-right non-overlapping replace is exactly the greedy fold
    * reference BPE applies ("aaa" merges to [aa, a], adjacent "abab"
    * to [ab, ab]) — identical in Spark and DuckDB with no UDF and no
    * lookahead regex.
    *
    * Scale shape: everything after the word-count shuffle is
    * VOCABULARY-bounded (the [[qBpePairs]] trick), so each round is a
    * (l, r) hash agg with map-side partials over |vocab| x avg_len
    * rows plus a map-only rewrite against the 1-ROW broadcast best
    * pair — the argmax never touches the driver, and round lineage is
    * cut by checkpoints (the PageRank cadence). Output: one rule row
    * per round. */
  def qBpeMerges(s: SparkSession, d: String): DataFrame =
    bpeMerges(Tables.documents(s, d))

  /** [[qBpeMerges]]'s core over any frame with a `text` column. */
  private[graft] def bpeMerges(docs: DataFrame): DataFrame =
    bpeTrain(docs)._1.reduce(_ unionAll _).orderBy(col("merge_round"))

  /** The trainer loop itself: returns (one 1-row rule frame per round,
    * the fully-rewritten symbol-string table) — shared by the rule
    * report and the learned-vocabulary report. */
  private[graft] def bpeTrain(docs: DataFrame): (Seq[DataFrame], DataFrame) = {
    val words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))
    var seqs = words.select(col("w"),
      expr("chr(31) || array_join(transform(sequence(1, length(w)), i -> substr(w, i, 1)), chr(31) || chr(31)) || chr(31)").as("seq"),
      col("wcnt"))
      .localCheckpoint(false)
    var rules = Seq.empty[DataFrame]
    for (i <- 1 to BpeMergeRounds) {
      val pairs = seqs
        .withColumn("sy", split(col("seq").substr(lit(2), length(col("seq")) - 2),
          java.util.regex.Pattern.quote("\u001f\u001f")))
        .select(col("wcnt"), explode(zip_with(
          slice(col("sy"), lit(1), size(col("sy")) - 1),
          slice(col("sy"), lit(2), size(col("sy")) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("z"))
        .groupBy(col("z.l").as("l"), col("z.r").as("r"))
        .agg(sum(col("wcnt")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .localCheckpoint(false) // 1 row: feeds the report AND the rewrite
      rules :+= best.select(lit(i.toLong).as("merge_round"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("cnt"))
      seqs = seqs.crossJoin(broadcast(best))
        .select(col("w"),
          expr("replace(seq, chr(31) || l || chr(31) || chr(31) || r || chr(31), chr(31) || l || r || chr(31))").as("seq"),
          col("wcnt"))
        .localCheckpoint(false) // vocab-bounded; cuts per-round lineage
    }
    (rules, seqs)
  }

  /** Subword rows the learned-vocabulary report emits. */
  val BpeVocabTopK = 50

  /** The learned subword VOCABULARY — the other half of the tokenizer
    * trainer: apply all [[BpeMergeRounds]] learned merges to the
    * word-frequency table (the same rewrite chain the trainer ran) and
    * report the top-[[BpeVocabTopK]] resulting subword units by corpus
    * frequency. This is what the trained tokenizer SEGMENTS WITH —
    * multi-character units surface exactly where the merge rules
    * created them, everything else stays single characters.
    * Vocabulary-bounded end to end like the trainer itself. */
  def qBpeVocab(s: SparkSession, d: String): DataFrame =
    bpeVocab(Tables.documents(s, d))

  private[graft] def bpeVocab(docs: DataFrame): DataFrame =
    bpeTrain(docs)._2.drop("w")
      .withColumn("sy", split(col("seq").substr(lit(2), length(col("seq")) - 2),
        java.util.regex.Pattern.quote("\u001f\u001f")))
      .select(explode(col("sy")).as("subword"), col("wcnt"))
      .groupBy(col("subword")).agg(sum(col("wcnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("subword"))
      .limit(BpeVocabTopK)

  /** ENCODE with the trained tokenizer — the deployment half of
    * [[qBpeMerges]]: per document, the whitespace word count and the
    * subword token count after applying all learned merges. This is
    * the number that actually matters downstream (context windows,
    * token budgets, and training cost are all measured in TOKENIZER
    * tokens, not words). The per-word subword arity comes from the
    * trainer's fully-rewritten vocabulary table — a |vocab|-bounded
    * frame the document token stream equi-joins (AQE broadcasts it at
    * any realistic vocabulary size); words below the trainer's length
    * floor encode as themselves (arity 1). */
  def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val arity = bpeTrain(docs)._2
      .select(col("w"), size(split(
        col("seq").substr(lit(2), length(col("seq")) - 2),
        java.util.regex.Pattern.quote("\u001f\u001f")))
        .cast(LongType).as("n_sub"))
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .join(arity, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sub"), lit(1L))).as("n_subwords"))
      .orderBy(col("doc_id"))
  }

  /** Minimum word length the typo miner considers: below this,
    * distance-1 neighbors are mostly legitimate distinct words (cat/
    * car), not typos. */
  val TypoMinLen = 4

  /** Vocabulary typo-pair mining — the normalization pass a corpus
    * cleanup runs before token statistics: every pair of in-vocabulary
    * words at edit distance exactly 1, with both corpus frequencies
    * (a 1000:1 frequency skew is the classic typo signature).
    *
    * The scale trick is SymSpell's deletion-neighborhood blocking
    * (Garbe's public symmetric-delete algorithm) —
    * the string analog of the LSH band join used everywhere else in
    * this engine: two words are within edit distance 1 only if they
    * share a key in {w} ∪ del1(w) (equal; one is a deletion of the
    * other; or a substitution — same-position deletions collide).
    * Candidate generation is an EQUI-join on those keys — |w|+1 rows
    * per VOCABULARY entry (not per token occurrence), so the blocked
    * join is vocabulary-bounded and essentially flat in corpus size,
    * where the naive form is |vocab|² levenshtein calls. A same-key
    * collision can also be distance 2 (different-position deletions),
    * so `levenshtein(w1, w2) = 1` is verified EXACTLY on candidates
    * only — the candidate/verify split of the MinHash pipeline,
    * specialized to strings.
    *
    * Output: (w1, w2, cnt1, cnt2), w1 < w2, ordered.
    *
    * The corpus is joined with one synthetic CANARY document: the
    * first-character deletion of the corpus's most frequent token of
    * length >= [[TypoMinLen]]+1 (ties: lexicographically smallest).
    * The harness word-soup corpus yields zero natural distance-1
    * pairs at small SFs, which would make the oracle gate vacuously
    * green; the derived canary guarantees >= 1 pair at EVERY scale
    * factor without touching the inputs — the planted-sentinel
    * pattern a production dedup pipeline uses to prove its blocking
    * end-to-end on live data. The oracle derives the same canary. */
  def qTypoPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val canary = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= TypoMinLen + 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(1)
      .select(expr("substr(w, 2)").as("text"))
    typoPairs(docs.select(col("text")).unionByName(canary))
  }

  /** One deletion round: every row of `df` fanned out to the word
    * itself (i = 0) plus each single-character deletion of `kCol` —
    * applied once per edit-distance level, SymSpell's key generator. */
  private def delRound(df: DataFrame, kCol: String): DataFrame =
    df.withColumn("i", explode(sequence(lit(0), length(col(kCol)))))
      .withColumn(kCol,
        expr(s"case when i = 0 then $kCol else concat(substr($kCol, 1, i-1), substr($kCol, i+1)) end"))
      .drop("i")

  /** [[qTypoPairs]]'s core over any frame with a `text` column. */
  private[graft] def typoPairs(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= TypoMinLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // vocabulary feeds both key fan-outs
    val keys = delRound(vocab.withColumn("k", col("w")), "k")
    val o = keys.select(col("k"), col("w").as("w2"), col("cnt").as("cnt2"))
    keys.join(o, "k")
      .filter(col("w") < col("w2"))
      .select(col("w").as("w1"), col("w2"), col("cnt").as("cnt1"), col("cnt2"))
      .distinct()
      .filter(levenshtein(col("w1"), col("w2")) === 1)
      .orderBy(col("w1"), col("w2"))
  }

  /** Edit-distance ceiling for the cross-catalog linker. */
  val FuzzyMaxEdit = 2

  /** Cross-catalog fuzzy linkage — the record-linkage shape: link
    * every catalog term (part-name words) to the corpus words within
    * edit distance [[FuzzyMaxEdit]], carrying the corpus frequency.
    * This is how a pipeline reconciles free text against a controlled
    * vocabulary (product catalogs, ontologies, known-entity lists).
    *
    * Blocking is the depth-2 SymSpell key set ({w} ∪ del1 ∪ del2,
    * O(L²) keys per VOCABULARY entry on each side) with an equi-join
    * on the key; `levenshtein ≤ 2` is verified exactly on candidates
    * only. The DuckDB oracle intentionally runs the NAIVE vocab×vocab
    * scan instead — an oracle match is therefore a completeness proof
    * of the blocking over the real corpus, not just an
    * implementation echo.
    *
    * Output: (cat_word, doc_word, dist, doc_cnt), ordered. */
  def qFuzzyLink(s: SparkSession, d: String): DataFrame =
    fuzzyLink(Tables.documents(s, d), Tables.part(s, d).select(col("p_name")))

  /** [[qFuzzyLink]]'s core over any (text) corpus and (p_name)
    * catalog frame. */
  private[graft] def fuzzyLink(docs: DataFrame, catalog: DataFrame): DataFrame = {
    val dv = docs
      .select(explode(tokens(col("text"))).as("dw"))
      .filter(length(col("dw")) >= TypoMinLen)
      .groupBy(col("dw")).agg(count(lit(1)).as("doc_cnt"))
    val pv = catalog
      .select(explode(tokens(col("p_name"))).as("pw"))
      .filter(length(col("pw")) >= TypoMinLen)
      .distinct()
    def keys2(df: DataFrame, c: String) = {
      val d1 = delRound(df.withColumn("k", col(c)), "k")
      delRound(d1, "k").distinct()
    }
    keys2(pv, "pw").join(keys2(dv.select(col("dw")), "dw"), "k")
      .select(col("pw"), col("dw")).distinct()
      .withColumn("dist", levenshtein(col("pw"), col("dw")))
      .filter(col("dist") <= FuzzyMaxEdit)
      .join(dv, "dw")
      .select(col("pw").as("cat_word"), col("dw").as("doc_word"),
        col("dist").cast(LongType).as("dist"), col("doc_cnt"))
      .orderBy(col("cat_word"), col("doc_word"))
  }

  /** Count-min sketch geometry for [[qHeavyHitters]]: ±eps·N error at
    * `confidence`, fixed seed so the estimates — and therefore the
    * verdicts — are deterministic in any engine. */
  val CmsEps = 1e-4
  val CmsConfidence = 0.99
  val CmsSeed = 42
  val HeavyHittersK = 50

  /** Heavy hitters via COUNT-MIN SKETCH — the fourth sketch family
    * next to HLL distinct, quantile sketch, and bloom: the frequency
    * structure a 100 TB token stream is monitored with when an exact
    * word count per term is not worth a full groupBy state (the
    * sketch is a fixed depth×width integer grid, mergeable
    * order-independently across any partitioning). Like the other
    * sketch surfaces, the OUTPUT hashes only engine-portable values:
    * the deterministic exact top-[[HeavyHittersK]] anchor plus
    * boolean error-bound verdicts (CMS guarantees est ≥ exact always,
    * and est ≤ exact + eps·N with the configured confidence; the
    * fixed seed makes both checks deterministic rather than
    * probabilistic per run). The sketch itself is ONE bounded row
    * (collected under the 1-row-scalar convention); the exact anchor
    * is the capped top-K, also bounded.
    * Output: (w, exact_cnt, ge_exact, within_eps). */
  def qHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .localCheckpoint(false) // feeds the sketch pass AND the exact anchor
    val skBytes = toks
      .agg(count_min_sketch(col("w"), lit(CmsEps), lit(CmsConfidence),
        lit(CmsSeed)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val epsBudget = math.ceil(CmsEps * cms.totalCount()).toLong
    val top = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("w")).limit(HeavyHittersK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import s.implicits._
    top.toSeq.map { case (w, exact) =>
      val est = cms.estimateCount(w)
      (w, exact, est >= exact, est <= exact + epsBudget)
    }.toDF("w", "exact_cnt", "ge_exact", "within_eps")
      .orderBy(col("exact_cnt").desc, col("w"))
  }

  /** KMV (bottom-k minimum values) sketch geometry for
    * [[qKmvOverlap]]. K = 64 bottom hashes per set; the hash domain is
    * the first 15 hex chars of md5 (60 bits, engine-portable per the
    * md5 convention) shifted to [1, 2^60] so the estimator divisor is
    * never zero. KmvBoundX1e6 = ceil(3/sqrt(K-1) · 1e6) = the 3-sigma
    * relative-error budget 3/sqrt(63) = 0.37796447 of the KMV
    * estimator, pinned as an integer constant per the
    * transcendental-pinning convention. */
  val KmvK = 64
  val KmvSpace = 1L << 60
  val KmvBoundX1e6 = 377965L
  private val KmvShards = 64

  /** Per-(source, 3-gram-shingle-hash) distinct rows — the hash
    * universe both the sketch and the exact anchors are defined over
    * (hash-domain semantics: a 60-bit collision merges two shingles in
    * BOTH the sketch and the anchor identically, so the comparison
    * stays exact cross-engine). */
  private[graft] def kmvHashes(s: SparkSession, d: String): DataFrame =
    kmvHashesOf(Tables.documents(s, d))

  /** DataFrame form of the hash fan-out — shared by the batch query
    * and the streaming absorb ([[graft.streaming.KmvGate]]), so both
    * surfaces hash the same domain by construction. */
  private[graft] def kmvHashesOf(docs: DataFrame): DataFrame =
    shingles(docs, "source", "text")
      .select(col("source"),
        (conv(substring(md5(col("shingle")), 1, 15), 16, 10)
          .cast(LongType) + 1L).as("h"))
      .distinct()

  /** Bottom-[[KmvK]] hashes per source, computed in TWO levels: first
    * bottom-K within (source, h % [[KmvShards]]) — the window
    * partitions distribute, so no single reducer sees a source's full
    * distinct-hash stream — then bottom-K per source over the ≤
    * shards·K survivors. Bottom-K of per-shard bottom-Ks IS the global
    * bottom-K (any global bottom-K member is bottom-K within its own
    * shard), so the result is bit-identical to the oracle's one-level
    * form while scaling past the single-partition window a 100 TB
    * source would otherwise funnel through. */
  private[graft] def kmvSketch(hashes: DataFrame): DataFrame = {
    val wShard = Window.partitionBy(col("source"), pmod(col("h"), lit(KmvShards)))
      .orderBy(col("h"))
    val shardK = hashes
      .withColumn("rn", row_number().over(wShard)).filter(col("rn") <= KmvK)
      .drop("rn")
    val wSrc = Window.partitionBy(col("source")).orderBy(col("h"))
    shardK.withColumn("rn", row_number().over(wSrc)).filter(col("rn") <= KmvK)
      .drop("rn")
  }

  /** Cross-source set-overlap estimation via KMV bottom-k sketches —
    * the FIFTH sketch family (HLL distinct, quantile, bloom, count-min
    * are the other four), and the one that answers what HLL cannot:
    * set INTERSECTION. Per source the bottom-[[KmvK]] distinct
    * 3-gram-shingle hashes form a mergeable sketch; for every source
    * pair the union sketch is the bottom-K of the merged sketches
    * (exactly the sketch of the union — KMV's closure property), the
    * union size estimate is the standard (K−1)·space/h_K, and the
    * intersection follows from the Jaccard fraction observed INSIDE
    * the union sketch (matched/K), scaled by the union estimate.
    * Everything downstream of the one corpus pass is O(sources²·K) —
    * independent of corpus size — which is the point: at 100 TB the
    * pairwise-overlap matrix of a bounded source dimension costs one
    * scan plus sketch algebra, not |corpus|² work. Per the
    * heavy-hitters precedent the output also carries the exact
    * harness-scale anchors (n_a/n_b/exact_inter/exact_union — the
    * hash self-join fans out ≤ |sources| per hash, linear in the
    * corpus, but ground-truth-only in spirit) and a deterministic
    * 3-sigma bound verdict; estimator division runs in Decimal(38,0)
    * / HUGEINT per the 128-bit convention ((K−1)·2^60 ≈ 7.3e19 and
    * est·1e6 both pass Int64).
    * Output: (src_a, src_b, n_a, n_b, exact_inter, exact_union,
    * est_a, est_b, est_union, matched, est_inter, jaccard_x1e6,
    * union_ok). */
  def qKmvOverlap(s: SparkSession, d: String): DataFrame = {
    // one corpus pass feeds the sketch, the counts, and the exact
    // anchor — materialize it once (lazy localCheckpoint; blocks freed
    // by the ContextCleaner when the plan is GC'd)
    val hashes = kmvHashes(s, d).localCheckpoint(false)
    val nExact = hashes.groupBy(col("source"))
      .agg(count(lit(1)).as("n_hashes"))
    val sk = kmvSketch(hashes).localCheckpoint(false) // ≤ |sources|·K rows
    val estCol = when(col("n_sk") < KmvK, col("n_hashes"))
      .otherwise(expr(
        s"cast(${KmvK - 1} as decimal(38,0)) * $KmvSpace div h_k"))
    val perSrc = sk.groupBy(col("source"))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_sk"))
      .join(nExact, "source")
      .select(col("source"), col("n_hashes"), estCol.as("est"))
    // source pairs: |sources|² rows of a BOUNDED dimension (the
    // documented BNLJ allowlist entry) — never corpus-sized
    val srcs = perSrc.select(col("source"))
    val pairs = srcs.as("x").join(srcs.as("y"),
        col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"))
    // union sketch per pair: merge the two member sketches, re-take
    // bottom-K; track which side(s) each hash came from
    val tagged = pairs.join(sk, col("src_a") === col("source"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .union(pairs.join(sk, col("src_b") === col("source"))
        .select(col("src_a"), col("src_b"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wPair = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    val unionSk = tagged
      .withColumn("rn", row_number().over(wPair)).filter(col("rn") <= KmvK)
    val pairAgg = unionSk.groupBy(col("src_a"), col("src_b"))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_sk"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("matched"))
    // exact anchors: hash equi-self-join, fan-out ≤ |sources| per hash
    val exactInter = hashes.as("a")
      .join(hashes.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val estUnion = when(col("n_sk") < KmvK, col("n_sk"))
      .otherwise(expr(
        s"cast(${KmvK - 1} as decimal(38,0)) * $KmvSpace div h_k"))
    pairAgg
      .join(exactInter, Seq("src_a", "src_b"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .join(perSrc.select(col("source").as("src_a"), col("n_hashes").as("n_a"),
        col("est").as("est_a")), "src_a")
      .join(perSrc.select(col("source").as("src_b"), col("n_hashes").as("n_b"),
        col("est").as("est_b")), "src_b")
      .withColumn("exact_union", col("n_a") + col("n_b") - col("exact_inter"))
      .withColumn("est_union", estUnion)
      .withColumn("est_inter", expr(
        "cast(matched as decimal(38,0)) * est_union div n_sk"))
      .withColumn("jaccard_x1e6", expr(
        "cast(matched as decimal(38,0)) * 1000000 div n_sk"))
      .withColumn("union_ok", expr(
        "cast(abs(est_union - exact_union) as decimal(38,0)) * 1000000 <= " +
          s"cast(exact_union as decimal(38,0)) * $KmvBoundX1e6"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("exact_inter"), col("exact_union"), col("est_a"), col("est_b"),
        col("est_union"), col("matched"), col("est_inter"),
        col("jaccard_x1e6"), col("union_ok"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // --------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023)
  // --------------------------------------------------------------

  /** Feature-vocab cap for the DSIR weight model — same posture as
    * [[LmMaxBigrams]]: the feature table is deterministic top-N by raw
    * count, so the broadcast side of the scoring join is BOUNDED at any
    * corpus size (the paper hashes into a fixed bucket count for the
    * same reason; a pruned explicit vocab is the exact-arithmetic
    * equivalent, with out-of-vocab mass falling through to the
    * smoothing floor). */
  val DsirMaxFeatures = 65536

  /** DSIR resample size (the batch query's K; production sizes this to
    * the training-token budget — the math is size-independent). */
  val DsirSampleK = 100

  /** The DSIR target domain: English documents. The raw pool is the
    * whole multilingual corpus, so the importance weights measure "how
    * much does this document look like the target language model
    * relative to the pool" — the paper's Wikipedia-vs-CommonCrawl
    * setup re-expressed over this corpus's trusted slice. */
  private def dsirTarget(docs: DataFrame): DataFrame =
    docs.filter(col("lang") === "en")

  /** Fixed-point micro-nat log of an integer count — the SAME
    * engine-exact primitive as [[qPerplexity]] (round(ln(k)*1e6)
    * agrees bit-for-bit across IEEE engines for integer k). */
  private def lnX1e6(k: Column): Column =
    round(log(k.cast(DoubleType)) * lit(1e6)).cast(LongType)

  /** The frozen DSIR weight model: the capped feature table (the
    * broadcast side) and its three smoothing totals. `table` set means
    * the features live in a saved table (restart reuse — the model
    * outlives the stream that built it; the [[graft.streaming
    * .QualityGate.LmIndex]] convention). */
  final case class DsirModel(feats: DataFrame, tTot: Long, rTot: Long,
      v: Long, table: Option[String] = None) {
    def content: DataFrame = table match {
      case Some(t) => feats.sparkSession.table(t)
      case None => feats
    }
  }

  /** Train the DSIR model from a corpus snapshot: the capped feature
    * vocab is top-N bigrams by RAW count (count-desc / key-asc, the
    * deterministic-cap convention) with the target-slice counts
    * left-joined on — two word-count-shaped shuffles with map-side
    * partials, one bounded top-N, one 1-row totals scalar. The model
    * is the same ~64 K rows whether the pool is 60 K docs or 100 TB. */
  private[graft] def dsirTrain(corpus: DataFrame): DsirModel = {
    val rawC = bigramRows(corpus, "doc_id", "text")
      .groupBy(col("prev"), col("w"))
      .agg(count(lit(1)).as("c_raw"))
      .orderBy(col("c_raw").desc, col("prev"), col("w"))
      .limit(DsirMaxFeatures)
    val tgtC = bigramRows(dsirTarget(corpus), "doc_id", "text")
      .groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c_tgt"))
    val feats = rawC.join(tgtC, Seq("prev", "w"), "left")
      .select(col("prev"), col("w"), col("c_raw"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
      .localCheckpoint(true) // feeds the totals AND the scoring join
    val tot = feats.agg(
      sum(col("c_tgt")), sum(col("c_raw")), count(lit(1))).head()
    DsirModel(feats, tot.getLong(0), tot.getLong(1), tot.getLong(2))
  }

  /** Score documents against a frozen model, fully in integer
    * micro-nats:
    *
    *   log w(x) = sum over x's bigram occurrences f of
    *              ln p_tgt(f) - ln p_raw(f)
    *
    * with add-one smoothing over the capped feature vocab:
    * p_tgt(f) = (c_tgt+1)/(T+V), p_raw(f) = (c_raw+1)/(R+V), where
    * T/R are the vocab's target/raw occurrence totals and V its size.
    * Each term is a difference of four round(ln(k)*1e6) integers, so
    * the per-doc sum is order-free and engine-exact; out-of-vocab
    * bigrams contribute the smoothing-floor ratio ln((T+V)^-1) -
    * ln((R+V)^-1) (both counts coalesce to 0), which is exactly how a
    * pruned importance model treats unseen features.
    *
    * Scale shape (the [[qPerplexity]] template): the bigram fan-out
    * pipelines inside the scan; the bounded feature table broadcasts
    * and the totals are literals; scoring is a broadcast join + a
    * doc_id re-agg whose map-side partial collapses each doc's
    * bigrams before the exchange — shuffle volume is O(docs), not
    * O(tokens). */
  private[graft] def dsirScore(docs: DataFrame, m: DsirModel): DataFrame = {
    val term =
      (lnX1e6(coalesce(col("c_tgt"), lit(0L)) + lit(1L)) -
        lit(math.round(math.log((m.tTot + m.v).toDouble) * 1e6))) -
        (lnX1e6(coalesce(col("c_raw"), lit(0L)) + lit(1L)) -
          lit(math.round(math.log((m.rTot + m.v).toDouble) * 1e6)))
    bigramRows(docs, "doc_id", "text")
      .join(broadcast(m.content), Seq("prev", "w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_feats"),
        sum(when(col("c_raw").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(term).as("logw_x1e6"))
  }

  /** Whole-pool weights: the model is trained on the same corpus it
    * scores (the paper's batch setting — selection happens before any
    * split exists). */
  private[graft] def dsirWeightFrame(docs: DataFrame): DataFrame =
    dsirScore(docs, dsirTrain(docs))

  /** Build-once memo for the whole-pool weight frame, keyed by corpus
    * dir — the [[graft.operators.Retrieval]] index-memo convention: a
    * selection run scores the pool once and every consumer (weights
    * report, top-K resample, shift audit) reads the same frame.
    * Fingerprint + session guards and deferred reclamation follow
    * [[graft.operators.Graph]]'s edge memo. */
  private val dsirMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, DataFrame)]()

  /** Filesystem fingerprint of the documents table (driver metadata
    * only, the [[graft.operators.Similarity.embFingerprint]]
    * convention): a regenerated corpus forces a re-score. */
  private def dsirWeightsMemo(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.Writers.fileFingerprint(d, "documents.parquet")
    dsirMemo.compute(d, (_, cur) =>
      if (cur != null && cur._1 == fp && (cur._2.sparkSession eq s)) cur
      else
        // stale entry reclaimed DEFERRED (ContextCleaner on GC), never
        // eagerly — the Graph edge-memo race rationale
        (fp, dsirWeightFrame(Tables.documents(s, d)).localCheckpoint(true)))
      ._2
  }

  /** DSIR importance weights per document (plus the per-feature mean,
    * the length-normalized signal real pipelines threshold on). */
  def qDsirWeights(s: SparkSession, d: String): DataFrame =
    dsirWeightsMemo(s, d)
      .withColumn("avg_x1e6",
        // SIGNED truncating shift (the PCA convention): Spark `div`
        // truncates, DuckDB `//` floors — they agree on |x| only
        signum(col("logw_x1e6")).cast(LongType) *
          expr("abs(logw_x1e6) div n_feats"))
      .orderBy(col("doc_id"))

  /** The DSIR selection itself: the top-[[DsirSampleK]] documents by
    * importance weight (weight-desc / doc_id-asc — the deterministic
    * capped top-K convention; the paper's Gumbel perturbation is a
    * tie-breaking refinement on the same primitive). The K-row
    * selection broadcast-joins back to `documents` for the domain
    * columns, so the corpus is never re-shuffled. */
  def qDsirSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val top = dsirWeightsMemo(s, d)
      .orderBy(col("logw_x1e6").desc, col("doc_id"))
      .limit(DsirSampleK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("logw_x1e6").desc, col("doc_id"))).cast(LongType))
    docs.join(broadcast(top), "doc_id")
      .select(col("rnk"), col("doc_id"), col("lang"), col("source"),
        col("n_feats"), col("logw_x1e6"))
      .orderBy(col("rnk"))
  }

  /** The mixture-shift audit: what the resample did to the language
    * mix (pool share vs selected share, per lang). The non-vacuous
    * check that the weights actually pull toward the target domain —
    * `en` must dominate n_sel. Bounded output (|langs| rows); the
    * selection side is the same broadcast K-row frame. */
  def qDsirShift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val selIds = dsirWeightsMemo(s, d)
      .orderBy(col("logw_x1e6").desc, col("doc_id"))
      .limit(DsirSampleK).select(col("doc_id"), lit(1L).as("sel"))
    docs.join(broadcast(selIds), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pool"),
        sum(coalesce(col("sel"), lit(0L))).as("n_sel"))
      .orderBy(col("lang"))
  }

  // --------------------------------------------------------------
  // CCNet perplexity bucketing (head / middle / tail terciles)
  // --------------------------------------------------------------

  /** Per-doc integer perplexity ratio joined with lang — the input to
    * the tercile split. The ratio is the floor of micro-nats per
    * bigram (both operands non-negative, so Spark `div` and DuckDB
    * `//` agree), which quantizes the score to an INTEGER whose value
    * range — not the corpus size — bounds everything downstream. */
  private def pplRatioFrame(s: SparkSession, d: String): DataFrame =
    perplexityFrame(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id")
      .select(col("doc_id"), col("lang"),
        expr("surprisal_x1e6 div n_bigrams").as("ratio_x1e6"))
      // feeds BOTH the histogram-cutoff subtree and the label pass —
      // without the pin the corpus-sized LM scoring runs twice
      .localCheckpoint(false)

  /** Per-lang tercile cutoffs as EXACT order statistics, computed the
    * scale-correct way: never sort the docs — build the per-(lang,
    * ratio) VALUE HISTOGRAM (bounded by the integer ratio range, ~2e7
    * cells worst case, independent of corpus size), run one cumulative
    * window over it per lang, and read off c1 = the k1-th smallest
    * ratio (k1 = ceil(n/3), integer form (n+2) div 3) and c2 = the
    * k2-th (k2 = ceil(2n/3)). Output is |langs| rows. */
  private def pplCutoffs(ratios: DataFrame): DataFrame = {
    val hist = ratios.groupBy(col("lang"), col("ratio_x1e6"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("ratio_x1e6"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"), col("n"))
      .agg(
        min(when(col("cum") >= expr("(n + 2) div 3"), col("ratio_x1e6")))
          .as("c1"),
        min(when(col("cum") >= expr("(2 * n + 2) div 3"), col("ratio_x1e6")))
          .as("c2"))
  }

  /** CCNet-style perplexity bucketing: each document labeled head /
    * middle / tail by its language's tercile cutoffs (head = most
    * fluent third under the train-split LM — CCNet keeps head+middle
    * and drops tail). Buckets are VALUE-defined (ratio <= cutoff), so
    * ties land deterministically and any engine can recompute a
    * document's bucket from the two broadcast cutoffs alone. */
  def qPplBuckets(s: SparkSession, d: String): DataFrame = {
    val ratios = pplRatioFrame(s, d)
    ratios.join(broadcast(pplCutoffs(ratios).drop("n")), "lang")
      .select(col("doc_id"), col("lang"), col("ratio_x1e6"),
        when(col("ratio_x1e6") <= col("c1"), "head")
          .when(col("ratio_x1e6") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** The cutoff report: per lang, the tercile boundaries and the
    * realized bucket populations (ties make them unequal — the
    * value-defined split is the deterministic one). */
  def qPplCutoffs(s: SparkSession, d: String): DataFrame = {
    val ratios = pplRatioFrame(s, d)
    ratios.join(broadcast(pplCutoffs(ratios).drop("n")), "lang")
      .groupBy(col("lang"), col("c1"), col("c2"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("ratio_x1e6") <= col("c1"), 1L).otherwise(0L))
          .as("n_head"),
        sum(when(col("ratio_x1e6") > col("c1") &&
          col("ratio_x1e6") <= col("c2"), 1L).otherwise(0L)).as("n_middle"),
        sum(when(col("ratio_x1e6") > col("c2"), 1L).otherwise(0L))
          .as("n_tail"))
      .select(col("lang"), col("n_docs"), col("c1"), col("c2"),
        col("n_head"), col("n_middle"), col("n_tail"))
      .orderBy(col("lang"))
  }
}
