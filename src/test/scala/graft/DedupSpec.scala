package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Dedup operator semantics on hand-planted duplicates. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val distinct1 = "completely different words about databases and query engines here now"
  private val corpus = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1),
    (3L, "short text"), (4L, base)).toDF("doc_id", "text")

  test("shingles are distinct word 3-grams; short docs drop out") {
    val sh = TextFunctions.shingles(corpus, "doc_id", "text")
    assert(sh.filter(col("doc_id") === 3).count() == 0)
    // 13 tokens -> 11 shingles, one repeated pair? all distinct here
    assert(sh.filter(col("doc_id") === 0).count() == 11)
  }

  test("minhash signatures and bands have the configured shape") {
    val sh = TextFunctions.shingles(corpus, "doc_id", "text")
    val sig = Dedup.minhashSignatures(sh)
    assert(sig.columns.count(_.startsWith("m")) == Dedup.MinhashK)
    val bands = Dedup.lshBands(sig)
    assert(bands.count() == sig.count() * Dedup.LshBands)
  }

  test("full LSH query equals the exact jaccard query on the harness corpus") {
    val d = "/root/testdata/sf0.001"
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    val exact = norm(Dedup.qNgramJaccard(spark, d))
    val lsh = norm(Dedup.qMinhashLsh(spark, d))
    assert(exact.nonEmpty)
    assert(lsh == exact) // full recall on the planted near-dups
  }

  test("minhash LSH pipeline recalls planted near-dups with exact verification") {
    // run the full LSH path on the tiny corpus via a temp dir layout
    val sh = TextFunctions.shingles(corpus, "doc_id", "text")
    val bandsDf = Dedup.lshBands(Dedup.minhashSignatures(sh))
    val cands = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dup (0,4) must collide in every band; near dup (0,1)/(1,4) in some
    assert(cands.contains((0L, 4L)))
    assert(cands.contains((0L, 1L)))
  }

  test("connected components collapse transitive near-dup chains") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3) + island 5-6; pairwise loser-dropping
    // would never relate 1 and 4 — the component must
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components converge on a 64-hop dup chain") {
    import spark.implicits._
    // a pathological long chain (diameter 64) that a fixed-K unroll
    // under-merges; pointer-jumping must collapse it to ONE cluster
    // within the O(log diameter) round budget. Reversed edge order and
    // a high-id island guard against order luck.
    val chain = (1 to 64).map(i => (i + 1L, i.toLong)).reverse
    val pairs = (chain :+ (900L, 901L)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 65).forall(i => got(i.toLong) == 1L))
    assert(got(900L) == 900L && got(901L) == 900L)
    // the O(log diameter) claim as a pinned NUMBER: pointer-jumping
    // doubles label reach per round, so diameter 64 must converge in
    // <= ceil(log2(64)) + 2 observation/slack rounds — a future edit
    // that silently degrades the jump to plain propagation would need
    // ~64 rounds and fail here (and the bench's cc_rounds telemetry
    // would show real corpora trending up long before maxRounds)
    assert(rounds <= 8, s"64-hop chain took $rounds rounds — jump step broken?")
  }

  test("simhash of identical docs is identical; near-dup within small hamming") {
    val sig = Dedup.simhashSignatures(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(4L))
    val hamming01 = java.lang.Long.bitCount(sig(0L) ^ sig(1L))
    val hamming02 = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
    assert(hamming01 < hamming02)
  }

  test("xxhash64 simhash near-dup (production path) matches brute-force hamming") {
    val d = "/root/testdata/sf0.001"
    val got = Dedup.qSimhashXx(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force ground truth over the full signature set: every
    // hamming<=3 pair must be recalled (pigeonhole over 4x16-bit bands)
    val sigs = Dedup.simhashSignatures(Tables.documents(spark, d))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == want)
  }

  test("sig-level banding matches brute force on skewed/identical signatures") {
    // round-21 internals pin: simhashNearDupFromSigs bands DISTINCT
    // signatures and expands back to doc pairs — exercise exactly the
    // shapes the restructure introduced: an identical-signature group
    // (within-group arm, hamming 0, all C(n,2) pairs), near pairs
    // across DIFFERENT signatures (cross arm incl. least/greatest
    // orientation), far pairs (dropped), and a hot shared band value
    // (ids deliberately unordered so orientation is actually tested)
    import spark.implicits._
    val sigRows = Seq(
      7L -> 0x00000000000000F0L, // identical trio: 7,3,9
      3L -> 0x00000000000000F0L,
      9L -> 0x00000000000000F0L,
      5L -> 0x00000000000000F1L, // hamming 1 from the trio
      1L -> 0x00000000000000FFL, // hamming 4 from trio (dropped), 3 from 5
      8L -> 0x7FFFFFFFFFFFFFFFL) // far from everything
    val sig = sigRows.toDF("doc_id", "simhash")
    val got = graft.operators.Dedup
      .simhashNearDupFromSigs(sig, "simhash", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (a, sa) <- sigRows; (b, sb) <- sigRows if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == want, s"got $got want $want")
    // the identical trio came through the within-group arm: 3 pairs at 0
    assert(got.count(_._3 == 0L) == 3)
    // orientation: every pair is (low, high)
    assert(got.forall { case (a, b, _) => a < b })
  }
}
