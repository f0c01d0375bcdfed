package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.BloomFunctions._
import graft.operators.TextAnalysis

/** The bloom-prefiltered decontamination path: the prefilter must be
  * INVISIBLE in the result (false positives die in the exact verify
  * join) while actually pruning the train-side scan, and the
  * build/probe hash contract (xxhash64 long on both sides) must hold. */
class BloomDecontamSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("bloom path result equals the exact (bloom-free) scrub list") {
    val got = TextAnalysis.qBloomDecontam(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = TextAnalysis.qContamination(spark, d)
      .filter(col("n_hit") > 0)
      .select(col("doc_id"), col("split"), col("n_hit"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(want.nonEmpty, "corpus has no contamination — vacuous test")
    assert(got == want, "bloom prefilter changed the decontamination result")
  }

  test("bloom build/probe contract: members always hit, strangers mostly miss") {
    import spark.implicits._
    val members = (0L until 5000L).map(i => s"member-$i").toDF("v")
    val bloom = members
      .agg(bloom_agg(xxhash64(col("v")), 5000L,
        5000L * TextAnalysis.ContamBloomBitsPerItem))
      .head().getAs[Array[Byte]](0)
    // zero false negatives — the bloom guarantee the verify join relies on
    val misses = members
      .filter(!bloom_might_contain(bloom, xxhash64(col("v")))).count()
    assert(misses == 0L, "bloom filter dropped a member (false negative)")
    // strangers: at 20 bits/item the fpp is ~1e-4, so 20k probes
    // should see ~2 false positives; 100 is a >5-sigma failure bound
    val strangers = (0L until 20000L).map(i => s"stranger-$i").toDF("v")
    val fp = strangers
      .filter(bloom_might_contain(bloom, xxhash64(col("v")))).count()
    assert(fp < 100L, s"false-positive rate implausibly high: $fp / 20000")
  }
}
