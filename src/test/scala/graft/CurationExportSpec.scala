package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Curation, TextAnalysis}

/** The curation pipeline's written ARTIFACT: the shard-partitioned
  * chunk dataset must re-verify against the attrition table's
  * manifest digest FROM THE WRITTEN BYTES ALONE — the reader-side
  * check a training job runs before consuming shards. */
class CurationExportSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("written shards re-verify against the manifest digest") {
    val out = Files.createTempDirectory("graft-shards").toString
    val art = Curation.exportShards(spark, d, out)

    // attrition table's final two rows = the manifest ground truth
    val rows = Curation.qCurationE2e(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6)))
    val (_, _, nPacks, packToks, _) = rows(5) // seq_pack: n_out = packs
    val (_, _, nShards, _, digest) = rows(6) // shard_manifest

    // 1. recompute the manifest FROM THE ARTIFACT: pack stats from
    // the written rows, the md5 fold, the XOR digest — engine-free
    // arithmetic any reader can run
    val packs = art.groupBy(col("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))
    val key = concat_ws(":", col("bucket"), col("pack_id"),
      col("n_chunks"), col("n_tokens"), col("n_docs"))
    val re = packs
      .withColumn("h", conv(substring(md5(key), 1, 15), 16, 10).cast(LongType))
      .agg(count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L)),
        coalesce(expr("bit_xor(h)"), lit(0L)))
      .head()
    assert(re.getLong(0) == nPacks, s"pack count ${re.getLong(0)} != manifest $nPacks")
    assert(re.getLong(1) == packToks, s"token mass ${re.getLong(1)} != manifest $packToks")
    assert(re.getLong(2) == digest, s"digest ${re.getLong(2)} != manifest $digest")

    // 2. the shard partitioning on disk matches the manifest's count
    val shardDirs = art.select(col("shard")).distinct().count()
    assert(shardDirs == nShards, s"shard dirs $shardDirs != manifest $nShards")

    // 3. content sanity: every chunk's text re-tokenizes to exactly
    // its declared token count (the slice arithmetic is load-bearing)
    val bad = art.filter(
      size(split(col("chunk_text"), "\\s+")) =!= col("n_tok")).count()
    assert(bad == 0L, s"$bad chunks whose text disagrees with n_tok")
    assert(art.count() > 0, "artifact is empty")
  }
}
