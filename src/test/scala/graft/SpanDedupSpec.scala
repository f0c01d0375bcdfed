package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cross-doc span dedup (ExactSubstr at word granularity) against a
  * hand-computable planted corpus: a boilerplate block shared verbatim
  * by three docs, a block repeated WITHIN one doc only (must NOT count
  * — that is qRepetition's signal), and a fully-unique doc. The spec
  * also pins the real-corpus result against an independent Scala
  * recomputation, and the plan against the no-scale-killer contract. */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  // 8-word spans: build texts from single-char words so span windows
  // are easy to count by hand. words(a..z) distinct per doc elsewhere.
  private def words(s: String) = s.split(" ").toSeq

  private val boiler = "b1 b2 b3 b4 b5 b6 b7 b8" // exactly SpanW words

  test("planted corpus: cross-doc spans counted, within-doc repeats excluded") {
    assert(Dedup.SpanW == 8, "spec texts are sized for SpanW=8")
    val docs = Seq(
      // doc 0: boilerplate + unique tail (u1..u8): spans 0..8 of 9;
      // only span at position 0 (the boiler block) is cross-doc
      (0L, s"$boiler u1 u2 u3 u4 u5 u6 u7 u8"),
      // doc 1: different prefix, same boiler block
      (1L, s"v1 v2 $boiler"),
      // doc 2: boiler verbatim, nothing else — 1 span, 1 duplicated
      (2L, boiler),
      // doc 3: an 8-word block repeated twice WITHIN the doc only —
      // 9 spans, all positions, none cross-doc
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8"),
      // doc 4: unique and shorter than SpanW — no spans, absent
      (4L, "x1 x2 x3")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))

    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Dedup.qSpanDedupScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 9L, 1L, 1L), // 9 spans, only the boiler position duplicated
      (1L, 3L, 1L, 1L), // v1..boiler: 3 spans, last one duplicated
      (2L, 1L, 1L, 0L), // 100% duplicated -> dropped
      (3L, 9L, 0L, 1L)  // within-doc repeat is NOT cross-doc dup
    ), s"got ${got.toSeq}")

    val hot = Dedup.qSpanHotspots(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hot.toSeq == Seq((boiler, 3L, 3L)), s"got ${hot.toSeq}")
  }

  test("scrub excises exactly the covered tokens, matches a recomputation") {
    val d = "/root/testdata/sf0.001"
    val raw = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val toksById = raw.toSeq.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
    }.toMap
    val spans = toksById.toSeq.flatMap { case (id, toks) =>
      toks.sliding(Dedup.SpanW).zipWithIndex
        .filter(_._1.size == Dedup.SpanW)
        .map { case (w, i) => (id, i, w.mkString(" ")) }.toSeq
    }
    val docsPerSpan = spans.groupBy(_._3).map { case (sp, occ) =>
      sp -> occ.map(_._1).distinct.size
    }
    val want = toksById.map { case (id, toks) =>
      val covered = spans.filter(s => s._1 == id && docsPerSpan(s._3) >= 2)
        .flatMap(s => s._2 until s._2 + Dedup.SpanW).distinct.toSet
      val cleaned = toks.zipWithIndex.collect {
        case (t, i) if !covered(i) => t
      }.mkString(" ")
      (id, toks.size.toLong, covered.size.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(cleaned.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }.toSeq.sortBy(_._1)
    val got = Dedup.qSpanScrub(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == want, "span-scrub disagrees with recomputation")
  }

  test("real corpus matches an independent Scala recomputation") {
    val d = "/root/testdata/sf0.001"
    val raw = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val spans = raw.toSeq.flatMap { case (id, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      toks.sliding(Dedup.SpanW).filter(_.size == Dedup.SpanW)
        .map(w => id -> w.mkString(" ")).toSeq
    }
    val docsPerSpan = spans.groupBy(_._2).map { case (sp, occ) =>
      sp -> occ.map(_._1).distinct.size
    }
    val want = spans.groupBy(_._1).map { case (id, occ) =>
      val dup = occ.count(o => docsPerSpan(o._2) >= 2).toLong
      (id, occ.size.toLong, dup, if (dup * 2 <= occ.size) 1L else 0L)
    }.toSeq.sortBy(_._1)
    val got = Dedup.qSpanDedupScore(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == want, "span-dedup disagrees with recomputation")
  }

  test("plan: no cartesian, no nested-loop, span text absent from shuffle") {
    val plan = Dedup.qSpanDedupScore(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
