package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 + RRF hybrid retrieval: exact fixed-point BM25 against an
  * independent driver-side scorer, rank semantics, and the RRF fusion
  * arithmetic — including the both-lists sum path with planted
  * overlap (the harness corpus's two lists are naturally disjoint). */
class RetrievalSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("BM25 matches an independent driver-side scorer at sf0.001") {
    val texts = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val toks = texts.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val nDocs = toks.size.toLong
    val tToks = toks.values.map(_.size.toLong).sum
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def lnX(k: Long) = Math.round(Math.log(k.toDouble) * 1e6)
    val want = (0L until Retrieval.NumTextQueries).flatMap { qid =>
      val qterms = toks(qid).take(Retrieval.QueryLen).distinct
      val scores = toks.toSeq.flatMap { case (docId, dts) =>
        val dl = dts.size.toLong
        val s = qterms.map { term =>
          val tf = dts.count(_ == term).toLong
          if (tf == 0) 0L
          else {
            val idf = lnX(2 * nDocs + 2) - lnX(2 * dfm(term) + 1)
            (idf * 22 * tf * tToks) /
              (10 * tToks * tf + 3 * tToks + 9 * dl * nDocs)
          }
        }.sum
        Option.when(s > 0)((docId, s))
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(Retrieval.TopK)
        .zipWithIndex.map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
    }
    val got = Retrieval.qBm25(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.nonEmpty && got.count(_._4 == 1L) == Retrieval.NumTextQueries)
    // note: a query's own source doc is NOT guaranteed top-10 — BM25's
    // length normalization can rank short docs containing the same
    // terms above the (long) source; the exact-equality check above is
    // the real contract
  }

  test("RRF fusion sums both lists on overlap, integer-exact") {
    import spark.implicits._
    val bm = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("qid", "id", "rn")
    val ann = Seq((0L, 11L, 1L), (0L, 13L, 2L))
      .toDF("qid", "id", "rn")
    val got = Retrieval.rrfFuse(bm, ann).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    def fx(r: Long) = 1000000L / (Retrieval.RrfK + r)
    // 11 appears in both (ranks 2 and 1): fused first with the SUM
    assert(got == Seq(
      (11L, fx(2) + fx(1), 2L, 1L),
      (10L, fx(1), 1L, 2L),
      (13L, fx(2), 1L, 3L),
      (12L, fx(3), 1L, 4L)), s"got $got")
  }

  test("hybrid output is well-formed at sf0.001") {
    val got = Retrieval.qHybridSearch(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == Retrieval.NumTextQueries * Retrieval.TopK)
    got.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._5).sorted.toSeq == (1L to Retrieval.TopK), s"ranks $qid")
      val sc = rs.sortBy(_._5).map(_._3)
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b }, s"order $qid")
    }
  }
}
