package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Iterative BPE merge training: the learned rules must equal an
  * independent driver-side trainer (greedy left-to-right merge, most
  * frequent pair per round, lexicographic tie-break), including the
  * overlap semantics the doubled-separator replace encodes. */
class BpeMergesSpec extends SparkSpec {

  /** Plain-Scala reference BPE trainer over a word-frequency map;
    * also returns the final segmented sequences for the vocab check. */
  private def refBpeFull(words: Map[String, Long], rounds: Int)
      : (Seq[(Long, String, String, String, Long)], Map[Vector[String], Long]) = {
    var seqs: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector }(_._2)(_ + _)
    val rules = (1 to rounds).map { i =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, cnt) <- seqs; j <- 0 until syms.size - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + cnt
      val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      seqs = seqs.groupMapReduce { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2 // greedy left-to-right, non-overlapping
          } else { out += syms(j); j += 1 }
        }
        out.result()
      }(_._2)(_ + _)
      (i.toLong, l, r, l + r, c)
    }
    (rules, seqs)
  }

  private def refBpe(words: Map[String, Long], rounds: Int): Seq[(Long, String, String, String, Long)] =
    refBpeFull(words, rounds)._1

  private def run(texts: Seq[String], rounds: Int = TextAnalysis.BpeMergeRounds) = {
    import spark.implicits._
    val got = TextAnalysis.bpeMerges(texts.toDF("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq.take(rounds)
    val words = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.length >= 2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    (got, refBpe(words, rounds))
  }

  test("overlap semantics: aaaa merges greedily left-to-right") {
    // round 1 on {"aaaa"}: pairs (a,a) x3 -> merge -> [aa, aa];
    // round 2: (aa,aa) -> aaaa. A naive overlapping count or a
    // fixpoint replace would learn different rules.
    val (got, want) = run(Seq("aaaa aaaa aaaa"), rounds = 2)
    assert(got == want, s"got $got\nwant $want")
    assert(got.map(_._4) == Seq("aa", "aaaa"), s"got $got")
  }

  test("adjacent non-overlapping pairs all merge in one round") {
    // "abab": both (a,b) occurrences must merge in round 1 (the
    // consumed-boundary replace), giving (ab,ab) as round 2's pair
    val (got, want) = run(Seq("abab abab"), rounds = 2)
    assert(got == want, s"got $got\nwant $want")
    assert(got.map(_._4) == Seq("ab", "abab"), s"got $got")
  }

  test("ties break lexicographically; counts weight by word frequency") {
    val (got, want) = run(Seq("zy zy zy xw xw xw"), rounds = 1)
    assert(got == want, s"got $got\nwant $want")
    assert(got.head._4 == "xw", s"lexicographic tie-break: $got")
  }

  test("learned vocabulary matches the driver-side segmentation at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, d).select(col("text"))
      .collect().map(_.getString(0)).toSeq
    val words = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.length >= 2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (_, seqs) = refBpeFull(words, TextAnalysis.BpeMergeRounds)
    val want = seqs.toSeq
      .flatMap { case (syms, cnt) => syms.map(_ -> cnt) }
      .groupMapReduce(_._1)(_._2)(_ + _).toSeq
      .sortBy { case (sw, cnt) => (-cnt, sw) }
      .take(TextAnalysis.BpeVocabTopK)
    val got = TextAnalysis.qBpeVocab(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.exists(_._1.length >= 2),
      "the learned vocabulary must contain at least one MERGED unit")
  }

  test("per-doc subword encoding matches the driver-side tokenizer") {
    val d = "/root/testdata/sf0.001"
    val rows = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val words = rows.flatMap(_._2.trim.toLowerCase.split("\\s+"))
      .filter(_.length >= 2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (_, seqs) = refBpeFull(words, TextAnalysis.BpeMergeRounds)
    // symbol concatenation is invariant under merging, so the final
    // vector recovers its word exactly; arity = |vector|
    val arity = seqs.keys.map(v => v.mkString -> v.size.toLong).toMap
    val want = rows.map { case (id, t) =>
      val ws = t.trim.toLowerCase.split("\\s+").toSeq
      (id, ws.size.toLong, ws.map(w => arity.getOrElse(w, 1L)).sum)
    }.sortBy(_._1)
    val got = TextAnalysis.qBpeEncode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.exists(r => r._3 < r._2 * 6),
      "merges must compress at least some docs below the char count")
  }

  test("merge rewriting is LOSSLESS: every rewritten symbol string decodes back to its word") {
    val d = "/root/testdata/sf0.001"
    val bad = TextAnalysis.bpeTrain(Tables.documents(spark, d))._2
      .select(col("w"),
        regexp_replace(col("seq"), "\\u001f", "").as("decoded"))
      .filter(col("w") =!= col("decoded"))
    assert(bad.count() == 0,
      s"round-trip broke for: ${bad.take(3).mkString(", ")}")
  }

  test("sf0.001 corpus matches the driver-side trainer for all rounds") {
    val d = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, d).select(col("text"))
      .collect().map(_.getString(0)).toSeq
    val (got, want) = run(texts)
    assert(got == want, s"got $got\nwant $want")
    assert(got.size == TextAnalysis.BpeMergeRounds)
  }
}
