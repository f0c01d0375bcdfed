package graft

import graft.operators.TextAnalysis

/** BPE merge-candidate counting: pair totals over the word-frequency
  * table must equal a direct per-occurrence count (the frequency-
  * weighting refactor is invisible to the result), verified against
  * an independent driver-side reference on real corpus data. */
class BpePairsSpec extends SparkSpec {

  test("qBpePairs at sf0.001 matches a direct per-occurrence reference") {
    val d = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, d)
      .select("text").collect().map(_.getString(0))
    val counts = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for {
      t <- texts
      w <- t.trim.toLowerCase.split("\\s+") if w.length >= 2
      i <- 0 until w.length - 1
    } counts(w.substring(i, i + 2)) += 1L
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(TextAnalysis.BpeTopK)
    val got = TextAnalysis.qBpePairs(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got $got\nwant $want")
  }
}
