package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Typo-pair mining: the deletion-neighborhood blocking must be
  * COMPLETE — the blocked join's result must equal the naive
  * all-pairs edit-distance-1 scan, which is exactly the claim that
  * lets the operator skip |vocab|² levenshtein calls at scale. */
class TypoPairsSpec extends SparkSpec {

  /** Plain DP levenshtein, independent of both engines. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked join equals the naive all-pairs distance-1 scan at sf0.001") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // The real sf0.001 corpus alone yields ZERO distance-1 pairs, so a
    // match there would prove completeness vacuously; a planted typo
    // doc makes the equality claim falsifiable while the naive side
    // still ranges over the REAL corpus vocabulary.
    val docs = Tables.documents(spark, d).select(col("text")).unionByName(
      Seq("scann the tabel for the quary").toDF("text")) // scan/table/query typos
    val vocab = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= TextAnalysis.TypoMinLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val want = (for {
      ((w1, c1), i) <- vocab.zipWithIndex
      (w2, c2) <- vocab.drop(i + 1)
      if lev(w1, w2) == 1
    } yield (w1, w2, c1, c2)).toSeq
    val got = TextAnalysis.typoPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got ${got.size} pairs, want ${want.size}:\n" +
      s"missing ${want.toSet -- got.toSet}\nextra ${got.toSet -- want.toSet}")
    assert(got.nonEmpty,
      "the planted morel/<corpus word> pair must surface — an empty " +
        "result would make the completeness claim vacuous")
  }

  test("fuzzy linker equals the naive cross scan at sf0.001") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // Plant one catalog term at edit distance 1-2 from corpus words so
    // the dist >= 1 assertion below cannot be satisfied by dist-0
    // self-matches alone.
    val catalog = Tables.part(spark, d).select(col("p_name")).unionByName(
      Seq("quary").toDF("p_name")) // dist 1 from corpus "query"
    val docsDf = Tables.documents(spark, d).select(col("text"))
    def vocab(df: org.apache.spark.sql.DataFrame, c: String) = df
      .select(explode(split(trim(lower(col(c))), "\\s+")).as("w"))
      .filter(length(col("w")) >= TextAnalysis.TypoMinLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val dv = vocab(docsDf, "text")
    val pv = vocab(catalog, "p_name").map(_._1).distinct
    val want = (for {
      pw <- pv; (dw, cnt) <- dv
      dist = lev(pw, dw) if dist <= TextAnalysis.FuzzyMaxEdit
    } yield (pw, dw, dist.toLong, cnt)).sortBy(t => (t._1, t._2))
    val got = TextAnalysis.fuzzyLink(docsDf, catalog).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty, "catalog and corpus share at least one word")
    assert(got.exists(_._3 >= 1L),
      "at least one genuine fuzzy (dist >= 1) link must surface — " +
        "dist-0 self-matches alone would validate nothing")
  }

  test("substitution, insertion, and deletion neighbors are all found") {
    import spark.implicits._
    val docs = Seq(
      (1L, "model model model modal"), // substitution: model/modal
      (2L, "train traain"),            // insertion:    train/traain
      (3L, "weight weigh wholly"))     // deletion:     weight/weigh
      .toDF("doc_id", "text")
    val got = TextAnalysis.typoPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("modal", "model", 1L, 3L),   // substitution, counts carried
      ("traain", "train", 1L, 1L),  // insertion
      ("weigh", "weight", 1L, 1L)), // deletion
      s"got $got")
  }
}
