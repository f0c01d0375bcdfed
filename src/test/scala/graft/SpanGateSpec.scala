package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.SpanGate

/** The span-novelty gate must (a) reject documents that are mostly
  * already-seen verbatim content, (b) admit novel documents AND make
  * their content visible to later batches (index growth), (c) never
  * re-absorb a replayed batch, and (d) produce identical verdicts
  * through the in-memory and disk-backed index forms. */
class SpanGateSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"

  test("rejects mostly-seen content, admits novel docs, short docs bypass") {
    assert(Dedup.SpanW == 8, "spec texts are sized for SpanW=8")
    val corpus = Seq((1L, boiler), (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // 12 boiler words + 1 novel: 6 spans, 5 all-boiler -> reject
      (100L, s"$boiler z1"),
      // novel doc, 2 spans, none seen -> admit
      (101L, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),
      // shorter than a span -> no verdict row (bypass)
      (102L, "s1 s2 s3")
    ).toDF("doc_id", "text")

    val got = SpanGate.novelty(batch, SpanGate.indexSpans(corpus)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq((100L, 6L, 5L, 0L), (101L, 2L, 0L, 1L)),
      s"got ${got.toSeq}")
  }

  test("streaming gate: admitted content is seen by later batches, replay absorbs once") {
    implicit val sq = spark.sqlContext
    val corpus = Seq((1L, boiler)).toDF("doc_id", "text")
    val state = new SpanGate.SpanGateState(corpus)
    val verdicts = scala.collection.mutable.Map[Long, Seq[(Long, Long)]]()
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      verdicts(id) = df.collect().map(r => (r.getLong(0), r.getLong(4))).toSeq

    val novel = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11 n12"
    // batch 0: one novel doc -> admitted
    state.process(Seq((100L, novel)).toDF("doc_id", "text"), 0L, sink)
    assert(verdicts(0L) == Seq((100L, 1L)))
    val afterB0 = state.index.content.count()

    // batch 1: a verbatim copy of the admitted doc -> now rejected
    state.process(Seq((200L, novel)).toDF("doc_id", "text"), 1L, sink)
    assert(verdicts(1L) == Seq((200L, 0L)),
      "copy of an ADMITTED doc must be rejected — index did not grow")

    // replay batch 1 (at-least-once): verdict re-emitted, no re-absorb
    // (the copy was rejected, so nothing was absorbed either way; the
    // replay guard is what keeps the index count stable)
    val before = state.index.content.count()
    state.process(Seq((200L, novel)).toDF("doc_id", "text"), 1L, sink)
    assert(verdicts(1L) == Seq((200L, 0L)))
    assert(state.index.content.count() == before, "replay must not grow the index")
    assert(before == afterB0, "a rejected doc must not grow the index")

    // streaming wrapper end-to-end over MemoryStream
    val input = MemoryStream[(Long, String)]
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = SpanGate.start(
      input.toDF().toDF("doc_id", "text"), corpus,
      Files.createTempDirectory("graft-sgate").toString,
      (df, _) => hits ++= df.collect().map(r => (r.getLong(0), r.getLong(4))))
    input.addData((300L, boiler + " x1"), (301L, "q1 q2 q3 q4 q5 q6 q7 q8 q9"))
    q.processAllAvailable()
    q.stop()
    assert(hits.toSet == Set((300L, 0L), (301L, 1L)), s"got $hits")
  }

  test("disk-backed index: verdicts identical to in-memory, absorb appends novelty only") {
    val d = "/root/testdata/sf0.001"
    val mem = SpanGate.qSpanGate(spark, d).collect().map(_.toSeq)
    val disk = SpanGate.qSpanGateDisk(spark, d).collect().map(_.toSeq)
    assert(mem.toSeq == disk.toSeq, "disk and memory gate verdicts diverged")

    // absorb into the disk table: only hashes the index lacks appended
    val table = graft.streaming.DedupGate.gateTableName("spans", d)
    val before = spark.table(table).count()
    val docs = Tables.documents(spark, d).filter(col("doc_id") % 4 === 0)
    val idx = SpanGate.SpanIndex(spark.table(table), Some(table))
    val after1 = idx.absorb(docs).content.count()
    assert(after1 > before, "absorbing novel docs must grow the index")
    val after2 = idx.absorb(docs).content.count()
    assert(after2 == after1, "re-absorbing the same docs must add nothing")
  }

  test("disk index absorbed via ANOTHER session is seen immediately (no stale listing)") {
    import spark.implicits._
    // the real streaming topology: foreachBatch hands frames bound to
    // a CLONED session, whose table appends do NOT invalidate other
    // sessions' cached file listings — absorb must re-chain to the
    // writing session so the next batch's novelty read (and its own
    // anti-join) see the rows just written
    val table = "graft_test_sgate_xsession"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val corpus = Seq((1L, (1 to 9).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val idx0 = SpanGate.indexSpansDisk(corpus, table)
    val doc2 = Seq((2L, (20 to 29).map(i => s"x$i").mkString(" ")))
    val clone = spark.newSession()
    val doc2clone = {
      import clone.implicits._
      doc2.toDF("doc_id", "text")
    }
    val idx1 = idx0.absorb(doc2clone)
    // the SAME doc again: every span must now be known -> rejected
    val nov = SpanGate.novelty(doc2.toDF("doc_id", "text"), idx1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(nov.toSeq == Seq((2L, 3L, 3L, 0L)),
      s"absorbed spans invisible to the re-chained index: ${nov.toSeq}")
    // and the duplicate-append guard held: another cross-session
    // absorb of the same doc adds nothing
    val n1 = idx1.content.count()
    assert(idx1.absorb(doc2clone).content.count() == n1,
      "stale anti-join re-appended known hashes")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
