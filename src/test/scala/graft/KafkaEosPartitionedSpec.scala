package graft

import org.apache.spark.sql.functions.col

import graft.streaming.{KafkaEosSink, KafkaWire}
import graft.streaming.KafkaWire.{EmbeddedBroker, WireProducer}

/** Records which THREADS built producers — the distributed-write
  * proof: in local mode every task runs on an "Executor task launch
  * worker" thread, while a driver-side collect+send would build its
  * producer on the test/main thread. Top-level object so the
  * serialized task closure reaches it statically. */
object PartitionedSinkProbe {
  val producerThreads = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def clear(): Unit = producerThreads.clear()
}

/** K1's PRODUCTION write path (round-16, VERDICT r15 #2): the
  * foreachPartition sink with one transactional producer per
  * (checkpoint, partition) — each partition's rows and its own
  * progress marker in one transaction, over the embedded broker's
  * REAL sockets. Proves: no driver collect (producers are built on
  * executor task threads), multi-partition exactly-once, per-partition
  * replay skipping, and the mid-commit-crash retry lifecycle. */
class KafkaEosPartitionedSpec extends SparkSpec {
  import spark.implicits._

  private def withBroker(f: EmbeddedBroker => Unit): Unit = {
    val b = new EmbeddedBroker
    try f(b) finally { KafkaEosSink.clearPool(); b.stop() }
  }

  private def sink(b: EmbeddedBroker, ckpt: String, n: Int) = {
    val port = b.port
    new KafkaEosSink.PartitionedSink("out", "progress", ckpt, n,
      txId => {
        PartitionedSinkProbe.producerThreads.add(Thread.currentThread().getName)
        new WireProducer("127.0.0.1", port, txId)
      },
      txId => KafkaWire.readLastCommitted("127.0.0.1", port, "progress", txId))
  }

  private def rows(n: Int) = (1 to n).map(i => (s"k$i", s"v$i")).toDF("key", "value")

  test("multi-partition batch commits every row exactly once, one marker per partition, off the driver") {
    withBroker { b =>
      PartitionedSinkProbe.clear()
      val s = sink(b, "/ckpt/part-1", 4)
      s.write(rows(40), 0L)
      val out = b.committed("out")
      assert(out.toSet == (1 to 40).map(i => (s"k$i", s"v$i")).toSet &&
        out.size == 40, s"rows lost/duplicated: ${out.size}")
      // one marker per partition writer, all for batch 0 — the
      // all-subtasks-committed visibility condition
      // batch markers only (the sink also persists its partition
      // LAYOUT as a '#np' marker — the restart soundness check)
      val markers = b.committed("progress").filterNot(_._1.endsWith("#np"))
      assert(markers.size == 4 && markers.forall(_._2 == "0"),
        s"wrong per-partition markers: $markers")
      assert(b.committed("progress").count(_._1.endsWith("#np")) == 4 &&
        b.committed("progress").filter(_._1.endsWith("#np")).forall(_._2 == "4"),
        "every partition's txn must carry the numPartitions layout marker")
      assert(markers.map(_._1).toSet ==
        (0 until 4).map(p => KafkaEosSink.transactionalId("/ckpt/part-1", Some(p))).toSet,
        "markers not keyed by per-partition transactional id")
      // the distributed-write proof: every producer was built inside a
      // task, never on the driver thread
      import scala.jdk.CollectionConverters._
      val threads = PartitionedSinkProbe.producerThreads.asScala.toSeq
      assert(threads.nonEmpty && threads.forall(_.contains("Executor task launch worker")),
        s"producer built on a non-executor thread: $threads")
    }
  }

  test("a replayed batch is skipped per partition; empty partitions still mark progress") {
    withBroker { b =>
      val s = sink(b, "/ckpt/part-2", 4)
      s.write(Seq(("a", "1"), ("b", "2")).toDF("key", "value"), 0L) // 2 rows, 4 partitions: some empty
      val after = b.committed("out")
      assert(after.toSet == Set(("a", "1"), ("b", "2")))
      assert(b.committed("progress").filterNot(_._1.endsWith("#np")).size == 4,
        "empty partitions must also commit their marker (replay skip needs it)")
      s.write(Seq(("a", "1"), ("b", "2")).toDF("key", "value"), 0L) // foreachBatch replay
      assert(b.committed("out") == after, "replayed batch re-sent rows")
      // a FRESH sink incarnation (restart) restores markers and still skips
      KafkaEosSink.clearPool()
      val s2 = sink(b, "/ckpt/part-2", 4)
      s2.write(Seq(("a", "1"), ("b", "2")).toDF("key", "value"), 0L)
      assert(b.committed("out") == after, "restarted sink re-sent a committed batch")
      s2.write(Seq(("c", "3")).toDF("key", "value"), 1L)
      assert(b.committed("out").toSet == Set(("a", "1"), ("b", "2"), ("c", "3")),
        "next batch after restart did not commit")
    }
  }

  test("mid-commit crash: one partition's commit fails, the batch retry converges exactly-once") {
    withBroker { b =>
      val s = sink(b, "/ckpt/part-3", 4)
      b.failNextEndTxn = true // exactly ONE partition's EndTxn will fail
      intercept[Exception] { s.write(rows(20), 0L) }
      val mid = b.committed("out")
      assert(mid.size < 20, s"failed partition's rows visible: ${mid.size}")
      assert(mid.toSet.subsetOf((1 to 20).map(i => (s"k$i", s"v$i")).toSet),
        "torn rows visible")
      // foreachBatch retries the same batch id: committed partitions
      // skip via their markers, the failed one re-sends
      s.write(rows(20), 0L)
      val out = b.committed("out")
      assert(out.toSet == (1 to 20).map(i => (s"k$i", s"v$i")).toSet &&
        out.size == 20, s"retry lost/duplicated rows: ${out.size}")
      assert(b.committed("progress").count(_._2 == "0") == 4,
        "not every partition marked batch 0 after the retry")
    }
  }

  test("broker->engine->broker with the DISTRIBUTED sink: wire source, enrich, partitioned EOS write") {
    withBroker { b =>
      val port = b.port
      // the reference DataClean topology end-to-end, with the
      // production write path: kafka-wire DataSourceV2 consumer ->
      // broadcast-dim enrich -> PartitionedSink (per-partition
      // transactions + markers), all over real sockets
      val producer = new WireProducer("127.0.0.1", port, "e2e-part-src")
      producer.initTransactions(); producer.beginTransaction()
      Seq(
        """{"dt":"2018-01-01 10:11:11","countryCode":"US","data":[{"type":"s1","score":0.3,"level":"A"}]}""",
        """{"dt":"2018-01-01 10:11:12","countryCode":"TW","data":[{"type":"s2","score":0.2,"level":"B"}]}""")
        .foreach(l => producer.send("in", null, l))
      producer.commitTransaction(); producer.close()

      val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-part").toString
      val s = new KafkaEosSink.PartitionedSink("out", "progress", ckpt, 2,
        txId => new WireProducer("127.0.0.1", port, txId),
        txId => KafkaWire.readLastCommitted("127.0.0.1", port, "progress", txId))
      val q = graft.streaming.CleanPipeline.transform(
          graft.streaming.CleanPipeline.fromKafkaWire(spark, "127.0.0.1", port, "in"),
          graft.operators.CleanJob.dimTable(spark))
        .select(col("countryCode").as("key"),
          org.apache.spark.sql.functions.concat_ws(
            "|", col("type"), col("area"), col("dt")).as("value"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => s.write(df, id))
        .start()
      try { q.processAllAvailable() } finally q.stop()
      assert(b.committed("out").toSet == Set(
        "US" -> "s1|AREA_US|2018-01-01 10:11:11",
        "TW" -> "s2|AREA_CT|2018-01-01 10:11:12"),
        s"wrong enriched output: ${b.committed("out")}")
      // per-partition markers for the micro-batch that carried data
      assert(b.committed("progress").count(_._2 == "0") == 2,
        s"expected one batch-0 marker per writer partition: ${b.committed("progress")}")
    }
  }

  test("a restart with a DIFFERENT numPartitions fails loudly before any replay") {
    withBroker { b =>
      val s = sink(b, "/ckpt/part-np", 4)
      s.write(rows(16), 0L)
      val committed = b.committed("out")
      // restart with numPartitions 4 -> 2: keys rehash, so a replay
      // would duplicate rows whose new partition has no marker and
      // LOSE rows whose new partition's marker says "committed" —
      // the sink must refuse instead
      KafkaEosSink.clearPool()
      val s2 = sink(b, "/ckpt/part-np", 2)
      val e = intercept[Exception] { s2.write(rows(16), 0L) }
      def rootMsg(t: Throwable): String =
        if (t.getCause == null) String.valueOf(t.getMessage)
        else rootMsg(t.getCause) + String.valueOf(t.getMessage)
      assert(rootMsg(e).contains("numPartitions"),
        s"expected the layout-mismatch refusal, got: ${rootMsg(e)}")
      assert(b.committed("out") == committed,
        "the refused replay must not have sent anything")
    }
  }

  test("a progress topic with batch markers but NO layout marker is refused (pre-marker data)") {
    withBroker { b =>
      // simulate a pre-layout-marker progress log: one committed batch
      // marker in the exact per-partition key scheme, no '#np' record
      val ck = "/ckpt/part-premark"
      val p = new WireProducer("127.0.0.1", b.port, "premark-feed")
      p.initTransactions(); p.beginTransaction()
      p.send("progress", KafkaEosSink.transactionalId(ck, Some(0)), "0")
      p.commitTransaction(); p.close()
      KafkaEosSink.clearPool()
      val s = sink(b, ck, 4)
      val e = intercept[Exception] { s.write(rows(16), 1L) }
      def rootMsg(t: Throwable): String =
        if (t.getCause == null) String.valueOf(t.getMessage)
        else rootMsg(t.getCause) + String.valueOf(t.getMessage)
      assert(rootMsg(e).contains("layout marker"),
        s"expected the pre-marker refusal, got: ${rootMsg(e)}")
      // the refusal probes ALL writer keys (round-19 review): even the
      // partitions with no own marker must refuse — previously they
      // committed rows under the new hashing AND planted the '#np'
      // marker, unblocking the unverifiable partitions on retry
      assert(b.committed("out").isEmpty,
        "no partition may send rows against an unverifiable layout")
      assert(KafkaWire.readLastCommitted("127.0.0.1", b.port, "progress",
        KafkaEosSink.transactionalId(ck, Some(0))) == 0L,
        "the refused partition's marker must not advance")
      // the grown-numPartitions shape specifically: a restart at
      // nParts=8 over 4-partition-era markers must refuse the same way
      KafkaEosSink.clearPool()
      val s8 = sink(b, ck, 8)
      val e8 = intercept[Exception] { s8.write(rows(16), 2L) }
      assert(rootMsg(e8).contains("layout marker"),
        s"grown-layout restore must refuse too, got: ${rootMsg(e8)}")
      assert(b.committed("out").isEmpty)

      // the SHRUNK-layout half-committed corner (round-20, ADVICE r19
      // #2): a pre-marker log whose ONLY committed marker sits at a
      // writer index >= the new nParts — a wider-era first batch that
      // only got through its high partitions before the crash. The
      // [0, nParts) probe saw all -1 and passed as a first-ever run;
      // the superset probe ([0, max(nParts, LayoutProbeCeiling)))
      // must refuse it.
      val ck2 = "/ckpt/part-premark-wide"
      val p2 = new WireProducer("127.0.0.1", b.port, "premark-wide-feed")
      p2.initTransactions(); p2.beginTransaction()
      p2.send("progress", KafkaEosSink.transactionalId(ck2, Some(12)), "0")
      p2.commitTransaction(); p2.close()
      KafkaEosSink.clearPool()
      val s4 = sink(b, ck2, 4)
      val e4 = intercept[Exception] { s4.write(rows(16), 1L) }
      assert(rootMsg(e4).contains("layout marker"),
        s"shrunk-layout half-committed log must refuse, got: ${rootMsg(e4)}")
      assert(b.committed("out").isEmpty,
        "no rows may commit against a wider-era unverifiable layout")
    }
  }

  test("key routing is replay-stable: the same rows land in the same partitions") {
    withBroker { b =>
      val s = sink(b, "/ckpt/part-4", 8)
      s.write(rows(64), 0L)
      val m1 = b.committed("progress").size
      // replay with a DIFFERENT ambient partitioning of the input —
      // the sink's repartition(n, key) must route identically, so the
      // replay is a no-op (any row that switched partitions would
      // either duplicate or vanish)
      s.write(rows(64).repartition(3), 0L)
      assert(b.committed("out").size == 64,
        s"replay under different input partitioning broke routing: ${b.committed("out").size}")
      assert(b.committed("progress").size == m1, "replay re-marked partitions")
    }
  }
}
