package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.CleanJob
import graft.streaming.{CleanPipeline, KafkaEosSink, KafkaWire}
import graft.streaming.KafkaWire.{EmbeddedBroker, WireProducer}
import graft.sources.KafkaWireOffset

/** S1 as a REAL Spark source: the kafka-wire DataSourceV2 micro-batch
  * stream reading the embedded broker over the socket, composed with
  * the DataClean enrich and the wire exactly-once sink — the full
  * reference topology (`DataClean.java:58-109`: FlinkKafkaConsumer →
  * enrich → FlinkKafkaProducer EXACTLY_ONCE) as
  * broker → engine → broker protocol bytes, including a forced
  * replay. */
class KafkaWireSourceSpec extends SparkSpec {

  private def withBroker(f: EmbeddedBroker => Unit): Unit = {
    val b = new EmbeddedBroker
    try f(b) finally b.stop()
  }

  /** Commit JSON lines to a topic through the wire producer (the
    * test's stand-in for the reference's kafkaProducer.java). */
  private def produce(b: EmbeddedBroker, topic: String, txId: String,
      lines: String*): Unit = {
    val p = new WireProducer("127.0.0.1", b.port, txId)
    try {
      p.initTransactions()
      p.beginTransaction()
      lines.foreach(l => p.send(topic, null, l))
      p.commitTransaction()
    } finally p.close()
  }

  test("offset json round-trips deterministically") {
    val o = KafkaWireOffset(Map(1 -> 5L, 0 -> 12L))
    assert(o.json() == """{"0":12,"1":5}""")
    assert(KafkaWireOffset.parse(o.json()) == o)
    assert(KafkaWireOffset.parse("{}") == KafkaWireOffset(Map.empty))
  }

  test("micro-batches advance by offset; an aborted transaction is invisible") {
    withBroker { b =>
      produce(b, "in", "src-tx", "a", "b", "c")
      // an ABORTED transaction must never reach the engine
      val zombie = new WireProducer("127.0.0.1", b.port, "src-abort")
      zombie.initTransactions(); zombie.beginTransaction()
      zombie.send("in", null, "ghost")
      zombie.abortTransaction(); zombie.close()

      val df = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in").load()
      val q = df.writeStream.format("memory").queryName("kw_read")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kw-ckpt").toString)
        .start()
      try {
        q.processAllAvailable()
        val got1 = spark.table("kw_read")
          .select(col("offset"), col("value")).collect()
          .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        assert(got1.toSeq == Seq((0L, "a"), (1L, "b"), (2L, "c")),
          s"wrong first batch: ${got1.toSeq}")
        // later records arrive in a LATER micro-batch. Offsets are the
        // REAL log positions: the commit marker of src-tx sits at 3,
        // the aborted ghost at 4 and its abort marker at 5 — all
        // occupy offsets a read_committed consumer must step OVER,
        // so d/e land at 6/7 (the broker's real-log model)
        produce(b, "in", "src-tx-2", "d", "e")
        q.processAllAvailable()
        val got2 = spark.table("kw_read")
          .select(col("offset"), col("value")).collect()
          .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        assert(got2.toSeq == Seq((0L, "a"), (1L, "b"), (2L, "c"),
          (6L, "d"), (7L, "e")), s"wrong incremental read: ${got2.toSeq}")
      } finally q.stop()
    }
  }

  test("groupId publishes committed offsets: an external lag monitor reads zero lag") {
    withBroker { b =>
      produce(b, "in", "grp-tx", "a", "b", "c")
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in").option("groupId", "con1")
        .load()
        .writeStream.format("memory").queryName("kw_grp")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kw-grp").toString)
        .start()
      try {
        q.processAllAvailable()
        // the external monitor's read: OffsetFetch for the group vs
        // ListOffsets log-end. Spark's MicroBatchExecution commits a
        // batch's source offsets when the NEXT batch is constructed,
        // so drive a second batch and expect the monitor to converge
        // to zero lag (poll briefly — the commit callback trails the
        // batch by one commit-log write).
        def committed(): Long = KafkaWire.fetchGroupOffsets(
          "127.0.0.1", b.port, "con1", "in", Seq(0)).getOrElse(0, -1L)
        // batch 1 read [0, 4) (a,b,c + the commit marker the LSO sits
        // past); once batch 2 runs, the monitor must see batch 1's end
        // committed — group lag is bounded by the ONE in-flight batch,
        // exactly the semantics of a consumer committing after
        // processing (poll briefly: the callback trails the batch by
        // one commit-log write)
        val batch1End = KafkaWire.listOffset("127.0.0.1", b.port, "in", 0, earliest = false)
        produce(b, "in", "grp-tx-2", "d")
        q.processAllAvailable()
        var waited = 0
        while (committed() != batch1End && waited < 100) { Thread.sleep(50); waited += 1 }
        assert(committed() == batch1End,
          s"lag monitor: committed=${committed()} batch1End=$batch1End")
        // a group that never committed answers -1 (no position), per
        // protocol -- the monitor's "unknown group" case
        assert(KafkaWire.fetchGroupOffsets(
          "127.0.0.1", b.port, "nope", "in", Seq(0)) == Map(0 -> -1L))
      } finally q.stop()
      // progress is CHECKPOINT-owned: wiping the group's commits and
      // restarting from the same checkpoint must not replay anything
      // (the source never OffsetFetches its own position back)
    }
  }

  test("multi-partition topics fan out one input partition each") {
    withBroker { b =>
      val p = new WireProducer("127.0.0.1", b.port, "mp-tx")
      p.initTransactions(); p.beginTransaction()
      p.send("in", null, "p0a") // partition 0 via the normal path
      val (pid, epoch) = p.currentPidEpoch
      // partition 1 via the raw seam (send() pins partition 0)
      p.produceRaw("in", 1, KafkaWire.encodeBatch(pid, epoch, 0,
        transactional = true, Seq((null: String) -> "p1a")))
      p.commitTransaction(); p.close()

      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in").option("partitions", "2")
        .load()
        .writeStream.format("memory").queryName("kw_mp")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kw-mp").toString)
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("kw_mp")
          .select(col("partition"), col("offset"), col("value")).collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
        assert(got == Set((0, 0L, "p0a"), (1, 0L, "p1a")),
          s"wrong multi-partition read: $got")
      } finally q.stop()
    }
  }

  test("startingOffsets=latest skips pre-existing records; new ones flow") {
    withBroker { b =>
      produce(b, "in", "late-tx-0", "old1", "old2")
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in").option("startingOffsets", "latest")
        .load()
        .writeStream.format("memory").queryName("kw_latest")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kw-latest").toString)
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("kw_latest").count() == 0,
          "latest start must not read pre-existing records")
        produce(b, "in", "late-tx-1", "new1")
        q.processAllAvailable()
        val got = spark.table("kw_latest")
          .select(col("offset"), col("value")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        // offset 3: old1@0, old2@1, their commit marker@2
        assert(got == Seq((3L, "new1")), s"wrong post-start read: $got")
      } finally q.stop()
    }
  }

  test("startingOffsets=earliest begins at the retained log-start, not 0, after retention") {
    withBroker { b =>
      produce(b, "in", "ret-tx-0", "gone1", "gone2")
      produce(b, "in", "ret-tx-1", "kept")
      // log: gone1@0 gone2@1 m@2 kept@3 m@4; retention deletes 0-2
      b.truncate("in", 0, 3L)
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in").load()
        .writeStream.format("memory").queryName("kw_ret")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kw-ret").toString)
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("kw_ret")
          .select(col("offset"), col("value")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(got == Seq((3L, "kept")), s"wrong post-retention read: $got")
      } finally q.stop()
    }
  }

  test("retention under a checkpointed offset: fail by default, skip ahead with failOnDataLoss=false") {
    withBroker { b =>
      produce(b, "in", "dl-tx-0", "a") // a@0 m@1
      val ckpt = Files.createTempDirectory("graft-kw-dl").toString
      val seen = scala.collection.mutable.Set[(Long, String)]()
      // foreachBatch, not the memory sink: this test RESTARTS from the
      // checkpoint, which the memory sink does not support
      def start(failOnDataLoss: Boolean) = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in")
        .option("failOnDataLoss", failOnDataLoss.toString)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= df.select(col("offset"), col("value")).collect()
              .map(r => (r.getLong(0), r.getString(1)))
            ()
          })
        .start()
      val q1 = start(failOnDataLoss = true)
      try { q1.processAllAvailable() } finally q1.stop()
      // retention now deletes everything below offset 4, INCLUDING
      // offsets the checkpoint has not consumed yet
      produce(b, "in", "dl-tx-1", "lost") // lost@2 m@3
      produce(b, "in", "dl-tx-2", "new")  // new@4 m@5
      b.truncate("in", 0, 4L)
      // default: the restarted query must FAIL loudly (planned range
      // [2, 6) starts below the retained log-start)
      val q2 = start(failOnDataLoss = true)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      q2.stop()
      assert(e.getMessage.contains("failOnDataLoss") ||
        Option(e.getCause).exists(_.getMessage.contains("failOnDataLoss")),
        s"wrong failure: ${e.getMessage}")
      // opt-in: skip to the earliest retained offset and continue
      val q3 = start(failOnDataLoss = false)
      try {
        q3.processAllAvailable()
        val got = seen.synchronized(seen.toSet)
        assert(got == Set((0L, "a"), (4L, "new")),
          s"skip-ahead read wrong (lost@2 is gone, new@4 survives): $got")
      } finally q3.stop()
    }
  }

  test("maxOffsetsPerTrigger splits the backlog into capped micro-batches") {
    withBroker { b =>
      produce(b, "in", "cap-tx", (1 to 7).map(i => s"r$i"): _*)
      val batches = scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in").option("maxOffsetsPerTrigger", "3")
        .load()
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kw-cap").toString)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized { batches += df.count(); () })
        .start()
      try {
        q.processAllAvailable()
        assert(batches.sum == 7, s"lost/duplicated rows: $batches")
        assert(batches.forall(_ <= 3), s"cap violated: $batches")
        assert(batches.count(_ > 0) >= 3, s"backlog not split: $batches")
      } finally q.stop()
    }
  }

  test("DataReport topology from the wire consumer: windowed agg + keyed upserts") {
    withBroker { b =>
      def l(dt: String, tp: String) =
        s"""{"dt":"$dt","type":"$tp","username":"u","area":"AREA_US"}"""
      produce(b, "auditLog", "rep-tx",
        l("2018-01-01 10:00:01", "shelf"), l("2018-01-01 10:00:05", "shelf"),
        l("2018-01-01 10:00:07", "unshelf"))
      val sink = new graft.streaming.ReportPipeline.KeyedUpsertSink
      val q = graft.streaming.ReportPipeline.startAgg(
        graft.streaming.ReportPipeline.fromKafkaWire(
          spark, "127.0.0.1", b.port, "auditLog"),
        Files.createTempDirectory("graft-kw-rep").toString, sink)
      try {
        q.processAllAvailable()
        // update-mode windows emit on every batch; the 10:00:00 window
        // must hold the keyed counts
        val snap = sink.snapshot
        assert(snap(("2018-01-01 10:00:00", "shelf", "AREA_US"))._1 == 2L,
          s"wrong shelf count: $snap")
        assert(snap(("2018-01-01 10:00:00", "unshelf", "AREA_US"))._1 == 1L,
          s"wrong unshelf count: $snap")
      } finally q.stop()
    }
  }

  test("broker->engine->broker exactly-once: enrich between wire consumer and EOS sink, with replay") {
    withBroker { b =>
      val ckpt = Files.createTempDirectory("graft-kw-eos").toString
      val txId = KafkaEosSink.transactionalId(ckpt)
      def newSink() = new KafkaEosSink.Sink("out", "progress", txId,
        () => new WireProducer("127.0.0.1", b.port, txId),
        () => KafkaWire.readLastCommitted("127.0.0.1", b.port, "progress", txId))

      produce(b, "in", "e2e-tx-1",
        """{"dt":"2018-01-01 10:11:11","countryCode":"US","data":[{"type":"s1","score":0.3,"level":"A"}]}""",
        """{"dt":"2018-01-01 10:11:12","countryCode":"XX","data":[{"type":"s2","score":0.2,"level":"B"}]}""")

      def start(sink: KafkaEosSink.Sink) = CleanPipeline.transform(
          CleanPipeline.fromKafkaWire(spark, "127.0.0.1", b.port, "in"),
          CleanJob.dimTable(spark))
        .select(col("countryCode").as("key"),
          concat_ws("|", col("type"), col("area"), col("dt")).as("value"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.write(df, id))
        .start()

      val sink1 = newSink()
      val q1 = start(sink1)
      q1.processAllAvailable(); q1.stop(); sink1.close()
      val expect1 = Set("US" -> "s1|AREA_US|2018-01-01 10:11:11",
        "XX" -> "s2|other|2018-01-01 10:11:12")
      assert(b.committed("out").toSet == expect1,
        s"wrong committed enrichment: ${b.committed("out")}")

      // restart from the SAME checkpoint with more input: only the new
      // records flow, exactly once, through a FRESH sink incarnation
      produce(b, "in", "e2e-tx-2",
        """{"dt":"2018-01-01 10:11:13","countryCode":"TW","data":[{"type":"s3","score":0.1,"level":"C"}]}""")
      val sink2 = newSink()
      val q2 = start(sink2)
      q2.processAllAvailable(); q2.stop()
      val expect2 = expect1 + ("TW" -> "s3|AREA_CT|2018-01-01 10:11:13")
      assert(b.committed("out").toSet == expect2,
        s"restart duplicated or lost records: ${b.committed("out")}")

      // forced foreachBatch REPLAY (crash after Kafka commit, before
      // Spark's checkpoint commit): a fresh incarnation re-offered the
      // last batch must SKIP it via the progress marker
      val lastBatch = KafkaWire.readLastCommitted(
        "127.0.0.1", b.port, "progress", txId)
      assert(lastBatch >= 0L)
      import spark.implicits._
      val sink3 = newSink()
      sink3.write(Seq(("TW", "s3|AREA_CT|2018-01-01 10:11:13"))
        .toDF("key", "value"), lastBatch)
      sink3.close(); sink2.close()
      assert(b.committed("out").toSet == expect2,
        s"replayed batch re-sent: ${b.committed("out")}")
      assert(b.committed("out").size == 3,
        s"duplicate rows in committed log: ${b.committed("out")}")
    }
  }
}
