package graft

import graft.streaming.EsUpsertSink

/** The K2 Elasticsearch bulk-upsert client path, unit-tested against
  * a fake transport: request construction (NDJSON, explicit _id =
  * keyed upsert), chunking, replay idempotence through deterministic
  * ids, and failure propagation (a failed bulk must throw so Spark
  * retries the batch). */
class EsUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  /** Fake ES: applies bulk bodies to an id-keyed store — the
    * semantics an upsert-by-id consumer observes. */
  private final class FakeEs extends EsUpsertSink.BulkTransport {
    val store = scala.collection.mutable.Map[String, String]()
    val bodies = scala.collection.mutable.ArrayBuffer[String]()
    var failNext = false
    def bulk(body: String): Unit = {
      if (failNext) { failNext = false; throw new java.io.IOException("es down") }
      bodies += body
      body.split("\n").grouped(2).foreach { case Array(action, source) =>
        val id = """"_id":"([^"]+)"""".r.findFirstMatchIn(action).get.group(1)
        store(id) = source
      }
    }
  }

  private def batch(rows: (String, String)*) =
    rows.toSeq.toDF("doc_id", "payload")

  test("bulk body is the _bulk NDJSON contract: action line with _index/_id + source line") {
    val body = EsUpsertSink.bulkBody("auditindex",
      Seq("2024-01-01 00:00:00-t1-AREA_US" -> """{"count":3}"""))
    assert(body ==
      "{\"index\":{\"_index\":\"auditindex\",\"_id\":\"2024-01-01 00:00:00-t1-AREA_US\"}}\n" +
      "{\"count\":3}\n", s"unexpected body:\n$body")
  }

  test("deterministic ids make replays idempotent: same docs, no duplicates") {
    val es = new FakeEs
    val sink = new EsUpsertSink.Sink("auditindex", es)
    sink.write(batch("t-a" -> """{"count":1}""", "t-b" -> """{"count":2}"""), 0L)
    assert(es.store.size == 2 && es.store("t-a") == """{"count":1}""")
    // replayed batch (same deterministic ids, maybe updated values):
    // overwrites, never grows the index — the reference's own ES trick
    sink.write(batch("t-a" -> """{"count":5}""", "t-b" -> """{"count":2}"""), 0L)
    assert(es.store.size == 2, s"replay duplicated documents: ${es.store.keys}")
    assert(es.store("t-a") == """{"count":5}""", "replay did not overwrite by id")
  }

  test("chunking bounds each bulk request; all docs still land") {
    val es = new FakeEs
    val sink = new EsUpsertSink.Sink("idx", es, chunk = 10)
    sink.write((1 to 35).map(i => s"id$i" -> s"""{"n":$i}""").toDF("doc_id", "payload"), 0L)
    assert(es.bodies.size == 4, s"expected 4 chunks of <=10, got ${es.bodies.size}")
    assert(es.store.size == 35, "chunking lost documents")
  }

  test("a failed bulk throws (Spark retries the batch); the retry converges by idempotence") {
    val es = new FakeEs
    val sink = new EsUpsertSink.Sink("idx", es)
    es.failNext = true
    intercept[java.io.IOException] { sink.write(batch("a" -> "{}"), 0L) }
    // Spark replays the batch after the failure: same ids, safe
    sink.write(batch("a" -> "{}"), 0L)
    assert(es.store.keySet == Set("a"), s"retry diverged: ${es.store.keys}")
  }

  test("ids and index names with JSON-special characters are escaped in the action line") {
    val body = EsUpsertSink.bulkBody("idx", Seq("""a"b\c""" -> "{}"))
    assert(body.startsWith("""{"index":{"_index":"idx","_id":"a\"b\\c"}}"""),
      s"unescaped action line:\n$body")
  }

  /** Minimal embedded `_bulk` endpoint over a REAL socket (JDK
    * com.sun.net.httpserver) — the round-12 gap: the NDJSON client
    * path had only ever run against an in-process fake seam. This
    * exercises the actual HttpClient request construction, headers,
    * status handling and backoff over TCP. */
  private def withBulkServer[A](failFirst: Int = 0, errorsTrue: Boolean = false)(
      f: (String, scala.collection.concurrent.TrieMap[String, String], () => Int) => A): A = {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val store = scala.collection.concurrent.TrieMap[String, String]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val (code, resp) =
          if (failures.getAndDecrement() > 0) (503, """{"error":"unavailable"}""")
          else if (errorsTrue)
            (200, """{"took":1,"errors":true,"items":[{"index":{"status":429}}]}""")
          else {
            body.split("\n").grouped(2).foreach {
              case Array(action, source) =>
                val id = """"_id":"([^"]+)"""".r.findFirstMatchIn(action).get.group(1)
                store(id) = source
              case _ => ()
            }
            (200, """{"took":1,"errors":false,"items":[]}""")
          }
        val bytes = resp.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", store, () => requests.get())
    finally server.stop(0)
  }

  test("httpTransport round-trips over a real socket, retrying through a 503") {
    withBulkServer(failFirst = 1) { (endpoint, store, requests) =>
      val sink = new EsUpsertSink.Sink("auditindex",
        EsUpsertSink.httpTransport(endpoint))
      sink.write(batch("t-a" -> """{"count":1}""", "t-b" -> """{"count":2}"""), 0L)
      assert(requests() >= 2, "the 503 backoff-retry path was never exercised")
      assert(store.size == 2 && store("t-a") == """{"count":1}""",
        s"docs lost over the wire: ${store.keys}")
      // replayed batch over the same socket: keyed overwrite, no growth
      sink.write(batch("t-a" -> """{"count":9}""", "t-b" -> """{"count":2}"""), 0L)
      assert(store.size == 2 && store("t-a") == """{"count":9}""",
        "replay must overwrite by id, never duplicate")
    }
  }

  test("PartitionedSink posts per-partition bulks straight from executors over the real socket") {
    withBulkServer() { (endpoint, store, requests) =>
      val sink = new EsUpsertSink.PartitionedSink("auditindex",
        () => EsUpsertSink.httpTransport(endpoint), chunk = 10)
      // multi-partition frame: 4 partitions x ~9 docs, chunk 10 —
      // each partition posts its own chunks; the driver never holds
      // the batch (the write path has no collect by construction)
      val df = (1 to 35).map(i => s"id$i" -> s"""{"n":$i}""")
        .toDF("doc_id", "payload").repartition(4)
      sink.write(df, 0L)
      assert(store.size == 35, s"docs lost across partitions: ${store.size}")
      assert(requests() >= 4,
        s"expected at least one _bulk per partition, got ${requests()}")
      // replay: keyed overwrite from every partition, no growth
      sink.write(df, 0L)
      assert(store.size == 35, "replay duplicated documents")
    }
  }

  test("httpTransport surfaces _bulk item failures reported inside a 2xx") {
    withBulkServer(errorsTrue = true) { (endpoint, _, _) =>
      val sink = new EsUpsertSink.Sink("idx", EsUpsertSink.httpTransport(endpoint))
      val e = intercept[java.io.IOException] { sink.write(batch("a" -> "{}"), 0L) }
      assert(e.getMessage.contains("item failures"),
        s"partial failure must throw for Spark's batch retry, got: ${e.getMessage}")
    }
  }
}
