package graft

import org.apache.spark.sql.functions._

import graft.operators.CleanJob
import graft.streaming.RedisDimSource

/** The S2 Redis polling dim client over a REAL socket: an embedded
  * RESP server stands in for Redis, so the protocol encode/decode,
  * the reference's CSV inversion and empty-hash/reconnect fault
  * semantics, and the drop-in equivalence with the fixture dim table
  * are all exercised over TCP — only a live Redis instance remains
  * environment-blocked. */
class RedisDimSourceSpec extends SparkSpec {

  /** Embedded RESP2 server: serves HGETALL from a mutable hash, PING,
    * and can drop the next connection mid-command (connection-loss
    * injection — the JedisConnectionException path). */
  private final class FakeRedis(initial: Map[String, String]) extends AutoCloseable {
    @volatile var hash: Map[String, String] = initial
    @volatile var dropNext = false
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        new Thread(() => handle(s)).start()
      } catch { case _: Throwable => () }
    }, "fake-redis-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(s: java.net.Socket): Unit =
      try {
        val in = new java.io.BufferedInputStream(s.getInputStream)
        val out = new java.io.BufferedOutputStream(s.getOutputStream)
        def line(): String = {
          val sb = new StringBuilder
          var c = in.read()
          while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
          if (c < 0) throw new java.io.EOFException
          in.read() // \n
          sb.toString
        }
        while (true) {
          val n = line().tail.toInt // *<n>
          val args = (1 to n).map { _ =>
            val len = line().tail.toInt // $<len>
            val buf = new Array[Byte](len)
            var off = 0
            while (off < len) {
              val r = in.read(buf, off, len - off)
              if (r < 0) throw new java.io.EOFException
              off += r
            }
            in.read(); in.read() // \r\n
            new String(buf, "UTF-8")
          }
          if (dropNext) { dropNext = false; s.close(); return }
          val reply = args.head.toUpperCase match {
            case "HGETALL" =>
              polls.incrementAndGet()
              val h = hash
              s"*${h.size * 2}\r\n" + h.toSeq.sortBy(_._1).map { case (k, v) =>
                s"$$${k.getBytes("UTF-8").length}\r\n$k\r\n" +
                  s"$$${v.getBytes("UTF-8").length}\r\n$v\r\n"
              }.mkString
            case "PING" => "+PONG\r\n"
            case other => s"-ERR unknown command '$other'\r\n"
          }
          out.write(reply.getBytes("UTF-8"))
          out.flush()
        }
      } catch { case _: Throwable => try s.close() catch { case _: Throwable => () } }

    def close(): Unit = server.close()
  }

  private val fixture = CleanJob.areasFixture.toMap

  test("inversion matches the reference loop over the areas fixture") {
    assert(RedisDimSource.invert(fixture) == Map(
      "US" -> "AREA_US", "TW" -> "AREA_CT", "HK" -> "AREA_CT",
      "PK" -> "AREA_AR", "KW" -> "AREA_AR", "SA" -> "AREA_AR",
      "IN" -> "AREA_IN"))
  }

  test("poller refreshes over a real socket and picks up hash changes") {
    val redis = new FakeRedis(Map("AREA_US" -> "US"))
    try {
      val p = new RedisDimSource.Poller(
        () => new RedisDimSource.RespClient("127.0.0.1", redis.port))
      assert(p.pollOnce() && p.snapshot == Map("US" -> "AREA_US"))
      redis.hash = fixture // dim updated in "redis"
      assert(p.pollOnce() && p.snapshot("HK") == "AREA_CT",
        "the next poll must serve the updated mapping")
      p.close()
    } finally redis.close()
  }

  test("an empty hash keeps the last good snapshot (reference warn path)") {
    val redis = new FakeRedis(fixture)
    try {
      val p = new RedisDimSource.Poller(
        () => new RedisDimSource.RespClient("127.0.0.1", redis.port))
      assert(p.pollOnce())
      redis.hash = Map.empty
      assert(!p.pollOnce(), "an empty hash must not count as a refresh")
      assert(p.snapshot.size == 7,
        "the enrich join must keep serving the previous dim, not 'other' everything")
      p.close()
    } finally redis.close()
  }

  test("a dropped connection reconnects on the next poll (JedisConnectionException path)") {
    val redis = new FakeRedis(fixture)
    try {
      val p = new RedisDimSource.Poller(
        () => new RedisDimSource.RespClient("127.0.0.1", redis.port))
      assert(p.pollOnce())
      redis.dropNext = true
      assert(!p.pollOnce(), "the dropped-connection poll reports no refresh")
      assert(p.pollOnce(), "the NEXT poll must reconnect and succeed")
      p.close()
    } finally redis.close()
  }

  test("the polled dim drops into the enrich join identically to the fixture table") {
    val redis = new FakeRedis(fixture)
    try {
      val p = new RedisDimSource.Poller(
        () => new RedisDimSource.RespClient("127.0.0.1", redis.port))
      assert(p.pollOnce())
      val lines = CleanJob.eventsAsCleanInput(
        Tables.events(spark, "/root/testdata/sf0.001").limit(200))
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(col("dt"), col("countryCode"), col("type"), col("score"))
          .collect().toSeq
      val viaSocket = sorted(CleanJob.enrich(lines,
        RedisDimSource.dimFrame(spark, p.snapshot)))
      val viaTable = sorted(CleanJob.enrich(lines, CleanJob.dimTable(spark)))
      assert(viaSocket == viaTable,
        "socket-polled dim and fixture dim must enrich identically")
      assert(viaSocket.nonEmpty)
      p.close()
    } finally redis.close()
  }
}
