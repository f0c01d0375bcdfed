package graft

/** Consumer-group lag monitor over the wire client — the external
  * observer the kafka-wire source's `groupId` option exists for
  * (docs/CONNECTORS.md, consumer-group section): per partition, the
  * broker's log-end offset (ListOffsets −1) minus the group's
  * committed offset (OffsetFetch), i.e. exactly what
  * `kafka-consumer-groups.sh --describe` prints. A group that never
  * committed shows `-` (no position yet, per protocol's −1).
  *
  * One JSON line per call (machine-readable, the Bench stdout
  * discipline), plus a human table on stderr.
  *
  * Usage: runMain graft.LagMonitor <host> <port> <group> <topic> [nPartitions] */
object LagMonitor {

  /** (partition, logEnd, committed, lag) per partition; committed/lag
    * are −1 for a group with no position. Separated from main so the
    * spec drives the computation directly. */
  def lagRows(host: String, port: Int, group: String, topic: String,
      nParts: Int): Seq[(Int, Long, Long, Long)] = {
    val parts = 0 until nParts
    val committed = graft.streaming.KafkaWire
      .fetchGroupOffsets(host, port, group, topic, parts)
    parts.map { p =>
      val end = graft.streaming.KafkaWire.listOffset(host, port, topic, p, earliest = false)
      val c = committed.getOrElse(p, -1L)
      (p, end, c, if (c < 0) -1L else math.max(0L, end - c))
    }
  }

  def main(args: Array[String]): Unit = {
    val host = args(0)
    val port = args(1).toInt
    val group = args(2)
    val topic = args(3)
    val nParts = args.lift(4).map(_.toInt).getOrElse(1)
    val rows = lagRows(host, port, group, topic, nParts)
    rows.foreach { case (p, end, c, lag) =>
      System.err.println(
        f"$topic-$p%-3d log-end=$end%-10d committed=${if (c < 0) "-" else c.toString}%-10s lag=${if (lag < 0) "-" else lag.toString}")
    }
    val total = rows.map(_._4).filter(_ >= 0).sum
    val unknown = rows.count(_._3 < 0)
    println(s"""{"group":"$group","topic":"$topic","partitions":${rows.size},""" +
      s""""total_lag":$total,"partitions_without_position":$unknown,""" +
      rows.map { case (p, end, c, lag) =>
        s""""$p":{"log_end":$end,"committed":$c,"lag":$lag}"""
      }.mkString(""""per_partition":{""", ",", "}}"))
  }
}
