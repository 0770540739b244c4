package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.{Metrics, StatsdMetrics}

/** The StatsD wire backend against a real loopback UDP receiver —
  * verifying the line protocol the reference's clj-statsd emits
  * (metrics/statsd.clj): `<prefix><key>:<value>|<type>|#<tags>` with
  * constant tags merged under per-call tags. */
class StatsdMetricsSpec extends AnyFunSuite {

  private def withReceiver(f: (DatagramSocket, Int) => Unit): Unit = {
    val sock = new DatagramSocket(0, InetAddress.getLoopbackAddress)
    sock.setSoTimeout(5000)
    try f(sock, sock.getLocalPort) finally sock.close()
  }

  private def recv(sock: DatagramSocket): String = {
    val buf = new Array[Byte](1024)
    val p = new DatagramPacket(buf, buf.length)
    sock.receive(p)
    new String(p.getData, p.getOffset, p.getLength, "UTF-8")
  }

  test("gauge/increment/timing emit statsd lines; constant tags merge in") {
    withReceiver { (sock, port) =>
      val sink = new StatsdMetrics("127.0.0.1", port, tags = Map("env" -> "test"))
      sink.gauge("total_enqueued.size", 42.0)
      assert(recv(sock) == "graft.total_enqueued.size:42|g|#env:test")
      sink.increment(Metrics.SuccessCount, 3, Map("queue" -> "q1"))
      assert(recv(sock) == "graft.job.success_count:3|c|#env:test,queue:q1")
      sink.timing(Metrics.ExecutionTime, 17, Map("queue" -> "q1"))
      assert(recv(sock) == "graft.job.execution_time:17|ms|#env:test,queue:q1")
      sink.gauge("ratio", 0.25) // fractional gauges keep plain decimal form
      assert(recv(sock) == "graft.ratio:0.25|g|#env:test")
      sink.close()
    }
  }

  test("per-call tags override constants; sampleRate stamps |@; disabled is silent") {
    withReceiver { (sock, port) =>
      val sink = new StatsdMetrics("127.0.0.1", port, prefix = "goose.",
        sampleRate = 1.0, tags = Map("env" -> "a"))
      sink.increment("x", 1, Map("env" -> "b")) // per-call wins (statsd.clj merge order)
      assert(recv(sock) == "goose.x:1|c|#env:b")
      sink.close()

      // sampleRate 1.0 never stamps |@; a sub-1 rate must
      val sampled = new StatsdMetrics("127.0.0.1", port, sampleRate = 0.5)
      var line = ""
      // 0.5 drops half the sends client-side; retry until one lands
      while (line.isEmpty) {
        sampled.increment("y", 1)
        try line = recv(sock)
        catch { case _: java.net.SocketTimeoutException => }
      }
      assert(line == "graft.y:1|c|@0.5")
      sampled.close()

      val off = new StatsdMetrics("127.0.0.1", port, enabled = false)
      off.gauge("z", 1.0)
      sock.setSoTimeout(250)
      intercept[java.net.SocketTimeoutException](recv(sock))
      off.close()
    }
  }

  test("fire-and-forget holds for unresolvable hosts and non-finite gauges") {
    // unresolvable host: UnresolvedAddressException is NOT an IOException;
    // the sink must swallow it, not fail the caller's task/tick
    val dark = new StatsdMetrics("graft-no-such-host.invalid", 8125)
    dark.gauge("x", 1.0); dark.increment("x", 1); dark.timing("x", 1)
    dark.close()
    withReceiver { (sock, port) =>
      val sink = new StatsdMetrics("127.0.0.1", port)
      sink.gauge("bad", Double.NaN) // dropped, no datagram, no throw
      sink.gauge("bad", Double.PositiveInfinity)
      sink.gauge("good", 1.0)
      assert(recv(sock) == "graft.good:1|g", "non-finite gauges must be dropped")
      sink.close()
    }
  }

  test("sink survives serialization into an executor closure (transient channel)") {
    withReceiver { (sock, port) =>
      val sink = new StatsdMetrics("127.0.0.1", port)
      val bos = new ByteArrayOutputStream()
      new ObjectOutputStream(bos).writeObject(sink)
      val copy = new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[StatsdMetrics]
      copy.increment("deser", 1)
      assert(recv(sock) == "graft.deser:1|c")
      copy.close()
      sink.close()
    }
  }
}
