package graft.store

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

/**
 * Client stub for one domain on one [[KvServer]] — a [[ServingReader]]
 * whose every call is one framed request/response round trip, so a
 * [[RingClient]] built over these stubs serves cross-process with the
 * SAME routing, prioritization, failover, and wrong-host semantics the
 * in-process suite pins (the reference's Thrift client seam,
 * `elephantdb/client.clj` — its `try-direct-multi-get` falls over on
 * transport errors exactly as RingClient does on thrown failures here).
 *
 * Failure surface, by design:
 *  - transport problems (connect refused, connection reset, protocol
 *    desync) throw IOException — the server is unreachable/unusable;
 *  - execution failures on the serving side (wrong-host probe, unknown
 *    domain, closed reader) throw [[RemoteServingException]] carrying
 *    the remote exception class and message.
 *  Both are Exceptions, so RingClient fails over; both name the host.
 *
 * Connections: a small free-pool of persistent sockets (borrow → one
 * round trip → return). Any failure discards the borrowed connection —
 * the next call dials fresh, so a bounced server heals without client
 * restarts. Thread-safe; concurrent calls use distinct connections.
 *
 * `numShards` is fetched once and cached (immutable for a domain);
 * `servedVersion`/`canRefresh` are live STATS round trips (they change
 * under server-side refresh).
 */
final class RemoteKvReader(
    val host: String,
    port: Int,
    val domain: String,
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 60000) extends ServingReader {

  private val pool = new ConcurrentLinkedQueue[RemoteKvReader.Conn]()
  private val closed = new AtomicBoolean(false)

  override lazy val numShards: Int = stats()._1
  override def servedVersion: Long = stats()._2
  override def canRefresh: Boolean = stats()._3

  override def get(key: Array[Byte]): Option[Array[Byte]] =
    multiGet(IndexedSeq(key)).head

  override def multiGet(keys: Seq[Array[Byte]]): IndexedSeq[Option[Array[Byte]]] = {
    require(keys.length <= KvServer.MaxBatch, s"batch of ${keys.length} exceeds protocol bound")
    roundTrip { (out, in) =>
      out.writeByte(KvServer.OpMultiGet)
      out.writeUTF(domain)
      out.writeInt(keys.length)
      keys.foreach { k => out.writeInt(k.length); out.write(k) }
      out.flush()
      readStatus(in)
      keys.indices.map { _ =>
        in.readByte() match {
          case 0 => None
          case 1 =>
            val len = in.readInt()
            if (len < 0) throw new IOException(s"protocol desync: value length $len")
            val b = new Array[Byte](len)
            in.readFully(b)
            Some(b)
          case 2 => Some(null)
          case t => throw new IOException(s"protocol desync: record tag $t")
        }
      }
    }
  }

  private def stats(): (Int, Long, Boolean) =
    roundTrip { (out, in) =>
      out.writeByte(KvServer.OpStats)
      out.writeUTF(domain)
      out.flush()
      readStatus(in)
      (in.readInt(), in.readLong(), in.readBoolean())
    }

  override def refresh(): Boolean =
    roundTrip { (out, in) =>
      out.writeByte(KvServer.OpRefresh)
      out.writeUTF(domain)
      out.flush()
      readStatus(in)
      in.readBoolean()
    }

  override def count(): Long =
    roundTrip { (out, in) =>
      out.writeByte(KvServer.OpCount)
      out.writeUTF(domain)
      out.flush()
      readStatus(in)
      in.readLong()
    }

  /** The server's domain census (reference `getDomains`). */
  def domainNames(): Seq[String] =
    roundTrip { (out, in) =>
      out.writeByte(KvServer.OpDomains)
      out.writeUTF("")
      out.flush()
      readStatus(in)
      Seq.fill(in.readInt())(in.readUTF())
    }

  /** status 0 falls through; status 1 rethrows the remote failure. The
    * connection stays frame-aligned either way (the server drains the
    * request before executing), so the caller's borrow is returnable
    * after a RemoteServingException — but roundTrip still discards it:
    * correctness over a saved dial, and failover abandons the host
    * anyway. */
  private def readStatus(in: DataInputStream): Unit =
    in.readByte() match {
      case 0 => ()
      case 1 => throw new RemoteServingException(s"$host:$port", in.readUTF(), in.readUTF())
      case s => throw new IOException(s"protocol desync: status $s")
    }

  private def roundTrip[A](f: (DataOutputStream, DataInputStream) => A): A = {
    if (closed.get()) throw new IllegalStateException(
      s"RemoteKvReader $host:$port/$domain is closed")
    val conn = Option(pool.poll()).getOrElse(RemoteKvReader.dial(host, port, connectTimeoutMs, readTimeoutMs))
    var ok = false
    try {
      val r = f(conn.out, conn.in)
      ok = true
      r
    } finally {
      if (ok && !closed.get()) pool.add(conn) else conn.close()
    }
  }

  override def close(): Unit = if (closed.compareAndSet(false, true)) {
    var c = pool.poll()
    while (c != null) { c.close(); c = pool.poll() }
  }
}

object RemoteKvReader {
  private[store] final class Conn(sock: Socket) {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    def close(): Unit = try sock.close() catch { case _: IOException => () }
  }

  private def dial(host: String, port: Int, connectTimeoutMs: Int, readTimeoutMs: Int): Conn = {
    val s = new Socket()
    try {
      s.setTcpNoDelay(true)
      s.setSoTimeout(readTimeoutMs)
      s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      new Conn(s)
    } catch {
      case e: IOException =>
        try s.close() catch { case _: IOException => () }
        throw e
    }
  }
}
