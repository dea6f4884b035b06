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
 *    the remote exception class and message;
 *  - a CHUNKED multiGet (batch past the frame bounds) that keeps
 *    straddling server-side version swaps throws IllegalStateException
 *    after bounded retries — loud, never a torn cross-version read.
 *  All are Exceptions, so RingClient fails over; all name the host.
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
    // flatten present-null to None, matching KvDomainReader.get's
    // getRecord(key).flatten — multiGet keeps the Some(null) distinction
    // on BOTH transports, get drops it on both
    multiGet(IndexedSeq(key)).head.flatMap(Option(_))

  override def multiGet(keys: Seq[Array[Byte]]): IndexedSeq[Option[Array[Byte]]] = {
    var bytes = 0L
    keys.foreach { k =>
      // a single key past the frame bound is unservable over this
      // transport, period — a clear named error here, not a dropped
      // connection + replica-exhaustion on the server side
      require(k.length <= KvServer.MaxKeyLen,
        s"key of ${k.length} bytes exceeds the protocol bound ${KvServer.MaxKeyLen}")
      bytes += k.length
    }
    // batches past the count/aggregate bounds split into several frames
    // transparently (results re-concatenated in input order) — bulk
    // callers that work in-process keep working over the wire
    if (keys.length > KvServer.MaxBatch || bytes > KvServer.MaxBatchBytes)
      chunkedMultiGet(keys)
    else multiGetFrame(keys)
  }

  /** In-process multiGet answers every key under ONE generation (a
    * version-consistent snapshot); a chunked remote call spans several
    * frames, so a server-side refresh between chunks could silently mix
    * two versions into one result. Every MULTI_GET response carries the
    * server's (before, after) version stamps: an attempt is accepted iff
    * every frame certifies the SAME version (vLo == vHi, shared across
    * frames) — exact, with no false rejection when a swap lands outside
    * the frames. Repeated mid-attempt swaps retry, then fail LOUD
    * (IllegalStateException) rather than ever returning a torn read. (A
    * bare localized subset stamps -1 everywhere — and cannot refresh, so
    * its snapshot cannot move either.) */
  private def chunkedMultiGet(keys: Seq[Array[Byte]]): IndexedSeq[Option[Array[Byte]]] = {
    var attempt = 0
    while (attempt < 3) {
      val framed = chunks(keys).map(multiGetFrameV).toIndexedSeq
      val versions = framed.flatMap { case (vLo, vHi, _) => Seq(vLo, vHi) }.distinct
      if (versions.size == 1) return framed.flatMap(_._3)
      attempt += 1
    }
    throw new IllegalStateException(
      s"chunked multiGet of ${keys.length} keys kept straddling version swaps " +
        s"at $host:$port/$domain — retry when the serving version settles")
  }

  /** Split `keys` into runs each within BOTH protocol bounds. */
  private def chunks(keys: Seq[Array[Byte]]): Iterator[Seq[Array[Byte]]] =
    new Iterator[Seq[Array[Byte]]] {
      private var rest = keys
      def hasNext: Boolean = rest.nonEmpty
      def next(): Seq[Array[Byte]] = {
        var bytes = 0L
        var n = 0
        var full = false
        val it = rest.iterator
        while (!full && it.hasNext && n < KvServer.MaxBatch) {
          val k = it.next()
          // n > 0: a run is never empty, so even a bound-sized key moves
          if (n > 0 && bytes + k.length > KvServer.MaxBatchBytes) full = true
          else { bytes += k.length; n += 1 }
        }
        val (head, tail) = rest.splitAt(n)
        rest = tail
        head
      }
    }

  /** One framed round trip: op byte, domain, op payload via `write`,
    * flush, status check, then `read` the response body — the shared
    * preamble of every protocol op. */
  private def request[A](op: Byte, dom: String = domain)(
      write: DataOutputStream => Unit)(read: DataInputStream => A): A =
    roundTrip { (out, in) =>
      out.writeByte(op)
      out.writeUTF(dom)
      write(out)
      out.flush()
      readStatus(in)
      read(in)
    }

  private def multiGetFrame(keys: Seq[Array[Byte]]): IndexedSeq[Option[Array[Byte]]] =
    multiGetFrameV(keys)._3

  private def multiGetFrameV(
      keys: Seq[Array[Byte]]): (Long, Long, IndexedSeq[Option[Array[Byte]]]) =
    request(KvServer.OpMultiGet) { out =>
      out.writeInt(keys.length)
      keys.foreach { k => out.writeInt(k.length); out.write(k) }
    } { in =>
      val vLo = in.readLong()
      val vHi = in.readLong()
      val records = keys.indices.map { _ =>
        in.readByte() match {
          case 0 => None
          case 1 =>
            val len = in.readInt()
            // bound attacker/desync-supplied lengths BEFORE allocating —
            // the client-side twin of the server's MaxBatchBytes cap
            if (len < 0 || len > KvServer.MaxValueLen)
              throw new RemoteKvReader.ProtocolException(s"value length $len out of range")
            val b = new Array[Byte](len)
            in.readFully(b)
            Some(b)
          case 2 => Some(null)
          case t => throw new RemoteKvReader.ProtocolException(s"record tag $t")
        }
      }
      (vLo, vHi, records)
    }

  /** One RANGE page round trip (see [[ServingReader.rangePage]]): the
    * server caps the page by records AND aggregate bytes; `maxBytes` is
    * accepted for interface compatibility but the transport's own cap
    * ([[KvServer.MaxBatchBytes]]) is what actually bounds the frame. */
  override def rangePage(
      from: Option[Array[Byte]], fromInclusive: Boolean,
      to: Option[Array[Byte]], toInclusive: Boolean,
      maxRecords: Int, maxBytes: Long,
      shards: Option[Set[Int]] = None): RangePage = {
    require(maxRecords > 0 && maxRecords <= KvServer.MaxBatch,
      s"rangePage: maxRecords $maxRecords outside (0, ${KvServer.MaxBatch}]")
    Seq(from, to).flatten.foreach(b => require(b.length <= KvServer.MaxKeyLen,
      s"range bound of ${b.length} bytes exceeds the protocol bound ${KvServer.MaxKeyLen}"))
    shards.foreach(ss => require(ss.nonEmpty && ss.forall(_ >= 0),
      "rangePage: shard filter must be non-empty with non-negative indexes"))
    request(KvServer.OpRange) { out =>
      def writeBound(b: Option[Array[Byte]]): Unit = b match {
        case None => out.writeByte(0)
        case Some(k) => out.writeByte(1); out.writeInt(k.length); out.write(k)
      }
      writeBound(from)
      out.writeBoolean(fromInclusive)
      writeBound(to)
      out.writeBoolean(toInclusive)
      out.writeInt(maxRecords)
      shards match {
        case None => out.writeInt(0)
        case Some(ss) =>
          out.writeInt(ss.size)
          ss.toSeq.sorted.foreach(out.writeInt)
      }
    } { in =>
      val vLo = in.readLong()
      val vHi = in.readLong()
      val n = in.readInt()
      // bound includes the server's duplicate-run drain past the asked
      // page size (MaxRangeResponseRecords, not MaxBatch)
      if (n < 0 || n > KvServer.MaxRangeResponseRecords)
        throw new RemoteKvReader.ProtocolException(s"range page size $n out of range")
      val records = IndexedSeq.fill(n) {
        val kLen = in.readInt()
        if (kLen < 0 || kLen > KvServer.MaxKeyLen)
          throw new RemoteKvReader.ProtocolException(s"range key length $kLen out of range")
        val k = new Array[Byte](kLen)
        in.readFully(k)
        val v = in.readByte() match {
          case 1 =>
            val vLen = in.readInt()
            if (vLen < 0 || vLen > KvServer.MaxValueLen)
              throw new RemoteKvReader.ProtocolException(s"range value length $vLen out of range")
            val b = new Array[Byte](vLen)
            in.readFully(b)
            b
          case 2 => null
          case t => throw new RemoteKvReader.ProtocolException(s"range value tag $t")
        }
        (k, v)
      }
      RangePage(vLo, vHi, records, in.readBoolean())
    }
  }

  /** The whole range as one lazy iterator, paging under the hood — the
    * remote twin of [[KvDomainReader.range]]'s cursor. Every page
    * certifies ONE serving version (vLo == vHi) and all pages must
    * certify the SAME one: a hot-swap landing mid-scan throws
    * IllegalStateException (loud, never a silently-mixed scan — resume
    * by re-running when the roll settles). Page size is records per
    * round trip; the transport's byte cap may shorten pages further. */
  def rangeScan(
      from: Option[Array[Byte]] = None,
      to: Option[Array[Byte]] = None,
      fromInclusive: Boolean = true,
      toInclusive: Boolean = true,
      pageRecords: Int = RemoteKvReader.DefaultRangePage): Iterator[(Array[Byte], Array[Byte])] = {
    // captured under fresh names: inside the anonymous Iterator, `to`
    // would resolve to Iterator's own to(Factory) method
    val (loBound, hiBound) = (from, to)
    new Iterator[(Array[Byte], Array[Byte])] {
      private var page =
        rangePage(loBound, fromInclusive, hiBound, toInclusive, pageRecords, Long.MaxValue)
      private var idx = 0
      private val version = {
        if (page.vLo != page.vHi) throw new IllegalStateException(
          s"range page straddled a version swap at $host:$port/$domain " +
            s"(${page.vLo} -> ${page.vHi}) — retry when the serving version settles")
        page.vLo
      }
      // a WHILE, not an if: the guard must re-check the page it just
      // FETCHED — with an `if`, a non-first empty-but-truncated page
      // (desynced/non-conforming server) would return here, hasNext
      // would read 0 < 0 = false, and the rest of the range would be
      // dropped silently (the exact truncation this guard documents it
      // prevents; the `if` form only protected the first page)
      private def advance(): Unit =
        while (idx >= page.records.size && page.truncated) {
          // an empty-but-truncated page can make no progress (no lastKey
          // to resume from) — a conforming server never sends one, so
          // name the violation instead of surfacing a bare
          // NoSuchElementException from .last on the empty seq
          if (page.records.isEmpty)
            throw new RemoteKvReader.ProtocolException(
              s"$host:$port/$domain returned an empty truncated range page " +
                "— the scan cannot make progress")
          val lastKey = page.records.last._1
          page = rangePage(Some(lastKey), fromInclusive = false,
            hiBound, toInclusive, pageRecords, Long.MaxValue)
          idx = 0
          if (page.vLo != page.vHi || page.vLo != version)
            throw new IllegalStateException(
              s"range scan straddled a version swap at $host:$port/$domain " +
                s"($version -> ${page.vHi}) — re-run when the roll settles")
        }
      def hasNext: Boolean = { advance(); idx < page.records.size }
      def next(): (Array[Byte], Array[Byte]) = {
        // Iterator contract: exhaustion is NoSuchElementException, never
        // an IndexOutOfBounds from the backing seq
        if (!hasNext) throw new NoSuchElementException(
          s"range scan over $host:$port/$domain is exhausted")
        val r = page.records(idx)
        idx += 1
        r
      }
    }
  }

  private def stats(): (Int, Long, Boolean) =
    request(KvServer.OpStats)(_ => ())(in => (in.readInt(), in.readLong(), in.readBoolean()))

  override def refresh(): Boolean =
    request(KvServer.OpRefresh)(_ => ())(_.readBoolean())

  override def count(): Long =
    request(KvServer.OpCount)(_ => ())(_.readLong())

  /** The server's domain census (reference `getDomains`). */
  def domainNames(): Seq[String] =
    request(KvServer.OpDomains, dom = "")(_ => ())(in => Seq.fill(in.readInt())(in.readUTF()))

  private def readStatuses(in: DataInputStream): Seq[ServedDomainStatus] =
    Seq.fill(in.readInt())(ServedDomainStatus(
      in.readUTF(), in.readUTF(), in.readLong(), in.readLong(), in.readBoolean()))

  /** This domain's serving status (reference `getDomainStatus` +
    * `getDomainMetaData`, core.thrift:81,89). Unlike the data ops this
    * answers for domains the host is not yet SERVING — a still-loading
    * or failed domain reports as such instead of erroring. */
  def status(): ServedDomainStatus =
    request(KvServer.OpStatus)(_ => ())(readStatuses(_).head)

  /** The whole host's census with per-domain status (reference
    * `getStatus`, core.thrift:82). */
  def statusAll(): Seq[ServedDomainStatus] =
    request(KvServer.OpStatus, dom = "")(_ => ())(readStatuses)

  /** Every domain on the host serves a published version (reference
    * `isFullyLoaded`, core.thrift:84) — "can I point traffic at this
    * host?". Vacuously true for an empty census, matching the
    * reference's all-of-nothing. */
  override def fullyLoaded: Boolean = statusAll().forall(_.status == "ready")

  /** Host-wide update (reference `updateAll`, core.thrift:86-87): the
    * server sweeps for newly-published domains, then refreshes every
    * served one. Returns (swapped, failed) counts. */
  override def updateAll(): (Int, Int) =
    request(KvServer.OpUpdateAll, dom = "")(_ => ())(in => (in.readInt(), in.readInt()))

  /** The host's monotonic op counters (`<op>.requests`/`.errors`, volume
    * counts, connection lifecycle) — what a scraper polls. */
  def metrics(): Map[String, Long] =
    request(KvServer.OpMetrics, dom = "")(_ => ()) { in =>
      Seq.fill(in.readInt())(in.readUTF() -> in.readLong()).toMap
    }

  /** The reference's `getDomainMetaData` over the wire (META op): spec
    * fields, version pair, and the shard subset the HOST carries with
    * record counts. Shard-list length is bounds-checked against the
    * advertised numShards before allocation (desync guard, like every
    * length this client reads). */
  override def metadata(): DomainMeta =
    request(KvServer.OpMeta)(_ => ()) { in =>
      val numShards = in.readInt()
      val served = in.readLong()
      val latest = in.readLong()
      val format = in.readUTF()
      val scheme = in.readUTF()
      val indexer = in.readUTF()
      val indexType = in.readUTF()
      val n = in.readInt()
      if (numShards < 1 || n < 0 || n > numShards)
        throw new RemoteKvReader.ProtocolException(
          s"meta shard census $n of $numShards out of range")
      DomainMeta(numShards, served, latest, format, scheme, indexer, indexType,
        Seq.fill(n)(DomainMeta.ShardInfo(in.readInt(), in.readLong())))
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
      case s => throw new RemoteKvReader.ProtocolException(s"status $s")
    }

  private def borrow(): RemoteKvReader.Conn = {
    // discard pooled connections idle past the server's reaping horizon
    // (the server times out silent peers — a stale socket would cost the
    // caller one spurious failure + failover before healing)
    var c = pool.poll()
    while (c != null && c.idleNanos > RemoteKvReader.MaxPoolIdleNanos) {
      c.close(); c = pool.poll()
    }
    if (c != null) c else RemoteKvReader.dial(host, port, connectTimeoutMs, readTimeoutMs)
  }

  private def roundTrip[A](f: (DataOutputStream, DataInputStream) => A): A = {
    if (closed.get()) throw new IllegalStateException(
      s"RemoteKvReader $host:$port/$domain is closed")
    val conn = borrow()
    var ok = false
    try {
      val r =
        try f(conn.out, conn.in)
        catch {
          // garbage where a protocol string belongs = wrong service, not
          // an unreachable host — keep the misconfiguration class loud
          case e: java.io.UTFDataFormatException =>
            throw new RemoteKvReader.ProtocolException(s"bad UTF field: ${e.getMessage}")
        }
      ok = true
      r
    } finally {
      if (ok && !closed.get()) {
        conn.touch()
        pool.add(conn)
        // close() may have drained the pool between our check and the
        // add — re-drain so no live socket outlives a closed stub
        if (closed.get()) drainPool()
      } else conn.close()
    }
  }

  private def drainPool(): Unit = {
    var c = pool.poll()
    while (c != null) { c.close(); c = pool.poll() }
  }

  override def close(): Unit = if (closed.compareAndSet(false, true)) drainPool()
}

object RemoteKvReader {

  /** Default records per RANGE round trip: big enough to amortize the
    * frame, small enough that a page of mid-size values stays well under
    * the transport byte cap. */
  val DefaultRangePage: Int = 4096
  /** The peer answered with bytes that are not this protocol — the
    * endpoint is the WRONG SERVICE (or the stream desynced), which is
    * misconfiguration, not an unreachable host: RingClient's
    * construction-time probe treats a plain connect failure as "down,
    * failover's job" but lets this one fail loudly. */
  final class ProtocolException(msg: String)
    extends IOException(s"protocol desync: $msg")

  /** Pooled connections idle longer than this are discarded on borrow —
    * half the server's idle-reap timeout, so a pooled socket is never
    * offered after the server may have timed it out. */
  private[store] val MaxPoolIdleNanos: Long = KvServer.IdleTimeoutMs / 2 * 1000000L

  private[store] final class Conn(sock: Socket) {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    @volatile private var lastUsed: Long = System.nanoTime()
    def touch(): Unit = lastUsed = System.nanoTime()
    def idleNanos: Long = System.nanoTime() - lastUsed
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
