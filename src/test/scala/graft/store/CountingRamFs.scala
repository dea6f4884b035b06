package graft.store

import java.io.InputStream

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, Seekable}

/**
 * Test-only byte-metered view of the [[RamFileSystem]] namespace, scheme
 * `ctrfs://` — [[RamFileSystem.key]] is scheme-agnostic (authority+path),
 * so `ctrfs://auth/p` reads the very bytes `ramfs://auth/p` wrote while
 * every read is tallied per file. Specs build a domain on `ramfs://` with
 * the normal Spark pipeline, then point the "remote" side of a transfer
 * at the `ctrfs://` alias and assert exactly which files moved how many
 * bytes (the delta-localize "only changed shards move bytes" pin).
 */
class CountingRamFs extends RamFileSystem {
  override def getScheme: String = CountingRamFs.SchemeName

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val inner = super.open(f, bufferSize)
    val u = makeQualified(f).toUri
    val key = Option(u.getAuthority).getOrElse("") + u.getPath
    CountingRamFs.addOpen(key)
    new FSDataInputStream(new CountingRamFs.CountingFilter(inner, key))
  }
}

object CountingRamFs {
  val SchemeName = "ctrfs"

  val ConfEntries: Map[String, String] =
    Map(s"fs.$SchemeName.impl" -> classOf[CountingRamFs].getName)

  def register(conf: org.apache.hadoop.conf.Configuration): Unit =
    ConfEntries.foreach { case (k, v) => if (conf.get(k) == null) conf.set(k, v) }

  /** authority+path → bytes read / open() calls through ctrfs. Global
    * like the ramfs namespace itself; suites isolate by unique authority. */
  private val bytesRead = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val opens = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def add(key: String, n: Long): Unit =
    if (n > 0) bytesRead.merge(key, n, (a, b) => a + b)

  private def addOpen(key: String): Unit = opens.merge(key, 1L, (a, b) => a + b)

  /** Total bytes read from files whose authority+path starts with `prefix`. */
  def bytesUnder(prefix: String): Long = {
    var sum = 0L
    bytesRead.forEach((k, v) => if (k.startsWith(prefix)) sum += v)
    sum
  }

  /** Total open() calls on files whose authority+path starts with `prefix`. */
  def opensUnder(prefix: String): Long = {
    var sum = 0L
    opens.forEach((k, v) => if (k.startsWith(prefix)) sum += v)
    sum
  }

  def reset(authority: String): Unit = {
    bytesRead.keySet.removeIf(_.startsWith(authority + "/"))
    opens.keySet.removeIf(_.startsWith(authority + "/"))
  }

  /** Counting pass-through that stays Seekable + PositionedReadable so
    * FSDataInputStream accepts it; every byte surfaced to the caller is
    * tallied, positioned reads included. */
  private final class CountingFilter(inner: FSDataInputStream, key: String)
      extends InputStream with Seekable with PositionedReadable {

    override def read(): Int = {
      val b = inner.read()
      if (b >= 0) add(key, 1)
      b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = inner.read(b, off, len)
      add(key, n)
      n
    }
    override def skip(n: Long): Long = inner.skip(n)
    override def available(): Int = inner.available()
    override def close(): Unit = inner.close()

    override def seek(pos: Long): Unit = inner.seek(pos)
    override def getPos: Long = inner.getPos
    override def seekToNewSource(targetPos: Long): Boolean = inner.seekToNewSource(targetPos)

    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      val n = inner.read(position, buffer, offset, length)
      add(key, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      inner.readFully(position, buffer, offset, length)
      add(key, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
