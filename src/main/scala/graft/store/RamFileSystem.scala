package graft.store

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException, OutputStream}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * JVM-local in-memory Hadoop FileSystem (`ramfs://`) — the engine's
 * analog of the reference's in-memory test persistence
 * (`MemoryPersistence`/`MemoryCoordinator`,
 * elephantdb-server/src/clj/elephantdb/test/keyval.clj:230-270): unit
 * tests exercise the *entire* real pipeline (version tokens, shard dirs,
 * the Spark parquet writer/committer, footer counts) without touching
 * disk. State is a process-global map, so it only works where driver and
 * executors share a JVM (local[*]) — exactly the test-only scope the
 * reference gives its memory coordinator. Not for production data.
 *
 * Supports what the domain pipeline needs: create/open with seekable
 * reads, rename (file and directory, into-existing-dir semantics),
 * recursive delete, listStatus, mkdirs. Append is unsupported (domain
 * versions are immutable).
 */
class RamFileSystem extends FileSystem {
  import RamFileSystem._

  private var myUri: URI = URI.create(s"$SchemeName:///")
  private var wd: Path = null

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    myUri = URI.create(
      s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
    setConf(conf)
  }

  override def getScheme: String = SchemeName
  override def getUri: URI = myUri
  // Must NOT go through makeQualified: FileSystem.makeQualified reads
  // getWorkingDirectory, so qualifying here would recurse forever.
  override def getWorkingDirectory: Path =
    if (wd != null) wd else new Path(myUri.toString + "/")
  override def setWorkingDirectory(p: Path): Unit = { wd = p }

  /** Canonical store key: authority + absolute path ("mem/a/b"; the
    * namespace root is "mem/"). */
  private def key(p: Path): String = {
    val u = makeQualified(p).toUri
    val path = if (u.getPath.isEmpty) "/" else u.getPath
    Option(u.getAuthority).getOrElse("") + path
  }

  private def isRoot(k: String): Boolean = k.endsWith("/") || !k.contains("/")

  private def childPrefix(k: String): String = if (k.endsWith("/")) k else k + "/"

  private def parentKey(k: String): String = {
    val i = k.lastIndexOf('/')
    if (i <= 0) null else k.substring(0, i)
  }

  /** Record every ancestor dir of `k` (exclusive) up to the root. */
  private def addParents(k: String): Unit = {
    var q = parentKey(k)
    while (q != null && !isRoot(q)) { dirs.add(q); q = parentKey(q) }
  }

  override def getFileStatus(p: Path): FileStatus = Lock.synchronized {
    val k = key(p)
    if (files.containsKey(k))
      // REAL per-write mtime (a strictly monotonic counter, not 0L):
      // VersionedStore.tokenMtime is the same-version-rebuild cache
      // fingerprint (IndexMarker keys its marker verdicts by it), and a
      // constant mtime made that fingerprint inert on exactly the
      // filesystem memory-format domains must use — a ramfs rebuild at
      // the same version id would serve the pre-rebuild cached verdict
      new FileStatus(files.get(k).length.toLong, false, 1, BlockSize,
        mtimes.getOrDefault(k, 0L), makeQualified(p))
    else if (isDir(k))
      new FileStatus(0L, true, 1, BlockSize, 0L, makeQualified(p))
    else throw new FileNotFoundException(s"ramfs: no such path $p")
  }

  private def isDir(k: String): Boolean =
    isRoot(k) || dirs.contains(k) || hasChildren(k)

  /** Directory check that does NOT treat the namespace root specially. */
  private def isDirStrict(k: String): Boolean = dirs.contains(k) || hasChildren(k)

  private def hasChildren(k: String): Boolean = {
    val prefix = childPrefix(k)
    val f = files.ceilingKey(prefix)
    if (f != null && f.startsWith(prefix)) return true
    val d = dirs.ceiling(prefix)
    d != null && d.startsWith(prefix)
  }

  /** Keys sharing `prefix` are CONTIGUOUS in the sorted maps, so every
    * prefix sweep walks the tail only while it still matches — without
    * the break these ops are O(total entries) per call, which a 64k-shard
    * domain turns into minutes of pure scanning (found by the
    * metadata-scale smoke). */
  private def prefixKeys(set: java.util.NavigableSet[String], prefix: String): Iterator[String] =
    new Iterator[String] {
      private val it = set.tailSet(prefix, true).iterator()
      private var nextKey: String = advance()
      private def advance(): String = {
        if (it.hasNext) { val k = it.next(); if (k.startsWith(prefix)) k else null }
        else null
      }
      def hasNext: Boolean = nextKey != null
      def next(): String = { val k = nextKey; nextKey = advance(); k }
    }

  override def listStatus(p: Path): Array[FileStatus] = Lock.synchronized {
    val k = key(p)
    if (files.containsKey(k)) return Array(getFileStatus(p))
    if (!isDir(k)) throw new FileNotFoundException(s"ramfs: no such dir $p")
    val prefix = childPrefix(k)
    val names = scala.collection.mutable.SortedSet[String]()
    def firstSegment(full: String): String = {
      val rest = full.substring(prefix.length)
      val i = rest.indexOf('/')
      if (i < 0) rest else rest.substring(0, i)
    }
    prefixKeys(files.keySet, prefix).foreach(f => names += firstSegment(f))
    prefixKeys(dirs, prefix).foreach(d => names += firstSegment(d))
    names.iterator.map(n => getFileStatus(new Path(makeQualified(p), n))).toArray
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = Lock.synchronized {
    val k = key(p)
    if (files.containsKey(k))
      throw new FileAlreadyExistsException(s"ramfs: $p exists as a file")
    if (!isRoot(k)) { dirs.add(k); addParents(k) }
    true
  }

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream = Lock.synchronized {
    val k = key(f)
    if (isDirStrict(k))
      throw new FileAlreadyExistsException(s"ramfs: $f exists as a directory")
    if (files.containsKey(k) && !overwrite)
      throw new FileAlreadyExistsException(s"ramfs: $f already exists")
    addParents(k)
    val buf = new ByteArrayOutputStream()
    val sink: OutputStream = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = Lock.synchronized {
        files.put(k, buf.toByteArray)
        mtimes.put(k, Tick.incrementAndGet())
      }
    }
    new FSDataOutputStream(sink, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("ramfs: append not supported (versions are immutable)")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = Lock.synchronized {
    val bytes = files.get(key(f))
    if (bytes == null) throw new FileNotFoundException(s"ramfs: no such file $f")
    new FSDataInputStream(new RamInputStream(bytes))
  }

  override def rename(src: Path, dst: Path): Boolean = Lock.synchronized {
    val sk = key(src)
    var dk = key(dst)
    val srcIsFile = files.containsKey(sk)
    if (!srcIsFile && !isDirStrict(sk)) return false
    // Hadoop semantics: renaming onto an existing directory moves src into it.
    if (isDirStrict(dk) || isRoot(dk)) dk = childPrefix(dk).dropRight(1) + "/" + src.getName
    if (files.containsKey(dk) || isDirStrict(dk)) return false
    if (dk == sk) return true
    if (srcIsFile) {
      addParents(dk)
      files.put(dk, files.remove(sk))
      mtimes.put(dk, Tick.incrementAndGet())
      mtimes.remove(sk)
    } else {
      val prefix = childPrefix(sk)
      val fKeys = prefixKeys(files.keySet, prefix).toList
      val dKeys = prefixKeys(dirs, prefix).toList
      fKeys.foreach { k =>
        files.put(dk + k.substring(sk.length), files.remove(k))
        mtimes.put(dk + k.substring(sk.length), Tick.incrementAndGet())
        mtimes.remove(k)
      }
      dKeys.foreach { k => dirs.remove(k); dirs.add(dk + k.substring(sk.length)) }
      dirs.remove(sk)
      dirs.add(dk)
      addParents(dk)
    }
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = Lock.synchronized {
    val k = key(p)
    if (files.containsKey(k)) { files.remove(k); mtimes.remove(k); return true }
    if (!dirs.contains(k) && !hasChildren(k)) return false
    if (hasChildren(k) && !recursive)
      throw new IOException(s"ramfs: $p is a non-empty directory and recursive = false")
    val prefix = childPrefix(k)
    prefixKeys(files.keySet, prefix).toList.foreach { k =>
      files.remove(k); mtimes.remove(k)
    }
    prefixKeys(dirs, prefix).toList.foreach(dirs.remove)
    dirs.remove(k)
    true
  }
}

object RamFileSystem {
  val SchemeName = "ramfs"
  private val BlockSize = 32L * 1024 * 1024

  /** Process-global state: one namespace per JVM, like the reference's
    * global in-memory coordinator. */
  private val files = new java.util.concurrent.ConcurrentSkipListMap[String, Array[Byte]]()
  // per-file write stamp: strictly monotonic, JVM-global — uniqueness is
  // what the mtime fingerprint needs (real clocks only offer granularity)
  private val mtimes = new java.util.concurrent.ConcurrentSkipListMap[String, Long]()
  private val Tick = new java.util.concurrent.atomic.AtomicLong(0L)
  private val dirs = new java.util.concurrent.ConcurrentSkipListSet[String]()
  private object Lock

  /** Hadoop conf entries that make `ramfs://` resolvable. Register on any
    * Configuration that will touch ramfs paths; DomainStore does this
    * automatically, and Spark read/write paths receive them as datasource
    * options (Spark folds options into the per-query Hadoop conf). */
  val ConfEntries: Map[String, String] =
    Map(s"fs.$SchemeName.impl" -> classOf[RamFileSystem].getName)

  def register(conf: Configuration): Unit =
    ConfEntries.foreach { case (k, v) => if (conf.get(k) == null) conf.set(k, v) }

  /** Wipe the whole in-memory namespace (test isolation). */
  def clear(): Unit = Lock.synchronized { files.clear(); dirs.clear(); mtimes.clear() }

  /** Wipe one authority's namespace only — suites running in parallel in
    * one JVM each clear their own authority instead of each other's. */
  def clear(authority: String): Unit = Lock.synchronized {
    val prefix = authority + "/"
    files.keySet.removeIf(k => k.startsWith(prefix))
    dirs.removeIf(k => k.startsWith(prefix))
    mtimes.keySet.removeIf(k => k.startsWith(prefix))
  }
}

/** Seekable, positioned-readable view over an immutable byte array. */
private[store] class RamInputStream(bytes: Array[Byte])
    extends ByteArrayInputStream(bytes)
    with Seekable
    with PositionedReadable {

  override def seek(position: Long): Unit = {
    if (position < 0 || position > bytes.length)
      throw new IOException(s"ramfs: seek $position out of range")
    this.pos = position.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= bytes.length) return -1
    val n = math.min(length, bytes.length - position.toInt)
    System.arraycopy(bytes, position.toInt, buffer, offset, n)
    n
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    if (read(position, buffer, offset, length) < length)
      throw new IOException("ramfs: readFully past end of file")
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
