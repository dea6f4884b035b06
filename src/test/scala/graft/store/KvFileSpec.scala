package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The servable kv file format on its own — NO SparkSession anywhere:
  * everything here is what a non-Spark serving process would run. */
class KvFileSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def scratchFile(name: String): Path = {
    val p = new Path(s"/root/repo/target/test-scratch/kvfile/$name")
    p.getFileSystem(conf).delete(p, false)
    p
  }

  private def writeFile(p: Path, rows: Seq[(Array[Byte], Array[Byte])]): Long = {
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p.getParent)
    val out = new java.io.DataOutputStream(fs.create(p, true))
    try KvFile.write(out, rows.iterator) finally out.close()
  }

  private def byUnsigned(rows: Seq[(Array[Byte], Array[Byte])]): Seq[(Array[Byte], Array[Byte])] =
    rows.sortWith((a, b) => java.util.Arrays.compareUnsigned(a._1, b._1) < 0)

  test("corrupt files fail loud and NAME the file: truncation, foreign bytes, mangled trailer") {
    val fs = scratchFile("x").getFileSystem(conf)
    def expectNamed(p: Path): Unit = {
      val e = intercept[IllegalArgumentException](KvFile.open(fs, p))
      assert(e.getMessage.contains(p.getName), e.getMessage)
    }
    // a valid file truncated mid-index: trailer arithmetic no longer adds up
    val good = scratchFile("good.kv")
    writeFile(good, Seq("a".getBytes -> "1".getBytes, "b".getBytes -> "2".getBytes))
    val len = fs.getFileStatus(good).getLen
    val truncated = scratchFile("truncated.kv")
    val in = fs.open(good)
    val bytes = new Array[Byte]((len - 5).toInt)
    in.readFully(0, bytes); in.close()
    val out = fs.create(truncated, true); out.write(bytes); out.close()
    expectNamed(truncated)
    // a foreign file of plausible size: bad magic
    val foreign = scratchFile("foreign.kv")
    val fo = fs.create(foreign, true)
    fo.write(Array.fill[Byte](64)(0x41)); fo.close()
    expectNamed(foreign)
    // too short to even hold a trailer
    val tiny = scratchFile("tiny.kv")
    val to = fs.create(tiny, true); to.write(Array[Byte](1, 2, 3)); to.close()
    expectNamed(tiny)
    // the intact file still opens fine afterwards
    val r = KvFile.open(fs, good)
    try assert(r.count === 2L) finally r.close()
  }

  test("span CRCs: a flipped value byte is NAMED with file + offset; clean and legacy files audit clean") {
    val fs = scratchFile("x").getFileSystem(conf)
    // > 2 spans of data (64 KB values), so the audit must name the RIGHT span
    val rows = byUnsigned((0 until 40).map { i =>
      (f"crc$i%04d".getBytes, Array.fill[Byte](64 << 10)((i % 120).toByte))
    })
    val clean = scratchFile("crc-clean.kv")
    writeFile(clean, rows)
    val r0 = KvFile.open(fs, clean)
    val cleanFindings = try r0.verifyIntegrity().toSeq finally r0.close()
    assert(cleanFindings.isEmpty, cleanFindings.mkString("; "))

    // flip one value byte deep in the data region
    val len = fs.getFileStatus(clean).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(clean); in.readFully(0, bytes); in.close()
    val flipAt = (KvFile.CrcSpanBytes * 3) / 2 // mid span #1 (0-based), well inside values
    bytes(flipAt) = (bytes(flipAt) ^ 0x40).toByte
    val corrupt = scratchFile("crc-corrupt.kv")
    val out = fs.create(corrupt, true); out.write(bytes); out.close()
    // the READ path stays checksum-free by design: the flip serves as bytes
    val rc = KvFile.open(fs, corrupt)
    val findings = try {
      assert(rc.count === 40L)
      rc.verifyIntegrity().toSeq
    } finally rc.close()
    assert(findings.size === 1, findings.mkString("; "))
    assert(findings.head.contains("crc-corrupt.kv"), findings.head)
    // the named byte range must CONTAIN the flipped offset
    val rangeRe = """\[(\d+), (\d+)\)""".r
    val m = rangeRe.findFirstMatchIn(findings.head).get
    assert(m.group(1).toLong <= flipAt && flipAt < m.group(2).toLong,
      s"flip at $flipAt outside named range ${m.group(0)}")

    // a LEGACY 20-byte-trailer file (pre-CRC) still opens, counts, looks
    // up — and audits clean by absence (the documented trade). Rebuild
    // one from the clean file: data+index bytes are everything before
    // the crcs section, located via the v2 trailer.
    val bb = java.nio.ByteBuffer.wrap(bytes, bytes.length - KvFile.TrailerLenV2, KvFile.TrailerLenV2)
    val (vIo, vCnt, vCrcOff) = (bb.getLong, bb.getLong, bb.getLong)
    val legacy = scratchFile("crc-legacy.kv")
    val lo = new java.io.DataOutputStream(fs.create(legacy, true))
    lo.write(bytes, 0, vCrcOff.toInt)
    lo.writeLong(vIo); lo.writeLong(vCnt); lo.write(KvFile.Magic)
    lo.close()
    val rl = KvFile.open(fs, legacy)
    try {
      assert(rl.count === 40L)
      assert(rl.lookup("crc0007".getBytes).exists(_.length === (64 << 10)))
      assert(rl.verifyIntegrity().isEmpty)
    } finally rl.close()
    // KvFile.count tail-dispatches both trailer versions
    assert(KvFile.count(fs, clean) === 40L)
    assert(KvFile.count(fs, legacy) === 40L)
  }

  test("seeded fuzz: arbitrary binary keys round-trip through lookup and iterator") {
    val rnd = new scala.util.Random(1234)
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    // keys of every awkward shape: empty, 1-byte, high-bit-first (unsigned
    // order must put 0x80.. AFTER 0x7f..), shared prefixes of different
    // lengths; some null values
    val raw = (Seq(
      Array.emptyByteArray,
      Array(0x7f.toByte), Array(0x80.toByte), Array(0xff.toByte),
      Array(1.toByte), Array(1.toByte, 0.toByte), Array(1.toByte, 0.toByte, 0.toByte)) ++
      (0 until 400).map(_ => bytes(1 + rnd.nextInt(40))))
      .map(k => java.nio.ByteBuffer.wrap(k)).distinct.map(_.array()) // dedup keys
    val rows = byUnsigned(raw.zipWithIndex.map { case (k, i) =>
      k -> (if (i % 7 == 3) null else bytes(rnd.nextInt(64)))
    })
    val p = scratchFile("fuzz.kv")
    assert(writeFile(p, rows) === rows.size.toLong)
    val fs = p.getFileSystem(conf)
    val r = KvFile.open(fs, p)
    try {
      assert(r.count === rows.size.toLong)
      rows.foreach { case (k, v) =>
        val got = r.lookup(k)
        assert(got.isDefined, s"key of ${k.length} bytes missing")
        assert(java.util.Arrays.equals(got.get, v),
          s"value mismatch for key of ${k.length} bytes")
      }
      // absent keys (not colliding with any present key) miss
      (0 until 100).foreach { _ =>
        val k = bytes(41 + rnd.nextInt(8)) // longer than any present key
        assert(r.lookup(k) === None)
      }
      // iterator replays the exact (key, value) sequence in write order
      val back = r.iterator.toVector
      assert(back.size === rows.size)
      back.zip(rows).foreach { case ((gk, gv), (k, v)) =>
        assert(java.util.Arrays.equals(gk, k))
        assert((gv == null && v == null) || java.util.Arrays.equals(gv, v))
      }
      // trailer-only count helper
      assert(KvFile.count(fs, p) === rows.size.toLong)
    } finally r.close()
  }

  test("keysIterator: exact keys in order, value bytes SKIPPED not read") {
    val rnd = new scala.util.Random(99)
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    // 64 records x 256 KiB values: values dominate the file, so a keys
    // pass that actually reads them is shard-sized I/O and fails the
    // byte-count assertion below
    val rows = byUnsigned((0 until 64).map(_ => bytes(8 + rnd.nextInt(24)) -> bytes(256 * 1024)))
    val p = scratchFile("keysonly.kv")
    writeFile(p, rows)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen

    // counting wrapper: every byte entering the reader is tallied, and a
    // skip() is a forward SEEK (reading to skip would be counted)
    class Counting(in: org.apache.hadoop.fs.FSDataInputStream)
        extends java.io.InputStream
        with org.apache.hadoop.fs.Seekable
        with org.apache.hadoop.fs.PositionedReadable {
      var readBytes = 0L
      override def read(): Int = { val r = in.read(); if (r >= 0) readBytes += 1; r }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val r = in.read(b, off, len); if (r > 0) readBytes += r; r
      }
      override def skip(n: Long): Long = {
        // called by BufferedInputStream only when its buffer is drained,
        // so the underlying position IS the logical position
        val target = math.min(in.getPos + n, fileLen)
        val s = target - in.getPos
        in.seek(target); s
      }
      def seek(pos: Long): Unit = in.seek(pos)
      def getPos: Long = in.getPos
      def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
      def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
        val r = in.read(position, buffer, offset, length); if (r > 0) readBytes += r; r
      }
      def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
        in.readFully(position, buffer, offset, length); readBytes += length
      }
      def readFully(position: Long, buffer: Array[Byte]): Unit = {
        in.readFully(position, buffer); readBytes += buffer.length
      }
      override def close(): Unit = in.close()
    }

    val counting = new Counting(fs.open(p))
    val r = new KvFile.Reader(
      new org.apache.hadoop.fs.FSDataInputStream(counting), fileLen)
    try {
      val keys = r.keysIterator.toVector
      assert(keys.size === rows.size)
      keys.zip(rows).foreach { case (gk, (k, _)) =>
        assert(java.util.Arrays.equals(gk, k))
      }
      // total value bytes ~16 MiB; keys + headers + trailer + read-ahead
      // slop is a rounding error next to that
      assert(counting.readBytes < fileLen / 10,
        s"keys pass read ${counting.readBytes} of $fileLen bytes — values were READ, not skipped")
    } finally r.close()
    // null values (valLen = -1) take the no-skip branch (sequential:
    // tiny records sit under the density crossover)
    val withNulls = byUnsigned(Seq(
      bytes(4) -> null, bytes(5) -> bytes(16), bytes(6) -> null))
    val p2 = scratchFile("keysonly-nulls.kv")
    writeFile(p2, withNulls)
    val r2 = KvFile.open(fs, p2)
    try {
      val ks = r2.keysIterator.toVector
      assert(ks.size === 3)
      ks.zip(withNulls).foreach { case (gk, (k, _)) =>
        assert(java.util.Arrays.equals(gk, k))
      }
    } finally r2.close()
    // keys longer than the one-pread probe window on the positioned
    // branch (big values) still round-trip via the second pread
    val longKeys = byUnsigned((0 until 8).map(_ =>
      bytes(KvFile.KeysProbeKeyLen + 100) -> bytes(64 * 1024)))
    val p3 = scratchFile("keysonly-longkeys.kv")
    writeFile(p3, longKeys)
    val r3 = KvFile.open(fs, p3)
    try {
      val ks = r3.keysIterator.toVector
      assert(ks.size === 8)
      ks.zip(longKeys).foreach { case (gk, (k, _)) =>
        assert(java.util.Arrays.equals(gk, k))
      }
    } finally r3.close()
  }

  test("range: seeded fuzz over bounds vs an in-memory reference filter") {
    val rnd = new scala.util.Random(4242)
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    val cmp = (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)
    // duplicate keys are legal in the format — include runs of them, plus
    // nulls and awkward shapes
    val base = (Seq(Array.emptyByteArray, Array(0x7f.toByte), Array(0x80.toByte)) ++
      (0 until 300).map(_ => bytes(1 + rnd.nextInt(12))))
    val raw = base ++ base.take(40) // 40 duplicated keys
    val rows = byUnsigned(raw.zipWithIndex.map { case (k, i) =>
      k -> (if (i % 9 == 0) null else bytes(rnd.nextInt(32)))
    })
    val p = scratchFile("rangefuzz.kv")
    writeFile(p, rows)
    val r = KvFile.open(p.getFileSystem(conf), p)
    try {
      def reference(
          from: Option[Array[Byte]], fi: Boolean,
          to: Option[Array[Byte]], ti: Boolean): Seq[(Array[Byte], Array[Byte])] =
        rows.filter { case (k, _) =>
          from.forall(b => if (fi) cmp(k, b) >= 0 else cmp(k, b) > 0) &&
            to.forall(b => if (ti) cmp(k, b) <= 0 else cmp(k, b) < 0)
        }
      def check(
          from: Option[Array[Byte]], fi: Boolean,
          to: Option[Array[Byte]], ti: Boolean): Unit = {
        val want = reference(from, fi, to, ti)
        val got = r.range(from, fi, to, ti).toVector
        assert(got.size === want.size, s"range size mismatch (fi=$fi ti=$ti)")
        got.zip(want).foreach { case ((gk, gv), (k, v)) =>
          assert(java.util.Arrays.equals(gk, k))
          assert((gv == null && v == null) || java.util.Arrays.equals(gv, v))
        }
      }
      // bounds drawn from present keys, absent keys, and open ends,
      // crossed with both inclusivities
      val candidates: Seq[Option[Array[Byte]]] =
        Seq(None) ++ (0 until 30).map(_ => Some(rows(rnd.nextInt(rows.size))._1)) ++
          (0 until 30).map(_ => Some(bytes(1 + rnd.nextInt(14))))
      for (_ <- 0 until 200) {
        val from = candidates(rnd.nextInt(candidates.size))
        val to = candidates(rnd.nextInt(candidates.size))
        check(from, rnd.nextBoolean(), to, rnd.nextBoolean())
      }
      // degenerate exact-match range on a duplicated key returns ALL dups
      val dupKey = rows.groupBy(t => java.nio.ByteBuffer.wrap(t._1))
        .collectFirst { case (_, g) if g.size > 1 => g.head._1 }.get
      check(Some(dupKey), true, Some(dupKey), true)
      // empty range (from > to)
      check(Some(Array(0xff.toByte, 0xff.toByte)), true, Some(Array(0x00.toByte)), true)
    } finally r.close()
  }

  test("range: I/O is proportional to the range, not the file") {
    val rnd = new scala.util.Random(7)
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    // 256 records x 64 KiB values: a range of ~4 records must not read
    // the other ~250 records' bytes
    val rows = byUnsigned((0 until 256).map(i =>
      java.nio.ByteBuffer.allocate(4).putInt(i).array() -> bytes(64 * 1024)))
    val p = scratchFile("rangeio.kv")
    writeFile(p, rows)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    class Counting(in: org.apache.hadoop.fs.FSDataInputStream)
        extends java.io.InputStream
        with org.apache.hadoop.fs.Seekable
        with org.apache.hadoop.fs.PositionedReadable {
      var readBytes = 0L
      override def read(): Int = { val r = in.read(); if (r >= 0) readBytes += 1; r }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val r = in.read(b, off, len); if (r > 0) readBytes += r; r
      }
      def seek(pos: Long): Unit = in.seek(pos)
      def getPos: Long = in.getPos
      def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
      def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
        val r = in.read(position, buffer, offset, length); if (r > 0) readBytes += r; r
      }
      def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
        in.readFully(position, buffer, offset, length); readBytes += length
      }
      def readFully(position: Long, buffer: Array[Byte]): Unit = {
        in.readFully(position, buffer); readBytes += buffer.length
      }
      override def close(): Unit = in.close()
    }
    val counting = new Counting(fs.open(p))
    val r = new KvFile.Reader(
      new org.apache.hadoop.fs.FSDataInputStream(counting), fileLen)
    try {
      val lo = java.nio.ByteBuffer.allocate(4).putInt(100).array()
      val hi = java.nio.ByteBuffer.allocate(4).putInt(103).array()
      val got = r.range(Some(lo), true, Some(hi), true).toVector
      assert(got.size === 4)
      // 4 values + binary-search preads + one read-ahead buffer ≪ file
      assert(counting.readBytes < fileLen / 16,
        s"range read ${counting.readBytes} of $fileLen bytes — the whole file was scanned")
      // keys-only range on the same reader class skips even the in-range
      // value bytes beyond read-ahead granularity
      val counting2 = new Counting(fs.open(p))
      val r2 = new KvFile.Reader(
        new org.apache.hadoop.fs.FSDataInputStream(counting2), fileLen)
      try {
        val ks = r2.range(Some(lo), true, Some(hi), true, withValues = false).toVector
        assert(ks.size === 4)
        assert(ks.forall(_._2 == null))
      } finally r2.close()
    } finally r.close()
  }

  test("unsorted input is rejected at write time") {
    val p = scratchFile("unsorted.kv")
    val rows = Seq(
      "b".getBytes("UTF-8") -> "1".getBytes("UTF-8"),
      "a".getBytes("UTF-8") -> "2".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](writeFile(p, rows))
    assert(e.getMessage.contains("not sorted"))
  }

  test("empty file (zero records) opens, counts 0, misses everything") {
    val p = scratchFile("empty.kv")
    assert(writeFile(p, Nil) === 0L)
    val r = KvFile.open(p.getFileSystem(conf), p)
    try {
      assert(r.count === 0L)
      assert(r.lookup("x".getBytes("UTF-8")) === None)
      assert(r.iterator.isEmpty)
    } finally r.close()
  }

  test("corrupt or foreign files fail loud at open, not as garbage reads") {
    val fs = new Path("/root/repo/target/test-scratch/kvfile").getFileSystem(conf)
    val junk = scratchFile("junk.kv")
    val out = fs.create(junk, true)
    out.write(Array.fill(64)(42.toByte)); out.close()
    intercept[IllegalArgumentException](KvFile.open(fs, junk))
    val tiny = scratchFile("tiny.kv")
    val out2 = fs.create(tiny, true)
    out2.write(Array[Byte](1, 2, 3)); out2.close()
    intercept[IllegalArgumentException](KvFile.open(fs, tiny))
  }

  test("jumbo-value lookups: window span over MaxLookupWindowBytes falls back to stepping") {
    // 600 records of ~8 KB values: any 256-record window spans ~2 MB >
    // MaxLookupWindowBytes, so every lookup must take the stepped path
    // (node cache + per-record preads) end to end — and still be exact.
    val n = 600
    val rows = (0 until n).map { i =>
      f"key$i%05d".getBytes("UTF-8") ->
        Array.tabulate[Byte](8192)(j => ((i * 31 + j) & 0x7f).toByte)
    }
    assert(rows.size * 8192L > KvFile.MaxLookupWindowBytes * 2,
      "fixture no longer exceeds the window byte cap — bump the value size")
    val p = scratchFile("jumbo.kv")
    assert(writeFile(p, rows) === n.toLong)
    val r = KvFile.open(p.getFileSystem(conf), p)
    try {
      // repeated passes on ONE shared reader: pass 2+ runs against a warm
      // node cache and must agree byte-for-byte with pass 1
      (1 to 2).foreach { _ =>
        Seq(0, 1, n / 2 - 1, n / 2, n - 2, n - 1).foreach { i =>
          val got = r.lookup(rows(i)._1)
          assert(got.isDefined, s"key $i missing on jumbo path")
          assert(java.util.Arrays.equals(got.get, rows(i)._2), s"value $i mismatched")
        }
        assert(r.lookup("key99999".getBytes("UTF-8")) === None)
        assert(r.lookup("kex00000".getBytes("UTF-8")) === None)
      }
      // concurrent hammer on the shared node cache: exactness under races
      val errs = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          val rnd = new scala.util.Random(t)
          (0 until 200).foreach { _ =>
            val i = rnd.nextInt(n)
            val got = r.lookup(rows(i)._1)
            if (!got.exists(java.util.Arrays.equals(_, rows(i)._2))) errs.incrementAndGet()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.get() === 0, "concurrent jumbo lookups diverged")
    } finally r.close()
  }

  test("lookupScanRatio follows the byte model: tiny records raise it, jumbo records floor it") {
    def ratioFor(name: String, count: Int, valueLen: Int): Int = {
      val rows = (0 until count).map(i =>
        f"k$i%06d".getBytes("UTF-8") -> Array.fill[Byte](valueLen)(7))
      val p = scratchFile(name)
      writeFile(p, rows)
      val r = KvFile.open(p.getFileSystem(conf), p)
      try r.lookupScanRatio finally r.close()
    }
    val tiny = ratioFor("ratio-tiny.kv", 2000, 8)   // ~23 B/record
    val big = ratioFor("ratio-big.kv", 200, 65536)  // ~64 KB/record
    assert(tiny > KvFile.LookupScanRatio,
      s"tiny records should push the scan crossover OUT (got $tiny)")
    assert(big <= 2, s"jumbo records should probe almost always (got $big)")
    assert(tiny === (KvFile.LookupCostBytes / (8L + 7L + 8L)).toInt)
  }
}
