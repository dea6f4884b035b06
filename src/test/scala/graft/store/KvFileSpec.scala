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
}
