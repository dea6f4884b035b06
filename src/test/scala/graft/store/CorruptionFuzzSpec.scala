package graft.store

import java.nio.ByteBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/**
 * Systematic corruption fuzz over both servable shard formats: hundreds
 * of seeded single-byte flips per format, each probed through open +
 * full iteration + point lookups + a range scan. The pins:
 *
 *  - NO unnamed failure, ever: any thrown error is an engine
 *    IllegalArgument/IllegalState whose message NAMES the file (never a
 *    NegativeArraySizeException, an OOM-sized allocation, an EOF from a
 *    wild offset, or a hang — each earlier kvz guard came from a single
 *    review finding; this spec makes the property systematic).
 *  - GKZ1 block-data flips are ALWAYS caught and name file + block:
 *    every block decode is ADLER32-verified, so a full iteration over a
 *    flipped block must fail named (the integrity-checked engine).
 *  - GKV1 record-data flips may silently change answers — the format
 *    trades checksums for two-pread point lookups (documented in
 *    [[KvFile]]); structural regions (offset index, trailer) still fail
 *    named or leave results intact, and nothing ever fails UNnamed.
 *  - Trailer flips fail named at open in both formats (the length
 *    equations cannot survive a single-byte change).
 */
class CorruptionFuzzSpec extends AnyFunSuite {

  private val auth = "fuzzkv"
  private val conf = {
    val c = new Configuration()
    RamFileSystem.register(c)
    c
  }
  private def fs = new Path(s"ramfs://$auth/").getFileSystem(conf)

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private val records: Seq[(Array[Byte], Array[Byte])] =
    (0 until 400).map(i => utf8(f"fk$i%04d") -> utf8(s"value-payload-$i-" + ("x" * (i % 37))))

  private def writeFile(path: Path, kvz: Boolean): Array[Byte] = {
    val out = new java.io.DataOutputStream(fs.create(path, true))
    try {
      if (kvz) KvzFile.write(out, records.iterator, blockSize = 2048)
      else KvFile.write(out, records.iterator)
    } finally out.close()
    val len = fs.getFileStatus(path).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(path)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  /** Everything a consumer can observe, as comparable strings. */
  private case class Observed(rows: Seq[String], lookups: Seq[String], range: Seq[String])

  private def probe(path: Path): Observed = {
    val r = KvFile.open(fs, path)
    try {
      def s(b: Array[Byte]): String = if (b == null) "<null>" else new String(b, "ISO-8859-1")
      val rows = r.iterator.map { case (k, v) => s(k) + "=" + s(v) }.toVector
      val keys = (0 until 400 by 13).map(i => utf8(f"fk$i%04d")) ++
        Seq(utf8("absent-a"), utf8("zz-absent"), utf8(""))
      val lookups = keys.map(k => r.lookup(k).map(s).toString).toVector
      val range = r.range(
        Some(utf8("fk0100")), fromInclusive = true,
        Some(utf8("fk0300")), toInclusive = false)
        .map { case (k, v) => s(k) + "=" + s(v) }.toVector
      Observed(rows, lookups, range)
    } finally r.close()
  }

  private def runFuzz(kvz: Boolean): Unit = {
    val label = if (kvz) "gkz1" else "gkv1"
    val cleanPath = new Path(s"ramfs://$auth/$label/clean.kv")
    val orig = writeFile(cleanPath, kvz)
    val baseline = probe(cleanPath)
    // region boundaries from the clean trailer
    val trailerLen = if (kvz) KvzFile.TrailerLen else KvFile.TrailerLenV2
    val indexOffset = ByteBuffer.wrap(orig, orig.length - trailerLen, 8).getLong
    // GKV2 CRC coverage ends at crcOffset (records + offset index)
    val crcOffset =
      if (kvz) indexOffset
      else ByteBuffer.wrap(orig, orig.length - trailerLen + 16, 8).getLong
    val mutPath = new Path(s"ramfs://$auth/$label/mut.kv")
    val rnd = new scala.util.Random(if (kvz) 0xC0FFEE else 0xBEEF)
    var named = 0
    var divergent = 0
    var identical = 0
    (0 until 220).foreach { trial =>
      val pos = rnd.nextInt(orig.length)
      var flip = 0
      while (flip == 0) flip = rnd.nextInt(256)
      val mutated = orig.clone()
      mutated(pos) = (mutated(pos) ^ flip).toByte
      val out = fs.create(mutPath, true)
      try out.write(mutated) finally out.close()

      val outcome =
        try {
          val o = probe(mutPath)
          if (o == baseline) "identical" else "divergent"
        } catch {
          case e @ (_: IllegalArgumentException | _: IllegalStateException) =>
            assert(Option(e.getMessage).exists(_.contains(mutPath.toString)),
              s"$label trial $trial (pos $pos): error does not NAME the file: $e")
            if (kvz && pos >= 4 && pos < indexOffset)
              assert(e.getMessage.contains("block"),
                s"$label trial $trial (pos $pos): block-data corruption must name the block: $e")
            "named"
          case t: Throwable =>
            fail(s"$label trial $trial (pos $pos, flip $flip): UNNAMED failure class " +
              s"${t.getClass.getName}: ${t.getMessage}")
        }
      outcome match {
        case "named" => named += 1
        case "divergent" => divergent += 1
        case _ => identical += 1
      }
      // format-specific strength:
      if (kvz) {
        // any flip inside the compressed block region MUST be caught —
        // the full iteration decodes (and ADLER32-verifies) every block
        if (pos >= 4 && pos < indexOffset)
          assert(outcome == "named",
            s"gkz1 trial $trial: data flip at $pos read as '$outcome' — checksum must catch it")
      } else {
        // GKV1 magic/trailer flips must fail named at open (length
        // equation + magic checks) — EXCEPT the 4 spanBytes bytes at
        // [len-8, len-4): on a single-span file a small spanBytes
        // perturbation can leave every trailer equation consistent (span
        // geometry is a parameter, not a sum), so those flips may read
        // clean; data-region divergence on the READ path is the format's
        // documented trade...
        val inSpanBytesField = pos >= orig.length - 8 && pos < orig.length - 4
        if ((pos < 4 || pos >= orig.length - trailerLen) && !inSpanBytesField)
          assert(outcome == "named",
            s"gkv1 trial $trial: header/trailer flip at $pos read as '$outcome'")
        // ...but the span-CRC AUDIT must catch every flip in the covered
        // region — records AND the offset index (an index flip
        // mis-targets binary searches while records frame clean; only
        // the CRC sees it) — whether or not the read path happened to
        // trip over it, and the named byte range must contain the flip
        if (pos >= 4 && pos < crcOffset && outcome != "named") {
          val r = KvFile.open(fs, mutPath)
          val findings = try r.verifyIntegrity().toVector finally r.close()
          assert(findings.nonEmpty,
            s"gkv1 trial $trial: data flip at $pos invisible to the span-CRC audit")
          val rangeRe = """\[(\d+), (\d+)\)""".r
          assert(findings.exists { f =>
            rangeRe.findFirstMatchIn(f).exists(m =>
              m.group(1).toLong <= pos && pos < m.group(2).toLong)
          }, s"gkv1 trial $trial: flip at $pos outside every named range: $findings")
        }
      }
    }
    // sanity on the fuzz itself: it exercised all three outcome classes
    // where the format allows them, and corruption was overwhelmingly loud
    assert(named > 0, s"$label: no mutation produced a named error?")
    info(s"$label: named=$named divergent=$divergent identical=$identical")
    if (kvz) assert(divergent <= 20,
      s"gkz1: $divergent silent divergences — only order-preserving index-key flips may slip")
  }

  test("gkv1: 220 seeded byte flips — every failure is named, never an unnamed error or hang") {
    runFuzz(kvz = false)
  }

  test("gkz1: 220 seeded byte flips — block flips always caught (file + block named)") {
    runFuzz(kvz = true)
  }
}
