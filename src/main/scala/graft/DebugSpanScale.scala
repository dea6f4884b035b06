package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions

/**
 * Dev-only: the span-cut EXCISION-KERNEL audit (VERDICT r12 task 1).
 * `removeSharedSpans`' 100×-scale inputs are big boilerplate-heavy
 * documents — exactly the class where cut sites approach len/modulus, so
 * the r12 interpreted `aggregate(ps, ...)` fold (one accumulated-string
 * copy PER SITE) went O(sites × len) in one task. This measures the
 * replacement [[graft.core.SpanExciseExpr]] on synthetic hot documents:
 * doubling the document length must ~double the wall (linear), and the
 * HOF fold is timed alongside at the small sizes to record the contrast
 * (it is deliberately skipped at ≥1 MB — that is the straggler the
 * kernel exists to kill).
 *
 * The fixture synthesizes (t, ps) frames directly: the audit targets the
 * per-row excision kernel, not the detector (whose shuffle shape is
 * linear by construction and pinned in PlanShapeSpec). Each document is
 * `len` codepoints (every 10th an astral emoji so the UTF-8 walk is
 * exercised, not just ASCII) with a cut site every minLen + modulus = 80
 * positions — ~len/80 sites each KEEPING a 16-codepoint gap, the
 * worst case for the fold: the accumulated output stays ~len/5 while
 * every site copies it (back-to-back sites would excise everything and
 * assemble nothing).
 *
 * Usage: runMain graft.DebugSpanScale [docs=64]
 */
object DebugSpanScale {
  def main(args: Array[String]): Unit = {
    val docsPerSize = args.headOption.map(_.toInt).getOrElse(64)
    val minLen = 64
    val modulus = 16
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def mkDoc(lenCp: Int, seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      val sb = new java.lang.StringBuilder(lenCp * 2)
      var i = 0
      while (i < lenCp) {
        if (i % 10 == 9) sb.appendCodePoint(0x1F600 + rnd.nextInt(16))
        else sb.append(('a' + rnd.nextInt(26)).toChar)
        i += 1
      }
      sb.toString
    }

    val hofFold = expr(
      s"""aggregate(
         |  ps,
         |  named_struct('o', '', 'd', 1),
         |  (acc, p) -> named_struct(
         |    'o', concat(acc.o, substring(t, acc.d, greatest(p - acc.d, 0))),
         |    'd', greatest(acc.d, p + $minLen)),
         |  acc -> concat(acc.o, substring(t, acc.d, length(t))))""".stripMargin)

    def timeIt(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[span-scale] $what%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (out chars: $n)")
    }

    // codepoint lengths: 256 Ki .. 2 Mi (a 1 MB ASCII doc ≈ 1 Mi codepoints)
    for (lenCp <- Seq(1 << 18, 1 << 19, 1 << 20, 1 << 21)) {
      val spacing = minLen + modulus
      val sites = lenCp / spacing
      val ps = (0 until sites).map(s => 1 + s * spacing)
      val frame = (0 until docsPerSize)
        .map(d => (mkDoc(lenCp, d), ps))
        .toDF("t", "ps")
        .repartition(32)
        .localCheckpoint(true) // fixture off the clock; plans below reuse it
      val label = f"${lenCp / 1024}%5d Ki cp × $docsPerSize docs (${sites} sites)"
      timeIt(s"codegen excise $label") {
        frame.select(graft.functions.span_excise(col("t"), col("ps"), minLen).as("o"))
          .agg(sum(length(col("o")))).head().getLong(0)
      }
      if (lenCp <= (1 << 19)) timeIt(s"HOF fold       $label") {
        frame.select(hofFold.as("o"))
          .agg(sum(length(col("o")))).head().getLong(0)
      }
      frame.unpersist(true)
    }
    spark.stop()
  }
}
