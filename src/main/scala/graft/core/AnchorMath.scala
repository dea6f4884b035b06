package graft.core

/**
 * The content-defined anchor rule as PURE JVM math over codepoints — the
 * ONE kernel definition shared by the Catalyst expression
 * ([[Anchors.anchorPositions]], which wraps it in Spark types) and the
 * Spark-free serving probe ([[graft.store.OverlapReader]]). Deliberately
 * free of any Spark import so a serving process can load it without
 * Spark jars on the classpath (the DomainSpec precedent).
 *
 * Position i (1-based) anchors iff the Rabin-Karp hash of the
 * `window`-codepoint context starting there is ≡ 0 mod `modulus`; the
 * per-position value equals the left-to-right fold
 * `acc = (acc*31 + codepoint) mod 1e9+7` over the window, which the
 * DuckDB oracles replay with a per-window list fold.
 */
object AnchorMath {
  val Prime = 1000000007L
  val Base = 31L

  /** 1-based anchor positions over a codepoint array. */
  def positions(cps: Array[Int], window: Int, modulus: Int): Array[Int] = {
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    if (n >= window) {
      var pow = 1L // Base^(window-1) mod Prime
      var i = 0
      while (i < window - 1) { pow = pow * Base % Prime; i += 1 }
      var h = 0L
      i = 0
      while (i < window) { h = (h * Base + cps(i)) % Prime; i += 1 }
      var pos = 0 // 0-based window start
      var done = false
      while (!done) {
        if (h % modulus == 0) out += pos + 1
        if (pos + window >= n) done = true
        else {
          h = ((h - cps(pos) * pow % Prime + Prime) % Prime * Base +
            cps(pos + window)) % Prime
          pos += 1
        }
      }
    }
    out.toArray
  }
}
