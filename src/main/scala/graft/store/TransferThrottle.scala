package graft.store

/**
 * Shared byte-rate limiter for shard transfers — the engine's analog of
 * the reference's `:download-rate-limit` (default 128 kB/s,
 * `elephantdb-server/src/clj/elephantdb/common/config.clj:56-58`, applied
 * by a throttle agent shared across one box's shard downloads,
 * `common/domain.clj:360-405`): a serving box pulling tens of shards
 * must not saturate the NIC it is simultaneously answering queries on.
 *
 * Fluid token-bucket over a virtual clock: each `acquire(n)` reserves
 * `n / rate` seconds on a monotonically advancing timeline and sleeps
 * until its reservation starts, so the LONG-RUN aggregate across every
 * thread sharing this instance never exceeds `maxKBps` — one limiter
 * per `localize` call throttles the whole parallel pull, exactly the
 * reference's one-agent-per-download shape. An idle period resets the
 * timeline to "now" (no burst credit accumulates beyond it).
 *
 * Thread-safe; the sleep happens OUTSIDE the lock so a large
 * reservation never blocks other threads from queueing behind it.
 */
final class TransferThrottle(maxKBps: Int) {
  require(maxKBps >= 1, s"maxKBps must be >= 1, got $maxKBps")
  private val bytesPerSec = maxKBps * 1024L
  private var virtualTime = System.nanoTime()

  /** Block until `n` more bytes fit under the rate. */
  def acquire(n: Long): Unit = {
    require(n >= 0, s"acquire($n)")
    if (n == 0) return
    val waitNs = synchronized {
      val now = System.nanoTime()
      if (virtualTime < now) virtualTime = now
      val start = virtualTime
      virtualTime += n * 1000000000L / bytesPerSec
      start - now
    }
    if (waitNs > 0) {
      try java.util.concurrent.TimeUnit.NANOSECONDS.sleep(waitNs)
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new RuntimeException("shard transfer interrupted while throttled", e)
      }
    }
  }
}
