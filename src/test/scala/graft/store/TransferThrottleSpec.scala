package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** The token bucket on its own — no Spark, no filesystem: the aggregate
  * rate contract the throttled localize builds on. */
class TransferThrottleSpec extends AnyFunSuite {

  test("aggregate multi-thread throughput never beats the cap") {
    val kbps = 2048 // 2 MB/s
    val th = new TransferThrottle(kbps)
    val chunk = 64 * 1024L
    val perThread = 8
    val threads = 8
    val totalBytes = chunk * perThread * threads // 4 MB -> floor 2 s
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    try {
      val tasks = (0 until threads).map(_ => pool.submit(new Callable[Unit] {
        def call(): Unit = (0 until perThread).foreach(_ => th.acquire(chunk))
      }))
      tasks.foreach(_.get(60, TimeUnit.SECONDS))
    } finally pool.shutdown()
    val elapsed = (System.nanoTime() - t0) / 1e9
    val floorSec = totalBytes / 1024.0 / kbps
    assert(elapsed >= floorSec * 0.9,
      f"$totalBytes bytes drained in $elapsed%.2f s — beats the $kbps KB/s cap " +
        f"(floor $floorSec%.2f s); the shared bucket must meter the AGGREGATE")
  }

  test("an idle period grants no burst credit") {
    val kbps = 1024
    val th = new TransferThrottle(kbps)
    th.acquire(1024) // start the clock
    Thread.sleep(300) // idle: the virtual timeline must reset to 'now'
    val t0 = System.nanoTime()
    th.acquire(512 * 1024) // half a second of budget at 1 MB/s
    th.acquire(1) // the first acquire returns before its reservation ELAPSES;
                  // the next one waits out the timeline, exposing the true rate
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed >= 0.45,
      f"512 KB passed in $elapsed%.2f s after idling — idle time was banked as burst credit")
  }

  test("zero-byte acquires are free; invalid arguments fail loud") {
    val th = new TransferThrottle(1)
    val t0 = System.nanoTime()
    (0 until 1000).foreach(_ => th.acquire(0))
    assert((System.nanoTime() - t0) / 1e9 < 1.0, "acquire(0) must not consume budget")
    intercept[IllegalArgumentException](th.acquire(-1))
    intercept[IllegalArgumentException](new TransferThrottle(0))
  }
}
