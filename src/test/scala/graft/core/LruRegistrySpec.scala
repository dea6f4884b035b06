package graft.core

import org.scalatest.funsuite.AnyFunSuite

class LruRegistrySpec extends AnyFunSuite {

  test("LRU semantics: cap evicts oldest-ACCESSED; remove targets one key") {
    val r = new LruRegistry[Int, String](2)
    r.put(1, "a"); r.put(2, "b")
    r.get(1) // touch: 2 becomes the eldest
    r.put(3, "c")
    assert(r.get(2).isEmpty, "oldest-accessed entry must evict, not newest")
    assert(r.get(1).contains("a") && r.get(3).contains("c"))
    r.remove(1)
    assert(r.get(1).isEmpty && r.get(3).contains("c"))
  }

  test("locked compute serializes with remove-as-invalidation; " +
      "unlocked compute documents the clobber") {
    // The schedule that bit linksCache (r16 review): a reader misses and
    // starts computing a STALE value; an invalidator remove()s the key
    // mid-compute. Whose write lands last decides whether the
    // invalidation survives.
    def race(locked: Boolean): Option[String] = {
      val reg = new LruRegistry[Int, String](8)
      val entered = new java.util.concurrent.CountDownLatch(1)
      val resume = new java.util.concurrent.CountDownLatch(1)
      val reader = new Thread(() => {
        val f = (_: Int) => { entered.countDown(); resume.await(); "stale" }
        if (locked) reg.getOrElseUpdateLocked(1)(f)
        else reg.getOrElseUpdate(1)(f)
        ()
      })
      reader.start()
      entered.await()
      val remover = new Thread(() => reg.remove(1))
      remover.start()
      if (locked) Thread.sleep(100) // let it park on the registry lock
      else remover.join() // unlocked: the remove completes BEFORE the stale put
      resume.countDown()
      reader.join(); remover.join()
      reg.get(1)
    }
    // Locked: miss+compute+put is one atomic block, so the remove runs
    // strictly after it — the invalidation always wins (whichever side
    // of the block it lands on, the entry is gone at the end).
    assert(race(locked = true).isEmpty,
      "a remove issued during a locked compute must kill the entry")
    // Unlocked: the stale put lands after the remove and resurrects the
    // entry — the documented reason remove()-as-invalidation callers
    // (DomainStore.linksCache) must use the locked variant.
    assert(race(locked = false).contains("stale"))
  }
}
