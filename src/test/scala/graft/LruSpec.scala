package graft

import graft.ops.ContentKey
import org.scalatest.funsuite.AnyFunSuite

/** The cache contract the DataFrame-valued sites (labelsCache,
  * qcFeatsCache, compCache) rely on: eviction releases the value via the
  * hook, one compute per key under contention, failed computes don't
  * poison the key, and a slow compute for one key doesn't serialize
  * lookups of other keys. */
class LruSpec extends AnyFunSuite {

  test("eviction calls onEvict on the dropped value, LRU order") {
    val evicted = scala.collection.mutable.ArrayBuffer[Int]()
    val lru = new ContentKey.Lru[Int](2, (v: Int) => evicted += v)
    lru.get("a")(1); lru.get("b")(2)
    lru.get("a")(99) // touch a -> b is now eldest
    lru.get("c")(3)  // evicts b
    assert(evicted.toSeq == Seq(2))
    assert(lru.get("a")(-1) == 1 && lru.get("c")(-1) == 3)
    lru.get("d")(4) // evicts a (b's slot), eldest now is... a was touched
    assert(evicted.size == 2)
  }

  test("concurrent getters of one key compute once; other keys not blocked") {
    val lru = new ContentKey.Lru[String](4)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val slowEntered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val slow = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = lru.get("slow") {
          computes.incrementAndGet(); slowEntered.countDown()
          release.await(); "S"
        }
      })
      assert(slowEntered.await(5, java.util.concurrent.TimeUnit.SECONDS))
      // while "slow" is mid-compute, an unrelated key must complete
      val other = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = lru.get("other")("O")
      })
      assert(other.get(5, java.util.concurrent.TimeUnit.SECONDS) == "O")
      // a second getter of "slow" blocks, then adopts the first result
      val dup = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = lru.get("slow") { computes.incrementAndGet(); "DUP" }
      })
      release.countDown()
      assert(slow.get(5, java.util.concurrent.TimeUnit.SECONDS) == "S")
      assert(dup.get(5, java.util.concurrent.TimeUnit.SECONDS) == "S")
      assert(computes.get() == 1)
    } finally pool.shutdownNow()
  }

  test("a failed compute releases the key for retry") {
    val lru = new ContentKey.Lru[Int](4)
    intercept[RuntimeException] {
      lru.get("k") { throw new RuntimeException("boom") }
    }
    assert(lru.get("k")(42) == 42)
  }
}
