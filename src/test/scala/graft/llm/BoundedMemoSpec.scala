package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Contract of the in-session memo bound ([[LlmOps.MemoMaxEntries]]):
  * the cap evicts, an evicted key recomputes (a "re-probe retrains"),
  * and the compute-outside-the-lock race resolves to one winning value.
  */
class BoundedMemoSpec extends AnyFunSuite {

  test("hit returns the cached value without recomputing") {
    val m = new BoundedMemo[String](4)
    var calls = 0
    def get(k: String) = m.getOrCompute(k) { calls += 1; s"v$k" }
    assert(get("a") === "va")
    assert(get("a") === "va")
    assert(calls === 1)
  }

  test("cap evicts the least-recently-used entry and a re-probe recomputes") {
    val m = new BoundedMemo[String](3)
    var calls = 0
    def get(k: String) = m.getOrCompute(k) { calls += 1; s"v$k" }
    get("a"); get("b"); get("c")
    assert(m.size === 3)
    // refresh a's recency, then overflow: b (now eldest) must evict, a survive
    get("a")
    get("d")
    assert(m.size === 3)
    assert(m.contains("a") && m.contains("c") && m.contains("d"))
    assert(!m.contains("b"))
    // the evicted key recomputes — the "re-probe retrains correctly" leg:
    // eviction never serves a stale value, it just pays the compute again
    assert(calls === 4)
    assert(get("b") === "vb")
    assert(calls === 5)
    // and never grows past the cap however many distinct keys arrive
    (0 until 50).foreach(i => get(s"k$i"))
    assert(m.size === 3)
  }

  test("racing computes resolve to one value; compute runs outside the lock") {
    val m = new BoundedMemo[java.lang.Long](4)
    val started = new java.util.concurrent.CountDownLatch(2)
    val release = new java.util.concurrent.CountDownLatch(1)
    val computes = new java.util.concurrent.atomic.AtomicLong(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        val v = m.getOrCompute("k") {
          started.countDown()
          // both threads must be able to sit INSIDE compute at once —
          // under a computeIfAbsent-style bin lock this would deadlock
          // the await below instead of letting both proceed
          release.await(5, java.util.concurrent.TimeUnit.SECONDS)
          Long.box(computes.incrementAndGet() * 100 + i)
        }
        results.add(v.longValue())
      })
    }
    threads.foreach(_.start())
    assert(started.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "both computes must run concurrently (outside the map lock)")
    release.countDown()
    threads.foreach(_.join(5000))
    // both computed (the documented benign race), but every caller saw
    // the same winning value — first put wins, the loser is discarded
    assert(computes.get() === 2)
    assert(results.size === 2)
    assert(results.asScala.toSet.size === 1)
    assert(m.getOrCompute("k")(fail("must be a hit")) ===
      results.peek())
  }
}
