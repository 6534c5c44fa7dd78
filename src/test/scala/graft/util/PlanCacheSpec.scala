package graft.util

import org.scalatest.funsuite.AnyFunSuite

class PlanCacheSpec extends AnyFunSuite {

  test("bounded: exceeding maxEntries evicts the least-recently-used") {
    var evicted = List.empty[String]
    val c = new PlanCache[Int, String](maxEntries = 2, onEvict = v => evicted ::= v)
    c.getOrElseUpdate(1)("a")
    c.getOrElseUpdate(2)("b")
    c.getOrElseUpdate(1)("never-computed") // touch 1 → 2 becomes LRU
    c.getOrElseUpdate(3)("c")
    assert(c.size == 2)
    assert(evicted == List("b"))
    assert(c.getOrElseUpdate(1)("recomputed") == "a") // 1 survived
  }

  test("clear evicts everything exactly once") {
    var evicted = 0
    val c = new PlanCache[Int, String](maxEntries = 4, onEvict = _ => evicted += 1)
    (1 to 3).foreach(i => c.getOrElseUpdate(i)(i.toString))
    c.clear()
    assert(c.size == 0 && evicted == 3)
    c.clear()
    assert(evicted == 3)
  }

  test("compute runs once per key") {
    var computed = 0
    val c = new PlanCache[Int, String](maxEntries = 4, onEvict = _ => ())
    (1 to 5).foreach(_ => c.getOrElseUpdate(7) { computed += 1; "v" })
    assert(computed == 1)
  }
}
