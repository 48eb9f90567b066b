package graft

import graft.pipeline.LongLongMap
import org.scalatest.funsuite.AnyFunSuite

/** The primitive long→long map backing the union-find contraction, checked
  * against the boxed reference implementation under random workloads. */
class LongLongMapSpec extends AnyFunSuite {

  test("random put/get/contains matches mutable.HashMap across growth") {
    val rnd = new scala.util.Random(17)
    val m = new LongLongMap(16) // tiny start → many grow() cycles
    val ref = scala.collection.mutable.HashMap.empty[Long, Long]
    for (_ <- 1 to 200000) {
      val k = rnd.nextLong() % 50000
      rnd.nextInt(3) match {
        case 0 | 1 => val v = rnd.nextLong(); m.put(k, v); ref.put(k, v)
        case 2 =>
          assert(m.contains(k) == ref.contains(k))
          assert(m.getOrElse(k, -1L) == ref.getOrElse(k, -1L))
      }
    }
    assert(m.size == ref.size)
    var n = 0
    m.iterator.foreach { case (k, v) => assert(ref(k) == v); n += 1 }
    assert(n == ref.size)
  }

  test("negative keys, Long.MinValue/MaxValue, overwrite semantics") {
    val m = new LongLongMap(16)
    for (k <- Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L)) m.put(k, k * 2 - 1)
    for (k <- Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L))
      assert(m.getOrElse(k, 999L) == k * 2 - 1)
    m.put(0L, 42L)
    assert(m.getOrElse(0L, -1L) == 42L && m.size == 5)
    assert(!m.contains(7L) && m.getOrElse(7L, -1L) == -1L)
  }
}
