package graft.pipeline

/** Minimal open-addressing long→long hash map (linear probing, power-of-two
  * capacity, byteswap mixing) for partition-local graph state: ~17 bytes
  * per entry vs ~80 for a boxed `mutable.HashMap[Long, Long]`. The
  * union-find contraction holds up to ~4M nodes per partition (2M edges ×
  * 2 endpoints at the loop's sizing), where boxing would multiply executor
  * memory ~5× and stress GC; primitive arrays keep the pass flat.
  * Not thread-safe — one instance per partition iterator. */
final class LongLongMap(initialCapacity: Int = 1 << 16) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) - 1) << 1
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  private def slot(k: Long, ks: Array[Long], us: Array[Boolean], m: Int): Int = {
    var i = scala.util.hashing.byteswap64(k).toInt & m
    while (us(i) && ks(i) != k) i = (i + 1) & m
    i
  }

  def contains(k: Long): Boolean = used(slot(k, keys, used, mask))

  def getOrElse(k: Long, dflt: Long): Long = {
    val i = slot(k, keys, used, mask)
    if (used(i)) vals(i) else dflt
  }

  def put(k: Long, v: Long): Unit = {
    val i = slot(k, keys, used, mask)
    if (!used(i)) {
      used(i) = true; keys(i) = k; vals(i) = v; n += 1
      if (n.toLong * 4 > cap.toLong * 3) grow()
    } else vals(i) = v
  }

  /** Iterate keys (insertion order NOT preserved). Mutating existing
    * entries during iteration is safe (no resize); inserting is not. */
  def foreachKey(f: Long => Unit): Unit = {
    var i = 0
    while (i < cap) { if (used(i)) f(keys(i)); i += 1 }
  }

  /** Zero-copy (key, value) iterator over the backing arrays — do not
    * mutate the map while consuming it. */
  def iterator: Iterator[(Long, Long)] = {
    val (ks, vs, us, c) = (keys, vals, used, cap)
    new Iterator[(Long, Long)] {
      private var i = 0
      private def advance(): Unit = { while (i < c && !us(i)) i += 1 }
      advance()
      def hasNext: Boolean = i < c
      def next(): (Long, Long) = { val r = (ks(i), vs(i)); i += 1; advance(); r }
    }
  }

  private def grow(): Unit = {
    val ncap = cap << 1
    val nmask = ncap - 1
    val nk = new Array[Long](ncap)
    val nv = new Array[Long](ncap)
    val nu = new Array[Boolean](ncap)
    var i = 0
    while (i < cap) {
      if (used(i)) {
        val j = slot(keys(i), nk, nu, nmask)
        nu(j) = true; nk(j) = keys(i); nv(j) = vals(i)
      }
      i += 1
    }
    cap = ncap; mask = nmask; keys = nk; vals = nv; used = nu
  }
}
