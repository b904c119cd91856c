package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BottomKLongsSpec extends AnyFunSuite {

  test("bounded distinct-min set: dedup, bound, exact bottom-k, " +
      "merge-order-free") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(rnd.nextInt(300).toLong)
    val want = xs.distinct.sorted.take(16)

    val a = new LongSetBuffer(16)
    xs.foreach(a.add)
    assert(a.set.toSeq == want)

    // merge of arbitrary splits equals the single-pass set (set
    // semantics are order-free — the property MisraGries cannot offer)
    for (seed <- 1 to 5) {
      val parts = xs.grouped(700 + seed * 100).toSeq
      val bufs = parts.map { p =>
        val b = new LongSetBuffer(16); p.foreach(b.add); b
      }
      val m = new LongSetBuffer(16)
      new scala.util.Random(seed).shuffle(bufs)
        .foreach(b => b.set.foreach(m.add))
      assert(m.set.toSeq == want, s"seed $seed")
    }

    // duplicates below the boundary never evict distinct members
    val c = new LongSetBuffer(3)
    Seq(5L, 5L, 5L, 2L, 9L, 2L, 7L, 9L, 1L).foreach(c.add)
    assert(c.set.toSeq == Seq(1L, 2L, 5L))
  }
}
