package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.{Scored, TagCount, TopKByScore, TopKCounts}

/** UDAF laws (O11 re-principled): the merge the reference's Aggregator
  * must satisfy (S:153-180) — associativity/commutativity — plus
  * permutation invariance and the deterministic tie-break. Properties
  * are checked over seeded random inputs (deterministic runs). */
class TopKSpec extends AnyFunSuite {

  private val agg = new TopKCounts(3)
  private def run(xs: Seq[TagCount]): Seq[TagCount] =
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))

  private def randomTags(rnd: Random): Seq[TagCount] =
    Seq.fill(rnd.nextInt(30))(TagCount(("a" + ('a' + rnd.nextInt(7)).toChar), rnd.nextInt(100).toLong))

  test("top-k with deterministic tie-break (cnt desc, tag asc)") {
    val in = Seq(TagCount("b", 5), TagCount("a", 5), TagCount("c", 9), TagCount("d", 1))
    assert(run(in) == Seq(TagCount("c", 9), TagCount("a", 5), TagCount("b", 5)))
  }

  test("permutation invariance (100 seeded trials)") {
    for (seed <- 1 to 100) {
      val rnd = new Random(seed)
      val xs = randomTags(rnd)
      assert(run(xs) == run(rnd.shuffle(xs)), s"seed=$seed")
    }
  }

  test("merge is associative and commutative (partial-aggregation law)") {
    for (seed <- 1 to 100) {
      val rnd = new Random(seed)
      val (pa, pb, pc) = (run(randomTags(rnd)), run(randomTags(rnd)), run(randomTags(rnd)))
      assert(agg.finish(agg.merge(agg.merge(pa, pb), pc)) ==
             agg.finish(agg.merge(pa, agg.merge(pb, pc))), s"assoc seed=$seed")
      assert(agg.finish(agg.merge(pa, pb)) == agg.finish(agg.merge(pb, pa)), s"comm seed=$seed")
    }
  }

  test("merge of partials equals single pass (split invariance)") {
    for (seed <- 1 to 100) {
      val rnd = new Random(seed)
      val xs = randomTags(rnd)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1))
      assert(agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))) == run(xs),
        s"split seed=$seed")
    }
  }

  test("TopKByScore: score desc, id asc tie-break, bounded at k") {
    val a = new TopKByScore(2)
    val xs = Seq(Scored(0, 7, 0.5), Scored(0, 3, 0.9), Scored(0, 1, 0.5), Scored(0, 9, 0.1))
    val out = a.finish(xs.foldLeft(a.zero)(a.reduce))
    assert(out == Seq(Scored(0, 3, 0.9), Scored(0, 1, 0.5)))
  }

  test("reduce never sorts: the hot path is bounded insertion (VERDICT r5 #4)") {
    val a = new TopKCounts(5)
    val rnd = new Random(42)
    val many = Seq.fill(10000)(TagCount("t" + rnd.nextInt(50), rnd.nextInt(1000).toLong))
    val buf = many.foldLeft(a.zero)(a.reduce)
    assert(a.sortPasses == 0, s"reduce path sorted ${a.sortPasses} times over 10k rows")
    assert(buf.size == 5)
    // finish sorts exactly once, and the bounded-insert buffer holds
    // the true top-5 of the stream
    val out = a.finish(buf)
    assert(a.sortPasses == 1)
    assert(out == many.sortBy(t => (-t.cnt, t.tag)).take(5))
  }

  test("TrendingArgMax: map-buffer argmax with deterministic tie-break") {
    val a = new graft.functions.TrendingArgMax
    val in = Seq(TagCount("b", 1), TagCount("a", 1), TagCount("b", 1),
                 TagCount("c", 2), TagCount("a", 1))
    val buf = in.foldLeft(a.zero)(a.reduce)
    // a=2, b=2, c=2 → tie broken by tag asc
    assert(a.finish(buf) == graft.functions.Top1("a", 2))
    // merge law: split anywhere, same answer
    val (l, r) = in.splitAt(2)
    assert(a.finish(a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))) ==
      a.finish(buf))
  }
}
