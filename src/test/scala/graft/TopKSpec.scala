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
}
