package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed Aggregators — the reference's custom UDAF surface
  * (O11, TrendingHashTagAggregator at
  * TwitterDatasetTrendingHashtag.java:140-210) re-principled:
  *
  *  - typed case-class IN (never `GenericRowWithSchema` — taking raw rows
  *    is what forced the reference to disable whole-stage codegen, S:58);
  *  - a bounded k-element buffer (the reference's buffer was an unbounded
  *    tag→count map — O(distinct keys) state; this is O(k));
  *  - associative + commutative merge → Spark plans partial aggregation,
  *    so only k rows per group per partition ever cross the shuffle;
  *  - deterministic tie-break (score desc, id asc) — the reference's
  *    argmax depended on HashMap iteration order (S:187-196).
  */
case class Scored(probe: Long, id: Long, score: Double)
case class TagCount(tag: String, cnt: Long)

/** Top-k (id, score) pairs by (score desc, id asc). */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def best(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)
  override def zero: Seq[Scored] = Seq.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = best(b :+ a)
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = best(b1 ++ b2)
  override def finish(r: Seq[Scored]): Seq[Scored] = best(r)
  override def bufferEncoder: Encoder[Seq[Scored]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

case class HashedDoc(lang: String, fp: Long, doc_id: Long)

/** Bottom-k docs by (fp asc, doc_id asc) — deterministic content-hash
  * stratified sampling: the k docs whose fingerprint sorts lowest
  * within each stratum. Same bounded-buffer/partial-agg properties as
  * [[TopKByScore]]: only k rows per group per partition cross the
  * shuffle, never the stratum (a per-group `row_number` window would
  * shuffle every row into as few partitions as there are strata). */
class BottomKByHash(k: Int) extends Aggregator[HashedDoc, Seq[HashedDoc], Seq[HashedDoc]] {
  private def best(xs: Seq[HashedDoc]): Seq[HashedDoc] =
    xs.sortBy(x => (x.fp, x.doc_id)).take(k)
  override def zero: Seq[HashedDoc] = Seq.empty
  override def reduce(b: Seq[HashedDoc], a: HashedDoc): Seq[HashedDoc] = best(b :+ a)
  override def merge(b1: Seq[HashedDoc], b2: Seq[HashedDoc]): Seq[HashedDoc] = best(b1 ++ b2)
  override def finish(r: Seq[HashedDoc]): Seq[HashedDoc] = best(r)
  override def bufferEncoder: Encoder[Seq[HashedDoc]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedDoc]]()
  override def outputEncoder: Encoder[Seq[HashedDoc]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedDoc]]()
}

/** Top-k (tag, cnt) pairs by (cnt desc, tag asc) — trending top-k. */
class TopKCounts(k: Int) extends Aggregator[TagCount, Seq[TagCount], Seq[TagCount]] {
  private def best(xs: Seq[TagCount]): Seq[TagCount] =
    xs.sortBy(t => (-t.cnt, t.tag)).take(k)
  override def zero: Seq[TagCount] = Seq.empty
  override def reduce(b: Seq[TagCount], a: TagCount): Seq[TagCount] = best(b :+ a)
  override def merge(b1: Seq[TagCount], b2: Seq[TagCount]): Seq[TagCount] = best(b1 ++ b2)
  override def finish(r: Seq[TagCount]): Seq[TagCount] = best(r)
  override def bufferEncoder: Encoder[Seq[TagCount]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TagCount]]()
  override def outputEncoder: Encoder[Seq[TagCount]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TagCount]]()
}
