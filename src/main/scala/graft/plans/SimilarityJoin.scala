package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** A first-class LSH similarity self-join as a Catalyst operator
  * (SURVEY.md §4.2): users declare *what* — "pairs of near-duplicate
  * documents above `threshold`" — and the optimizer owns *how*.
  *
  * `SimilarityJoin(child, mode, threshold)` is a logical node whose
  * child provides `(doc_id, payload)`; [[ExpandSimilarityJoin]],
  * injected via [[graft.functions.GraftExtensions]], rewrites it inside
  * the operator-optimization batch into the banded MinHash-LSH assembly
  * of [[graft.operators.DedupQueries.nearDupPairs]] (signature map →
  * band-bucket self-join → signature screen → exact verification).
  * Because the rewrite happens *inside* the fixed-point batch, the
  * expansion is then itself optimized (pushdown, pruning, join
  * selection) like hand-written code — the node is visible in
  * `df.queryExecution.analyzed`, fully expanded in the optimized plan
  * (pinned in PlanShapeSpec).
  *
  * This is rewrite-to-existing-operators, deliberately: the assembly is
  * pure relational algebra, so lowering to exchanges/aggregates Spark
  * already executes well beats a bespoke `SparkPlan` that would have to
  * re-implement shuffle, codegen, and AQE integration.
  */
case class SimilarityJoin(
    child: LogicalPlan,
    mode: String,
    threshold: Double,
    docId: Attribute,
    payload: Attribute,
    out: Seq[Attribute]) extends UnaryNode {
  override def output: Seq[Attribute] = out
  // `out` is produced here, not drawn from the child — without this the
  // analyzer would flag the output attributes as missing inputs.
  // `docId`/`payload` are constructor Expressions, so they land in
  // `references` automatically: column pruning keeps them alive and any
  // rewrite that would drop them is rejected by the analyzer instead of
  // failing inside the lowering (the node consumes exactly these two
  // child columns, by ExprId rather than by name).
  override def producedAttributes: AttributeSet = AttributeSet(out)
  override protected def withNewChildInternal(newChild: LogicalPlan): SimilarityJoin =
    copy(child = newChild)
}

object SimilarityJoin {
  /** payload = array<string> of tokens — word-3-gram shingle Jaccard
    * (q16b semantics). */
  val WordMode = "word3gram"
  /** payload = string — character-5-gram Jaccard computed in-place, no
    * shingle materialization (q16d semantics). */
  val CharMode = "char5gram"

  private def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("doc_i", LongType)(),
    AttributeReference("doc_j", LongType)(),
    AttributeReference("jac", DoubleType)())

  def wordNearDup(raw: DataFrame, threshold: Double): DataFrame =
    build(raw, WordMode, threshold, payloadName = "toks")
  def charNearDup(raw: DataFrame, threshold: Double): DataFrame =
    build(raw, CharMode, threshold, payloadName = "text")

  /** The doc-id and payload columns are resolved ONCE, at declaration —
    * a child missing them fails here with a clear message, not deep in
    * the optimizer fixed point (they ride the node as Attributes from
    * then on, immune to renames above/below). */
  private def build(raw: DataFrame, mode: String, threshold: Double,
                    payloadName: String): DataFrame = {
    val analyzed = raw.queryExecution.analyzed
    def resolve(name: String): Attribute = analyzed.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"SimilarityJoin($mode) child must provide a `$name` column; " +
        s"got ${analyzed.output.map(_.name).mkString(", ")}"))
    GraftSqlShim.ofRows(raw.sparkSession,
      SimilarityJoin(analyzed, mode, threshold,
        resolve("doc_id"), resolve(payloadName), freshOutput()))
  }
}

/** Lowers [[SimilarityJoin]] to the band-join assembly. Runs in the
  * operator-optimization fixed point (idempotent: the node is consumed
  * by its own rewrite). */
class ExpandSimilarityJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  import graft.operators.DedupQueries
  import graft.functions.{MinHash, TextSim}

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case SimilarityJoin(child, mode, threshold, docId, payload, out) =>
      MinHash.ensureRegistered(spark)
      TextSim.ensureRegistered(spark)
      graft.functions.VecOps.ensureRegistered(spark)
      // normalize to the canonical column names by ExprId: the captured
      // attributes stay valid under renames/pruning of the child
      val payloadName = if (mode == SimilarityJoin.WordMode) "toks" else "text"
      val canonical = Project(Seq(
        Alias(docId, "doc_id")(), Alias(payload, payloadName)()), child)
      val raw = GraftSqlShim.ofRows(spark, canonical)
      val expanded = mode match {
        case SimilarityJoin.WordMode =>
          DedupQueries.nearDupPairs(raw,
            sigCol = call_function(MinHash.sigFnName, graft.functions.TextFunctions.shingles(col("toks"), 3)),
            payloadCol = graft.functions.TextFunctions.shingles(col("toks"), 3),
            jacOf = DedupQueries.arrayJaccard,
            threshold = threshold)
        case SimilarityJoin.CharMode =>
          DedupQueries.nearDupPairs(raw,
            sigCol = call_function(MinHash.charFnName, col("text"), lit(5)),
            payloadCol = col("text"),
            jacOf = (a, b) => call_function(TextSim.jacFnName, a, b, lit(5)),
            threshold = threshold)
        case other =>
          throw new IllegalArgumentException(s"unknown SimilarityJoin mode: $other")
      }
      // the expansion is spliced in AFTER the optimizer's early
      // normalization batches have run, so apply the ones its tree
      // needs: alias removal and hint-to-JoinHint conversion (the
      // merge hints on the signature screen). Deduplicate is avoided
      // at the source (nearDupPairs aggregates instead of distinct).
      val analyzed = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
        org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(
          expanded.queryExecution.analyzed))
      // keep the ExprIds promised at construction so references above
      // the node stay valid
      Project(out.zip(analyzed.output).map { case (o, a) => Alias(a, o.name)(exprId = o.exprId) },
        analyzed)
  }
}
