package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExprId, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Sum}
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Static determinism gate over registered query plans (VERDICT r8 #5).
  *
  * The r8 `xt_ewma_daily` defect class: a query that EMITS
  * `round(<float-typed order-dependent aggregate>, n)` is nondeterministic
  * whenever partial-aggregate association drift can reach the rounding
  * scale — the drift depends on operand magnitude, not on the code looking
  * innocent, and the failure mode is a hash-flip that only shows up at a
  * scale where some row lands near a boundary. This lint walks each
  * query's ANALYZED plan and flags every `Round` whose input (traced
  * through aliases across Project/Aggregate/Window nodes) contains a
  * `sum`/`avg` over a Float/Double child — the order-dependent IEEE
  * accumulations. Exact accumulations (decimal/integer sums, e.g. the
  * ewma fix's DECIMAL(38,14) kernel chain) pass untouched.
  *
  * Queries where the float sum is PROVEN drift-safe are whitelisted BY
  * NAME with the proof sketch ([[Bounded]]); [[Verify]] runs the lint at
  * dump time, so a new query that reintroduces the pattern un-whitelisted
  * fails its own correctness row loudly instead of shipping a latent
  * hash-flip. The dynamic twin of this gate is PropertySpec's
  * aggregation-order perturbation test.
  */
object DeterminismLint {

  /** Flagged-but-proven queries: name → why the rounded float sum cannot
    * drift across associations at the emission scale. Two proof families
    * recur: (a) BOUNDED-TERM chains — the sum has a small, data-independent
    * term count (replicate counts, day/bucket cells), so drift is ≤ terms·ulp
    * at the operand magnitude, orders below the rounding scale; (b)
    * BOUNDED-MAGNITUDE chains — terms are in [0,1] (ratios, probabilities,
    * normalized weights), so even corpus-sized sums stay ≥6 orders below
    * the rounding scale at double precision.
    */
  val Bounded: Map[String, String] = Map(
    // (r10: the former 10-entry centroid/PCA family is GONE from this list —
    // the shared centroid mean-update is decimal-anchored at CentroidQuant
    // and the PCA power iteration runs on exact integer fixed point
    // (PcVecScale), so those queries now pass the lint on their own plans.)
    // (r12: the search-score family — tx_ranked_search, tx_bm25_search,
    // and their inheritors sim_hybrid_rrf / tx_search_rbo — is GONE: each
    // per-term contribution (a bit-identical cross-engine IEEE chain)
    // quantizes to the TextOps.LogScale 1e12 grid BEFORE the per-doc sum,
    // so the aggregation is an exact long sum and the plans pass the lint
    // on their own.)
    // -- bounded-cardinality cells: the sum ranges over a fixed small grid
    // (buckets/days), not the corpus, with O(1)-magnitude terms.
    "tx_source_js_drift" -> "JS over ≤256-bucket broadcast distributions, probability terms ≤ 1")
    // (tx_source_js_drift stays — deliberately, not as debt: its
    // log2(p/m) argument is a ratio of integer PRODUCTS (2·c·n_r vs
    // c·n_r + r·n_s) whose magnitudes overflow 64-bit integers at extreme
    // corpus scale, so an integer-argument DetLog anchor would trade the
    // scale-free bounded-cell ulp bound for a hard arithmetic ceiling;
    // and grid-quantizing the libm log2 output directly would reintroduce
    // the cross-engine last-ulp instability the DetLog family exists to
    // avoid. The ≤256-cell proof is the stronger position.)
    // (r10: xt_seasonality_strength is anchored — StrengthScale integer
    // moments; safe because stl components are exact-integer divisions,
    // so the quantizing round sees identical operands in both engines.)
    // (r11: the log family — tx_token_entropy, tx_zipf_fit, xt_psi_drift,
    // tx_dsir_weights — is GONE from this list. The r8-r10 rejection
    // argument (quantizing a libm log is only stable up to the engines'
    // libm-ulp disagreement) was defeated by removing libm from the kernel:
    // graft.functions.DetLog spells ln/log2 as one explicit IEEE chain
    // generated identically into the Column graph, the oracle SQL, and the
    // driver Scala, so the quantizing round sees bit-identical operands in
    // every engine and the summed terms are exact integers on the
    // TextOps.LogScale grid.)

  /** Offending expression strings for `df`'s plan, empty when clean or
    * whitelisted. */
  def check(name: String, df: DataFrame): Seq[String] = {
    if (Bounded.contains(name)) return Nil
    val plan = df.queryExecution.analyzed
    // alias map across the whole plan: ExprId → producing expression
    val aliasMap = scala.collection.mutable.Map.empty[ExprId, Expression]
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case a: Alias => aliasMap(a.exprId) = a.child
        case _ =>
      })
    }
    // substitute attributes through the alias map to fixpoint (depth-capped:
    // analyzed-plan attribute graphs are DAGs, the cap only guards surprises)
    def expand(e: Expression): Expression = {
      var cur = e
      var depth = 0
      var changed = true
      while (changed && depth < 20) {
        changed = false
        cur = cur.transform {
          case ar: AttributeReference if aliasMap.contains(ar.exprId) =>
            changed = true
            aliasMap(ar.exprId)
        }
        depth += 1
      }
      cur
    }
    def floatAgg(e: Expression): Boolean = e.collectFirst {
      case ae: AggregateExpression
        if (ae.aggregateFunction match {
          case s: Sum => s.child.dataType == DoubleType ||
            s.child.dataType == FloatType
          case a: Average => a.child.dataType == DoubleType ||
            a.child.dataType == FloatType
          case _ => false
        }) => ae
    }.isDefined
    val rounds = plan.flatMap(node =>
      node.expressions.flatMap(_.collect { case r: Round => r }))
    rounds.filter(r => floatAgg(expand(r.child))).map(_.sql).distinct
  }
}
