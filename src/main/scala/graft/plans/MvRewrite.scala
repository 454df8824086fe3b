package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Materialized-view rewrite (round-14, §2.12): the aggregate-navigator
  * optimization as an injected `Rule[LogicalPlan]` — a query that
  * aggregates the RAW fact table is rewritten, at optimization time and
  * invisibly to its author, to RE-AGGREGATE a registered rollup MV
  * instead. `sink_materialized_rollup` demonstrated the pattern with the
  * consumer pointed at the MV by hand; this is the production version
  * where the OPTIMIZER does the pointing, which is what makes an MV
  * rollout a no-code-change event for every downstream query at 100 TB
  * (the fact scan it removes is the most expensive node in the plan).
  *
  * Soundness contract (deliberately narrow — matching is conservative,
  * a miss costs only performance, a wrong match costs correctness):
  *  - the child must be a BARE scan of the registered fact file
  *    (projections of plain columns allowed, FILTERS not — predicate
  *    containment against the MV's dimensions is future work);
  *  - every grouping expression must be a dimension column the MV
  *    preserves (`l_returnflag`, `l_linestatus`);
  *  - every measure must be one the MV can answer EXACTLY:
  *    `sum(l_quantity)` → `sum(mv.sum_qty)` and `count(*)`/`count(1)` →
  *    `sum(mv.n)`. Quantities are integral, so two-level summation is
  *    bit-exact — the rewrite can never change a result (the DuckDB
  *    oracle computes from the raw fact and still hash-matches).
  *
  * Freshness: registration IS the freshness contract — the MV registers
  * with [[MvRegistry]] for exactly the query batch that trusts it (the
  * registry row registers → forces optimization → clears in `finally`);
  * production would key the registration to the fact's snapshot version
  * and invalidate on commit, same lifecycle as `sink_materialized_rollup`
  * maintenance.
  *
  * Rebinding: the replacement plan is built with the DataFrame API (so it
  * arrives analyzed), then a final [[Project]] re-mints the ORIGINAL
  * output attribute ids — parents of the rewritten Aggregate keep
  * resolving without a re-analysis pass, the standard trick for swapping
  * subplans inside an optimizer rule.
  */
object MvRegistry {
  @volatile private[plans] var registered: Option[(String, String)] = None

  /** Register `mvPath` as the rollup of the fact file whose path ends
    * with `factSuffix`. One registration at a time — the demo contract.
    */
  def register(factSuffix: String, mvPath: String): Unit =
    registered = Some((factSuffix, mvPath))

  def clear(): Unit = registered = None
}

case class RewriteToMaterializedView(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val dims = Set("l_returnflag", "l_linestatus")

  private def factScan(plan: LogicalPlan, suffix: String): Boolean =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.endsWith(suffix))
        case _ => false
      }
      case Project(projList, child) =>
        projList.forall(_.isInstanceOf[AttributeReference]) &&
          factScan(child, suffix)
      case _ => false
    }

  private sealed trait Measure
  private case object SumQty extends Measure
  private case object CountRows extends Measure
  private case class Dim(name: String) extends Measure

  /** Classify one output expression of the Aggregate, or None = bail. */
  private def classify(e: NamedExpression): Option[(Measure, NamedExpression)] =
    e match {
      case a: AttributeReference if dims(a.name) => Some((Dim(a.name), a))
      case al @ Alias(AggregateExpression(Sum(qty: AttributeReference, _), _, false, None, _), _)
          if qty.name == "l_quantity" => Some((SumQty, al))
      case al @ Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _), _) =>
        Some((CountRows, al))
      case al @ Alias(AggregateExpression(Count(Seq()), _, false, None, _), _) =>
        Some((CountRows, al))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    MvRegistry.registered match {
      case None => plan
      case Some((factSuffix, mvPath)) =>
        plan.transformUp {
          case agg @ Aggregate(groupExprs, aggExprs, child, _)
              if factScan(child, factSuffix) &&
                groupExprs.forall {
                  case a: AttributeReference => dims(a.name)
                  case _ => false
                } && aggExprs.forall(e => classify(e).isDefined) =>
            val measures = aggExprs.map(e => classify(e).get)
            val mv = spark.read.parquet(mvPath)
            val grpCols = groupExprs.collect {
              case a: AttributeReference => a.name
            }
            // groupBy().agg() takes measure columns only; a final select
            // restores the full output ordering to match aggExprs exactly
            val measureCols = measures.collect {
              case (SumQty, ne) => sum(col("sum_qty")).as(ne.name)
              case (CountRows, ne) => sum(col("n")).as(ne.name)
            }
            // Dims-only aggregate (e.g. SELECT DISTINCT dims FROM fact):
            // no measures to re-aggregate — the MV's dimension tuples are
            // exactly the distinct set (ADVICE r14: measureCols.head on an
            // empty seq used to throw inside the optimizer here).
            val aggDf =
              if (measureCols.isEmpty) mv.select(grpCols.map(col): _*).distinct()
              else if (grpCols.isEmpty) mv.agg(measureCols.head, measureCols.tail: _*)
              else mv.groupBy(grpCols.map(col): _*)
                .agg(measureCols.head, measureCols.tail: _*)
            val ordered = aggDf.select(measures.map {
              case (Dim(n), _) => col(n)
              case (_, ne) => col(ne.name)
            }: _*)
            val newPlan = Bridge.planOf(ordered)
            logInfo(s"rewrote Aggregate over $factSuffix to MV at $mvPath")
            Project(newPlan.output.zip(agg.output).map { case (n, o) =>
              Alias(n, o.name)(exprId = o.exprId)
            }, newPlan)
        }
    }
}
