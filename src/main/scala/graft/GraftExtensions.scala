package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §2.12): installs the
  * engine's native functions into any session at build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Currently: `cosine_sim(array<float>, array<float>) → double` and
  * `simhash_fp(array<bigint>) → bigint`, the codegen'd Catalyst
  * expressions backing the similarity and near-dup tiers. No custom
  * planner strategies are injected — the declared surface never needs one
  * (SURVEY.md §7.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => functions.CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[functions.SimHashFingerprint].getName, "simhash_fp"),
      (exprs: Seq[Expression]) => functions.SimHashFingerprint(exprs(0))))
  }
}
