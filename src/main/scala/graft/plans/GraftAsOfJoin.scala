package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Custom logical operator for the backward-inclusive as-of join — the
  * §2.12 whole-operator extension-point demo: a [[BinaryNode]] users create
  * through [[AsOf.joinBackward]], carried through analysis as a first-class
  * plan node, then lowered by the injected optimizer rule
  * [[RewriteGraftAsOfJoin]] (registered in `graft.GraftExtensions`) into
  * the same single-shuffle union+window form as `Joins.join_asof`.
  *
  * Why a logical node + `Rule[LogicalPlan]` and NOT a custom `SparkPlan`:
  * the lowering is expressible entirely in relational operators Spark
  * already executes well (union, window, filter), so after the rewrite the
  * optimizer keeps working on it — column pruning, filter pushdown and AQE
  * all apply to the lowered plan. A custom physical operator would freeze
  * that plan shape and forfeit those optimizations; this is the same design
  * Spark itself uses for its pandas-API as-of join (`RewriteAsOfJoin`).
  *
  * Contract: the build side must be unique per (key, ts) — pre-aggregate it
  * (ties at equal ts would otherwise make "latest" nondeterministic).
  * Output: every probe column, then each build payload column (nullable),
  * then the matched build timestamp as `asof_ts`.
  */
case class GraftAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    probeKey: String,
    probeTs: String,
    buildKey: String,
    buildTs: String,
    outputAttrs: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = outputAttrs

  // the output attrs are minted by this node (not forwarded from children):
  // declaring them as produced is what satisfies the analyzer's
  // missing-attribute check
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)

  // key/ts columns are carried as names, not expressions, so the default
  // (expression-derived) references are empty — without this override
  // ColumnPruning concludes the children are entirely unused and prunes
  // them to zero columns before the lowering rule fires
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Constructor API: builds the [[GraftAsOfJoin]] node with freshly minted
  * output attributes (the rule re-aliases the lowered plan back onto these
  * exprIds, so references made against the node's output stay valid).
  */
object AsOf {
  def joinBackward(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String): DataFrame = {
    val lp = Bridge.planOf(probe)
    val rp = Bridge.planOf(build)
    def requireCol(side: LogicalPlan, name: String, which: String): Unit =
      require(side.output.exists(_.name == name), s"no column $name in $which side")
    requireCol(lp, probeKey, "probe"); requireCol(lp, probeTs, "probe")
    requireCol(rp, buildKey, "build")
    val payload = rp.output.filterNot(a => a.name == buildKey || a.name == buildTs)
    require(payload.map(_.name).toSet.intersect(lp.output.map(_.name).toSet).isEmpty,
      "build payload column names must not clash with probe columns")
    // "asof_ts" is reserved too: it is the minted output column, and a build
    // payload with that name would make the lowering's struct carry two
    // "asof_ts" fields — failing late with an ambiguous getField instead of
    // here at construction.
    val reserved = Set("__is_probe", "__asof_ts", "__match", "asof_ts")
    require((lp.output ++ rp.output).forall(a => !reserved(a.name)),
      s"column names ${reserved.mkString("/")} are reserved by the as-of lowering")
    val buildTsAttr = rp.output.find(_.name == buildTs)
      .getOrElse(throw new IllegalArgumentException(s"no $buildTs in build side"))
    val outs =
      lp.output.map(a => AttributeReference(a.name, a.dataType, a.nullable)()) ++
        payload.map(a => AttributeReference(a.name, a.dataType, nullable = true)()) :+
        AttributeReference("asof_ts", buildTsAttr.dataType, nullable = true)()
    Bridge.ofRows(probe.sparkSession,
      GraftAsOfJoin(lp, rp, probeKey, probeTs, buildKey, buildTs, outs))
  }
}

/** Lowers [[GraftAsOfJoin]] to the tagged-union + running-`last` window
  * rewrite: ONE shuffle on the key, linear window state, no range
  * explosion — the as-of shape that survives 100 TB. Build rows sort
  * before probe rows at equal ts, giving inclusive `<=` semantics.
  */
case class RewriteGraftAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: GraftAsOfJoin => lower(j)
  }

  private def lower(j: GraftAsOfJoin): LogicalPlan = {
    val probe = Bridge.ofRows(spark, j.left)
    val build = Bridge.ofRows(spark, j.right)
    val probeCols = j.left.output.map(_.name)
    val payload = j.right.output.map(_.name)
      .filterNot(n => n == j.buildKey || n == j.buildTs)
    val buildSchema = build.schema
    val probeSchema = probe.schema

    // the matched build row travels as ONE struct, carried atomically by a
    // single last(ignoreNulls) — carrying payload columns independently
    // would let a NULL payload value in the matched row be replaced by a
    // stale value from an older build row (mixing columns across rows)
    val matchType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "asof_ts", buildSchema(j.buildTs).dataType) +:
        payload.map(p => org.apache.spark.sql.types.StructField(
          p, buildSchema(p).dataType)))

    // common union schema: probe cols (typed nulls on build rows), the
    // build-row struct (null on probe rows), and the probe/build tag that
    // makes equal-ts ordering inclusive
    val pTagged = probe.select(
      probeCols.map(col) ++ Seq(
        lit(null).cast(matchType).as("__match"),
        lit(1).as("__is_probe")): _*)
    val bTagged = build.select(
      probeCols.map {
        case n if n == j.probeKey => col(j.buildKey).as(n)
        case n if n == j.probeTs => col(j.buildTs).as(n)
        case n => lit(null).cast(probeSchema(n).dataType).as(n)
      } ++ Seq(
        struct(col(j.buildTs).as("asof_ts") +: payload.map(col): _*).as("__match"),
        lit(0).as("__is_probe")): _*)

    val w = Window.partitionBy(col(j.probeKey))
      .orderBy(col(j.probeTs), col("__is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lowered = pTagged.unionByName(bTagged)
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__is_probe") === 1)
      .select(probeCols.map(col) ++
        payload.map(p => col("__match").getField(p).as(p)) :+
        col("__match").getField("asof_ts").as("asof_ts"): _*)

    // splice back under the node's declared output exprIds so parent
    // operators' attribute references keep resolving
    val analyzed = Bridge.planOf(lowered)
    Project(
      analyzed.output.zip(j.outputAttrs).map { case (a, o) =>
        Alias(a, o.name)(exprId = o.exprId)
      }, analyzed)
  }
}
