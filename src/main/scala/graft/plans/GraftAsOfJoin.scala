package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Custom logical operator for the as-of join family — the §2.12
  * whole-operator extension-point demo: a [[BinaryNode]] users create
  * through [[AsOf.joinBackward]] / [[AsOf.joinForward]] /
  * [[AsOf.joinNearest]] (each optionally toleranced), carried through
  * analysis as a first-class plan node, then lowered by the injected
  * optimizer rule [[RewriteGraftAsOfJoin]] (registered in
  * `graft.GraftExtensions`) into the same single-shuffle union+window form
  * as the `Joins.join_asof*` DSL twins.
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
  * then the matched build timestamp as `asof_ts`. Chaining: to use an
  * as-of output as a new PROBE side, rename its `asof_ts` column first —
  * the name is re-minted by every as-of node.
  *
  * @param direction "backward" (latest build row at-or-before probe ts),
  *                  "forward" (earliest at-or-after), or "nearest"
  *                  (closest in either direction, ties to backward)
  * @param tolerance optional SQL interval text (e.g. "INTERVAL 1 HOUR");
  *                  a candidate farther than this from the probe ts is
  *                  discarded (nulled), not carried — the guard against
  *                  joining stale state
  */
case class GraftAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    probeKeys: Seq[String],
    probeTs: String,
    buildKeys: Seq[String],
    buildTs: String,
    direction: String,
    tolerance: Option[String],
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
      buildKey: String, buildTs: String,
      tolerance: Option[String] = None): DataFrame =
    join(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs, "backward", tolerance)

  def joinForward(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String,
      tolerance: Option[String] = None): DataFrame =
    join(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs, "forward", tolerance)

  def joinNearest(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String,
      tolerance: Option[String] = None): DataFrame =
    join(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs, "nearest", tolerance)

  def join(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String,
      direction: String, tolerance: Option[String]): DataFrame =
    join(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs,
      direction, tolerance)

  /** Composite-key form: real CD2-style entity streams key on
    * (namespace, table, id), not one column — `probeKeys(i)` pairs with
    * `buildKeys(i)`. The lowering shuffles ONCE on the whole key tuple.
    */
  def join(probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], probeTs: String,
      buildKeys: Seq[String], buildTs: String,
      direction: String, tolerance: Option[String]): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction $direction")
    require(probeKeys.nonEmpty && probeKeys.size == buildKeys.size,
      s"probe/build key lists must be non-empty and the same length " +
        s"(got ${probeKeys.size} vs ${buildKeys.size})")
    require(probeKeys.distinct == probeKeys && buildKeys.distinct == buildKeys,
      "duplicate column in as-of key list")
    val lp = Bridge.planOf(probe)
    val rp = Bridge.planOf(build)
    def requireCol(side: LogicalPlan, name: String, which: String): Unit =
      require(side.output.exists(_.name == name), s"no column $name in $which side")
    probeKeys.foreach(requireCol(lp, _, "probe")); requireCol(lp, probeTs, "probe")
    buildKeys.foreach(requireCol(rp, _, "build"))
    val payload = rp.output.filterNot(a => buildKeys.contains(a.name) || a.name == buildTs)
    require(payload.map(_.name).toSet.intersect(lp.output.map(_.name).toSet).isEmpty,
      "build payload column names must not clash with probe columns")
    // Reserved names are checked on the columns the lowering actually
    // touches — probe columns and the build PAYLOAD. The internal tags
    // would collide in the tagged-union frame; "asof_ts" is the minted
    // output column, so a probe or payload column with that name would
    // duplicate it (a build key/ts column named asof_ts is fine — both are
    // excluded from the payload). Chained as-of joins must rename the
    // previous output's asof_ts before using it as a probe.
    val reserved = Set("__is_probe", "__match", "__mb", "__mf", "asof_ts")
    require((lp.output ++ payload).forall(a => !reserved(a.name)),
      s"column names ${reserved.mkString("/")} are reserved by the as-of lowering")
    val buildTsAttr = rp.output.find(_.name == buildTs)
      .getOrElse(throw new IllegalArgumentException(s"no $buildTs in build side"))
    val outs =
      lp.output.map(a => AttributeReference(a.name, a.dataType, a.nullable)()) ++
        payload.map(a => AttributeReference(a.name, a.dataType, nullable = true)()) :+
        AttributeReference("asof_ts", buildTsAttr.dataType, nullable = true)()
    Bridge.ofRows(probe.sparkSession,
      GraftAsOfJoin(lp, rp, probeKeys, probeTs, buildKeys, buildTs,
        direction, tolerance, outs))
  }
}

/** Lowers [[GraftAsOfJoin]] to the tagged-union + window rewrite: ONE
  * shuffle on the key, linear window state, no range explosion — the as-of
  * shape that survives 100 TB. Backward runs `last(ignoreNulls)` over the
  * preceding frame with build rows sorting before probes at equal ts
  * (inclusive `<=`); forward runs `first(ignoreNulls)` over the following
  * frame with probes sorting first (inclusive `>=`); nearest computes both
  * candidates over the SAME partitioning (a second SortExec but still a
  * single Exchange) and picks by interval distance, ties to backward.
  * Tolerance is a post-projection null-out — free at any scale.
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
      .filterNot(n => j.buildKeys.contains(n) || n == j.buildTs)
    // positional pairing: build key i lands in probe key i's column slot
    val keyForProbeCol = j.probeKeys.zip(j.buildKeys).toMap
    val buildSchema = build.schema
    val probeSchema = probe.schema

    // the matched build row travels as ONE struct, carried atomically by a
    // single last/first(ignoreNulls) — carrying payload columns
    // independently would let a NULL payload value in the matched row be
    // replaced by a stale value from an older build row (mixing columns
    // across rows)
    val matchType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "asof_ts", buildSchema(j.buildTs).dataType) +:
        payload.map(p => org.apache.spark.sql.types.StructField(
          p, buildSchema(p).dataType)))

    // common union schema: probe cols (typed nulls on build rows), the
    // build-row struct (null on probe rows), and the probe/build tag that
    // makes equal-ts ordering inclusive in either direction
    val pTagged = probe.select(
      probeCols.map(col) ++ Seq(
        lit(null).cast(matchType).as("__match"),
        lit(1).as("__is_probe")): _*)
    // SQL as-of semantics (r7, found by the broadcast-exec differential):
    // a NULL key or ts can never satisfy `b.key = p.key AND b.ts <= p.ts`,
    // but the window frames would happily match them — null keys group
    // into their own window partition (matching other null-key rows), and
    // a null-ts build row sorts to the frame edge. Drop null build rows
    // before the union; null probes keep their row but match nothing
    // (guarded below).
    val bNotNull = (j.buildKeys :+ j.buildTs).map(col(_).isNotNull).reduce(_ && _)
    val bTagged = build.filter(bNotNull).select(
      probeCols.map {
        case n if keyForProbeCol.contains(n) => col(keyForProbeCol(n)).as(n)
        case n if n == j.probeTs => col(j.buildTs).as(n)
        case n => lit(null).cast(probeSchema(n).dataType).as(n)
      } ++ Seq(
        struct(col(j.buildTs).as("asof_ts") +: payload.map(col): _*).as("__match"),
        lit(0).as("__is_probe")): _*)

    val partKeys = j.probeKeys.map(col)
    // backward frame: build rows (tag 0) sort BEFORE probes at equal ts
    val wB = Window.partitionBy(partKeys: _*)
      .orderBy(col(j.probeTs), col("__is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward frame: probes (tag 1) sort BEFORE build rows at equal ts
    val wF = Window.partitionBy(partKeys: _*)
      .orderBy(col(j.probeTs), col("__is_probe").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val tol = j.tolerance.map(expr)
    // null the whole candidate struct when its ts is farther than the
    // tolerance from the probe ts (direction-appropriate side). Phrased as
    // distance <= tolerance, NOT ts ± tolerance: this rule runs after the
    // optimizer's ReplaceExpressions batch, so a `timestamp - interval`
    // built here would survive as an un-replaced RuntimeReplaceable and
    // fail codegen; `timestamp - timestamp` lowers directly to
    // SubtractTimestamps (codegen-able), and the day-time interval it
    // yields compares fine against an interval literal.
    def guard(m: Column, forward: Boolean): Column = tol match {
      case None => m
      case Some(t) =>
        val mts = m.getField("asof_ts")
        val dist = if (forward) mts - col(j.probeTs) else col(j.probeTs) - mts
        when(m.isNotNull && dist <= t, m)
    }

    val union = pTagged.unionByName(bTagged)
    val matched = j.direction match {
      case "backward" =>
        union.withColumn("__match",
          guard(last(col("__match"), ignoreNulls = true).over(wB), forward = false))
      case "forward" =>
        union.withColumn("__match",
          guard(first(col("__match"), ignoreNulls = true).over(wF), forward = true))
      case "nearest" =>
        // distances compared as NTZ-subtraction intervals (day-time
        // interval is orderable) — no cast through TIMESTAMP, so the
        // tie-break cannot shift under a non-UTC session time zone
        val withBoth = union
          .withColumn("__mb",
            guard(last(col("__match"), ignoreNulls = true).over(wB), forward = false))
          .withColumn("__mf",
            guard(first(col("__match"), ignoreNulls = true).over(wF), forward = true))
        val bts = col("__mb").getField("asof_ts")
        val fts = col("__mf").getField("asof_ts")
        val pickB = col("__mf").isNull ||
          (col("__mb").isNotNull &&
            (col(j.probeTs) - bts) <= (fts - col(j.probeTs)))
        withBoth
          .withColumn("__match", when(pickB, col("__mb")).otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }
    val pNotNull = (j.probeKeys :+ j.probeTs).map(col(_).isNotNull).reduce(_ && _)
    val lowered = matched
      .filter(col("__is_probe") === 1)
      .withColumn("__match", when(pNotNull, col("__match")))
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
