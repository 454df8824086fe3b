package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** The OTHER physical shape for as-of joins — and the §2.12 demo of the
  * full custom-operator stack (LogicalPlan + planner `Strategy` + custom
  * `SparkPlan` with `doExecute`), complementing the optimizer-rule
  * lowering of [[GraftAsOfJoin]]:
  *
  * The union+window rewrite shuffles the PROBE side on the key. When the
  * build side is small (an as-of against a slowly-changing reference
  * table), that shuffle is the whole cost — at 100 TB it moves the entire
  * event stream to join against megabytes. [[BroadcastAsOfJoinExec]]
  * instead declares a [[BroadcastDistribution]] on the build side (Spark
  * inserts the BroadcastExchange), builds one sorted-per-key index per
  * executor from the broadcast, and answers each probe row with a binary
  * search — the probe side is never exchanged at all, the same trade
  * BroadcastHashJoin makes for equi-joins.
  *
  * Scope (the broadcast case, deliberately minimal): backward direction,
  * single key, no tolerance; key and timestamp must be long-backed
  * (BIGINT / INT / TIMESTAMP / TIMESTAMP_NTZ). Everything else stays on
  * the union+window path, where the optimizer keeps working on the plan.
  */
case class BroadcastAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    probeKey: String,
    probeTs: String,
    buildKey: String,
    buildTs: String,
    outputAttrs: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = outputAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outputAttrs)

  // names-not-expressions: without this ColumnPruning strips the children
  // (same reasoning as GraftAsOfJoin.references)
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastAsOfJoin =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOf {
  private val longBacked =
    Set[org.apache.spark.sql.types.DataType](
      LongType, IntegerType, TimestampType, TimestampNTZType)

  /** Backward as-of against a SMALL build side, executed by the custom
    * broadcast operator — output contract identical to [[AsOf.joinBackward]]
    * (probe columns, nullable build payload, matched ts as `asof_ts`).
    */
  def joinBackwardBroadcast(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String): DataFrame = {
    val lp = Bridge.planOf(probe)
    val rp = Bridge.planOf(build)
    def attr(side: LogicalPlan, n: String, which: String): Attribute =
      side.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n in $which side"))
    val (pk, pt) = (attr(lp, probeKey, "probe"), attr(lp, probeTs, "probe"))
    val (bk, bt) = (attr(rp, buildKey, "build"), attr(rp, buildTs, "build"))
    Seq(pk, pt, bk, bt).foreach(a => require(longBacked(a.dataType),
      s"broadcast as-of needs long-backed key/ts, got ${a.dataType} for ${a.name}"))
    val payload = rp.output.filterNot(a => a.name == buildKey || a.name == buildTs)
    require(payload.map(_.name).toSet.intersect(lp.output.map(_.name).toSet).isEmpty,
      "build payload column names must not clash with probe columns")
    val outs =
      lp.output.map(a => AttributeReference(a.name, a.dataType, a.nullable)()) ++
        payload.map(a => AttributeReference(a.name, a.dataType, nullable = true)()) :+
        AttributeReference("asof_ts", bt.dataType, nullable = true)()
    Bridge.ofRows(probe.sparkSession,
      BroadcastAsOfJoin(lp, rp, probeKey, probeTs, buildKey, buildTs, outs))
  }
}

/** Planner strategy (injected via `GraftExtensions.injectPlannerStrategy`)
  * mapping the logical node to the custom exec.
  */
case class PlanBroadcastAsOf(spark: SparkSession)
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case b: BroadcastAsOfJoin =>
      BroadcastAsOfJoinExec(planLater(b.left), planLater(b.right),
        b.probeKey, b.probeTs, b.buildKey, b.buildTs, b.outputAttrs) :: Nil
    case _ => Nil
  }
}

/** Custom physical operator: broadcast build side → per-executor sorted
  * index → binary-search probe. The probe child keeps whatever
  * partitioning it had (no required distribution), which is the point.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    probeKey: String,
    probeTs: String,
    buildKey: String,
    buildTs: String,
    outputAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = outputAttrs

  // minted outputs are PRODUCED here; without this QueryPlan counts them
  // as unresolved references and prints the node with a "!" marker
  override def producedAttributes: AttributeSet = AttributeSet(outputAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val bSchema = right.output
    val bKeyOrd = bSchema.indexWhere(_.name == buildKey)
    val bTsOrd = bSchema.indexWhere(_.name == buildTs)
    val payloadOrds = bSchema.zipWithIndex
      .filterNot { case (a, _) => a.name == buildKey || a.name == buildTs }
      .map(_._2).toArray
    val payloadTypes = payloadOrds.map(bSchema(_).dataType)
    val pSchema = left.output
    val pKeyOrd = pSchema.indexWhere(_.name == probeKey)
    val pTsOrd = pSchema.indexWhere(_.name == probeTs)
    val pKeyType = pSchema(pKeyOrd).dataType
    val pTsType = pSchema(pTsOrd).dataType
    val bKeyType = bSchema(bKeyOrd).dataType
    val bTsType = bSchema(bTsOrd).dataType
    val bTsDataType = bSchema(bTsOrd).dataType
    val outTypes = (pSchema.map(_.dataType) ++ payloadTypes :+ bTsDataType).toArray

    def asLong(r: InternalRow, ord: Int,
        dt: org.apache.spark.sql.types.DataType): Long = dt match {
      case IntegerType => r.getInt(ord).toLong
      case _ => r.getLong(ord) // LongType / TimestampType / TimestampNTZType
    }

    left.execute().mapPartitions { iter =>
      // one index per task, built lazily from the broadcast: key →
      // (sorted ts array, matching build rows) — O(build) memory, shared
      // via the broadcast block across tasks on the executor
      lazy val index: Map[Long, (Array[Long], Array[InternalRow])] =
        bcast.value.toSeq
          .filterNot(r => r.isNullAt(bKeyOrd) || r.isNullAt(bTsOrd))
          .groupBy(r => asLong(r, bKeyOrd, bKeyType))
          .map { case (k, rows) =>
            val sorted = rows.sortBy(r => asLong(r, bTsOrd, bTsType)).toArray
            (k, (sorted.map(r => asLong(r, bTsOrd, bTsType)), sorted))
          }
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val extraWidth = payloadOrds.length + 1
      iter.map { p =>
        val extra = new GenericInternalRow(extraWidth)
        if (!p.isNullAt(pKeyOrd) && !p.isNullAt(pTsOrd)) {
          index.get(asLong(p, pKeyOrd, pKeyType)).foreach { case (tss, rows) =>
            // binary search: last build ts <= probe ts (backward, inclusive)
            val t = asLong(p, pTsOrd, pTsType)
            var lo = 0; var hi = tss.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tss(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans >= 0) {
              val m = rows(ans)
              var i = 0
              while (i < payloadOrds.length) {
                extra.update(i, m.get(payloadOrds(i), payloadTypes(i)))
                i += 1
              }
              extra.update(extraWidth - 1, asLong(m, bTsOrd, bTsType))
            }
          }
        }
        proj(joined(p, extra))
      }
    }
  }
}
