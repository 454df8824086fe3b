package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, BroadcastMode, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** The OTHER physical shape for as-of joins — and the §2.12 demo of the
  * full custom-operator stack (LogicalPlan + planner `Strategy` + custom
  * `SparkPlan` with `doExecute`), complementing the optimizer-rule
  * lowering of [[GraftAsOfJoin]]:
  *
  * The union+window rewrite shuffles the PROBE side on the key. When the
  * build side is small (an as-of against a slowly-changing reference
  * table), that shuffle is the whole cost — at 100 TB it moves the entire
  * event stream to join against megabytes. [[BroadcastAsOfJoinExec]]
  * instead declares a [[BroadcastDistribution]] with a CUSTOM
  * [[BroadcastMode]] ([[AsOfIndexMode]]): the BroadcastExchange Spark
  * inserts runs the mode's `transform` ONCE on the driver, which filters
  * null keys and sorts the build rows by (key…, ts) right there — the
  * broadcast ships in binary-search order. (`BroadcastExchangeExec` only
  * accepts `Array[InternalRow]` or the sealed `HashedRelation` as
  * transform results, so the sorted array IS the wire format.) Each
  * executor then extracts the primitive key/ts columns for cache-friendly
  * search in ONE O(n) pass, memoized per broadcast id
  * ([[AsOfIndexCache]]) — tasks after the first do zero build work, and
  * the probe side is never exchanged at all.
  *
  * Scope: the FULL direction matrix (backward / forward / nearest),
  * single or COMPOSITE key, optional max-gap TOLERANCE; keys and
  * timestamps must be long-backed (BIGINT / INT / TIMESTAMP /
  * TIMESTAMP_NTZ). The union+window lowering remains the shape for a
  * LARGE build side, where broadcasting is not an option.
  */
case class BroadcastAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    probeKeys: Seq[String],
    probeTs: String,
    buildKeys: Seq[String],
    buildTs: String,
    direction: String, // backward | forward | nearest
    toleranceMicros: Option[Long],
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
    Set[DataType](LongType, IntegerType, TimestampType, TimestampNTZType)

  /** Backward as-of against a SMALL build side, executed by the custom
    * broadcast operator — output contract identical to [[AsOf.joinBackward]]
    * (probe columns, nullable build payload, matched ts as `asof_ts`).
    */
  def joinBackwardBroadcast(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String): DataFrame =
    joinBackwardBroadcast(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs)

  /** Composite-key variant: CD2-style entity streams key on a TUPLE
    * (namespace, table, id); all key legs must be long-backed.
    */
  def joinBackwardBroadcast(probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], probeTs: String,
      buildKeys: Seq[String], buildTs: String): DataFrame =
    join(probe, build, probeKeys, probeTs, buildKeys, buildTs, "backward")

  /** Backward as-of with a max-gap tolerance (pandas merge_asof style):
    * a match farther than `toleranceMicros` behind the probe is nulled —
    * applied INSIDE the exec right after the binary search, so the
    * broadcast path keeps its zero-probe-shuffle shape. Long-backed ts
    * columns are micros (TIMESTAMP/_NTZ) or raw longs.
    */
  def joinBackwardToleranceBroadcast(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String, toleranceMicros: Long): DataFrame =
    join(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs,
      "backward", tolerance = Some(toleranceMicros))

  /** Forward as-of (EARLIEST build row at-or-after each probe, inclusive)
    * through the same exec: the prebuilt (key…, ts)-sorted index answers
    * forward probes with a lower-bound search — same zero-probe-shuffle
    * shape, mirror semantics of [[AsOf.joinForward]].
    */
  def joinForwardBroadcast(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String): DataFrame =
    join(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs, "forward")

  /** Nearest as-of (closest build row in EITHER direction, ties to the
    * at-or-before side) through the same exec: one backward and one
    * forward binary search over the same prebuilt index per probe.
    */
  def joinNearestBroadcast(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String,
      buildKey: String, buildTs: String): DataFrame =
    join(probe, build, Seq(probeKey), probeTs, Seq(buildKey), buildTs, "nearest")

  private def join(probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], probeTs: String,
      buildKeys: Seq[String], buildTs: String, direction: String,
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction $direction")
    require(probeKeys.nonEmpty && probeKeys.length == buildKeys.length,
      s"probe/build key lists must be same non-zero length, got $probeKeys vs $buildKeys")
    require(probeKeys.distinct.length == probeKeys.length &&
      buildKeys.distinct.length == buildKeys.length, "duplicate key columns")
    val lp = Bridge.planOf(probe)
    val rp = Bridge.planOf(build)
    def attr(side: LogicalPlan, n: String, which: String): Attribute =
      side.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n in $which side"))
    val pks = probeKeys.map(attr(lp, _, "probe"))
    val pt = attr(lp, probeTs, "probe")
    val bks = buildKeys.map(attr(rp, _, "build"))
    val bt = attr(rp, buildTs, "build")
    (pks ++ bks :+ pt :+ bt).foreach(a => require(longBacked(a.dataType),
      s"broadcast as-of needs long-backed key/ts, got ${a.dataType} for ${a.name}"))
    val excluded = buildKeys.toSet + buildTs
    val payload = rp.output.filterNot(a => excluded(a.name))
    require(payload.map(_.name).toSet.intersect(lp.output.map(_.name).toSet).isEmpty,
      "build payload column names must not clash with probe columns")
    val outs =
      lp.output.map(a => AttributeReference(a.name, a.dataType, a.nullable)()) ++
        payload.map(a => AttributeReference(a.name, a.dataType, nullable = true)()) :+
        AttributeReference("asof_ts", bt.dataType, nullable = true)()
    Bridge.ofRows(probe.sparkSession,
      BroadcastAsOfJoin(lp, rp, probeKeys, probeTs, buildKeys, buildTs, direction,
        tolerance, outs))
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
        b.probeKeys, b.probeTs, b.buildKeys, b.buildTs, b.direction,
        b.toleranceMicros, b.outputAttrs) :: Nil
    case _ => Nil
  }
}

/** Custom [[BroadcastMode]]: runs ONCE on the driver inside the
  * BroadcastExchange. Drops null-key/null-ts build rows (they can never
  * match) and sorts the survivors lexicographically by (key legs…, ts) —
  * so the broadcast arrives in binary-search order and executors never
  * sort or group anything.
  */
case class AsOfIndexMode(
    keyOrds: Seq[Int], keyTypes: Seq[DataType],
    tsOrd: Int, tsType: DataType) extends BroadcastMode {

  override def canonicalized: BroadcastMode = this

  override def transform(rows: Array[InternalRow]): Array[InternalRow] =
    transform(rows.iterator, None)

  override def transform(
      rows: Iterator[InternalRow], sizeHint: Option[Long]): Array[InternalRow] = {
    val kOrds = keyOrds.toArray
    val kTypes = keyTypes.toArray
    val kept = rows.filterNot(r =>
        r.isNullAt(tsOrd) || kOrds.exists(r.isNullAt))
      .map(_.copy()).toArray
    val ord = new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < kOrds.length) {
          val c = java.lang.Long.compare(
            AsOfIndexMode.asLong(a, kOrds(i), kTypes(i)),
            AsOfIndexMode.asLong(b, kOrds(i), kTypes(i)))
          if (c != 0) return c
          i += 1
        }
        java.lang.Long.compare(
          AsOfIndexMode.asLong(a, tsOrd, tsType),
          AsOfIndexMode.asLong(b, tsOrd, tsType))
      }
    }
    java.util.Arrays.sort(kept, ord)
    kept
  }
}

object AsOfIndexMode {
  def asLong(r: InternalRow, ord: Int, dt: DataType): Long = dt match {
    case IntegerType => r.getInt(ord).toLong
    case _ => r.getLong(ord) // LongType / TimestampType / TimestampNTZType
  }
}

/** Executor-side search structure over the (key…, ts)-sorted broadcast:
  * primitive per-leg key columns + ts column for cache-friendly binary
  * search, plus the row array for payload extraction. Built in one O(n)
  * pass — no sorting, no hashing.
  */
final class AsOfIdx(
    val keyCols: Array[Array[Long]], val tss: Array[Long],
    val rows: Array[InternalRow]) {

  /** Largest i with keys(i) == probe && tss(i) <= t, else -1. One
    * lexicographic upper-bound search over (keys…, ts); rows of one key
    * are contiguous, so the found row either carries the probe key (a
    * match) or the probe key is absent/all-later.
    */
  def lookup(probe: Array[Long], t: Long): Int = {
    // we want the last i whose (keys…, ts) tuple is <= (probe…, t)
    var lo = 0; var hi = tss.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      var c = 0
      var leg = 0
      while (c == 0 && leg < keyCols.length) {
        c = java.lang.Long.compare(keyCols(leg)(mid), probe(leg))
        leg += 1
      }
      if (c == 0) c = java.lang.Long.compare(tss(mid), t)
      if (c <= 0) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0) return -1
    var leg = 0
    while (leg < keyCols.length) {
      if (keyCols(leg)(ans) != probe(leg)) return -1
      leg += 1
    }
    ans
  }

  /** Forward mirror: smallest i with keys(i) == probe && tss(i) >= t,
    * else -1 — a lexicographic lower-bound search.
    */
  def lookupForward(probe: Array[Long], t: Long): Int = {
    // first i whose (keys…, ts) tuple is >= (probe…, t)
    var lo = 0; var hi = tss.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      var c = 0
      var leg = 0
      while (c == 0 && leg < keyCols.length) {
        c = java.lang.Long.compare(keyCols(leg)(mid), probe(leg))
        leg += 1
      }
      if (c == 0) c = java.lang.Long.compare(tss(mid), t)
      if (c >= 0) { ans = mid; hi = mid - 1 } else lo = mid + 1
    }
    if (ans < 0) return -1
    var leg = 0
    while (leg < keyCols.length) {
      if (keyCols(leg)(ans) != probe(leg)) return -1
      leg += 1
    }
    ans
  }
}

/** Per-executor memo of [[AsOfIdx]] keyed by broadcast id: the O(n)
  * column extraction happens once per executor, not once per task.
  * Bounded: clears wholesale past 64 live broadcasts (the cache only
  * saves a rebuild; correctness never depends on a hit).
  */
object AsOfIndexCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, AsOfIdx]()
  def get(id: Long, build: () => AsOfIdx): AsOfIdx = {
    if (cache.size > 64) cache.clear()
    cache.computeIfAbsent(id, _ => build())
  }
}

/** Custom physical operator: broadcast pre-sorted build rows →
  * per-executor primitive index (memoized) → binary-search probe. The
  * probe child keeps whatever partitioning it had (no required
  * distribution), which is the point.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    probeKeys: Seq[String],
    probeTs: String,
    buildKeys: Seq[String],
    buildTs: String,
    direction: String,
    toleranceMicros: Option[Long],
    outputAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = outputAttrs

  // minted outputs are PRODUCED here; without this QueryPlan counts them
  // as unresolved references and prints the node with a "!" marker
  override def producedAttributes: AttributeSet = AttributeSet(outputAttrs)

  private def buildMode: AsOfIndexMode = {
    val bSchema = right.output
    val kOrds = buildKeys.map(k => bSchema.indexWhere(_.name == k))
    val tsOrd = bSchema.indexWhere(_.name == buildTs)
    AsOfIndexMode(kOrds, kOrds.map(bSchema(_).dataType),
      tsOrd, bSchema(tsOrd).dataType)
  }

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(buildMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val bSchema = right.output
    val bKeyOrds = buildKeys.map(k => bSchema.indexWhere(_.name == k)).toArray
    val bKeyTypes = bKeyOrds.map(bSchema(_).dataType)
    val bTsOrd = bSchema.indexWhere(_.name == buildTs)
    val bTsType = bSchema(bTsOrd).dataType
    val buildKeySet = buildKeys.toSet
    val payloadOrds = bSchema.zipWithIndex
      .filterNot { case (a, _) => buildKeySet(a.name) || a.name == buildTs }
      .map(_._2).toArray
    val payloadTypes = payloadOrds.map(bSchema(_).dataType)
    val pSchema = left.output
    val pKeyOrds = probeKeys.map(k => pSchema.indexWhere(_.name == k)).toArray
    val pKeyTypes = pKeyOrds.map(pSchema(_).dataType)
    val pTsOrd = pSchema.indexWhere(_.name == probeTs)
    val pTsType = pSchema(pTsOrd).dataType
    val outTypes = (pSchema.map(_.dataType) ++ payloadTypes :+ bTsType).toArray

    left.execute().mapPartitions { iter =>
      // rows arrive pre-filtered + pre-sorted (AsOfIndexMode); the one
      // O(n) primitive-column extraction is memoized per executor
      val index = AsOfIndexCache.get(bcast.id, () => {
        val rows = bcast.value
        val keyCols = Array.ofDim[Long](bKeyOrds.length, rows.length)
        val tss = new Array[Long](rows.length)
        var i = 0
        while (i < rows.length) {
          var leg = 0
          while (leg < bKeyOrds.length) {
            keyCols(leg)(i) = AsOfIndexMode.asLong(rows(i), bKeyOrds(leg), bKeyTypes(leg))
            leg += 1
          }
          tss(i) = AsOfIndexMode.asLong(rows(i), bTsOrd, bTsType)
          i += 1
        }
        new AsOfIdx(keyCols, tss, rows)
      })
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val extraWidth = payloadOrds.length + 1
      val probeKs = new Array[Long](pKeyOrds.length) // reused per row
      iter.map { p =>
        val extra = new GenericInternalRow(extraWidth)
        val nullKey = p.isNullAt(pTsOrd) || pKeyOrds.exists(p.isNullAt)
        if (!nullKey) {
          var i = 0
          while (i < pKeyOrds.length) {
            probeKs(i) = AsOfIndexMode.asLong(p, pKeyOrds(i), pKeyTypes(i)); i += 1
          }
          val t = AsOfIndexMode.asLong(p, pTsOrd, pTsType)
          // tolerance: a match farther than the max gap is no match
          def gated(found: Int, fwd: Boolean): Int =
            if (found >= 0 && toleranceMicros.exists(tol =>
                (if (fwd) index.tss(found) - t else t - index.tss(found)) > tol))
              -1 else found
          val ans = direction match {
            case "backward" => gated(index.lookup(probeKs, t), fwd = false)
            case "forward" => gated(index.lookupForward(probeKs, t), fwd = true)
            case _ => // nearest: both searches, closer wins, ties backward
              val b = gated(index.lookup(probeKs, t), fwd = false)
              val f = gated(index.lookupForward(probeKs, t), fwd = true)
              if (f < 0) b
              else if (b < 0) f
              else if (t - index.tss(b) <= index.tss(f) - t) b else f
          }
          if (ans >= 0) {
            val m = index.rows(ans)
            var j = 0
            while (j < payloadOrds.length) {
              extra.update(j, m.get(payloadOrds(j), payloadTypes(j)))
              j += 1
            }
            // copy with the DECLARED type: an INT build ts must land as a
            // boxed Integer or the UnsafeProjection's getInt throws CCE
            extra.update(extraWidth - 1, m.get(bTsOrd, bTsType))
          }
        }
        proj(joined(p, extra))
      }
    }
  }
}
