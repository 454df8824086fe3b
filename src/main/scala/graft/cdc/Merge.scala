package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge primitives — the reference's reason to exist (SURVEY.md §2.10,
  * §3.1 E2 [DAP]): a keyed change feed `(key…, ts, action ∈ {U,D}, payload…)`
  * folded into a replica with latest-`ts`-wins upserts and delete-wins
  * removal.
  *
  * Scale posture (100 TB replica):
  *  - `latestPerKey` is ONE hash shuffle on the key columns + a
  *    per-partition sort — no global sort, no driver state. With AQE it
  *    absorbs key skew via partition splitting.
  *  - `applyDelta` unions state with the (much smaller) delta and re-folds;
  *    because both sides are keyed identically, pre-partitioned/bucketed
  *    state makes the union fold shuffle-free on the state side. On real
  *    storage this pairs with partition overwrite (`sink_overwrite_snapshot`)
  *    so only partitions containing changed keys rewrite.
  *  - Fold order is total: (`tsCol`, `tiebreak`) — idempotent and
  *    arrival-order independent (property-tested in CdcSpec).
  */
object Merge {

  /** Collapse a change feed to the single latest row per key. */
  def latestPerKey(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col(tiebreak).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The queryable replica view: latest state per key with delete
    * tombstones hidden.
    */
  def snapshot(state: DataFrame, actionCol: String = "action",
      deleteMarker: String = "D"): DataFrame =
    state.filter(col(actionCol) =!= deleteMarker)

  /** One-shot: latest state per key with deletes applied (rows whose final
    * action is `deleteMarker` disappear).
    */
  def fold(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String,
      actionCol: String = "action",
      deleteMarker: String = "D"): DataFrame =
    snapshot(latestPerKey(changes, keys, tsCol, tiebreak), actionCol, deleteMarker)

  /** Fold one incremental batch onto an existing state.
    *
    * The state RETAINS delete rows as tombstones — dropping them would let
    * an out-of-order upsert in a later batch resurrect a key whose delete
    * carried a higher ts (caught by CdcPropertySpec's random-split
    * property). Read through [[snapshot]]; at scale a compaction pass may
    * drop tombstones older than the source's maximum lateness. Equivalent
    * to `latestPerKey` of the concatenated feed for ANY batch split or
    * arrival order, which is what makes re-delivery safe.
    */
  def applyDelta(
      state: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String): DataFrame =
    latestPerKey(state.unionByName(delta), keys, tsCol, tiebreak)
}
