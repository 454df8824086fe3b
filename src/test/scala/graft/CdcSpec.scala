package graft

import graft.cdc.Merge
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** CDC fold semantics (SURVEY.md §5.3): idempotence, delete-wins-latest,
  * arrival-order independence, incremental ≡ one-shot.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (user_id, ts, action, value, event_id)
  private def feed(rows: (Long, String, String, Double, Long)*): DataFrame =
    rows.toSeq.toDF("user_id", "ts_s", "action", "value", "event_id")
      .selectExpr("user_id", "cast(ts_s as timestamp_ntz) as ts", "action", "value", "event_id")

  private val base = feed(
    (1L, "2024-01-01 00:00:00", "U", 1.0, 1L),
    (1L, "2024-01-02 00:00:00", "U", 2.0, 2L),
    (2L, "2024-01-01 00:00:00", "U", 5.0, 3L),
    (2L, "2024-01-03 00:00:00", "D", 0.0, 4L),
    (3L, "2024-01-01 00:00:00", "D", 0.0, 5L),
    (3L, "2024-01-02 00:00:00", "U", 7.0, 6L))

  private def result(df: DataFrame): Set[(Long, Double, Long)] =
    Merge.fold(df, Seq("user_id"), "ts", "event_id")
      .select("user_id", "value", "event_id").as[(Long, Double, Long)]
      .collect().toSet

  test("latest upsert wins, deletes remove, re-upsert after delete survives") {
    assert(result(base) === Set((1L, 2.0, 2L), (3L, 7.0, 6L)))
  }

  test("fold is idempotent: folding the fold changes nothing") {
    val once = Merge.fold(base, Seq("user_id"), "ts", "event_id")
    val twice = Merge.fold(once, Seq("user_id"), "ts", "event_id")
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("arrival order within the feed does not matter") {
    val shuffled = base.orderBy(org.apache.spark.sql.functions.col("event_id").desc)
    assert(result(base) === result(shuffled))
  }

  test("incremental applyDelta equals one-shot fold of the whole feed") {
    val d1 = base.filter($"event_id" <= 3)
    val d2 = base.filter($"event_id" > 3)
    // state keeps tombstones (latestPerKey); snapshot drops them at read
    val incremental = Merge.snapshot(Merge.applyDelta(
      Merge.latestPerKey(d1, Seq("user_id"), "ts", "event_id"),
      d2, Seq("user_id"), "ts", "event_id"))
    assert(incremental.select("user_id", "value", "event_id").as[(Long, Double, Long)]
      .collect().toSet === result(base))
  }

  test("re-delivering the same delta is a no-op (exactly-once effect)") {
    val once = Merge.applyDelta(base.limit(0), base, Seq("user_id"), "ts", "event_id")
    val redelivered = Merge.applyDelta(once, base, Seq("user_id"), "ts", "event_id")
    assert(once.collect().toSet === redelivered.collect().toSet)
  }

  test("tombstone retention: an out-of-order late upsert cannot resurrect a newer delete") {
    // delete at ts 2024-01-03 arrives in batch 1; an upsert at 01-02
    // (older!) arrives in batch 2 — the key must stay deleted
    val d1 = feed((7L, "2024-01-03 00:00:00", "D", 0.0, 2L))
    val late = feed((7L, "2024-01-02 00:00:00", "U", 9.9, 1L))
    val state = Merge.applyDelta(
      Merge.latestPerKey(d1, Seq("user_id"), "ts", "event_id"),
      late, Seq("user_id"), "ts", "event_id")
    assert(Merge.snapshot(state).filter($"user_id" === 7L).count() === 0L)
  }

  test("ties on ts break by tiebreak column (higher event_id wins)") {
    val tied = feed(
      (9L, "2024-01-01 00:00:00", "U", 1.0, 10L),
      (9L, "2024-01-01 00:00:00", "U", 2.0, 11L))
    assert(result(tied) === Set((9L, 2.0, 11L)))
  }

  test("empty delta leaves state unchanged") {
    val state = Merge.fold(base, Seq("user_id"), "ts", "event_id")
    val after = Merge.applyDelta(state, base.limit(0), Seq("user_id"), "ts", "event_id")
    assert(state.collect().toSet === after.collect().toSet)
  }

  test("restart idempotence: crash between land and cursor advance re-pulls safely") {
    // the pipeline_dap_replica contract: cursor advances ONLY after the
    // replica lands. Simulate the crash window — batch applied and landed,
    // process dies BEFORE advance, restart re-pulls the same batch (cursor
    // still at the old position) and applies it AGAIN on top of the landed
    // state. Final snapshot must equal the clean single-delivery run.
    val dir = graft.util.tempDir("graft_cdc_restart_")
    val cursor = new graft.cdc.Cursor(s"$dir/cursor")
    val d1 = base.filter($"event_id" <= 3)
    val d2 = base.filter($"event_id" > 3)

    // poll 1: clean — land, then advance
    val s1 = Merge.applyDelta(base.limit(0), d1, Seq("user_id"), "ts", "event_id")
    s1.write.mode("overwrite").parquet(s"$dir/gen1")
    cursor.advance(1L)

    // poll 2: d2 lands but the process crashes before advance
    val landed1 = spark.read.parquet(s"$dir/gen1")
    Merge.applyDelta(landed1, d2, Seq("user_id"), "ts", "event_id")
      .write.mode("overwrite").parquet(s"$dir/gen2")
    assert(cursor.read() === Some(1L), "crash before advance: cursor unchanged")

    // restart: cursor says d2 not yet synced → re-pull d2, apply onto the
    // ALREADY-APPLIED landed state, land, advance
    val landed2 = spark.read.parquet(s"$dir/gen2")
    val recovered = Merge.applyDelta(landed2, d2, Seq("user_id"), "ts", "event_id")
    recovered.write.mode("overwrite").parquet(s"$dir/gen3")
    cursor.advance(2L)

    val clean = Merge.fold(base, Seq("user_id"), "ts", "event_id")
      .select("user_id", "value", "event_id").as[(Long, Double, Long)].collect().toSet
    val rec = Merge.snapshot(spark.read.parquet(s"$dir/gen3"))
      .select("user_id", "value", "event_id").as[(Long, Double, Long)].collect().toSet
    assert(rec === clean)
    assert(cursor.read() === Some(2L))
  }

  test("column diff keys are exactly the reconcile's 'changed' keys") {
    // the column-level diff and the row-level reconcile must agree on WHICH
    // keys drifted: a key appears in cdc_column_diff iff the reconcile
    // classifies it 'changed' (both sides present, payload differs)
    val dir = SparkTestBase.sfDir
    val diffKeys = SparkEntry.queries("cdc_column_diff")(spark, dir)
      .select("user_id").as[Long].collect().toSet
    val changedKeys = SparkEntry.queries("cdc_snapshot_reconcile")(spark, dir)
      .filter($"status" === "changed")
      .select("user_id").as[Long].collect().toSet
    assert(diffKeys === changedKeys)
    // and every reported row names at least one changed column from the
    // payload column set
    val cols = SparkEntry.queries("cdc_column_diff")(spark, dir)
      .select("changed_cols").as[String].collect()
    assert(cols.nonEmpty)
    assert(cols.forall(_.split(",").forall(Set("ts", "value", "event_id"))))
  }
}
