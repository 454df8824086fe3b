package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's adjudication arithmetic (VERDICT r12 #1) —
  * the logic every performance claim rests on. These paths can't be
  * exercised by running the bench (a healthy run nominates nothing and a
  * contended one nominates nondeterministically), so the family trigger
  * and the history ring are pinned on synthetic histories here.
  */
class BenchSpec extends AnyFunSuite {

  private def hist(ms: Map[String, Double]*): Seq[Map[String, Double]] = ms.toSeq

  test("family trigger: coordinated sub-2x drift nominates exactly one representative") {
    // every agg_ row at 1.6x its history — no single row crosses the 2x
    // row gate, but the family sum ratio is 1.6 > 1.5 → nominate the
    // worst absolute riser only
    val history = hist(Map(
      "agg_a" -> 0.20, "agg_b" -> 0.30, "agg_c" -> 0.40, "win_x" -> 0.50))
    val ordered = Seq(
      "agg_a" -> 0.32, "agg_b" -> 0.48, "agg_c" -> 0.64, "win_x" -> 0.50)
    val risers = Bench.familyRisers(ordered, history, Set.empty)
    assert(risers.map(_._1) === Seq("agg_c"),
      s"expected the worst absolute riser, got $risers")
  }

  test("family trigger: healthy run and small families nominate nothing") {
    val history = hist(Map(
      "agg_a" -> 0.20, "agg_b" -> 0.30, "agg_c" -> 0.40,
      "ts_a" -> 0.10, "ts_b" -> 0.10))
    // agg_ family flat; ts_ family doubled but has only 2 rows (< 3)
    val ordered = Seq(
      "agg_a" -> 0.21, "agg_b" -> 0.29, "agg_c" -> 0.41,
      "ts_a" -> 0.20, "ts_b" -> 0.20)
    assert(Bench.familyRisers(ordered, history, Set.empty).isEmpty)
  }

  test("family trigger: min across rounds governs — one slow historical round is forgiven") {
    // round1 was contended (family already elevated); round2 is the true
    // floor. Current equals round1 → ratio vs round2 is 1.6 but vs
    // round1 is 1.0 — the MIN ratio must not trigger (current must beat
    // EVERY retained round to be drift, not a repeat of a known-slow one)
    val history = hist(
      Map("agg_a" -> 0.32, "agg_b" -> 0.48, "agg_c" -> 0.64),
      Map("agg_a" -> 0.20, "agg_b" -> 0.30, "agg_c" -> 0.40))
    val ordered = Seq("agg_a" -> 0.32, "agg_b" -> 0.48, "agg_c" -> 0.64)
    assert(Bench.familyRisers(ordered, history, Set.empty).isEmpty)
  }

  test("family trigger: rows already nominated by the row gate are not duplicated") {
    val history = hist(Map(
      "agg_a" -> 0.20, "agg_b" -> 0.30, "agg_c" -> 0.40))
    val ordered = Seq("agg_a" -> 0.32, "agg_b" -> 0.48, "agg_c" -> 0.90)
    // agg_c (the worst riser) is already a row-level suspect → the
    // family nominates the NEXT worst riser instead
    val risers = Bench.familyRisers(ordered, history, Set("agg_c"))
    assert(risers.map(_._1) === Seq("agg_b"))
  }

  test("history ring: write/read roundtrip, depth trim, and detail-file seeding") {
    val dir = java.nio.file.Files.createTempDirectory("graft_benchspec_")
    val hp = dir.resolve("BENCH_HISTORY.json")
    val dp = dir.resolve("BENCH_DETAIL.json")
    // seeding: no history file → the prior detail artifact is the yardstick
    java.nio.file.Files.write(dp,
      """{"metric":"detail","queries":{"q_a":1.5,"q_b":0.25},"sf":"x","failed":[]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val seeded = Bench.readHistory(hp, dp)
    assert(seeded === Seq(Map("q_a" -> 1.5, "q_b" -> 0.25)))
    // roundtrip + trim to historyDepth (oldest dropped)
    val rounds = (1 to 5).map(i => Map("q_a" -> i.toDouble))
    Bench.writeHistory(hp, rounds.takeRight(Bench.historyDepth))
    val back = Bench.readHistory(hp, dp)
    assert(back === Seq(Map("q_a" -> 3.0), Map("q_a" -> 4.0), Map("q_a" -> 5.0)))
    // corrupt history line is skipped, not fatal
    java.nio.file.Files.write(hp,
      "not json\n{\"queries\":{\"q_a\":2.0}}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Bench.readHistory(hp, dp) === Seq(Map("q_a" -> 2.0)))
  }
}
