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
    // seeding: no history file → the prior detail artifact is the
    // yardstick, keyed one round before the current one
    java.nio.file.Files.write(dp,
      """{"metric":"detail","queries":{"q_a":1.5,"q_b":0.25},"sf":"x","failed":[]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val seeded = Bench.readHistory(hp, dp, currentRound = 14)
    assert(seeded === Seq(13 -> Map("q_a" -> 1.5, "q_b" -> 0.25)))
    // ...unless the detail artifact itself carries its round id
    java.nio.file.Files.write(dp,
      """{"metric":"detail","queries":{"q_a":1.5},"sf":"x","failed":[],"round":11}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Bench.readHistory(hp, dp, 14) === Seq(11 -> Map("q_a" -> 1.5)))
    // roundtrip + trim to historyDepth (oldest dropped)
    val rounds = (1 to 5).map(i => i -> Map("q_a" -> i.toDouble))
    Bench.writeHistory(hp, rounds.takeRight(Bench.historyDepth))
    val back = Bench.readHistory(hp, dp, 6)
    assert(back === Seq(3 -> Map("q_a" -> 3.0), 4 -> Map("q_a" -> 4.0),
      5 -> Map("q_a" -> 5.0)))
    // corrupt history line is skipped, not fatal
    java.nio.file.Files.write(hp,
      "not json\n{\"round\":2,\"queries\":{\"q_a\":2.0}}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Bench.readHistory(hp, dp, 3) === Seq(2 -> Map("q_a" -> 2.0)))
  }

  test("history ring keys by ROUND: same-round reruns replace, floor spans 3 distinct rounds (r13 verdict #1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_benchspec_")
    val hp = dir.resolve("BENCH_HISTORY.json")
    val dp = dir.resolve("BENCH_DETAIL.json")
    Bench.writeHistory(hp, Seq(
      12 -> Map("q_a" -> 0.20), 13 -> Map("q_a" -> 0.30)))
    // simulate what runDriverMode does on EVERY round-14 rerun: replace
    // the round-14 entry, never displace 12/13
    def rerun(v: Double): Seq[(Int, Map[String, Double])] = {
      val keyed = Bench.readHistory(hp, dp, 14)
      val next = (keyed.filterNot(_._1 == 14) :+ (14 -> Map("q_a" -> v)))
        .sortBy(_._1).takeRight(Bench.historyDepth)
      Bench.writeHistory(hp, next)
      next
    }
    rerun(0.90); rerun(0.80)
    val after = rerun(0.70)
    assert(after.map(_._1) === Seq(12, 13, 14),
      "three reruns must still span rounds {12,13,14}")
    assert(after.last._2("q_a") === 0.70, "rerun replaces, not appends")
    // the r12 floor survives any number of r14 runs
    assert(after.flatMap(_._2.get("q_a")).min === 0.20)
  }

  test("history ring: legacy unkeyed lines collapse to ONE prior-round entry at the per-query min") {
    val dir = java.nio.file.Files.createTempDirectory("graft_benchspec_")
    val hp = dir.resolve("BENCH_HISTORY.json")
    val dp = dir.resolve("BENCH_DETAIL.json")
    // the pre-r14 ring: three same-round runs, unkeyed
    java.nio.file.Files.write(hp,
      ("""{"queries":{"q_a":0.50,"q_b":1.0}}""" + "\n" +
        """{"queries":{"q_a":0.40,"q_b":1.2}}""" + "\n" +
        """{"queries":{"q_a":0.45}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Bench.readHistory(hp, dp, 14) ===
      Seq(13 -> Map("q_a" -> 0.40, "q_b" -> 1.0)))
  }

  test("mergeRoundEntry: same-round runs merge by per-query min, union of keys") {
    val prev = Map("a" -> 1.0, "b" -> 3.0)
    val now = Map("b" -> 2.0, "c" -> 5.0)
    assert(Bench.mergeRoundEntry(prev, now) ===
      Map("a" -> 1.0, "b" -> 2.0, "c" -> 5.0))
  }

  test("currentRound: driver's closing bench keys as ITS round, not round+1") {
    val dir = java.nio.file.Files.createTempDirectory("graft_benchspec_")
    assert(Bench.currentRound(dir) === 1, "bare checkout is round 1")
    // mid-round builder run: both artifact families closed at 12 → round 13
    java.nio.file.Files.write(dir.resolve("BENCH_r03.json"), Array[Byte]())
    java.nio.file.Files.write(dir.resolve("CORRECTNESS_r12.json"), Array[Byte]())
    java.nio.file.Files.write(dir.resolve("BENCH_r12.json"), Array[Byte]())
    assert(Bench.currentRound(dir) === 13)
    // the r14-verdict self-collision shape: the driver wrote
    // CORRECTNESS_r13 and is NOW running round 13's closing bench —
    // this run must key 13 (the round being written), NOT 14
    java.nio.file.Files.write(dir.resolve("CORRECTNESS_r13.json"), Array[Byte]())
    assert(Bench.currentRound(dir) === 13)
    // once BENCH_r13 lands too, the next run is a round-14 builder run
    java.nio.file.Files.write(dir.resolve("BENCH_r13.json"), Array[Byte]())
    assert(Bench.currentRound(dir) === 14)
  }
}
