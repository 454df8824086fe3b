package graft

import graft.tools.SketchOracle
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-side sketch replay (graft.tools.SketchOracle) against
  * Spark's REAL BloomFilter / CountMinSketch on random inputs — the
  * certificate that lets `stat_bloom_semi_filter` and
  * `stat_countmin_heavyhitters` carry full DuckDB oracles: if this spec
  * is green, the oracle SQL (which evaluates the same integer math)
  * reproduces the engine's sketch decisions bit-for-bit.
  */
class SketchOracleSpec extends AnyFunSuite {

  test("bloom replay matches BloomFilter.create(100000, 800000) exactly") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100000, 800000)
    val k = SketchOracle.bloomNumHashes(100000, 800000)
    assert(k === 6) // round(8 * ln 2)
    val rnd = new scala.util.Random(3)
    val keys = (1 to 5000).map(_ => rnd.nextLong())
    keys.foreach(bf.putLong)
    val set = keys.flatMap(SketchOracle.bloomPositions(_, 800000, k)).toSet
    def replay(x: Long) = SketchOracle.bloomPositions(x, 800000, k).forall(set)
    // inserted keys: both sides answer true (no false negatives)
    keys.foreach(x => assert(bf.mightContainLong(x) && replay(x)))
    // arbitrary probes (includes negatives): EXACT agreement, false
    // positives included — the replay reproduces the engine's decisions,
    // not just its guarantees
    val probes = (1 to 20000).map(_ => rnd.nextLong()) ++
      (-100L to 100L) ++ keys.map(_ + 1)
    probes.foreach(x =>
      assert(bf.mightContainLong(x) === replay(x), s"disagree on $x"))
  }

  test("count-min replay matches CountMinSketch estimates for strings") {
    val eps = 0.001
    val conf = 0.99
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(eps, conf, 42)
    val depth = SketchOracle.cmDepth(conf)
    val width = SketchOracle.cmWidth(eps)
    assert(depth === cms.depth && width === cms.width)
    val items = Seq("click", "purchase", "error", "signup", "view",
      "x", "abcd", "abcde", "abcdefg", "ütf8-ünïcodé")
    val rnd = new scala.util.Random(7)
    val counts = items.map(s => s -> (rnd.nextInt(1000) + 1).toLong).toMap
    counts.foreach { case (s, n) => cms.addString(s, n) }
    // replay: table[i][bucket] = sum of counts of items landing there
    val cells = scala.collection.mutable.Map.empty[(Int, Int), Long].withDefaultValue(0L)
    counts.foreach { case (s, n) =>
      SketchOracle.cmBuckets(s, depth, width).zipWithIndex.foreach {
        case (b, i) => cells((i, b)) += n
      }
    }
    items.foreach { s =>
      val est = SketchOracle.cmBuckets(s, depth, width).zipWithIndex
        .map { case (b, i) => cells((i, b)) }.min
      assert(cms.estimateCount(s) === est, s"disagree on $s")
    }
  }

  test("seed only affects the long path: string sketches are seed-independent") {
    val a = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 42)
    val b = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 7)
    Seq("click", "view").foreach { s => a.addString(s); b.addString(s) }
    Seq("click", "view", "zzz").foreach(s =>
      assert(a.estimateCount(s) === b.estimateCount(s)))
  }
}
