package graft.tools

/** Driver-side replay of the EXACT hash math inside Spark's two
  * distributed sketches, so their registry rows can carry full DuckDB
  * oracles instead of the "engine-specific sketch" exemption:
  *
  *  - the Bloom runtime-filter pair (`BloomFilterAggregate` /
  *    `BloomFilterMightContain`) builds a V2 `BloomFilter` over long keys:
  *    h1 = Murmur3_x86_32.hashLong(key, 0), h2 = hashLong(key, h1), then
  *    bit positions `combined = h1·2147483647L; repeat k times
  *    { combined += h2; pos = (combined < 0 ? ~combined : combined) mod m }`
  *    (all 64-bit, no wrapping) with k = max(1, round(m/n·ln 2));
  *  - `CountMinSketch` hashes STRING items with the same Murmur3 over
  *    UTF-8 bytes (4-byte little-endian words, then SIGNED tail bytes one
  *    at a time — Spark's own tail, not standard murmur), bucket_i =
  *    |(hash1 + i·hash2) mod width| in wrapping 32-bit arithmetic; the
  *    constructor seed only feeds the LONG path, so string sketches are
  *    seed-independent.
  *
  * Everything here is 32/64-bit integer arithmetic both engines evaluate
  * identically; [[hashLongSql]] emits the same chain as DuckDB lateral
  * column aliases (values tracked as unsigned 32-bit BIGINTs, HUGEINT for
  * the two wrapping multiplies). SketchOracleSpec pins this file against
  * the real `BloomFilter`/`CountMinSketch` classes on random inputs.
  */
object SketchOracle {

  // ---- Murmur3_x86_32, bit-for-bit (Int arithmetic wraps natively) ----

  private def mixK1(k: Int): Int = {
    var k1 = k * 0xcc9e2d51
    k1 = Integer.rotateLeft(k1, 15)
    k1 * 0x1b873593
  }

  private def mixH1(h: Int, k: Int): Int = {
    var h1 = h ^ k
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  private def fmix(h: Int, len: Int): Int = {
    var h1 = h ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^ (h1 >>> 16)
  }

  def hashLong(input: Long, seed: Int): Int = {
    val low = input.toInt
    val high = (input >>> 32).toInt
    var h1 = mixH1(seed, mixK1(low))
    h1 = mixH1(h1, mixK1(high))
    fmix(h1, 8)
  }

  /** Spark's `hashUnsafeBytes`: aligned prefix as 4-byte little-endian
    * words, then each remaining byte SIGN-EXTENDED through a full
    * mixK1/mixH1 round (unlike standard murmur's accumulated tail).
    */
  def hashBytes(b: Array[Byte], seed: Int): Int = {
    val aligned = b.length - b.length % 4
    var h1 = seed
    var i = 0
    while (i < aligned) {
      val word = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(word))
      i += 4
    }
    while (i < b.length) {
      h1 = mixH1(h1, mixK1(b(i))) // signed byte
      i += 1
    }
    fmix(h1, b.length)
  }

  // ---- Bloom (V2) over long keys ----

  /** k = max(1, round(m/n · ln 2)) — BloomFilter.optimalNumOfHashFunctions. */
  def bloomNumHashes(expectedItems: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2))).toInt

  def bloomPositions(key: Long, numBits: Long, k: Int): Seq[Long] = {
    val h1 = hashLong(key, 0)
    val h2 = hashLong(key, h1)
    var combined = h1.toLong * Int.MaxValue
    (0 until k).map { _ =>
      combined += h2.toLong
      (if (combined < 0) ~combined else combined) % numBits
    }
  }

  // ---- Count-Min over string items ----

  def cmWidth(eps: Double): Int = math.ceil(2 / eps).toInt

  def cmDepth(confidence: Double): Int =
    math.ceil(-math.log1p(-confidence) / math.log(2)).toInt

  def cmBuckets(item: String, depth: Int, width: Int): Seq[Int] = {
    val b = item.getBytes("UTF-8")
    val hash1 = hashBytes(b, 0)
    val hash2 = hashBytes(b, hash1)
    (0 until depth).map(i => math.abs((hash1 + i * hash2) % width))
  }

  // ---- SQL generator: hashLong as a chain of one-step projections ----
  //
  // NOT lateral column aliases: DuckDB rewrites those by textual
  // substitution, and every rotate/xor-shift references its input twice,
  // so a 38-step double-hash chain inflates exponentially (the first
  // attempt OOM-killed the gate's DuckDB). As nested subqueries each
  // step's inputs are plain column references — the tree stays linear.

  /** (name, expr) steps computing `hashLong(<low,high>, <seed>)`; every
    * expr references only columns from earlier steps (or the base). All
    * values are unsigned 32-bit carried in BIGINT; the wrapping 32-bit
    * multiplies go through HUGEINT. Returns (steps, result column name).
    */
  def hashLongSteps(pfx: String, lowRef: String, highRef: String,
      seedRef: String): (Seq[(String, String)], String) = {
    def imul32(a: String, b: Long) =
      s"CAST(((($a)::HUGEINT * $b) % 4294967296) AS BIGINT)"
    def rotl(x: String, r: Int) = {
      val hiPart = 1L << (32 - r)
      s"(($x % $hiPart) * ${1L << r} + $x // $hiPart)"
    }
    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def step(name: String, expr: String): String = {
      steps += ((s"$pfx$name", expr)); s"$pfx$name"
    }
    def mixK1(tag: String, in: String): String =
      step(s"${tag}3", imul32(
        step(s"${tag}2", rotl(step(s"${tag}1", imul32(in, 3432918353L)), 15)),
        461845907L))
    def mixH1(tag: String, h: String, k: String): String =
      step(s"${tag}3", s"((${
        step(s"${tag}2", rotl(step(s"${tag}1", s"xor($h, $k)"), 13))
      } * 5 + 3864292196) % 4294967296)")
    val a3 = mixK1("a", lowRef)
    val b3 = mixH1("b", seedRef, a3)
    val c3 = mixK1("c", highRef)
    val d3 = mixH1("d", b3, c3)
    // fmix(h, 8)
    val e1 = step("e1", s"xor($d3, 8)")
    val e2 = step("e2", s"xor($e1, $e1 // 65536)")
    val e3 = step("e3", imul32(e2, 2246822507L))
    val e4 = step("e4", s"xor($e3, $e3 // 8192)")
    val e5 = step("e5", imul32(e4, 3266489909L))
    val e6 = step("e6", s"xor($e5, $e5 // 65536)")
    (steps.toSeq, e6)
  }

  /** Nest `steps` over `base` as one-column-per-level subqueries. */
  def chainSql(base: String, steps: Seq[(String, String)]): String =
    steps.foldLeft(base) { case (acc, (name, expr)) =>
      s"SELECT *, $expr AS $name FROM ($acc)"
    }
}
