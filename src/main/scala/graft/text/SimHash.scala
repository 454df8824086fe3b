package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: each token's 32-bit hash votes ±1 per
  * bit position, the sign of each bit-sum becomes one fingerprint bit.
  * Near-duplicates land within a small Hamming distance.
  *
  * Computed entirely with higher-order functions over the token array (one
  * `aggregate` per bit, unrolled statically) — per-row, no shuffle, stays
  * inside WholeStageCodegen. Candidate pairing then buckets on fingerprint
  * halves (any pair within Hamming distance ≤ 16 shares at least one exact
  * half), which keeps the join bounded at scale like MinHash banding.
  */
object SimHash {

  val Bits = 32

  /** 32-bit SimHash of a token-array column, as a long. Callers should
    * alias the token array in a prior projection: the per-bit aggregates
    * reference it Bits× and an inlined split() would be re-evaluated per
    * reference (HOFs are codegen-fallback — no runtime CSE).
    */
  def simhash(toks: Column): Column = {
    (0 until Bits).map { b =>
      val bitSum = aggregate(
        toks,
        lit(0L),
        (a, t) => a + when(shiftright(crc32(t), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucket keys: the two 16-bit halves. */
  def halves(fp: Column): Column = array(
    struct(lit(0).as("half_id"), shiftright(fp, 16).as("half")),
    struct(lit(1).as("half_id"), fp.bitwiseAND(0xFFFFL).as("half")))
}
