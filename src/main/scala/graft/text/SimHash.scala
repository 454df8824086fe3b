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

  /** 32-bit SimHash of a pre-hashed token array (crc32 per token, e.g.
    * [[MinHash.tokenCrcs]]), as a long. Callers must alias the crc array in
    * a prior projection: the Bits per-bit aggregates each traverse it, and
    * HOFs are codegen-fallback (no runtime CSE) — hashing inline would
    * re-run crc32 Bits× per token.
    */
  def simhash(crcs: Column): Column = {
    (0 until Bits).map { b =>
      val bitSum = aggregate(
        crcs,
        lit(0L),
        (a, c) => a + when(shiftright(c, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucket keys: the two 16-bit halves. */
  def halves(fp: Column): Column = array(
    struct(lit(0).as("half_id"), shiftright(fp, 16).as("half")),
    struct(lit(1).as("half_id"), fp.bitwiseAND(0xFFFFL).as("half")))
}
