package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: each token's 64-bit hash votes ±1 per
  * bit position, the sign of each bit-sum becomes one fingerprint bit.
  * Near-duplicates land within a small Hamming distance.
  *
  * Computed entirely with higher-order functions over the token array (one
  * `aggregate` per bit, unrolled statically) — per-row, no shuffle, stays
  * inside WholeStageCodegen. Candidate pairing buckets on [[bands]]: by
  * pigeonhole, k+1 bands guarantee FULL recall for Hamming distance ≤ k
  * (≤ k differing bits cannot touch all k+1 bands, so at least one band is
  * bit-identical on both sides). The default 7 bands cover the d ≤ 6
  * near-dup threshold exactly.
  *
  * The fingerprint is 64-bit (not 32) deliberately: band width is
  * Bits/NBands, and 7 bands over 32 bits would leave 4–5-bit bands (≤ 32
  * buckets — effectively all-pairs blocking at scale), while 9–10-bit
  * bands give 512–1024 buckets. A wider fingerprint is also more
  * discriminative: expected Hamming distance between unrelated docs
  * concentrates near Bits/2, so a fixed d ≤ 6 threshold admits far fewer
  * false candidates at 64 bits.
  */
object SimHash {

  val Bits = 64

  /** Fingerprint width of the PORTABLE family (see [[portableTokenHashes]]):
    * two 31-bit character folds concatenated give a 62-bit token hash, so
    * votes exist for bits 0..61 only. 62 = 2·31 keeps the SWAR lane packing
    * in [[fingerprints]] intact (31 packed sums of 2 lanes).
    */
  val PortableBits = 62

  /** Max Hamming distance with guaranteed candidate recall under the
    * default banding (`NBands` − 1, by pigeonhole).
    */
  val GuaranteedHamming = 6

  val NBands: Int = GuaranteedHamming + 1

  /** Per-token 64-bit hashes (xxhash64) — the voting input for [[simhash]].
    * Callers must alias this array in its own projection (HOFs are
    * codegen-fallback, no runtime CSE: hashing inline would re-run xxhash64
    * Bits× per token).
    */
  def tokenHashes(text: Column): Column =
    transform(split(text, " "), t => xxhash64(t))

  /** Portable per-token 62-bit hashes: two independent character folds
    * `fold(acc·m + code) mod P` (m = 137 for the high half, 131 for the
    * low), concatenated as `hi·2^31 + lo` — every step is plain integer
    * arithmetic a DuckDB oracle replays bit-for-bit (the same fold family
    * proven on MinHash, `MinHash.portableTokenHashes`). Values stay
    * < P·2^31 + P < 2^62, so no overflow on either engine (DuckDB BIGINT
    * errors on overflow rather than wrapping). Slightly weaker diffusion
    * than xxhash64 per bit, but SimHash only needs per-bit vote balance,
    * and the fold's low bits mix every character.
    */
  def portableTokenHashes(text: Column): Column =
    transform(split(text, " "), { t =>
      // ONE character pass: both folds advance together, packed into ONE
      // long accumulator (hi fold in bits 31..61, lo fold in bits 0..30 —
      // both stay < P < 2^31, so shift/mask unpacks exactly). r6 ran two
      // separate `aggregate` traversals, each re-materializing the char
      // array (HOFs are interpreted, no runtime CSE); a struct accumulator
      // halves the char extraction but allocates a row per step and
      // measured SLOWER — the packed long does ~10 primitive long ops per
      // character with zero allocation, and the final packed value IS the
      // published 62-bit hash (no finish projection).
      // split(t, "") yields the char array in O(len) — the r6 form
      // `substr(t, i, 1)` re-walked the string from position 0 for every
      // character (O(len²) per token, and UTF8String.substring allocates).
      // Values are identical: an empty token folds to 0 either way
      // (split("","") = [""], ascii("") = 0, and (0·m+0) mod P = 0).
      val chars = transform(split(t, ""), ch => ascii(ch).cast("long"))
      aggregate(
        chars,
        lit(0L),
        (acc, c) =>
          shiftleft((shiftright(acc, 31) * 137L + c) % MinHash.P, 31) +
            (acc.bitwiseAND((1L << 31) - 1) * 131L + c) % MinHash.P)
    })

  /** 64-bit SimHash of a pre-hashed token array ([[tokenHashes]]), as a
    * long. One statically-unrolled aggregate per bit; disjoint bit values
    * sum without interaction (bit 63 wraps to the sign bit, which is the
    * intended two's-complement pattern).
    */
  def simhash(hashes: Column): Column = {
    val fp = (0 until Bits).map { b =>
      // a NULL element votes 0, matching the native expression
      // (SimHashFingerprint) and fingerprints(), which both skip nulls —
      // without the guard `otherwise(-1L)` would catch NULL as a down-vote
      val bitSum = aggregate(
        hashes,
        lit(0L),
        (a, c) => a + when(c.isNull, 0L)
          .when(shiftright(c, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    // NULL array → NULL fingerprint (not 0): `when(NULL > 0)` would fall
    // through to otherwise(0L) per bit, silently mapping null input to the
    // all-zeros fingerprint — the native expression is null-propagating
    when(hashes.isNull, lit(null).cast("long")).otherwise(fp)
  }

  /** Fingerprints as a DataFrame op — the scale path. [[simhash]]'s per-row
    * HOF form runs Bits interpreted `aggregate` passes over every token
    * array (HOFs are codegen-fallback); here the token hashes explode into
    * rows and all Bits bit-sums run as ONE codegen'd HashAggregate pass
    * with map-side partial aggregation, so the shuffle carries just Bits
    * longs per (doc × partition). Measured ~10× cheaper at sf0.1.
    */
  def fingerprints(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, bits: Int = Bits,
      hashFn: Column => Column = tokenHashes): org.apache.spark.sql.DataFrame = {
    require(bits % 2 == 0, s"bits must be even for 2-lane packing: $bits")
    // SWAR lane packing: 2 bit-counters per aggregate long (32-bit lanes),
    // so the HashAggregate keeps 32 buffers instead of 64 — smaller
    // generated code (cold janino compile was the dominant cost) and the
    // same one-pass shape. 32-bit lanes were chosen over 16-bit ones
    // (which would halve the buffers again) because a 16-bit counter
    // silently wraps at 65 536 tokens — corrupt fingerprints with no error,
    // and million-token documents are plausible in a 100 TB corpus. A
    // 32-bit lane is safe to 2^31 tokens/doc. The per-bit vote
    // `bitSum > 0` is equivalent to `2·ones > n`.
    val lanes = 2
    val laneBits = 32
    val nSums = bits / lanes
    val tok = df.select(col(idCol).as("doc"),
      explode_outer(hashFn(col(textCol))).as("h"))
    val packed = (0 until nSums).map { g =>
      val e = (0 until lanes).map { j =>
        shiftleft(shiftright(col("h"), g * lanes + j).bitwiseAND(1), laneBits * j)
      }.reduce(_ + _)
      sum(e).as(s"p$g")
    }
    // final unpack runs as ONE small interpreted HOF over the packed-lane
    // array instead of Bits codegen'd when()s: the projection sees one row
    // per doc (interpreted eval is noise there), while the 64-term codegen
    // variant doubled the operator's cold janino compile time (measured
    // 3.3 s → 1.6 s cold at sf0.1, identical warm)
    tok.groupBy(col("doc")).agg(count(col("h")).as("n"), packed: _*)
      .withColumn("arr", array((0 until nSums).map(g => col(s"p$g")): _*))
      // n = 0 can only mean a NULL text (split never yields an empty
      // array), and the native expression returns NULL fp for a NULL token
      // array — keep the two forms bit-for-bit interchangeable on nulls too
      .select(col("doc"), when(col("n") === 0, lit(null).cast("long"))
        .otherwise(expr(
          s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, b) -> acc +
             |  IF((shiftright(element_at(arr, cast(b div $lanes as int) + 1),
             |                 cast((b % $lanes) * $laneBits as int))
             |      & ${(1L << laneBits) - 1}L) * 2 > n,
             |     shiftleft(1L, cast(b as int)), 0L))""".stripMargin)).as("fp"))
  }

  /** LSH bucket keys: `n` contiguous bit-bands of the fingerprint (widths
    * differ by at most one, e.g. 64 bits / 7 bands → 10,9,9,9,9,9,9). A
    * pair within Hamming distance n−1 is guaranteed to collide on ≥ 1 band.
    */
  def bands(fp: Column, n: Int = NBands, bits: Int = Bits): Column = {
    val base = bits / n
    val extra = bits % n // first `extra` bands get one more bit
    val widths = (0 until n).map(i => if (i < extra) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    array((0 until n).map { i =>
      struct(
        lit(i).as("band_id"),
        shiftright(fp, offsets(i)).bitwiseAND((1L << widths(i)) - 1).as("band"))
    }: _*)
  }
}
