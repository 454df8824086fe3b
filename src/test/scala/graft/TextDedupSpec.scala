package graft

import graft.text.{MinHash, SimHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MinHash/SimHash properties (SURVEY.md §5.3): determinism, self-similarity,
  * Jaccard estimate bounds, disjoint-docs separation.
  */
class TextDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer internals plans"),
    (4L, "completely different words about spark catalyst optimizer internals plans"), // exact dup of 3
    (5L, "unrelated corpus entry concerning weather patterns rain sun clouds wind")
  ).toDF("doc_id", "text")

  test("exact duplicates get estimated jaccard 1.0") {
    val pairs = MinHash.nearDupPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 3L && b == 4L && j == 1.0 })
  }

  test("near-duplicates are found with high estimated jaccard") {
    val pairs = MinHash.nearDupPairs(docs, "doc_id", "text", minEstJaccard = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nd = pairs.find { case (a, b, _) => a == 1L && b == 2L }
    assert(nd.isDefined && nd.get._3 >= 0.5)
  }

  test("disjoint documents never pair") {
    val pairs = MinHash.nearDupPairs(docs, "doc_id", "text", minEstJaccard = 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.contains((1L, 5L)) && !pairs.contains((3L, 5L)))
  }

  test("signatures are deterministic across evaluations") {
    val s1 = docs.select(MinHash.signature(MinHash.shingles(col("text"))).as("sig")).collect()
    val s2 = docs.select(MinHash.signature(MinHash.shingles(col("text"))).as("sig")).collect()
    assert(s1.map(_.getSeq[Long](0)).toSeq === s2.map(_.getSeq[Long](0)).toSeq)
  }

  test("shingles of short texts are empty, not an error") {
    val short = Seq((1L, "one two")).toDF("doc_id", "text")
    val sh = short.select(MinHash.shingles(col("text"), 3).as("sh")).head.getSeq[String](0)
    assert(sh.isEmpty)
  }

  test("simhash: identical docs share fingerprint; hamming to near-dup is small") {
    val fps = docs.select(col("doc_id"), MinHash.tokenCrcs(col("text")).as("crcs"))
      .select(col("doc_id"), SimHash.simhash(col("crcs")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(3L) === fps(4L))
    val hammingNear = java.lang.Long.bitCount(fps(1L) ^ fps(2L))
    val hammingFar = java.lang.Long.bitCount(fps(1L) ^ fps(5L))
    assert(hammingNear < hammingFar)
  }
}
