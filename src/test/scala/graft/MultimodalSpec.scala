package graft

import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing (SURVEY.md §2.11): the decode step is
  * stubbed, so these assert the Spark-side contract — schema, per-partition
  * batch shape, determinism — the parts that survive a codec swap.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("binary pipeline: one row per doc, byte_len equals text length (ASCII)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("multimodal_binary_pipeline")(spark, dir)
      .select(col("doc_id").as("out_id"), col("byte_len"))
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
    assert(out.count() === docs.count())
    val bad = out.join(docs, col("out_id") === col("doc_id"))
      .filter(col("byte_len") =!= col("text_len"))
    assert(bad.count() === 0)
  }

  test("frame sampling: frame count matches ceil(len/64), deterministic reruns") {
    val out1 = SparkEntry.queries("multimodal_frame_sample")(spark, dir)
    val byDoc = out1.groupBy("doc_id").count()
    val expected = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "cast(ceil(length(text) / 64.0) as long) as exp_frames")
    val mismatched = byDoc.join(expected, "doc_id")
      .filter(org.apache.spark.sql.functions.col("count") =!=
        org.apache.spark.sql.functions.col("exp_frames"))
    assert(mismatched.count() === 0)
    val out2 = SparkEntry.queries("multimodal_frame_sample")(spark, dir)
    assert(out1.collect().toSeq === out2.collect().toSeq)
  }
}
