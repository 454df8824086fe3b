package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 invariants: the converged graph's serving path must actually
  * reach the index's measured recall (r15 verdict #1), and the online
  * insert path must not degrade the index it maintains vs a full rebuild
  * (r15 verdict #2). Metric conventions follow Round15Spec: recall@k =
  * |answer ∩ exact top-5| / k, averaged over the query subset.
  */
class Round16Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def adjacency(q: String): Map[Long, Set[Long]] =
    SparkEntry.queries(q)(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSet }

  private lazy val exact5 = adjacency("sim_cosine_topk")

  private def recallAt(g: Map[Long, Set[Long]], k: Int): Double = {
    val rs = exact5.map { case (q, ex) =>
      g.getOrElse(q, Set.empty).intersect(ex).size.toDouble / k }
    rs.sum / rs.size
  }

  test("sim_knn_graph_beam_converged: serving the converged index reaches its recall (>= 0.70, strictly above the single-table beam)") {
    // the r15 gap in one number: the single-table beam walks an index
    // whose intrinsic ceiling is ~0.57 (measured walk 0.52), while the
    // converged K=10 index contains 0.80 of the truth but had no
    // serving path. The converged beam must (a) clear the verdict's
    // 0.70 floor — i.e. actually reach the index's content, not just
    // walk a better graph badly — and (b) strictly beat the
    // single-table walk, so the extra build cost provably buys serving
    // recall (measured at sf0.001: 0.80 vs 0.52).
    assert(exact5.nonEmpty)
    val conv = recallAt(adjacency("sim_knn_graph_beam_converged"), 5)
    val single = recallAt(adjacency("sim_knn_graph_beam"), 5)
    assert(conv >= 0.70, s"converged-beam recall@5 $conv below 0.70 floor")
    assert(conv > single,
      s"converged-beam recall $conv does not beat single-table beam $single")
  }

  test("pipeline_padding_waste_bpe: the budget answer measurably changes under real encoder counts") {
    // r14 verdict #3's residual, closed: the whitespace-token audit and
    // the BPE-count audit must NOT agree — merges strictly shrink token
    // counts (Round15Spec pins the compression), so bucket waste
    // fractions shift and docs can re-bin across 64-token boundaries.
    // The ws-audit is recomputed here with the identical formula so the
    // comparison isolates the token-count source as the only variable.
    val bpe = SparkEntry.queries("pipeline_padding_waste_bpe")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5)))
      .toMap
    assert(bpe.nonEmpty)
    // strict compression: BPE tokens < whitespace tokens overall
    val (sumBpe, sumWs) = {
      val t = SparkEntry.queries("pipeline_padding_waste_bpe")(spark, dir)
        .agg(sum(col("sum_tokens")), sum(col("sum_tokens_ws"))).head()
      (t.getLong(0), t.getLong(1))
    }
    assert(sumBpe < sumWs, s"BPE total $sumBpe !< whitespace total $sumWs")
    val ws = Tables(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(size(split(col("text"), " ")).cast("long").as("len"))
      .groupBy((ceil(col("len").cast("double") / 64) * 64).cast("long")
        .as("bucket_len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_tokens"))
      .selectExpr("bucket_len", "n_docs", "sum_tokens",
        """CAST(floor((1.0 - CAST(sum_tokens AS DOUBLE)
          |     / (bucket_len * n_docs)) * 1000000 + 0.5) AS BIGINT)
          |  AS bucket_waste_e6""".stripMargin)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(bpe !== ws,
      "BPE-count audit is identical to the whitespace audit — real counts changed nothing")
  }

  test("sim_knn_graph_insert: online attach stays within epsilon of the full rebuild's recall") {
    // the insert row holds out the query subset, builds the converged
    // graph WITHOUT it, and attaches each holdout vector by beam walk +
    // local adjacency re-rank. The HNSW-insert done-bar (r15 verdict
    // #2): the maintained index must not decay vs rebuilding from
    // scratch — post-insert recall@3 >= rebuild recall@3 − ε. Measured
    // at sf0.001: insert 0.93 vs rebuild 0.80 (the attach walks a beam
    // directly toward each new vector's true neighborhood, so it can
    // exceed the rebuild, whose NN-Descent rounds only see the holdout
    // vector's neighborhood through sampled candidate pools).
    val rebuild = recallAt(adjacency("sim_knn_graph_converge"), 3)
    val insert = recallAt(adjacency("sim_knn_graph_insert"), 3)
    assert(insert >= rebuild - 0.05,
      s"insert recall@3 $insert decayed below rebuild $rebuild - 0.05")
    assert(insert >= 0.70, s"insert recall@3 $insert below 0.70 floor")
  }
}
