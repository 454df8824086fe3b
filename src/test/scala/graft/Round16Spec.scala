package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 invariants over the full index-maintenance loop: the
  * converged graph's serving path must reach the index's measured
  * recall (r15 verdict #1), the online insert must not decay vs a
  * rebuild (r15 verdict #2), the delete repair must beat naive
  * edge-dropping and hold a post-delete floor, the compaction sweep
  * may only improve the churned graph, and a second churn cycle over
  * the compacted graph must not collapse — plus the BPE budget rows'
  * real-token divergence pins. Metric conventions follow Round15Spec:
  * recall@k = |answer ∩ exact top-5| / k, averaged over the query
  * subset (restricted to survivors where deletes apply).
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

  /** Exact top-5 among SURVIVORS of the given delete predicate (deleted
    * vectors can be neither queries nor neighbors post-delete),
    * brute-forced independently of every graph path — the reference
    * truth of the delete, compact and churn-cycle tests.
    */
  private def exactTop5(surviving: org.apache.spark.sql.Column)
      : Map[Long, Set[Long]] = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("emb"))
      .filter(surviving)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qe"))
    val scored = q.crossJoin(
        emb.select(col("vec_id").as("nid"), col("emb").as("ce")))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        expr("""aggregate(zip_with(qe, ce, (a, b) -> CAST(a AS DOUBLE) * b),
               |CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
               |/ (sqrt(aggregate(transform(qe, a -> CAST(a AS DOUBLE) * a),
               |        CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))
               |   * sqrt(aggregate(transform(ce, a -> CAST(a AS DOUBLE) * a),
               |          CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)))""".stripMargin.replace("\n", " ")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))))
      .filter(col("rn") <= 5)
    scored.select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSet }
  }

  private lazy val exactSurv: Map[Long, Set[Long]] =
    exactTop5(col("vec_id") % 37 =!= 5)

  /** recall@3 vs an exact survivor truth — the Round15Spec convention
    * restricted to the surviving corpus.
    */
  private def recVs(truth: Map[Long, Set[Long]])(
      g: Map[Long, Set[Long]]): Double = {
    val rs = truth.map { case (qq, ex) =>
      g.getOrElse(qq, Set.empty).intersect(ex).size.toDouble / 3 }
    rs.sum / rs.size
  }

  private def recSurv(g: Map[Long, Set[Long]]): Double = recVs(exactSurv)(g)

  test("sim_knn_graph_delete: the repair pass heals what naive edge-dropping loses") {
    def rec(g: Map[Long, Set[Long]]): Double = recSurv(g)
    val repaired = adjacency("sim_knn_graph_delete")
    val dropOnly = ops.SimOps.deleteDropOnlyProbe(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSet }
    val (rRep, rDrop) = (rec(repaired), rec(dropOnly))
    // the repair may only help — it adds candidates to an exact re-rank
    assert(rRep >= rDrop,
      s"repair recall $rRep below drop-only $rDrop — repair hurt the index")
    // and the repaired index must stay near the pre-delete build's
    // quality (the converged graph's 0.80 at sf0.001): deletion of a
    // ~2.7% batch must not crater the survivors' answers
    assert(rRep >= 0.70, s"post-delete recall $rRep below 0.70 floor")
    // the repair actually fired: some survivor's answer differs from
    // the drop-only graph (the fixture always routes some query's
    // neighborhood through a deleted node at this delete rate)
    assert(repaired !== dropOnly,
      "repair changed nothing — no query routed through the delete set")
  }

  test("sim_knn_graph_compact: one refinement sweep over the churned graph only improves it") {
    // the compaction sweep exact-re-ranks a SUPERSET of each node's
    // repaired edges (g ∪ neighbors-of-neighbors), so against the same
    // survivor truth its recall cannot drop below the repaired graph's —
    // and it must hold the post-delete quality floor. This is the
    // HNSW-compaction done-bar: periodic maintenance may never make the
    // index worse than the churned state it heals.
    val rRep = recSurv(adjacency("sim_knn_graph_delete"))
    val rComp = recSurv(adjacency("sim_knn_graph_compact"))
    assert(rComp >= rRep,
      s"compacted recall $rComp below repaired $rRep — the sweep hurt the graph")
    assert(rComp >= 0.70, s"compacted recall $rComp below 0.70 floor")
  }

  test("sim_knn_graph_churn_cycle: a second delete batch over the compacted graph does not collapse quality") {
    // the loop claim: repair-per-batch with periodic compaction keeps
    // quality bounded as churn accumulates. Truth = exact top-5 among
    // survivors of BOTH batches; the cycle-2 repaired answers must hold
    // the same no-collapse floor the cycle-1 repair held, with no
    // compaction yet applied to cycle 2 (the realistic cadence: repairs
    // accumulate between sweeps).
    val truth2 = exactTop5(col("vec_id") % 37 =!= 5 && col("vec_id") % 41 =!= 7)
    val rChurn = recVs(truth2)(adjacency("sim_knn_graph_churn_cycle"))
    val dropOnly = ops.SimOps.churnDropOnlyProbe(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSet }
    val rDrop = recVs(truth2)(dropOnly)
    assert(rChurn >= rDrop,
      s"cycle-2 repair recall $rChurn below drop-only $rDrop")
    assert(rChurn >= 0.70, s"cycle-2 recall $rChurn below 0.70 floor")
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

  test("text_pack_sequences_bpe: real subword counts repack the corpus") {
    // the packing analogue of the padding test: bins must partition the
    // ENCODED corpus exactly (token conservation), show strict
    // compression vs the whitespace counts riding along per bin, and
    // actually MOVE the bin boundaries vs packing the same corpus on
    // whitespace counts — otherwise the real tokenizer changed nothing.
    val rows = SparkEntry.queries("text_pack_sequences_bpe")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val totBpe = rows.map(_.getLong(3)).sum
    val totWs = rows.map(_.getLong(4)).sum
    assert(totBpe < totWs, s"BPE total $totBpe !< whitespace total $totWs")
    val encTot = ops.TextOps.bpeEncodedCorpus(spark, dir)
      .select(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(totBpe === encTot,
      s"bins sum to $totBpe but the encoded corpus holds $encTot tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val wsBins = Tables(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", expr("(cum - tok) div 64"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("n_docs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bpeBins = rows
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bpeBins !== wsBins,
      "BPE packing is identical to whitespace packing — real counts moved nothing")
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
