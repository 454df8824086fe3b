package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 invariants: the BPE encoder's round-trip guarantee, the beam
  * search's recall floor against the exact top-k, the polygon cell cover's
  * exactness + tightness vs the bbox cover, the token-budget estimator
  * re-checked against REAL encoder counts, and the README operator count
  * generated from the registry.
  */
class Round15Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("text_bpe_encode: decode(encode(text)) == text on the full English fixture") {
    // decode = re-join the token stream and undo the merge glyph. The
    // invariant is only meaningful if the fixture never uses '_' itself —
    // assert that precondition rather than silently filtering.
    val docs = Tables(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("text"))
    assert(docs.filter(col("text").contains("_")).count() === 0,
      "fixture precondition: en corpus must not contain the merge glyph")
    val applied = ops.TextOps.bpeEncodedCorpus(spark, dir)
      .select(col("doc_id"), translate(col("text"), "_", " ").as("decoded"))
    val diverged = docs.join(applied, "doc_id")
      .filter(col("decoded") =!= col("text"))
    assert(docs.count() > 0)
    assert(diverged.count() === 0,
      s"decode(encode(text)) diverged, e.g. ${diverged.limit(1).collect().toSeq}")
    // and the encoder COMPRESSES: merges strictly reduce token counts
    val nOrig = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val nEnc = SparkEntry.queries("text_bpe_encode")(spark, dir)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    assert(nEnc < nOrig, s"encoded $nEnc tokens !< original $nOrig")
  }

  test("token-budget estimator ((len+3) div 4) is within a bounded factor of REAL encoder counts") {
    // r14 verdict #3's second clause: the pipeline budget rows estimate
    // tokens as (length+3)/4; with a real encoder in the registry the
    // estimator's bias is now MEASURED. On the en fixture the whitespace+
    // merge tokenization yields longer tokens than 4 chars, so the
    // estimator overshoots — pin it to a band so a fixture change that
    // breaks the estimator's usefulness fails loudly here.
    val est = Tables(spark, dir, "documents").filter(col("lang") === "en")
      .select(expr("(length(text) + 3) div 4").as("est"))
      .agg(sum(col("est"))).head.getLong(0)
    val real = SparkEntry.queries("text_bpe_encode")(spark, dir)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    val ratio = est.toDouble / real
    assert(ratio >= 0.5 && ratio <= 4.0,
      s"estimator/real ratio $ratio left [0.5, 4.0] (est=$est real=$real)")
  }

  test("sim_knn_graph_beam: recall@5 vs exact sim_cosine_topk clears the floor") {
    val beam = SparkEntry.queries("sim_knn_graph_beam")(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = SparkEntry.queries("sim_cosine_topk")(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    assert(exact.nonEmpty)
    val recalls = exact.map { case (q, ex) =>
      beam.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val avg = recalls.sum / recalls.size
    // the ceiling is the INDEX, not the walk: the one-round NN-Descent
    // graph's own adjacency covers ~0.57 of the exact top-5 at sf0.001
    // (cross-LSH-bucket true neighbors never enter its candidate pool),
    // and the beam recovers nearly all of what the index contains
    // (measured 0.52). Pin (a) an absolute floor below that measurement
    // and (b) that searching the graph beats just READING the query's
    // own top-3 adjacency row — the walk must add value over the index
    // lookup for the build to earn its cost.
    assert(avg >= 0.45, s"beam recall@5 $avg below floor 0.45")
    val adjacency = SparkEntry.queries("sim_knn_graph_nndescent")(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val adjRecalls = exact.map { case (q, ex) =>
      adjacency.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val adjAvg = adjRecalls.sum / adjRecalls.size
    assert(avg > adjAvg,
      s"beam recall $avg does not beat the raw adjacency lookup $adjAvg")
  }

  test("geo_polygon_cell_join: same answer as bbox cover, strictly tighter candidates") {
    val poly = SparkEntry.queries("geo_polygon_cell_join")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    val bbox = SparkEntry.queries("geo_bbox_cover_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(poly.keySet === bbox.keySet && poly.nonEmpty)
    poly.foreach { case (pid, (cand, inside, coverCells, bboxCells)) =>
      val (bcand, binside) = bbox(pid)
      assert(inside === binside, s"pid $pid: refine answers diverge")
      assert(cand <= bcand, s"pid $pid: tightened cover grew candidates")
      assert(coverCells <= bboxCells,
        s"pid $pid: polygon cover $coverCells cells > bbox $bboxCells")
    }
    // the pentagon (pid 1) must actually shed bbox corner cells
    assert(poly(1L)._3 < poly(1L)._4,
      "pentagon cover did not tighten below its bbox")
  }

  test("sim_knn_graph_converge: the converged build strictly beats the single-table graph's recall ceiling") {
    // the single-table candidate pool is CLOSED under its LSH-bucket
    // partition (a second refinement round was verified to change
    // nothing, and a second LSH table yields the identical partition),
    // so the converged build — wide K=10 internal lists + random
    // long-range init + 3 rounds — must STRICTLY escape it: measured
    // 0.80 vs the single-table 0.57 at sf0.001.
    def adjacency(q: String) =
      SparkEntry.queries(q)(spark, dir)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2).toSet }
    val r1 = adjacency("sim_knn_graph_nndescent")
    val rm = adjacency("sim_knn_graph_converge")
    val exact = adjacency("sim_cosine_topk")
    assert(r1.keySet === rm.keySet && r1.nonEmpty)
    def recall(g: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, ex) =>
        g.getOrElse(q, Set.empty).intersect(ex).size.toDouble / 3 }
      rs.sum / rs.size
    }
    val (rec1, recM) = (recall(r1), recall(rm))
    assert(recM > rec1,
      s"converged recall $recM does not beat single-table $rec1")
    assert(recM >= 0.7, s"converged recall $recM below 0.7 floor")
  }

  test("geo_polygon_polygon_join: containment caught without crossings; disjoint pair pruned pre-refine") {
    val rows = SparkEntry.queries("geo_polygon_polygon_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // the far square (qid 13) must never become a candidate — the cover
    // join prunes it before any edge math
    assert(!rows.keySet.exists(_._2 == 13L), "disjoint polygon reached refine")
    // the square strictly inside the pentagon: zero edge crossings, all
    // 4 vertices inside — only the containment branch can call this
    val (x12, bi12, _, hit12) = rows((1L, 12L))
    assert(x12 === 0L && bi12 === 4L && hit12,
      s"containment branch failed: $x12 crossings, $bi12 vertices inside")
    // the half-overlapping rectangle: proper crossings observed
    assert(rows((2L, 11L))._1 > 0L && rows((2L, 11L))._4)
    // every emitted candidate pair that intersects says so via at least
    // one positive evidence column
    rows.foreach { case (k, (x, bi, ai, hit)) =>
      assert(hit === (x > 0 || bi > 0 || ai > 0), s"$k evidence mismatch")
    }
  }

  test("README operator count is generated from the registry (r14 verdict #6)") {
    val readme = java.nio.file.Files.readString(
      java.nio.file.Paths.get("README.md"))
    val n = SparkEntry.queries.size
    assert(readme.contains(s"**$n registered operators**"),
      s"README headline count != registry size $n — run graft.tools.SurveyTable")
    assert(!"\\*\\*(\\d+) registered operators\\*\\*".r
      .findAllMatchIn(readme).exists(_.group(1).toInt != n))
  }
}
