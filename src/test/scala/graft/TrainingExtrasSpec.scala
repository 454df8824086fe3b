package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-7 training-pipeline extras: the full Lloyd
  * iteration conserves the corpus and moves centroids, 1-bit Hamming and the
  * MRL prefix funnel both clear recall floors against exact brute force, the
  * BPE merge application shrinks token streams without ever growing one, and
  * `_metadata.row_index` enumerates a sorted single-file write exactly.
  * DuckDB value parity is the driver gate's job; these pin
  * cross-implementation invariants the oracle can't see.
  */
class TrainingExtrasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def bruteTop5: Set[(Long, Long)] = {
    import spark.implicits._
    SparkEntry.queries("sim_cosine_topk")(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
  }

  test("lloyd iteration conserves the corpus and emits k x 64 centroid cells") {
    val rows = q("sim_kmeans_lloyd_iter").collect()
    val n = Tables(spark, dir, "embeddings").count()
    // every (cell, pos) row repeats its cell's member count; each of the 64
    // positions partitions the corpus, so summing n_assigned at any one pos
    // must give the corpus size exactly
    val atPos1 = rows.filter(_.getLong(1) == 1L)
    assert(atPos1.map(_.getLong(3)).sum === n)
    // k cells x 64 positions, no holes
    val cells = rows.map(_.getInt(0)).distinct
    assert(rows.length === cells.length * 64)
    // the iteration must MOVE at least one centroid away from its
    // per-label init (labels are not a fixed point of Lloyd's map here)
    val init = Tables(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .groupBy(col("label"), (col("pos0") + 1).cast("long").as("pos"))
      .agg(util.r2(avg(col("v").cast("double"))).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val moved = rows.count(r =>
      init((r.getInt(0), r.getLong(1))) != r.getDouble(2))
    assert(moved > 0, "no centroid coordinate moved — assignment was a no-op")
  }

  test("binary hamming top-5: exact shape, bounded distance, nonzero recall") {
    import spark.implicits._
    val out = q("embed_binary_hamming_topk")
    val rows = out.collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length == 5))
    assert(perQuery.values.forall(_.map(_.getLong(3)).sorted.sameElements(1L to 5L)))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 64))
    // 64 sign bits retain enough geometry to overlap exact cosine top-5
    val got = out.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bruteTop5 intersect got).size.toDouble / bruteTop5.size
    assert(recall > 0.15, s"1-bit Hamming recall too low: $recall")
  }

  test("mrl prefix funnel: recall clears the ANN floor and ranks are exact") {
    import spark.implicits._
    val out = q("embed_mrl_prefix_rerank")
    val rows = out.collect()
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length == 5))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val got = out.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bruteTop5 intersect got).size.toDouble / bruteTop5.size
    // the fixture is ISOTROPIC random — a 16/64 prefix keeps only a
    // quarter of the variance, unlike real MRL-trained embeddings that
    // front-load information. Measured 0.22 at sf0.001; assert the same
    // floor as the other ANN legs rather than a trained-embedding number.
    assert(recall > 0.15, s"MRL funnel recall too low: $recall")
  }

  test("bpe merge application shrinks streams, never grows one, deterministic") {
    val a = q("text_bpe_merge_apply").collect()
    assert(a.length === Tables(spark, dir, "documents").count())
    assert(a.forall(r => r.getLong(2) <= r.getLong(1)))
    val merges = a.map(r => r.getLong(1) - r.getLong(2)).sum
    assert(merges > 0, "winning pair merged nowhere — count step disagrees")
    val b = q("text_bpe_merge_apply").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("winnowing guarantee: every w-window of grams contains a selection") {
    val rows = q("text_winnowing_fingerprints").collect()
    assert(rows.nonEmpty)
    // consecutive selected positions within a doc can differ by at most
    // w=4 — THE winnowing guarantee (a shared substring of >= w+k-1
    // tokens always yields a shared fingerprint)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val ps = rs.map(_.getLong(1)).sorted
      ps.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1) - p(0) <= 4,
          s"doc $doc gap ${p(0)}->${p(1)} breaks the guarantee")
      }
    }
    // density: selection must COMPRESS the gram stream (theory: ~2/(w+1))
    val grams = Tables(spark, dir, "documents")
      .select(size(split(col("text"), " ")).as("nt"))
      .collect().map(r => math.max(r.getInt(0) - 2, 0).toLong).sum
    assert(rows.length < grams * 0.6, s"selected ${rows.length} of $grams grams")
  }

  test("pca power iteration: unit loadings, positive bounded eigenvalue") {
    val rows = q("embed_pca_power_iter").collect()
    assert(rows.length === 64)
    val norm = math.sqrt(rows.map(r => r.getDouble(1) * r.getDouble(1)).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loadings norm $norm not ~1")
    val ev = rows.head.getDouble(2)
    assert(rows.forall(_.getDouble(2) == ev))
    // 0 < lambda-hat <= total variance (trace bound)
    val trace = Tables(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(var_pop(col("v").cast("double")).as("vp"))
      .collect().map(_.getDouble(1)).sum
    assert(ev > 0 && ev <= trace + 1e-6, s"ev $ev outside (0, trace=$trace]")
  }

  test("metadata row_index enumerates the sorted single-file write exactly") {
    val rows = q("scan_metadata_row_index").collect()
    val idx = rows.map(_.getLong(2))
    assert(idx.sameElements(rows.indices.map(_.toLong)),
      "row_index must be 0..n-1 in doc_id order for a sorted one-file table")
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
  }
}
