package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 invariants: delta-join IVM (only deltas re-read, converges to
  * the full recompute), the CDF `_commit_version` contract, the iterated
  * BPE training loop, and the governance views' semantic guarantees (the
  * PLAN guarantees live in PlanShapeSpec).
  */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("cdc_ivm_join_view: IVM result equals the full recompute at the end versions") {
    val ivm = SparkEntry.queries("cdc_ivm_join_view")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // full recompute: A@latest ⋈ B@latest, same rollup — the thing IVM
    // is NOT allowed to do but must converge to
    val fmt = "graft.sources.ManifestSink"
    val aDir = s"${graft.util.catalogWarehouse}/marts/ivm_fact"
    val bDir = s"${graft.util.catalogWarehouse}/marts/ivm_dim"
    val full = spark.read.format(fmt).option("path", aDir).load()
      .join(spark.read.format(fmt).option("path", bDir).load(), "ck")
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("rev_cents"))
      .orderBy(col("seg"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(ivm.nonEmpty && ivm.toSeq === full.toSeq,
      s"IVM diverged from recompute:\n ivm=${ivm.toSeq}\n full=${full.toSeq}")
    // REBUILT must exist (B's delete+reinsert survived the window) and
    // BUILDING must not (its rows were renamed mid-window)
    val segs = ivm.map(_._1).toSet
    assert(segs.contains("REBUILT") && !segs.contains("BUILDING"), segs)
  }

  test("cdc_ivm_join_view: only the window's files are planned — deltas, never the base snapshots") {
    // staged by the registry row in the test above (suite order is
    // file order; re-run the row if this test runs standalone)
    val aDir = s"${graft.util.catalogWarehouse}/marts/ivm_fact"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(aDir)))
      SparkEntry.queries("cdc_ivm_join_view")(spark, dir).collect()
    val winPlan = graft.sources.ManifestTableAccess.cdfPlanVersions(aDir, 3, 4)
    val fullPlan = graft.sources.ManifestTableAccess.cdfPlanVersions(aDir, 1, 4)
    // the delta window plans strictly fewer partitions than the full
    // history, and every planned partition is attributed inside [3, 4]
    assert(winPlan.nonEmpty && winPlan.size < fullPlan.size,
      s"window=${winPlan.size} full=${fullPlan.size}")
    assert(winPlan.forall { case (_, _, v) => v >= 3 && v <= 4 }, winPlan)
    // v2's bulk file (the snapshot the view already holds) is NOT re-read
    val v2Files = fullPlan.collect { case (p, _, 2) => p }.toSet
    assert(v2Files.nonEmpty, "staging must have committed data at v2")
    assert(winPlan.forall { case (p, _, _) => !v2Files(p) },
      "the IVM window must not re-open the base snapshot's files")
  }

  test("CDF _commit_version: delete-then-reinsert of the same key is ordered inside one range") {
    val bDir = s"${graft.util.catalogWarehouse}/marts/ivm_dim"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(bDir)))
      SparkEntry.queries("cdc_ivm_join_view")(spark, dir).collect()
    val feed = spark.read.format("graft.sources.ManifestSink")
      .option("path", bDir).option("changeFeed", "true")
      .option("startingVersion", "3").option("endingVersion", "4").load()
    val byType = feed.groupBy(col("_change_type"))
      .agg(min(col("_commit_version")).as("vmin"),
        max(col("_commit_version")).as("vmax"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byType("delete") === ((3L, 3L)), s"deletes landed at v3: $byType")
    assert(byType("insert") === ((4L, 4L)), s"reinserts landed at v4: $byType")
  }

  test("text_bpe_train_merges: 5 ranks, non-increasing winner counts, vocab grows by at most 1 per merge") {
    val rows = SparkEntry.queries("text_bpe_train_merges")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // every occurrence of a post-merge pair maps to a distinct
    // pre-merge occurrence, so the argmax count can never rise
    val counts = rows.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"winner counts must be non-increasing: ${counts.toSeq}")
    assert(counts.forall(_ > 0))
    // a merge introduces exactly one new token type and can only
    // remove types by exhausting them
    val vocab = rows.map(_._4)
    assert(vocab.zip(vocab.tail).forall { case (a, b) => b <= a + 1 },
      s"vocab can grow by at most 1 per merge: ${vocab.toSeq}")
    // merged spellings join with '_' — each winner is a space-joined pair
    assert(rows.forall(_._2.split(" ").length === 2), rows.map(_._2).toSeq)
  }

  test("geo_dbscan_core: the census is grid-invariant — coarse registry grid, fine retuned grid, same answer") {
    val registry = SparkEntry.queries("geo_dbscan_core")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val coarse = ops.Geo.dbscanCoreParam(spark, dir, 500000L, 450)
      .collect().map(_.toSeq).toSeq
    val fine = ops.Geo.dbscanCoreParam(spark, dir, 500000L, 158)
      .collect().map(_.toSeq).toSeq
    assert(registry === coarse,
      s"param(500) diverged from the registry row:\n $registry\n $coarse")
    assert(coarse === fine,
      s"retuned grid changed the census:\n $coarse\n $fine")
  }

  test("sql_row_filter_policy: the view exposes ONLY the principal's granted segments") {
    SparkEntry.queries("sql_row_filter_policy")(spark, dir).collect()
    val visible = spark.sql("SELECT DISTINCT c_mktsegment FROM customer_rls")
      .collect().map(_.getString(0)).toSet
    assert(visible === Set("BUILDING", "AUTOMOBILE"),
      s"emea_analyst grants leak: $visible")
    // completeness: every granted row is visible (filter, not sample)
    val n = spark.sql("SELECT count(*) FROM customer_rls").collect().head.getLong(0)
    val exp = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).count()
    assert(n === exp)
  }

  test("cdc_ivm_distinct_view: refcounts survive partial deletes (multi-row keys never over-decrement)") {
    val ivm = SparkEntry.queries("cdc_ivm_distinct_view")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables(spark, dir, "orders")
      .filter(col("o_custkey") % 5 =!= 0)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ivm === full, s"ivm=$ivm full=$full")
  }

  test("graph_katz_index: candidates are non-adjacent and the score is the exact Horner form") {
    val rows = SparkEntry.queries("graph_katz_index")(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (p2, p3, katz) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(katz === p2 * 10000 + p3 * 1000, r.toString)
      assert(p2 > 0, "every candidate is a 2-hop pair by construction")
    }
    // predicted links must not already be edges (the A term is zero)
    val edges = SparkEntry.queries("graph_topk_similarity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(!edges((a, b)) && !edges((b, a)), s"predicted an existing edge $a-$b")
    }
  }

  test("ts_ljung_box: Q >= 0 and the reject flag matches the chi2 threshold") {
    val r = SparkEntry.queries("ts_ljung_box")(spark, dir).collect().head
    val q = r.getLong(1)
    assert(q >= 0L)
    assert(r.getBoolean(3) === (q > 11070500L))
  }

  test("text_heaps_law: cumulative N and V are nondecreasing, beta in (0, 1]") {
    val rows = SparkEntry.queries("text_heaps_law")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === 10)
    val ns = rows.map(_._1); val vs = rows.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => b >= a }, ns.toSeq)
    assert(vs.zip(vs.tail).forall { case (a, b) => b >= a }, vs.toSeq)
    val beta = rows.head._3
    assert(rows.forall(_._3 === beta), "one fitted beta for the corpus")
    // the synthetic sf0.001 corpus draws from a FIXED small vocabulary,
    // so V saturates in the first decile and the fitted slope is ~0 —
    // sublinearity (beta <= 1) is the invariant, not positivity
    assert(beta >= 0L && beta <= 1000000L, s"implausible Heaps beta $beta")
  }

  test("sample_importance_reweight: ESS <= n, and weights invert the source shares") {
    val rows = SparkEntry.queries("sample_importance_reweight")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = rows.map(_._2).sum
    assert(rows.forall(_._5 <= n), "ESS can never exceed the corpus size")
    assert(rows.map(_._5).distinct.length === 1)
    // bigger share -> smaller weight (strict inversion up to integer div)
    val byShare = rows.sortBy(_._3)
    assert(byShare.map(_._4).zip(byShare.map(_._4).tail)
      .forall { case (a, b) => b <= a }, byShare.mkString(","))
  }

  test("eval_bootstrap_winrate_ci: a proper interval that brackets the point estimate") {
    val r = SparkEntry.queries("eval_bootstrap_winrate_ci")(spark, dir)
      .collect().head
    val (rate, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(lo <= hi)
    assert(lo <= rate && rate <= hi,
      s"point $rate outside bootstrap CI [$lo, $hi]")
  }

  test("stat_power_law_alpha: a tail index strictly above 1 from the top-100 spine") {
    val r = SparkEntry.queries("stat_power_law_alpha")(spark, dir).collect().head
    assert(r.getLong(0) === 100L)
    assert(r.getLong(2) > 1000000L, s"Hill alpha must exceed 1: ${r.getLong(2)}")
  }

  test("geo_bbox_cover_join: candidates bound insiders, cover actually prunes, 5-gon census matches the point-in-polygon row") {
    val rows = SparkEntry.queries("geo_bbox_cover_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L))
    rows.foreach { case (pid, cand, inside, share) =>
      assert(inside <= cand, s"pid $pid: inside $inside > candidates $cand")
      assert(share < 1000000L, s"pid $pid: cover must prune, share=$share")
    }
    // the 5-gon (pid 1) is the SAME polygon geo_point_in_polygon scans
    // exhaustively — the two-stage join must find the same inside count
    val exhaustive = SparkEntry.queries("geo_point_in_polygon")(spark, dir)
      .agg(sum(col("n_inside"))).collect().head.getLong(0)
    assert(rows.head._3 === exhaustive,
      s"cover-join inside=${rows.head._3} vs exhaustive=$exhaustive")
  }

  test("cdc_conflict_lww_census: every conflict resolves to exactly one site") {
    val r = SparkEntry.queries("cdc_conflict_lww_census")(spark, dir)
      .collect().head
    val (conflict, ra, rb, ties) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(ra + rb === conflict, s"resolutions $ra+$rb must partition $conflict")
    assert(ties <= ra, "site-A tiebreaks are a subset of A resolutions")
    assert(conflict > 0, "the staged sites must actually collide")
  }

  test("stat_granger_1lag: F >= 0 (nested models) and the reject flag matches the threshold") {
    val rows = SparkEntry.queries("stat_granger_1lag")(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val f = r.getLong(2)
      assert(f >= -1000L, s"RSS_R >= RSS_F up to float eps: $r")
      assert(r.getBoolean(3) === (f > 3868000L), r.toString)
    }
  }

  test("ts_pacf_durbin: level-1 PACF equals the ACF; 3 lags present") {
    val rows = SparkEntry.queries("ts_pacf_durbin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(rows.head._2 === rows.head._3, "phi_11 = r_1 by definition")
    rows.foreach { case (_, a, p) =>
      assert(math.abs(a) <= 1000000L && math.abs(p) <= 1100000L, (a, p))
    }
  }

  test("multimodal_image_entropy: bounded by log2(16) bits, every doc measured through the codec") {
    val rows = SparkEntry.queries("multimodal_image_entropy")(spark, dir).collect()
    assert(rows.length === Tables(spark, dir, "documents").count())
    rows.foreach { r =>
      val ent = r.getDouble(3)
      assert(ent >= 0.0 && ent <= 4.0, s"16-bin entropy out of range: $r")
      assert(r.getLong(2) <= 16L)
    }
  }

  test("stream_ivm_view_apply: the live-maintained view equals the batch IVM's end state") {
    val live = SparkEntry.queries("stream_ivm_view_apply")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the same end state computed the boring way: full recompute over
    // the fact's latest snapshot
    val fmt = "graft.sources.ManifestSink"
    val tDir = s"${graft.util.catalogWarehouse}/marts/ivm_sfact"
    val full = spark.read.format(fmt).option("path", tDir).load()
      .join(Tables(spark, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg")), "ck")
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("rev_cents"))
      .orderBy(col("seg"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(live === full, s"live view diverged:\n $live\n $full")
  }

  test("pipeline_dataset_diff: kinds partition both versions; every re-added copy is content-linked") {
    val rows = SparkEntry.queries("pipeline_dataset_diff")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val byKind = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nDocs = Tables(spark, dir, "documents").count()
    // removed + changed + unchanged = all of v1
    assert(byKind.getOrElse("removed", 0L) + byKind.getOrElse("changed", 0L)
      + byKind.getOrElse("unchanged", 0L) === nDocs)
    // the staged adds are verbatim copies — the content-hash pass must
    // link every one back to a v1 doc
    val addedDupTotal = rows.filter(_._1 == "added").map(_._3).sum
    assert(byKind.getOrElse("added", 0L) === addedDupTotal,
      "every staged add is an exact dup and must be flagged as one")
    assert(byKind("added") > 0 && byKind("removed") > 0 && byKind("changed") > 0)
  }

  test("dq_null_completeness_matrix: the correlated outage is visible only in its slice") {
    val rows = SparkEntry.queries("dq_null_completeness_matrix")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(rows.size === 9, "3 statuses x 3 columns")
    // the staged correlated failure: status P's totalprice is FULLY null
    assert(rows(("P", "o_totalprice")) === 1000000L, rows.toString)
    // ...while other statuses' totalprice sits near the 7% base rate
    assert(rows(("O", "o_totalprice")) < 150000L)
    assert(rows(("F", "o_totalprice")) < 150000L)
  }

  test("stat_fdr_storey: adaptive rejections are a superset of BH's; pi0 <= 1") {
    val rows = SparkEntry.queries("stat_fdr_storey")(spark, dir)
      .collect().map(r => (r.getBoolean(4), r.getBoolean(5), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (bh, st, pi0) =>
      assert(!bh || st, "BH rejection implies Storey rejection (pi0 <= 1)")
      assert(pi0 <= 1000000L)
    }
  }

  test("sql_column_mask: masks are shape-preserving and never leak the raw value") {
    SparkEntry.queries("sql_column_mask")(spark, dir).collect()
    val m = spark.sql(
      """SELECT name_masked, bal_band FROM customer_masked""").collect()
    assert(m.nonEmpty)
    assert(m.forall(_.getString(0).matches("\\*\\*\\*-.{4}")),
      "masked name must be ***- + last 4 chars")
    assert(m.forall(r => Set("NEG", "LOW", "HIGH")(r.getString(1))))
  }
}
