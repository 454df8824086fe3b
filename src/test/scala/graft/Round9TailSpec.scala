package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-9 tail batches: the skyline sort-scan
  * identity vs the O(n²) dominance definition, the business-day closed
  * form vs a brute-force day walk, LPM most-specific-route selection vs a
  * naive per-event recompute, and the fuzzy-dedup vocabulary expansion vs
  * row-level scoring. DuckDB value parity is the driver gate's job; these
  * pin the algebraic rewrites each operator's speed depends on.
  */
class Round9TailSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("win_skyline_pareto: window identity equals O(n^2) dominance scan") {
    val rows = q("win_skyline_pareto").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val all = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("p"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = all.filter { case (k, p, d) =>
      !all.exists { case (k2, p2, d2) =>
        (p2 < p && d2 >= d) || (p2 <= p && d2 > d) ||
          (p2 == p && d2 == d && k2 < k)
      }
    }.map(t => (t._1, t._2, t._3)).sortBy(t => (t._2, t._1))
    assert(rows.toSeq == naive.toSeq)
  }

  test("fn_business_days: closed form equals brute-force day walk") {
    val got = q("fn_business_days").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute force: walk each order's [start+1 .. start+k] days, count
    // non-weekend ones (epoch day 0 = Thursday; weekday = (e+3)%7 < 5)
    val brute = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')").as("ea"),
        expr("CAST(o_orderkey % 20 AS INT)").as("k"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (prio, rs) =>
        val bds = rs.map { r =>
          val ea = r.getInt(1).toLong
          (1 to r.getInt(2)).count(i => (ea + i + 3) % 7 < 5).toLong
        }
        prio -> (rs.length.toLong, bds.sum)
      }
    assert(got == brute)
  }

  test("join_cidr_lookup: every event maps to its most specific route") {
    val got = q("join_cidr_lookup").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size > 2)
    // naive recompute: nations 0..24 own /16; %5==0 nations own a /24 at
    // .1.0; events derive ips from (user_id, event_id)
    val nations = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0).toLong -> r.getString(1)).toMap
    val naive = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id")).collect().map { r =>
        val (eid, uid) = (r.getLong(0), r.getLong(1))
        val hi = uid % 30  // second octet
        val oct3 = eid % 3 // third octet
        nations.get(hi) match {
          case Some(name) if hi % 5 == 0 && oct3 == 1 => name + "-dc"
          case Some(name)                             => name
          case None                                   => "default"
        }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == naive)
  }

  test("dedup_fuzzy_blocked: vocabulary expansion equals row-level scoring") {
    val got = q("dedup_fuzzy_blocked").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val p = Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val a = p.select(col("p_brand"), col("p_partkey").as("ka"),
      col("p_name").as("na"))
    val b = p.select(col("p_brand"), col("p_partkey").as("kb"),
      col("p_name").as("nb"))
    val naive = a.join(b, Seq("p_brand"))
      .filter(col("ka") < col("kb") &&
        levenshtein(col("na"), col("nb")) <= 1)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("ka")).as("nl"),
        sum(when(col("na") === col("nb"), 1L).otherwise(0L)).as("ne"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == naive)
  }

  test("sink_variant_roundtrip: variant extraction equals direct JSON parse") {
    val got = q("sink_variant_roundtrip").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, dir)
      .filter(col("props").isNotNull)
      .select(expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("win_pareto_8020: thresholds are monotone and bounded by customers") {
    val rows = q("win_pareto_8020").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(50L, 80L, 95L))
    val tops = rows.map(_._2)
    assert(tops sameElements tops.sorted, "higher coverage needs >= customers")
    assert(rows.forall { case (_, top, all) => top >= 1 && top <= all })
  }

  test("win_rfm_segmentation: quartile census covers every customer once") {
    val rows = q("win_rfm_segmentation").collect()
    val total = rows.map(_.getLong(3)).sum
    val nCust = Tables(spark, dir, "orders")
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(total == nCust)
    assert(rows.forall { r =>
      (1L to 4L).contains(r.getLong(0)) && (1L to 4L).contains(r.getLong(1)) &&
        (1L to 4L).contains(r.getLong(2))
    })
  }

  test("sample_quality_weighted: kept counts bounded and monotone in quality") {
    val rows = q("sample_quality_weighted").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)) // kept <= docs
    }
    // docs at/above the cap (n_chars >= 400) must ALWAYS be kept
    val capped = Tables(spark, dir, "documents")
      .filter(col("n_chars") >= 400)
      .filter(expr("((doc_id % 1000003) * 2654435761) % 1000 >= 1000"))
      .count()
    assert(capped == 0)
  }

  test("stat_cohens_kappa: kappa within [-1e6, 1e6] and counts consistent") {
    val r = q("stat_cohens_kappa").head
    val (n, n11, n10, n01) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n11 + n10 + n01 <= n)
    val kappa = r.getLong(4)
    assert(kappa >= -1000000L && kappa <= 1000000L)
  }

  test("scan_parquet_nested_filter: nested predicate reaches the scan") {
    val df = q("scan_parquet_nested_filter")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // the struct-field predicate must appear in PushedFilters, not only
    // as a post-scan Filter — that's the row-group-skip proof
    assert(plan.contains("PushedFilters") &&
      plan.contains("info.status"),
      s"nested predicate not pushed:\n${plan.take(2000)}")
  }

  test("scan_csv_charset_latin1: bytes on disk are single-byte latin-1") {
    // the oracle pass alone can't distinguish honored-latin1 from
    // ignored-option-UTF8-both-ways; pin the physical encoding here
    val tmp = graft.util.tempDir("latin1_check_")
    Tables(spark, dir, "documents").limit(5)
      .select(col("doc_id"), lit("café").as("label"))
      .write.mode("overwrite").option("encoding", "ISO-8859-1")
      .option("header", "true").csv(s"$tmp/t")
    val files = new java.io.File(s"$tmp/t").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
    assert(bytes.contains(0xe9.toByte), "é must be the single latin-1 byte")
    assert(!bytes.containsSlice(Array(0xc3.toByte, 0xa9.toByte)),
      "must not be UTF-8 encoded")
  }

  test("sql_cache_table: second consumer reads InMemoryTableScan") {
    q("sql_cache_table").collect() // populates the cache
    val plan = spark.sql("SELECT count(*) FROM cache_demo")
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("Scan In-memory"),
      s"cache not used:\n${plan.take(1500)}")
    spark.sql("UNCACHE TABLE IF EXISTS cache_demo")
  }

  test("ts_lagged_crosscorr: lag 0 equals direct daily corr") {
    val rows = q("ts_lagged_crosscorr").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rows.size == 7)
    val daily = Tables.events(spark, dir)
      .groupBy(expr("CAST(date_trunc('day', ts) AS DATE)").as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val c = daily.agg(corr(col("x").cast("double"), col("y").cast("double")))
      .head.getDouble(0)
    val want = math.floor(c * 1000000 + 0.5).toLong
    assert(math.abs(rows(0) - want) <= 1,
      s"lag-0 corr ${rows(0)} vs builtin $want")
  }

  test("stat_cuped: one global theta; users partition across variants") {
    val rows = q("stat_cuped").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert(rows.map(_.getLong(4)).distinct.length == 1,
      "theta is a single global coefficient, identical on both variant rows")
    val users = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
  }

  test("dq_benford_law: digits 1-9, obs sums to orders, shares sum to 1") {
    val rows = q("dq_benford_law").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L),
      "every leading digit present on the fixture")
    val nOrders = Tables(spark, dir, "orders").count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    // Benford expected counts (x100) must sum to ~100 * n (rounding slack 9)
    val expSum = rows.map(_.getLong(2)).sum
    assert(math.abs(expSum - 100L * nOrders) <= 9)
  }

  test("stat_fdr_bh: ranks are a permutation and rejections form a prefix") {
    val rows = q("stat_fdr_bh").collect()
      .map(r => (r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    val rejected = rows.filter(_._2).map(_._1)
    // BH rejects exactly the prefix up to the cutoff rank
    assert(rejected.sameElements(1L to rejected.length),
      s"rejections must be a prefix of the p-ordering: ${rejected.toSeq}")
  }

  test("geo_grid_knn_join: ranked ascending per probe, distances in-ring") {
    val rows = q("geo_grid_knn_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rs.length), "rn consecutive from 1")
      assert(rs.length <= 3)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        "distance ascends with rank")
    }
    // 3x3 ring of 5-degree cells bounds any pair by ~sqrt(2)*7.5 deg ~ 1180 km
    assert(rows.forall(r => r._4 > 0 && r._4 < 1200000L))
  }

  test("geo_cell_density: histogram accounts for every customer") {
    val rows = q("geo_cell_density").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length > 1, "coarse grid must produce multi-point cells")
    val total = rows.map { case (n, c) => n * c }.sum
    assert(total == Tables(spark, dir, "customer").count())
  }

  test("dq_volume_anomaly: alerts replay the integer cross-multiplication") {
    val rows = q("dq_volume_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, sumPrev, nPrev) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nPrev >= 3 && nPrev <= 7)
      assert(r.getBoolean(4) == (cnt * 2 * nPrev < sumPrev))
      assert(r.getBoolean(5) == (cnt * nPrev > sumPrev * 2))
    }
  }

  test("sample_neyman_allocation: budget respected, floors lose < strata") {
    val rows = q("sample_neyman_allocation").collect()
    val allocs = rows.map(_.getLong(3))
    assert(allocs.sum <= 1000 && allocs.sum > 1000 - rows.length,
      s"floor allocation sums to (1000 - #strata, 1000]: ${allocs.sum}")
    rows.foreach(r => assert(r.getLong(4) <= r.getLong(1),
      "realized sample within stratum size"))
  }

  test("dq_table_checksum: exactly the drift-carrying groups mismatch") {
    val rows = q("dq_table_checksum").collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    // recompute which priority groups contain an injected-drift key
    val drifted = Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 997 === 13 || col("o_orderkey") % 997 === 500)
      .select(col("o_orderpriority")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(drifted.nonEmpty, "fixture must exercise the drift classes")
    rows.foreach { case (grp, ok) =>
      assert(ok == !drifted(grp),
        s"group $grp match=$ok but drifted=${drifted(grp)}")
    }
  }

  test("pipeline_pit_features: strictly-before semantics match brute force") {
    val got = q("pipeline_pit_features").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val byUser = ev.groupBy(_._1)
    got.keys.take(10).foreach { u =>
      val evs = byUser(u)
      val labels = evs.filter(_._3 == "purchase")
      val brute = labels.map { case (_, d, _) =>
        (evs.count(e => e._3 == "click" && e._2.isBefore(d)).toLong,
          evs.count(e => e._3 == "error" && e._2.isBefore(d)).toLong)
      }
      assert(got(u) == ((labels.length.toLong,
        brute.map(_._1).sum, brute.map(_._2).sum)),
        s"user $u PIT sums diverge from brute force")
    }
  }

  test("eval_auc_ranksum: rank-sum identity equals O(n^2) pairwise AUC") {
    val Array(row) = q("eval_auc_ranksum").collect()
    val (np, nn, aucE6) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // brute force: count positive-beats-negative pairs, half credit on ties
    val scoredRows = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id",
        """CAST(aggregate(
          |  zip_with(embedding, sequence(1, 64),
          |    (v, i) -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          |              * ((i * 2654435761L) % 1001 - 500)),
          |  0L, (acc, x) -> acc + x) AS BIGINT)""".stripMargin + " AS score",
        "CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos")
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    val posS = scoredRows.filter(_._2 == 1).map(_._1)
    val negS = scoredRows.filter(_._2 == 0).map(_._1)
    assert(posS.length == np && negS.length == nn)
    val wins = (for (p <- posS; n <- negS)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val bruteE6 = math.floor(
      wins.toDouble / (2.0 * np * nn) * 1000000 + 0.5).toLong
    assert(aucE6 == bruteE6, s"rank-sum $aucE6 vs pairwise $bruteE6")
  }

  test("eval_calibration_bins and eval_confusion_prf partition the scored set") {
    val total = Tables(spark, dir, "embeddings").count()
    val bins = q("eval_calibration_bins").collect()
    assert(bins.map(_.getLong(1)).sum == total)
    assert(bins.map(_.getLong(1)).max - bins.map(_.getLong(1)).min <= 1,
      "ntile keeps bins balanced within 1")
    val Array(c) = q("eval_confusion_prf").collect()
    assert(c.getLong(0) + c.getLong(1) + c.getLong(2) + c.getLong(3) == total)
  }

  test("stat_mutual_info and stat_cramers_v: information-theoretic bounds") {
    val Array(mi) = q("stat_mutual_info").collect()
    assert(mi.getLong(1) >= 0, "MI is non-negative")
    assert(mi.getLong(1) <= math.floor(math.log(4.0) * 1e6 + 0.5).toLong,
      "MI bounded by ln(min cardinality) = ln(4)")
    assert(mi.getLong(1) <= mi.getLong(2), "MI <= joint entropy")
    val Array(cv) = q("stat_cramers_v").collect()
    assert(cv.getLong(4) >= 0 && cv.getLong(4) <= 1000000,
      "Cramér's V lives in [0, 1]")
  }

  test("cdc_gap_detection: reconstructed gaps are exactly the injected loss") {
    val gaps = q("cdc_gap_detection").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gaps.nonEmpty)
    val ids = Tables.events(spark, dir).select(col("event_id"))
      .collect().map(_.getLong(0)).sorted
    val survived = ids.filterNot(i => Set(7L, 8L, 9L)(i % 101))
    val missingInterior = ids.filter(i => Set(7L, 8L, 9L)(i % 101))
      .filter(i => i > survived.head && i < survived.last)
    assert(gaps.map(_._3).sum == missingInterior.length,
      "total missing equals injected interior loss")
    gaps.foreach { case (a, b, n) =>
      assert(b - a + 1 == n)
      (a to b).foreach(i => assert(Set(7L, 8L, 9L)(i % 101),
        s"id $i reported missing but was never dropped"))
    }
  }

  test("sql_agg_filter_clause: filtered aggregates match CASE-form replay") {
    val rows = q("sql_agg_filter_clause").collect()
    val direct = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") > 50, 1L).otherwise(0L)).as("n_high"),
        sum(when(col("user_id") % 2 === 0,
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("ec"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (nh, ec) = direct(r.getString(0))
      assert(r.getLong(1) == nh && r.getLong(2) == ec)
      assert(r.getLong(1) <= r.getLong(4))
    }
  }

  test("eval_retrieval_metrics: metric lattice holds (hit >= mrr-ish, ndcg in [0,1])") {
    val Array(r) = q("eval_retrieval_metrics").collect()
    val (nq, hit, mrr, ndcg) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nq > 0)
    assert(hit >= 0 && hit <= 1000000 && ndcg >= 0 && ndcg <= 1000000)
    // MRR <= hit rate (rr is 1 only when the top hit is rank 1; 0 when no hit)
    assert(mrr <= hit, s"MRR $mrr must not exceed hit rate $hit")
    // a hit implies positive NDCG and vice versa on average
    assert((hit == 0) == (ndcg == 0))
  }

  test("sql_recursive_bom: every part reached exactly once, depths telescope") {
    val rows = q("sql_recursive_bom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the derived forest parent = child div 4 reaches every part key from
    // root 0 in <= 8 levels, each exactly once (keys are 0-based, so the
    // synthetic root row IS part 0)
    val nParts = Tables(spark, dir, "part").count()
    assert(rows.map(_._2).sum == nParts, "every part reached exactly once")
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.foreach { case (depth, _, units, maxm) =>
      assert(maxm <= math.pow(4, depth).toLong, "mult bounded by 4^depth")
      assert(units >= 0 && maxm >= 1)
    }
  }

  test("dq_drift_psi: contributions are finite and bands cover all orders") {
    val rows = q("dq_drift_psi").collect()
    assert(rows.length == 10)
    val nOrders = Tables(spark, dir, "orders").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == nOrders)
    // Laplace smoothing keeps every contribution finite; PSI >= 0 in total
    assert(rows.map(_.getLong(3)).sum >= 0)
  }

  test("stat_jackknife_ci: block SE widens the naive iid interval") {
    val Array(r) = q("stat_jackknife_ci").collect()
    val (b, n, theta, se) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // small sf may not populate all 20 residue blocks
    assert(b >= 2 && b <= 20 && n > 0 && se > 0)
    assert(r.getLong(4) < theta && theta < r.getLong(5),
      "CI brackets the point estimate")
  }

  test("stat_survival_km: survival curve is monotone nonincreasing from <= 1") {
    val rows = q("stat_survival_km").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.length > 1)
    assert(rows.head._3 <= 1000000)
    rows.sliding(2).foreach { case Array((_, n1, s1), (t2, n2, s2)) =>
      assert(s2 <= s1, s"survival must not increase (t=$t2)")
      assert(n2 < n1, "risk set shrinks strictly at each event time")
    }
  }

  test("sql_session_dynamic_gap: longer purchase gaps merge at least as much") {
    val dynamic = q("sql_session_dynamic_gap").count()
    val fixed = q("sql_session_window_tvf").count()
    assert(dynamic <= fixed,
      s"interval-union with a superset gap can only merge sessions: $dynamic > $fixed")
  }

  test("multimodal_tar_index: indexed offsets support exact random access") {
    val idx = q("multimodal_tar_index").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(idx.keySet == docs.keySet)
    val shardDir = ops.TarShard.stageShard(spark, dir)
    val tar = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$shardDir/shard-000000.tar"))
    docs.keys.toSeq.sorted.take(5).foreach { id =>
      val (hdr, sz) = idx(id)
      val payload = new String(tar, (hdr + 512).toInt, sz.toInt, "UTF-8")
      assert(payload == docs(id),
        s"seek to offset ${hdr + 512} must recover doc $id exactly")
    }
  }

  test("eval_prefix_recall_curve: recall monotone-ish and within [0,1]") {
    val Array(r) = q("eval_prefix_recall_curve").collect()
    val (nq, r1, r5, r10) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nq > 0)
    Seq(r1, r5, r10).foreach(v => assert(v >= 0 && v <= 1000000))
  }

  test("cdc_chunked_backfill: feed wins exactly on the updated key class") {
    val rows = q("cdc_chunked_backfill").collect()
    assert(rows.length == Tables(spark, dir, "orders").count())
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) % 7 == 3),
        s"key ${r.getLong(0)}: from_feed flag must match the update class")
    }
  }

  test("ts_alert_debounce: run-length algebra equals the sequential machine") {
    val got = q("ts_alert_debounce").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // gold standard: replay the debounce state machine sequentially
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (expr("CAST(floor(value * 100 + 0.5) AS BIGINT)") >= 7000).as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getBoolean(3)))
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3.toString, r._2))
      var breachRun = 0; var normalRun = 0; var open = false
      val eps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var raiseEid = -1L
      sorted.foreach { case (_, eid, _, b) =>
        if (b) { breachRun += 1; normalRun = 0 } else { normalRun += 1; breachRun = 0 }
        if (!open && b && breachRun == 3) { open = true; raiseEid = eid }
        else if (open && !b && normalRun == 2) {
          eps += ((u, raiseEid, eid)); open = false
        }
      }
      if (open) eps += ((u, raiseEid, -1L))
      eps
    }.sortBy(e => (e._1, e._2))
    assert(got.toSeq == brute,
      s"episodes diverge: got ${got.toSeq.take(5)} vs ${brute.take(5)}")
  }

  test("graph_weighted_sssp: seed at distance 0, all others positive and bounded") {
    val rows = q("graph_weighted_sssp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    val seed = rows.keys.min // seeded from min(src) over symmetric edges
    assert(rows(seed) == 0L, "seed distance must be 0")
    val others = rows.filter(_._1 != seed).values
    assert(others.forall(d => d > 0 && d <= 4L * 1000000L),
      "4 Bellman-Ford rounds with cost <= 10^6 per hop bound every distance")
  }
}
