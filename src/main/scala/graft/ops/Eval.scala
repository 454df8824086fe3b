package graft.ops

import graft.{Q, Tables, util}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.13 model-evaluation tier (round-9): the offline metrics every
  * training pipeline computes after scoring a holdout — AUC, calibration,
  * and thresholded precision/recall — as distributed one-pass plans over
  * a scored table. The scorer is a fixed linear model evaluated in exact
  * integer arithmetic: embeddings are quantized to e6 BIGINTs and dotted
  * with a deterministic arithmetic weight per position (no weight
  * literals, no float accumulation — the score is a BIGINT both engines
  * reproduce bit-for-bit; every metric below is rank- or count-based, so
  * skipping the sigmoid loses nothing). Positive class: label < 5.
  *
  * Scale posture: scoring is one map-side explode+sum (64 rows per
  * vector, grouped back — O(dim·n) work, no shuffle beyond the group);
  * AUC is ONE window rank pass + a global fold (the rank-sum identity —
  * never the O(n²) pairwise definition); calibration is an ntile pass;
  * the confusion matrix is a map-side conditional aggregate. All outputs
  * are O(1) or O(bins) rows at any corpus size.
  */
object Eval {

  /** Integer-exact linear scores per vector (Spark side): quantize →
    * positional weight → BIGINT dot. posexplode is 0-based, the shared
    * weight formula is 1-based (DuckDB list indexing), hence pos+1.
    */
  private def scored(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"),
        (expr("CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")
          * (((col("pos") + 1) * 2654435761L) % 1001L - 500L)).as("t"))
      .groupBy(col("vec_id"))
      .agg(max(col("label")).as("label"), sum(col("t")).as("score"))
      .select(col("vec_id"), col("score"),
        when(col("label") < 5, 1L).otherwise(0L).as("pos"))

  /** The identical scorer in DuckDB dialect (fixed dim 64, 1-based
    * indexing via a constant series — DuckDB lacks lateral len()).
    */
  private val scoredSql =
    """WITH scored AS (
      |  SELECT vec_id,
      |         CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
      |              * ((i * 2654435761) % 1001 - 500)) AS BIGINT) AS score,
      |         CASE WHEN max(label) < 5 THEN 1 ELSE 0 END AS pos
      |  FROM embeddings, generate_series(1, 64) AS g(i)
      |  GROUP BY vec_id)""".stripMargin


  /** The Bradley–Terry MM update, one shared expression string per
    * parameter — evaluated verbatim by Spark (selectExpr) and DuckDB
    * (CTE), so both engines run the exact same float op sequence.
    */
  private val btUpdates: Seq[(String, String)] = Seq(
    "p0" -> ("(w01 + w02) / ((w01 + w10) / (p0 + p1) + (w02 + w20) / (p0 + p2))"),
    "p1" -> ("(w10 + w12) / ((w01 + w10) / (p1 + p0) + (w12 + w21) / (p1 + p2))"),
    "p2" -> ("(w20 + w21) / ((w02 + w20) / (p2 + p0) + (w12 + w21) / (p2 + p1))"))

  private def btIterSql(name: String, prev: String): String =
    s"""$name AS (SELECT w01, w10, w02, w20, w12, w21,
       |  ${btUpdates.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")}
       |  FROM $prev)""".stripMargin

  val defs: Seq[Q] = Seq(
    Q(
      "eval_auc_ranksum",
      // ROC-AUC via the Mann-Whitney rank-sum identity: AUC =
      // (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) with average ranks for ties carried
      // as 2·rank + ties − 1 so everything stays integer until one final
      // e6 division. One window pass, one fold — the pairwise definition
      // would be O(n²).
      (s, dir) => {
        scored(s, dir)
          .withColumn("rmin", rank().over(Window.orderBy(col("score"))))
          .withColumn("ties", count(lit(1)).over(Window.partitionBy(col("score"))))
          .agg(
            sum(col("pos")).as("np"),
            sum(lit(1L) - col("pos")).as("nn"),
            sum(when(col("pos") === 1, lit(2L) * col("rmin") + col("ties") - 1L)
              .otherwise(0L)).as("r2p"))
          .select(col("np"), col("nn"), expr(
            """CAST(floor(CAST(r2p - np * (np + 1) AS DOUBLE)
              |     / CAST(2 * np * nn AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""".stripMargin)
            .as("auc_e6"))
      },
      Some(s"""$scoredSql,
              |ranked AS (
              |  SELECT pos, 2 * rank() OVER (ORDER BY score)
              |           + count(*) OVER (PARTITION BY score) - 1 AS r2
              |  FROM scored),
              |f AS (
              |  SELECT CAST(sum(pos) AS BIGINT) AS np,
              |         CAST(sum(1 - pos) AS BIGINT) AS nn,
              |         CAST(sum(CASE WHEN pos = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r2p
              |  FROM ranked)
              |SELECT np, nn,
              |       CAST(floor(CAST(r2p - np * (np + 1) AS DOUBLE)
              |            / CAST(2 * np * nn AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS auc_e6
              |FROM f""".stripMargin)
    ),
    Q(
      "eval_kendall_tau",
      // Kendall τ-b rank correlation (round-13): the pair-concordance
      // complement to Spearman (stat_spearman_corr) — τ is the metric of
      // choice when comparing RANKERS (two scoring functions over the
      // same items) because it counts inversions directly. Computed per
      // brand BLOCK (price rank vs size rank within brand): concordant /
      // discordant pairs from a key-ordered self-join INSIDE the block,
      // tie corrections from per-value counts, τ-b assembled from BIGINT
      // pair counts with one fixed-order double expression, r2-pinned.
      // Scale: pair enumeration is quadratic IN THE BLOCK, so the block
      // is hard-capped at 128 items by a DETERMINISTIC hash sample
      // (multiplicative hash + key tiebreak — reproducible across
      // engines/runs/partitioning, same family as
      // sample_hash_deterministic). That is the standard posture for
      // pairwise rank metrics at corpus scale: τ is estimated on a
      // pinned per-block evaluation sample, never the full cross
      // product — an uncapped ×10 block costs ×100 pairs (measured
      // 14.4× wall before the cap), the capped one is O(1) per block.
      (s, dir) => {
        val p0 = Tables(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"),
            floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("x"),
            col("p_size").cast("long").as("y"))
        val p = p0.withColumn("hrk", row_number().over(
            Window.partitionBy(col("p_brand")).orderBy(
              ((col("p_partkey") % 1000003L) * 2654435761L) % 1000000L,
              col("p_partkey"))))
          .filter(col("hrk") <= 128).drop("hrk")
        val pairs = p.as("a").join(p.as("b"),
            col("a.p_brand") === col("b.p_brand") &&
              col("a.p_partkey") < col("b.p_partkey"))
          .select(col("a.p_brand").as("brand"),
            ((col("a.x") - col("b.x")) > 0).cast("long")
              .minus(((col("a.x") - col("b.x")) < 0).cast("long")).as("sx"),
            ((col("a.y") - col("b.y")) > 0).cast("long")
              .minus(((col("a.y") - col("b.y")) < 0).cast("long")).as("sy"))
        pairs.groupBy(col("brand"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L)).as("concordant"),
            sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L)).as("discordant"),
            sum(when(col("sx") === 0, 1L).otherwise(0L)).as("ties_x"),
            sum(when(col("sy") === 0, 1L).otherwise(0L)).as("ties_y"))
          .select(col("brand"), col("n_pairs"), col("concordant"), col("discordant"),
            graft.util.r2((col("concordant") - col("discordant")).cast("double") /
              sqrt((col("n_pairs") - col("ties_x")).cast("double") *
                (col("n_pairs") - col("ties_y")).cast("double"))).as("tau_b"))
          .orderBy(col("brand"))
      },
      Some(s"""WITH p0 AS (
              |  SELECT p_brand, p_partkey,
              |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS x,
              |         CAST(p_size AS BIGINT) AS y,
              |         row_number() OVER (PARTITION BY p_brand
              |           ORDER BY ((p_partkey % 1000003) * 2654435761) % 1000000,
              |                    p_partkey) AS hrk
              |  FROM part),
              |p AS (SELECT p_brand, p_partkey, x, y FROM p0 WHERE hrk <= 128),
              |pairs AS (
              |  SELECT a.p_brand AS brand,
              |         CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1 ELSE 0 END AS sx,
              |         CASE WHEN a.y > b.y THEN 1 WHEN a.y < b.y THEN -1 ELSE 0 END AS sy
              |  FROM p a JOIN p b
              |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
              |g AS (
              |  SELECT brand, CAST(count(*) AS BIGINT) AS n_pairs,
              |         CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
              |         CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
              |         CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
              |         CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
              |  FROM pairs GROUP BY brand)
              |SELECT brand, n_pairs, concordant, discordant,
              |       ${graft.util.r2sql("CAST(concordant - discordant AS DOUBLE) / sqrt(CAST(n_pairs - ties_x AS DOUBLE) * CAST(n_pairs - ties_y AS DOUBLE))")} AS tau_b
              |FROM g ORDER BY brand""".stripMargin)
    ),
    Q(
      "eval_brier_decomposition",
      // Murphy decomposition of the Brier score (round-13): calibration
      // bins (eval_calibration_bins) show WHERE a probability model is
      // off; this row quantifies the trade — per decile bin the Brier
      // contribution, the RELIABILITY term n·(p̄−ȳ)² (calibration error,
      // lower better) and the RESOLUTION term n·(ȳ_bin−ȳ)² (how much the
      // bins separate outcomes, higher better). Probabilities are
      // derived deterministically from the fixture (cents mod 1000 →
      // milli-units), outcomes are purchase events; every term is
      // assembled from BIGINT bin moments with one fixed-order double
      // division chain, e6-pinned — no cross-engine float drift surface.
      // Scale: one conditional aggregate to 10 bin rows + a broadcast of
      // the global totals; shuffle carries bins, never events.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(
            (floor(col("value") * 100 + lit(0.5)).cast("long") % 1000L).as("p"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        val bins = ev.groupBy((col("p") / 100).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
            sum(col("p")).as("sp"),
            sum((col("p") - lit(1000L) * col("y")) *
              (col("p") - lit(1000L) * col("y"))).as("sq"))
        val tot = ev.agg(count(lit(1)).as("nn"), sum(col("y")).as("yy"))
        bins.crossJoin(broadcast(tot))
          .select(col("bin"), col("n"), col("n_pos"),
            expr("CAST(floor(CAST(sp AS DOUBLE) / n * 1000 + 0.5) AS BIGINT)")
              .as("mean_p_e6"),
            expr("CAST(floor(CAST(n_pos AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)")
              .as("rate_e6"),
            expr("CAST(floor(CAST(sq AS DOUBLE) / n + 0.5) AS BIGINT)")
              .as("brier_e6"),
            expr("""CAST(floor(CAST(sp - 1000 * n_pos AS DOUBLE)
                    * CAST(sp - 1000 * n_pos AS DOUBLE) / n / 1000000 + 0.5) AS BIGINT)""")
              .as("rel_e6"),
            expr("""CAST(floor(CAST(n_pos * nn - yy * n AS DOUBLE)
                    * CAST(n_pos * nn - yy * n AS DOUBLE)
                    / n / nn / nn * 1000000 + 0.5) AS BIGINT)""")
              .as("res_e6"))
          .orderBy(col("bin"))
      },
      Some("""WITH ev AS (
             |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) % 1000 AS p,
             |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             |  FROM events),
             |bins AS (
             |  SELECT p // 100 AS bin, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(y) AS BIGINT) AS n_pos,
             |         CAST(sum(p) AS BIGINT) AS sp,
             |         CAST(sum((p - 1000 * y) * (p - 1000 * y)) AS BIGINT) AS sq
             |  FROM ev GROUP BY 1),
             |tot AS (
             |  SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(y) AS BIGINT) AS yy
             |  FROM ev)
             |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
             |       CAST(floor(CAST(sp AS DOUBLE) / n * 1000 + 0.5) AS BIGINT) AS mean_p_e6,
             |       CAST(floor(CAST(n_pos AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT) AS rate_e6,
             |       CAST(floor(CAST(sq AS DOUBLE) / n + 0.5) AS BIGINT) AS brier_e6,
             |       CAST(floor(CAST(sp - 1000 * n_pos AS DOUBLE)
             |            * CAST(sp - 1000 * n_pos AS DOUBLE) / n / 1000000 + 0.5) AS BIGINT) AS rel_e6,
             |       CAST(floor(CAST(n_pos * nn - yy * n AS DOUBLE)
             |            * CAST(n_pos * nn - yy * n AS DOUBLE)
             |            / n / nn / nn * 1000000 + 0.5) AS BIGINT) AS res_e6
             |FROM bins, tot ORDER BY bin""".stripMargin)
    ),
    Q(
      "eval_calibration_bins",
      // Reliability diagram data: decile bins over the score (total-order
      // tiebreak on vec_id so ntile is deterministic under ties), per-bin
      // observed positive rate and exact mean score — the "is the score a
      // probability" audit. Integer sums; two e6 pins.
      (s, dir) => {
        scored(s, dir)
          .withColumn("bin", ntile(10).over(
            Window.orderBy(col("score"), col("vec_id"))))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
            sum(col("score")).as("sum_score"))
          .select(col("bin").cast("long").as("bin"), col("n"), col("n_pos"),
            expr("CAST(floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")
              .as("rate_e6"),
            expr("CAST(floor(CAST(sum_score AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)")
              .as("mean_score"))
          .orderBy(col("bin"))
      },
      Some(s"""$scoredSql,
              |binned AS (
              |  SELECT pos, score,
              |         ntile(10) OVER (ORDER BY score, vec_id) AS bin
              |  FROM scored),
              |g AS (
              |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
              |         CAST(sum(pos) AS BIGINT) AS n_pos,
              |         CAST(sum(score) AS BIGINT) AS sum_score
              |  FROM binned GROUP BY bin)
              |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
              |       CAST(floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS rate_e6,
              |       CAST(floor(CAST(sum_score AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS mean_score
              |FROM g ORDER BY bin""".stripMargin)
    ),
    Q(
      "eval_retrieval_metrics",
      // Ranking-quality metrics for the retrieval tier (round-9):
      // hit-rate@10, MRR@10 and NDCG@10 of integer-dot retrieval against
      // label relevance. Every per-term quantity is floored to an e6
      // BIGINT BEFORE summation (1e6/rank; the 1e6/log2(rank+1) gains are
      // PRECOMPUTED integer constants shared by both engines — no libm in
      // the metric), so the
      // whole metric pipeline is integer arithmetic — no float sum order
      // anywhere, and both engines agree bit-for-bit. Query set is a 2%
      // key sample broadcast against the unexpanded corpus (the
      // sim_cosine_topk shape); ranking is one window pass per query.
      // IDCG uses the true per-query relevant count capped at k. At
      // 100 TB the candidate generation routes through the IVF/LSH rows;
      // this row pins the METRICS on an exact candidate set.
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("label").as("ql"))
        val c = emb.select(col("vec_id").as("cid"),
          col("embedding").as("ce"), col("label").as("cl"))
        val scoredPairs = q.join(broadcast(c), col("qid") =!= col("cid"))
          .withColumn("dot", expr(
            """aggregate(zip_with(qe, ce,
              |  (a, b) -> CAST(floor(CAST(a AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
              |          * CAST(floor(CAST(b AS DOUBLE) * 1000000 + 0.5) AS BIGINT)),
              |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
          .withColumn("rel", when(col("ql") === col("cl"), 1L).otherwise(0L))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("dot").desc, col("cid"))))
        // n_rel needs no scoring: pairs are (query × corpus minus self),
        // so per-query relevant count = corpus count of the query's label
        // minus the query's own row (always present in the corpus) —
        // replaces a second evaluation of the 80k-pair dot branch with an
        // O(labels) aggregate (guide §1.2: don't compute what you throw
        // away)
        val nrel = q.join(
            broadcast(c.groupBy(col("cl")).agg(count(lit(1)).as("n_lab"))),
            col("ql") === col("cl"))
          .select(col("qid"), (col("n_lab") - 1).as("n_rel"))
        val perQ = scoredPairs.filter(col("rnk") <= 10)
          .groupBy(col("qid"))
          .agg(
            max(when(col("rel") === 1, 1L).otherwise(0L)).as("hit"),
            max(when(col("rel") === 1, expr("1000000 div rnk")).otherwise(0L)).as("rr_e6"),
            sum(when(col("rel") === 1,
              expr("CAST(CASE rnk WHEN 1 THEN 1000000 WHEN 2 THEN 630929 WHEN 3 THEN 500000 WHEN 4 THEN 430676 WHEN 5 THEN 386852 WHEN 6 THEN 356207 WHEN 7 THEN 333333 WHEN 8 THEN 315464 WHEN 9 THEN 301029 ELSE 289064 END AS BIGINT)"))
              .otherwise(0L)).as("dcg_e6"))
          // LEFT join + coalesce(n_rel, 0): a query row with a NULL label
          // has no nrel entry (the label-count join can't match NULL), but
          // the oracle's sum(rel) shape keeps it with n_rel = 0 and counts
          // it in every denominator — an inner join here would silently
          // drop it (ADVICE r16). Identical on the fixture (labels are
          // non-null); guards the rewrite at any input.
          .join(nrel, Seq("qid"), "left")
          .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
          .withColumn("idcg_e6", expr(
            "CAST(CASE least(n_rel, 10) WHEN 1 THEN 1000000 WHEN 2 THEN 1630929 WHEN 3 THEN 2130929 WHEN 4 THEN 2561605 WHEN 5 THEN 2948457 WHEN 6 THEN 3304664 WHEN 7 THEN 3637997 WHEN 8 THEN 3953461 WHEN 9 THEN 4254490 WHEN 0 THEN 0 ELSE 4543554 END AS BIGINT)"))
        perQ.agg(
          count(lit(1)).as("nq"),
          expr("CAST(floor(CAST(sum(hit) AS DOUBLE) / count(*) * 1000000 + 0.5) AS BIGINT)").as("hit_rate_e6"),
          expr("CAST(sum(rr_e6) div count(*) AS BIGINT)").as("mrr_e6"),
          expr("""CAST(floor(sum(CASE WHEN idcg_e6 > 0
                 |  THEN CAST(dcg_e6 AS DOUBLE) / CAST(idcg_e6 AS DOUBLE) ELSE 0 END)
                 |  / count(*) * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("ndcg_e6"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, embedding AS qe, label AS ql
             |  FROM embeddings WHERE vec_id % 50 = 0),
             |c AS (SELECT vec_id AS cid, embedding AS ce, label AS cl FROM embeddings),
             |pairs AS (
             |  SELECT qid, cid, ql, cl,
             |    (SELECT CAST(sum(CAST(floor(CAST(qe[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |                 * CAST(floor(CAST(ce[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             |     FROM generate_series(1, 64) AS g(i)) AS dot
             |  FROM q, c WHERE qid <> cid),
             |ranked AS (
             |  SELECT qid, CASE WHEN ql = cl THEN 1 ELSE 0 END AS rel,
             |         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rnk
             |  FROM pairs),
             |nrel AS (SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel FROM ranked GROUP BY qid),
             |perq AS (
             |  SELECT r.qid,
             |    CAST(max(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hit,
             |    CAST(max(CASE WHEN rel = 1 THEN 1000000 // rnk ELSE 0 END) AS BIGINT) AS rr_e6,
             |    CAST(sum(CASE WHEN rel = 1
             |         THEN CASE rnk WHEN 1 THEN 1000000 WHEN 2 THEN 630929 WHEN 3 THEN 500000 WHEN 4 THEN 430676 WHEN 5 THEN 386852 WHEN 6 THEN 356207 WHEN 7 THEN 333333 WHEN 8 THEN 315464 WHEN 9 THEN 301029 ELSE 289064 END
             |         ELSE 0 END) AS BIGINT) AS dcg_e6,
             |    CAST((CASE least(max(n.n_rel), 10) WHEN 1 THEN 1000000 WHEN 2 THEN 1630929
             |          WHEN 3 THEN 2130929 WHEN 4 THEN 2561605 WHEN 5 THEN 2948457 WHEN 6 THEN 3304664
             |          WHEN 7 THEN 3637997 WHEN 8 THEN 3953461 WHEN 9 THEN 4254490 WHEN 0 THEN 0
             |          ELSE 4543554 END) AS BIGINT) AS idcg_e6
             |  FROM ranked r JOIN nrel n ON r.qid = n.qid
             |  WHERE rnk <= 10 GROUP BY r.qid)
             |SELECT CAST(count(*) AS BIGINT) AS nq,
             |       CAST(floor(CAST(sum(hit) AS DOUBLE) / count(*) * 1000000 + 0.5) AS BIGINT) AS hit_rate_e6,
             |       CAST(sum(rr_e6) // count(*) AS BIGINT) AS mrr_e6,
             |       CAST(floor(sum(CASE WHEN idcg_e6 > 0
             |            THEN CAST(dcg_e6 AS DOUBLE) / CAST(idcg_e6 AS DOUBLE) ELSE 0 END)
             |            / count(*) * 1000000 + 0.5) AS BIGINT) AS ndcg_e6
             |FROM perq""".stripMargin)
    ),
    Q(
      "eval_prefix_recall_curve",
      // Dimension-truncation recall curve (round-9): how much of the TRUE
      // top-k (full 64-dim integer dot) survives when candidates are
      // ranked by a 16-dim Matryoshka prefix — the measurement that
      // justifies (or rejects) the embed_mrl_prefix_rerank serving
      // architecture. Both rankings are integer-exact (quantized dots),
      // so recall@{1,5,10} is pure counting: two window passes over the
      // same broadcast-query pair set, one intersection fold. O(1) output.
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
        def dot(n: Int) = expr(
          s"""aggregate(zip_with(slice(qe, 1, $n), slice(ce, 1, $n),
             |  (a, b) -> CAST(floor(CAST(a AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |          * CAST(floor(CAST(b AS DOUBLE) * 1000000 + 0.5) AS BIGINT)),
             |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
        val pairs = q.join(broadcast(c), col("qid") =!= col("cid"))
          .withColumn("full_dot", dot(64))
          .withColumn("pre_dot", dot(16))
          .withColumn("full_rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("full_dot").desc, col("cid"))))
          .withColumn("pre_rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("pre_dot").desc, col("cid"))))
        pairs.agg(
          countDistinct(col("qid")).as("nq"),
          sum(when(col("full_rnk") <= 1 && col("pre_rnk") <= 1, 1L).otherwise(0L)).as("hits1"),
          sum(when(col("full_rnk") <= 5 && col("pre_rnk") <= 5, 1L).otherwise(0L)).as("hits5"),
          sum(when(col("full_rnk") <= 10 && col("pre_rnk") <= 10, 1L).otherwise(0L)).as("hits10"))
          .select(col("nq"),
            expr("CAST(floor(CAST(hits1 AS DOUBLE) / CAST(nq AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("recall1_e6"),
            expr("CAST(floor(CAST(hits5 AS DOUBLE) / CAST(nq * 5 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("recall5_e6"),
            expr("CAST(floor(CAST(hits10 AS DOUBLE) / CAST(nq * 10 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("recall10_e6"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, embedding AS qe
             |  FROM embeddings WHERE vec_id % 50 = 0),
             |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
             |pairs AS (
             |  SELECT qid, cid,
             |    (SELECT CAST(sum(CAST(floor(CAST(qe[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |                 * CAST(floor(CAST(ce[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             |     FROM generate_series(1, 64) AS g(i)) AS full_dot,
             |    (SELECT CAST(sum(CAST(floor(CAST(qe[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |                 * CAST(floor(CAST(ce[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             |     FROM generate_series(1, 16) AS g(i)) AS pre_dot
             |  FROM q, c WHERE qid <> cid),
             |ranked AS (
             |  SELECT qid,
             |    row_number() OVER (PARTITION BY qid ORDER BY full_dot DESC, cid) AS full_rnk,
             |    row_number() OVER (PARTITION BY qid ORDER BY pre_dot DESC, cid) AS pre_rnk
             |  FROM pairs),
             |f AS (
             |  SELECT CAST(count(DISTINCT qid) AS BIGINT) AS nq,
             |    CAST(sum(CASE WHEN full_rnk <= 1 AND pre_rnk <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
             |    CAST(sum(CASE WHEN full_rnk <= 5 AND pre_rnk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits5,
             |    CAST(sum(CASE WHEN full_rnk <= 10 AND pre_rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits10
             |  FROM ranked)
             |SELECT nq,
             |       CAST(floor(CAST(hits1 AS DOUBLE) / CAST(nq AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS recall1_e6,
             |       CAST(floor(CAST(hits5 AS DOUBLE) / CAST(nq * 5 AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS recall5_e6,
             |       CAST(floor(CAST(hits10 AS DOUBLE) / CAST(nq * 10 AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS recall10_e6
             |FROM f""".stripMargin)
    ),
    Q(
      "eval_cluster_nmi",
      // Clustering-quality NMI (round-9): normalized mutual information
      // between a deterministic 16-way sign-bit clustering (the sign
      // pattern of the first 4 quantized dimensions — the 1-bit LSH cell
      // id) and the true labels: NMI = 2·I(C;L)/(H(C)+H(L)). The
      // contingency table folds from exact integer counts in one pass;
      // entropies and MI run with identical ln text at the end, e6-
      // pinned. This is the external-validity metric for every
      // clustering/bucketing tier (kmeans, IVF, LSH): O(cells·labels)
      // intermediate, O(1) output.
      (s, dir) => {
        val pts = Tables(s, dir, "embeddings")
          .select(col("label"), expr(
            """CAST(aggregate(sequence(0, 3), 0L, (acc, i) ->
              |  acc * 2 + CASE WHEN element_at(embedding, i + 1) > CAST(0 AS FLOAT)
              |                 THEN 1L ELSE 0L END) AS BIGINT)""".stripMargin).as("cell"))
        val cells = pts.groupBy(col("cell"), col("label"))
          .agg(count(lit(1)).as("nxy"))
        val mc = cells.groupBy(col("cell")).agg(sum(col("nxy")).as("nc"))
        val ml = cells.groupBy(col("label")).agg(sum(col("nxy")).as("nl"))
        val tot = cells.agg(sum(col("nxy")).as("n"))
        val joined = cells.join(broadcast(mc), "cell")
          .join(broadcast(ml), "label").crossJoin(broadcast(tot))
        joined.agg(
          max(col("n")).as("n_pts"),
          countDistinct(col("cell")).as("n_cells"),
          sum(expr(
            """CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
              |* ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
              |     / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE)))""".stripMargin)).as("mi"))
          .select(col("n_pts"), col("n_cells"),
            expr("CAST(floor(mi * 1000000 + 0.5) AS BIGINT)").as("mi_e6"))
      },
      Some("""WITH pts AS (
             |  SELECT label,
             |    CAST((CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END)
             |       + (CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END)
             |       + (CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END)
             |       + (CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cell
             |  FROM embeddings),
             |cells AS (
             |  SELECT cell, label, CAST(count(*) AS BIGINT) AS nxy
             |  FROM pts GROUP BY 1, 2),
             |mc AS (SELECT cell, CAST(sum(nxy) AS BIGINT) AS nc FROM cells GROUP BY 1),
             |ml AS (SELECT label, CAST(sum(nxy) AS BIGINT) AS nl FROM cells GROUP BY 1),
             |t AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells)
             |SELECT max(n) AS n_pts,
             |       CAST(count(DISTINCT cell) AS BIGINT) AS n_cells,
             |       CAST(floor(sum(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
             |            * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
             |                 / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE)))) * 1000000 + 0.5) AS BIGINT) AS mi_e6
             |FROM cells JOIN mc USING (cell) JOIN ml USING (label) CROSS JOIN t""".stripMargin)
    ),
    Q(
      "eval_confusion_prf",
      // Thresholded confusion matrix + precision/recall/F1 at the natural
      // sign threshold (score > 0): four conditional counts from ONE
      // map-side aggregate, three e6-pinned ratios folded from them.
      (s, dir) => {
        scored(s, dir)
          .agg(
            sum(when(col("score") > 0 && col("pos") === 1, 1L).otherwise(0L)).as("tp"),
            sum(when(col("score") > 0 && col("pos") === 0, 1L).otherwise(0L)).as("fp"),
            sum(when(col("score") <= 0 && col("pos") === 1, 1L).otherwise(0L)).as("fn"),
            sum(when(col("score") <= 0 && col("pos") === 0, 1L).otherwise(0L)).as("tn"))
          .select(col("tp"), col("fp"), col("fn"), col("tn"),
            expr("CAST(floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("precision_e6"),
            expr("CAST(floor(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("recall_e6"),
            expr("CAST(floor(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("f1_e6"))
      },
      Some(s"""$scoredSql,
              |c AS (
              |  SELECT
              |    CAST(sum(CASE WHEN score > 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              |    CAST(sum(CASE WHEN score > 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              |    CAST(sum(CASE WHEN score <= 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
              |    CAST(sum(CASE WHEN score <= 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
              |  FROM scored)
              |SELECT tp, fp, fn, tn,
              |       CAST(floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS precision_e6,
              |       CAST(floor(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS recall_e6,
              |       CAST(floor(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS f1_e6
              |FROM c""".stripMargin)
    ),
    Q(
      "eval_bleu_corpus",
      // Corpus BLEU-2 (round-10): the generation-eval metric — modified
      // n-gram precision with per-document CLIPPING (candidate n-gram
      // counts capped at the reference's) plus the brevity penalty, all
      // from corpus-level integer sums. The "candidate" is a
      // deterministic corruption of each reference document (drop every
      // 7th token → BP < 1; uppercase every 5th → unigram and bigram
      // misses), so the metric is non-trivial and both engines derive it
      // from the same text. All counts are BIGINT; the float assembly is
      // restricted to IEEE-754 CORRECTLY-ROUNDED ops (÷ × sqrt) so the
      // e6-pinned columns are bit-identical across engines — the r10
      // exp()/ln() form could disagree by 1 in the last e6 digit because
      // exp/ln are library-dependent (JVM Math vs libm). The geometric
      // mean sqrt(p1·p2) replaces exp(½(ln p1+ln p2)) exactly; the
      // brevity penalty is emitted as its LOG (min(0, 1−r/c), again only
      // ÷ and −), so BLEU = exp(bp_log)·geo_prec is one consumer-side
      // exp away while every checked column stays deterministic. Scale:
      // two explode+count
      // aggregates (1- and 2-grams) and one per-doc window for the
      // post-deletion bigram adjacency — O(tokens) shuffle, corpus
      // totals are six longs; no pairwise doc work anywhere.
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .filter(length(col("tok")) > 0)
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val cand = toks.filter(col("pos") % 7 =!= 3)
          .withColumn("tok",
            when(col("pos") % 5 === 2, upper(col("tok"))).otherwise(col("tok")))
        val ref2 = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("doc_id"),
            concat_ws("\u0001", col("tok"), col("nxt")).as("tok"))
        val cand2 = cand.withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("doc_id"),
            concat_ws("\u0001", col("tok"), col("nxt")).as("tok"))
        def clipped(c: DataFrame, r: DataFrame, cl: String, tt: String) = {
          val rc = r.groupBy(col("doc_id"), col("tok"))
            .agg(count(lit(1)).as("rc"))
          val cc = c.groupBy(col("doc_id"), col("tok"))
            .agg(count(lit(1)).as("cc"))
          cc.join(rc, Seq("doc_id", "tok"), "left")
            .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as(cl),
              sum(col("cc")).as(tt))
        }
        val k1 = clipped(cand, toks, "clip1", "tot1")
        val k2 = clipped(cand2, ref2, "clip2", "tot2")
        val lens = toks.agg(count(lit(1)).as("ref_len"))
          .crossJoin(cand.agg(count(lit(1)).as("cand_len")))
        k1.crossJoin(k2).crossJoin(lens)
          .select(col("clip1"), col("tot1"), col("clip2"), col("tot2"),
            col("ref_len"), col("cand_len"),
            floor(
              sqrt((col("clip1").cast("double") / col("tot1").cast("double"))
                * (col("clip2").cast("double") / col("tot2").cast("double")))
              * 1000000 + 0.5).cast("long").as("geo_prec_e6"),
            floor(least(lit(0.0), lit(1.0) -
                col("ref_len").cast("double") / col("cand_len").cast("double"))
              * 1000000 + 0.5).cast("long").as("bp_log_e6"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, CAST(pos AS BIGINT) - 1 AS pos, tok FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             |           generate_subscripts(string_split(text, ' '), 1) AS pos
             |    FROM documents) t
             |  WHERE length(tok) > 0),
             |cand AS (
             |  SELECT doc_id, pos,
             |         CASE WHEN pos % 5 = 2 THEN upper(tok) ELSE tok END AS tok
             |  FROM toks WHERE pos % 7 <> 3),
             |ref2 AS (
             |  SELECT doc_id, tok || chr(1) || nxt AS tok FROM (
             |    SELECT doc_id, tok,
             |           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
             |    FROM toks) t WHERE nxt IS NOT NULL),
             |cand2 AS (
             |  SELECT doc_id, tok || chr(1) || nxt AS tok FROM (
             |    SELECT doc_id, tok,
             |           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
             |    FROM cand) t WHERE nxt IS NOT NULL),
             |k1 AS (
             |  SELECT CAST(sum(least(cc, coalesce(rc, 0))) AS BIGINT) AS clip1,
             |         CAST(sum(cc) AS BIGINT) AS tot1
             |  FROM (SELECT doc_id, tok, count(*) AS cc FROM cand GROUP BY 1, 2) c
             |  LEFT JOIN (SELECT doc_id, tok, count(*) AS rc FROM toks
             |             GROUP BY 1, 2) r USING (doc_id, tok)),
             |k2 AS (
             |  SELECT CAST(sum(least(cc, coalesce(rc, 0))) AS BIGINT) AS clip2,
             |         CAST(sum(cc) AS BIGINT) AS tot2
             |  FROM (SELECT doc_id, tok, count(*) AS cc FROM cand2 GROUP BY 1, 2) c
             |  LEFT JOIN (SELECT doc_id, tok, count(*) AS rc FROM ref2
             |             GROUP BY 1, 2) r USING (doc_id, tok)),
             |lens AS (
             |  SELECT CAST((SELECT count(*) FROM toks) AS BIGINT) AS ref_len,
             |         CAST((SELECT count(*) FROM cand) AS BIGINT) AS cand_len)
             |SELECT clip1, tot1, clip2, tot2, ref_len, cand_len,
             |  CAST(floor(
             |    sqrt((CAST(clip1 AS DOUBLE) / CAST(tot1 AS DOUBLE))
             |       * (CAST(clip2 AS DOUBLE) / CAST(tot2 AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS geo_prec_e6,
             |  CAST(floor(
             |    least(CAST(0 AS DOUBLE),
             |          1 - CAST(ref_len AS DOUBLE) / CAST(cand_len AS DOUBLE))
             |    * 1000000 + 0.5) AS BIGINT) AS bp_log_e6
             |FROM k1, k2, lens""".stripMargin)
    ),
    Q(
      "eval_pass_at_k",
      // pass@k (round-10): the code-generation eval estimator from the
      // HumanEval paper — per problem with n attempts and c successes,
      // pass@k = 1 − C(n−c,k)/C(n,k), computed as the UNROLLED falling-
      // factorial ratio Π(n−c−i)/Π(n−i) entirely in BIGINT (n=20 per
      // problem, k ∈ {1,5}; numerator clamps to 0 when n−c < k) and
      // e6-pinned by integer division — zero cross-engine float drift.
      // Attempts are staged deterministically: problem = doc_id % 25,
      // success = pre-mod multiplicative hash < 30%. Scale: one map-side-
      // combined count per problem; output is O(problems) regardless of
      // attempt volume — the shape of every large eval sweep.
      (s, dir) => {
        Tables(s, dir, "documents")
          .select((col("doc_id") % 25).as("problem_id"),
            (expr("(doc_id % 1000003) * 2654435761 % 1000000007") % 100 < 30)
              .cast("long").as("ok"))
          .groupBy(col("problem_id"))
          .agg(count(lit(1)).as("n"), sum(col("ok")).as("c"))
          .withColumn("pass1_e6",
            expr("(1000000 * c) div n"))
          .withColumn("pass5_e6", expr(
            """CASE WHEN n - c < 5 THEN 1000000 ELSE
              |  (1000000 * ((n)*(n-1)*(n-2)*(n-3)*(n-4)
              |            - (n-c)*(n-c-1)*(n-c-2)*(n-c-3)*(n-c-4)))
              |  div ((n)*(n-1)*(n-2)*(n-3)*(n-4)) END""".stripMargin))
          .orderBy(col("problem_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id % 25 AS problem_id,
             |         CASE WHEN (doc_id % 1000003) * 2654435761
             |                   % 1000000007 % 100 < 30
             |              THEN 1 ELSE 0 END AS ok
             |  FROM documents),
             |g AS (
             |  SELECT problem_id, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(ok) AS BIGINT) AS c
             |  FROM a GROUP BY problem_id)
             |SELECT problem_id, n, c,
             |       (1000000 * c) // n AS pass1_e6,
             |       CASE WHEN n - c < 5 THEN 1000000 ELSE
             |         (1000000 * ((n)*(n-1)*(n-2)*(n-3)*(n-4)
             |                   - (n-c)*(n-c-1)*(n-c-2)*(n-c-3)*(n-c-4)))
             |         // ((n)*(n-1)*(n-2)*(n-3)*(n-4)) END AS pass5_e6
             |FROM g ORDER BY problem_id""".stripMargin)
    ),
    Q(
      "eval_pairwise_winrate",
      // Arena-style pairwise win-rate matrix (round-10): three "models"
      // score every prompt (deterministic integer scorers over the doc:
      // token count, distinct-token count, and a hash mix); for each
      // ordered model pair the census counts wins / ties / losses across
      // prompts and pins the e6 win rate — the leaderboard aggregate
      // behind every human-preference eval. One narrow scan, the matrix
      // is O(models²) rows regardless of prompt volume; scorers stay in
      // whole-stage codegen.
      (s, dir) => {
        val scored = Tables(s, dir, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("m0"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("m1"),
          expr("(doc_id % 1000003) * 2654435761 % 1000000007 % 97").as("m2"))
        val pairs = Seq((0, 1), (0, 2), (1, 2))
        pairs.map { case (a, b) =>
          scored.agg(
            sum(when(col(s"m$a") > col(s"m$b"), 1L).otherwise(0L)).as("wins"),
            sum(when(col(s"m$a") === col(s"m$b"), 1L).otherwise(0L)).as("ties"),
            sum(when(col(s"m$a") < col(s"m$b"), 1L).otherwise(0L)).as("losses"))
            .withColumn("pair", lit(s"m$a-vs-m$b"))
            .withColumn("winrate_e6", expr(
              "(1000000 * wins) div (wins + ties + losses)"))
            .select(col("pair"), col("wins"), col("ties"), col("losses"),
              col("winrate_e6"))
        }.reduce(_ unionByName _).orderBy(col("pair"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS m0,
             |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS m1,
             |         (doc_id % 1000003) * 2654435761 % 1000000007 % 97 AS m2
             |  FROM documents),
             |p AS (
             |  SELECT 'm0-vs-m1' AS pair, m0 AS a, m1 AS b FROM s
             |  UNION ALL SELECT 'm0-vs-m2', m0, m2 FROM s
             |  UNION ALL SELECT 'm1-vs-m2', m1, m2 FROM s)
             |SELECT pair,
             |       CAST(sum(CASE WHEN a > b THEN 1 ELSE 0 END) AS BIGINT) AS wins,
             |       CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS ties,
             |       CAST(sum(CASE WHEN a < b THEN 1 ELSE 0 END) AS BIGINT) AS losses,
             |       (1000000 * CAST(sum(CASE WHEN a > b THEN 1 ELSE 0 END) AS BIGINT))
             |         // CAST(count(*) AS BIGINT) AS winrate_e6
             |FROM p GROUP BY pair ORDER BY pair""".stripMargin)
    ),
    Q(
      "eval_bootstrap_winrate_ci",
      // Arena win rate WITH its confidence interval (round-14): a point
      // win rate without a CI is how leaderboards mislead — the
      // LMSYS-style report resamples the battle set and quotes the
      // 95% band. Battles: the m0-vs-m1 scorer pair from
      // eval_pairwise_winrate; resampling: the 100 TB-safe POISSON
      // bootstrap (sample_poisson_bootstrap's derandomized inverse-CDF
      // weights on a battle×replicate hash — no index materialization,
      // map-side expansion only); 40 replicate win rates as exact
      // integer divisions; the CI is the 2nd/39th order statistic.
      // Scale: 40× map-side rows folding to 40 partials per partition;
      // the order-statistic pass sorts 40 rows.
      (s, dir) => {
        val battles = Tables(s, dir, "documents").select(
          col("doc_id").as("k"),
          (size(split(col("text"), " ")).cast("long") >
            size(array_distinct(split(col("text"), " "))).cast("long"))
            .as("win"))
        val reps = s.range(0, 40).select(col("id").as("r"))
        val weighted = battles.crossJoin(broadcast(reps))
          .select(col("r"), col("win"),
            expr("""CASE WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 3679 THEN 0
                   WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 7358 THEN 1
                   WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9197 THEN 2
                   WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9810 THEN 3
                   ELSE 4 END""").as("w"))
        val repRates = weighted.groupBy(col("r"))
          .agg(sum(when(col("win"), col("w")).otherwise(0L)).as("ww"),
            sum(col("w")).as("wn"))
          .select(col("r"), expr("ww * 1000000 DIV wn").as("rate_e6"))
        val ranked = repRates.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rate_e6"), col("r"))))
        val point = battles.agg(
          sum(when(col("win"), 1L).otherwise(0L)).as("wins"),
          count(lit(1)).as("n"))
          .select(col("wins"), col("n"),
            expr("wins * 1000000 DIV n").as("winrate_e6"))
        point.crossJoin(
          ranked.agg(
            max(when(col("rn") === 2, col("rate_e6"))).as("ci_lo_e6"),
            max(when(col("rn") === 39, col("rate_e6"))).as("ci_hi_e6")))
      },
      Some("""WITH battles AS (
             |  SELECT doc_id AS k,
             |         CAST(len(string_split(text, ' ')) AS BIGINT)
             |           > CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS win
             |  FROM documents),
             |reps AS (SELECT CAST(unnest(range(0, 40)) AS BIGINT) AS r),
             |weighted AS (
             |  SELECT r, win,
             |         CASE WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 3679 THEN 0
             |              WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 7358 THEN 1
             |              WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9197 THEN 2
             |              WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9810 THEN 3
             |              ELSE 4 END AS w
             |  FROM battles CROSS JOIN reps),
             |rates AS (
             |  SELECT r, CAST(sum(CASE WHEN win THEN w ELSE 0 END) AS BIGINT) * 1000000
             |           // CAST(sum(w) AS BIGINT) AS rate_e6
             |  FROM weighted GROUP BY r),
             |ranked AS (
             |  SELECT rate_e6, row_number() OVER (ORDER BY rate_e6, r) AS rn FROM rates),
             |point AS (
             |  SELECT CAST(sum(CASE WHEN win THEN 1 ELSE 0 END) AS BIGINT) AS wins,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM battles)
             |SELECT wins, n, wins * 1000000 // n AS winrate_e6,
             |       (SELECT CAST(max(CASE WHEN rn = 2 THEN rate_e6 END) AS BIGINT) FROM ranked) AS ci_lo_e6,
             |       (SELECT CAST(max(CASE WHEN rn = 39 THEN rate_e6 END) AS BIGINT) FROM ranked) AS ci_hi_e6
             |FROM point""".stripMargin)
    ),
    Q(
      "eval_chrf_similarity",
      // chrF-style character-n-gram F-score (round-12): the surface-level
      // text-similarity metric of MT/summarization evals, here scoring
      // each document against a deterministic corruption of itself (every
      // 7th token dropped — the "candidate"). Char 3-grams on both sides,
      // clipped overlap Σ min(count_cand, count_ref), and the balanced
      // F-score collapses to the EXACT integer form 2·overlap/(nc+nr)
      // (P = ov/nc, R = ov/nr ⇒ 2PR/(P+R) = 2·ov/(nc+nr)) — so the whole
      // metric is BIGINT counts and one e6-pinned division; no float
      // anywhere. Scale: the explode is O(chars) rows but collapses in a
      // map-side (doc, gram) count; the overlap join keys on (doc, gram)
      // — at 100 TB ship xxhash64(gram) instead of the 3 chars, same
      // plan. This is the eval gate for "did the pipeline mangle the
      // text": chrF of output-vs-input far below the expected deletion
      // share flags corruption beyond the intended edit.
      (s, dir) => {
        // Single-pass shape (optimization guide §2.4): the old plan ran
        // ref and cand gram pipelines separately (2 scans, 2 (doc, gram)
        // aggregations) and then re-joined them THREE times (totals join,
        // overlap join, final join — 3 extra Exchanges). Tagging each
        // gram with its side and aggregating once computes c_r and c_c
        // in one (doc, gram) pass, and nr/nc/ov collapse into ONE
        // (doc) aggregation: grams on one side only contribute
        // least(c_r, c_c) = 0, identical to the old inner join's sum,
        // and `ov > 0` reproduces the old inner joins' row set exactly
        // (a row survived iff the doc had ≥1 common gram). fanout: the
        // gram explode is the row's CPU and the single-file fixture
        // scan is one task (guide §2.5).
        val d = util.fanout(Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").as("rs"),
            expr("array_join(filter(split(text, ' '), (t, i) -> (i + 1) % 7 != 0), ' ')")
              .as("cs")))
        def gramsOf(c: String) =
          s"""CASE WHEN length($c) < 3 THEN array()
             |ELSE transform(sequence(1, length($c) - 2), i -> substring($c, i, 3))
             |END""".stripMargin
        val counts = d.select(col("doc_id"), explode(expr(
            s"""concat(
               |  transform(${gramsOf("rs")}, g -> struct(g AS g, 1 AS is_r)),
               |  transform(${gramsOf("cs")}, g -> struct(g AS g, 0 AS is_r)))"""
              .stripMargin)).as("t"))
          .groupBy(col("doc_id"), col("t.g"))
          .agg(sum(when(col("t.is_r") === 1, 1L).otherwise(0L)).as("c_r"),
            sum(when(col("t.is_r") === 0, 1L).otherwise(0L)).as("c_c"))
        counts.groupBy(col("doc_id"))
          .agg(sum(col("c_r")).as("nr"), sum(col("c_c")).as("nc"),
            sum(least(col("c_r"), col("c_c"))).as("ov"))
          .filter(col("ov") > 0)
          .select(col("doc_id"), col("nc"), col("nr"), col("ov"),
            expr("(2 * ov * 1000000) div (nc + nr)").as("chrf_e6"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text AS rs,
             |         (SELECT string_agg(t, ' ' ORDER BY i)
             |          FROM (SELECT UNNEST(string_split(text, ' ')) AS t,
             |                       UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS i)
             |          WHERE i % 7 <> 0) AS cs
             |  FROM documents),
             |rg AS (
             |  SELECT doc_id, substring(rs, CAST(i AS INT), 3) AS g,
             |         CAST(count(*) AS BIGINT) AS c_r
             |  FROM d, unnest(range(1, length(rs) - 1)) AS t(i)
             |  GROUP BY 1, 2),
             |cg AS (
             |  SELECT doc_id, substring(cs, CAST(i AS INT), 3) AS g,
             |         CAST(count(*) AS BIGINT) AS c_c
             |  FROM d, unnest(range(1, length(cs) - 1)) AS t(i)
             |  GROUP BY 1, 2),
             |tot AS (
             |  SELECT r.doc_id, nr, nc FROM
             |    (SELECT doc_id, CAST(sum(c_r) AS BIGINT) AS nr FROM rg GROUP BY 1) r
             |    JOIN (SELECT doc_id, CAST(sum(c_c) AS BIGINT) AS nc FROM cg GROUP BY 1) c
             |    USING (doc_id)),
             |ov AS (
             |  SELECT doc_id, CAST(sum(least(c_r, c_c)) AS BIGINT) AS ov
             |  FROM rg JOIN cg USING (doc_id, g) GROUP BY 1)
             |SELECT doc_id, nc, nr, ov,
             |       (2 * ov * 1000000) // (nc + nr) AS chrf_e6
             |FROM tot JOIN ov USING (doc_id)
             |ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "eval_pinball_loss",
      // Pinball (quantile) loss (round-12): the metric that scores
      // QUANTILE forecasts — asymmetric by design, penalizing
      // under-prediction q-to-(1−q) against over-prediction, which is how
      // capacity/latency forecasting is actually graded (a p90 forecast
      // that undershoots is worse than one that overshoots). Forecaster
      // under test: the lag-1 naive baseline per user (previous event's
      // value predicts the next). Errors are exact cents; the loss at
      // q ∈ {10, 50, 90}% is max(q·e, (q−100)·e) in percent-scaled
      // BIGINT, so sums are exact and only the final mean is e2-pinned.
      // Scale: one window lag per user + a map-side conditional
      // aggregate; 3 output rows at any volume.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val errs = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
          .withColumn("pred", lag(col("c"), 1).over(w))
          .filter(col("pred").isNotNull)
          .withColumn("e", col("c") - col("pred"))
        errs.select(col("e"), explode(expr("array(10L, 50L, 90L)")).as("q_pct"))
          .groupBy(col("q_pct"))
          .agg(count(lit(1)).as("n"),
            sum(greatest(col("q_pct") * col("e"),
              (col("q_pct") - 100L) * col("e"))).as("loss_x100"))
          .select(col("q_pct"), col("n"), col("loss_x100"),
            expr("CAST(floor(CAST(loss_x100 AS DOUBLE) / CAST(n * 100 AS DOUBLE) * 100 + 0.5) AS BIGINT)")
              .as("mean_loss_e2"))
          .orderBy(col("q_pct"))
      },
      Some("""WITH base AS (
             |  SELECT user_id, ts, event_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             |         lag(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
             |           (PARTITION BY user_id ORDER BY ts, event_id) AS pred
             |  FROM events),
             |errs AS (SELECT c - pred AS e FROM base WHERE pred IS NOT NULL),
             |x AS (SELECT e, CAST(q AS BIGINT) AS q_pct
             |      FROM errs, (VALUES (10), (50), (90)) t(q))
             |SELECT q_pct, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(greatest(q_pct * e, (q_pct - 100) * e)) AS BIGINT) AS loss_x100,
             |       CAST(floor(CAST(sum(greatest(q_pct * e, (q_pct - 100) * e)) AS DOUBLE)
             |            / CAST(count(*) * 100 AS DOUBLE) * 100 + 0.5) AS BIGINT) AS mean_loss_e2
             |FROM x GROUP BY q_pct ORDER BY q_pct""".stripMargin)
    ),
    Q(
      "eval_mcnemar_test",
      // McNemar's paired test (round-12): the correct significance test
      // for "is model A better than model B ON THE SAME PROMPTS" — only
      // the DISCORDANT pairs carry signal (b = A right & B wrong, c = the
      // reverse); concordant prompts cancel, which is why an unpaired
      // proportion z-test overstates certainty on shared eval sets. The
      // statistic is the continuity-corrected (|b−c|−1)²/(b+c). Truth and
      // both predictors are deterministic integer functions of the doc,
      // so b and c are exact BIGINTs and the single final division is
      // r2-pinned. Scale: one map-side conditional aggregate — a 1-row
      // answer at any corpus size, the same reduction shape as the
      // win-rate census.
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            (col("doc_id") % 2).as("truth"),
            (size(split(col("text"), " ")).cast("long") % 2).as("pa"),
            (size(array_distinct(split(col("text"), " "))).cast("long") % 2).as("pb"))
          .agg(
            sum(when(col("pa") === col("truth") && col("pb") =!= col("truth"), 1L)
              .otherwise(0L)).as("b"),
            sum(when(col("pa") =!= col("truth") && col("pb") === col("truth"), 1L)
              .otherwise(0L)).as("c"))
          .select(col("b"), col("c"),
            graft.util.r2(expr(
              """CASE WHEN b + c = 0 THEN CAST(0 AS DOUBLE)
                |ELSE CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                |     / CAST(b + c AS DOUBLE) END""".stripMargin)).as("chi2_cc"))
          .orderBy(col("b"))
      },
      Some(s"""WITH p AS (
              |  SELECT doc_id % 2 AS truth,
              |         CAST(len(string_split(text, ' ')) AS BIGINT) % 2 AS pa,
              |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) % 2 AS pb
              |  FROM documents),
              |f AS (
              |  SELECT CAST(sum(CASE WHEN pa = truth AND pb <> truth THEN 1 ELSE 0 END) AS BIGINT) AS b,
              |         CAST(sum(CASE WHEN pa <> truth AND pb = truth THEN 1 ELSE 0 END) AS BIGINT) AS c
              |  FROM p)
              |SELECT b, c,
              |       ${graft.util.r2sql(
                 "CASE WHEN b + c = 0 THEN CAST(0 AS DOUBLE) " +
                   "ELSE CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) " +
                   "/ CAST(b + c AS DOUBLE) END")} AS chi2_cc
              |FROM f ORDER BY b""".stripMargin)
    ),
    Q(
      "eval_bradley_terry_strength",
      // Bradley–Terry strength fit over the pairwise arena (round-12):
      // eval_pairwise_winrate's raw win matrix ranks models only
      // per-pair; Bradley–Terry turns it into GLOBAL strengths — the
      // model behind Elo-style LLM leaderboards (win P(i beats j) =
      // p_i/(p_i+p_j)). Fit by 3 unrolled iterations of the classic MM
      // update p_i ← W_i / Σ_j n_ij/(p_i+p_j) from a flat start, ties
      // excluded (standard BT). The UPDATE EXPRESSIONS are one shared
      // string per parameter evaluated by BOTH engines ([[btUpdates]]),
      // so the float division sequences are structurally identical and
      // the normalized strengths hash-match after r2. Scale: the corpus
      // collapses to a models² win matrix in one map-side aggregate
      // (6 scalars here); the iteration is O(models²) per step on ONE
      // row — at 100 TB the fit costs the same as at sf0.001, only the
      // count pass scales.
      (s, dir) => {
        val scored = Tables(s, dir, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("m0"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("m1"),
          expr("(doc_id % 1000003) * 2654435761 % 1000000007 % 97").as("m2"))
        val w = scored.agg(
          expr("CAST(sum(CASE WHEN m0 > m1 THEN 1 ELSE 0 END) AS DOUBLE)").as("w01"),
          expr("CAST(sum(CASE WHEN m1 > m0 THEN 1 ELSE 0 END) AS DOUBLE)").as("w10"),
          expr("CAST(sum(CASE WHEN m0 > m2 THEN 1 ELSE 0 END) AS DOUBLE)").as("w02"),
          expr("CAST(sum(CASE WHEN m2 > m0 THEN 1 ELSE 0 END) AS DOUBLE)").as("w20"),
          expr("CAST(sum(CASE WHEN m1 > m2 THEN 1 ELSE 0 END) AS DOUBLE)").as("w12"),
          expr("CAST(sum(CASE WHEN m2 > m1 THEN 1 ELSE 0 END) AS DOUBLE)").as("w21"))
        val wcols = Seq("w01", "w10", "w02", "w20", "w12", "w21")
        val start = w.selectExpr(wcols ++ Seq(
          "CAST(1 AS DOUBLE) AS p0", "CAST(1 AS DOUBLE) AS p1",
          "CAST(1 AS DOUBLE) AS p2"): _*)
        val fitted = (1 to 3).foldLeft(start) { (df, _) =>
          df.selectExpr(wcols ++ btUpdates.map { case (n, e) => s"$e AS $n" }: _*)
        }
        fitted.selectExpr(
          "stack(3, 'm0', p0 / (p0 + p1 + p2), 'm1', p1 / (p0 + p1 + p2), " +
            "'m2', p2 / (p0 + p1 + p2)) AS (model, raw)")
          .select(col("model"), graft.util.r2(col("raw")).as("strength"))
          .orderBy(col("model"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |         CAST(len(string_split(text, ' ')) AS BIGINT) AS m0,
              |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS m1,
              |         (doc_id % 1000003) * 2654435761 % 1000000007 % 97 AS m2
              |  FROM documents),
              |w AS (
              |  SELECT CAST(sum(CASE WHEN m0 > m1 THEN 1 ELSE 0 END) AS DOUBLE) AS w01,
              |         CAST(sum(CASE WHEN m1 > m0 THEN 1 ELSE 0 END) AS DOUBLE) AS w10,
              |         CAST(sum(CASE WHEN m0 > m2 THEN 1 ELSE 0 END) AS DOUBLE) AS w02,
              |         CAST(sum(CASE WHEN m2 > m0 THEN 1 ELSE 0 END) AS DOUBLE) AS w20,
              |         CAST(sum(CASE WHEN m1 > m2 THEN 1 ELSE 0 END) AS DOUBLE) AS w12,
              |         CAST(sum(CASE WHEN m2 > m1 THEN 1 ELSE 0 END) AS DOUBLE) AS w21
              |  FROM s),
              |i0 AS (SELECT w01, w10, w02, w20, w12, w21,
              |              CAST(1 AS DOUBLE) AS p0, CAST(1 AS DOUBLE) AS p1,
              |              CAST(1 AS DOUBLE) AS p2 FROM w),
              |${btIterSql("i1", "i0")},
              |${btIterSql("i2", "i1")},
              |${btIterSql("i3", "i2")}
              |SELECT model, ${graft.util.r2sql("raw")} AS strength FROM (
              |  SELECT 'm0' AS model, p0 / (p0 + p1 + p2) AS raw FROM i3
              |  UNION ALL SELECT 'm1', p1 / (p0 + p1 + p2) FROM i3
              |  UNION ALL SELECT 'm2', p2 / (p0 + p1 + p2) FROM i3)
              |ORDER BY model""".stripMargin)
    ),
    Q(
      "eval_krippendorff_alpha",
      // Krippendorff's alpha, nominal data (round-12): inter-annotator
      // agreement for labeling pipelines — unlike Cohen's kappa
      // (eval/stat tier, 2 raters) alpha handles ANY rater count via the
      // coincidence-matrix identity. Three deterministic "annotators"
      // label every document (lang; lang with a doc_id%7 'xx' defector;
      // lang with a doc_id%5 source defector), then
      //   Do = Σ_u Σ_c n_uc·(m − n_uc) / (n·m·(m−1)),
      //   De = Σ_c N_c·(N − N_c) / (N·(N−1)),  α = 1 − Do/De
      // — every term an exact BIGINT until the final two divisions, so
      // the only float ops are shared and r2-pinned. Scale: one explode
      // to (unit, label) counts, one global label census; output is a
      // single row at any corpus size; at 100 TB this is the agreement
      // gate run over sampled human/LLM-judge labels before a labeling
      // run is trusted.
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val stacked = d.selectExpr("doc_id", "lang AS lab")
          .unionAll(d.selectExpr("doc_id",
            "CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lab"))
          .unionAll(d.selectExpr("doc_id",
            "CASE WHEN doc_id % 5 = 0 THEN source ELSE lang END AS lab"))
        val unitCounts = stacked.groupBy(col("doc_id"), col("lab"))
          .agg(count(lit(1)).as("nuc"))
        val doNum = unitCounts
          .agg(sum(col("nuc") * (lit(3L) - col("nuc"))).as("do_num"),
            (countDistinct(col("doc_id"))).as("n_units"))
        val deNum = unitCounts.groupBy(col("lab"))
          .agg(sum(col("nuc")).as("nc"))
          .withColumn("n_total",
            sum(col("nc")).over(Window.partitionBy(lit(1))))
          .agg(sum(col("nc") * (col("n_total") - col("nc"))).as("de_num"),
            max(col("n_total")).as("n_total"))
        doNum.crossJoin(deNum)
          .select(col("n_units"), col("do_num").as("disagree_pairs"),
            graft.util.r2(lit(1.0) -
              (col("do_num").cast("double") /
                (col("n_units") * 3 * 2).cast("double")) /
              (col("de_num").cast("double") /
                (col("n_total") * (col("n_total") - 1)).cast("double")))
              .as("alpha"))
          .orderBy(col("n_units"))
      },
      Some(s"""WITH stacked AS (
              |  SELECT doc_id, lang AS lab FROM documents
              |  UNION ALL
              |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END
              |  FROM documents
              |  UNION ALL
              |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN source ELSE lang END
              |  FROM documents),
              |uc AS (
              |  SELECT doc_id, lab, CAST(count(*) AS BIGINT) AS nuc
              |  FROM stacked GROUP BY doc_id, lab),
              |don AS (
              |  SELECT CAST(sum(nuc * (3 - nuc)) AS BIGINT) AS do_num,
              |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_units
              |  FROM uc),
              |lc AS (SELECT lab, CAST(sum(nuc) AS BIGINT) AS nc FROM uc GROUP BY lab),
              |lct AS (SELECT lab, nc, CAST(sum(nc) OVER () AS BIGINT) AS n_total FROM lc),
              |den AS (
              |  SELECT CAST(sum(nc * (n_total - nc)) AS BIGINT) AS de_num,
              |         CAST(max(n_total) AS BIGINT) AS n_total
              |  FROM lct)
              |SELECT n_units, do_num AS disagree_pairs,
              |       ${graft.util.r2sql(
                 "1.0 - (CAST(do_num AS DOUBLE) / CAST(n_units * 3 * 2 AS DOUBLE)) / " +
                   "(CAST(de_num AS DOUBLE) / CAST(n_total * (n_total - 1) AS DOUBLE))")} AS alpha
              |FROM don, den ORDER BY n_units""".stripMargin)
    ),
    Q(
      "eval_dpo_margin",
      // DPO implicit-reward margin audit (round-13): after a DPO run, the
      // first diagnostic is the implicit reward r = β[(logπ_c − logπref_c)
      // − (logπ_r − logπref_r)] over held-out preference pairs — its
      // accuracy (share of pairs the policy orders correctly) and mean
      // margin per language, the two numbers that say whether the policy
      // actually learned the preference or just drifted from the
      // reference. Pairs reuse pipeline_preference_pairs' construction
      // (prompt = doc_id % 50, chosen/rejected by the integer text score);
      // the log-probability FIXTURE is exact integer text arithmetic
      // (policy: −1000·bytes − 7·spaces, reference: −1100·bytes) so the
      // margin in β-milli units is BIGINT end-to-end — the accuracy flag
      // can never flip on an ulp. Scale: one groupBy(prompt) with
      // max_by/min_by (no within-group join), one groupBy(lang) rollup —
      // two keyed shuffles over O(prompts) rows.
      (s, dir) => {
        val scored = Tables(s, dir, "documents").select(
          col("doc_id"), col("lang"),
          (col("doc_id") % 50).as("prompt_id"),
          (octet_length(col("text")) * 1000L +
            (octet_length(col("text")) -
              octet_length(regexp_replace(col("text"), " ", ""))) * 7L)
            .cast("long").as("score"),
          // implicit per-doc log-ratio in milli-units: logπ − logπref =
          // (−1000·bytes − 7·spaces) − (−1100·bytes) = 100·bytes − 7·spaces
          (octet_length(col("text")) * 100L -
            (octet_length(col("text")) -
              octet_length(regexp_replace(col("text"), " ", ""))) * 7L)
            .cast("long").as("logratio_milli"))
        val pairs = scored.groupBy(col("prompt_id"))
          .agg(
            max_by(struct(col("logratio_milli"), col("lang")),
              struct(col("score"), col("doc_id"))).as("ch"),
            min_by(struct(col("logratio_milli"), col("lang")),
              struct(col("score"), col("doc_id"))).as("rj"),
            (max(col("score")) - min(col("score"))).as("spread"),
            count(lit(1)).as("n_candidates"))
          .filter(col("spread") > 0 && col("n_candidates") >= 2)
          // β = 0.1 ⇒ margin in β-milli = (Δlogratio_milli) / 10, exact
          // because the fixture's milli units are multiples of 1 (integer
          // div is floor — keep the raw difference instead, scale-free)
          .select(col("ch.lang").as("lang"),
            (col("ch.logratio_milli") - col("rj.logratio_milli"))
              .as("margin_milli"))
        pairs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("margin_milli") > 0, 1L).otherwise(0L)).as("n_correct"),
            sum(col("margin_milli")).as("sum_margin_milli"))
          .select(col("lang"), col("n_pairs"), col("n_correct"),
            expr("CAST(floor(CAST(n_correct AS DOUBLE) / n_pairs * 1000000 + 0.5) AS BIGINT)")
              .as("acc_e6"),
            col("sum_margin_milli"))
          .orderBy(col("lang"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id, lang, doc_id % 50 AS prompt_id,
             |         CAST(strlen(text) * 1000
             |              + (strlen(text) - strlen(replace(text, ' ', ''))) * 7
             |              AS BIGINT) AS score,
             |         CAST(strlen(text) * 100
             |              - (strlen(text) - strlen(replace(text, ' ', ''))) * 7
             |              AS BIGINT) AS logratio_milli
             |  FROM documents),
             |ranked AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY prompt_id
             |                       ORDER BY score DESC, doc_id DESC) AS rb,
             |    row_number() OVER (PARTITION BY prompt_id
             |                       ORDER BY score ASC, doc_id ASC) AS rw,
             |    max(score) OVER (PARTITION BY prompt_id)
             |      - min(score) OVER (PARTITION BY prompt_id) AS spread,
             |    count(*) OVER (PARTITION BY prompt_id) AS n_candidates
             |  FROM scored),
             |pairs AS (
             |  SELECT b.lang,
             |         b.logratio_milli - w.logratio_milli AS margin_milli
             |  FROM ranked b JOIN ranked w
             |    ON b.prompt_id = w.prompt_id AND b.rb = 1 AND w.rw = 1
             |  WHERE b.spread > 0 AND b.n_candidates >= 2)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(sum(CASE WHEN margin_milli > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
             |       CAST(floor(CAST(sum(CASE WHEN margin_milli > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             |            / count(*) * 1000000 + 0.5) AS BIGINT) AS acc_e6,
             |       CAST(sum(margin_milli) AS BIGINT) AS sum_margin_milli
             |FROM pairs GROUP BY lang ORDER BY lang""".stripMargin)
    ),
    Q(
      "eval_roc_curve_deciles",
      // ROC curve by score decile (round-13): the CURVE behind the scalar
      // AUC (eval_auc_ranksum) — per descending-score decile, cumulative
      // TPR/FPR, the plot every threshold decision is read off of (pick
      // the knee, pick the FPR budget). Same integer scorer as the AUC
      // row; deciles are assigned with a deterministic (score, vec_id)
      // tiebreak, cumulative counts are exact BIGINTs from one window
      // pass over the O(10) decile aggregate, and the two rates divide
      // once at the end into e6 pins. Output O(10) at any corpus size —
      // the curve never materializes per-row state past the first
      // aggregate.
      (s, dir) => {
        val d = scored(s, dir)
          .withColumn("dec", ntile(10).over(
            Window.orderBy(col("score").desc, col("vec_id"))))
        val per = d.groupBy(col("dec").cast("long").as("decile"))
          .agg(sum(col("pos")).as("tp"), sum(lit(1L) - col("pos")).as("fp"))
        val w = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        per
          .withColumn("ctp", sum(col("tp")).over(w))
          .withColumn("cfp", sum(col("fp")).over(w))
          .withColumn("np", sum(col("tp")).over(Window.partitionBy()))
          .withColumn("nn", sum(col("fp")).over(Window.partitionBy()))
          .select(col("decile"), col("ctp"), col("cfp"),
            expr("CAST(floor(CAST(ctp AS DOUBLE) / np * 1000000 + 0.5) AS BIGINT)")
              .as("tpr_e6"),
            expr("CAST(floor(CAST(cfp AS DOUBLE) / nn * 1000000 + 0.5) AS BIGINT)")
              .as("fpr_e6"))
          .orderBy(col("decile"))
      },
      Some(s"""$scoredSql,
              |d AS (
              |  SELECT pos, ntile(10) OVER (ORDER BY score DESC, vec_id) AS dec
              |  FROM scored),
              |per AS (
              |  SELECT CAST(dec AS BIGINT) AS decile,
              |         CAST(sum(pos) AS BIGINT) AS tp,
              |         CAST(sum(1 - pos) AS BIGINT) AS fp
              |  FROM d GROUP BY dec),
              |cum AS (
              |  SELECT decile,
              |         CAST(sum(tp) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ctp,
              |         CAST(sum(fp) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cfp,
              |         CAST(sum(tp) OVER () AS BIGINT) AS np,
              |         CAST(sum(fp) OVER () AS BIGINT) AS nn
              |  FROM per)
              |SELECT decile, ctp, cfp,
              |       CAST(floor(CAST(ctp AS DOUBLE) / np * 1000000 + 0.5) AS BIGINT) AS tpr_e6,
              |       CAST(floor(CAST(cfp AS DOUBLE) / nn * 1000000 + 0.5) AS BIGINT) AS fpr_e6
              |FROM cum ORDER BY decile""".stripMargin)
    ),
    Q(
      "eval_token_f1",
      // Token-overlap F1 (round-13): the SQuAD-style QA metric — treat
      // the first 30 tokens of each document as the "prediction" and
      // tokens 11..40 as the "reference" (a deterministic overlapping
      // pair both engines derive from the same text), score their
      // MULTISET token overlap, and report micro-F1 per language:
      // F1 = 2·Σoverlap / (Σ|pred| + Σ|ref|). Multiset intersection is
      // Σ_tok min(count_pred, count_ref) — the exact SQuAD definition,
      // not set-Jaccard. Everything is an integer count until ONE e6
      // division per language row.
      // Scale: one posexplode bounded at 40 positions/doc, one
      // (doc, token) group with map-side partials, one O(langs) rollup.
      // The shuffle carries token counts, never text.
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            posexplode(slice(split(lower(col("text")), " "), 1, 40))
              .as(Seq("pos", "tok")))
          .groupBy(col("doc_id"), col("lang"), col("tok"))
          .agg(sum(when(col("pos") < 30, 1L).otherwise(0L)).as("cp"),
            sum(when(col("pos") >= 10, 1L).otherwise(0L)).as("cr"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(least(col("cp"), col("cr"))).as("ov"),
            sum(col("cp")).as("lp"), sum(col("cr")).as("lr"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ov")).as("sum_overlap"),
            expr("CAST(floor(CAST(2 AS DOUBLE) * sum(ov) / (sum(lp) + sum(lr)) * 1000000 + 0.5) AS BIGINT)")
              .as("micro_f1_e6"))
          .orderBy(col("lang"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |         unnest(list_slice(string_split(lower(text), ' '), 1, 40)) AS tok,
             |         generate_subscripts(list_slice(string_split(lower(text), ' '), 1, 40), 1) AS pos
             |  FROM documents),
             |cnt AS (
             |  SELECT doc_id, lang, tok,
             |         CAST(sum(CASE WHEN pos <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
             |         CAST(sum(CASE WHEN pos >= 11 THEN 1 ELSE 0 END) AS BIGINT) AS cr
             |  FROM toks GROUP BY doc_id, lang, tok),
             |per_doc AS (
             |  SELECT doc_id, lang, CAST(sum(least(cp, cr)) AS BIGINT) AS ov,
             |         CAST(sum(cp) AS BIGINT) AS lp, CAST(sum(cr) AS BIGINT) AS lr
             |  FROM cnt GROUP BY doc_id, lang)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(ov) AS BIGINT) AS sum_overlap,
             |       CAST(floor(2.0 * sum(ov) / (sum(lp) + sum(lr)) * 1000000 + 0.5) AS BIGINT) AS micro_f1_e6
             |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin)
    ),
    Q(
      "eval_rank_biased_overlap",
      // Rank-biased overlap (round-13): how similar are two RANKINGS of
      // the same items — here part revenue ranks in 1995 vs 1996 —
      // weighting agreement at the top far more than the tail (RBO,
      // Webber et al.; the ranking-drift metric for "did the
      // re-ranker/objective change what surfaces first", where
      // eval_kendall_tau weights all pairs equally). Truncated form at
      // depth 20, p = 0.9: RBO@20 = Σ_d p^(d−1)·|A_d ∩ B_d|/d, divided
      // by Σ_d p^(d−1) so identical rankings score exactly 1.
      // The p-powers are PRECOMPUTED e9 integer
      // constants inlined in BOTH engines (retrieval_metrics precedent —
      // no libm pow in the metric); prefix overlaps count items with
      // max(rank_a, rank_b) ≤ d, exact integers; one final division.
      // Scale: two grouped rank windows + a 20-row depth expansion of
      // the top-20 items only — O(1) work after the revenue rollups.
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey").as("pk"), year(col("o_orderdate")).as("yr"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100
              + lit(0.5)).cast("long").as("cents"))
          .filter(col("yr").isin(1995, 1996))
        val rev = li.groupBy(col("pk"), col("yr"))
          .agg(sum(col("cents")).as("rev"))
        val ranked = rev
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("yr"))
              .orderBy(col("rev").desc, col("pk"))))
          .filter(col("rnk") <= 20)
        val a = ranked.filter(col("yr") === 1995)
          .select(col("pk"), col("rnk").as("ra"))
        val b = ranked.filter(col("yr") === 1996)
          .select(col("pk"), col("rnk").as("rb"))
        val both = a.join(b, "pk")
          .select(greatest(col("ra"), col("rb")).cast("long").as("dmin"))
        val depths = s.range(1, 21).select(col("id").as("d"))
        val ov = depths.join(both, col("dmin") <= col("d"), "left")
          .groupBy(col("d"))
          .agg(sum(when(col("dmin").isNotNull, 1L).otherwise(0L)).as("ov"))
        ov.select(col("d"), col("ov"),
            expr(s"""(ov * element_at(array(${rboWeightsE9.mkString("L, ")}L),
                    CAST(d AS INT))) DIV d""").as("term"))
          .agg(count(lit(1)).as("depth"),
            sum(col("ov")).as("sum_overlap"),
            expr(s"sum(term) * 1000000 DIV ${rboNormE9}L").as("rbo_e6"))
      },
      Some(s"""WITH li AS (
              |  SELECT l_partkey AS pk, year(o_orderdate) AS yr,
              |         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  WHERE year(o_orderdate) IN (1995, 1996)),
              |rev AS (SELECT pk, yr, CAST(sum(cents) AS BIGINT) AS rev
              |        FROM li GROUP BY pk, yr),
              |ranked AS (
              |  SELECT pk, yr,
              |         row_number() OVER (PARTITION BY yr ORDER BY rev DESC, pk) AS rnk
              |  FROM rev QUALIFY rnk <= 20),
              |inboth AS (
              |  SELECT CAST(greatest(a.rnk, b.rnk) AS BIGINT) AS dmin
              |  FROM (SELECT pk, rnk FROM ranked WHERE yr = 1995) a
              |  JOIN (SELECT pk, rnk FROM ranked WHERE yr = 1996) b USING (pk)),
              |depths AS (SELECT CAST(unnest(range(1, 21)) AS BIGINT) AS d),
              |ov AS (
              |  SELECT d, CAST(sum(CASE WHEN dmin IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ov
              |  FROM depths LEFT JOIN inboth ON dmin <= d GROUP BY d),
              |wts AS (SELECT CAST(unnest(range(1, 21)) AS BIGINT) AS d,
              |               CAST(unnest([${rboWeightsE9.mkString(", ")}]) AS BIGINT) AS w),
              |terms AS (
              |  SELECT d, ov, (ov * w) // d AS term
              |  FROM ov JOIN wts USING (d))
              |SELECT CAST(count(*) AS BIGINT) AS depth,
              |       CAST(sum(ov) AS BIGINT) AS sum_overlap,
              |       CAST(sum(term) * 1000000 // ${rboNormE9} AS BIGINT) AS rbo_e6
              |FROM terms""".stripMargin)
    ))

  /** RBO p-power weights p^(d−1) at p = 0.9, e9-quantized integer
    * literals shared verbatim by both engines (no runtime pow).
    */
  private lazy val rboWeightsE9: Seq[Long] =
    (0 until 20).map(d => math.floor(math.pow(0.9, d) * 1e9 + 0.5).toLong)

  /** Normalizer Σ p^(d−1) over the 20 depths, same e9 units. */
  private lazy val rboNormE9: Long = rboWeightsE9.sum
}
