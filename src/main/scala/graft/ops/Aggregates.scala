package graft.ops

import graft.{Q, Tables, util}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.4 aggregation. Shapes mirror the rollups an LMS-replica warehouse runs
  * (SURVEY.md §2.4); every one is a `HashAggregateExec` with map-side partial
  * aggregation, so at 100 TB the shuffle carries one row per (partition ×
  * group), not per input row.
  */
object Aggregates {

  /** Portable deterministic HLL SQL (round-14, verdict #2), emitted for
    * either engine (`duck` switches `//` vs `DIV`, `xor()` vs `^`,
    * `<<` vs `shiftleft`, and the range-TVF column name — everything
    * else is the identical integer math).
    *
    * Pipeline: key → murmur3 fmix32 finalizer (the xor-shift /
    * wrapping-multiply avalanche, int64-safe: each 32-bit multiply is
    * split into 16-bit halves so no intermediate exceeds 2^48) →
    * register j = low 8 bits, suffix v = remaining 24 bits → rho =
    * 25 − bitlen(v) by a range-join against 25 power-of-two rows
    * (v = 0 → 25) → per-register max → Z as the scaled BIGINT
    * Σ 2^(25−M) (empty registers contribute 2^25) → E = α·m²·2²⁵/Z
    * with linear counting below 2.5m. An avalanche hash is load-bearing:
    * affine mod-prime scrambles spread consecutive keys TOO evenly
    * (3-distance theorem), wrecking the binomial occupancy statistics
    * linear counting inverts — measured +40–50% bias on the fixture.
    *
    * `partial` (the merge row): sketch per (group, partial, register)
    * first, then union-merge by per-register MAX up to the group —
    * lossless at equal m, the property OperatorSpec pins.
    */
  private[graft] def hllSql(duck: Boolean, table: String, key: String,
      grp: String, estName: String, partial: Option[String]): String = {
    val div = if (duck) "//" else "DIV"
    def xor(a: String, b: String) = if (duck) s"xor($a, $b)" else s"($a ^ $b)"
    def shl(e: String) =
      if (duck) s"(CAST(1 AS BIGINT) << CAST($e AS INT))"
      else s"shiftleft(CAST(1 AS BIGINT), CAST($e AS INT))"
    val rangeTvf =
      if (duck) "FROM range(0, 25) t(i)" else "FROM range(0, 25)"
    val rangeCol = if (duck) "i" else "id"
    val pt = partial.map(c => s", $c AS pt").getOrElse("")
    val ptCol = partial.map(_ => ", pt").getOrElse("")
    val regCte = partial match {
      case None =>
        s"""reg AS (
           |  SELECT g, j, max(CASE WHEN v = 0 THEN 25 ELSE 25 - p.bl END) AS mj
           |  FROM bkt LEFT JOIN pows p ON v >= p.lb AND v < p.lb * 2
           |  GROUP BY g, j)""".stripMargin
      case Some(_) =>
        s"""partials AS (
           |  SELECT g, pt, j, max(CASE WHEN v = 0 THEN 25 ELSE 25 - p.bl END) AS mj
           |  FROM bkt LEFT JOIN pows p ON v >= p.lb AND v < p.lb * 2
           |  GROUP BY g, pt, j),
           |reg AS (SELECT g, j, max(mj) AS mj FROM partials GROUP BY g, j)""".stripMargin
    }
    s"""WITH x0 AS (SELECT $grp AS g$pt, ($key % 4294967296) AS x FROM $table),
       |s1 AS (SELECT g$ptCol, ${xor("x", s"x $div 65536")} AS a FROM x0),
       |s2 AS (SELECT g$ptCol, ((a % 65536) * 2246822507
       |         + ((a $div 65536) * 2246822507 % 65536) * 65536) % 4294967296 AS b FROM s1),
       |s3 AS (SELECT g$ptCol, ${xor("b", s"b $div 8192")} AS c FROM s2),
       |s4 AS (SELECT g$ptCol, ((c % 65536) * 3266489909
       |         + ((c $div 65536) * 3266489909 % 65536) * 65536) % 4294967296 AS d FROM s3),
       |s5 AS (SELECT g$ptCol, ${xor("d", s"d $div 65536")} AS w FROM s4),
       |bkt AS (SELECT g$ptCol, w % 256 AS j, w $div 256 AS v FROM s5),
       |pows AS (SELECT CAST($rangeCol + 1 AS INT) AS bl, ${shl(rangeCol)} AS lb
       |         $rangeTvf),
       |$regCte,
       |z AS (
       |  SELECT g,
       |         CAST(sum(${shl("25 - mj")}) AS BIGINT)
       |           + (256 - CAST(count(*) AS BIGINT)) * CAST(33554432 AS BIGINT) AS z_scaled,
       |         CAST(256 - count(*) AS BIGINT) AS v_zero
       |  FROM reg GROUP BY g),
       |est AS (
       |  SELECT g, z_scaled, v_zero,
       |         CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256)
       |           * 65536 * 33554432 / z_scaled AS e_raw
       |  FROM z)
       |SELECT g AS $grp,
       |       ${util.r2sql("CASE WHEN e_raw <= 640 AND v_zero > 0 THEN 256 * ln(256 / CAST(v_zero AS DOUBLE)) ELSE e_raw END")}
       |         AS $estName,
       |       z_scaled, v_zero
       |FROM est ORDER BY $grp""".stripMargin
  }

  /** TPC-H Q1 shape — the flagship `SparkEntry.entry` query. */
  def q1(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        util.r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        util.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        util.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))
          .as("sum_charge"),
        util.r2(avg(col("l_quantity"))).as("avg_qty"),
        util.r2(avg(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       sum(l_quantity) AS sum_qty,
       |       ${util.r2sql("sum(l_extendedprice)")} AS sum_base_price,
       |       ${util.r2sql("sum(l_extendedprice * (1 - l_discount))")} AS sum_disc_price,
       |       ${util.r2sql("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))")} AS sum_charge,
       |       ${util.r2sql("avg(l_quantity)")} AS avg_qty,
       |       ${util.r2sql("avg(l_extendedprice)")} AS avg_price,
       |       count(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shared skewness/kurtosis projection over exact power sums (n, s1..s4).
    * The SAME SQL text runs on Spark (`selectExpr`) and DuckDB, so both
    * engines evaluate an identical double expression tree on identical
    * integer inputs — the only way a third/fourth-moment statistic can
    * hash-match across engines (their built-ins differ on sample vs
    * population and on summation order).
    */
  private val skewKurtExprs: Seq[String] = {
    val m1 = "(CAST(s1 AS DOUBLE) / n)"
    val r2m = "(CAST(s2 AS DOUBLE) / n)"
    val r3m = "(CAST(s3 AS DOUBLE) / n)"
    val r4m = "(CAST(s4 AS DOUBLE) / n)"
    val m2 = s"($r2m - $m1 * $m1)"
    val m3 = s"($r3m - 3.0 * $m1 * $r2m + 2.0 * $m1 * $m1 * $m1)"
    val m4 = s"($r4m - 4.0 * $m1 * $r3m + 6.0 * $m1 * $m1 * $r2m - 3.0 * $m1 * $m1 * $m1 * $m1)"
    Seq(
      s"${util.r2sql(s"$m3 / ($m2 * sqrt($m2))")} AS skewness",
      s"${util.r2sql(s"$m4 / ($m2 * $m2) - 3.0")} AS excess_kurtosis")
  }

  /** Shared least-squares projection over exact sums (n, sx, sy, sxx, sxy,
    * syy) — same cross-engine trick as [[skewKurtExprs]]: identical SQL
    * text evaluates an identical double expression tree on identical exact
    * inputs (per-row products stay in BIGINT, the engine-exact wide sums —
    * DECIMAL(38,0) in Spark, HUGEINT in DuckDB — convert to the same
    * nearest double).
    */
  private val regrExprs: Seq[String] = {
    val n = "CAST(n AS DOUBLE)"
    val sx = "CAST(sx AS DOUBLE)"
    val sy = "CAST(sy AS DOUBLE)"
    val sxx = "CAST(sxx AS DOUBLE)"
    val sxy = "CAST(sxy AS DOUBLE)"
    val syy = "CAST(syy AS DOUBLE)"
    val cov = s"($n * $sxy - $sx * $sy)"
    val varx = s"($n * $sxx - $sx * $sx)"
    val vary = s"($n * $syy - $sy * $sy)"
    Seq(
      s"${util.r2sql(s"$cov / $varx")} AS slope",
      s"${util.r2sql(s"($sy - ($cov / $varx) * $sx) / $n")} AS intercept",
      s"${util.r2sql(s"$cov / (sqrt($varx) * sqrt($vary))")} AS r")
  }

  val defs: Seq[Q] = Seq(
    Q(
      "stat_permutation_test",
      // Monte-Carlo permutation test with DERANDOMIZED permutations
      // (round-12): the assumption-free answer to "is the F-vs-other mean
      // price difference real" — no normality, no variance pooling, just
      // the null distribution built by relabeling. The 32 pseudo-random
      // relabelings are a portable integer hash of (key, perm index), so
      // both engines generate byte-identical permutations (the
      // stat_bootstrap_ci derandomization discipline). Group sums stay
      // exact BIGINT cents; each |meanA − meanB| is the same fixed
      // sequence of two divisions and a subtraction on both engines, so
      // the >= comparisons match exactly. p-value uses the standard
      // (1 + #{perm ≥ obs}) / (1 + P) add-one form, pinned e6. Scale: the
      // explode is rows × 32 but collapses in the map-side partial
      // aggregate to 32 groups; everything after is O(perms).
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("lab"))
        val diffExpr =
          """abs(CAST(sa AS DOUBLE) / CAST(ca AS DOUBLE)
            |  - CAST(sb AS DOUBLE) / CAST(cb AS DOUBLE))""".stripMargin
        val obs = o.agg(
          sum(when(col("lab") === 1, col("c")).otherwise(0L)).as("sa"),
          sum(col("lab")).as("ca"),
          sum(when(col("lab") === 0, col("c")).otherwise(0L)).as("sb"),
          sum(lit(1L) - col("lab")).as("cb"))
          .select(expr(diffExpr).as("obs_diff"))
        val perms = o
          .select(col("k"), col("c"),
            explode(sequence(lit(0L), lit(31L))).as("p"))
          .withColumn("plab",
            expr("(((k % 1000003) * 2654435761 + p * 40503) % 1000003) % 2"))
          .groupBy(col("p"))
          .agg(
            sum(when(col("plab") === 1, col("c")).otherwise(0L)).as("sa"),
            sum(col("plab")).as("ca"),
            sum(when(col("plab") === 0, col("c")).otherwise(0L)).as("sb"),
            sum(lit(1L) - col("plab")).as("cb"))
          .select(expr(diffExpr).as("pdiff"))
        perms.crossJoin(obs)
          .agg(sum(when(col("pdiff") >= col("obs_diff"), 1L).otherwise(0L)).as("n_ge"),
            max(col("obs_diff")).as("obs_diff"))
          .select(util.r2(col("obs_diff")).as("obs_diff_cents"),
            col("n_ge"),
            expr("((1 + n_ge) * 1000000) div 33").as("p_e6"))
          .orderBy(col("n_ge"))
      },
      Some(s"""WITH o AS (
              |  SELECT o_orderkey AS k,
              |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
              |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS lab
              |  FROM orders),
              |obs AS (
              |  SELECT abs(CAST(sum(CASE WHEN lab = 1 THEN c ELSE 0 END) AS DOUBLE)
              |             / CAST(sum(lab) AS DOUBLE)
              |           - CAST(sum(CASE WHEN lab = 0 THEN c ELSE 0 END) AS DOUBLE)
              |             / CAST(sum(1 - lab) AS DOUBLE)) AS obs_diff
              |  FROM o),
              |perms AS (
              |  SELECT p,
              |         abs(CAST(sum(CASE WHEN plab = 1 THEN c ELSE 0 END) AS DOUBLE)
              |             / CAST(sum(plab) AS DOUBLE)
              |           - CAST(sum(CASE WHEN plab = 0 THEN c ELSE 0 END) AS DOUBLE)
              |             / CAST(sum(1 - plab) AS DOUBLE)) AS pdiff
              |  FROM (SELECT k, c, CAST(t.p AS BIGINT) AS p,
              |               (((k % 1000003) * 2654435761 + CAST(t.p AS BIGINT) * 40503) % 1000003) % 2 AS plab
              |        FROM o, range(0, 32) t(p))
              |  GROUP BY p),
              |f AS (
              |  SELECT CAST(sum(CASE WHEN pdiff >= obs_diff THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
              |         max(obs_diff) AS obs_diff
              |  FROM perms, obs)
              |SELECT ${util.r2sql("obs_diff")} AS obs_diff_cents, n_ge,
              |       ((1 + n_ge) * 1000000) // 33 AS p_e6
              |FROM f ORDER BY n_ge""".stripMargin)
    ),
    Q(
      "feat_woe_iv",
      // Weight-of-evidence encoding + information value (round-12): the
      // credit-scoring-lineage categorical encoder — per bucket,
      // woe = ln(good-share / bad-share) with half-count smoothing (the
      // ±0.5 Laplace guard that keeps single-class buckets finite), plus
      // the bucket's IV term (good% − bad%)·woe, whose sum screens
      // features by predictive power before a fit. Target: order fell
      // through ('F'). The ln argument is assembled as ONE exact rational
      // — (good_i+0.5)(B+2.5) / (bad_i+0.5)(G+2.5) — so both engines take
      // ln of the identical double and r2 absorbs the libm ulp. Scale:
      // one map-side conditional aggregate to k bucket rows, totals via a
      // window over those k rows — O(buckets) everything after the scan.
      (s, dir) => {
        val byBucket = Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(
            sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("n_good"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_bad"))
        val w = Window.partitionBy(lit(1))
        byBucket
          .withColumn("g_tot", sum(col("n_good")).over(w))
          .withColumn("b_tot", sum(col("n_bad")).over(w))
          .withColumn("woe_raw", expr(
            """ln(((CAST(n_good AS DOUBLE) + 0.5) * (CAST(b_tot AS DOUBLE) + 2.5)) /
              |   ((CAST(n_bad AS DOUBLE) + 0.5) * (CAST(g_tot AS DOUBLE) + 2.5)))""".stripMargin))
          .select(col("priority"), col("n_good"), col("n_bad"),
            util.r2(col("woe_raw")).as("woe"),
            util.r2((col("n_good").cast("double") / col("g_tot").cast("double") -
              col("n_bad").cast("double") / col("b_tot").cast("double")) *
              col("woe_raw")).as("iv_term"))
          .orderBy(col("priority"))
      },
      Some(s"""WITH b AS (
              |  SELECT o_orderpriority AS priority,
              |         CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
              |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
              |  FROM orders GROUP BY 1),
              |t AS (
              |  SELECT priority, n_good, n_bad,
              |         CAST(sum(n_good) OVER () AS BIGINT) AS g_tot,
              |         CAST(sum(n_bad) OVER () AS BIGINT) AS b_tot
              |  FROM b),
              |r AS (
              |  SELECT priority, n_good, n_bad, g_tot, b_tot,
              |         ln(((CAST(n_good AS DOUBLE) + 0.5) * (CAST(b_tot AS DOUBLE) + 2.5)) /
              |            ((CAST(n_bad AS DOUBLE) + 0.5) * (CAST(g_tot AS DOUBLE) + 2.5))) AS woe_raw
              |  FROM t)
              |SELECT priority, n_good, n_bad,
              |       ${util.r2sql("woe_raw")} AS woe,
              |       ${util.r2sql(
                 "(CAST(n_good AS DOUBLE) / CAST(g_tot AS DOUBLE) - " +
                   "CAST(n_bad AS DOUBLE) / CAST(b_tot AS DOUBLE)) * woe_raw")} AS iv_term
              |FROM r ORDER BY priority""".stripMargin)
    ),
    Q(
      "feat_target_encoding_loo",
      // Leave-one-out target encoding (round-11): the tabular-ML feature
      // for high-cardinality categoricals — encode each row's category by
      // the mean target of the OTHER rows in it, (S_c − t_i)/(n_c − 1),
      // so the feature never leaks the row's own label. Singleton
      // categories fall back to the leave-one-out GLOBAL mean. Targets
      // are exact cents and the division is integer (both engines
      // truncate toward zero on these non-negative values), so the
      // encoding is bit-identical cross-engine. Scale: one partial-agg
      // shuffle of 2 longs per category + a same-key map join back — the
      // encode never re-shuffles the fact rows a second time; at 100 TB
      // the category stats side is broadcast-size for any real cardinality.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("t"))
        val byCat = o.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), sum(col("t")).as("s"))
        val glob = o.agg(count(lit(1)).as("gn"), sum(col("t")).as("gs"))
        o.join(byCat, Seq("o_custkey")).crossJoin(broadcast(glob))
          .withColumn("loo_cents", expr(
            """CASE WHEN n > 1 THEN (s - t) div (n - 1)
              |ELSE (gs - t) div (gn - 1) END""".stripMargin))
          .select(col("o_orderkey"), col("o_custkey"), col("t"), col("loo_cents"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_custkey,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS t
             |  FROM orders),
             |c AS (
             |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(t) AS BIGINT) AS s
             |  FROM o GROUP BY o_custkey),
             |g AS (
             |  SELECT CAST(count(*) AS BIGINT) AS gn,
             |         CAST(sum(t) AS BIGINT) AS gs FROM o)
             |SELECT o_orderkey, o_custkey, t,
             |       CASE WHEN n > 1 THEN (s - t) // (n - 1)
             |            ELSE (gs - t) // (gn - 1) END AS loo_cents
             |FROM o JOIN c USING (o_custkey), g
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q("agg_hash_group", (s, dir) => q1(s, dir), Some(q1Oracle)),
    Q(
      "agg_distinct_exact",
      // countDistinct plans as Expand + two-phase aggregate: distinct keys
      // are de-duplicated map-side before the shuffle — scale-safe.
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |       count(DISTINCT o_custkey) AS n_customers,
             |       count(*) AS n_orders
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)
    ),
    Q(
      "agg_approx_hll",
      // HyperLogLog distinct — THE 100 TB cardinality answer (exact
      // distinct shuffles every key; HLL ships a constant-size register
      // table). Round-14 (verdict #2): the sketch is now a PORTABLE
      // deterministic HLL the DuckDB oracle replays bit-for-bit, closing
      // the registry's last no-oracle rows. The hash is a full murmur3
      // fmix32 avalanche finalizer written in overflow-safe int64 SQL
      // (xor-shift via integer division, the two 32-bit wrapping
      // multiplies split into 16-bit halves) — linear mod-prime
      // scrambles were measured off by 40–50% here because HLL needs
      // BINOMIAL collision statistics, which no affine map provides.
      // m = 256 registers (p=8, rsd ≈ 6.5%); rho = leading-zero rank of
      // the 24-bit suffix via a range-join against a 25-row power table
      // (pure integers, no float log); the indicator sum Σ2^−M folds as
      // the SCALED BIGINT Σ2^(25−M), so the only float ops are the
      // final α·m²·2²⁵/Z division (correctly rounded, engine-identical)
      // and the small-range linear-counting ln (r2-pinned). Spark's
      // production instance of this row is approx_count_distinct —
      // OperatorSpec keeps both within rsd bands of exact so the
      // portable sketch certifies the native one. Scale: (flag,
      // register) partials fold map-side; the shuffle carries ≤ 256
      // rows per group — the mergeable-sketch shape that makes distinct
      // counts roll up without raw rescans.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(hllSql(duck = false, "lineitem", "l_partkey",
          "l_returnflag", "approx_parts", partial = None))
      },
      Some(hllSql(duck = true, "lineitem", "l_partkey",
        "l_returnflag", "approx_parts", partial = None))
    ),
    Q(
      "agg_approx_quantile",
      // Approximate quantiles by DERANDOMIZED level sampling (round-14,
      // verdict #2): the KLL sketch's bottom level with its coin replaced
      // by the portable row hash — every 16th row by hash survives, and
      // nearest-rank quantiles of the sample estimate the population's
      // (rank error ~ 1/(2√(n/16)), bounded in OperatorSpec against the
      // exact percentiles). Because the "coin" is the hash, the sample —
      // and therefore every output cell — is deterministic and the
      // DuckDB oracle replays it exactly: this row is hash-matched while
      // still exercising the approximate path. The sample is mergeable
      // (union of per-partition samples IS the sample of the union —
      // the property that lets 1000 executors sketch independently).
      // Spark's production instance is approx_percentile, kept in the
      // same OperatorSpec band. Values are exact integer cents; the
      // only float is the rank arithmetic on exactly-representable
      // quarters. Scale: the window sort runs over the 1/16 sample,
      // never the corpus; shuffle O(n/16).
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""WITH s AS (
          |  SELECT l_returnflag AS flag,
          |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
          |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
          |  FROM lineitem
          |  WHERE (((l_orderkey % 1000003) * 2654435761
          |          + l_linenumber * 40503) % 1000003) % 16 = 0),
          |n AS (SELECT flag, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY flag),
          |rp AS (SELECT flag, cents,
          |              CAST(row_number() OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS rn
          |       FROM s),
          |rq AS (SELECT flag, qty,
          |              CAST(row_number() OVER (PARTITION BY flag ORDER BY qty) AS BIGINT) AS rn
          |       FROM s),
          |picks AS (SELECT flag,
          |    CAST(floor(CAST(0.25 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r25,
          |    CAST(floor(CAST(0.50 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r50,
          |    CAST(floor(CAST(0.75 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r75
          |  FROM n),
          |qp AS (SELECT p.flag,
          |         CAST(max(CASE WHEN rp.rn = p.r25 THEN rp.cents END) AS BIGINT) AS price_q25_cents,
          |         CAST(max(CASE WHEN rp.rn = p.r50 THEN rp.cents END) AS BIGINT) AS price_q50_cents,
          |         CAST(max(CASE WHEN rp.rn = p.r75 THEN rp.cents END) AS BIGINT) AS price_q75_cents
          |       FROM picks p JOIN rp ON rp.flag = p.flag GROUP BY p.flag),
          |qq AS (SELECT p.flag,
          |         CAST(max(CASE WHEN rq.rn = p.r50 THEN rq.qty END) AS BIGINT) AS median_qty
          |       FROM picks p JOIN rq ON rq.flag = p.flag GROUP BY p.flag)
          |SELECT qp.flag AS l_returnflag, price_q25_cents, price_q50_cents,
          |       price_q75_cents, median_qty
          |FROM qp JOIN qq ON qp.flag = qq.flag
          |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""WITH s AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE (((l_orderkey % 1000003) * 2654435761
        |          + l_linenumber * 40503) % 1000003) % 16 = 0),
        |n AS (SELECT flag, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY flag),
        |rp AS (SELECT flag, cents,
        |              CAST(row_number() OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS rn
        |       FROM s),
        |rq AS (SELECT flag, qty,
        |              CAST(row_number() OVER (PARTITION BY flag ORDER BY qty) AS BIGINT) AS rn
        |       FROM s),
        |picks AS (SELECT flag,
        |    CAST(floor(CAST(0.25 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r25,
        |    CAST(floor(CAST(0.50 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r50,
        |    CAST(floor(CAST(0.75 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r75
        |  FROM n),
        |qp AS (SELECT p.flag,
        |         CAST(max(CASE WHEN rp.rn = p.r25 THEN rp.cents END) AS BIGINT) AS price_q25_cents,
        |         CAST(max(CASE WHEN rp.rn = p.r50 THEN rp.cents END) AS BIGINT) AS price_q50_cents,
        |         CAST(max(CASE WHEN rp.rn = p.r75 THEN rp.cents END) AS BIGINT) AS price_q75_cents
        |       FROM picks p JOIN rp ON rp.flag = p.flag GROUP BY p.flag),
        |qq AS (SELECT p.flag,
        |         CAST(max(CASE WHEN rq.rn = p.r50 THEN rq.qty END) AS BIGINT) AS median_qty
        |       FROM picks p JOIN rq ON rq.flag = p.flag GROUP BY p.flag)
        |SELECT qp.flag AS l_returnflag, price_q25_cents, price_q50_cents,
        |       price_q75_cents, median_qty
        |FROM qp JOIN qq ON qp.flag = qq.flag
        |ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_percentile_exact",
      // Exact interpolated quartiles (percentile ↔ quantile_cont): the
      // precise counterpart to agg_approx_quantile — full sort per group,
      // only affordable when groups are few; the sketch is the 100 TB
      // default. Both engines use linear interpolation on the sorted
      // values; r2 pins the arithmetic tail.
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("qs"))
          .select(
            col("l_returnflag"),
            util.r2(element_at(col("qs"), 1)).as("price_q25"),
            util.r2(element_at(col("qs"), 2)).as("price_q50"),
            util.r2(element_at(col("qs"), 3)).as("price_q75"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag,
              |       ${util.r2sql("quantile_cont(l_extendedprice, 0.25)")} AS price_q25,
              |       ${util.r2sql("quantile_cont(l_extendedprice, 0.50)")} AS price_q50,
              |       ${util.r2sql("quantile_cont(l_extendedprice, 0.75)")} AS price_q75
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_median_exact",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(median(col("l_quantity")).as("median_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, median(l_quantity) AS median_qty,
             |       count(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "stat_bloom_semi_filter",
      // Bloom-filter membership pre-filter (the distributed semi-join
      // optimization: ship a constant-size filter to the fact scan instead
      // of shuffling it). Uses Spark's OWN runtime-filter expression pair —
      // `graft_bloom_agg` builds the filter distributed, and the probe is a
      // scalar subquery feeding `graft_might_contain`, the codegen'd native
      // expression Catalyst injects for its runtime semi-join filters (no
      // UDF, no driver-side count: the size hint is a static upstream
      // estimate, as it would be from table stats at 100 TB). FPP admits
      // supersets in principle; OperatorSpec asserts zero false negatives
      // and bounds false positives vs the true semi-join.
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("g_bloom_orders")
        Tables(s, dir, "lineitem").createOrReplaceTempView("g_bloom_lineitem")
        s.sql("""SELECT l_returnflag, count(1) AS n_lines
                |FROM g_bloom_lineitem
                |WHERE graft_might_contain(
                |        (SELECT graft_bloom_agg(o_orderkey, 100000L, 800000L)
                |         FROM g_bloom_orders
                |         WHERE o_orderpriority = '1-URGENT'),
                |        l_orderkey)
                |GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      // Full DuckDB oracle (r7): the V2 bloom's bit math is pure integer
      // arithmetic — Murmur3_x86_32.hashLong replayed as a lateral-alias
      // chain (u32 in BIGINT, HUGEINT for the wrapping multiplies), then
      // the scatter `h1·2^31-1 + i·h2 → ~ if negative → mod numBits`.
      // A probe key is a member iff ALL k of its positions were set by
      // some build key — false positives and all. SketchOracleSpec pins
      // the same math against the real BloomFilter class.
      Some {
        val so = graft.tools.SketchOracle
        val k = so.bloomNumHashes(100000, 800000)
        val (steps1, h1) = so.hashLongSteps("q1", "low", "high", "0")
        val (steps2, h2) = so.hashLongSteps("q2", "low", "high", h1)
        val base = "SELECT k, k % 4294967296 AS low, " +
          "(k // 4294967296) % 4294967296 AS high FROM keys"
        val sig = Seq(
          "h1s" -> s"CASE WHEN $h1 >= 2147483648 THEN $h1 - 4294967296 ELSE $h1 END",
          "h2s" -> s"CASE WHEN $h2 >= 2147483648 THEN $h2 - 4294967296 ELSE $h2 END")
        val hashed = so.chainSql(base, steps1 ++ steps2 ++ sig)
        s"""WITH build_keys AS (
           |  SELECT DISTINCT o_orderkey AS k FROM orders
           |  WHERE o_orderpriority = '1-URGENT'),
           |probe_keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
           |keys AS (SELECT k FROM build_keys UNION SELECT k FROM probe_keys),
           |hashed AS (SELECT k, h1s, h2s FROM ($hashed)),
           |pos AS (
           |  SELECT k, i,
           |         CASE WHEN c < 0 THEN (-c - 1) % 800000
           |              ELSE c % 800000 END AS pos
           |  FROM (SELECT k, i, h1s * 2147483647 + i * h2s AS c
           |        FROM hashed CROSS JOIN range(1, ${k + 1}) t(i))),
           |build_pos AS (SELECT DISTINCT pos FROM pos JOIN build_keys USING (k)),
           |member AS (
           |  SELECT p.k
           |  FROM pos p JOIN probe_keys USING (k)
           |  LEFT JOIN build_pos bp ON p.pos = bp.pos
           |  GROUP BY p.k
           |  HAVING count(*) = count(bp.pos))
           |SELECT l_returnflag, count(1) AS n_lines
           |FROM lineitem JOIN member ON l_orderkey = member.k
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin
      }
    ),
    Q(
      "agg_skew_twostage",
      // Salted two-stage aggregation — the agg-side twin of
      // join_skew_salted: when one group key holds most of the rows
      // (here 75% synthesized onto key 0), the single hash-aggregate
      // exchange funnels that key's entire partial stream through one
      // reducer. Stage 1 groups on (key, salt) — a DETERMINISTIC salt
      // (orderkey mod 16), not an RNG, so the result is reproducible —
      // fanning the hot key over 16 reducers; stage 2 merges the 16
      // sub-aggregates per key. Works because count/sum are associative
      // and the money math is exact BIGINT cents; avg divides once after
      // the merge. The oracle is the PLAIN one-stage group-by — salting
      // must be invisible in the result.
      (s, dir) => {
        val skewKey = when(col("o_orderkey") % 4 =!= 0, lit(0L))
          .otherwise(col("o_orderkey") % 100)
        val staged = Tables(s, dir, "orders")
          .withColumn("k", skewKey)
          .withColumn("salt", col("o_orderkey") % 16)
          .withColumn("cents",
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .groupBy(col("k"), col("salt"))
          .agg(count(lit(1)).as("pn"), sum(col("cents")).as("pc"))
        staged.groupBy(col("k"))
          .agg(sum(col("pn")).as("n_orders"), sum(col("pc")).as("sum_cents"))
          .select(col("k"), col("n_orders"), col("sum_cents"),
            util.r2(col("sum_cents").cast("double") /
              col("n_orders").cast("double") / 100).as("avg_price"))
          .orderBy(col("k"))
      },
      Some(s"""SELECT k, count(*) AS n_orders,
              |       CAST(sum(cents) AS BIGINT) AS sum_cents,
              |       ${util.r2sql("CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100")} AS avg_price
              |FROM (SELECT CASE WHEN o_orderkey % 4 <> 0 THEN 0
              |                  ELSE o_orderkey % 100 END AS k,
              |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              |      FROM orders) t
              |GROUP BY k ORDER BY k""".stripMargin)
    ),
    Q(
      "stat_ks_twosample",
      // Two-sample Kolmogorov–Smirnov statistic between the purchase and
      // click value distributions — the distribution-drift test a data
      // pipeline runs between corpus snapshots. D = max |F_a − F_b| over
      // the pooled sample, computed with ONE sort-free trick: cumulative
      // per-group counts via the default RANGE window frame (which
      // includes ties identically in Spark and DuckDB), then a max over
      // exact-integer ECDF differences (counts cross-multiplied instead
      // of divided, so D's argmax is exact integer arithmetic; the
      // statistic divides once at the end). One window sort + one agg —
      // at scale this is a single range-partitioned sort of the pooled
      // values.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(col("value"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"))
        // per-value pre-aggregation FIRST (two-phase, shuffles only
        // distinct values), so the ECDF window runs over the collapsed
        // value domain, not the raw rows; ties are inherent in the
        // collapse, so ROWS == RANGE. The production-scale variant
        // range-partitions this prefix sum; the single ordered window
        // over distinct values is the bounded-domain shortcut.
        val cells = ev.groupBy(col("value"))
          .agg(sum(col("a")).as("da"), sum(lit(1L) - col("a")).as("db"))
        val w = Window.orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = ev.agg(sum(col("a")).as("na"),
          sum(lit(1L) - col("a")).as("nb"))
        cells
          .withColumn("ca", sum(col("da")).over(w))
          .withColumn("cb", sum(col("db")).over(w))
          .crossJoin(broadcast(tot))
          // |ca·nb − cb·na| is exact BIGINT (≤ n² < 2^63 up to ~3B rows)
          .groupBy(col("na"), col("nb"))
          .agg(max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("xnum"))
          .select(col("na"), col("nb"),
            expr("CAST(floor(CAST(xnum AS DOUBLE) / CAST(na AS DOUBLE) / CAST(nb AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")
              .as("d_e6"))
      },
      Some("""WITH pooled AS (
             |  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
             |  FROM events
             |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
             |cells AS (
             |  SELECT value, CAST(sum(a) AS BIGINT) AS da, CAST(sum(1 - a) AS BIGINT) AS db
             |  FROM pooled GROUP BY value),
             |cum AS (
             |  SELECT CAST(sum(da) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
             |         CAST(sum(db) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
             |  FROM cells),
             |tot AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(1 - a) AS BIGINT) AS nb FROM pooled)
             |SELECT na, nb,
             |       CAST(floor(CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
             |                  / CAST(na AS DOUBLE) / CAST(nb AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS d_e6
             |FROM cum, tot GROUP BY na, nb""".stripMargin)
    ),
    Q(
      "stat_poisson_rate_test",
      // Two-sample Poisson rate comparison (round-13): are errors
      // arriving FASTER than purchases per unit time — the incident/SLO
      // question that a mean test on values cannot answer because the
      // unit is events-per-exposure, not event size. Counts and distinct
      // active days per type are exact integers; the rate-difference z
      // (unpooled, the standard large-sample form) is one fixed-order
      // double expression, r2-pinned. One row per compared pair.
      // Scale: two conditional aggregates over one scan — shuffle
      // carries (type, day) cells for the exposure count, never events.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("error", "purchase"))
          .select(col("event_type"), col("ts").cast("date").as("day"))
        val g = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("k"), count_distinct(col("day")).as("t"))
        val a = g.filter(col("event_type") === "error")
          .select(col("k").as("k1"), col("t").as("t1"))
        val b = g.filter(col("event_type") === "purchase")
          .select(col("k").as("k2"), col("t").as("t2"))
        a.crossJoin(b)
          .select(col("k1"), col("t1"), col("k2"), col("t2"),
            util.r2((col("k1").cast("double") / col("t1") -
              col("k2").cast("double") / col("t2")) /
              sqrt(col("k1").cast("double") / (col("t1") * col("t1")) +
                col("k2").cast("double") / (col("t2") * col("t2")))).as("z"))
      },
      Some(s"""WITH g AS (
              |  SELECT event_type, CAST(count(*) AS BIGINT) AS k,
              |         CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS t
              |  FROM events WHERE event_type IN ('error', 'purchase')
              |  GROUP BY event_type)
              |SELECT a.k AS k1, a.t AS t1, b.k AS k2, b.t AS t2,
              |       ${util.r2sql("(CAST(a.k AS DOUBLE) / a.t - CAST(b.k AS DOUBLE) / b.t) / sqrt(CAST(a.k AS DOUBLE) / (a.t * a.t) + CAST(b.k AS DOUBLE) / (b.t * b.t))")} AS z
              |FROM g a, g b
              |WHERE a.event_type = 'error' AND b.event_type = 'purchase'""".stripMargin)
    ),
    Q(
      "stat_wilcoxon_signed_rank",
      // Wilcoxon signed-rank (round-13): the PAIRED nonparametric test —
      // the gap between Mann–Whitney (unpaired continuous) and McNemar
      // (paired binary). Pairs are customers with orders in BOTH 1995
      // and 1996 (per-customer annual spend in cents); zero differences
      // drop per the standard procedure. Like the other rank tests here,
      // EXACT integer arithmetic end-to-end: ties get the average rank
      // via the doubled form 2·r̄ = 2·rank + tiecount − 1, so the emitted
      // statistics are 2·W⁺ and 2·W⁻ — no division anywhere, partition
      // order can never flip a bit, and 2W⁺ + 2W⁻ = 2·n(n+1)/2 · 2 is an
      // internal consistency identity the oracle hash enforces.
      // Scale: one groupBy to per-(customer, year) sums, one pivot-style
      // conditional agg to pairs, ONE ordered window over the collapsed
      // |d| domain — shuffle carries customers, never orders.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey"),
            year(col("o_orderdate")).as("yr"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
          .filter(col("yr").isin(1995, 1996))
        val pairs = o.groupBy(col("o_custkey"))
          .agg(sum(when(col("yr") === 1995, col("cents"))).as("c95"),
            sum(when(col("yr") === 1996, col("cents"))).as("c96"))
          .filter(col("c95").isNotNull && col("c96").isNotNull)
          .select((col("c95") - col("c96")).as("d"))
          .filter(col("d") =!= 0)
          .select(col("d"), abs(col("d")).as("absd"))
        val w = Window.orderBy(col("absd"))
        pairs
          .withColumn("r", rank().over(w).cast("long"))
          .withColumn("c", count(lit(1)).over(
            Window.partitionBy(col("absd"))).cast("long"))
          .withColumn("tr", lit(2L) * col("r") + col("c") - lit(1L))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("d") > 0, col("tr")).otherwise(0L)).as("w2_plus"),
            sum(when(col("d") < 0, col("tr")).otherwise(0L)).as("w2_minus"))
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey, year(o_orderdate) AS yr,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT sum(CASE WHEN yr = 1995 THEN cents END)
             |         - sum(CASE WHEN yr = 1996 THEN cents END) AS d
             |  FROM spend GROUP BY o_custkey
             |  HAVING count(*) = 2 AND sum(CASE WHEN yr = 1995 THEN cents END)
             |         <> sum(CASE WHEN yr = 1996 THEN cents END)),
             |ranked AS (
             |  SELECT d,
             |         CAST(rank() OVER (ORDER BY abs(d)) AS BIGINT) AS r,
             |         CAST(count(*) OVER (PARTITION BY abs(d)) AS BIGINT) AS c
             |  FROM pairs)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(sum(CASE WHEN d > 0 THEN 2 * r + c - 1 ELSE 0 END) AS BIGINT) AS w2_plus,
             |       CAST(sum(CASE WHEN d < 0 THEN 2 * r + c - 1 ELSE 0 END) AS BIGINT) AS w2_minus
             |FROM ranked""".stripMargin)
    ),
    Q(
      "stat_levene_test",
      // Brown–Forsythe / Levene variance-homogeneity test (round-13):
      // ANOVA (stat_anova_oneway) assumes equal group variances — this is
      // the test that CHECKS that assumption, and on its own the
      // "did the spread change" drift question (variance drift with a
      // stable mean is invisible to location tests). Median-centered
      // (Brown–Forsythe — robust to the heavy tail order totals have);
      // the spread scores stay integral via doubled medians: z = |2x −
      // 2·median| in half-cents, W assembled from BIGINT Σz / Σz² group
      // moments with ONE double division at the end, r2-pinned.
      // Scale: percentile + two-phase moment aggregation per group; the
      // shuffle carries group keys, never rows, after the map-side
      // partials.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_orderpriority").as("grp"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
        // exact doubled median per group: even-count medians are
        // mid-pair averages (x.5 in cents) — doubling keeps them BIGINT
        val med2 = o.groupBy(col("grp"))
          .agg(expr("CAST(percentile(cents, 0.5) * 2 AS BIGINT)").as("med2"))
        val z = o.join(med2, "grp")
          .select(col("grp"), abs(lit(2L) * col("cents") - col("med2")).as("z"))
        val g = z.groupBy(col("grp"))
          .agg(count(lit(1)).cast("double").as("ni"),
            sum(col("z")).cast("double").as("si"),
            sum(col("z") * col("z")).cast("double").as("qi"))
        val tot = g.agg(
          count(lit(1)).cast("double").as("k"),
          sum(col("ni")).as("n"),
          sum(col("si")).as("st"),
          sum(col("qi") - col("si") * col("si") / col("ni")).as("within"),
          sum(col("si") * col("si") / col("ni")).as("btw_raw"))
        tot.select(
          col("k").cast("long").as("n_groups"),
          col("n").cast("long").as("n_total"),
          util.r2((col("n") - col("k")) / (col("k") - lit(1.0)) *
            (col("btw_raw") - col("st") * col("st") / col("n")) / col("within"))
            .as("levene_w"))
      },
      Some(s"""WITH x AS (
              |  SELECT o_orderpriority AS grp,
              |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              |  FROM orders),
              |m AS (SELECT grp, CAST(median(cents) * 2 AS BIGINT) AS med2 FROM x GROUP BY grp),
              |z AS (
              |  SELECT x.grp, abs(2 * x.cents - m.med2) AS z
              |  FROM x JOIN m ON x.grp = m.grp),
              |g AS (
              |  SELECT grp, CAST(count(*) AS DOUBLE) AS ni,
              |         CAST(sum(z) AS DOUBLE) AS si,
              |         CAST(sum(z * z) AS DOUBLE) AS qi
              |  FROM z GROUP BY grp),
              |t AS (
              |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(ni) AS n, sum(si) AS st,
              |         sum(qi - si * si / ni) AS within,
              |         sum(si * si / ni) AS btw_raw
              |  FROM g)
              |SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_total,
              |       ${util.r2sql("(n - k) / (k - 1.0) * (btw_raw - st * st / n) / within")} AS levene_w
              |FROM t""".stripMargin)
    ),
    Q(
      "stat_srm_check",
      // Sample-ratio-mismatch check (round-13): the FIRST gate of every
      // A/B readout — if the 50/50 hash split didn't land 50/50, the
      // experiment is corrupted and no downstream stat is meaningful.
      // Assignment is the engine's deterministic multiplicative hash
      // (same family as sample_hash_deterministic — reproducible across
      // engines/runs/partitioning, so the oracle replays it exactly);
      // per event_type: arm counts, chi-square SRM statistic (1 df,
      // equal-split null), and the flag evaluated in CROSS-MULTIPLIED
      // integers (100·(nA−nB)² vs 384·N) so the boundary can't flip on
      // an ulp. Scale: one conditional-count aggregate, map-side
      // combinable, shuffle carries event types only.
      (s, dir) => {
        val arm = ((col("user_id") % 1000003L) * 2654435761L) % 2
        Tables.events(s, dir)
          .select(col("event_type"), arm.as("arm"))
          .groupBy(col("event_type"))
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
          .select(col("event_type"), col("n_a"), col("n_b"),
            util.r2((col("n_a") - col("n_b")).cast("double") *
              (col("n_a") - col("n_b")).cast("double") /
              (col("n_a") + col("n_b")).cast("double")).as("chi2"),
            (lit(100L) * (col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) >
              lit(384L) * (col("n_a") + col("n_b"))).as("srm_flag"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH assigned AS (
              |  SELECT event_type,
              |         ((user_id % 1000003) * 2654435761) % 2 AS arm
              |  FROM events),
              |g AS (
              |  SELECT event_type,
              |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
              |  FROM assigned GROUP BY event_type)
              |SELECT event_type, n_a, n_b,
              |       ${util.r2sql("CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)")} AS chi2,
              |       100 * (n_a - n_b) * (n_a - n_b) > 384 * (n_a + n_b) AS srm_flag
              |FROM g ORDER BY event_type""".stripMargin)
    ),
    Q(
      "stat_mann_whitney",
      // Two-sample Mann–Whitney U (rank-sum) between the purchase and
      // click value distributions — the nonparametric drift test that,
      // unlike KS, is sensitive to location shift specifically. Entirely
      // EXACT integer arithmetic (round-9): per distinct value the
      // tie-group's average rank is (2·cum_before + d + 1)/2, so 2·R₁ =
      // Σ da·(2·cum_before + d + 1) stays BIGINT, and the emitted
      // statistic is 2U₁ = 2R₁ − na(na+1) — no division anywhere, so
      // partition order can never flip a bit. Same scale shape as KS:
      // pre-aggregate per distinct value first (shuffle carries the
      // collapsed domain), one ordered window, one final fold.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(col("value"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"))
        val cells = ev.groupBy(col("value"))
          .agg(sum(col("a")).as("da"), sum(lit(1L) - col("a")).as("db"))
        val w = Window.orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells
          .withColumn("d", col("da") + col("db"))
          .withColumn("cum", sum(col("d")).over(w))
          .withColumn("r1x2_part",
            col("da") * (lit(2L) * (col("cum") - col("d")) + col("d") + lit(1L)))
          .agg(sum(col("da")).as("na"), sum(col("db")).as("nb"),
            sum(col("r1x2_part")).as("r1x2"))
          .select(col("na"), col("nb"),
            (col("r1x2") - col("na") * (col("na") + lit(1L))).as("u1x2"))
      },
      Some("""WITH pooled AS (
             |  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
             |  FROM events
             |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
             |cells AS (
             |  SELECT value, CAST(sum(a) AS BIGINT) AS da, CAST(sum(1 - a) AS BIGINT) AS db
             |  FROM pooled GROUP BY value),
             |cum AS (
             |  SELECT da, db, da + db AS d,
             |         CAST(sum(da + db) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM cells)
             |SELECT CAST(sum(da) AS BIGINT) AS na,
             |       CAST(sum(db) AS BIGINT) AS nb,
             |       CAST(sum(da * (2 * (cum - d) + d + 1))
             |            - sum(da) * (sum(da) + 1) AS BIGINT) AS u1x2
             |FROM cum""".stripMargin)
    ),
    Q(
      "stat_benford_digit",
      // Benford first-digit profile of order totals — the fraud /
      // data-fabrication screen auditors run on monetary columns. The
      // leading significant digit is extracted from the CENTS integer's
      // decimal string (no log10, no float classification — substring of
      // an exact integer is engine-portable where floor(log10(x)) is
      // one ulp from wrong), then the profile is (digit, count, share).
      // One partial+final agg over 9 groups; at 100 TB the map side
      // collapses everything to 9 cells before the exchange.
      (s, dir) => {
        val cents = expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        Tables(s, dir, "orders")
          .filter(col("o_totalprice") > 0)
          .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy(col("digit"))
          .agg(count(lit(1)).as("n"))
          .withColumn("pct_e6", expr(
            "CAST(floor(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"))
          .orderBy(col("digit"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |  FROM orders WHERE o_totalprice > 0)
             |SELECT digit, count(*) AS n,
             |       CAST(floor(CAST(count(*) AS DOUBLE)
             |                  / CAST(sum(count(*)) OVER () AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS pct_e6
             |FROM d GROUP BY digit ORDER BY digit""".stripMargin)
    ),
    Q(
      "stat_welch_ttest",
      // Welch's two-sample t-test (unequal variances) between the
      // purchase and click value distributions — the parametric
      // companion to KS/Mann-Whitney, completing the two-sample tier.
      // Everything up to the final statistic is EXACT BIGINT over e2
      // cents: per-group n, Σv, Σv² come from ONE two-phase aggregate
      // (map-side combine collapses each partition to six numbers, so
      // the exchange carries 6 longs regardless of data size). The final
      // t² is assembled from those six integers by an IDENTICAL double
      // expression on both engines and pinned to 1e-6 — no float ever
      // crosses a partition boundary, so summation order cannot drift.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
        ev.agg(
          sum(col("a")).as("na"), sum(lit(1L) - col("a")).as("nb"),
          sum(col("a") * col("v")).as("sa"),
          sum((lit(1L) - col("a")) * col("v")).as("sb"),
          sum(col("a") * col("v") * col("v")).as("qa"),
          sum((lit(1L) - col("a")) * col("v") * col("v")).as("qb"))
          .select(col("na"), col("nb"), expr(
            """CAST(floor(
              |  (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
              |  * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
              |  / (CAST(na * qa - sa * sa AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE))
              |     + CAST(nb * qb - sb * sb AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)))
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("t2_e6"))
      },
      Some("""WITH pooled AS (
             |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events
             |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
             |m AS (
             |  SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(1 - a) AS BIGINT) AS nb,
             |         CAST(sum(a * v) AS BIGINT) AS sa, CAST(sum((1 - a) * v) AS BIGINT) AS sb,
             |         CAST(sum(a * v * v) AS BIGINT) AS qa, CAST(sum((1 - a) * v * v) AS BIGINT) AS qb
             |  FROM pooled)
             |SELECT na, nb,
             |       CAST(floor(
             |         (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
             |         * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
             |         / (CAST(na * qa - sa * sa AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE))
             |            + CAST(nb * qb - sb * sb AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)))
             |         * 1000000 + 0.5) AS BIGINT) AS t2_e6
             |FROM m""".stripMargin)
    ),
    Q(
      "stat_spearman_corr",
      // Spearman rank correlation between the daily click count and the
      // daily purchase revenue — "do busy days monetize?" asked robustly
      // (rank space is immune to the heavy tail that distorts Pearson on
      // revenue). The raw events collapse to ONE row per day first (the
      // shuffle carries O(days), not O(events)); tie-averaged ranks are
      // kept integral by carrying 2·rank = 2·RANK() + ties − 1 exactly
      // like the Mann-Whitney 2U trick, so every Pearson moment over the
      // rank pairs is exact BIGINT. One final 1-row fold pins rho to
      // 1e-6 with an identical double expression on both engines.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L)).as("y"))
        val rx = rank().over(Window.orderBy(col("x"))) * 2 +
          count(lit(1)).over(Window.partitionBy(col("x"))) - 1
        val ry = rank().over(Window.orderBy(col("y"))) * 2 +
          count(lit(1)).over(Window.partitionBy(col("y"))) - 1
        daily.select(rx.cast("long").as("rx"), ry.cast("long").as("ry"))
          .agg(count(lit(1)).as("n"),
            sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
            sum(col("rx") * col("rx")).as("qx"),
            sum(col("ry") * col("ry")).as("qy"),
            sum(col("rx") * col("ry")).as("sxy"))
          .select(col("n"), expr(
            """CAST(floor(
              |  CAST(n * sxy - sx * sy AS DOUBLE)
              |  / sqrt(CAST(n * qx - sx * sx AS DOUBLE))
              |  / sqrt(CAST(n * qy - sy * sy AS DOUBLE))
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("rho_e6"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |ranks AS (
             |  SELECT CAST(rank() OVER (ORDER BY x) * 2 + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
             |         CAST(rank() OVER (ORDER BY y) * 2 + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
             |  FROM daily),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             |         CAST(sum(rx * rx) AS BIGINT) AS qx, CAST(sum(ry * ry) AS BIGINT) AS qy,
             |         CAST(sum(rx * ry) AS BIGINT) AS sxy
             |  FROM ranks)
             |SELECT n,
             |       CAST(floor(
             |         CAST(n * sxy - sx * sy AS DOUBLE)
             |         / sqrt(CAST(n * qx - sx * sx AS DOUBLE))
             |         / sqrt(CAST(n * qy - sy * sy AS DOUBLE))
             |         * 1000000 + 0.5) AS BIGINT) AS rho_e6
             |FROM m""".stripMargin)
    ),
    Q(
      "stat_anova_oneway",
      // One-way ANOVA F across the five event-type groups on the value
      // column — "does ANY event type's mean differ?", the k-group
      // generalization the pairwise tests can't ask. Group moments
      // (ni, Σv, Σv²) come from one two-phase aggregate over k=5 cells;
      // the between/within sums of squares are assembled from those
      // exact integers with per-group terms pinned to 1e-6 BEFORE the
      // k-row sum (the chi-square discipline), so the final F is
      // bit-stable however the five rows arrive. O(k) state end to end.
      (s, dir) => {
        val g = Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("ni"), sum(col("v")).as("si"),
            sum(col("v") * col("v")).as("qi"))
          // Si²/ni per group, e6-pinned while still one row per group
          .withColumn("sq_over_n_e6", expr(
            "CAST(floor(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"))
        g.agg(count(lit(1)).as("k"), sum(col("ni")).as("n"),
          sum(col("si")).as("s"), sum(col("qi")).as("q"),
          sum(col("sq_over_n_e6")).as("sqn_e6"))
          .select(col("k"), col("n"), expr(
            """CAST(floor(
              |  (CAST(sqn_e6 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
              |  / (CAST(q AS DOUBLE) * 1000000.0 - CAST(sqn_e6 AS DOUBLE))
              |  * CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("f_e6"))
      },
      Some("""WITH g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS ni,
             |         CAST(sum(v) AS BIGINT) AS si, CAST(sum(v * v) AS BIGINT) AS qi
             |  FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |        FROM events WHERE value IS NOT NULL)
             |  GROUP BY event_type),
             |p AS (
             |  SELECT ni, si, qi,
             |         CAST(floor(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS sq_over_n_e6
             |  FROM g),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS n,
             |         CAST(sum(si) AS BIGINT) AS s, CAST(sum(qi) AS BIGINT) AS q,
             |         CAST(sum(sq_over_n_e6) AS BIGINT) AS sqn_e6
             |  FROM p)
             |SELECT k, n,
             |       CAST(floor(
             |         (CAST(sqn_e6 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
             |         / (CAST(q AS DOUBLE) * 1000000.0 - CAST(sqn_e6 AS DOUBLE))
             |         * CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
             |         * 1000000 + 0.5) AS BIGINT) AS f_e6
             |FROM m""".stripMargin)
    ),
    Q(
      "stat_linreg_multi",
      // Two-feature multiple linear regression (round-9): does purchase
      // revenue follow clicks, views, or both? — solved in STANDARDIZED
      // (correlation) space, where the normal equations for two
      // predictors close over three correlations: β₁=(r₁y−r₂y·r₁₂)/
      // (1−r₁₂²), R²=r₁y·β₁+r₂y·β₂. Raw-space normal equations would
      // need determinants of products of three BIGINT moments — an
      // overflow cliff at large scale — while every correlation here is
      // a double assembled from exact single-moment integers and pinned
      // to e6 BEFORE the solve (the chi-square discipline), so the
      // daily-moment exchange stays 10 longs and the solve is bit-stable.
      (s, dir) => {
        val cents = expr(
          "CAST(floor(value * 100 + 0.5) AS BIGINT)")
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x1"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x2"),
            sum(when(col("event_type") === "purchase", cents).otherwise(0L)).as("y"))
        val m = daily.agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
          sum(col("x1") * col("x1")).as("q11"),
          sum(col("x2") * col("x2")).as("q22"),
          sum(col("y") * col("y")).as("qyy"),
          sum(col("x1") * col("x2")).as("q12"),
          sum(col("x1") * col("y")).as("q1y"),
          sum(col("x2") * col("y")).as("q2y"))
        def rE6(qab: String, sa: String, sb: String, qaa: String, qbb: String) =
          s"""CAST(floor(CAST(n * $qab - $sa * $sb AS DOUBLE)
             |     / sqrt(CAST(n * $qaa - $sa * $sa AS DOUBLE))
             |     / sqrt(CAST(n * $qbb - $sb * $sb AS DOUBLE))
             |     * 1000000 + 0.5) AS BIGINT)""".stripMargin
        m.select(col("n"),
          expr(rE6("q12", "s1", "s2", "q11", "q22")).as("r12_e6"),
          expr(rE6("q1y", "s1", "sy", "q11", "qyy")).as("r1y_e6"),
          expr(rE6("q2y", "s2", "sy", "q22", "qyy")).as("r2y_e6"))
          .withColumn("b1_e6", expr(
            """CAST(floor((CAST(r1y_e6 AS DOUBLE) - CAST(r2y_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE))
              |     / (CAST(1 AS DOUBLE) - CAST(r12_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
              |     + 0.5) AS BIGINT)""".stripMargin))
          .withColumn("b2_e6", expr(
            """CAST(floor((CAST(r2y_e6 AS DOUBLE) - CAST(r1y_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE))
              |     / (CAST(1 AS DOUBLE) - CAST(r12_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
              |     + 0.5) AS BIGINT)""".stripMargin))
          .withColumn("r2_e6", expr(
            """CAST(floor(CAST(r1y_e6 * b1_e6 + r2y_e6 * b2_e6 AS DOUBLE)
              |     / CAST(1000000 AS DOUBLE) + 0.5) AS BIGINT)""".stripMargin))
          .select(col("n").as("n_days"), col("r12_e6"), col("r1y_e6"),
            col("r2y_e6"), col("b1_e6"), col("b2_e6"), col("r2_e6"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x2,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
             |         CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(x1 * x1) AS BIGINT) AS q11, CAST(sum(x2 * x2) AS BIGINT) AS q22,
             |         CAST(sum(y * y) AS BIGINT) AS qyy,
             |         CAST(sum(x1 * x2) AS BIGINT) AS q12,
             |         CAST(sum(x1 * y) AS BIGINT) AS q1y, CAST(sum(x2 * y) AS BIGINT) AS q2y
             |  FROM daily),
             |r AS (
             |  SELECT n,
             |         CAST(floor(CAST(n * q12 - s1 * s2 AS DOUBLE)
             |              / sqrt(CAST(n * q11 - s1 * s1 AS DOUBLE))
             |              / sqrt(CAST(n * q22 - s2 * s2 AS DOUBLE))
             |              * 1000000 + 0.5) AS BIGINT) AS r12_e6,
             |         CAST(floor(CAST(n * q1y - s1 * sy AS DOUBLE)
             |              / sqrt(CAST(n * q11 - s1 * s1 AS DOUBLE))
             |              / sqrt(CAST(n * qyy - sy * sy AS DOUBLE))
             |              * 1000000 + 0.5) AS BIGINT) AS r1y_e6,
             |         CAST(floor(CAST(n * q2y - s2 * sy AS DOUBLE)
             |              / sqrt(CAST(n * q22 - s2 * s2 AS DOUBLE))
             |              / sqrt(CAST(n * qyy - sy * sy AS DOUBLE))
             |              * 1000000 + 0.5) AS BIGINT) AS r2y_e6
             |  FROM m),
             |b AS (
             |  SELECT n, r12_e6, r1y_e6, r2y_e6,
             |         CAST(floor((CAST(r1y_e6 AS DOUBLE) - CAST(r2y_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |              / (CAST(1 AS DOUBLE) - CAST(r12_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
             |              + 0.5) AS BIGINT) AS b1_e6,
             |         CAST(floor((CAST(r2y_e6 AS DOUBLE) - CAST(r1y_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |              / (CAST(1 AS DOUBLE) - CAST(r12_e6 AS DOUBLE) * CAST(r12_e6 AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
             |              + 0.5) AS BIGINT) AS b2_e6
             |  FROM r)
             |SELECT n AS n_days, r12_e6, r1y_e6, r2y_e6, b1_e6, b2_e6,
             |       CAST(floor(CAST(r1y_e6 * b1_e6 + r2y_e6 * b2_e6 AS DOUBLE)
             |            / CAST(1000000 AS DOUBLE) + 0.5) AS BIGINT) AS r2_e6
             |FROM b""".stripMargin)
    ),
    Q(
      "stat_ks_uniform_gof",
      // One-sample KS goodness-of-fit vs Uniform(0, 500] (round-9): is
      // the value column actually uniform over its nominal range, or has
      // generation drift crept in — the distributional contract check for
      // a synthetic or bucketed feed (the two-sample row compares feeds
      // to each other; this one compares a feed to its SPEC). D is exact
      // until one final pin: per distinct cent value the ECDF gap
      // |cum·50000 − v·n| is BIGINT (theoretical CDF denominators
      // cleared), the max folds over the collapsed value domain, and
      // d_e6 divides once. Same scale shape as the two-sample KS.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
        val cells = v.groupBy(col("v")).agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells
          .withColumn("cum", sum(col("c")).over(w))
          .withColumn("n", sum(col("c")).over(Window.partitionBy()))
          .agg(max(col("n")).as("n"),
            max(abs(col("cum") * 50000L - col("v") * col("n"))).as("dnum"))
          .select(col("n"), expr(
            """CAST(floor(CAST(dnum AS DOUBLE) / CAST(n AS DOUBLE)
              |     / CAST(50000 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""".stripMargin)
            .as("d_e6"))
      },
      Some("""WITH v AS (
             |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events WHERE value IS NOT NULL),
             |cells AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY v),
             |cum AS (
             |  SELECT v,
             |         CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |         CAST(sum(c) OVER () AS BIGINT) AS n
             |  FROM cells)
             |SELECT max(n) AS n,
             |       CAST(floor(CAST(max(abs(cum * 50000 - v * n)) AS DOUBLE)
             |            / CAST(max(n) AS DOUBLE) / CAST(50000 AS DOUBLE)
             |            * 1000000 + 0.5) AS BIGINT) AS d_e6
             |FROM cum""".stripMargin)
    ),
    Q(
      "stat_proportion_ztest",
      // Two-proportion z-test (round-9): is the error RATE different
      // between the even and odd user cohorts — the A/B-test primitive for
      // binary outcomes (Welch covers means, Mann-Whitney ranks,
      // chi-square full contingency; this is the 2×2 rate comparison every
      // experiment dashboard runs). Four exact BIGINT counts from ONE
      // map-side-combined aggregate; the pooled-variance z folds them with
      // an identical /-and-sqrt formula text, pinned at e6. O(1) output
      // rows at any scale.
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy()
          .agg(
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("user_id") % 2 === 0 &&
              col("event_type") === "error", 1L).otherwise(0L)).as("e1"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("user_id") % 2 === 1 &&
              col("event_type") === "error", 1L).otherwise(0L)).as("e2"))
          .select(col("n1"), col("e1"), col("n2"), col("e2"), expr(
            """CAST(floor(
              |  (CAST(e1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              |   - CAST(e2 AS DOUBLE) / CAST(n2 AS DOUBLE))
              |  / sqrt((CAST(e1 + e2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              |         * (1 - CAST(e1 + e2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              |         * (1 / CAST(n1 AS DOUBLE) + 1 / CAST(n2 AS DOUBLE)))
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("z_e6"))
      },
      Some("""WITH c AS (
             |  SELECT
             |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'error'
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS e1,
             |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'error'
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS e2
             |  FROM events)
             |SELECT n1, e1, n2, e2,
             |       CAST(floor(
             |         (CAST(e1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - CAST(e2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             |         / sqrt((CAST(e1 + e2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
             |                * (1 - CAST(e1 + e2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
             |                * (1 / CAST(n1 AS DOUBLE) + 1 / CAST(n2 AS DOUBLE)))
             |         * 1000000 + 0.5) AS BIGINT) AS z_e6
             |FROM c""".stripMargin)
    ),
    Q(
      "stat_runs_test",
      // Wald–Wolfowitz runs test (round-9): is the daily event-count
      // series random around its mean, or does it trend/cycle? The
      // above/below classification is an integer cross-multiplication
      // (cnt·days vs total — no float mean), runs count from one lag
      // pass, and the z-score folds n1/n2/R through the closed-form
      // moments with identical text, e6-pinned. Complements the
      // Mann-Kendall trend test (monotonic drift) with the
      // autocorrelation-style alternative (too FEW runs = clumping, too
      // MANY = oscillation). O(days) window work, O(1) output.
      (s, dir) => graft.Catalog.sql(s, dir, runsTestSql),
      Some(runsTestSql)
    ),
    Q(
      "stat_sprt_sequential",
      // Wald SPRT (round-10): the sequential A/B early-stopping machinery
      // — per arm, orders arrive in key order, each contributes an
      // integer-milli log-likelihood-ratio increment for H1: p=0.4 vs
      // H0: p=0.2 (x=1 → ln2 = +693 m, x=0 → ln0.75 = −288 m), and the
      // test stops at the FIRST crossing of ±ln((1−β)/α) ≈ ±2890 m
      // (α=β=0.05). Emits per arm: sample size at decision, the decision
      // (accept_h1 / accept_h0 / continue), and the LLR there. The staged
      // per-arm conversion rates (10%..50% by priority digit) straddle
      // both hypotheses so all three outcomes are reachable. Everything
      // is BIGINT — the classic sequential test with zero float drift.
      // Scale: one keyed window cumsum + one first-crossing pick;
      // sequential ingestion order is the ORDER BY, not a driver loop.
      (s, dir) => graft.Catalog.sql(s, dir, sprtSql),
      Some(sprtSql)
    ),
    Q(
      "stat_empirical_bayes_ctr",
      // Empirical-Bayes rate shrinkage (round-10): the standard fix for
      // small-sample CTR ranking — per-part conversion rates shrunk
      // toward a Beta prior fitted by method of moments on the observed
      // per-key rates. EVERYTHING is BIGINT: per-key rate r_e6 = 1e6·c
      // div v, prior moments from (n·Σr² − (Σr)²) cross-products, α/β in
      // e6 units, and the smoothed rate the exact integer ratio
      // (1e6·(c·1e6 + α_e6)) div (v·1e6 + αβ_e6) — no float summation
      // order anywhere, so both engines agree bit-for-bit. Output: the
      // 10 most-shrunk keys (the small-sample ones the raw ranking would
      // have mis-ordered). Scale: two aggregates (per-key, then global
      // moments broadcast back) — O(keys) shuffle.
      // integer division is the ONE dialect split (Spark `div`, DuckDB
      // `//`): the same text runs on both engines modulo that token
      (s, dir) => graft.Catalog.sql(s, dir, ebCtrSql("div")),
      Some(ebCtrSql("//"))
    ),
    Q(
      "stat_capture_recapture",
      // Lincoln–Petersen capture–recapture (round-10): estimate a corpus'
      // TRUE size from two independent "crawls" — N̂ = nA·nB / n_both —
      // the coverage-estimation trick a crawl operator uses when the full
      // population can't be enumerated (and dedup's census cousin: the
      // overlap IS the dedup join). Crawls are independent deterministic
      // hash subsets (~60% / ~50%); everything BIGINT, the estimate
      // e0-pinned by integer division, and the census carries the truth
      // so the estimator's bias at this draw is visible. One scan, one
      // aggregate — O(1) output at any corpus size.
      (s, dir) => graft.Catalog.sql(s, dir, captureSql("div")),
      Some(captureSql("//"))
    ),
    Q(
      "agg_log2_histogram",
      // Log-scale histogram (round-10): the HDR-style power-of-two
      // bucketing every latency/size dashboard uses — linear bins (the
      // existing `agg_histogram`) waste resolution on heavy-tailed
      // metrics, log2 bins give constant relative error. Bucket =
      // floor(log2(cents)) — exact at IEEE powers of two on both
      // engines — with per-bucket count, bounds, and the e6 share of
      // total. One map-side-combined aggregate, O(64) output rows at any
      // volume.
      (s, dir) => graft.Catalog.sql(s, dir, log2HistSql("div")),
      Some(log2HistSql("//"))
    ),
    Q(
      "stat_winsorized_mean",
      // Winsorized mean (round-10): robust central tendency — per
      // priority group, order values are CLIPPED at the exact
      // nearest-rank P5/P95 (rank = ceil(q·n), the `agg_percentile_exact`
      // definition) before averaging, so a handful of extreme orders
      // can't drag the mean. All BIGINT cents: clip bounds picked by
      // rank from one window pass, the mean an integer division. The
      // standard treatment for heavy-tailed business metrics; one keyed
      // window + one aggregate at any scale.
      (s, dir) => graft.Catalog.sql(s, dir, winsorSql("div")),
      Some(winsorSql("//"))
    ),
    Q(
      "stat_chao1_vocab",
      // Chao1 richness estimator (round-10): how many vocabulary types
      // does the corpus REALLY have, including the ones not yet seen?
      // Chao1 = D + f1²/(2·f2) from the observed type count and the
      // singleton/doubleton frequencies — the standard answer to "is the
      // crawl's vocabulary saturating", the estimation sibling of
      // `text_zipf_slope` and `stat_capture_recapture`. Token counting is
      // one explode + two aggregates, the estimate pure BIGINT. At
      // 100 TB the frequency-of-frequencies table is O(distinct types).
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("w")).agg(count(lit(1)).as("f"))
          .agg(count(lit(1)).as("d"),
            sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
            sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"),
            sum(col("f")).as("n_tokens"))
          .withColumn("chao1", expr(
            """CASE WHEN f2 > 0 THEN d + (f1 * f1) div (2 * f2)
              |ELSE d + (f1 * (f1 - 1)) div 2 END""".stripMargin))
      },
      Some(chao1Sql)
    ),
    Q(
      "stat_survival_km",
      // Kaplan-Meier survival curve (round-9): time-to-first-purchase
      // per user with right-censoring — users who never purchase are
      // censored at their last-seen day (the standard conversion-lag /
      // churn estimator, handling censoring correctly where a naive
      // average of observed lags is biased). The estimator Ŝ(t) = Π(1 − d/n) is
      // evaluated as exp(Σ ln(1−d/n)) over an ORDERED window — the
      // cumulative frame fixes the float summation sequence, so both
      // engines add the same doubles in the same order and the e6 pin is
      // exact. Lifetimes and risk sets are pure integer aggregates
      // (O(users) rollup + O(distinct lifetimes) window); output is the
      // survival table every churn dashboard plots.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val life = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("first_d"),
            max(to_date(col("ts"))).as("last_d"),
            min(when(col("event_type") === "purchase", to_date(col("ts"))))
              .as("conv_d"))
        val lt = life
          .select(
            datediff(coalesce(col("conv_d"), col("last_d")), col("first_d"))
              .cast("long").as("t"),
            col("conv_d").isNotNull.cast("long").as("churn"))
        val cells = lt.groupBy(col("t"))
          .agg(count(lit(1)).as("leaving"), sum(col("churn")).as("d"))
        val wRisk = Window.orderBy(col("t"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val wCum = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells
          .withColumn("n_risk", sum(col("leaving")).over(wRisk))
          .withColumn("s", exp(sum(expr(
            "ln(greatest(1 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 1E-12))")).over(wCum)))
          .select(col("t"), col("n_risk"), col("d"),
            expr("CAST(floor(s * 1000000 + 0.5) AS BIGINT)").as("survival_e6"))
          .orderBy(col("t"))
      },
      Some("""WITH life AS (
             |  SELECT user_id, min(CAST(ts AS DATE)) AS first_d,
             |         max(CAST(ts AS DATE)) AS last_d,
             |         min(CASE WHEN event_type = 'purchase'
             |                  THEN CAST(ts AS DATE) END) AS conv_d
             |  FROM events GROUP BY user_id),
             |lt AS (
             |  SELECT CAST(coalesce(conv_d, last_d) - first_d AS BIGINT) AS t,
             |         CASE WHEN conv_d IS NOT NULL THEN 1 ELSE 0 END AS churn
             |  FROM life),
             |cells AS (
             |  SELECT t, CAST(count(*) AS BIGINT) AS leaving,
             |         CAST(sum(churn) AS BIGINT) AS d
             |  FROM lt GROUP BY t),
             |km AS (
             |  SELECT t, leaving, d,
             |    CAST(sum(leaving) OVER (ORDER BY t
             |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
             |  FROM cells)
             |SELECT t, n_risk, d,
             |       CAST(floor(exp(sum(ln(greatest(1 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 1E-12)))
             |            OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) * 1000000 + 0.5) AS BIGINT) AS survival_e6
             |FROM km ORDER BY t""".stripMargin)
    ),
    Q(
      "stat_mutual_info",
      // Mutual information between event type and user cohort (round-9):
      // the feature-selection / dependence metric MI = Σ p_xy·ln(p_xy /
      // (p_x·p_y)), plus its normalized form MI/min(H_x, H_y). All
      // probabilities come from exact BIGINT counts of ONE contingency
      // aggregate (cells broadcast back over the two marginal folds);
      // the log arithmetic runs with identical formula text at the very
      // end, pinned at e6. O(|X|·|Y|) intermediate, O(1) output.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cohort", (col("user_id") % 4).cast("int"))
        val cells = ev.groupBy(col("event_type"), col("cohort"))
          .agg(count(lit(1)).as("nxy"))
        val mx = cells.groupBy(col("event_type")).agg(sum(col("nxy")).as("nx"))
        val my = cells.groupBy(col("cohort")).agg(sum(col("nxy")).as("ny"))
        val n = cells.agg(sum(col("nxy")).as("n"))
        cells.join(broadcast(mx), "event_type").join(broadcast(my), "cohort")
          .crossJoin(broadcast(n))
          .agg(
            max(col("n")).as("n_rows"),
            sum(expr(
              """CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
                |* ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
                |     / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))""".stripMargin))
              .as("mi"),
            sum(expr(
              """- CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
                |* ln(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin))
              .as("hxy"))
          .select(col("n_rows"),
            expr("CAST(floor(mi * 1000000 + 0.5) AS BIGINT)").as("mi_e6"),
            expr("CAST(floor(hxy * 1000000 + 0.5) AS BIGINT)").as("h_joint_e6"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(user_id % 4 AS INT) AS cohort FROM events),
             |cells AS (
             |  SELECT event_type, cohort, CAST(count(*) AS BIGINT) AS nxy
             |  FROM ev GROUP BY 1, 2),
             |mx AS (SELECT event_type, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1),
             |my AS (SELECT cohort, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1),
             |t AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells),
             |j AS (
             |  SELECT nxy, nx, ny, n FROM cells
             |  JOIN mx USING (event_type) JOIN my USING (cohort) CROSS JOIN t)
             |SELECT max(n) AS n_rows,
             |       CAST(floor(sum(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
             |            * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
             |                 / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))) * 1000000 + 0.5) AS BIGINT) AS mi_e6,
             |       CAST(floor(sum(- CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
             |            * ln(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS h_joint_e6
             |FROM j""".stripMargin)
    ),
    Q(
      "stat_cramers_v",
      // Cramér's V effect size (round-9): the chi-square contingency
      // statistic normalized to [0,1] — "is the dependence LARGE", the
      // question the raw chi-square (stat_chi_square) can't answer
      // because it grows with n. Same one-pass contingency shape; V =
      // sqrt(χ² / (n·min(r−1, c−1))), everything from exact counts, one
      // e6 pin.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cohort", (col("user_id") % 4).cast("int"))
        val cells = ev.groupBy(col("event_type"), col("cohort"))
          .agg(count(lit(1)).as("nxy"))
        val mx = cells.groupBy(col("event_type")).agg(sum(col("nxy")).as("nx"))
        val my = cells.groupBy(col("cohort")).agg(sum(col("nxy")).as("ny"))
        val n = cells.agg(sum(col("nxy")).as("n"),
          countDistinct(col("event_type")).as("r"),
          countDistinct(col("cohort")).as("c"))
        cells.join(broadcast(mx), "event_type").join(broadcast(my), "cohort")
          .crossJoin(broadcast(n))
          .agg(max(col("n")).as("n_rows"), max(col("r")).as("r"),
            max(col("c")).as("c"),
            sum(expr(
              """pow(CAST(nxy AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE), 2)
                |/ (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin))
              .as("chi2"))
          .select(col("n_rows"), col("r"), col("c"),
            expr("CAST(floor(chi2 * 1000000 + 0.5) AS BIGINT)").as("chi2_e6"),
            expr("""CAST(floor(sqrt(chi2 / (CAST(n_rows AS DOUBLE)
                   |* CAST(least(r - 1, c - 1) AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)""".stripMargin)
              .as("cramers_v_e6"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(user_id % 4 AS INT) AS cohort FROM events),
             |cells AS (
             |  SELECT event_type, cohort, CAST(count(*) AS BIGINT) AS nxy
             |  FROM ev GROUP BY 1, 2),
             |mx AS (SELECT event_type, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1),
             |my AS (SELECT cohort, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1),
             |t AS (SELECT CAST(sum(nxy) AS BIGINT) AS n,
             |             CAST(count(DISTINCT event_type) AS BIGINT) AS r,
             |             CAST(count(DISTINCT cohort) AS BIGINT) AS c
             |      FROM cells),
             |f AS (
             |  SELECT max(n) AS n_rows, max(r) AS r, max(c) AS c,
             |         sum(pow(CAST(nxy AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE), 2)
             |             / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))) AS chi2
             |  FROM cells JOIN mx USING (event_type) JOIN my USING (cohort) CROSS JOIN t)
             |SELECT n_rows, r, c,
             |       CAST(floor(chi2 * 1000000 + 0.5) AS BIGINT) AS chi2_e6,
             |       CAST(floor(sqrt(chi2 / (CAST(n_rows AS DOUBLE)
             |            * CAST(least(r - 1, c - 1) AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS cramers_v_e6
             |FROM f""".stripMargin)
    ),
    Q(
      "stat_diff_in_diff",
      // Difference-in-differences (round-11): the workhorse causal
      // estimator for a rollout without randomization — effect =
      // (treat_after − treat_before) − (ctrl_after − ctrl_before) over
      // group means. Treatment = user_id parity; the period cut is the
      // fixture's median event time, computed ONCE as a scalar (exact
      // integer nanos). Every cell mean enters as exact integer sums and
      // the estimate is assembled with cross-multiplied integers over a
      // common denominator (n1·n2·n3·n4 ≤ 2^? — cents ≤ 1e7 and cells
      // ≤ 1e5 at stress scale keep the numerator < 2^62; DECIMAL(38,0)
      // guards the product anyway, the epoch-shuffle overflow posture).
      // Output: the four cell (n, sum) pairs plus did_e2 in exact cents
      // via per-cell integer-scaled means. Scale: one scan, one 4-cell
      // aggregate — nothing moves but 8 longs.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("ts_ns"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
        // period cut = exact integer midpoint of the observation window
        // (a double median of ~1.7e18-nanos values would lose precision
        // past 2^53 and could disagree cross-engine by an ulp)
        val Array(mn, mx) = ev.agg(min(col("ts_ns")), max(col("ts_ns")))
          .head.toSeq.map(_.asInstanceOf[Long]).toArray
        val cut = (mn + mx) / 2
        val cells = ev
          .withColumn("treated", (col("user_id") % 2 === 0).cast("long"))
          .withColumn("after", (col("ts_ns") > cut).cast("long"))
          .groupBy(col("treated"), col("after"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        // pivot the 4 cells wide, then the exact assembly: did_e2 =
        // round of ((s11/n11 − s10/n10) − (s01/n01 − s00/n00)) in cents,
        // each mean an exact decimal division e2-floored half-up
        val wide = cells.agg(
          sum(when(col("treated") === 1 && col("after") === 1, col("s"))).as("s11"),
          sum(when(col("treated") === 1 && col("after") === 1, col("n"))).as("n11"),
          sum(when(col("treated") === 1 && col("after") === 0, col("s"))).as("s10"),
          sum(when(col("treated") === 1 && col("after") === 0, col("n"))).as("n10"),
          sum(when(col("treated") === 0 && col("after") === 1, col("s"))).as("s01"),
          sum(when(col("treated") === 0 && col("after") === 1, col("n"))).as("n01"),
          sum(when(col("treated") === 0 && col("after") === 0, col("s"))).as("s00"),
          sum(when(col("treated") === 0 && col("after") === 0, col("n"))).as("n00"))
        wide.withColumn("did_micro_cents", expr(
          """(CAST(1000000 AS DECIMAL(38,0)) * s11 div n11
            | - CAST(1000000 AS DECIMAL(38,0)) * s10 div n10)
            | - (CAST(1000000 AS DECIMAL(38,0)) * s01 div n01
            | - CAST(1000000 AS DECIMAL(38,0)) * s00 div n00)""".stripMargin))
          .select(col("n11"), col("s11"), col("n10"), col("s10"),
            col("n01"), col("s01"), col("n00"), col("s00"),
            col("did_micro_cents"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_ns(ts) AS ts_ns,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |cut AS (
             |  SELECT (min(ts_ns) + max(ts_ns)) // 2 AS c FROM ev),
             |cells AS (
             |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
             |         CASE WHEN ts_ns > (SELECT c FROM cut) THEN 1 ELSE 0 END AS af,
             |         CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
             |  FROM ev GROUP BY 1, 2)
             |SELECT
             |  CAST(sum(CASE WHEN treated = 1 AND af = 1 THEN n END) AS BIGINT) AS n11,
             |  CAST(sum(CASE WHEN treated = 1 AND af = 1 THEN s END) AS BIGINT) AS s11,
             |  CAST(sum(CASE WHEN treated = 1 AND af = 0 THEN n END) AS BIGINT) AS n10,
             |  CAST(sum(CASE WHEN treated = 1 AND af = 0 THEN s END) AS BIGINT) AS s10,
             |  CAST(sum(CASE WHEN treated = 0 AND af = 1 THEN n END) AS BIGINT) AS n01,
             |  CAST(sum(CASE WHEN treated = 0 AND af = 1 THEN s END) AS BIGINT) AS s01,
             |  CAST(sum(CASE WHEN treated = 0 AND af = 0 THEN n END) AS BIGINT) AS n00,
             |  CAST(sum(CASE WHEN treated = 0 AND af = 0 THEN s END) AS BIGINT) AS s00,
             |  CAST((1000000::HUGEINT * sum(CASE WHEN treated = 1 AND af = 1 THEN s END)
             |     // sum(CASE WHEN treated = 1 AND af = 1 THEN n END)
             |   - 1000000::HUGEINT * sum(CASE WHEN treated = 1 AND af = 0 THEN s END)
             |     // sum(CASE WHEN treated = 1 AND af = 0 THEN n END))
             |  - (1000000::HUGEINT * sum(CASE WHEN treated = 0 AND af = 1 THEN s END)
             |     // sum(CASE WHEN treated = 0 AND af = 1 THEN n END)
             |   - 1000000::HUGEINT * sum(CASE WHEN treated = 0 AND af = 0 THEN s END)
             |     // sum(CASE WHEN treated = 0 AND af = 0 THEN n END))
             |  AS BIGINT) AS did_micro_cents
             |FROM cells""".stripMargin)
    ),
    Q(
      "stat_cuped",
      // CUPED variance reduction (round-9): the experiment-analysis
      // primitive that shrinks A/B confidence intervals using a
      // pre-period covariate — adjusted = post − θ·(pre − mean(pre)),
      // θ = cov(pre, post)/var(pre). Per-user pre/post sums (first vs
      // second half of the events month) are exact BIGINT cents from ONE
      // map-side-combined aggregate; θ and the per-variant adjusted means
      // fold those exact moments with identical formula text, pinned at
      // e6. Two shuffles total (user rollup, then a 5-moment global fold
      // broadcast back over the 2-variant rollup); O(1) output rows at
      // any scale.
      (s, dir) => {
        val per = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            sum(when(dayofmonth(col("ts")) <= 15,
              expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L)).as("x"),
            sum(when(dayofmonth(col("ts")) > 15,
              expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L)).as("y"))
          .withColumn("variant", (col("user_id") % 2).cast("int"))
        val mom = per.agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        per.crossJoin(broadcast(mom))
          .withColumn("theta", expr(
            """(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
              |/ (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin))
          .withColumn("adj", expr(
            "CAST(y AS DOUBLE) - theta * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"))
          .groupBy(col("variant"))
          .agg(
            count(lit(1)).as("n_users"),
            expr("CAST(floor(avg(CAST(y AS DOUBLE)) * 100 + 0.5) AS BIGINT)").as("raw_mean_cents"),
            expr("CAST(floor(avg(adj) * 100 + 0.5) AS BIGINT)").as("cuped_mean_cents"),
            expr("CAST(floor(max(theta) * 1000000 + 0.5) AS BIGINT)").as("theta_e6"))
          .orderBy(col("variant"))
      },
      Some("""WITH per AS (
             |  SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             |    CAST(sum(CASE WHEN day(ts) <= 15
             |         THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
             |    CAST(sum(CASE WHEN day(ts) > 15
             |         THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY user_id),
             |mom AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             |         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
             |         CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM per),
             |adj AS (
             |  SELECT variant, y,
             |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS theta,
             |    CAST(y AS DOUBLE)
             |      - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
             |        * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS adj
             |  FROM per CROSS JOIN mom)
             |SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(floor(avg(CAST(y AS DOUBLE)) * 100 + 0.5) AS BIGINT) AS raw_mean_cents,
             |       CAST(floor(avg(adj) * 100 + 0.5) AS BIGINT) AS cuped_mean_cents,
             |       CAST(floor(max(theta) * 1000000 + 0.5) AS BIGINT) AS theta_e6
             |FROM adj GROUP BY variant ORDER BY variant""".stripMargin)
    ),
    Q(
      "stat_fdr_bh",
      // Benjamini-Hochberg FDR control (round-9): the multiple-testing
      // gate every metrics platform needs once it tests 20 sources at
      // once. Per-source z vs the global document-length mean from exact
      // BIGINT sums; the tail probability uses the Lin (1989) exponential
      // approximation exp(−0.717z − 0.416z²) — a pure-arithmetic
      // surrogate both engines evaluate identically (no erf in either SQL
      // dialect). BH: rank p ascending, cutoff = max rank with
      // p ≤ (rank/m)·α (α = 0.1), reject every rank ≤ cutoff. One
      // O(sources)-row window pass after a map-side aggregate; output is
      // O(sources) at any scale.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val bySrc = Tables(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("ns"), sum(col("n_chars")).as("ss"),
            sum(col("n_chars") * col("n_chars")).as("sss"))
        val g = bySrc.agg(
          sum(col("ns")).as("n"), sum(col("ss")).as("sg"),
          sum(col("sss")).as("ssg"),
          count(lit(1)).cast("long").as("m"))
        val z = bySrc.crossJoin(broadcast(g))
          .withColumn("zabs", expr(
            """abs((CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE) - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
              |/ (sqrt(CAST(ssg AS DOUBLE) / CAST(n AS DOUBLE)
              |        - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)))
              |   / sqrt(CAST(ns AS DOUBLE))))""".stripMargin))
          .withColumn("p", expr("exp(-0.717 * zabs - 0.416 * zabs * zabs)"))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("p"), col("source"))))
        val cutoff = z
          .withColumn("ok", when(
            col("p") <= col("rnk").cast("double") / col("m").cast("double") * 0.1, col("rnk"))
            .otherwise(0))
          .agg(max(col("ok")).as("cutoff"))
        z.crossJoin(broadcast(cutoff))
          .select(col("source"),
            expr("CAST(floor(p * 1000000 + 0.5) AS BIGINT)").as("p_e6"),
            col("rnk").cast("long").as("rnk"),
            (col("rnk") <= col("cutoff")).as("rejected"))
          .orderBy(col("rnk"))
      },
      Some("""WITH bysrc AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS ns,
             |         CAST(sum(n_chars) AS BIGINT) AS ss,
             |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sss
             |  FROM documents GROUP BY source),
             |g AS (
             |  SELECT CAST(sum(ns) AS BIGINT) AS n, CAST(sum(ss) AS BIGINT) AS sg,
             |         CAST(sum(sss) AS BIGINT) AS ssg, CAST(count(*) AS BIGINT) AS m
             |  FROM bysrc),
             |z AS (
             |  SELECT source,
             |    exp(-0.717 * abs((CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE) - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (sqrt(CAST(ssg AS DOUBLE) / CAST(n AS DOUBLE)
             |                - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)))
             |           / sqrt(CAST(ns AS DOUBLE))))
             |        - 0.416 * ((CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE) - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (sqrt(CAST(ssg AS DOUBLE) / CAST(n AS DOUBLE)
             |                - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)))
             |           / sqrt(CAST(ns AS DOUBLE))))
             |          * ((CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE) - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (sqrt(CAST(ssg AS DOUBLE) / CAST(n AS DOUBLE)
             |                - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)))
             |           / sqrt(CAST(ns AS DOUBLE))))) AS p,
             |    m
             |  FROM bysrc CROSS JOIN g),
             |ranked AS (
             |  SELECT source, p, m,
             |         CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS rnk
             |  FROM z),
             |cut AS (
             |  SELECT max(CASE WHEN p <= CAST(rnk AS DOUBLE) / CAST(m AS DOUBLE) * 0.1
             |                  THEN rnk ELSE 0 END) AS cutoff
             |  FROM ranked)
             |SELECT source, CAST(floor(p * 1000000 + 0.5) AS BIGINT) AS p_e6,
             |       rnk, rnk <= cutoff AS rejected
             |FROM ranked CROSS JOIN cut ORDER BY rnk""".stripMargin)
    ),
    Q(
      "agg_market_basket_lift",
      // Market-basket lift for brand pairs (round-9): which brands
      // co-occur in the same order MORE than independence predicts —
      // lift(a,b) = n_ab·N / (n_a·n_b), the association-rule primitive.
      // The self-join is WITHIN an order (basket-size-bounded quadratic,
      // same scale argument as blocked ER), brand counts broadcast back
      // (O(brands) rows), and the lone scalar N rides a broadcast cross
      // join. Support floor n_ab ≥ 5 keeps output stable; exact counts,
      // e6-pinned lift.
      (s, dir) => {
        // r17 rewrite (guide §2.3 aggregate-before-shuffle / §2.4): the
        // order×order self-join shuffled the (orderkey, brand) table twice
        // and re-aggregated; collecting each order's DISTINCT brands into
        // one sorted basket needs ONE keyed shuffle, and the (a < b) pair
        // expansion is basket-size-bounded map-side work — identical pair
        // multiset by construction (each unordered brand pair of an order
        // appears exactly once either way). n_orders and the per-brand
        // counts both derive from the same checkpointed basket table:
        // n_orders = basket rows (= countDistinct l_orderkey), n_brand =
        // per-brand basket memberships (= distinct (order, brand) rows).
        val baskets = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand"))
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
          .localCheckpoint(false)
        val n = baskets.select(count(lit(1)).as("n_orders"))
        val cnt = baskets.select(explode(col("bs")).as("p_brand"))
          .groupBy(col("p_brand")).agg(count(lit(1)).as("n_brand"))
        val pairs = baskets.select(explode(expr(
            """flatten(transform(bs, (x, i) ->
              |  transform(slice(bs, i + 2, size(bs) - i - 1),
              |            y -> named_struct('brand_a', x, 'brand_b', y))))""".stripMargin))
            .as("p"))
          .select(col("p.brand_a"), col("p.brand_b"))
          .groupBy(col("brand_a"), col("brand_b"))
          .agg(count(lit(1)).as("n_co"))
          .filter(col("n_co") >= 5)
        // ONE broadcast lookup (brand→count map + the scalar N on a single
        // row) replaces two broadcast joins + a broadcast cross join
        // (guide §3.1; VERDICT r16 next-round #7)
        val lookup = cnt
          .agg(map_from_entries(collect_list(
            struct(col("p_brand"), col("n_brand")))).as("m"))
          .crossJoin(n)
        pairs
          .crossJoin(broadcast(lookup))
          .select(col("brand_a"), col("brand_b"), col("n_co"), expr(
            """CAST(floor(CAST(n_co AS DOUBLE) * CAST(n_orders AS DOUBLE)
              |     / (CAST(m[brand_a] AS DOUBLE) * CAST(m[brand_b] AS DOUBLE))
              |     * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("lift_e6"))
          .orderBy(col("brand_a"), col("brand_b"))
      },
      Some("""WITH b AS (
             |  SELECT DISTINCT l.l_orderkey, p.p_brand
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
             |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
             |cnt AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_brand
             |        FROM b GROUP BY p_brand),
             |pairs AS (
             |  SELECT a.p_brand AS brand_a, b2.p_brand AS brand_b,
             |         CAST(count(*) AS BIGINT) AS n_co
             |  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
             |                    AND a.p_brand < b2.p_brand
             |  GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT p.brand_a, p.brand_b, p.n_co,
             |       CAST(floor(CAST(p.n_co AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
             |            / (CAST(ca.n_brand AS DOUBLE) * CAST(cb.n_brand AS DOUBLE))
             |            * 1000000 + 0.5) AS BIGINT) AS lift_e6
             |FROM pairs p
             |JOIN cnt ca ON ca.p_brand = p.brand_a
             |JOIN cnt cb ON cb.p_brand = p.brand_b, n
             |ORDER BY brand_a, brand_b""".stripMargin)
    ),
    Q(
      "stat_cohens_kappa",
      // Cohen's kappa (round-9): chance-corrected agreement between two
      // binary "annotators" over events — A: is it an error event, B: is
      // value above 50 — the label-quality / weak-supervision audit
      // (raw agreement over-credits whatever both raters say most).
      // kappa = (po − pe)/(1 − pe) from the four exact confusion counts
      // of ONE map-side-combined aggregate; e6-pinned. O(1) output.
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error" && col("value") > 50, 1L)
              .otherwise(0L)).as("n11"),
            sum(when(col("event_type") === "error" && !(col("value") > 50), 1L)
              .otherwise(0L)).as("n10"),
            sum(when(col("event_type") =!= "error" && col("value") > 50, 1L)
              .otherwise(0L)).as("n01"))
          .select(col("n"), col("n11"), col("n10"), col("n01"), expr(
            """CAST(floor(
              |  ((CAST(n11 + n - n11 - n10 - n01 AS DOUBLE) / CAST(n AS DOUBLE))
              |   - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              |      + CAST(n - n11 - n10 AS DOUBLE) * CAST(n - n11 - n01 AS DOUBLE))
              |     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
              |  / (1 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              |          + CAST(n - n11 - n10 AS DOUBLE) * CAST(n - n11 - n01 AS DOUBLE))
              |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("kappa_e6"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN event_type = 'error' AND value > 50
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             |         CAST(sum(CASE WHEN event_type = 'error' AND NOT (value > 50)
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             |         CAST(sum(CASE WHEN event_type <> 'error' AND value > 50
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS n01
             |  FROM events WHERE value IS NOT NULL)
             |SELECT n, n11, n10, n01,
             |       CAST(floor(
             |         ((CAST(n11 + n - n11 - n10 - n01 AS DOUBLE) / CAST(n AS DOUBLE))
             |          - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
             |             + CAST(n - n11 - n10 AS DOUBLE) * CAST(n - n11 - n01 AS DOUBLE))
             |            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             |         / (1 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
             |                 + CAST(n - n11 - n10 AS DOUBLE) * CAST(n - n11 - n01 AS DOUBLE))
             |               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             |         * 1000000 + 0.5) AS BIGINT) AS kappa_e6
             |FROM c""".stripMargin)
    ),
    Q(
      "stat_bootstrap_ci",
      // Derandomized bootstrap confidence interval (round-9): the 95% CI
      // of mean daily purchase revenue by resampling — the distribution-
      // free error bar for any statistic, here DERANDOMIZED (the
      // sampling-tier discipline): draw (r, j) maps to index
      // ((r·1103515245 + j·12345) mod 2^31−1) mod n, so both engines
      // replay the identical 200 × n resample plan with no RNG state.
      // The corpus collapses to O(days) first; the whole resample runs
      // as nested HOFs over ONE row's array (bounded by replicas ×
      // days, calendar-scale work however big the corpus); replica
      // means are exact integer divisions, the CI is an order-statistic
      // pick (ranks 6/195 of 200), never a float quantile.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
        daily
          .agg(array_sort(collect_list(struct(col("d"), col("y")))).as("sd"))
          .select(expr("transform(sd, x -> x.y)").as("ys"))
          .select(expr(
            """named_struct(
              |  'n_days', CAST(size(ys) AS BIGINT),
              |  'n_reps', CAST(200 AS BIGINT),
              |  'mean_c', aggregate(ys, 0L, (a, v) -> a + v) div size(ys),
              |  'means', array_sort(transform(sequence(1, 200), r ->
              |    aggregate(sequence(1, size(ys)), 0L, (a, j) ->
              |      a + ys[CAST(((r * 1103515245L + j * 12345L) % 2147483647L) % size(ys) AS INT)])
              |    div size(ys))))""".stripMargin).as("s"))
          .select(col("s.n_days").as("n_days"), col("s.n_reps").as("n_reps"),
            col("s.mean_c").as("mean_c"),
            expr("s.means[5]").as("ci_lo_c"),
            expr("s.means[194]").as("ci_hi_c"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |arr AS (SELECT list(y ORDER BY d) AS ys FROM daily),
             |bs AS (
             |  SELECT CAST(len(ys) AS BIGINT) AS n_days,
             |         CAST(200 AS BIGINT) AS n_reps,
             |         CAST(list_sum(ys) AS BIGINT) // len(ys) AS mean_c,
             |         list_sort(list_transform(generate_series(1, 200), r ->
             |           CAST(list_sum(list_transform(generate_series(1, len(ys)), j ->
             |             ys[CAST(((r * 1103515245 + j * 12345) % 2147483647) % len(ys) AS BIGINT) + 1])) AS BIGINT)
             |           // len(ys))) AS means
             |  FROM arr)
             |SELECT n_days, n_reps, mean_c,
             |       means[6] AS ci_lo_c, means[195] AS ci_hi_c
             |FROM bs""".stripMargin)
    ),
    Q(
      "stat_chi_square",
      // Chi-square independence test on the event_type × user-parity
      // contingency table: is event mix independent of the user segment?
      // Observed counts come from ONE tiny two-phase aggregate; expected
      // counts and per-cell terms are recomputed from the marginals in
      // exact arithmetic, each term pinned to 1e-6 integer units BEFORE
      // the final sum so the statistic is bitwise cross-engine. The
      // contingency table is O(types × segments) — driver-sized at any
      // data scale.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cells = Tables.events(s, dir)
          .groupBy(col("event_type"), (col("user_id") % 2).as("seg"))
          .agg(count(lit(1)).as("obs"))
        val withMarginals = cells
          .withColumn("row_tot", sum(col("obs")).over(
            Window.partitionBy(col("event_type"))))
          .withColumn("col_tot", sum(col("obs")).over(
            Window.partitionBy(col("seg"))))
          .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
          .withColumn("exp",
            col("row_tot").cast("double") * col("col_tot").cast("double") /
              col("n").cast("double"))
          .withColumn("term_e6",
            expr("CAST(floor((CAST(obs AS DOUBLE) - exp) * (CAST(obs AS DOUBLE) - exp) / exp * 1000000 + 0.5) AS BIGINT)"))
        withMarginals
          .agg(count(lit(1)).as("n_cells"), sum(col("term_e6")).as("chi2_e6"))
          .select(col("n_cells"), col("chi2_e6"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type, user_id % 2 AS seg, count(*) AS obs
             |  FROM events GROUP BY event_type, user_id % 2),
             |m AS (
             |  SELECT obs,
             |         CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
             |         CAST(sum(obs) OVER (PARTITION BY seg) AS BIGINT) AS col_tot,
             |         CAST(sum(obs) OVER () AS BIGINT) AS n
             |  FROM cells),
             |t AS (
             |  SELECT CAST(floor((CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             |                    * (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             |                    / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             |                    * 1000000 + 0.5) AS BIGINT) AS term_e6
             |  FROM m)
             |SELECT count(*) AS n_cells, CAST(sum(term_e6) AS BIGINT) AS chi2_e6
             |FROM t""".stripMargin)
    ),
    Q(
      "stat_countmin_heavyhitters",
      // Count-Min sketch heavy hitters: sketch built distributed over the
      // full stream, point estimates read for the candidate set (here the
      // event types). Estimates over-count by design — OperatorSpec bounds the
      // error vs exact counts.
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val cms = ev.stat.countMinSketch("event_type", 0.001, 0.99, 42)
        val types = Seq("click", "purchase", "error", "signup", "view")
        types.map(t => (t, cms.estimateCount(t)))
          .toDF("event_type", "est_count")
          .orderBy(col("event_type"))
      },
      // Full DuckDB oracle (r7): string items hash with Spark's murmur
      // double-hashing (seed-independent — the ctor seed only feeds the
      // LONG path), so bucket positions are computable driver-side
      // (SketchOracle.cmBuckets, pinned against the real CountMinSketch in
      // SketchOracleSpec) and inlined as literals. table[i][b] = total
      // count of event types landing in (i, b); estimate = min over
      // depth. The buckets VALUES list covers the fixture's full
      // event_type domain — a NEW type in the data would drop out of the
      // inner join, under-count vs Spark, and FAIL the hash gate (wrong
      // answers fail loudly, never pass silently).
      Some {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val depth = graft.tools.SketchOracle.cmDepth(0.99)
        val width = graft.tools.SketchOracle.cmWidth(0.001)
        val rows = types.flatMap(t =>
          graft.tools.SketchOracle.cmBuckets(t, depth, width).zipWithIndex.map {
            case (b, i) => s"('$t', $i, $b)"
          })
        s"""WITH counts AS (
           |  SELECT event_type, count(*) AS n FROM events GROUP BY 1),
           |buckets(et, i, b) AS (VALUES ${rows.mkString(", ")}),
           |cells AS (
           |  SELECT b.i, b.b, CAST(sum(c.n) AS BIGINT) AS cell
           |  FROM counts c JOIN buckets b ON c.event_type = b.et
           |  GROUP BY 1, 2)
           |SELECT qb.et AS event_type, min(cells.cell) AS est_count
           |FROM buckets qb JOIN cells ON cells.i = qb.i AND cells.b = qb.b
           |GROUP BY 1
           |ORDER BY event_type""".stripMargin
      }
    ),
    Q(
      "agg_corr_stats",
      // Second-moment statistics: correlation, covariance, stddev,
      // variance — all single-pass mergeable co-moment aggregates
      // (partial+final like any sum), r2-rounded for cross-engine parity.
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            util.r2(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
            util.r2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("covar_qty_price"),
            util.r2(stddev_samp(col("l_extendedprice"))).as("stddev_price"),
            util.r2(var_samp(col("l_quantity"))).as("var_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag,
              |       ${util.r2sql("corr(l_quantity, l_extendedprice)")} AS corr_qty_price,
              |       ${util.r2sql("covar_samp(l_quantity, l_extendedprice)")} AS covar_qty_price,
              |       ${util.r2sql("stddev_samp(l_extendedprice)")} AS stddev_price,
              |       ${util.r2sql("var_samp(l_quantity)")} AS var_qty
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_skew_kurt",
      // Third/fourth-moment statistics: skewness and excess kurtosis per
      // group. Spark's skewness() is population-based and DuckDB's is
      // sample-based, so neither built-in can oracle the other — instead
      // both engines compute the SAME formula over EXACT integer power sums
      // (l_quantity is integer-valued; Σq^4 stays far below 2^53, so the
      // sums are order-independent and bit-identical), then the identical
      // double expression tree yields identical IEEE results. Still a
      // single-pass mergeable aggregate — four sums and a count.
      (s, dir) => {
        // Power sums accumulate in DECIMAL(38,0) (HUGEINT on the oracle
        // side): the per-row q^4 products fit a long, but a hot group's
        // RUNNING sum must not silently wrap under non-ANSI LongType
        // addition at 100 TB — same posture as agg_regr_moments. Hash
        // parity on the final CAST(sx AS DOUBLE) is guaranteed only while
        // the sums stay ≤ 2^64: up to there both engines produce the
        // correctly-rounded double of an exact integer, but DuckDB's
        // HUGEINT→DOUBLE composes upper*2^64 + lower in double arithmetic
        // and can double-round beyond that, while Spark's Decimal→Double
        // is correctly rounded. (Σq^4 here is ~10^10 at sf0.1 and grows
        // linearly with rows — ~2×10^14 even at the 100 TB SF — so the
        // regime stays exact in practice.)
        val q = col("l_quantity").cast("long")
        def d38(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), d38(q).as("s1"), d38(q * q).as("s2"),
            d38(q * q * q).as("s3"), d38(q * q * q * q).as("s4"))
          .selectExpr(Seq("l_returnflag", "n") ++ skewKurtExprs: _*)
          .orderBy(col("l_returnflag"))
      },
      Some(s"""WITH base AS (
              |  SELECT l_returnflag, count(*) AS n,
              |         sum(CAST(l_quantity AS BIGINT)) AS s1,
              |         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
              |         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s3,
              |         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
              |  FROM lineitem GROUP BY l_returnflag)
              |SELECT l_returnflag, n, ${skewKurtExprs.mkString(", ")}
              |FROM base ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_regr_moments",
      // Least-squares regression (price-vs-quantity slope/intercept/r per
      // flag) from exact moment sums — the same cross-engine determinism
      // trick as agg_skew_kurt: per-row products in BIGINT (qty ≤ 50,
      // cents ≤ ~10^7 → every product < 2^63), summed exactly
      // (DECIMAL(38,0) here, HUGEINT in the oracle — Σcents² overflows
      // BIGINT at this row count), then one shared double formula. Still
      // one single-pass mergeable aggregate.
      (s, dir) => {
        val x = col("l_quantity").cast("long")
        val yc = floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
        def d38(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), d38(x).as("sx"), d38(yc).as("sy"),
            d38(x * x).as("sxx"), d38(x * yc).as("sxy"), d38(yc * yc).as("syy"))
          .selectExpr(Seq("l_returnflag", "n") ++ regrExprs: _*)
          .orderBy(col("l_returnflag"))
      },
      Some(s"""WITH base AS (
              |  SELECT l_returnflag, count(*) AS n,
              |         sum(CAST(l_quantity AS BIGINT)) AS sx,
              |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
              |         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
              |         sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sxy,
              |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS syy
              |  FROM lineitem GROUP BY l_returnflag)
              |SELECT l_returnflag, n, ${regrExprs.mkString(", ")}
              |FROM base ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_hll_partial_merge",
      // REAGGREGATABLE distinct sketches: per-(priority, status) PARTIAL
      // register tables union-merge up to priority — the pre-aggregated-
      // cube pattern that makes distinct counts roll up WITHOUT
      // rescanning raw data at 100 TB. Round-14 (verdict #2): the
      // sketch is the same portable deterministic HLL as agg_approx_hll
      // (m = 256, FM least-set-bit rho), so union = per-register MAX —
      // associative and LOSSLESS at equal m, which is why merging the
      // per-status partials gives byte-identical registers to sketching
      // each priority directly (OperatorSpec asserts that equality, and
      // keeps Spark's native hll_sketch_agg/hll_union_agg path inside
      // the same error band as the certified portable math). The DuckDB
      // oracle replays partial-then-merge exactly → hash-matched.
      // Scale: two map-side-combinable folds — (prio, status, register)
      // partials, then the O(groups·256) merge; raw rows shuffle once.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(hllSql(duck = false, "orders", "o_custkey",
          "o_orderpriority", "approx_customers",
          partial = Some("o_orderstatus")))
      },
      Some(hllSql(duck = true, "orders", "o_custkey",
        "o_orderpriority", "approx_customers",
        partial = Some("o_orderstatus")))
    ),
    Q(
      "agg_quantile_partial_merge",
      // REAGGREGATABLE quantile sketches (r14 verdict #1 — the last
      // missing 100 TB sketch capability): per-(priority, status)
      // deterministic level-sampler PARTIALS (the same hash-derandomized
      // 1/16 KLL bottom level as agg_approx_quantile) union-merge up to
      // priority WITHOUT rescanning raw data, then nearest-rank
      // quantiles of the merged sample — the quantile sibling of
      // agg_hll_partial_merge's register-max union. The merge is exact
      // by construction: the sample predicate is a pure row-hash, so
      // the union of per-cell samples IS the sample of the union
      // (OperatorSpec asserts merged ≡ direct-sampled equality, and
      // keeps Spark's native approx_percentile inside the same rank
      // band — certifying the production partial-merge path). All
      // sampled values are integer cents; the only float is the rank
      // pick on exactly-representable quarters → both engines replay
      // bit-for-bit. Scale: the partial store is O(n/16) rows persisted
      // ONCE per cube cell; every coarser rollup (status→priority→
      // grand total) reads partials only — the raw fact never rescans.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(quantilePartialMergeSql)
      },
      Some(quantilePartialMergeSql)
    ),
    Q(
      "agg_heavyhitter_partial_merge",
      // REAGGREGATABLE heavy hitters — the third mergeable-sketch family
      // alongside agg_hll_partial_merge (distinct) and
      // agg_quantile_partial_merge (quantiles), completing the rollup
      // triad a 100 TB cube maintains: per-(source, lang) cell keep the
      // EXACT top-16 tokens by count (the Misra-Gries/SpaceSaving summary
      // at k=16, twice the answer size as SpaceSaving sizing demands — within a cell counts are exact, truncation is the only
      // loss; tokens are the canonical Zipf-skewed hitter workload),
      // then merge up to source by summing surviving counts and
      // re-ranking to top-5. Merged counts are LOWER BOUNDS on true
      // counts (a token outside some cell's top-16 loses that cell's
      // contribution), with the SpaceSaving guarantee that any token
      // whose true per-source count exceeds every cell's 16th count
      // survives somewhere — OperatorSpec pins the lower-bound property
      // and a top-5 recall floor vs the exact global answer. Scale: the
      // partial store is O(cells·16) rows persisted once; the rollup
      // reads partials only — the corpus never rescans for a coarser
      // grouping, exactly how a per-shard token census rolls up to the
      // corpus vocabulary dashboard.
      (s, dir) => {
        val tok = Tables(s, dir, "documents")
          .select(col("source"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
        val cell = tok.groupBy(col("source"), col("lang"), col("tok"))
          .agg(count(lit(1)).as("n"))
        val partials = cell.withColumn("rk", row_number().over(
            Window.partitionBy(col("source"), col("lang"))
              .orderBy(col("n").desc, col("tok").asc)))
          .filter(col("rk") <= 16)
        val merged = partials.groupBy(col("source"), col("tok"))
          .agg(sum(col("n")).as("est_n"),
            count(lit(1)).as("n_cells_surviving"))
        merged.withColumn("rank", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("est_n").desc, col("tok").asc)).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank"), col("tok"),
            col("est_n").cast("long").as("est_n"),
            col("n_cells_surviving"))
          .orderBy(col("source"), col("rank"))
      },
      Some(heavyHitterMergeSql)
    ),
    Q(
      "agg_kmv_set_overlap",
      // KMV (k-minimum-values / theta) sketch SET OPERATIONS — the
      // capability HLL cannot provide: HLL registers union losslessly
      // but carry no intersection algebra, while a KMV signature (the k
      // smallest hash values of a set) supports union (k smallest of
      // the merged signatures), intersection (inclusion-exclusion on
      // the union sketch: |A∩B| ≈ ρ·|A∪B| with ρ = the fraction of the
      // union-KMV present in both sets), and difference — the audience-
      // overlap query ("how many customers are in segment A AND B")
      // that a 100 TB deployment answers from two 64-value signatures
      // instead of a distinct-join. The hash is the same portable
      // mod-prime scramble the fixture derivations use, so both engines
      // replay the sketch bit-for-bit; the estimators are pure integer
      // arithmetic ((k−1)·M DIV kth) → hash-matched. Sets smaller than
      // k degrade to exact counts by construction (the signature IS the
      // set) — and that holds for the INTERSECTION too (ADVICE r15):
      // the ρ scale factor is the union-signature SIZE least(k, |∪|),
      // not the fixed k, so a sub-k union emits the exact common count
      // instead of collapsing toward 0 under integer division.
      // OperatorSpec pins estimates against exact distinct counts
      // within KMV's 3σ rank band (rsd ≈ 1/√(k−2)).
      // Scale: each signature is a k-row ORDER BY h LIMIT k over the
      // set's distinct hashes — a map-side top-k (TakeOrderedAndProject)
      // per set, mergeable across partitions and up any hierarchy like
      // the HLL/quantile partial rows.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(kmvOverlapSql("DIV"))
      },
      Some(kmvOverlapSql("//"))
    ),
    Q(
      "agg_kmv_partial_merge",
      // REAGGREGATABLE KMV signatures (r15 verdict #4 — the fourth and
      // final mergeable-sketch family, joining HLL (:2188), quantiles
      // (:2214) and heavy hitters (:2239) in the rollup toolkit a
      // 100 TB cube maintains): each (priority, status) cell persists
      // its k=64 minimum-value signature ONCE; the rollup to priority
      // merges signatures by "k smallest of the union of partials" — a
      // pure projection over O(cells·k) rows, the raw fact never
      // rescans. The merge is LOSSLESS by construction: any hash in the
      // union's global bottom-64 is necessarily in its own cell's
      // bottom-64, so merged-min-64 ≡ the signature computed directly
      // on the union — OperatorSpec pins that equality column-for-
      // column, which is the associativity certificate that lets
      // signatures merge up ANY hierarchy (status→priority→grand
      // total) like the other three families. Estimator is the same
      // integer-exact (k−1)·M DIV kth as agg_kmv_set_overlap, with
      // sub-k merges emitting exact counts (the ADVICE r15 rule applied
      // from birth). Scale: each partial is a map-side top-k
      // (TakeOrderedAndProject) over its cell's distinct hashes; the
      // merge shuffles k-row signatures, never data.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(kmvPartialMergeSql("DIV"))
      },
      Some(kmvPartialMergeSql("//"))
    ),
    Q(
      "agg_kmv_set_difference",
      // KMV set DIFFERENCE (round-16, completing the signature algebra
      // agg_kmv_set_overlap opened): audience exclusion — "customers in
      // segment A but NOT in B" — is the other half of every overlap
      // question (suppression lists, churn = active∖retained, GDPR
      // delete-verification), and KMV answers it from the same two
      // 64-value signatures by inclusion-exclusion ON the union sketch:
      // among the union's bottom-least(k,|∪|) hashes, count those in A
      // but not B (and vice versa), scale by n_union_est over the
      // signature size — the ratio estimator ρ·|A∪B| with ρ = the
      // observed exclusive fraction. Same portable mod-prime hash, same
      // integer-exact arithmetic, same sub-k degradation to exact
      // counts (the ADVICE r15 scale rule from birth); OperatorSpec
      // pins the three-way identity a_only + b_only + common =
      // signature size, so the difference estimates and the overlap
      // row's intersection estimate decompose the same union mass.
      // Scale: identical to the overlap row — two map-side top-k
      // signatures plus O(k) integer arithmetic; the raw sets are
      // never joined.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(kmvDifferenceSql("DIV"))
      },
      Some(kmvDifferenceSql("//"))
    ),
    Q(
      "agg_weighted_median",
      // Exact WEIGHTED median (price cents weighted by quantity): sort by
      // value within group, running weight, first value whose cumulative
      // weight reaches half the total. All integer arithmetic; ties at the
      // crossing value are order-independent because only min(value) over
      // qualifying rows is emitted. One window pass + one aggregate — the
      // same shape at any scale.
      (s, dir) => {
        val cents = floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
        val qty = col("l_quantity").cast("long")
        val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("l_returnflag"))
        Tables(s, dir, "lineitem")
          .select(col("l_returnflag"), cents.as("cents"), qty.as("qty"))
          .withColumn("cumw", sum(col("qty")).over(wCum))
          .withColumn("tot", sum(col("qty")).over(wAll))
          .groupBy(col("l_returnflag"))
          .agg(
            min(when(col("cumw") * 2 >= col("tot"), col("cents")))
              .as("wmedian_cents"),
            max(col("tot")).as("total_weight"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH b AS (
             |  SELECT l_returnflag,
             |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             |         CAST(l_quantity AS BIGINT) AS qty
             |  FROM lineitem),
             |c AS (
             |  SELECT l_returnflag, cents, qty,
             |         sum(qty) OVER (PARTITION BY l_returnflag ORDER BY cents
             |                        ROWS UNBOUNDED PRECEDING) AS cumw,
             |         sum(qty) OVER (PARTITION BY l_returnflag) AS tot
             |  FROM b)
             |SELECT l_returnflag,
             |       CAST(min(CASE WHEN cumw * 2 >= tot THEN cents END) AS BIGINT) AS wmedian_cents,
             |       CAST(max(tot) AS BIGINT) AS total_weight
             |FROM c GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_bool_and_or",
      // bool_and/bool_or per group — predicate roll-ups that plan as plain
      // two-phase hash aggregates (map-side partial AND/OR, scale-safe).
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
            bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |       bool_and(o_totalprice > 1000) AS all_over_1k,
             |       bool_or(o_totalprice > 400000) AS any_over_400k,
             |       count(*) AS n
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)
    ),
    Q(
      "agg_rollup",
      (s, dir) => {
        val n = Tables(s, dir, "nation")
        val r = broadcast(Tables(s, dir, "region"))
        val c = Tables(s, dir, "customer")
        c.join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), util.r2(sum(col("c_acctbal"))).as("total_bal"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      Some(s"""SELECT r_name, n_name, count(*) AS n_cust,
              |       ${util.r2sql("sum(c_acctbal)")} AS total_bal
              |FROM customer
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP (r_name, n_name)
              |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
    ),
    Q(
      "agg_cube",
      (s, dir) => {
        Tables(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), util.r2(sum(col("o_totalprice"))).as("total_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
              |       ${util.r2sql("sum(o_totalprice)")} AS total_price
              |FROM orders
              |GROUP BY CUBE (o_orderstatus, o_orderpriority)
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    ),
    Q(
      "agg_grouping_sets",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
        s.sql(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
                 |FROM orders_gs
                 |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                 |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    ),
    Q(
      "agg_collect_sorted",
      // Ordered list per group, emitted as a CSV string so the hash compare
      // is list-representation-independent. Sort happens INSIDE the array
      // (sort_array), after a map-side collect_list — no global sort.
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            array_join(
              transform(sort_array(collect_list(col("o_orderkey"))), x => x.cast("string")),
              ",").as("order_keys"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey,
             |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
             |       count(*) AS n_orders
             |FROM orders GROUP BY o_custkey
             |ORDER BY o_custkey""".stripMargin)
    ),
    Q(
      "agg_minmax_by",
      // argmax/argmin — the CDC latest-row-per-key core (§2.10). The order
      // value is made unique (epoch-seconds × 1e7 + key) so max_by is
      // deterministic across engines.
      (s, dir) => {
        val ord = (unix_timestamp(col("o_orderdate")) * 10000000L + col("o_orderkey")).as("ord")
        Tables(s, dir, "orders")
          .withColumn("ord", ord)
          .groupBy(col("o_custkey"))
          .agg(
            max_by(col("o_orderkey"), col("ord")).as("latest_orderkey"),
            min_by(col("o_orderkey"), col("ord")).as("first_orderkey"),
            max(col("o_orderdate")).as("latest_date"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey,
             |       arg_max(o_orderkey, epoch(o_orderdate) * 10000000 + o_orderkey) AS latest_orderkey,
             |       arg_min(o_orderkey, epoch(o_orderdate) * 10000000 + o_orderkey) AS first_orderkey,
             |       max(o_orderdate) AS latest_date
             |FROM orders GROUP BY o_custkey
             |ORDER BY o_custkey""".stripMargin)
    ),
    Q(
      "agg_decimal_exact",
      // Currency-exact totals: decimal arithmetic is associative → identical
      // in any summation order, unlike double. The raw double is first pinned
      // to exact cents via util.r2 (floor(x*100+0.5)/100 — IEEE-exact ops,
      // identical both engines); a direct double→decimal cast is NOT portable
      // (Spark rounds the shortest decimal repr half-up, DuckDB rounds the
      // exact binary expansion — e.g. the double nearest 2.675 diverges).
      // The summation runs in DECIMAL(18,2) internally; the OUTPUT is integer
      // cents (BIGINT) because DECIMAL rendering differs between the two
      // engines' hashers even when values are identical.
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            (sum(util.r2(col("o_totalprice")).cast("decimal(18,2)")) * lit(100))
              .cast("long").as("total_cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus,
              |       CAST(sum(CAST(${util.r2sql("o_totalprice")} AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
              |FROM orders GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "agg_pivot",
      // Cross-tab: order counts per priority pivoted on status. Pivot
      // values are declared (not discovered) — at scale that skips the
      // extra distinct-scan pass.
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |       count(*) FILTER (o_orderstatus = 'F') AS n_f,
             |       count(*) FILTER (o_orderstatus = 'O') AS n_o,
             |       count(*) FILTER (o_orderstatus = 'P') AS n_p
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)
    ),
    Q(
      "agg_unpivot",
      // Melt wide → long (Spark 3.4 unpivot / SQL UNPIVOT): the inverse
      // reshaping, one narrow pass, no shuffle at all.
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_discount"), col("l_tax"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "measure", "value")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
      },
      Some("""SELECT l_orderkey, l_linenumber, measure, value FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
             |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin)
    ),
    Q(
      "agg_count_distinct_multi",
      // Multi-column exact distinct: count(DISTINCT a, b) — planned as an
      // Expand + two-phase aggregate, so the shuffle carries deduplicated
      // (group × key-pair) rows, not raw input. Both key columns are
      // non-null in the fixture (the engines disagree on null-tuple
      // semantics, so this operator pins the non-null contract).
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey"), col("o_orderdate")).as("n_cust_days"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |       count(DISTINCT (o_custkey, o_orderdate)) AS n_cust_days,
             |       count(*) AS n
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "agg_string_agg",
      // Ordered string aggregation (listagg WITHIN GROUP, new in Spark 4 /
      // string_agg in DuckDB): the deterministic ORDER BY inside the
      // aggregate is what makes concatenation reproducible under any
      // partitioning — unordered listagg would be a per-run lottery.
      (s, dir) => {
        Tables(s, dir, "nation")
          .select(col("n_regionkey"), col("n_name"))
          .groupBy(col("n_regionkey"))
          .agg(expr("listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)")
            .as("nations_csv"))
          .orderBy(col("n_regionkey"))
      },
      Some("""SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS nations_csv
             |FROM nation GROUP BY n_regionkey
             |ORDER BY n_regionkey""".stripMargin)
    ),
    Q(
      "agg_conditional_counts",
      // Conditional aggregation — count_if / filtered sums and means — the
      // one-pass profile query (vs one scan per predicate). All predicates
      // evaluate inside a single HashAggregate.
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("count_if(o_totalprice > 150000)").as("n_big"),
            expr("count_if(o_orderstatus = 'F')").as("n_finished"),
            sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0))
              .as("open_total_raw"),
            count(lit(1)).as("n"))
          .select(col("o_orderpriority"), col("n_big"), col("n_finished"),
            util.r2(col("open_total_raw")).as("open_total"), col("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority,
              |       count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
              |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
              |       ${util.r2sql("sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END)")} AS open_total,
              |       count(*) AS n
              |FROM orders GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)
    ),
    Q(
      "agg_mode",
      // Deterministic mode (most frequent value, ties → smallest value):
      // built-in `mode()` leaves tie order engine-defined, so the modal
      // value is derived from a count + ranked-window pass that pins the
      // tiebreak identically on both engines. Two shuffles (group count,
      // per-flag window) — both on already-reduced group cardinality.
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("n").desc, col("l_quantity").asc)
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n").as("n_mode"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, l_quantity AS mode_qty, n AS n_mode FROM (
             |  SELECT l_returnflag, l_quantity, count(*) AS n,
             |         row_number() OVER (PARTITION BY l_returnflag
             |                            ORDER BY count(*) DESC, l_quantity ASC) AS rn
             |  FROM lineitem GROUP BY 1, 2) t
             |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_histogram",
      // Fixed-width histogram: bucket index from pure integer arithmetic
      // (width_bucket is not portable — DuckDB lacks it), then one
      // group-count. The profiling primitive: at 100 TB the result is 12
      // rows regardless of input size, with map-side partial counts.
      (s, dir) => {
        val bucket = least(floor(col("o_totalprice") / 50000), lit(11.0)).cast("long")
        Tables(s, dir, "orders")
          .select(bucket.as("bucket"), col("o_totalprice"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            util.r2(min(col("o_totalprice"))).as("lo"),
            util.r2(max(col("o_totalprice"))).as("hi"))
          .orderBy(col("bucket"))
      },
      Some(s"""SELECT CAST(least(floor(o_totalprice / 50000), 11.0) AS BIGINT) AS bucket,
              |       count(*) AS n,
              |       ${util.r2sql("min(o_totalprice)")} AS lo,
              |       ${util.r2sql("max(o_totalprice)")} AS hi
              |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)
    ),
    Q(
      "sample_hash_deterministic",
      // Hash-based stratified sampling: membership decided by key
      // arithmetic (multiplicative hash mod 1000 vs a per-stratum
      // threshold), not an RNG — so the sample is reproducible across
      // engines, runs, and repartitioning, and the oracle can check it
      // exactly (unlike sample_stratified's engine-specific Bernoulli
      // draw). This is how a 100 TB pipeline pins train/val splits.
      (s, dir) => {
        val h = ((col("o_orderkey") % 1000003L) * 2654435761L) % 1000
        val thresh = when(col("o_orderstatus") === "F", 500)
          .when(col("o_orderstatus") === "O", 200)
          .otherwise(1000)
        Tables(s, dir, "orders")
          .filter(h < thresh)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE ((o_orderkey % 1000003) * 2654435761) % 1000 <
             |      CASE o_orderstatus WHEN 'F' THEN 500 WHEN 'O' THEN 200 ELSE 1000 END
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "sample_neyman_allocation",
      // Neyman-optimal stratified allocation (round-9): distribute a
      // fixed sample budget across strata proportionally to N_h·S_h
      // (stratum size × stratum std) — the design that minimizes the
      // estimator's variance, vs the naive proportional split the quota
      // sampler uses. Strata stds fold exact BIGINT cents moments from
      // ONE map-side aggregate; each allocation and its realized
      // multiplicative-hash sample count are computed with identical
      // formula text. O(strata) output at any scale; the realized pass
      // reuses the same single scan via a conditional sum (no second
      // job).
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .withColumn("h", ((col("event_id") % 1000003L) * 2654435761L) % 1000000L)
        val strata = ev
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("nh"), sum(col("cents")).as("sh"),
            sum(col("cents") * col("cents")).as("ssh"))
          .withColumn("std", expr(
            "sqrt(CAST(ssh AS DOUBLE) / CAST(nh AS DOUBLE) - (CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE)) * (CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE)))"))
        val tot = strata.agg(
          sum(expr("CAST(nh AS DOUBLE) * std")).as("wsum"))
        val alloc = strata.crossJoin(broadcast(tot))
          .withColumn("n_alloc", expr(
            "CAST(floor(1000 * CAST(nh AS DOUBLE) * std / wsum) AS BIGINT)"))
          // per-stratum hash threshold as ONE integer (n_alloc ≤ 1000,
          // so n_alloc·10⁶ never overflows regardless of stratum size) —
          // the per-row test is a plain BIGINT compare
          .withColumn("thresh", expr("(n_alloc * 1000000) div nh"))
        val sampled = ev
          .join(broadcast(alloc.select(col("event_type"), col("thresh"))),
            "event_type")
          .filter(col("h") < col("thresh"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_sampled"))
        alloc.join(sampled, Seq("event_type"), "left")
          .select(col("event_type"), col("nh"),
            expr("CAST(floor(std * 100 + 0.5) AS BIGINT)").as("std_cents"),
            col("n_alloc"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy(col("event_type"))
      },
      Some("""WITH rows_h AS (
             |  SELECT event_type,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             |         ((event_id % 1000003) * 2654435761) % 1000000 AS h
             |  FROM events),
             |strata AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
             |         CAST(sum(cents) AS BIGINT) AS sh,
             |         CAST(sum(cents * cents) AS BIGINT) AS ssh
             |  FROM rows_h GROUP BY event_type),
             |stds AS (
             |  SELECT event_type, nh,
             |         sqrt(CAST(ssh AS DOUBLE) / CAST(nh AS DOUBLE)
             |              - (CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE))
             |                * (CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE))) AS std
             |  FROM strata),
             |tot AS (SELECT sum(CAST(nh AS DOUBLE) * std) AS wsum FROM stds),
             |alloc AS (
             |  SELECT event_type, nh, std,
             |         CAST(floor(1000 * CAST(nh AS DOUBLE) * std / wsum) AS BIGINT) AS n_alloc,
             |         CAST(floor(1000 * CAST(nh AS DOUBLE) * std / wsum) AS BIGINT) * 1000000 // nh AS thresh
             |  FROM stds CROSS JOIN tot),
             |sampled AS (
             |  SELECT r.event_type, CAST(count(*) AS BIGINT) AS n_sampled
             |  FROM rows_h r JOIN alloc a ON r.event_type = a.event_type
             |  WHERE r.h < a.thresh
             |  GROUP BY r.event_type)
             |SELECT a.event_type, a.nh,
             |       CAST(floor(a.std * 100 + 0.5) AS BIGINT) AS std_cents,
             |       a.n_alloc,
             |       coalesce(s.n_sampled, 0) AS n_sampled
             |FROM alloc a LEFT JOIN sampled s ON a.event_type = s.event_type
             |ORDER BY a.event_type""".stripMargin)
    ),
    Q(
      "sample_quality_weighted",
      // Quality-weighted deterministic downsampling (round-9): keep
      // probability scales with a quality proxy (chars/400, capped at 1)
      // and membership is the SAME multiplicative-hash draw as
      // sample_hash_deterministic — so high-quality docs survive at
      // higher rates, the draw is reproducible across engines/runs/
      // repartitioning, and NO RNG exists anywhere (the DataComp-style
      // "sample by quality score" pass, pinned for a 100 TB corpus).
      // Per-language census keeps output O(langs).
      (s, dir) => {
        val t = expr("least(CAST(1000 AS BIGINT), n_chars * 1000 DIV 400)")
        val h = ((col("doc_id") % 1000003L) * 2654435761L) % 1000L
        Tables(s, dir, "documents")
          .withColumn("kept", (h < t).cast("long"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
            sum(col("n_chars") * col("kept")).as("kept_chars"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000
             |                          < least(1000, n_chars * 1000 // 400)
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |       CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000
             |                          < least(1000, n_chars * 1000 // 400)
             |                     THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    ),
    Q(
      "stat_mde_power",
      // Minimal detectable effect per event type (round-9): given the
      // observed conversion rate (value > 50) and sample size, the
      // smallest absolute rate change a standard two-sided α=.05 / 80%-
      // power A/B test could detect — MDE = (z_α/2 + z_β)·√(2p(1−p)/n).
      // The experimentation-platform sizing primitive; z constants are
      // shared literals, p and n exact counts, one e6 pin. O(types) out.
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") > 50, 1L).otherwise(0L)).as("conv"))
          .select(col("event_type"), col("n"), col("conv"), expr(
            """CAST(floor((1.959964 + 0.841621)
              |  * sqrt(2 * (CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
              |         * (1 - CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
              |         / CAST(n AS DOUBLE))
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("mde_e6"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS conv,
             |       CAST(floor((1.959964 + 0.841621)
             |         * sqrt(2 * (CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS DOUBLE)
             |                     / CAST(count(*) AS DOUBLE))
             |                * (1 - CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS DOUBLE)
             |                       / CAST(count(*) AS DOUBLE))
             |                / CAST(count(*) AS DOUBLE))
             |         * 1000000 + 0.5) AS BIGINT) AS mde_e6
             |FROM events WHERE value IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    // NOTE: a Bernoulli `stat.sampleBy` variant ("sample_stratified") was
    // retired in round 3: its engine-specific RNG made it permanently
    // un-oracled, and `sample_hash_deterministic` above is the canonical —
    // and reproducible — train/val sampling pin (still spec-tested in
    // OperatorSpec for rate bounds and seed determinism).
    Q(
      "sample_reservoir_topk",
      // Distributed reservoir sampling, derandomized: priority = a
      // multiplicative hash of the key, sample = the k smallest
      // priorities. Identical in distribution to a classic reservoir
      // (each key's priority is an iid-looking draw) but reproducible
      // across engines, runs, and repartitioning. The plan is
      // TakeOrderedAndProject — per-partition top-k heaps + one driver
      // merge of k·partitions rows, never a global sort: the exact
      // distributed analogue of merging per-worker reservoirs, and the
      // shape that holds at 100 TB (k rows per partition move, not the
      // table).
      (s, dir) => {
        Tables(s, dir, "orders")
          .withColumn("pri", ((col("o_orderkey") % 1000003L) * 2654435761L + 40503L) % 1000003L)
          .select(col("o_orderkey"), col("pri"), col("o_totalprice"))
          .orderBy(col("pri"), col("o_orderkey"))
          .limit(500)
      },
      Some("""SELECT o_orderkey,
             |       ((o_orderkey % 1000003) * 2654435761 + 40503) % 1000003 AS pri,
             |       o_totalprice
             |FROM orders ORDER BY pri, o_orderkey LIMIT 500""".stripMargin)
    ),
    Q(
      "sample_stratified_quota",
      // Exact per-stratum quotas (100 rows per order priority class) via
      // rank over the same derandomized priority — the allocation shape
      // for a class-balanced eval set. One shuffle on the stratum key,
      // then per-partition rank + filter: at scale each stratum's quota
      // selection is a bounded top-k inside its partitions, and the
      // output is O(strata · quota) regardless of table size.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("pri"), col("o_orderkey"))
        Tables(s, dir, "orders")
          .withColumn("pri", ((col("o_orderkey") % 1000003L) * 2654435761L + 40503L) % 1000003L)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 100)
          .select(col("o_orderpriority"), col("rn").cast("long").as("rn"),
            col("o_orderkey"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey
             |FROM (SELECT o_orderpriority, o_orderkey,
             |             row_number() OVER (PARTITION BY o_orderpriority
             |               ORDER BY ((o_orderkey % 1000003) * 2654435761 + 40503) % 1000003,
             |                        o_orderkey) AS rn
             |      FROM orders) t
             |WHERE rn <= 100
             |ORDER BY o_orderpriority, rn""".stripMargin)
    ),
    Q(
      "sample_weighted_priority",
      // Priority sampling (Duffield–Lund–Thorup): weight-proportional
      // sampling without replacement by taking the top-k of w/u, u a
      // uniform draw — here u = (hash+1)/1000004, so every arithmetic
      // step (int hash, int→double conversion, one divide, one divide)
      // is IEEE-exact and the DuckDB oracle replays the SELECTION, not
      // just the aggregate. Same TakeOrderedAndProject scale shape as
      // sample_reservoir_topk; this is how a training mix oversamples
      // high-value documents reproducibly.
      (s, dir) => {
        val h = ((col("o_orderkey") % 1000003L) * 2654435761L + 40503L) % 1000003L
        Tables(s, dir, "orders")
          .withColumn("qpri",
            col("o_totalprice") / ((h + 1L).cast("double") / lit(1000004.0d)))
          .select(col("o_orderkey"), util.r2(col("qpri")).as("qpri_r2"),
            col("o_totalprice"), col("qpri"))
          .orderBy(col("qpri").desc, col("o_orderkey"))
          .limit(200)
          .select(col("o_orderkey"), col("qpri_r2"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, floor(qpri * 100 + 0.5) / 100 AS qpri_r2, o_totalprice
             |FROM (SELECT o_orderkey, o_totalprice,
             |             o_totalprice / (CAST(((o_orderkey % 1000003) * 2654435761 + 40503) % 1000003 + 1 AS DOUBLE)
             |                             / CAST(1000004 AS DOUBLE)) AS qpri
             |      FROM orders) t
             |ORDER BY qpri DESC, o_orderkey LIMIT 200""".stripMargin)
    ),
    Q(
      "sample_systematic_every_k",
      // Systematic (every-k-th) sampling over the key order (round-9) —
      // the audit-sampling design (uniform coverage of the keyspace, no
      // clustering risk) regulators and QA checklists specify. Built on
      // the same single-partition-free global sequence as
      // sort_global_sequence: range-partitioned sort + zipWithIndex,
      // then pure index arithmetic picks every 25th row — no RNG, so
      // the sample is reproducible across engines and repartitioning.
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        Tables(s, dir, "orders")
          .select(col("o_orderkey"))
          .orderBy(col("o_orderkey"))
          .rdd.zipWithIndex
          .collect { case (r, i) if (i + 1) % 25 == 13 => (r.getLong(0), i + 1) }
          .toDF("o_orderkey", "seq")
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, seq FROM (
             |  SELECT o_orderkey,
             |         row_number() OVER (ORDER BY o_orderkey) AS seq
             |  FROM orders) t
             |WHERE seq % 25 = 13
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "typed_dataset_agg",
      // The typed Dataset surface: case-class rows, groupByKey, a typed
      // Aggregator — compile-time field checks with the same partial-agg
      // physical plan as the untyped API.
      (s, dir) => {
        import s.implicits._
        val ds = Tables(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .as[graft.functions.LineRev]
        ds.groupByKey(_.l_returnflag)
          .agg(graft.functions.RevenueStats.toColumn)
          .map { case (flag, b) => (flag, b.n, b.qty, b.revenue) }
          .toDF("l_returnflag", "n_rows", "sum_qty", "revenue")
          .withColumn("revenue", util.r2(col("revenue")))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, count(*) AS n_rows,
              |       sum(l_quantity) AS sum_qty,
              |       ${util.r2sql("sum(l_extendedprice * (1 - l_discount))")} AS revenue
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "udaf_weighted_avg",
      (s, dir) => {
        val wavg = udaf(graft.functions.WeightedAvg)
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(util.r2(wavg(col("l_extendedprice"), col("l_quantity"))).as("wavg_price"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag,
              |       ${util.r2sql("sum(l_extendedprice * l_quantity) / sum(l_quantity)")} AS wavg_price
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "agg_bitmap_distinct",
      // EXACT distinct counting via bucketed bitmaps — the ClickHouse/
      // Doris/Druid pattern for 100 TB COUNT(DISTINCT): bucket the id
      // space (bitmap_bucket_number), build one fixed-size bitmap per
      // (group, bucket) in PARTIAL aggregation (bitmap_construct_agg), then
      // count bits and sum per group. The shuffle carries 4 KB bitmap
      // blobs, not raw ids — state is O(groups x buckets), independent of
      // row count, and unlike HLL the answer is exact. Oracle: plain
      // COUNT(DISTINCT) — same numbers, different physics.
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("bitmap_bucket_number(user_id)").as("bkt"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
          .groupBy(col("event_type"))
          .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    Q(
      "agg_grouping_id",
      // grouping_id(): the bitmask that tells a NULL subtotal row apart
      // from a NULL data value — without it, rollup output over nullable
      // dimensions is ambiguous and downstream consumers mis-bucket the
      // grand total. Same two-phase aggregate as agg_rollup; the id is
      // computed from the grouping-set shape, not the data.
      (s, dir) => {
        Tables(s, dir, "orders")
          .rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            grouping_id().cast("long").as("gid"))
          .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))
      },
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
             |       CAST(grouping(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
             |FROM orders
             |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
             |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
    ),
    Q(
      "dq_anomaly_iqr",
      // Tukey-fence outlier screening per group — the post-sync anomaly
      // check run before a corpus ships. Quartiles are interpolated on
      // BIGINT cents, so every q1/q3 is an exact multiple of 0.25 and the
      // 1.5·IQR fences are exact multiples of 0.125 — the outlier
      // CLASSIFICATION (a strict threshold compare) cannot flip on a ulp
      // between engines. One pass for quartiles (percentile is a single
      // mergeable aggregate), one to classify — both two-phase.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        val fences = ev.groupBy(col("event_type"))
          .agg(expr("percentile(cents, array(0.25, 0.75))").as("qs"))
          .select(col("event_type"),
            element_at(col("qs"), 1).as("q1"),
            element_at(col("qs"), 2).as("q3"))
          .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
          .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
        ev.join(broadcast(fences), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            count(when(col("cents") < col("lo") || col("cents") > col("hi"), 1))
              .as("n_outliers"),
            first(col("q1")).as("q1"), first(col("q3")).as("q3"))
          .orderBy(col("event_type"))
      },
      Some("""WITH c AS (
             |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |f AS (
             |  SELECT event_type,
             |         quantile_cont(cents, 0.25) AS q1,
             |         quantile_cont(cents, 0.75) AS q3
             |  FROM c GROUP BY event_type)
             |SELECT c.event_type, count(*) AS n_rows,
             |       count(*) FILTER (WHERE cents < q1 - (q3 - q1) * 1.5
             |                           OR cents > q3 + (q3 - q1) * 1.5) AS n_outliers,
             |       any_value(q1) AS q1, any_value(q3) AS q3
             |FROM c JOIN f USING (event_type)
             |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin)
    ),
    Q(
      "sample_group_holdout",
      // GROUP-aware train/holdout split (round-9): the split key is the
      // SOURCE, not the document, so every doc from one source lands in
      // the same side — the leakage-free split a dedup-aware training
      // pipeline needs (near-duplicates cluster within a source; a
      // row-level split would leak them across the boundary). The hash is
      // the house bounded-residue multiplicative chain (ScaleStress-safe:
      // residue BEFORE the multiply), no RNG, reproducible on any engine
      // and any partitioning. Identical SQL text runs on both engines.
      (s, dir) => graft.Catalog.sql(s, dir,
        """WITH tagged AS (
          |  SELECT doc_id, n_chars, source,
          |         CASE WHEN ((CAST(substring(source, 4, 8) AS BIGINT) % 1000003)
          |                    * 2654435761) % 1000000007 % 10 < 8
          |              THEN 'train' ELSE 'holdout' END AS split
          |  FROM documents)
          |SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(n_chars) AS BIGINT) AS total_chars
          |FROM tagged GROUP BY split ORDER BY split""".stripMargin),
      Some(
        """WITH tagged AS (
          |  SELECT doc_id, n_chars, source,
          |         CASE WHEN ((CAST(substring(source, 4, 8) AS BIGINT) % 1000003)
          |                    * 2654435761) % 1000000007 % 10 < 8
          |              THEN 'train' ELSE 'holdout' END AS split
          |  FROM documents)
          |SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(n_chars) AS BIGINT) AS total_chars
          |FROM tagged GROUP BY split ORDER BY split""".stripMargin)
    ),
    Q(
      "agg_gini_concentration",
      // Gini coefficient of customer revenue per nation (round-9): the
      // standard inequality audit over a grouped measure — how concentrated
      // is spend among a nation's customers. Uses the rank formula
      // G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted exact cents:
      // every sum is BIGINT (order-free), the single double division is
      // pinned to e6, and the rank window ties break on custkey. Scale: one
      // shuffle to (nation, cust) partials, one window shuffle on nation
      // (each nation's customer list sorts within its partition), then an
      // O(nations) final — the raw orders table is aggregated before any
      // window sees it.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val custRev = Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"), col("c_custkey"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
        val ranked = custRev.withColumn("rn", row_number().over(
          Window.partitionBy(col("c_nationkey"))
            .orderBy(col("cents"), col("c_custkey"))))
        ranked.groupBy(col("c_nationkey").cast("long").as("nation"))
          .agg(
            expr("CAST(count(*) AS BIGINT)").as("n_cust"),
            expr("CAST(sum(cents) AS BIGINT)").as("total_cents"),
            expr("CAST(sum(rn * cents) AS BIGINT)").as("rc"))
          .select(col("nation"), col("n_cust"), col("total_cents"),
            expr("""CAST(floor((CAST(2 AS DOUBLE) * CAST(rc AS DOUBLE)
                    / (CAST(n_cust AS DOUBLE) * CAST(total_cents AS DOUBLE))
                    - (CAST(n_cust AS DOUBLE) + 1) / CAST(n_cust AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT)""").as("gini_e6"))
          .orderBy(col("nation"))
      },
      Some("""WITH cust_rev AS (
             |  SELECT c_nationkey, c_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |  FROM customer JOIN orders ON o_custkey = c_custkey
             |  GROUP BY c_nationkey, c_custkey),
             |ranked AS (
             |  SELECT c_nationkey, cents,
             |         row_number() OVER (PARTITION BY c_nationkey
             |                            ORDER BY cents, c_custkey) AS rn
             |  FROM cust_rev)
             |SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |       CAST(count(*) AS BIGINT) AS n_cust,
             |       CAST(sum(cents) AS BIGINT) AS total_cents,
             |       CAST(floor((CAST(2 AS DOUBLE) * CAST(sum(rn * cents) AS DOUBLE)
             |            / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
             |            - (CAST(count(*) AS DOUBLE) + 1) / CAST(count(*) AS DOUBLE))
             |            * 1000000 + 0.5) AS BIGINT) AS gini_e6
             |FROM ranked GROUP BY c_nationkey ORDER BY nation""".stripMargin)
    ),
    Q(
      "stat_g_test",
      // G-test of independence (round-13): the likelihood-ratio sibling of
      // stat_chi_square — G = 2·Σ O·ln(O·N/(R·C)) is additive across
      // partitions of the table (chi-square is not), which is why corpus
      // pipelines prefer it for drilling a significant omnibus result into
      // sub-tables. Contingency: order priority × order status (a DIFFERENT
      // table than chi_square's event mix, so the two tests cover two
      // fixtures). Same determinism discipline as chi_square: observed
      // counts and marginals are exact BIGINT from one two-phase aggregate,
      // each cell term is pinned to 1e-6 integer units BEFORE the final
      // sum, so the statistic is bitwise cross-engine (ln's libm drift
      // hides under the e6 floor — tfidf precedent). Zero cells contribute
      // 0 by the 0·ln(0)=0 convention and never materialize (groupBy emits
      // only observed cells). The table is O(priorities × statuses) —
      // driver-sized at any scale; the only shuffle is the cell aggregate.
      (s, dir) => {
        val cells = Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pri"),
            col("o_orderstatus").as("st"))
          .agg(count(lit(1)).as("obs"))
        val m = cells
          .withColumn("row_tot", sum(col("obs")).over(
            Window.partitionBy(col("pri"))))
          .withColumn("col_tot", sum(col("obs")).over(
            Window.partitionBy(col("st"))))
          .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
          .withColumn("term_e6",
            expr("""CAST(floor(2 * CAST(obs AS DOUBLE)
                    * ln(CAST(obs AS DOUBLE) * CAST(n AS DOUBLE)
                         / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT)"""))
        m.agg(count(lit(1)).as("n_cells"),
            max(col("n")).as("n_obs"),
            sum(col("term_e6")).as("g_e6"))
          .select(col("n_cells"), col("n_obs"), col("g_e6"))
      },
      Some("""WITH cells AS (
             |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
             |         CAST(count(*) AS BIGINT) AS obs
             |  FROM orders GROUP BY 1, 2),
             |m AS (
             |  SELECT obs,
             |         CAST(sum(obs) OVER (PARTITION BY pri) AS BIGINT) AS row_tot,
             |         CAST(sum(obs) OVER (PARTITION BY st) AS BIGINT) AS col_tot,
             |         CAST(sum(obs) OVER () AS BIGINT) AS n
             |  FROM cells),
             |t AS (
             |  SELECT n,
             |         CAST(floor(2 * CAST(obs AS DOUBLE)
             |              * ln(CAST(obs AS DOUBLE) * CAST(n AS DOUBLE)
             |                   / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)))
             |              * 1000000 + 0.5) AS BIGINT) AS term_e6
             |  FROM m)
             |SELECT CAST(count(*) AS BIGINT) AS n_cells,
             |       CAST(max(n) AS BIGINT) AS n_obs,
             |       CAST(sum(term_e6) AS BIGINT) AS g_e6
             |FROM t""".stripMargin)
    ),
    Q(
      "stat_tost_equivalence",
      // TOST equivalence test (round-13): the INVERTED question every
      // migration/refactor A/B asks — not "did the metric move" (Welch,
      // already covered) but "can we PROVE it moved less than δ". Two
      // one-sided Welch z's against a ±500-cent margin on order totals
      // under the engine's deterministic multiplicative hash split (same
      // family as stat_srm_check, so the oracle replays the assignment
      // exactly). Sums and squared sums accumulate in DECIMAL(38,0) /
      // HUGEINT (cents² × row counts exceeds BIGINT at sf ≥ 0.1), the two
      // z's are each ONE fixed-order double expression r2-pinned, and the
      // equivalence flag compares the PINNED values (quantized to
      // hundredths, so the boundary cannot flip on an ulp cross-engine).
      // Scale: one conditional-moment aggregate — map-side combinable,
      // shuffle carries two arm rows, never orders.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(
            (((col("o_orderkey") % 1000003L) * 2654435761L) % 2L).as("arm"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
        val g = o.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents").cast("decimal(38,0)")).as("s"),
            sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("q"))
        val a = g.filter(col("arm") === 0)
          .select(col("n").as("n1"), col("s").as("s1"), col("q").as("q1"))
        val b = g.filter(col("arm") === 1)
          .select(col("n").as("n2"), col("s").as("s2"), col("q").as("q2"))
        val j = a.crossJoin(b)
          .withColumn("m1", col("s1").cast("double") / col("n1"))
          .withColumn("m2", col("s2").cast("double") / col("n2"))
          .withColumn("v1",
            (col("q1").cast("double") - col("s1").cast("double") *
              col("s1").cast("double") / col("n1")) / (col("n1") - 1))
          .withColumn("v2",
            (col("q2").cast("double") - col("s2").cast("double") *
              col("s2").cast("double") / col("n2")) / (col("n2") - 1))
          .withColumn("se",
            sqrt(col("v1") / col("n1") + col("v2") / col("n2")))
          .withColumn("z_low", util.r2((col("m1") - col("m2") + lit(500.0)) / col("se")))
          .withColumn("z_up", util.r2((col("m1") - col("m2") - lit(500.0)) / col("se")))
        j.select(col("n1"), col("n2"),
          util.r2(col("m1") - col("m2")).as("diff_cents"),
          col("z_low"), col("z_up"),
          (col("z_low") >= 1.65 && col("z_up") <= -1.65).as("equivalent"))
      },
      Some(s"""WITH x AS (
              |  SELECT ((o_orderkey % 1000003) * 2654435761) % 2 AS arm,
              |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              |  FROM orders),
              |g AS (
              |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
              |         CAST(sum(cents) AS HUGEINT) AS s,
              |         CAST(sum(cents * cents) AS HUGEINT) AS q
              |  FROM x GROUP BY arm),
              |j AS (
              |  SELECT a.n AS n1, b.n AS n2,
              |         CAST(a.s AS DOUBLE) / a.n AS m1,
              |         CAST(b.s AS DOUBLE) / b.n AS m2,
              |         (CAST(a.q AS DOUBLE) - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE) / a.n) / (a.n - 1) AS v1,
              |         (CAST(b.q AS DOUBLE) - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE) / b.n) / (b.n - 1) AS v2
              |  FROM g a, g b WHERE a.arm = 0 AND b.arm = 1),
              |z AS (
              |  SELECT n1, n2, m1, m2,
              |         ${util.r2sql("(m1 - m2 + 500.0) / sqrt(v1 / n1 + v2 / n2)")} AS z_low,
              |         ${util.r2sql("(m1 - m2 - 500.0) / sqrt(v1 / n1 + v2 / n2)")} AS z_up
              |  FROM j)
              |SELECT n1, n2, ${util.r2sql("m1 - m2")} AS diff_cents,
              |       z_low, z_up,
              |       z_low >= 1.65 AND z_up <= -1.65 AS equivalent
              |FROM z""".stripMargin)
    ),
    Q(
      "stat_cochran_q",
      // Cochran's Q (round-13): the k-treatment generalization of McNemar
      // — did the RATE of a binary outcome change across three periods for
      // the SAME subjects? Subjects are customers, treatments the years
      // 1995-1997, outcome "placed ≥1 URGENT order that year". Q =
      // (k−1)·(k·ΣCⱼ² − T²) / (k·T − ΣRᵢ²) is exact BIGINT to the last
      // division (counts only), pinned e6. All-zero and all-one subjects
      // contribute nothing to either side of the ratio (standard), so
      // including every active customer changes no bits. Scale: one
      // conditional aggregate to per-(customer, year) flags, one pivot to
      // subject rows, two tiny moment sums — shuffle carries customers.
      (s, dir) => {
        val f = Tables(s, dir, "orders")
          .filter(year(col("o_orderdate")).isin(1995, 1996, 1997))
          .groupBy(col("o_custkey"))
          .agg(
            max(when(year(col("o_orderdate")) === 1995 &&
              col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("y95"),
            max(when(year(col("o_orderdate")) === 1996 &&
              col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("y96"),
            max(when(year(col("o_orderdate")) === 1997 &&
              col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("y97"))
        val m = f.agg(
          count(lit(1)).as("n_subjects"),
          sum(col("y95")).as("c1"), sum(col("y96")).as("c2"),
          sum(col("y97")).as("c3"),
          sum((col("y95") + col("y96") + col("y97")) *
            (col("y95") + col("y96") + col("y97"))).as("r2sum"))
        m.select(col("n_subjects"), col("c1"), col("c2"), col("c3"),
          expr("""CAST(floor(2.0 * (3 * (c1*c1 + c2*c2 + c3*c3)
                  - (c1+c2+c3) * (c1+c2+c3))
                  / (3 * (c1+c2+c3) - r2sum) * 1000000 + 0.5) AS BIGINT)""")
            .as("q_e6"))
      },
      Some("""WITH f AS (
             |  SELECT o_custkey,
             |         max(CASE WHEN year(o_orderdate) = 1995 AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y95,
             |         max(CASE WHEN year(o_orderdate) = 1996 AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y96,
             |         max(CASE WHEN year(o_orderdate) = 1997 AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y97
             |  FROM orders WHERE year(o_orderdate) IN (1995, 1996, 1997)
             |  GROUP BY o_custkey),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_subjects,
             |         CAST(sum(y95) AS BIGINT) AS c1,
             |         CAST(sum(y96) AS BIGINT) AS c2,
             |         CAST(sum(y97) AS BIGINT) AS c3,
             |         CAST(sum((y95 + y96 + y97) * (y95 + y96 + y97)) AS BIGINT) AS r2sum
             |  FROM f)
             |SELECT n_subjects, c1, c2, c3,
             |       CAST(floor(2.0 * (3 * (c1*c1 + c2*c2 + c3*c3)
             |            - (c1+c2+c3) * (c1+c2+c3))
             |            / (3 * (c1+c2+c3) - r2sum) * 1000000 + 0.5) AS BIGINT) AS q_e6
             |FROM m""".stripMargin)
    ),
    Q(
      "stat_odds_ratio_ci",
      // Odds ratio with Woolf's log-normal CI (round-13): THE 2×2 effect
      // size — χ²/G say "associated", the OR says "how strongly", and
      // the CI says whether 1.0 is excluded. Exposure is the engine's
      // deterministic hash arm (stat_srm_check's family, oracle-
      // replayable), outcome is URGENT priority; the four cells are one
      // conditional-count aggregate (map-side combinable, shuffle
      // carries 4 counts). ln(ad/bc) ± 1.96·√(1/a+1/b+1/c+1/d) is a
      // fixed-order double expression per bound, each exp'd and
      // r2-pinned — the tfidf precedent: libm drift hides under r2. The
      // "CI excludes 1" flag compares the PINNED bounds, so the verdict
      // cannot flip on an ulp.
      (s, dir) => {
        val o = Tables(s, dir, "orders").select(
          (((col("o_orderkey") % 1000003L) * 2654435761L) % 2L).as("arm"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"))
        val cells = o.agg(
          sum(when(col("arm") === 0 && col("y") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("arm") === 0 && col("y") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("arm") === 1 && col("y") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("arm") === 1 && col("y") === 0, 1L).otherwise(0L)).as("d"))
        cells.select(col("a"), col("b"), col("c"), col("d"),
            util.r2(col("a").cast("double") * col("d") /
              (col("b").cast("double") * col("c"))).as("odds_ratio"),
            util.r2(exp(log(col("a").cast("double") * col("d") /
                (col("b").cast("double") * col("c"))) -
              lit(1.96) * sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
                lit(1.0) / col("c") + lit(1.0) / col("d")))).as("ci_lo"),
            util.r2(exp(log(col("a").cast("double") * col("d") /
                (col("b").cast("double") * col("c"))) +
              lit(1.96) * sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
                lit(1.0) / col("c") + lit(1.0) / col("d")))).as("ci_hi"))
          .withColumn("excludes_one",
            (col("ci_lo") > 1.0) || (col("ci_hi") < 1.0))
      },
      Some(s"""WITH x AS (
              |  SELECT ((o_orderkey % 1000003) * 2654435761) % 2 AS arm,
              |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
              |  FROM orders),
              |cells AS (
              |  SELECT CAST(sum(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
              |         CAST(sum(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
              |         CAST(sum(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
              |         CAST(sum(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
              |  FROM x),
              |r AS (
              |  SELECT a, b, c, d,
              |         ${util.r2sql("CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)")} AS odds_ratio,
              |         ${util.r2sql("exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)) - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))")} AS ci_lo,
              |         ${util.r2sql("exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)) + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))")} AS ci_hi
              |  FROM cells)
              |SELECT a, b, c, d, odds_ratio, ci_lo, ci_hi,
              |       ci_lo > 1.0 OR ci_hi < 1.0 AS excludes_one
              |FROM r""".stripMargin)
    ),
    Q(
      "stat_kruskal_wallis",
      // Kruskal–Wallis rank ANOVA (round-13): the nonparametric k-group
      // location test — "do the five order priorities have the same
      // total-spend distribution" without ANOVA's normality assumption
      // (order totals are heavy-tailed; stat_anova_oneway answers the
      // mean question, this answers the distribution one, and
      // stat_mann_whitney only covers k=2). Average tie ranks are kept
      // exact as DOUBLED integers (tr = 2·prior + count + 1), group rank
      // sums are BIGINT folds of per-VALUE counts, and H plus the
      // tie-corrected H/C divide once at the end under r2.
      // Scale: ranks are assigned per DISTINCT value (groupBy cents →
      // one window over the distinct-value spine, O(distinct) not
      // O(rows) state; at 100 TB the spine sort is a range-partitioned
      // global sort like any orderBy); the (grp, value) count table is
      // map-side combinable and the final fold is O(groups).
      (s, dir) => {
        val x = Tables(s, dir, "orders")
          .select(col("o_orderpriority").as("grp"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
        val perV = x.groupBy(col("v")).agg(count(lit(1)).as("cv"))
          .withColumn("prior",
            coalesce(sum(col("cv")).over(
              Window.orderBy(col("v"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("v"), col("cv"),
            (lit(2L) * col("prior") + col("cv") + 1L).as("tr"))
        val perGV = x.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cgv"))
        val g = perGV.join(perV, "v")
          .groupBy(col("grp"))
          .agg(sum(col("cgv")).as("ng"), sum(col("cgv") * col("tr")).as("s2"))
        val ties = perV.agg(
          sum(col("cv") * col("cv") * col("cv") - col("cv")).as("tie3"))
        g.crossJoin(ties)
          .agg(count(lit(1)).as("k"),
            sum(col("ng")).as("n"),
            sum(col("s2").cast("double") * col("s2").cast("double") /
              lit(4.0) / col("ng").cast("double")).as("rsq"),
            max(col("tie3")).as("tie3"))
          .select(col("k").as("n_groups"), col("n").as("n_total"),
            util.r2(lit(12.0) / (col("n").cast("double") * (col("n") + 1L)) *
              col("rsq") - lit(3.0) * (col("n").cast("double") + 1.0)).as("h"),
            util.r2((lit(12.0) / (col("n").cast("double") * (col("n") + 1L)) *
              col("rsq") - lit(3.0) * (col("n").cast("double") + 1.0)) /
              (lit(1.0) - col("tie3").cast("double") /
                (col("n").cast("double") * col("n") * col("n") - col("n"))))
              .as("h_tie_corrected"))
      },
      Some(s"""WITH x AS (
              |  SELECT o_orderpriority AS grp,
              |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
              |  FROM orders),
              |perv AS (
              |  SELECT v, CAST(count(*) AS BIGINT) AS cv,
              |         CAST(coalesce(sum(count(*)) OVER (ORDER BY v
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
              |  FROM x GROUP BY v),
              |trv AS (SELECT v, cv, 2 * prior + cv + 1 AS tr FROM perv),
              |pergv AS (
              |  SELECT grp, v, CAST(count(*) AS BIGINT) AS cgv
              |  FROM x GROUP BY grp, v),
              |g AS (
              |  SELECT grp, CAST(sum(cgv) AS BIGINT) AS ng,
              |         CAST(sum(cgv * tr) AS BIGINT) AS s2
              |  FROM pergv JOIN trv USING (v) GROUP BY grp),
              |t AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tie3 FROM perv),
              |f AS (
              |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
              |         sum(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / 4.0 / CAST(ng AS DOUBLE)) AS rsq,
              |         max(tie3) AS tie3
              |  FROM g CROSS JOIN t)
              |SELECT k AS n_groups, n AS n_total,
              |       ${util.r2sql("12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rsq - 3.0 * (CAST(n AS DOUBLE) + 1.0)")} AS h,
              |       ${util.r2sql("(12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rsq - 3.0 * (CAST(n AS DOUBLE) + 1.0)) / (1.0 - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))")} AS h_tie_corrected
              |FROM f""".stripMargin)
    ),
    Q(
      "stat_cohens_d",
      // Cohen's d / Hedges' g effect size (round-13): the number every
      // A/B significance test should ship WITH — "the difference is 3σ
      // significant" means nothing without "and it is 0.04 pooled-SDs
      // large". Urgent vs low-priority order totals; the two groups'
      // (n, Σx, Σx²) moments are exact BIGINT folds over HUNDRED-DOLLAR
      // units (ADVICE r13: dollars kept Σx² ~ 3·10⁷/row, overflowing
      // int64 near sf300–500; hundreds shrink the quadratic moment 10⁴×,
      // pushing headroom past sf 10⁵ — d is scale-free, so only the
      // quantization, not the unit, touches the value), pooled variance
      // and the small-sample Hedges correction 1 − 3/(4(n1+n2)−9) are
      // assembled from those six integers with e6-pinned outputs.
      // Scale: one conditional-moment aggregate, map-side combinable,
      // O(1) rows after the partial fold.
      (s, dir) => {
        Tables(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("g1"),
            floor(col("o_totalprice") / 100 + lit(0.5)).cast("long").as("x"))
          .agg(sum(col("g1")).as("n1"),
            sum(lit(1L) - col("g1")).as("n2"),
            sum(col("g1") * col("x")).as("s1"),
            sum((lit(1L) - col("g1")) * col("x")).as("s2"),
            sum(col("g1") * col("x") * col("x")).as("q1"),
            sum((lit(1L) - col("g1")) * col("x") * col("x")).as("q2"))
          .select(col("n1"), col("n2"),
            expr("""CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                   / sqrt(((q1 - CAST(s1 AS DOUBLE) * s1 / n1)
                           + (q2 - CAST(s2 AS DOUBLE) * s2 / n2)) / (n1 + n2 - 2))
                   * 1000000 + 0.5) AS BIGINT)""").as("cohens_d_e6"),
            expr("""CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                   / sqrt(((q1 - CAST(s1 AS DOUBLE) * s1 / n1)
                           + (q2 - CAST(s2 AS DOUBLE) * s2 / n2)) / (n1 + n2 - 2))
                   * (1.0 - CAST(3 AS DOUBLE) / (4 * (n1 + n2) - 9))
                   * 1000000 + 0.5) AS BIGINT)""").as("hedges_g_e6"))
      },
      Some("""WITH x AS (
             |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
             |         CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT) AS x
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |m AS (
             |  SELECT CAST(sum(g1) AS BIGINT) AS n1,
             |         CAST(sum(1 - g1) AS BIGINT) AS n2,
             |         CAST(sum(g1 * x) AS BIGINT) AS s1,
             |         CAST(sum((1 - g1) * x) AS BIGINT) AS s2,
             |         CAST(sum(g1 * x * x) AS BIGINT) AS q1,
             |         CAST(sum((1 - g1) * x * x) AS BIGINT) AS q2
             |  FROM x)
             |SELECT n1, n2,
             |       CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             |            / sqrt(((q1 - CAST(s1 AS DOUBLE) * s1 / n1)
             |                    + (q2 - CAST(s2 AS DOUBLE) * s2 / n2)) / (n1 + n2 - 2))
             |            * 1000000 + 0.5) AS BIGINT) AS cohens_d_e6,
             |       CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             |            / sqrt(((q1 - CAST(s1 AS DOUBLE) * s1 / n1)
             |                    + (q2 - CAST(s2 AS DOUBLE) * s2 / n2)) / (n1 + n2 - 2))
             |            * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
             |            * 1000000 + 0.5) AS BIGINT) AS hedges_g_e6
             |FROM m""".stripMargin)
    ),
    Q(
      "stat_theil_index",
      // Theil T inequality index (round-13): the entropy-based
      // concentration measure that DECOMPOSES — unlike Gini
      // (agg_gini_concentration) and HHI (win_hhi_concentration), Theil
      // splits exactly into within-group + between-group terms, so "is
      // spend inequality driven by market segments or within them" is
      // answerable from the same pass. T = (1/n)·Σ r·ln(r) with
      // r = x·n/S per customer; between-segment term from segment
      // shares. Per-row doubles from exact BIGINT (x, n, S) — identical
      // expression text both engines, libm drift hides under r2
      // (text_entropy_unigram precedent).
      // Scale: per-customer totals are one map-side-combinable group;
      // the index folds to O(1) and the decomposition to O(segments).
      (s, dir) => {
        val spend = Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_custkey"), col("c_mktsegment"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("x"))
        val tot = spend.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        val overall = spend.crossJoin(broadcast(tot))
          .select((col("x").cast("double") * col("n") / col("s")).as("r"),
            col("n"))
          .agg(max(col("n")).as("n"),
            sum(col("r") * log(col("r"))).as("tsum"))
          .select(lit("overall").as("component"),
            util.r2(col("tsum") / col("n").cast("double")).as("theil_t"))
        val between = spend.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
          .crossJoin(broadcast(tot))
          .select((col("sg").cast("double") / col("s")).as("share"),
            (col("sg").cast("double") * col("n") /
              (col("s").cast("double") * col("ng"))).as("rel"))
          .agg(sum(col("share") * log(col("rel"))).as("bt"))
          .select(lit("between_segments").as("component"),
            util.r2(col("bt")).as("theil_t"))
        overall.unionAll(between).orderBy(col("component"))
      },
      Some(s"""WITH spend AS (
              |  SELECT c_custkey, c_mktsegment,
              |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
              |  FROM customer JOIN orders ON c_custkey = o_custkey
              |  GROUP BY c_custkey, c_mktsegment),
              |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |               CAST(sum(x) AS BIGINT) AS s FROM spend),
              |overall AS (
              |  SELECT 'overall' AS component,
              |         ${util.r2sql("sum((CAST(x AS DOUBLE) * n / s) * ln(CAST(x AS DOUBLE) * n / s)) / max(CAST(n AS DOUBLE))")} AS theil_t
              |  FROM spend CROSS JOIN tot),
              |seg AS (
              |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS ng,
              |         CAST(sum(x) AS BIGINT) AS sg
              |  FROM spend GROUP BY c_mktsegment),
              |btw AS (
              |  SELECT 'between_segments' AS component,
              |         ${util.r2sql("sum((CAST(sg AS DOUBLE) / s) * ln(CAST(sg AS DOUBLE) * n / (CAST(s AS DOUBLE) * ng)))")} AS theil_t
              |  FROM seg CROSS JOIN tot)
              |SELECT * FROM overall UNION ALL SELECT * FROM btw
              |ORDER BY component""".stripMargin)
    ),
    Q(
      "stat_friedman_test",
      // Friedman test (round-13): the BLOCKED nonparametric k-treatment
      // test — months are blocks, order priorities are treatments, and
      // the question is "does any priority systematically lead within a
      // month" with month-to-month level shifts differenced out (the
      // repeated-measures design stat_kruskal_wallis can't express; the
      // k=2 special case is the sign test). Per-block treatment values
      // are exact cents totals; within-block average tie ranks are kept
      // exact as DOUBLED integers; the χ² statistic assembles from
      // BIGINT rank sums with one r2-pinned division.
      // Scale: the (block, treatment) matrix is one map-side rollup;
      // ranking windows partition BY BLOCK (k rows each — never a
      // global sort); the fold is O(treatments).
      (s, dir) => {
        val cell = Tables(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("blk"),
            col("o_orderpriority").as("trt"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("v"))
        // complete blocks only: a month missing a priority would skew
        // the rank sums (classic Friedman needs the full b x k design)
        val full = cell
          .withColumn("nb", count(lit(1)).over(
            Window.partitionBy(col("blk"))))
          .filter(col("nb") === 5L).drop("nb")
        val ranked = full
          .withColumn("r", rank().over(
            Window.partitionBy(col("blk")).orderBy(col("v"))))
          .withColumn("c", count(lit(1)).over(
            Window.partitionBy(col("blk"), col("v"))))
          .select(col("blk"), col("trt"),
            (lit(2L) * col("r") + col("c") - 1L).as("tr2"))
        val perTrt = ranked.groupBy(col("trt"))
          .agg(count(lit(1)).as("b"), sum(col("tr2")).as("r2sum"))
        perTrt.agg(count(lit(1)).as("k"), max(col("b")).as("b"),
            sum(col("r2sum").cast("double") * col("r2sum") / 4.0).as("rsq"))
          .select(col("k").as("n_treatments"), col("b").as("n_blocks"),
            util.r2(lit(12.0) /
              (col("b").cast("double") * col("k") * (col("k") + 1L)) *
              col("rsq") -
              lit(3.0) * col("b").cast("double") * (col("k") + 1L))
              .as("friedman_chi2"))
      },
      Some(s"""WITH cell AS (
              |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS blk,
              |         o_orderpriority AS trt,
              |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM orders GROUP BY 1, 2),
              |fullb AS (
              |  SELECT * FROM (
              |    SELECT blk, trt, v, count(*) OVER (PARTITION BY blk) AS nb
              |    FROM cell) t WHERE nb = 5),
              |ranked AS (
              |  SELECT blk, trt,
              |         2 * CAST(rank() OVER (PARTITION BY blk ORDER BY v) AS BIGINT)
              |         + CAST(count(*) OVER (PARTITION BY blk, v) AS BIGINT) - 1 AS tr2
              |  FROM fullb),
              |pert AS (
              |  SELECT trt, CAST(count(*) AS BIGINT) AS b,
              |         CAST(sum(tr2) AS BIGINT) AS r2sum
              |  FROM ranked GROUP BY trt),
              |f AS (
              |  SELECT CAST(count(*) AS BIGINT) AS k, max(b) AS b,
              |         sum(CAST(r2sum AS DOUBLE) * r2sum / 4.0) AS rsq
              |  FROM pert)
              |SELECT k AS n_treatments, b AS n_blocks,
              |       ${util.r2sql("12.0 / (CAST(b AS DOUBLE) * k * (k + 1)) * rsq - 3.0 * CAST(b AS DOUBLE) * (k + 1)")} AS friedman_chi2
              |FROM f""".stripMargin)
    ),
    Q(
      "stat_page_trend",
      // Page's L trend test (round-13): the ORDERED-alternative sibling
      // of stat_friedman_test — Friedman asks "any difference among
      // priorities", Page asks "do they trend in the hypothesized order
      // 1-URGENT < … < 5-LOW" with far more power when the order is
      // pre-specified. Same blocked-rank machinery (months × priorities,
      // doubled tie ranks); L = Σ_j j·R_j with the treatment index j
      // taken from the priority's natural order, z from the exact
      // closed-form moments E[L] = bk(k+1)²/4, Var[L] = b k²(k+1)²(k−1)
      // /144 — all BIGINT until the final e6 division.
      // Scale: identical to Friedman — O(blocks·k) matrix, block-local
      // rank windows, O(1) output.
      (s, dir) => {
        val cell = Tables(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("blk"),
            col("o_orderpriority").as("trt"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("v"))
        val full = cell
          .withColumn("nb", count(lit(1)).over(
            Window.partitionBy(col("blk"))))
          .filter(col("nb") === 5L).drop("nb")
        val ranked = full
          .withColumn("r", rank().over(
            Window.partitionBy(col("blk")).orderBy(col("v"))))
          .withColumn("c", count(lit(1)).over(
            Window.partitionBy(col("blk"), col("v"))))
          .select(col("blk"),
            substring(col("trt"), 1, 1).cast("long").as("j"),
            (lit(2L) * col("r") + col("c") - 1L).as("tr2"))
        ranked.agg(
            countDistinct(col("blk")).as("b"),
            countDistinct(col("j")).as("k"),
            sum(col("j") * col("tr2")).as("l2"))
          .select(col("b").as("n_blocks"), col("k").as("n_treatments"),
            expr("l2 DIV 2").as("page_l"),
            expr("""CAST(floor((CAST(l2 AS DOUBLE) / 2
                   - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1) / 4)
                   / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k + 1) * (k - 1) / 144)
                   * 1000000 + 0.5) AS BIGINT)""").as("z_e6"))
      },
      Some("""WITH cell AS (
             |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS blk,
             |         o_orderpriority AS trt,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
             |  FROM orders GROUP BY 1, 2),
             |fullb AS (
             |  SELECT * FROM (
             |    SELECT blk, trt, v, count(*) OVER (PARTITION BY blk) AS nb
             |    FROM cell) t WHERE nb = 5),
             |ranked AS (
             |  SELECT blk, CAST(substring(trt, 1, 1) AS BIGINT) AS j,
             |         2 * CAST(rank() OVER (PARTITION BY blk ORDER BY v) AS BIGINT)
             |         + CAST(count(*) OVER (PARTITION BY blk, v) AS BIGINT) - 1 AS tr2
             |  FROM fullb),
             |f AS (
             |  SELECT CAST(count(DISTINCT blk) AS BIGINT) AS b,
             |         CAST(count(DISTINCT j) AS BIGINT) AS k,
             |         CAST(sum(j * tr2) AS BIGINT) AS l2
             |  FROM ranked)
             |SELECT b AS n_blocks, k AS n_treatments, l2 // 2 AS page_l,
             |       CAST(floor((CAST(l2 AS DOUBLE) / 2
             |            - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1) / 4)
             |            / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k + 1) * (k - 1) / 144)
             |            * 1000000 + 0.5) AS BIGINT) AS z_e6
             |FROM f""".stripMargin)
    ),
    Q(
      "stat_dunn_posthoc",
      // Dunn's post-hoc test (round-13): WHICH groups differ once
      // stat_kruskal_wallis rejects — the rank-based pairwise z with the
      // shared tie correction, the multiple-comparison follow-up whose
      // p-values stat_fdr_bh then adjusts. Mean ranks come from the same
      // doubled-integer rank sums as KW (exact BIGINTs); the pooled
      // variance term N(N+1)/12 − Σ(t³−t)/(12(N−1)) is one double both
      // engines assemble from the same integers; one e6-pinned z per
      // pair, ordered pairs only (gi < gj lexicographically).
      // Scale: reuses the distinct-value rank spine (O(distinct) window
      // state); the pair expansion is k(k−1)/2 rows — O(1) at any data
      // size.
      (s, dir) => {
        val x = Tables(s, dir, "orders")
          .select(col("o_orderpriority").as("grp"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
        val perV = x.groupBy(col("v")).agg(count(lit(1)).as("cv"))
          .withColumn("prior",
            coalesce(sum(col("cv")).over(
              Window.orderBy(col("v"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("v"), col("cv"),
            (lit(2L) * col("prior") + col("cv") + 1L).as("tr"))
        val g = x.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cgv"))
          .join(perV, "v")
          .groupBy(col("grp"))
          .agg(sum(col("cgv")).as("ng"), sum(col("cgv") * col("tr")).as("s2"))
        val glob = perV.agg(sum(col("cv")).as("n"),
          sum(col("cv") * col("cv") * col("cv") - col("cv")).as("tie3"))
        g.as("a").join(g.as("b"), col("a.grp") < col("b.grp"))
          .crossJoin(broadcast(glob))
          .select(col("a.grp").as("group_i"), col("b.grp").as("group_j"),
            expr("""CAST(floor((CAST(a.s2 AS DOUBLE) / (2 * a.ng)
                   - CAST(b.s2 AS DOUBLE) / (2 * b.ng))
                   / sqrt((CAST(n AS DOUBLE) * (n + 1) / 12
                           - CAST(tie3 AS DOUBLE) / (12 * (n - 1)))
                          * (CAST(1 AS DOUBLE) / a.ng + CAST(1 AS DOUBLE) / b.ng))
                   * 1000000 + 0.5) AS BIGINT)""").as("dunn_z_e6"))
          .orderBy(col("group_i"), col("group_j"))
      },
      Some("""WITH x AS (
             |  SELECT o_orderpriority AS grp,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
             |  FROM orders),
             |perv AS (
             |  SELECT v, CAST(count(*) AS BIGINT) AS cv,
             |         CAST(coalesce(sum(count(*)) OVER (ORDER BY v
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
             |  FROM x GROUP BY v),
             |trv AS (SELECT v, cv, 2 * prior + cv + 1 AS tr FROM perv),
             |g AS (
             |  SELECT grp, CAST(sum(cgv) AS BIGINT) AS ng,
             |         CAST(sum(cgv * tr) AS BIGINT) AS s2
             |  FROM (SELECT grp, v, CAST(count(*) AS BIGINT) AS cgv
             |        FROM x GROUP BY grp, v) q JOIN trv USING (v)
             |  GROUP BY grp),
             |gstat AS (
             |  SELECT CAST(sum(cv) AS BIGINT) AS n,
             |         CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tie3
             |  FROM perv)
             |SELECT a.grp AS group_i, b.grp AS group_j,
             |       CAST(floor((CAST(a.s2 AS DOUBLE) / (2 * a.ng)
             |            - CAST(b.s2 AS DOUBLE) / (2 * b.ng))
             |            / sqrt((CAST(n AS DOUBLE) * (n + 1) / 12
             |                    - CAST(tie3 AS DOUBLE) / (12 * (n - 1)))
             |                   * (CAST(1 AS DOUBLE) / a.ng + CAST(1 AS DOUBLE) / b.ng))
             |            * 1000000 + 0.5) AS BIGINT) AS dunn_z_e6
             |FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN gstat
             |ORDER BY group_i, group_j""".stripMargin)
    ),
    Q(
      "sample_poisson_bootstrap",
      // Poisson bootstrap CI (round-13): THE 100 TB bootstrap —
      // stat_bootstrap_ci resamples indices, which needs the statistic's
      // input to collapse to a driver-safe array first; the Poisson
      // variant instead gives every ROW an independent per-replicate
      // weight ~ Poisson(1) (Chamandy et al., the production pattern at
      // Google/Meta scale), so the resample is a map-side expansion that
      // never materializes an index. Weights are a derandomized
      // inverse-CDF on a multiplicative row×replicate hash — the key is
      // folded mod 1000003 BEFORE the 2654435761 multiply (ADVICE r13:
      // the unfolded product wraps int64 once o_orderkey passes ~3.5·10⁹,
      // around sf600; folding first caps the product at ~2.7·10¹⁵ at any
      // sf) — (thresholds
      // 3679/7358/9197/9810 of 10⁴ = the exact Poisson(1) pmf prefix
      // sums, capped at 4); 40 replicate means of order totals are exact
      // integer divisions; the CI is the 2nd/39th order statistic.
      // Scale: expansion is 40× map-side rows but the partial aggregate
      // folds per partition — the shuffle carries 40 rows per partition,
      // and no driver-side array ever exists.
      (s, dir) => {
        val reps = s.range(0, 40).select(col("id").as("r"))
        val weighted = Tables(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .crossJoin(broadcast(reps))
          .select(col("r"), col("cents"),
            expr("""CASE WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 3679 THEN 0
                   WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 7358 THEN 1
                   WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9197 THEN 2
                   WHEN (((k % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9810 THEN 3
                   ELSE 4 END""").as("w"))
        val repMeans = weighted.groupBy(col("r"))
          .agg(sum(col("w") * col("cents")).as("ws"), sum(col("w")).as("wn"))
          .select(col("r"), expr("ws DIV wn").as("mean_cents"))
        val ranked = repMeans
          .withColumn("rn", row_number().over(
            Window.orderBy(col("mean_cents"), col("r"))))
        ranked.agg(count(lit(1)).as("n_replicates"),
            min(col("mean_cents")).as("rep_min"),
            max(col("mean_cents")).as("rep_max"),
            max(when(col("rn") === 2, col("mean_cents"))).as("ci_lo_cents"),
            max(when(col("rn") === 39, col("mean_cents"))).as("ci_hi_cents"))
      },
      Some("""WITH reps AS (SELECT CAST(unnest(range(0, 40)) AS BIGINT) AS r),
             |w AS (
             |  SELECT r,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |         CASE WHEN (((o_orderkey % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 3679 THEN 0
             |              WHEN (((o_orderkey % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 7358 THEN 1
             |              WHEN (((o_orderkey % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9197 THEN 2
             |              WHEN (((o_orderkey % 1000003) * 2654435761 + r * 40503) % 1000003) % 10000 < 9810 THEN 3
             |              ELSE 4 END AS wt
             |  FROM orders CROSS JOIN reps),
             |means AS (
             |  SELECT r, CAST(sum(wt * cents) AS BIGINT) // CAST(sum(wt) AS BIGINT) AS mean_cents
             |  FROM w GROUP BY r),
             |ranked AS (
             |  SELECT r, mean_cents,
             |         row_number() OVER (ORDER BY mean_cents, r) AS rn
             |  FROM means)
             |SELECT CAST(count(*) AS BIGINT) AS n_replicates,
             |       CAST(min(mean_cents) AS BIGINT) AS rep_min,
             |       CAST(max(mean_cents) AS BIGINT) AS rep_max,
             |       CAST(max(CASE WHEN rn = 2 THEN mean_cents END) AS BIGINT) AS ci_lo_cents,
             |       CAST(max(CASE WHEN rn = 39 THEN mean_cents END) AS BIGINT) AS ci_hi_cents
             |FROM ranked""".stripMargin)
    ),
    Q(
      "stat_fdr_storey",
      // Storey adaptive FDR (round-14): Benjamini–Hochberg controls FDR
      // at α assuming EVERY null is true; when many hypotheses are real
      // effects that's conservative by exactly π₀ (the true-null
      // fraction), and Storey's estimator π̂₀ = #{p > λ}/((1−λ)m) at
      // λ = 0.5 buys the power back — the cutoff becomes
      // p ≤ rank·α/(m·π̂₀). Same per-source p values as stat_fdr_bh
      // (the Lin exponential tail surrogate — no erf in either SQL
      // dialect), both verdicts reported side by side so the row SHOWS
      // the power gain (Storey's reject set is a superset by
      // construction, Round14Spec pins it). Scale: O(sources) rows
      // after one map-side aggregate; π̂₀ is a scalar subquery.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(storeySql)
      },
      Some(storeySql)
    ),
    Q(
      "sample_importance_reweight",
      // Importance re-weighting to a target mixture (round-14): when
      // you cannot resample (every example must keep flowing — loss
      // weighting, not selection), each language stratum gets
      // w = target_share / source_share, here against the uniform
      // target (the pipeline_lang_rebalance goal expressed as weights
      // instead of sampling). The report every reweighting needs
      // BEFORE training on it: per-stratum weights plus the corpus
      // EFFECTIVE SAMPLE SIZE, ESS = (Σw)²/Σw² — the number of
      // equivalent unweighted examples left after variance inflation
      // (an ESS far below n says the target is unreachable by
      // weighting alone; switch to sampling the over-represented
      // strata). Weights pin as integers at e3 (per-doc) so the ESS
      // numerator (Σ n_l·w)² stays in int64 headroom to sf ~10³; the
      // final ratio is one float division. Scale: a single language
      // census drives everything — O(langs) arithmetic after one
      // map-side rollup.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""WITH census AS (
          |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
          |  FROM documents GROUP BY lang),
          |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
          |               CAST(count(*) AS BIGINT) AS l FROM census),
          |w AS (
          |  SELECT lang, n_docs,
          |         n_docs * 1000000 DIV n AS src_share_e6,
          |         n * 1000 DIV (l * n_docs) AS w_e3
          |  FROM census CROSS JOIN tot),
          |ess AS (
          |  SELECT CAST(sum(n_docs * w_e3) AS BIGINT) AS sw,
          |         CAST(sum(n_docs * w_e3 * w_e3) AS BIGINT) AS sw2
          |  FROM w)
          |SELECT lang, n_docs, src_share_e6, w_e3 AS weight_e3,
          |       CAST(floor(CAST(sw AS DOUBLE) * sw / sw2 + 0.5) AS BIGINT)
          |         AS corpus_ess
          |FROM w CROSS JOIN ess
          |ORDER BY lang""".stripMargin)
      },
      Some("""WITH census AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
             |  FROM documents GROUP BY lang),
             |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
             |               CAST(count(*) AS BIGINT) AS l FROM census),
             |w AS (
             |  SELECT lang, n_docs,
             |         n_docs * 1000000 // n AS src_share_e6,
             |         n * 1000 // (l * n_docs) AS w_e3
             |  FROM census CROSS JOIN tot),
             |ess AS (
             |  SELECT CAST(sum(n_docs * w_e3) AS BIGINT) AS sw,
             |         CAST(sum(n_docs * w_e3 * w_e3) AS BIGINT) AS sw2
             |  FROM w)
             |SELECT lang, n_docs, src_share_e6, w_e3 AS weight_e3,
             |       CAST(floor(CAST(sw AS DOUBLE) * sw / sw2 + 0.5) AS BIGINT)
             |         AS corpus_ess
             |FROM w CROSS JOIN ess
             |ORDER BY lang""".stripMargin)
    ),
    Q(
      "stat_power_law_alpha",
      // Hill tail-index estimator (round-14): is per-customer spend
      // heavy-tailed, and how heavy — α̂ = 1 + k / Σᵢ ln(xᵢ/x_min) over
      // the top-k order statistics (x_min = the (k+1)-th), the standard
      // MLE for the Pareto tail exponent (Hill 1975; the diagnostic
      // behind "80/20" claims and the input to whale-aware sampling
      // budgets). α ≤ 2 means infinite variance — means and CUPED-style
      // variance reductions silently break; this row is the guard that
      // says which regime the revenue column is in. Determinism: the
      // top-101 selection is (spend desc, custkey) total-ordered; the
      // rank filters let Spark plan a partial WindowGroupLimit (each
      // partition forwards ≤ 101 rows — never a global full sort); each
      // ln(x/x_min) is e6-floored per row before the integer sum.
      // Scale: one per-customer rollup, a top-k (constant rows to one
      // reducer), arithmetic on 100 rows.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""WITH per AS (
          |  SELECT o_custkey,
          |         CAST(floor(sum(o_totalprice) + 0.5) AS BIGINT) AS x
          |  FROM orders GROUP BY o_custkey),
          |ranked AS (
          |  SELECT x, row_number() OVER (ORDER BY x DESC, o_custkey) AS rn
          |  FROM per),
          |xmin AS (SELECT x AS xm FROM ranked WHERE rn = 101),
          |t AS (
          |  SELECT CAST(count(*) AS BIGINT) AS k,
          |         CAST(sum(CAST(floor(ln(CAST(r.x AS DOUBLE) / xm)
          |              * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS slnsum
          |  FROM ranked r CROSS JOIN xmin WHERE rn <= 100)
          |SELECT k, xm AS xmin_dollars,
          |       CAST(floor((1.0 + CAST(k AS DOUBLE) * 1000000 / slnsum)
          |            * 1000000 + 0.5) AS BIGINT) AS alpha_e6
          |FROM t CROSS JOIN xmin""".stripMargin)
      },
      Some("""WITH per AS (
             |  SELECT o_custkey,
             |         CAST(floor(sum(o_totalprice) + 0.5) AS BIGINT) AS x
             |  FROM orders GROUP BY o_custkey),
             |ranked AS (
             |  SELECT x, row_number() OVER (ORDER BY x DESC, o_custkey) AS rn
             |  FROM per),
             |xmin AS (SELECT x AS xm FROM ranked WHERE rn = 101),
             |t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |         CAST(sum(CAST(floor(ln(CAST(r.x AS DOUBLE) / xm)
             |              * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS slnsum
             |  FROM ranked r CROSS JOIN xmin WHERE rn <= 100)
             |SELECT k, xm AS xmin_dollars,
             |       CAST(floor((1.0 + CAST(k AS DOUBLE) * 1000000 / slnsum)
             |            * 1000000 + 0.5) AS BIGINT) AS alpha_e6
             |FROM t CROSS JOIN xmin""".stripMargin)
    ),
    Q(
      "stat_negbin_moments",
      // Negative-binomial fit by method of moments (round-14): count
      // data (orders per customer) is almost never Poisson — the
      // variance runs past the mean, and modeling it Poisson understates
      // every interval. From the exact (n, Σy, Σy²) fold: mean m,
      // sample variance v, then the NB(r, p) moment estimators
      // p̂ = m/v and r̂ = m²/(v−m), plus the dispersion index v/m the
      // modeler checks first (fit is only defined when v > m — the
      // equidispersed case emits NULL fits, never a division blowup).
      // Per-customer counts are zero-truncated by construction (a
      // customer with no orders has no row) — stated, not hidden.
      // Scale: one map-side-combinable rollup + O(1) arithmetic.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""WITH per AS (
          |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS y
          |  FROM orders GROUP BY o_custkey),
          |m AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
          |         CAST(sum(y * y) AS BIGINT) AS q
          |  FROM per),
          |f AS (
          |  SELECT n, s, q,
          |         CAST(s AS DOUBLE) / n AS mean,
          |         (q - CAST(s AS DOUBLE) * s / n) / (n - 1) AS v
          |  FROM m)
          |SELECT n AS n_customers,
          |       CAST(floor(mean * 1000000 + 0.5) AS BIGINT) AS mean_e6,
          |       CAST(floor(v * 1000000 + 0.5) AS BIGINT) AS var_e6,
          |       CAST(floor(v / mean * 1000000 + 0.5) AS BIGINT) AS dispersion_e6,
          |       CASE WHEN v > mean
          |            THEN CAST(floor(mean / v * 1000000 + 0.5) AS BIGINT)
          |            ELSE CAST(NULL AS BIGINT) END AS p_e6,
          |       CASE WHEN v > mean
          |            THEN CAST(floor(mean * mean / (v - mean) * 1000000 + 0.5) AS BIGINT)
          |            ELSE CAST(NULL AS BIGINT) END AS r_e6
          |FROM f""".stripMargin)
      },
      Some("""WITH per AS (
             |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS y
             |  FROM orders GROUP BY o_custkey),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
             |         CAST(sum(y * y) AS BIGINT) AS q
             |  FROM per),
             |f AS (
             |  SELECT n, s, q,
             |         CAST(s AS DOUBLE) / n AS mean,
             |         (q - CAST(s AS DOUBLE) * s / n) / (n - 1) AS v
             |  FROM m)
             |SELECT n AS n_customers,
             |       CAST(floor(mean * 1000000 + 0.5) AS BIGINT) AS mean_e6,
             |       CAST(floor(v * 1000000 + 0.5) AS BIGINT) AS var_e6,
             |       CAST(floor(v / mean * 1000000 + 0.5) AS BIGINT) AS dispersion_e6,
             |       CASE WHEN v > mean
             |            THEN CAST(floor(mean / v * 1000000 + 0.5) AS BIGINT)
             |            ELSE CAST(NULL AS BIGINT) END AS p_e6,
             |       CASE WHEN v > mean
             |            THEN CAST(floor(mean * mean / (v - mean) * 1000000 + 0.5) AS BIGINT)
             |            ELSE CAST(NULL AS BIGINT) END AS r_e6
             |FROM f""".stripMargin)
    ),
    Q(
      "stat_hodges_lehmann",
      // Hodges–Lehmann location shift (round-13): the ROBUST "how much
      // did the level move" — the median of all pairwise differences
      // between two series, the estimator behind the Mann–Whitney test
      // the same way the mean difference sits behind the t-test (one
      // outlier day can't drag it). Series: daily counts of the two
      // highest-volume event types, paired all-to-all; the median of
      // differences is kept exact as a DOUBLED BIGINT (even-count
      // medians are mid-pair halves).
      // Scale: the pairwise frame is O(days²) of the AGGREGATED daily
      // spine — calendar-scale work regardless of raw event volume
      // (same posture as ts_sample_entropy), never a row-level pair
      // join.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "view"))
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("d"))
          .agg(count(lit(1)).as("x"))
        val a = daily.filter(col("event_type") === "click")
          .select(col("x").as("xa"))
        val b = daily.filter(col("event_type") === "view")
          .select(col("x").as("xb"))
        a.crossJoin(b)
          .select((col("xa") - col("xb")).as("diff"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("CAST(percentile(diff, 0.5) * 2 AS BIGINT)").as("hl_shift_x2"),
            min(col("diff")).as("min_diff"), max(col("diff")).as("max_diff"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events WHERE event_type IN ('click', 'view')
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT a.x - b.x AS diff
             |  FROM (SELECT x FROM daily WHERE event_type = 'click') a
             |  CROSS JOIN (SELECT x FROM daily WHERE event_type = 'view') b)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(median(diff) * 2 AS BIGINT) AS hl_shift_x2,
             |       CAST(min(diff) AS BIGINT) AS min_diff,
             |       CAST(max(diff) AS BIGINT) AS max_diff
             |FROM pairs""".stripMargin)
    ),
    Q(
      "stat_delta_method_ratio",
      // Delta-method ratio metric (round-13): the A/B readout for RATIO
      // metrics (revenue per order, clicks per user) where both
      // numerator and denominator are random — naive per-unit-mean
      // variance is WRONG because num/den covary; the delta method
      // gives Var(X̄/Ȳ) ≈ (1/n)(σx² − 2R σxy + R² σy²)/Ȳ² with R = X̄/Ȳ.
      // Units are customers (the randomization unit), X = spend in
      // hundred-dollar units (see the headroom note below),
      // Y = order count, arms from the deterministic multiplicative
      // hash; all five moments per arm fold as exact BIGINTs and the z
      // assembles once, e6-pinned.
      // Scale: one per-customer rollup + one conditional-moment
      // aggregate — two map-side-combinable passes, O(1) output.
      (s, dir) => {
        val per = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          // HUNDREDS of dollars (ADVICE r13): per-customer spend² in whole
          // dollars ran ~2·10¹², overflowing Σx² near sf30; hundreds cut
          // the quadratic moment 10⁴× (headroom past sf 10⁵). The ratio
          // and its delta-method variance are unit-free up to the pin.
          .agg(sum(floor(col("o_totalprice") / 100 + lit(0.5)).cast("long"))
            .as("x"), count(lit(1)).as("y"))
          .select(((col("o_custkey") % 1000003L) * 2654435761L % 2).as("arm"),
            col("x"), col("y"))
        val m = per.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("ratio_e6",
            expr("sx * 1000000 DIV sy"))
          .withColumn("var_term",
            expr("""((sxx - CAST(sx AS DOUBLE) * sx / n)
                   - 2.0 * (CAST(sx AS DOUBLE) / sy)
                     * (sxy - CAST(sx AS DOUBLE) * sy / n)
                   + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                     * (syy - CAST(sy AS DOUBLE) * sy / n))
                   / n / (CAST(sy AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n) / n"""))
        val a0 = m.filter(col("arm") === 0)
          .select(col("n").as("n_a"), col("ratio_e6").as("ratio_a_e6"),
            col("var_term").as("va"))
        val a1 = m.filter(col("arm") === 1)
          .select(col("n").as("n_b"), col("ratio_e6").as("ratio_b_e6"),
            col("var_term").as("vb"))
        a0.crossJoin(a1)
          .select(col("n_a"), col("n_b"), col("ratio_a_e6"), col("ratio_b_e6"),
            expr("""CAST(floor((CAST(ratio_a_e6 AS DOUBLE) - ratio_b_e6) / 1000000
                   / sqrt(va + vb) * 1000000 + 0.5) AS BIGINT)""").as("z_e6"))
      },
      Some("""WITH per AS (
             |  SELECT (o_custkey % 1000003) * 2654435761 % 2 AS arm,
             |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)) AS BIGINT) AS x,
             |         CAST(count(*) AS BIGINT) AS y
             |  FROM orders GROUP BY o_custkey),
             |m AS (
             |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(x * x) AS BIGINT) AS sxx,
             |         CAST(sum(y * y) AS BIGINT) AS syy,
             |         CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM per GROUP BY arm),
             |v AS (
             |  SELECT arm, n, sx * 1000000 // sy AS ratio_e6,
             |         ((sxx - CAST(sx AS DOUBLE) * sx / n)
             |          - 2.0 * (CAST(sx AS DOUBLE) / sy)
             |            * (sxy - CAST(sx AS DOUBLE) * sy / n)
             |          + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
             |            * (syy - CAST(sy AS DOUBLE) * sy / n))
             |         / n / (CAST(sy AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n) / n AS var_term
             |  FROM m)
             |SELECT a.n AS n_a, b.n AS n_b,
             |       CAST(a.ratio_e6 AS BIGINT) AS ratio_a_e6,
             |       CAST(b.ratio_e6 AS BIGINT) AS ratio_b_e6,
             |       CAST(floor((CAST(a.ratio_e6 AS DOUBLE) - b.ratio_e6) / 1000000
             |            / sqrt(a.var_term + b.var_term) * 1000000 + 0.5) AS BIGINT) AS z_e6
             |FROM (SELECT * FROM v WHERE arm = 0) a
             |CROSS JOIN (SELECT * FROM v WHERE arm = 1) b""".stripMargin)
    ),
    Q(
      "stat_cramer_von_mises",
      // Cramér–von Mises two-sample test (round-13): the INTEGRATED
      // distribution distance — stat_ks_twosample reads only the single
      // largest ECDF gap, CvM sums the squared gap across the whole
      // support, so a broad mild shift that never produces one big gap
      // (exactly what a subtle data-drift looks like) is caught here and
      // missed by KS. Computational form over pooled ranks: U =
      // n·Σ_A(r_i−i)² + m·Σ_B(s_j−j)², T = U/(n·m·N) − (4mn−1)/(6N),
      // with r the pooled rank and i the within-group rank — both
      // assigned by ONE total order (value, group, key) shared by the
      // engines, so ties break identically. The two Σ's stay exact
      // BIGINTs; U's final products run in doubles from those exact
      // integers (scalar ops, no accumulation), e6-pinned.
      // Scale: two rank windows over a range-partitioned global sort +
      // an O(1) fold — the same posture as every rank test here.
      (s, dir) => {
        val x = Tables(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(col("o_orderkey").as("k"),
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("g"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
        val ranked = x
          .withColumn("r", row_number().over(
            Window.orderBy(col("v"), col("g"), col("k"))).cast("long"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("g"))
              .orderBy(col("v"), col("k"))).cast("long"))
        ranked.groupBy(col("g"))
          .agg(count(lit(1)).as("cnt"),
            sum((col("r") - col("i")) * (col("r") - col("i"))).as("ss"))
          .agg(
            max(when(col("g") === 1, col("cnt"))).as("n"),
            max(when(col("g") === 0, col("cnt"))).as("m"),
            max(when(col("g") === 1, col("ss"))).as("sa"),
            max(when(col("g") === 0, col("ss"))).as("sb"))
          .select(col("n"), col("m"),
            expr("""CAST(floor((CAST(sa AS DOUBLE) * n + CAST(sb AS DOUBLE) * m)
                   / (CAST(n AS DOUBLE) * m * (n + m))
                   * 1000000 + 0.5) AS BIGINT)""").as("u_norm_e6"),
            expr("""CAST(floor(((CAST(sa AS DOUBLE) * n + CAST(sb AS DOUBLE) * m)
                   / (CAST(n AS DOUBLE) * m * (n + m))
                   - (CAST(4 AS DOUBLE) * m * n - 1) / (CAST(6 AS DOUBLE) * (n + m)))
                   * 1000000 + 0.5) AS BIGINT)""").as("cvm_t_e6"))
      },
      Some("""WITH x AS (
             |  SELECT o_orderkey AS k,
             |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |ranked AS (
             |  SELECT g,
             |         CAST(row_number() OVER (ORDER BY v, g, k) AS BIGINT) AS r,
             |         CAST(row_number() OVER (PARTITION BY g ORDER BY v, k) AS BIGINT) AS i
             |  FROM x),
             |s AS (
             |  SELECT g, CAST(count(*) AS BIGINT) AS cnt,
             |         CAST(sum((r - i) * (r - i)) AS BIGINT) AS ss
             |  FROM ranked GROUP BY g),
             |f AS (
             |  SELECT max(CASE WHEN g = 1 THEN cnt END) AS n,
             |         max(CASE WHEN g = 0 THEN cnt END) AS m,
             |         max(CASE WHEN g = 1 THEN ss END) AS sa,
             |         max(CASE WHEN g = 0 THEN ss END) AS sb
             |  FROM s)
             |SELECT n, m,
             |       CAST(floor((CAST(sa AS DOUBLE) * n + CAST(sb AS DOUBLE) * m)
             |            / (CAST(n AS DOUBLE) * m * (n + m))
             |            * 1000000 + 0.5) AS BIGINT) AS u_norm_e6,
             |       CAST(floor(((CAST(sa AS DOUBLE) * n + CAST(sb AS DOUBLE) * m)
             |            / (CAST(n AS DOUBLE) * m * (n + m))
             |            - (CAST(4 AS DOUBLE) * m * n - 1) / (CAST(6 AS DOUBLE) * (n + m)))
             |            * 1000000 + 0.5) AS BIGINT) AS cvm_t_e6
             |FROM f""".stripMargin)
    ),
    Q(
      "agg_pythagorean_means",
      // The three Pythagorean means per group (round-13): arithmetic,
      // geometric and harmonic mean of order totals by priority — AM for
      // the level, GM for multiplicative/skewed data (the right average
      // of ratios and growth rates), HM for rate-like quantities; the
      // AM ≥ GM ≥ HM inequality doubles as a free self-check (spec-
      // pinned). AM is an exact integer division of cents; GM folds
      // per-row ln() and HM per-row 1/x, each e9-quantized BEFORE the
      // sum (integer accumulation — no float order hazard), with one
      // exp()/division at the end under r2.
      // Scale: one conditional-moment aggregate, map-side combinable,
      // O(groups) output.
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(col("o_orderpriority").as("grp"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .select(col("grp"), col("cents"),
            expr("CAST(floor(ln(CAST(cents AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)")
              .as("lnq"),
            expr("CAST(floor(CAST(1000000000000000 AS DOUBLE) / cents + 0.5) AS BIGINT)")
              .as("invq"))
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"),
            sum(col("lnq")).as("sln"), sum(col("invq")).as("sinv"))
          .select(col("grp"), col("n"),
            expr("sc DIV n").as("arith_mean_cents"),
            util.r2(exp(col("sln").cast("double") / col("n") / lit(1e9)) /
              lit(100.0)).as("geo_mean_dollars"),
            util.r2(col("n").cast("double") * lit(1e15) /
              col("sinv").cast("double") / lit(100.0)).as("harm_mean_dollars"))
          .orderBy(col("grp"))
      },
      Some(s"""WITH x AS (
              |  SELECT o_orderpriority AS grp,
              |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              |  FROM orders),
              |q AS (
              |  SELECT grp, cents,
              |         CAST(floor(ln(CAST(cents AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS lnq,
              |         CAST(floor(CAST(1000000000000000 AS DOUBLE) / cents + 0.5) AS BIGINT) AS invq
              |  FROM x),
              |g AS (
              |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
              |         CAST(sum(cents) AS BIGINT) AS sc,
              |         CAST(sum(lnq) AS BIGINT) AS sln,
              |         CAST(sum(invq) AS BIGINT) AS sinv
              |  FROM q GROUP BY grp)
              |SELECT grp, n, sc // n AS arith_mean_cents,
              |       ${util.r2sql("exp(CAST(sln AS DOUBLE) / n / 1e9) / 100.0")} AS geo_mean_dollars,
              |       ${util.r2sql("CAST(n AS DOUBLE) * 1e15 / CAST(sinv AS DOUBLE) / 100.0")} AS harm_mean_dollars
              |FROM g ORDER BY grp""".stripMargin)
    ),
    Q(
      "stat_sign_test",
      // Paired sign test (round-13): the assumption-free floor of the
      // paired-test ladder — stat_wilcoxon_signed_rank needs symmetric
      // differences, the paired t needs normality; the sign test needs
      // NOTHING but independent pairs, counting who-won per customer
      // between the same 1995/1996 spend pairs. Exact integer counts; z
      // with continuity correction assembles once, e6-pinned; ties
      // (equal spend) are dropped per the standard definition.
      // Scale: one per-(customer, year) rollup + one conditional fold —
      // identical posture to the Wilcoxon row it lower-bounds.
      (s, dir) => {
        val spend = Tables(s, dir, "orders")
          .filter(year(col("o_orderdate")).isin(1995, 1996))
          .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("cents"))
        spend.groupBy(col("o_custkey"))
          .agg(sum(when(col("yr") === 1995, col("cents"))).as("a"),
            sum(when(col("yr") === 1996, col("cents"))).as("b"),
            count(lit(1)).as("k"))
          .filter(col("k") === 2 && col("a") =!= col("b"))
          .agg(sum(when(col("a") > col("b"), 1L).otherwise(0L)).as("n_plus"),
            sum(when(col("a") < col("b"), 1L).otherwise(0L)).as("n_minus"))
          .select(col("n_plus"), col("n_minus"),
            expr("""CAST(floor((abs(CAST(n_plus AS DOUBLE) - (n_plus + n_minus) / CAST(2 AS DOUBLE)) - 0.5)
                   / (sqrt(CAST(n_plus + n_minus AS DOUBLE)) / 2)
                   * 1000000 + 0.5) AS BIGINT)""").as("z_e6"))
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey, year(o_orderdate) AS yr,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT sum(CASE WHEN yr = 1995 THEN cents END) AS a,
             |         sum(CASE WHEN yr = 1996 THEN cents END) AS b
             |  FROM spend GROUP BY o_custkey
             |  HAVING count(*) = 2 AND sum(CASE WHEN yr = 1995 THEN cents END)
             |         <> sum(CASE WHEN yr = 1996 THEN cents END)),
             |f AS (
             |  SELECT CAST(sum(CASE WHEN a > b THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
             |         CAST(sum(CASE WHEN a < b THEN 1 ELSE 0 END) AS BIGINT) AS n_minus
             |  FROM pairs)
             |SELECT n_plus, n_minus,
             |       CAST(floor((abs(CAST(n_plus AS DOUBLE) - (n_plus + n_minus) / CAST(2 AS DOUBLE)) - 0.5)
             |            / (sqrt(CAST(n_plus + n_minus AS DOUBLE)) / 2)
             |            * 1000000 + 0.5) AS BIGINT) AS z_e6
             |FROM f""".stripMargin)
    )
  )

  /** Shared Spark/DuckDB SQL for [[stat_sprt_sequential]]. */
  private lazy val sprtSql: String =
    """WITH conv AS (
      |  SELECT o_orderpriority AS arm, o_orderkey AS k_ord,
      |         CASE WHEN (o_orderkey % 1000003) * 2654435761
      |                   % 1000000007 % 100
      |                   < 10 * CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
      |              THEN 1 ELSE 0 END AS x
      |  FROM orders),
      |llr AS (
      |  SELECT arm,
      |         CAST(row_number() OVER w AS BIGINT) AS k,
      |         CAST(sum(CASE WHEN x = 1 THEN 693 ELSE -288 END)
      |              OVER w AS BIGINT) AS cum
      |  FROM conv
      |  WINDOW w AS (PARTITION BY arm ORDER BY k_ord)),
      |crossed AS (
      |  SELECT arm, k, cum,
      |         CASE WHEN cum >= 2890 THEN 'accept_h1'
      |              ELSE 'accept_h0' END AS dec,
      |         row_number() OVER (PARTITION BY arm ORDER BY k) AS rn
      |  FROM llr WHERE cum >= 2890 OR cum <= -2890),
      |tot AS (
      |  SELECT arm, CAST(count(*) AS BIGINT) AS n_total,
      |         CAST(sum(CASE WHEN x = 1 THEN 693 ELSE -288 END)
      |              AS BIGINT) AS cum_final
      |  FROM conv GROUP BY arm)
      |SELECT t.arm, t.n_total,
      |       coalesce(c.k, t.n_total) AS n_at_decision,
      |       coalesce(c.dec, 'continue') AS decision,
      |       coalesce(c.cum, t.cum_final) AS llr_milli
      |FROM tot t LEFT JOIN crossed c ON c.arm = t.arm AND c.rn = 1
      |ORDER BY t.arm""".stripMargin

  /** Shared Spark/DuckDB SQL for [[stat_empirical_bayes_ctr]];
    * `idiv` = the engine's integer-division token (`div` / `//`).
    */
  private def ebCtrSql(idiv: String): String =
    s"""WITH k AS (
      |  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS v,
      |         CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
      |              AS BIGINT) AS c
      |  FROM lineitem GROUP BY l_partkey HAVING count(*) >= 2),
      |r AS (SELECT key, v, c, (1000000 * c) $idiv v AS r_e6 FROM k),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(r_e6) AS BIGINT) AS s1
      |  FROM r),
      |prior AS (
      |  -- centered two-pass variance: the raw-moment form n*S2 - S1^2
      |  -- overflows Long at ~20k keys (the x10 stress caught it); the
      |  -- centered sum is <= n * 1e12, headroom to ~1e6 keys
      |  SELECT mom.n, mom.s1 $idiv mom.n AS m_e6,
      |         greatest(CAST(sum((r.r_e6 - mom.s1 $idiv mom.n)
      |                         * (r.r_e6 - mom.s1 $idiv mom.n)) AS BIGINT)
      |                  $idiv mom.n, 1) AS var_e6sq
      |  FROM r, mom GROUP BY mom.n, mom.s1),
      |ab AS (
      |  SELECT m_e6,
      |         greatest((m_e6 * (1000000 - m_e6)) * 1000000 $idiv var_e6sq
      |           - 1000000, 1000000) AS ab_e6
      |  FROM prior),
      |sm AS (
      |  SELECT r.key, r.v, r.c, r.r_e6,
      |         (1000000 * (r.c * 1000000 + (ab.m_e6 * ab.ab_e6) $idiv 1000000))
      |           $idiv (r.v * 1000000 + ab.ab_e6) AS smoothed_e6
      |  FROM r, ab)
      |SELECT key, v, c, r_e6, smoothed_e6,
      |       abs(smoothed_e6 - r_e6) AS shrink_e6
      |FROM sm ORDER BY shrink_e6 DESC, key LIMIT 10""".stripMargin

  /** Shared Spark/DuckDB SQL for [[stat_capture_recapture]]. */
  private def captureSql(idiv: String): String =
    s"""WITH m AS (
      |  SELECT doc_id,
      |         (doc_id % 1000003) * 2654435761 % 1000000007 % 100 < 60 AS in_a,
      |         (doc_id % 1000003) * 1779033703 % 1000000007 % 100 < 50 AS in_b
      |  FROM documents),
      |c AS (
      |  SELECT CAST(count(*) AS BIGINT) AS true_n,
      |         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |         CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |         CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_both
      |  FROM m)
      |SELECT true_n, n_a, n_b, n_both,
      |       CASE WHEN n_both > 0 THEN (n_a * n_b) $idiv n_both
      |            ELSE CAST(0 AS BIGINT) END AS n_hat
      |FROM c""".stripMargin

  /** Shared Spark/DuckDB SQL for [[agg_log2_histogram]]. */
  private def log2HistSql(idiv: String): String =
    s"""WITH v AS (
      |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders WHERE o_totalprice > 0),
      |b AS (
      |  SELECT CAST(floor(log2(cents)) AS BIGINT) AS bucket,
      |         cents
      |  FROM v),
      |g AS (
      |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |         min(cents) AS lo, max(cents) AS hi
      |  FROM b GROUP BY bucket),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
      |SELECT bucket, n, lo, hi,
      |       (1000000 * n) $idiv total AS share_e6
      |FROM g, t ORDER BY bucket""".stripMargin

  /** Shared Spark/DuckDB SQL for [[stat_winsorized_mean]];
    * `idiv` = the engine's integer-division token.
    */
  private def winsorSql(idiv: String): String =
    s"""WITH v AS (
      |  SELECT o_orderpriority AS pri,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |r AS (
      |  SELECT pri, cents,
      |         CAST(row_number() OVER (PARTITION BY pri ORDER BY cents)
      |              AS BIGINT) AS rk,
      |         CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n
      |  FROM v),
      |b AS (
      |  SELECT pri,
      |         max(CASE WHEN rk = (5 * n + 99) $idiv 100
      |                  THEN cents END) AS p5,
      |         max(CASE WHEN rk = (95 * n + 99) $idiv 100
      |                  THEN cents END) AS p95,
      |         max(n) AS n
      |  FROM r GROUP BY pri),
      |c AS (
      |  SELECT v.pri,
      |         CASE WHEN v.cents < b.p5 THEN b.p5
      |              WHEN v.cents > b.p95 THEN b.p95
      |              ELSE v.cents END AS clipped
      |  FROM v JOIN b ON b.pri = v.pri)
      |SELECT c.pri, b.n, b.p5, b.p95,
      |       CAST(sum(c.clipped) AS BIGINT) $idiv max(b.n)
      |         AS winsor_mean_cents
      |FROM c JOIN b ON b.pri = c.pri
      |GROUP BY c.pri, b.n, b.p5, b.p95
      |ORDER BY c.pri""".stripMargin

  /** DuckDB oracle for [[stat_chao1_vocab]]. */
  private lazy val chao1Sql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |freq AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok
      |  WHERE length(w) > 0 GROUP BY w),
      |c AS (
      |  SELECT CAST(count(*) AS BIGINT) AS d,
      |         CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |         CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |         CAST(sum(f) AS BIGINT) AS n_tokens
      |  FROM freq)
      |SELECT d, f1, f2, n_tokens,
      |       CASE WHEN f2 > 0 THEN d + (f1 * f1) // (2 * f2)
      |            ELSE d + (f1 * (f1 - 1)) // 2 END AS chao1
      |FROM c""".stripMargin

  /** Shared Spark/DuckDB SQL for [[stat_runs_test]]. */
  private lazy val runsTestSql: String =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
      |               CAST(count(*) AS BIGINT) AS days FROM daily),
      |cls AS (
      |  SELECT d, CASE WHEN cnt * days > total THEN 1 ELSE 0 END AS above
      |  FROM daily CROSS JOIN tot),
      |runs AS (
      |  SELECT above,
      |    CASE WHEN lag(above) OVER (ORDER BY d) IS NULL
      |           OR lag(above) OVER (ORDER BY d) <> above
      |         THEN 1 ELSE 0 END AS new_run
      |  FROM cls),
      |f AS (
      |  SELECT CAST(sum(above) AS BIGINT) AS n1,
      |         CAST(sum(1 - above) AS BIGINT) AS n2,
      |         CAST(sum(new_run) AS BIGINT) AS r
      |  FROM runs)
      |SELECT n1, n2, r,
      |       CAST(floor(
      |         (CAST(r AS DOUBLE) - (CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1))
      |         / sqrt(CAST(2 AS DOUBLE) * n1 * n2 * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2)
      |                / ((CAST(n1 + n2 AS DOUBLE)) * (CAST(n1 + n2 AS DOUBLE))
      |                   * (n1 + n2 - 1)))
      |         * 1000000 + 0.5) AS BIGINT) AS z_e6
      |FROM f""".stripMargin

  /** Shared Spark/DuckDB SQL for [[agg_kmv_set_overlap]]: two customer
    * segments' distinct hash sets, their k=64 minimum-value signatures,
    * the union signature, and integer-exact KMV estimators. `idiv` =
    * the engine's integer-division token.
    */
  private def kmvOverlapSql(idiv: String): String =
    s"""WITH a AS (
      |  SELECT DISTINCT ((o_custkey % 1000003) * 2654435761) % 1000003 AS h
      |  FROM orders WHERE o_orderpriority = '1-URGENT'),
      |b AS (
      |  SELECT DISTINCT ((o_custkey % 1000003) * 2654435761) % 1000003 AS h
      |  FROM orders WHERE o_orderstatus = 'F'),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      |ka AS (SELECT h, rn FROM (
      |    SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn
      |    FROM a) t WHERE rn <= 64),
      |kb AS (SELECT h, rn FROM (
      |    SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn
      |    FROM b) t WHERE rn <= 64),
      |u AS (SELECT DISTINCT h FROM (
      |    SELECT h FROM a UNION ALL SELECT h FROM b) x),
      |nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
      |ku AS (SELECT h, rn FROM (
      |    SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn
      |    FROM u) t WHERE rn <= 64),
      |est AS (
      |  SELECT
      |    CASE WHEN na.n <= 64 THEN na.n
      |         ELSE CAST(63 * 1000003 AS BIGINT) $idiv
      |              (SELECT max(h) FROM ka) END AS n_a_est,
      |    CASE WHEN nb.n <= 64 THEN nb.n
      |         ELSE CAST(63 * 1000003 AS BIGINT) $idiv
      |              (SELECT max(h) FROM kb) END AS n_b_est,
      |    CASE WHEN nu.n <= 64 THEN nu.n
      |         ELSE CAST(63 * 1000003 AS BIGINT) $idiv
      |              (SELECT max(h) FROM ku) END AS n_union_est
      |  FROM na CROSS JOIN nb CROSS JOIN nu),
      |common AS (
      |  SELECT CAST(count(*) AS BIGINT) AS c
      |  FROM ku JOIN a ON a.h = ku.h JOIN b ON b.h = ku.h)
      |SELECT CAST(64 AS BIGINT) AS k, n_a_est, n_b_est, n_union_est,
      |       c AS kmv_common,
      |       c * n_union_est $idiv least(64, nu.n) AS n_intersect_est
      |FROM est CROSS JOIN common CROSS JOIN nu""".stripMargin

  /** Shared Spark/DuckDB SQL for [[agg_kmv_set_difference]]: the same
    * two segments and k=64 signatures as [[kmvOverlapSql]], with the
    * union-sketch ratio estimator applied to the EXCLUSIVE memberships
    * (A∖B, B∖A) instead of the common one. `idiv` = the engine's
    * integer-division token.
    */
  private def kmvDifferenceSql(idiv: String): String =
    s"""WITH a AS (
      |  SELECT DISTINCT ((o_custkey % 1000003) * 2654435761) % 1000003 AS h
      |  FROM orders WHERE o_orderpriority = '1-URGENT'),
      |b AS (
      |  SELECT DISTINCT ((o_custkey % 1000003) * 2654435761) % 1000003 AS h
      |  FROM orders WHERE o_orderstatus = 'F'),
      |u AS (SELECT DISTINCT h FROM (
      |    SELECT h FROM a UNION ALL SELECT h FROM b) x),
      |nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
      |ku AS (SELECT h, rn FROM (
      |    SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn
      |    FROM u) t WHERE rn <= 64),
      |est AS (
      |  SELECT CASE WHEN nu.n <= 64 THEN nu.n
      |              ELSE CAST(63 * 1000003 AS BIGINT) $idiv
      |                   (SELECT max(h) FROM ku) END AS n_union_est
      |  FROM nu),
      |marked AS (
      |  SELECT ku.h,
      |         CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
      |         CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
      |  FROM ku LEFT JOIN a ON a.h = ku.h LEFT JOIN b ON b.h = ku.h),
      |cnt AS (
      |  SELECT CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |         CAST(sum(CASE WHEN in_b = 1 AND in_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
      |         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cc
      |  FROM marked)
      |SELECT CAST(64 AS BIGINT) AS k, n_union_est,
      |       ca AS kmv_a_only, cb AS kmv_b_only, cc AS kmv_common,
      |       ca * n_union_est $idiv least(64, nu.n) AS n_a_minus_b_est,
      |       cb * n_union_est $idiv least(64, nu.n) AS n_b_minus_a_est
      |FROM est CROSS JOIN cnt CROSS JOIN nu""".stripMargin

  /** Shared Spark/DuckDB SQL for [[agg_kmv_partial_merge]]: per-
    * (priority, status) k=64 KMV signatures (the persisted partials),
    * union-merged up to priority by "k smallest of the deduplicated
    * union of partials" — no rescan of `orders` past the partial stage —
    * then the integer-exact KMV estimator on the merged signature.
    * `idiv` = the engine's integer-division token.
    */
  private def kmvPartialMergeSql(idiv: String): String =
    s"""WITH cells AS (
      |  SELECT o_orderpriority AS prio, o_orderstatus AS stat,
      |         ((o_custkey % 1000003) * 2654435761) % 1000003 AS h
      |  FROM orders GROUP BY 1, 2, 3),
      |sig AS (
      |  SELECT prio, stat, h FROM (
      |    SELECT prio, stat, h,
      |           row_number() OVER (PARTITION BY prio, stat ORDER BY h) AS rn
      |    FROM cells) t WHERE rn <= 64),
      |uh AS (SELECT DISTINCT prio, h FROM sig),
      |msig AS (
      |  SELECT prio, h FROM (
      |    SELECT prio, h,
      |           row_number() OVER (PARTITION BY prio ORDER BY h) AS rn
      |    FROM uh) t WHERE rn <= 64),
      |np AS (SELECT prio, CAST(count(DISTINCT stat) AS BIGINT) AS n_partials
      |       FROM sig GROUP BY prio),
      |stats AS (SELECT prio, CAST(count(*) AS BIGINT) AS k_filled,
      |                 CAST(max(h) AS BIGINT) AS kth_hash
      |          FROM msig GROUP BY prio)
      |SELECT stats.prio AS o_orderpriority, np.n_partials,
      |       stats.k_filled, stats.kth_hash,
      |       CASE WHEN stats.k_filled < 64 THEN stats.k_filled
      |            ELSE CAST(63 * 1000003 AS BIGINT) $idiv stats.kth_hash
      |       END AS n_distinct_est
      |FROM stats JOIN np ON np.prio = stats.prio
      |ORDER BY o_orderpriority""".stripMargin

  /** DuckDB oracle for [[agg_heavyhitter_partial_merge]]: per-(source,
    * lang) exact token counts truncated to each cell's top-16 (count
    * desc, token asc — fully deterministic; width matches both engines'
    * rk <= 16 — ADVICE r15 stale-comment fix), union-merged up to source
    * by summed surviving counts, re-ranked to top-5.
    */
  private lazy val heavyHitterMergeSql: String =
    """WITH cellcnt AS (
      |  SELECT source, lang, tok, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT source, lang, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) t
      |  GROUP BY 1, 2, 3),
      |partials AS (
      |  SELECT source, lang, tok, n FROM (
      |    SELECT source, lang, tok, n,
      |           row_number() OVER (PARTITION BY source, lang
      |                              ORDER BY n DESC, tok ASC) AS rk
      |    FROM cellcnt) t
      |  WHERE rk <= 16),
      |merged AS (
      |  SELECT source, tok, CAST(sum(n) AS BIGINT) AS est_n,
      |         CAST(count(*) AS BIGINT) AS n_cells_surviving
      |  FROM partials GROUP BY source, tok)
      |SELECT source, CAST(rk AS BIGINT) AS rank, tok, est_n,
      |       n_cells_surviving
      |FROM (
      |  SELECT source, tok, est_n, n_cells_surviving,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY est_n DESC, tok ASC) AS rk
      |  FROM merged) t
      |WHERE rk <= 5
      |ORDER BY source, rank""".stripMargin

  /** Shared Spark/DuckDB SQL for [[agg_quantile_partial_merge]]: stage
    * the per-(priority, status) hash-sampled partial (what each cube
    * cell persists), merge up to priority by UNION (a projection — no
    * rescan of `orders`), then nearest-rank q25/q50/q75 of the merged
    * sample with the same rank convention as agg_approx_quantile.
    * `n_partials` counts the cells merged so the rollup provably
    * consumed >1 partial per output row.
    */
  private lazy val quantilePartialMergeSql: String =
    """WITH partials AS (
      |  SELECT o_orderpriority AS prio, o_orderstatus AS st,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |  WHERE ((o_orderkey % 1000003) * 2654435761 % 1000003) % 16 = 0),
      |cells AS (
      |  SELECT prio, CAST(count(DISTINCT st) AS BIGINT) AS n_partials
      |  FROM partials GROUP BY prio),
      |merged AS (SELECT prio, cents FROM partials),
      |n AS (SELECT prio, CAST(count(*) AS BIGINT) AS n FROM merged GROUP BY prio),
      |r AS (SELECT prio, cents,
      |             CAST(row_number() OVER (PARTITION BY prio ORDER BY cents) AS BIGINT) AS rn
      |      FROM merged),
      |picks AS (SELECT prio, n,
      |    CAST(floor(CAST(0.25 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r25,
      |    CAST(floor(CAST(0.50 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r50,
      |    CAST(floor(CAST(0.75 AS DOUBLE) * (n - 1) + 0.5) AS BIGINT) + 1 AS r75
      |  FROM n),
      |q AS (SELECT p.prio, max(p.n) AS n_sample,
      |        CAST(max(CASE WHEN r.rn = p.r25 THEN r.cents END) AS BIGINT) AS q25_cents,
      |        CAST(max(CASE WHEN r.rn = p.r50 THEN r.cents END) AS BIGINT) AS q50_cents,
      |        CAST(max(CASE WHEN r.rn = p.r75 THEN r.cents END) AS BIGINT) AS q75_cents
      |      FROM picks p JOIN r ON r.prio = p.prio GROUP BY p.prio)
      |SELECT q.prio AS o_orderpriority, n_sample, c.n_partials,
      |       q25_cents, q50_cents, q75_cents
      |FROM q JOIN cells c ON c.prio = q.prio
      |ORDER BY o_orderpriority""".stripMargin

  /** Shared Spark/DuckDB SQL for [[stat_fdr_storey]] — the fdr_bh
    * pipeline plus the pi-zero scalar and the adaptive cutoff. pi0 is
    * clamped from below at 1/m (ADVICE r14): with every p <= 0.5 the
    * naive estimator is exactly 0 and the cutoff p <= rnk*alpha/m/pi0
    * degenerates to +Infinity (all-reject); the 1/m floor is the
    * standard guard in published Storey implementations.
    */
  private lazy val storeySql: String =
    """WITH bysrc AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS ns,
      |         CAST(sum(n_chars) AS BIGINT) AS ss,
      |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sss
      |  FROM documents GROUP BY source),
      |g AS (
      |  SELECT CAST(sum(ns) AS BIGINT) AS n, CAST(sum(ss) AS BIGINT) AS sg,
      |         CAST(sum(sss) AS BIGINT) AS ssg, CAST(count(*) AS BIGINT) AS m
      |  FROM bysrc),
      |zz AS (
      |  SELECT source,
      |         abs((CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE) - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
      |             / (sqrt(CAST(ssg AS DOUBLE) / CAST(n AS DOUBLE)
      |                     - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)))
      |                / sqrt(CAST(ns AS DOUBLE)))) AS zabs
      |  FROM bysrc CROSS JOIN g),
      |pv AS (
      |  SELECT source,
      |         exp(CAST(-0.717 AS DOUBLE) * zabs + CAST(-0.416 AS DOUBLE) * zabs * zabs) AS p
      |  FROM zz),
      |r AS (
      |  SELECT source, p,
      |         CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS rnk
      |  FROM pv),
      |pz AS (
      |  SELECT greatest(CAST(1 AS DOUBLE) / m,
      |           least(CAST(1 AS DOUBLE),
      |             (SELECT CAST(count(*) AS BIGINT) FROM pv
      |              WHERE p > CAST(0.5 AS DOUBLE))
      |             / (CAST(0.5 AS DOUBLE) * m))) AS pi0, m
      |  FROM g),
      |cut AS (
      |  SELECT max(CASE WHEN p <= rnk / CAST(m AS DOUBLE) * CAST(0.1 AS DOUBLE)
      |                  THEN rnk ELSE CAST(0 AS BIGINT) END) AS c_bh,
      |         max(CASE WHEN p <= rnk / CAST(m AS DOUBLE) * CAST(0.1 AS DOUBLE) / pi0
      |                  THEN rnk ELSE CAST(0 AS BIGINT) END) AS c_st
      |  FROM r CROSS JOIN pz)
      |SELECT source,
      |       CAST(floor(p * 1000000 + 0.5) AS BIGINT) AS p_e6,
      |       rnk,
      |       CAST(floor(pi0 * 1000000 + 0.5) AS BIGINT) AS pi0_e6,
      |       rnk <= c_bh AS rejected_bh,
      |       rnk <= c_st AS rejected_storey
      |FROM r CROSS JOIN pz CROSS JOIN cut
      |ORDER BY rnk""".stripMargin
}
