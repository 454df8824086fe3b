package graft.ops

import graft.{Q, Tables, util}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality operators — the validation pass a 100 TB ingest runs before
  * promoting a landed batch (SURVEY.md §3.1: the reference's replica is only
  * useful if the sync is provably complete and keyed correctly).
  *
  * Scale posture: every check here is a single declarative plan over the
  * audited table — one scan for the profile (all column stats as one
  * aggregate row, no per-column passes), one broadcast or shuffle join for
  * the referential checks. Nothing collects data to the driver; the output
  * is a handful of verdict rows regardless of input size.
  */
object Quality {

  val defs: Seq[Q] = Seq(
    Q(
      "dq_observed_metrics",
      // In-flight pipeline observability via `observe()` (CollectMetrics):
      // the metrics ride INSIDE the job that does the real work — no
      // second scan, no separate audit query, which at 100 TB is the
      // difference between free telemetry and doubling the read bill. The
      // row runs a filtered projection while observing row count, sum,
      // and null count; the metrics row (read back from the executed
      // QueryExecution) is the output. Oracle: recompute the same
      // aggregates declaratively.
      (s, dir) => {
        val obs = new org.apache.spark.sql.Observation()
        val observed = Tables.events(s, dir)
          .filter(col("event_type") =!= "error")
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .observe(obs,
            count(lit(1)).as("n_rows"),
            sum(col("cents")).as("sum_cents"),
            count(when(col("props").isNull, 1)).as("n_null_props"))
        // the observed action: a distributed count — metrics ride with it
        observed.count()
        val m = obs.get
        import s.implicits._
        Seq((m("n_rows").asInstanceOf[Long], m("sum_cents").asInstanceOf[Long],
          m("n_null_props").asInstanceOf[Long]))
          .toDF("n_rows", "sum_cents", "n_null_props")
      },
      Some("""SELECT count(*) AS n_rows,
             |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
             |       count(*) FILTER (WHERE props IS NULL) AS n_null_props
             |FROM events WHERE event_type <> 'error'""".stripMargin)
    ),
    Q(
      "dq_profile_columns",
      // Column-profile-in-one-pass: null counts, distinct counts, min/max
      // and length stats for several columns computed as ONE aggregate row
      // (then unpivoted for readability). The alternative — one pass per
      // column — scans the table C times; this shape is a single
      // two-phase HashAggregate no matter how many columns are profiled.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val prof = o.agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderpriority")).as("prio_nonnull"),
          countDistinct(col("o_orderpriority")).as("prio_distinct"),
          countDistinct(col("o_orderstatus")).as("status_distinct"),
          min(col("o_totalprice")).as("price_min"),
          max(col("o_totalprice")).as("price_max"),
          min(col("o_orderdate")).as("date_min"),
          max(col("o_orderdate")).as("date_max"),
          max(col("o_orderkey")).as("key_max"))
        prof.select(
          col("n_rows"), col("prio_nonnull"), col("prio_distinct"),
          col("status_distinct"),
          util.r2(col("price_min")).as("price_min"),
          util.r2(col("price_max")).as("price_max"),
          col("date_min"), col("date_max"), col("key_max"))
      },
      Some(s"""SELECT count(*) AS n_rows,
              |       count(o_orderpriority) AS prio_nonnull,
              |       count(DISTINCT o_orderpriority) AS prio_distinct,
              |       count(DISTINCT o_orderstatus) AS status_distinct,
              |       ${util.r2sql("min(o_totalprice)")} AS price_min,
              |       ${util.r2sql("max(o_totalprice)")} AS price_max,
              |       min(o_orderdate) AS date_min,
              |       max(o_orderdate) AS date_max,
              |       max(o_orderkey) AS key_max
              |FROM orders""".stripMargin)
    ),
    Q(
      "dq_constraint_check",
      // Referential + key constraints as count-of-violations rows: primary
      // key uniqueness on orders, foreign-key containment lineitem→orders
      // and orders→customer, and a domain check on o_orderstatus. Each
      // check is a left_anti join (dim side broadcast when small) or a
      // grouped HAVING — violation sets are counted distributed, never
      // shipped; at 100 TB a green run moves 4 longs to the driver.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val li = Tables(s, dir, "lineitem")
        val c = Tables(s, dir, "customer")
        val pkDup = o.groupBy(col("o_orderkey")).count().filter(col("count") > 1)
        val fkLi = li.join(o.select(col("o_orderkey")),
          li("l_orderkey") === o("o_orderkey"), "left_anti")
        val fkCust = o.join(c.select(col("c_custkey")),
          o("o_custkey") === c("c_custkey"), "left_anti")
        val domain = o.filter(!col("o_orderstatus").isin("O", "F", "P"))
        def verdict(name: String, bad: org.apache.spark.sql.DataFrame) =
          bad.agg(count(lit(1)).as("n_violations"))
            .select(lit(name).as("check"), col("n_violations"))
        verdict("fk_lineitem_orders", fkLi)
          .unionByName(verdict("fk_orders_customer", fkCust))
          .unionByName(verdict("pk_orders_unique", pkDup))
          .unionByName(verdict("status_domain", domain))
          .orderBy(col("check"))
      },
      Some("""SELECT 'fk_lineitem_orders' AS "check",
             |       (SELECT count(*) FROM lineitem
             |        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_violations
             |UNION ALL
             |SELECT 'fk_orders_customer',
             |       (SELECT count(*) FROM orders
             |        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
             |UNION ALL
             |SELECT 'pk_orders_unique',
             |       (SELECT count(*) FROM (
             |          SELECT o_orderkey FROM orders
             |          GROUP BY o_orderkey HAVING count(*) > 1) d)
             |UNION ALL
             |SELECT 'status_domain',
             |       (SELECT count(*) FROM orders
             |        WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
             |ORDER BY "check"""".stripMargin)
    ),
    Q(
      "dq_expectations_quarantine",
      // The dead-letter pattern: every row is evaluated against an
      // expectation battery IN ONE PASS (each check a boolean column —
      // no per-check scans), failing rows are quarantined WITH their
      // reason list (sorted, comma-joined — deterministic), passing rows
      // flow on. The clean fixture would quarantine nothing, so
      // corruption is synthesized deterministically on o_orderkey % 101
      // ∈ {7, 13, 29}: negative price, out-of-domain status, null
      // custkey. At 100 TB this is one map-side projection + a filter —
      // the quarantine sink receives O(bad rows), and the reason strings
      // make triage a group-by, not a re-scan.
      (s, dir) => {
        val corrupted = Tables(s, dir, "orders")
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 101 === 7, -col("o_totalprice"))
              .otherwise(col("o_totalprice")))
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 101 === 13, lit("X"))
              .otherwise(col("o_orderstatus")))
          .withColumn("o_custkey",
            when(col("o_orderkey") % 101 === 29, lit(null).cast("long"))
              .otherwise(col("o_custkey")))
        val checks = Seq(
          "nonneg_price" -> (col("o_totalprice") >= 0),
          "status_domain" -> col("o_orderstatus").isin("O", "F", "P"),
          "custkey_not_null" -> col("o_custkey").isNotNull)
        val reasons = array_sort(filter(
          array(checks.map { case (n, ok) =>
            when(!ok, lit(n)).otherwise(lit(null).cast("string")) }: _*),
          r => r.isNotNull))
        corrupted
          .withColumn("reasons", reasons)
          .filter(size(col("reasons")) > 0)
          .select(col("o_orderkey"),
            array_join(col("reasons"), ",").as("reasons"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH corrupted AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 101 = 7 THEN -o_totalprice
             |              ELSE o_totalprice END AS price,
             |         CASE WHEN o_orderkey % 101 = 13 THEN 'X'
             |              ELSE o_orderstatus END AS status,
             |         CASE WHEN o_orderkey % 101 = 29 THEN NULL
             |              ELSE o_custkey END AS custkey
             |  FROM orders)
             |SELECT o_orderkey,
             |       array_to_string(list_sort(list_filter(ARRAY[
             |         CASE WHEN NOT (price >= 0) THEN 'nonneg_price' END,
             |         CASE WHEN NOT (status IN ('O', 'F', 'P')) THEN 'status_domain' END,
             |         CASE WHEN NOT (custkey IS NOT NULL) THEN 'custkey_not_null' END],
             |         r -> r IS NOT NULL)), ',') AS reasons
             |FROM corrupted
             |WHERE len(list_filter(ARRAY[
             |         CASE WHEN NOT (price >= 0) THEN 'nonneg_price' END,
             |         CASE WHEN NOT (status IN ('O', 'F', 'P')) THEN 'status_domain' END,
             |         CASE WHEN NOT (custkey IS NOT NULL) THEN 'custkey_not_null' END],
             |         r -> r IS NOT NULL)) > 0
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "dq_calendar_gaps",
      // Calendar-gap audit (round-9): for each event type, the days in
      // the corpus span where that feed went SILENT — the
      // missing-partition detector every ingestion monitor runs (a feed
      // that skipped Tuesday shows up here before any aggregate looks
      // wrong). The expected spine is generated (sequence over the
      // global min..max day — O(days), no table), cross-joined with the
      // O(types) type list, and outer-joined against observed (type, day)
      // cells; the verdict is the per-type coverage summary (expected /
      // observed / missing day counts + the first gap) so a healthy feed
      // still emits an auditable row per type. Everything after the one
      // per-(type, day) count is metadata-sized.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cells = ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        val span = ev.agg(min(to_date(col("ts"))).as("mn"),
          max(to_date(col("ts"))).as("mx"))
        val spine = span
          .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
          .crossJoin(ev.select(col("event_type")).distinct())
        spine.join(cells,
            spine("day") === cells("d") &&
              spine("event_type") === cells("event_type"), "left")
          .groupBy(spine("event_type"))
          .agg(count(lit(1)).as("expected_days"),
            sum(when(cells("d").isNotNull, 1L).otherwise(0L)).as("observed_days"),
            sum(when(cells("d").isNull, 1L).otherwise(0L)).as("missing_days"),
            min(when(cells("d").isNull, spine("day"))).as("first_gap_day"))
          .orderBy(col("event_type"))
      },
      Some("""WITH span AS (
             |  SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS mn,
             |         CAST(date_trunc('day', max(ts)) AS DATE) AS mx
             |  FROM events),
             |spine AS (
             |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM span),
             |types AS (SELECT DISTINCT event_type FROM events),
             |cells AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d
             |  FROM events GROUP BY 1, 2)
             |SELECT t.event_type,
             |       CAST(count(*) AS BIGINT) AS expected_days,
             |       CAST(sum(CASE WHEN c.d IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS observed_days,
             |       CAST(sum(CASE WHEN c.d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_days,
             |       min(CASE WHEN c.d IS NULL THEN s.day END) AS first_gap_day
             |FROM spine s CROSS JOIN types t
             |LEFT JOIN cells c ON c.d = s.day AND c.event_type = t.event_type
             |GROUP BY t.event_type
             |ORDER BY t.event_type""".stripMargin)
    ),
    Q(
      "dq_distribution_psi",
      // Population Stability Index (round-9): THE drift score risk/ML
      // monitoring uses to decide "has this feature's distribution moved
      // enough to retrain/alert" (rule of thumb: 0.1 warn, 0.25 act).
      // Here: event-type mix, first half of the month vs second. Both
      // distributions are e6-pinned integers BEFORE any float touches
      // them; each bucket's term (pᵢ−qᵢ)·ln(pᵢ/qᵢ) is assembled from
      // those pinned integers and e6-floored PER BUCKET before the final
      // sum (the chi-square discipline — bucket arrival order can never
      // move a bit). Terms are provably ≥ 0, so floor(x+0.5) is exact.
      // The whole op is two partial-agg passes over O(buckets) cells —
      // at 100 TB the exchange carries 5 rows.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cut = "2024-01-16"
        val cells = Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("ts") < lit(cut).cast("timestamp_ntz"), 1L)
              .otherwise(0L)).as("np"),
            sum(when(col("ts") >= lit(cut).cast("timestamp_ntz"), 1L)
              .otherwise(0L)).as("nq"))
        cells
          .withColumn("p_e6", expr(
            "CAST(floor(CAST(np AS DOUBLE) / CAST(sum(np) OVER () AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"))
          .withColumn("q_e6", expr(
            "CAST(floor(CAST(nq AS DOUBLE) / CAST(sum(nq) OVER () AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"))
          .withColumn("term_e6", expr(
            "CAST(floor((CAST(p_e6 AS DOUBLE) - CAST(q_e6 AS DOUBLE)) * ln(CAST(p_e6 AS DOUBLE) / CAST(q_e6 AS DOUBLE)) / 1000000 * 1000000 + 0.5) AS BIGINT)"))
          .withColumn("psi_e6", sum(col("term_e6")).over(Window.partitionBy()))
          .select(col("event_type"), col("p_e6"), col("q_e6"),
            col("term_e6"), col("psi_e6"))
          .orderBy(col("event_type"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type,
             |         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS np,
             |         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS nq
             |  FROM events GROUP BY event_type),
             |pin AS (
             |  SELECT event_type,
             |         CAST(floor(CAST(np AS DOUBLE) / CAST(sum(np) OVER () AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS p_e6,
             |         CAST(floor(CAST(nq AS DOUBLE) / CAST(sum(nq) OVER () AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q_e6
             |  FROM cells),
             |t AS (
             |  SELECT event_type, p_e6, q_e6,
             |         CAST(floor((CAST(p_e6 AS DOUBLE) - CAST(q_e6 AS DOUBLE))
             |                    * ln(CAST(p_e6 AS DOUBLE) / CAST(q_e6 AS DOUBLE))
             |                    / 1000000 * 1000000 + 0.5) AS BIGINT) AS term_e6
             |  FROM pin)
             |SELECT event_type, p_e6, q_e6, term_e6,
             |       CAST(sum(term_e6) OVER () AS BIGINT) AS psi_e6
             |FROM t ORDER BY event_type""".stripMargin)
    ),
    Q(
      "dq_snapshot_drift",
      // Round-trip completeness: compare the landed replica (here: a
      // partition-restricted re-land of orders) against its source by
      // per-group row counts and an order-insensitive content checksum
      // (sum of per-row hashes) — the cheap way to prove a 100 TB sync
      // moved every row without sorting either side. Checksum arithmetic
      // is pure BIGINT (xxhash-free: portable crc-less column fold) so the
      // oracle reproduces it exactly.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        // content hash per row: integer fold of key/status/price-cents,
        // reduced mod 2^31-1 so the per-group BIGINT sum stays far from
        // overflow (ANSI mode would throw) — every term positive, and `%`
        // truncates identically in both engines on positive operands.
        // ascii() stands in for a string hash (status is one char; DuckDB
        // has no crc32) — a longer column would use the portable
        // polynomial fold proven on MinHash.
        val rowHash =
          // r9 ScaleStress: residue-first so the product can't overflow
          // ANSI BIGINT at very large key spaces (raw key * 1e6 breaks
          // past orderkey ~9e12)
          ((col("o_orderkey") % lit(2147483647L)) * lit(1000003L) +
            ascii(col("o_orderstatus")).cast("long") * lit(10007L) +
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")) % lit(2147483647L)
        o.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_rows"),
            sum(rowHash).as("content_sum"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_rows,
             |       CAST(sum(((o_orderkey % 2147483647) * 1000003
             |                 + CAST(ascii(o_orderstatus) AS BIGINT) * 10007
             |                 + CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) % 2147483647) AS BIGINT) AS content_sum
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)
    ),
    Q(
      "dq_cross_table_consistency",
      // CROSS-TABLE invariant audit (round-9): does each order's header
      // total agree with the sum of its lines (net × (1+tax))? — the
      // denormalization-drift check every replica runs after a sync,
      // because header/detail tables replicate on separate feeds and a
      // partial sync shows up exactly here. Everything is exact cents;
      // one key-shuffle aggregate + one broadcast-able join; output is a
      // 1-row verdict regardless of scale. (The synthetic fixture is
      // largely INconsistent by construction — the audit's numbers prove
      // it measures, not assumes.)
      (s, dir) => graft.Catalog.sql(s, dir, consistencySql),
      Some(consistencySql)
    ),
    Q(
      "dq_freshness_slo",
      // Per-stream freshness audit (round-9): minutes of lag between each
      // event type's newest record and the corpus high-water mark, with a
      // 2-hour SLO verdict — the "is this feed stale" check every
      // replication monitor runs after a sync (a silently-dead producer
      // shows up here before it shows up as wrong numbers anywhere else).
      // Two tiny aggregates (per-type max, global max) and exact µs
      // integer arithmetic; output is O(types) rows at any scale.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val perType = ev.groupBy(col("event_type"))
          .agg(max(col("ts")).as("newest"), count(lit(1)).as("n_rows"))
        val global = ev.agg(max(col("ts")).as("hwm"))
        perType.crossJoin(global)
          .select(col("event_type"), col("n_rows"),
            // ts is NTZ; session TZ is pinned UTC, so the cast is the
            // identity instant and unix_micros is exact
            expr("""CAST((unix_micros(CAST(hwm AS TIMESTAMP))
                    - unix_micros(CAST(newest AS TIMESTAMP))) div 60000000 AS BIGINT)""")
              .as("lag_minutes"))
          .withColumn("slo_ok",
            (col("lag_minutes") <= 120).cast("boolean"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (SELECT max(ts) AS hwm FROM events),
             |t AS (SELECT event_type, max(ts) AS newest,
             |             CAST(count(*) AS BIGINT) AS n_rows
             |      FROM events GROUP BY event_type)
             |SELECT event_type, n_rows,
             |       CAST((epoch_us(hwm) - epoch_us(newest)) // 60000000 AS BIGINT) AS lag_minutes,
             |       (epoch_us(hwm) - epoch_us(newest)) // 60000000 <= 120 AS slo_ok
             |FROM t, m ORDER BY event_type""".stripMargin)
    ),
    Q(
      "dq_referential_integrity",
      // FK orphan audit across the replica's five foreign-key edges
      // (round-9): the integrity check every CDC replication pipeline runs
      // after a sync — children whose parent key resolves to nothing.
      // Each edge is one left join + a null-count conditional sum; the
      // small parents broadcast, so every check is a map-side probe over
      // the child scan (no child-table shuffle at any scale). Identical
      // SQL text runs on both engines; orphan counts of zero are the
      // asserted-good state, with child totals keeping the row non-vacuous.
      (s, dir) => graft.Catalog.sql(s, dir, refIntegritySql),
      Some(refIntegritySql)
    ),
    Q(
      "dq_record_linkage_fs",
      // Fellegi–Sunter probabilistic record linkage (round-10): the
      // entity-resolution core of every MDM / customer-360 merge. Two
      // "files" — the master and a deterministically degraded CRM copy
      // (1-in-7 names mangled, 1-in-5 phones reformatted) — are blocked
      // on (nation, coarse balance band), candidate pairs scored by
      // summing per-field agreement weights, and thresholded into
      // match / possible / non_match. Weights are PRECOMPUTED integer
      // milli-units of log2(m/u) — the FS log-likelihood ratios — so
      // scoring is pure BIGINT and no cross-engine libm call exists.
      // Scale: blocking keeps candidates O(n·block_size), never n²; at
      // 100 TB the block key is the shuffle key and each block compares
      // locally — the standard linkage topology. The census counts both
      // error modes: true pairs pushed below threshold by double
      // perturbation (FN) and cross-id pairs that never out-score the
      // disagreement penalties (no FP at these weights).
      (s, dir) => graft.Catalog.sql(s, dir, linkageSql),
      Some(linkageSql)
    ),
    Q(
      "dq_drift_psi",
      // Population Stability Index (round-9): THE ML-monitoring drift
      // metric — PSI = Σ (p_a − p_b)·ln(p_a/p_b) over fixed value bands,
      // comparing the pre-1998 order-price distribution against 1998+.
      // Bands are deterministic integer cents bins (no quantile
      // estimation to disagree on), proportions are Laplace-smoothed
      // ((n+1)/(N+10)) so an empty band can't divide by zero, and the
      // ln arithmetic runs once per band with identical formula text,
      // e6-pinned. One contingency aggregate, 10 output rows at any
      // scale; monitors read contrib and sum.
      (s, dir) => graft.Catalog.sql(s, dir, psiSql),
      Some(psiSql)
    ),
    Q(
      "stat_jackknife_ci",
      // Block-jackknife standard error (round-9): the cluster-robust
      // uncertainty every experiment platform needs when rows within a
      // user correlate (a plain s/√n SE is too small). Users hash into
      // 20 blocks; leave-one-block-out means θ₍ᵢ₎ fold from exact BIGINT
      // (Σ, n) totals, and SE² = (B−1)/B · Σ(θ₍ᵢ₎ − θ̄)². Deterministic
      // alternative to bootstrap (no RNG anywhere); one map-side block
      // aggregate + an O(B) fold; CI = θ ± 1.96·SE, all pinned e6.
      (s, dir) => graft.Catalog.sql(s, dir, jackknifeSql),
      Some(jackknifeSql)
    ),
    Q(
      "dq_table_checksum",
      // Replica checksum comparison (round-9): prove two tables identical
      // WITHOUT moving either — per-group row count + commutative sum of
      // a deterministic per-row hash, so the digest is invariant to
      // partitioning, ordering, and engine, and a mismatched group names
      // the drifted slice for a targeted re-sync (the final handshake of
      // every CDC pipeline: cdc_snapshot_reconcile diffs rows, THIS
      // answers "need we diff at all" with O(groups) bytes). Replica B is
      // the fixture with deterministic drift injected (one key class
      // +1 cent, one dropped) so the audit provably detects. Pure BIGINT:
      // hash < 10^9 keeps a 10^9-row group inside int64; production would
      // fold partial sums mod 2^61 (noted, same algebra).
      (s, dir) => graft.Catalog.sql(s, dir, checksumSql),
      Some(checksumSql)
    ),
    Q(
      "dq_volume_anomaly",
      // Partition-volume SLA (round-9): did each day's feed arrive
      // COMPLETE? Compares every day's event count to its trailing
      // 7-day window (excluding itself) with pure-integer cross
      // multiplication — `cnt · 2 · n_prev < sum_prev` flags a >50% drop,
      // `cnt · n_prev > 2 · sum_prev` a >2× surge — so no float threshold
      // can drift between engines. Freshness (dq_freshness_slo) catches a
      // dead feed; THIS catches the half-delivered one, which is the
      // failure mode that silently halves a day of training data. One
      // daily rollup + one O(days) window pass.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(expr("CAST(date_trunc('day', ts) AS DATE)").as("d"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(col("d")).rowsBetween(-7, -1)
        daily
          .withColumn("sum_prev", sum(col("cnt")).over(w))
          .withColumn("n_prev", count(col("cnt")).over(w))
          .filter(col("n_prev") >= 3)
          .select(col("d"), col("cnt"), col("sum_prev"), col("n_prev"),
            (col("cnt") * 2 * col("n_prev") < col("sum_prev")).as("drop_alert"),
            (col("cnt") * col("n_prev") > col("sum_prev") * 2).as("surge_alert"))
          .orderBy(col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1),
             |t AS (
             |  SELECT d, cnt,
             |    CAST(sum(cnt) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS sum_prev,
             |    CAST(count(cnt) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n_prev
             |  FROM daily)
             |SELECT d, cnt, sum_prev, n_prev,
             |       cnt * 2 * n_prev < sum_prev AS drop_alert,
             |       cnt * n_prev > sum_prev * 2 AS surge_alert
             |FROM t WHERE n_prev >= 3 ORDER BY d""".stripMargin)
    ),
    Q(
      "dq_benford_law",
      // Benford first-digit audit (round-9): compare the leading-digit
      // distribution of order totals against Benford's law — the fraud /
      // fabricated-data screen financial DQ suites run, and a strong
      // synthetic-data detector (uniform generators fail it loudly, as
      // the fixture itself demonstrates). Leading digit via BIGINT-cents
      // → string head (identical text both engines, no float log tricks
      // on the extraction path); expected share log10(1+1/d); per-digit
      // χ² contribution e6-pinned. One map-side-combined digit histogram
      // → 9 output rows at any scale.
      (s, dir) => {
        val digits = Tables(s, dir, "orders")
          .select(expr(
            "CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING), 1, 1) AS INT)")
            .as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("obs"))
        val tot = digits.agg(sum(col("obs")).as("n"))
        digits.crossJoin(broadcast(tot))
          .withColumn("exp_share", expr("log10(1 + 1 / CAST(digit AS DOUBLE))"))
          .select(col("digit").cast("long").as("digit"), col("obs"),
            expr("CAST(floor(exp_share * CAST(n AS DOUBLE) * 100 + 0.5) AS BIGINT)")
              .as("expected_x100"),
            expr("""CAST(floor(
                   |  (CAST(obs AS DOUBLE) - exp_share * CAST(n AS DOUBLE))
                   |  * (CAST(obs AS DOUBLE) - exp_share * CAST(n AS DOUBLE))
                   |  / (exp_share * CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)""".stripMargin)
              .as("chi2_contrib_e6"))
          .orderBy(col("digit"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM orders),
             |h AS (SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM d GROUP BY digit),
             |t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM h)
             |SELECT CAST(digit AS BIGINT) AS digit, obs,
             |       CAST(floor(log10(1 + 1 / CAST(digit AS DOUBLE)) * CAST(n AS DOUBLE) * 100 + 0.5) AS BIGINT) AS expected_x100,
             |       CAST(floor(
             |         (CAST(obs AS DOUBLE) - log10(1 + 1 / CAST(digit AS DOUBLE)) * CAST(n AS DOUBLE))
             |         * (CAST(obs AS DOUBLE) - log10(1 + 1 / CAST(digit AS DOUBLE)) * CAST(n AS DOUBLE))
             |         / (log10(1 + 1 / CAST(digit AS DOUBLE)) * CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS chi2_contrib_e6
             |FROM h CROSS JOIN t ORDER BY digit""".stripMargin)
    ),
    Q(
      "dq_fk_inference",
      // Inclusion-dependency discovery (round-11): infer FOREIGN-KEY
      // candidates by measuring, for each plausible column pair, what
      // fraction of the child side's distinct values is contained in the
      // parent side — the Binder/SPIDER profiling step that reconstructs
      // a replica's referential skeleton when the upstream ships no
      // constraints (the reference's Canvas tables declare none in the
      // warehouse copy). A pair is an FK candidate at containment = 1.0;
      // near-1 pairs flag orphaned rows. Distinct sets are aggregated
      // per side FIRST (map-side combine), so the containment join
      // touches |distinct| rows, never the fact tables; the pair list is
      // declared (schema-driven), not a blind O(columns²) sweep. Exact
      // integer counts; the e6 ratio is one integer division.
      (s, dir) => {
        val pairs = Seq(
          ("lineitem.l_orderkey", "orders.o_orderkey",
            Tables(s, dir, "lineitem").select(col("l_orderkey").as("v")),
            Tables(s, dir, "orders").select(col("o_orderkey").as("v"))),
          ("orders.o_custkey", "customer.c_custkey",
            Tables(s, dir, "orders").select(col("o_custkey").as("v")),
            Tables(s, dir, "customer").select(col("c_custkey").as("v"))),
          ("lineitem.l_partkey", "part.p_partkey",
            Tables(s, dir, "lineitem").select(col("l_partkey").as("v")),
            Tables(s, dir, "part").select(col("p_partkey").as("v"))),
          ("orders.o_orderkey", "lineitem.l_orderkey", // deliberate REVERSE:
            // orders with no lineitems break containment — the row that
            // proves the measure is directional, not symmetric
            Tables(s, dir, "orders").select(col("o_orderkey").as("v")),
            Tables(s, dir, "lineitem").select(col("l_orderkey").as("v"))))
        pairs.map { case (childName, parentName, child, parent) =>
          // one pass per pair (guide §2.4): the parent side is distinct,
          // so a LEFT join marks containment without fanout and both
          // counts fall out of a single aggregation — the old shape
          // recomputed the child distinct for the semi-join leg and
          // joined two scalar aggregates back together
          val c = child.distinct()
          val p = parent.distinct().withColumn("hit", lit(1))
          c.join(p, Seq("v"), "left")
            .agg(count(lit(1)).as("n_child"),
              count(col("hit")).as("n_contained"))
            .select(
              lit(childName).as("child"), lit(parentName).as("parent"),
              col("n_child"), col("n_contained"),
              expr("n_contained * 1000000 div n_child").as("containment_e6"))
        }.reduce(_ unionByName _).orderBy(col("child"), col("parent"))
      },
      Some("""WITH m AS (
             |  SELECT 'lineitem.l_orderkey' AS child, 'orders.o_orderkey' AS parent,
             |         (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_child,
             |         (SELECT count(DISTINCT l_orderkey) FROM lineitem
             |          WHERE l_orderkey IN (SELECT o_orderkey FROM orders)) AS n_contained
             |  UNION ALL
             |  SELECT 'orders.o_custkey', 'customer.c_custkey',
             |         (SELECT count(DISTINCT o_custkey) FROM orders),
             |         (SELECT count(DISTINCT o_custkey) FROM orders
             |          WHERE o_custkey IN (SELECT c_custkey FROM customer))
             |  UNION ALL
             |  SELECT 'lineitem.l_partkey', 'part.p_partkey',
             |         (SELECT count(DISTINCT l_partkey) FROM lineitem),
             |         (SELECT count(DISTINCT l_partkey) FROM lineitem
             |          WHERE l_partkey IN (SELECT p_partkey FROM part))
             |  UNION ALL
             |  SELECT 'orders.o_orderkey', 'lineitem.l_orderkey',
             |         (SELECT count(DISTINCT o_orderkey) FROM orders),
             |         (SELECT count(DISTINCT o_orderkey) FROM orders
             |          WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)))
             |SELECT child, parent, CAST(n_child AS BIGINT) AS n_child,
             |       CAST(n_contained AS BIGINT) AS n_contained,
             |       CAST(n_contained AS BIGINT) * 1000000
             |         // CAST(n_child AS BIGINT) AS containment_e6
             |FROM m ORDER BY child, parent""".stripMargin)
    ),
    Q(
      "dq_candidate_keys",
      // Candidate-key discovery profile (round-9): for a battery of
      // column combos over orders, compare distinct count to row count —
      // the "is this a key" audit schema-inference and CDC-merge setup
      // both need (a wrong merge key silently folds rows; dq rows exist
      // to catch that BEFORE cdc_upsert_latest runs). One pass, four
      // exact count-distincts (Catalyst expands to one shuffle per
      // distinct group — bounded, map-side-combined); O(1) output.
      (s, dir) => {
        Tables(s, dir, "orders")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("o_orderkey")).as("d_orderkey"),
            countDistinct(col("o_custkey")).as("d_custkey"),
            countDistinct(col("o_custkey"), col("o_orderdate")).as("d_cust_date"),
            countDistinct(col("o_orderstatus"), col("o_orderpriority"))
              .as("d_status_prio"))
          .select(col("n_rows"), col("d_orderkey"),
            (col("d_orderkey") === col("n_rows")).as("orderkey_is_key"),
            col("d_custkey"), col("d_cust_date"), col("d_status_prio"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d_orderkey,
             |       count(DISTINCT o_orderkey) = count(*) AS orderkey_is_key,
             |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS d_custkey,
             |       CAST(count(DISTINCT (o_custkey, o_orderdate)) AS BIGINT) AS d_cust_date,
             |       CAST(count(DISTINCT (o_orderstatus, o_orderpriority)) AS BIGINT) AS d_status_prio
             |FROM orders""".stripMargin)
    ),
Q(
      "dq_monotonic_violations",
      // Out-of-order arrival audit (round-13): per user, how often does
      // event-time REGRESS when events are read in ingestion (event_id)
      // order — the number that calibrates every streaming watermark in
      // §2.10 (a 95th-percentile regression of 40 s says
      // `withWatermark("40 seconds")` is too tight). Violations and the
      // regression magnitudes are exact ts_ns BIGINT arithmetic off one
      // lag window per user; output is a per-event-type rollup plus the
      // max regression for sizing.
      // Scale: one window partitioned by user (never global), one
      // map-side-combinable rollup — shuffle carries user partitions
      // then O(types) rows.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("prev_ns", lag(col("ts_ns"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
        e.filter(col("prev_ns").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_steps"),
            sum(when(col("ts_ns") < col("prev_ns"), 1L).otherwise(0L))
              .as("n_violations"),
            max(when(col("ts_ns") < col("prev_ns"),
              col("prev_ns") - col("ts_ns")).otherwise(0L))
              .as("max_regression_ns"))
          .select(col("event_type"), col("n_steps"), col("n_violations"),
            expr("CAST(floor(CAST(n_violations AS DOUBLE) / n_steps * 1000000 + 0.5) AS BIGINT)")
              .as("violation_rate_e6"),
            expr("max_regression_ns DIV 1000000000").as("max_regression_s"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT event_type, epoch_ns(ts) AS ts_ns,
             |         lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ns
             |  FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_steps,
             |       CAST(sum(CASE WHEN ts_ns < prev_ns THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             |       CAST(floor(CAST(sum(CASE WHEN ts_ns < prev_ns THEN 1 ELSE 0 END) AS DOUBLE)
             |            / count(*) * 1000000 + 0.5) AS BIGINT) AS violation_rate_e6,
             |       CAST(max(CASE WHEN ts_ns < prev_ns THEN prev_ns - ts_ns ELSE 0 END) // 1000000000 AS BIGINT) AS max_regression_s
             |FROM e WHERE prev_ns IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    Q(
      "dq_null_completeness_matrix",
      // Column × segment completeness matrix (round-14):
      // dq_profile_columns reports corpus-wide null rates; the question
      // an ingest triage actually asks is "WHICH SLICE went dark" — a
      // feed that nulls o_totalprice only for one order status is
      // invisible in the global rate but jumps out of the matrix. The
      // staged dirt is deterministic hash-gated nulling (three columns,
      // different rates and hash offsets, one of them status-CORRELATED
      // — the realistic failure), and the matrix is long-form
      // (status, column, n_rows, n_null, null_rate_e6): one conditional
      // aggregate per slice, unpivoted by UNION so both engines emit
      // the identical frame. Scale: a single map-side-combinable
      // aggregate per status; the matrix is O(slices · columns) rows
      // regardless of table size.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(completenessSql("DIV"))
      },
      Some(completenessSql("//"))
    )
  )

  /** Shared Spark/DuckDB SQL for [[dq_null_completeness_matrix]]: stage
    * hash-gated nulls (o_totalprice nulled ~7% everywhere PLUS always
    * for status 'P' — the correlated outage; o_orderdate ~3%;
    * o_orderpriority ~12%), then the long-form per-status census.
    * `idiv` = the engine's integer-division token so `null_rate_e6`
    * is a pinned BIGINT like every other `_e6` column (ADVICE r14).
    */
  private def completenessSql(idiv: String): String =
    s"""WITH dirty AS (
      |  SELECT o_orderstatus AS st,
      |         CASE WHEN (o_orderkey % 1000003) * 2654435761 % 100 < 7
      |                OR o_orderstatus = 'P'
      |              THEN NULL ELSE o_totalprice END AS tp,
      |         CASE WHEN (o_orderkey % 999983) * 48271 % 100 < 3
      |              THEN NULL ELSE o_orderdate END AS od,
      |         CASE WHEN (o_orderkey % 1000033) * 69621 % 100 < 12
      |              THEN NULL ELSE o_orderpriority END AS op
      |  FROM orders),
      |m AS (
      |  SELECT st, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN tp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp_null,
      |         CAST(sum(CASE WHEN od IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS od_null,
      |         CAST(sum(CASE WHEN op IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS op_null
      |  FROM dirty GROUP BY st)
      |SELECT st AS o_orderstatus, col, n AS n_rows, n_null,
      |       CAST(n_null * 1000000 AS BIGINT) $idiv n AS null_rate_e6
      |FROM (
      |  SELECT st, 'o_totalprice' AS col, n, tp_null AS n_null FROM m
      |  UNION ALL SELECT st, 'o_orderdate', n, od_null FROM m
      |  UNION ALL SELECT st, 'o_orderpriority', n, op_null FROM m) u
      |ORDER BY o_orderstatus, col""".stripMargin

  /** Shared Spark/DuckDB SQL for [[dq_drift_psi]]. */
  private lazy val psiSql: String =
    """WITH binned AS (
      |  SELECT least(CAST(floor(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 2000000) AS BIGINT), 9) AS band,
      |         CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS is_a
      |  FROM orders),
      |bands AS (
      |  SELECT band,
      |         CAST(sum(is_a) AS BIGINT) AS n_a,
      |         CAST(sum(1 - is_a) AS BIGINT) AS n_b
      |  FROM binned GROUP BY band),
      |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb FROM bands),
      |p AS (
      |  SELECT band, n_a, n_b,
      |         (CAST(n_a AS DOUBLE) + 1) / (CAST(ta AS DOUBLE) + 10) AS pa,
      |         (CAST(n_b AS DOUBLE) + 1) / (CAST(tb AS DOUBLE) + 10) AS pb
      |  FROM bands CROSS JOIN tot)
      |SELECT band, n_a, n_b,
      |       CAST(floor((pa - pb) * ln(pa / pb) * 1000000 + 0.5) AS BIGINT) AS psi_contrib_e6
      |FROM p ORDER BY band""".stripMargin

  /** Shared Spark/DuckDB SQL for [[stat_jackknife_ci]]. */
  private lazy val jackknifeSql: String =
    """WITH blocks AS (
      |  SELECT CAST(user_id % 20 AS INT) AS blk,
      |         CAST(count(*) AS BIGINT) AS n_i,
      |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s_i
      |  FROM events GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(s_i) AS BIGINT) AS s,
      |         CAST(count(*) AS BIGINT) AS b
      |  FROM blocks),
      |loo AS (
      |  SELECT CAST(s - s_i AS DOUBLE) / CAST(n - n_i AS DOUBLE) AS theta_i, b, n, s
      |  FROM blocks CROSS JOIN tot),
      |f AS (
      |  SELECT max(b) AS b, max(n) AS n, max(s) AS s,
      |         avg(theta_i) AS theta_bar,
      |         sum(theta_i * theta_i) AS stt,
      |         sum(theta_i) AS st
      |  FROM loo)
      |SELECT b AS n_blocks, n AS n_rows,
      |       CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 100 + 0.5) AS BIGINT) AS theta_cents,
      |       CAST(floor(sqrt((CAST(b AS DOUBLE) - 1) / CAST(b AS DOUBLE)
      |            * (stt - st * st / CAST(b AS DOUBLE))) * 100 + 0.5) AS BIGINT) AS se_cents,
      |       CAST(floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |            - CAST(196 AS DOUBLE) / 100 * sqrt((CAST(b AS DOUBLE) - 1) / CAST(b AS DOUBLE)
      |                   * (stt - st * st / CAST(b AS DOUBLE)))) * 100 + 0.5) AS BIGINT) AS ci_lo_cents,
      |       CAST(floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |            + CAST(196 AS DOUBLE) / 100 * sqrt((CAST(b AS DOUBLE) - 1) / CAST(b AS DOUBLE)
      |                   * (stt - st * st / CAST(b AS DOUBLE)))) * 100 + 0.5) AS BIGINT) AS ci_hi_cents
      |FROM f""".stripMargin

  /** Shared Spark/DuckDB SQL for [[dq_table_checksum]]: replica A is
    * orders as landed; replica B injects deterministic drift (key%997=13
    * gains a cent, key%997=500 is dropped). Row digest mixes key, status
    * and exact cents through mod-prime multiplicative steps.
    */
  private lazy val checksumSql: String =
    """WITH a AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS grp,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |         CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 3 END AS st
      |  FROM orders),
      |b AS (
      |  SELECT k, grp,
      |         cents + CASE WHEN k % 997 = 13 THEN 1 ELSE 0 END AS cents, st
      |  FROM a WHERE k % 997 <> 500),
      |ha AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS n_a,
      |         CAST(sum(((k * 2654435761) % 1000000007
      |               + (cents * 48271) % 1000000007
      |               + st * 7919) % 1000000007) AS BIGINT) AS sum_a
      |  FROM a GROUP BY grp),
      |hb AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS n_b,
      |         CAST(sum(((k * 2654435761) % 1000000007
      |               + (cents * 48271) % 1000000007
      |               + st * 7919) % 1000000007) AS BIGINT) AS sum_b
      |  FROM b GROUP BY grp)
      |SELECT ha.grp, n_a, n_b, sum_a, sum_b,
      |       (n_a = n_b AND sum_a = sum_b) AS grp_match
      |FROM ha JOIN hb ON ha.grp = hb.grp
      |ORDER BY ha.grp""".stripMargin

  /** Shared Spark/DuckDB SQL for [[dq_record_linkage_fs]]. */
  private lazy val linkageSql: String =
    """WITH crm AS (
      |  SELECT c_custkey AS id,
      |         CASE WHEN c_custkey % 7 = 0 THEN c_name || '~' ELSE c_name END AS name,
      |         CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS seg,
      |         c_acctbal AS bal, c_nationkey AS nk
      |  FROM customer),
      |mdm AS (
      |  SELECT c_custkey AS id, c_name AS name, c_mktsegment AS seg,
      |         c_acctbal AS bal, c_nationkey AS nk
      |  FROM customer),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |         (CASE WHEN a.name = b.name THEN 4000 ELSE -1200 END
      |        + CASE WHEN a.seg = b.seg THEN 400 ELSE -2000 END
      |        + CASE WHEN a.bal = b.bal THEN 1500 ELSE -600 END) AS score
      |  FROM mdm a JOIN crm b
      |    ON a.nk = b.nk
      |   AND CAST(floor(a.bal / 500) AS BIGINT) = CAST(floor(b.bal / 500) AS BIGINT)),
      |decided AS (
      |  SELECT id_a, id_b, score,
      |         CASE WHEN score >= 5000 THEN 'match'
      |              WHEN score >= 0 THEN 'possible'
      |              ELSE 'non_match' END AS decision
      |  FROM pairs)
      |SELECT decision, CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(sum(CASE WHEN id_a = id_b THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
      |       CAST(min(score) AS BIGINT) AS min_score,
      |       CAST(max(score) AS BIGINT) AS max_score
      |FROM decided GROUP BY decision ORDER BY decision""".stripMargin

  /** Shared Spark/DuckDB SQL for [[dq_cross_table_consistency]]. */
  private lazy val consistencySql: String =
    """WITH line_sums AS (
      |  SELECT l_orderkey,
      |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS line_cents
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (
      |  SELECT o_orderkey,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
      |         coalesce(line_cents, 0) AS line_cents
      |  FROM orders LEFT JOIN line_sums ON o_orderkey = l_orderkey)
      |SELECT CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CASE WHEN abs(total_cents - line_cents) * 100 <= total_cents
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
      |       CAST(max(abs(total_cents - line_cents)) AS BIGINT) AS max_abs_dev_cents
      |FROM j""".stripMargin

  /** Shared Spark/DuckDB SQL for [[dq_referential_integrity]]. */
  private lazy val refIntegritySql: String =
    """SELECT edge, CAST(n_child AS BIGINT) AS n_child,
      |       CAST(n_orphan AS BIGINT) AS n_orphan FROM (
      |  SELECT 'lineitem.l_orderkey->orders' AS edge, count(*) AS n_child,
      |         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_orphan
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part', count(*),
      |         sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
      |  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |  UNION ALL
      |  SELECT 'lineitem.l_suppkey->supplier', count(*),
      |         sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
      |  FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer', count(*),
      |         sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |  UNION ALL
      |  SELECT 'customer.c_nationkey->nation', count(*),
      |         sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
      |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey) t
      |ORDER BY edge""".stripMargin
}
