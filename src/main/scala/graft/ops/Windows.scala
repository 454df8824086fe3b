package graft.ops

import graft.{Q, Tables, util}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.5 window functions. All windows partition by a key before ordering —
  * `WindowExec` shuffles once on the partition key and sorts within
  * partitions; none of these require a global sort. Every `orderBy` inside a
  * window includes a unique tiebreak so frame contents are deterministic
  * across engines (SURVEY.md §2 footer rule 1).
  */
object Windows {

  val defs: Seq[Q] = Seq(
    Q(
      "win_topn_group",
      // Top-3 parts per brand. At scale this is the "grouped top-k" pattern:
      // one shuffle on the group key, per-partition sort, early filter.
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        Tables(s, dir, "part")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, rn, p_partkey, p_retailprice FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |         row_number() OVER (PARTITION BY p_brand
             |                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
             |  FROM part) t
             |WHERE rn <= 3
             |ORDER BY p_brand, rn""".stripMargin)
    ),
    Q(
      "win_rank_dense",
      // l_quantity is integral-valued → plenty of ties; rank vs dense_rank
      // tie semantics are the point.
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").asc)
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             |       rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC) AS rnk,
             |       dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC) AS drnk
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),
    Q(
      "win_running_sum",
      // Cumulative total per status in (date, key) order. Both engines
      // accumulate left-to-right over the identical frame → bitwise equal.
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"), col("o_totalprice"))
          .withColumn("running_total", util.r2(sum(col("o_totalprice")).over(w)))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_orderstatus, o_orderdate, o_totalprice,
              |       ${util.r2sql("sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_total
              |FROM orders
              |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "win_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
          .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
          .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
          .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")).cast("long"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |       lag(o_orderdate)  OVER w AS prev_date,
             |       lead(o_orderdate) OVER w AS next_date,
             |       date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
             |                 CAST(o_orderdate AS DATE)) AS gap_days
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),
    Q(
      "win_range_frame",
      // Moving 1-hour sum over event time per user. Ordered by epoch
      // seconds (identical floor-truncation both sides), RANGE frame peers
      // by value not row.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("epoch_s"))
          .rangeBetween(-3600, Window.currentRow)
        ev.select(col("event_id"), col("user_id"), col("ts"), col("value"), col("ts_ns"))
          .withColumn("epoch_s", expr("ts_ns div 1000000000"))
          .withColumn("hour_sum", util.r2(sum(col("value")).over(w)))
          .drop("epoch_s", "ts_ns")
          .orderBy(col("event_id"))
      },
      Some(s"""SELECT event_id, user_id, ts, value,
              |       ${util.r2sql("sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)")} AS hour_sum
              |FROM events
              |ORDER BY event_id""".stripMargin)
    ),
    Q(
      "win_ntile_pct",
      (s, dir) => {
        val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"))
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_acctbal,
             |       ntile(10)      OVER w AS decile,
             |       percent_rank() OVER w AS pct_rank,
             |       cume_dist()    OVER w AS cume
             |FROM customer
             |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
             |ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "ts_resample_ffill",
      // Time-series resample + forward fill: per-user hourly grid over the
      // fixture's event month, hourly sums gap-filled with the last
      // observed value. Grid explode is per-user (no cross-user blowup);
      // the fill is one window pass. The feature-generation staple for
      // event streams.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
          .agg(sum(col("value")).as("hour_sum"))
        val users = ev.select(col("user_id")).distinct()
        val grid = users.select(
          col("user_id"),
          explode(expr(
            "sequence(timestamp_ntz'2024-01-01 00:00:00', timestamp_ntz'2024-01-30 23:00:00', interval 1 hour)"))
            .as("hour"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "hour"), "left")
          .withColumn("filled", coalesce(
            util.r2(last(col("hour_sum"), ignoreNulls = true).over(w)), lit(0.0)))
          .select(col("user_id"), col("hour"), col("filled"))
          .orderBy(col("user_id"), col("hour"))
      },
      Some(s"""WITH hourly AS (
              |  SELECT user_id, date_trunc('hour', ts) AS hour, sum(value) AS hour_sum
              |  FROM events GROUP BY 1, 2),
              |grid AS (
              |  SELECT u.user_id, g.hour
              |  FROM (SELECT DISTINCT user_id FROM events) u
              |  CROSS JOIN (SELECT unnest(generate_series(
              |    TIMESTAMP '2024-01-01 00:00:00',
              |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS hour) g)
              |SELECT grid.user_id, grid.hour,
              |       coalesce(${util.r2sql("last_value(hour_sum IGNORE NULLS) OVER (PARTITION BY grid.user_id ORDER BY grid.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")}, 0.0) AS filled
              |FROM grid LEFT JOIN hourly
              |  ON grid.user_id = hourly.user_id AND grid.hour = hourly.hour
              |ORDER BY grid.user_id, grid.hour""".stripMargin)
    ),
    Q(
      "win_funnel_steps",
      // Ordered funnel (view → click → purchase): a user converts a step
      // only if it happens AFTER the previous step's first completion —
      // min-ts of each step computed conditionally on the previous step's
      // min-ts in one aggregate pass per user, then one count row per
      // step. No self-joins: the funnel is two chained conditional mins.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val perUser = ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
        val withClick = ev.join(perUser, Seq("user_id"))
          .groupBy(col("user_id"), col("t_view"))
          .agg(min(when(col("event_type") === "click" &&
            col("ts") >= col("t_view"), col("ts"))).as("t_click"))
        val withPurchase = ev.join(withClick, Seq("user_id"))
          .groupBy(col("user_id"), col("t_view"), col("t_click"))
          .agg(min(when(col("event_type") === "purchase" &&
            col("ts") >= col("t_click"), col("ts"))).as("t_purchase"))
        withPurchase.agg(
          count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_view_click"),
          count(col("t_purchase")).as("n_view_click_purchase"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
             |  FROM events GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, v.t_view,
             |         min(CASE WHEN e.event_type = 'click' AND e.ts >= v.t_view
             |                  THEN e.ts END) AS t_click
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  GROUP BY e.user_id, v.t_view),
             |p AS (
             |  SELECT e.user_id, c.t_view, c.t_click,
             |         min(CASE WHEN e.event_type = 'purchase' AND e.ts >= c.t_click
             |                  THEN e.ts END) AS t_purchase
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  GROUP BY e.user_id, c.t_view, c.t_click)
             |SELECT count(t_view) AS n_view,
             |       count(t_click) AS n_view_click,
             |       count(t_purchase) AS n_view_click_purchase
             |FROM p""".stripMargin)
    ),
    Q(
      "agg_dau_wau",
      // DAU / trailing-7-day WAU: COUNT DISTINCT over a trailing window
      // isn't expressible as a frame, so WAU joins the distinct
      // (user, day) activity set to the day grid on a 7-day band — at day
      // granularity that band join is |days| × active-users, tiny compared
      // to the raw events it replaces.
      (s, dir) => {
        val active = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val days = active.select(col("day")).distinct()
        val dau = active.groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        val wau = days.select(col("day").as("d"))
          .join(active, col("day") >= date_sub(col("d"), 6) && col("day") <= col("d"))
          .groupBy(col("d").as("day"))
          .agg(countDistinct(col("user_id")).as("wau"))
        dau.join(wau, Seq("day")).orderBy(col("day"))
      },
      Some("""WITH active AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |days AS (SELECT DISTINCT day FROM active),
             |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM active GROUP BY day),
             |wau AS (
             |  SELECT d.day, count(DISTINCT a.user_id) AS wau
             |  FROM days d JOIN active a
             |    ON a.day >= d.day - 6 AND a.day <= d.day
             |  GROUP BY d.day)
             |SELECT day, dau, wau FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)
    ),
    Q(
      "agg_retention_cohorts",
      // Retention cohorts: users grouped by first-activity day, counted by
      // day offset of each later active day — the triangle every growth
      // dashboard draws. Distinct (user, day) first, so the shuffle
      // carries activity DAYS, not events; offsets are exact date
      // arithmetic.
      (s, dir) => {
        val days = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        days.join(cohorts, Seq("user_id"))
          .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .select(col("cohort_day"), col("day_offset").cast("long").as("day_offset"),
            col("n_active"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |cohorts AS (
             |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
             |SELECT c.cohort_day,
             |       CAST(d.day - c.cohort_day AS BIGINT) AS day_offset,
             |       count(DISTINCT d.user_id) AS n_active
             |FROM days d JOIN cohorts c ON d.user_id = c.user_id
             |GROUP BY c.cohort_day, d.day - c.cohort_day
             |ORDER BY cohort_day, day_offset""".stripMargin)
    ),
    Q(
      "ts_bucket_arbitrary",
      // Batch `window()` bucketing with a NON-calendar width (7 minutes):
      // the same tumbling-window expression streaming uses, here as a
      // plain groupBy key — buckets are epoch-aligned intervals, which the
      // oracle reproduces with integer epoch arithmetic. One two-phase
      // aggregate; the window struct is just a derived grouping column.
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "7 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").cast("timestamp_ntz").as("bucket_start"),
            col("window.end").cast("timestamp_ntz").as("bucket_end"),
            col("event_type"), col("n"))
          .orderBy(col("bucket_start"), col("event_type"))
      },
      Some("""SELECT to_timestamp((epoch_us(ts) // 420000000) * 420)::TIMESTAMP AS bucket_start,
             |       to_timestamp((epoch_us(ts) // 420000000) * 420 + 420)::TIMESTAMP AS bucket_end,
             |       event_type, count(*) AS n
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY bucket_start, event_type""".stripMargin)
    ),
    Q(
      "win_event_transitions",
      // First-order transition counts (the Markov matrix of behavioral
      // analytics): each event paired with the user's NEXT event type via
      // lead, then counted per (from, to). One window pass + one
      // aggregate; terminal events land in the 'END' row so the matrix
      // rows sum to per-type totals.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("next_type",
            coalesce(lead(col("event_type"), 1).over(w), lit("END")))
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH nxt AS (
             |  SELECT event_type AS from_type,
             |         coalesce(lead(event_type) OVER (PARTITION BY user_id
             |                                         ORDER BY ts, event_id),
             |                  'END') AS to_type
             |  FROM events)
             |SELECT from_type, to_type, count(*) AS n
             |FROM nxt GROUP BY from_type, to_type
             |ORDER BY from_type, to_type""".stripMargin)
    ),
    Q(
      "win_pct_change",
      // Period-over-period change per key (the metrics-dashboard staple):
      // delta and ratio vs the previous event's value. Values pin to exact
      // cents first, so the only FP op is one division of exact integers —
      // bitwise-identical cross-engine; first-in-key and zero-previous
      // rows yield NULL via nullif, not errors.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
          .withColumn("prev_cents", lag(col("cents"), 1).over(w))
          .select(col("event_id"), col("user_id"), col("cents"),
            (col("cents") - col("prev_cents")).as("delta_cents"),
            util.r2(col("cents").cast("double") / nullif(col("prev_cents"), lit(0)))
              .as("ratio"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH c AS (
              |  SELECT event_id, user_id, ts,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              |  FROM events),
              |l AS (
              |  SELECT event_id, user_id, cents,
              |         lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents
              |  FROM c)
              |SELECT event_id, user_id, cents,
              |       CAST(cents - prev_cents AS BIGINT) AS delta_cents,
              |       ${util.r2sql("CAST(cents AS DOUBLE) / nullif(prev_cents, 0)")} AS ratio
              |FROM l ORDER BY event_id""".stripMargin)
    ),
    Q(
      "win_running_distinct",
      // Running DISTINCT count per key — the windowed distinct Spark (and
      // SQL generally) can't express directly with frames: rewrite as the
      // first-seen flag (row_number = 1 over (key, value)) summed
      // cumulatively. Two window passes, no per-row set state — at scale
      // this replaces an O(distinct) window buffer with two sorts.
      (s, dir) => {
        val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val wCum = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("first_seen",
            when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
          .withColumn("n_distinct_types", sum(col("first_seen")).over(wCum))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("n_distinct_types"))
          .orderBy(col("event_id"))
      },
      Some("""WITH f AS (
             |  SELECT event_id, user_id, event_type, ts,
             |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
             |                                      ORDER BY ts, event_id) = 1
             |              THEN 1 ELSE 0 END AS first_seen
             |  FROM events)
             |SELECT event_id, user_id, event_type,
             |       CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
             |FROM f ORDER BY event_id""".stripMargin)
    ),
    Q(
      "win_session_gaps",
      // BATCH sessionization (gaps-and-islands): a new session opens on a
      // >30 min silence; two window passes (lag for the gap flag, running
      // sum for the session id) then one aggregate — the replay-side twin
      // of stream_session_window, same 30-minute close semantics, same
      // one-shuffle-per-key scale shape. Cumulative ordering mirrors the
      // oracle's (ts, new_s) exactly so tied timestamps land in the same
      // session on both engines.
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wCum = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("new_s"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
          .withColumn("new_s",
            when(col("prev_ts").isNull ||
              col("ts") > col("prev_ts") + expr("interval 30 minutes"), 1)
              .otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(wCum))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("session_start"),
            (max(col("ts")) + expr("interval 30 minutes")).as("session_end"),
            count(lit(1)).as("n_events"),
            util.r2(sum(col("value"))).as("total_value"))
          .select(col("user_id"), col("sid").cast("long").as("session_no"),
            col("session_start"), col("session_end"),
            col("n_events"), col("total_value"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some(s"""WITH m AS (
              |  SELECT user_id, ts, value,
              |         CASE WHEN lag(ts) OVER w IS NULL
              |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              |              THEN 1 ELSE 0 END AS new_s
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |g AS (
              |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s
              |                             ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM m)
              |SELECT user_id, CAST(sid AS BIGINT) AS session_no,
              |       min(ts) AS session_start,
              |       max(ts) + INTERVAL 30 MINUTE AS session_end,
              |       count(*) AS n_events, ${util.r2sql("sum(value)")} AS total_value
              |FROM g GROUP BY user_id, sid
              |ORDER BY user_id, session_start""".stripMargin)
    ),
    Q(
      "ts_alert_debounce",
      // Debounced alerting (round-9): the monitoring state machine every
      // pager pipeline implements — RAISE only after 3 consecutive
      // breaches (one spike never pages), CLEAR only after 2 consecutive
      // normals (one good sample never closes an incident), and while an
      // incident is open further breach runs do NOT re-page. Sequential-
      // looking logic, but it decomposes into run-length algebra: breach
      // runs → the 3rd element of each run is a raise candidate, normal
      // runs → the 2nd element a clear candidate; an episode OPENS at
      // the first raise after each clear (group raises by
      // clears-seen-before, keep min) and CLOSES at the next clear.
      // Three window passes + one decorrelated min — O(events) shuffle,
      // no state machine fold, no self-join on raw events. One shared
      // text runs on both engines.
      (s, dir) => graft.Catalog.sql(s, dir, debounceSql),
      Some(debounceSql)
    ),
    Q(
      "win_new_vs_returning",
      // New-vs-returning daily split (round-9): for every active day,
      // how many users were seen for the FIRST time vs returning — the
      // growth-accounting row every product dashboard leads with (DAU
      // says how many; this says which kind). One per-user min-day
      // rollup broadcast back onto the per-(user, day) activity set;
      // O(users + user-days) shuffle, exact counts.
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val first = ud.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
        ud.join(broadcast(first), "user_id")
          .groupBy(col("d"))
          .agg(
            sum(when(col("d") === col("first_d"), 1L).otherwise(0L)).as("new_users"),
            sum(when(col("d") =!= col("first_d"), 1L).otherwise(0L)).as("returning_users"))
          .orderBy(col("d"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
             |  FROM events),
             |f AS (SELECT user_id, min(d) AS first_d FROM ud GROUP BY user_id)
             |SELECT d,
             |       CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             |       CAST(sum(CASE WHEN d <> first_d THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
             |FROM ud JOIN f USING (user_id)
             |GROUP BY d ORDER BY d""".stripMargin)
    ),
    Q(
      "ts_bollinger_bands",
      // Bollinger bands (round-9): trailing mean ± 2σ over each user's
      // last 8 events, plus the breakout flag — the volatility envelope
      // every monitoring/trading dashboard draws. Variance comes from the
      // (Σx, Σx², n) frame sums in EXACT BIGINT cents, so the only float
      // ops are the final sqrt and two comparisons evaluated with
      // identical text — no accumulation-order drift. One window pass,
      // bounded 8-row frame state; breakout is pinned as an integer
      // cross-multiplication (cents² scale) to keep even the comparison
      // float-free.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-7, 0)
        Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("cents")).over(w))
          .withColumn("sxx", sum(col("cents") * col("cents")).over(w))
          .filter(col("n") === 8)
          .select(col("user_id"), col("event_id"), col("cents"),
            expr("CAST(floor(CAST(sx AS DOUBLE) / 8 * 100 + 0.5) AS BIGINT)").as("mid_c2"),
            expr("""CAST(floor(sqrt(CAST(8 * sxx - sx * sx AS DOUBLE)) / 8 * 100 + 0.5)
                   |AS BIGINT)""".stripMargin).as("sigma_c2"),
            // breakout iff |8·x − Σx| > 2·sqrt(8·Σx² − (Σx)²): integer left
            // side, one sqrt right side — same text both engines
            expr("""CAST(abs(8 * cents - sx) AS DOUBLE)
                   |> 2 * sqrt(CAST(8 * sxx - sx * sx AS DOUBLE))""".stripMargin)
              .as("breakout"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH t AS (
             |  SELECT user_id, event_id, ts,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_id, cents,
             |    CAST(count(*) OVER w AS BIGINT) AS n,
             |    CAST(sum(cents) OVER w AS BIGINT) AS sx,
             |    CAST(sum(cents * cents) OVER w AS BIGINT) AS sxx
             |  FROM t
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id, cents,
             |       CAST(floor(CAST(sx AS DOUBLE) / 8 * 100 + 0.5) AS BIGINT) AS mid_c2,
             |       CAST(floor(sqrt(CAST(8 * sxx - sx * sx AS DOUBLE)) / 8 * 100 + 0.5) AS BIGINT) AS sigma_c2,
             |       CAST(abs(8 * cents - sx) AS DOUBLE)
             |         > 2 * sqrt(CAST(8 * sxx - sx * sx AS DOUBLE)) AS breakout
             |FROM f WHERE n = 8
             |ORDER BY user_id, event_id""".stripMargin)
    ),
    Q(
      "ts_ewma_window",
      // Exponentially-weighted moving average over each user's trailing 8
      // events (α = 1/2). Because the weights are powers of two, numerator
      // and denominator are EXACT integer sums (cents × 2^j): the single
      // final division is the only floating-point op, so the result is
      // bit-identical cross-engine with no summation-order drift — the
      // trick that makes an EWMA hash-oracle-able at all. One window pass,
      // 8 rows of frame state.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-7, Window.currentRow)
        val nInt = "aggregate(transform(trail, (x, i) -> x * shiftleft(cast(1 as bigint), i)), cast(0 as bigint), (a, x) -> a + x)"
        val dInt = "(shiftleft(cast(1 as bigint), size(trail)) - 1)"
        Tables.events(s, dir)
          .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
          .withColumn("trail", collect_list(col("cents")).over(w))
          .select(col("event_id"), col("user_id"),
            expr(s"floor(cast($nInt as double) / $dInt + 0.5) / 100").as("ewma"))
          .orderBy(col("event_id"))
      },
      Some("""WITH base AS (
             |  SELECT event_id, user_id,
             |         list(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS trail
             |  FROM events)
             |SELECT event_id, user_id,
             |       floor(CAST(CAST(list_sum(list_transform(trail, (x, i) -> x * (1::BIGINT << (i - 1)))) AS BIGINT) AS DOUBLE)
             |             / ((1::BIGINT << len(trail)) - 1) + 0.5) / 100 AS ewma
             |FROM base ORDER BY event_id""".stripMargin)
    ),
    Q(
      "win_range_interval_7d",
      // Event-time RANGE frame with an INTERVAL bound: trailing-7-day spend
      // per customer — the moving-window feature every behavioral pipeline
      // computes. RANGE (not ROWS) makes the frame calendar-correct under
      // gaps and date peers; one window pass, no self-join.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(s"""SELECT o_orderkey, o_custkey, o_orderdate,
                 |  ${graft.util.r2sql(
                   """sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                     |      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)""".stripMargin)} AS trailing_7d
                 |FROM orders ORDER BY o_orderkey""".stripMargin)
      },
      Some(s"""SELECT o_orderkey, o_custkey, o_orderdate,
              |  ${util.r2sql(
                """sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                  |      RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)""".stripMargin)} AS trailing_7d
              |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "win_lag_ignore_nulls",
      // lag(... IGNORE NULLS): last OBSERVED reading per user, skipping
      // gap rows — the sensor/telemetry carry-forward shape. Nulls are
      // synthesized deterministically (error events report no value).
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, dir)
          .withColumn("reading",
            when(col("event_type") =!= "error", col("value")))
          .withColumn("prev_reading",
            lag(col("reading"), 1, null, ignoreNulls = true).over(w))
          .select(col("event_id"), col("user_id"), col("reading"), col("prev_reading"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |       CASE WHEN event_type <> 'error' THEN value END AS reading,
             |       lag(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             |         OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_reading
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "ts_interpolate_linear",
      // Time-series linear interpolation: missing hours get
      // pv + (nv−pv)·(t−pt)/(nt−pt) between the previous and next observed
      // hours (one backward + one forward window pass — no self-join);
      // edges fall back to the nearest observation. Observed sums are
      // pinned via util.r2 BEFORE the lerp so both engines feed identical
      // doubles into identical IEEE arithmetic.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
          .agg(util.r2(sum(col("value"))).as("hour_sum"))
        val users = ev.select(col("user_id")).distinct()
        val grid = users.select(
          col("user_id"),
          explode(expr(
            "sequence(timestamp_ntz'2024-01-01 00:00:00', timestamp_ntz'2024-01-30 23:00:00', interval 1 hour)"))
            .as("hour"))
        val wp = Window.partitionBy(col("user_id")).orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = Window.partitionBy(col("user_id")).orderBy(col("hour"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val obsHour = when(col("hour_sum").isNotNull, col("hour"))
        val frac = (unix_timestamp(col("hour")) - unix_timestamp(col("pt"))).cast("double") /
          (unix_timestamp(col("nt")) - unix_timestamp(col("pt")))
        grid.join(hourly, Seq("user_id", "hour"), "left")
          .withColumn("pv", last(col("hour_sum"), ignoreNulls = true).over(wp))
          .withColumn("pt", last(obsHour, ignoreNulls = true).over(wp))
          .withColumn("nv", first(col("hour_sum"), ignoreNulls = true).over(wn))
          .withColumn("nt", first(obsHour, ignoreNulls = true).over(wn))
          .withColumn("filled", util.r2(
            when(col("hour_sum").isNotNull, col("hour_sum"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                col("pv") + (col("nv") - col("pv")) * frac)
              .otherwise(coalesce(col("pv"), col("nv"), lit(0.0)))))
          .select(col("user_id"), col("hour"), col("filled"))
          .orderBy(col("user_id"), col("hour"))
      },
      Some(s"""WITH hourly AS (
              |  SELECT user_id, date_trunc('hour', ts) AS hour,
              |         ${util.r2sql("sum(value)")} AS hour_sum
              |  FROM events GROUP BY 1, 2),
              |grid AS (
              |  SELECT u.user_id, g.hour
              |  FROM (SELECT DISTINCT user_id FROM events) u
              |  CROSS JOIN (SELECT unnest(generate_series(
              |    TIMESTAMP '2024-01-01 00:00:00',
              |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS hour) g),
              |j AS (
              |  SELECT grid.user_id, grid.hour, hour_sum
              |  FROM grid LEFT JOIN hourly
              |    ON grid.user_id = hourly.user_id AND grid.hour = hourly.hour),
              |w AS (
              |  SELECT *,
              |    last_value(hour_sum IGNORE NULLS) OVER wp AS pv,
              |    last_value(CASE WHEN hour_sum IS NOT NULL THEN hour END IGNORE NULLS) OVER wp AS pt,
              |    first_value(hour_sum IGNORE NULLS) OVER wn AS nv,
              |    first_value(CASE WHEN hour_sum IS NOT NULL THEN hour END IGNORE NULLS) OVER wn AS nt
              |  FROM j
              |  WINDOW wp AS (PARTITION BY user_id ORDER BY hour
              |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |         wn AS (PARTITION BY user_id ORDER BY hour
              |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              |SELECT user_id, hour,
              |       ${util.r2sql(
                 """CASE WHEN hour_sum IS NOT NULL THEN hour_sum
                   |            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   |              pv + (nv - pv) * (CAST(epoch(hour) - epoch(pt) AS DOUBLE)
                   |                                / (epoch(nt) - epoch(pt)))
                   |            ELSE coalesce(pv, nv, 0.0) END""".stripMargin)} AS filled
              |FROM w ORDER BY user_id, hour""".stripMargin)
    ),
    Q(
      "win_nth_value",
      // nth_value over the full frame: the "second-highest per group"
      // pattern without a self-join.
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("second_highest", nth_value(col("o_totalprice"), 2).over(w))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |       nth_value(o_totalprice, 2) OVER w AS second_highest
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus
             |             ORDER BY o_totalprice DESC, o_orderkey ASC
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "win_first_last",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"))
          .withColumn("first_key", first(col("o_orderkey")).over(w))
          .withColumn("last_key", last(col("o_orderkey")).over(w))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_orderdate,
             |       first_value(o_orderkey) OVER w AS first_key,
             |       last_value(o_orderkey)  OVER w AS last_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus
             |             ORDER BY o_orderdate ASC, o_orderkey ASC
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "win_percent_rank_cume",
      // Relative-standing analytics: percent_rank ((rank-1)/(n-1)) and
      // cume_dist (peers-or-below / n) per priority, ordered by order
      // date. Ties are real (many orders share a date) and both functions
      // are tie-stable — values depend only on the date, not row order —
      // so the doubles are the SAME integer ratios in both engines
      // (single IEEE division, no summation order). One window shuffle.
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderdate").asc)
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_orderdate,
             |       percent_rank() OVER w AS pct_rank,
             |       cume_dist()    OVER w AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate ASC)
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "ts_moving_median",
      // Moving median over a trailing 7-row frame per user — the robust
      // smoother (spike-resistant where moving average is not). Spark has
      // no native windowed median; the portable lowering is collect_list
      // over the frame + array_sort + middle pick — frame is 7 rows so
      // the per-row state is O(7), not O(partition). Values are exact
      // BIGINT cents; the even-count midpoint (a+b)/2.0 is IEEE-exact
      // (x.0/x.5), matching DuckDB's interpolating window median
      // bit-for-bit.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-6, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .withColumn("arr", array_sort(collect_list(col("cents")).over(w)))
          .select(col("event_id"), col("user_id"),
            expr("""(element_at(arr, CAST((size(arr) + 1) DIV 2 AS INT))
                    |+ element_at(arr, CAST(size(arr) DIV 2 + 1 AS INT))) / CAST(2 AS DOUBLE)"""
              .stripMargin.replace("\n", " "))
              .as("mov_median"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |       median(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS mov_median
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)
    ),
    Q(
      "ts_outlier_zscore_window",
      // Rolling z-score anomaly flag over a trailing 20-row frame per
      // user — the time-series DQ primitive — computed ENTIRELY in exact
      // BIGINT: |x − μ| > 3σ is equivalent to (n·x − Σx)² > 9·(n·Σx² −
      // (Σx)²) after multiplying both sides by n² (all terms cents-scaled
      // integers, bounded well under 2^63 at 20-row frames), so the flag
      // — unlike a float z-score — cannot flip on an ulp and hash-matches
      // cross-engine by construction. Needs ≥ 10 frame rows before it
      // fires (cold-start guard).
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-19, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("cents")).over(w))
          .withColumn("sxx", sum(col("cents") * col("cents")).over(w))
          .withColumn("dev", col("n") * col("cents") - col("sx"))
          .withColumn("is_outlier", col("n") >= 10 &&
            col("dev") * col("dev") > lit(9L) * (col("n") * col("sxx") - col("sx") * col("sx")))
          .filter(col("is_outlier"))
          .select(col("event_id"), col("user_id"), col("cents"),
            col("n"), col("sx"), col("sxx"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, cents, n, sx, sxx FROM (
             |  SELECT event_id, user_id, cents,
             |         CAST(count(*) OVER w AS BIGINT) AS n,
             |         CAST(sum(cents) OVER w AS BIGINT) AS sx,
             |         CAST(sum(cents * cents) OVER w AS BIGINT) AS sxx
             |  FROM (SELECT event_id, user_id, ts,
             |               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |        FROM events)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) t
             |WHERE n >= 10
             |  AND (n * cents - sx) * (n * cents - sx) > 9 * (n * sxx - sx * sx)
             |ORDER BY event_id""".stripMargin)
    ),
    Q(
      "ts_mad_outlier",
      // Robust rolling outlier flag: |x − med| > 3·MAD over a trailing
      // 15-row frame per user, where MAD is the median absolute deviation
      // — the robust twin of ts_outlier_zscore_window (a z-score's mean
      // and σ are themselves dragged by the outlier; the median/MAD pair
      // is not). Entirely exact integers: doubled medians (med2 = sum of
      // the two middle cents = 2·median, mad4 = 2·median of the doubled
      // deviations = 4·MAD) make the flag 2·|2x − med2| > 3·mad4 — no
      // float, cannot flip on an ulp. One collect_list window pass (frame
      // capped at 15 ⇒ O(15) state per row), then the fused native
      // [[graft.functions.MedMad]] kernel (sort + middles + deviation
      // sort in ONE compiled loop — the interpreted HOF chain it replaces
      // cost 6.6 s at sf0.1) — zero extra shuffle beyond the one window
      // exchange.
      (s, dir) => {
        import org.apache.spark.sql.graftbridge.Bridge
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-14, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("mm", Bridge.column(graft.functions.MedMad(
            Bridge.expressionOf(collect_list(col("cents")).over(w)))))
          .withColumn("med2", element_at(col("mm"), 1))
          .withColumn("mad4", element_at(col("mm"), 2))
          .filter(col("n") >= 8 &&
            expr("2 * abs(2 * cents - med2) > 3 * mad4"))
          .select(col("event_id"), col("user_id"), col("cents"),
            col("med2"), col("mad4"))
          .orderBy(col("event_id"))
      },
      Some("""WITH base AS (
             |  SELECT event_id, user_id, ts,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |win AS (
             |  SELECT event_id, user_id, cents,
             |         list_sort(list(cents) OVER (
             |           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |           ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)) AS arr
             |  FROM base),
             |m AS (
             |  SELECT event_id, user_id, cents, arr, len(arr) AS n,
             |         arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS med2
             |  FROM win),
             |d AS (
             |  SELECT event_id, user_id, cents, med2, n,
             |         list_sort(list_transform(arr, v -> abs(2 * v - med2))) AS sarr
             |  FROM m),
             |f AS (
             |  SELECT event_id, user_id, cents, med2, n,
             |         sarr[(n + 1) // 2] + sarr[n // 2 + 1] AS mad4
             |  FROM d)
             |SELECT event_id, user_id, cents, med2, mad4 FROM f
             |WHERE n >= 8 AND 2 * abs(2 * cents - med2) > 3 * mad4
             |ORDER BY event_id""".stripMargin)
    ),
    Q(
      "ts_ohlc_bars",
      // OHLC candle bars per (type, hour): open/close are the first/last
      // value by event time (min_by/max_by — single-pass mergeable
      // aggregates, no window sort), high/low plain min/max. This is the
      // downsampling shape every metrics/market pipeline runs; at 100 TB
      // it is one partial-aggregated shuffle on (type, hour), state one
      // row per bar. Time key is the raw NANOSECOND long (globally unique
      // in the fixtures — verified — so argmin/argmax are deterministic;
      // at scale the key would be (ts, source_seq) to break exchange
      // ties). Values in BIGINT cents.
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_start"))
          .agg(
            min_by(col("cents"), col("ts_ns")).as("open"),
            max(col("cents")).as("high"),
            min(col("cents")).as("low"),
            max_by(col("cents"), col("ts_ns")).as("close"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"), col("hour_start"))
      },
      Some("""SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             |       arg_min(CAST(floor(value * 100 + 0.5) AS BIGINT), epoch_ns(ts)) AS open,
             |       max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS high,
             |       min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS low,
             |       arg_max(CAST(floor(value * 100 + 0.5) AS BIGINT), epoch_ns(ts)) AS close,
             |       count(*) AS n_events
             |FROM events GROUP BY event_type, date_trunc('hour', ts)
             |ORDER BY event_type, hour_start""".stripMargin)
    ),
    Q(
      "win_interval_concurrency",
      // Peak concurrent intervals per type via SWEEP LINE: each interval
      // contributes a +1 at its start and a −1 at its (half-open) end, a
      // running sum over the endpoint stream is the live concurrency, and
      // its max is the answer — O(n log n) against the O(n²)
      // interval-overlap self-join, which is the difference between a
      // window pass and an unrunnable cartesian at 100 TB. Tie rule is
      // pinned (ends before starts at the same instant, event_id as final
      // tiebreak) so the running sum is a total order both engines walk
      // identically. Durations are integer seconds from cents.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("dur", expr("CAST(floor(value * 100 + 0.5) AS BIGINT) % 3600 + 60"))
          .withColumn("s_us", expr("ts_ns div 1000"))
          .withColumn("e_us", expr("ts_ns div 1000 + dur * 1000000"))
        val ends = ev.select(col("event_type"), col("e_us").as("t"),
          lit(-1L).as("delta"), col("event_id"))
        val starts = ev.select(col("event_type"), col("s_us").as("t"),
          lit(1L).as("delta"), col("event_id"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("t").asc, col("delta").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        starts.unionByName(ends)
          .withColumn("live", sum(col("delta")).over(w))
          .groupBy(col("event_type"))
          .agg(max(col("live")).as("max_concurrent"),
            (count(lit(1)) / 2).cast("long").as("n_intervals"))
          .orderBy(col("event_type"))
      },
      Some("""WITH iv AS (
             |  SELECT event_type, event_id,
             |         epoch_us(ts) AS s_us,
             |         epoch_us(ts) + (CAST(floor(value * 100 + 0.5) AS BIGINT) % 3600 + 60) * 1000000 AS e_us
             |  FROM events),
             |pts AS (
             |  SELECT event_type, s_us AS t, CAST(1 AS BIGINT) AS delta, event_id FROM iv
             |  UNION ALL
             |  SELECT event_type, e_us AS t, CAST(-1 AS BIGINT) AS delta, event_id FROM iv),
             |run AS (
             |  SELECT event_type,
             |         CAST(sum(delta) OVER (PARTITION BY event_type
             |           ORDER BY t ASC, delta ASC, event_id ASC
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS live
             |  FROM pts)
             |SELECT event_type, max(live) AS max_concurrent,
             |       CAST(count(*) // 2 AS BIGINT) AS n_intervals
             |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    Q(
      "ts_time_weighted_avg",
      // Daily TWAP per user: each observation holds its value until the
      // next one (or the UTC day end), so the average is weighted by
      // holding time, not by sample count — the canonical irregular-series
      // downsample (a user with 10 readings in one minute and 1 for the
      // rest of the day must NOT average 11 equal votes). Weights are
      // integer MICROSECONDS derived from the raw nanos column and the
      // day boundary is pure integer arithmetic on the epoch (no calendar
      // functions), so numerator and denominator are EXACT BIGINT sums;
      // the single final division is the only float op — bit-identical
      // cross-engine. Overflow headroom: per-(user, day) weights partition
      // the day, so Σ cents·w ≤ max_cents · 86 400e6 ≈ 5e15 « 2^63. One
      // window pass + one aggregate, both keyed (user_id, day) — the
      // same one-shuffle shape at any scale.
      (s, dir) => {
        val dayUs = 86400000000L
        val w = Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("s_us"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("s_us", expr("ts_ns div 1000"))
          .withColumn("day", col("ts").cast("date"))
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .withColumn("w_us",
            coalesce(lead(col("s_us"), 1).over(w),
              expr(s"(s_us div $dayUs) * $dayUs + $dayUs")) - col("s_us"))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_obs"),
            sum(col("cents") * col("w_us")).as("num"),
            sum(col("w_us")).as("den"))
          .select(col("user_id"), col("day"), col("n_obs"),
            util.r2(col("num").cast("double") / col("den").cast("double") / 100)
              .as("twap"))
          .orderBy(col("user_id"), col("day"))
      },
      Some(s"""WITH b AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day, event_id,
              |         epoch_us(ts) AS s_us,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              |  FROM events),
              |wt AS (
              |  SELECT user_id, day, cents,
              |         coalesce(lead(s_us) OVER (PARTITION BY user_id, day
              |                                   ORDER BY s_us, event_id),
              |                  (s_us // 86400000000) * 86400000000 + 86400000000)
              |           - s_us AS w_us
              |  FROM b),
              |g AS (
              |  SELECT user_id, day, count(*) AS n_obs,
              |         sum(cents * w_us) AS num, sum(w_us) AS den
              |  FROM wt GROUP BY user_id, day)
              |SELECT user_id, day, n_obs,
              |       ${util.r2sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100")} AS twap
              |FROM g ORDER BY user_id, day""".stripMargin)
    ),
    Q(
      "ts_cusum_drift",
      // CUSUM control chart per event type (round-9): the classic drift
      // detector — cumulative sum of deviations from the series mean,
      // with the maximum excursion as the change-point signal. Computed
      // in EXACT integers by clearing denominators: CUSUM_i·n =
      // n·prefix_i − i·S (prefix over cents, S = total, n = count), so
      // the argmax is bit-exact under any partition order; the single
      // scaled statistic divides only at the end. One ordered window per
      // type + one agg — at scale each type's series sorts within its
      // partition (range-partitioned by type, time-sorted).
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("event_type"))
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("ts"), col("event_id"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
          .withColumn("prefix", sum(col("cents")).over(w))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type"))
              .orderBy(col("ts"), col("event_id"))).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("total", sum(col("cents")).over(wAll))
          .withColumn("drift_n", col("n") * col("prefix") - col("i") * col("total"))
          .groupBy(col("event_type"), col("n"))
          .agg(max(abs(col("drift_n"))).as("max_abs_drift_n"))
          .select(col("event_type"), col("n"),
            util.r2(col("max_abs_drift_n").cast("double")
              / col("n").cast("double") / 100).as("max_cusum"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH b AS (
              |  SELECT event_type, ts, event_id,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              |  FROM events WHERE value IS NOT NULL),
              |cum AS (
              |  SELECT event_type,
              |         CAST(sum(cents) OVER (PARTITION BY event_type
              |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix,
              |         CAST(row_number() OVER (PARTITION BY event_type
              |           ORDER BY ts, event_id) AS BIGINT) AS i,
              |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
              |         CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS total
              |  FROM b)
              |SELECT event_type, n,
              |       ${util.r2sql("CAST(max(abs(n * prefix - i * total)) AS DOUBLE) / CAST(n AS DOUBLE) / 100")} AS max_cusum
              |FROM cum GROUP BY event_type, n
              |ORDER BY event_type""".stripMargin)
    ),
    Q(
      "ts_seasonal_index",
      // Hour-of-day seasonal index per event type (round-9): the
      // seasonality profile every forecast/anomaly pipeline derives
      // first — mean(hour) / mean(overall) per (type, hour), from exact
      // integer cents so the only doubles are the final two divisions
      // (identical expression text both engines). Two partial+final
      // aggs over 24×types cells; the map side collapses everything
      // before the exchange, so the cost at 100 TB is the scan.
      (s, dir) => {
        val cells = Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_type"), hour(col("ts")).cast("long").as("hh"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
          .groupBy(col("event_type"), col("hh"))
          .agg(count(lit(1)).as("n_h"), sum(col("cents")).as("s_h"))
        val tots = cells.groupBy(col("event_type"))
          .agg(sum(col("n_h")).as("n"), sum(col("s_h")).as("s"))
        cells.join(broadcast(tots), "event_type")
          .select(col("event_type"), col("hh"), col("n_h"),
            expr("CAST(floor(CAST(s_h AS DOUBLE) / CAST(n_h AS DOUBLE) " +
              "/ (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
              .as("index_e6"))
          .orderBy(col("event_type"), col("hh"))
      },
      Some("""WITH b AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hh,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events WHERE value IS NOT NULL),
             |cells AS (
             |  SELECT event_type, hh, count(*) AS n_h, CAST(sum(cents) AS BIGINT) AS s_h
             |  FROM b GROUP BY event_type, hh),
             |tots AS (
             |  SELECT event_type, CAST(sum(n_h) AS BIGINT) AS n, CAST(sum(s_h) AS BIGINT) AS s
             |  FROM cells GROUP BY event_type)
             |SELECT c.event_type, c.hh, c.n_h,
             |       CAST(floor(CAST(s_h AS DOUBLE) / CAST(n_h AS DOUBLE)
             |                  / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS index_e6
             |FROM cells c JOIN tots t USING (event_type)
             |ORDER BY c.event_type, c.hh""".stripMargin)
    ),
    Q(
      "win_streak_lengths",
      // Longest consecutive-day activity streak per user (round-9) — the
      // retention metric behind "N-day streak" features, and the
      // canonical gaps-and-islands identity: within a user, day_index −
      // dense_rank(day) is CONSTANT across a run of consecutive days, so
      // the streak id costs one window — no self-join, no recursion. The
      // distinct (user, day) collapse happens FIRST (shuffle carries at
      // most users×days rows), then two cheap per-user windows; at 100 TB
      // each user's days sort inside one partition.
      (s, dir) => {
        val days = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val island = col("day_epoch") - dense_rank().over(
          Window.partitionBy(col("user_id")).orderBy(col("day"))).cast("long")
        days
          .withColumn("day_epoch", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
          .withColumn("island", island)
          .groupBy(col("user_id"), col("island"))
          .agg(count(lit(1)).as("len"), min(col("day")).as("streak_start"))
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("best_streak"),
            max_by(col("streak_start"), col("len") * lit(100000L) +
              datediff(col("streak_start"), lit("1970-01-01").cast("date")).cast("long"))
              .as("best_start"))
          .orderBy(col("user_id"))
      },
      // the (len, start) tiebreak is encoded into ONE BIGINT
      // (len*1e5 + day-number) because DuckDB's arg_max can't order by a
      // ROW value — latest-starting longest streak on both engines
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |isl AS (
             |  SELECT user_id, day,
             |         CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT)
             |           - CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS island
             |  FROM days),
             |runs AS (
             |  SELECT user_id, island, count(*) AS len, min(day) AS streak_start
             |  FROM isl GROUP BY user_id, island)
             |SELECT user_id, CAST(max(len) AS BIGINT) AS best_streak,
             |       arg_max(streak_start, len * 100000 + datediff('day', DATE '1970-01-01', streak_start)) AS best_start
             |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    Q(
      "ts_session_window_batch",
      // The BUILT-IN session_window aggregate on a batch frame (round-9)
      // — same semantics the streaming row (`stream_session_window`)
      // proves, here as the batch API every sessionization backfill
      // uses: sessions close after a 30-minute silence, window bounds
      // come from the engine ([first, last+gap)). The oracle replays the
      // gap-island rule; Spark's session_window end is last_ts + gap.
      // One keyed exchange; session merging is per-user, in-partition.
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").as("s_start"),
            col("session_window.end").as("s_end"),
            col("n_events"))
          .orderBy(col("user_id"), col("s_start"))
      },
      Some("""WITH marked AS (
             |  SELECT user_id, ts,
             |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                   >= INTERVAL 30 MINUTE
             |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |sess AS (
             |  SELECT user_id, ts,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, min(ts) AS s_start,
             |       max(ts) + INTERVAL 30 MINUTE AS s_end,
             |       count(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, s_start""".stripMargin)
    ),
    Q(
      "ts_seasonal_naive_mase",
      // MASE — mean absolute SCALED error (round-12): the forecast metric
      // that survives unit changes and zero-valued series where MAPE
      // blows up; errors are scaled by the in-sample MAE of the seasonal
      // naive baseline, so "MASE < 1" literally means "beats predicting
      // last week". Model under test: the lag-1 naive on the daily event
      // count series; scale: the lag-7 weekly naive. Both MAEs are exact
      // BIGINT |diff| sums over one lead/lag window pass; the single
      // final ratio is e6-pinned. Scale posture: the daily series is
      // O(days) rows out of one map-side date aggregate — metadata-sized
      // forever; the window never shuffles more than that.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        val w = Window.orderBy(col("d"))
        val e = daily
          .withColumn("e1", abs(col("x") - lag(col("x"), 1).over(w)))
          .withColumn("e7", abs(col("x") - lag(col("x"), 7).over(w)))
        e.agg(
          sum(col("e1")).as("sum_abs_1"), count(col("e1")).as("n_1"),
          sum(col("e7")).as("sum_abs_7"), count(col("e7")).as("n_7"))
          .select(col("sum_abs_1"), col("n_1"), col("sum_abs_7"), col("n_7"),
            expr("""CAST(floor((CAST(sum_abs_1 AS DOUBLE) / CAST(n_1 AS DOUBLE))
                   |  / (CAST(sum_abs_7 AS DOUBLE) / CAST(n_7 AS DOUBLE))
                   |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("mase_e6"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |e AS (
             |  SELECT abs(x - lag(x, 1) OVER (ORDER BY d)) AS e1,
             |         abs(x - lag(x, 7) OVER (ORDER BY d)) AS e7
             |  FROM daily)
             |SELECT CAST(sum(e1) AS BIGINT) AS sum_abs_1,
             |       CAST(count(e1) AS BIGINT) AS n_1,
             |       CAST(sum(e7) AS BIGINT) AS sum_abs_7,
             |       CAST(count(e7) AS BIGINT) AS n_7,
             |       CAST(floor((CAST(sum(e1) AS DOUBLE) / CAST(count(e1) AS DOUBLE))
             |         / (CAST(sum(e7) AS DOUBLE) / CAST(count(e7) AS DOUBLE))
             |         * 1000000 + 0.5) AS BIGINT) AS mase_e6
             |FROM e""".stripMargin)
    ),
    Q(
      "ts_dominant_period",
      // Dominant-period detection (round-10): the answer to "what is the
      // seasonality" — the lag-k autocorrelation of the daily series
      // swept over k = 2..14 and ranked; winner and runner-up with their
      // ACF values. Same integer power-sum estimator as
      // `ts_autocorr_lag` (identical division text both engines,
      // e6-pinned); ranking ties break on the smaller lag. O(days·13)
      // pair rows from one O(days) aggregate — metadata-sized at any
      // corpus volume.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        val stats = daily.agg(
          expr("CAST(count(*) AS BIGINT)").as("n"),
          expr("CAST(sum(x) AS BIGINT)").as("s"),
          expr("CAST(sum(x * x) AS BIGINT)").as("q"))
        val lags = s.range(2, 15).select(col("id").cast("int").as("k"))
        val pairs = lags
          .crossJoin(daily.select(col("d").as("ad"), col("x").as("ax")))
          .join(daily.select(col("d").as("bd"), col("x").as("bx0")),
            col("bd") === expr("date_add(ad, k)"))
          .groupBy(col("k"))
          .agg(expr("CAST(count(*) AS BIGINT)").as("m"),
            expr("CAST(sum(ax * bx0) AS BIGINT)").as("axx"),
            expr("CAST(sum(ax) AS BIGINT)").as("bx"),
            expr("CAST(sum(bx0) AS BIGINT)").as("cx"))
        val acf = pairs.crossJoin(stats)
          .select(col("k").cast("long").as("lag_k"),
            expr("""CAST(floor((CAST(axx AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(bx + cx AS DOUBLE)
                    + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    / (CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT)""").as("acf_e6"))
        acf.withColumn("rn", row_number().over(
            Window.orderBy(col("acf_e6").desc, col("lag_k"))))
          .filter(col("rn") <= 2)
          .select(col("rn").cast("long").as("rank"), col("lag_k"), col("acf_e6"))
          .orderBy(col("rank"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |stats AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
             |         CAST(sum(x * x) AS BIGINT) AS q FROM daily),
             |lags AS (SELECT unnest(range(2, 15)) AS k),
             |pairs AS (
             |  SELECT l.k,
             |         CAST(count(*) AS BIGINT) AS m,
             |         CAST(sum(a.x * b.x) AS BIGINT) AS axx,
             |         CAST(sum(a.x) AS BIGINT) AS bx,
             |         CAST(sum(b.x) AS BIGINT) AS cx
             |  FROM lags l
             |  JOIN daily a ON TRUE
             |  JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)
             |  GROUP BY l.k),
             |acf AS (
             |  SELECT CAST(k AS BIGINT) AS lag_k,
             |         CAST(floor((CAST(axx AS DOUBLE)
             |           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(bx + cx AS DOUBLE)
             |           + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |           / (CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |           * 1000000 + 0.5) AS BIGINT) AS acf_e6
             |  FROM pairs, stats)
             |SELECT CAST(rn AS BIGINT) AS rank, lag_k, acf_e6 FROM (
             |  SELECT lag_k, acf_e6,
             |         row_number() OVER (ORDER BY acf_e6 DESC, lag_k) AS rn
             |  FROM acf) t
             |WHERE rn <= 2 ORDER BY rank""".stripMargin)
    ),
    Q(
      "ts_autocorr_lag",
      // Lag-k autocorrelation of the daily event-count series, k = 1..5
      // (round-9): the seasonality probe behind every "is this weekly?"
      // question. The estimator is rewritten into pure integer power sums
      // (A=Σxₜxₜ₊ₖ, B/C=head/tail sums, S=Σx, Q=Σx², via the algebraic
      // expansion of Σ(xₜ−x̄)(xₜ₊ₖ−x̄)/Σ(xₜ−x̄)²) so both engines divide the
      // SAME exact integers — no float accumulation anywhere, e6-pinned
      // output. Scale: events collapse to O(days) rows in one aggregation;
      // the lag join and the 1-row stats broadcast are metadata-sized no
      // matter the corpus.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        val stats = daily.agg(
          expr("CAST(count(*) AS BIGINT)").as("n"),
          expr("CAST(sum(x) AS BIGINT)").as("s"),
          expr("CAST(sum(x * x) AS BIGINT)").as("q"))
        val lags = s.range(1, 6).select(col("id").cast("int").as("k"))
        val pairs = lags
          .crossJoin(daily.select(col("d").as("ad"), col("x").as("ax")))
          .join(daily.select(col("d").as("bd"), col("x").as("bx0")),
            col("bd") === expr("date_add(ad, k)"))
          .groupBy(col("k"))
          .agg(
            expr("CAST(count(*) AS BIGINT)").as("m"),
            expr("CAST(sum(ax * bx0) AS BIGINT)").as("axx"),
            expr("CAST(sum(ax) AS BIGINT)").as("bx"),
            expr("CAST(sum(bx0) AS BIGINT)").as("cx"))
        pairs.crossJoin(stats)
          .select(col("k").cast("long").as("lag_k"),
            col("m"), col("axx"), col("bx"), col("cx"),
            expr("""CAST(floor((CAST(axx AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(bx + cx AS DOUBLE)
                    + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    / (CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT)""").as("autocorr_e6"))
          .orderBy(col("lag_k"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |stats AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
             |         CAST(sum(x * x) AS BIGINT) AS q FROM daily),
             |lags AS (SELECT unnest(range(1, 6)) AS k),
             |pairs AS (
             |  SELECT l.k,
             |         CAST(count(*) AS BIGINT) AS m,
             |         CAST(sum(a.x * b.x) AS BIGINT) AS axx,
             |         CAST(sum(a.x) AS BIGINT) AS bx,
             |         CAST(sum(b.x) AS BIGINT) AS cx
             |  FROM lags l
             |  JOIN daily a ON TRUE
             |  JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)
             |  GROUP BY l.k)
             |SELECT CAST(k AS BIGINT) AS lag_k, m, axx, bx, cx,
             |       CAST(floor((CAST(axx AS DOUBLE)
             |            - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(bx + cx AS DOUBLE)
             |            + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |            / (CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |            * 1000000 + 0.5) AS BIGINT) AS autocorr_e6
             |FROM pairs, stats ORDER BY lag_k""".stripMargin)
    ),
    Q(
      "ts_ljung_box",
      // Ljung–Box portmanteau test (round-14): the one-number "is this
      // series white noise" verdict over the first 5 autocorrelations —
      // Q = n(n+2)·Σ r_k²/(n−k), the standard residual-diagnostic after
      // any forecast fit (ts_holt_forecast / ts_seasonal_naive_mase
      // produce the residuals this test judges). Each r_k is the exact
      // integer-moment autocorrelation ts_autocorr_lag pins, e6-floored
      // BEFORE squaring; the per-lag term r_e6²/(n−k) is an integer
      // division and the 5-term sum is a BIGINT fold — so Q assembles
      // from integers with no float accumulation order anywhere, and
      // the reject flag compares against the χ²(5, 0.95) critical value
      // 11.0705 as a pure integer comparison. Scale: O(days) spine,
      // 5-row lag join, one scalar out.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        val stats = daily.agg(
          expr("CAST(count(*) AS BIGINT)").as("n"),
          expr("CAST(sum(x) AS BIGINT)").as("s"),
          expr("CAST(sum(x * x) AS BIGINT)").as("q"))
        val lags = s.range(1, 6).select(col("id").cast("int").as("k"))
        val pairs = lags
          .crossJoin(daily.select(col("d").as("ad"), col("x").as("ax")))
          .join(daily.select(col("d").as("bd"), col("x").as("bx0")),
            col("bd") === expr("date_add(ad, k)"))
          .groupBy(col("k"))
          .agg(
            expr("CAST(count(*) AS BIGINT)").as("m"),
            expr("CAST(sum(ax * bx0) AS BIGINT)").as("axx"),
            expr("CAST(sum(ax) AS BIGINT)").as("bx"),
            expr("CAST(sum(bx0) AS BIGINT)").as("cx"))
        pairs.crossJoin(stats)
          .select(col("k"), col("n"),
            expr("""CAST(floor((CAST(axx AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(bx + cx AS DOUBLE)
                    + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    / (CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT)""").as("r_e6"))
          .select(col("n"), expr("r_e6 * r_e6 DIV (n - k)").as("t"))
          .groupBy(col("n"))
          .agg(sum(col("t")).as("tsum"))
          .select(col("n").as("n_days"),
            expr("n * (n + 2) * tsum DIV 1000000").as("q_stat_e6"),
            lit(5L).as("df"),
            expr("n * (n + 2) * tsum DIV 1000000 > 11070500")
              .as("reject_white_noise"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |stats AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
             |         CAST(sum(x * x) AS BIGINT) AS q FROM daily),
             |lags AS (SELECT unnest(range(1, 6)) AS k),
             |pairs AS (
             |  SELECT l.k,
             |         CAST(count(*) AS BIGINT) AS m,
             |         CAST(sum(a.x * b.x) AS BIGINT) AS axx,
             |         CAST(sum(a.x) AS BIGINT) AS bx,
             |         CAST(sum(b.x) AS BIGINT) AS cx
             |  FROM lags l
             |  JOIN daily a ON TRUE
             |  JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)
             |  GROUP BY l.k),
             |rk AS (
             |  SELECT k, n,
             |         CAST(floor((CAST(axx AS DOUBLE)
             |              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(bx + cx AS DOUBLE)
             |              + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |              / (CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |              * 1000000 + 0.5) AS BIGINT) AS r_e6
             |  FROM pairs, stats),
             |tt AS (SELECT n, CAST(sum(r_e6 * r_e6 // (n - k)) AS BIGINT) AS tsum
             |       FROM rk GROUP BY n)
             |SELECT n AS n_days,
             |       n * (n + 2) * tsum // 1000000 AS q_stat_e6,
             |       CAST(5 AS BIGINT) AS df,
             |       n * (n + 2) * tsum // 1000000 > 11070500 AS reject_white_noise
             |FROM tt""".stripMargin)
    ),
    Q(
      "ts_seasonal_strength",
      // Seasonal-strength scalar per event type (round-14): how much of
      // the daily-count variance the day-of-week profile explains —
      // F = 1 − SSE_within_dow / SST, the one-number readout that says
      // whether the weekly seasonality ts_seasonality_heatmap displays
      // is LOAD-BEARING or noise (F near 0 → don't bother with a
      // seasonal model; the STL and seasonal-naive rows assume it).
      // Exactness: within-dow squared error uses the identity
      // Σ(x−x̄_d)² = (n_d·Σx² − S_d²)/n_d per day-of-week, kept as the
      // integer A_d = n_d·q_d − S_d² divided e6-scaled by n_d (BIGINT
      // division — order-free integer sum across the 7 groups), and SST
      // the same way globally; one float division assembles F.
      // Headroom: Q·n at daily-count scale wraps int64 near sf ~10³ —
      // quantize counts to hundreds there (same rule as the moment
      // folds). Scale: O(days) spine per type, 7-row rollup, one scalar
      // per type.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
          .select(col("event_type"), col("x"), dayofweek(col("d")).as("dow"))
        val per = daily.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("nd"), sum(col("x")).as("sd"),
            sum(col("x") * col("x")).as("qd"))
          .select(col("event_type"), col("nd"), col("sd"), col("qd"),
            expr("(nd * qd - sd * sd) * 1000000 DIV nd").as("sse_e6"))
        per.groupBy(col("event_type"))
          .agg(sum(col("nd")).as("n"), sum(col("sd")).as("s"),
            sum(col("qd")).as("q"), sum(col("sse_e6")).as("within_e6"))
          .select(col("event_type"), col("n").as("n_days"),
            expr("""CAST(floor((1.0 - CAST(within_e6 AS DOUBLE)
                   / ((n * q - s * s) * 1000000 DIV n))
                   * 1000000 + 0.5) AS BIGINT)""").as("seasonal_strength_e6"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |dows AS (
             |  SELECT event_type, x, dayofweek(d) + 1 AS dow FROM daily),
             |per AS (
             |  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nd,
             |         CAST(sum(x) AS BIGINT) AS sd,
             |         CAST(sum(x * x) AS BIGINT) AS qd
             |  FROM dows GROUP BY 1, 2),
             |pe AS (
             |  SELECT event_type, nd, sd, qd,
             |         (nd * qd - sd * sd) * 1000000 // nd AS sse_e6
             |  FROM per)
             |SELECT event_type, CAST(sum(nd) AS BIGINT) AS n_days,
             |       CAST(floor((1.0 - CAST(sum(sse_e6) AS DOUBLE)
             |            / ((CAST(sum(nd) AS BIGINT) * CAST(sum(qd) AS BIGINT)
             |                - CAST(sum(sd) AS BIGINT) * CAST(sum(sd) AS BIGINT))
             |               * 1000000 // CAST(sum(nd) AS BIGINT)))
             |            * 1000000 + 0.5) AS BIGINT) AS seasonal_strength_e6
             |FROM pe GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    Q(
      "stat_granger_1lag",
      // Granger-causality screen, lag 1, both directions (round-14):
      // does yesterday's CLICK volume predict today's VIEWS beyond what
      // yesterday's views already do (and vice versa) — the standard
      // lead-lag screen before building cross-series features
      // (ts_lagged_crosscorr measures association; Granger asks for
      // INCREMENTAL predictive power). Per direction: restricted OLS
      // y_t ~ y_{t−1} vs full y_t ~ y_{t−1} + x_{t−1}; both RSS come
      // from the closed-form 2-regressor normal equations assembled out
      // of ten exact BIGINT moment sums, so the F statistic is a fixed
      // float expression over identical integers in both engines.
      // Reject at F(1, n−3)₀.₉₅ ≈ 3.868 (n ≈ 360 here; the critical
      // value is a documented constant, not a fitted one). Scale: one
      // O(days) pivoted spine, a self-join at lag 1, ten-integer folds.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(grangerSql)
      },
      Some(grangerSqlDuck)
    ),
    Q(
      "ts_pacf_durbin",
      // Partial autocorrelation via Durbin–Levinson (round-14): the ACF
      // says "lag k correlates"; the PACF says "lag k correlates AFTER
      // removing lags 1..k−1" — the pair is how an AR order is chosen
      // (PACF cutting off at k ⇒ AR(k)). Levels 1–3 from the exact
      // integer-moment autocorrelations (the ts_autocorr_lag estimator,
      // e6-floored before use): φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²);
      // φ₃₃ from the level-2 coefficients — all fixed float expressions
      // over the pinned integers, no recursion machinery needed at
      // order 3. Output: (lag, acf_e6, pacf_e6) for k = 1..3.
      // Scale: identical to the autocorr row — O(days) spine, 3-lag
      // join, scalar algebra.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(pacfSql(duck = false))
      },
      Some(pacfSql(duck = true))
    ),
    Q(
      "win_sequence_pattern",
      // Regex over the per-user event-type sequence (round-9): the
      // MATCH_RECOGNIZE-ish CEP shape — order each user's events, project
      // each to a 1-char symbol, and count non-overlapping 'cv*p'
      // (click → any views → purchase) funnel matches in the concatenated
      // symbol string. Ordering ties break on event_id on BOTH engines, and
      // greedy leftmost non-overlapping regex semantics agree between Java
      // regex and DuckDB's RE2 for this pattern class. Scale: the shuffle
      // carries 1 byte per event keyed by user; per-user sequences are
      // bounded by a user's own activity (the same invariant every
      // sessionization op here already relies on).
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c"))
          .groupBy(col("user_id"))
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("c")))),
              x => x.getField("c")), "").as("seq"))
          .select(col("user_id"),
            length(col("seq")).cast("long").as("n_events"),
            expr("CAST(regexp_count(seq, 'cv*p') AS BIGINT)").as("n_funnels"))
          .orderBy(col("user_id"))
      },
      Some("""WITH seq AS (
             |  SELECT user_id,
             |         string_agg(substring(event_type, 1, 1), ''
             |                    ORDER BY ts, event_id) AS s
             |  FROM events GROUP BY user_id)
             |SELECT user_id, CAST(length(s) AS BIGINT) AS n_events,
             |       CAST(length(regexp_extract_all(s, 'cv*p')) AS BIGINT) AS n_funnels
             |FROM seq ORDER BY user_id""".stripMargin)
    ),
    Q(
      "win_time_decay_score",
      // Exponentially time-decayed engagement score per user (round-9):
      // Σ cents · 0.5^(age/7) with a 7-day half-life — the recency
      // weighting every feed-ranking / churn-score pipeline applies.
      // Each event's decayed term is floored to an INTEGER CENT before
      // the per-user sum (the chi-square discipline), so partition order
      // can't move a bit; ages are whole days against a fixed reference,
      // so the pow() argument set is tiny and identical in both engines.
      // One map-side projection + one two-phase agg — nothing shuffles
      // but (user, partial-sum) pairs.
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            expr("""CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT)
                   * pow(CAST(5 AS DOUBLE) / CAST(10 AS DOUBLE),
                         CAST(datediff(to_date('2024-02-01'), to_date(ts)) AS DOUBLE)
                         / CAST(7 AS DOUBLE))
                   + 0.5) AS BIGINT)""").as("term_c"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_purchases"), sum(col("term_c")).as("score_c"))
          .orderBy(col("user_id"))
      },
      Some("""WITH t AS (
             |  SELECT user_id,
             |         CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT)
             |              * pow(CAST(5 AS DOUBLE) / CAST(10 AS DOUBLE),
             |                    CAST(date_diff('day', CAST(date_trunc('day', ts) AS DATE), DATE '2024-02-01') AS DOUBLE)
             |                    / CAST(7 AS DOUBLE))
             |              + 0.5) AS BIGINT) AS term_c
             |  FROM events WHERE event_type = 'purchase')
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             |       CAST(sum(term_c) AS BIGINT) AS score_c
             |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    Q(
      "win_rolling_regression",
      // Trailing-7-day rolling OLS (round-9): per day, the slope and
      // intercept of purchase revenue regressed on the day index over the
      // last week — the local-trend monitor behind "how fast is this
      // metric moving RIGHT NOW" (ts_theil_sen gives one global slope;
      // this gives the trajectory). Five windowed INTEGER sums feed the
      // closed-form OLS; slope/intercept are assembled by identical
      // double expressions and e6/e2-pinned — the rolling_corr
      // discipline. Single-partition window only because the day grid is
      // global; per-key deployments shard with partitionBy.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
          .withColumn("x",
            expr("CAST(datediff(d, to_date('2024-01-01')) AS BIGINT)"))
        val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("x")).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sxx", sum(expr("x * x")).over(w))
          .withColumn("sxy", sum(expr("x * y")).over(w))
          .withColumn("slope_e6",
            expr("""CASE WHEN n * sxx - sx * sx > 0
                    THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
                         * 1000000 + 0.5) AS BIGINT)
                    ELSE NULL END"""))
          .withColumn("intercept_c", expr(
            """CASE WHEN n * sxx - sx * sx > 0
              |THEN CAST(floor((CAST(sy AS DOUBLE) - CAST(slope_e6 AS DOUBLE)
              |     / CAST(1000000 AS DOUBLE) * CAST(sx AS DOUBLE))
              |     / CAST(n AS DOUBLE) + 0.5) AS BIGINT)
              |ELSE NULL END""".stripMargin))
          .select(col("d"), col("n"), col("slope_e6"), col("intercept_c"))
          .orderBy(col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |win AS (
             |  SELECT d,
             |         CAST(count(*) OVER w AS BIGINT) AS n,
             |         CAST(sum(x) OVER w AS BIGINT) AS sx,
             |         CAST(sum(y) OVER w AS BIGINT) AS sy,
             |         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
             |         CAST(sum(x * y) OVER w AS BIGINT) AS sxy
             |  FROM daily
             |  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
             |sl AS (
             |  SELECT d, n, sx, sy,
             |         CASE WHEN n * sxx - sx * sx > 0
             |              THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
             |                   / CAST(n * sxx - sx * sx AS DOUBLE)
             |                   * 1000000 + 0.5) AS BIGINT)
             |              ELSE NULL END AS slope_e6,
             |         n * sxx - sx * sx AS det
             |  FROM win)
             |SELECT d, n, slope_e6,
             |       CASE WHEN det > 0
             |            THEN CAST(floor((CAST(sy AS DOUBLE) - CAST(slope_e6 AS DOUBLE)
             |                 / CAST(1000000 AS DOUBLE) * CAST(sx AS DOUBLE))
             |                 / CAST(n AS DOUBLE) + 0.5) AS BIGINT)
             |            ELSE NULL END AS intercept_c
             |FROM sl ORDER BY d""".stripMargin)
    ),
    Q(
      "ts_rolling_corr",
      // Trailing-7-day rolling correlation between two daily series
      // (clicks vs purchases, round-9): the co-movement monitor behind
      // "did these metrics decouple this week". Six windowed INTEGER sums
      // feed the product-moment formula, so the only floats are two sqrts
      // and one division over exact integers — identical in both engines —
      // with degenerate (zero-variance) windows nulled by the same guard.
      // Scale: events collapse to O(days) rows before the window; the
      // window itself is a single partition ONLY because the series is one
      // global day grid — at 100 TB the same op runs per metric-key with
      // partitionBy, which is how any real deployment shards it.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("x")).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sxx", sum(expr("x * x")).over(w))
          .withColumn("syy", sum(expr("y * y")).over(w))
          .withColumn("sxy", sum(expr("x * y")).over(w))
          .select(col("d"), col("n"),
            expr("""CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                    THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                         * 1000000 + 0.5) AS BIGINT)
                    ELSE NULL END""").as("corr_e6"))
          .orderBy(col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |win AS (
             |  SELECT d,
             |         CAST(count(*) OVER w AS BIGINT) AS n,
             |         CAST(sum(x) OVER w AS BIGINT) AS sx,
             |         CAST(sum(y) OVER w AS BIGINT) AS sy,
             |         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
             |         CAST(sum(y * y) OVER w AS BIGINT) AS syy,
             |         CAST(sum(x * y) OVER w AS BIGINT) AS sxy
             |  FROM daily
             |  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT d, n,
             |       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             |            THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
             |                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             |                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             |                 * 1000000 + 0.5) AS BIGINT)
             |            ELSE NULL END AS corr_e6
             |FROM win ORDER BY d""".stripMargin)
    ),
    Q(
      "ts_holt_forecast",
      // Holt's linear-trend (double exponential) smoothing + 3-step
      // forecast over the daily series (round-9), α = β = ½, defined on
      // EXACT INTEGERS: the level/trend recursion runs in centi-units with
      // an explicit floor(x/2) at each halving (÷2 is exact in a double,
      // so the floor form is bit-identical cross-engine — unlike `div`,
      // whose negative-operand semantics differ between the engines:
      // Spark truncates, DuckDB floors). Spark folds the ordered series
      // with one `aggregate` HOF carrying a (level, trend) struct — O(days)
      // work after the daily aggregation, a single tiny task at any corpus
      // size; the oracle replays the same recursion as a recursive CTE.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg((count(lit(1)) * 100).as("y"))
        daily
          .agg(array_sort(collect_list(struct(col("d"), col("y")))).as("sd"))
          .select(expr("transform(sd, x -> x.y)").as("ys"))
          .select(
            expr("CAST(size(ys) AS BIGINT)").as("n_days"),
            expr("""aggregate(slice(ys, 3, size(ys) - 2),
                   named_struct('l', ys[1], 'b', ys[1] - ys[0]),
                   (acc, y) -> named_struct(
                     'l', CAST(floor(CAST(y + acc.l + acc.b AS DOUBLE)
                               / CAST(2 AS DOUBLE)) AS BIGINT),
                     'b', CAST(floor(CAST(
                            CAST(floor(CAST(y + acc.l + acc.b AS DOUBLE)
                                 / CAST(2 AS DOUBLE)) AS BIGINT)
                            - acc.l + acc.b AS DOUBLE)
                               / CAST(2 AS DOUBLE)) AS BIGINT)))""").as("hw"))
          .select(col("n_days"),
            col("hw.l").as("level_c"), col("hw.b").as("trend_c"),
            (col("hw.l") + col("hw.b")).as("fc1_c"),
            (col("hw.l") + lit(2) * col("hw.b")).as("fc2_c"),
            (col("hw.l") + lit(3) * col("hw.b")).as("fc3_c"))
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i, y FROM (
             |    SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |           CAST(count(*) AS BIGINT) * 100 AS y
             |    FROM events GROUP BY 1)),
             |nn AS (SELECT max(i) AS n FROM daily),
             |hw AS (
             |  SELECT CAST(2 AS BIGINT) AS i,
             |         (SELECT y FROM daily WHERE i = 2) AS l,
             |         (SELECT y FROM daily WHERE i = 2) - (SELECT y FROM daily WHERE i = 1) AS b
             |  UNION ALL
             |  SELECT hw.i + 1,
             |         CAST(floor(CAST(d.y + hw.l + hw.b AS DOUBLE) / CAST(2 AS DOUBLE)) AS BIGINT),
             |         CAST(floor(CAST(
             |           CAST(floor(CAST(d.y + hw.l + hw.b AS DOUBLE) / CAST(2 AS DOUBLE)) AS BIGINT)
             |           - hw.l + hw.b AS DOUBLE) / CAST(2 AS DOUBLE)) AS BIGINT)
             |  FROM hw JOIN daily d ON d.i = hw.i + 1)
             |SELECT n AS n_days, l AS level_c, b AS trend_c,
             |       l + b AS fc1_c, l + 2 * b AS fc2_c, l + 3 * b AS fc3_c
             |FROM hw, nn WHERE i = n""".stripMargin)
    ),
    Q(
      "ts_anomaly_stl_mad",
      // Decompose-then-threshold anomaly detection (round-9): the
      // standard production recipe — remove trend and weekday seasonality
      // (the ts_stl_decompose arithmetic), then flag days whose residual
      // exceeds 3× the MAD — robust to the very outliers it hunts, where
      // a z-score threshold is dragged by them. Every step is exact
      // cents; the MAD is a lower-median order-statistic pick (the
      // theil_sen discipline, no float quantile); the verdict column
      // makes this directly consumable as an alert feed. One window +
      // two O(days) folds.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
        val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
        val det = daily
          .withColumn("cnt7", count(lit(1)).over(w7))
          .withColumn("trend_c",
            when(col("cnt7") === 7, expr(
              "sum(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div 7")))
          .withColumn("dow", expr("dayofweek(d) - 1"))
          .withColumn("det", col("y") - col("trend_c"))
        val seas = det.filter(col("det").isNotNull)
          .groupBy(col("dow"))
          .agg(expr(
            "CAST(floor(CAST(sum(det) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)")
            .as("seasonal_c"))
        val resid = det.join(broadcast(seas), Seq("dow"), "left")
          .withColumn("resid_c", col("det") - col("seasonal_c"))
          .filter(col("resid_c").isNotNull)
        val med = resid
          .withColumn("rn", row_number().over(
            Window.orderBy(col("resid_c"), col("d"))))
          .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
          .filter(col("rn") === expr("(nn + 1) div 2"))
          .select(col("resid_c").as("med_c"))
        val mad = resid.crossJoin(broadcast(med))
          .withColumn("ad", abs(col("resid_c") - col("med_c")))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("ad"), col("d"))))
          .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
          .filter(col("rn") === expr("(nn + 1) div 2"))
          .select(col("med_c"), col("ad").as("mad_c"))
        resid.crossJoin(broadcast(mad))
          .withColumn("anomaly",
            abs(col("resid_c") - col("med_c")) > lit(3) * col("mad_c"))
          .select(col("d"), col("y"), col("resid_c"), col("med_c"),
            col("mad_c"), col("anomaly"))
          .orderBy(col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |tr AS (
             |  SELECT d, y, dayofweek(d) AS dow,
             |         CASE WHEN count(*) OVER w = 7
             |              THEN CAST(sum(y) OVER w AS BIGINT) // 7 END AS trend_c
             |  FROM daily
             |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |det AS (SELECT d, y, dow, y - trend_c AS det FROM tr),
             |seas AS (
             |  SELECT dow,
             |         CAST(floor(CAST(sum(det) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS seasonal_c
             |  FROM det WHERE det IS NOT NULL GROUP BY dow),
             |resid AS (
             |  SELECT d, y, det - seasonal_c AS resid_c
             |  FROM det LEFT JOIN seas USING (dow)
             |  WHERE det - seasonal_c IS NOT NULL),
             |med AS (
             |  SELECT resid_c AS med_c FROM (
             |    SELECT resid_c,
             |           row_number() OVER (ORDER BY resid_c, d) AS rn,
             |           count(*) OVER () AS nn
             |    FROM resid) t
             |  WHERE rn = (nn + 1) // 2),
             |mad AS (
             |  SELECT med_c, ad AS mad_c FROM (
             |    SELECT med_c, abs(resid_c - med_c) AS ad,
             |           row_number() OVER (ORDER BY abs(resid_c - med_c), d) AS rn,
             |           count(*) OVER () AS nn
             |    FROM resid, med) t
             |  WHERE rn = (nn + 1) // 2)
             |SELECT d, y, resid_c, med_c, mad_c,
             |       abs(resid_c - med_c) > 3 * mad_c AS anomaly
             |FROM resid, mad ORDER BY d""".stripMargin)
    ),
    Q(
      "ts_backtest_eval",
      // Forecast BACKTESTING (round-9): rolling one-step evaluation of
      // the two canonical baselines — naive (yesterday) and seasonal-
      // naive (last week) — on the daily revenue series, reporting MAE
      // and sMAPE. This is the measurement row of the forecasting tier
      // (Holt/EWMA emit forecasts; this row says what beating the
      // baselines even means — the M-competition protocol). Per-day
      // sMAPE terms are e6-pinned BEFORE averaging; MAE is exact cents
      // divided once at the end. Two lag windows over the O(days) frame.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
        val w = Window.orderBy(col("d"))
        val preds = daily
          .withColumn("p_naive", lag(col("y"), 1).over(w))
          .withColumn("p_snaive", lag(col("y"), 7).over(w))
        def evalModel(name: String, p: String) = preds
          .filter(col(p).isNotNull)
          .select(lit(name).as("model"),
            abs(col("y") - col(p)).as("ae"),
            expr(s"""CASE WHEN y + $p > 0 THEN
                    |CAST(floor(CAST(2 * abs(y - $p) AS DOUBLE)
                    |     / CAST(y + $p AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                    |ELSE 0 END""".stripMargin).as("smape_term_e6"))
          .groupBy(col("model"))
          .agg(count(lit(1)).as("n_evals"),
            expr("CAST(floor(CAST(sum(ae) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)")
              .as("mae_c"),
            expr("CAST(floor(CAST(sum(smape_term_e6) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)")
              .as("smape_e6"))
        evalModel("naive", "p_naive")
          .unionByName(evalModel("seasonal_naive", "p_snaive"))
          .orderBy(col("model"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |preds AS (
             |  SELECT d, y,
             |         lag(y, 1) OVER (ORDER BY d) AS p_naive,
             |         lag(y, 7) OVER (ORDER BY d) AS p_snaive
             |  FROM daily),
             |terms AS (
             |  SELECT 'naive' AS model, abs(y - p_naive) AS ae,
             |         CASE WHEN y + p_naive > 0 THEN
             |           CAST(floor(CAST(2 * abs(y - p_naive) AS DOUBLE)
             |                / CAST(y + p_naive AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |         ELSE 0 END AS smape_term_e6
             |  FROM preds WHERE p_naive IS NOT NULL
             |  UNION ALL
             |  SELECT 'seasonal_naive', abs(y - p_snaive),
             |         CASE WHEN y + p_snaive > 0 THEN
             |           CAST(floor(CAST(2 * abs(y - p_snaive) AS DOUBLE)
             |                / CAST(y + p_snaive AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |         ELSE 0 END
             |  FROM preds WHERE p_snaive IS NOT NULL)
             |SELECT model, CAST(count(*) AS BIGINT) AS n_evals,
             |       CAST(floor(CAST(sum(ae) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS mae_c,
             |       CAST(floor(CAST(sum(smape_term_e6) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS smape_e6
             |FROM terms GROUP BY model ORDER BY model""".stripMargin)
    ),
    Q(
      "win_skyline_pareto",
      // 2-D skyline / Pareto front (round-9): the orders no other order
      // dominates — cheaper AND more recent — the multi-criteria
      // shortlist query (price/freshness, cost/quality) that naive SQL
      // writes as a NOT EXISTS self-join (O(n²)). The sort-scan identity
      // makes it one window pass: sorted by (price asc, date desc, key),
      // a row is on the front iff its date strictly exceeds every
      // preceding date — running max + one comparison, O(n log n) total
      // and range-partitionable at scale. Exact cents/µs; the oracle is
      // the O(n²) NOT EXISTS definition, so the identity itself is what
      // hash-certifies.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_c"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("date_us"))
        val w = Window.orderBy(col("price_c"), col("date_us").desc, col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, -1)
        o.withColumn("best_prev_date", max(col("date_us")).over(w))
          .filter(col("best_prev_date").isNull ||
            col("date_us") > col("best_prev_date"))
          .select(col("o_orderkey"), col("price_c"), col("date_us"))
          .orderBy(col("price_c"), col("o_orderkey"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
             |         CAST(epoch_us(o_orderdate) AS BIGINT) AS date_us
             |  FROM orders)
             |SELECT o_orderkey, price_c, date_us
             |FROM o a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM o b
             |  WHERE (b.price_c < a.price_c AND b.date_us >= a.date_us)
             |     OR (b.price_c <= a.price_c AND b.date_us > a.date_us)
             |     OR (b.price_c = a.price_c AND b.date_us = a.date_us
             |         AND b.o_orderkey < a.o_orderkey))
             |ORDER BY price_c, o_orderkey""".stripMargin)
    ),
    Q(
      "ts_interevent_burstiness",
      // Inter-event burstiness per user (round-9): Goh & Barabási's
      // B = (σ−μ)/(σ+μ) over the gaps between a user's consecutive
      // events — the canonical "bot or human" temporal signature
      // (periodic automation → B → −1, Poisson → 0, bursty humans → +1).
      // Gaps are exact µs integers from one lag window; the three
      // moments (n, Σg, Σg²) are a two-phase agg; the only floats are
      // one sqrt + one division assembled identically on both engines
      // and e6-pinned. Gaps are carried in SECONDS: a month-long gap in
      // µs would overflow BIGINT at the very first square (caught by the
      // ANSI gate on first run), while second-granularity keeps Σg²
      // within range up to ~10⁶ gaps per user.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("tus"),
            col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        ev.withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
          .filter(col("gap").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            sum(col("gap")).as("s"), sum(col("gap") * col("gap")).as("q2"))
          .filter(col("n_gaps") >= 2)
          .select(col("user_id"), col("n_gaps"), expr(
            """CAST(floor(
              |  (sqrt(CAST(n_gaps * q2 - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
              |  / (sqrt(CAST(n_gaps * q2 - s * s AS DOUBLE)) + CAST(s AS DOUBLE))
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("b_e6"))
          .orderBy(col("user_id"))
      },
      // n·σ = sqrt(n·Q − S²) and n·μ = S share the factor n, so B uses
      // the un-normalized forms directly
      Some("""WITH g AS (
             |  SELECT user_id,
             |         epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000) OVER
             |           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
             |  FROM events),
             |m AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             |         CAST(sum(gap) AS BIGINT) AS s,
             |         CAST(sum(gap * gap) AS BIGINT) AS q2
             |  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
             |SELECT user_id, n_gaps,
             |       CAST(floor(
             |         (sqrt(CAST(n_gaps * q2 - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
             |         / (sqrt(CAST(n_gaps * q2 - s * s AS DOUBLE)) + CAST(s AS DOUBLE))
             |         * 1000000 + 0.5) AS BIGINT) AS b_e6
             |FROM m WHERE n_gaps >= 2
             |ORDER BY user_id""".stripMargin)
    ),
    Q(
      "ts_growth_rates",
      // Day-over-day and week-over-week growth (round-9): the first two
      // numbers on any metrics dashboard — (y−lag)/lag, e6-pinned,
      // null where the base is missing or zero (a 0-base "growth" is a
      // lie, not infinity). Two lag references share ONE window sort;
      // the corpus collapses to O(days) first.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
        val w = Window.orderBy(col("d"))
        daily
          .withColumn("y1", lag(col("y"), 1).over(w))
          .withColumn("y7", lag(col("y"), 7).over(w))
          .select(col("d"), col("y"),
            expr("""CASE WHEN y1 > 0 THEN
                   |CAST(floor(CAST(y - y1 AS DOUBLE) / CAST(y1 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                   |END""".stripMargin).as("dod_e6"),
            expr("""CASE WHEN y7 > 0 THEN
                   |CAST(floor(CAST(y - y7 AS DOUBLE) / CAST(y7 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                   |END""".stripMargin).as("wow_e6"))
          .orderBy(col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |l AS (
             |  SELECT d, y,
             |         lag(y, 1) OVER (ORDER BY d) AS y1,
             |         lag(y, 7) OVER (ORDER BY d) AS y7
             |  FROM daily)
             |SELECT d, y,
             |       CASE WHEN y1 > 0 THEN
             |         CAST(floor(CAST(y - y1 AS DOUBLE) / CAST(y1 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |       END AS dod_e6,
             |       CASE WHEN y7 > 0 THEN
             |         CAST(floor(CAST(y - y7 AS DOUBLE) / CAST(y7 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |       END AS wow_e6
             |FROM l ORDER BY d""".stripMargin)
    ),
    Q(
      "ts_haar_energy",
      // Haar wavelet energy decomposition (round-11): per user, the value
      // series (exact cents, ordered by ts with event_id tiebreak,
      // truncated to a multiple of 8) runs three unnormalized Haar levels
      // — pairs fold to approx=(a+b), detail=(a−b); per-level energy is
      // Σ detail². Separates burst noise (level-1 energy) from slow drift
      // (level-3) — the multiresolution screen a metrics pipeline runs
      // before alerting. All integer arithmetic, so exact cross-engine.
      // Scale: one shuffle onto user_id, then three PER-GROUP pair-folds
      // expressed as groupBy aggregations with pair = rn div 2 — each
      // level HALVES the rows and every stage is a plain hash aggregate
      // (map-side combinable); nothing ever materializes a per-user array.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val base = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
          .withColumn("rn", row_number().over(w).cast("long") - 1)
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .filter(col("rn") < (col("cnt") / 8).cast("long") * 8)
        def level(df: org.apache.spark.sql.DataFrame, vcol: String): org.apache.spark.sql.DataFrame = df
          .groupBy(col("user_id"), (col("rn") / 2).cast("long").as("rn"))
          .agg(
            sum(when(col("rn") % 2 === 0, col(vcol)).otherwise(-col(vcol)))
              .as("detail"),
            sum(col(vcol)).as("approx"))
        val l1 = level(base.select(col("user_id"), col("rn"), col("c")), "c")
        val l2 = level(l1.select(col("user_id"), col("rn"), col("approx").as("a")), "a")
        val l3 = level(l2.select(col("user_id"), col("rn"), col("approx").as("a")), "a")
        def energy(df: org.apache.spark.sql.DataFrame, name: String) = df.groupBy(col("user_id"))
          .agg(sum(col("detail") * col("detail")).as(name))
        energy(l1, "e1")
          .join(energy(l2, "e2"), Seq("user_id"))
          .join(energy(l3, "e3"), Seq("user_id"))
          .orderBy(col("user_id"))
      },
      Some("""WITH base AS (
             |  SELECT user_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             |         CAST(row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS BIGINT) - 1 AS rn,
             |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS cnt
             |  FROM events),
             |t AS (SELECT * FROM base WHERE rn < (cnt // 8) * 8),
             |l1 AS (
             |  SELECT user_id, rn // 2 AS rn,
             |         CAST(sum(CASE WHEN rn % 2 = 0 THEN c ELSE -c END) AS BIGINT) AS detail,
             |         CAST(sum(c) AS BIGINT) AS approx
             |  FROM t GROUP BY user_id, rn // 2),
             |l2 AS (
             |  SELECT user_id, rn // 2 AS rn,
             |         CAST(sum(CASE WHEN rn % 2 = 0 THEN approx ELSE -approx END) AS BIGINT) AS detail,
             |         CAST(sum(approx) AS BIGINT) AS approx
             |  FROM l1 GROUP BY user_id, rn // 2),
             |l3 AS (
             |  SELECT user_id, rn // 2 AS rn,
             |         CAST(sum(CASE WHEN rn % 2 = 0 THEN approx ELSE -approx END) AS BIGINT) AS detail,
             |         CAST(sum(approx) AS BIGINT) AS approx
             |  FROM l2 GROUP BY user_id, rn // 2)
             |SELECT user_id,
             |       (SELECT CAST(sum(detail * detail) AS BIGINT) FROM l1 WHERE l1.user_id = e.user_id) AS e1,
             |       (SELECT CAST(sum(detail * detail) AS BIGINT) FROM l2 WHERE l2.user_id = e.user_id) AS e2,
             |       (SELECT CAST(sum(detail * detail) AS BIGINT) FROM l3 WHERE l3.user_id = e.user_id) AS e3
             |FROM (SELECT DISTINCT user_id FROM t) e ORDER BY user_id""".stripMargin)
    ),
    Q(
      "ts_sax_motif",
      // SAX-style symbolic series encoding (round-12): per user, the
      // cents series (ordered by ts, event_id tiebreak, truncated to a
      // multiple of 8) folds to 8 PAA segments (piecewise aggregate sums)
      // and each segment discretizes to a 4-letter alphabet — yielding an
      // 8-char WORD per user, then corpus-level motif frequencies (the
      // "which activity shapes recur" question SAX exists to answer,
      // here as the pre-clustering screen for behavioral cohorts).
      // Discretization is RANK-based (ntile(4) over segment sums with a
      // segment-index tiebreak) instead of classic z-normalized Gaussian
      // breakpoints: ranks are exact integer logic, so the word is
      // bit-identical cross-engine, where a float z-score at a breakpoint
      // boundary could flip a letter by one ulp. Scale: one shuffle onto
      // user_id, a hash aggregate to 8 rows per user, an O(8)-row window
      // per user, and an O(distinct words) census — the raw series never
      // leaves its partition.
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val segs = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
          .withColumn("rn", row_number().over(wOrd).cast("long") - 1)
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .filter(col("cnt") >= 8 && col("rn") < (col("cnt") / 8).cast("long") * 8)
          .withColumn("seg", expr("rn div (cnt div 8)"))
          .groupBy(col("user_id"), col("seg"))
          .agg(sum(col("c")).as("segsum"))
        val sym = segs.withColumn("q",
          ntile(4).over(Window.partitionBy(col("user_id"))
            .orderBy(col("segsum"), col("seg"))).cast("long"))
          .withColumn("sym", expr(
            "CASE WHEN q = 1 THEN 'a' WHEN q = 2 THEN 'b' WHEN q = 3 THEN 'c' ELSE 'd' END"))
        sym.groupBy(col("user_id"))
          .agg(concat_ws("", expr(
            "transform(array_sort(collect_list(struct(seg, sym))), x -> x.sym)"))
            .as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("word"))
      },
      Some("""WITH base AS (
             |  SELECT user_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             |         CAST(row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS BIGINT) - 1 AS rn,
             |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS cnt
             |  FROM events),
             |segs AS (
             |  SELECT user_id, rn // (cnt // 8) AS seg,
             |         CAST(sum(c) AS BIGINT) AS segsum
             |  FROM base WHERE cnt >= 8 AND rn < (cnt // 8) * 8
             |  GROUP BY user_id, rn // (cnt // 8)),
             |sym AS (
             |  SELECT user_id, seg, segsum,
             |         CAST(ntile(4) OVER (PARTITION BY user_id
             |           ORDER BY segsum, seg) AS BIGINT) AS q
             |  FROM segs),
             |words AS (
             |  SELECT user_id,
             |         string_agg(CASE WHEN q = 1 THEN 'a' WHEN q = 2 THEN 'b'
             |                         WHEN q = 3 THEN 'c' ELSE 'd' END,
             |                    '' ORDER BY seg) AS word
             |  FROM sym GROUP BY user_id)
             |SELECT word, CAST(count(*) AS BIGINT) AS n_users
             |FROM words GROUP BY word ORDER BY word""".stripMargin)
    ),
    Q(
      "ts_stl_decompose",
      // Classical seasonal decomposition (round-9): daily revenue split
      // into trend + weekday-seasonal + residual — the additive
      // moving-average decomposition (the deterministic core of STL
      // without loess). Trend is a CENTERED 7-day MA emitted only for
      // full windows (edges NULL — a partial-window mean would fake a
      // trend); the seasonal term is the per-weekday mean of the
      // detrended series; the residual is what's left. All series exact
      // cents; the two means are the only divisions, integer-div for the
      // always-positive trend and floor-double for the sign-carrying
      // seasonal (engine-portable on negatives where `div` is not). One
      // window + one O(7) groupBy + one broadcast join back.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
        val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
        val det = daily
          .withColumn("cnt7", count(lit(1)).over(w7))
          .withColumn("trend_c",
            when(col("cnt7") === 7, expr("sum(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div 7")))
          .withColumn("det", col("y") - col("trend_c"))
          .withColumn("dow", expr("dayofweek(d) - 1"))
        val seas = det.filter(col("det").isNotNull)
          .groupBy(col("dow"))
          .agg(expr(
            "CAST(floor(CAST(sum(det) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)")
            .as("seasonal_c"))
        det.join(broadcast(seas), Seq("dow"), "left")
          .select(col("d"), col("y"), col("trend_c"), col("seasonal_c"),
            (col("det") - col("seasonal_c")).as("resid_c"))
          .orderBy(col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |tr AS (
             |  SELECT d, y, dayofweek(d) AS dow,
             |         CASE WHEN count(*) OVER w = 7
             |              THEN CAST(sum(y) OVER w AS BIGINT) // 7 END AS trend_c
             |  FROM daily
             |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |det AS (SELECT d, y, dow, trend_c, y - trend_c AS det FROM tr),
             |seas AS (
             |  SELECT dow,
             |         CAST(floor(CAST(sum(det) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS seasonal_c
             |  FROM det WHERE det IS NOT NULL GROUP BY dow)
             |SELECT d, y, trend_c, seasonal_c, det - seasonal_c AS resid_c
             |FROM det LEFT JOIN seas USING (dow)
             |ORDER BY d""".stripMargin)
    ),
    Q(
      "ts_lttb_downsample",
      // LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013)
      // downsampling of the daily purchase-revenue series to 10 points
      // (round-9): the shape-preserving counterpart to M4 — per bucket
      // keep the point forming the LARGEST TRIANGLE with the previously
      // selected point and the next bucket's centroid, so peaks and
      // inflections survive where uniform sampling flattens them. The
      // selection is inherently SEQUENTIAL (bucket k's pick depends on
      // bucket k−1's), so it runs as one `aggregate` HOF fold over the
      // O(buckets) array — the Holt-forecast discipline — after the
      // corpus collapses to O(days) rows; triangle areas are EXACT
      // BIGINT (centroid denominators cleared: 2·A·m = |(ax·m−Sx)(cy−ay)
      // −(ax−cx)(Sy−ay·m)|), ties resolve to the leftmost candidate by
      // strict-greater comparison in candidate order. The oracle replays
      // the same fold as a recursive CTE with a list_reduce argmax.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
          .select(expr("CAST(datediff(d, to_date('2024-01-01')) AS BIGINT)").as("x"),
            col("y"))
        val idx = daily
          .withColumn("i", row_number().over(Window.orderBy(col("x"))) - 1)
          .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
          // five legs (first/last/mid/buckets/next-stats) read this O(days)
          // frame: materialize it once instead of re-scanning and
          // re-aggregating the raw events per leg
          .localCheckpoint(false)
        val firstPt = idx.filter(col("i") === 0)
          .select(col("x").as("fx"), col("y").as("fy"))
        val lastPt = idx.filter(col("i") === col("nn") - 1)
          .select(col("x").as("lx"), col("y").as("ly"))
        val mid = idx.filter(col("i") >= 1 && col("i") <= col("nn") - 2)
          .withColumn("k", expr("((i - 1) * 8) div (nn - 2)"))
        val bk = mid.groupBy(col("k"))
          .agg(sort_array(collect_list(struct(col("x"), col("y")))).as("cands"))
        val nstats = mid.filter(col("k") >= 1)
          .groupBy((col("k") - 1).as("k"))
          .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
          .unionByName(lastPt.select(lit(7L).as("k"), lit(1L).as("m"),
            col("lx").as("sx"), col("ly").as("sy")))
        val bks = bk.join(nstats, Seq("k"))
          .agg(sort_array(collect_list(
            struct(col("k"), col("cands"), col("m"), col("sx"), col("sy")))).as("bks"))
        bks.crossJoin(firstPt).crossJoin(lastPt)
          .select(expr(
            """array_append(
              |  aggregate(bks,
              |    array(named_struct('x', fx, 'y', fy)),
              |    (acc, b) -> array_append(acc,
              |      aggregate(b.cands, element_at(b.cands, 1),
              |        (w, c) -> IF(
              |          abs((element_at(acc, -1).x * b.m - b.sx) * (c.y - element_at(acc, -1).y)
              |              - (element_at(acc, -1).x - c.x) * (b.sy - element_at(acc, -1).y * b.m))
              |          > abs((element_at(acc, -1).x * b.m - b.sx) * (w.y - element_at(acc, -1).y)
              |                - (element_at(acc, -1).x - w.x) * (b.sy - element_at(acc, -1).y * b.m)),
              |          c, w)))),
              |  named_struct('x', lx, 'y', ly))""".stripMargin).as("pts"))
          .select(posexplode(col("pts")).as(Seq("p", "pt")))
          .select((col("p") + 1).cast("long").as("rank"),
            col("pt.x").as("x"), col("pt.y").as("y"))
          .orderBy(col("rank"))
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |idx AS (
             |  SELECT x, y, row_number() OVER (ORDER BY x) - 1 AS i,
             |         count(*) OVER () AS nn
             |  FROM daily),
             |first_pt AS (SELECT x, y FROM idx WHERE i = 0),
             |last_pt AS (SELECT x, y FROM idx WHERE i = nn - 1),
             |mid AS (
             |  SELECT x, y, ((i - 1) * 8) // (nn - 2) AS k
             |  FROM idx WHERE i >= 1 AND i <= nn - 2),
             |bk AS (
             |  SELECT k, list(struct_pack(x := x, y := y) ORDER BY x) AS cands
             |  FROM mid GROUP BY k),
             |nb AS (
             |  SELECT k - 1 AS k, CAST(count(*) AS BIGINT) AS m,
             |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
             |  FROM mid WHERE k >= 1 GROUP BY k - 1
             |  UNION ALL
             |  SELECT 7, 1, x, y FROM last_pt),
             |bks AS (SELECT bk.k, cands, m, sx, sy FROM bk JOIN nb ON bk.k = nb.k),
             |rec AS (
             |  SELECT CAST(-1 AS BIGINT) AS k, f.x AS ax, f.y AS ay,
             |         [struct_pack(x := f.x, y := f.y)] AS sel
             |  FROM first_pt f
             |  UNION ALL
             |  SELECT b.k,
             |         list_reduce(b.cands, (acc, c) -> CASE WHEN
             |             abs((r.ax * b.m - b.sx) * (c.y - r.ay) - (r.ax - c.x) * (b.sy - r.ay * b.m))
             |           > abs((r.ax * b.m - b.sx) * (acc.y - r.ay) - (r.ax - acc.x) * (b.sy - r.ay * b.m))
             |           THEN c ELSE acc END).x,
             |         list_reduce(b.cands, (acc, c) -> CASE WHEN
             |             abs((r.ax * b.m - b.sx) * (c.y - r.ay) - (r.ax - c.x) * (b.sy - r.ay * b.m))
             |           > abs((r.ax * b.m - b.sx) * (acc.y - r.ay) - (r.ax - acc.x) * (b.sy - r.ay * b.m))
             |           THEN c ELSE acc END).y,
             |         list_append(r.sel,
             |           list_reduce(b.cands, (acc, c) -> CASE WHEN
             |               abs((r.ax * b.m - b.sx) * (c.y - r.ay) - (r.ax - c.x) * (b.sy - r.ay * b.m))
             |             > abs((r.ax * b.m - b.sx) * (acc.y - r.ay) - (r.ax - acc.x) * (b.sy - r.ay * b.m))
             |             THEN c ELSE acc END))
             |  FROM rec r JOIN bks b ON b.k = r.k + 1),
             |fin AS (
             |  SELECT list_append(r.sel, struct_pack(x := l.x, y := l.y)) AS pts
             |  FROM rec r, last_pt l WHERE r.k = 7)
             |SELECT CAST(unnest(range(1, len(pts) + 1)) AS BIGINT) AS rank,
             |       unnest(list_transform(pts, p -> p.x)) AS x,
             |       unnest(list_transform(pts, p -> p.y)) AS y
             |FROM fin ORDER BY rank""".stripMargin)
    ),
    Q(
      "ts_downsample_m4",
      // M4 time-series downsampling (round-9): the width-aware visual
      // aggregation from the M4 paper (Jugel et al., VLDB 2014) — per
      // pixel-column bucket keep (first, last, min, max), the four points
      // that make the downsampled line pixel-identical to the raw one.
      // 30-hour buckets over the event month; first/last are min_by/
      // max_by on the TOTAL order (ts, event_id) so ties can't flip the
      // pick; values in exact cents. This is THE dashboard-rendering
      // query at 100 TB: one map-side-combinable agg, output O(pixels),
      // and every aggregate (min/max/first/last) is a partial-mergeable
      // pair — the exchange carries 4 cells per bucket however large the
      // raw series is.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(
            expr("unix_micros(CAST(ts AS TIMESTAMP)) div 108000000000").as("bucket"),
            col("ts"), col("event_id"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
        ev.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min_by(col("v"), struct(col("ts"), col("event_id"))).as("v_first"),
            max_by(col("v"), struct(col("ts"), col("event_id"))).as("v_last"),
            min(col("v")).as("v_min"), max(col("v")).as("v_max"))
          .orderBy(col("bucket"))
      },
      Some("""WITH pts AS (
             |  SELECT epoch_us(ts) // 108000000000 AS bucket, ts, event_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |w AS (
             |  SELECT bucket, v,
             |         row_number() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn,
             |         count(*) OVER (PARTITION BY bucket) AS cnt
             |  FROM pts)
             |SELECT bucket, CAST(max(cnt) AS BIGINT) AS n,
             |       CAST(max(CASE WHEN rn = 1 THEN v END) AS BIGINT) AS v_first,
             |       CAST(max(CASE WHEN rn = cnt THEN v END) AS BIGINT) AS v_last,
             |       min(v) AS v_min, max(v) AS v_max
             |FROM w GROUP BY bucket ORDER BY bucket""".stripMargin)
    ),
    Q(
      "ts_theil_sen",
      // Theil-Sen robust slope of daily purchase revenue (round-9): the
      // median of all pairwise slopes — the trend estimate OLS can't give
      // when outlier days (flash sales, outages) pollute the series; the
      // natural companion to the Mann-Kendall TEST (which says trending,
      // not how much). The raw stream collapses to O(days) rows first, so
      // the pairwise set is C(days, 2) — bounded by the CALENDAR, not the
      // corpus (a year is ~66 k pairs however many petabytes feed it).
      // Each slope is pinned to e6 from two exact integers (single-value
      // double ops, no accumulation); the median is the LOWER median
      // picked by row_number over the total order (slope, i, j) — exact
      // and engine-portable where avg-of-middle-two would reintroduce
      // float division.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y"))
          .select(expr("CAST(datediff(d, to_date('2024-01-01')) AS BIGINT)").as("x"),
            col("y"))
        val pairs = daily.as("a")
          .join(daily.as("b"), col("b.x") > col("a.x"))
          .select(col("a.x").as("xi"), col("b.x").as("xj"), expr(
            """CAST(floor(CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
              |     * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("slope_e6"))
        val n = daily.agg(count(lit(1)).as("n_days")).select(col("n_days"))
        pairs
          .withColumn("rn", row_number().over(
            Window.orderBy(col("slope_e6"), col("xi"), col("xj"))))
          .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy()))
          .filter(col("rn") === expr("(n_pairs + 1) div 2"))
          .crossJoin(broadcast(n))
          .select(col("n_days"), col("n_pairs"), col("slope_e6").as("ts_slope_e6"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |pairs AS (
             |  SELECT a.x AS xi, b.x AS xj,
             |         CAST(floor(CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
             |              * 1000000 + 0.5) AS BIGINT) AS slope_e6
             |  FROM daily a JOIN daily b ON b.x > a.x),
             |r AS (
             |  SELECT slope_e6,
             |         row_number() OVER (ORDER BY slope_e6, xi, xj) AS rn,
             |         CAST(count(*) OVER () AS BIGINT) AS n_pairs
             |  FROM pairs)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
             |       n_pairs, slope_e6 AS ts_slope_e6
             |FROM r WHERE rn = (n_pairs + 1) // 2""".stripMargin)
    ),
    Q(
      "ts_trend_mann_kendall",
      // Mann-Kendall trend test over the daily series (round-9): the
      // standard non-parametric "is this metric trending" monitor — no
      // distribution assumption, robust to outliers. S = Σ sign(xⱼ−xᵢ)
      // over ordered pairs, variance with the tie correction, both exact
      // integers; the continuity-corrected z is the single e6-pinned
      // float step. The O(days²) pair join runs on the O(days) aggregate
      // — metadata-sized after the one corpus pass, at any scale.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(Window.orderBy(col("d"))).cast("long"))
        val a = daily.select(col("i").as("ia"), col("x").as("xa"))
        val b = daily.select(col("i").as("ib"), col("x").as("xb"))
        val pairs = a.join(b, col("ib") > col("ia"))
          .agg(expr("""CAST(sum(CASE WHEN xb > xa THEN 1
                       WHEN xb < xa THEN -1 ELSE 0 END) AS BIGINT)""").as("s_stat"))
        val nn = daily.agg(expr("CAST(count(*) AS BIGINT)").as("n"))
        val ties = daily.groupBy(col("x")).agg(count(lit(1)).as("tj"))
          .filter(col("tj") > 1)
          .agg(expr("CAST(coalesce(sum(tj * (tj - 1) * (2 * tj + 5)), 0) AS BIGINT)")
            .as("tie_term"))
        pairs.crossJoin(nn).crossJoin(ties)
          .select(col("n"), col("s_stat"),
            expr("""CAST(floor((CAST(s_stat AS DOUBLE)
                    - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
                    / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                            - CAST(tie_term AS DOUBLE)) / 18)
                    * 1000000 + 0.5) AS BIGINT)""").as("mk_z_e6"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i, x FROM (
             |    SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |           CAST(count(*) AS BIGINT) AS x
             |    FROM events GROUP BY 1)),
             |pairs AS (
             |  SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
             |                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
             |  FROM daily a JOIN daily b ON b.i > a.i),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
             |ties AS (
             |  SELECT CAST(coalesce(sum(tj * (tj - 1) * (2 * tj + 5)), 0) AS BIGINT) AS tie_term
             |  FROM (SELECT CAST(count(*) AS BIGINT) AS tj FROM daily
             |        GROUP BY x HAVING count(*) > 1) t)
             |SELECT n, s_stat,
             |       CAST(floor((CAST(s_stat AS DOUBLE)
             |            - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
             |            / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
             |                    - CAST(tie_term AS DOUBLE)) / 18)
             |            * 1000000 + 0.5) AS BIGINT) AS mk_z_e6
             |FROM pairs, nn, ties""".stripMargin)
    ),
    Q(
      "win_kadane_max_subarray",
      // Maximum-sum contiguous subarray per user (round-12) — Kadane's
      // classic, but as ONE WINDOW PASS via the prefix-minimum identity:
      // best ending at k = P_k − min(0, min_{j<k} P_j) where P is the
      // running prefix sum of the centered series (cents − 5000, so both
      // signs occur and the answer is a real burst, not the whole
      // series). The textbook sequential fold doesn't distribute; the
      // prefix form is two frames over one sort — exactly the rewrite a
      // 100 TB "hottest spending streak per account" query needs. All
      // BIGINT arithmetic, bit-exact cross-engine. Scale: one shuffle
      // onto user_id; both window frames are running accumulators (no
      // per-user buffering), output one row per user.
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pre = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            (floor(col("value") * 100 + lit(0.5)).cast("long") - 5000L).as("c"))
          .withColumn("p", sum(col("c")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("minprev", least(lit(0L), min(col("p")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1))))
          .withColumn("best_here",
            col("p") - coalesce(col("minprev"), lit(0L)))
        pre.groupBy(col("user_id"))
          .agg(max(col("best_here")).as("max_burst_cents"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH base AS (
             |  SELECT user_id, ts, event_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) - 5000 AS c
             |  FROM events),
             |pre1 AS (
             |  SELECT user_id, ts, event_id,
             |         CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
             |  FROM base),
             |pre AS (
             |  SELECT user_id, p,
             |         least(CAST(0 AS BIGINT),
             |           CAST(min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)) AS minprev
             |  FROM pre1)
             |SELECT user_id,
             |       CAST(max(p - coalesce(minprev, 0)) AS BIGINT) AS max_burst_cents,
             |       CAST(count(*) AS BIGINT) AS n_events
             |FROM pre GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    Q(
      "win_drawdown",
      // Maximum drawdown per user (round-9): the running-peak-minus-current
      // audit over a signed cumulative balance (purchases credit, everything
      // else debits) — the risk metric every monitoring stack computes on a
      // fluctuating series. Two stacked windows over ONE (user, ts) sort —
      // cumulative sum, then running max — share a single WindowExec
      // shuffle+sort; all arithmetic is exact BIGINT cents. Identical SQL
      // text runs on both engines (the named-WINDOW surface).
      (s, dir) => graft.Catalog.sql(s, dir, drawdownSql),
      Some(drawdownSql)
    ),
    Q(
      "ts_peak_detection",
      // Local-peak detection on the daily event series (round-9): a day is
      // a peak when it strictly exceeds its predecessor and is >= its
      // successor (left-leaning plateau rule — deterministic on ties);
      // prominence = height above the taller neighbor. One lag + one lead
      // over the O(days) aggregate; series endpoints are excluded rather
      // than guessed. Identical SQL text runs on both engines.
      (s, dir) => graft.Catalog.sql(s, dir, peakSql),
      Some(peakSql)
    ),
    Q(
      "win_water_filling_alloc",
      // Max-min fair (water-filling) allocation (round-11): each priority
      // class has budget B=5000 units; demands are served by raising a
      // common water line L and giving every order min(demand, L) — the
      // fairness rule rate limiters and GPU-quota schedulers implement,
      // vs win_quota_allocation's arrival-order greedy. The sequential
      // "raise the line" loop has a closed window form because the fully
      // satisfied set is always a PREFIX of the ascending-demand sort:
      // order i is satisfiable iff d_i·(n−i+1) ≤ B − prefix_{i−1}; the
      // uncapped tail splits the remainder as level = rem div k with the
      // first (rem mod k) tail orders getting +1 — exact integers, total
      // Σalloc = min(B, Σd) conserved to the unit. One shuffle by class,
      // two window passes, O(1) per row — partition-parallel at 100 TB.
      (s, dir) => {
        val B = 5000L
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("cls"),
            (col("o_orderkey") % 50 + 1).cast("long").as("d"))
        val w = Window.partitionBy(col("cls")).orderBy(col("d"), col("o_orderkey"))
        val wAll = Window.partitionBy(col("cls"))
        val ranked = o
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("prefix", sum(col("d")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("capped", expr(
            s"d * (n - i + 1) <= $B - (prefix - d)"))
        val cut = ranked
          .withColumn("n_cap", sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
          .withColumn("cap_sum", sum(when(col("capped"), col("d")).otherwise(0L)).over(wAll))
          .withColumn("k", col("n") - col("n_cap"))
          .withColumn("rem", lit(B) - col("cap_sum"))
        cut.withColumn("alloc", expr(
            """CASE WHEN capped THEN d
              |ELSE rem div k +
              |     (CASE WHEN i - n_cap <= rem % k THEN 1 ELSE 0 END) END""".stripMargin))
          .select(col("o_orderkey"), col("cls"), col("d"), col("alloc"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_orderpriority AS cls,
             |         o_orderkey % 50 + 1 AS d
             |  FROM orders),
             |r AS (
             |  SELECT *, CAST(row_number() OVER w AS BIGINT) AS i,
             |         CAST(count(*) OVER (PARTITION BY cls) AS BIGINT) AS n,
             |         CAST(sum(d) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
             |           AND CURRENT ROW) AS BIGINT) AS prefix
             |  FROM o WINDOW w AS (PARTITION BY cls ORDER BY d, o_orderkey)),
             |c AS (
             |  SELECT *, d * (n - i + 1) <= 5000 - (prefix - d) AS capped FROM r),
             |g AS (
             |  SELECT *,
             |         CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY cls) AS BIGINT) AS n_cap,
             |         CAST(sum(CASE WHEN capped THEN d ELSE 0 END)
             |           OVER (PARTITION BY cls) AS BIGINT) AS cap_sum
             |  FROM c)
             |SELECT o_orderkey, cls, CAST(d AS BIGINT) AS d,
             |       CAST(CASE WHEN capped THEN d
             |            ELSE (5000 - cap_sum) // (n - n_cap) +
             |                 (CASE WHEN i - n_cap <= (5000 - cap_sum) % (n - n_cap)
             |                       THEN 1 ELSE 0 END) END AS BIGINT) AS alloc
             |FROM g ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "win_quota_allocation",
      // Greedy quota allocation per part (round-9): demand lines consume a
      // fixed per-part stock in ship-date order until it runs dry — the
      // inventory-netting / budget-waterfall semantics ERP replicas ask of
      // an analytics engine. ONE window (cumulative demand BEFORE each
      // line, per part) turns the sequential "allocate then decrement"
      // loop into a closed form: alloc = clamp(stock − cum_prev, 0, qty).
      // Exact integer units end to end; one shuffle by part, O(1) state
      // per row — embarrassingly partition-parallel at 100 TB because
      // allocation never crosses the part boundary.
      (s, dir) => {
        val stock = (col("l_partkey") % 40 + lit(30L)).as("stock")
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate"),
            expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("qty"), stock)
          .withColumn("cum_prev", coalesce(sum(col("qty")).over(w), lit(0L)))
          .withColumn("alloc",
            greatest(lit(0L), least(col("qty"), col("stock") - col("cum_prev"))))
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("qty")).as("requested"),
            sum(col("alloc")).as("allocated"),
            sum(when(col("alloc") === col("qty"), 1L).otherwise(0L)).as("n_full"),
            sum(when(col("alloc") > 0 && col("alloc") < col("qty"), 1L)
              .otherwise(0L)).as("n_partial"),
            sum(when(col("alloc") === 0L, 1L).otherwise(0L)).as("n_starved"))
          .orderBy(col("l_partkey"))
      },
      Some("""WITH d AS (
             |  SELECT l_partkey, l_orderkey, l_linenumber,
             |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
             |         l_partkey % 40 + 30 AS stock,
             |         CAST(coalesce(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |           OVER (PARTITION BY l_partkey
             |                 ORDER BY l_shipdate, l_orderkey, l_linenumber
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |           0) AS BIGINT) AS cum_prev
             |  FROM lineitem),
             |a AS (
             |  SELECT *, greatest(CAST(0 AS BIGINT),
             |                     least(qty, stock - cum_prev)) AS alloc
             |  FROM d)
             |SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
             |       CAST(sum(qty) AS BIGINT) AS requested,
             |       CAST(sum(alloc) AS BIGINT) AS allocated,
             |       CAST(sum(CASE WHEN alloc = qty THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
             |       CAST(sum(CASE WHEN alloc > 0 AND alloc < qty THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
             |       CAST(sum(CASE WHEN alloc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_starved
             |FROM a GROUP BY l_partkey ORDER BY l_partkey""".stripMargin)
    ),
    Q(
      "win_attribution_touch",
      // First/last-touch purchase attribution (round-9): each purchase
      // credits the user's FIRST and LAST preceding non-purchase event
      // type — the marketing-attribution semantics every event warehouse
      // reports. Two conditional IGNORE-NULLS window reads (first/last of
      // a CASE column over the strict-past frame) on ONE (user, ts) sort —
      // no self-join, no correlated subquery; one shuffle by user at any
      // scale. Purchases with no prior touch attribute to 'none'.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = when(col("event_type") =!= "purchase", col("event_type"))
        Tables.events(s, dir)
          .withColumn("first_touch",
            first(touch, ignoreNulls = true).over(w))
          .withColumn("last_touch",
            last(touch, ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("first_touch"), lit("none")).as("first_touch"),
            coalesce(col("last_touch"), lit("none")).as("last_touch"))
          .agg(count(lit(1)).as("n_purchases"),
            util.r2(sum(col("value"))).as("total_value"))
          .orderBy(col("first_touch"), col("last_touch"))
      },
      Some(s"""WITH t AS (
              |  SELECT user_id, ts, event_id, event_type, value,
              |         first_value(CASE WHEN event_type <> 'purchase'
              |                          THEN event_type END IGNORE NULLS) OVER w AS first_touch,
              |         last_value(CASE WHEN event_type <> 'purchase'
              |                         THEN event_type END IGNORE NULLS) OVER w AS last_touch
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
              |SELECT coalesce(first_touch, 'none') AS first_touch,
              |       coalesce(last_touch, 'none') AS last_touch,
              |       CAST(count(*) AS BIGINT) AS n_purchases,
              |       ${util.r2sql("sum(value)")} AS total_value
              |FROM t WHERE event_type = 'purchase'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    Q(
      "ts_lagged_crosscorr",
      // Lagged cross-correlation between two event series (round-9): does
      // the click series LEAD the purchase series — Pearson corr of daily
      // clicks vs purchases shifted by lag ∈ [−3, +3], the lead-lag scan
      // behind every "which metric moves first" question. Daily counts
      // collapse the corpus to O(days) rows FIRST, so the 7-lag explode ×
      // self-join is O(days·lags) — trivial at any corpus scale; moments
      // are exact BIGINT folded by the shared corr formula text, e6-pinned.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("CAST(date_trunc('day', ts) AS DATE)").as("d"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        val lags = (-3 to 3).map(lit(_))
        val a = daily.select(col("d"), col("x"),
          explode(array(lags: _*)).as("lag"))
          .withColumn("d2", expr("date_add(d, lag)"))
        val j = a.join(daily.select(col("d").as("dj"), col("y")),
          col("d2") === col("dj"))
        j.groupBy(col("lag"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
          .select(col("lag"), col("n"), expr(
            """CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              |  / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              |       * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
              |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("corr_e6"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |j AS (
             |  SELECT l.lag, a.x, b.y
             |  FROM daily a
             |  JOIN (SELECT unnest([-3,-2,-1,0,1,2,3]) AS lag) l ON true
             |  JOIN daily b ON b.d = a.d + CAST(l.lag AS INT)),
             |m AS (
             |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
             |         CAST(sum(x*y) AS BIGINT) AS sxy
             |  FROM j GROUP BY lag)
             |SELECT lag, n,
             |       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |         / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |              * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             |         * 1000000 + 0.5) AS BIGINT) AS corr_e6
             |FROM m ORDER BY lag""".stripMargin)
    ),
    Q(
      "win_time_to_conversion",
      // Time-to-conversion distribution (round-9): hours from a user's
      // first signup to their first subsequent purchase, bucketed — the
      // activation-latency histogram (bucket −1 = never converted).
      // Shape: two keyed min-aggregates + ONE user-keyed join, exact µs
      // arithmetic throughout; at 100 TB both sides are map-side-combined
      // aggregates of the same event scan and the join shuffles O(users),
      // never events.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("us", expr("ts_ns div 1000"))
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
        val fp = ev.filter(col("event_type") === "purchase")
          .join(su, "user_id")
          .filter(col("us") >= col("s_us"))
          .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
        su.join(fp, Seq("user_id"), "left")
          .select(coalesce(expr("(p_us - s_us) DIV 3600000000"), lit(-1L))
            .as("bucket_h"))
          .groupBy(col("bucket_h"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("bucket_h"))
      },
      Some("""WITH su AS (
             |  SELECT user_id, min(epoch_us(ts)) AS s_us
             |  FROM events WHERE event_type = 'signup' GROUP BY 1),
             |fp AS (
             |  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
             |  FROM events e JOIN su ON su.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s_us
             |  GROUP BY 1)
             |SELECT coalesce((p_us - s_us) // 3600000000, -1) AS bucket_h,
             |       CAST(count(*) AS BIGINT) AS n_users
             |FROM su LEFT JOIN fp USING (user_id)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "win_rfm_segmentation",
      // RFM customer segmentation (round-9): quartile scores for Recency
      // (latest order date), Frequency (order count), Monetary (exact
      // cents) — the classic marketing cube. Three ntile(4) windows over
      // the ALREADY-AGGREGATED O(customers) frame with a custkey tiebreak
      // making every quartile boundary deterministic; at 100 TB the
      // global ntile sort range-partitions (sort_global_sequence's
      // posture), and the input is customers, never orders. Output is
      // the 4³ segment census.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rfm = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("recency"),
            count(lit(1)).as("frequency"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .as("monetary_c"))
        rfm
          .withColumn("r_q", ntile(4).over(
            Window.orderBy(col("recency"), col("o_custkey"))))
          .withColumn("f_q", ntile(4).over(
            Window.orderBy(col("frequency"), col("o_custkey"))))
          .withColumn("m_q", ntile(4).over(
            Window.orderBy(col("monetary_c"), col("o_custkey"))))
          .groupBy(col("r_q").cast("long").as("r_q"),
            col("f_q").cast("long").as("f_q"),
            col("m_q").cast("long").as("m_q"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("monetary_c")).as("segment_value_c"))
          .orderBy(col("r_q"), col("f_q"), col("m_q"))
      },
      Some("""WITH rfm AS (
             |  SELECT o_custkey, max(o_orderdate) AS recency,
             |         CAST(count(*) AS BIGINT) AS frequency,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_c
             |  FROM orders GROUP BY o_custkey),
             |scored AS (
             |  SELECT monetary_c,
             |         ntile(4) OVER (ORDER BY recency, o_custkey) AS r_q,
             |         ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
             |         ntile(4) OVER (ORDER BY monetary_c, o_custkey) AS m_q
             |  FROM rfm)
             |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
             |       CAST(sum(monetary_c) AS BIGINT) AS segment_value_c
             |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
    ),
    Q(
      "win_lorenz_deciles",
      // Lorenz curve by population decile (round-13): the distributional
      // CURVE behind the scalar Gini (agg_gini_concentration) and the
      // crossing thresholds (win_pareto_8020) — per ascending-revenue
      // decile of customers, the cumulative share of customers vs the
      // cumulative share of revenue, e6-pinned from exact cent sums.
      // This is the plot every concentration audit draws; keeping it
      // keyed by decile makes it O(10) output from one window pass over
      // the O(customers) aggregate, the same at any corpus size.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rev = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("rev_c"))
        val w = Window.orderBy(col("rev_c"), col("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rev
          .withColumn("dec", ntile(10).over(
            Window.orderBy(col("rev_c"), col("o_custkey"))))
          .withColumn("cum", sum(col("rev_c")).over(w))
          .withColumn("total", sum(col("rev_c")).over(Window.partitionBy()))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("rev_c"), col("o_custkey"))))
          .groupBy(col("dec").cast("long").as("decile"))
          .agg(count(lit(1)).as("n_customers"),
            max(col("rnk")).as("cum_customers"),
            max(col("cum")).as("cum_rev_c"),
            max(col("total")).as("total_c"), max(col("n")).as("n_total"))
          .select(col("decile"), col("n_customers"),
            expr("CAST(floor(CAST(cum_customers AS DOUBLE) / n_total * 1000000 + 0.5) AS BIGINT)")
              .as("cum_pop_share_e6"),
            expr("CAST(floor(CAST(cum_rev_c AS DOUBLE) / total_c * 1000000 + 0.5) AS BIGINT)")
              .as("cum_rev_share_e6"))
          .orderBy(col("decile"))
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
             |  FROM orders GROUP BY o_custkey),
             |ranked AS (
             |  SELECT rev_c,
             |         ntile(10) OVER (ORDER BY rev_c, o_custkey) AS dec,
             |         CAST(row_number() OVER (ORDER BY rev_c, o_custkey) AS BIGINT) AS rnk,
             |         CAST(sum(rev_c) OVER (ORDER BY rev_c, o_custkey
             |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |         CAST(sum(rev_c) OVER () AS BIGINT) AS total,
             |         CAST(count(*) OVER () AS BIGINT) AS n
             |  FROM rev)
             |SELECT CAST(dec AS BIGINT) AS decile,
             |       CAST(count(*) AS BIGINT) AS n_customers,
             |       CAST(floor(CAST(max(rnk) AS DOUBLE) / max(n) * 1000000 + 0.5) AS BIGINT) AS cum_pop_share_e6,
             |       CAST(floor(CAST(max(cum) AS DOUBLE) / max(total) * 1000000 + 0.5) AS BIGINT) AS cum_rev_share_e6
             |FROM ranked GROUP BY dec ORDER BY decile""".stripMargin)
    ),
    Q(
      "win_pareto_8020",
      // Pareto concentration (round-9): how many top customers cover 80%
      // (and 50%, 95%) of total revenue — the 80/20 audit behind account
      // prioritization. Ranks the O(customers) revenue aggregate once
      // (exact cents, custkey tiebreak), takes a running share, and
      // reports the first rank crossing each threshold. Cumulative sum ·
      // 100 ≥ total · threshold keeps the comparison in exact BIGINT —
      // no double division anywhere.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rev = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("rev_c"))
        val w = Window.orderBy(col("rev_c").desc, col("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = rev
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("rev_c").desc, col("o_custkey"))))
          .withColumn("cum", sum(col("rev_c")).over(w))
          .withColumn("total", sum(col("rev_c")).over(Window.partitionBy()))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        val th = ranked.select(col("rnk").cast("long").as("rnk"), col("cum"),
          col("total"), col("n"),
          explode(array(lit(50L), lit(80L), lit(95L))).as("threshold_pct"))
          .filter(col("cum") * 100 >= col("total") * col("threshold_pct"))
          .groupBy(col("threshold_pct"))
          .agg(min(col("rnk")).as("n_top_customers"), max(col("n")).as("n_customers"))
        th.select(col("threshold_pct"), col("n_top_customers"), col("n_customers"))
          .orderBy(col("threshold_pct"))
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
             |  FROM orders GROUP BY o_custkey),
             |ranked AS (
             |  SELECT CAST(row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS rnk,
             |         CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
             |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |         CAST(sum(rev_c) OVER () AS BIGINT) AS total,
             |         CAST(count(*) OVER () AS BIGINT) AS n
             |  FROM rev)
             |SELECT t.threshold_pct, min(rnk) AS n_top_customers,
             |       max(n) AS n_customers
             |FROM ranked,
             |     (SELECT CAST(unnest([50, 80, 95]) AS BIGINT) AS threshold_pct) t
             |WHERE cum * 100 >= total * t.threshold_pct
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "ts_seasonality_heatmap",
      // Weekday × hour traffic heatmap (round-9): the event-count matrix
      // every ops dashboard draws. Weekday comes from raw epoch-day
      // arithmetic ((days+3)%7, Mon=0 — the fn_business_days trick, so
      // the engines' dayofweek numbering mismatch never enters), hour
      // from exact µs division. One map-side-combined aggregate, output
      // bounded at 7×24 rows at ANY corpus size.
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("us", expr("ts_ns div 1000"))
          .groupBy(expr("(us div 86400000000 + 3) % 7").as("weekday"),
            expr("(us div 3600000000) % 24").as("hour_utc"))
          .agg(count(lit(1)).as("n_events"),
            util.r2(sum(col("value"))).as("total_value"))
          .orderBy(col("weekday"), col("hour_utc"))
      },
      Some(s"""SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS weekday,
              |       (epoch_us(ts) // 3600000000) % 24 AS hour_utc,
              |       CAST(count(*) AS BIGINT) AS n_events,
              |       ${util.r2sql("sum(value)")} AS total_value
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    Q(
      "win_share_of_parent",
      // Share-of-parent ratios (round-10): the drill-down percentages a
      // BI hierarchy shows at every level — each (priority, year) cell
      // carries its share WITHIN the priority and its share of the grand
      // total, from two window sums over one aggregate (never a
      // re-aggregation join). e6 integer pinning; output O(cells).
      (s, dir) => {
        val wp = Window.partitionBy(col("pri"))
        val wall = Window.partitionBy()
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pri"),
            expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)").as("yr"))
          .agg(count(lit(1)).as("n"))
          .withColumn("pri_sum", sum(col("n")).over(wp))
          .withColumn("tot_sum", sum(col("n")).over(wall))
          .withColumn("share_of_pri_e6", expr("(1000000 * n) div pri_sum"))
          .withColumn("share_of_total_e6", expr("(1000000 * n) div tot_sum"))
          .drop("pri_sum", "tot_sum")
          .orderBy(col("pri"), col("yr"))
      },
      Some("""WITH g AS (
             |  SELECT o_orderpriority AS pri,
             |         CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY pri, yr)
             |SELECT pri, yr, n,
             |       (1000000 * n) // CAST(sum(n) OVER (PARTITION BY pri)
             |         AS BIGINT) AS share_of_pri_e6,
             |       (1000000 * n) // CAST(sum(n) OVER () AS BIGINT)
             |         AS share_of_total_e6
             |FROM g ORDER BY pri, yr""".stripMargin)
    ),
    Q(
      "win_expanding_minmax_scaler",
      // Leakage-free expanding min-max scaling (round-10): each event is
      // normalized by the min/max observed UP TO that point — the online
      // feature-scaling discipline (a global min/max would leak the
      // future into training features; the expanding window can't).
      // All BIGINT: cent values, expanding extrema from one window pass,
      // scaled position e6-pinned by integer division; census per user =
      // count, final extrema, and mean scaled position. O(events) keyed
      // window, no shuffle beyond it.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .withColumn("emin", min(col("cents")).over(w))
          .withColumn("emax", max(col("cents")).over(w))
          .withColumn("scaled_e6",
            when(col("emax") > col("emin"),
              expr("(1000000 * (cents - emin)) div (emax - emin)"))
              .otherwise(lit(0L)))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("cents")).as("final_min"),
            max(col("cents")).as("final_max"),
            expr("sum(scaled_e6) div count(*)").as("mean_scaled_e6"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             |         epoch_ns(ts) AS o1
             |  FROM events),
             |x AS (
             |  SELECT user_id, cents,
             |         CAST(min(cents) OVER w AS BIGINT) AS emin,
             |         CAST(max(cents) OVER w AS BIGINT) AS emax
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY o1, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |sc AS (
             |  SELECT user_id, cents,
             |         CASE WHEN emax > emin
             |              THEN (1000000 * (cents - emin)) // (emax - emin)
             |              ELSE 0 END AS scaled_e6
             |  FROM x)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |       min(cents) AS final_min, max(cents) AS final_max,
             |       CAST(sum(scaled_e6) AS BIGINT) // CAST(count(*) AS BIGINT)
             |         AS mean_scaled_e6
             |FROM sc GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    Q(
      "ts_changepoint_cusum_argmax",
      // Changepoint LOCALIZATION (round-10): the complement of the
      // existing `ts_cusum_drift` DETECTOR — for each order-priority
      // daily series, find WHERE the level shift most plausibly occurred:
      // k* = argmax_k |n·S_k − k·S_n| (the CUSUM deviation statistic,
      // cross-multiplied into exact BIGINT so no division ever happens),
      // ties broken by the earliest day. This is binary segmentation's
      // first split, the standard first answer to "when did the metric
      // change?". Scale: one map-side-combined daily aggregate
      // (O(days) rows out of any corpus), one window cumsum per group,
      // one max_by — nothing grows with raw row count.
      (s, dir) => {
        val w = Window.partitionBy(col("pri")).orderBy(col("d"))
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pri"),
            col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("c"))
          .withColumn("k", row_number().over(w).cast("long"))
          .withColumn("sk", sum(col("c")).over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pri"))))
          .withColumn("sn",
            sum(col("c")).over(Window.partitionBy(col("pri"))))
          .filter(col("k") < col("n")) // k = n is identically zero
          .withColumn("dev", abs(col("n") * col("sk") - col("k") * col("sn")))
          .groupBy(col("pri"))
          .agg(max(col("n")).as("n_days"),
            expr("max_by(k, struct(dev, -k))").as("k_star"),
            expr("max_by(d, struct(dev, -k))").as("cut_date"),
            max(col("dev")).as("max_dev"))
          .orderBy(col("pri"))
      },
      Some("""WITH daily AS (
             |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1, 2),
             |cum AS (
             |  SELECT pri, d, c,
             |         CAST(row_number() OVER w AS BIGINT) AS k,
             |         CAST(sum(c) OVER w AS BIGINT) AS sk,
             |         CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n,
             |         CAST(sum(c) OVER (PARTITION BY pri) AS BIGINT) AS sn
             |  FROM daily
             |  WINDOW w AS (PARTITION BY pri ORDER BY d)),
             |dev AS (
             |  SELECT pri, d, k, n, abs(n * sk - k * sn) AS dev
             |  FROM cum WHERE k < n),
             |best AS (
             |  SELECT pri, d, k, n, dev, row_number() OVER (
             |    PARTITION BY pri ORDER BY dev DESC, k) AS rn
             |  FROM dev)
             |SELECT pri, n AS n_days, k AS k_star, d AS cut_date,
             |       CAST(dev AS BIGINT) AS max_dev
             |FROM best WHERE rn = 1 ORDER BY pri""".stripMargin)
    ),
    Q(
      "win_hhi_concentration",
      // Herfindahl–Hirschman index per market (round-13): the
      // REGULATOR's concentration scalar — Σ shareᵢ² in basis points over
      // supplier revenue within each nation. Complements the engine's
      // Gini (inequality), Lorenz (curve) and Pareto (crossing) rows: HHI
      // is the one that moves when a market consolidates into few hands
      // even if the tail stays equal, and the 1500/2500 DOJ thresholds
      // make it an absolute gate, not a relative one. Determinism: per-
      // supplier cents are exact BIGINT; Σrevᵢ² accumulates in
      // DECIMAL(38,0)/HUGEINT (cents² sums pass 2^63 at sf ≥ 0.1), and
      // the single share division is pinned to integer basis points.
      // Scale: one two-phase aggregate to (nation, supplier) cells, one
      // per-nation moment sum — shuffle carries suppliers, never
      // lineitems; output O(nations).
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_suppkey"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 +
              lit(0.5)).cast("long").as("cents"))
        val sup = Tables(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val cells = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"), col("s_suppkey"))
          .agg(sum(col("cents")).as("rev"))
        cells.groupBy(col("s_nationkey").cast("long").as("nation"))
          .agg(count(lit(1)).as("n_suppliers"),
            sum(col("rev").cast("decimal(38,0)")).as("tot"),
            sum(col("rev").cast("decimal(19,0)") *
              col("rev").cast("decimal(19,0)")).as("sq"))
          .select(col("nation"), col("n_suppliers"),
            col("tot").cast("long").as("total_cents"),
            expr("""CAST(floor(CAST(sq AS DOUBLE)
                    / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
                    * 10000 + 0.5) AS BIGINT)""").as("hhi_bp"))
          .orderBy(col("nation"))
      },
      Some("""WITH cells AS (
             |  SELECT s_nationkey, s_suppkey,
             |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY s_nationkey, s_suppkey)
             |SELECT CAST(s_nationkey AS BIGINT) AS nation,
             |       CAST(count(*) AS BIGINT) AS n_suppliers,
             |       CAST(sum(rev) AS BIGINT) AS total_cents,
             |       CAST(floor(CAST(sum(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
             |            / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE))
             |            * 10000 + 0.5) AS BIGINT) AS hhi_bp
             |FROM cells GROUP BY s_nationkey ORDER BY nation""".stripMargin)
    ),
    Q(
      "ts_hurst_rs",
      // Hurst exponent via rescaled-range (R/S) analysis (round-13): the
      // long-memory diagnostic — H≈0.5 random walk, H>0.5 trending,
      // H<0.5 mean-reverting — that tells a forecaster whether
      // ts_holt_forecast's trend term is real signal or noise. The daily
      // event-count series is split into blocks of m ∈ {4,8,16,32} days;
      // per block, the cumulative-deviation RANGE stays exactly integral
      // by scaling through m (m·Σᵢ − i·S never leaves BIGINT), S/σ
      // divides once into an e6 pin per block, and block means are
      // integer sums of those pins (never a float mean whose order
      // differs across engines). The Hurst slope is the closed-form OLS
      // of ln(R/S) on ln(m) over the 4 sizes, r2-pinned on every row.
      // Scale: the daily rollup is the only O(rows) pass; everything
      // after runs on O(days) rows — block windows partition BY (m,
      // block), never a global single-partition pass.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(Window.orderBy(col("d"))))
        val sizes = s.range(2, 6).select(expr("CAST(1 AS BIGINT) << CAST(id AS INT)").as("m"))
        val blocks = daily.crossJoin(broadcast(sizes))
          .withColumn("blk", expr("CAST((i - 1) DIV m AS BIGINT)"))
          .withColumn("j", expr("CAST((i - 1) % m AS BIGINT) + 1"))
        val w = Window.partitionBy(col("m"), col("blk")).orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val perBlock = blocks
          .withColumn("cum", sum(col("x")).over(w))
          .withColumn("bsum", sum(col("x")).over(
            Window.partitionBy(col("m"), col("blk"))))
          .groupBy(col("m"), col("blk"))
          .agg(count(lit(1)).as("len"), sum(col("x")).as("ssum"),
            sum(col("x") * col("x")).as("sq"),
            max(col("m") * col("cum") - col("j") * col("bsum")).as("dmax"),
            min(col("m") * col("cum") - col("j") * col("bsum")).as("dmin"))
          .filter(col("len") === col("m"))
          .select(col("m"),
            expr("""CAST(floor(CAST(dmax - dmin AS DOUBLE) / m
                   / sqrt((sq - CAST(ssum AS DOUBLE) * ssum / m) / m)
                   * 1000000 + 0.5) AS BIGINT)""").as("rs_e6"))
        val perM = perBlock.groupBy(col("m"))
          .agg(count(lit(1)).as("n_blocks"), sum(col("rs_e6")).as("rs_sum"))
          .select(col("m"), col("n_blocks"),
            expr("rs_sum DIV n_blocks").as("mean_rs_e6"))
        val wAll = Window.partitionBy()
        perM
          .withColumn("lx", log(col("m").cast("double")))
          .withColumn("ly", log(col("mean_rs_e6").cast("double") / lit(1000000.0)))
          .withColumn("hurst", util.r2(
            (sum(col("lx") * col("ly")).over(wAll) * count(lit(1)).over(wAll)
              - sum(col("lx")).over(wAll) * sum(col("ly")).over(wAll)) /
            (sum(col("lx") * col("lx")).over(wAll) * count(lit(1)).over(wAll)
              - sum(col("lx")).over(wAll) * sum(col("lx")).over(wAll))))
          .select(col("m"), col("n_blocks"), col("mean_rs_e6"), col("hurst"))
          .orderBy(col("m"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |idx AS (
             |  SELECT x, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
             |  FROM daily),
             |sizes AS (SELECT CAST(unnest([4, 8, 16, 32]) AS BIGINT) AS m),
             |blocks AS (
             |  SELECT m, x, (i - 1) // m AS blk, (i - 1) % m + 1 AS j
             |  FROM idx CROSS JOIN sizes),
             |cums AS (
             |  SELECT m, blk, j, x,
             |         CAST(sum(x) OVER (PARTITION BY m, blk ORDER BY j
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |         CAST(sum(x) OVER (PARTITION BY m, blk) AS BIGINT) AS bsum
             |  FROM blocks),
             |per_block AS (
             |  SELECT m, blk, CAST(count(*) AS BIGINT) AS len,
             |         CAST(sum(x) AS BIGINT) AS ssum,
             |         CAST(sum(x * x) AS BIGINT) AS sq,
             |         CAST(max(m * cum - j * bsum) AS BIGINT) AS dmax,
             |         CAST(min(m * cum - j * bsum) AS BIGINT) AS dmin
             |  FROM cums GROUP BY m, blk),
             |rs AS (
             |  SELECT m,
             |         CAST(floor(CAST(dmax - dmin AS DOUBLE) / m
             |              / sqrt((sq - CAST(ssum AS DOUBLE) * ssum / m) / m)
             |              * 1000000 + 0.5) AS BIGINT) AS rs_e6
             |  FROM per_block WHERE len = m),
             |per_m AS (
             |  SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
             |         CAST(sum(rs_e6) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_rs_e6
             |  FROM rs GROUP BY m),
             |pts AS (
             |  SELECT m, n_blocks, mean_rs_e6,
             |         ln(CAST(m AS DOUBLE)) AS lx,
             |         ln(CAST(mean_rs_e6 AS DOUBLE) / 1000000.0) AS ly
             |  FROM per_m)
             |SELECT m, n_blocks, mean_rs_e6,
             |       floor((sum(lx * ly) OVER () * count(*) OVER ()
             |              - sum(lx) OVER () * sum(ly) OVER ())
             |             / (sum(lx * lx) OVER () * count(*) OVER ()
             |                - sum(lx) OVER () * sum(lx) OVER ())
             |             * 100 + 0.5) / 100 AS hurst
             |FROM pts ORDER BY m""".stripMargin)
    ),
    Q(
      "win_sortino_ratio",
      // Sortino ratio per event type (round-13): downside-risk-adjusted
      // return — the Sharpe variant that only penalizes NEGATIVE
      // volatility, the number a metric dashboard ranks volatile series
      // by without punishing upside spikes (complements win_drawdown's
      // path-dependence and ts_bollinger's symmetric bands). Daily value
      // sums fold to exact cents; day-over-day returns are doubles from
      // two BIGINTs (identical in both engines); per-day return and
      // squared-downside terms are e9/e12-quantized BEFORE the sums so
      // accumulation is exact integer math; the ratio divides once at
      // the end. Scale: one map-side daily rollup, one lag window
      // partitioned by event_type, O(types) output.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("d"))
          .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("v"))
        val r = daily
          .withColumn("pv", lag(col("v"), 1).over(
            Window.partitionBy(col("event_type")).orderBy(col("d"))))
          .filter(col("pv").isNotNull && col("pv") =!= 0L)
          .select(col("event_type"),
            expr("CAST(floor((CAST(v AS DOUBLE) / pv - 1.0) * 1000000000 + 0.5) AS BIGINT)")
              .as("ret_e9"),
            expr("""CAST(floor(CASE WHEN v < pv
                   THEN (CAST(v AS DOUBLE) / pv - 1.0) * (CAST(v AS DOUBLE) / pv - 1.0)
                   ELSE CAST(0 AS DOUBLE) END * 1000000000000 + 0.5) AS BIGINT)""")
              .as("dn2_e12"))
        r.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("ret_e9")).as("sr"), sum(col("dn2_e12")).as("sd2"))
          .select(col("event_type"), col("n_days"),
            expr("CAST(floor(CAST(sr AS DOUBLE) / n_days / 1000 + 0.5) AS BIGINT)")
              .as("mean_ret_e6"),
            expr("""CAST(floor(CAST(sr AS DOUBLE) / n_days / 1000000000
                   / sqrt(CAST(sd2 AS DOUBLE) / n_days / 1000000000000)
                   * 1000000 + 0.5) AS BIGINT)""").as("sortino_e6"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
             |  FROM events GROUP BY 1, 2),
             |lagged AS (
             |  SELECT event_type, v,
             |         lag(v) OVER (PARTITION BY event_type ORDER BY d) AS pv
             |  FROM daily),
             |r AS (
             |  SELECT event_type,
             |         CAST(floor((CAST(v AS DOUBLE) / pv - 1.0) * 1000000000 + 0.5) AS BIGINT) AS ret_e9,
             |         CAST(floor(CASE WHEN v < pv
             |              THEN (CAST(v AS DOUBLE) / pv - 1.0) * (CAST(v AS DOUBLE) / pv - 1.0)
             |              ELSE CAST(0 AS DOUBLE) END * 1000000000000 + 0.5) AS BIGINT) AS dn2_e12
             |  FROM lagged WHERE pv IS NOT NULL AND pv <> 0),
             |g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |         CAST(sum(ret_e9) AS BIGINT) AS sr,
             |         CAST(sum(dn2_e12) AS BIGINT) AS sd2
             |  FROM r GROUP BY event_type)
             |SELECT event_type, n_days,
             |       CAST(floor(CAST(sr AS DOUBLE) / n_days / 1000 + 0.5) AS BIGINT) AS mean_ret_e6,
             |       CAST(floor(CAST(sr AS DOUBLE) / n_days / 1000000000
             |            / sqrt(CAST(sd2 AS DOUBLE) / n_days / 1000000000000)
             |            * 1000000 + 0.5) AS BIGINT) AS sortino_e6
             |FROM g ORDER BY event_type""".stripMargin)
    ),
    Q(
      "ts_sample_entropy",
      // Sample entropy SampEn(m=2, r≈0.2σ) of the daily event-count
      // series (round-13): the regularity measure — low SampEn = the
      // series repeats its own 2-step patterns (periodic/templated load),
      // high = unpredictable — complementing spectral (ts_dominant_period)
      // and autocorrelation views with a nonlinear one. Template matches
      // are exact integer comparisons: tolerance t is ONE e0-floored
      // double (0.2·population σ from BIGINT moments — same value both
      // engines), A counts 2-step matches, B 3-step, SampEn = −ln(B/A)
      // e6-pinned. Self-pairs and direction are excluded by i<j.
      // Scale posture: SampEn runs on the AGGREGATED O(days) series —
      // the only O(rows) work is the daily rollup; the pair join is
      // O(days²) on a driver-safe few-hundred-row frame and stays that
      // size at ANY raw-event scale.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
          .agg(count(lit(1)).as("x"))
        val w = Window.orderBy(col("d"))
        val series = daily
          .withColumn("i", row_number().over(w))
          .withColumn("x1", lead(col("x"), 1).over(w))
          .withColumn("x2", lead(col("x"), 2).over(w))
          .filter(col("x2").isNotNull)
        val tol = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sq"))
          .select(expr("""floor(0.2 * sqrt((sq - CAST(sx AS DOUBLE) * sx / n) / n))""")
            .as("t"))
        val pairs = series.as("a")
          .join(series.as("b"), col("a.i") < col("b.i"))
          .crossJoin(broadcast(tol))
          .select(
            (abs(col("a.x") - col("b.x")) <= col("t") &&
              abs(col("a.x1") - col("b.x1")) <= col("t")).as("m2"),
            (abs(col("a.x") - col("b.x")) <= col("t") &&
              abs(col("a.x1") - col("b.x1")) <= col("t") &&
              abs(col("a.x2") - col("b.x2")) <= col("t")).as("m3"))
        pairs.agg(
            sum(when(col("m2"), 1L).otherwise(0L)).as("a_matches"),
            sum(when(col("m3"), 1L).otherwise(0L)).as("b_matches"))
          .select(col("a_matches"), col("b_matches"),
            // B = 0 ⇒ SampEn undefined (no 3-step template recurs): NULL,
            // matching the convention series libraries use for short input
            expr("""CASE WHEN b_matches > 0 AND a_matches > 0
                   THEN CAST(floor(-ln(CAST(b_matches AS DOUBLE) / a_matches)
                        * 1000000 + 0.5) AS BIGINT)
                   ELSE CAST(NULL AS BIGINT) END""").as("sampen_e6"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |tol AS (
             |  SELECT floor(0.2 * sqrt((sum(x * x) - CAST(sum(x) AS DOUBLE) * sum(x) / count(*))
             |               / count(*))) AS t
             |  FROM daily),
             |series AS (
             |  SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i, x,
             |         lead(x, 1) OVER (ORDER BY d) AS x1,
             |         lead(x, 2) OVER (ORDER BY d) AS x2
             |  FROM daily),
             |s AS (SELECT * FROM series WHERE x2 IS NOT NULL),
             |m AS (
             |  SELECT CAST(sum(CASE WHEN abs(a.x - b.x) <= t AND abs(a.x1 - b.x1) <= t
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS a_matches,
             |         CAST(sum(CASE WHEN abs(a.x - b.x) <= t AND abs(a.x1 - b.x1) <= t
             |                            AND abs(a.x2 - b.x2) <= t
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS b_matches
             |  FROM s a JOIN s b ON a.i < b.i CROSS JOIN tol)
             |SELECT a_matches, b_matches,
             |       CASE WHEN b_matches > 0 AND a_matches > 0
             |       THEN CAST(floor(-ln(CAST(b_matches AS DOUBLE) / a_matches)
             |            * 1000000 + 0.5) AS BIGINT)
             |       ELSE CAST(NULL AS BIGINT) END AS sampen_e6
             |FROM m""".stripMargin)
    ),
    Q(
      "win_cohort_ltv",
      // Cohort lifetime-value curve (round-13): cumulative revenue per
      // signup cohort by month offset — the money sibling of
      // agg_retention_cohorts (which counts the users, this follows the
      // dollars; together they are THE cohort dashboard). Cohort = each
      // customer's first-order month; offsets 0–5; revenue folds as
      // exact cents; the cumulative pass is a window ORDER BY offset
      // partitioned BY COHORT (bounded frames, no global sort); per-
      // customer LTV divides once as integer cents-per-customer.
      // Scale: first-order month is one min-aggregate by customer; the
      // (cohort, offset) matrix is O(months·6) rows after a map-side
      // combinable rollup.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("mo"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
        val cohort = o.groupBy(col("ck")).agg(min(col("mo")).as("c0"))
        val sized = cohort.groupBy(col("c0"))
          .agg(count(lit(1)).as("n_customers"))
        val cells = o.join(cohort, "ck")
          .select(col("c0"), (col("mo") - col("c0")).as("offset"),
            col("cents"))
          .filter(col("offset") <= 5L)
          .groupBy(col("c0"), col("offset"))
          .agg(sum(col("cents")).as("rev"))
        cells
          .withColumn("cum_cents", sum(col("rev")).over(
            Window.partitionBy(col("c0")).orderBy(col("offset"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .join(sized, "c0")
          .select(col("c0").as("cohort_month"), col("offset"),
            col("n_customers"), col("cum_cents"),
            expr("cum_cents DIV n_customers").as("ltv_cents_per_customer"))
          .orderBy(col("cohort_month"), col("offset"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS ck,
             |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mo,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |cohort AS (SELECT ck, CAST(min(mo) AS BIGINT) AS c0 FROM o GROUP BY ck),
             |sized AS (SELECT c0, CAST(count(*) AS BIGINT) AS n_customers
             |          FROM cohort GROUP BY c0),
             |cells AS (
             |  SELECT c0, mo - c0 AS "offset", CAST(sum(cents) AS BIGINT) AS rev
             |  FROM o JOIN cohort USING (ck)
             |  WHERE mo - c0 <= 5
             |  GROUP BY c0, mo - c0),
             |cum AS (
             |  SELECT c0, "offset",
             |         CAST(sum(rev) OVER (PARTITION BY c0 ORDER BY "offset"
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
             |  FROM cells)
             |SELECT c0 AS cohort_month, "offset", n_customers, cum_cents,
             |       cum_cents // n_customers AS ltv_cents_per_customer
             |FROM cum JOIN sized USING (c0)
             |ORDER BY cohort_month, "offset"""".stripMargin)
    ),
    Q(
      "ts_decay_halflife",
      // Engagement decay half-life per event type (round-13): fit
      // ln(daily count) against the day index by closed-form OLS and
      // report the half-life ln2/|slope| — the one-number retention
      // decay a growth dashboard tracks (ts_growth_rates gives the
      // period deltas; this is the fitted exponential behind them).
      // Determinism: each day's ln(count) is e6-floored BEFORE the
      // regression sums (both engines produce the identical BIGINT per
      // day — no float accumulation order), the OLS slope assembles from
      // five exact integer sums, and the half-life gate AND value both
      // derive from the REPORTED rounded slope (ADVICE r13: gating on
      // the raw numerator sign could emit slope 0 next to a non-null
      // half-life when the slope sat in (−0.5e−6, 0)/day — the printed
      // columns could contradict each other; now slope_e6_per_day < 0
      // is the single source of truth). Scale: one map-side daily
      // rollup per type; the regression fold carries O(types) rows.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("d"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("d")))
            .cast("long"))
          .select(col("event_type"), col("i"),
            expr("CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
              .as("y"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("i")).as("si"),
            sum(col("y")).as("sy"), sum(col("i") * col("i")).as("sii"),
            sum(col("i") * col("y")).as("siy"))
          .select(col("event_type"), col("n").as("n_days"),
            expr("""CAST(floor((CAST(n AS DOUBLE) * siy - CAST(si AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sii - CAST(si AS DOUBLE) * si) + 0.5) AS BIGINT)""")
              .as("slope_e6_per_day"))
          .select(col("event_type"), col("n_days"), col("slope_e6_per_day"),
            expr("""CASE WHEN slope_e6_per_day < 0
                   THEN CAST(floor(ln(CAST(2 AS DOUBLE)) * 100000000
                        / (-slope_e6_per_day) + 0.5) AS BIGINT)
                   ELSE CAST(NULL AS BIGINT) END""").as("halflife_days_e2"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT event_type,
             |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS i,
             |         CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
             |  FROM daily),
             |g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(i) AS BIGINT) AS si, CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(i * i) AS BIGINT) AS sii,
             |         CAST(sum(i * y) AS BIGINT) AS siy
             |  FROM idx GROUP BY event_type),
             |sl AS (
             |  SELECT event_type, n AS n_days,
             |         CAST(floor((CAST(n AS DOUBLE) * siy - CAST(si AS DOUBLE) * sy)
             |              / (CAST(n AS DOUBLE) * sii - CAST(si AS DOUBLE) * si) + 0.5) AS BIGINT)
             |           AS slope_e6_per_day
             |  FROM g)
             |SELECT event_type, n_days, slope_e6_per_day,
             |       CASE WHEN slope_e6_per_day < 0
             |       THEN CAST(floor(ln(CAST(2 AS DOUBLE)) * 100000000
             |            / (-slope_e6_per_day) + 0.5) AS BIGINT)
             |       ELSE CAST(NULL AS BIGINT) END AS halflife_days_e2
             |FROM sl ORDER BY event_type""".stripMargin)
    )
  )

  /** Shared Spark/DuckDB SQL for [[win_drawdown]]. */
  private lazy val drawdownSql: String =
    """WITH sgn AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN event_type = 'purchase'
      |              THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
      |              ELSE -CAST(floor(value * 100 + 0.5) AS BIGINT) END AS delta
      |  FROM events),
      |bal AS (
      |  SELECT user_id, ts, event_id,
      |         CAST(sum(delta) OVER w AS BIGINT) AS balance
      |  FROM sgn
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |pk AS (
      |  SELECT user_id, balance,
      |         CAST(max(balance) OVER w AS BIGINT) AS peak
      |  FROM bal
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id,
      |       CAST(max(peak - balance) AS BIGINT) AS max_drawdown_cents,
      |       CAST(max(peak) AS BIGINT) AS peak_cents
      |FROM pk GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Shared Spark/DuckDB SQL for [[ts_peak_detection]]. */
  private lazy val peakSql: String =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |nbr AS (
      |  SELECT d, x,
      |         lag(x) OVER (ORDER BY d) AS px,
      |         lead(x) OVER (ORDER BY d) AS nx
      |  FROM daily)
      |SELECT d, x, CAST(x - greatest(px, nx) AS BIGINT) AS prominence
      |FROM nbr
      |WHERE px IS NOT NULL AND nx IS NOT NULL AND x > px AND x >= nx
      |ORDER BY d""".stripMargin

  /** Shared Spark/DuckDB SQL for [[ts_alert_debounce]]: breach = value ≥
    * the ~p75 cents threshold; raise on the 3rd element of a breach run,
    * clear on the 2nd of a normal run, episodes open at the first raise
    * after each clear.
    */
  private lazy val debounceSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, ts,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) >= 7000 AS breach
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, ts, breach,
      |    CASE WHEN lag(breach) OVER w IS NULL OR lag(breach) OVER w <> breach
      |         THEN 1 ELSE 0 END AS chg
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (
      |  SELECT user_id, event_id, ts, breach,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rid
      |  FROM m),
      |e AS (
      |  SELECT user_id, event_id, breach, rid,
      |    CAST(row_number() OVER (PARTITION BY user_id, rid ORDER BY ts, event_id)
      |         AS BIGINT) AS rn
      |  FROM r),
      |pts AS (
      |  SELECT user_id, rid, event_id,
      |         CASE WHEN breach THEN 1 ELSE 0 END AS kind
      |  FROM e
      |  WHERE (breach AND rn = 3) OR (NOT breach AND rn = 2)),
      |cb AS (
      |  SELECT user_id, rid, event_id, kind,
      |    CAST(coalesce(sum(1 - kind) OVER (PARTITION BY user_id ORDER BY rid
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS clears_before
      |  FROM pts),
      |opens AS (
      |  SELECT user_id, clears_before, min(rid) AS raise_rid
      |  FROM cb WHERE kind = 1 GROUP BY user_id, clears_before),
      |episodes AS (
      |  SELECT o.user_id, o.raise_rid,
      |    (SELECT min(c.rid) FROM cb c
      |     WHERE c.user_id = o.user_id AND c.kind = 0
      |       AND c.rid > o.raise_rid) AS clear_rid
      |  FROM opens o)
      |SELECT ep.user_id,
      |       CAST(rp.event_id AS BIGINT) AS raise_eid,
      |       CAST(coalesce(cp.event_id, -1) AS BIGINT) AS clear_eid
      |FROM episodes ep
      |JOIN cb rp ON rp.user_id = ep.user_id AND rp.rid = ep.raise_rid
      |           AND rp.kind = 1
      |LEFT JOIN cb cp ON cp.user_id = ep.user_id AND cp.rid = ep.clear_rid
      |                AND cp.kind = 0
      |ORDER BY ep.user_id, raise_eid""".stripMargin

  /** Shared Granger-screen SQL for [[stat_granger_1lag]]: the Spark text;
    * [[grangerSqlDuck]] differs only in date arithmetic (date_add vs +1)
    * and the integer-division spelling inside the pivoted spine.
    */
  private def grangerBody(lagJoin: String): String =
    s"""WITH daily AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v
       |  FROM events GROUP BY 1),
       |frame AS (
       |  SELECT 'view_predicts_click' AS dir, a.c AS y, b.c AS u, b.v AS w
       |  FROM daily a JOIN daily b ON $lagJoin
       |  UNION ALL
       |  SELECT 'click_predicts_view', a.v, b.v, b.c
       |  FROM daily a JOIN daily b ON $lagJoin),
       |mom AS (
       |  SELECT dir, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(u) AS BIGINT) AS su, CAST(sum(w) AS BIGINT) AS sw,
       |         CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(u * u) AS BIGINT) AS suu,
       |         CAST(sum(w * w) AS BIGINT) AS sww,
       |         CAST(sum(u * w) AS BIGINT) AS suw,
       |         CAST(sum(u * y) AS BIGINT) AS suy,
       |         CAST(sum(w * y) AS BIGINT) AS swy,
       |         CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM frame GROUP BY dir),
       |cen AS (
       |  SELECT dir, n,
       |         suu - CAST(su AS DOUBLE) * su / n AS cuu,
       |         sww - CAST(sw AS DOUBLE) * sw / n AS cww,
       |         suw - CAST(su AS DOUBLE) * sw / n AS cuw,
       |         suy - CAST(su AS DOUBLE) * sy / n AS cuy,
       |         swy - CAST(sw AS DOUBLE) * sy / n AS cwy,
       |         syy - CAST(sy AS DOUBLE) * sy / n AS cyy
       |  FROM mom),
       |rss AS (
       |  SELECT dir, n,
       |         cyy - cuy * cuy / cuu AS rss_r,
       |         cyy - ((cuy * cww - cwy * cuw) * cuy
       |                + (cwy * cuu - cuy * cuw) * cwy)
       |               / (cuu * cww - cuw * cuw) AS rss_f
       |  FROM cen)
       |SELECT dir, n AS n_days,
       |       CAST(floor((rss_r - rss_f) * (n - 3) / rss_f * 1000000 + 0.5) AS BIGINT)
       |         AS f_e6,
       |       CAST(floor((rss_r - rss_f) * (n - 3) / rss_f * 1000000 + 0.5) AS BIGINT)
       |         > 3868000 AS granger_reject
       |FROM rss ORDER BY dir""".stripMargin

  private lazy val grangerSql: String =
    grangerBody("b.d = date_add(a.d, -1)")

  private lazy val grangerSqlDuck: String =
    grangerBody("b.d = a.d - CAST(1 AS INTEGER)")

  /** Shared PACF SQL for [[ts_pacf_durbin]] — the ts_autocorr_lag
    * integer-moment estimator at k = 1..3, pivoted to one row, pushed
    * through the Durbin-Levinson closed forms, and unpivoted back.
    */
  private def pacfSql(duck: Boolean): String = {
    val lagJoin =
      if (duck) "b.d = a.d + CAST(l.k AS INTEGER)"
      else "b.d = date_add(a.d, l.k)"
    val lags =
      if (duck) "SELECT unnest(range(1, 4)) AS k"
      else "SELECT CAST(id AS INT) AS k FROM range(1, 4)"
    s"""WITH daily AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
       |         CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
       |         CAST(sum(x * x) AS BIGINT) AS q FROM daily),
       |lags AS ($lags),
       |pairs AS (
       |  SELECT l.k,
       |         CAST(count(*) AS BIGINT) AS m,
       |         CAST(sum(a.x * b.x) AS BIGINT) AS axx,
       |         CAST(sum(a.x) AS BIGINT) AS bx,
       |         CAST(sum(b.x) AS BIGINT) AS cx
       |  FROM lags l
       |  JOIN daily a ON TRUE
       |  JOIN daily b ON $lagJoin
       |  GROUP BY l.k),
       |rk AS (
       |  SELECT k,
       |         CAST(floor((CAST(axx AS DOUBLE)
       |              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(bx + cx AS DOUBLE)
       |              + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
       |              / (CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
       |              * 1000000 + 0.5) AS BIGINT) AS r_e6
       |  FROM pairs, stats),
       |piv AS (
       |  SELECT max(CASE WHEN k = 1 THEN r_e6 END) / CAST(1000000 AS DOUBLE) AS r1,
       |         max(CASE WHEN k = 2 THEN r_e6 END) / CAST(1000000 AS DOUBLE) AS r2,
       |         max(CASE WHEN k = 3 THEN r_e6 END) / CAST(1000000 AS DOUBLE) AS r3
       |  FROM rk),
       |dl AS (
       |  SELECT r1, r2, r3,
       |         r1 AS p11,
       |         (r2 - r1 * r1) / (1 - r1 * r1) AS p22
       |  FROM piv),
       |dl2 AS (
       |  SELECT r1, r2, r3, p11, p22,
       |         p11 - p22 * p11 AS p21
       |  FROM dl),
       |out AS (
       |  SELECT CAST(1 AS BIGINT) AS lag_k,
       |         CAST(floor(r1 * 1000000 + 0.5) AS BIGINT) AS acf_e6,
       |         CAST(floor(p11 * 1000000 + 0.5) AS BIGINT) AS pacf_e6
       |  FROM dl2
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT),
       |         CAST(floor(r2 * 1000000 + 0.5) AS BIGINT),
       |         CAST(floor(p22 * 1000000 + 0.5) AS BIGINT)
       |  FROM dl2
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT),
       |         CAST(floor(r3 * 1000000 + 0.5) AS BIGINT),
       |         CAST(floor((r3 - p21 * r2 - p22 * r1)
       |              / (1 - p21 * r1 - p22 * r2) * 1000000 + 0.5) AS BIGINT)
       |  FROM dl2)
       |SELECT lag_k, acf_e6, pacf_e6 FROM out ORDER BY lag_k""".stripMargin
  }
}
