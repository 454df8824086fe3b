package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q

/** TPC-H suite completion (round 9).
  *
  * The reference's analytical surface is ANSI SQL over the cataloged
  * replica (SURVEY.md §3.1 E3); the TPC-H queries are the canonical probe
  * set for that surface. Q1/Q3/Q5/Q7/Q10/Q14/Q18 shapes already exist
  * (`agg_hash_group`, `sql_tpch_q3/q5/q7/q10/q14/q18`); this file adds every
  * remaining query: Q4, Q6, Q8, Q12, Q13, Q15, Q17, Q19, Q21, Q22 directly
  * on the fixture schema, and — closing the suite at 22 of 22 in the round-9
  * tail — Q2, Q9, Q11, Q16, Q20 over a DERIVED `partsupp` (the driver's
  * testdata ships none; see [[psCte]]). Columns the fixture lacks are
  * adapted per query and noted inline (no `l_commitdate`/`l_receiptdate`/
  * `l_shipmode`/`p_container`/`c_phone`/`s_comment`/`p_comment`).
  *
  * Determinism: revenue is summed in exact BIGINT cents
  * (`floor(price * 100 + 0.5)`) so no float accumulation order can flip a
  * value or a ranking; ratios are pinned to integer e6; every query ends in
  * a total-order sort. Both engines run the IDENTICAL SQL text, so the
  * oracle is equivalence of two independent executors, not a restatement.
  *
  * Scale posture (100 TB): every query below is dimension-broadcast +
  * single fact exchange. The correlated EXISTS/scalar subqueries (Q4, Q17,
  * Q21, Q22) decorrelate in Catalyst (`RewritePredicateSubquery`,
  * `RewriteCorrelatedScalarSubquery`) into semi/anti/aggregate joins keyed
  * on the correlation column — the same shuffle the hand-written join would
  * make; nothing falls back to per-row re-execution.
  */
object Tpch {

  private def q(name: String, sql: String): Q =
    Q(name, (s: SparkSession, dir: String) => graft.Catalog.sql(s, dir, sql),
      Some(sql))

  /** TPC-H Q4 (order priority checking). Fixture lacks
    * `l_commitdate`/`l_receiptdate`, so "late line" is adapted to
    * "shipped > 30 days after the order date". The EXISTS decorrelates to
    * a left-semi join on l_orderkey with the date predicate as a join-side
    * filter — one fact exchange, no per-order probe.
    */
  val q4sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |              AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q6 (forecasting revenue change): the pure-scan aggregate — both
    * date bounds and both numeric range predicates push into the parquet
    * row-group stats; the whole query is one map-side partial sum + a
    * 1-row final. The discount band is written as two >=/<= comparisons so
    * the pushdown is two simple binary predicates.
    */
  val q6sql: String =
    """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q8 (national market share): the deepest snowflake in the suite —
    * nation joins twice (customer's region gate, supplier's share flag).
    * All seven dimension legs are broadcast-sized at any scale; the numeric
    * share is carried as exact cents numerator/denominator plus an e6-pinned
    * ratio so the two engines' float division cannot drift.
    */
  val q8sql: String =
    """WITH j AS (
      |  SELECT year(o_orderdate) AS yr,
      |         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
      |         CASE WHEN n2.n_name = 'NATION_1' THEN 1 ELSE 0 END AS is_target
      |  FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
      |    AND o_custkey = c_custkey
      |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |    AND r_name = 'ASIA'
      |    AND s_suppkey = l_suppkey AND s_nationkey = n2.n_nationkey
      |    AND p_type = 'ECONOMY'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT CAST(yr AS BIGINT) AS yr,
      |       CAST(sum(is_target * cents) AS BIGINT) AS target_cents,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(floor(CAST(sum(is_target * cents) AS DOUBLE)
      |                  / CAST(sum(cents) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS mkt_share_e6
      |FROM j GROUP BY yr ORDER BY yr""".stripMargin

  /** TPC-H Q12 (shipping modes / priority). Fixture lacks `l_shipmode` and
    * the commit/receipt dates; adapted to return-flag as the mode axis and
    * "shipped within 90 days of ordering" as the timeliness gate. The
    * conditional counts are map-side CASE sums over the single
    * orders⋈lineitem exchange.
    */
  val q12sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= o_orderdate
      |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q13 (customer order-count distribution): the outer-join-then-
    * histogram shape. The join keeps every customer (left outer with the
    * filter ON the join, not WHERE — the one-sided-predicate subtlety the
    * query exists to test); fixture lacks `o_comment`, so the excluded
    * class is '5-LOW' priority orders. Two aggregations, each partial+final.
    */
  val q13sql: String =
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |SELECT CAST(c_count AS BIGINT) AS c_count,
      |       CAST(count(*) AS BIGINT) AS custdist
      |FROM c_orders GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15 (top supplier): aggregate-then-argmax-via-scalar-subquery.
    * The revenue CTE is computed once (Catalyst plans the self-reference as
    * a reused subquery + a 1-row max broadcast); exact-cents revenue makes
    * the max and the equality tie-set deterministic, and ties (all top
    * suppliers) are returned ordered by key as the spec requires.
    */
  val q15sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_cents
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_cents = (SELECT max(total_cents) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 (small-quantity-order revenue): the correlated-aggregate
    * scalar subquery (per-part 20%-of-average threshold). Fixture lacks
    * `p_container`; the part gate is brand-only. Catalyst decorrelates to
    * a per-partkey aggregate joined back on l_partkey — one extra exchange
    * over the same key, never a per-row subquery. l_quantity is
    * integer-valued (FIXTURES.md), so avg is an exact-sum/count and the
    * 0.2× threshold compare is order-independent.
    */
  val q17sql: String =
    """SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS small_qty_cents
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q19 (discounted revenue): the disjunctive multi-band predicate —
    * three (brand, size-band, quantity-band) arms OR'd across the
    * lineitem⋈part join. Fixture lacks `p_container`/`l_shipmode`; bands
    * use p_size and l_quantity. Part broadcasts; the OR stays a single
    * codegen'd filter over the joined row.
    */
  val q19sql: String =
    """SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND ((p_brand = 'Brand#1' AND p_size >= 1 AND p_size <= 15
      |        AND l_quantity >= 1 AND l_quantity <= 11)
      |    OR (p_brand = 'Brand#2' AND p_size >= 1 AND p_size <= 25
      |        AND l_quantity >= 10 AND l_quantity <= 20)
      |    OR (p_brand = 'Brand#3' AND p_size >= 1 AND p_size <= 35
      |        AND l_quantity >= 20 AND l_quantity <= 30))""".stripMargin

  /** TPC-H Q21 (suppliers who kept orders waiting): the double-correlated
    * EXISTS / NOT EXISTS shape — the hardest decorrelation in the suite
    * (one semi and one anti join against the same fact table on the same
    * key, with a supplier-inequality residual). Fixture lacks receipt/commit
    * dates; "kept waiting" is adapted to "the ONLY supplier whose line in a
    * finished order was returned". Both subqueries land on the l_orderkey
    * exchange; AQE reuses it.
    */
  val q21sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H Q22 (global sales opportunity): uncorrelated scalar-average
    * gate + anti join. Fixture lacks `c_phone` (country-code substring) and
    * every sf0.01 customer has orders, so the adaptation gates on
    * above-average balance with no URGENT orders, grouped by nation key.
    * The average is taken over exact BIGINT cents, so the threshold double
    * is identical in both engines regardless of row order; the NOT EXISTS
    * decorrelates to a broadcast-able anti join on o_custkey.
    */
  val q22sql: String =
    """WITH eligible AS (
      |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      |  WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) >
      |        (SELECT avg(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
      |         FROM customer WHERE c_acctbal > 0.0)
      |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT'))
      |SELECT CAST(c_nationkey AS BIGINT) AS cntry,
      |       CAST(count(*) AS BIGINT) AS numcust,
      |       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS totacctbal_cents
      |FROM eligible GROUP BY c_nationkey ORDER BY cntry""".stripMargin

  /** Derived `partsupp` CTE prefix (closes TPC-H at 22/22). The driver's
    * testdata ships no `partsupp` table, so the five queries that need one
    * (Q2/Q9/Q11/Q16/Q20) derive it DETERMINISTICALLY from `part` ×
    * 4 slots with pure integer arithmetic — both engines run the identical
    * SQL text, so the oracle still compares two independent executors, not
    * a restatement. Per part, the 4 slot suppkeys are consecutive mod
    * s_cnt (distinct whenever s_cnt ≥ 4 — FIXTURES.md: 10 at sf0.001), and
    * the 4 supply costs differ by multiples of 43 mod 100000 (distinct), so
    * per-part min-cost argmins are unique and every ORDER BY below is
    * total. Supply cost is kept in integer cents end-to-end — no float
    * accumulation anywhere in the five queries.
    *
    * Scale posture: O(4·|part|) rows, never O(part×supplier) — the CTE is
    * a dimension-sized derivation (flat-mapped from the `part` scan, one
    * 1-row `sbound` broadcast), so at 100 TB it stays broadcast-sized
    * relative to the lineitem fact exactly like the real `partsupp`/`part`
    * ratio (4:1) would.
    */
  val psCte: String =
    """WITH sbound AS (
      |  SELECT CAST(count(*) AS BIGINT) AS s_cnt,
      |         CAST(min(s_suppkey) AS BIGINT) AS s_min FROM supplier),
      |slots AS (SELECT CAST(0 AS BIGINT) AS slot UNION ALL SELECT 1
      |          UNION ALL SELECT 2 UNION ALL SELECT 3),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey * 13 + slot) % s_cnt + s_min AS ps_suppkey,
      |         (p_partkey * 31 + slot * 7) % 9999 + 1 AS ps_availqty,
      |         (p_partkey * 97 + slot * 43) % 100000 + 100 AS ps_supplycost_cents
      |  FROM part CROSS JOIN slots CROSS JOIN sbound)""".stripMargin

  /** TPC-H Q2 (minimum cost supplier): the correlated-min scalar subquery
    * over a shared CTE — Catalyst plans `costs` once (CTE reuse) and
    * decorrelates the min into a per-partkey aggregate joined back.
    * Fixture lacks `p_mfgr`/`s_address`/`s_phone`; the projection keeps
    * the sort-relevant columns. All dimension legs broadcast.
    */
  val q2sql: String = psCte +
    """,
      |costs AS (
      |  SELECT ps_partkey, ps_supplycost_cents, s_name, s_acctbal, n_name
      |  FROM partsupp, supplier, nation, region
      |  WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
      |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
      |SELECT CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_cents,
      |       s_name, n_name, p_partkey,
      |       ps_supplycost_cents AS supplycost_cents
      |FROM part, costs
      |WHERE p_partkey = ps_partkey AND p_type = 'ECONOMY' AND p_size >= 10
      |  AND ps_supplycost_cents = (SELECT min(c2.ps_supplycost_cents)
      |                             FROM costs c2
      |                             WHERE c2.ps_partkey = p_partkey)
      |ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey""".stripMargin

  /** TPC-H Q9 (product type profit): profit = revenue − supply cost, by
    * nation × year. The 6-way join keeps lineitem as the single exchanged
    * fact; partsupp joins on the composite (l_partkey, l_suppkey) key.
    * l_quantity is integer-valued (FIXTURES.md) so `floor(q + 0.5)` makes
    * the cost leg exact BIGINT cents in both engines.
    */
  val q9sql: String = psCte +
    """,
      |profit AS (
      |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
      |           - ps_supplycost_cents * CAST(floor(l_quantity + 0.5) AS BIGINT) AS amount_cents
      |  FROM lineitem, part, supplier, partsupp, orders, nation
      |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
      |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
      |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |    AND p_type = 'PROMO')
      |SELECT nation, CAST(o_year AS BIGINT) AS o_year,
      |       CAST(sum(amount_cents) AS BIGINT) AS sum_profit_cents
      |FROM profit GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 (important stock): per-part stock value in one nation vs a
    * fraction-of-total HAVING gate. The `stock` CTE is computed once; the
    * scalar total is a 1-row broadcast. The probed nation is the smallest
    * nationkey that actually has a supplier (a fixed literal like
    * 'NATION_1' can be supplier-empty at sf0.001 — 10 suppliers over 25
    * nations); threshold 1/500 (the spec's 0.0001/sf scaled to fixture
    * size). Integer-cents values stay well inside double exactness for
    * the division.
    */
  val q11sql: String = psCte +
    """,
      |stock AS (
      |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS value_cents
      |  FROM partsupp, supplier, nation
      |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_nationkey = (SELECT min(s_nationkey) FROM supplier))
      |SELECT ps_partkey, CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM stock GROUP BY ps_partkey
      |HAVING sum(value_cents) > (SELECT sum(value_cents) / 500 FROM stock)
      |ORDER BY value_cents DESC, ps_partkey""".stripMargin

  /** TPC-H Q16 (parts/supplier relationship): distinct-supplier counts per
    * (brand, type, size) with a NOT-IN supplier exclusion. Fixture lacks
    * `s_comment` ("Customer Complaints"); the excluded class is negative-
    * balance suppliers. The NOT IN plans as a null-aware anti join against
    * a broadcast-sized supplier list; count(DISTINCT) expands per group.
    */
  val q16sql: String = psCte +
    """
      |SELECT p_brand, p_type, p_size,
      |       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp, part
      |WHERE p_partkey = ps_partkey
      |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 (potential part promotion): the nested IN chain with a
    * correlated availability threshold — suppliers whose stock of a SMALL
    * part exceeds half that part-supplier's 1996 shipped quantity.
    * Catalyst decorrelates the scalar sum to a (l_partkey, l_suppkey)
    * aggregate joined to partsupp on the composite key; an empty shipment
    * group yields NULL and the `>` excludes it, matching the spec. Fixture
    * suppliers are too few per nation at small sf for the nation gate, so
    * all qualifying suppliers are returned.
    */
  val q20sql: String = psCte +
    """
      |SELECT s_name, CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_cents
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp
      |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
      |    AND ps_availqty > (SELECT 0.5 * sum(l_quantity) FROM lineitem
      |                       WHERE l_partkey = ps_partkey
      |                         AND l_suppkey = ps_suppkey
      |                         AND l_shipdate >= TIMESTAMP '1996-01-01'
      |                         AND l_shipdate < TIMESTAMP '1997-01-01'))
      |ORDER BY s_name""".stripMargin

  def defs: Seq[Q] = Seq(
    // TPC-H Q2 minimum-cost supplier: correlated MIN subquery over partsupp, 5-way dim join — run verbatim through spark.sql, decorrelation left to Catalyst.
    q("sql_tpch_q2", q2sql),
    // TPC-H Q9 product-type profit: 6-table join + LIKE filter + year rollup — the join-reorder workout.
    q("sql_tpch_q9", q9sql),
    // TPC-H Q11 important stock: grouped value vs a scalar-subquery global threshold (HAVING over a cross-plan aggregate).
    q("sql_tpch_q11", q11sql),
    // TPC-H Q16 supplier relationship: NOT IN anti-subquery + count-distinct per part attribute triple.
    q("sql_tpch_q16", q16sql),
    // TPC-H Q20 potential promotion: nested IN subqueries three deep, semi-join pipeline.
    q("sql_tpch_q20", q20sql),
    // TPC-H Q4 order priority: EXISTS semi-join against late lineitems, priority rollup.
    q("sql_tpch_q4", q4sql),
    // TPC-H Q6 forecast revenue: pure scan-side predicate fold — the pushdown benchmark.
    q("sql_tpch_q6", q6sql),
    // TPC-H Q8 national market share: 8-table star with CASE share numerator over year buckets.
    q("sql_tpch_q8", q8sql),
    // TPC-H Q12 shipmode priority: two-band conditional counts after a date-window join.
    q("sql_tpch_q12", q12sql),
    // TPC-H Q13 customer distribution: left outer join + NOT LIKE, histogram of order counts (the skew/null-bucket workout).
    q("sql_tpch_q13", q13sql),
    // TPC-H Q15 top supplier: revenue view + global-max equality (tie-safe by construction).
    q("sql_tpch_q15", q15sql),
    // TPC-H Q17 small-quantity-order revenue: per-part AVG correlated subquery against its own lineitems.
    q("sql_tpch_q17", q17sql),
    // TPC-H Q19 discounted revenue: three OR'd multi-predicate bands — disjunctive pushdown.
    q("sql_tpch_q19", q19sql),
    // TPC-H Q21 suppliers who kept orders waiting: EXISTS + NOT EXISTS double correlation on the same fact.
    q("sql_tpch_q21", q21sql),
    // TPC-H Q22 global sales opportunity: substring country buckets, NOT EXISTS anti-join vs avg-balance scalar subquery.
    q("sql_tpch_q22", q22sql))
}
