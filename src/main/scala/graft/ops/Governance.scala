package graft.ops

import graft.Q

/** §2 governance tier (round-14, verdict #6): the lakehouse
  * access-control primitives — column masking and row-filter policies —
  * expressed the way Spark actually enforces them: as POLICY-SCOPED VIEWS
  * the optimizer inlines into the query plan. The load-bearing property
  * (pinned in PlanShapeSpec) is that governance must be FREE at scan
  * time: a masked view still column-prunes (a query that never touches
  * the masked column never reads the underlying one) and a row-filter
  * view still pushes the consumer's own predicates into the parquet scan
  * (PushedFilters reaches the file) while the policy itself plans as a
  * broadcast semi-join against the tiny policy relation. Governance that
  * breaks pruning/pushdown turns every policy rollout into a full-scan
  * regression at 100 TB — the plan assertions are the point, not the
  * masking arithmetic.
  */
object Governance {

  val defs: Seq[Q] = Seq(
    Q(
      "sql_column_mask",
      // Column-masking policy view: c_name (the fixture's PII-shaped
      // column) is reduced to '***-' + last 4 — the format-preserving
      // redaction every PII policy starts with —
      // and c_acctbal is coarsened to a band — consumers see the masked
      // SHAPE, never the raw value, and the mask is an ordinary
      // expression so whole-stage codegen keeps the scan pipeline fused.
      // Both engines evaluate the identical masking text. Scale: masking
      // is per-row projection (zero shuffle); unused masked columns
      // prune out of the scan entirely (PlanShapeSpec pins ReadSchema).
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""CREATE OR REPLACE TEMPORARY VIEW customer_masked AS
                |SELECT c_custkey,
                |       concat('***-', substr(c_name, length(c_name) - 3, 4))
                |         AS name_masked,
                |       CASE WHEN c_acctbal < 0 THEN 'NEG'
                |            WHEN c_acctbal < 5000 THEN 'LOW'
                |            ELSE 'HIGH' END AS bal_band,
                |       c_mktsegment
                |FROM customer""".stripMargin)
        s.sql("""SELECT c_mktsegment, bal_band,
                |       CAST(count(*) AS BIGINT) AS n,
                |       CAST(count(DISTINCT name_masked) AS BIGINT) AS n_masks
                |FROM customer_masked
                |WHERE c_custkey % 2 = 0
                |GROUP BY c_mktsegment, bal_band
                |ORDER BY c_mktsegment, bal_band""".stripMargin)
      },
      Some("""WITH customer_masked AS (
             |  SELECT c_custkey,
             |         concat('***-', substr(c_name, length(c_name) - 3, 4))
             |           AS name_masked,
             |         CASE WHEN c_acctbal < 0 THEN 'NEG'
             |              WHEN c_acctbal < 5000 THEN 'LOW'
             |              ELSE 'HIGH' END AS bal_band,
             |         c_mktsegment
             |  FROM customer)
             |SELECT c_mktsegment, bal_band,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(count(DISTINCT name_masked) AS BIGINT) AS n_masks
             |FROM customer_masked
             |WHERE c_custkey % 2 = 0
             |GROUP BY c_mktsegment, bal_band
             |ORDER BY c_mktsegment, bal_band""".stripMargin)
    ),
    Q(
      "sql_row_filter_policy",
      // Row-filter policy view: a (principal, segment) grant table gates
      // which customer rows a principal's queries can see — the view
      // applies `segment IN (grants of this principal)` so downstream
      // queries are untrusted-by-construction (they cannot name rows the
      // policy hides). The policy relation is VALUES-inlined (in
      // production a catalog table of O(principals·grants) rows — always
      // broadcast-size), so enforcement costs one broadcast semi-join
      // and the consumer's own filters still push into the scan
      // (PlanShapeSpec pins both). Output: per-nation census of the
      // EMEA analyst's visible slice, exact integer cents.
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""CREATE OR REPLACE TEMPORARY VIEW seg_policy AS
                |SELECT * FROM VALUES
                |  ('emea_analyst', 'BUILDING'),
                |  ('emea_analyst', 'AUTOMOBILE'),
                |  ('apac_analyst', 'MACHINERY')
                |AS p(principal, seg)""".stripMargin)
        s.sql("""CREATE OR REPLACE TEMPORARY VIEW customer_rls AS
                |SELECT c.* FROM customer c
                |WHERE c.c_mktsegment IN
                |  (SELECT seg FROM seg_policy
                |   WHERE principal = 'emea_analyst')""".stripMargin)
        s.sql("""SELECT c_nationkey,
                |       CAST(count(*) AS BIGINT) AS n_cust,
                |       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                |            AS BIGINT) AS bal_cents
                |FROM customer_rls
                |GROUP BY c_nationkey
                |ORDER BY c_nationkey""".stripMargin)
      },
      Some("""WITH seg_policy AS (
             |  SELECT * FROM (VALUES
             |    ('emea_analyst', 'BUILDING'),
             |    ('emea_analyst', 'AUTOMOBILE'),
             |    ('apac_analyst', 'MACHINERY'))
             |  AS p(principal, seg)),
             |customer_rls AS (
             |  SELECT c.* FROM customer c
             |  WHERE c.c_mktsegment IN
             |    (SELECT seg FROM seg_policy
             |     WHERE principal = 'emea_analyst'))
             |SELECT c_nationkey,
             |       CAST(count(*) AS BIGINT) AS n_cust,
             |       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
             |            AS BIGINT) AS bal_cents
             |FROM customer_rls
             |GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)
    ))
}
