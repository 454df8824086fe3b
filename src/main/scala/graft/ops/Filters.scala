package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.2 filters / predicates. Models the reference's incremental
  * `since/until` time-window pulls and enum predicates (workflow_state) —
  * SURVEY.md §2.2 [DAP]. All predicates are Catalyst-pushable: they reach
  * the parquet scan as `PushedFilters`, so at 100 TB row groups outside the
  * window are skipped via min/max statistics.
  */
object Filters {

  val defs: Seq[Q] = Seq(
    Q(
      "filter_pushdown_date",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),
    Q(
      "filter_in_set",
      (s, dir) => {
        Tables(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(col("o_orderkey"), col("o_orderpriority"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "filter_null_3vl",
      // The fixtures are null-free, so nulls are synthesized with `nullif`
      // and then exercised through IS NULL / coalesce three-valued logic.
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            nullif(col("l_returnflag"), lit("N")).as("flag_or_null"))
          .withColumn("flag_filled", coalesce(col("flag_or_null"), lit("none")))
          .withColumn("is_missing", col("flag_or_null").isNull)
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       nullif(l_returnflag, 'N') AS flag_or_null,
             |       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_filled,
             |       nullif(l_returnflag, 'N') IS NULL AS is_missing
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    )
  )
}
