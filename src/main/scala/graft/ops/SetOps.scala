package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2.7 set operations. `except` is the snapshot-diff primitive the
  * reference's reconciliation relies on (SURVEY.md §2.7 [DAP]). Spark plans
  * intersect/except as left-semi/anti joins after distinct — one shuffle on
  * the full row, same as a key join at scale.
  */
object SetOps {

  private def a(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").filter(col("o_totalprice") > 100000)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def b(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private val aSql = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 100000"
  private val bSql = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'"
  private val ord = "ORDER BY o_orderkey, o_orderstatus, o_totalprice"

  val defs: Seq[Q] = Seq(
    Q(
      "set_union_all",
      (s, dir) => a(s, dir).unionByName(b(s, dir))
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some(s"($aSql) UNION ALL ($bSql) $ord")
    ),
    Q(
      "set_union_distinct",
      (s, dir) => a(s, dir).unionByName(b(s, dir)).distinct()
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some(s"($aSql) UNION ($bSql) $ord")
    ),
    Q(
      "set_intersect",
      (s, dir) => a(s, dir).intersect(b(s, dir))
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some(s"($aSql) INTERSECT ($bSql) $ord")
    ),
    Q(
      "set_except",
      (s, dir) => a(s, dir).except(b(s, dir))
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some(s"($aSql) EXCEPT ($bSql) $ord")
    ),
    Q(
      "set_except_all",
      // Multiset difference (bag semantics — duplicates subtract one-for-
      // one, not to zero). Spark plans it as a count-tagged aggregation +
      // generate, still one shuffle on the full row.
      (s, dir) => a(s, dir).exceptAll(b(s, dir))
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some(s"($aSql) EXCEPT ALL ($bSql) $ord")
    ),
    Q(
      "set_intersect_all",
      // Multiset intersection: min of per-side multiplicities survives.
      (s, dir) => a(s, dir).intersectAll(b(s, dir))
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some(s"($aSql) INTERSECT ALL ($bSql) $ord")
    ),
    Q(
      "set_union_by_name",
      // Schema-drift-tolerant union: two feeds with overlapping but
      // unequal columns align BY NAME, absent columns null-fill — the
      // evolving-landing-zone concatenation (positional UNION would
      // silently misalign). Matches DuckDB's UNION ALL BY NAME.
      (s, dir) => {
        val v1 = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val v2 = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        v1.unionByName(v2, allowMissingColumns = true)
          .orderBy(col("o_orderkey"), col("o_totalprice").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |  UNION ALL BY NAME
             |  SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders)
             |ORDER BY o_orderkey, o_totalprice ASC NULLS FIRST,
             |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    )
  )
}
