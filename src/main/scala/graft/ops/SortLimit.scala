package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.6 sort / limit / top-k. Global sort range-partitions by sampled
  * boundaries (scale-safe); top-k plans as `TakeOrderedAndProjectExec` —
  * each partition keeps only k rows, the driver merges k×partitions, never
  * the full data.
  */
object SortLimit {

  val defs: Seq[Q] = Seq(
    Q(
      "sort_global_multikey",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders
             |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin)
    ),
    Q(
      "sort_global_sequence",
      // Global dense sequence WITHOUT the single-partition window trap:
      // `row_number() OVER (ORDER BY …)` funnels all rows through one task,
      // which is the classic 100 TB killer. Instead: range-partitioned sort
      // (parallel) + per-partition offsets via zipWithIndex — one extra
      // cheap count job, order preserved, every partition stays parallel.
      // This is the ONE place RDD-level code is the right tool (genuine
      // per-partition imperative logic, per the build charter).
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        Tables(s, dir, "orders")
          .select(col("o_orderkey"))
          .orderBy(col("o_orderkey"))
          .rdd.zipWithIndex
          .map { case (r, i) => (r.getLong(0), i + 1) }
          .toDF("o_orderkey", "seq")
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       row_number() OVER (ORDER BY o_orderkey) AS seq
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "topk_order_limit",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
             |LIMIT 100""".stripMargin)
    ),
    Q(
      "limit_offset",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
          .offset(50)
          .limit(20)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 20 OFFSET 50""".stripMargin)
    )
  )
}
