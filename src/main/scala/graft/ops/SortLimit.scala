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
      "sort_keyset_pagination",
      // Keyset (seek-method) pagination (round-11): pages 1 and 2 of a
      // (o_orderdate, o_orderkey)-ordered listing fetched by BOUNDARY
      // PREDICATE — (d > bd) OR (d = bd AND k > bk) — instead of
      // OFFSET. OFFSET must produce and discard every skipped row on
      // every page (page N costs O(N·page)); the keyset predicate is
      // sargable, pushes into the scan, and costs O(page) regardless of
      // depth — the only pagination that survives a 100 TB listing. The
      // two boundary scalars per page are 1-row aggregates (the allowed
      // driver-scalar shape); the oracle replays the pages with
      // OFFSET/LIMIT, equal BECAUSE the order is total — which is itself
      // the correctness proof of the keyset rewrite.
      (s, dir) => {
        val base = Tables(s, dir, "orders")
          .select(col("o_orderdate").as("d"), col("o_orderkey").as("k"))
        val page = 100
        // the cursor a real client carries is "last row of the previous
        // page"; here both cursors derive from the source (first n rows'
        // max) so the row is self-contained — each is a 1-row aggregate
        def boundary(n: Int): (Any, Long) = {
          val r = base.orderBy(col("d"), col("k")).limit(n)
            .agg(max(struct(col("d"), col("k")))).head.getStruct(0)
          (r.get(0), r.getLong(1))
        }
        def after(b: (Any, Long)) = base.filter(
          col("d") > lit(b._1) || (col("d") === lit(b._1) && col("k") > lit(b._2)))
        val page1 = after(boundary(page)).orderBy(col("d"), col("k")).limit(page)
        val page2 = after(boundary(2 * page)).orderBy(col("d"), col("k")).limit(page)
        page1.withColumn("page", lit(1L))
          .unionByName(page2.withColumn("page", lit(2L)))
          .orderBy(col("page"), col("d"), col("k"))
      },
      Some("""SELECT d, k, page FROM (
             |  SELECT o_orderdate AS d, o_orderkey AS k, CAST(1 AS BIGINT) AS page
             |  FROM orders ORDER BY 1, 2 LIMIT 100 OFFSET 100) p1
             |UNION ALL
             |SELECT d, k, page FROM (
             |  SELECT o_orderdate AS d, o_orderkey AS k, CAST(2 AS BIGINT) AS page
             |  FROM orders ORDER BY 1, 2 LIMIT 100 OFFSET 200) p2
             |ORDER BY page, d, k""".stripMargin)
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
