package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.1 scans / sources. The reference lands DAP wire objects (JSONL/CSV/
  * Parquet) into columnar storage and scans them for SQL (SURVEY.md §1.1
  * [DAP][CD2-AWS]); here each format is a declarative `spark.read` whose
  * filters/projections Catalyst pushes into the scan — at 100 TB the same
  * plan prunes partitions and columns server-side.
  */
object Scans {

  val defs: Seq[Q] = Seq(
    Q(
      "scan_parquet",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber")
    ),
    Q(
      "project_prune",
      // Column pruning: the parquet ReadSchema must contain only these three
      // columns (asserted in PlanShapeSpec).
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    )
  )
}
