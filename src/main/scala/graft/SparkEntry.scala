package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared operator inventory (SURVEY.md §2): each family
  * under `graft.ops` contributes `Q(name, fn, oracle)` rows; `queries` and
  * `oracleSql` are derived views of that single registry.
  */
object SparkEntry {

  /** Every declared operator, one `Q` per SURVEY.md §2 row. */
  def all: Seq[Q] =
    ops.Scans.defs ++
      ops.Sources.defs ++
      ops.Filters.defs ++
      ops.Joins.defs ++
      ops.Tpch.defs ++
      ops.Aggregates.defs ++
      ops.Windows.defs ++
      ops.ScalarFns.defs ++
      ops.SortLimit.defs ++
      ops.SetOps.defs ++
      ops.Cdc.defs ++
      ops.Streaming.defs ++
      ops.TextOps.defs ++
      ops.SimOps.defs ++
      ops.Graph.defs ++
      ops.GraphAnalytics.defs ++
      ops.Quality.defs ++
      ops.Geo.defs ++
      ops.Eval.defs ++
      ops.TarShard.defs ++
      ops.Governance.defs ++
      ops.Extensions.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregates.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
