package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The replica's SQL surface. The reference's analytical lifecycle is ANSI
  * SQL over a cataloged replica (Athena/Glue — SURVEY.md §3.1 E3); here the
  * same contract is the Spark session catalog: register every landed table
  * once, then `spark.sql(...)` answers arbitrary queries with full Catalyst
  * optimization (pushdown, pruning, join reorder, AQE).
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // one registration per (session, dir): ~20 registry rows call
  // registerAll, and each un-memoized call re-infers 10 parquet schemas.
  // ADVICE r8: keyed by the session OBJECT in a WeakHashMap, not
  // identityHashCode — identity hashes can be reused after a session is
  // GC'd (or collide between two live sessions), which would silently skip
  // registration in the new session; weak keys also stop the map retaining
  // dead sessions forever. Reference equality is exactly the right notion
  // of "same session" here.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Register all fixture tables as temp views over `dir`. `events` gets
    * the layout-normalized view from [[Tables.events]]. Idempotent and
    * memoized per (session, dir).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) != dir) {
      tableNames.foreach { t =>
        val df = if (t == "events") Tables.events(spark, dir) else Tables(spark, dir, t)
        df.createOrReplaceTempView(t)
      }
      registered.put(spark, dir)
      ()
    }
  }

  /** One-call SQL-over-replica: register + query. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }
}
