package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injectParser seam: the ASOF JOIN statement island must produce
  * exactly the Scala `AsOf.join` result for every direction/tolerance
  * combination, and every other statement must reach Spark's own parser
  * untouched (delegation is the contract — a parser extension that
  * perturbs normal SQL is worse than none).
  */
class SqlParserSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def sides() = {
    val ev = Tables.events(spark, dir)
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val build = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    probe.createOrReplaceTempView("p_asof_spec")
    build.createOrReplaceTempView("b_asof_spec")
    (probe, build)
  }

  test("ASOF JOIN statement equals the Scala AsOf API, backward default") {
    val (probe, build) = sides()
    val viaSql = spark.sql(
      "SELECT * FROM p_asof_spec ASOF JOIN b_asof_spec ON KEYS (user_id) MATCH ts")
      .collect().map(_.toString).sorted
    val viaApi = plans.AsOf.join(probe, build,
        Seq("user_id"), "ts", Seq("user_id"), "ts", "backward", None)
      .collect().map(_.toString).sorted
    assert(viaSql.nonEmpty && viaSql.sameElements(viaApi))
  }

  test("direction keyword and tolerance literal reach the node") {
    val (probe, build) = sides()
    val viaSql = spark.sql(
      "SELECT * FROM p_asof_spec ASOF NEAREST JOIN b_asof_spec " +
        "ON KEYS (user_id) MATCH ts TOLERANCE 'INTERVAL 1 HOUR'")
      .collect().map(_.toString).sorted
    val viaApi = plans.AsOf.join(probe, build,
        Seq("user_id"), "ts", Seq("user_id"), "ts", "nearest",
        Some("INTERVAL 1 HOUR"))
      .collect().map(_.toString).sorted
    assert(viaSql.sameElements(viaApi))
    // a tolerance must null out far matches relative to the untoleranced run
    val loose = spark.sql(
      "SELECT * FROM p_asof_spec ASOF NEAREST JOIN b_asof_spec " +
        "ON KEYS (user_id) MATCH ts").collect()
    val tight = spark.sql(
      "SELECT * FROM p_asof_spec ASOF NEAREST JOIN b_asof_spec " +
        "ON KEYS (user_id) MATCH ts TOLERANCE 'INTERVAL 1 MINUTE'").collect()
    def matched(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(!_.isNullAt(rows.head.length - 1))
    assert(matched(tight) <= matched(loose))
  }

  test("everything outside the island delegates to Spark's parser") {
    assert(spark.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) === 2)
    // a statement that merely CONTAINS the word ASOF but not the island
    // shape must fall through to Spark (here: Spark's ANALYSIS error for a
    // missing table — proof our parser neither claimed nor mangled it)
    val e = intercept[Exception](
      spark.sql("SELECT asof FROM no_such_graft_table"))
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    // and genuinely broken syntax still dies in Spark's grammar
    val e2 = intercept[Exception](spark.sql("SELEC 1"))
    assert(e2.getMessage.toLowerCase.contains("syntax"))
    // DDL / non-SELECT paths delegate too
    spark.sql("CREATE OR REPLACE TEMP VIEW parser_spec_v AS SELECT 42 AS x")
    assert(spark.table("parser_spec_v").collect().head.getInt(0) === 42)
  }
}
