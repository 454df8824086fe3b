package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-over-replica surface (reference lifecycle E3) + extensions install. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("registerAll exposes every fixture table to spark.sql") {
    Catalog.registerAll(spark, dir)
    Catalog.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() === 1L, t)
    }
  }

  test("arbitrary SQL over the replica runs with full optimization") {
    val df = Catalog.sql(spark, dir,
      """SELECT n_name, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_orders DESC LIMIT 5""".stripMargin)
    assert(df.count() === 5L)
  }

  test("GraftExtensions wiring applies cleanly; cosine_sim callable from SQL") {
    // the extensions class itself must install into a fresh extensions set
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    // and the same function registered on the live session answers SQL
    functions.CosineSimilarity.register(spark)
    Catalog.registerAll(spark, dir)
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM embeddings LIMIT 1")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-9)
  }
}
