package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 TPC-H completion tier (ops/Tpch.scala): result sanity on the
  * sf fixture plus plan-shape pins for the decorrelation-heavy queries —
  * the point of Q4/Q17/Q21 is that Catalyst rewrites their correlated
  * subqueries into joins, so the specs assert no per-row subquery shape
  * (no nested-loop against the fact table) survives in the executed plan.
  */
class TpchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def planOf(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q4: EXISTS decorrelates to a semi join; priorities complete") {
    val plan = planOf("sql_tpch_q4")
    assert(plan.contains("LeftSemi"))
    val rows = run("sql_tpch_q4").collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
  }

  test("q6: pure-scan aggregate — both date predicates pushed to parquet") {
    val plan = planOf("sql_tpch_q6")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
    assert(!plan.contains("Join"), "Q6 must not plan any join")
  }

  test("q8: market share between 0 and 1e6, grouped by year") {
    val rows = run("sql_tpch_q8").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getLong(3)
      assert(share >= 0 && share <= 1000000)
      assert(r.getLong(1) <= r.getLong(2), "target <= total")
    }
  }

  test("q13: every customer appears exactly once in the distribution") {
    val rows = run("sql_tpch_q13").collect()
    val totalCustomers = rows.map(_.getLong(1)).sum
    val expected = Tables(spark, dir, "customer").count()
    assert(totalCustomers === expected)
  }

  test("q15: returns the max-revenue tie-set, ordered by supplier key") {
    val rows = run("sql_tpch_q15").collect()
    assert(rows.nonEmpty)
    val cents = rows.map(_.getLong(2)).distinct
    assert(cents.length === 1, "all returned suppliers share the max revenue")
  }

  test("q17: correlated avg decorrelates — no nested-loop join in plan") {
    val plan = planOf("sql_tpch_q17")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("q21: semi+anti pair decorrelates; counts positive") {
    val plan = planOf("sql_tpch_q21")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"))
    val rows = run("sql_tpch_q21").collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
  }

  test("derived partsupp: exactly 4 rows per part, distinct suppliers, " +
    "distinct per-part costs") {
    Catalog.registerAll(spark, dir)
    val ps = spark.sql(ops.Tpch.psCte +
      """ SELECT ps_partkey, count(*) AS n,
        |        count(DISTINCT ps_suppkey) AS ds,
        |        count(DISTINCT ps_supplycost_cents) AS dc
        | FROM partsupp GROUP BY ps_partkey""".stripMargin).collect()
    assert(ps.length === Tables(spark, dir, "part").count())
    ps.foreach { r =>
      assert(r.getLong(1) === 4L, "4 slots per part")
      assert(r.getLong(2) === 4L, "slot suppkeys distinct (s_cnt >= 4)")
      assert(r.getLong(3) === 4L, "per-part supply costs distinct -> unique argmin")
    }
  }

  test("q2: unique min-cost supplier per part; correlated min decorrelates") {
    val plan = planOf("sql_tpch_q2")
    assert(!plan.contains("CartesianProduct"), "min subquery must decorrelate")
    val rows = run("sql_tpch_q2").collect()
    assert(rows.nonEmpty)
    val parts = rows.map(_.getLong(3))
    assert(parts.distinct.length === parts.length,
      "distinct per-part costs make the argmin unique")
  }

  test("q9: profit aggregates over all nations x years, no cartesian") {
    val plan = planOf("sql_tpch_q9")
    assert(!plan.contains("CartesianProduct") ||
      plan.contains("slots"), "only the 4-row slots derivation may cross")
    val rows = run("sql_tpch_q9").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val yr = r.getLong(1)
      assert(yr >= 1995 && yr <= 2001, s"order years in fixture domain: $yr")
    }
  }

  test("q11: every surviving part exceeds the fraction-of-total gate") {
    Catalog.registerAll(spark, dir)
    val rows = run("sql_tpch_q11").collect()
    assert(rows.nonEmpty)
    val total = spark.sql(ops.Tpch.psCte +
      """ SELECT CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
        | FROM partsupp, supplier, nation
        | WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |   AND n_nationkey = (SELECT min(s_nationkey) FROM supplier)
        |""".stripMargin).collect()(0).getLong(0)
    rows.foreach(r => assert(r.getLong(1) > total / 500.0))
  }

  test("q16: supplier counts bounded by the supplier table") {
    val sCnt = Tables(spark, dir, "supplier").count()
    val rows = run("sql_tpch_q16").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getLong(3)
      assert(c >= 1 && c <= sCnt)
    }
  }

  test("q20: nested correlated-sum chain decorrelates; suppliers unique") {
    val plan = planOf("sql_tpch_q20")
    // the IN decorrelates to a semi join; the only nested-loop allowed is
    // the 1-row sbound broadcast from the partsupp derivation
    assert(plan.contains("LeftSemi"))
    assert(!plan.contains("CartesianProduct"))
    val rows = run("sql_tpch_q20").collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getString(0))
    assert(names.distinct.length === names.length)
    assert(names.sorted.sameElements(names), "total order by s_name")
  }

  test("q22: eligible customers have no urgent orders") {
    Catalog.registerAll(spark, dir)
    val viaQuery = run("sql_tpch_q22").collect().map(_.getLong(1)).sum
    val direct = spark.sql(
      """SELECT count(*) FROM customer
        |WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) >
        |      (SELECT avg(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |       FROM customer WHERE c_acctbal > 0.0)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderpriority = '1-URGENT')""".stripMargin)
      .collect()(0).getLong(0)
    assert(viaQuery === direct)
  }
}
