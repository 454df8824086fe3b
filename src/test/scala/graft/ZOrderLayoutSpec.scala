package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of `sink_zorder_layout` is not the key arithmetic (the DuckDB
  * oracle pins that) but the LAYOUT: files landed in Z-order must each span
  * only a fraction of BOTH dimensions, so min/max skipping can prune on
  * either predicate column. Mean box AREA cannot distinguish the layouts —
  * any total order yields ~domain/nFiles area — so the metric here is the
  * mean NORMALIZED span per dimension: fraction of the custkey (resp. day)
  * domain a file covers, i.e. the expected fraction of files a
  * uniform-random point predicate on that column must read. Unsorted files
  * span ~everything in both; a single-column sort is perfect on its key and
  * ~1.0 on the other; Z-order is fractional on both, and strictly better on
  * the combined metric. Files are the unit here (each file is one row group
  * at this size; at scale the same stats exist per row group).
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  /** Mean over files of cust_span/cust_domain + day_span/day_domain. */
  private def meanNormSpanSum(dir: String): Double = {
    val df = spark.read.parquet(dir)
    val Array(custDom, dayDom) = df
      .agg(max($"o_custkey") - min($"o_custkey") + 1,
        max($"day_idx") - min($"day_idx") + 1)
      .first().toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    df.groupBy(input_file_name())
      .agg(
        (max($"o_custkey") - min($"o_custkey") + 1).as("cust_span"),
        (max($"day_idx") - min($"day_idx") + 1).as("day_span"))
      .select(avg($"cust_span" / custDom + $"day_span" / dayDom))
      .first().getDouble(0)
  }

  test("z-ordered files prune on both dimensions; sorted/unsorted layouts cannot") {
    val base = ops.Sources.zorderOrders(spark, SparkTestBase.sfDir)

    val unsortedDir = util.tempDir("graft_zspec_unsorted_")
    val bySingleDir = util.tempDir("graft_zspec_single_")
    val zDir = util.tempDir("graft_zspec_z_")
    base.repartition(8).write.mode("overwrite").parquet(unsortedDir)
    // single-dimension sort: perfect custkey locality, no date locality
    base.repartitionByRange(8, $"o_custkey")
      .write.mode("overwrite").parquet(bySingleDir)
    base.repartitionByRange(8, $"zkey").sortWithinPartitions($"zkey")
      .write.mode("overwrite").parquet(zDir)

    val sUnsorted = meanNormSpanSum(unsortedDir)
    val sSingle = meanNormSpanSum(bySingleDir)
    val sZ = meanNormSpanSum(zDir)

    // random layout spans ~both full domains (sum ≈ 2); z must at least halve it
    assert(sZ < sUnsorted * 0.6,
      s"z-order norm-span sum $sZ not < 0.6 * unsorted $sUnsorted")
    // the single-key sort pays full span on the date axis (≈ 1/8 + 1); the
    // z-layout's balanced fractions must beat the combined metric
    assert(sZ < sSingle * 0.9,
      s"z-order norm-span sum $sZ not < 0.9 * single-key-sorted $sSingle")
  }

  test("zkey interleave is collision-free over the scaled grid") {
    // recompute the scaled cells (cs, ds) from the same bounds arithmetic
    // and check distinct cells == distinct zkeys — a broken interleave that
    // merged two cells into one key would fail this (the earlier form
    // decomposed zkey against itself, which could not)
    val base = ops.Sources.zorderOrders(spark, SparkTestBase.sfDir)
    val withCells = base
      .crossJoin(broadcast(base.agg(
        min($"o_custkey").as("cmin"), max($"o_custkey").as("cmax"),
        min($"day_idx").as("dmin"), max($"day_idx").as("dmax"))))
      .withColumn("cs", expr("((o_custkey - cmin) * 1024) div (cmax - cmin + 1)"))
      .withColumn("ds", expr("((day_idx - dmin) * 1024) div (dmax - dmin + 1)"))
    val Array(cells, keys) = withCells
      .agg(countDistinct($"cs", $"ds"), countDistinct($"zkey"))
      .first().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(keys == cells)
  }

  test("reader actually skips row groups under a range predicate on either dimension") {
    // the claim behind the layout: a filtered READ of the z-ordered land
    // touches less data, not merely that bounding boxes look narrower.
    // Each landed file is one row group at this size; parquet pushdown
    // evaluates the predicate against row-group stats, so rows DELIVERED
    // by the scan (numOutputRows of the leaf) counts exactly the row
    // groups the reader could not skip. RANGE predicates, not point
    // equality: a narrow range intersects every unsorted file's stats AND
    // dictionary (point values can be absent from a small file's
    // dictionary, letting even the unsorted layout skip — measured), so
    // the unsorted baseline reads everything and the whole gap is the
    // layout's doing.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = ops.Sources.zorderOrders(spark, SparkTestBase.sfDir)
    val total = base.count()
    val unsortedDir = util.tempDir("graft_zskip_unsorted_")
    val zDir = util.tempDir("graft_zskip_z_")
    base.repartition(64).write.mode("overwrite").parquet(unsortedDir)
    base.repartitionByRange(64, $"zkey").sortWithinPartitions($"zkey")
      .write.mode("overwrite").parquet(zDir)

    def rowsDelivered(dir: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(dir).filter(pred)
      df.collect()
      df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
        .head.metrics("numOutputRows").value
    }

    val (ck, di) = base.select(median($"o_custkey").cast("long"),
      median($"day_idx").cast("long")).as[(Long, Long)].first()

    for ((name, pred) <- Seq(
        "custkey" -> $"o_custkey".between(ck - 5, ck + 5),
        "day" -> $"day_idx".between(di - 60, di + 60))) {
      val full = rowsDelivered(unsortedDir, pred)
      val z = rowsDelivered(zDir, pred)
      assert(full === total,
        s"$name baseline invalid: unsorted layout skipped ${total - full} rows")
      assert(z < total / 2,
        s"$name range read delivered $z of $total rows from the z-layout " +
          "— row groups were not skipped")
    }
  }

  test("zkey bit interleave matches a reference scala implementation") {
    def refInterleave(x: Long, y: Long): Long =
      (0 until 10).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rows = spark.range(0, 1024, 37).toDF("x")
      .crossJoin(spark.range(0, 1024, 53).toDF("y"))
      .withColumn("zkey", expr(ops.Sources.zkeySpark("x", "y", 10)))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("zkey") == refInterleave(r.getAs[Long]("x"), r.getAs[Long]("y")))
    }
  }

  test("hilbert chain is a bijection whose consecutive keys are edge-adjacent") {
    // exhaustive 32x32 grid: the defining Hilbert property (|Δcell| = 1
    // between consecutive d) that Z-order lacks at quadrant seams, plus
    // bijectivity — proves the unrolled CASE chain IS the xy2d transform
    spark.range(1024).toDF("i")
      .selectExpr("i AS id", "CAST(i % 32 AS BIGINT) AS x0",
        "CAST(i div 32 AS BIGINT) AS y0")
      .createOrReplaceTempView("hgrid")
    val cells = spark.sql(
      "WITH " + ops.Sources.hilbertCtes("hgrid", 5, Seq("id")) +
        " SELECT id, d FROM hl4")
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(cells.size == 1024, "xy -> d must be a bijection on the grid")
    (0L until 1023L).foreach { d =>
      val (x1, y1) = (cells(d) % 32, cells(d) / 32)
      val (x2, y2) = (cells(d + 1) % 32, cells(d + 1) / 32)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"keys $d and ${d + 1} map to non-adjacent cells ($x1,$y1) ($x2,$y2)")
    }
  }

  test("native hilbert_idx expression equals the SQL CTE chain, codegen'd") {
    // the fused-loop Catalyst expression and the 10-level CTE chain are
    // two independent implementations of xy2d — compare them on a grid
    // sweep of the full 1024x1024 domain (stride keeps it fast)
    spark.range(0, 1024, 7).toDF("a")
      .crossJoin(spark.range(0, 1024, 11).toDF("b"))
      .selectExpr("a * 1024 + b AS id", "a AS x0", "b AS y0")
      .createOrReplaceTempView("hgrid10")
    val viaSql = spark.sql(
      "WITH " + ops.Sources.hilbertCtes("hgrid10", 10, Seq("id")) +
        " SELECT id, d FROM hl9")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = spark.sql(
      "SELECT id, hilbert_idx(x0, y0) AS d FROM hgrid10")
    native.collect().foreach { r =>
      assert(r.getLong(1) == viaSql(r.getLong(0)),
        s"native and SQL hilbert diverge at id ${r.getLong(0)}")
    }
    // after execution the adaptive plan is final; codegen stages render
    // as "*(n)" markers on their operators in this string form
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("hilbert_idx"),
      s"hilbert_idx must stay inside a codegen stage:\n${plan.take(800)}")
  }
}
