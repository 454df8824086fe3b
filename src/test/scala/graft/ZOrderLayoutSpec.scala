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
    val base = ops.Sources.zorderOrders(spark, SparkTestBase.sfDir)
    // distinct scaled cells = distinct zkeys (interleave is a bijection)
    val cells = base
      .select(($"zkey" % 2048).as("lo"), ($"zkey" - ($"zkey" % 2048)).as("hi"))
      .distinct().count()
    val keys = base.select($"zkey").distinct().count()
    assert(keys == cells)
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
}
