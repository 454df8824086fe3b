package graft

import java.io.File

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** IO-level properties of the source/sink tier that the DuckDB oracle cannot
  * see: `scan_parquet_bloom_rowgroup` promises its written files actually
  * carry per-column bloom filters and small row groups — the physical
  * structures the 100 TB pruning story depends on. Verified by reading the
  * parquet footers directly.
  */
class SourcePropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("bloom-filter sink writes footers with bloom offsets and >1 row group") {
    import org.apache.spark.sql.functions.col
    // run the registry row once so its scratch output exists this JVM
    SparkEntry.queries("scan_parquet_bloom_rowgroup")(spark, dir).collect()
    val scratch = new File("/tmp").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_"))
      .flatMap(_.listFiles())
      .filter(f => f.isDirectory && f.getName.startsWith("graft_bloom_"))
    assert(scratch.nonEmpty, "bloom scratch dir not found")
    val parts = scratch.flatMap(_.listFiles())
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(parts.nonEmpty, "no parquet part files written")
    val conf = new Configuration()
    var rowGroups = 0
    var bloomCols = 0
    parts.foreach { part =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(part.getAbsolutePath), conf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala
        rowGroups += blocks.size
        blocks.foreach { b =>
          b.getColumns.asScala
            .filter(_.getPath.toDotString == "o_custkey")
            .foreach { c => if (c.getBloomFilterOffset >= 0) bloomCols += 1 }
        }
      } finally rd.close()
    }
    assert(bloomCols > 0, "no o_custkey column chunk carries a bloom filter")
    assert(rowGroups >= 2,
      s"expected multiple row groups from the 64 KiB block size, got $rowGroups")
    // and the bloom column is the only one carrying filters (write option
    // was column-scoped)
    parts.headOption.foreach { part =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(part.getAbsolutePath), conf))
      try {
        val others = rd.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(c => c.getPath.toDotString != "o_custkey")
        assert(others.forall(_.getBloomFilterOffset < 0))
      } finally rd.close()
    }
  }

  test("bloom row-group lookup returns exactly the filtered keys") {
    val out = SparkEntry.queries("scan_parquet_bloom_rowgroup")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    val keys = out.map(_.getLong(1)).toSet
    assert(keys.subsetOf(Set(7L, 421L, 1337L)))
  }
}
