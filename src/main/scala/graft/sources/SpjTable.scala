package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Storage-partitioned join source (SPARK-37375 v2 bucketing, §2.12):
  * a DSv2 table whose ON-DISK layout is key-grouped — one directory per
  * value of the identity-partitioned `bucket` column — and whose Scan
  * REPORTS that layout as a [[KeyGroupedPartitioning]], each
  * [[InputPartition]] carrying its partition key via [[HasPartitionKey]].
  * Two such tables co-partitioned on the same key then join with ZERO
  * exchange: Spark matches the reported partitionings instead of
  * planning shuffles — the DSv2-native successor of Hive bucketing that
  * Iceberg/Delta use for shuffle-free fact-fact joins at warehouse scale.
  *
  * This is the THIRD co-located-join mechanism in the repo, completing
  * the set: `sink_bucketed_join` (session-catalog Hive bucketing),
  * `join_asof_broadcast_exec` (custom broadcast exec), and now the
  * connector-reported layout — the one that works for ANY external table
  * format that can describe its own partitioning.
  *
  * Rows are stored in the repo's manifest TSV codec
  * ([[ManifestSink.decode]]); the writer runs executor-side
  * (`foreachPartition`, one rolling file per bucket — the tar-shard
  * pattern), so staging never moves data through the driver.
  */
class SpjSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "SpjSource requires an explicit read schema (bucket column first)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SpjTable(properties.get("path"), schema)
}

private[sources] class SpjTable(dir: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"spj:$dir"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  // the table's declared layout: identity-partitioned on `bucket`
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("bucket"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsReportPartitioning {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this

      private lazy val buckets: Seq[(Long, Seq[String])] = {
        val root = Paths.get(dir)
        val ds = Files.newDirectoryStream(root, "bucket=*")
        try {
          ds.asScala.toSeq.map { p =>
            val v = p.getFileName.toString.stripPrefix("bucket=").toLong
            val files = Files.list(p)
            // skip in-flight attempt files: only ATOMIC_MOVE-published
            // names are data (the stager's exactly-once contract)
            val names = try files.iterator().asScala
              .filterNot(_.getFileName.toString.startsWith("."))
              .map(_.toString).toSeq.sorted
              finally files.close()
            (v, names)
          }.sortBy(_._1)
        } finally ds.close()
      }

      override def outputPartitioning(): Partitioning =
        new KeyGroupedPartitioning(
          Array(Expressions.identity("bucket")), buckets.size)

      override def planInputPartitions(): Array[InputPartition] =
        buckets.map { case (v, files) => SpjPartition(v, files) }.toArray

      override def createReaderFactory(): PartitionReaderFactory =
        new SpjReaderFactory(schema)
    }
}

/** One key-grouped split: all files of one bucket value. The partition
  * key row is what Spark's SPJ machinery groups and matches across the
  * two sides of the join.
  */
private[sources] case class SpjPartition(bucket: Long, files: Seq[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

private[sources] class SpjReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SpjPartition]
    new PartitionReader[InternalRow] {
      private val lines = part.files.iterator.flatMap { f =>
        Files.readAllLines(Paths.get(f), StandardCharsets.UTF_8).asScala
      }.filter(_.nonEmpty)
      // DSv2 reader contract: emit UnsafeRow, generic rows break
      // codegen'd consumers downstream
      private val toUnsafe =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!lines.hasNext) false
        else {
          current = toUnsafe(ManifestSink.decode(lines.next(), schema)).copy()
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Executor-side stager: lands a DataFrame whose FIRST column is the
  * bucket key into `dir/bucket=<v>/part-p<partitionId>.txt`, rolling files
  * on bucket change under a per-partition (bucket, …) sort — no driver data
  * movement. Attempt safety (ADVICE r11): each attempt streams into its
  * own ATTEMPT-UNIQUE `.tmp` names and only ATOMIC_MOVEs them onto the
  * deterministic per-(bucket, partition) final names after the partition
  * iterator completes. A sequentially retried task replaces its first
  * attempt's file; two CONCURRENT attempts of the same partition
  * (speculation) each write private tmp files and the moves are atomic,
  * so the final name always holds one attempt's COMPLETE file — never an
  * interleaving — which is the exactly-once property the scan (it reads
  * every non-tmp file in the bucket dir) depends on.
  */
object SpjStage {
  def apply(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val schema = df.schema
    val n = 8
    df.repartition(n, col("bucket"))
      .sortWithinPartitions(col("bucket"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.get().partitionId()
        val attempt = java.util.UUID.randomUUID().toString
        var w: java.io.BufferedWriter = null
        var cur = Long.MinValue
        val staged = scala.collection.mutable.ArrayBuffer
          .empty[(java.nio.file.Path, java.nio.file.Path)]
        def close(): Unit = if (w != null) w.close()
        rows.foreach { r =>
          val b = r.getLong(0)
          if (b != cur) {
            close()
            cur = b
            val d = Paths.get(s"$dir/bucket=$b")
            Files.createDirectories(d)
            val tmp = d.resolve(s".part-p$pid-$attempt.tmp")
            staged += ((tmp, d.resolve(s"part-p$pid.txt")))
            w = Files.newBufferedWriter(
              tmp, StandardCharsets.UTF_8,
              java.nio.file.StandardOpenOption.CREATE,
              java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
              java.nio.file.StandardOpenOption.WRITE)
          }
          // mirror of ManifestSink.decode for external rows
          val line = schema.fields.zipWithIndex.map { case (f, i) =>
            if (r.isNullAt(i)) " "
            else f.dataType match {
              case org.apache.spark.sql.types.LongType => r.getLong(i).toString
              case org.apache.spark.sql.types.DoubleType =>
                java.lang.Double.toString(r.getDouble(i))
              case org.apache.spark.sql.types.StringType =>
                java.net.URLEncoder.encode(r.getString(i), "UTF-8")
              case dt => throw new IllegalArgumentException(s"unsupported $dt")
            }
          }.mkString("\t")
          w.write(line); w.newLine()
        }
        close()
        // publish: only a COMPLETED attempt reaches the moves (a failed
        // attempt's exception skips them, leaving only .tmp residue the
        // scan ignores)
        staged.foreach { case (tmp, fin) =>
          Files.move(tmp, fin,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
  }
}
