package graft.sources

import java.time.LocalDate
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DateType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableProvider` (§2.12 extension surface): a calendar
  * dimension GENERATOR — `spark.read.format("graft.sources.CalendarSource")
  * .option("start","2024-01-01").option("end","2024-12-31")`.
  *
  * This is the one source shape where a custom connector beats reading
  * files: there are no files — the table is a deterministic function of
  * its options, so the right design is to synthesize `InternalRow`s
  * directly inside partition readers. The day range splits evenly across
  * `partitions` (default 4) input partitions, so generation parallelizes
  * like any scan, and the source emits ONLY the date value — calendar
  * attributes (year/quarter/dow/…) are derived by ordinary codegen'd
  * projections on top, keeping the connector minimal and the attribute
  * logic optimizable.
  *
  * Range predicates on `d` PUSH DOWN ([[SupportsPushDownFilters]]): a
  * `d >= X` filter narrows the generated range at PLANNING time — the
  * connector-level analogue of partition pruning, observable in the
  * scan's `description()` and asserted in PlanShapeSpec. Consumed filters
  * are exact, so they are removed from the post-scan Filter node.
  *
  * At 100 TB scale the same pattern serves manifest/range/replica-catalog
  * tables: metadata-defined relations surfaced as first-class, partitioned
  * Spark tables with pruning.
  */
class CalendarSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CalendarSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CalendarTable(
      LocalDate.parse(properties.getOrDefault("start", "2024-01-01")),
      LocalDate.parse(properties.getOrDefault("end", "2024-12-31")),
      properties.getOrDefault("partitions", "4").toInt)
}

object CalendarSource {
  val schema: StructType = StructType(Seq(StructField("d", DateType, nullable = false)))
}

private[sources] class CalendarTable(start: LocalDate, end: LocalDate, nParts: Int)
    extends Table with SupportsRead {
  require(!end.isBefore(start), s"end $end before start $start")

  override def name(): String = s"calendar[$start..$end]"
  override def schema(): StructType = CalendarSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CalendarScanBuilder(start.toEpochDay, end.toEpochDay, nParts)
}

private[sources] class CalendarScanBuilder(
    private var lo: Long, private var hi: Long, nParts: Int)
    extends ScanBuilder with SupportsPushDownFilters {

  private var accepted: Array[Filter] = Array.empty

  private def epochDay(v: Any): Option[Long] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, residual) = filters.partition {
      case GreaterThanOrEqual("d", v) => epochDay(v).exists { e => lo = math.max(lo, e); true }
      case GreaterThan("d", v) => epochDay(v).exists { e => lo = math.max(lo, e + 1); true }
      case LessThanOrEqual("d", v) => epochDay(v).exists { e => hi = math.min(hi, e); true }
      case LessThan("d", v) => epochDay(v).exists { e => hi = math.min(hi, e - 1); true }
      case EqualTo("d", v) => epochDay(v).exists { e =>
        lo = math.max(lo, e); hi = math.min(hi, e); true }
      case _ => false
    }
    accepted = consumed
    residual // consumed ranges are exact — no post-scan re-evaluation needed
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = CalendarSource.schema
    override def toBatch: Batch = this

    override def description(): String =
      s"CalendarScan[${LocalDate.ofEpochDay(lo)}..${LocalDate.ofEpochDay(hi)}]" +
        (if (accepted.nonEmpty) s" pushed=${accepted.mkString(",")}" else "")

    override def planInputPartitions(): Array[InputPartition] = {
      val total = hi - lo + 1
      if (total <= 0) return Array.empty // filters excluded the whole range
      val n = math.min(nParts.toLong, total).toInt
      (0 until n).map { i =>
        // contiguous, disjoint, exhaustive day ranges
        CalendarPartition(
          lo + total * i / n,
          lo + total * (i + 1) / n - 1): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      (partition: InputPartition) => {
        val p = partition.asInstanceOf[CalendarPartition]
        new PartitionReader[InternalRow] {
          private var day = p.firstDay - 1
          override def next(): Boolean = { day += 1; day <= p.lastDay }
          // DateType physical form = days since epoch (Int)
          override def get(): InternalRow = InternalRow(day.toInt)
          override def close(): Unit = ()
        }
      }
  }
}

private[sources] case class CalendarPartition(firstDay: Long, lastDay: Long)
    extends InputPartition
