package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed line-item row for the Dataset API surface (SURVEY.md §1.3:
  * `Dataset[T]` where a case class models the row).
  */
final case class LineRev(l_returnflag: String, l_quantity: Double,
    l_extendedprice: Double, l_discount: Double)

/** Accumulated (rows, qty, revenue) triple. */
final case class RevBuf(n: Long, qty: Double, revenue: Double)

/** Typed Aggregator over case-class rows: per-group row count, quantity
  * total and discounted revenue in ONE pass — compile-time field checks,
  * runtime partial aggregation (the buffer merges map-side like any
  * built-in agg).
  */
object RevenueStats extends Aggregator[LineRev, RevBuf, RevBuf] {
  override def zero: RevBuf = RevBuf(0L, 0.0, 0.0)
  override def reduce(b: RevBuf, r: LineRev): RevBuf =
    RevBuf(b.n + 1, b.qty + r.l_quantity,
      b.revenue + r.l_extendedprice * (1 - r.l_discount))
  override def merge(a: RevBuf, b: RevBuf): RevBuf =
    RevBuf(a.n + b.n, a.qty + b.qty, a.revenue + b.revenue)
  override def finish(b: RevBuf): RevBuf = b
  override def bufferEncoder: Encoder[RevBuf] = Encoders.product[RevBuf]
  override def outputEncoder: Encoder[RevBuf] = Encoders.product[RevBuf]
}
