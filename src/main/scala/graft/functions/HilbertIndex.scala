package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 10-bit Hilbert curve index
  * (SURVEY.md §2.12; the codegen sibling of
  * [[graft.ops.Sources.hilbertCtes]]).
  *
  * The SQL CTE chain unrolls the xy→d transform into 10 chained
  * projections — correct and portable, but each level materializes three
  * CASE expressions per row through the whole-stage pipeline. This
  * expression runs the identical state machine as ONE fused Java loop
  * (6 long ops per level, no intermediate rows), inside WholeStageCodegen.
  * Inputs are grid coordinates in [0, 1024); the transform is pure integer
  * arithmetic, so eval and codegen agree exactly with the SQL replay —
  * certified bit-for-bit against the CTE chain in ZOrderLayoutSpec and by
  * the `expr_hilbert_codegen` DuckDB oracle row.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_idx"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 512L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 1023L - x; y = 1023L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a, $y = $b, $d = 0L;
         |for (long $s = 512L; $s > 0L; $s >>= 1) {
         |  final long $rx = ($x & $s) > 0L ? 1L : 0L;
         |  final long $ry = ($y & $s) > 0L ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = 1023L - $x; $y = 1023L - $y; }
         |    final long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
