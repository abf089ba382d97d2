package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native Catalyst expression for cosine over int8 quantization codes
  * (`array<tinyint>`) — the hot loop of the quantized ANN candidate
  * stage (q63) as generated code: primitive `getByte` reads, 64-bit
  * integer dot/norm accumulators (exact — no float accumulation at
  * all), one double division at the end. Replaces a Scala UDF that
  * paid Row-struct conversion and boxing per candidate pair.
  *
  * Math contract matches [[graft.operators.Kernels.int8Cosine]]
  * bit-for-bit: min-length loop, long accumulators, 0.0 for zero
  * vectors. Per-vector scales cancel in cosine, so codes alone
  * suffice. */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int8_cosine expects two array<tinyint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_int8_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    Int8Cosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $dot = 0L; long $na = 0L; long $nb = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  long $x = (long) $a.getByte($i);
        |  long $y = (long) $b.getByte($i);
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |double $d = java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb);
        |${ev.value} = ($d == 0.0) ? 0.0 : ((double) $dot) / $d;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Cosine {
  /** Interpreted fallback; same math as the generated loop. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (d == 0.0) 0.0 else dot.toDouble / d
  }
}
