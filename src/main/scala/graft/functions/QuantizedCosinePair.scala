package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Pairwise quantized cosine between two `array<float>` columns — the
  * two-column sibling of [[QuantizedCosine]] (same quantization:
  * round-half-away-from-zero to integer milli-units; exact long dot and
  * norms; one double division at the end). Codegen'd primitive loop —
  * used on the bucketed near-dup join path where both sides are columns,
  * so no constant query vector exists to fold in. */
case class QuantizedCosinePair(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  @inline private def quant(x: Float): Long = {
    val v = x.toDouble * 1000.0
    if (v >= 0) math.floor(v + 0.5).toLong else -math.floor(-v + 0.5).toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val ea = quant(xa.getFloat(i)); val eb = quant(xb.getFloat(i))
      dot += ea * eb; na += ea * ea; nb += eb * eb
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val ea = ctx.freshName("ea"); val eb = ctx.freshName("eb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $va = ((double) $a.getFloat($i)) * 1000.0;
         |  double $vb = ((double) $b.getFloat($i)) * 1000.0;
         |  long $ea = $va >= 0 ? (long) java.lang.Math.floor($va + 0.5)
         |                      : -(long) java.lang.Math.floor(-$va + 0.5);
         |  long $eb = $vb >= 0 ? (long) java.lang.Math.floor($vb + 0.5)
         |                      : -(long) java.lang.Math.floor(-$vb + 0.5);
         |  $dot += $ea * $eb; $na += $ea * $ea; $nb += $eb * $eb;
         |}
         |${ev.value} = ((double) $dot) /
         |  (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosinePair =
    copy(left = newLeft, right = newRight)
}
