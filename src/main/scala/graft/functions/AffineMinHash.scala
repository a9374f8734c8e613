package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole-stage-codegen'd MinHash signature vector over a precomputed
  * shingle-hash array: for each j in [0, k) returns
  * `min over x in hv of ((2j+1) * x + 12345j + 7) mod M`.
  *
  * Replaces k independent interpreted `array_min(transform(...))` columns —
  * those evaluate one lambda dispatch per (element, signature) pair with no
  * codegen; this is a single fused primitive loop (one pass over the hash
  * array, k running minima in a local array). Same hash family, bit-equal
  * results (the DuckDB oracle replays the same arithmetic).
  *
  * Empty input arrays yield mod-1 minima (never happens for documents: the
  * shingle builder emits at least one shingle per non-empty text).
  */
case class AffineMinHash(child: Expression, k: Int, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(mod - 1)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = ((2L * j + 1) * x + 12345L * j + 7) % mod
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${mod}L - 1L);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = ((2L * $j + 1L) * $x + 12345L * $j + 7L) % ${mod}L;
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AffineMinHash =
    copy(child = newChild)
}
