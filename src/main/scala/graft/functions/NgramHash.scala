package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram hashing over a token array — the hot expression of the
  * self-gram dedup family and the contamination check (r9, guide §4:
  * per-task work after the job shape is right).
  *
  * Replaces the builtin chain
  * `transform(slice+array_join windows, g => pmod(conv(substring(md5(
  * encode(g)),1,14),16,10), M))`, which per gram OCCURRENCE allocated the
  * joined gram string, the UTF-8 encode copy, the 32-char hex string and
  * the conv parse. This expression feeds the token bytes and the single
  * space separator straight into one thread-local MessageDigest
  * (no gram string ever exists) and folds the first 7 digest bytes into
  * the value `conv(substring(md5hex, 1, 14), 16, 10)` would parse — the
  * first 14 hex characters ARE the first 7 bytes big-endian, and 56 bits
  * is always a positive long, so `% mod` equals `pmod`. Bit-identical
  * results (NgramHashSpec proves parity against the builtin chain; the
  * DuckDB oracle replays the same md5 arithmetic).
  *
  * Gram semantics replicated exactly from [[graft.ops.TextOps.ngramHashes]]:
  * one window per start position for `numToks >= n`, else ONE gram of all
  * tokens joined — including empty tokens (split keeps them), so repeated
  * separators reproduce the same byte stream as `array_join`.
  */
object NgramHash {

  private val SpaceByte: Byte = ' '.toByte

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 14 hex chars of the digest as the 56-bit value conv() parses. */
  private def hash56(md: MessageDigest): Long = {
    val d = md.digest()
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }

  /** Every n-gram hash in window order (the positional spans input):
    * element i is the hash of tokens [i, i+n); a document shorter than n
    * tokens contributes one whole-tokens gram. */
  def all(arr: ArrayData, n: Int, mod: Long): ArrayData = {
    val md = mdLocal.get()
    val numToks = arr.numElements()
    val toks = new Array[Array[Byte]](numToks)
    var i = 0
    while (i < numToks) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    if (numToks < n) {
      md.reset()
      var j = 0
      while (j < numToks) {
        if (j > 0) md.update(SpaceByte)
        md.update(toks(j)); j += 1
      }
      new GenericArrayData(Array(hash56(md) % mod))
    } else {
      val out = new Array[Long](numToks - n + 1)
      var s = 0
      while (s <= numToks - n) {
        md.reset()
        var j = 0
        while (j < n) {
          if (j > 0) md.update(SpaceByte)
          md.update(toks(s + j)); j += 1
        }
        out(s) = hash56(md) % mod
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Shingle-family variant — dedup in STRING space BEFORE hashing (the
    * builtin `shingles`/`shingleHashes` chains distinct the gram STRINGS,
    * so two distinct grams colliding in hash space keep BOTH hash values;
    * the hash-space distinct above would merge them). `mod <= 0` skips the
    * modulo (the jaccardPairs family hashes raw 56-bit). Fallback for
    * docs shorter than n tokens: `fallback` bytes as the single gram when
    * non-null (shingleHashes hashes the WHOLE TEXT), an empty array when
    * null (the `shingles` convention: short docs emit nothing). */
  def stringDistinct(arr: ArrayData, n: Int, mod: Long,
      fallback: UTF8String): ArrayData = {
    val md = mdLocal.get()
    val numToks = arr.numElements()
    def finish(h0: Long): Long = if (mod > 0) h0 % mod else h0
    if (numToks < n) {
      if (fallback == null) return new GenericArrayData(Array.emptyLongArray)
      md.reset()
      md.update(fallback.getBytes)
      return new GenericArrayData(Array(finish(hash56(md))))
    }
    val toks = new Array[Array[Byte]](numToks)
    var i = 0
    while (i < numToks) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val nGrams = numToks - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String](nGrams * 2)
    var s = 0
    while (s < nGrams) {
      var len = n - 1
      var j = 0
      while (j < n) { len += toks(s + j).length; j += 1 }
      val gram = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { gram(off) = SpaceByte; off += 1 }
        val t = toks(s + j)
        System.arraycopy(t, 0, gram, off, t.length); off += t.length
        j += 1
      }
      seen.add(UTF8String.fromBytes(gram))
      s += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      md.reset()
      md.update(it.next().getBytes)
      out(k) = finish(hash56(md)); k += 1
    }
    new GenericArrayData(out)
  }

  /** First-occurrence-ordered distinct of [[all]] — `array_distinct`
    * parity (dedup in HASH space, exactly as ngramHashes' builtin chain). */
  def distinct(arr: ArrayData, n: Int, mod: Long): ArrayData = {
    val allArr = all(arr, n, mod)
    val m = allArr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var i = 0
    while (i < m) { seen.add(allArr.getLong(i)); i += 1 }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct n-gram hashes of a token-array column (ngramHashes parity). */
case class NgramHashSet(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    NgramHash.distinct(input.asInstanceOf[ArrayData], n, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHash.distinct($c, $n, ${mod}L);")
  override protected def withNewChildInternal(newChild: Expression): NgramHashSet =
    copy(child = newChild)
}

/** Every n-gram hash in window order (positional spans input). */
case class NgramHashAll(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    NgramHash.all(input.asInstanceOf[ArrayData], n, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHash.all($c, $n, ${mod}L);")
  override protected def withNewChildInternal(newChild: Expression): NgramHashAll =
    copy(child = newChild)
}

/** String-distinct shingle hashes of a token array, NO fallback gram for
  * short docs (the `shingles` convention: they emit nothing) and no
  * modulo when `mod <= 0` — the jaccardPairs family. */
case class ShingleHashSet(child: Expression, n: Int, mod: Long = 0L)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    NgramHash.stringDistinct(input.asInstanceOf[ArrayData], n, mod, null)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHash.stringDistinct($c, $n, ${mod}L, null);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** String-distinct shingle hashes with the WHOLE-TEXT fallback gram for
  * short docs — `shingleHashes` parity (left = token array, right = the
  * raw text column the fallback hashes). */
case class ShingleHashSetText(left: Expression, right: Expression,
    n: Int, mod: Long) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(toks: Any, text: Any): Any =
    NgramHash.stringDistinct(toks.asInstanceOf[ArrayData], n, mod,
      text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, x) =>
      s"${ev.value} = graft.functions.NgramHash.stringDistinct($t, $n, ${mod}L, $x);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHashSetText =
    copy(left = newLeft, right = newRight)
}
