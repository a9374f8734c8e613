package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Bit-parity of the fused r9 n-gram hash expressions against the builtin
  * chain they replaced (transform + array_join + md5 + substring + conv +
  * pmod + array_distinct): the fused path must agree on every edge the
  * builtin semantics have — empty text, repeated separators (empty tokens
  * survive split and array_join keeps them), short docs (whole-tokens
  * fallback), exact-n docs, within-doc repeats (hash-space distinct,
  * first-occurrence order), and multi-byte UTF-8. */
class NgramHashSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  import TextOps.{tokenHash, tokens, Mod}
  import org.apache.spark.sql.Column

  /** The pre-r9 builtin chain, verbatim. */
  private def builtinSet(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))
    array_distinct(transform(grams, g => pmod(tokenHash(g), lit(Mod))))
  }

  /** The pre-r9 positional chain, verbatim (all hashes, window order). */
  private def builtinAll(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))
    transform(grams, g => pmod(tokenHash(g), lit(Mod)))
  }

  private val texts = Seq(
    "",                                      // one empty token after split
    "one",                                   // below n: whole-tokens gram
    "a b c",                                 // exactly n for n=3
    "a b c d e f",                           // several windows
    "a  b   c",                              // empty tokens preserved
    "x y x y x y x y",                       // within-doc repeated grams
    "héllo wörld ünïcode tokens here",       // multi-byte UTF-8
    "the the the the",                       // all-identical windows
  )

  test("NgramHashSet == builtin distinct chain (order and values)") {
    for (n <- Seq(1, 2, 3, 8)) {
      val df = texts.toDF("text")
        .select(TextOps.ngramHashes(col("text"), n).as("fused"),
          builtinSet(col("text"), n).as("builtin"))
      val rows = df.collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n fused=${r.getSeq[Long](0)} builtin=${r.getSeq[Long](1)}")
      }
    }
  }

  test("NgramHashAll == builtin positional chain (every window, in order)") {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    for (n <- Seq(2, 3, 8)) {
      val fusedCol = column(graft.functions.NgramHashAll(
        expression(tokens(col("text"))), n, Mod))
      val df = texts.toDF("text")
        .select(fusedCol.as("fused"), builtinAll(col("text"), n).as("builtin"))
      df.collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n fused=${r.getSeq[Long](0)} builtin=${r.getSeq[Long](1)}")
      }
    }
  }

  test("ShingleHashSet == builtin shingles+tokenHash chain (string distinct, no mod)") {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    for (n <- Seq(2, 3, 8)) {
      // builtin: distinct window STRINGS, raw tokenHash; short docs -> empty
      val toks = tokens(col("text"))
      val builtin = transform(
        when(size(toks) >= n,
          array_distinct(transform(sequence(lit(0), size(toks) - n),
            i => array_join(slice(toks, i + 1, lit(n)), " "))))
          .otherwise(array().cast("array<string>")),
        s => tokenHash(s))
      val fused = column(graft.functions.ShingleHashSet(expression(toks), n))
      texts.toDF("text").select(fused.as("f"), builtin.as("b")).collect()
        .foreach { r =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"n=$n fused=${r.getSeq[Long](0)} builtin=${r.getSeq[Long](1)}")
        }
    }
  }

  test("ShingleHashSetText == builtin shingleHashes chain (whole-text fallback, pmod)") {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    for (n <- Seq(2, 3, 8)) {
      val toks = tokens(col("text"))
      val builtin = transform(
        when(size(toks) >= n,
          array_distinct(transform(sequence(lit(0), size(toks) - n),
            i => array_join(slice(toks, i + 1, lit(n)), " "))))
          .otherwise(array(col("text"))),
        s => pmod(tokenHash(s), lit(Mod)))
      val fused = column(graft.functions.ShingleHashSetText(
        expression(toks), expression(col("text")), n, Mod))
      texts.toDF("text").select(fused.as("f"), builtin.as("b")).collect()
        .foreach { r =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"n=$n fused=${r.getSeq[Long](0)} builtin=${r.getSeq[Long](1)}")
        }
    }
  }

  test("null text yields null (deliberate: saner than the builtin's [null])") {
    // the builtin chain's null-text behavior was an ANSI-null artifact:
    // size(null) is null, CaseWhen treats it as false, and the fallback
    // array_join(null) produced a single-element array CONTAINING null —
    // an accidental "gram" with a null hash. The fused expression returns
    // NULL for null text (no grams), which downstream explodes to zero
    // rows. Corpus text is non-null everywhere the operator runs (the
    // 94-query oracle is unchanged); this pins the deliberate choice.
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("doc_id", "text")
      .select(TextOps.ngramHashes(col("text"), 3).as("fused"))
    assert(df.head().isNullAt(0))
  }
}
