package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Hand-computed BPE contract (VERDICT r4 #5): the learner's greedy
  * frequency/tie-break rule, the left-to-right non-overlapping merge
  * application, and the encode-the-vocab end-to-end summary. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("bpe-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("learner: most-frequent pair wins, ties break to the smallest pair") {
    // word freqs: ab:3, cd:3, e:1 -> round 1 pairs (a,b):3 vs (c,d):3,
    // tie -> (a,b); round 2 -> (c,d)
    val merges = TextOps.bpeLearnMerges(docs("ab ab cd", "ab cd cd e"), nMerges = 2)
    assert(merges == Seq("a" -> "b", "c" -> "d"))
  }

  test("encoder: merges apply left-to-right, non-overlapping, in rank order") {
    val s = spark
    import s.implicits._
    val enc = Seq("aaa", "aaaa", "abcd")
      .toDF("w")
      .select(TextOps.bpeEncodeSymbols(org.apache.spark.sql.functions.col("w"),
        Seq("a" -> "a", "a" -> "b", "c" -> "d")).as("syms"))
      .collect().map(_.getSeq[String](0).toList)
    assert(enc(0) == List("aa", "a"))       // NOT three overlapping "aa"
    assert(enc(1) == List("aa", "aa"))
    assert(enc(2) == List("ab", "cd"))      // rank order: (a,a) first finds none
  }

  test("encoder: regex-special merge symbols ('$', '\\') replace literally (ADVICE r5)") {
    val s = spark
    import s.implicits._
    // merges whose outputs contain Matcher-template specials: "$1" and "\\d"
    val enc = Seq("$100", "\\dx")
      .toDF("w")
      .select(TextOps.bpeEncodeSymbols(org.apache.spark.sql.functions.col("w"),
        Seq("$" -> "1", "$1" -> "0", "\\" -> "d")).as("syms"))
      .collect().map(_.getSeq[String](0).toList)
    assert(enc(0) == List("$10", "0"))   // "$" + "1" -> "$1", then "$1"+"0" -> "$10"
    assert(enc(1) == List("\\d", "x"))
  }

  test("end-to-end: learned table encodes the corpus; unknown symbols id -1") {
    val d = docs("ab ab cd", "ab cd cd e")
    val merges = TextOps.bpeLearnMerges(d, nMerges = 2)
    val vocab = TextOps.bpeVocab(merges)
    assert(vocab == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "ab" -> 4, "cd" -> 5))
    val rows = TextOps.bpeEncode(d, merges, vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0: ab ab cd -> 3 symbols, ids 4+4+5 = 13
    assert(rows(0L) == (3L, 13L))
    // doc 1: ab cd cd e -> 4 symbols; 'e' is outside the vocab -> -1
    assert(rows(1L) == (4L, 4L + 5L + 5L - 1L))
  }
}
