package graft.extract

import scala.collection.mutable

/** Aho-Corasick multi-pattern string matcher.
  *
  * Built once on the driver from the ontology/schema surface-form dictionary
  * (SURVEY §7.2-7: the "adapter" stage of the web-scale graft) and broadcast
  * to executors; matching inside `mapPartitions` is O(text length), so a
  * million-term dictionary costs the same per byte as ten terms.
  *
  * Flat-array automaton (no per-node objects) to keep the broadcast compact
  * and the inner loop allocation-free.
  */
final class AhoCorasick private (
    private val trans: Array[mutable.HashMap[Char, Int]],
    private val fail: Array[Int],
    private val out: Array[List[Int]], // pattern indices ending at this state
    val patterns: Array[String],
) extends Serializable {

  /** All matches as (startOffset, patternIndex); overlapping included. */
  def findAll(text: String): Iterator[(Int, Int)] = new Iterator[(Int, Int)] {
    private var i = 0
    private var state = 0
    private var pending: List[Int] = Nil
    private var pos = 0
    private def advance(): Unit = {
      while (pending.isEmpty && i < text.length) {
        val c = text.charAt(i)
        var s = state
        while (s != 0 && !trans(s).contains(c)) s = fail(s)
        state = trans(s).getOrElse(c, 0)
        i += 1
        pos = i
        pending = out(state)
      }
    }
    def hasNext: Boolean = { advance(); pending.nonEmpty }
    def next(): (Int, Int) = {
      advance()
      val p = pending.head
      pending = pending.tail
      (pos - patterns(p).length, p)
    }
  }

  /** Matches constrained to word boundaries: the char before and after the
    * match must be non-alphanumeric (or text edge). Equivalent to
    * `' '||text||' ' LIKE '% term %'` semantics on space-separated text. */
  def findWholeWords(text: String): Iterator[(Int, Int)] =
    findAll(text).filter { case (start, p) =>
      val end = start + patterns(p).length
      (start == 0 || !Character.isLetterOrDigit(text.charAt(start - 1))) &&
      (end == text.length || !Character.isLetterOrDigit(text.charAt(end)))
    }
}

object AhoCorasick {

  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.toArray
    val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(List.empty[Int])
    // trie
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Char, Int]
          outB += Nil
          next.length - 1
        })
      }
      outB(s) = pi :: outB(s)
    }
    // failure links (BFS)
    val fail = Array.fill(next.length)(0)
    val queue = mutable.Queue[Int]()
    next(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(t) = if (next(f).contains(c) && next(f)(c) != t) next(f)(c) else 0
        outB(t) = outB(t) ++ outB(fail(t))
        queue.enqueue(t)
      }
    }
    new AhoCorasick(next.toArray, fail, outB.toArray, pats)
  }
}
