package graft.schema

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** Dynamic YAML value tree (insertion-ordered, like Python dicts). */
sealed trait Y
final case class YS(s: String) extends Y
final case class YB(b: Boolean) extends Y
final case class YL(l: List[Y]) extends Y
final case class YM(m: ListMap[String, Y]) extends Y

object Y {
  def str(y: Y): String = y match {
    case YS(s) => s
    case YB(b) => if (b) "True" else "False"
    case other => throw new IllegalArgumentException(s"not a scalar: $other")
  }
  /** to_list semantics (reference: _misc.py:50-60). */
  def toList(y: Y): List[Y] = y match {
    case YL(l) => l
    case other => List(other)
  }
  def strings(y: Y): List[String] = toList(y).map(str)
}

/** Minimal YAML parser covering the schema-config subset the engine needs:
  * nested maps by 2-space indentation, inline `[a, b]` lists (possibly
  * spanning lines), `- item` block lists, scalars (bare / quoted / bool),
  * `#` comments. Deliberately not a general YAML implementation — the
  * reference's schema files (e.g. /root/reference/biocypher/_config/
  * test_schema_config.yaml) exercise exactly this subset.
  */
object YamlLite {

  def parse(text: String): ListMap[String, Y] = {
    val lines = mutable.ArrayBuffer[(Int, String)]() // (indent, content)
    // pre-join multiline inline lists: accumulate until brackets balance
    val rawLines = text.split("\n", -1).toBuffer
    var i = 0
    val joined = mutable.ArrayBuffer[String]()
    while (i < rawLines.length) {
      var line = stripComment(rawLines(i))
      var depth = bracketDepth(line)
      while (depth > 0 && i + 1 < rawLines.length) {
        i += 1
        val next = stripComment(rawLines(i))
        line = line + " " + next.trim
        depth += bracketDepth(next)
      }
      joined += line
      i += 1
    }
    joined.foreach { raw =>
      if (raw.trim.nonEmpty) {
        val indent = raw.takeWhile(_ == ' ').length
        lines += ((indent, raw.trim))
      }
    }
    parseBlock(lines.toIndexedSeq, 0, lines.length, 0)._1
  }

  private def stripComment(line: String): String = {
    // strip # comments not inside quotes
    var inS = false; var inD = false
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (i < line.length && !done) {
      val c = line.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD && (i == 0 || line.charAt(i - 1) == ' ')) done = true
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def bracketDepth(s: String): Int =
    s.count(_ == '[') - s.count(_ == ']')

  /** Parse map entries at exactly `indent` within [from, until). */
  private def parseBlock(
      lines: IndexedSeq[(Int, String)],
      from: Int,
      until: Int,
      indent: Int,
  ): (ListMap[String, Y], Int) = {
    var m = ListMap.empty[String, Y]
    var i = from
    while (i < until) {
      val (ind, content) = lines(i)
      require(ind == indent, s"unexpected indent $ind (expected $indent) at: $content")
      val colon = colonIndex(content)
      require(colon >= 0, s"expected key: value at: $content")
      val key = unquote(content.substring(0, colon).trim)
      val rest = content.substring(colon + 1).trim
      // find extent of this entry's children (lines with deeper indent)
      var j = i + 1
      while (j < until && lines(j)._1 > indent) j += 1
      if (rest.nonEmpty) {
        m += (key -> parseScalarOrList(rest))
        i = j
      } else if (j > i + 1 && lines(i + 1)._2.startsWith("- ")) {
        // block list
        val items = (i + 1 until j).map(k => parseScalarOrList(lines(k)._2.stripPrefix("- ").trim)).toList
        m += (key -> YL(items))
        i = j
      } else if (j > i + 1) {
        val (child, _) = parseBlock(lines, i + 1, j, lines(i + 1)._1)
        m += (key -> YM(child))
        i = j
      } else {
        m += (key -> YM(ListMap.empty)) // empty value
        i = j
      }
    }
    (m, until)
  }

  /** Index of the key/value separator colon (not inside quotes/brackets). */
  private def colonIndex(s: String): Int = {
    var i = 0; var depth = 0; var inS = false; var inD = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if ((c == '[' || c == '{') && !inS && !inD) depth += 1
      else if ((c == ']' || c == '}') && !inS && !inD) depth -= 1
      else if (c == ':' && depth == 0 && !inS && !inD &&
        (i + 1 == s.length || s.charAt(i + 1) == ' ')) return i
      i += 1
    }
    -1
  }

  private def parseScalarOrList(s: String): Y = {
    val t = s.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) YL(Nil)
      else YL(splitTopLevel(inner).map(x => parseScalarOrList(x.trim)))
    } else parseScalar(t)
  }

  private def splitTopLevel(s: String): List[String] = {
    val out = mutable.ListBuffer[String]()
    var depth = 0; var start = 0; var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if ((c == '[' || c == '{') && !inS && !inD) depth += 1
      else if ((c == ']' || c == '}') && !inS && !inD) depth -= 1
      else if (c == ',' && depth == 0 && !inS && !inD) {
        out += s.substring(start, i); start = i + 1
      }
      i += 1
    }
    out += s.substring(start)
    out.toList
  }

  private def parseScalar(t: String): Y = t match {
    case "true" | "True" | "TRUE"    => YB(true)
    case "false" | "False" | "FALSE" => YB(false)
    case other                       => YS(unquote(other))
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
