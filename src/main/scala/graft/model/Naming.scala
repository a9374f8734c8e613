package graft.model

/** Case-conversion and label-sanitization utilities.
  *
  * Mirrors the reference's string-conversion helpers (adapted there from the
  * Biolink Model Toolkit): reference biocypher/_misc.py:147-234,
  * _translate.py:445-456, output/write/_batch_writer.py:1008-1040.
  * Pure functions; used driver-side and inside row transforms.
  */
object Naming {

  /** sentence case -> PascalCase: uppercase every letter at start or after
    * whitespace, dropping the separator (reference: _misc.py:204-219). */
  def sentenceToPascal(s: String): String = {
    if (s == null || s.isEmpty) return s
    val sb = new StringBuilder(s.length)
    var upNext = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) upNext = true
      else if (upNext && ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) {
        sb.append(c.toUpper); upNext = false
      } else { sb.append(c); upNext = false }
      i += 1
    }
    sb.toString
  }

  /** Dotted names (virtual leaves like `reactome.pathway`) convert per
    * segment (reference: _translate.py:445-456). */
  def nameSentenceToPascal(name: String): String =
    if (name == null) null
    else if (name.contains(".")) name.split("\\.", -1).map(sentenceToPascal).mkString(".")
    else sentenceToPascal(name)

  /** PascalCase -> sentence case: split before [A-Z][a-z] (not at start),
    * then lowercase every letter-run containing a lowercase letter
    * (reference: _misc.py:152-171). */
  def pascalToSentence(s: String): String = {
    if (s == null || s.isEmpty) return s
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (i > 0 && c.isUpper && i + 1 < s.length && s.charAt(i + 1).isLower)
        sb.append(' ')
      sb.append(c)
      i += 1
    }
    // lowercase each [a-zA-Z]* run that contains at least one lowercase char
    lowercaseMixedRuns(sb.toString)
  }

  private def lowercaseMixedRuns(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i).isLetter) {
        var j = i
        while (j < s.length && s.charAt(j).isLetter) j += 1
        val run = s.substring(i, j)
        out.append(if (run.exists(_.isLower)) run.toLowerCase else run)
        i = j
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** snake_case (and any -_.\s separated / camel form) -> lower sentence
    * case (reference: _misc.py:174-186 via stringcase.sentencecase). */
  def snakeToSentence(s: String): String = {
    if (s == null) return null
    val joined = s.map(c => if (c == '-' || c == '_' || c == '.' || c.isWhitespace) ' ' else c)
    val sb = new StringBuilder(joined.length + 8)
    joined.foreach { c =>
      if (c.isUpper) { sb.append(' '); sb.append(c.toLower) } else sb.append(c)
    }
    sb.toString.trim.toLowerCase
  }

  /** Any string -> lower sentence case (reference: _misc.py:222-234). */
  def toLowerSentenceCase(s: String): String = {
    if (s == null || s.isEmpty) s
    else if (s.contains("_")) snakeToSentence(s)
    else if (s.contains(" ")) s.toLowerCase
    else if (s.charAt(0).isUpper) pascalToSentence(s)
    else s
  }

  /** Neo4j naming-rule sanitizer: keep only [a-zA-Z0-9_$ .], force first
    * char alphabetic or `$`, trim (reference: _batch_writer.py:1008-1040). */
  def parseLabel(label: String): String = {
    val kept = label.filter(c => c.isLetterOrDigit && c < 128 || c == '_' || c == '$' || c == ' ' || c == '.')
      .filter(c => c != '\t')
    val compliant = kept.dropWhile(c => !(c.isLetter && c < 128) && c != '$')
    compliant.trim
  }
}
