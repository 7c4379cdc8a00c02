package graft.pipeline

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Dataset

/** Deterministic boilerplate-stripping text extraction (html → text).
  *
  * Must be byte-identical per url against the `text` oracle column
  * (input contract) — so the function is pure, locale-free, and
  * allocation-light. Narrow transformation: no shuffle, runs inside the
  * scan stage under whole-stage codegen boundaries.
  */
object Extract {

  private val BoilerplateTags = Array("script", "style", "head", "nav", "header", "aside", "footer")

  /** Remove `<tag …>…</tag>` blocks (case-insensitive, non-nested). */
  private def removeBlocks(s: String, tag: String): String = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val open = "<" + tag
    val close = "</" + tag + ">"
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val start = lower.indexOf(open, i)
      // require the char after the tag name to terminate the name
      val valid = start >= 0 && {
        val after = start + open.length
        after < s.length && (s.charAt(after) == '>' || s.charAt(after) == ' ' || s.charAt(after) == '/')
      }
      if (start < 0) {
        sb.append(s, i, s.length)
        i = s.length
      } else if (!valid) {
        // prefix-sharing false match (e.g. "<navy" while scanning for
        // "<nav"): keep this char and CONTINUE scanning — aborting here
        // would leave every later genuine block unstripped
        sb.append(s, i, start + 1)
        i = start + 1
      } else {
        sb.append(s, i, start)
        val end = lower.indexOf(close, start)
        i = if (end < 0) s.length else end + close.length
      }
    }
    sb.toString
  }

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&amp;", "&") // &amp; last

  /** Block-level closes become line breaks; all other tags are dropped. */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val end = s.indexOf('>', i)
        if (end < 0) i = s.length
        else {
          val tag = s.substring(i + 1, end).toLowerCase(java.util.Locale.ROOT)
          val name = tag.stripPrefix("/").takeWhile(ch => ch.isLetterOrDigit)
          val isBreak = tag.startsWith("/") &&
            (name == "p" || name == "div" || name == "li" || name == "article" ||
              name == "section" || name == "tr" || (name.length == 2 && name(0) == 'h' && name(1).isDigit))
          if (isBreak || name == "br") sb.append('\n')
          i = end + 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** html bytes → extracted text. */
  def extractText(html: Array[Byte]): String =
    extractText(new String(html, StandardCharsets.UTF_8))

  def extractText(html: String): String = {
    var s = html
    var k = 0
    while (k < BoilerplateTags.length) { s = removeBlocks(s, BoilerplateTags(k)); k += 1 }
    val text = decodeEntities(stripTags(s))
    // normalize: trim lines, drop empties, join with single '\n'
    val sb = new java.lang.StringBuilder(text.length)
    var first = true
    text.split("\n", -1).foreach { line =>
      val t = line.trim
      if (t.nonEmpty) {
        if (!first) sb.append('\n')
        sb.append(t)
        first = false
      }
    }
    sb.toString
  }

  /** Stage: re-derive `text` from `html` for every page. The returned
    * Dataset carries the extracted value; [[verifyAgainstOracle]] checks the
    * per-row byte-identity invariant.
    */
  def run(pages: Dataset[WebPage]): Dataset[WebPage] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions(_.map(p => p.copy(text = extractText(p.html))))
  }

  /** Count of rows violating the byte-identity invariant (must be 0). */
  def verifyAgainstOracle(pages: Dataset[WebPage]): Long = {
    import pages.sparkSession.implicits._
    pages.filter(p => extractText(p.html) != p.text).count()
  }
}
