package graft.sparql

import scala.collection.mutable.ArrayBuffer
import SparqlAst.Diag

/** SPARQL 1.1 tokenizer — pure Scala, zero Spark, every token carrying its
  * source span (the reference's lexing discipline,
  * `/root/reference/src/lexing.rs`: a cursor over chars, spanned errors).
  * Produces the token stream [[SparqlParser]] consumes; rejects (bad
  * escapes, unterminated strings/IRIs, stray chars) raise [[Diag]] with the
  * offending span rather than guessing.
  */
object SparqlLexer {

  sealed trait Tok { def start: Int; def end: Int }
  object Tok {
    /** `<iri>` — raw, not yet resolved against BASE. */
    final case class Iri(iri: String, start: Int, end: Int) extends Tok
    /** `pfx:local` (prefix may be empty: `:local`; local may be empty in
      * a PREFIX declaration: `pfx:`).
      */
    final case class Pname(prefix: String, local: String, start: Int, end: Int) extends Tok
    /** `?name` / `$name`. */
    final case class Var(name: String, start: Int, end: Int) extends Tok
    /** String body, escape-DECODED (raw value). */
    final case class Str(value: String, start: Int, end: Int) extends Tok
    /** `@tag` immediately after a string. */
    final case class LangTag(tag: String, start: Int, end: Int) extends Tok
    /** Integer or decimal numeric literal (sign included). */
    final case class Num(value: BigDecimal, lexical: String, start: Int, end: Int) extends Tok
    /** Bare word: keyword, `a`, `true`/`false`, aggregate name. */
    final case class Word(word: String, start: Int, end: Int) extends Tok
    /** Punctuation / operator: one of
      * `{ } ( ) . ; , * + ! | / ^ = != < > <= >= && || ^^`.
      */
    final case class Punct(sym: String, start: Int, end: Int) extends Tok
    final case class Eof(start: Int, end: Int) extends Tok
  }

  private val punct2 = Set("!=", "<=", ">=", "&&", "||", "^^")
  private val punct1 = Set("{", "}", "(", ")", ".", ";", ",", "*", "+", "!",
    "|", "/", "^", "=", "<", ">")

  /** Chars that terminate an IRIREF attempt (per the IRIREF production:
    * no whitespace, control, `<"{}|^`  or backslash inside brackets).
    */
  private def iriIllegal(c: Char): Boolean =
    c <= ' ' || c == '<' || c == '"' || c == '{' || c == '}' || c == '|' ||
      c == '^' || c == '`' || c == '\\'

  private def isPnStart(c: Char): Boolean =
    Character.isLetter(c) || c == '_'
  private def isPnChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '-'

  def lex(q: String): Vector[Tok] = {
    val out = new ArrayBuffer[Tok]
    var i = 0
    val n = q.length
    def diag(msg: String, s: Int, e: Int): Nothing = throw Diag(msg, s, e)

    while (i < n) {
      val c = q.charAt(i)
      if (c <= ' ') i += 1
      else if (c == '#') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if (c == '<') {
        // IRIREF vs the less-than operator: scan for a closing '>' before
        // any char the IRIREF production forbids — found ⇒ IRI, else `<`/`<=`
        var j = i + 1
        while (j < n && q.charAt(j) != '>' && !iriIllegal(q.charAt(j))) j += 1
        if (j < n && q.charAt(j) == '>') {
          out += Tok.Iri(q.substring(i + 1, j), i, j + 1); i = j + 1
        } else if (i + 1 < n && q.charAt(i + 1) == '=') {
          out += Tok.Punct("<=", i, i + 2); i += 2
        } else { out += Tok.Punct("<", i, i + 1); i += 1 }
      } else if (c == '"' || c == '\'') {
        if (i + 2 < n && q.charAt(i + 1) == c && q.charAt(i + 2) == c)
          diag("long (triple-quoted) strings are not supported", i, i + 3)
        val sb = new java.lang.StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val d = q.charAt(j)
          if (d == c) { closed = true; j += 1 }
          else if (d == '\n' || d == '\r')
            diag("newline in string literal (use \\n)", i, j)
          else if (d == '\\') {
            if (j + 1 >= n) diag("dangling escape", j, j + 1)
            q.charAt(j + 1) match {
              case 't'  => sb.append('\t'); j += 2
              case 'n'  => sb.append('\n'); j += 2
              case 'r'  => sb.append('\r'); j += 2
              case 'b'  => sb.append('\b'); j += 2
              case 'f'  => sb.append('\f'); j += 2
              case '"'  => sb.append('"'); j += 2
              case '\'' => sb.append('\''); j += 2
              case '\\' => sb.append('\\'); j += 2
              case 'u' =>
                if (j + 6 > n) diag("truncated \\u escape", j, n)
                val h = q.substring(j + 2, j + 6)
                val cp = try Integer.parseInt(h, 16)
                catch { case _: NumberFormatException =>
                  diag(s"bad \\u escape '\\u$h'", j, j + 6) }
                sb.append(cp.toChar); j += 6
              case 'U' =>
                if (j + 10 > n) diag("truncated \\U escape", j, n)
                val h = q.substring(j + 2, j + 10)
                val cp = try Integer.parseInt(h, 16)
                catch { case _: NumberFormatException =>
                  diag(s"bad \\U escape '\\U$h'", j, j + 10) }
                sb.appendCodePoint(cp); j += 10
              case other => diag(s"unknown escape '\\$other'", j, j + 2)
            }
          } else { sb.append(d); j += 1 }
        }
        if (!closed) diag("unterminated string literal", i, n)
        out += Tok.Str(sb.toString, i, j)
        i = j
      } else if (c == '?' || c == '$') {
        var j = i + 1
        while (j < n && isPnChar(q.charAt(j))) j += 1
        if (j == i + 1) diag("'?' must start a variable name", i, i + 1)
        out += Tok.Var(q.substring(i + 1, j), i, j); i = j
      } else if (c == '@') {
        var j = i + 1
        while (j < n && (Character.isLetterOrDigit(q.charAt(j)) || q.charAt(j) == '-')) j += 1
        if (j == i + 1) diag("'@' must start a language tag", i, i + 1)
        out += Tok.LangTag(q.substring(i + 1, j), i, j); i = j
      } else if (c.isDigit ||
          ((c == '-' || c == '+') && i + 1 < n && q.charAt(i + 1).isDigit)) {
        var j = if (c == '-' || c == '+') i + 1 else i
        while (j < n && q.charAt(j).isDigit) j += 1
        if (j < n && q.charAt(j) == '.' && j + 1 < n && q.charAt(j + 1).isDigit) {
          j += 1
          while (j < n && q.charAt(j).isDigit) j += 1
        }
        val lex0 = q.substring(i, j)
        val lexical = if (lex0.startsWith("+")) lex0.substring(1) else lex0
        out += Tok.Num(BigDecimal(lexical), lexical, i, j); i = j
      } else if (isPnStart(c) || c == ':') {
        var j = i
        while (j < n && isPnChar(q.charAt(j))) j += 1
        if (j < n && q.charAt(j) == ':') {
          val prefix = q.substring(i, j)
          var k = j + 1
          // local part: PN_CHARS plus interior dots (no trailing dot —
          // that terminates the triple)
          while (k < n && (isPnChar(q.charAt(k)) ||
              (q.charAt(k) == '.' && k + 1 < n && isPnChar(q.charAt(k + 1))))) k += 1
          out += Tok.Pname(prefix, q.substring(j + 1, k), i, k); i = k
        } else {
          out += Tok.Word(q.substring(i, j), i, j); i = j
        }
      } else if (c == '[' || c == ']') {
        diag("blank-node syntax [ … ] is not supported — blank nodes are " +
          "existential variables in SPARQL; use a ?variable", i, i + 1)
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (punct2(two)) { out += Tok.Punct(two, i, i + 2); i += 2 }
        else if (punct1(c.toString)) { out += Tok.Punct(c.toString, i, i + 1); i += 1 }
        else diag(s"unexpected character '$c'", i, i + 1)
      }
    }
    out += Tok.Eof(n, n)
    out.toVector
  }
}
