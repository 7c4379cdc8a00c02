package graft.turtle

import scala.collection.mutable

/** N-Triples serializer + N-Triples/N-Quads parser.
  *
  * The serializer uses the reference's exact string-escape table
  * (`DisplayStringLiteral`, `src/lexing.rs:99-118`): `"` → `"`,
  * `\` → `\`, and `\n \r \t \b \f`; everything else verbatim.
  * `xsd:string` literals are written in the plain form (RDF 1.1 makes
  * `"x"` ≡ `"x"^^xsd:string`; the parser normalizes the other way).
  *
  * The parser is the test-harness oracle (reference `tests/positive.rs:27-36`
  * uses the sibling `nquads-syntax` crate): a strict single-line grammar,
  * no prefixes/collections/sugar. An optional graph label (N-Quads) is
  * accepted and dropped.
  */
object NTriples {

  def escapeString(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      c match {
        case '"'    => sb.append("\\u0022")
        case '\\'   => sb.append("\\u005c")
        case '\n'   => sb.append("\\n")
        case '\r'   => sb.append("\\r")
        case '\t'   => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case other  => sb.append(other)
      }
      k += 1
    }
    sb.toString
  }

  def renderTerm(t: Term): String = t match {
    case Term.TIri(iri)    => "<" + iri + ">"
    case Term.TBlank(l)    => l
    case Term.TLit(lex, tpe) =>
      val quoted = "\"" + escapeString(lex) + "\""
      tpe match {
        case LitType.Lang(tag)               => quoted + "@" + tag
        case LitType.Dt(Vocab.XsdString)     => quoted
        case LitType.Dt(dt)                  => quoted + "^^<" + dt + ">"
      }
  }

  def renderTriple(t: Triple): String =
    renderTerm(t.subj) + " <" + t.pred + "> " + renderTerm(t.obj) + " ."

  /** N-Quads statement: the triple with its graph label (IRI or blank)
    * before the terminator; `None` renders the default-graph N-Triples
    * form (legal N-Quads — the graph label is optional per statement).
    */
  def renderQuad(t: Triple, graph: Option[Term]): String = graph match {
    case None    => renderTriple(t)
    case Some(g) =>
      renderTerm(t.subj) + " <" + t.pred + "> " + renderTerm(t.obj) + " " +
        renderTerm(g) + " ."
  }

  /** Serialize a whole document, one triple per line. */
  def render(triples: Seq[Triple]): String =
    triples.iterator.map(renderTriple).mkString("", "\n", if (triples.nonEmpty) "\n" else "")

  // ---------------------------------------------------------------- parser

  /** Parse an N-Triples / N-Quads document into ground triples
    * (graph labels dropped). Spans are byte offsets like the Turtle lexer.
    */
  def parse(text: String): Either[TurtleError, Vector[Triple]] =
    try Right(new NtParser(text).parseAll())
    catch { case e: TurtleError => Left(e) }

  /** Parse an N-Quads document KEEPING each statement's graph label
    * (None = default graph). Same grammar as [[parse]] — that entry
    * point is this one with the labels dropped.
    */
  def parseQuads(text: String): Either[TurtleError, Vector[(Triple, Option[Term])]] =
    try Right(new NtParser(text).parseAllQuads())
    catch { case e: TurtleError => Left(e) }

  private final class NtParser(input: String) {
    private[this] var i = 0
    private[this] var byteOff = 0

    private def err(msg: String): Nothing = throw TurtleError(msg, Span(byteOff, byteOff))

    private def peekCp(): Int = if (i >= input.length) -1 else input.codePointAt(i)
    private def nextCp(): Int = {
      if (i >= input.length) -1
      else {
        val cp = input.codePointAt(i)
        i += Character.charCount(cp)
        byteOff += Lexer.utf8Len(cp)
        cp
      }
    }

    private def skipWs(): Unit = {
      var done = false
      while (!done) {
        val c = peekCp()
        if (c >= 0 && Lexer.isWhitespace(c)) { nextCp(); () }
        else if (c == '#') { while (peekCp() >= 0 && peekCp() != '\n') nextCp() }
        else done = true
      }
    }

    private def hexChar(len: Int): Int = {
      var cp = 0L // Long: 8 hex digits overflow Int past the range guard
      var k = 0
      while (k < len) {
        val c = nextCp()
        val d = Character.digit(c, 16)
        if (d < 0) err("invalid \\u escape")
        cp = (cp << 4) | d
        k += 1
      }
      if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) err("invalid codepoint")
      cp.toInt
    }

    private def parseIriRef(): String = {
      // after '<'
      val sb = new java.lang.StringBuilder
      var done = false
      while (!done) {
        nextCp() match {
          case '>' => done = true
          case '\\' =>
            nextCp() match {
              case 'u' => sb.appendCodePoint(hexChar(4))
              case 'U' => sb.appendCodePoint(hexChar(8))
              case _   => err("invalid IRI escape")
            }
          case c if c > 0x20 && c != '<' && c != '"' && c != '{' && c != '}' && c != '|' &&
              c != '^' && c != '`' => sb.appendCodePoint(c)
          case _ => err("invalid char in IRI")
        }
      }
      sb.toString
    }

    private def parseString(): String = {
      // after '"'
      val sb = new java.lang.StringBuilder
      var done = false
      while (!done) {
        nextCp() match {
          case '"' => done = true
          case '\\' =>
            nextCp() match {
              case 'u'  => sb.appendCodePoint(hexChar(4))
              case 'U'  => sb.appendCodePoint(hexChar(8))
              case 't'  => sb.append('\t')
              case 'b'  => sb.append('\b')
              case 'n'  => sb.append('\n')
              case 'r'  => sb.append('\r')
              case 'f'  => sb.append('\f')
              case '\'' => sb.append('\'')
              case '"'  => sb.append('"')
              case '\\' => sb.append('\\')
              case _    => err("invalid string escape")
            }
          case c if c >= 0 => sb.appendCodePoint(c)
          case _           => err("unterminated string")
        }
      }
      sb.toString
    }

    private def parseBlank(): String = {
      // after '_'
      if (nextCp() != ':') err("expected ':' after '_'")
      val sb = new java.lang.StringBuilder("_:")
      val c0 = nextCp()
      if (!(Lexer.isPnCharsU(c0) || Lexer.isAsciiDigit(c0))) err("invalid blank label")
      sb.appendCodePoint(c0)
      var done = false
      while (!done) {
        val c = peekCp()
        if (c >= 0 && (Lexer.isPnChars(c) || c == '.')) { sb.appendCodePoint(nextCp()) }
        else done = true
      }
      // trailing dots belong to the statement terminator
      var s = sb.toString
      while (s.endsWith(".")) { s = s.substring(0, s.length - 1); i -= 1; byteOff -= 1 }
      s
    }

    private def parseLangTag(): String = {
      // after '@'
      val sb = new java.lang.StringBuilder
      var c = peekCp()
      while (c >= 0 && (Character.isLetterOrDigit(c) && c < 128 || c == '-')) {
        sb.appendCodePoint(nextCp()); c = peekCp()
      }
      if (sb.length == 0) err("empty language tag")
      sb.toString
    }

    private def parseTerm(allowLiteral: Boolean): Term = {
      skipWs()
      peekCp() match {
        case '<' => nextCp(); Term.TIri(parseIriRef())
        case '_' => nextCp(); Term.TBlank(parseBlank())
        case '"' if allowLiteral =>
          nextCp()
          val lex = parseString()
          peekCp() match {
            case '@'  => nextCp(); Term.TLit(lex, LitType.Lang(parseLangTag()))
            case '^' =>
              nextCp()
              if (nextCp() != '^') err("expected '^^'")
              skipWs()
              if (nextCp() != '<') err("expected datatype IRI")
              Term.TLit(lex, LitType.Dt(parseIriRef()))
            case _ => Term.TLit(lex, LitType.Dt(Vocab.XsdString))
          }
        case c if c < 0 => err("unexpected end of file")
        case c          => err(s"unexpected character `${new String(Character.toChars(c))}`")
      }
    }

    def parseAll(): Vector[Triple] = parseAllQuads().map(_._1)

    def parseAllQuads(): Vector[(Triple, Option[Term])] = {
      val out = mutable.ArrayBuffer.empty[(Triple, Option[Term])]
      skipWs()
      while (peekCp() >= 0) {
        val start = byteOff
        val s = parseTerm(allowLiteral = false)
        skipWs()
        val p = parseTerm(allowLiteral = false) match {
          case Term.TIri(iri) => iri
          case _              => err("predicate must be an IRI")
        }
        val o = parseTerm(allowLiteral = true)
        skipWs()
        // optional graph label (N-Quads)
        val g = if (peekCp() == '<' || peekCp() == '_') {
          val t = parseTerm(allowLiteral = false)
          skipWs()
          Some(t)
        } else None
        if (nextCp() != '.') err("expected '.'")
        out += ((Triple(s, p, o, Span(start, byteOff)), g))
        skipWs()
      }
      out.toVector
    }
  }
}
