package graft.turtle

/** Token produced by the lexer — mirrors reference `src/lexing.rs:64-75`. */
sealed trait Token
object Token {
  final case class Kw(k: Keyword) extends Token
  case object BeginParen extends Token
  case object BeginBracket extends Token
  case object EndParen extends Token
  case object EndBracket extends Token
  final case class LangTag(tag: String) extends Token
  final case class IriRef(value: String) extends Token
  final case class StringLit(value: String) extends Token
  /** Includes the `_:` prefix (reference `src/lexing.rs:644-646`). */
  final case class BlankLabel(label: String) extends Token
  case object Comma extends Token
  case object Semicolon extends Token
  case object Carets extends Token
  case object Period extends Token
  final case class CompactIri(
      prefix: String, prefixSpan: Span, suffix: String, suffixSpan: Span) extends Token
  final case class Numeric(lex: String, kind: Ast.NumKind) extends Token

  /** Human-readable token description for error messages. */
  def describe(t: Token): String = t match {
    case Kw(k)              => s"keyword `${Keyword.show(k)}`"
    case BeginParen         => "opening `(`"
    case BeginBracket       => "opening `[`"
    case EndParen           => "closing `)`"
    case EndBracket         => "closing `]`"
    case LangTag(tag)       => s"language tag `$tag`"
    case IriRef(v)          => s"IRI reference <$v>"
    case StringLit(v)       => s"""string literal "$v""""
    case BlankLabel(l)      => s"blank node label `$l`"
    case Comma              => "comma `,`"
    case Semicolon          => "semicolon `;`"
    case Carets             => "carets `^^`"
    case Period             => "dot `.`"
    case CompactIri(p, _, s, _) => s"compact IRI `$p:$s`"
    case Numeric(lex, _)    => s"numeric literal `$lex`"
  }
}

sealed trait Keyword
object Keyword {
  case object A extends Keyword
  case object Prefix extends Keyword
  case object Base extends Keyword
  case object SparqlBase extends Keyword
  case object SparqlPrefix extends Keyword
  case object True extends Keyword
  case object False extends Keyword

  /** Bare-word keyword recognition — reference `src/lexing.rs:134-156`:
    * `a`/`true`/`false` exact, `BASE`/`PREFIX` ASCII-case-insensitive.
    */
  def fromString(s: String): Option[Keyword] =
    if (s == "a") Some(A)
    else if (s == "true") Some(True)
    else if (s == "false") Some(False)
    else if (s.equalsIgnoreCase("BASE")) Some(SparqlBase)
    else if (s.equalsIgnoreCase("PREFIX")) Some(SparqlPrefix)
    else None

  def show(k: Keyword): String = k match {
    case A => "a"; case Prefix => "@prefix"; case Base => "@base"
    case SparqlBase => "BASE"; case SparqlPrefix => "PREFIX"
    case True => "true"; case False => "false"
  }
}

/** Single-pass LL(1) Turtle lexer over a String, tracking byte-offset spans.
  *
  * A faithful re-expression of the reference lexer (`src/lexing.rs`),
  * including its documented deviations from the W3C grammar which the
  * conformance corpus pins (SURVEY.md §7.4):
  *   - `%XX` in PN_LOCAL is percent-DECODED (`src/lexing.rs:750-753`);
  *   - raw newlines are accepted inside single-line strings
  *     (`src/lexing.rs:533-535`, commented-out check);
  *   - PN_LOCAL does not admit internal dots;
  *   - langtag SUBTAGS must terminate at whitespace/EOF
  *     (`src/lexing.rs` next_langtag_or_keyword: any other terminator is
  *     `InvalidLangTag`), so W3C-valid `"x"@en-us;` is rejected while
  *     `"x"@en;` is fine — the primary tag breaks on any non-letter;
  *   - bare keywords (`true`/`false`/`a`…) likewise require a
  *     whitespace/':'/'.'/PN terminator, so `(true)` / `true,false` are
  *     rejected;
  *   - the numeric DFA consumes a '.' after digits with no backtrack
  *     (reference `State::Integer` → `NonEmptyDecimal`), so the W3C form
  *     `1.` (integer + statement dot, no space) is rejected — `1 .` is
  *     required.
  *
  * Pure Scala, zero Spark dependency: on the cluster one instance runs per
  * document inside a `Dataset.flatMap`/`mapPartitions` task.
  */
final class Lexer(input: String) {
  import Lexer._

  // UTF-16 cursor into `input`; spans are UTF-8 byte offsets like the
  // reference's `DecodedChar::len`-based positions (`src/lexing.rs:279-290`).
  private[this] var i: Int = 0
  private[this] var spanStart: Int = 0
  private[this] var spanEnd: Int = 0
  private[this] var lastStart: Int = 0
  private[this] var lastEnd: Int = 0
  private[this] var lookahead: Located[Token] = null

  private def current: Span = Span(spanStart, spanEnd)
  private def endSpan: Span = Span(spanEnd, spanEnd)
  private def lastSp: Span = Span(lastStart, lastEnd)

  /** Span of the last parsed token (Tokens::last, `src/lexing.rs:891-893`). */
  def last: Span = lastSp

  private def err(msg: String, span: Span): Nothing = throw TurtleError(msg, span)
  private def unexpected(cp: Int, span: Span): Nothing =
    if (cp < 0) err("unexpected end of file", span)
    else err(s"unexpected character `${new String(Character.toChars(cp))}`", span)

  /** Codepoint at cursor or -1 at EOF (does not advance). */
  private def peekChar(): Int =
    if (i >= input.length) -1 else input.codePointAt(i)

  /** Consume one codepoint, advancing the byte spans. Returns -1 at EOF. */
  private def nextChar(): Int = {
    if (i >= input.length) -1
    else {
      val cp = input.codePointAt(i)
      i += Character.charCount(cp)
      val len = utf8Len(cp)
      spanEnd += len
      lastStart = spanEnd - len
      lastEnd = spanEnd
      cp
    }
  }

  private def expectChar(): Int = {
    val c = nextChar()
    if (c < 0) err("unexpected end of file", endSpan)
    c
  }

  /** Skip whitespace and `#` comments — reference `src/lexing.rs:297-324`. */
  private def skipWhitespaces(): Unit = {
    var done = false
    while (!done) {
      val c = peekChar()
      if (c >= 0 && isWhitespace(c)) { nextChar(); () }
      else if (c == '#') {
        // comment runs to EOL or EOF
        var inComment = true
        while (inComment) {
          val n = nextChar()
          if (n < 0 || n == '\n') inComment = false
        }
      } else done = true
    }
    spanStart = spanEnd
  }

  /** `@`-prefixed language tag or `@prefix`/`@base` keyword —
    * reference `src/lexing.rs:327-406`.
    */
  private def nextLangtagOrKeyword(): Located[Token] = {
    val tag = new java.lang.StringBuilder
    var break = false
    while (!break) {
      val c = peekChar()
      if (c < 0) {
        if (tag.length == 0) err("invalid language tag", current) else break = true
      } else if (c >= 'a' && c <= 'z' || c >= 'A' && c <= 'Z') {
        tag.appendCodePoint(expectChar())
      } else if (tag.length == 0) err("invalid language tag", current)
      else break = true
    }
    var emptySubtag = true
    if (peekChar() == '-') {
      tag.appendCodePoint(expectChar())
      var loop = true
      while (loop) {
        val c = peekChar()
        if (c == '-' && !emptySubtag) tag.appendCodePoint(expectChar())
        else if (c >= '0' && c <= '9' || c >= 'a' && c <= 'z' || c >= 'A' && c <= 'Z') {
          emptySubtag = false
          tag.appendCodePoint(expectChar())
        } else if (c >= 0) {
          if (isWhitespace(c)) {
            if (emptySubtag) err("invalid language tag", current) else loop = false
          } else { nextChar(); unexpected(c, lastSp) }
        } else { // EOF
          if (emptySubtag) err("invalid language tag", current) else loop = false
        }
      }
    }
    tag.toString match {
      case "prefix" => Located(Token.Kw(Keyword.Prefix), current)
      case "base"   => Located(Token.Kw(Keyword.Base), current)
      case t        => Located(Token.LangTag(t), current)
    }
  }

  /** IRIREF after the opening `<` — reference `src/lexing.rs:410-454`.
    * Decodes `\uXXXX`/`\UXXXXXXXX`, rejects forbidden raw chars, then
    * validates IRI-reference syntax (the reference defers to `iref`).
    */
  private def nextIriRef(): Located[Token] = {
    val sb = new java.lang.StringBuilder
    var break = false
    while (!break) {
      nextChar() match {
        case '>' => break = true
        case '\\' =>
          val sp = lastSp
          val c = nextChar() match {
            case 'u' => nextHexChar(sp, 4)
            case 'U' => nextHexChar(sp, 8)
            case u   => unexpected(u, lastSp)
          }
          sb.appendCodePoint(c)
        case c if c >= 0 =>
          if (c <= 0x20 || c == '<' || c == '>' || c == '"' || c == '{' || c == '}' ||
              c == '|' || c == '^' || c == '`' || c == '\\')
            unexpected(c, lastSp)
          sb.appendCodePoint(c)
        case _ => err("unexpected end of file", endSpan)
      }
    }
    val s = sb.toString
    IriResolver.validateIriRef(s) match {
      case Some(reason) => err(s"invalid IRI reference <$s>: $reason", current)
      case None         => Located(Token.IriRef(s), current)
    }
  }

  /** `len` hex digits → codepoint — reference `src/lexing.rs:456-477`.
    * Accumulated in a Long: 8 hex digits overflow Int and would wrap past
    * the `> 0x10FFFF` guard (the reference uses u32).
    */
  private def nextHexChar(spanStartAt: Span, len: Int): Int = {
    var codepoint = 0L
    var k = 0
    while (k < len) {
      val c = expectChar()
      val d = Character.digit(c, 16)
      if (d < 0) unexpected(c, lastSp)
      codepoint = (codepoint << 4) | d
      k += 1
    }
    val sp = Span(spanStartAt.start, current.end)
    if (codepoint > 0x10FFFF || (codepoint >= 0xD800 && codepoint <= 0xDFFF))
      err(f"invalid character code point $codepoint%x", sp)
    codepoint.toInt
  }

  /** String literal after the opening quote; handles long `"""…"""` /
    * `'''…'''` forms — reference `src/lexing.rs:481-548`.
    */
  private def nextStringLiteral(delimiter: Int): Located[Token] = {
    val sb = new java.lang.StringBuilder
    var long = false
    var break = false
    while (!break) {
      val c0 = nextChar()
      if (c0 == delimiter) {
        if (!long) {
          if (sb.length == 0 && peekChar() == delimiter) { nextChar(); long = true }
          else break = true
        } else if (peekChar() == delimiter) {
          nextChar()
          if (peekChar() == delimiter) { nextChar(); break = true }
          else { sb.appendCodePoint(delimiter); sb.appendCodePoint(delimiter) }
        } else sb.appendCodePoint(delimiter)
      } else if (c0 == '\\') {
        val sp = lastSp
        val c = nextChar() match {
          case 'u'  => nextHexChar(sp, 4)
          case 'U'  => nextHexChar(sp, 8)
          case 't'  => '\t'.toInt
          case 'b'  => 0x08
          case 'n'  => '\n'.toInt
          case 'r'  => '\r'.toInt
          case 'f'  => 0x0c
          case '\'' => '\''.toInt
          case '"'  => '"'.toInt
          case '\\' => '\\'.toInt
          case u    => unexpected(u, lastSp)
        }
        sb.appendCodePoint(c)
      } else if (c0 >= 0) {
        // NB: the reference ACCEPTS raw newlines in single-line strings
        // (check commented out at src/lexing.rs:533-535) — replicated.
        sb.appendCodePoint(c0)
      } else err("unexpected end of file", endSpan)
    }
    Located(Token.StringLit(sb.toString), current)
  }

  // Numeric DFA states — reference `src/lexing.rs:552-638`.
  private final val NonEmptyInteger = 0
  private final val IntegerSt = 1
  private final val NonENonEmptyDecimal = 2
  private final val NonEmptyDecimal = 3
  private final val DecimalSt = 4
  private final val ExponentSign = 5
  private final val NonEmptyExponent = 6
  private final val ExponentSt = 7

  /** Numeric literal or lone `.` (end-of-statement) after its first char. */
  private def nextNumericOrDot(first: Int): Located[Token] = {
    val sb = new java.lang.StringBuilder
    sb.appendCodePoint(first)
    var state = first match {
      case '+' | '-'            => NonEmptyInteger
      case '.'                  => NonENonEmptyDecimal
      case c if c >= '0' && c <= '9' => IntegerSt
      case _                    => sys.error("invalid first numeric character")
    }
    var break = false
    var isPeriod = false
    while (!break && !isPeriod) {
      val c = peekChar()
      val digit = c >= '0' && c <= '9'
      state match {
        case NonEmptyInteger =>
          if (digit) state = IntegerSt
          else if (c == '.') state = NonEmptyDecimal
          else unexpected(c, lastSp)
        case IntegerSt =>
          if (digit) state = IntegerSt
          else if (c == '.') state = NonEmptyDecimal
          else if (c == 'e' || c == 'E') state = ExponentSign
          else break = true
        case NonENonEmptyDecimal =>
          if (digit) state = DecimalSt
          else isPeriod = true
        case NonEmptyDecimal =>
          if (digit) state = DecimalSt
          else if (c == 'e' || c == 'E') state = ExponentSign
          else unexpected(c, lastSp)
        case DecimalSt =>
          if (digit) state = DecimalSt
          else if (c == 'e' || c == 'E') state = ExponentSign
          else break = true
        case ExponentSign =>
          if (c == '+' || c == '-') state = NonEmptyExponent
          else if (digit) state = ExponentSt
          else unexpected(c, lastSp)
        case NonEmptyExponent =>
          if (digit) state = ExponentSt
          else unexpected(c, lastSp)
        case ExponentSt =>
          if (digit) state = ExponentSt
          else break = true
      }
      if (!break && !isPeriod) sb.appendCodePoint(expectChar())
    }
    if (isPeriod) Located(Token.Period, current)
    else {
      val kind = state match {
        case IntegerSt  => Ast.NumKind.Integer
        case DecimalSt  => Ast.NumKind.Decimal
        case ExponentSt => Ast.NumKind.Double
        case _          => sys.error("unreachable numeric DFA state")
      }
      Located(Token.Numeric(sb.toString, kind), current)
    }
  }

  /** Blank node label after the first `_` — reference `src/lexing.rs:641-681`.
    * A label may contain internal dots but must not end in one.
    */
  private def nextBlankNodeLabel(): Located[Token] = {
    nextChar() match {
      case ':' =>
        val sb = new java.lang.StringBuilder("_:")
        val c0 = nextChar()
        if (c0 >= 0 && (isAsciiDigit(c0) || isPnCharsU(c0))) {
          sb.appendCodePoint(c0)
          var lastIsPnChars = true
          var break = false
          while (!break) {
            val c = peekChar()
            if (c >= 0 && isPnChars(c)) { sb.appendCodePoint(expectChar()); lastIsPnChars = true }
            else if (c == '.') { sb.appendCodePoint(expectChar()); lastIsPnChars = false }
            else if (lastIsPnChars) break = true
            else unexpected(c, lastSp)
          }
          Located(Token.BlankLabel(sb.toString), current)
        } else unexpected(c0, lastSp)
      case u => unexpected(u, lastSp)
    }
  }

  /** PN_LOCAL `\`-escape — reference `src/lexing.rs:683-691`. */
  private def nextEscape(): Int = nextChar() match {
    case c @ ('_' | '~' | '.' | '-' | '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ','
        | ';' | '=' | '/' | '?' | '#' | '@' | '%') => c
    case u => unexpected(u, lastSp)
  }

  /** PNAME or bare-word keyword — reference `src/lexing.rs:693-798`.
    * Deviations replicated: `%XX` percent-decoded in PN_LOCAL; no internal
    * dots in PN_LOCAL; bare word w/o `:` lexes as CompactIri(word, "").
    */
  private def nextNameOrKeyword(c: Int): Located[Token] = {
    // PNAME_NS or keyword
    var namespace: String = null
    var nsSpan: Span = null
    if (c == ':') { namespace = ""; nsSpan = current }
    else if (isPnCharsBase(c)) {
      val sb = new java.lang.StringBuilder
      sb.appendCodePoint(c)
      var lastIsPnChars = true
      var break = false
      while (!break) {
        val p = peekChar()
        if (p >= 0 && isPnChars(p)) { sb.appendCodePoint(expectChar()); lastIsPnChars = true }
        else if (p == '.') { sb.appendCodePoint(expectChar()); lastIsPnChars = false }
        else if (p == ':' && lastIsPnChars) {
          nsSpan = current
          expectChar()
          break = true
        } else {
          if (p < 0 || isWhitespace(p)) {
            Keyword.fromString(sb.toString) match {
              case Some(kw) => return Located(Token.Kw(kw), current)
              case None     => nsSpan = current; break = true
            }
          } else unexpected(p, endSpan)
        }
      }
      namespace = sb.toString
      if (nsSpan == null) nsSpan = current
    } else unexpected(c, lastSp)

    // PN_LOCAL
    val suffix = new java.lang.StringBuilder
    var suffixSpan = current.next
    val p0 = peekChar()
    if (p0 >= 0 && (isPnCharsU(p0) || isAsciiDigit(p0) || p0 == ':' || p0 == '%' || p0 == '\\')) {
      var c1 = expectChar()
      c1 = c1 match {
        case '%'  => nextHexChar(Span(current.end, current.end), 2)
        case '\\' => nextEscape()
        case x    => x
      }
      suffix.appendCodePoint(c1)
      var break = false
      while (!break) {
        val p = peekChar()
        if (p >= 0 && (isPnChars(p) || isAsciiDigit(p) || p == ':' || p == '%' || p == '\\')) {
          var c2 = expectChar()
          c2 = c2 match {
            case '%'  => nextHexChar(Span(current.end, current.end), 2)
            case '\\' => nextEscape()
            case x    => x
          }
          suffix.appendCodePoint(c2)
        } else {
          suffixSpan = Span(suffixSpan.start, current.end)
          break = true
        }
      }
      Located(Token.CompactIri(namespace, nsSpan, suffix.toString, suffixSpan), current)
    } else {
      Located(Token.CompactIri(namespace, nsSpan, "", current), current)
    }
  }

  /** One-char dispatch — reference `src/lexing.rs:800-854`. Returns null at EOF. */
  def consume(): Located[Token] = {
    skipWhitespaces()
    nextChar() match {
      case -1   => null
      case '@'  => nextLangtagOrKeyword()
      case '<'  => nextIriRef()
      case '"'  => nextStringLiteral('"')
      case '\'' => nextStringLiteral('\'')
      case '_'  => nextBlankNodeLabel()
      case ','  => Located(Token.Comma, current)
      case ';'  => Located(Token.Semicolon, current)
      case '^' =>
        nextChar() match {
          case '^' => Located(Token.Carets, current)
          case u   => unexpected(u, lastSp)
        }
      case '(' => Located(Token.BeginParen, current)
      case '[' => Located(Token.BeginBracket, current)
      case ')' => Located(Token.EndParen, current)
      case ']' => Located(Token.EndBracket, current)
      case c @ ('+' | '-' | '.') => nextNumericOrDot(c)
      case c if c >= '0' && c <= '9' => nextNumericOrDot(c)
      case c => nextNameOrKeyword(c)
    }
  }

  /** 1-token lookahead — reference `src/lexing.rs:857-868`. Null at EOF. */
  def peek(): Located[Token] = {
    if (lookahead == null) lookahead = consume()
    lookahead
  }

  /** Next token or null at EOF — reference `src/lexing.rs:871-877`. */
  def next(): Located[Token] = {
    if (lookahead != null) { val t = lookahead; lookahead = null; t }
    else consume()
  }

  /** Span to report for an absent (EOF) token. */
  def eofSpan: Span = endSpan
}

object Lexer {
  @inline def isAsciiDigit(c: Int): Boolean = c >= '0' && c <= '9'

  /** Unicode White_Space property, matching Rust `char::is_whitespace`
    * (Java's `Character.isWhitespace` differs: it excludes U+00A0/U+2007/
    * U+202F and includes U+001C..U+001F).
    */
  def isWhitespace(c: Int): Boolean = (c: @annotation.switch) match {
    case 0x09 | 0x0A | 0x0B | 0x0C | 0x0D | 0x20 | 0x85 | 0xA0 | 0x1680 | 0x2028 | 0x2029 |
        0x202F | 0x205F | 0x3000 => true
    case _ => c >= 0x2000 && c <= 0x200A
  }

  /** PN_CHARS_BASE — exact ranges from reference `src/lexing.rs:907-909`. */
  def isPnCharsBase(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= 0x00C0 && c <= 0x00D6) || (c >= 0x00D8 && c <= 0x00F6) ||
      (c >= 0x00F8 && c <= 0x02FF) || (c >= 0x0370 && c <= 0x037D) ||
      (c >= 0x037F && c <= 0x1FFF) || (c >= 0x200C && c <= 0x200D) ||
      (c >= 0x2070 && c <= 0x218F) || (c >= 0x2C00 && c <= 0x2FEF) ||
      (c >= 0x3001 && c <= 0xD7FF) || (c >= 0xF900 && c <= 0xFDCF) ||
      (c >= 0xFDF0 && c <= 0xFFFD) || (c >= 0x10000 && c <= 0xEFFFF)

  def isPnCharsU(c: Int): Boolean = isPnCharsBase(c) || c == '_'

  def isPnChars(c: Int): Boolean =
    isPnCharsU(c) || c == '-' || (c >= '0' && c <= '9') || c == 0x00B7 ||
      (c >= 0x0300 && c <= 0x036F) || (c >= 0x203F && c <= 0x2040)

  /** UTF-8 encoded length of a codepoint (reference `DecodedChar::len`). */
  @inline def utf8Len(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
}
