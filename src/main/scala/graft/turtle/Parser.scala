package graft.turtle

import Ast._

/** Recursive-descent LL(1) Turtle parser, mirroring the productions of the
  * reference parser (`src/parsing.rs`): one token of lookahead, grammar
  * quirks replicated exactly:
  *   - `@prefix`/`@base` REQUIRE a trailing `.`, SPARQL `PREFIX`/`BASE`
  *     take none (`src/parsing.rs:227-363`);
  *   - a bare `[] .` subject with no predicate-objects list is an error,
  *     but `[ …nonempty… ] .` is legal (`src/parsing.rs:397-413`);
  *   - a trailing `;` before `.` or `]` is allowed (`src/parsing.rs:453-462`);
  *   - a plain string literal defaults to `xsd:string`
  *     (`src/parsing.rs:749-758`).
  *
  * Errors are thrown as [[TurtleError]] with the offending span; the public
  * entry points catch them into `Either` (see [[Turtle]]).
  */
final class Parser(lexer: Lexer) {

  private def next(): Located[Token] = lexer.next()
  private def peek(): Located[Token] = lexer.peek()
  private def lastSpan: Span = lexer.last

  private def errUnexpected(t: Located[Token]): Nothing =
    if (t == null) throw TurtleError("unexpected end of file", lexer.eofSpan)
    else throw TurtleError(s"unexpected token ${Token.describe(t.value)}", t.span)

  /** document ::= statement* — reference `src/parsing.rs:199-225`. */
  def parseDocument(): Located[Document] = {
    val first = next()
    if (first == null) return Located(Document(Vector.empty), lexer.eofSpan)
    var span = first.span
    val statements = Vector.newBuilder[Located[Statement]]
    statements += parseStatement(first)
    var t = next()
    while (t != null) {
      statements += parseStatement(t)
      t = next()
    }
    span = span.union(lastSpan)
    Located(Document(statements.result()), span)
  }

  /** statement ::= directive | triples `.` — reference `src/parsing.rs:365-384`. */
  private def parseStatement(t: Located[Token]): Located[Statement] = t.value match {
    case Token.Kw(Keyword.Prefix | Keyword.Base | Keyword.SparqlPrefix | Keyword.SparqlBase) =>
      val d = parseDirective(t)
      d.map(Statement.Dir.apply)
    case _ =>
      val tr = parseTriples(t)
      tr.map(Statement.Tri.apply)
  }

  /** directive — reference `src/parsing.rs:227-363`. */
  private def parseDirective(t: Located[Token]): Located[Directive] = {
    var span = t.span
    t.value match {
      case Token.Kw(Keyword.Prefix) =>
        val (name, nameSpan) = expectEmptyPname()
        val iri = expectIriRef()
        val dot = next()
        dot match {
          case Located(Token.Period, dotSpan) =>
            span = span.union(dotSpan)
            Located(Directive.Prefix(Located(name, nameSpan), iri), span)
          case other => errUnexpected(other)
        }
      case Token.Kw(Keyword.Base) =>
        val iri = expectIriRef()
        next() match {
          case Located(Token.Period, dotSpan) =>
            span = span.union(dotSpan)
            Located(Directive.Base(iri), span)
          case other => errUnexpected(other)
        }
      case Token.Kw(Keyword.SparqlPrefix) =>
        val (name, nameSpan) = expectEmptyPname()
        val iri = expectIriRef()
        span = span.union(iri.span)
        Located(Directive.SparqlPrefix(Located(name, nameSpan), iri), span)
      case Token.Kw(Keyword.SparqlBase) =>
        val iri = expectIriRef()
        span = span.union(iri.span)
        Located(Directive.SparqlBase(iri), span)
      case _ => errUnexpected(t)
    }
  }

  /** The prefix name of a directive must be a PNAME_NS with an empty local
    * part — reference `src/parsing.rs:239,264-275`.
    */
  private def expectEmptyPname(): (String, Span) = next() match {
    case t @ Located(Token.CompactIri(ns, nsSpan, suffix, _), _) =>
      if (suffix.isEmpty) (ns, nsSpan) else errUnexpected(t)
    case other => errUnexpected(other)
  }

  private def expectIriRef(): Located[String] = next() match {
    case Located(Token.IriRef(v), span) => Located(v, span)
    case other                          => errUnexpected(other)
  }

  /** triples ::= subject predicateObjectList `.` — reference `src/parsing.rs:386-435`. */
  private def parseTriples(t: Located[Token]): Located[Triples] = {
    var span = t.span
    val subject = parseSubject(t)

    val poList: Located[Vector[Located[PredicateObjects]]] = peek() match {
      case Located(Token.Period, pSpan) =>
        // `[ …nonempty… ] .` may omit the po-list; bare `[] .` is an error
        val ok = subject.value match {
          case Subject.SBlank(BlankNode.Anonymous(l)) => l.value.nonEmpty
          case _                                      => false
        }
        if (!ok) throw TurtleError("unexpected token dot `.`", pSpan)
        Located(Vector.empty, lastSpan.next)
      case _ =>
        parsePredicateObjectsListWith()
    }

    span = span.union(lastSpan)

    next() match {
      case Located(Token.Period, _) => ()
      case other                    => errUnexpected(other)
    }

    Located(Triples(subject, poList), span)
  }

  /** po (`;` po?)* — reference `src/parsing.rs:437-479`. */
  private def parsePredicateObjectsList(
      t: Located[Token]): Located[Vector[Located[PredicateObjects]]] = {
    val span = t.span
    val result = Vector.newBuilder[Located[PredicateObjects]]
    result += parsePredicateObjects(t)
    var break = false
    while (!break) {
      peek() match {
        case Located(Token.Semicolon, _) =>
          next()
          peek() match {
            case Located(Token.Period | Token.EndBracket, _) => break = true
            case _ => result += parsePredicateObjectsWith()
          }
        case Located(Token.Period | Token.EndBracket, _) => break = true
        case _ => errUnexpected(next())
      }
    }
    Located(result.result(), span)
  }

  private def parsePredicateObjectsListWith(): Located[Vector[Located[PredicateObjects]]] =
    next() match {
      case null => errUnexpected(null)
      case t    => parsePredicateObjectsList(t)
    }

  /** po ::= verb objectList — reference `src/parsing.rs:481-495`. */
  private def parsePredicateObjects(t: Located[Token]): Located[PredicateObjects] = {
    var span = t.span
    val verb = parseVerb(t)
    val objects = parseObjectsWith()
    span = span.union(lastSpan)
    Located(PredicateObjects(verb, objects), span)
  }

  private def parsePredicateObjectsWith(): Located[PredicateObjects] = next() match {
    case null => errUnexpected(null)
    case t    => parsePredicateObjects(t)
  }

  /** objectList ::= object (`,` object)* — reference `src/parsing.rs:497-533`. */
  private def parseObjects(t: Located[Token]): Located[Vector[Located[Obj]]] = {
    val span = t.span
    val result = Vector.newBuilder[Located[Obj]]
    result += parseObject(t)
    var break = false
    while (!break) {
      peek() match {
        case Located(Token.Comma, _) =>
          next()
          result += parseObjectWith()
        case Located(Token.Period | Token.Semicolon | Token.EndBracket, _) => break = true
        case _ => errUnexpected(next())
      }
    }
    Located(result.result(), span)
  }

  private def parseObjectsWith(): Located[Vector[Located[Obj]]] = next() match {
    case null => errUnexpected(null)
    case t    => parseObjects(t)
  }

  /** subject — reference `src/parsing.rs:550-607`. */
  private def parseSubject(t: Located[Token]): Located[Subject] = t.value match {
    case Token.IriRef(v) => Located(Subject.SIri(Iri.Ref(v)), t.span)
    case Token.CompactIri(p, pSpan, s, sSpan) =>
      Located(Subject.SIri(Iri.Compact(Located(p, pSpan), Located(s, sSpan))), t.span)
    case Token.BlankLabel(l) => Located(Subject.SBlank(BlankNode.Label(l)), t.span)
    case Token.BeginBracket =>
      val (poList, span) = parseAnonymous(t.span)
      Located(Subject.SBlank(BlankNode.Anonymous(poList)), span)
    case Token.BeginParen =>
      val coll = parseCollection(t)
      coll.map(Subject.SColl.apply)
    case _ => errUnexpected(t)
  }

  /** `[ … ]` anonymous blank node body shared by subject/object positions —
    * reference `src/parsing.rs:572-596,666-690`.
    */
  /** Nesting guard: collections / anonymous bnode lists recurse one JVM
    * frame chain per level (here AND in the Builder's depth-first
    * emission), so a crafted document of 100k `(`s would blow the stack —
    * a StackOverflowError is an Error, escapes the `catch TurtleError`
    * boundary, and would kill the Spark task instead of landing in the
    * rejects table. Bounding depth turns the pathological document into a
    * normal reject row. 512 levels is far beyond any real document and
    * well within default executor stacks.
    */
  private[this] var depth = 0
  private val MaxNestingDepth = 512

  private def descend[A](span: Span)(body: => A): A = {
    depth += 1
    if (depth > MaxNestingDepth)
      throw TurtleError(s"nesting deeper than $MaxNestingDepth levels", span)
    try body finally depth -= 1
  }

  private def parseAnonymous(
      startSpan: Span): (Located[Vector[Located[PredicateObjects]]], Span) = descend(startSpan) {
    val poList = peek() match {
      case Located(Token.EndBracket, _) => Located(Vector.empty[Located[PredicateObjects]], lastSpan.next)
      case _                            => parsePredicateObjectsListWith()
    }
    next() match {
      case Located(Token.EndBracket, _) => ()
      case other                        => errUnexpected(other)
    }
    (poList, startSpan.union(lastSpan))
  }

  /** collection ::= `(` object* `)` — reference `src/parsing.rs:609-649`. */
  private def parseCollection(t: Located[Token]): Located[Collection] = descend(t.span) {
    var span = t.span
    t.value match {
      case Token.BeginParen =>
        val objects = Vector.newBuilder[Located[Obj]]
        var break = false
        while (!break) {
          next() match {
            case Located(Token.EndParen, endSpan) =>
              span = span.union(endSpan)
              break = true
            case null  => errUnexpected(null)
            case token => objects += parseObject(token)
          }
        }
        Located(Collection(objects.result()), span)
      case _ => errUnexpected(t)
    }
  }

  /** object — reference `src/parsing.rs:651-708`; literal is the fall-through. */
  private def parseObject(t: Located[Token]): Located[Obj] = t.value match {
    case Token.IriRef(v) => Located(Obj.OIri(Iri.Ref(v)), t.span)
    case Token.CompactIri(p, pSpan, s, sSpan) =>
      Located(Obj.OIri(Iri.Compact(Located(p, pSpan), Located(s, sSpan))), t.span)
    case Token.BlankLabel(l) => Located(Obj.OBlank(BlankNode.Label(l)), t.span)
    case Token.BeginBracket =>
      val (poList, span) = parseAnonymous(t.span)
      Located(Obj.OBlank(BlankNode.Anonymous(poList)), span)
    case Token.BeginParen =>
      val coll = parseCollection(t)
      coll.map(Obj.OColl.apply)
    case _ =>
      val lit = parseLiteral(t)
      lit.map(Obj.OLit.apply)
  }

  private def parseObjectWith(): Located[Obj] = next() match {
    case null => errUnexpected(null)
    case t    => parseObject(t)
  }

  /** literal — reference `src/parsing.rs:712-794`. */
  private def parseLiteral(t: Located[Token]): Located[Literal] = t.value match {
    case Token.StringLit(s) => parseRdfLiteral(s, t.span)
    case Token.Numeric(lex, kind) => Located(Literal.Numeric(lex, kind), t.span)
    case Token.Kw(Keyword.True)  => Located(Literal.Bool(true), t.span)
    case Token.Kw(Keyword.False) => Located(Literal.Bool(false), t.span)
    case _ => errUnexpected(t)
  }

  /** RDF literal with optional `@lang` / `^^datatype`; default `xsd:string`
    * — reference `src/parsing.rs:700-794`.
    */
  private def parseRdfLiteral(s: String, sSpan: Span): Located[Literal] = peek() match {
    case Located(Token.LangTag(_), tagSpan) =>
      val tag = next() match {
        case Located(Token.LangTag(tg), _) => tg
        case _ => sys.error("expected lang tag")
      }
      Located(
        Literal.Rdf(Located(s, sSpan), RdfLiteralType.Lang(Located(tag, tagSpan))),
        sSpan.union(tagSpan))
    case Located(Token.Carets, _) =>
      next()
      val iri = parseIriWith()
      Located(Literal.Rdf(Located(s, sSpan), RdfLiteralType.Typed(iri)), sSpan.union(lastSpan))
    case _ =>
      Located(
        Literal.Rdf(Located(s, sSpan), RdfLiteralType.Typed(Located(Iri.Ref(Vocab.XsdString), sSpan))),
        sSpan)
  }

  /** verb ::= `a` | iri — reference `src/parsing.rs:796-813`. */
  private def parseVerb(t: Located[Token]): Located[Verb] = t.value match {
    case Token.Kw(Keyword.A) => Located(Verb.A, t.span)
    case _ =>
      val iri = parseIri(t)
      iri.map(Verb.Predicate.apply)
  }

  /** iri ::= IRIREF | PNAME — reference `src/parsing.rs:815-839`. */
  private def parseIri(t: Located[Token]): Located[Iri] = t.value match {
    case Token.IriRef(v) => Located(Iri.Ref(v), t.span)
    case Token.CompactIri(p, pSpan, s, sSpan) =>
      Located(Iri.Compact(Located(p, pSpan), Located(s, sSpan)), t.span)
    case _ => errUnexpected(t)
  }

  private def parseIriWith(): Located[Iri] = next() match {
    case null => errUnexpected(null)
    case t    => parseIri(t)
  }
}
