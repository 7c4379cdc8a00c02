package graft.turtle

import Ast._
import scala.collection.mutable

/** Fresh blank-node id generator. The default yields `_:0, _:1, …` in
  * allocation order, matching `rdf_types::generator::Blank::new()` as used
  * by the reference test harness (`tests/positive.rs:17`). Allocation order
  * is OBSERVABLE (fixtures p15/p16/p18/p25) — collections allocate their
  * cons cells in REVERSE element order (`src/build.rs:419`).
  */
trait BlankGenerator {
  def next(): String // full label including "_:"
}

object BlankGenerator {
  /** `_:0, _:1, …` — fixture-parity mode. */
  def numeric(): BlankGenerator = new BlankGenerator {
    private[this] var n = 0L
    def next(): String = { val l = "_:" + n; n += 1; l }
  }

  /** Document-scoped generator for the global graph: `_:d{docTag}-{n}`.
    * Prevents cross-document collisions when triples from millions of pages
    * land in one table (SURVEY.md §2.4 B7/B8).
    */
  def scoped(docTag: String): BlankGenerator = new BlankGenerator {
    private[this] var n = 0L
    def next(): String = { val l = "_:d" + docTag + "-" + n; n += 1; l }
  }
}

/** AST → ground triples, mirroring the reference build pass
  * (`src/build.rs`): per-document-sequential directive state, RFC 3986
  * resolution against the current base, plain-concat compact-IRI expansion
  * (`src/build.rs:147-148` — NO separator, fixture p12), depth-first object
  * emission, and the extra `rdf:type rdf:List` triple per cons cell
  * (`src/build.rs:423-435` — a reference deviation from the W3C list
  * encoding, replicated).
  *
  * Optionally rewrites document blank-node labels through `labelScope` for
  * the global-graph mode (identity for fixture parity).
  */
final class Builder(
    baseIri: Option[String],
    generator: BlankGenerator,
    labelScope: String => String = identity) {

  private[this] var base: Option[String] = baseIri
  private[this] var baseParsed: IriResolver.Components =
    baseIri.map(IriResolver.parse).orNull
  private[this] val prefixes = mutable.HashMap.empty[String, String]
  private[this] val triples = mutable.ArrayBuffer.empty[Triple]
  // hot-path memos: compact IRIs and relative refs repeat heavily within a
  // document (every `foaf:name` line re-expands the same pair) — skip the
  // re-validation/re-resolution on repeats. Keyed on the resolved prefix
  // IRI (not the prefix name), so redefinition can't serve stale entries;
  // the ref memo is cleared whenever @base changes.
  private[this] val compactMemo = mutable.HashMap.empty[(String, String), String]
  private[this] val refMemo = mutable.HashMap.empty[String, String]

  private def setBase(b: String): Unit = {
    base = Some(b)
    baseParsed = IriResolver.parse(b)
    refMemo.clear()
  }

  /** Resolve an IRI reference against the current base —
    * reference `src/build.rs:111-132`. NB the asymmetry: with a base, even
    * absolute references go through full RFC resolution (dot-segment
    * removal); without one, absolute references are used verbatim.
    */
  private def resolveIriRef(iriRef: String, span: Span): String =
    if (base.isDefined) {
      refMemo.getOrElseUpdate(iriRef, IriResolver.resolveAgainst(iriRef, baseParsed))
    } else {
      // memoized like the base path: every production call site parses with
      // no base, and vocabulary IRIs repeat — pay the appendix-B component
      // parse once per DISTINCT reference, not per occurrence
      refMemo.getOrElseUpdate(iriRef,
        if (IriResolver.isAbsolute(iriRef)) iriRef
        else throw TurtleError(s"cannot resolve relative IRI <$iriRef>: no base IRI", span))
    }

  /** Expand `prefix:suffix` by string concatenation then re-validate —
    * reference `src/build.rs:134-166`.
    */
  private def resolveCompact(prefix: Located[String], suffix: Located[String], span: Span): String =
    prefixes.get(prefix.value) match {
      case Some(iri) =>
        compactMemo.getOrElseUpdate((iri, suffix.value), {
          val expanded = iri + suffix.value
          IriResolver.validateIri(expanded) match {
            case None => expanded
            case Some(_) =>
              throw TurtleError(
                s"invalid compact IRI suffix in `${prefix.value}:${suffix.value}`", span)
          }
        })
      case None =>
        throw TurtleError(s"unknown IRI prefix `${prefix.value}`", prefix.span)
    }

  private def buildIri(iri: Iri, span: Span): String = iri match {
    case Iri.Ref(v)             => resolveIriRef(v, span)
    case Iri.Compact(pfx, sfx)  => resolveCompact(pfx, sfx, span)
  }

  private def buildBlank(node: BlankNode, meta: Span): Term = node match {
    case BlankNode.Label(l) => Term.TBlank(labelScope(l))
    case BlankNode.Anonymous(poList) =>
      val b = Term.TBlank(generator.next())
      poList.value.foreach(po => buildPredicateObjects(po.value, meta, b))
      b
  }

  private def buildSubject(s: Located[Subject]): Term = s.value match {
    case Subject.SIri(iri)    => Term.TIri(buildIri(iri, s.span))
    case Subject.SBlank(node) => buildBlank(node, s.span)
    case Subject.SColl(coll)  => buildCollection(coll, s.span)
  }

  /** Collection → cons list, iterating elements in REVERSE and emitting
    * `rdf:type rdf:List`, `rdf:rest`, `rdf:first` per cell in that order —
    * reference `src/build.rs:402-463`. Empty collection ⇒ `rdf:nil`.
    */
  private def buildCollection(coll: Collection, meta: Span): Term = {
    var head: Term = Term.TIri(Vocab.RdfNil)
    coll.objects.reverseIterator.foreach { o =>
      val item = buildObject(o)
      val node = Term.TBlank(generator.next())
      triples += Triple(node, Vocab.RdfType, Term.TIri(Vocab.RdfList), meta)
      triples += Triple(node, Vocab.RdfRest, head, meta)
      triples += Triple(node, Vocab.RdfFirst, item, meta)
      head = node
    }
    head
  }

  private def buildObject(o: Located[Obj]): Term = o.value match {
    case Obj.OIri(iri)    => Term.TIri(buildIri(iri, o.span))
    case Obj.OBlank(node) => buildBlank(node, o.span)
    case Obj.OColl(coll)  => buildCollection(coll, o.span)
    case Obj.OLit(lit)    => buildLiteral(lit, o.span)
  }

  /** Literal typing — booleans `"true"^^xsd:boolean` (`src/build.rs:533-555`),
    * numerics typed by DFA class with the lexical form VERBATIM
    * (`src/build.rs:557-580`), RDF literals resolving (possibly compact)
    * datatype IRIs (`src/build.rs:582-622`).
    */
  private def buildLiteral(lit: Literal, span: Span): Term = lit match {
    case Literal.Bool(b) =>
      Term.TLit(if (b) "true" else "false", LitType.Dt(Vocab.XsdBoolean))
    case Literal.Numeric(lex, kind) =>
      val dt = kind match {
        case NumKind.Integer => Vocab.XsdInteger
        case NumKind.Decimal => Vocab.XsdDecimal
        case NumKind.Double  => Vocab.XsdDouble
      }
      Term.TLit(lex, LitType.Dt(dt))
    case Literal.Rdf(lex, tpe) =>
      tpe match {
        case RdfLiteralType.Lang(tag) => Term.TLit(lex.value, LitType.Lang(tag.value))
        case RdfLiteralType.Typed(iri) =>
          Term.TLit(lex.value, LitType.Dt(buildIri(iri.value, iri.span)))
      }
    case _ => throw TurtleError("unreachable literal", span)
  }

  private def buildVerb(v: Located[Verb]): String = v.value match {
    case Verb.A              => Vocab.RdfType
    case Verb.Predicate(iri) => buildIri(iri, v.span)
  }

  /** One `(verb, objects)` group: each object is built (emitting any nested
    * triples) BEFORE its parent triple is pushed — reference
    * `src/build.rs:260-287`.
    */
  private def buildPredicateObjects(po: PredicateObjects, meta: Span, subject: Term): Unit = {
    val predicate = buildVerb(po.verb)
    po.objects.value.foreach { o =>
      val obj = buildObject(o)
      triples += Triple(subject, predicate, obj, meta)
    }
  }

  /** Fold statements in order; directives mutate the context —
    * reference `src/build.rs:198-234`.
    */
  def build(doc: Document): Vector[Triple] = {
    doc.statements.foreach {
      case Located(Statement.Dir(d), dirSpan) =>
        d match {
          case Directive.Base(iri) =>
            setBase(resolveIriRef(iri.value, iri.span))
          case Directive.SparqlBase(iri) =>
            setBase(resolveIriRef(iri.value, iri.span))
          case Directive.Prefix(name, iri) =>
            prefixes(name.value) = resolveIriRef(iri.value, iri.span)
          case Directive.SparqlPrefix(name, iri) =>
            prefixes(name.value) = resolveIriRef(iri.value, iri.span)
        }
        val _ = dirSpan
      case Located(Statement.Tri(t), meta) =>
        val subject = buildSubject(t.subject)
        t.predicateObjectsList.value.foreach(po => buildPredicateObjects(po.value, meta, subject))
    }
    triples.toVector
  }
}

/** Public facade: text → AST → triples. */
object Turtle {

  /** Parse a Turtle document. */
  def parse(text: String): Either[TurtleError, Located[Document]] =
    try Right(new Parser(new Lexer(text)).parseDocument())
    catch { case e: TurtleError => Left(e) }

  /** Parse + build with the fixture-parity `_:0, _:1, …` generator. */
  def parseToTriples(
      text: String,
      baseIri: Option[String] = None): Either[TurtleError, Vector[Triple]] =
    try {
      val doc = new Parser(new Lexer(text)).parseDocument()
      Right(new Builder(baseIri, BlankGenerator.numeric()).build(doc.value))
    } catch { case e: TurtleError => Left(e) }

  /** Parse + build with document-scoped blank labels for the global graph. */
  def parseToTriplesScoped(
      text: String,
      docTag: String,
      baseIri: Option[String] = None): Either[TurtleError, Vector[Triple]] =
    try {
      val doc = new Parser(new Lexer(text)).parseDocument()
      // DISJOINT namespaces: document labels rewrite under "l", generated
      // anonymous nodes under "-" (BlankGenerator.scoped) — a shared "-"
      // would merge a document's `_:0` with the first anonymous node
      // (both "_:d<tag>-0"), silently conflating two distinct nodes
      val scope = (l: String) => "_:d" + docTag + "l" + l.substring(2)
      Right(new Builder(baseIri, BlankGenerator.scoped(docTag), scope).build(doc.value))
    } catch { case e: TurtleError => Left(e) }
}
