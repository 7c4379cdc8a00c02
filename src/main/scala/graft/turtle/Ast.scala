package graft.turtle

/** Byte-offset source span (start inclusive, end exclusive).
  *
  * Mirrors the located-AST design of the reference (locspan `Span`,
  * reference `src/ast.rs:5`, `src/lexing.rs:214-231`): every node carries
  * its source extent, which becomes the per-triple lineage column in the
  * Spark graph table.
  */
final case class Span(start: Int, end: Int) {
  def union(other: Span): Span = Span(math.min(start, other.start), math.max(end, other.end))
  /** Empty span directly after this one (locspan `Span::next`). */
  def next: Span = Span(end, end)
  override def toString: String = s"$start..$end"
}

object Span {
  val zero: Span = Span(0, 0)
}

/** A value with its source span (reference `locspan::Meta<T, Span>`). */
final case class Located[+A](value: A, span: Span) {
  def map[B](f: A => B): Located[B] = Located(f(value), span)
}

/** Turtle AST, mirroring the shape of the reference's `src/ast.rs`.
  *
  * These are transient per-document values produced inside a Spark task —
  * they are never Spark types themselves (SURVEY.md §1.2).
  */
object Ast {

  /** An IRI or compact (prefixed) IRI — reference `src/ast.rs:13-16`. */
  sealed trait Iri
  object Iri {
    /** `<…>` IRI reference, escape-decoded and syntax-validated. */
    final case class Ref(value: String) extends Iri
    /** `prefix:suffix` compact IRI. */
    final case class Compact(prefix: Located[String], suffix: Located[String]) extends Iri
  }

  /** A whole Turtle document — reference `src/ast.rs:20-22`. */
  final case class Document(statements: Vector[Located[Statement]])

  /** Directive or triples declaration — reference `src/ast.rs:44-50`. */
  sealed trait Statement
  object Statement {
    final case class Dir(directive: Directive) extends Statement
    final case class Tri(triples: Triples) extends Statement
  }

  /** Four directive forms — reference `src/ast.rs:62-74`.
    * `@`-forms require a trailing `.`; SPARQL forms take none.
    */
  sealed trait Directive
  object Directive {
    final case class Prefix(name: Located[String], iri: Located[String]) extends Directive
    final case class Base(iri: Located[String]) extends Directive
    final case class SparqlPrefix(name: Located[String], iri: Located[String]) extends Directive
    final case class SparqlBase(iri: Located[String]) extends Directive
  }

  /** One subject with its predicate-objects groups — reference `src/ast.rs:53-56`. */
  final case class Triples(
      subject: Located[Subject],
      predicateObjectsList: Located[Vector[Located[PredicateObjects]]])

  final case class PredicateObjects(verb: Located[Verb], objects: Located[Vector[Located[Obj]]])

  /** `a` keyword or a predicate IRI — reference `src/ast.rs:78-84`. */
  sealed trait Verb
  object Verb {
    case object A extends Verb
    final case class Predicate(iri: Iri) extends Verb
  }

  /** Subject — reference `src/ast.rs:88-97`. */
  sealed trait Subject
  object Subject {
    final case class SIri(iri: Iri) extends Subject
    final case class SBlank(node: BlankNode) extends Subject
    final case class SColl(coll: Collection) extends Subject
  }

  /** `_:label` or `[ p o ; … ]` — reference `src/ast.rs:104-107`. */
  sealed trait BlankNode
  object BlankNode {
    /** Label INCLUDES the `_:` prefix, as in the reference (`src/lexing.rs:644-646`). */
    final case class Label(label: String) extends BlankNode
    final case class Anonymous(propertyList: Located[Vector[Located[PredicateObjects]]])
        extends BlankNode
  }

  /** `( o1 o2 … )` RDF collection — reference `src/ast.rs:101`. */
  final case class Collection(objects: Vector[Located[Obj]])

  /** Object — reference `src/ast.rs:113-125`. */
  sealed trait Obj
  object Obj {
    final case class OIri(iri: Iri) extends Obj
    final case class OBlank(node: BlankNode) extends Obj
    final case class OColl(coll: Collection) extends Obj
    final case class OLit(lit: Literal) extends Obj
  }

  /** Literal — reference `src/ast.rs:139-156`. Numeric lexical forms are
    * preserved VERBATIM (never float-parsed), per `src/build.rs:557-580`.
    */
  sealed trait Literal
  object Literal {
    final case class Rdf(lex: Located[String], tpe: RdfLiteralType) extends Literal
    final case class Numeric(lex: String, kind: NumKind) extends Literal
    final case class Bool(value: Boolean) extends Literal
  }

  sealed trait RdfLiteralType
  object RdfLiteralType {
    final case class Lang(tag: Located[String]) extends RdfLiteralType
    final case class Typed(iri: Located[Iri]) extends RdfLiteralType
  }

  /** Numeric class decided by the lexer DFA's final state
    * (reference `src/lexing.rs:630-635`).
    */
  sealed trait NumKind
  object NumKind {
    case object Integer extends NumKind
    case object Decimal extends NumKind
    case object Double extends NumKind
  }
}

/** Well-known IRIs — reference `src/build.rs:11-19`. */
object Vocab {
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val RdfList = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"
  val RdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
  val RdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  val RdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
}

/** Ground RDF term (build output), the row value of the Spark triple table. */
sealed trait Term {
  /** Canonical N-Triples rendering (used for ordering and serialization). */
  def render: String = NTriples.renderTerm(this)
}
object Term {
  final case class TIri(iri: String) extends Term
  /** Full label including the `_:` prefix. */
  final case class TBlank(label: String) extends Term
  final case class TLit(lex: String, tpe: LitType) extends Term
}

sealed trait LitType
object LitType {
  final case class Lang(tag: String) extends LitType
  final case class Dt(iri: String) extends LitType
}

/** A ground triple with its source span (lineage). */
final case class Triple(subj: Term, pred: String, obj: Term, span: Span) {
  /** Span-stripped canonical rendering `s p o .` */
  def render: String = s"${subj.render} <$pred> ${obj.render} ."
}

/** Error from any stage of the Turtle front-end, with its source span.
  * In the Spark pipeline these become rows of the `rejects` table rather
  * than task failures (SURVEY.md §2.1 S5).
  */
final case class TurtleError(message: String, span: Span)
    extends Exception(s"$message at $span")
