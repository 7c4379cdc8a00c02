package graft.sparql

/** SPARQL 1.1 text front-end — AST + diagnostics.
  *
  * The reference's whole identity is grammar → algebra for Turtle
  * (`/root/reference/src/parsing.rs:38-69`: recursive descent over
  * `src/lexing.rs` tokens, every error carrying its source span); this
  * package applies the same discipline to the SPARQL 1.1 grammar so the
  * kg18–kg69 evaluation algebra ([[graft.ops.GraphOps]]) is reachable the
  * way users actually query — as TEXT. Parsing is pure Scala (zero Spark,
  * like `graft.turtle`); lowering lives in [[SparqlExec]].
  *
  * Supported subset (each construct lowers onto an existing, oracle-checked
  * algebra op): prologue (PREFIX/BASE), SELECT [DISTINCT] with variable and
  * aggregate projections, ASK, CONSTRUCT; groups of triple patterns with
  * `;`/`,` sugar and property paths (`^ / | + *` and negated sets `!(…)`),
  * FILTER with the kg58 term calculus, OPTIONAL, MINUS, FILTER [NOT] EXISTS,
  * UNION, VALUES, scalar sub-SELECT, BIND, `GRAPH ?g`/`GRAPH <iri>` groups
  * (lowered onto the kg56 quad algebra when a quad table is supplied);
  * GROUP BY + COUNT/SUM/MIN/MAX/GROUP_CONCAT, HAVING, ORDER BY,
  * LIMIT/OFFSET. Deliberate exclusions (rejected with a spanned
  * diagnostic, never silently misread): variable predicates, constant
  * subjects (bind them via VALUES), EXISTS-as-expression, federated
  * SERVICE.
  */
object SparqlAst {

  /** A rejected query: message + source span (the reference's
    * diagnostic-sink row, `examples/simple.rs:27-37`).
    */
  final case class Diag(message: String, start: Int, end: Int)
    extends Exception(s"$message at $start..$end")

  // ------------------------------------------------------------- terms
  sealed trait Term
  object Term {
    /** Variable `?x` / `$x` (name without the sigil). */
    final case class V(name: String) extends Term
    /** IRI, absolute, no brackets. */
    final case class I(iri: String) extends Term
    /** Literal in RENDERED N-Triples form (the engine's term syntax) —
      * the parser renders query literals through the same escape table
      * the corpus terms carry, so equality is string equality.
      */
    final case class L(rendered: String) extends Term
  }

  // ------------------------------------------------------------- paths
  sealed trait Path
  object Path {
    final case class Pred(iri: String) extends Path
    final case class Inv(p: Path) extends Path
    final case class Seqp(a: Path, b: Path) extends Path
    final case class Alt(a: Path, b: Path) extends Path
    final case class Plus(p: Path) extends Path
    final case class Star(p: Path) extends Path
    final case class Neg(iris: Seq[String]) extends Path
    /** True iff the path is a single forward predicate (a plain triple
      * pattern, lowered through ChainPattern instead of the path frame).
      */
    def simple(p: Path): Option[String] =
      p match { case Pred(i) => Some(i); case _ => None }
  }

  final case class TriplePat(s: Term, p: Path, o: Term, start: Int, end: Int)

  // ------------------------------------------------- FILTER expressions
  sealed trait Expr
  object Expr {
    final case class EVar(name: String) extends Expr
    /** Rendered-term literal (string/typed literal/IRI constant). */
    final case class ETerm(rendered: String) extends Expr
    /** Bare numeric literal — comparisons against it coerce the other
      * side's lexical form to a number (the kg18 regexp-extract rule).
      */
    final case class ENum(value: BigDecimal) extends Expr
    final case class EStr(e: Expr) extends Expr
    final case class ELang(e: Expr) extends Expr
    final case class EDatatype(e: Expr) extends Expr
    final case class EIsIri(e: Expr) extends Expr
    final case class EIsLiteral(e: Expr) extends Expr
    final case class EIsBlank(e: Expr) extends Expr
    final case class EStrStarts(e: Expr, prefix: Expr) extends Expr
    /** BOUND(?v) — true where the (possibly OPTIONAL-null) column is set. */
    final case class EBound(v: String) extends Expr
    /** REGEX(str, pattern[, flags]) — Java-regex semantics (the engine's
      * rlike contract); the only supported flag is `i`.
      */
    final case class ERegex(e: Expr, pattern: String, caseInsensitive: Boolean) extends Expr
    /** `?x IN (t1, …)` / `?x NOT IN (t1, …)` over constant terms. */
    final case class EIn(e: Expr, terms: Seq[String], negated: Boolean) extends Expr
    final case class ECmp(op: String, l: Expr, r: Expr) extends Expr
    final case class EAnd(a: Expr, b: Expr) extends Expr
    final case class EOr(a: Expr, b: Expr) extends Expr
    final case class ENot(e: Expr) extends Expr
  }

  // ------------------------------------------------------ group pattern
  sealed trait GroupElem
  object GroupElem {
    final case class Triples(pats: Seq[TriplePat]) extends GroupElem
    final case class Filter(e: Expr) extends GroupElem
    final case class Optional(g: Group) extends GroupElem
    final case class Minus(g: Group) extends GroupElem
    final case class NotExists(g: Group) extends GroupElem
    final case class Exists(g: Group) extends GroupElem
    final case class Union(alts: Seq[Group]) extends GroupElem
    /** Inline bindings: every row binds every variable (no UNDEF). */
    final case class Values(vars: Seq[String], rows: Seq[Seq[String]]) extends GroupElem
    final case class SubSelect(q: Select) extends GroupElem
    /** `BIND(expr AS ?v)` — extends each solution with the expression's
      * VALUE (lexical string / boolean-as-0-1 / term, by expression type).
      */
    final case class Bind(e: Expr, v: String, start: Int, end: Int) extends GroupElem
    /** `GRAPH ?g { … }` / `GRAPH <iri> { … }` — exactly one of gVar/gIri. */
    final case class GraphGroup(gVar: Option[String], gIri: Option[String],
        g: Group, start: Int, end: Int) extends GroupElem
  }
  final case class Group(elems: Seq[GroupElem])

  // ------------------------------------------------------------ queries
  /** One SELECT projection: a bare variable or `(AGG(…) AS ?alias)`. */
  sealed trait Proj
  object Proj {
    final case class PV(name: String) extends Proj
    final case class PAgg(fn: String, arg: Option[String], alias: String,
        separator: Option[String]) extends Proj
  }

  final case class OrderKey(variable: String, ascending: Boolean)

  // ------------------------------------------------------------ updates
  /** SPARQL 1.1 Update requests (the WRITE half of the text surface),
    * lowered onto the tombstone delta path — never a table rewrite.
    */
  sealed trait UpdateOp
  object UpdateOp {
    /** `INSERT DATA { … }` / `DELETE DATA { … }`: ground triples, rendered
      * `(graph, subj, pred, obj)` — graph = None outside `GRAPH <iri>`
      * blocks (the default-graph triple store).
      */
    final case class Data(insert: Boolean,
        triples: Seq[(Option[String], String, String, String)]) extends UpdateOp
    /** `[WITH <g>] DELETE { … } INSERT { … } WHERE { … }` (either template
      * block may be absent, not both; `DELETE WHERE { … }` parses with
      * delete = the pattern block itself).
      */
    final case class Modify(withGraph: Option[String],
        delete: Seq[TriplePat], insert: Seq[TriplePat], where: Group,
        start: Int, end: Int) extends UpdateOp
  }

  sealed trait Query
  final case class Select(
      distinct: Boolean,
      proj: Seq[Proj], // empty ⇔ SELECT *
      where: Group,
      groupBy: Seq[String],
      having: Option[Expr],
      orderBy: Seq[OrderKey],
      limit: Option[Int],
      offset: Option[Int]) extends Query
  final case class Ask(where: Group) extends Query
  final case class Construct(templates: Seq[TriplePat], where: Group) extends Query
  /** `DESCRIBE <iri>… ?v… [WHERE { … }]` — outgoing-arc CBD (kg55).
    * Variables require the WHERE clause that binds them; bare IRIs
    * describe directly.
    */
  final case class Describe(vars: Seq[String], iris: Seq[String],
      where: Option[Group]) extends Query
}
