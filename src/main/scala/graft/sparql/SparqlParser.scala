package graft.sparql

import SparqlAst._
import SparqlLexer.Tok

/** SPARQL 1.1 recursive-descent parser — the reference's grammar→algebra
  * discipline (`/root/reference/src/parsing.rs:38-69`: one function per
  * production, a cursor over the token stream, spanned diagnostics) applied
  * to the SPARQL grammar. Pure Scala; produces the [[SparqlAst]] that
  * [[SparqlExec]] lowers onto the graft BGP algebra.
  *
  * Every deliberate exclusion (see [[SparqlAst]]) is a [[Diag]] with the
  * source span — a query outside the subset is REJECTED, never silently
  * misread.
  */
object SparqlParser {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  private val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  private val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  private val Aggregates = Set("COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT")
  private val Builtins1 = Map(
    "STR" -> ((e: Expr) => Expr.EStr(e)),
    "LANG" -> ((e: Expr) => Expr.ELang(e)),
    "DATATYPE" -> ((e: Expr) => Expr.EDatatype(e)),
    "ISIRI" -> ((e: Expr) => Expr.EIsIri(e)),
    "ISURI" -> ((e: Expr) => Expr.EIsIri(e)),
    "ISLITERAL" -> ((e: Expr) => Expr.EIsLiteral(e)),
    "ISBLANK" -> ((e: Expr) => Expr.EIsBlank(e)))

  def parse(q: String): Query = new P(SparqlLexer.lex(q)).parseQuery()

  /** Parse one SPARQL 1.1 Update request (INSERT DATA / DELETE DATA /
    * [WITH <g>] DELETE/INSERT WHERE / DELETE WHERE). Rejections raise
    * [[Diag]] with the source span, like [[parse]].
    */
  def parseUpdate(u: String): UpdateOp = new P(SparqlLexer.lex(u)).parseUpdateUnit()

  /** Render a lexical form + optional lang/datatype to the engine's term
    * syntax (the same table [[graft.turtle.NTriples.renderTerm]] uses, so
    * query constants are string-equal to corpus terms).
    */
  private def renderLiteral(lex: String, lang: Option[String], dt: Option[String]): String = {
    val quoted = "\"" + graft.turtle.NTriples.escapeString(lex) + "\""
    (lang, dt) match {
      case (Some(tag), _)            => quoted + "@" + tag
      case (None, Some(XsdString))   => quoted
      case (None, Some(d))           => quoted + "^^<" + d + ">"
      case (None, None)              => quoted
    }
  }

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private var base: Option[String] = None
    private val prefixes = scala.collection.mutable.Map.empty[String, String]

    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def diag(msg: String, t: Tok): Nothing = throw Diag(msg, t.start, t.end)

    private def isWord(t: Tok, w: String): Boolean = t match {
      case Tok.Word(x, _, _) => x.equalsIgnoreCase(w)
      case _                 => false
    }
    private def atWord(w: String): Boolean = isWord(peek, w)
    private def eatWord(w: String): Boolean =
      if (atWord(w)) { pos += 1; true } else false
    private def expectWord(w: String): Unit =
      if (!eatWord(w)) diag(s"expected $w", peek)
    private def atPunct(s: String): Boolean = peek match {
      case Tok.Punct(x, _, _) => x == s
      case _                  => false
    }
    private def eatPunct(s: String): Boolean =
      if (atPunct(s)) { pos += 1; true } else false
    private def expectPunct(s: String): Unit =
      if (!eatPunct(s)) diag(s"expected '$s'", peek)

    private def resolveIri(raw: String, t: Tok): String =
      if (raw.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) raw
      else base match {
        case Some(b) => graft.turtle.IriResolver.resolve(raw, b)
        case None    => diag(s"relative IRI <$raw> without BASE", t)
      }

    /** IRI: bracketed or prefixed name, resolved to absolute text. */
    private def iri(): String = peek match {
      case t @ Tok.Iri(raw, _, _)          => pos += 1; resolveIri(raw, t)
      case t @ Tok.Pname("_", local, _, _) =>
        diag(s"blank-node labels (_:$local) are not supported — blank " +
          "nodes are existential variables in SPARQL; use a ?variable", t)
      case t @ Tok.Pname(pfx, local, _, _) =>
        pos += 1
        prefixes.get(pfx) match {
          case Some(ns) => ns + local
          case None     => diag(s"undeclared prefix '$pfx:'", t)
        }
      case t => diag("expected an IRI", t)
    }

    // ---------------------------------------------------------- prologue
    private def prologue(): Unit = {
      var more = true
      while (more) {
        if (eatWord("PREFIX")) {
          val (pfx, t) = peek match {
            case p @ Tok.Pname(x, "", _, _) => pos += 1; (x, p)
            case p @ Tok.Pname(x, l, _, _)  =>
              diag(s"PREFIX declaration must end with ':' (got '$x:$l')", p)
            case p => diag("expected 'pfx:' after PREFIX", p)
          }
          peek match {
            case i @ Tok.Iri(raw, _, _) => pos += 1; prefixes(pfx) = resolveIri(raw, i)
            case p                      => diag("expected <iri> after PREFIX pfx:", p)
          }
          val _ = t
        } else if (eatWord("BASE")) {
          peek match {
            case Tok.Iri(raw, _, _) => pos += 1; base = Some(raw)
            case p                  => diag("expected <iri> after BASE", p)
          }
        } else more = false
      }
    }

    // ------------------------------------------------------------- terms
    /** A term in subject/object position. */
    private def term(): Term = peek match {
      case Tok.Var(v, _, _) => pos += 1; Term.V(v)
      case Tok.Iri(_, _, _) | Tok.Pname(_, _, _, _) => Term.I(iri())
      case Tok.Str(s, _, _) =>
        pos += 1
        peek match {
          case Tok.LangTag(tag, _, _) => pos += 1
            Term.L(renderLiteral(s, Some(tag), None))
          case Tok.Punct("^^", _, _) => pos += 1
            Term.L(renderLiteral(s, None, Some(iri())))
          case _ => Term.L(renderLiteral(s, None, None))
        }
      case Tok.Num(v, lex, _, _) => pos += 1
        val dt = if (lex.contains('.')) XsdDecimal else XsdInteger
        Term.L(renderLiteral(lex, None, Some(dt)))
      case t @ Tok.Word(w, _, _) if w.equalsIgnoreCase("true") || w.equalsIgnoreCase("false") =>
        pos += 1; val _ = t
        Term.L(renderLiteral(w.toLowerCase, None, Some(XsdBoolean)))
      case t => diag("expected a term (variable, IRI, or literal)", t)
    }

    // ------------------------------------------------------------- paths
    // Path := Seq ('|' Seq)* ; Seq := EltOrInv ('/' EltOrInv)* ;
    // EltOrInv := '^'? Elt ; Elt := Primary ('+'|'*')? ;
    // Primary := iri | 'a' | '!' (iri | '(' iri ('|' iri)* ')') | '(' Path ')'
    private def path(): Path = {
      var p = pathSeq()
      while (atPunct("|")) { pos += 1; p = Path.Alt(p, pathSeq()) }
      p
    }
    private def pathSeq(): Path = {
      var p = pathEltOrInv()
      while (atPunct("/")) { pos += 1; p = Path.Seqp(p, pathEltOrInv()) }
      p
    }
    private def pathEltOrInv(): Path =
      if (eatPunct("^")) Path.Inv(pathElt()) else pathElt()
    private def pathElt(): Path = {
      val p = pathPrimary()
      if (eatPunct("+")) Path.Plus(p)
      else if (eatPunct("*")) Path.Star(p)
      else p
    }
    private def pathPrimary(): Path = peek match {
      case Tok.Word(w, _, _) if w == "a" => pos += 1; Path.Pred(RdfType)
      case Tok.Iri(_, _, _) | Tok.Pname(_, _, _, _) => Path.Pred(iri())
      case Tok.Punct("!", _, _) =>
        pos += 1
        if (eatPunct("(")) {
          val irs = scala.collection.mutable.ArrayBuffer(negIri())
          while (eatPunct("|")) irs += negIri()
          expectPunct(")")
          Path.Neg(irs.toSeq)
        } else Path.Neg(Seq(negIri()))
      case Tok.Punct("(", _, _) =>
        pos += 1; val p = path(); expectPunct(")"); p
      case t @ Tok.Var(v, _, _) =>
        diag(s"variable predicates (?$v) are not supported — enumerate " +
          "predicates with '|' alternatives", t)
      case t => diag("expected a property path", t)
    }
    /** One forward predicate inside a negated set (`!^p` unsupported). */
    private def negIri(): String = peek match {
      case Tok.Word(w, _, _) if w == "a" => pos += 1; RdfType
      case Tok.Iri(_, _, _) | Tok.Pname(_, _, _, _) => iri()
      case t => diag("negated property sets take forward IRIs only", t)
    }

    // ----------------------------------------------------- triples block
    private def triplesSameSubject(): Seq[TriplePat] = {
      val sTok = peek
      val s = term()
      s match {
        case Term.V(_) => ()
        case _ => diag("constant subjects are not supported — bind the " +
          "subject with VALUES and use a variable", sTok)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[TriplePat]
      var more = true
      while (more) {
        val pStart = peek.start
        val p = path()
        var objs = true
        while (objs) {
          val o = term()
          out += TriplePat(s, p, o, pStart, toks(pos - 1).end)
          objs = eatPunct(",")
        }
        more = eatPunct(";") && !atPunct(".") && !atPunct("}") && !atWord("FILTER") &&
          !atWord("OPTIONAL") && !atWord("MINUS") && !atWord("VALUES") &&
          !atWord("UNION") && !atPunct("{")
      }
      out.toSeq
    }

    // ------------------------------------------------------- expressions
    private def expr(): Expr = {
      var e = exprAnd()
      while (eatPunct("||")) e = Expr.EOr(e, exprAnd())
      e
    }
    private def exprAnd(): Expr = {
      var e = exprUnary()
      while (eatPunct("&&")) e = Expr.EAnd(e, exprUnary())
      e
    }
    private def exprUnary(): Expr =
      if (eatPunct("!")) Expr.ENot(exprUnary()) else exprRel()
    private def exprRel(): Expr = {
      val l = exprPrim()
      peek match {
        case Tok.Punct(op, _, _) if Set("=", "!=", "<", "<=", ">", ">=")(op) =>
          pos += 1
          Expr.ECmp(op, l, exprPrim())
        case Tok.Word(w, _, _) if w.equalsIgnoreCase("IN") =>
          pos += 1; Expr.EIn(l, inList(), negated = false)
        case Tok.Word(w, _, _) if w.equalsIgnoreCase("NOT") =>
          pos += 1; expectWord("IN"); Expr.EIn(l, inList(), negated = true)
        case _ => l
      }
    }

    /** `( term, … )` of constant terms, rendered. */
    private def inList(): Seq[String] = {
      expectPunct("(")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var more = !atPunct(")")
      while (more) {
        val t = peek
        term() match {
          case Term.V(v)  => diag(s"IN lists take constant terms (got ?$v)", t)
          case Term.I(i)  => out += s"<$i>"
          case Term.L(r)  => out += r
        }
        more = eatPunct(",")
      }
      expectPunct(")")
      if (out.isEmpty) diag("IN needs at least one term", peek)
      out.toSeq
    }
    private def exprPrim(): Expr = peek match {
      case Tok.Var(v, _, _)     => pos += 1; Expr.EVar(v)
      case Tok.Num(v, _, _, _)  => pos += 1; Expr.ENum(v)
      case Tok.Str(_, _, _)     => Expr.ETerm(term() match { case Term.L(r) => r; case _ => "" })
      case Tok.Iri(_, _, _) | Tok.Pname(_, _, _, _) =>
        Expr.ETerm("<" + iri() + ">")
      case Tok.Punct("(", _, _) => pos += 1; val e = expr(); expectPunct(")"); e
      case t @ Tok.Word(w, _, _) =>
        val up = w.toUpperCase
        if (Builtins1.contains(up)) {
          pos += 1; expectPunct("("); val e = expr(); expectPunct(")")
          Builtins1(up)(e)
        } else if (up == "STRSTARTS") {
          pos += 1; expectPunct("("); val e = expr(); expectPunct(",")
          val p = expr(); expectPunct(")")
          Expr.EStrStarts(e, p)
        } else if (up == "BOUND") {
          pos += 1; expectPunct("(")
          val v = peek match {
            case Tok.Var(x, _, _) => pos += 1; x
            case x                => diag("BOUND takes a variable", x)
          }
          expectPunct(")")
          Expr.EBound(v)
        } else if (up == "REGEX") {
          pos += 1; expectPunct("("); val e = expr(); expectPunct(",")
          val pat = peek match {
            case Tok.Str(x, _, _) => pos += 1; x
            case x                => diag("REGEX takes a string pattern", x)
          }
          var ci = false
          if (eatPunct(",")) peek match {
            case f @ Tok.Str(x, _, _) =>
              pos += 1
              if (x == "i") ci = true
              else diag(s"unsupported REGEX flags '$x' (only 'i')", f)
            case x => diag("expected a flags string", x)
          }
          expectPunct(")")
          Expr.ERegex(e, pat, ci)
        } else if (up == "TRUE" || up == "FALSE") {
          pos += 1
          Expr.ETerm(renderLiteral(up.toLowerCase, None, Some(XsdBoolean)))
        } else if (up == "EXISTS" || up == "NOTEXISTS" || up == "BIND") {
          diag(s"$w is not supported in FILTER expressions", t)
        } else diag(s"unknown function '$w'", t)
      case t => diag("expected an expression", t)
    }

    // --------------------------------------------------- group patterns
    /** `{ … }` — the GroupGraphPattern body after the opening brace. */
    private def group(): Group = {
      expectPunct("{")
      val elems = scala.collection.mutable.ArrayBuffer.empty[GroupElem]
      var done = false
      while (!done) {
        if (eatPunct("}")) done = true
        else if (eatPunct(".")) () // statement separator
        else if (atWord("FILTER")) {
          val t = peek; pos += 1
          if (atWord("NOT")) {
            pos += 1; expectWord("EXISTS")
            elems += GroupElem.NotExists(group())
          } else if (atWord("EXISTS")) {
            pos += 1; val _ = t
            elems += GroupElem.Exists(group())
          } else {
            val needParen = atPunct("(")
            if (needParen) pos += 1
            val e = expr()
            if (needParen) expectPunct(")")
            elems += GroupElem.Filter(e)
          }
        } else if (atWord("OPTIONAL")) {
          pos += 1; elems += GroupElem.Optional(group())
        } else if (atWord("MINUS")) {
          pos += 1; elems += GroupElem.Minus(group())
        } else if (atWord("VALUES")) {
          pos += 1; elems += values()
        } else if (atWord("BIND")) {
          val start = peek.start
          pos += 1; expectPunct("(")
          val e = expr()
          expectWord("AS")
          val v = peek match {
            case Tok.Var(x, _, _) => pos += 1; x
            case t                => diag("expected ?var after AS in BIND", t)
          }
          val end = peek.end
          expectPunct(")")
          elems += GroupElem.Bind(e, v, start, end)
        } else if (atWord("GRAPH")) {
          val start = peek.start
          pos += 1
          val (gv, gi) = peek match {
            case Tok.Var(x, _, _) => pos += 1; (Some(x), None)
            case Tok.Iri(_, _, _) | Tok.Pname(_, _, _, _) => (None, Some(iri()))
            case t => diag("expected ?var or <iri> after GRAPH", t)
          }
          val inner = group()
          elems += GroupElem.GraphGroup(gv, gi, inner, start, toks(pos - 1).end)
        } else if (atWord("SERVICE")) {
          diag("federated SERVICE is not supported", peek)
        } else if (atPunct("{")) {
          // nested group: SubSelect, a plain braced group (spliced), or
          // a UNION chain
          val save = pos
          pos += 1
          if (atWord("SELECT")) {
            val q = selectQuery()
            expectPunct("}")
            elems += GroupElem.SubSelect(q)
          } else {
            pos = save
            val first = group()
            if (atWord("UNION")) {
              val alts = scala.collection.mutable.ArrayBuffer(first)
              while (eatWord("UNION")) alts += group()
              elems += GroupElem.Union(alts.toSeq)
            } else elems ++= first.elems
          }
        } else {
          elems += GroupElem.Triples(triplesSameSubject())
        }
      }
      Group(elems.toSeq)
    }

    /** `VALUES ?v { t … }` or `VALUES (?a ?b) { (t t) … }`. */
    private def values(): GroupElem.Values = {
      def cell(): String = term() match {
        case Term.V(v)  => diag(s"VALUES cells must be constants (got ?$v)", peek)
        case Term.I(i)  => "<" + i + ">"
        case Term.L(r)  => r
      }
      if (atPunct("(")) {
        pos += 1
        val vars = scala.collection.mutable.ArrayBuffer.empty[String]
        while (!eatPunct(")")) peek match {
          case Tok.Var(v, _, _) => pos += 1; vars += v
          case t                => diag("expected a variable in VALUES header", t)
        }
        if (vars.isEmpty) diag("VALUES needs at least one variable", peek)
        expectPunct("{")
        val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
        while (!eatPunct("}")) {
          expectPunct("(")
          val row = scala.collection.mutable.ArrayBuffer.empty[String]
          while (!eatPunct(")")) {
            if (atWord("UNDEF")) diag("UNDEF is not supported in VALUES", peek)
            row += cell()
          }
          if (row.length != vars.length)
            diag(s"VALUES row arity ${row.length} != header arity ${vars.length}", peek)
          rows += row.toSeq
        }
        GroupElem.Values(vars.toSeq, rows.toSeq)
      } else peek match {
        case Tok.Var(v, _, _) =>
          pos += 1
          expectPunct("{")
          val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
          while (!eatPunct("}")) {
            if (atWord("UNDEF")) diag("UNDEF is not supported in VALUES", peek)
            rows += Seq(cell())
          }
          GroupElem.Values(Seq(v), rows.toSeq)
        case t => diag("expected a variable or '(' after VALUES", t)
      }
    }

    // ------------------------------------------------------------ SELECT
    private def projection(): Seq[Proj] = {
      if (eatPunct("*")) return Nil // SELECT *
      val out = scala.collection.mutable.ArrayBuffer.empty[Proj]
      var more = true
      while (more) peek match {
        case Tok.Var(v, _, _) => pos += 1; out += Proj.PV(v)
        case Tok.Punct("(", _, _) =>
          pos += 1
          val t = peek
          val fn = t match {
            case Tok.Word(w, _, _) if Aggregates(w.toUpperCase) => pos += 1; w.toUpperCase
            case Tok.Word(w, _, _) =>
              diag(s"unsupported aggregate '$w' (COUNT/SUM/MIN/MAX/GROUP_CONCAT)", t)
            case _ => diag("expected an aggregate function", t)
          }
          expectPunct("(")
          val distinctArg = eatWord("DISTINCT")
          val arg: Option[String] =
            if (eatPunct("*")) {
              if (fn != "COUNT") diag(s"$fn(*) is not defined", t)
              None
            } else peek match {
              case Tok.Var(v, _, _) => pos += 1; Some(v)
              case x => diag("expected a variable or '*' in the aggregate", x)
            }
          var sep: Option[String] = None
          if (eatPunct(";")) {
            expectWord("SEPARATOR"); expectPunct("=")
            peek match {
              case Tok.Str(s, _, _) => pos += 1; sep = Some(s)
              case x                => diag("expected a string after SEPARATOR=", x)
            }
          }
          expectPunct(")")
          expectWord("AS")
          val alias = peek match {
            case Tok.Var(v, _, _) => pos += 1; v
            case x                => diag("expected ?alias after AS", x)
          }
          expectPunct(")")
          val fnName = if (distinctArg) fn + "_DISTINCT" else fn
          out += Proj.PAgg(fnName, arg, alias, sep)
        case _ => more = false
      }
      if (out.isEmpty) diag("SELECT needs at least one projection (or *)", peek)
      out.toSeq
    }

    /** SELECT after its keyword has been consumed-or-peeked at `pos`. */
    private def selectQuery(): Select = {
      expectWord("SELECT")
      val distinct = eatWord("DISTINCT")
      if (atWord("REDUCED")) diag("REDUCED is not supported (use DISTINCT)", peek)
      val proj = projection()
      eatWord("WHERE")
      val g = group()
      var groupBy = Seq.empty[String]
      if (eatWord("GROUP")) {
        expectWord("BY")
        val gs = scala.collection.mutable.ArrayBuffer.empty[String]
        var more = true
        while (more) peek match {
          case Tok.Var(v, _, _) => pos += 1; gs += v
          case _                => more = false
        }
        if (gs.isEmpty) diag("GROUP BY needs at least one variable", peek)
        groupBy = gs.toSeq
      }
      var having: Option[Expr] = None
      if (eatWord("HAVING")) {
        val needParen = atPunct("(")
        if (needParen) pos += 1
        having = Some(expr())
        if (needParen) expectPunct(")")
      }
      var orderBy = Seq.empty[OrderKey]
      if (eatWord("ORDER")) {
        expectWord("BY")
        val ks = scala.collection.mutable.ArrayBuffer.empty[OrderKey]
        var more = true
        while (more) peek match {
          case Tok.Var(v, _, _) => pos += 1; ks += OrderKey(v, ascending = true)
          case Tok.Word(w, _, _) if w.equalsIgnoreCase("ASC") || w.equalsIgnoreCase("DESC") =>
            pos += 1
            expectPunct("(")
            val v = peek match {
              case Tok.Var(x, _, _) => pos += 1; x
              case t                => diag("expected a variable in ASC()/DESC()", t)
            }
            expectPunct(")")
            ks += OrderKey(v, ascending = w.equalsIgnoreCase("ASC"))
          case _ => more = false
        }
        if (ks.isEmpty) diag("ORDER BY needs at least one key", peek)
        orderBy = ks.toSeq
      }
      var limit: Option[Int] = None
      var offset: Option[Int] = None
      var more = true
      while (more) {
        if (eatWord("LIMIT")) peek match {
          case Tok.Num(v, lex, _, _) if !lex.contains('.') => pos += 1; limit = Some(v.toInt)
          case t => diag("expected an integer after LIMIT", t)
        } else if (eatWord("OFFSET")) peek match {
          case Tok.Num(v, lex, _, _) if !lex.contains('.') => pos += 1; offset = Some(v.toInt)
          case t => diag("expected an integer after OFFSET", t)
        } else more = false
      }
      Select(distinct, proj, g, groupBy, having, orderBy, limit, offset)
    }

    // ------------------------------------------------------------ update
    /** `{ … }` of triple TEMPLATES (variable subjects, plain predicates) —
      * the DELETE/INSERT clause bodies; shares the CONSTRUCT template shape.
      */
    private def templateBlock(): Seq[TriplePat] = {
      expectPunct("{")
      val out = scala.collection.mutable.ArrayBuffer.empty[TriplePat]
      while (!eatPunct("}")) {
        if (!eatPunct(".")) out ++= triplesSameSubject()
      }
      if (out.isEmpty) diag("template block needs at least one triple", peek)
      out.toSeq
    }

    /** Ground triples with `;`/`,` sugar for one constant subject. */
    private def groundTriples(g: Option[String])
        : Seq[(Option[String], String, String, String)] = {
      val sTok = peek
      val s = term() match {
        case Term.I(i) => s"<$i>"
        case Term.V(v) => diag(s"INSERT/DELETE DATA takes ground triples (got ?$v)", sTok)
        case Term.L(_) => diag("literal subjects are not RDF", sTok)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Option[String], String, String, String)]
      var more = true
      while (more) {
        val p = peek match {
          case Tok.Word(w, _, _) if w == "a" => pos += 1; RdfType
          case Tok.Iri(_, _, _) | Tok.Pname(_, _, _, _) => iri()
          case t => diag("DATA predicates must be IRIs", t)
        }
        var objs = true
        while (objs) {
          val oTok = peek
          val o = term() match {
            case Term.V(v) => diag(s"INSERT/DELETE DATA takes ground triples (got ?$v)", oTok)
            case Term.I(i) => s"<$i>"
            case Term.L(r) => r
          }
          out += ((g, s, p, o))
          objs = eatPunct(",")
        }
        more = eatPunct(";") && !atPunct(".") && !atPunct("}")
      }
      out.toSeq
    }

    /** `{ … }` after INSERT/DELETE DATA: ground triples, optionally scoped
      * by `GRAPH <iri> { … }` blocks (quad tables).
      */
    private def dataBlock(insert: Boolean): UpdateOp.Data = {
      expectPunct("{")
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Option[String], String, String, String)]
      while (!eatPunct("}")) {
        if (eatPunct(".")) ()
        else if (atWord("GRAPH")) {
          pos += 1
          val g = Some(iri())
          expectPunct("{")
          while (!eatPunct("}")) {
            if (!eatPunct(".")) rows ++= groundTriples(g)
          }
        } else rows ++= groundTriples(None)
      }
      if (rows.isEmpty) diag("DATA block needs at least one triple", peek)
      UpdateOp.Data(insert, rows.toSeq)
    }

    /** DELETE/INSERT WHERE after an optional, already-consumed WITH. */
    private def modifyTail(withGraph: Option[String], start: Int): UpdateOp = {
      val (del, ins) =
        if (eatWord("DELETE")) {
          if (atWord("WHERE")) {
            // DELETE WHERE { … }: the pattern block IS the template block
            pos += 1
            val g = group()
            val pats = g.elems.collect { case GroupElem.Triples(ps) => ps }.flatten
            if (pats.isEmpty) diag("DELETE WHERE needs at least one triple pattern", peek)
            return UpdateOp.Modify(withGraph, pats, Nil, g, start, toks(pos - 1).end)
          }
          val d = templateBlock()
          val i = if (eatWord("INSERT")) templateBlock() else Nil
          (d, i)
        } else if (eatWord("INSERT")) {
          (Seq.empty[TriplePat], templateBlock())
        } else diag("expected DELETE or INSERT", peek)
      expectWord("WHERE")
      UpdateOp.Modify(withGraph, del, ins, group(), start, toks(pos - 1).end)
    }

    def parseUpdateUnit(): UpdateOp = {
      prologue()
      val start = peek.start
      val op: UpdateOp =
        if (atWord("WITH")) {
          pos += 1
          modifyTail(Some(iri()), start)
        } else if (atWord("INSERT")) {
          val save = pos
          pos += 1
          if (eatWord("DATA")) dataBlock(insert = true)
          else { pos = save; modifyTail(None, start) }
        } else if (atWord("DELETE")) {
          val save = pos
          pos += 1
          if (eatWord("DATA")) dataBlock(insert = false)
          else { pos = save; modifyTail(None, start) }
        } else if (atWord("LOAD") || atWord("CLEAR") || atWord("DROP") ||
            atWord("CREATE") || atWord("COPY") || atWord("MOVE") || atWord("ADD")) {
          diag("graph-management updates (LOAD/CLEAR/DROP/CREATE/COPY/MOVE/ADD) " +
            "are not supported — use the Materialize compaction API", peek)
        } else diag("expected INSERT, DELETE, or WITH", peek)
      peek match {
        case Tok.Eof(_, _) => op
        case t => diag("one update request per call (trailing input)", t)
      }
    }

    // ------------------------------------------------------------- query
    def parseQuery(): Query = {
      prologue()
      val q: Query =
        if (atWord("SELECT")) selectQuery()
        else if (eatWord("ASK")) {
          eatWord("WHERE")
          Ask(group())
        } else if (eatWord("DESCRIBE")) {
          val vars = scala.collection.mutable.ArrayBuffer.empty[String]
          val iris = scala.collection.mutable.ArrayBuffer.empty[String]
          var more = true
          while (more) peek match {
            case Tok.Var(v, _, _) => pos += 1; vars += v
            case Tok.Iri(_, _, _) | Tok.Pname(_, _, _, _) => iris += iri()
            case _ => more = false
          }
          if (vars.isEmpty && iris.isEmpty)
            diag("DESCRIBE needs at least one variable or IRI", peek)
          val where =
            if (eatWord("WHERE") || atPunct("{")) Some(group()) else None
          if (vars.nonEmpty && where.isEmpty)
            diag("DESCRIBE with variables needs a WHERE clause binding them", peek)
          Describe(vars.toSeq, iris.toSeq, where)
        } else if (eatWord("CONSTRUCT")) {
          if (atWord("WHERE")) {
            // CONSTRUCT WHERE { … }: the pattern block doubles as the
            // template block (the SPARQL 1.1 shorthand — DELETE WHERE's
            // read twin); templates therefore need variable objects
            pos += 1
            val g = group()
            val pats = g.elems.collect { case GroupElem.Triples(ps) => ps }.flatten
            if (pats.isEmpty)
              diag("CONSTRUCT WHERE needs at least one triple pattern", peek)
            Construct(pats, g)
          } else {
            expectPunct("{")
            val templates = scala.collection.mutable.ArrayBuffer.empty[TriplePat]
            while (!eatPunct("}")) {
              if (!eatPunct(".")) templates ++= triplesSameSubject()
            }
            if (templates.isEmpty) diag("CONSTRUCT needs at least one template", peek)
            expectWord("WHERE")
            Construct(templates.toSeq, group())
          }
        } else diag("expected SELECT, ASK, CONSTRUCT, or DESCRIBE", peek)
      peek match {
        case Tok.Eof(_, _) => q
        case t             => diag("trailing input after the query", t)
      }
    }
  }
}
