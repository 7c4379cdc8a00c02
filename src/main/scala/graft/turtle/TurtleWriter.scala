package graft.turtle

/** Turtle SERIALIZER — the output side the parser-only reference leaves to
  * sibling crates: a prefix-compacting, subject-grouped pretty printer
  * whose output the conformance parser re-reads to the SAME triples.
  *
  * Determinism contract (the parse∘serialize FIXPOINT, spec-pinned on all
  * 29 conformance fixtures):
  *   - blank nodes are RELABELED `_:0…` by first occurrence in EMISSION
  *     order — exactly the builder's allocation rule
  *     (`graft.turtle.Builder`, reference `src/build.rs` label counter) —
  *     so re-parsing the serialized document reproduces the labels
  *     verbatim and serialization is a fixpoint from the first round on;
  *   - subjects keep first-appearance order; within a subject, predicates
  *     keep first-appearance order as a `;` group, repeated predicates
  *     become `,` object lists;
  *   - an IRI compacts to `prefix:local` only when its namespace matches a
  *     declared prefix and the local part is conservatively
  *     PN_LOCAL-safe (never needs escaping); `rdf:type` prints as `a` in
  *     predicate position; everything else renders in N-Triples form,
  *     which Turtle accepts verbatim (same escape table the parser was
  *     conformance-tested against).
  *
  * SUGAR (structural, hence fixpoint-stable — every decision below depends
  * only on the triple multiset, which a re-parse reproduces exactly):
  *   - a blank node referenced exactly ONCE as an object, with at least
  *     one outgoing property, re-sugars inline as `[ p o ; … ]` and its
  *     top-level block is suppressed;
  *   - a well-formed list chain — every cons node referenced once and
  *     carrying exactly the builder's three triples (`rdf:type rdf:List`,
  *     `rdf:rest`, `rdf:first`; reference `src/build.rs` emits all three,
  *     so a re-parse of `( … )` regenerates them verbatim) terminating in
  *     `rdf:nil` — re-sugars as `( e1 e2 … )`;
  *   - an eligible node UNREACHABLE from any printed block (a pure cycle
  *     of single-reference blanks) is demoted back to a labeled top-level
  *     block so no triple ever vanishes from the output;
  *   - property-less blanks keep their labels (no `[]` sugar) — the
  *     label IS the information there.
  */
object TurtleWriter {

  private val SafeLocal = java.util.regex.Pattern.compile("[A-Za-z_][A-Za-z0-9_-]*")

  private type PoMap =
    scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Term]]

  /** `blankPrefix` prepends every relabeled blank (`_:<prefix><n>`) —
    * callers concatenating multiple rendered documents into ONE physical
    * file (e.g. [[graft.ops.GraphOps.exportTurtleDir]]'s chunks) pass a
    * per-document discriminator so labels stay distinct when the
    * concatenation is re-parsed as a single document. The default empty
    * prefix keeps the `_:0…` fixpoint contract above. `sugar = false`
    * disables the `[…]`/`(…)` re-sugaring (every blank prints labeled).
    */
  def write(
      triples: Seq[Triple], prefixes: Map[String, String] = Map.empty,
      blankPrefix: String = "", sugar: Boolean = true): String = {
    // group by subject (first appearance), then by predicate (first
    // appearance) — on the ORIGINAL terms; relabeling happens at print
    // time, in exactly the order the document is emitted
    val bySubj = scala.collection.mutable.LinkedHashMap.empty[Term, PoMap]
    triples.foreach { t =>
      bySubj.getOrElseUpdate(t.subj, scala.collection.mutable.LinkedHashMap.empty)
        .getOrElseUpdate(t.pred, scala.collection.mutable.ArrayBuffer.empty) += t.obj
    }

    // ---- sugar eligibility (structural facts only) ----
    val objRefs = scala.collection.mutable.HashMap.empty[String, Int]
    if (sugar) triples.foreach { t =>
      t.obj match {
        case Term.TBlank(l) => objRefs.update(l, objRefs.getOrElse(l, 0) + 1)
        case _              => ()
      }
    }
    def eligible(l: String): Boolean =
      sugar && objRefs.getOrElse(l, 0) == 1 &&
        bySubj.get(Term.TBlank(l)).exists(_.nonEmpty)

    // demotion set (filled by the reachability fixpoint below): eligible
    // nodes unreachable from printed blocks fall back to labeled blocks
    val demoted = scala.collection.mutable.HashSet.empty[String]
    def inline(l: String): Boolean = eligible(l) && !demoted.contains(l)

    /** The (first, rest) of a builder-shaped cons node: exactly
      * {type→rdf:List, rest, first}, one object each.
      */
    def consOf(l: String): Option[(Term, Term)] =
      bySubj.get(Term.TBlank(l)).flatMap { po =>
        val ok = po.size == 3 &&
          po.get(Vocab.RdfType).exists(os =>
            os.length == 1 && os(0) == Term.TIri(Vocab.RdfList)) &&
          po.get(Vocab.RdfFirst).exists(_.length == 1) &&
          po.get(Vocab.RdfRest).exists(_.length == 1)
        if (ok) Some((po(Vocab.RdfFirst)(0), po(Vocab.RdfRest)(0))) else None
      }

    /** Elements of a fully well-formed, fully eligible list chain headed
      * at `l`, or None if any link breaks the shape.
      */
    def listOf(l: String): Option[List[Term]] = {
      val elems = List.newBuilder[Term]
      var cur: Term = Term.TBlank(l)
      var steps = 0
      while (true) {
        cur match {
          case Term.TIri(Vocab.RdfNil) => return Some(elems.result())
          case Term.TBlank(c) if (steps == 0 && c == l) || inline(c) =>
            consOf(c) match {
              case Some((first, rest)) => elems += first; cur = rest
              case None                => return None
            }
          case _ => return None
        }
        steps += 1
        if (steps > triples.size + 1) return None // malformed loop guard
      }
      None
    }

    // demotion fixpoint: eligible nodes unreachable from printed blocks
    // (single-reference cycles) fall back to labeled top-level blocks
    if (sugar) {
      var changed = true
      while (changed) {
        val visited = scala.collection.mutable.HashSet.empty[String]
        def walk(po: PoMap): Unit =
          po.valuesIterator.flatten.foreach {
            case Term.TBlank(l) if inline(l) && !visited.contains(l) =>
              visited += l
              bySubj.get(Term.TBlank(l)).foreach(walk)
            case _ => ()
          }
        bySubj.foreach {
          case (Term.TBlank(l), po) if inline(l) => () // candidate, not a root
          case (_, po)                           => walk(po)
        }
        val orphans = bySubj.keysIterator.collect {
          case Term.TBlank(l) if inline(l) && !visited.contains(l) => l
        }.toList
        changed = orphans.nonEmpty
        demoted ++= orphans
      }
    }

    // ---- printing ----
    // label namespace: with sugar on, a re-parse ALLOCATES `_:0…` for the
    // inlined anon/list nodes (fixture-parity generator), so the labels we
    // print must live in a disjoint namespace (`_:b0…`) or the round-trip
    // would conflate a printed label with the first allocation (caught by
    // the p15 fixpoint). sugar=false keeps the legacy `_:0…` contract.
    val labelNs = (if (sugar) "b" else "") + blankPrefix
    val relabel = scala.collection.mutable.HashMap.empty[String, String]
    def blank(label: String): String =
      relabel.getOrElseUpdate(label, s"_:$labelNs${relabel.size}")
    def iri(i: String): String =
      prefixes.collectFirst {
        case (p, ns) if i.startsWith(ns) &&
          SafeLocal.matcher(i.substring(ns.length)).matches() =>
          s"$p:${i.substring(ns.length)}"
      }.getOrElse(s"<$i>")
    def pred(p: String): String = if (p == Vocab.RdfType) "a" else iri(p)

    def term(t: Term): String = t match {
      case Term.TBlank(l) if inline(l) =>
        listOf(l) match {
          case Some(elems) => elems.map(term).mkString("( ", " ", " )")
          case None =>
            val po = bySubj(Term.TBlank(l))
            po.iterator.map { case (p, objs) =>
              s"${pred(p)} ${objs.map(term).mkString(", ")}"
            }.mkString("[ ", " ; ", " ]")
        }
      case Term.TBlank(l) => blank(l)
      case Term.TIri(i)   => iri(i)
      case lit            => lit.render
    }

    val sb = new StringBuilder
    prefixes.toSeq.sortBy(_._1).foreach { case (p, ns) =>
      sb ++= s"@prefix $p: <$ns> .\n"
    }
    if (prefixes.nonEmpty) sb += '\n'
    bySubj.foreach { case (s, po) =>
      val suppressed = s match {
        case Term.TBlank(l) => inline(l)
        case _              => false
      }
      if (!suppressed) {
        sb ++= (s match {
          case Term.TBlank(l) => blank(l)
          case other          => term(other)
        })
        var firstPred = true
        po.foreach { case (p, objs) =>
          sb ++= (if (firstPred) " " else " ;\n  ")
          firstPred = false
          sb ++= pred(p)
          sb ++= " "
          var firstObj = true
          objs.foreach { o =>
            if (!firstObj) sb ++= ", "
            firstObj = false
            sb ++= term(o)
          }
        }
        sb ++= " .\n"
      }
    }
    sb.toString
  }
}
