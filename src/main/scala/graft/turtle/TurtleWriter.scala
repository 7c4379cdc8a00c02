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
  */
object TurtleWriter {

  private val SafeLocal = java.util.regex.Pattern.compile("[A-Za-z_][A-Za-z0-9_-]*")

  /** `blankPrefix` prepends every relabeled blank (`_:<prefix><n>`) —
    * callers concatenating multiple rendered documents into ONE physical
    * file (e.g. [[graft.ops.GraphOps.exportTurtleDir]]'s chunks) pass a
    * per-document discriminator so labels stay distinct when the
    * concatenation is re-parsed as a single document. The default empty
    * prefix keeps the `_:0…` fixpoint contract above.
    */
  def write(
      triples: Seq[Triple], prefixes: Map[String, String] = Map.empty,
      blankPrefix: String = ""): String = {
    // group by subject (first appearance), then by predicate (first
    // appearance) — on the ORIGINAL terms; relabeling happens at print
    // time, in exactly the order the document is emitted
    val bySubj = scala.collection.mutable.LinkedHashMap
      .empty[Term, scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Term]]]
    triples.foreach { t =>
      bySubj.getOrElseUpdate(t.subj, scala.collection.mutable.LinkedHashMap.empty)
        .getOrElseUpdate(t.pred, scala.collection.mutable.ArrayBuffer.empty) += t.obj
    }

    val relabel = scala.collection.mutable.HashMap.empty[String, String]
    def blank(label: String): String =
      relabel.getOrElseUpdate(label, s"_:$blankPrefix${relabel.size}")
    def iri(i: String): String =
      prefixes.collectFirst {
        case (p, ns) if i.startsWith(ns) &&
          SafeLocal.matcher(i.substring(ns.length)).matches() =>
          s"$p:${i.substring(ns.length)}"
      }.getOrElse(s"<$i>")
    def term(t: Term): String = t match {
      case Term.TBlank(l) => blank(l)
      case Term.TIri(i)   => iri(i)
      case lit            => lit.render
    }
    def pred(p: String): String = if (p == Vocab.RdfType) "a" else iri(p)

    val sb = new StringBuilder
    prefixes.toSeq.sortBy(_._1).foreach { case (p, ns) =>
      sb ++= s"@prefix $p: <$ns> .\n"
    }
    if (prefixes.nonEmpty) sb += '\n'
    bySubj.foreach { case (s, po) =>
      sb ++= term(s)
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
    sb.toString
  }
}
