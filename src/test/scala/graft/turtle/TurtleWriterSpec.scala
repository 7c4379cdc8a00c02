package graft.turtle

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** [[TurtleWriter]] contract: the serialized TURTLE (prefix-compacted,
  * subject-grouped, `a` shortcut, `;`/`,` groups) re-parses through the
  * conformance parser to the same triples, and serialization is a
  * FIXPOINT: write(parse(write(T))) == write(T), byte for byte, on every
  * conformance fixture — the writer's emission-order bnode relabeling
  * matches the builder's `_:0…` allocation rule exactly.
  */
class TurtleWriterSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val url = getClass.getResource(s"/turtle/positive/$name")
    if (url != null) new String(Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
    else new String(Files.readAllBytes(Paths.get(s"src/test/resources/turtle/positive/$name")),
      StandardCharsets.UTF_8)
  }

  test("turtle fixpoint on all 29 fixtures: write∘parse∘write == write; triples preserved") {
    (1 to 29).foreach { n =>
      val id = f"p$n%02d"
      val t1 = Turtle.parseToTriples(read(s"$id.ttl")).fold(e => fail(s"$id: $e"), identity)
      val s1 = TurtleWriter.write(t1)
      val t2 = Turtle.parseToTriples(s1).fold(e => fail(s"$id rewrite parse: $e"), identity)
      // size and the non-blank triple set survive exactly; blank labels are
      // canonically renumbered by the writer's emission order
      assert(t2.size == t1.size, s"$id: triple count drift ${t1.size} -> ${t2.size}")
      def nonBlank(ts: Seq[Triple]) = ts.filter(t =>
        !t.subj.isInstanceOf[Term.TBlank] && !t.obj.isInstanceOf[Term.TBlank])
        .map(_.render).sorted
      assert(nonBlank(t2) == nonBlank(t1), s"$id: non-blank triples drifted")
      // the FIXPOINT: serializing the re-parse reproduces the same bytes
      val s2 = TurtleWriter.write(t2)
      assert(s2 == s1, s"$id: not a fixpoint\n--- s1 ---\n$s1\n--- s2 ---\n$s2")
    }
  }

  test("sugar: anon bnodes re-sugar to [...], lists to (...), cycles demote labeled") {
    def roundTrip(ttl: String): (String, Vector[Triple], String) = {
      val t1 = Turtle.parseToTriples(ttl).fold(e => fail(e.toString), identity)
      val s1 = TurtleWriter.write(t1)
      val t2 = Turtle.parseToTriples(s1).fold(e => fail(s"reparse: $e\n$s1"), identity)
      assert(t2.size == t1.size, s"triple count drift ${t1.size} -> ${t2.size}\n$s1")
      assert(TurtleWriter.write(t2) == s1, s"not a fixpoint:\n$s1")
      (s1, t1, TurtleWriter.write(t2))
    }
    val int = "^^<" + Vocab.XsdInteger + ">"
    // single-use anon property list re-sugars inline (nested too)
    val (s1, _, _) = roundTrip(
      "<http://x/s> <http://x/p> [ <http://x/q> \"x\" ; " +
        "<http://x/r> [ <http://x/z> 4 ] ] .")
    assert(s1.contains(
      "[ <http://x/q> \"x\" ; <http://x/r> [ <http://x/z> \"4\"" + int + " ] ]"), s1)
    // well-formed list re-sugars to ( ... ) — the builder's type/rest/first
    // cons triples regenerate verbatim on re-parse (count pinned above)
    val (s2, t2a, _) = roundTrip("<http://x/s> <http://x/p> ( 1 \"a\" ( 2 ) ) .")
    assert(s2.contains("( \"1\"" + int + " \"a\" ( \"2\"" + int + " ) )"), s2)
    assert(t2a.count(_.pred == Vocab.RdfFirst) == 4) // 3 outer + 1 inner cons
    // a blank referenced twice stays labeled
    val (s3, _, _) = roundTrip(
      "_:m <http://x/n> \"v\" . <http://x/a> <http://x/p> _:m . " +
        "<http://x/b> <http://x/p> _:m .")
    assert(s3.contains("_:b0") && !s3.contains("["), s3)
    // a pure single-reference cycle demotes to labeled blocks — no triple
    // vanishes (count equality is the teeth; labels stay, no sugar)
    val (s4, _, _) = roundTrip(
      "_:c1 <http://x/p> _:c2 . _:c2 <http://x/p> _:c1 .")
    assert(!s4.contains("[") && s4.contains("_:b0") && s4.contains("_:b1"), s4)
  }

  test("prefix compaction, `a` shortcut, object lists and predicate groups") {
    val t = Seq(
      Triple(Term.TIri("http://ex.org/s"), Vocab.RdfType, Term.TIri("http://ex.org/C"), Span(0, 0)),
      Triple(Term.TIri("http://ex.org/s"), "http://ex.org/p", Term.TLit("x", LitType.Dt(Vocab.XsdString)), Span(0, 0)),
      Triple(Term.TIri("http://ex.org/s"), "http://ex.org/p", Term.TLit("y", LitType.Dt(Vocab.XsdString)), Span(0, 0)),
      Triple(Term.TIri("http://other.org/z!"), "http://ex.org/p", Term.TBlank("_:9"), Span(0, 0)))
    val s = TurtleWriter.write(t, Map("ex" -> "http://ex.org/"))
    assert(s.contains("@prefix ex: <http://ex.org/> ."))
    assert(s.contains("ex:s a ex:C"), s)
    assert(s.contains("ex:p \"x\", \"y\""), s)   // object list
    assert(s.contains(" ;\n"), s)               // predicate group
    assert(s.contains("<http://other.org/z!>"), s) // unsafe local stays <>
    // property-less blank keeps a label (no [] sugar), canonically
    // relabeled into the sugar-safe `_:b…` namespace
    assert(s.contains("_:b0"), s)
    val back = Turtle.parseToTriples(s).fold(e => fail(e.toString), identity)
    assert(back.size == t.size)
    assert(back.map(x => (x.subj.render, x.pred)).toSet ==
      Set(("<http://ex.org/s>", Vocab.RdfType), ("<http://ex.org/s>", "http://ex.org/p"),
        ("<http://other.org/z!>", "http://ex.org/p")))
  }
}
