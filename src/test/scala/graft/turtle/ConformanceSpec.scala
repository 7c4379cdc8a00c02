package graft.turtle

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Golden-pair conformance suite, mirroring the reference harness
  * (`tests/positive.rs:11-47`): parse `pNN.ttl` → build triples with the
  * default `_:0, _:1, …` generator → strip spans → sort + dedup → compare
  * for EXACT equality (blank labels literal, no graph isomorphism) against
  * our independent N-Quads parse of `pNN.nq`.
  */
class ConformanceSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val url = getClass.getResource(s"/turtle/positive/$name")
    if (url != null) new String(Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
    else new String(Files.readAllBytes(Paths.get(s"src/test/resources/turtle/positive/$name")),
      StandardCharsets.UTF_8)
  }

  /** Span-stripped canonical key, ordered like the harness sort. */
  private def key(t: Triple): String = t.render

  private def runCase(id: String): Unit = {
    val ttl = read(s"$id.ttl")
    val nq = read(s"$id.nq")
    val got = Turtle.parseToTriples(ttl) match {
      case Right(ts) => ts.map(key).sorted.distinct
      case Left(e)   => fail(s"$id: parse/build failed: $e")
    }
    val expected = NTriples.parse(nq) match {
      case Right(ts) => ts.map(key).sorted.distinct
      case Left(e)   => fail(s"$id: oracle .nq parse failed: $e")
    }
    assert(got == expected, s"\n$id mismatch\n--- got ---\n${got.mkString("\n")}\n--- expected ---\n${expected.mkString("\n")}")
  }

  (1 to 29).foreach { n =>
    val id = f"p$n%02d"
    test(s"golden pair $id") { runCase(id) }
  }

  test("round-trip: serialize then re-parse is identity on every fixture") {
    (1 to 29).foreach { n =>
      val id = f"p$n%02d"
      val triples = Turtle.parseToTriples(read(s"$id.ttl")).fold(e => fail(s"$id: $e"), identity)
      val serialized = NTriples.render(triples)
      val reparsed = NTriples.parse(serialized).fold(e => fail(s"$id reparse: $e"), identity)
      assert(reparsed.map(_.render) == triples.map(_.render), s"$id round-trip drift")
      // byte-level fixpoint: serialize ∘ parse ∘ serialize ≡ serialize
      assert(NTriples.render(reparsed) == serialized, s"$id serializer not a fixpoint")
    }
  }

  test("per-triple spans: reference byte-offset convention on p01/p12/p18") {
    // Independent oracle: expected offsets located with plain string search
    // and converted to BYTE offsets via UTF-8 re-encoding — the reference's
    // convention (locspan byte spans; `DecodedChar::len`). A triple carries
    // the span of its emitting statement INCLUDING the terminating period:
    // the reference appends the char-level `last_span` at
    // `src/parsing.rs:415` after the po-list's lookahead has already
    // consumed the `.` (`src/lexing.rs:284-285,891`). Collection cons
    // triples carry the collection OBJECT's span (`src/build.rs:419-456`),
    // which closes at `)` — its lookahead happens after the span is fixed.
    def byteOf(text: String, charIdx: Int): Int =
      text.substring(0, charIdx).getBytes(StandardCharsets.UTF_8).length
    def after(text: String, s: String, from: Int = 0): Int =
      byteOf(text, text.indexOf(s, from) + s.length)
    def spans(ttl: String): Vector[(Int, Int)] =
      Turtle.parseToTriples(ttl).fold(e => fail(s"$e"), _.map(t => (t.span.start, t.span.end)))

    // p01: two statements; the second ends in a multi-byte Cyrillic literal,
    // so byte offsets diverge from char offsets — the byte convention shows
    val p01 = read("p01.ttl")
    val s1 = (byteOf(p01, p01.indexOf("<#green-goblin>")),
      after(p01, "\"Green Goblin\" ."))
    val subj2 = p01.indexOf("<#spiderman>", p01.indexOf("\"Green Goblin\"")) // the SUBJECT occurrence
    val s2 = (byteOf(p01, subj2), after(p01, "@ru ."))
    assert(byteOf(p01, p01.indexOf("@ru")) > p01.indexOf("@ru"), "fixture lost its multi-byte char")
    assert(spans(p01) == Vector.fill(3)(s1) ++ Vector.fill(4)(s2))

    // p12: one statement, three numeric-typed triples; the comment after
    // the period stays outside the span
    val p12 = read("p12.ttl")
    val s12 = (byteOf(p12, p12.indexOf("<http://en.wikipedia.org/wiki/Helium>")),
      after(p12, "1.663E-4 ."))
    assert(spans(p12) == Vector.fill(3)(s12))

    // p18: the 9 cons-cell triples carry the collection object's span; the
    // parent triple the statement's; the empty collection maps to rdf:nil
    // with the second statement's span
    val p18 = read("p18.ttl")
    val coll = (byteOf(p18, p18.indexOf("( :a :b :c )")), after(p18, "( :a :b :c )"))
    val st1 = (byteOf(p18, p18.indexOf(":subject :predicate (")), after(p18, "( :a :b :c ) ."))
    val st2 = (byteOf(p18, p18.indexOf(":subject :predicate2 ()")), after(p18, "() ."))
    assert(spans(p18) == Vector.fill(9)(coll) ++ Vector(st1, st2))
  }

  test("N-Quads: graph labels kept by parseQuads, render∘parse fixpoint, escapes") {
    val doc =
      "<http://e/s> <http://e/p> \"a\\u0022b\" <http://e/g> .\n" +
        "_:b0 <http://e/p> \"x\"@en _:g1 .\n" +
        "<http://e/s> <http://e/p> \"7\"^^<http://www.w3.org/2001/XMLSchema#integer> .\n"
    val quads = NTriples.parseQuads(doc).fold(e => fail(s"parse: $e"), identity)
    assert(quads.map(_._2) == Vector(
      Some(Term.TIri("http://e/g")), Some(Term.TBlank("_:g1")), None))
    // the escaped quote decodes into the lexical form
    assert(quads(0)._1.obj == Term.TLit("a\"b", LitType.Dt(Vocab.XsdString)))
    // render∘parse is a fixpoint statement-for-statement
    val rendered = quads.map { case (t, g) => NTriples.renderQuad(t, g) }.mkString("\n") + "\n"
    val reparsed = NTriples.parseQuads(rendered).fold(e => fail(s"reparse: $e"), identity)
    assert(reparsed.map { case (t, g) => (t.subj, t.pred, t.obj, g) } ==
      quads.map { case (t, g) => (t.subj, t.pred, t.obj, g) })
    // parse (triple view) is parseQuads with labels dropped
    assert(NTriples.parse(doc).fold(e => fail(s"$e"), identity) == quads.map(_._1))
  }

  test("negative: space inside IRIREF is a lex error with a span (examples/syntax_error.ttl)") {
    val src = {
      val url = getClass.getResource("/turtle/syntax_error.ttl")
      new String(Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
    }
    Turtle.parseToTriples(src) match {
      case Left(e)  => assert(e.span.start >= 0 && e.span.end >= e.span.start)
      case Right(_) => fail("expected a syntax error")
    }
  }
}
