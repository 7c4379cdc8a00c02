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
