package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.turtle.{NTriples, Turtle}

/** Triple emission. The emitter EMBEDS the Turtle parser-serializer: each
  * page's statements are written as a Turtle document (prefixes, `a` sugar,
  * `;`/`,` groups, typed literals) and re-parsed with the conformance-tested
  * parser before landing in the graph table — the generated text is real
  * Turtle exercised on every page, not a side channel.
  */
object TripleEmit {

  val Kg = "http://kg.example/ontology#"
  val Xsd = "http://www.w3.org/2001/XMLSchema#"

  private def esc(s: String): String = NTriples.escapeString(s)

  /** Percent-encode the characters IRIREF forbids (controls, space, and
    * `<>"{}|^`\``) so a raw crawl URL can neither fail the embedded
    * re-parse of the whole partition nor INJECT extra triples by closing
    * the `<...>` early. All forbidden chars are ASCII ⇒ one %XX each;
    * clean IRIs (every synthetic url, every dictionary entity) pass
    * through untouched, keeping emission byte-identical for them.
    */
  private[pipeline] def iriSafe(s: String): String = {
    def forbidden(c: Char): Boolean = c <= ' ' || "<>\"{}|^`\\".indexOf(c.toInt) >= 0
    if (!s.exists(forbidden)) s
    else {
      val sb = new java.lang.StringBuilder(s.length + 8)
      s.foreach { c =>
        if (forbidden(c)) sb.append(f"%%${c.toInt}%02X") else sb.append(c)
      }
      sb.toString
    }
  }

  /** Turtle document for one page's emissions (deterministic layout). */
  def turtleForPage(
      url: String,
      warcTsMs: Long,
      lang: String,
      entities: Seq[(String, String)]): String = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("@prefix kg: <").append(Kg).append("> .\n")
    sb.append("@prefix xsd: <").append(Xsd).append("> .\n")
    val ts = java.time.Instant.ofEpochMilli(warcTsMs).toString
    sb.append('<').append(iriSafe(url)).append("> a kg:Page ;\n")
    sb.append("  kg:lang \"").append(esc(lang)).append("\" ;\n")
    sb.append("  kg:fetchedAt \"").append(ts).append("\"^^xsd:dateTime")
    val distinctEnts = entities.map(_._1).distinct
    if (distinctEnts.nonEmpty) {
      sb.append(" ;\n  kg:mentions ")
      sb.append(distinctEnts.map(e => s"<${iriSafe(e)}>").mkString(", "))
    }
    sb.append(" .\n")
    entities.distinct.foreach { case (iri, label) =>
      sb.append('<').append(iriSafe(iri)).append("> kg:label \"").append(esc(label)).append("\" .\n")
    }
    sb.toString
  }

  /** Emit stage.
    * `linked`: (url, canonical_iri, label) — one row per linked mention.
    * Output: TripleRow per emitted triple (src_url/warc_ts lineage columns).
    */
  def emit(pages: DataFrame, linked: DataFrame): Dataset[TripleRow] = {
    val spark = pages.sparkSession
    import spark.implicits._

    val grouped = linked
      .groupBy(col("url"))
      .agg(collect_list(struct(col("canonical_iri"), col("label"))).as("ents"))

    // left join: pages with zero linked mentions still emit their metadata
    pages.select(col("url"), col("warc_ts"), col("lang"))
      .join(grouped, Seq("url"), "left")
      .select(col("url"), col("warc_ts"), col("lang"), col("ents"))
      .as[(String, java.sql.Timestamp, String, Option[Seq[(String, String)]])]
      .mapPartitions { it =>
        it.flatMap { case (url, ts, lang, ents) =>
          val ttl = turtleForPage(url, ts.getTime, lang, ents.getOrElse(Seq.empty))
          // embedded parser: the emitted document must parse; a failure here
          // is a serializer bug, surfaced as an error row upstreamed by tests
          Turtle.parseToTriples(ttl) match {
            case Right(triples) =>
              triples.iterator.map { t =>
                TripleRow(t.subj.render, t.pred, t.obj.render, url, ts)
              }
            case Left(e) =>
              throw new IllegalStateException(s"emitter round-trip failed for $url: $e")
          }
        }
      }
  }

  /** Turtle ingestion source: parse foreign .ttl documents into the graph,
    * routing parse failures to a rejects table instead of failing the job
    * (reference diagnostic sink, `examples/simple.rs:27-37`).
    */
  def ingestTurtle(
      docs: Dataset[(String, java.sql.Timestamp, String)]): // (url, ts, turtle_text)
      (Dataset[TripleRow], Dataset[Reject]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (spanned, rejects) = ingestTurtleSpanned(docs)
    (spanned.map(t => TripleRow(t.subj, t.pred, t.obj, t.src_url, t.warc_ts)), rejects)
  }

  /** [[ingestTurtle]] carrying each triple's source byte span (reference
    * `Meta` lineage parity — the span of the statement/object that emitted
    * the triple). Use this when downstream diagnostics need to point back
    * into the source bytes; the extra columns prune away when unselected.
    */
  def ingestTurtleSpanned(
      docs: Dataset[(String, java.sql.Timestamp, String)]): // (url, ts, turtle_text)
      (Dataset[SpannedTripleRow], Dataset[Reject]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parsed = docs.mapPartitions { it =>
      it.map { case (url, ts, text) =>
        Turtle.parseToTriplesScoped(text, java.lang.Long.toHexString(Mentions.hash64(url))) match {
          case Right(ts2) =>
            (ts2.map(t => SpannedTripleRow(t.subj.render, t.pred, t.obj.render, url, ts,
              t.span.start, t.span.end)), None: Option[Reject])
          case Left(e) =>
            (Seq.empty[SpannedTripleRow], Some(Reject(url, e.span.start, e.span.end, e.message)))
        }
      }
    }.persist()
    // materialize both outputs ONCE (eager localCheckpoint), then release
    // the shared parse cache — otherwise every ingest call leaks a cached
    // copy of the parsed corpus for the session's lifetime; the returned
    // checkpoint blocks are cleaned when the datasets become unreachable
    val triples = parsed.flatMap(_._1).localCheckpoint()
    val rejects = parsed.flatMap(_._2).localCheckpoint()
    parsed.unpersist()
    (triples, rejects)
  }
}
