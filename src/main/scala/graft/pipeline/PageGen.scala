package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic web-page corpus (no external data): seeded,
  * reproducible at any scale, with a computable ground truth — each page's
  * `text` column is the byte-exact extraction oracle, and the embedded
  * entity mentions + shared-alias clusters give the linking /
  * canonicalization oracle (FIXTURES.md §2/§3).
  *
  * Everything is a pure function of (pageId, nEntities), so generation is
  * embarrassingly parallel (`spark.range(n).mapPartitions`) and an oracle
  * run on the driver can re-derive any page independently.
  */
object PageGen {

  val BaseTs: Long = 1609459200000L // 2021-01-01T00:00:00Z, fixed epoch

  // Small fixed vocabularies — content words deliberately tag-free.
  private val Words: Array[String] = Array(
    "market", "system", "record", "people", "energy", "policy", "report", "growth",
    "science", "music", "travel", "health", "nature", "signal", "object", "period",
    "value", "series", "theory", "model", "number", "source", "figure", "result",
    "region", "effect", "century", "process", "library", "network", "culture", "project",
    "quality", "ratio&pace", "student", "history", "economy", "council", "village", "garden")

  private val NameWords: Array[String] = Array(
    "Acme", "Borealis", "Cinder", "Dakota", "Everest", "Fulcrum", "Granite", "Horizon",
    "Ivory", "Juniper", "Krypton", "Lumen", "Meridian", "Nimbus", "Onyx", "Pinnacle",
    "Quartz", "Redwood", "Sierra", "Tundra", "Umber", "Vertex", "Willow", "Xenon",
    "Yonder", "Zephyr")

  private val NameSuffixes: Array[String] =
    Array("Corp", "Labs", "Group", "Systems", "Works", "Institute", "Partners", "Holdings")

  // ------------------------------------------------------------- entities

  def entityIri(k: Int): String = s"http://kg.example/entity/$k"

  def entityName(k: Int): String =
    s"${NameWords(k % NameWords.length)} ${NameSuffixes((k / NameWords.length) % NameSuffixes.length)} $k"

  /** Three distinctive context tokens per entity, used both by the page
    * generator (planted near mentions) and by the linker's entity profile.
    */
  def topicTokens(k: Int): Seq[String] =
    Seq(Words(k % Words.length), Words((k * 7 + 3) % Words.length), Words((k * 13 + 11) % Words.length))

  /** Shared ambiguous alias: entities with the same (k % 10 == 0) slot and
    * same group id collide — these collisions are the canonicalization
    * (connected-components) ground truth.
    */
  def sharedAlias(k: Int): Option[String] =
    if (k % 10 == 0) Some(s"Shared Alias ${(k / 10) % 6}") else None

  def aliases(k: Int): Seq[(String, Double)] = {
    val name = entityName(k)
    val base = Seq(
      name -> 1.0,
      name.replace(" ", "") -> 0.9)
    base ++ sharedAlias(k).map(_ -> 0.5)
  }

  def entityDictionary(nEntities: Int): Seq[EntityAlias] =
    (0 until nEntities).flatMap(k => aliases(k).map { case (a, w) => EntityAlias(entityIri(k), a, w) })

  // ---------------------------------------------------------------- pages

  /** Entities mentioned by page n (with the alias index used for each). */
  def plannedMentions(n: Long, nEntities: Int): Seq[(Int, Int)] = {
    val count = 1 + (n % 3).toInt
    (0 until count).map { j =>
      val k = (math.abs(n * 31 + j * 17) % nEntities).toInt
      val aliasIdx = ((n + j) % 2).toInt // 0 = full name, 1 = no-space variant
      (k, aliasIdx)
    }
  }

  /** Plain-text paragraphs of page n: filler words + planted mentions with
    * the entity's topic tokens adjacent (context for TF-IDF scoring).
    * Every 10th page mentions entity 0 — the HOT entity exercising skew.
    */
  def paragraphs(n: Long, nEntities: Int): Seq[String] = {
    val rnd = new scala.util.Random(n * 2654435761L + 104729L)
    val mentions = plannedMentions(n, nEntities) ++ (if (n % 10 == 0) Seq((0, 0)) else Nil)
    mentions.zipWithIndex.map { case ((k, aliasIdx), j) =>
      val filler1 = Seq.fill(5 + rnd.nextInt(5))(Words(rnd.nextInt(Words.length)))
      val filler2 = Seq.fill(5 + rnd.nextInt(5))(Words(rnd.nextInt(Words.length)))
      val surface = aliases(k)(aliasIdx)._1
      val topics = topicTokens(k)
      ((filler1 :+ surface) ++ topics ++ filler2).mkString(" ") + s" (p$j)"
    }
  }

  def pageUrl(n: Long): String = s"https://site${n % 97}.example/page/$n"

  def pageTs(n: Long): Timestamp = new Timestamp(BaseTs + n * 1000L)

  private val Langs = Array("en", "fr", "de", "ru")
  def pageLang(n: Long): String = Langs((n % 7 % 4).toInt)

  /** The oracle extracted text: paragraphs joined by a single '\n'. */
  def pageText(n: Long, nEntities: Int): String = paragraphs(n, nEntities).mkString("\n")

  private def encodeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic HTML with nav/script/footer boilerplate around an
    * `<article>` of `<p>` paragraphs — what Extract must strip.
    */
  def pageHtml(n: Long, nEntities: Int): Array[Byte] = {
    val title = s"Page $n"
    val ps = paragraphs(n, nEntities).map(p => s"<p>${encodeHtml(p)}</p>").mkString
    val html =
      s"""<html><head><title>${encodeHtml(title)}</title><script>var t=${n % 1000};</script>""" +
        s"""<style>p{margin:0}</style></head><body>""" +
        s"""<nav><a href="/">Home</a> | <a href="/about">About</a></nav>""" +
        s"""<header><h1>site${n % 97}.example</h1></header>""" +
        s"""<article>$ps</article>""" +
        s"""<aside>related: <a href="/r/${n % 13}">r${n % 13}</a></aside>""" +
        s"""<footer>(c) site${n % 97}.example - all rights reserved</footer></body></html>"""
    html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def page(n: Long, nEntities: Int): WebPage =
    WebPage(pageUrl(n), pageTs(n), pageHtml(n, nEntities), pageText(n, nEntities), pageLang(n))

  /** Distributed page table: `spark.range` is already partitioned; each
    * task generates its own rows — no driver-side materialization, scales
    * linearly with parallelism.
    */
  def pages(spark: SparkSession, n: Long, nEntities: Int, partitions: Int = 0): Dataset[WebPage] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.mapPartitions(_.map(i => page(i, nEntities)))
  }

  def dictionary(spark: SparkSession, nEntities: Int): Dataset[EntityAlias] = {
    import spark.implicits._
    spark.createDataset(entityDictionary(nEntities))
  }
}
