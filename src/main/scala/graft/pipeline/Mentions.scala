package graft.pipeline

import org.apache.spark.sql.Dataset

/** Mention detection: Aho-Corasick automaton over the alias dictionary,
  * built on the driver, broadcast once per executor, scanned per partition.
  * Narrow stage — zero shuffle; output is one row per word-bounded match.
  */
object Mentions {

  /** FNV-1a 64-bit — stable across JVMs (String.hashCode is 32-bit and
    * collision-heavy at 10^12-doc scale).
    */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var k = 0
    while (k < s.length) {
      h ^= s.charAt(k).toLong
      h *= 0x100000001b3L
      k += 1
    }
    h
  }

  /** Deterministic mention id: function of (url, begin, end) only, so two
    * runs (or a resumed run) assign identical ids without coordination.
    */
  def mentionId(url: String, begin: Int, end: Int): Long =
    hash64(url) * 31L + begin.toLong * 7919L + end.toLong

  /** The paragraph (line) of `text` containing [begin, end). */
  def paragraphOf(text: String, begin: Int): String = {
    val from = text.lastIndexOf('\n', math.max(begin - 1, 0)) + 1
    val to0 = text.indexOf('\n', begin)
    val to = if (to0 < 0) text.length else to0
    text.substring(from, to)
  }

  /** Pure per-page scan — shared by the Spark stage and the single-threaded
    * oracle (tests), guaranteeing P/R comparability.
    */
  def scanPage(ac: AhoCorasick, url: String, text: String): Iterator[Mention] =
    ac.findWordBounded(text).map { case (patIdx, b, e) =>
      Mention(url, mentionId(url, b, e), ac.patterns(patIdx), b, e, paragraphOf(text, b))
    }

  /** Spark stage over any frame with (url, text) columns. `aliasSurfaces`
    * must be the DISTINCT alias strings (the automaton does detection only;
    * entity candidates come from the linking join, so shared aliases stay
    * one pattern).
    */
  def detect(pages: org.apache.spark.sql.DataFrame, aliasSurfaces: Seq[String]): Dataset[Mention] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val acBc = spark.sparkContext.broadcast(AhoCorasick.build(aliasSurfaces.distinct.sorted))
    pages.select($"url", $"text").as[(String, String)].mapPartitions { it =>
      val ac = acBc.value
      it.flatMap { case (url, text) => scanPage(ac, url, text) }
    }
  }
}
