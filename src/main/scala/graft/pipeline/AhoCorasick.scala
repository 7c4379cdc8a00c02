package graft.pipeline

import scala.collection.mutable

/** Serializable Aho-Corasick automaton for batched dictionary mention
  * detection: built once on the driver, `sparkContext.broadcast` to every
  * executor, scanned per partition (north_star: "batched mention detection
  * with Aho-Corasick dictionaries broadcast per executor").
  *
  * All occurrences are emitted (including overlaps); [[findWordBounded]]
  * additionally filters to word-boundary-aligned matches.
  */
final class AhoCorasick private (
    private val children: Array[Map[Char, Int]],
    private val fail: Array[Int],
    private val outputs: Array[Array[Int]],
    val patterns: Array[String]) extends Serializable {

  /** All matches as (patternIndex, begin, end) — end exclusive. */
  def find(text: String): Iterator[(Int, Int, Int)] = new Iterator[(Int, Int, Int)] {
    private[this] var state = 0
    private[this] var i = 0
    private[this] var pending: Array[Int] = Array.emptyIntArray
    private[this] var pendingIdx = 0

    private def advance(): Unit = {
      while (pendingIdx >= pending.length && i < text.length) {
        val c = text.charAt(i)
        var s = state
        while (s != 0 && !children(s).contains(c)) s = fail(s)
        state = children(s).getOrElse(c, 0)
        i += 1
        pending = outputs(state)
        pendingIdx = 0
      }
    }

    def hasNext: Boolean = { advance(); pendingIdx < pending.length }

    def next(): (Int, Int, Int) = {
      advance()
      val p = pending(pendingIdx)
      pendingIdx += 1
      (p, i - patterns(p).length, i)
    }
  }

  @inline private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** Matches aligned on word boundaries (no letter/digit hugging either side). */
  def findWordBounded(text: String): Iterator[(Int, Int, Int)] =
    find(text).filter { case (_, b, e) =>
      (b == 0 || !isWordChar(text.charAt(b - 1))) &&
        (e == text.length || !isWordChar(text.charAt(e)))
    }
}

object AhoCorasick {

  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.toArray
    val children = mutable.ArrayBuffer[mutable.Map[Char, Int]](mutable.Map.empty)
    val ownOut = mutable.ArrayBuffer[List[Int]](Nil)

    // trie
    pats.zipWithIndex.foreach { case (p, idx) =>
      var node = 0
      p.foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += mutable.Map.empty
          ownOut += Nil
          children.length - 1
        })
      }
      ownOut(node) = idx :: ownOut(node)
    }

    // BFS failure links; outputs collapsed through the failure chain
    val n = children.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ownOut(0).reverse.toArray
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, child) =>
      fail(child) = 0
      out(child) = (ownOut(child).reverse ++ out(0)).toArray
      queue += child
    }
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      children(node).foreach { case (c, child) =>
        var f = fail(node)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(child) = children(f).getOrElse(c, 0) match {
          case `child` => 0 // root self-transition
          case other   => other
        }
        out(child) = (ownOut(child).reverse ++ out(fail(child))).toArray
        queue += child
      }
    }

    new AhoCorasick(children.map(_.toMap).toArray, fail, out, pats)
  }
}
