package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern substring automaton for blocklist
  * matching at corpus scale.
  *
  * The q73-style scrub scans per pattern, so its cost is
  * O(|patterns| · corpus). This automaton is built ONCE driver-side
  * from the bounded pattern vocabulary (blocklists are thousands of
  * entries, never data-sized), broadcast to executors, and matches
  * ALL patterns in ONE left-to-right pass per document — cost
  * O(corpus + matches), independent of |patterns|. Matching is
  * overlap-inclusive: every occurrence of every pattern is counted,
  * including occurrences sharing text (the fail-chain output links
  * carry suffix patterns — "park" is found inside "spark").
  *
  * The structure is immutable after build and Serializable; ship it
  * with `sparkContext.broadcast` and call [[countMatches]] from a UDF
  * or `mapPartitions`.
  */
final class AhoCorasick private[functions] (
    private val next: Array[Map[Char, Int]],
    private val fail: Array[Int],
    private val outs: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Occurrence count per pattern index (overlap-inclusive). */
  def countMatches(text: String): Array[Int] = {
    val counts = new Array[Int](nPatterns)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      s = next(s).getOrElse(c, 0)
      val out = outs(s)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }

  def states: Int = next.length
}

object AhoCorasick {

  /** Build the automaton: trie insert, then BFS failure links with
    * output lists merged along the fail chain (so matching never
    * walks the chain per character — each state's `outs` already
    * holds every pattern ending at it, directly or as a suffix). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val patEnd = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += mutable.Map.empty[Char, Int]
          patEnd += Nil
          children.length - 1
        })
      }
      patEnd(s) = pid :: patEnd(s)
    }
    val n = children.length
    val fail = new Array[Int](n)
    val outs = new Array[List[Int]](n)
    var i = 0
    while (i < n) { outs(i) = patEnd(i); i += 1 }
    val queue = mutable.Queue.empty[Int]
    children(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outs(s) = outs(s) ::: outs(fail(s)) // suffix patterns via fail
      children(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(t) = if (children(f).contains(c) && children(f)(c) != t)
          children(f)(c) else 0
        queue += t
      }
    }
    new AhoCorasick(children.map(_.toMap).toArray, fail,
      outs.map(_.toArray), patterns.length)
  }
}
