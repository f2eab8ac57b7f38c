package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.TopK.TopKBuf

/** Property-based coverage of the round-6 pure-JVM kernels: the
  * bounded top-k buffer's exactness and merge algebra under arbitrary
  * streams and splits, its compact serialization round-trip, and the
  * milli-nat quantizer's monotonicity. The Spark-side specs (TopKSpec
  * / LangModelSpec) pin the aggregate plumbing; these pin the algebra
  * for ANY data. */
object TopKProps extends Properties("graft.topk") {

  // duplicate-heavy (ord, id) streams; ids unique via index
  private val stream: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)).map(_.take(400))
  private val capacity: Gen[Int] = Gen.chooseNum(1, 32)

  private def pairs(xs: List[Long]): Seq[(Long, Long)] =
    xs.zipWithIndex.map { case (v, i) => (v, i.toLong) }

  private def build(k: Int, ps: Seq[(Long, Long)]): TopKBuf = {
    val b = new TopKBuf(k); ps.foreach(b.insert); b
  }

  property("buffer holds exactly the k lexicographically-smallest pairs") =
    Prop.forAll(stream, capacity) { (xs, k) =>
      val ps = pairs(xs)
      val got = build(k, ps).set.toSeq
      got == ps.sorted.take(k)
    }

  property("split-merge equals one pass for any cut") =
    Prop.forAll(stream, capacity, Gen.chooseNum(0, 400)) { (xs, k, cut) =>
      val ps = pairs(xs)
      val (l, r) = ps.splitAt(cut % (ps.size + 1))
      val merged = build(k, l); merged.mergeIn(build(k, r))
      merged.set.toSeq == build(k, ps).set.toSeq
    }

  property("serialization round-trips the buffer exactly") =
    Prop.forAll(stream, capacity) { (xs, k) =>
      val b = build(k, pairs(xs))
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.ObjectOutputStream(bos)
      out.writeObject(b); out.close()
      val in = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val back = in.readObject().asInstanceOf[TopKBuf]
      back.k == b.k && back.set.toSeq == b.set.toSeq &&
        // compactness: header + 2 longs per entry stays far below the
        // ~1.5 KB default-serialization blob this encoding replaced
        bos.size() <= 200 + 16 * b.set.size
    }

  property("mnat quantizer is monotone non-decreasing on positives") =
    Prop.forAll(Gen.chooseNum(1L, 1000000L), Gen.chooseNum(1L, 1000000L)) {
      (a, b) =>
        def mn(k: Long): Long =
          math.floor(math.log(k.toDouble) * 1000).toLong
        (a <= b) == (mn(a) <= mn(b)) || mn(a) == mn(b)
    }
}
