package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Freq.MGSummary
import graft.functions.Quant.QuantileSketch

/** Property-based coverage of the mergeable sketch kernels (pure JVM
  * objects — no Spark session): Misra–Gries count bounds and the MRL
  * quantile sketch's weight/rank invariants, under arbitrary streams,
  * capacities, and merge splits. The Spark-side specs (FreqSpec /
  * QuantSpec / ThetaSpec) pin the aggregate plumbing; these pin the
  * algebra the aggregates rely on for ANY data. */
object SketchProps extends Properties("graft.sketches") {

  // skewed streams: small key universe so duplicates are common
  private val stream: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 40L)).map(_.take(600))
  private val capacity: Gen[Int] = Gen.chooseNum(1, 64)
  private val qCapacity: Gen[Int] = Gen.chooseNum(2, 64)

  private def mg(k: Int, xs: Seq[Long]): MGSummary = {
    val s = new MGSummary(k); xs.foreach(s.update); s
  }

  property("MG: estimates are lower bounds within n/(k+1)") =
    Prop.forAll(stream, capacity) { (xs, k) =>
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val s = mg(k, xs)
      val bound = xs.size.toLong / (k + 1)
      s.counts.size <= k &&
        s.counts.forall { case (key, est) =>
          est <= truth(key) && truth(key) - est <= bound
        } &&
        // any key above the resolution survives in the summary
        truth.forall { case (key, t) =>
          t <= bound || s.counts.contains(key)
        }
    }

  property("MG: split-merge obeys the same bounds as one pass") =
    Prop.forAll(stream, capacity, Gen.chooseNum(0, 600)) { (xs, k, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val merged = mg(k, l); merged.mergeIn(mg(k, r))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val bound = xs.size.toLong / (k + 1)
      merged.n == xs.size.toLong &&
        merged.counts.size <= k &&
        merged.counts.forall { case (key, est) =>
          est <= truth(key) && truth(key) - est <= bound
        }
    }

  private def qs(k: Int, xs: Seq[Long]): QuantileSketch = {
    val s = new QuantileSketch(k); xs.foreach(s.update); s
  }

  private def mass(s: QuantileSketch): Long =
    s.levels.zipWithIndex.map { case (b, i) => b.size.toLong << i }.sum

  property("Quant: weight invariant and value provenance hold") =
    Prop.forAll(stream, qCapacity) { (xs, k) =>
      val s = qs(k, xs)
      val universe = xs.toSet
      s.n == xs.size.toLong && mass(s) == s.n &&
        s.levels.forall(_.forall(universe.contains))
    }

  property("Quant: split-merge conserves weight; rank error bounded") =
    Prop.forAll(stream, qCapacity, Gen.chooseNum(0, 600)) { (xs, k, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val s = qs(k, l); s.mergeIn(qs(k, r))
      val sorted = xs.sorted
      val bound = (s.levels.size.toLong * s.n) / (2L * k) + 1
      mass(s) == xs.size.toLong &&
        Seq(250000L, 500000L, 750000L).forall { p =>
          val got = s.query(p)
          val target = math.max(1L, (p * s.n + 999999L) / 1000000L)
          val lo = sorted.indexOf(got).toLong + 1
          val hi = sorted.lastIndexOf(got).toLong + 1
          lo >= 1 && {
            val err =
              if (target < lo) lo - target
              else if (target > hi) target - hi
              else 0L
            err <= bound
          }
        }
    }

  property("Quant: exact regime (n <= k) returns exact rank values") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
        .map(_.take(50))) { xs =>
      val s = qs(64, xs)
      val sorted = xs.sorted
      Seq(1L, 250000L, 500000L, 999999L).forall { p =>
        val target = math.max(1L, (p * xs.size + 999999L) / 1000000L)
        s.query(p) == sorted((target - 1).toInt)
      }
    }
}
