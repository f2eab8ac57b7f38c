package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{EventWeights, Vectors}
import graft.multimodal.Media
import org.apache.spark.sql.graft.TextKernels

/** Property-based coverage of the pure kernels (SURVEY §5 test plan:
  * bucket totality, weight-map totality, hash determinism/bounds). */
object KernelProps extends Properties("graft.kernels") {

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
  private val tokenList: Gen[List[String]] =
    Gen.nonEmptyListOf(token).map(_.take(200))

  private def arr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  property("minhash: K components, deterministic, each a 32-hex md5") =
    Prop.forAll(tokenList) { ts =>
      val a = TextKernels.minhash(arr(ts), 16)
      val b = TextKernels.minhash(arr(ts), 16)
      a.numElements() == 16 &&
        (0 until 16).forall { j =>
          val x = a.getUTF8String(j).toString
          x == b.getUTF8String(j).toString &&
            x.length == 32 && x.forall("0123456789abcdef".contains(_))
        }
    }

  property("minhash: adding a shingle never raises any component") =
    Prop.forAll(tokenList, token) { (ts, extra) =>
      val base = TextKernels.minhash(arr(ts), 16)
      val more = TextKernels.minhash(arr(ts :+ extra), 16)
      (0 until 16).forall { j =>
        more.getUTF8String(j).toString <= base.getUTF8String(j).toString
      }
    }

  property("simhash16: in [0, 65536) and deterministic") =
    Prop.forAll(tokenList) { ts =>
      val v = TextKernels.simhash16(arr(ts))
      v >= 0 && v < 65536 && v == TextKernels.simhash16(arr(ts))
    }

  property("charGramFingerprint: distinct grams bounded by window count") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.length >= 8)) { text =>
      val (fp, n) = TextKernels.charGramFingerprint(
        UTF8String.fromString(text))
      fp != null && n >= 1 && n <= text.length - 7
    }

  property("event weights: total function with default for unknowns") =
    Prop.forAll(Gen.alphaStr) { et =>
      EventWeights.reference.getOrElse(et, 1) match {
        case w => w >= -2 && w <= 10
      }
    }

  property("hyperplanes: deterministic ±1, differ across bits") =
    Prop.forAll(Gen.choose(0, 15)) { p =>
      val h = Vectors.hyperplane(p, 64)
      h == Vectors.hyperplane(p, 64) &&
        h.forall(v => v == 1.0 || v == -1.0) &&
        (p == 0 || h != Vectors.hyperplane(0, 64))
    }

  property("decodeStub: histogram is a distribution over 16 bins") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0, 255))) { bs =>
      val (hist, mean) = Media.decodeStub(bs.map(_.toByte).toArray)
      hist.length == 16 &&
        math.abs(hist.sum - 1.0) < 1e-9 &&
        mean >= 0.0 && mean <= 255.0
    }

  property("minhashU32: K u32 components, deterministic, monotone") =
    Prop.forAll(tokenList, token) { (ts, extra) =>
      val a = TextKernels.minhashU32(arr(ts), 16)
      val b = TextKernels.minhashU32(arr(ts), 16)
      val more = TextKernels.minhashU32(arr(ts :+ extra), 16)
      (0 until 16).forall { j =>
        val x = a.getLong(j)
        x == b.getLong(j) && x >= 0L && x < (1L << 32) &&
          more.getLong(j) <= x // adding a shingle never raises a min
      }
    }

  property("minhashU32: empty shingles → empty signature, never a " +
    "shared sentinel that would band-collide empty docs") =
    Prop {
      TextKernels.minhashU32(new GenericArrayData(Array.empty[Any]), 16)
        .numElements() == 0
    }

  property("minhash (string): empty shingles → empty signature, " +
    "matching the u32 kernel's no-shared-sentinel contract") =
    Prop {
      TextKernels.minhash(new GenericArrayData(Array.empty[Any]), 16)
        .numElements() == 0
    }

  property("minhashU32 matches a direct md5 reference model") =
    Prop.forAll(tokenList) { ts =>
      val got = TextKernels.minhashU32(arr(ts), 4)
      val md = java.security.MessageDigest.getInstance("MD5")
      def u32(bs: Array[Byte], off: Int): Long =
        ((bs(off) & 0xffL) << 24) | ((bs(off + 1) & 0xffL) << 16) |
          ((bs(off + 2) & 0xffL) << 8) | (bs(off + 3) & 0xffL)
      val expect = (0 until 4).map { j =>
        ts.map { s =>
          md.reset()
          val d = md.digest(s.getBytes("UTF-8"))
          (u32(d, 0) + j * (u32(d, 4) | 1L)) & 0xffffffffL
        }.min
      }
      (0 until 4).forall(j => got.getLong(j) == expect(j))
    }

  property("hammingCensus16: total pairs == C(n,2) over doc counts") =
    Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 65535), Gen.choose(1L, 20L)))) { raw =>
      val sc = raw.toMap.toArray // distinct sims
      val bins = TextKernels.hammingCensus16(sc.map(_._1), sc.map(_._2))
      val n = sc.map(_._2).sum
      val total = (0 to 16).map(bins.getLong).sum
      total == n * (n - 1) / 2 &&
        // diagonal lower bound: same-sim pairs all land at distance 0
        bins.getLong(0) >= sc.map(c => c._2 * (c._2 - 1) / 2).sum
    }
}
