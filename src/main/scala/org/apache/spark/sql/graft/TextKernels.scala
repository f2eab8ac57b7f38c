// Hosted under org.apache.spark.sql (same reason as DotProduct.scala):
// the Expression wrappers need private[sql] codegen APIs.
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-hash kernels as plain JVM loops.
  *
  * Why: the declarative formulations (`array_min(transform(sh,
  * md5(...)))` etc.) are correct but their lambdas evaluate through the
  * interpreted expression path *per element*; once a session has run
  * many distinct expression classes the JIT call sites go megamorphic
  * and per-element interpretation degrades 20-30× (measured: the same
  * q23 run went 10s → 129s within one JVM). One Expression call per
  * row with the loop in ordinary compiled Scala is immune: the hot
  * loop is monomorphic JIT-compiled code regardless of what else runs.
  *
  * Hash values are byte-identical to the declarative forms (md5 of
  * UTF-8 bytes, lower-hex), so the DuckDB oracles are unchanged.
  */
object TextKernels {
  private val hexChars = "0123456789abcdef".toCharArray

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def md5Hex(bytes: Array[Byte]): Array[Byte] = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    out
  }

  /** K MinHash components: element j = min over shingles of
    * md5("<j>:" + shingle) as lower-hex. Returns array<string>.
    * Empty shingle set → EMPTY signature, matching [[minhashU32]]: a
    * K-null signature concat-banded with null-skipping concat_ws would
    * give every <shingle-size document the same empty band string and
    * false-collide them all. Element access on the empty array yields
    * SQL NULL band components, which never equi-join. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val mins = new Array[Array[Byte]](k)
    // hoist the K "<j>:" salt prefixes — rebuilding them per
    // (shingle, permutation) pair costs n*K string+byte allocations
    // in the kernel whose whole point is being the JIT-friendly path
    val salts = Array.tabulate(k) { j =>
      (java.lang.Integer.toString(j) + ":").getBytes("US-ASCII")
    }
    var si = 0
    while (si < n) {
      val s = shingles.getUTF8String(si).getBytes
      var j = 0
      while (j < k) {
        val salt = salts(j)
        val buf = new Array[Byte](salt.length + s.length)
        System.arraycopy(salt, 0, buf, 0, salt.length)
        System.arraycopy(s, 0, buf, salt.length, s.length)
        val h = md5Hex(buf)
        if (mins(j) == null || compareHex(h, mins(j)) < 0) mins(j) = h
        j += 1
      }
      si += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromBytes(m)))
  }

  /** K MinHash components from ONE md5 per shingle + K universal-hash
    * permutations: a = digest bytes 0..3 (unsigned), b = bytes 4..7
    * forced odd, perm_j = (a + j*b) mod 2^32. 16× less hashing than the
    * salted-md5-per-permutation family — the permutation quality is the
    * standard (a + j*b) universal family, and the per-shingle cost is
    * one digest + K adds. Chosen so the kernel stays fast even when the
    * JVM runs it interpreted (JIT-starvation defense, NOTES_r1 #3).
    * Returns the K minima as unsigned-32 longs. */
  def minhashU32(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    // Empty shingle set → EMPTY signature (not a sentinel): a shared
    // sentinel signature would make every empty document band-collide
    // with every other as a false near-duplicate. Element access on
    // the empty array yields SQL NULL band components, which never
    // equi-join. (r2 ADVICE item.)
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, -1L) // sentinel: no shingles seen yet
    val md = mdLocal.get()
    var si = 0
    while (si < n) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(si).getBytes)
      val a = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val b = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) | 1L
      var j = 0
      while (j < k) {
        val v = (a + j * b) & 0xffffffffL
        if (mins(j) == -1L || v < mins(j)) mins(j) = v
        j += 1
      }
      si += 1
    }
    new GenericArrayData(mins)
  }

  /** Full Hamming-distance pair census over a distinct-(simhash, count)
    * table: bins(d) = number of document PAIRS at distance d, counting
    * cu*cv for u<v and C(cu,2) on the diagonal. The input is bounded by
    * the 16-bit signature space (≤65,536 rows) by construction, so the
    * O(D²) loop is a bounded constant (≤2.1G popcount+add, ~seconds)
    * at ANY corpus size — unlike the θ-join formulation this never
    * plans a BroadcastNestedLoopJoin. */
  def hammingCensus16(sims: Array[Int], cnts: Array[Long]): ArrayData = {
    val bins = new Array[Long](17)
    val d = sims.length
    var i = 0
    while (i < d) {
      val ci = cnts(i)
      bins(0) += ci * (ci - 1) / 2
      var j = i + 1
      while (j < d) {
        bins(java.lang.Integer.bitCount(sims(i) ^ sims(j))) += ci * cnts(j)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(bins)
  }

  private def compareHex(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return (a(i) & 0xff) - (b(i) & 0xff)
      i += 1
    }
    0
  }

  /** 16-bit SimHash over the token multiset: per-bit ±1 majority vote
    * on bits of the first 4 hex chars (= first 2 digest bytes) of each
    * token's md5. Matches the declarative hex4 formulation exactly. */
  def simhash16(tokens: ArrayData): Int = {
    val votes = new Array[Int](16)
    val n = tokens.numElements()
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(i).getBytes)
      val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var p = 0
      while (p < 16) {
        if (((v >> p) & 1) == 1) votes(p) += 1 else votes(p) -= 1
        p += 1
      }
      i += 1
    }
    var out = 0
    var p = 0
    while (p < 16) { if (votes(p) > 0) out |= 1 << p; p += 1 }
    out
  }

  /** Rolling char-8-gram fingerprint: (min md5 hex, distinct-gram
    * count) over all 8-byte substrings. Byte-windows equal char
    * windows for the ASCII corpus; the declarative form uses substr on
    * chars — both engines agree because the texts are ASCII. */
  def charGramFingerprint(text: UTF8String): (UTF8String, Int) = {
    val bytes = text.getBytes
    if (bytes.length < 8) return (null, 0)
    var minHex: Array[Byte] = null
    // the gram IS 8 bytes: pack it into a primitive long for the
    // distinct count instead of retaining a 32-char hex String per
    // window (~50x the input in live objects on a large doc); the
    // md5 is still computed for the min-fingerprint. Distinct grams
    // == distinct gram-md5s barring a digest collision, which is
    // also what the declarative hex form counts.
    val distinct = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + 8 <= bytes.length) {
      val gram = java.util.Arrays.copyOfRange(bytes, i, i + 8)
      val h = md5Hex(gram)
      if (minHex == null || compareHex(h, minHex) < 0) minHex = h
      var packed = 0L
      var b = 0
      while (b < 8) { packed = (packed << 8) | (gram(b) & 0xffL); b += 1 }
      distinct.add(packed)
      i += 1
    }
    (UTF8String.fromBytes(minHex), distinct.size)
  }
}

/** `minhash(shingles, k)`: array<string> of K MinHash components. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.minhash($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `minhash_u32(shingles, k)`: array<long> of K universal-hash MinHash
  * components (one md5 per shingle; see [[TextKernels.minhashU32]]).
  * An EMPTY shingle array yields an empty signature array (so empty
  * documents can never band-collide); null input yields null. */
case class MinHashU32(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "graft_minhash_u32"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashU32(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.minhashU32($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `hamming_census16(array<struct<sim,cnt>>)`: 17-bin pair-count
  * histogram by Hamming distance (see [[TextKernels.hammingCensus16]]).
  * CodegenFallback: evaluated once per query (single aggregated row). */
case class HammingCensus16(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "graft_hamming_census16"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(a, b)), _)
          if a.dataType == IntegerType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<struct<int,bigint>>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sims = new Array[Int](n)
    val cnts = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      sims(i) = row.getInt(0)
      cnts(i) = row.getLong(1)
      i += 1
    }
    TextKernels.hammingCensus16(sims, cnts)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `simhash16(tokens)`: 16-bit SimHash of the token multiset. */
case class SimHash16(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash16"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash16(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.simhash16($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `gram8_fingerprint(text)`: struct(fingerprint string,
  * n_distinct_grams int) over rolling char-8-grams. CodegenFallback:
  * one kernel call per row, so the fallback costs nothing measurable. */
case class Gram8Fingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("fingerprint", StringType),
    StructField("n_distinct_grams", IntegerType)))
  override def prettyName: String = "graft_gram8"

  override def nullSafeEval(input: Any): Any = {
    val (fp, n) = TextKernels.charGramFingerprint(
      input.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.InternalRow(fp, n)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object GraftText {
  def minhash(shingles: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(shingles), k))
  def minhashU32(shingles: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashU32(ExpressionUtils.expression(shingles), k))
  def hammingCensus16(simCnts: Column): Column =
    ExpressionUtils.column(
      HammingCensus16(ExpressionUtils.expression(simCnts)))
  def simhash16(tokens: Column): Column =
    ExpressionUtils.column(
      SimHash16(ExpressionUtils.expression(tokens)))
  def gram8Fingerprint(text: Column): Column =
    ExpressionUtils.column(
      Gram8Fingerprint(ExpressionUtils.expression(text)))
}
