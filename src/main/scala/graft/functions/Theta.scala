package graft.functions

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Theta sketch (Dasgupta/Lang/Rhodes, "A Framework for Estimating
  * Stream Expression Cardinalities", and the Apache DataSketches
  * library already on the Spark classpath) as a typed group-by-able
  * aggregate — the SET-OPERABLE distinct-count summary that completes
  * the sketch family next to [[Freq]] (heavy hitters) and [[Quant]]
  * (quantiles).
  *
  * Why not HLL: Spark's built-in `hll_sketch_agg` (what
  * [[graft.gold.IncrementalGold]] uses for mergeable distinct counts)
  * unions perfectly but cannot INTERSECT — cross-source audience
  * overlap via inclusion–exclusion over HLL estimates compounds error
  * per term and goes negative on small intersections at scale. Theta
  * sketches support union / intersection / a-not-b directly with
  * bounded relative error, which is exactly the "how many distinct
  * users do sources A and B share" profile a 100-TB pipeline asks
  * before merging or deduplicating sources.
  *
  * Scale shape: one summary per partition per group (≤ 2^lgK hashes
  * each), merged once at the exchange; the per-group output is a
  * compact byte blob, so a per-source sketch table is |sources| rows
  * regardless of corpus size, and pairwise set ops run on that
  * bounded frame (q124's self-join over the event-type enum).
  *
  * Sizing contract (the q121/q123 treatment): below 2^lgK distinct
  * keys per group the sketch retains every hash (theta = 1) and
  * estimates — including INTERSECTION estimates — are exact integers,
  * the regime the q124 oracle pins bit-for-bit. Oversized, the
  * relative standard error is ~1/√(2^lgK) and the library's
  * deterministic confidence bounds apply (ThetaSpec pins them);
  * production sizes lgK by memory and accepts that ε. */
object Theta {

  /** Serializable union buffer: the live gadget is transient; Java
    * serialization ships the compact sketch bytes (exactly what
    * crosses the wire at the exchange) and rebuilds a union around
    * them on the receiving side. */
  final class ThetaBuf(val lgK: Int) extends Serializable {
    @transient private var union: Union = newUnion()
    private def newUnion(): Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    def update(x: Long): Unit = union.update(x)
    def mergeIn(o: ThetaBuf): Unit = union.union(o.result())
    def mergeInBytes(b: Array[Byte]): Unit =
      union.union(Sketches.wrapSketch(Memory.wrap(b)))
    def result(): CompactSketch = union.getResult
    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      val b = result().toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      union = newUnion()
      union.union(Sketches.wrapSketch(Memory.wrap(b)))
    }
  }

  private class SketchAgg(lgK: Int)
      extends Aggregator[Long, ThetaBuf, Array[Byte]] {
    def zero: ThetaBuf = new ThetaBuf(lgK)
    def reduce(b: ThetaBuf, a: Long): ThetaBuf = { b.update(a); b }
    def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = { a.mergeIn(b); a }
    def finish(b: ThetaBuf): Array[Byte] = b.result().toByteArray
    def bufferEncoder: org.apache.spark.sql.Encoder[ThetaBuf] =
      Encoders.javaSerialization[ThetaBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      Encoders.BINARY
  }

  /** Per-group theta sketch of `key` (integral column, the
    * [[Freq.heavyHitters]] TRY_CAST treatment for null/garbage) as a
    * compact binary column `theta`. Pass `group = Nil` for one global
    * sketch. */
  def sketchBy(df: DataFrame, group: Seq[Column], key: Column,
               lgK: Int = 12): DataFrame = {
    val kl = key.try_cast("long")
    df.filter(kl.isNotNull)
      .groupBy(group: _*)
      .agg(udaf(new SketchAgg(lgK), Encoders.scalaLong)(kl).as("theta"))
  }

  private class UnionAgg(lgK: Int)
      extends Aggregator[Array[Byte], ThetaBuf, Array[Byte]] {
    def zero: ThetaBuf = new ThetaBuf(lgK)
    def reduce(b: ThetaBuf, a: Array[Byte]): ThetaBuf = {
      b.mergeInBytes(a); b
    }
    def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = { a.mergeIn(b); a }
    def finish(b: ThetaBuf): Array[Byte] = b.result().toByteArray
    def bufferEncoder: org.apache.spark.sql.Encoder[ThetaBuf] =
      Encoders.javaSerialization[ThetaBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      Encoders.BINARY
  }

  /** Aggregate UNION of a sketch column (compact sketch bytes in,
    * compact sketch bytes out) — the second-level merge that makes a
    * per-source sketch table incrementally maintainable: union the
    * stored sketches instead of rescanning sources (q132's running
    * prior-union; also the partition-merge a streaming sink applies).
    * Union of exact-regime inputs whose combined distinct count stays
    * below 2^lgK is itself exact. */
  def unionSketches(sketch: Column, lgK: Int = 12): Column =
    udaf(new UnionAgg(lgK), Encoders.BINARY)(sketch)

  /** Distinct-count estimate of a sketch column, rounded to long
    * (exact-regime estimates are integral by construction). */
  val estimate = udf { (a: Array[Byte]) =>
    math.round(Sketches.getEstimate(Memory.wrap(a)))
  }

  /** |A ∩ B| estimate of two sketch columns. */
  val intersectEstimate = udf { (a: Array[Byte], b: Array[Byte]) =>
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(Sketches.wrapSketch(Memory.wrap(a)))
    ix.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    math.round(ix.getResult.getEstimate)
  }

  /** |A \ B| estimate of two sketch columns. */
  val aNotBEstimate = udf { (a: Array[Byte], b: Array[Byte]) =>
    math.round(SetOperation.builder().buildANotB()
      .aNotB(Sketches.wrapSketch(Memory.wrap(a)),
        Sketches.wrapSketch(Memory.wrap(b)))
      .getEstimate)
  }
}
