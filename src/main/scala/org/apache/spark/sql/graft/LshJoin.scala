// Hosted under org.apache.spark.sql (like DotProduct.scala) for access
// to Dataset.ofRows and the Catalyst/execution internals a custom
// operator needs.
package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator LSH bucket self-join (SURVEY §4's "custom
  * `SparkPlan` for an LSH-join" — the one operator family where a
  * native physical node beats composing built-ins).
  *
  * Semantics: for every bucket value, emit all ordered row pairs
  * (a, b) within the bucket with `a.id < b.id` (by the id sort), as
  * one output row carrying both sides' columns prefixed `a_` / `b_`.
  * Null buckets emit nothing; buckets larger than `maxBucket` emit
  * nothing (the explicit quadratic-blowup cap — same contract as the
  * co-occurrence basket cap, and the knob a 100-TB run sizes from its
  * bucket histogram).
  *
  * Why a native operator instead of `df.as("x").join(df.as("y"), ...)`:
  * the self-join form shuffles and sorts the SAME input twice (two
  * exchange subtrees) and runs the SortMergeJoin buffering machinery,
  * while this node declares `ClusteredDistribution(bucket)` +
  * `SortOrder(bucket, id)` and gets ONE shuffle + ONE sort from
  * `EnsureRequirements`, then streams each bucket group once,
  * emitting pairs directly. PlanSpec asserts the single-exchange
  * shape on q47.
  */
case class LshBucketJoin(bucketName: String, idName: String,
                         maxBucket: Int, output: Seq[Attribute],
                         child: LogicalPlan) extends UnaryNode {
  // every child column feeds the pair output — nothing may be pruned
  override def references: AttributeSet = child.outputSet
  // the pair columns are minted here, not read from the child
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class LshBucketJoinExec(bucketName: String, idName: String,
                             maxBucket: Int, output: Seq[Attribute],
                             child: SparkPlan) extends UnaryExecNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  private def bucketAttr = child.output(
    child.output.indexWhere(_.name == bucketName))
  private def idAttr = child.output(
    child.output.indexWhere(_.name == idName))

  // One hash shuffle on the bucket, one sort by (bucket, id):
  // EnsureRequirements plans both; the operator itself is a single
  // streaming pass over each sorted partition.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(bucketAttr)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(bucketAttr, Ascending),
      SortOrder(idAttr, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    val bucketOrd = child.output.indexWhere(_.name == bucketName)
    val bucketType = bucketAttr.dataType
    val cap = maxBucket
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitionsInternal { iter =>
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val buf = iter.buffered
      // Next bucket group as COPIED rows (the input iterator reuses
      // its row object); an oversized group is drained but returns
      // empty — it contributes no pairs, per the cap contract.
      def nextGroup(): ArrayBuffer[InternalRow] = {
        while (buf.hasNext && buf.head.isNullAt(bucketOrd)) buf.next()
        if (!buf.hasNext) null
        else {
          val first = buf.next().copy()
          val b = first.get(bucketOrd, bucketType)
          val g = ArrayBuffer(first)
          var size = 1
          while (buf.hasNext && !buf.head.isNullAt(bucketOrd) &&
            java.util.Objects.equals(
              buf.head.get(bucketOrd, bucketType), b)) {
            size += 1
            if (size <= cap) g += buf.next().copy() else buf.next()
          }
          if (size > cap) g.clear()
          g
        }
      }
      new Iterator[InternalRow] {
        private var pairs: Iterator[InternalRow] = Iterator.empty
        private def refill(): Boolean = {
          var g = nextGroup()
          while (g != null && g.length < 2) g = nextGroup()
          if (g == null) false
          else {
            val gg = g
            pairs = (0 until gg.length - 1).iterator.flatMap { a =>
              (a + 1 until gg.length).iterator
                .map(b => proj(joined(gg(a), gg(b))))
            }
            true
          }
        }
        override def hasNext: Boolean =
          pairs.hasNext || (refill() && pairs.hasNext)
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("LshBucketJoin")
          pairs.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Planner strategy mapping the logical node to its physical form —
  * injected by [[GraftExtensions]]. */
object LshJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LshBucketJoin(bn, in, mb, out, child) =>
      LshBucketJoinExec(bn, in, mb, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the operator. */
object LshJoin {
  /** All within-bucket row pairs of `df` with `a.<idCol> < b.<idCol>`,
    * columns prefixed `a_` / `b_`. Requires the graft extensions
    * (strategy injection) on the session. `maxBucket` bounds the
    * per-bucket quadratic fan-out; oversized buckets emit no pairs. */
  def bucketPairs(df: DataFrame, bucketCol: String, idCol: String,
                  maxBucket: Int = 100000): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    require(analyzed.output.exists(_.name == bucketCol),
      s"no column $bucketCol")
    require(analyzed.output.exists(_.name == idCol), s"no column $idCol")
    val out =
      analyzed.output.map(a =>
        AttributeReference("a_" + a.name, a.dataType, a.nullable)()) ++
        analyzed.output.map(a =>
          AttributeReference("b_" + a.name, a.dataType, a.nullable)())
    ClassicDataset.ofRows(
      df.sparkSession.asInstanceOf[ClassicSession],
      LshBucketJoin(bucketCol, idCol, maxBucket, out, analyzed))
  }
}
