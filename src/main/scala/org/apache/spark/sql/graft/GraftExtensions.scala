// Same org.apache.spark.sql hosting rationale as DotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the graft native expressions, so
  * `spark.sql("... graft_dot(a, b) ...")` works alongside the Column
  * API.
  *
  * Two entry points:
  *  - deploy-time: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (standard `SparkSessionExtensions` injection at session build);
  *  - runtime: [[GraftFunctions.register]] on a live session (useful
  *    in shared-session tests and notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSignature(args(0), 16)),
    (FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (args: Seq[Expression]) => SimHash16(args(0))),
    (FunctionIdentifier("graft_gram8_fingerprint"),
      new ExpressionInfo(classOf[Gram8Fingerprint].getName,
        "graft_gram8_fingerprint"),
      (args: Seq[Expression]) => Gram8Fingerprint(args(0))))

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
