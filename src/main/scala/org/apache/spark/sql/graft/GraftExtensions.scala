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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    // graft_dot(x, x) → graft_self_dot(x): one array pass, one child
    // eval; bit-identical fold (SelfDotRewrite doc)
    ext.injectOptimizerRule(_ => SelfDotRewrite)
    // native LSH bucket self-join physical operator (LshJoin.scala)
    ext.injectPlannerStrategy(_ => LshJoinStrategy)
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  /** Arity guard: SQL builders must reject calls they would otherwise
    * silently mis-parse (round-1 ADVICE: `graft_minhash(sh, 32)`
    * returned 16 components without error). */
  private def arity(name: String, args: Seq[Expression],
                    allowed: Int*): Unit =
    if (!allowed.contains(args.length))
      throw new IllegalArgumentException(
        s"$name expects ${allowed.mkString(" or ")} argument(s), " +
          s"got ${args.length}")

  /** Literal-int argument (e.g. the K in minhash(sh, K)). */
  private def litInt(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(
        s"$name expects a literal int, got ${other.sql}")
  }

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        arity("graft_dot", args, 2); DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        arity("graft_minhash", args, 1, 2)
        val k = if (args.length == 2) litInt("graft_minhash", args(1)) else 16
        MinHashSignature(args(0), k)
      }),
    (FunctionIdentifier("graft_minhash_u32"),
      new ExpressionInfo(classOf[MinHashU32].getName, "graft_minhash_u32"),
      (args: Seq[Expression]) => {
        arity("graft_minhash_u32", args, 1, 2)
        val k = if (args.length == 2) litInt("graft_minhash_u32", args(1))
                else 16
        MinHashU32(args(0), k)
      }),
    (FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (args: Seq[Expression]) => {
        arity("graft_simhash16", args, 1); SimHash16(args(0))
      }),
    (FunctionIdentifier("graft_hamming_census16"),
      new ExpressionInfo(classOf[HammingCensus16].getName,
        "graft_hamming_census16"),
      (args: Seq[Expression]) => {
        arity("graft_hamming_census16", args, 1); HammingCensus16(args(0))
      }),
    (FunctionIdentifier("graft_gram8_fingerprint"),
      new ExpressionInfo(classOf[Gram8Fingerprint].getName,
        "graft_gram8_fingerprint"),
      (args: Seq[Expression]) => {
        arity("graft_gram8_fingerprint", args, 1); Gram8Fingerprint(args(0))
      }))

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
