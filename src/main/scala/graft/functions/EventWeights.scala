package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-type → engagement-weight mapping (SURVEY §2.2 P11).
  *
  * Reference weights at `main_pipeline.py:229-235` (rich vocabulary) and
  * `transformations/clisckstream_transformer.py:75-80` (legacy). Built as
  * a literal-map lookup so Catalyst constant-folds it; unknown types get
  * the reference's default weight 1.
  */
object EventWeights {
  /** Canonical weights from `main_pipeline.py:230-235`. */
  val reference: Map[String, Int] = Map(
    "view" -> 1, "click" -> 2, "add_to_cart" -> 5, "purchase" -> 10,
    "remove_from_cart" -> -2, "search" -> 3, "recommendation_clicked" -> 4)

  /** Weights adapted to the testdata `events.event_type` vocabulary
    * (view/click/purchase/signup/error), same spirit.
    */
  val testdata: Map[String, Int] = Map(
    "view" -> 1, "click" -> 2, "purchase" -> 10, "signup" -> 3,
    "error" -> -2)

  def weight(eventType: Column, weights: Map[String, Int],
             default: Int = 1): Column = {
    val expr = weights.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(eventType === k, lit(v)).otherwise(acc)
    }
    expr
  }
}
