package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared dHash core for the pixel-modality dedup queries (q198
  * images, q204 video frames): 8×8 average-pool of a grayscale grid,
  * horizontal gradient SIGN with wraparound, 64 bits as four 16-bit
  * band integers. Pool comparisons are division-free
  * (sum_a·cnt_b vs sum_b·cnt_a — exact integers), which is what lets
  * DuckDB replay the hash from generating pixel formulas while the
  * engine hashes real decoded containers.
  *
  * Scale: one keyed agg to cells (64 per image), one bounded window
  * per cell row, one keyed agg to bands — all keyed on the image id,
  * nothing grows but the image count.
  */
object Dhash {

  /** `px`: one row per pixel — grouping columns `ids` plus
    * (x, y, w, h, v). Returns (ids…, band, bv): the four 16-bit dHash
    * band values per image. */
  def bands(px: DataFrame, ids: Seq[String]): DataFrame = {
    val g = ids.map(col)
    val cells = px
      .groupBy((g :+ expr("(y*8) div h").as("gy")
        :+ expr("(x*8) div w").as("gx")): _*)
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
    val wnd = Window.partitionBy((g :+ col("gy")): _*).orderBy(col("gx"))
    cells
      .withColumn("ns", coalesce(lead(col("s"), 1).over(wnd),
        first(col("s")).over(wnd)))
      .withColumn("nc", coalesce(lead(col("c"), 1).over(wnd),
        first(col("c")).over(wnd)))
      .select((g :+ expr("(gy*8+gx) div 16").as("band")
        :+ ((col("gy") * 8 + col("gx")) % 16).as("off")
        :+ when(col("ns") * col("c") > col("s") * col("nc"), 1L)
          .otherwise(0L).as("bit")): _*)
      .groupBy((g :+ col("band")): _*)
      .agg(sum(expr("shiftleft(bit, cast(off as int))")).as("bv"))
  }

  /** The matching oracle CTE fragment: from a `<pv>` relation with
    * columns (idCols…, w, h, x, y, val) to `<out>(idCols…, band, bv)`.
    * Caller splices it into a WITH chain. */
  def bandsCteSql(pv: String, out: String, idCols: Seq[String]): String = {
    val ids = idCols.mkString(", ")
    s"""cells_$out AS (
       |  SELECT $ids, (y*8) // h AS gy, (x*8) // w AS gx,
       |    CAST(SUM(val) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM $pv GROUP BY ALL),
       |grad_$out AS (
       |  SELECT $ids, gy, gx, s, c,
       |    COALESCE(LEAD(s) OVER wnd, FIRST_VALUE(s) OVER wnd) AS ns,
       |    COALESCE(LEAD(c) OVER wnd, FIRST_VALUE(c) OVER wnd) AS nc
       |  FROM cells_$out WINDOW wnd AS (PARTITION BY $ids, gy ORDER BY gx)),
       |$out AS (
       |  SELECT $ids, band,
       |    CAST(SUM(bit << CAST(off AS INT)) AS BIGINT) AS bv
       |  FROM (
       |    SELECT $ids, (gy*8+gx) // 16 AS band, (gy*8+gx) % 16 AS off,
       |      CASE WHEN ns * c > s * nc THEN 1 ELSE 0 END AS bit
       |    FROM grad_$out)
       |  GROUP BY ALL)""".stripMargin
  }
}
