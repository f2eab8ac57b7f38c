package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Incremental IVF upsert: newly-arrived vectors are assigned to the
  * EXISTING coarse quantizer (the q38/q344 cell structure) and each
  * cell's running census — member count + summed assignment error —
  * is maintained as keyed streaming state, with the q302/q174 drift
  * verdict (fresh mean d² vs the seed radius) as the retrain trigger.
  * This closes the loop between the offline ANN stack (q38/q301/q203
  * build-time structures) and the streaming ingest path the
  * reference's `kafka_streams_processor.py` implies: vectors keep
  * flowing between retrains, the index keeps absorbing them into the
  * frozen cells, and the census says WHEN frozen stops being good
  * enough.
  *
  * The fold is a pair of int64 sums (count, Σd²) — commutative,
  * associative, order-independent — so the batch twin (q345) is
  * bit-exact under the DuckDB oracle and the streaming runs are
  * restart-safe: the state store holds exactly (n, Σd²) per touched
  * cell, two longs, regardless of corpus size.
  *
  * Scale: assignment is one broadcast-quantizer map pass (the q38
  * contract — the quantizer is hierarchical at 100 TB); the keyed
  * state is |touched cells| × 16 bytes; each micro-batch emits one
  * row per ACTIVE cell, never a full-census re-emit.
  */
object IvfUpsert {

  /** One assigned arrival: the vector's nearest cell and its exact
    * integer squared distance to that cell's centroid (micro unit
    * grid — the q301 convention). */
  case class VecObs(cell: Long, d2: Long)

  /** Running per-cell state: member count and summed d². */
  case class CellAgg(n: Long, sumD2: Long)

  /** Emitted census row (per active cell per micro-batch). */
  case class CellCensus(cell: Long, n_new: Long, sum_d2: Long)

  /** The shared fold — identical arithmetic in the streaming
    * processor and the batch twin, so the oracle gate on q345
    * certifies the streaming state transition itself. */
  def fold(prev: CellAgg, rows: Iterator[VecObs]): CellAgg =
    rows.foldLeft(prev)((a, o) => CellAgg(a.n + 1L, a.sumD2 + o.d2))

  /** Keyed streaming state on the v2 arbitrary-state API: ValueState
    * holds (n, Σd²) per cell; each batch folds only ITS rows in and
    * emits the refreshed census for cells it touched. */
  class UpsertProcessor
      extends StatefulProcessor[Long, VecObs, CellCensus] {
    @transient private var agg: ValueState[CellAgg] = _

    override def init(outputMode: OutputMode,
                      timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[CellAgg]("agg",
        org.apache.spark.sql.Encoders.product[CellAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[VecObs],
        tv: TimerValues): Iterator[CellCensus] = {
      val prev = if (agg.exists()) agg.get() else CellAgg(0L, 0L)
      val s = fold(prev, rows)
      agg.update(s)
      Iterator.single(CellCensus(key, s.n, s.sumD2))
    }
  }

  /** Unit micro-grid projection (k_j = ⌊e_j/‖e‖·10⁶ + ½⌋ — the
    * pqUnits contract): squared L2 on it is an exact integer and
    * monotone in cosine. Input needs (vec_id, embedding). */
  def units(vecs: DataFrame): DataFrame = {
    val e = transform(col("embedding"), x => x.cast("double"))
    val nrm = sqrt(aggregate(e, lit(0.0d), (acc, x) => acc + x * x))
    vecs.select(col("vec_id"),
      transform(e, x => floor(x / nrm * lit(1e6) + lit(0.5))
        .cast("long")).as("ku"))
  }

  private def sqDist(a: Column, b: Column): Column =
    graft.functions.Vectors.sqDistL(a, b) // native codegen'd int64 loop

  /** The quantizer as ONE broadcastable row: every (cell, centroid)
    * pair folded into a cell-sorted array. Bounded by the quantizer
    * size (the q38 contract — hierarchical at 100 TB, so this row
    * stays small at any corpus size). */
  def centroidRow(cent: DataFrame): DataFrame =
    cent.agg(array_sort(
      collect_list(struct(col("cell"), col("cku")))).as("carr"))

  /** Assign each unit-grid vector to its nearest centroid — argmin by
    * integer d² with lowest-cell ties: (vec_id, cell, d2). A pure
    * per-row fold over the broadcast centroid array (NOT a window —
    * windows don't run on streams), so the same code path serves the
    * batch twin and the stream–static join; strict `<` against the
    * cell-sorted array IS the (d2, cell) tie order. */
  def assign(ku: DataFrame, centRow: DataFrame): DataFrame =
    ku.crossJoin(broadcast(centRow))
      .select(col("vec_id"),
        aggregate(col("carr"),
          struct(lit(-1L).as("cell"), lit(Long.MaxValue).as("d2")),
          (acc, c) => {
            val d = sqDist(col("ku"), c.getField("cku"))
            when(d < acc.getField("d2"),
              struct(c.getField("cell").as("cell"), d.as("d2")))
              .otherwise(acc)
          }).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        col("best.d2").as("d2"))

  /** Run the upsert processor over assigned arrivals — streaming or
    * batch (Spark executes `transformWithState` on batch Datasets
    * with the same group semantics, which is what lets q345's DuckDB
    * oracle certify the processor). */
  def upsert(obs: Dataset[VecObs]): Dataset[CellCensus] = {
    import obs.sparkSession.implicits._
    // Touch the StreamingQueryManager: its constructor registers the
    // driver's StateStoreCoordinator RPC endpoint, which the batch
    // execution of transformWithState needs but — unlike a started
    // stream — never creates itself (executors otherwise fail with
    // CANNOT_LOAD_STATE_STORE / RpcEndpointNotFoundException).
    obs.sparkSession.streams
    obs.groupByKey(_.cell)
      .transformWithState(new UpsertProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
