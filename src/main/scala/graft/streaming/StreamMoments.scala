package graft.streaming

import graft.functions.GramSumAgg
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming maintenance of the corpus moment state behind covariance /
  * PCA (v11): per batch, one `gram_sum` reduction of the BATCH adds into
  * a persisted `(n, s, g)` totals row. The buffer is a commutative
  * monoid over exact Longs, so the persisted state after ANY sequence of
  * micro-batches is bit-identical to a one-shot pass over the union —
  * incremental covariance without approximation, and the registered
  * incremental query rides the same oracle as the one-shot one.
  *
  * Scale shape per batch: the only corpus-sized work is the batch's own
  * narrow scan into map-side `gram_sum` partials; the state is ONE row of
  * O(dim²) integers (driver-side add is bounded by dim², never data —
  * the same justification as the capped-centroid reload). This is how a
  * 100 TB pipeline keeps PCA/whitening current under continuous ingest:
  * no retrain pass over the corpus, ever.
  *
  * The monitor also emits one DRIFT row per batch — the batch's mean
  * distance from the prior corpus mean (exact integer means, rounded at
  * emission) — the standard embedding-distribution-shift alarm for a
  * continuously-fed corpus.
  */
object StreamMoments {

  private val stateSchema = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false)),
    StructField("g", ArrayType(LongType, containsNull = false))))

  /** The persisted totals, if any batch has been ingested. */
  def readState(spark: SparkSession, statePath: String):
      Option[(Long, Array[Long], Array[Long])] = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.schema(stateSchema).parquet(statePath).collect()
      .headOption.map(r => (r.getLong(0),
        r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray))
  }

  /** The batch's moments `(n, Σx, Σxxᵀ)`, or None for an empty batch —
    * the one aggregation both fold paths share.
    */
  private def batchMoments(batch: DataFrame,
      vecCol: String): Option[(Long, Array[Long], Array[Long])] =
    batch.agg(GramSumAgg.column(col(vecCol)).as("_g"))
      .select(col("_g.n"), col("_g.s"), col("_g.g")).collect().headOption
      .filter(!_.isNullAt(0))
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray,
        r.getSeq[Long](2).toArray))

  /** Monoid add with a LOUD dimension guard: `zip` would silently
    * truncate mismatched arrays, permanently corrupting the persisted
    * totals (n counts all rows, s/g only the shorter prefix) — a batch
    * whose embedding dimension disagrees with the state must fail the
    * batch, not poison every later covariance.
    */
  private def addMoments(a: (Long, Array[Long], Array[Long]),
      b: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = {
    require(a._2.length == b._2.length,
      s"embedding dimension changed mid-stream: state dim ${a._2.length} " +
        s"vs batch dim ${b._2.length} — refusing to fold")
    (a._1 + b._1,
      a._2.zip(b._2).map { case (x, y) => x + y },
      a._3.zip(b._3).map { case (x, y) => x + y })
  }

  /** Fold one batch into the persisted totals (the `foreachBatch` body,
    * exposed for batch-mode ingest and tests). Returns the new totals.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, statePath: String,
      vecCol: String = "embedding"): Option[(Long, Array[Long], Array[Long])] = {
    val bm = batchMoments(batch, vecCol)
    val next = (readState(spark, statePath), bm) match {
      case (Some(st), Some(b)) => Some(addMoments(st, b))
      case (st, b) => b.orElse(st)
    }
    next.foreach { case (n, s, g) =>
      spark.createDataFrame(
        java.util.List.of(Row(n, s.toSeq, g.toSeq)), stateSchema)
        .coalesce(1).write.mode("overwrite").parquet(statePath)
    }
    next
  }

  /** Covariance rows from the persisted state — [[ingestBatch]] being a
    * monoid fold, identical to `Similarity.covarianceMatrix` over every
    * row ever ingested.
    */
  def covarianceFromState(spark: SparkSession, statePath: String): DataFrame =
    graft.pipeline.Similarity.covarianceFromMoments(
      spark.read.schema(stateSchema).parquet(statePath)
        .select(col("n"), col("s"), col("g").as("gm")))

  /** Start the standing monitor: each micro-batch folds into the state
    * and appends a drift row `(batch_id, n_batch, n_total,
    * mean_shift_c6)` — L2 distance between the batch mean and the PRIOR
    * corpus mean in 1e-3-quantized component space (null for the
    * bootstrap batch: no prior to drift from).
    */
  def momentMonitor(stream: DataFrame, statePath: String, driftPath: String,
      checkpointDir: String, vecCol: String = "embedding"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // staged landing: a replayed batch would DOUBLE-ADD into the
        // totals, so the fold is read-modify-REPLACE — the next state is
        // staged invisibly and swaps in atomically with the ledger
        // marker (the drift row installs with the same commit)
        graft.engine.BatchLedger.stagedLanding(batch.sparkSession,
            s"$checkpointDir/graft_ledger", batchId)(
          foldOnce(batch, statePath, driftPath, batchId, vecCol))
        ()
      }
      .start()

  /** The per-batch body of [[momentMonitor]], exposed for the
    * crash-injection specs: the state replace and the drift append both
    * go through `st`, so an abandoned staging leaves the totals
    * untouched.
    */
  private[graft] def foldOnce(batch: DataFrame, statePath: String,
      driftPath: String, batchId: Long, vecCol: String)(
      st: graft.engine.BatchLedger.Staging): Unit = {
        val spark = batch.sparkSession
        val prior = readState(spark, statePath)
        val bm = batchMoments(batch, vecCol)
        bm.foreach { case (nb, sb, gb) =>
          val shift = prior.map { case (n0, s0, _) =>
            val d = sb.indices.map { i =>
              sb(i).toDouble / nb / 1000.0 - s0(i).toDouble / n0 / 1000.0
            }
            BigDecimal(math.sqrt(d.map(x => x * x).sum))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          val next = prior match {
            case Some(st0) => addMoments(st0, (nb, sb, gb))
            case None => (nb, sb, gb)
          }
          spark.createDataFrame(
            java.util.List.of(Row(next._1, next._2.toSeq, next._3.toSeq)),
            stateSchema)
            .coalesce(1).write.mode("overwrite")
            .parquet(st.replaceInto(statePath))
          spark.createDataFrame(
            java.util.List.of(Row(batchId, nb, next._1,
              shift.map(java.lang.Double.valueOf).orNull)),
            StructType(Seq(
              StructField("batch_id", LongType, nullable = false),
              StructField("n_batch", LongType, nullable = false),
              StructField("n_total", LongType, nullable = false),
              StructField("mean_shift_c6", DoubleType, nullable = true))))
            .coalesce(1).write.mode("overwrite")
            .parquet(st.appendInto(driftPath))
        }
  }
}
