package graft.streaming

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming quality gate — the score-many half of the train-once/
  * score-many model split (t23b/t24b), run where production actually runs
  * it: inside the continuous-ingest loop. Each micro-batch is scored
  * against the PREBUILT bigram-LM table
  * ([[graft.pipeline.TextAnalysis.buildLmModel]]) plus the zero-shuffle
  * quality heuristics, then routed: accepted docs append to the corpus
  * path, rejected docs append to a quarantine path WITH their reject
  * reason (curation pipelines audit the rejects; silently dropping them
  * loses the signal).
  *
  * Scale shape per batch: the heuristic gate is a narrow codegen'd pass;
  * the LM score is a vocab-keyed join against the stored model (no
  * corpus-wide training stages in any batch's plan — the whole point of
  * the split); cost tracks the BATCH, never the corpus. The model table
  * is read per batch, so a retrain lands on the next micro-batch without
  * restarting the query.
  *
  * Modeled on the reference's persistent-query loop (continuous SQL over
  * an append stream, `files/ksqldb-cli/all.sql`): the gate is one
  * standing query whose output tables grow as input arrives.
  */
object StreamScore {

  /** The gate DECISION as a batch transform: input rows + `lm_c6` +
    * `reject_reason` (null = accepted). The streaming loop applies
    * exactly this, so batch parity is a test, not a hope.
    *
    * Reason precedence: heuristic quality failures first (cheapest,
    * narrow), then `oov` (no bigram of the doc appears in the model —
    * the score is undefined, and production quarantines rather than
    * guesses), then `low_lm` (mean bigram log-prob in micro-units below
    * `minLmC6`).
    */
  def gateScores(spark: org.apache.spark.sql.SparkSession, modelPath: String,
      batch: DataFrame, minLmC6: Long): DataFrame = {
    val lm = TextAnalysis.ngramLmScoreIndexed(spark, modelPath, batch)
      .select(col("doc_id"), col("lm_c6"))
    val q = TextAnalysis.qualityReason(col("text"))
    batch.join(lm, Seq("doc_id"), "left")
      .withColumn("reject_reason",
        when(q =!= "ok", q)
          .when(col("lm_c6").isNull, lit("oov"))
          .when(col("lm_c6") < minLmC6, lit("low_lm")))
  }

  /** [[gateScores]] extended with the DSIR target-affinity model
    * ([[graft.pipeline.TextAnalysis.buildDsirModel]]): docs that clear
    * the quality + LM gates but whose importance weight under the
    * prebuilt log-ratio model falls below `minDsirC6` reject as
    * `off_target` — the curation loop's data-selection filter, running
    * where production runs it. Per batch this adds one broadcast bucket
    * join (the t29b scoring shape); no distribution fit in any batch's
    * plan. A doc with no scorable text (null/absent features) also
    * rejects as `off_target` — an importance gate cannot vouch for what
    * it cannot score, though the heuristic gate catches those first on
    * real data.
    */
  def gateScoresDsir(spark: org.apache.spark.sql.SparkSession,
      lmModelPath: String, dsirModelPath: String, batch: DataFrame,
      minLmC6: Long, minDsirC6: Long): DataFrame = {
    // weight per DISTINCT doc: dsir_c6 is a per-doc_id SUM, so an
    // at-least-once source replaying a doc WITHIN one micro-batch would
    // double its weight and flip the off_target decision (the LM score
    // is a mean — duplication-invariant — and needs no dedup)
    val w = TextAnalysis.dsirWeightsIndexed(spark, dsirModelPath,
      batch.dropDuplicates("doc_id"))
      .select(col("doc_id"), col("dsir_c6"))
    gateScores(spark, lmModelPath, batch, minLmC6)
      .join(w, Seq("doc_id"), "left")
      .withColumn("reject_reason",
        coalesce(col("reject_reason"),
          when(col("dsir_c6").isNull || col("dsir_c6") < minDsirC6,
            lit("off_target"))))
  }

  /** Per-side gate thresholds CALIBRATED from a scored slice — the fix
    * for the failure mode StreamBench measured in r11: a fixed absolute
    * cut-off tuned against one model vocabulary rejects 100 % after the
    * model retrains on a grown corpus (more vocabulary → lower per-doc
    * log-probs), silently degenerating the gate. Calibration re-derives
    * the cut-offs FROM the current models: score `slice` with both gates
    * open, then take the discrete `quantile` of each side's non-null
    * scores. Output is ONE row `(quantile, min_lm_c6, min_dsir_c6,
    * n_lm_scored, n_dsir_scored)` — integer thresholds plus the sample
    * sizes they rest on, carried as DATA next to the models (the DSIR
    * bucket-count pattern: a threshold that can disagree with the model
    * it was fit against is the silent-misroute class).
    *
    * The quantile is an EXPLICIT rank rule, not a builtin: threshold =
    * the `ceil(q·n)`-th smallest non-null score (ties share a value, so
    * the result is deterministic) — chosen over interpolating
    * `percentile` because it returns an OBSERVED integer score and
    * replays exactly in any SQL engine (`row_number` over the scored
    * slice; t32's DuckDB oracle does precisely that). By construction
    * ~`(1-q)` of calibration-like docs clear each side.
    *
    * Scale shape: the slice is calibration-sized (a micro-batch or a
    * sample — a 100 TB deployment calibrates on a sample, not the
    * corpus); scoring it is the per-batch gate shape, and the rank pass
    * is a single-column sort of |slice| rows. The window is
    * deliberately unpartitioned: n is the WHOLE slice's count, and the
    * slice is driver-bounded by contract.
    */
  def calibrateGate(spark: org.apache.spark.sql.SparkSession,
      lmModelPath: String, dsirModelPath: String, slice: DataFrame,
      quantile: Double = 0.5): DataFrame = {
    require(quantile > 0 && quantile <= 1, s"quantile must be in (0,1]: $quantile")
    val scored = gateScoresDsir(spark, lmModelPath, dsirModelPath, slice,
      Long.MinValue, Long.MinValue)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def disc(c: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
        scored.filter(col(c).isNotNull)
          .select(col(c), row_number().over(w).as("_rn"),
            count(lit(1)).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy()).as("_n"))
          .filter(col("_rn") === ceil(lit(quantile) * col("_n")).cast("long"))
          .select(col(c).as("_th"), col("_n"))
      }
      def one(c: String): org.apache.spark.sql.Row =
        disc(c).collect() match {
          case Array(r) => r
          // empty = NO doc in the slice produced a score on this side —
          // a threshold fit on nothing would silently reject everything,
          // exactly the degenerate gate calibration exists to prevent
          case _ => throw new IllegalArgumentException(
            s"calibrateGate: calibration slice has no non-null $c scores " +
              "(slice too small, or disjoint from the model vocabulary)")
        }
      val lm = one("lm_c6")
      val ds = one("dsir_c6")
      import spark.implicits._
      Seq((quantile, lm.getLong(0), ds.getLong(0), lm.getLong(1),
        ds.getLong(1)))
        .toDF("quantile", "min_lm_c6", "min_dsir_c6", "n_lm_scored",
          "n_dsir_scored")
    } finally scored.unpersist(blocking = false)
  }

  /** [[calibrateGate]] persisted next to the models: the thresholds ride
    * as a one-row parquet the standing gate re-reads per batch, so a
    * recalibration (after a model retrain) lands on the next micro-batch
    * without restarting the query — the same hot-swap contract the model
    * tables already have.
    *
    * The artifact is VERSIONED (`v<k>/` + completion marker), never
    * overwritten in place: a plain `mode("overwrite")` deletes before it
    * commits, so a micro-batch reading in that window would crash the
    * standing query — the hot-swap claim would be exactly the crash
    * window. Writers land `v<k+1>` beside the live version, mark it
    * complete, then prune all but the two newest COMPLETE versions
    * (deferred, the compaction discipline: the one version a reader can
    * be holding is never the one being deleted). Readers take the
    * newest complete version, so a half-written recalibration is
    * invisible until its marker lands.
    */
  def writeGateThresholds(spark: org.apache.spark.sql.SparkSession,
      lmModelPath: String, dsirModelPath: String, slice: DataFrame,
      thresholdsPath: String, quantile: Double = 0.5): Unit = {
    val root = new org.apache.hadoop.fs.Path(thresholdsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = completeVersions(fs, root).lastOption
      .map(_._1 + 1).getOrElse(1L)
    val dir = new org.apache.hadoop.fs.Path(root, f"v$next%019d")
    calibrateGate(spark, lmModelPath, dsirModelPath, slice, quantile)
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    fs.create(new org.apache.hadoop.fs.Path(dir, CompleteMarker), true)
      .close()
    completeVersions(fs, root).dropRight(2)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** The newest COMPLETE thresholds version as one Row
    * `(min_lm_c6, min_dsir_c6)` — the read side of the versioned
    * [[writeGateThresholds]] artifact.
    */
  def readGateThresholds(spark: org.apache.spark.sql.SparkSession,
      thresholdsPath: String): org.apache.spark.sql.Row = {
    val root = new org.apache.hadoop.fs.Path(thresholdsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, dir) = completeVersions(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(
        s"no complete gate-thresholds version under $thresholdsPath — " +
          "run writeGateThresholds first"))
    spark.read.parquet(dir.toString)
      .select("min_lm_c6", "min_dsir_c6").head()
  }

  private val CompleteMarker = "_GRAFT_COMPLETE"

  /** Complete `v<k>` version dirs under `root`, ascending by k. */
  private def completeVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, CompleteMarker)))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath))
      .sortBy(_._1)

  /** The CALIBRATED standing gate: [[curationGate]]'s landing protocol,
    * but the per-side thresholds come from the [[writeGateThresholds]]
    * artifact instead of caller constants — read per batch (one-row
    * scan) like the models themselves, so thresholds can never be stale
    * relative to an operator that recalibrates on retrain.
    */
  def curationGateCalibrated(stream: DataFrame, lmModelPath: String,
      dsirModelPath: String, thresholdsPath: String, acceptPath: String,
      rejectPath: String, checkpointDir: String): StreamingQuery =
    gateLoop(stream, acceptPath, rejectPath, checkpointDir,
      (spark, batch) => {
        val th = readGateThresholds(spark, thresholdsPath)
        gateScoresDsir(spark, lmModelPath, dsirModelPath, batch,
          th.getLong(0), th.getLong(1))
      })

  /** Start the standing gate: accepted rows (with their `lm_c6`) append
    * to `acceptPath`, rejects (with `reject_reason`) to `rejectPath`.
    */
  def qualityGate(stream: DataFrame, modelPath: String, acceptPath: String,
      rejectPath: String, checkpointDir: String,
      minLmC6: Long = -14000000L): StreamingQuery =
    gateLoop(stream, acceptPath, rejectPath, checkpointDir,
      (spark, batch) => gateScores(spark, modelPath, batch, minLmC6))

  /** The DSIR-extended standing gate: [[qualityGate]]'s landing
    * protocol with [[gateScoresDsir]] as the per-batch decision.
    */
  def curationGate(stream: DataFrame, lmModelPath: String,
      dsirModelPath: String, acceptPath: String, rejectPath: String,
      checkpointDir: String, minLmC6: Long = -14000000L,
      minDsirC6: Long = Long.MinValue): StreamingQuery =
    gateLoop(stream, acceptPath, rejectPath, checkpointDir,
      (spark, batch) =>
        gateScoresDsir(spark, lmModelPath, dsirModelPath, batch,
          minLmC6, minDsirC6))

  /** Shared landing protocol of the standing gates: ONE definition so
    * the staged-landing/unpersist discipline cannot drift per-gate.
    */
  private def gateLoop(stream: DataFrame, acceptPath: String,
      rejectPath: String, checkpointDir: String,
      decide: (org.apache.spark.sql.SparkSession, DataFrame) => DataFrame):
      StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // staged landing: both splits become visible atomically with the
        // ledger marker — a crash can never land a batch's accepts
        // without its rejects (or twice)
        graft.engine.BatchLedger.stagedLanding(spark,
            s"$checkpointDir/graft_ledger", batchId) { st =>
          val scored = decide(spark, batch)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // finally: a failed write must not strand the cached relation
          // (each supervised retry would persist another copy)
          try {
            scored.filter(col("reject_reason").isNull).drop("reject_reason")
              .write.mode("overwrite").parquet(st.appendInto(acceptPath))
            scored.filter(col("reject_reason").isNotNull)
              .write.mode("overwrite").parquet(st.appendInto(rejectPath))
          } finally scored.unpersist(blocking = false)
        }
        ()
      }
      .start()
}
