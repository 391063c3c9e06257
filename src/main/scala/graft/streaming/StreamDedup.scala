package graft.streaming

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the online twin of
  * [[graft.pipeline.Dedup.exact]] for continuous ingest.
  *
  * `dropDuplicatesWithinWatermark` keys state by the normalized-text md5
  * fingerprint: the store holds one 128-bit fingerprint per distinct
  * document seen within the watermark horizon and evicts as the watermark
  * advances, so state is bounded by the dedup window's distinct volume —
  * not by stream lifetime. (Unbounded-horizon dedup at 100 TB/day is a
  * batch join against a fingerprint index instead — see
  * [[graft.pipeline.Dedup.decontaminate]].) Emission is append-mode and
  * immediate: the first arrival of a fingerprint passes through, later
  * arrivals within the horizon drop.
  */
object StreamDedup {

  def exact(stream: DataFrame, watermarkDelay: String = "10 minutes",
      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("_fp", md5(TextAnalysis.normalized(col(textCol))))
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** The per-batch body of [[incrementalNearDup]], exposed for the
    * crash-injection specs: every side effect goes through `st`, so a
    * caller (or crash) abandoning the staging leaves nothing visible.
    */
  private[graft] def ingestOnce(batch: DataFrame, corpusPath: String,
      idCol: String, textCol: String, threshold: Double,
      dedupWithinBatch: Boolean)(
      st: graft.engine.BatchLedger.Staging): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keptIds =
      if (fs.exists(path))
        Dedup.incrementalSurvivors(spark.read.parquet(corpusPath), batch,
          idCol, textCol, threshold, dedupWithinBatch)
      else if (dedupWithinBatch) // first batch: corpus empty, only the
        Dedup.nearDupSurvivors(  // intra-batch election applies
          batch.select(col(idCol)),
          Dedup.minhashPairs(batch, idCol, textCol, threshold = threshold),
          idCol)
      else batch.select(col(idCol))
    batch.join(keptIds, Seq(idCol), "left_semi")
      .write.mode("overwrite").parquet(st.appendInto(corpusPath))
  }

  /** Streaming NEAR-dup dedup — the continuous-ingest twin of
    * [[graft.pipeline.Dedup.incrementalMinhashPairs]]: each micro-batch
    * runs the batch×corpus band join against the accumulated corpus
    * (never corpus×corpus — re-pairing what previous batches already
    * deduplicated), resolves intra-batch near-dup elections
    * ([[graft.pipeline.Dedup.incrementalSurvivors]] with
    * `dedupWithinBatch`), and appends ONLY the accepted docs to
    * `corpusPath`. The corpus parquet is the dedup state itself, so state
    * never lives in the state store and restart resumes from whatever the
    * corpus already holds; the append lands EXACTLY ONCE through
    * [[graft.engine.BatchLedger.stagedLanding]] — accepted rows are
    * staged invisibly, the ledger marker is the single commit point, and
    * a crash on either side of it replays the whole batch or completes
    * the pending install, never both.
    *
    * At 100 TB the `corpusPath` side of the band join is the
    * materialized banded-signature table described in
    * [[graft.pipeline.Dedup.incrementalMinhashPairs]]'s Scale note; here
    * the signatures derive in-plan from the corpus parquet, which is the
    * same join shape minus the one-time persist.
    */
  def incrementalNearDup(stream: DataFrame, corpusPath: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", threshold: Double = 0.8,
      dedupWithinBatch: Boolean = true):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.engine.BatchLedger.stagedLanding(batch.sparkSession,
            s"$checkpointDir/graft_ledger", batchId)(
          ingestOnce(batch, corpusPath, idCol, textCol, threshold,
            dedupWithinBatch))
        ()
      }
      .start()

  /** [[incrementalNearDup]] against a MATERIALIZED banded-signature index
    * ([[graft.pipeline.Dedup.buildBandedIndex]]) — the production
    * continuous-ingest loop: each micro-batch probes the bucketed band
    * table (corpus side joins with no exchange), accepted docs append to
    * the corpus parquet AND their band rows + shingle sets append to the
    * index, so the next batch's probe sees them without recomputing
    * anything corpus-sized. The first batch bootstraps the index from its
    * own survivors; pass a pre-built index to start from an existing
    * corpus.
    *
    * Crash boundary — EXACTLY ONCE in steady state: corpus append, band
    * rows, shingle sets, and containment postings all stage invisibly
    * ([[graft.engine.BatchLedger.stagedLanding]];
    * [[graft.engine.Layout.stageBucketedAppend]] for the bucketed
    * tables), the ledger marker is the single commit point, and install
    * is completed on replay if a crash interrupts it — accepted docs
    * become visible in ALL the batch's destinations or none
    * (crash-injection-tested in StreamingTutorialSpec). Only the
    * BOOTSTRAP batch is at-least-once: it lands with direct writes in a
    * loss-proof order (see the body) because a table build cannot stage
    * against a table that does not exist; its worst crash outcome is
    * duplicate corpus rows for that one batch, never loss. A PRE-BUILT
    * index (the "start from an existing corpus" mode) skips the
    * bootstrap entirely, so those loops are exactly-once from their
    * first batch.
    *
    * `compactEvery` > 0 folds the band table back to one file per bucket
    * every that-many batches ([[graft.engine.Layout.compactBucketed]]) —
    * append accretion is the price of the exchange-free corpus join, and
    * at micro-batch frequency it must be repaid periodically.
    *
    * LSH parameters come from the index's OWN persisted spec
    * ([[graft.pipeline.Dedup.readBandSpec]], written at build time): a
    * pre-built index with non-default k/bands/seed probes and appends
    * with ITS values — defaults here apply only when bootstrapping a new
    * index (or probing a legacy one with no sidecar, where `spec` is the
    * caller's last-resort override).
    *
    * `containTable` adds the CONTAINMENT gate: a posting index
    * ([[graft.pipeline.Dedup.buildContainmentIndex]], sharing this
    * loop's shingle store) probed per batch, so a doc quoting — or
    * quoted by — corpus content is rejected even though its symmetric
    * Jaccard clears the near-dup bar; accepted docs' postings append so
    * later batches see them.
    */
  def incrementalNearDupIndexed(stream: DataFrame, indexTable: String,
      shPath: String, corpusPath: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, dedupWithinBatch: Boolean = true,
      compactEvery: Int = 0, spec: Dedup.BandSpec = Dedup.BandSpec(),
      containTable: Option[String] = None,
      containThreshold: Double = 0.9, containMaxDf: Int = 5,
      manifestedCorpus: Boolean = false):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val landed = graft.engine.BatchLedger.stagedLanding(spark,
            s"$checkpointDir/graft_ledger", batchId)(
          indexedIngestOnce(batch, indexTable, shPath, corpusPath, idCol,
            textCol, threshold, dedupWithinBatch, spec, containTable,
            containThreshold, containMaxDf, manifestedCorpus))
        // install lands table files by RENAME, which no Spark write path
        // invalidates: without an explicit table refresh the next probe —
        // and worse, the compaction below — reads a STALE listing, and
        // compaction's drop-and-rewrite would destroy the just-installed
        // rows it never saw (path-level refresh does not reach catalog
        // tables)
        if (landed) {
          if (spark.catalog.tableExists(indexTable))
            spark.catalog.refreshTable(indexTable)
          containTable.foreach(ct =>
            if (spark.catalog.tableExists(ct)) spark.catalog.refreshTable(ct))
        }
        // every append adds up to one file per bucket (and, in
        // manifested mode, one corpus segment); at micro-batch frequency
        // that accretion degrades scans — the compaction POLICY is
        // evaluated every `compactEvery` batches (0 = caller compacts),
        // and it is SIZE-TIERED (r15, closes the r14 compact-term
        // finding): a full fold is O(corpus) and fixed-cadence firing
        // made the per-batch amortized bill GROW with the corpus
        // (STREAMBENCH_r14 compact_big_over_small = 2.11 at 21× state);
        // the tiered gates fold fully only when accretion reaches a
        // fixed fraction of the base, so the amortized cost per ingested
        // row is O(1). Between full folds the manifested corpus still
        // pays the O(accretion) TAIL fold each cadence (segment count
        // stays bounded), and the bucketed tables accrete bounded file
        // counts (the gates' maxFilesPerBucket backstop). AFTER the
        // landing, outside the staged body: compaction has its own
        // crash-safe swap protocol, must see the installed files, and
        // skipping it on a clean replay costs nothing (the next cycle
        // folds the same accretion)
        if (landed && compactEvery > 0 &&
            batchId % compactEvery == compactEvery - 1) {
          val buckets = Dedup.readBandSpec(spark, shPath)
            .map(_.buckets).getOrElse(spec.buckets)
          graft.engine.Layout.compactBucketedMaybe(spark, indexTable, "_bb",
            buckets)
          containTable.foreach(ct =>
            if (spark.catalog.tableExists(ct))
              graft.engine.Layout.compactBucketedMaybe(spark, ct, "_s",
                buckets))
          if (manifestedCorpus)
            graft.engine.Layout.compactManifestedMaybe(spark, corpusPath, 8)
        }
        ()
      }
      .start()

  /** The per-batch body of [[incrementalNearDupIndexed]] (everything but
    * the post-landing compaction), exposed for the crash-injection specs.
    */
  private[graft] def indexedIngestOnce(batch: DataFrame, indexTable: String,
      shPath: String, corpusPath: String, idCol: String, textCol: String,
      threshold: Double, dedupWithinBatch: Boolean, spec: Dedup.BandSpec,
      containTable: Option[String], containThreshold: Double,
      containMaxDf: Int, manifestedCorpus: Boolean = false)(
      st: graft.engine.BatchLedger.Staging): Unit = {
        val spark = batch.sparkSession
        val hfs = new org.apache.hadoop.fs.Path(shPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bootstrapped = spark.catalog.tableExists(indexTable) &&
          hfs.exists(new org.apache.hadoop.fs.Path(shPath))
        // the stored spec wins over the caller's: band keys from any other
        // parameters never match the table's, which silently kills recall
        val sp =
          if (bootstrapped) Dedup.readBandSpec(spark, shPath).getOrElse(spec)
          else spec
        val keptIds =
          if (bootstrapped)
            Dedup.incrementalSurvivorsIndexed(spark, indexTable, shPath,
              batch, idCol, textCol, threshold, dedupWithinBatch,
              sp.k, sp.bands, sp.shingleW, sp.seed)
          else if (dedupWithinBatch)
            Dedup.nearDupSurvivors(
              batch.select(col(idCol)),
              Dedup.minhashPairs(batch, idCol, textCol, sp.k, sp.bands,
                sp.shingleW, threshold, sp.seed),
              idCol)
          else batch.select(col(idCol))
        // containment gate: drop band-survivors that quote / are quoted
        // by indexed corpus content (probe BEFORE this batch appends)
        val kept2 = containTable match {
          case Some(ct) if bootstrapped && spark.catalog.tableExists(ct) =>
            keptIds.join(
              Dedup.containmentPairsIndexed(spark, ct, shPath,
                batch.join(keptIds, Seq(idCol), "left_semi"),
                containThreshold, containMaxDf, sp.shingleW, sp.seed,
                idCol, textCol)
                .select(col("batch_id").as(idCol)).distinct(),
              Seq(idCol), "left_anti")
          case _ => keptIds
        }
        val accepted = batch.join(kept2, Seq(idCol), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // finally below: a failed staged write must not strand the cached
        // relation (each supervised retry would persist another copy)
        try {
        if (bootstrapped) {
          // steady state: every landing staged — corpus rows, band rows,
          // shingle sets, containment postings become visible atomically
          // with the ledger marker, exactly once. Manifested mode lands
          // the batch as an append SEGMENT (manifest commit rides the
          // ledger install — Layout.installStagedSegment), which readers
          // resolve with ZERO retries even mid-landing; the flat mode
          // keeps the plain-path listing contract
          accepted.write.mode("overwrite").parquet(
            if (manifestedCorpus) st.segmentInto(corpusPath)
            else st.appendInto(corpusPath))
          Dedup.stageBandedIndexAppend(accepted, indexTable, shPath, st,
            idCol, textCol, sp.k, sp.bands, sp.shingleW, sp.seed, sp.buckets)
          containTable.foreach { ct =>
            if (!spark.catalog.tableExists(ct)) // late enable: postings for
              // the corpus-so-far come from the store; the current batch's
              // are staged below (its shingle append is not yet visible)
              Dedup.buildContainmentIndex(spark, shPath, ct, sp.buckets)
            Dedup.stageContainmentIndexAppend(accepted, ct, st, idCol,
              textCol, sp.shingleW, sp.seed, sp.buckets)
          }
        } else {
          // BOOTSTRAP: a table build cannot stage against a table that
          // does not exist, so this one batch lands with direct writes in
          // loss-proof order — corpus FIRST, then the index build (spec +
          // shingle store last inside it). A crash mid-build replays with
          // `bootstrapped` still false (no shingle store) and rebuilds; a
          // crash after the build replays with the batch's docs already in
          // the corpus, so the self-blocking probe drops nothing that
          // isn't landed. At-least-once for this batch only (a crash
          // between the corpus append and the marker can duplicate its
          // corpus rows); every later batch is exactly-once.
          if (manifestedCorpus)
            graft.engine.Layout.appendManifested(accepted, corpusPath, 1)
          else accepted.write.mode("append").parquet(corpusPath)
          Dedup.buildBandedIndex(accepted, indexTable, shPath, idCol,
            textCol, sp.k, sp.bands, sp.shingleW, sp.seed, sp.buckets)
          containTable.foreach(ct => // the build above already put this
            // batch's shingles in the store, so the postings cover them
            Dedup.buildContainmentIndex(spark, shPath, ct, sp.buckets))
        }
        } finally accepted.unpersist(blocking = false)
  }
}
