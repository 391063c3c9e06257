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

  /** Streaming NEAR-dup dedup — the continuous-ingest twin of
    * [[graft.pipeline.Dedup.incrementalMinhashPairs]]: each micro-batch
    * runs the batch×corpus band join against the accumulated corpus
    * (never corpus×corpus — re-pairing what previous batches already
    * deduplicated), resolves intra-batch near-dup elections
    * ([[graft.pipeline.Dedup.incrementalSurvivors]] with
    * `dedupWithinBatch`), and appends ONLY the accepted docs to
    * `corpusPath`. The corpus parquet is the dedup state itself, so state
    * never lives in the state store and restart resumes from whatever the
    * corpus already holds; the checkpoint gives at-least-once appends (a
    * crash between append and commit replays the batch — the same
    * boundary as any parquet `foreachBatch` sink; the
    * [[graft.engine.BatchLedger]] marker narrows the duplicate window
    * to a crash BETWEEN the append and the marker write, and a clean
    * replay is a no-op).
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
        val spark = batch.sparkSession
        graft.engine.BatchLedger.runOnce(spark,
            s"$checkpointDir/graft_ledger", batchId) {
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
          .write.mode("append").parquet(corpusPath)
        }
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
    * Crash boundary (at-least-once, same as [[incrementalNearDup]]): the
    * corpus append lands before the index append, so a crash between the
    * two can leave accepted docs in the corpus but not the index; the
    * checkpoint then replays the batch, whose docs no longer self-block
    * (the index lacks them) and re-append — duplicate corpus rows and
    * index rows for those docs. The [[graft.engine.BatchLedger]] marker
    * (written after ALL of the batch's side effects) narrows that window
    * to a crash inside the body itself: a replay of a fully-landed batch
    * is a no-op. Downstream dedup semantics are unchanged either way
    * (a doc duplicated in the index blocks exactly as one copy would).
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
      containThreshold: Double = 0.9, containMaxDf: Int = 5):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.engine.BatchLedger.runOnce(spark,
            s"$checkpointDir/graft_ledger", batchId) {
        val bootstrapped = spark.catalog.tableExists(indexTable) &&
          new org.apache.hadoop.fs.Path(shPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(new org.apache.hadoop.fs.Path(shPath))
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
        accepted.write.mode("append").parquet(corpusPath)
        if (bootstrapped)
          Dedup.appendToBandedIndex(accepted, indexTable, shPath,
            idCol, textCol, sp.k, sp.bands, sp.shingleW, sp.seed, sp.buckets)
        else
          Dedup.buildBandedIndex(accepted, indexTable, shPath, idCol,
            textCol, sp.k, sp.bands, sp.shingleW, sp.seed, sp.buckets)
        containTable.foreach { ct =>
          if (spark.catalog.tableExists(ct))
            Dedup.appendToContainmentIndex(accepted, ct, idCol, textCol,
              sp.shingleW, sp.seed, sp.buckets)
          else // bootstrap from the shingle store the band build just wrote
            Dedup.buildContainmentIndex(spark, shPath, ct, sp.buckets)
        }
        accepted.unpersist(blocking = false)
        // every append adds up to one file per bucket; at micro-batch
        // frequency that accretion degrades the bucketed scan — fold it
        // back down every `compactEvery` batches (0 = caller compacts)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          graft.engine.Layout.compactBucketed(spark, indexTable, "_bb",
            sp.buckets)
          containTable.foreach(ct =>
            if (spark.catalog.tableExists(ct))
              graft.engine.Layout.compactBucketed(spark, ct, "_s", sp.buckets))
        }
        }
        ()
      }
      .start()
}
