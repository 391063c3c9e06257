package graft.streaming

import graft.pipeline.TextAnalysis
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
}
