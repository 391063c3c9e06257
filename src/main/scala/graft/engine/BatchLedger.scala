package graft.engine

import org.apache.spark.sql.SparkSession

/** Micro-batch idempotency ledger for `foreachBatch` landings.
  *
  * Structured Streaming's checkpoint commits a batch AFTER the
  * `foreachBatch` body returns, so a crash inside the body replays the
  * SAME batchId on restart — the documented at-least-once boundary of
  * every plain-parquet landing in this engine. For append-only sinks a
  * replay costs duplicate rows; for the moment-state fold it would
  * DOUBLE-ADD into the totals (a corruption, not a storage tax).
  *
  * This is the standard batchId-dedup recipe from the Structured
  * Streaming guide: a marker file per landed batch, checked before the
  * work runs and written after it completes. The marker write narrows
  * the duplicate window from "every replay" to "crash between the last
  * side effect and the marker" — exactly-once still needs a
  * transactional table format underneath, which stays a documented
  * boundary.
  *
  * The ledger MUST live inside the query's checkpoint directory: a new
  * checkpoint restarts batchIds at 0, so a ledger that outlived its
  * checkpoint would wrongly skip the fresh query's first batches.
  * [[runOnce]] enforces nothing about the path — callers pass
  * `s"$checkpointDir/graft_ledger"`.
  */
object BatchLedger {

  /** Run `work` iff `batchId` has not already landed; record it after.
    * Returns true when the work ran, false when the replay was skipped.
    */
  def runOnce(spark: SparkSession, ledgerDir: String, batchId: Long)(
      work: => Unit): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, f"batch-$batchId%012d")
    if (fs.exists(marker)) false
    else {
      work
      fs.mkdirs(dir)
      fs.create(marker, false).close()
      true
    }
  }
}
