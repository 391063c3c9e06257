package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Stage-level decomposition of the scaled-ingest NONCOMPACT batch (the
  * r13 verdict's Next #3): STREAMBENCH_r13's noncompact_big_over_small
  * read 1.507 at 21× corpus state while the O(batch) claim wants ~1; the
  * compaction term is named (full-table fold, O(corpus/compactEvery))
  * but the residual noncompact growth term is not. This main replays a
  * steady-state batch's stages against a prebuilt 1× and N× corpus+index
  * (the StreamBench build, identical salting and spec) and times each
  * term separately, so the big/small ratio lands on a NAME:
  *
  *   probe    — band-index probe join (incrementalSurvivorsIndexed:
  *              batch signatures vs the bucketed band table)
  *   contain  — containment posting probe (containmentPairsIndexed:
  *              batch shingles vs the posting table, df gate included)
  *   landing  — the full staged landing (probe + contain + corpus write
  *              + band/shingle/posting appends + ledger + refreshes),
  *              via the REAL indexedIngestOnce body
  *
  * landing − probe − contain ≈ the write/bookkeeping side. Stages run
  * against the same feed batches StreamBench uses (held-out salted
  * replica), warmup batches excluded, medians reported.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_STREAM_SCALED_REPLICAS=21
  *        java -cp ... graft.IngestDecompose
  * Prints one JSON line with per-stage medians for both sides + ratios.
  */
object IngestDecompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SCALED_REPLICAS", "21").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH_ROWS", "500").toInt
    val warmup = 2
    val spark = GraftSession.local(cpus)

    val feedRep = replicas + 1
    val feed = StreamBench.saltedReplicas(spark, sfDir, Seq(feedRep))
      .orderBy("doc_id").limit(nBatches * batchRows)
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // per-side: build corpus + band/containment indexes exactly as the
    // StreamBench run does, then replay batches with per-stage timers
    def run(tag: String, nRep: Int): Map[String, Seq[Double]] = {
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ingdec_$tag").toString
      val tbl = s"graft_ingdec_band_$tag"
      val ctbl = s"graft_ingdec_post_$tag"
      Seq(tbl, ctbl).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val corpus = StreamBench.saltedReplicas(spark, sfDir, 0 until nRep)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.write.mode("overwrite").parquet(s"$dir/corpus")
      Dedup.buildBandedIndex(corpus, tbl, s"$dir/sh")
      Dedup.buildContainmentIndex(spark, s"$dir/sh", ctbl)
      corpus.unpersist()
      val sp = Dedup.readBandSpec(spark, s"$dir/sh").getOrElse(Dedup.BandSpec())
      val ledger = s"$dir/ckpt/graft_ledger"
      val stages = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      feed.grouped(batchRows).zipWithIndex.foreach { case (rows, bi) =>
        val batch = rows.toIndexedSeq.toDF("doc_id", "text")
        def timed(name: String)(f: => Unit): Unit = {
          val (_, t) = BenchUtil.timed(f)
          stages(name) = stages(name) :+ t
        }
        // stage replays (diagnostic double-pay; the landing below is the
        // real cost) — keep in sync with indexedIngestOnce's body
        timed("probe") {
          Dedup.incrementalSurvivorsIndexed(spark, tbl, s"$dir/sh", batch,
            "doc_id", "text", 0.8, dedupWithinBatch = true,
            sp.k, sp.bands, sp.shingleW, sp.seed).count()
        }
        timed("contain") {
          Dedup.containmentPairsIndexed(spark, ctbl, s"$dir/sh", batch,
            0.9, 5, sp.shingleW, sp.seed).count()
        }
        timed("landing") {
          graft.engine.BatchLedger.stagedLanding(spark, ledger, bi.toLong)(
            graft.streaming.StreamDedup.indexedIngestOnce(batch, tbl,
              s"$dir/sh", s"$dir/corpus", "doc_id", "text", 0.8, true, sp,
              Some(ctbl), 0.9, 5))
          spark.catalog.refreshTable(tbl)
          spark.catalog.refreshTable(ctbl)
        }
      }
      stages.map { case (k, v) => k -> v.drop(warmup).toSeq }.toMap
    }

    run("warm", 1) // JIT/codegen warmup side, discarded
    val small = run("small", 1)
    val big = run("big", replicas)
    def med(xs: Seq[Double]): Double = StreamBench.median(xs)
    def r3(x: Double): Double = BenchUtil.r3(x)
    val names = Seq("probe", "contain", "landing")
    val parts = names.map { n =>
      val b = med(big(n)); val s = med(small(n))
      s""""$n":{"big_sec":${r3(b)},"small_sec":${r3(s)},"ratio":${
        if (s > 0) r3(b / s) else "null"}}"""
    }
    println(s"""{"metric":"ingest_decompose","sf":"$sfDir","replicas":$replicas,"batches":$nBatches,"batch_rows":$batchRows,"warmup":$warmup,"stages":{${
      parts.mkString(",")}}}""")
    spark.stop()
  }
}
