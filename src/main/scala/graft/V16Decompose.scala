package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Stage-level decomposition of `Similarity.pqTopK` (the v16_pq_topk
  * sweep row) — the attribution harness for the r13 verdict's Next #1:
  * v16 read 17.4× cost for 10× data (34.0 s at sf10) while a fixed-query
  * full-ADC scan is linear by design, and no term had been pinned. Same
  * shape as [[V7Decompose]]: replay the operator's exact stages (sweep
  * defaults: k=5, m=8, codebookSize=256, trainIters=2, 20-query set)
  * with a wall-clock AND a GC-time line per stage, so a two-SF run
  * yields each term's share, its own 10×-data growth ratio, and whether
  * the growth is compute or collector pressure.
  *
  * Stages (mirrors pqTopK body — keep in sync when that changes):
  *   seed     — `pqCodebooks`: ORDER BY id LIMIT 256 collect (TakeOrdered)
  *   lloyd    — 2 training iterations (per-row pqEncode + posexplode +
  *              ObjectHashAggregate micro-unit sums + 2048-row collects);
  *              reported as train_total − seed
  *   encode   — one `pqEncodeView` corpus pass forced through an agg
  *              (the per-row m×k×sub nearest-code scan)
  *   retrieve — `pqTopK` with PREBUILT codebooks: encode + broadcast-20-
  *              query ADC scan + bounded top-k (what a serving call pays)
  *   full     — `pqTopK` exactly as the sweep row runs it (train + all)
  *
  * Usage: java -cp ... graft.V16Decompose <dataDir> [cpus]
  * Prints one JSON line:
  *   {"stage_sec":{...},"stage_gc_sec":{...},"rows":N}
  */
object V16Decompose {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfscale")
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = GraftSession.local(cpus)

    val emb = TestdataAdapter.table(spark, dir, "embeddings")
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 20)

    import scala.jdk.CollectionConverters._
    def gcSec(): Double = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum / 1e3

    // task-level truth for the superlinear hunt: per-measured-block sums
    // of executor run/GC time, peak execution memory, and spill bytes —
    // a stage whose WALL time grows faster than its executor time is
    // scheduling/underparallelism; growing spill or GC is memory pressure
    object metrics extends org.apache.spark.scheduler.SparkListener {
      val run = new java.util.concurrent.atomic.AtomicLong
      val gc = new java.util.concurrent.atomic.AtomicLong
      val spillMem = new java.util.concurrent.atomic.AtomicLong
      val spillDisk = new java.util.concurrent.atomic.AtomicLong
      val peak = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          run.addAndGet(m.executorRunTime)
          gc.addAndGet(m.jvmGCTime)
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          peak.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
          tasks.incrementAndGet()
        }
      }
      def reset(): Unit = {
        Seq(run, gc, spillMem, spillDisk, peak, tasks).foreach(_.set(0L))
      }
      def json: String = {
        // listener bus is async — give it a beat to drain (poll until the
        // task count stops moving; the bus API itself is private[spark])
        var last = -1L
        while (tasks.get != last) { last = tasks.get; Thread.sleep(200) }
        s"""{"tasks":${tasks.get},"run_sec":${BenchUtil.r3(run.get / 1e3)},"gc_sec":${
          BenchUtil.r3(gc.get / 1e3)},"peak_mem_mb":${peak.get / (1024 * 1024)},"spill_mb":${
          (spillMem.get + spillDisk.get) / (1024 * 1024)}}"""
      }
    }
    spark.sparkContext.addSparkListener(metrics)
    // (wall seconds, GC seconds) of one evaluation — GC time is the
    // process-wide collector delta, attributing collector pressure to
    // the stage that provoked it (stages run serially)
    def timedGc[T](f: => T): (Double, Double) = {
      val g0 = gcSec()
      val (_, t) = BenchUtil.timed(f)
      (t, gcSec() - g0)
    }

    // warmup: JIT + codegen + file listings (one full run, discarded)
    Similarity.pqTopK(emb, q, k = 5, m = 8, codebookSize = 256).count()

    // stage 1: codebook seed (TakeOrdered collect of the first 256 ids)
    val (tSeed, gSeed) = timedGc {
      Similarity.pqCodebooks(emb, m = 8, k = 256)
    }
    // stage 2: full training (seed + 2 Lloyd iterations); lloyd = Δ
    var cb: Array[Array[Array[Float]]] = null
    val (tTrain, gTrain) = timedGc {
      cb = Similarity.trainPqCodebooks(emb, m = 8, k = 256, iters = 2)
    }
    // stage 3: one encode pass over the corpus, forced through an agg so
    // the per-row kernel cannot be pruned under a count
    val (tEncode, gEncode) = timedGc {
      Similarity.pqEncodeView(emb, cb)
        .agg(sum(element_at(col("codes"), 1))).collect()
    }
    // stage 3b/3c: the R13 JOIN SHAPE replayed for attribution (these two
    // stages deliberately keep the crossJoin form the committed operator
    // ABANDONED in r14 — they are the evidence, not the product).
    // join_count forces the broadcast-nested-loop pair emission alone
    // (column pruning removes pqEncode under the count); adc_sum forces
    // the joined per-pair scoring through a single-group sum — its task
    // CPU exposes the deferred-codegen encode-per-pair term (see
    // Kernels.pqAdcAllMicro's scaladoc); retrieve/full below time the
    // CURRENT LUT-scan operator
    val codes = Similarity.pqEncodeView(emb, cb)
      .select(col("vec_id").as("neighbor_id"), col("codes"))
    val qv = q.select(col("vec_id").cast("long").as("query_id"),
      col("embedding").as("_qv"))
    val (tJoin, gJoin) = timedGc {
      codes.crossJoin(broadcast(qv))
        .filter(col("neighbor_id") =!= col("query_id")).count()
    }
    metrics.reset()
    val (tAdcSum, gAdcSum) = timedGc {
      codes.crossJoin(broadcast(qv))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(graft.functions.vector.pqAdcMicro(col("codes"), col("_qv"),
          cb).cast("double").as("_s"))
        .agg(sum(col("_s"))).collect()
    }
    val adcSumMetrics = metrics.json
    // stage 4: retrieval only (prebuilt codebooks) — encode + ADC + top-k
    metrics.reset()
    val (tRetrieve, gRetrieve) = timedGc {
      Similarity.pqTopK(emb, q, k = 5, m = 8, codebookSize = 256,
        codebooks = cb).count()
    }
    val retrieveMetrics = metrics.json
    // stage 5: the sweep row verbatim (training included)
    val (tFull, gFull) = timedGc {
      Similarity.pqTopK(emb, q, k = 5, m = 8, codebookSize = 256).count()
    }

    def r3(x: Double): Double = BenchUtil.r3(x)
    println(s"""{"metric":"v16_decompose","dir":"$dir","rows":$n,"stage_sec":{"seed":${
      r3(tSeed)},"train_total":${r3(tTrain)},"lloyd":${
      r3(math.max(tTrain - tSeed, 0.0))},"encode":${r3(tEncode)},"join_count":${
      r3(tJoin)},"adc_sum":${r3(tAdcSum)},"retrieve":${
      r3(tRetrieve)},"full":${r3(tFull)}},"stage_gc_sec":{"seed":${
      r3(gSeed)},"train_total":${r3(gTrain)},"encode":${r3(gEncode)},"join_count":${
      r3(gJoin)},"adc_sum":${r3(gAdcSum)},"retrieve":${r3(gRetrieve)},"full":${
      r3(gFull)}},"task_metrics":{"adc_sum":$adcSumMetrics,"retrieve":$retrieveMetrics}}""")
    spark.stop()
  }
}
