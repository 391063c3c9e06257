package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.functions.{agg => gagg, vector => gvec}

/** Stage-level decomposition of `Similarity.knnGraph` (the v7_knn_graph
  * sweep row) — the attribution harness for the r12 verdict's Next #1:
  * v7 read 18.4× cost for 10× data at host_factor 1.0, and no single
  * term had been pinned. This main replays knnGraph's exact stages
  * (same defaults: k=5, centroidEvery=50, iters=2, nAssign=16, spill=2)
  * with a wall-clock line per stage, so a two-SF run yields each term's
  * share and its own 10×-data growth ratio.
  *
  * Stages (mirrors knnGraph body — keep in sync when that changes):
  *   seeds     — hash-sample + TakeOrdered centroid init collect
  *   lloyd     — 2 Lloyd refinement passes (corpus scans + tiny collects)
  *   assign    — persist+count of the probe-ranked corpus (probeCellsExpr
  *               pass over every row: the N·(√C + gathered-fine)·dim term)
  *   join+topk — cell equi-join, pair scoring, bounded top-k, checkpoint
  *
  * Usage: java -cp ... graft.V7Decompose <dataDir> [cpus]
  * Prints one JSON line: {"stage_sec":{...},"cells":C,"rows":N,"pairs":P}
  */
object V7Decompose {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfscale")
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = GraftSession.local(cpus)
    import org.apache.spark.storage.StorageLevel

    val emb = TestdataAdapter.table(spark, dir, "embeddings")
    val n = emb.count()
    def timed[T](f: => T): (T, Double) = BenchUtil.timed(f)
    // warmup: JIT + file listings (one full DIRECT run, result discarded —
    // the stage replays below decompose the direct path)
    Similarity.knnGraph(emb, k = 5, collapseDuplicates = false).count()

    val idCol = "vec_id"; val vecCol = "embedding"
    val k = 5; val centroidEvery = 50; val iters = 2
    val maxCells = 65536; val nAssign = 16; val spill = 2

    // stage 1: seed sample (kmeansCentroids minus the Lloyd passes)
    val (seeds, tSeeds) = timed {
      emb.filter(pmod(xxhash64(col(idCol)), lit(centroidEvery)) === 0)
        .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"))
        .orderBy(xxhash64(col("_id")), col("_id"))
        .limit(maxCells)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
    }
    // stage 2: the Lloyd passes (full kmeansCentroids minus seed time)
    val (cents, tKm) = timed {
      Similarity.kmeansCentroids(emb, centroidEvery, iters, idCol, vecCol,
        maxCells)
    }
    val tLloyd = math.max(tKm - tSeeds, 0.0)

    // stage 3: probe-ranked assignment persist (the corpus-side
    // probeCellsExpr pass — knnGraph's `assigned`)
    val probeN = math.max(nAssign, math.min(spill, cents.length))
    val assigned = emb
      .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"),
        Similarity.probeCellsExpr(cents, col(vecCol), probeN).as("_probe"),
        gvec.norm(col(vecCol)).as("_n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (_, tAssign) = timed(assigned.count())

    // stage 4: candidate join volume (diagnostic count — measures the
    // join WITHOUT the top-k agg, so agg vs join cost separate)
    val l = assigned.select(
      explode(slice(col("_probe"), 1, nAssign)).as("_cell"),
      col("_id").as("query_id"), col("_v").as("_qv"), col("_n").as("_qn"))
    val r = assigned.select(
      explode(slice(col("_probe"), 1, math.min(spill, cents.length)))
        .as("_cell"),
      col("_id").as("neighbor_id"), col("_v").as("_cv"), col("_n").as("_cn"))
    val (pairs, tJoinOnly) = timed {
      l.join(r.hint("shuffle_hash"), Seq("_cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .count()
    }

    // stage 5: the full scored join + bounded top-k + checkpoint
    val (_, tTopK) = timed {
      val scored = l.join(r.hint("shuffle_hash"), Seq("_cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(gvec.cosinePre(col("_qv"), col("_cv"), col("_qn"),
            col("_cn")), 6).as("cosine"))
      Similarity.explodeTopK(
        scored.groupBy("query_id")
          .agg(gagg.topKByScore(col("cosine"), col("neighbor_id"), k,
            dedup = true).as("_top"))).count()
    }
    assigned.unpersist(blocking = false)

    // reference points: the direct (uncollapsed) operator end-to-end and
    // the default (duplicate-collapsed) operator end-to-end
    val (_, tDirect) = timed(Similarity.knnGraph(emb, k = 5,
      collapseDuplicates = false).count())
    val (_, tFull) = timed(Similarity.knnGraph(emb, k = 5).count())
    val distinct = emb.select(vecCol).distinct().count()

    def r3(x: Double): Double = BenchUtil.r3(x)
    println(s"""{"metric":"v7_decompose","dir":"$dir","rows":$n,"distinct":$distinct,"cells":${
      cents.length},"pairs":$pairs,"stage_sec":{"seeds":${r3(tSeeds)},"lloyd":${
      r3(tLloyd)},"assign_persist":${r3(tAssign)},"join_only":${
      r3(tJoinOnly)},"join_topk":${r3(tTopK)},"full_direct":${
      r3(tDirect)},"full_collapsed":${r3(tFull)}}}""")
    spark.stop()
  }
}
