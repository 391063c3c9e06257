package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Recall companion of the `v7_knn_graph_salted` sweep row (r13 Next #2):
  * the salted-replica corpus makes every vector distinct, so the
  * duplicate-collapse wrapper is an identity and knnGraph's CELLED CORE
  * carries the load — this main certifies that at that load the graph is
  * still a ≥ 0.9-recall kNN graph, not a fast-but-wrong one. It times
  * the public knnGraph end-to-end on the salted corpus and measures
  * recall@k for a deterministic 100-query sample against exact brute
  * cosine over the SAME salted corpus (100 × N pairs — feasible at every
  * sweep SF, unlike an all-pairs exact graph).
  *
  * Usage: java -cp ... graft.V7Salted <dataDir> [cpus]
  * Prints one JSON line:
  *   {"metric":"v7_salted","rows":N,"distinct":D,"knn_sec":S,
  *    "recall_at_5":R,"n_queries":100}
  */
object V7Salted {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfscale")
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = GraftSession.local(cpus)
    val k = 5

    val emb = ScaleBench.saltedEmbeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val distinct = emb.select("embedding").distinct().count()

    // warmup (JIT, codegen, listings), then the timed public-path run
    Similarity.knnGraph(emb, k = k).count()
    val (graph, tKnn) = BenchUtil.timed {
      val g = Similarity.knnGraph(emb, k = k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      g.count()
      g
    }

    // deterministic 100-query sample; exact reference = brute cosine of
    // those queries against the full salted corpus
    val qIds = emb.select(col("vec_id").cast("long").as("_id"))
      .orderBy(xxhash64(col("_id")), col("_id")).limit(100)
      .collect().map(_.getLong(0))
    val queries = emb.filter(col("vec_id").isin(qIds: _*))
    val exact = Similarity.bruteCosineTopK(emb, queries, k = k)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graph.filter(col("query_id").isin(qIds: _*))
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 0.0
      else exact.intersect(got).size.toDouble / exact.size

    def r3(x: Double): Double = BenchUtil.r3(x)
    println(s"""{"metric":"v7_salted","dir":"$dir","rows":$n,"distinct":$distinct,"knn_sec":${
      r3(tKnn)},"recall_at_5":${r3(recall)},"n_queries":${qIds.length}}""")
    spark.stop()
  }
}
