package graft.pipeline

import graft.functions.{vector => gvec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — one broadcast of the query set and
  * a single codegen'd scan of the corpus (the native CosineSimilarity
  * expression keeps the whole stage fused). Scale path: IVF — partition
  * the corpus by nearest centroid once, then probe only `nProbe` cells per
  * query, cutting the scan by ~nCells/nProbe at the cost of recall.
  */
object Similarity {

  /** Deterministic unit-ish random hyperplanes (host-side, tiny). */
  private[pipeline] def randomPlanes(n: Int, dim: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  private[pipeline] def planeLit(p: Array[Float]): Column =
    array(p.map(v => lit(v)).toIndexedSeq: _*)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine. Queries are broadcast (they are few); the corpus
    * streams through one fused scan; ranking is a per-query window with a
    * deterministic tiebreak on corpus id.
    *
    * Scale note: at 1000 executors this is one pass over the corpus with
    * no corpus shuffle — the window's shuffle moves only
    * (query_id, corpus_id, score) tuples, k·|queries| of which survive.
    */
  def bruteCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(gvec.cosine(col("_qv"), col("_cv")), 6).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** IVF (inverted-file) cosine top-k:
    *  1. centroids = a deterministic sample of the corpus (every
    *     `centroidEvery`-th id) — a cheap stand-in for k-means that keeps
    *     the whole operator reproducible;
    *  2. assign each corpus vector to its nearest centroid (broadcast
    *     centroids, one fused scan);
    *  3. per query, probe the `nProbe` nearest cells and rank only vectors
    *     in those cells.
    *
    * Scale: the corpus is scanned once for assignment (then would be
    * written bucketed-by-cell); each query touches nProbe cells ≈
    * nProbe/nCells of the data. Recall < 1 by construction — the
    * brute-force twin is the correctness baseline.
    */
  def ivfCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nProbe: Int = 4, centroidEvery: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = corpus
      .filter(pmod(col(idCol), lit(centroidEvery)) === 0)
      .select(col(idCol).as("cell_id"), col(vecCol).as("_cent"))

    def nearestCells(df: DataFrame, id: String, v: String, n: Int): DataFrame = {
      val w = Window.partitionBy(id).orderBy(col("_sim").desc, col("cell_id").asc)
      df.crossJoin(broadcast(centroids))
        .select(col(id), col(v),
          col("cell_id"), gvec.cosine(col(v), col("_cent")).as("_sim"))
        .withColumn("_r", row_number().over(w))
        .filter(col("_r") <= n)
        .drop("_sim", "_r")
    }

    val assigned = nearestCells(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv")),
      "neighbor_id", "_cv", 1)
    val probed = nearestCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")),
      "query_id", "_qv", nProbe)

    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probed.join(assigned, Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(gvec.cosine(col("_qv"), col("_cv")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
