package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions.col

/** v17 stage decomposition (round 15): the v17 bench row spreads
  * 2.0–4.7 s across same-host same-HEAD protocols (in-suite decomp 2.0,
  * in-suite bench 3.6, isolated fresh-JVM 4.5 at r15 HEAD), which the
  * r14 verdict read as an "in-suite session residual". This main times
  * the row's parameter-isolated variants in one session — each with its
  * own warmup run, min over `SPARK_GRAFT_RUNS` (default 3) — so the
  * spread can be attributed to a stage instead of to session state:
  *
  *   - `pq_train_scan`:  pqTopK (codebook training + LUT full scan)
  *   - `v17b_full`:      trained codebooks + full-probe + rerank,
  *                       kmeansIters = 0 (no Lloyd, no gate machinery)
  *   - `v17_nolloyd`:    the FULL gated pipeline at kmeansIters = 0 —
  *                       seeds, probe join, shortlist, rerank; only the
  *                       Lloyd refinement missing vs v17
  *   - `v17`:            the bench row verbatim (kmeansIters = 2)
  *
  * v17 − v17_nolloyd = the Lloyd refinement bill; v17_nolloyd −
  * v17b_full = the gate machinery (probedCellsOf + probe join);
  * v17b_full − pq_train_scan ≈ the rerank stage.
  */
object V17Decompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = GraftSession.local(cpus)
    val emb = TestdataAdapter.table(spark, sfDir, "embeddings")
    val qs = emb.filter(col("vec_id") < 20)
    def r3(x: Double) = BenchUtil.r3(x)
    val stages: Seq[(String, () => Long)] = Seq(
      ("pq_train_scan", () =>
        Similarity.pqTopK(emb, qs, k = 5, m = 8, codebookSize = 256)
          .count()),
      ("v17b_full", () =>
        Similarity.ivfPqTopK(emb, qs, k = 5, nProbe = Int.MaxValue,
          m = 8, codebookSize = 256, kmeansIters = 0).count()),
      ("v17_nolloyd", () =>
        Similarity.ivfPqTopK(emb, qs, k = 5, m = 8, codebookSize = 256,
          kmeansIters = 0).count()),
      ("v17", () =>
        Similarity.ivfPqTopK(emb, qs, k = 5, m = 8, codebookSize = 256)
          .count()))
    val out = stages.map { case (name, fn) =>
      fn() // warmup
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }
      s""""$name":{"min":${r3(ts.min)},"runs":[${ts.map(r3).mkString(",")}]}"""
    }
    println(s"""{"metric":"v17_decompose","sf":"$sfDir","cpus":$cpus,"runs":$runs,"stages":{${
      out.mkString(",")}}}""")
    spark.stop()
  }
}
