package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Stack-sampling target for the v16 superlinear hunt: loops the
  * retrieve stage (prebuilt codebooks) forever so `jstack` can histogram
  * the hot frames. Diagnostic only — not part of any artifact.
  */
object V16Hot {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfscale100")
    val spark = GraftSession.local("8")
    val emb = TestdataAdapter.table(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    val cb = Similarity.trainPqCodebooks(emb, m = 8, k = 256, iters = 2)
    while (true)
      Similarity.pqTopK(emb, q, k = 5, m = 8, codebookSize = 256,
        codebooks = cb).count()
  }
}
