package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Train-cost-vs-merges sweep for the BPE tokenizer (r13 verdict Next #2
  * "done" criterion): times [[TextAnalysis.trainBpeMerges]] (one
  * distributed histogram pass + the driver-side incremental merge
  * recurrence) and the corpus APPLY cost (the native
  * [[graft.functions.BpeEncodeText]] expression, forced per row through
  * `sum(size(tokens))`) at merge counts spanning toy to realistic, on
  * 2-word chunk units (word-level BPE exhausts at ~89 merges on this
  * corpus — see SparkEntry.Bpe2NumMerges).
  *
  * The interesting read: train seconds should grow ~sub-linearly in the
  * merge count once the fixed histogram job is netted out (incremental
  * counts + lazy heap — each merge touches only units containing the
  * winning pair), and apply seconds should be FLAT across merge counts
  * (lowest-rank-first per unit with O(1) rank probes — the complexity
  * class the r12 fold-a-literal form lacked, paying O(merges)/word).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BpeSweep
  * Prints one JSON line {"metric":"bpe_sweep","rows":{...}}.
  */
object BpeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    val docs = TestdataAdapter.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    docs.persist().count()
    val chunkWords = 2
    val cap = 65536
    def timed[T](f: => T): (T, Double) = BenchUtil.timed(f)
    def r3(x: Double): Double = BenchUtil.r3(x)
    // JIT/codegen warmup for both paths
    TextAnalysis.trainBpeMerges(docs, 8, cap, chunkWords)
    val counts = Seq(32, 128, 512, 1024, 4096)
    val rows = counts.map { m =>
      // min of 2: train includes one distributed histogram job whose
      // scheduling noise would otherwise dominate the small counts
      val (merges, t1) = timed(TextAnalysis.trainBpeMerges(docs, m, cap, chunkWords))
      val (_, t2) = timed(TextAnalysis.trainBpeMerges(docs, m, cap, chunkWords))
      val train = math.min(t1, t2)
      val applyExpr = graft.functions.text.bpeEncode(col("text"),
        merges, chunkWords)
      val applyRuns = (1 to 3).map { _ =>
        timed(docs.agg(sum(size(applyExpr))).head().getLong(0))._2
      }
      val apply = StreamBench.median(applyRuns)
      s""""m$m":{"merges_trained":${merges.size},"train_sec":${r3(train)},"apply_sec":${r3(apply)}}"""
    }
    // CHARACTER-WINDOW unit mode (r14): word/chunk units cap the merge
    // space at the corpus's n-gram vocabulary (m4096 above trains ~1060
    // real merges); 64-char windows make nearly every unit distinct, so
    // the trainer demonstrates a production-sized merge table on this
    // corpus. Flatness is judged WITHIN the mode (c32 is the char-mode
    // baseline) — char windows are longer units than 2-word chunks, so
    // their absolute apply cost is its own curve.
    val unitChars = 64
    TextAnalysis.trainBpeMerges(docs, 8, cap, unitChars = unitChars) // warmup
    val charCounts = Seq(32, 8192, 16384)
    val charRows = charCounts.map { m =>
      val (merges, t1) = timed(
        TextAnalysis.trainBpeMerges(docs, m, cap, unitChars = unitChars))
      val (_, t2) = timed(
        TextAnalysis.trainBpeMerges(docs, m, cap, unitChars = unitChars))
      val train = math.min(t1, t2)
      val applyExpr = graft.functions.text.bpeEncodeChars(col("text"),
        merges, unitChars)
      val applyRuns = (1 to 3).map { _ =>
        timed(docs.agg(sum(size(applyExpr))).head().getLong(0))._2
      }
      val apply = StreamBench.median(applyRuns)
      s""""c$m":{"merges_trained":${merges.size},"train_sec":${r3(train)},"apply_sec":${r3(apply)}}"""
    }
    println(s"""{"metric":"bpe_sweep","sf":"$sfDir","chunk_words":$chunkWords,"vocab_cap":$cap,"rows":{${rows.mkString(",")}},"unit_chars":$unitChars,"char_rows":{${charRows.mkString(",")}}}""")
    spark.stop()
  }
}
