package graft.pipeline

import graft.functions.{text => gtext, vector => gvec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale design: every variant avoids the O(n²) all-pairs join. Candidate
  * generation is a key-equality shuffle (band bucket / hash prefix /
  * blocking key), so the expensive verification only runs on candidate
  * pairs that share a bucket. At 100 TB each stage is a hash shuffle on a
  * synthetic key with bounded skew (bucket ids are uniform hashes).
  *
  * Cache lifecycle: the LSH operators persist their small signature
  * relations (both sides of a bucket self-join read them) and rely on
  * Spark's LRU storage eviction rather than explicit unpersist — the
  * returned DataFrame stays lazy, so there is no safe point inside the
  * operator to release the cache. Long-lived sessions running many
  * distinct dedup plans should size executor storage accordingly.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical (normalized) text.
    * One hash-aggregate shuffle on the md5 fingerprint — never shuffles
    * full document text.
    */
  def exact(documents: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    documents
      .select(col(idCol), md5(TextAnalysis.normalized(col(textCol))).as("_fp"))
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Benchmark decontamination: drop corpus documents whose normalized-text
    * fingerprint appears in the benchmark/eval set (the standard guard
    * against test-set leakage into training data). One LEFT ANTI hash join
    * on md5 fingerprints — text never shuffles, and the benchmark side is
    * typically small enough to broadcast.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String = "text"): DataFrame = {
    val fp = md5(TextAnalysis.normalized(col(textCol)))
    corpus.withColumn("_fp", fp)
      .join(benchmark.select(fp.as("_fp")).distinct(), Seq("_fp"), "left_anti")
      .drop("_fp")
  }

  /** N-gram contamination check (GPT-3-appendix-style decontamination):
    * for each corpus document, the number of distinct w-grams it shares
    * with the benchmark set. Both sides reduce to 64-bit w-gram hashes
    * (one codegen'd pass, no gram strings on the wire); the join key is a
    * uniform hash, and the benchmark side is small → broadcast. Downstream
    * callers drop documents with any hit (or above a gram-count budget).
    */
  def ngramContamination(corpus: DataFrame, benchmark: DataFrame, w: Int = 13,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def grams(d: DataFrame): DataFrame = d.select(
      col(idCol),
      explode(gtext.shingleHashes(TextAnalysis.tokens(col(textCol)), w, 42))
        .as("_g"))
    // both join inputs are distinct on _g (shingleHashes dedups per doc;
    // the benchmark side dedups globally), so each (doc, gram) survives at
    // most once — plain count equals countDistinct without the extra
    // expand+distinct aggregation
    grams(corpus)
      .join(grams(benchmark).select("_g").distinct(), "_g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  /** Word w-shingles of the token array (w consecutive tokens joined by a
    * space) — the unit set for Jaccard resemblance. Native codegen'd
    * expression; no per-position slice/concat lambda allocation.
    */
  def shingles(text: Column, w: Int = 3): Column =
    gtext.shingleStrings(TextAnalysis.tokens(text), w)

  /** Exact Jaccard similarity of two string arrays (distinct-element sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val da = size(array_distinct(a)).cast("double")
    val db = size(array_distinct(b)).cast("double")
    inter / (da + db - inter)
  }

  /** MinHash + LSH near-duplicate pairs (Broder '97 / MMDS ch.3):
    * hashed w-shingles → k-minhash signature → split into `bands` bands →
    * hash each band → shuffle on (band_index, band_hash) → pairs within a
    * bucket → verify with exact Jaccard ≥ threshold over the hashed
    * shingle sets (64-bit hashes; collision error is negligible).
    *
    * Output: (a, b, jaccard) with a < b, distinct.
    *
    * Scale: the document text is scanned ONCE — the codegen'd
    * ShingleHashes expression emits distinct sorted shingle hashes with no
    * shingle-string materialization, the signature derives from those
    * hashes, and the (small) hashed-shingle relation is persisted for the
    * candidate verification joins. The only shuffles are (1) the
    * band-bucket exchange on uniform hash keys and (2) the pair dedup;
    * signatures (k longs) and shingle-hash arrays travel instead of
    * documents. Band count tunes the recall/cost curve: P(candidate) =
    * 1-(1-s^(k/bands))^bands. Skew note: exact-duplicate clusters all
    * land in the same buckets — run [[exact]] dedup first at scale.
    */
  def minhashPairs(documents: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 64, bands: Int = 16,
      shingleW: Int = 3, threshold: Double = 0.8, seed: Int = 42): DataFrame = {
    val rows = k / bands
    require(bands * rows == k, s"bands=$bands must divide k=$k")
    val sh = documents.select(
      col(idCol).as("_id"),
      gtext.shingleHashes(TextAnalysis.tokens(col(textCol)), shingleW, seed)
        .as("_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sh.select(col("_id"),
      gtext.minhashFromHashes(col("_sh"), k, seed).as("_sig"))
    // persisted: both sides of the bucket self-join read the banded
    // relation — without the cache the k-affine signature pass runs twice
    val banded = sigs.select(
      col("_id"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("_sig"), b * rows + 1, lit(rows))))))
      .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = banded.select(col("_band"), col("_bucket"), col("_id").as("a"))
    val r = banded.select(col("_band"), col("_bucket"), col("_id").as("b"))
    val candidates = l.join(r, Seq("_band", "_bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // shingleHashes output is already sorted+distinct → merge-scan count;
    // size-ratio prefilter as in [[ngramJaccardPairs]] (exact-safe).
    val inter = gtext.sortedIntersectCount(col("_sha"), col("_shb")).cast("double")
    candidates
      .join(sh.select(col("_id").as("a"), col("_sh").as("_sha")), "a")
      .join(sh.select(col("_id").as("b"), col("_sh").as("_shb")), "b")
      .filter(least(size(col("_sha")), size(col("_shb"))).cast("double") >=
        greatest(size(col("_sha")), size(col("_shb"))).cast("double")
          * threshold - 1e-9)
      .select(col("a"), col("b"),
        round(inter / (size(col("_sha")) + size(col("_shb")) - inter), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Blocked exact n-gram Jaccard pairs: all pairs within a blocking key
    * (default lang+source) with distinct-token Jaccard ≥ threshold. The
    * blocking key bounds the quadratic term to per-block sizes; SQL-
    * expressible, so it doubles as the oracle-checked twin of
    * [[minhashPairs]].
    *
    * The pair loop is pruned and allocation-free: token sets are sorted
    * once per document, a size-ratio prefilter drops pairs that cannot
    * reach the threshold (J ≥ t ⟹ min(|A|,|B|)/max(|A|,|B|) ≥ t — the
    * intersection is at most the smaller set, the union at least the
    * larger; the 1e-9 slack keeps the float compare a superset of the
    * exact predicate), and the surviving pairs count their intersection
    * with a single merge scan instead of a per-pair hash set.
    */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double = 0.8,
      blockCols: Seq[String] = Seq("lang", "source")): DataFrame = {
    // persisted: both sides of the block self-join read the token sets —
    // the cache keeps the tokenize+sort pass single-scan
    val toks = documents.select(
      (col("doc_id") +: blockCols.map(col)) :+
        array_sort(array_distinct(TextAnalysis.tokens(col("text")))).as("_t"): _*)
      .withColumn("_n", size(col("_t")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = toks.select(col("doc_id").as("a") +: blockCols.map(col) :+
      col("_t").as("_ta") :+ col("_n").as("_na"): _*)
    val b = toks.select(col("doc_id").as("b") +: blockCols.map(col) :+
      col("_t").as("_tb") :+ col("_n").as("_nb"): _*)
    val inter = gtext.sortedIntersectCount(col("_ta"), col("_tb")).cast("double")
    a.join(b, blockCols)
      .filter(col("a") < col("b") &&
        least(col("_na"), col("_nb")).cast("double") >=
          greatest(col("_na"), col("_nb")).cast("double") * threshold - 1e-9)
      .select(col("a"), col("b"),
        round(inter / (col("_na") + col("_nb") - inter), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs (Charikar '02; Manku et al. WWW'07 table
    * construction): 64-bit fingerprint, split into 4 16-bit bands; pairs
    * sharing any band verify hamming distance ≤ maxHamming.
    *
    * Output: (a, b, hamming) with a < b, distinct.
    */
  def simhashPairs(documents: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    // persisted: the banded self-join reads this twice; the cache keeps
    // the tokenize+md5 fingerprint scan single-pass
    val fps = documents.select(
      col(idCol).as("_id"),
      gtext.simhash(TextAnalysis.tokens(col(textCol))).as("_fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = fps.select(col("_id"), col("_fp"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("_fp"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bucket"))
    val l = banded.select(col("_band"), col("_bucket"),
      col("_id").as("a"), col("_fp").as("_fpa"))
    val r = banded.select(col("_band"), col("_bucket"),
      col("_id").as("b"), col("_fp").as("_fpb"))
    l.join(r, Seq("_band", "_bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("_fpa").bitwiseXOR(col("_fpb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-duplicate pairs: random-hyperplane LSH (Charikar '02
    * §3) buckets vectors by the sign pattern of `nPlanes` fixed random
    * projections; pairs within a bucket verify exact cosine ≥ threshold.
    *
    * Scale: one shuffle on the sign-pattern bucket; vectors only cross the
    * wire once. More tables (`nTables`) raise recall; candidates dedup
    * before verification.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int = 64, threshold: Double = 0.99,
      nPlanes: Int = 12, nTables: Int = 4, seed: Int = 7): DataFrame = {
    val planes = Similarity.randomPlanes(nTables * nPlanes, dim, seed)
    val buckets = (0 until nTables).map { t =>
      val bits = (0 until nPlanes).map { p =>
        when(gvec.dot(col(vecCol), Similarity.planeLit(planes(t * nPlanes + p)))
          >= 0, 1L << p).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
      struct(lit(t).as("t"), bits.as("h"))
    }
    // persisted: 48 plane dot-products per vector feed both join sides
    val banded = embeddings
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        explode(array(buckets: _*)).as("_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = banded.select(col("_b"), col("_id").as("a"), col("_v").as("_va"))
    val r = banded.select(col("_b"), col("_id").as("b"), col("_v").as("_vb"))
    l.join(r, Seq("_b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(gvec.cosine(col("_va"), col("_vb")), 6).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }
}
