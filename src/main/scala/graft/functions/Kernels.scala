package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/** Shared scalar kernels. Each is a plain JVM function over Catalyst
  * runtime types (ArrayData / UTF8String), so the same code runs from both
  * an Expression's interpreted `eval` and its generated Java (whole-stage
  * codegen emits a static call into this object — Scala standalone objects
  * produce static forwarders, so `graft.functions.Kernels.cosine(a, b)` is
  * valid generated Java).
  *
  * All hashing is seeded MurmurHash3 / splitmix64 — deterministic across
  * JVMs and executors, a hard requirement for shuffle-stable dedup keys.
  */
object Kernels {

  /** Cosine similarity of two float vectors, accumulated in Double in
    * element order (index 0..n-1). The fixed order makes results
    * reproducible bit-for-bit regardless of parallelism.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Euclidean norm of a float vector — sqrt of the same fixed-order `na`
    * accumulator [[cosine]] builds, so for equal-length vectors
    * `cosinePre(a, b, norm(a), norm(b))` is bit-identical to
    * `cosine(a, b)`.
    */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var na = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    math.sqrt(na)
  }

  /** Cosine with PRE-COMPUTED norms: the pair-scoring hot loop of the
    * celled self-joins runs nAssign·occupancy candidates per vector, and
    * [[cosine]] spends 2/3 of its multiply-adds rebuilding the two norms
    * for every pair. Computing [[norm]] once per ROW (before the probe
    * explode / join) and passing it here does only the dot product per
    * PAIR — bit-identical for equal-length vectors (same accumulation
    * order, same `sqrt(na)*sqrt(nb)` product, same zero-norm guard).
    */
  def cosinePre(a: ArrayData, b: ArrayData, normA: Double, normB: Double): Double = {
    if (normA == 0.0 || normB == 0.0) 0.0
    else {
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      dot / (normA * normB)
    }
  }

  /** Dot product of two float vectors (Double accumulation, fixed order). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** splitmix64 — public-domain 64-bit mixer (Steele et al., "Fast
    * Splittable Pseudorandom Number Generators", OOPSLA'14). Used to derive
    * the per-hash-function affine constants for MinHash.
    */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit token hash from two seeded murmur32 passes over UTF-8 bytes. */
  @inline def hash64(s: UTF8String, seed: Int): Long = {
    val bytes = s.getBytes
    val h1 = MurmurHash3.bytesHash(bytes, seed)
    val h2 = MurmurHash3.bytesHash(bytes, seed ^ 0x5bd1e995)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** MinHash signature of a token/shingle array: k minima of affine
    * permutations h_i(x) = a_i*x + b_i over the 64-bit token hashes
    * (Broder '97 resemblance sketch). Empty input → Long.MaxValue fills.
    */
  /** The affine-permutation constants both minhash entry points share —
    * ONE derivation, so `graft_minhash` and `graft_minhash_hashes` can
    * never drift apart (their signatures must stay bit-identical for the
    * [[shingleHashes]] pairing to be cross-checkable).
    */
  private def minhashConstants(k: Int, seed: Int): (Array[Long], Array[Long]) = {
    val as = new Array[Long](k); val bs = new Array[Long](k)
    var j = 0
    while (j < k) {
      as(j) = splitmix64(seed.toLong * 0x9e37L + j * 2L) | 1L // odd multiplier
      bs(j) = splitmix64(seed.toLong * 0x85ebL + j * 2L + 1L)
      j += 1
    }
    (as, bs)
  }

  private def minhashFold(sig: Array[Long], as: Array[Long], bs: Array[Long],
      h: Long): Unit = {
    var t = 0
    while (t < sig.length) {
      val v = h * as(t) + bs(t)
      if (v < sig(t)) sig(t) = v
      t += 1
    }
  }

  def minhash(tokens: ArrayData, k: Int, seed: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val (as, bs) = minhashConstants(k, seed)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i))
        minhashFold(sig, as, bs, hash64(tokens.getUTF8String(i), seed))
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct 64-bit hashes of all word w-shingles of a token array —
    * the unit set for Jaccard resemblance, WITHOUT materializing shingle
    * strings: token hashes combine with an FNV-style fold per window.
    * Sorted ascending (canonical set form). Strings shorter than w
    * shingle whole; empty input yields the empty-shingle hash.
    */
  def shingleHashes(tokens: ArrayData, w: Int, seed: Int): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (tokens.isNullAt(i)) 0L else hash64(tokens.getUTF8String(i), seed)
      i += 1
    }
    val m = math.max(n - w + 1, 1)
    val hs = new Array[Long](m)
    var s = 0
    while (s < m) {
      var h = 0xcbf29ce484222325L
      var j = s
      val end = math.min(s + w, n)
      while (j < end) { h = (h ^ th(j)) * 0x100000001b3L; j += 1 }
      hs(s) = splitmix64(h)
      s += 1
    }
    java.util.Arrays.sort(hs)
    // dedup in place
    var out = 0
    var k = 0
    while (k < m) {
      if (out == 0 || hs(k) != hs(out - 1)) { hs(out) = hs(k); out += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** Distinct word w-shingle STRINGS (space-joined) — the string form of
    * [[shingleHashes]] for operators whose output is the shingle text
    * itself (n-gram counting). First-occurrence order.
    */
  def shingleStrings(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    val m = math.max(n - w + 1, 1)
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val out = new java.util.ArrayList[UTF8String](m)
    val sep = UTF8String.fromString(" ")
    var s = 0
    while (s < m) {
      val end = math.min(s + w, n)
      val parts = new Array[UTF8String](end - s)
      var j = s
      while (j < end) {
        parts(j - s) = if (tokens.isNullAt(j)) UTF8String.EMPTY_UTF8
                       else tokens.getUTF8String(j)
        j += 1
      }
      val sh = UTF8String.concatWs(sep, parts: _*)
      if (seen.add(sh)) out.add(sh)
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** MinHash signature over precomputed 64-bit element hashes (the
    * [[shingleHashes]] output): k minima of affine permutations.
    */
  def minhashFromHashes(hashes: ArrayData, k: Int, seed: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val (as, bs) = minhashConstants(k, seed)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      minhashFold(sig, as, bs, hashes.getLong(i))
      i += 1
    }
    new GenericArrayData(sig)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Low 64 bits of MD5 (first 8 digest bytes, big-endian) — the one hash
    * both Spark and DuckDB compute identically, which makes md5-keyed
    * sketches cross-engine verifiable (same trick as the md5-bucketed
    * dataset split).
    */
  def md5Low64(s: UTF8String): Long = {
    val md = md5Digest.get(); md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** 64-bit SimHash (Charikar '02) over a token array: per-bit majority
    * vote of token hashes; ties (vote == 0) resolve to bit 0. Token hash
    * is [[md5Low64]] so the fingerprint is replicable in SQL by the
    * DuckDB oracle (murmur is not).
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Low64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Document fingerprint: minimum 64-bit polynomial rolling hash over all
    * character windows of length `window` (the "winnowing" fingerprint of
    * Schleimer/Wilkerson/Aiken SIGMOD'03, with global min instead of
    * per-window selection). Strings shorter than `window` hash whole.
    */
  def rollingFingerprint(s: UTF8String, window: Int): Long = {
    val str = s.toString
    val n = str.length
    val B = 1000003L
    if (n <= window) {
      var h = 0L; var i = 0
      while (i < n) { h = h * B + str.charAt(i); i += 1 }
      return splitmix64(h)
    }
    // precompute B^(window-1) for the rolling subtract
    var pow = 1L; var p = 0
    while (p < window - 1) { pow *= B; p += 1 }
    var h = 0L; var i = 0
    while (i < window) { h = h * B + str.charAt(i); i += 1 }
    var min = splitmix64(h)
    while (i < n) {
      h = (h - str.charAt(i - window) * pow) * B + str.charAt(i)
      val f = splitmix64(h)
      if (f < min) min = f
      i += 1
    }
    min
  }

  /** Hamming distance between two 64-bit fingerprints (SimHash compare). */
  @inline def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Count of common elements of two SORTED DISTINCT string arrays
    * (binary UTF-8 order — Spark's array_sort order for strings): one
    * merge scan, zero allocation. The fast inner loop of pairwise Jaccard
    * verification — `size(array_intersect(a, b))` builds a hash set and an
    * output array per pair. Contract: no null elements.
    */
  def sortedIntersectCountString(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      // null elements are members of no set: skip, don't NPE (sort_array
      // places nulls first, so skipping here keeps the merge ordered)
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** Per-document term counts: (term, count) pairs in first-occurrence
    * order via one linear hashmap pass — the narrow pre-aggregation that
    * lets TF computation skip the corpus-wide (doc, term) shuffle.
    */
  def termCounts(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        counts.put(t, counts.getOrDefault(t, 0) + 1)
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine of a Catalyst float vector against a plain float[] centroid
    * (the inner loop of every IVF assignment / probe kernel below). Double
    * accumulation in element order — bit-reproducible at any parallelism.
    */
  @inline private def simTo(vec: ArrayData, cent: Array[Float]): Double = {
    val n = math.min(vec.numElements(), cent.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      val y = cent(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Nearest-centroid id by cosine over a small centroid matrix (IVF
    * assignment): centroids scan in array order, strict-greater keeps the
    * first on ties — the same semantics as an argmax fold with `sim >
    * best`. One flat pass, no per-cell allocation.
    */
  def nearestCell(vec: ArrayData, cents: Array[Array[Float]],
      ids: Array[Long]): Long = {
    var best = -2.0
    var bestId = -1L
    var c = 0
    while (c < cents.length) {
      val sim = simTo(vec, cents(c))
      if (sim > best) { best = sim; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  /** Two-level nearest-cell assignment: argmax cosine over the ~√C coarse
    * centroids, then argmax over only the fine centroids grouped under the
    * winning coarse cell. Per-row cost is O((√C + maxGroup)·dim) instead of
    * the flat O(C·dim) — the term that made corpus-coupled cell counts
    * superlinear. Approximate at coarse-cell boundaries (a vector's true
    * nearest fine centroid can live under a different coarse centroid) —
    * the same recall trade IVF probing already makes, and irrelevant to
    * exhaustive-probe twins, which scan every cell regardless of
    * assignment. Ties keep the first (lowest-id) entry at both levels.
    */
  def nearestCellTwoLevel(vec: ArrayData, coarse: Array[Array[Float]],
      groupIds: Array[Array[Long]],
      groupCents: Array[Array[Array[Float]]]): Long = {
    if (coarse.length == 0) return -1L // same sentinel as flat nearestCell
    var best = -2.0
    var bg = 0
    var g = 0
    while (g < coarse.length) {
      val sim = simTo(vec, coarse(g))
      if (sim > best) { best = sim; bg = g }
      g += 1
    }
    nearestCell(vec, groupCents(bg), groupIds(bg))
  }

  /** Signed (Rademacher ±1) projection of a float vector onto `signs.length`
    * directions over the 1e-6-QUANTIZED components: `y_p = Σ_d s(p,d) ·
    * floor(x_d · 1e6)` as exact Long arithmetic — order-independent,
    * overflow-free (64 dims × ±1e6-scale ≪ 2^63), and therefore
    * hash-checkable cross-engine, unlike a float accumulation whose sum
    * order would have to match the oracle's. One tight loop per row, no
    * allocation beyond the k-length output.
    */
  def signedProject(vec: ArrayData, signs: Array[Array[Byte]]): ArrayData = {
    val k = signs.length
    val out = new Array[Long](k)
    var p = 0
    while (p < k) {
      val s = signs(p)
      val n = math.min(vec.numElements(), s.length)
      var acc = 0L
      var d = 0
      while (d < n) {
        val q = math.floor(vec.getFloat(d).toDouble * 1000000.0).toLong
        acc += (if (s(d) > 0) q else -q)
        d += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  /** The `nProbe` nearest cell ids by cosine, best first (sim descending,
    * ties broken toward the earlier = lower id — consistent with
    * [[nearestCell]]'s first-wins argmax, so element 0 always equals the
    * flat assignment). Runs once per QUERY row (queries are index-small by
    * contract), replacing the sort-a-giant-struct-literal probe plan whose
    * expression tree grew with the cell count.
    */
  def nearestCells(vec: ArrayData, cents: Array[Array[Float]],
      ids: Array[Long], nProbe: Int): ArrayData = {
    val c = cents.length
    val take = math.min(math.max(nProbe, 0), c)
    val sims = new Array[Double](c)
    var i = 0
    while (i < c) { sims(i) = simTo(vec, cents(i)); i += 1 }
    val order = Array.range(0, c).sortWith { (a, b) =>
      sims(a) > sims(b) || (sims(a) == sims(b) && a < b)
    }
    val out = new Array[Long](take)
    var j = 0
    while (j < take) { out(j) = ids(order(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** Two-level probe selection: [[nearestCells]] when EVERY corpus row
    * probes (the kNN-graph / SemDeDup self-join shape), where the flat
    * kernel's O(cells·dim) per row turns a growing cell budget into a
    * superlinear scan. Coarse groups are scored first (O(√cells·dim));
    * groups are taken best-first until their fine cells cover
    * ≥ 4·nProbe candidates (or all groups), then those fine cells are
    * scored and the top nProbe win (sim desc, group-gather order on
    * ties). Approximate in the same sense as two-level ASSIGNMENT — a
    * near cell under an unprobed coarse group can be missed — which is
    * the recall trade the probe knob already makes. The gathered set
    * always contains the best coarse group's cells, so the probe list
    * covers [[nearestCellTwoLevel]]'s assignment (the cell a two-level-
    * assigned row itself sits in is always probed).
    */
  def nearestCellsTwoLevel(vec: ArrayData, coarse: Array[Array[Float]],
      groupIds: Array[Array[Long]], groupCents: Array[Array[Array[Float]]],
      nProbe: Int): ArrayData = {
    val ng = coarse.length
    val gsims = new Array[Double](ng)
    var g = 0
    while (g < ng) { gsims(g) = simTo(vec, coarse(g)); g += 1 }
    val gorder = Array.range(0, ng).sortWith { (a, b) =>
      gsims(a) > gsims(b) || (gsims(a) == gsims(b) && a < b)
    }
    // gather best-first coarse groups until enough fine candidates
    val want = math.max(nProbe, math.min(4 * nProbe, Int.MaxValue))
    var fine = 0
    var gTake = 0
    while (gTake < ng && fine < want) {
      fine += groupIds(gorder(gTake)).length
      gTake += 1
    }
    val candIds = new Array[Long](fine)
    val candSims = new Array[Double](fine)
    var k = 0
    var t = 0
    while (t < gTake) {
      val gi = gorder(t)
      val ids = groupIds(gi)
      val cs = groupCents(gi)
      var i = 0
      while (i < ids.length) {
        candIds(k) = ids(i)
        candSims(k) = simTo(vec, cs(i))
        k += 1
        i += 1
      }
      t += 1
    }
    val take = math.min(math.max(nProbe, 0), fine)
    val order = Array.range(0, fine).sortWith { (a, b) =>
      candSims(a) > candSims(b) || (candSims(a) == candSims(b) && a < b)
    }
    val out = new Array[Long](take)
    var j = 0
    while (j < take) { out(j) = candIds(order(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** [[sortedIntersectCountString]] for sorted distinct long arrays (the
    * [[shingleHashes]] output form).
    */
  def sortedIntersectCountLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      // a null element would read as 0 and falsely match a real 0 hash —
      // skip it (null is a member of no set)
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }

  /** Product-quantization encode (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): for each of the m
    * subspaces, the index of the L2-nearest code vector for the
    * corresponding sub-slice of `vec`. Each distance accumulates its
    * squared-difference terms in Double in element order (the left-
    * associative fold a spelled-out SQL sum produces), and ties keep the
    * SMALLEST code index via strict `<` — both required for the
    * assignment to be bit-replayable by the DuckDB oracle.
    *
    * `codebooks(s)(j)` is the j-th code of subspace s, length dim/m.
    */
  def pqEncode(vec: ArrayData,
      codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val out = new Array[Any](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cb = codebooks(s)
      val sub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = vec.getFloat(off + i).toDouble - c(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance (ADC) dot-product estimate in exact MICRO-UNITS:
    * per subspace, the Double dot of the query sub-slice with the chosen
    * code vector (element-order fold), floored to integer micro-units
    * BEFORE the cross-subspace sum — so the total is exact integer
    * arithmetic whatever order an aggregate adds partials in, and the
    * only float ops are the per-subspace dots, each bit-replayable as a
    * spelled-out left-associative SQL sum. (A continuous Double fold
    * across subspace boundaries would round differently from any
    * SQL-side sum of partials.)
    */
  def pqAdcMicro(codes: ArrayData, qvec: ArrayData,
      codebooks: Array[Array[Array[Float]]]): Long = {
    val m = codebooks.length
    var acc = 0L
    var s = 0
    var off = 0
    while (s < m) {
      // a null element (containsNull=true after a parquet round-trip)
      // would read as code 0 on unsafe rows — a silently wrong score;
      // fail loudly instead (the analysis gate can't see element nulls)
      if (codes.isNullAt(s))
        throw new IllegalArgumentException(
          s"pq_adc_micro: null code at subspace $s — codes must be " +
            "non-null array<int> of length " + m)
      val c = codebooks(s)(codes.getInt(s))
      val sub = c.length
      var p = 0.0
      var i = 0
      while (i < sub) {
        p += qvec.getFloat(off + i).toDouble * c(i).toDouble
        i += 1
      }
      acc += math.floor(1e6 * p).toLong
      off += sub
      s += 1
    }
    acc
  }

  /** ADC micro-unit scores of ONE corpus row's codes against EVERY query's
    * precomputed lookup table in one call: `out(q) = Σ_s luts(q)(s)(code_s)`.
    * `luts(q)(s)(j)` = `floor(1e6 · dot(query_q_subslice_s, codebook_s_j))`
    * with the identical left-associative Double fold [[pqAdcMicro]] uses, so
    * every score is bit-identical to the per-pair kernel — the LUT is the
    * classic ADC table (Jégou et al. §IV-A): per-pair cost falls from
    * m·(dim/m) float mults to m integer table reads.
    *
    * This exists for the broadcast-query retrieval shape (v16): scoring all
    * queries inside ONE per-row expression keeps the expensive
    * [[pqEncode]] upstream of it evaluated once per corpus row — the
    * join-based shape deferred the encode into the per-query join loop
    * under whole-stage codegen (the join condition didn't reference the
    * codes column, so its lazily-emitted code landed inside the
    * build-row loop), silently multiplying encode work by the query count.
    */
  def pqAdcAllMicro(codes: ArrayData,
      luts: Array[Array[Array[Long]]]): ArrayData = {
    val nq = luts.length
    val m = codes.numElements()
    var s = 0
    while (s < m) {
      // same loud-failure contract as pqAdcMicro: a null element would
      // read as code 0 on unsafe rows — silently wrong scores
      if (codes.isNullAt(s))
        throw new IllegalArgumentException(
          s"pq_adc_all_micro: null code at subspace $s — codes must be " +
            "non-null array<int> of length " + m)
      s += 1
    }
    val out = new Array[Any](nq)
    var q = 0
    while (q < nq) {
      val lut = luts(q)
      var acc = 0L
      var i = 0
      while (i < m) {
        acc += lut(i)(codes.getInt(i))
        i += 1
      }
      out(q) = acc
      q += 1
    }
    new GenericArrayData(out)
  }

  private val BpeWhitespace = java.util.regex.Pattern.compile("\\s+")

  /** Unambiguous pair key for the BPE rank map: the left symbol's length
    * prefixes the concatenation, so the (l, r) split point is part of the
    * key — `("a<NUL>","b")` and `("a","<NUL>b")` cannot collide the way
    * any separator-joined form can for symbols containing the separator.
    * ONE definition for the map builder ([[graft.functions.text.bpeEncode]])
    * and the lookup below.
    */
  def bpePairKey(l: String, r: String): String =
    l.length.toString + ":" + l + r

  /** BPE subword encoding of a whole text in one pass: lowercase, split on
    * whitespace, group consecutive words into `chunkWords`-word units
    * (space-joined; the trailing unit may be shorter), and encode each
    * unit by LOWEST-RANK-FIRST merging against `ranks` (key =
    * [[bpePairKey]] → merge rank — length-prefixed, so no symbol
    * content can alias two distinct pairs). Lowest-rank-first is
    * equivalent to
    * applying the merge list in rank order — a consuming merge always
    * ranks later than the merges producing its constituents, so no
    * lower-rank pair can re-form after its pass (the t33 oracle proves
    * the equivalence empirically against the rank-order SQL replay).
    *
    * Cost is O(symbols²) per unit with O(1) hash probes, INDEPENDENT of
    * the merge-table size — the complexity class a 30k-merge production
    * vocabulary needs, where the fold-the-merge-list form pays O(merges)
    * per word and carries the whole table as a plan literal. The rank map
    * rides as an expression reference object: shared per executor, zero
    * plan bytes.
    *
    * Each merge pass replaces all non-overlapping occurrences left to
    * right — `replace` semantics, matching the trainer and the oracle.
    */
  def bpeEncodeText(text: UTF8String,
      ranks: java.util.HashMap[String, Integer], chunkWords: Int): ArrayData = {
    // UTF8String.toLowerCase — the SAME lowercasing Spark's lower() does
    // at training time (bpeUnits → tokens → lower). Java's
    // String.toLowerCase differs on locale/Unicode-special characters
    // (e.g. U+0130), and a train/apply divergence there would make
    // trained merges silently never match.
    val words0 = BpeWhitespace.split(text.toLowerCase.toString)
    val words = new java.util.ArrayList[String](words0.length)
    var wi = 0
    while (wi < words0.length) {
      if (words0(wi).nonEmpty) words.add(words0(wi))
      wi += 1
    }
    val out = new java.util.ArrayList[UTF8String](words.size * 2)
    var g = 0
    while (g < words.size) {
      val end = math.min(g + chunkWords, words.size)
      val unit = new StringBuilder(16)
      var k = g
      while (k < end) {
        if (k > g) unit.append(' ')
        unit.append(words.get(k))
        k += 1
      }
      encodeUnit(unit.toString, ranks, out)
      g = end
    }
    val arr = new Array[Any](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** CHARACTER-WINDOW BPE encoding (the r14 unit mode): lowercase,
    * collapse whitespace runs to single spaces (the same normalized
    * stream the word units see, re-chunked at character granularity —
    * GPT-2-style byte-level pre-tokenization reduced to this corpus's
    * ASCII reality, spaces included as ordinary symbols so merges cross
    * word boundaries), split into consecutive `win`-char windows, and
    * encode each window with the same lowest-rank-first loop. Cost is
    * O(win²) per window independent of the merge count — the same
    * flatness class as [[bpeEncodeText]]. Windows split on UTF-16 units
    * with a surrogate-pair guard; on a non-BMP corpus the SQL-side
    * trainer windows (code-point substring) could differ by one position
    * per window — an apply-quality nuance, not a correctness seam, and
    * moot on this ASCII corpus (same caveat class as the trainer's
    * tie-break note).
    */
  def bpeEncodeTextChars(text: UTF8String,
      ranks: java.util.HashMap[String, Integer], win: Int): ArrayData = {
    val words0 = BpeWhitespace.split(text.toLowerCase.toString)
    val norm = new StringBuilder(text.numBytes())
    var wi = 0
    while (wi < words0.length) {
      if (words0(wi).nonEmpty) {
        if (norm.nonEmpty) norm.append(' ')
        norm.append(words0(wi))
      }
      wi += 1
    }
    val s = norm.toString
    val out = new java.util.ArrayList[UTF8String](s.length / 4 + 4)
    var g = 0
    while (g < s.length) {
      var end = math.min(g + win, s.length)
      if (end < s.length && Character.isHighSurrogate(s.charAt(end - 1)))
        end += 1
      encodeUnit(s.substring(g, end), ranks, out)
      g = end
    }
    val arr = new Array[Any](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** One unit's lowest-rank-first merge loop; appends its subword tokens
    * to `out`. Symbols start as code points (the `(?s)(.)` segmentation).
    */
  private def encodeUnit(unit: String,
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point split (ASCII corpus = chars, but stay surrogate-safe)
    var syms = new java.util.ArrayList[String](unit.length)
    var ci = 0
    while (ci < unit.length) {
      val cp = unit.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(unit.substring(ci, ci + n))
      ci += n
    }
    var done = syms.size < 2
    while (!done) {
      // find the lowest-rank adjacent pair present
      var best = Integer.MAX_VALUE
      var bl: String = null; var br: String = null
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(bpePairKey(syms.get(j), syms.get(j + 1)))
        if (r != null && r < best) { best = r; bl = syms.get(j); br = syms.get(j + 1) }
        j += 1
      }
      if (bl == null) done = true
      else {
        // merge all non-overlapping occurrences left to right
        val next = new java.util.ArrayList[String](syms.size)
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms.get(i) == bl && syms.get(i + 1) == br) {
            next.add(bl + br); i += 2
          } else { next.add(syms.get(i)); i += 1 }
        }
        syms = next
        done = syms.size < 2
      }
    }
    var i = 0
    while (i < syms.size) {
      out.add(UTF8String.fromString(syms.get(i)))
      i += 1
    }
  }
}
