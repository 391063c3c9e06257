package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector / text kernels.
  *
  * Each expression participates in whole-stage codegen via `defineCodeGen`
  * (the generated Java is a single static call into [[Kernels]]), so these
  * stay inside WholeStageCodegen spans instead of breaking them the way a
  * Scala UDF would — the hot path of dedup / similarity scans at 100 TB.
  */

/** Analysis-time gate shared by the vector kernels: every vector operand
  * must be `array<float>` — the kernels read element bytes as floats, so
  * an `array<double>` operand (the natural type of a SQL `array(0.1,…)`
  * literal) would return silent GARBAGE on unsafe rows or a runtime
  * ClassCastException on generic ones. Failing analysis is the only
  * correct outcome.
  */
private[functions] trait FloatVectorInputs {
  self: Expression =>
  protected def vectorOperands: Seq[Expression]
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    vectorOperands.find(e => e.dataType match {
      case ArrayType(FloatType, _) => false
      case _ => true
    }) match {
      case Some(bad) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> vectors, got " +
            s"${bad.dataType.sql} (cast with CAST(x AS ARRAY<FLOAT>))")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** cosine(a, b): Double over two array<float> columns. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with FloatVectorInputs {
  override protected def vectorOperands: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine"
}

/** norm(a): Double Euclidean norm of an array<float> column — the
  * once-per-row half of the [[CosinePre]] split.
  */
case class VecNorm(child: Expression) extends UnaryExpression
    with FloatVectorInputs {
  override protected def vectorOperands: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    Kernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.norm($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_vec_norm"
}

/** cosine_pre(a, b, norm_a, norm_b): cosine with precomputed norms —
  * bit-identical to [[CosineSimilarity]] for equal-length vectors, but the
  * per-pair work is a single dot product. Use in celled/probed pair joins
  * where each side's norm is computed once per row, not once per pair.
  */
case class CosinePre(a: Expression, b: Expression,
    normA: Expression, normB: Expression) extends QuaternaryExpression
    with FloatVectorInputs {
  override protected def vectorOperands: Seq[Expression] = Seq(a, b)
  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = normA
  override def fourth: Expression = normB
  override def dataType: DataType = DoubleType
  override def nullSafeEval(av: Any, bv: Any, nav: Any, nbv: Any): Any =
    Kernels.cosinePre(av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData],
      nav.asInstanceOf[Double], nbv.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (av, bv, nav, nbv) =>
      s"graft.functions.Kernels.cosinePre($av, $bv, $nav, $nbv)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(a = newFirst, b = newSecond, normA = newThird, normB = newFourth)
  override def prettyName: String = "graft_cosine_pre"
}

/** dot(a, b): Double over two array<float> columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with FloatVectorInputs {
  override protected def vectorOperands: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** minhash(tokens, k, seed): array<bigint> MinHash signature (Broder '97). */
case class MinHashSignature(child: Expression, k: Int, seed: Int)
    extends UnaryExpression {
  require(k > 0, s"graft_minhash: k must be positive, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any): Any =
    Kernels.minhash(tokens.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.minhash($t, $k, $seed)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

/** shingle_hashes(tokens, w, seed): array<bigint> — distinct sorted 64-bit
  * w-shingle hashes, no shingle-string materialization.
  */
case class ShingleHashes(child: Expression, w: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any): Any =
    Kernels.shingleHashes(tokens.asInstanceOf[ArrayData], w, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.shingleHashes($t, $w, $seed)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** shingle_strings(tokens, w): array<string> — distinct space-joined
  * w-shingles (string twin of [[ShingleHashes]], for n-gram counting).
  */
case class ShingleStrings(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(tokens: Any): Any =
    Kernels.shingleStrings(tokens.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.shingleStrings($t, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_strings"
}

/** minhash_hashes(hashes, k, seed): MinHash signature over precomputed
  * element hashes (pairs with [[ShingleHashes]]).
  */
case class MinHashFromHashes(child: Expression, k: Int, seed: Int)
    extends UnaryExpression {
  require(k > 0, s"graft_minhash_hashes: k must be positive, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(hashes: Any): Any =
    Kernels.minhashFromHashes(hashes.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.minhashFromHashes($t, $k, $seed)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_hashes"
}

/** simhash64(tokens): Long SimHash fingerprint (Charikar '02). */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    Kernels.simhash64(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.simhash64($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

/** nearest_centroid(vec): Long — id of the nearest centroid by cosine
  * (IVF cell assignment). The centroid matrix rides along as a reference
  * object (`ctx.addReferenceObj`), so the expression stays inside
  * whole-stage codegen — unlike an `aggregate()` HOF fold, whose lambda is
  * interpreted and allocates an accumulator struct per centroid per row.
  */
case class NearestCentroid(child: Expression, cellIds: Array[Long],
    centroids: Array[Array[Float]]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(vec: Any): Any =
    Kernels.nearestCell(vec.asInstanceOf[ArrayData], centroids, cellIds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val ids = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.Kernels.nearestCell($v, $cents, $ids)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_centroid"
}

/** nearest_centroid_2l(vec): Long — two-level coarse→fine nearest-cell
  * assignment (see [[Kernels.nearestCellTwoLevel]]). The grouped centroid
  * matrices ride along as reference objects, so per-row cost is
  * O((√cells + maxGroup)·dim) inside whole-stage codegen — the assignment
  * form that keeps a growing cell budget from making the corpus scan
  * superlinear.
  */
case class NearestCentroidTwoLevel(child: Expression,
    coarse: Array[Array[Float]], groupIds: Array[Array[Long]],
    groupCents: Array[Array[Array[Float]]]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(vec: Any): Any =
    Kernels.nearestCellTwoLevel(vec.asInstanceOf[ArrayData], coarse,
      groupIds, groupCents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("coarse", coarse, "float[][]")
    val gi = ctx.addReferenceObj("groupIds", groupIds, "long[][]")
    val gc = ctx.addReferenceObj("groupCents", groupCents, "float[][][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.Kernels.nearestCellTwoLevel($v, $co, $gi, $gc)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_centroid_2l"
}

/** nearest_cells(vec): array<bigint> — the nProbe nearest cell ids, best
  * first (IVF probe selection). Centroids are a reference object, so the
  * expression tree stays O(1) in the cell count — the previous probe plan
  * sorted an array-of-structs LITERAL of every centroid, whose analysis
  * cost grew with the index.
  */
case class NearestCells(child: Expression, cellIds: Array[Long],
    centroids: Array[Array[Float]], nProbe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(vec: Any): Any =
    Kernels.nearestCells(vec.asInstanceOf[ArrayData], centroids, cellIds, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val ids = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.Kernels.nearestCells($v, $cents, $ids, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_cells"
}

/** nearest_cells_2l(vec): array<bigint> — two-level probe selection
  * ([[Kernels.nearestCellsTwoLevel]]): the corpus-side probe form whose
  * per-row cost is O((√cells + gathered)·dim) instead of the flat
  * kernel's O(cells·dim) — the difference between linear and quadratic
  * for self-join ops where EVERY row probes a growing cell budget.
  */
case class NearestCellsTwoLevel(child: Expression,
    coarse: Array[Array[Float]], groupIds: Array[Array[Long]],
    groupCents: Array[Array[Array[Float]]], nProbe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(vec: Any): Any =
    Kernels.nearestCellsTwoLevel(vec.asInstanceOf[ArrayData], coarse,
      groupIds, groupCents, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("coarse", coarse, "float[][]")
    val gi = ctx.addReferenceObj("groupIds", groupIds, "long[][]")
    val gc = ctx.addReferenceObj("groupCents", groupCents, "float[][][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.Kernels.nearestCellsTwoLevel($v, $co, $gi, $gc, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_cells_2l"
}

/** signed_project(vec): array<bigint> — Rademacher ±1 projection over
  * 1e-6-quantized components ([[Kernels.signedProject]]); the sign matrix
  * rides as a reference object.
  */
case class SignedProject(child: Expression, signs: Array[Array[Byte]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(vec: Any): Any =
    Kernels.signedProject(vec.asInstanceOf[ArrayData], signs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("signs", signs, "byte[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.Kernels.signedProject($v, $s)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_signed_project"
}

/** term_counts(tokens): array<struct<term, cnt>> — per-row term counts in
  * one linear pass (the narrow TF pre-aggregation).
  */
case class TermCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(tokens: Any): Any =
    Kernels.termCounts(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.termCounts($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_term_counts"
}

/** sorted_intersect_count(a, b): Int — common-element count of two sorted
  * distinct arrays (string or bigint elements), via a single merge scan.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  // fail at ANALYSIS time on non-array or mismatched inputs — without this
  // a SQL call like graft_sorted_intersect_count('x', 1) reaches the kernel
  // dispatch and dies with a runtime ClassCastException instead
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      // containsNull=true is accepted (most built-up arrays carry it in
      // the schema whether or not values are ever null); the kernels
      // SKIP null elements — null is a member of no set
      case (ArrayType(le, _), ArrayType(re, _))
          if le == re && (le == StringType || le == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_sorted_intersect_count requires two arrays of the same " +
            s"element type (string or bigint), got ${l.sql} and ${r.sql}")
    }
  private def kernel: String =
    left.dataType.asInstanceOf[ArrayType].elementType match {
      case StringType => "sortedIntersectCountString"
      case LongType => "sortedIntersectCountLong"
      case t => throw new IllegalArgumentException(
        s"sorted_intersect_count: unsupported element type $t")
    }
  override def nullSafeEval(a: Any, b: Any): Any = kernel match {
    case "sortedIntersectCountString" =>
      Kernels.sortedIntersectCountString(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case _ =>
      Kernels.sortedIntersectCountLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.$kernel($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_intersect_count"
}

/** rolling_fingerprint(text, window): Long min-rolling-hash fingerprint. */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0,
    s"graft_rolling_fingerprint: window must be positive, got $window")
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    Kernels.rollingFingerprint(s.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.Kernels.rollingFingerprint($s, $window)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_fingerprint"
}

/** Column-level API over the native expressions. */
/** pq_encode(vec): array<int> — the m product-quantization codes of an
  * array<float> vector (see [[Kernels.pqEncode]]). The codebooks ride
  * along as a reference object, so per-row cost is O(m·k·sub) = O(k·dim)
  * inside whole-stage codegen and the expression tree stays O(1) in the
  * codebook size.
  */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression
    with FloatVectorInputs {
  override protected def vectorOperands: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(vec: Any): Any =
    Kernels.pqEncode(vec.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Kernels.pqEncode($v, $cb)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_encode"
}

/** pq_adc_micro(codes, qvec): Long — asymmetric-distance dot estimate in
  * exact micro-units (see [[Kernels.pqAdcMicro]]); the per-pair hot loop
  * of PQ retrieval, O(dim) per pair like a plain dot but over the m
  * codebook rows the codes select instead of the stored vector.
  */
case class PqAdcMicro(codes: Expression, qvec: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression
    with FloatVectorInputs {
  override protected def vectorOperands: Seq[Expression] = Seq(qvec)
  // gate BOTH operands: an array<bigint> codes column (e.g. a parquet
  // round-trip that widened the element type) would be misread by
  // getInt on unsafe rows — silent garbage indices, the exact class the
  // custom-function sweep closed for the float-vector operands
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    codes.dataType match {
      case ArrayType(IntegerType, _) => super.checkInputDataTypes()
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int> codes, got ${other.sql} " +
            "(cast with CAST(codes AS ARRAY<INT>))")
    }
  override def left: Expression = codes
  override def right: Expression = qvec
  override def dataType: DataType = LongType
  override def nullSafeEval(c: Any, q: Any): Any =
    Kernels.pqAdcMicro(c.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev,
      (c, q) => s"graft.functions.Kernels.pqAdcMicro($c, $q, $cb)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, qvec = newRight)
  override def prettyName: String = "graft_pq_adc_micro"
}

/** pq_adc_all_micro(codes): array<bigint> — one corpus row's ADC
  * micro-unit scores against EVERY query's precomputed lookup table
  * ([[Kernels.pqAdcAllMicro]]). The query LUTs ride as a reference
  * object (queries × m × codebookSize longs — broadcast-query-set
  * sized); scoring all queries inside one expression is what keeps the
  * upstream [[PqEncode]] evaluated once per corpus row instead of once
  * per (row, query) pair — see the kernel's scaladoc for the
  * deferred-codegen trap this closes.
  */
case class PqAdcAllMicro(codes: Expression,
    luts: Array[Array[Array[Long]]]) extends UnaryExpression {
  override def child: Expression = codes
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    codes.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int> codes, got ${other.sql} " +
            "(cast with CAST(codes AS ARRAY<INT>))")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(c: Any): Any =
    Kernels.pqAdcAllMicro(c.asInstanceOf[ArrayData], luts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("pqAdcLuts", luts, "long[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.pqAdcAllMicro($c, $l)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(codes = newChild)
  override def prettyName: String = "graft_pq_adc_all_micro"
}

/** bpe_encode(text): array<string> — whole-text BPE subword tokenization
  * against a trained merge table ([[Kernels.bpeEncodeText]]): lowercase,
  * whitespace split, `chunkWords`-word units, lowest-rank-first merges.
  * The pair→rank map rides as a REFERENCE OBJECT, so plan bytes and
  * per-word cost are independent of the merge count — the previous
  * fold-the-merge-list `aggregate` form was O(merges) per word with the
  * whole table as a Catalyst literal (codegen method-size ceiling at a
  * realistic 30k-merge vocabulary). Stays in whole-stage codegen via a
  * single static kernel call.
  */
case class BpeEncodeText(child: Expression,
    ranks: java.util.HashMap[String, Integer], chunkWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    Kernels.bpeEncodeText(text.asInstanceOf[UTF8String], ranks, chunkWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      t => s"graft.functions.Kernels.bpeEncodeText($t, $r, $chunkWords)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_encode"
}

/** bpe_encode_chars(text): array<string> — [[BpeEncodeText]]'s
  * character-window twin ([[Kernels.bpeEncodeTextChars]]): units are
  * consecutive `unitChars`-character windows of the whitespace-collapsed
  * text (merges cross word boundaries), the unit mode that lets a
  * vocabulary-poor corpus train a production-sized merge table. Same
  * reference-object rank map, same O(window²)-independent-of-merges
  * flatness class.
  */
case class BpeEncodeTextChars(child: Expression,
    ranks: java.util.HashMap[String, Integer], unitChars: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    Kernels.bpeEncodeTextChars(text.asInstanceOf[UTF8String], ranks, unitChars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      t => s"graft.functions.Kernels.bpeEncodeTextChars($t, $r, $unitChars)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_encode_chars"
}

object vector {
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def norm(a: Column): Column =
    Bridge.column(VecNorm(Bridge.expression(a)))
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    Bridge.column(CosinePre(Bridge.expression(a), Bridge.expression(b),
      Bridge.expression(normA), Bridge.expression(normB)))
  def nearestCentroid(vec: Column, cellIds: Array[Long],
      centroids: Array[Array[Float]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), cellIds, centroids))
  def nearestCentroidTwoLevel(vec: Column, coarse: Array[Array[Float]],
      groupIds: Array[Array[Long]],
      groupCents: Array[Array[Array[Float]]]): Column =
    Bridge.column(NearestCentroidTwoLevel(Bridge.expression(vec), coarse,
      groupIds, groupCents))
  def nearestCells(vec: Column, cellIds: Array[Long],
      centroids: Array[Array[Float]], nProbe: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(vec), cellIds, centroids, nProbe))
  def nearestCellsTwoLevel(vec: Column, coarse: Array[Array[Float]],
      groupIds: Array[Array[Long]],
      groupCents: Array[Array[Array[Float]]], nProbe: Int): Column =
    Bridge.column(NearestCellsTwoLevel(Bridge.expression(vec), coarse,
      groupIds, groupCents, nProbe))
  def signedProject(vec: Column, signs: Array[Array[Byte]]): Column =
    Bridge.column(SignedProject(Bridge.expression(vec), signs))
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), codebooks))
  def pqAdcMicro(codes: Column, qvec: Column,
      codebooks: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqAdcMicro(Bridge.expression(codes), Bridge.expression(qvec),
      codebooks))
  def pqAdcAllMicro(codes: Column, luts: Array[Array[Array[Long]]]): Column =
    Bridge.column(PqAdcAllMicro(Bridge.expression(codes), luts))
}

object text {
  def minhash(tokens: Column, k: Int = 64, seed: Int = 42): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), k, seed))
  def shingleHashes(tokens: Column, w: Int = 3, seed: Int = 42): Column =
    Bridge.column(ShingleHashes(Bridge.expression(tokens), w, seed))
  def shingleStrings(tokens: Column, w: Int = 3): Column =
    Bridge.column(ShingleStrings(Bridge.expression(tokens), w))
  def minhashFromHashes(hashes: Column, k: Int = 64, seed: Int = 42): Column =
    Bridge.column(MinHashFromHashes(Bridge.expression(hashes), k, seed))
  def simhash(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def rollingFingerprint(s: Column, window: Int = 16): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(s), window))
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
  def termCounts(tokens: Column): Column =
    Bridge.column(TermCounts(Bridge.expression(tokens)))
  def bpeEncode(text: Column, merges: Seq[(String, String)],
      chunkWords: Int = 1): Column = {
    // length-prefixed pair key (Kernels.bpePairKey — unambiguous for any
    // symbol content); first (lowest) rank wins defensively, though a
    // trained table never repeats a pair
    val ranks = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      ranks.putIfAbsent(Kernels.bpePairKey(l, r), Integer.valueOf(i))
    }
    Bridge.column(BpeEncodeText(Bridge.expression(text), ranks, chunkWords))
  }
  def bpeEncodeChars(text: Column, merges: Seq[(String, String)],
      unitChars: Int): Column = {
    val ranks = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      ranks.putIfAbsent(Kernels.bpePairKey(l, r), Integer.valueOf(i))
    }
    Bridge.column(BpeEncodeTextChars(Bridge.expression(text), ranks, unitChars))
  }
}
