package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL registration of every graft native function, so `spark.sql` text
  * (and the KSQL front-end) can call them by name:
  *
  *   graft_cosine(a, b), graft_dot(a, b),
  *   graft_minhash(tokens[, k, seed]), graft_simhash64(tokens),
  *   graft_rolling_fingerprint(s[, window]),
  *   graft_shingle_hashes(tokens[, w, seed]),
  *   graft_shingle_strings(tokens[, w]),
  *   graft_sorted_intersect_count(a, b), graft_term_counts(tokens),
  *   graft_latest_by_offset(value, order)   (aggregate),
  *   graft_top_k_by_score(score, id, k)     (aggregate),
  *   graft_heavy_hitters(item, capacity)    (aggregate),
  *   graft_count_min(item, 'q1,q2,…', depth, width) (aggregate).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_cosine",
      args => CosineSimilarity(args(0), args(1)))
    Bridge.registerFunction(spark, "graft_dot",
      args => DotProduct(args(0), args(1)))
    Bridge.registerFunction(spark, "graft_simhash64",
      args => SimHash64(args(0)))
    Bridge.registerFunction(spark, "graft_minhash", {
      case Seq(t) => MinHashSignature(t, 64, 42)
      case Seq(t, k, s) =>
        MinHashSignature(t, intLit(k, "k"), intLit(s, "seed"))
      case args => throw new IllegalArgumentException(
        s"graft_minhash takes 1 or 3 args, got ${args.size}")
    })
    Bridge.registerFunction(spark, "graft_rolling_fingerprint", {
      case Seq(t) => RollingFingerprint(t, 16)
      case Seq(t, w) => RollingFingerprint(t, intLit(w, "window"))
      case args => throw new IllegalArgumentException(
        s"graft_rolling_fingerprint takes 1 or 2 args, got ${args.size}")
    })
    Bridge.registerFunction(spark, "graft_shingle_hashes", {
      case Seq(t) => ShingleHashes(t, 3, 42)
      case Seq(t, w, s) => ShingleHashes(t, intLit(w, "w"), intLit(s, "seed"))
      case args => throw new IllegalArgumentException(
        s"graft_shingle_hashes takes 1 or 3 args, got ${args.size}")
    })
    Bridge.registerFunction(spark, "graft_shingle_strings", {
      case Seq(t) => ShingleStrings(t, 3)
      case Seq(t, w) => ShingleStrings(t, intLit(w, "w"))
      case args => throw new IllegalArgumentException(
        s"graft_shingle_strings takes 1 or 2 args, got ${args.size}")
    })
    Bridge.registerFunction(spark, "graft_sorted_intersect_count",
      args => SortedIntersectCount(args(0), args(1)))
    Bridge.registerFunction(spark, "graft_term_counts",
      args => TermCounts(args(0)))
    Bridge.registerFunction(spark, "graft_latest_by_offset",
      args => LatestByOffsetAgg(args(0), args(1)))
    Bridge.registerFunction(spark, "graft_top_k_by_score",
      args => TopKByScore(args(0), args(1), intLit(args(2), "k")))
    Bridge.registerFunction(spark, "graft_heavy_hitters",
      args => HeavyHitters(args(0), intLit(args(1), "capacity")))
    Bridge.registerFunction(spark, "graft_count_min", {
      case Seq(item, items, d, w) =>
        // comma-separated query list: items trim their surrounding
        // whitespace ('q1, q2' queries q2, not ' q2') and empty segments
        // drop; a key CONTAINING a comma is unrepresentable in this
        // literal form — pass it through the Scala API instead
        val qs = strLit(items, "queryItems").split(',')
          .iterator.map(_.trim).filter(_.nonEmpty).toSeq
        if (qs.isEmpty) throw new IllegalArgumentException(
          "graft_count_min needs at least one non-empty query item")
        CountMinEstimates(item, qs, intLit(d, "depth"), intLit(w, "width"))
      case args => throw new IllegalArgumentException(
        s"graft_count_min takes (item, 'q1,q2,…', depth, width), got ${args.size} args")
    })
  }
}
