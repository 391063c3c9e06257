package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tutorial-parity relational operators (SURVEY.md §2), as pure
  * `DataFrame => DataFrame` transformations so the same code path runs
  * batch (driver Verify/Bench over parquet) and streaming (MemoryStream /
  * Kafka). Citations are reference file:line.
  *
  * Catalyst handles placement: filters written after joins still push down
  * (PushDownPredicates), projections prune the parquet scan
  * (ColumnPruning), small dimension sides broadcast automatically — the
  * manual optimizations the reference performs in query text (its
  * `PARTITION BY player_id` CSAS, hand-placed WHEREs) are free here
  * (SURVEY.md §4).
  */
object Ops {

  /** P5 (README.md:136-148): CASE WHEN … THEN … ELSE … END projection. */
  def caseLabel(input: Column, cases: Seq[(Column, String)], default: String): Column =
    cases.foldRight(lit(default)) { case ((cond, v), els) => when(cond, v).otherwise(els) }

  /** A2 (README.md:278-304, all.sql:77-92): SUM(CASE WHEN cond THEN 1 ELSE
    * 0 END) — the conditional-aggregation pivot. Runs map-side partial
    * aggregation before the shuffle (HashAggregate partial/final).
    */
  def sumIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** J1/J2 (README.md:367-375, all.sql:56-63,94-98): enrich a fact/stream
    * with a dimension. `broadcastDim` pins the broadcast-hash strategy for
    * dimension tables that are small relative to executors (the planner
    * would usually choose it anyway under the 10MB threshold; at 100 TB
    * the hint documents intent and survives stats misestimates).
    * No manual co-partitioning needed — EnsureRequirements shuffles when
    * it must (the reference does this by hand via `PARTITION BY`,
    * all.sql:45-51).
    */
  def enrichJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, joinType: String = "inner",
      broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    fact.join(d, fact(factKey) === d(dimKey), joinType)
  }

  /** S4 (all.sql:45-51): CSAS re-key — projection + hash repartition on the
    * new key. Semantically a no-op in-engine (Catalyst re-shuffles joins
    * itself); kept for materializing co-partitioned sinks, where it
    * pre-pays the join exchange.
    */
  def rekey(df: DataFrame, keyCol: String, projectCols: Seq[String]): DataFrame =
    df.select(projectCols.map(col): _*).repartition(col(keyCol))

  /** A6 (README.md:379-411): derived metric over aggregates —
    * CAST(x AS DOUBLE)/CAST(y AS DOUBLE).
    */
  def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")

  /** Backward as-of join: each fact row picks the single dim row with the
    * LARGEST `dimTs <= factTs` for its key — "the dimension version in
    * effect at event time" (slowly-changing dimensions, point-in-time
    * joins). Spark has no asof primitive; this composes equi-join +
    * time filter + latest-by-offset aggregation, all hash-based.
    *
    * Output: every fact column plus the dim's non-key columns (inner:
    * facts with no prior dim version drop out). Dim versions tied on
    * (key, ts) collapse deterministically to the greatest payload tuple
    * (struct ordering) before the pick.
    *
    * Scale: the pair blow-up is bounded per key by
    * versions(key) × facts(key) inside one hash partition; the aggregate's
    * partial phase collapses each fact back to one row before the final
    * exchange. For extreme version counts the refinement is a per-key
    * sort-merge in `mapPartitions` after a range repartition — same
    * result, one pass; not needed at dimension-update rates.
    */
  def asofJoin(fact: DataFrame, dim: DataFrame, key: String,
      factTs: String, dimTs: String): DataFrame = {
    val factCols = fact.columns.toSeq
    val dimValueCols = dim.columns.toSeq.filterNot(c => c == key || c == dimTs)
    val d = dim.select(
      col(key).as("_dk") +: col(dimTs).as("_dts") +:
        dimValueCols.map(c => col(c).as(s"_d_$c")): _*)
    // Tie rule: among dim versions sharing the same (key, ts) —
    // admissible under at-least-once ingestion — the greatest payload
    // tuple wins (struct ordering), collapsed BEFORE the as-of pick.
    // LatestByOffsetAgg's strict `>` keeps whichever tied row merges
    // first, so without this the pick would be partition-order
    // nondeterministic (and unmatchable against any oracle).
    val dTied =
      if (dimValueCols.isEmpty) d.distinct()
      else d.groupBy(col("_dk"), col("_dts"))
        .agg(max(struct(dimValueCols.map(c => col(s"_d_$c")): _*)).as("_dv"))
        .select(col("_dk") +: col("_dts") +:
          dimValueCols.map(c => col(s"_dv._d_$c").as(s"_d_$c")): _*)
    // _fid keeps the join row-preserving: two fact rows identical in
    // EVERY column (at-least-once ingestion, genuinely repeated events)
    // must stay two output rows, not collapse into one group
    val f = fact.withColumn("_fid", monotonically_increasing_id())
    f.join(dTied, f(key) === col("_dk") && col("_dts") <= f(factTs))
      .groupBy(col("_fid") +: factCols.map(f(_)): _*)
      .agg(
        graft.functions.LatestByOffsetAgg.column(
          struct(dimValueCols.map(c => col(s"_d_$c").as(c)): _*),
          unix_micros(col("_dts"))).as("_dim"))
      .select(factCols.map(col) ++ dimValueCols.map(c => col(s"_dim.$c").as(c)): _*)
  }

  /** Skew-salted shuffle join for a hot-keyed fact side that cannot be
    * broadcast-joined (dim too large): the fact side gets a deterministic
    * salt in [0, salts) derived from non-key columns, the dim side is
    * replicated `salts` times, and the join key becomes (key, salt) — a
    * skewed key's rows spread over `salts` reducers instead of one.
    *
    * AQE's skew-join split handles *detected* sort-merge skew at runtime;
    * explicit salting is for known pathological keys (null-heavy foreign
    * keys, celebrity entities) where predictable layout beats reactive
    * splitting. Result columns = fact ++ dim (salt dropped).
    */
  /** The salt [[saltedJoin]] assigns to each fact row: a deterministic
    * hash of the non-key columns mod `salts`. Deterministic (task retries
    * recompute the same routing) and uniform as long as the hot key's
    * rows differ in some non-key column — a hot key whose payload is ALSO
    * constant is exact-duplicate data; dedup it instead of salting.
    * Public so tests/operators can measure the spread it produces.
    */
  def saltExpr(fact: DataFrame, factKey: String, salts: Int): Column = {
    val payload = fact.columns.filterNot(_ == factKey).map(col).toIndexedSeq
    // a keys-only fact has no payload to hash (xxhash64 needs ≥ 1 arg);
    // fall back to the row's stable position id so a hot key's rows still
    // spread — deterministic for a fixed input partitioning, which is the
    // same stability the payload hash gives on retries
    pmod(xxhash64(
      (if (payload.nonEmpty) payload
       else Seq(monotonically_increasing_id())): _*),
      lit(salts)).cast("int")
  }

  private val SaltSafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // the dim side is replicated `salts` times, so any join type that
    // PRESERVES unmatched dim rows (right/full outer) would emit each
    // unmatched dim row once per replica — refuse rather than corrupt
    require(SaltSafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports fact-preserving join types only, got $joinType")
    val saltedFact = fact.withColumn("_salt", saltExpr(fact, factKey, salts))
    // shuffle_hash: pin the SHUFFLE regime this operator exists for. A
    // dim small enough to broadcast needs no salting at all — but when
    // the planner can't see that (explode defeats its size estimate), it
    // happily broadcasts the salts-times-replicated dim (measured 1.9 GB
    // at the 100× sweep: a driver-memory hazard that also makes the salt
    // explode pure overhead). Per-partition hash build of the salted dim
    // is what the (key, salt) spread is FOR.
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)))).hint("shuffle_hash")
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"),
        joinType)
      .drop("_salt")
  }
}
