package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KTable semantics: latest-row-per-key views.
  *
  * The reference's TABLE is an upsert-by-primary-key changelog view of a
  * topic — "players will be inserted … or updated if a new record is
  * inserted in the topic with the same key" (reference README.md:74-92,
  * all.sql:20-31). Spark has no table primitive; the equivalent is a
  * grouped `max_by(struct(cols), orderCol)` — one shuffle on the key, then
  * per-key state. In streaming this runs under `outputMode("update")` and
  * re-emits a key's row whenever it changes, which is exactly the KTable
  * changelog contract (Q3).
  *
  * Scale note: a single hash-partitioned shuffle on the primary key; state
  * is one row per key. At 100 TB the key cardinality bounds state, and
  * map-side partial max_by collapses duplicate keys before the shuffle.
  */
object TableOps {

  /** Latest row per key, ordered by `orderCol` (Kafka offset, event id, or
    * event time). Implements S2/Q3 and A4 (`LATEST_BY_OFFSET`,
    * all.sql:136-137) for whole rows.
    *
    * Uses the native [[graft.functions.LatestByOffsetAgg]] rather than
    * built-in `max_by`: max_by's non-primitive buffer forces SortAggregate
    * (per-partition sorts on the key); the native aggregate runs in
    * ObjectHashAggregate — hash-based, map-side partial, no sorts.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val valueCols = df.columns.filterNot(keyCols.contains)
    val packed = struct(valueCols.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(graft.functions.LatestByOffsetAgg.column(packed, col(orderCol))
        .as("_latest"))
      .select(keyCols.map(col) ++ valueCols.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** `LATEST_BY_OFFSET(col)` for a single column inside an aggregation
    * (A4, all.sql:136-137): carries a non-grouped dimension column through
    * a grouped aggregation as the latest value by arrival order.
    */
  def latestByOffset(value: Column, order: Column): Column =
    graft.functions.LatestByOffsetAgg.column(value, order)
}
