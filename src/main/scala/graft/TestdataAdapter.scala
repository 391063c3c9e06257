package graft

import graft.engine.{Ops, Sources}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapters that let the driver's synthetic testdata
  * (`/root/testdata/sf*`, see TESTDATA.md) play the reference tutorial's
  * domain (reference: files/ksqldb-cli/all.sql:20-43,
  * files/mysql/init.sql:4-22), so the exact same operator code paths that
  * replay the tutorial goldens also run under the driver's DuckDB oracle:
  *
  *  - `events`   → `match_event` stream: match id = event day,
  *    GOAL/ASSIST from purchase/click, `home` = value > 100,
  *    `_offset` = event_id (the Kafka-offset analogue).
  *  - `customer` ⋈ `nation` → `players` table: id/name/team/nationality.
  *
  * Scale notes: both adapters are narrow projections (no shuffle); the
  * players build is a broadcast hash join on the tiny `nation` dim.
  */
object TestdataAdapter {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Sources.table(spark, sfDir, name)

  /** `events` with `ts` as a µs timestamp. The parquet carries
    * TIMESTAMP(NANOS), which Spark only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (nanos-since-epoch long);
    * the conversion must FLOOR to µs — DuckDB's ns→µs rule — so timestamp
    * comparisons agree bit-for-bit with the oracle. `DIV` truncates
    * toward zero, which differs from floor on pre-epoch (negative)
    * nanos, so the sub-µs remainder is removed via `pmod` (non-negative
    * by definition) before the exact division.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
    else raw
  }

  /** `events` as the tutorial's `match_event` stream (all.sql:33-43). */
  def matchEvents(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      date_format(col("ts"), "yyyy-MM-dd").as("id"),
      when(col("event_type") === "purchase", "GOAL")
        .when(col("event_type") === "click", "ASSIST")
        .otherwise(upper(col("event_type"))).as("event_type"),
      col("user_id").cast("string").as("player_id"),
      (col("value") > 100).as("home"),
      col("event_id").as("_offset"))

  /** `customer` ⋈ `nation` as the tutorial's `players` table
    * (init.sql:4-22): id (string PK), name, team, nationality.
    */
  def players(spark: SparkSession, sfDir: String): DataFrame =
    Ops.enrichJoin(
      table(spark, sfDir, "customer"), table(spark, sfDir, "nation"),
      "c_nationkey", "n_nationkey")
      .select(
        col("c_custkey").cast("string").as("id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("team"),
        col("n_name").as("nationality"))

  /** Shared DuckDB CTE prologue for oracle SQL over the same adapters. */
  val oracleCtes: String =
    """WITH match_event AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS id,
      |         CASE WHEN event_type = 'purchase' THEN 'GOAL'
      |              WHEN event_type = 'click' THEN 'ASSIST'
      |              ELSE upper(event_type) END AS event_type,
      |         CAST(user_id AS VARCHAR) AS player_id,
      |         value > 100 AS home,
      |         event_id AS _offset
      |  FROM events),
      |players AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS id, c_name AS name,
      |         c_mktsegment AS team, n_name AS nationality
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
      |""".stripMargin
}
