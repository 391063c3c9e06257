package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType, TimestampNTZType, TimestampType}

/** Source layer: every collection enters the engine as a DataFrame with a
  * declared schema, regardless of physical origin (parquet snapshot, Kafka
  * topic, JDBC table, in-memory test stream). Downstream operators are
  * mode-agnostic — the same `DataFrame => DataFrame` code path runs batch
  * and streaming (SURVEY.md §7.1).
  *
  * Reference mapping:
  *  - S1 `CREATE SOURCE CONNECTOR` (JDBC) → [[fromJdbcSnapshot]]
  *    (reference: files/ksqldb-cli/all.sql:3-18)
  *  - S2/S3 `CREATE TABLE` / `CREATE STREAM` over a topic → [[fromKafkaJson]]
  *    (reference: files/ksqldb-cli/all.sql:20-43)
  *  - S8 `SET 'auto.offset.reset'='earliest'` → `startingOffsets=earliest`
  *    (reference: files/ksqldb-cli/all.sql:1)
  *  - Driver testdata parquet → [[table]]
  */
object Sources {

  /** Batch parquet source for the driver's testdata tables.
    * Scale note: parquet scans get vectorized reads, column pruning and
    * predicate pushdown from Catalyst for free; at 100 TB the same call
    * reads a partitioned directory and prunes partitions.
    *
    * Timestamp columns written without `isAdjustedToUTC` would otherwise
    * surface as TIMESTAMP_NTZ on Spark 4 (`inferTimestampNTZ`), breaking
    * every `unix_micros`/watermark call site; the engine runs with a UTC
    * session timezone, so casting NTZ back to TIMESTAMP preserves the
    * stored micros exactly. The cast is a no-op when the session already
    * disables NTZ inference.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val ntz = raw.schema.fields.filter(f => hasNtz(f.dataType))
    if (ntz.isEmpty) raw
    else ntz.foldLeft(raw)((df, f) =>
      df.withColumn(f.name, col(f.name).cast(dentz(f.dataType))))
  }

  /** NTZ can hide inside struct/array/map element types, not just at the
    * top level; a partial rewrite would leave `unix_micros`/watermark call
    * sites to fail later and far from the cause. Rewrite the whole type
    * tree (struct→struct casts are field-wise, so the stored micros are
    * preserved exactly under the UTC session timezone, same as the
    * top-level case).
    */
  private def hasNtz(dt: DataType): Boolean = dt match {
    case TimestampNTZType => true
    case s: StructType => s.fields.exists(f => hasNtz(f.dataType))
    case a: ArrayType => hasNtz(a.elementType)
    case m: MapType => hasNtz(m.keyType) || hasNtz(m.valueType)
    case _ => false
  }

  private def dentz(dt: DataType): DataType = dt match {
    case TimestampNTZType => TimestampType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = dentz(f.dataType))))
    case a: ArrayType => a.copy(elementType = dentz(a.elementType))
    case m: MapType =>
      m.copy(keyType = dentz(m.keyType), valueType = dentz(m.valueType))
    case other => other
  }

  /** JSON-lines ingest with a DECLARED schema — raw training corpora
    * usually arrive as .jsonl before the first parquet conversion. The
    * explicit schema skips Spark's whole-dataset inference pass (an extra
    * full read at 100 TB) and pins types against drifting producers;
    * unparseable lines land in `_corrupt_record` instead of failing the
    * job (PERMISSIVE — the only sane mode on web-scale dumps).
    */
  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains("_corrupt_record")) schema
    else schema.add("_corrupt_record", "string")

  def fromJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Header-less CSV ingest with a declared schema, same
    * no-inference/PERMISSIVE/corrupt-record reasoning as [[fromJsonl]].
    */
  def fromCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    spark.read.schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("delimiter", delimiter)
      .csv(path)

  /** Streaming source over a Kafka topic carrying string keys and schemaless
    * JSON values — the reference's only wire format (all.sql:15-17,29,41).
    *
    * Output columns: `keyName` (string key), the value schema's fields, plus
    * `_offset` (Kafka offset — feeds LATEST_BY_OFFSET semantics via max_by)
    * and `_ts` (broker timestamp).
    *
    * Requires the spark-sql-kafka connector on the classpath at runtime
    * (not bundled in this build environment — exercised in production only;
    * tests use [[fromMemory]]).
    */
  def fromKafkaJson(
      spark: SparkSession,
      brokers: String,
      topic: String,
      valueSchema: StructType,
      keyName: String = "key",
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        col("key").cast("string").as(keyName),
        from_json(col("value").cast("string"), valueSchema).as("_v"),
        col("offset").as("_offset"),
        col("timestamp").as("_ts"))
      .select((col(keyName) +: valueSchema.fieldNames.toIndexedSeq
        .map(f => col(s"_v.$f"))) :+ col("_offset") :+ col("_ts"): _*)

  /** Batch twin of [[fromKafkaJson]] for replaying a topic dump (or any
    * batch DataFrame with `key`/`value` binary columns) through the same
    * deserialization path.
    */
  def decodeKafkaJson(
      raw: DataFrame,
      valueSchema: StructType,
      keyName: String = "key"): DataFrame =
    raw.select(
        col("key").cast("string").as(keyName),
        from_json(col("value").cast("string"), valueSchema).as("_v"),
        col("offset").as("_offset"))
      .select((col(keyName) +: valueSchema.fieldNames.toIndexedSeq
        .map(f => col(s"_v.$f"))) :+ col("_offset"): _*)

  /** JDBC snapshot source — the engine's model of the reference's JDBC
    * source connector (S1, all.sql:3-18). The tutorial's MySQL data is
    * static after init.sql, so a snapshot is exact parity; incremental
    * fidelity = periodic re-read with `WHERE id > $watermark` (see
    * [[fromJdbcIncrement]]).
    *
    * Scale note: `partitionColumn`/`numPartitions` split the read across
    * executors; without them a JDBC read is a single task.
    */
  def fromJdbcSnapshot(
      spark: SparkSession,
      url: String,
      dbtable: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    options.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Incremental JDBC pull: rows with `incrementingCol` strictly greater
    * than `lastSeen` — mirrors the connector's `mode=incrementing`
    * (all.sql:10-12). Caller loops this inside a scheduled refresh /
    * foreachBatch and feeds [[graft.engine.Sinks.toKafkaJson]].
    */
  private val SqlIdentifier = "^[A-Za-z_][A-Za-z0-9_.]*$".r

  def fromJdbcIncrement(
      spark: SparkSession,
      url: String,
      dbtable: String,
      incrementingCol: String,
      lastSeen: Long,
      options: Map[String, String] = Map.empty): DataFrame = {
    // identifiers are interpolated into SQL — reject anything that could
    // smuggle clauses in from untrusted connector config
    require(SqlIdentifier.matches(dbtable),
      s"illegal table identifier: $dbtable")
    require(SqlIdentifier.matches(incrementingCol),
      s"illegal column identifier: $incrementingCol")
    fromJdbcSnapshot(
      spark, url,
      // alias must not start with '_' — standard-SQL engines (Derby)
      // reject leading-underscore identifiers
      s"(SELECT * FROM $dbtable WHERE $incrementingCol > $lastSeen) AS graft_inc",
      options)
  }

  /** The connector's RUNTIME: a continuous `mode=incrementing` polling
    * loop (the reference's Connect worker behavior, all.sql:10-12 —
    * `mode=incrementing`, `incrementing.column.name=id`), built from the
    * engine's own streaming primitives rather than a thread:
    *
    *  - `ticks` is any streaming DataFrame whose micro-batches pace the
    *    polls (production: a `rate` source at the poll interval; tests: a
    *    MemoryStream the test advances deterministically);
    *  - each batch polls [[fromJdbcIncrement]] for rows past the current
    *    watermark and lands them in the TOPIC WIRE FORMAT — `(value
    *    json-string, _offset long)`, `_offset` = the incrementing column,
    *    JSON keys lower-cased (JDBC engines fold unquoted identifiers
    *    up) — so a landed topic is consumed by exactly the same
    *    `from_json` path as a Kafka topic or in-memory log;
    *  - the watermark is `max(_offset)` over the INSTALLED landing, and
    *    the landing is written through [[BatchLedger.stagedLanding]]:
    *    a crash before the marker replays the poll against the unchanged
    *    watermark (same rows, or a superset if the source advanced —
    *    new rows either way); a crash after it completes the pending
    *    install — rows land exactly once with no separate offset store.
    *
    * Scale: the poll itself is indexed on the incrementing column
    * (`WHERE id > w`), the landing is append-only parquet, and the
    * watermark read prunes to the `_offset` column; at production scale
    * the watermark would come from the ledger manifest instead of a
    * landing scan (noted, not needed at tutorial volume).
    */
  def jdbcPollingSource(
      ticks: DataFrame,
      url: String,
      dbtable: String,
      incrementingCol: String,
      landingPath: String,
      checkpointDir: String,
      options: Map[String, String] = Map.empty,
      // first start polls EVERY existing row (Connect's incrementing-mode
      // contract) — ids at or below an assumed floor must not be skipped
      startFrom: Long = Long.MinValue,
      pollEveryMs: Option[Long] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = ticks.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (tick: DataFrame, batchId: Long) =>
        val spark = tick.sparkSession
        val watermark =
          try {
            val r = spark.read.parquet(landingPath).agg(max("_offset")).head()
            if (r.isNullAt(0)) startFrom else r.getLong(0)
          } catch {
            case _: org.apache.spark.sql.AnalysisException => startFrom
          }
        val polled =
          fromJdbcIncrement(spark, url, dbtable, incrementingCol, watermark,
            options)
        val wire = polled.select(
          to_json(struct(polled.columns.toIndexedSeq
            .map(c => col(c).as(c.toLowerCase)): _*)).as("value"),
          col(incrementingCol).cast("long").as("_offset"))
        graft.engine.BatchLedger.stagedLanding(spark,
          s"$checkpointDir/graft_ledger", batchId) { st =>
          // ONE database query per poll: stage unconditionally, then drop
          // the staging dir if the poll was empty — installAppend skips a
          // missing source, so idle ticks land nothing and the common
          // caught-up case never accretes empty parquet parts
          val staged = st.appendInto(landingPath)
          wire.write.mode("overwrite").parquet(staged)
          if (spark.read.parquet(staged).isEmpty) {
            val p = new org.apache.hadoop.fs.Path(staged)
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
          }
        }
        ()
      }
    pollEveryMs
      .map(ms => writer.trigger(
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(ms)))
      .getOrElse(writer)
      .start()
  }
}
