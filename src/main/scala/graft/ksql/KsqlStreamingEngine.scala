package graft.ksql

import graft.engine.TableOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** One live push query. */
final case class PushHandle(spark: SparkSession, name: String,
    query: StreamingQuery, aggregated: Boolean) {
  /** Block until everything inserted so far is processed. */
  def processAllAvailable(): Unit = query.processAllAvailable()
  /** Every emitted row (append rows, or the update-mode changelog). */
  def emissions: DataFrame = spark.table(name)

  private lazy val memSink = query
    .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
    .streamingQuery.sink
    .asInstanceOf[org.apache.spark.sql.execution.streaming.sources.MemorySink]

  /** Drain changelog rows from batches PAST `cursor` (a batchId; -1 =
    * from the beginning), returning `(rows, newCursor)`. O(new rows)
    * and driver-only — no Spark job, no sink-table scan: it reads the
    * memory sink's own batch list, so a long-lived `/query` connection
    * pays each poll for what landed since its last poll, not for the
    * whole changelog (which is O(n²) over the connection's lifetime).
    * Both sink reads happen under the sink's monitor (its accessors are
    * `synchronized` methods), making `(rows, newCursor)` one consistent
    * snapshot — a batch landing between unlocked reads would otherwise
    * be duplicated or skipped.
    *
    * Changelog retention: the memory sink keeps every batch of a
    * STANDING query (that is the push-query contract — the changelog IS
    * the result), so sink memory grows with emissions until the query
    * stops. Bound a standing query's lifetime (or its input rate)
    * accordingly; the drain being incremental means only MEMORY grows,
    * not per-batch serving cost.
    */
  def drainSince(cursor: Long): (Seq[Row], Long) = {
    val s = memSink
    s.synchronized {
      (s.dataSinceBatch(cursor), s.latestBatchId.getOrElse(cursor))
    }
  }
  def stop(): Unit = query.stop()
}

/** Continuous-execution KSQL: push queries run as real Structured
  * Streaming jobs — `EMIT CHANGES` actually emits changes.
  *
  * Topics are `MemoryStream`s of (json value, offset) records — the
  * in-process Kafka-log analogue, carrying the same JSON wire format the
  * reference uses (`VALUE_FORMAT='JSON'`, all.sql:29,41); declared stream
  * views deserialize with `from_json` exactly like the Kafka source path
  * (`Sources.fromKafkaJson`). Dimension TABLEs over connector-fed topics
  * are static snapshots (the tutorial's MySQL data is static after
  * init.sql — SURVEY §7.5 pt.1), so stream-table joins are stream-static.
  *
  * A push query returns a [[PushHandle]]: an update-mode (aggregations)
  * or append-mode (stateless) memory-sink StreamingQuery plus accessors
  * for the emitted changelog and current state. `COUNT_DISTINCT`
  * translates to the exact streaming Aggregator
  * ([[graft.functions.ExactCountDistinct]]) because Spark's
  * count-distinct rewrite is unsupported under streaming aggregation.
  *
  * Scope: this engine executes the DATA-PLANE statements (DDL, INSERT,
  * push queries). Metadata/lifecycle statements (SHOW, DESCRIBE, PRINT,
  * EXPLAIN, DROP, TERMINATE) live on [[KsqlEngine]]; submitting one here
  * fails with a clear unsupported-statement error.
  */
/** Enables LIVE `CREATE SOURCE CONNECTOR` execution: a connector declared
  * with `mode=incrementing` starts a real [[graft.engine.Sources.jdbcPollingSource]]
  * loop instead of taking a one-shot snapshot. `ticks` is a factory for
  * the pacing stream — one fresh streaming DataFrame per connector
  * (production: `spark.readStream.format("rate")` at the poll interval;
  * tests: a MemoryStream advanced deterministically); `root` is where
  * each connector's topic landing + checkpoint live. `pollEveryMs` caps
  * the poll cadence via the query trigger — the correct lever for "poll
  * the database every N ms" (a slower tick ROW rate still polls once per
  * micro-batch, so rate-source row counts alone cannot slow polling
  * below one per batch).
  */
final case class LivePolling(ticks: () => DataFrame, root: String,
    pollEveryMs: Option[Long] = None)

class KsqlStreamingEngine(
    val spark: SparkSession,
    connectorProvider: (SparkSession, Map[String, String]) => DataFrame =
      KsqlEngine.jdbcConnectorProvider,
    livePolling: Option[LivePolling] = None) extends KsqlTranslator {

  graft.functions.GraftFunctions.registerAll(spark)
  spark.udf.register("graft_exact_count_distinct",
    org.apache.spark.sql.functions.udaf(new graft.functions.ExactCountDistinct))

  // COUNT_DISTINCT rewriting is the trait's depth-matched rewriteCall
  // with this engine's countDistinctRender (the exact Aggregator)

  /** A declared stream: the durable record buffer (the topic log) plus
    * every MemoryStream currently attached to it. Each push query gets
    * its OWN attached stream replaying the buffer — MemoryStream trims
    * its shared batch list on commit, so two queries reading one instance
    * race on committed offsets (rows lost or out-of-order commit errors).
    *
    * An attachment's `owner` is the push query whose resolved plan bound
    * to it (None until claimed, or for the CREATE-time view binding).
    * Attachments whose owner has stopped are pruned before every INSERT
    * fan-out and push-query attach — without that, session memory grows
    * O(queries × records) and every INSERT pays dead fan-out.
    */
  private case class Attachment(input: MemoryStream[(String, Long)],
      var owner: Option[StreamingQuery])
  private case class StreamDecl(name: String, cols: Seq[ColumnDef],
      topic: String,
      buffer: mutable.ArrayBuffer[(String, Long)],
      attached: mutable.ArrayBuffer[Attachment])
  private case class TableDecl(name: String, cols: Seq[ColumnDef],
      keyCols: Seq[String], topic: String)
  private case class DerivedDef(kind: String, select: String,
      partitionBy: Option[String])

  /** Connector-fed topics as LAZY DataFrames (with `_offset`) — never
    * collected to the driver; a 100 TB snapshot stays distributed.
    */
  private val topics = mutable.LinkedHashMap.empty[String, DataFrame]
  /** Live connector-fed topics: topic → landing dir (appended by the
    * connector's polling loop, consumed as a file-streaming source).
    */
  private val liveTopics = mutable.LinkedHashMap.empty[String, String]
  private val pollers = mutable.ArrayBuffer.empty[StreamingQuery]
  /** Stream decls bound to live topics: no MemoryStream, no INSERT —
    * records arrive from the database through the polling loop only.
    */
  private case class LiveStreamDecl(name: String, cols: Seq[ColumnDef],
      topic: String)
  private val liveStreamDecls =
    mutable.LinkedHashMap.empty[String, LiveStreamDecl]
  private val streamDecls = mutable.LinkedHashMap.empty[String, StreamDecl]
  private val tableDecls = mutable.LinkedHashMap.empty[String, TableDecl]
  private val derivedKinds = mutable.LinkedHashMap.empty[String, String]
  private val derivedDefs = mutable.LinkedHashMap.empty[String, DerivedDef]
  private val offsets = mutable.Map.empty[String, Long].withDefaultValue(0L)
  private val handles = mutable.ArrayBuffer.empty[PushHandle]
  private var queryId = 0

  /** Attach a fresh MemoryStream to a declared stream: replay the buffer,
    * re-register the collection view over it. Already-started queries keep
    * their resolved plans (bound to their own attached streams).
    *
    * `watermarked` registers the view with a zero-delay watermark on
    * `_rowtime` — required for SESSION-window aggregations (Spark only
    * supports session windows in append mode, which needs a watermark to
    * close sessions). Zero delay is exact here because rowtime derives
    * from the topic offset, so event time is monotone by construction —
    * nothing is ever late.
    */
  /** Decode a `(value json, _offset)` wire DataFrame — the one topic
    * shape shared by MemoryStream logs, live polling landings, and the
    * Kafka path — into the declared columns + `_rowtime`. `jsonKey` maps
    * a declared column name to its JSON key: identity for INSERT-fed
    * topics (INSERT writes keys in declared case), `toLowerCase` for
    * JDBC-polled topics (the poller lower-cases the folded-upper
    * identifiers JDBC engines return).
    */
  private def wireDecode(wire: DataFrame, cols: Seq[ColumnDef],
      jsonKey: String => String = identity): DataFrame = {
    val valueSchema =
      StructType(cols.map(c => StructField(jsonKey(c.name), c.dataType)))
    withRowtime(wire
      .select(from_json(col("value"), valueSchema).as("_v"), col("_offset"))
      .select(cols.map(c => col(s"_v.${jsonKey(c.name)}").as(c.name)) :+
        col("_offset"): _*))
  }

  private def attachStream(d: StreamDecl, watermarked: Boolean = false): Unit = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    if (d.buffer.nonEmpty) input.addData(d.buffer.toSeq: _*)
    val base = wireDecode(input.toDF().toDF("value", "_offset"), d.cols)
    (if (watermarked) base.withWatermark("_rowtime", "0 seconds") else base)
      .createOrReplaceTempView(d.name)
    d.attached += Attachment(input, None)
  }

  /** Drop attachments bound to stopped queries (their plans are gone; the
    * streams would only accumulate every future INSERT).
    */
  private def pruneDead(d: StreamDecl): Unit =
    d.attached.filterInPlace(_.owner.forall(_.isActive))

  private val WireSchema = StructType(Seq(StructField("value", StringType),
    StructField("_offset", LongType)))

  /** (Re-)register a live-topic stream view: the landing consumed as a
    * file-streaming source through the same wire decode as a MemoryStream
    * topic. Unlike MemoryStream attachments, a file source is freely
    * shared — each push query tracks its own file offsets — so re-attach
    * isolation is unnecessary; re-registration only toggles the watermark
    * (same zero-delay exactness argument as [[attachStream]]).
    */
  private def registerLiveView(d: LiveStreamDecl,
      watermarked: Boolean = false): Unit = {
    val wire = spark.readStream.schema(WireSchema)
      .parquet(liveTopics(d.topic))
    val base = wireDecode(wire, d.cols, _.toLowerCase)
    (if (watermarked) base.withWatermark("_rowtime", "0 seconds") else base)
      .createOrReplaceTempView(d.name)
  }

  /** (Re-)register a TABLE view. Over a static connector snapshot the
    * base is the captured topic; over a LIVE topic it is a fresh BATCH
    * read of the polling landing — the dimension reflects every row
    * polled so far each time it re-registers (at CREATE and before each
    * push query), so a database insert reaches the next query's
    * stream–table join without restart. A RUNNING query keeps its
    * resolve-time snapshot (stream–static join semantics, same contract
    * as the snapshot path).
    */
  private def registerTableView(td: TableDecl): Unit = {
    val projected = liveTopics.get(td.topic) match {
      case Some(landing) =>
        wireDecode(spark.read.schema(WireSchema).parquet(landing),
          td.cols, _.toLowerCase)
      case None =>
        val base = topics.getOrElse(td.topic,
          throw new NoSuchElementException(s"topic ${td.topic} has no " +
            "data; streaming tables must be connector-fed"))
        withRowtime(
          base.select(td.cols.map(c => col(c.name)) :+ col("_offset"): _*))
    }
    TableOps.latestByKey(projected, td.keyCols, "_offset")
      .createOrReplaceTempView(td.name)
  }

  // effectiveWindowKind lives on the shared trait; this engine only
  // supplies the derived-view select lookup it recurses through
  override protected def derivedSelect(name: String): Option[String] =
    derivedDefs.get(name).map(_.select)

  /** Exact streaming count-distinct: Spark rejects native
    * count(DISTINCT) under streaming aggregation, so the argument (whole
    * — it may contain calls/parens) casts to STRING into the exact
    * Aggregator.
    */
  override protected def countDistinctRender(args: String): String =
    s"graft_exact_count_distinct(CAST(($args) AS STRING))"

  /** Re-register derived (CSAS/CTAS) views against the current stream
    * views, in declaration order.
    */
  private def refreshDerived(): Unit =
    derivedDefs.foreach { case (name, DerivedDef(kind, select, pby)) =>
      var df = spark.sql(translate(select, injectOffset = kind == "STREAM"))
      pby.foreach(p => df = df.repartition(col(p)))
      df.createOrReplaceTempView(name)
    }

  protected def kindOf(name: String): Option[String] =
    streamDecls.get(name.toLowerCase).map(_ => "STREAM")
      .orElse(liveStreamDecls.get(name.toLowerCase).map(_ => "STREAM"))
      .orElse(tableDecls.get(name.toLowerCase).map(_ => "TABLE"))
      .orElse(derivedKinds.get(name.toLowerCase))

  protected def viewColumns(name: String): Seq[String] =
    streamDecls.get(name.toLowerCase).map(_.cols.map(_.name))
      .orElse(liveStreamDecls.get(name.toLowerCase).map(_.cols.map(_.name)))
      .orElse(tableDecls.get(name.toLowerCase).map(_.cols.map(_.name)))
      .getOrElse(spark.table(name).columns.toSeq
        .filterNot(c => c == "_offset" || c == "_rowtime"))

  /** Record timestamps for WINDOW clauses: same deterministic base + 1 s
    * per offset as the batch engine ([[KsqlEngine]]), derived in-plan so
    * it works on the live stream. Windowed `EMIT CHANGES` aggregations
    * run update-mode (state retained; add a watermark for append).
    */
  override protected def rowtimeSupported: Boolean = true
  private val RowtimeBaseSec = 1577836800L // 2020-01-01T00:00:00Z
  private def withRowtime(df: DataFrame): DataFrame =
    df.withColumn("_rowtime",
      timestamp_seconds(lit(RowtimeBaseSec) + col("_offset")))

  def execute(statement: String): Option[PushHandle] = {
    val stmts = KsqlParser.splitStatements(statement)
    require(stmts.size == 1, s"expected one statement, got ${stmts.size}")
    execute(KsqlParser.parse(stmts.head))
  }

  def execute(stmt: KsqlStatement): Option[PushHandle] = stmt match {
    case SetProperty(_, _) => None

    case CreateConnector(_, props) =>
      val topic = props.getOrElse("topic.prefix", "") +
        props.getOrElse("table.whitelist",
          throw new IllegalArgumentException("connector needs table.whitelist"))
      livePolling match {
        case Some(lp) if props.get("mode").contains("incrementing") =>
          // LIVE connector: start the real polling loop; the topic is its
          // landing directory, consumed below as a file-streaming source.
          // Matches the reference's running Connect worker — new database
          // rows keep arriving while queries run (all.sql:10-12).
          val landing = s"${lp.root}/$topic/landing"
          val fs = new Path(landing)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.mkdirs(new Path(landing)) // file source needs the dir to exist
          val opts = Seq(
            "user" -> props.get("connection.user"),
            "password" -> props.get("connection.password"),
            "driver" -> props.get("connection.driver.class"))
            .collect { case (k, Some(v)) => k -> v }.toMap
          pollers += graft.engine.Sources.jdbcPollingSource(
            lp.ticks(), props("connection.url"), props("table.whitelist"),
            props.getOrElse("incrementing.column.name",
              throw new IllegalArgumentException(
                "mode=incrementing needs incrementing.column.name")),
            landing, s"${lp.root}/$topic/ckpt", opts,
            pollEveryMs = lp.pollEveryMs)
          liveTopics(topic) = landing
          // a STREAM may legally be declared before its connector (ksqlDB
          // binds by topic name): rebind any empty pre-declared stream on
          // this topic to the live landing; one that already holds
          // INSERTed rows cannot be silently re-sourced — refuse loudly
          streamDecls.filterInPlace { case (_, d) =>
            if (d.topic != topic) true
            else {
              require(d.buffer.isEmpty && d.attached.forall(_.owner.isEmpty),
                s"stream ${d.name} already carries INSERTed rows or live " +
                  s"queries; cannot rebind it to live topic $topic")
              val live = LiveStreamDecl(d.name, d.cols, topic)
              liveStreamDecls(d.name.toLowerCase) = live
              registerLiveView(live)
              false
            }
          }
          // pre-declared TABLEs on this topic re-point at the landing
          tableDecls.values.filter(_.topic == topic)
            .foreach(registerTableView)
        case _ =>
          // shared log-column derivation with the batch engine (the
          // extra _rowtime is dropped by the TABLE projection)
          topics(topic) = KsqlEngine.withLogColumns(spark,
            connectorProvider(spark, props), RowtimeBaseSec)
      }
      None

    case CreateCollection("STREAM", name, cols, props)
        if liveTopics.contains(
          props.getOrElse("KAFKA_TOPIC", props.getOrElse("kafka_topic", ""))) =>
      // stream over a LIVE topic: the view reads the landing as a file
      // stream through the same wire decode as a MemoryStream topic —
      // rows INSERTed into the database surface here continuously
      val topic =
        props.getOrElse("KAFKA_TOPIC", props.getOrElse("kafka_topic", ""))
      val d = LiveStreamDecl(name, cols, topic)
      liveStreamDecls(name.toLowerCase) = d
      registerLiveView(d)
      None

    case CreateCollection("STREAM", name, cols, props) =>
      val topic =
        props.getOrElse("KAFKA_TOPIC", props.getOrElse("kafka_topic", name))
      // ONE log per topic: a second stream declared over the same
      // KAFKA_TOPIC shares the first's record buffer (same rows, same
      // offsets, history replayed) — two consumers of one Kafka topic,
      // not two topics that happen to share a name. Without the share,
      // INSERT INTO s1 was invisible to s2, a silent plane divergence
      // from the batch engine (whose topic log is keyed by topic).
      val buffer = streamDecls.values.find(_.topic == topic).map(_.buffer)
        .getOrElse(mutable.ArrayBuffer.empty[(String, Long)])
      val d = StreamDecl(name, cols, topic, buffer, mutable.ArrayBuffer.empty)
      streamDecls(name.toLowerCase) = d
      attachStream(d) // initial view: CSAS validation + metadata queries
      None

    case CreateCollection("TABLE", name, cols, props) =>
      val topic = props.getOrElse("KAFKA_TOPIC", props.getOrElse("kafka_topic", name))
      val td = TableDecl(name, cols, cols.filter(_.isKey).map(_.name), topic)
      registerTableView(td) // throws if no connector (live or snapshot) feeds it
      tableDecls(name.toLowerCase) = td
      None

    case CreateAsSelect(kind, name, _, select, pby) =>
      var df = spark.sql(translate(select, injectOffset = kind == "STREAM"))
      pby.foreach(p => df = df.repartition(col(p)))
      df.createOrReplaceTempView(name)
      derivedKinds(name.toLowerCase) = kind
      derivedDefs(name.toLowerCase) = DerivedDef(kind, select, pby)
      None

    case InsertValues(target, columns, values) =>
      require(!liveStreamDecls.contains(target.toLowerCase),
        s"$target is connector-fed: rows arrive from the database " +
          "through the polling loop, not INSERT")
      val d = streamDecls.getOrElse(target.toLowerCase,
        throw new NoSuchElementException(s"unknown stream $target"))
      val order = columns.getOrElse(d.cols.map(_.name))
      require(order.length == values.length,
        s"INSERT arity ${values.length} != ${order.length}")
      // parse each literal with the BATCH engine's converter (one INSERT
      // grammar across both planes — arrays/maps/structs, SQL '' escapes)
      // and JSON-encode it for the wire; from_json decodes it back with
      // the declared schema. The previous inline encoder emitted complex
      // literals verbatim — invalid JSON that from_json PERMISSIVEly
      // turned into silent all-null rows.
      val declByName = d.cols.map(c => c.name.toLowerCase -> c).toMap
      val json = order.zip(values).map { case (c, v) =>
        val cd = declByName.getOrElse(c.toLowerCase,
          throw new IllegalArgumentException(
            s"unknown column $c in ${d.name}"))
        "\"" + cd.name + "\":" + KsqlEngine.jsonEncode(
          KsqlEngine.convertLiteral(v, cd.dataType), cd.dataType)
      }.mkString("{", ",", "}")
      // offsets are PER TOPIC (lowercased): same-topic streams read one
      // log, so they must see one offset sequence — a per-stream (or
      // mixed-case) counter would mint duplicate offsets into one log
      val off = offsets(d.topic.toLowerCase)
      offsets(d.topic.toLowerCase) = off + 1
      d.buffer += ((json, off)) // the buffer instance is shared per topic
      val sameTopic = streamDecls.values.filter(_.topic == d.topic).toSeq
      sameTopic.foreach(pruneDead)
      sameTopic.foreach(_.attached.foreach(_.input.addData((json, off))))
      None

    case PushQuery(select, emitFinal) =>
      // isolate this query: fresh source streams (buffer replayed) so
      // concurrent queries never share a MemoryStream's commit state.
      // Drop dead AND stale-unowned attachments first — only streams
      // backing still-active plans (plus the fresh ones) may remain, or
      // attachment count grows per query issued.
      // SESSION windows are the one shape Spark restricts to APPEND mode
      // (+ watermark): sessions have no static bounds, so the changelog
      // form ksqlDB emits per update is undefined until the watermark
      // closes the session — closed sessions ARE the append rows.
      // EMIT FINAL asks for exactly that contract on ANY window shape —
      // each window once, when the watermark closes it — so it routes
      // through the same append+watermark path; on an unwindowed
      // aggregation there is no close event, so it is refused (as in
      // ksqlDB). windowKind comes from the translator's structural
      // (literal-masked) WINDOW parse — the flag and the translation can
      // never disagree
      // the window may live in a DERIVED view the query reads (CTAS over
      // a session window, then SELECT * FROM it) — resolve through
      // derivedDefs, not just this select's text
      val winKind = effectiveWindowKind(select)
      val sessionWindowed = winKind.contains("SESSION")
      require(!emitFinal || winKind.isDefined,
        "EMIT FINAL requires a WINDOW clause (finals exist per window)")
      val appendFinals = sessionWindowed || emitFinal
      streamDecls.values.foreach { d =>
        d.attached.filterInPlace(a => a.owner.exists(_.isActive))
        attachStream(d, watermarked = appendFinals)
      }
      liveStreamDecls.values
        .foreach(registerLiveView(_, watermarked = appendFinals))
      // live-topic dimensions re-resolve so rows polled since the last
      // query join in (stream-static semantics, fresh static side)
      tableDecls.values.filter(t => liveTopics.contains(t.topic))
        .foreach(registerTableView)
      refreshDerived()
      val df = spark.sql(translate(select))
      // output mode from the RESOLVED plan, not the select text: a push
      // query over a derived CSAS/CTAS aggregate contains no GROUP BY of
      // its own but still IS a streaming aggregation (Update mode), and
      // a static dimension's latest-by-key Aggregate must NOT count
      // (its child is not streaming)
      val aggregated = df.isStreaming &&
        df.queryExecution.analyzed.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
              if a.child.isStreaming => a
        }.isDefined
      queryId += 1
      val name = s"ksql_push_$queryId"
      val upper = df.toDF(df.columns.map(_.toUpperCase).toIndexedSeq: _*)
      val q = upper.writeStream.format("memory").queryName(name)
        .outputMode(
          if (aggregated && !appendFinals) OutputMode.Update()
          else OutputMode.Append())
        .start()
      // the fresh attachments (the only unowned ones left) belong to this
      // query's resolved plan now
      streamDecls.values.foreach(_.attached.foreach(a =>
        if (a.owner.isEmpty) a.owner = Some(q)))
      val h = PushHandle(spark, name, q, aggregated)
      handles += h
      Some(h)

    case other =>
      throw new IllegalArgumentException(
        s"streaming engine does not support: $other")
  }

  /** COUNT_DISTINCT needs a closing paren for the CAST wrapper; rewrites
    * stay outside string literals like every other token rewrite.
    */
  private def translate(select: String, injectOffset: Boolean = false): String =
    translateSelect(select, injectOffset)

  /** Stop a push query and RELEASE its driver-side footprint: the
    * memory sink's temp table (which holds the query's FULL changelog)
    * and the handle registration. Serving planes running
    * drain-snapshot-stop must use this, not bare `stop()` — a
    * long-lived server otherwise grows by every changelog ever emitted
    * across all queries it served (the sink table and handle were kept
    * forever even after the query stopped).
    */
  def release(h: PushHandle): Unit = synchronized {
    // under the engine lock: the server's /query handlers release from
    // their own connection threads while /ksql threads execute (and
    // register handles) under `engine.synchronized` — an unsynchronized
    // ArrayBuffer -= racing a += can lose a handle (re-leaking the
    // changelog this method exists to free). Reentrant, so the /ksql
    // path's release-under-lock is unaffected.
    h.stop()
    spark.catalog.dropTempView(h.name)
    handles -= h
  }

  def stopAll(): Unit = {
    synchronized(handles.toSeq).foreach(release)
    pollers.foreach(p => if (p.isActive) p.stop())
    streamDecls.values.foreach(pruneDead)
  }

  /** Block until every live connector has polled all pending ticks —
    * deterministic test synchronization (production loops just run).
    */
  def drainConnectors(): Unit = pollers.foreach(_.processAllAvailable())

  /** Live MemoryStream attachments backing `stream` — operational
    * introspection. Bounded by the number of ACTIVE push queries (+1 for
    * a not-yet-claimed CREATE-time binding); a count growing with the
    * number of queries EVER issued is the leak the pruning exists to
    * prevent (regression-tested in KsqlStreamingSpec).
    */
  def attachmentCount(stream: String): Int =
    streamDecls.get(stream.toLowerCase).map(_.attached.size).getOrElse(0)
}
