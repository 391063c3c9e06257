package graft.ksql

import graft.engine.{Sources, TableOps}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Executes the reference's KSQL dialect on Spark — the API-compatibility
  * layer that lets a user of the reference submit the same statements they
  * run today (reference: files/ksqldb-cli/all.sql, README.md).
  *
  * Execution model: batch re-evaluation. Topics are in-memory row buffers
  * with per-record offsets (the Kafka log analogue); declared collections
  * are views over them (tables apply latest-by-key upsert on the PRIMARY
  * KEY, Q3); CSAS/CTAS collections store their SELECT and re-evaluate it
  * against current topic state on every query — a push query therefore
  * always observes the converged state a ksqlDB push query would have
  * emitted last (the README's golden tables are exactly these states).
  * Continuous *emission* semantics (the changelog between states) are
  * exercised by the Structured Streaming path
  * (graft.streaming.Tutorial + StreamingTutorialSpec).
  *
  * SELECT translation to Spark SQL is textual and total for the dialect:
  * `EMIT CHANGES` stripped, `UCASE`→`upper`, `COUNT_DISTINCT(x)`→
  * `count(DISTINCT x)`, `LATEST_BY_OFFSET(x)`→`max_by(x, s._offset)` with
  * `s` the stream source in FROM, `SELECT *` expanded against the
  * catalog (ksqlDB prefixes join stars with the source alias). Everything
  * else — CASE WHEN, CAST AS DOUBLE, joins, grouping, trailing aliases —
  * is shared SQL that Catalyst parses directly.
  */
/** One executed statement: the result DataFrame (queries/SHOW) or the
  * error ksqlDB's CLI would have printed (the reference script itself
  * contains one intentionally-invalid query — a non-aggregated,
  * non-grouped column, all.sql:100-125 — that the tutorial then fixes
  * with LATEST_BY_OFFSET; a script run must survive it the way the CLI
  * does).
  */
final case class StatementResult(statement: KsqlStatement,
    df: Option[DataFrame], error: Option[String])

class KsqlEngine(
    val spark: SparkSession,
    connectorProvider: (SparkSession, Map[String, String]) => DataFrame =
      KsqlEngine.jdbcConnectorProvider) extends KsqlTranslator {

  /** One in-memory topic: `base` is the connector-fed portion as a LAZY
    * DataFrame (never collected to the driver — a 100 TB snapshot stays
    * distributed), `rows` the hand-INSERTed literal records (driver-side
    * by nature: a human typed them). `baseCount` (offset origin for
    * INSERTs) is computed on first INSERT, not at CREATE.
    */
  private case class Topic(schema: StructType, base: DataFrame,
      rows: mutable.ArrayBuffer[Row]) {
    private var baseCountCache: Option[Long] = None
    def baseCount: Long = {
      if (baseCountCache.isEmpty) baseCountCache = Some(base.count())
      baseCountCache.get
    }
  }

  /** Record timestamps (ksqlDB's ROWTIME) for the in-memory log: a fixed
    * epoch base + 1 s per offset — deterministic ingestion-time semantics
    * for the tutorial's hand-INSERTed records, enabling WINDOW clauses.
    */
  private val RowtimeBaseSec = 1577836800L // 2020-01-01T00:00:00Z
  private def rowtime(offset: Long): java.sql.Timestamp =
    new java.sql.Timestamp((RowtimeBaseSec + offset) * 1000L)
  override protected def rowtimeSupported: Boolean = true
  private case class Decl(kind: String, name: String, cols: Seq[ColumnDef],
      topic: String)
  private case class Derived(kind: String, name: String, select: String,
      partitionBy: Option[String], topic: String)

  graft.functions.GraftFunctions.registerAll(spark)

  private val topics = mutable.LinkedHashMap.empty[String, Topic]
  private val decls = mutable.LinkedHashMap.empty[String, Decl]
  private val derived = mutable.LinkedHashMap.empty[String, Derived]
  private val connectors = mutable.ArrayBuffer.empty[String]
  private val properties = mutable.Map.empty[String, String]

  protected def kindOf(name: String): Option[String] =
    decls.get(name.toLowerCase).map(_.kind)
      .orElse(derived.get(name.toLowerCase).map(_.kind))

  // ---- statement execution -------------------------------------------

  def executeScript(script: String): Seq[StatementResult] =
    KsqlParser.splitStatements(script).map { s =>
      val stmt = KsqlParser.parse(s)
      try StatementResult(stmt, execute(stmt), None)
      catch { case e: Exception =>
        StatementResult(stmt, None, Some(e.getMessage)) }
    }

  def execute(statement: String): Option[DataFrame] = {
    val stmts = KsqlParser.splitStatements(statement)
    require(stmts.size == 1, s"expected one statement, got ${stmts.size}")
    execute(KsqlParser.parse(stmts.head))
  }

  def execute(stmt: KsqlStatement): Option[DataFrame] = stmt match {
    case SetProperty(k, v) =>
      properties(k) = v; None

    case CreateConnector(name, props) =>
      val df = connectorProvider(spark, props)
      val topic = props.getOrElse("topic.prefix", "") +
        props.getOrElse("table.whitelist",
          throw new IllegalArgumentException("connector needs table.whitelist"))
      val withLog = KsqlEngine.withLogColumns(spark, df, RowtimeBaseSec)
      topics(topic) = Topic(withLog.schema, withLog, mutable.ArrayBuffer.empty)
      connectors += name
      None

    case CreateCollection(kind, name, cols, props) =>
      val topic = props.getOrElse("KAFKA_TOPIC", props.getOrElse("kafka_topic", name))
      if (!topics.contains(topic)) {
        val schema = StructType(cols.map(c =>
          StructField(c.name, c.dataType)).toSeq :+
          StructField("_offset", LongType, nullable = false) :+
          StructField("_rowtime", TimestampType, nullable = false))
        topics(topic) = Topic(schema,
          spark.createDataFrame(java.util.List.of[Row](), schema),
          mutable.ArrayBuffer.empty)
      }
      decls(name.toLowerCase) = Decl(kind, name, cols, topic)
      None

    case CreateAsSelect(kind, name, props, select, pby) =>
      val topic = props.getOrElse("KAFKA_TOPIC", props.getOrElse("kafka_topic", name))
      refreshViews()
      // validate eagerly so a bad CSAS fails at CREATE time, like ksqlDB
      spark.sql(translateSelect(select, injectOffset = kind == "STREAM"))
      derived(name.toLowerCase) = Derived(kind, name, select, pby, topic)
      None

    case InsertValues(target, columns, values) =>
      val d = decls.getOrElse(target.toLowerCase,
        throw new NoSuchElementException(s"unknown collection $target"))
      val topic = topics(d.topic)
      val order = columns.getOrElse(d.cols.map(_.name))
      require(order.length == values.length,
        s"INSERT arity ${values.length} != ${order.length}")
      val byName = order.zip(values).map { case (c, v) => c.toLowerCase -> v }.toMap
      val declByName = d.cols.map(c => c.name.toLowerCase -> c).toMap
      // a typo'd column must fail loudly, exactly as the streaming plane
      // does — the lookup below resolves by DECLARED names only, so an
      // unvalidated unknown column would silently land an all-null row
      // and the value would vanish
      order.filterNot(c => declByName.contains(c.toLowerCase)).foreach(c =>
        throw new IllegalArgumentException(s"unknown column $c in ${d.name}"))
      // the appended Row unions POSITIONALLY against the TOPIC schema —
      // align by name, not by declaration order (a decl over a
      // connector-fed topic may list columns in a different order, or a
      // subset; positional append would corrupt silently)
      val valueFields = topic.schema.fields.toSeq
        .filterNot(f => f.name == "_offset" || f.name == "_rowtime")
      val unknown = d.cols.map(_.name.toLowerCase)
        .filterNot(n => valueFields.exists(_.name.toLowerCase == n))
      require(unknown.isEmpty,
        s"decl ${d.name} columns ${unknown.mkString(",")} not in topic " +
          s"${d.topic}'s schema — INSERTed values would have nowhere to land")
      val converted = valueFields.map { f =>
        declByName.get(f.name.toLowerCase)
          .flatMap(c => byName.get(c.name.toLowerCase)
            .map(v => convert(v, c.dataType)))
          .orNull
      }
      val off = topic.baseCount + topic.rows.length
      topic.rows += Row.fromSeq(converted :+ off :+ rowtime(off))
      None

    case PushQuery(select, emitFinal) =>
      // batch re-evaluation sees the complete log, so every window is
      // already final — EMIT FINAL and EMIT CHANGES converge here; the
      // validity rule still applies (finals exist per window), so the
      // same statement never succeeds here and fails on the streaming
      // engine. The window may be INHERITED from a derived CSAS/CTAS
      // view the select reads — resolve through view definitions like
      // the streaming engine's effectiveWindowKind, or the two planes
      // give different verdicts on the same statement.
      require(!emitFinal || effectiveWindowKind(select).isDefined,
        "EMIT FINAL requires a WINDOW clause (finals exist per window)")
      refreshViews()
      Some(upperCased(spark.sql(translateSelect(select))))

    case ExplainCommand(select) =>
      import spark.implicits._
      refreshViews()
      val qe = spark.sql(translateSelect(select)).queryExecution
      Some(qe.explainString(org.apache.spark.sql.execution.SimpleMode)
        .linesIterator.toSeq.toDF("plan"))

    case DescribeCommand(name) => {
      import spark.implicits._
      val rows = decls.get(name.toLowerCase) match {
        case Some(d) =>
          d.cols.map(c => (c.name.toUpperCase, c.dataType.sql,
            if (c.isKey) (if (d.kind == "TABLE") "PRIMARY KEY" else "KEY") else ""))
        case None =>
          refreshViews()
          spark.table(name).schema.fields.toSeq
            .filterNot(f => f.name == "_offset" || f.name == "_rowtime")
            .map(f => (f.name.toUpperCase, f.dataType.sql, ""))
      }
      Some(rows.toDF("column_name", "type", "key"))
    }

    case DropCollection(kind, name, ifExists) =>
      val n = name.toLowerCase
      kindOf(name) match {
        case Some(k) if k != kind =>
          throw new IllegalArgumentException(
            s"$name is a $k — use DROP $k")
        case Some(_) =>
          requireNoDependents(n)
          decls.remove(n); derived.remove(n)
          spark.catalog.dropTempView(name)
        case None if ifExists => ()
        case None =>
          throw new NoSuchElementException(s"$kind $name does not exist")
      }
      None

    case PrintTopic(topic) =>
      val key = topics.keys.find(_.equalsIgnoreCase(topic)).getOrElse(
        throw new NoSuchElementException(s"topic $topic does not exist"))
      Some(topicDF(key))

    // ksqlDB terminates persistent queries by id; here the derived
    // collection IS the persistent query — terminating it stops the
    // re-evaluation and drops its view
    case TerminateQuery(qid) =>
      val n = qid.toLowerCase
      if (!derived.contains(n))
        throw new NoSuchElementException(s"query $qid does not exist")
      requireNoDependents(n)
      derived.remove(n)
      spark.catalog.dropTempView(qid)
      None

    case ShowCommand(what) =>
      import spark.implicits._
      Some(what match {
        case "TOPICS" => topics.keys.toSeq.sorted.toDF("name")
        case "CONNECTORS" => connectors.toSeq.sorted.toDF("name")
        case "QUERIES" =>
          // ksqlDB lists persistent queries; here each derived collection
          // is one (TERMINATE <name> stops it)
          derived.values.map(d =>
            (d.name, s"C${d.kind.head}AS", d.topic,
              d.select.replaceAll("\\s+", " ").take(60)))
            .toSeq.sortBy(_._1).toDF("query_id", "kind", "sink_topic", "query")
        case "STREAMS" | "TABLES" =>
          val kind = what.dropRight(1) // STREAM / TABLE
          (decls.values.filter(_.kind == kind).map(d => (d.name, d.kind, d.topic)) ++
            derived.values.filter(_.kind == kind).map(d => (d.name, d.kind, d.topic)))
            .toSeq.sortBy(_._1).toDF("name", "kind", "topic")
        case other => throw new IllegalArgumentException(s"SHOW $other unsupported")
      })
  }

  // effectiveWindowKind lives on the shared trait (one resolution, so
  // EMIT FINAL over a windowed view gets the same verdict on both
  // planes); this engine only supplies the derived-view select lookup
  override protected def derivedSelect(name: String): Option[String] =
    derived.get(name).map(_.select)

  /** Reject removing a collection some remaining derived query reads —
    * otherwise every later refreshViews() would throw resolving the
    * dangling SELECT (ksqlDB rejects such drops the same way).
    */
  private def requireNoDependents(n: String): Unit =
    derived.values.find(d => d.name.toLowerCase != n &&
        fromSources(d.select).exists(_._1.toLowerCase == n))
      .foreach { d =>
        throw new IllegalArgumentException(
          s"cannot remove $n: query ${d.name} reads from it")
      }

  // ---- views ----------------------------------------------------------

  private def topicDF(topic: String): DataFrame = {
    val t = topics(topic)
    if (t.rows.isEmpty) t.base
    else t.base.union(spark.createDataFrame(t.rows.toSeq.asJava, t.schema))
  }

  /** Re-materialize every collection view against current topic state, in
    * registration order (derived collections may read earlier ones).
    */
  private def refreshViews(): Unit = {
    decls.values.foreach { d =>
      val base = topicDF(d.topic)
      val projected = base.select(
        d.cols.map(c => col(c.name)) :+ col("_offset") :+ col("_rowtime"): _*)
      val view = d.kind match {
        case "TABLE" =>
          TableOps.latestByKey(projected, d.cols.filter(_.isKey).map(_.name), "_offset")
        case _ => projected
      }
      view.createOrReplaceTempView(d.name)
    }
    derived.values.foreach { d =>
      var df = spark.sql(translateSelect(d.select, injectOffset = d.kind == "STREAM"))
      d.partitionBy.foreach(p => df = df.repartition(col(p)))
      df.createOrReplaceTempView(d.name)
    }
  }

  // SELECT translation lives in KsqlTranslator

  /** Declared/derived output columns of a collection (no `_offset`). */
  protected def viewColumns(name: String): Seq[String] =
    decls.get(name.toLowerCase).map(_.cols.map(_.name))
      .getOrElse(spark.table(name).columns.toSeq
        .filterNot(c => c == "_offset" || c == "_rowtime"))

  private def upperCased(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toUpperCase).toIndexedSeq: _*)

  /** ksqlDB literal → Spark row value, including the complex constructors
    * `ARRAY[...]`, `MAP('k' := v, ...)`, `STRUCT(f := v, ...)`.
    */
  private def convert(literal: String, dt: DataType): Any =
    KsqlEngine.convertLiteral(literal, dt)
}

object KsqlEngine {

  /** Parse a ksqlDB VALUES literal into the Scala value for `dt` —
    * primitives (outer quotes stripped, SQL `''` un-doubled), `ARRAY[…]`,
    * `MAP(k := v, …)`, `STRUCT(f := v, …)`. Shared by the batch engine's
    * topic-row append and the streaming engine's JSON wire encode, so one
    * INSERT parses identically on both planes.
    */
  private[ksql] def convertLiteral(literal: String, dt: DataType): Any = {
    val v = literal.trim
    val up = v.toUpperCase
    if (v.equalsIgnoreCase("null")) null
    else (dt, up) match {
      case (at: ArrayType, u) if u.startsWith("ARRAY[") && u.endsWith("]") =>
        KsqlParser.splitTopLevel(v.substring(6, v.length - 1))
          .map(convertLiteral(_, at.elementType))
      case (mt: MapType, u) if u.startsWith("MAP(") && u.endsWith(")") =>
        KsqlParser.splitTopLevel(v.substring(4, v.length - 1)).map { kv =>
          val Array(k, value) = kv.split(":=", 2)
          convertLiteral(k.trim, mt.keyType) ->
            convertLiteral(value.trim, mt.valueType)
        }.toMap
      case (st: StructType, u) if u.startsWith("STRUCT(") && u.endsWith(")") =>
        val byName = KsqlParser.splitTopLevel(v.substring(7, v.length - 1))
          .map { kv =>
            val Array(f, value) = kv.split(":=", 2)
            f.trim.toLowerCase -> value.trim
          }.toMap
        Row.fromSeq(st.fields.toSeq.map(f =>
          byName.get(f.name.toLowerCase)
            .map(convertLiteral(_, f.dataType)).orNull))
      case _ =>
        val s =
          if (v.length >= 2 && v.head == '\'' && v.last == '\'')
            v.substring(1, v.length - 1).replace("''", "'")
          else v
        dt match {
          case StringType => s
          case IntegerType => s.toInt
          case LongType => s.toLong
          case DoubleType => s.toDouble
          case BooleanType => s.toBoolean
          case _: DecimalType => new java.math.BigDecimal(s)
          case other => throw new IllegalArgumentException(s"cast to $other")
        }
    }
  }

  /** JSON-encode a [[convertLiteral]] value of type `dt` — the streaming
    * wire form; `from_json` with the declared schema decodes it back
    * losslessly (nested types included).
    */
  private[ksql] def jsonEncode(x: Any, dt: DataType): String = {
    // every char < 0x20 must be escaped or from_json (PERMISSIVE)
    // silently decodes the whole row as nulls — same escape table as
    // KsqlServer.jsonEscape, so the two wire planes cannot diverge
    def quote(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < 0x20 => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    (x, dt) match {
      case (null, _) => "null"
      case (s: String, _) => quote(s)
      // NaN/Infinity are not JSON numbers; bare they corrupt the whole
      // row (PERMISSIVE → all-null) where the batch engine stores the
      // value fine. from_json accepts the quoted spellings for
      // double/float columns, so quoting keeps the planes converged.
      case (d: Double, _) if d.isNaN || d.isInfinite => "\"" + d + "\""
      case (f: Float, _) if f.isNaN || f.isInfinite => "\"" + f + "\""
      case (seq: Seq[_], at: ArrayType) =>
        seq.map(jsonEncode(_, at.elementType)).mkString("[", ",", "]")
      case (m: Map[_, _], mt: MapType) =>
        m.map { case (k, value) =>
          quote(String.valueOf(k)) + ":" + jsonEncode(value, mt.valueType)
        }.mkString("{", ",", "}")
      case (r: Row, st: StructType) =>
        st.fields.zipWithIndex.map { case (f, i) =>
          quote(f.name) + ":" + jsonEncode(r.get(i), f.dataType)
        }.mkString("{", ",", "}")
      case (other, _) => String.valueOf(other)
    }
  }

  /** Append the topic-log columns to a connector snapshot WITHOUT
    * collecting it: `_offset` via a distributed `zipWithIndex` (stable
    * partition-order indices — the arrival-order analogue; one partition-
    * size job, no data to the driver) and `_rowtime` derived in-plan from
    * the offset (the engines' deterministic ingestion-time clock).
    */
  private[ksql] def withLogColumns(spark: SparkSession, df: DataFrame,
      rowtimeBaseSec: Long): DataFrame = {
    val schema = StructType(df.schema.fields.toSeq :+
      StructField("_offset", LongType, nullable = false))
    val indexed = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed, schema)
      .withColumn("_rowtime",
        timestamp_seconds(lit(rowtimeBaseSec) + col("_offset")))
  }

  /** Default CREATE SOURCE CONNECTOR provider: a JDBC snapshot via
    * Spark's JDBC source (S1; the reference's Connect worker equivalent,
    * all.sql:3-18). Tests inject an in-memory provider instead.
    */
  def jdbcConnectorProvider(spark: SparkSession,
      props: Map[String, String]): DataFrame = {
    val opts = Seq(
      "user" -> props.get("connection.user"),
      "password" -> props.get("connection.password"),
      // drivers absent from java.sql.Driver's service registry (e.g.
      // embedded Derby) need an explicit class name
      "driver" -> props.get("connection.driver.class"))
      .collect { case (k, Some(v)) => k -> v }.toMap
    Sources.fromJdbcSnapshot(spark,
      props("connection.url"), props("table.whitelist"), opts)
  }
}
