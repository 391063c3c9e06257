package graft.ksql

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The REST plane: a minimal HTTP listener over [[KsqlEngine]] — the
  * engine's analogue of the ksqlDB server the reference's CLI connects to
  * (`ksql http://ksqldb-server:8088`, reference README.md:30-33;
  * `files/ksqldb-server/ksql-server.properties:1` `listeners=...8088`).
  * Built on the JDK's own `com.sun.net.httpserver` — no dependencies.
  *
  * Endpoints (ksqlDB-shaped, simplified):
  *  - `POST /ksql` with body `{"ksql": "<statements>"}` → a JSON array,
  *    one object per `;`-terminated statement: `{"statement": …,
  *    "columns": […], "rows": [[…]]}` for queries/SHOW, `{"statement":…,
  *    "status": "SUCCESS"}` for DDL/INSERT, `{"statement":…, "error":…}`
  *    for rejections (the session continues — same contract as the CLI).
  *  - `GET /info` → engine identification, like ksqlDB's server info.
  *
  * Statements execute against ONE engine instance (the server IS the
  * session, as in ksqlDB): handlers serialize on it, so concurrent
  * clients see a consistent catalog. Execution semantics are the batch
  * engine's converged states; the live-changelog plane is
  * [[startStreaming]] — `POST /query` holds a chunked response open and
  * streams push-query rows as they emit (see its scaladoc).
  */
object KsqlServer {

  // ---- minimal JSON (no deps) ---------------------------------------

  private[graft] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < 0x20 => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isNaN || d.isInfinite) s""""$d"""" else d.toString
    case f: Float => jsonValue(f.toDouble)
    case bd: java.math.BigDecimal => bd.toPlainString
    // structured column values render as JSON structures, not Scala
    // debug strings — a ksqlDB-shaped client must be able to parse them
    case seq: scala.collection.Seq[_] =>
      seq.map(jsonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, value) =>
        s""""${jsonEscape(String.valueOf(k))}":${jsonValue(value)}"""
      }.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      r.schema match {
        case null => r.toSeq.map(jsonValue).mkString("[", ",", "]")
        case s => s.fieldNames.zip(r.toSeq).map { case (n, value) =>
          s""""${jsonEscape(n)}":${jsonValue(value)}"""
        }.mkString("{", ",", "}")
      }
    case other => s""""${jsonEscape(other.toString)}""""
  }

  /** Extract the string value of `"ksql"` from a JSON object body —
    * a real tokenizer for the one field we need (quotes and escapes in
    * the statement text must survive; a regex would not).
    */
  private[graft] def extractKsqlField(body: String): Option[String] = {
    // scan STRING TOKENS, not substrings: '"ksql"' inside another
    // field's value (e.g. {"note":"about \"ksql\"","ksql":"..."}) must
    // not bind as the key, so the key test is "complete string token
    // whose decoded value is ksql, followed by ':'" — AND only at
    // nesting depth 1: a ksql key buried in a sub-object
    // (e.g. {"streamsProperties":{"ksql":"..."}}) is some other
    // field's payload, not a statement, and executing it would let a
    // property bag smuggle SQL past a proxy that inspects only the
    // top-level field. A malformed \u escape returns None (→ the
    // caller's 400), never an exception.
    var i = 0
    var depth = 0
    def skipWs(): Unit =
      while (i < body.length && body.charAt(i).isWhitespace) i += 1
    // decodes the string token starting at body(i) == '"'; leaves i one
    // past the closing quote, or returns None at EOF/bad escape
    def stringToken(): Option[String] = {
      i += 1
      val sb = new StringBuilder
      while (i < body.length && body.charAt(i) != '"') {
        body.charAt(i) match {
          case '\\' if i + 1 < body.length =>
            body.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case 'u' =>
                if (i + 5 >= body.length) return None
                val hex = body.substring(i + 2, i + 6)
                if (!hex.forall(c => Character.digit(c, 16) >= 0)) return None
                sb.append(Integer.parseInt(hex, 16).toChar); i += 6
              case c => sb.append(c); i += 2
            }
          case c => sb.append(c); i += 1
        }
      }
      if (i >= body.length) None else { i += 1; Some(sb.result()) }
    }
    while (i < body.length) {
      body.charAt(i) match {
        case '"' =>
          val tok = stringToken().getOrElse(return None)
          val before = i
          skipWs()
          if (depth == 1 && tok == "ksql" && i < body.length &&
            body.charAt(i) == ':') {
            i += 1; skipWs()
            if (i >= body.length || body.charAt(i) != '"') return None
            return stringToken()
          }
          i = before // a value string: resume right after it
        // string contents never reach here (stringToken consumed them),
        // so every brace/bracket seen is structural
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case _ => i += 1
      }
    }
    None
  }

  /** ONE response protocol for both serving planes — a header or
    * error-draining change must not land on one plane only.
    */
  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def resultJson(statement: String, df: Option[DataFrame]): String =
    df match {
      case Some(d) =>
        val cols = d.columns.map(c => s""""${jsonEscape(c.toUpperCase)}"""")
          .mkString("[", ",", "]")
        val rows = d.collect().map(_.toSeq.map(jsonValue)
            .mkString("[", ",", "]"))
          .mkString("[", ",", "]")
        s"""{"statement":${jsonValue(statement)},"columns":$cols,"rows":$rows}"""
      case None =>
        s"""{"statement":${jsonValue(statement)},"status":"SUCCESS"}"""
    }

  /** Start a server bound to `port` (0 = ephemeral; read the bound port
    * off the returned server). The caller owns the engine's lifecycle.
    */
  def start(engine: KsqlEngine, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    server.createContext("/ksql", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        if (ex.getRequestMethod != "POST") {
          respond(ex, 405, """{"error":"use POST"}"""); return
        }
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        extractKsqlField(body) match {
          case None =>
            respond(ex, 400, """{"error":"body must be {\"ksql\": \"...\"}"}""")
          case Some(script) =>
            // one engine = one session; serialize statement execution so
            // concurrent clients observe a consistent catalog
            val results = engine.synchronized {
              KsqlParser.splitStatements(script).map { s =>
                try resultJson(s, engine.execute(KsqlParser.parse(s)))
                catch { case e: Exception =>
                  s"""{"statement":${jsonValue(s)},""" +
                    s""""error":${jsonValue(e.getMessage)}}"""
                }
              }
            }
            respond(ex, 200, results.mkString("[", ",", "]"))
        }
      } catch { case e: Exception =>
        respond(ex, 500, s"""{"error":${jsonValue(e.getMessage)}}""")
      } finally ex.close()
    })

    server.createContext("/info", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        respond(ex, 200,
          """{"KsqlServerInfo":{"version":"graft","kafkaClusterId":"n/a",""" +
            """"ksqlServiceId":"graft_spark_"}}""")
      } finally ex.close()
    })

    server.start()
    server
  }

  /** The STREAMING serving plane — ksqlDB's push-query interaction over
    * HTTP (reference README.md:94-118: `SELECT … EMIT CHANGES;` and rows
    * keep arriving; `files/ksqldb-server/ksql-server.properties:1` is
    * the listener this models):
    *
    *  - `POST /query` with `{"ksql": "SELECT … EMIT CHANGES;"}` answers
    *    with CHUNKED transfer encoding and streams newline-delimited
    *    JSON — one header line `{"queryId":…,"columnNames":[…]}`, then
    *    one `{"row":{"columns":[…]}}` line per emitted changelog row,
    *    held OPEN: INSERTs posted while the response is open appear as
    *    further chunks (the ksqlDB `/query-stream` delimited shape,
    *    simplified). A blank heartbeat line flushes every poll so a
    *    closed client is detected promptly; disconnect stops the
    *    standing query.
    *  - `POST /ksql` executes statements on the SAME streaming engine
    *    (one engine = one session, as in ksqlDB): DDL/INSERT → status,
    *    push queries → drain-snapshot-stop (the streaming REPL's
    *    contract — the changelog so far).
    *
    * Handlers run on a cached thread pool: an open `/query` response
    * must not block the `/ksql` INSERTs that feed it.
    */
  def startStreaming(engine: KsqlStreamingEngine, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

    server.createContext("/ksql", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        if (ex.getRequestMethod != "POST") {
          respond(ex, 405, """{"error":"use POST"}"""); return
        }
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        extractKsqlField(body) match {
          case None =>
            respond(ex, 400, """{"error":"body must be {\"ksql\": \"...\"}"}""")
          case Some(script) =>
            // serialize the WHOLE script, not per statement — the batch
            // plane does, and per-statement locking let another client's
            // statements interleave into this script's
            // create/insert/select sequence (half-built catalog reads).
            // KNOWN TRADEOFF: the lock is held across the push-query
            // drain/snapshot too (a script's SELECT must see exactly the
            // script's own INSERTs — draining outside the lock would let
            // another client's rows into the snapshot), so a script with
            // a slow push query stalls other clients and /query
            // teardowns (release shares this monitor, reentrant). Fine
            // for the interactive statement plane this models; a
            // high-concurrency deployment wants per-session engines.
            val results = engine.synchronized {
              KsqlParser.splitStatements(script).map { s =>
                try {
                  val out = engine.execute(KsqlParser.parse(s)) match {
                    case Some(h) =>
                      // drain, snapshot, RELEASE (the streaming REPL
                      // rule): a leaked active query would pin
                      // MemoryStream buffers, and a stopped-but-kept
                      // sink table would pin its whole changelog. The
                      // release rides a finally: a drain/collect that
                      // throws (runtime error in the micro-batch) must
                      // not leak the handle it was about to release —
                      // one leaked changelog per failing statement on a
                      // long-lived server, the /query leak class.
                      try {
                        h.processAllAvailable()
                        Some(resultJson(s, Some(h.emissions)))
                      } finally engine.release(h)
                    case None => None
                  }
                  out.getOrElse(resultJson(s, None))
                } catch { case e: Exception =>
                  s"""{"statement":${jsonValue(s)},""" +
                    s""""error":${jsonValue(e.getMessage)}}"""
                }
              }
            }
            respond(ex, 200, results.mkString("[", ",", "]"))
        }
      } catch { case e: Exception =>
        respond(ex, 500, s"""{"error":${jsonValue(e.getMessage)}}""")
      } finally ex.close()
    })

    server.createContext("/query", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        if (ex.getRequestMethod != "POST") {
          respond(ex, 405, """{"error":"use POST"}"""); return
        }
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val script = extractKsqlField(body).getOrElse {
          respond(ex, 400,
            """{"error":"body must be {\"ksql\": \"...\"}"}"""); return
        }
        val stmts = KsqlParser.splitStatements(script)
        val parsed =
          try {
            require(stmts.size == 1,
              s"/query takes exactly one statement, got ${stmts.size}")
            KsqlParser.parse(stmts.head)
          } catch { case e: Exception =>
            respond(ex, 400,
              s"""{"error":${jsonValue(e.getMessage)}}"""); return
          }
        if (!parsed.isInstanceOf[PushQuery]) {
          respond(ex, 400, """{"error":"/query serves push queries """ +
            """(SELECT ... EMIT CHANGES;) - use /ksql for statements"}""")
          return
        }
        val h =
          try engine.synchronized { engine.execute(parsed).get }
          catch { case e: Exception =>
            respond(ex, 400,
              s"""{"error":${jsonValue(e.getMessage)}}"""); return
          }
        // from here on the handle exists: EVERYTHING — including the
        // chunked handshake, which throws IOException if the client
        // already disconnected — runs inside the try whose finally
        // releases, or the aborted connection leaks a standing query
        try {
          ex.getResponseHeaders.set("Content-Type",
            "application/json; charset=utf-8")
          ex.sendResponseHeaders(200, 0) // length 0 => chunked, held open
          val os = ex.getResponseBody
          try {
          h.processAllAvailable()
          val cols = h.emissions.columns
            .map(c => s""""${jsonEscape(c.toUpperCase)}"""")
            .mkString("[", ",", "]")
          os.write((s"""{"queryId":${jsonValue(h.name)},""" +
            s""""columnNames":$cols}""" + "\n")
            .getBytes(StandardCharsets.UTF_8))
          os.flush()
          // poll-and-stream: every new changelog row becomes one chunk.
          // Chunk order is emission order because the memory sink
          // appends per micro-batch and [[PushHandle.drainSince]] walks
          // its batch list in order. Each poll is INCREMENTAL — O(rows
          // landed since the last poll), driver-only, zero Spark jobs —
          // so a long-lived connection's total serving cost is O(rows
          // emitted), not O(changelog²). The stream's own trigger
          // advances micro-batches; the loop never calls
          // processAllAvailable, it only observes the sink. The blank
          // heartbeat makes a closed client surface as IOException on
          // flush even when no rows are arriving, and a query stopped
          // under the handler (engine shutdown) ends the response after
          // one final drain instead of spinning until a write fails.
          var cursor = -1L
          var more = true
          while (more) {
            more = h.query.isActive
            val (rows, next) = h.drainSince(cursor)
            cursor = next
            rows.foreach { r =>
              val cells = r.toSeq.map(jsonValue).mkString("[", ",", "]")
              os.write((s"""{"row":{"columns":$cells}}""" + "\n")
                .getBytes(StandardCharsets.UTF_8))
            }
            os.write('\n'.toInt); os.flush()
            if (more) Thread.sleep(100)
          }
          } finally {
            try os.close() catch { case _: java.io.IOException => () }
          }
        } catch {
          case _: java.io.IOException => () // client closed: normal end
        } finally {
          // release, not stop: the memory sink's table holds this
          // connection's full changelog — a server field-tested only by
          // short tests would leak one changelog per connection served
          engine.release(h)
        }
      } finally ex.close()
    })

    server.createContext("/info", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        respond(ex, 200,
          """{"KsqlServerInfo":{"version":"graft","kafkaClusterId":"n/a",""" +
            """"ksqlServiceId":"graft_spark_","plane":"streaming"}}""")
      } finally ex.close()
    })

    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("GRAFT_KSQL_PORT", "8088").toInt
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-ksql-server")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val provider =
      if (sys.env.get("GRAFT_REPL_JDBC").contains("1"))
        KsqlEngine.jdbcConnectorProvider _
      else (s: SparkSession, _: Map[String, String]) =>
        graft.streaming.Tutorial.playersSeed(s)
    // GRAFT_SERVER_ENGINE=streaming serves the live-changelog plane:
    // /query streams push-query rows over a chunked response (the same
    // switch the REPL uses, GRAFT_REPL_ENGINE=streaming)
    val server =
      if (sys.env.get("GRAFT_SERVER_ENGINE").contains("streaming"))
        startStreaming(new KsqlStreamingEngine(spark,
          connectorProvider = provider), port)
      else
        start(new KsqlEngine(spark, connectorProvider = provider), port)
    println(s"graft ksql server listening on " +
      s"http://localhost:${server.getAddress.getPort} " +
      "(POST /ksql; streaming plane also POST /query)")
    Thread.currentThread().join() // serve until killed
  }
}
