package graft

import graft.ksql.{KsqlEngine, KsqlServer}
import graft.streaming.Tutorial

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** The REST plane (reference README.md:30-33: the CLI connects to the
  * ksqlDB server over HTTP): the tutorial must be drivable with nothing
  * but POSTs to /ksql, and the server must survive the script's
  * intentionally-invalid statement the way the real server does.
  */
class KsqlServerSpec extends SparkSpec {

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val conn = new URI(s"http://localhost:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    val os = conn.getOutputStream
    try os.write(body.getBytes(StandardCharsets.UTF_8)) finally os.close()
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = try new String(is.readAllBytes(), StandardCharsets.UTF_8)
      finally is.close()
    (code, text)
  }

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URI(s"http://localhost:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val text = new String(conn.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    (code, text)
  }

  private def jsonBody(script: String): String =
    s"""{"ksql": "${KsqlServer.jsonEscape(script)}"}"""

  test("the tutorial drives end-to-end over POST /ksql") {
    val engine = new KsqlEngine(spark,
      connectorProvider = (s, _) => Tutorial.playersSeed(s))
    val server = KsqlServer.start(engine, 0)
    val port = server.getAddress.getPort
    try {
      val (c0, info) = get(port, "/info")
      assert(c0 === 200 && info.contains("KsqlServerInfo"))

      val script = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/files/ksqldb-cli/all.sql")),
        "UTF-8")
      val (c1, out1) = post(port, "/ksql", jsonBody(script))
      assert(c1 === 200)
      // the script's invalid aggregation errors inline, execution continues
      assert(out1.contains("MISSING_AGGREGATION"))
      assert(out1.contains(""""status":"SUCCESS""""))

      // query the converged state built by the script (README.md:413-420)
      val (c2, out2) = post(port, "/ksql",
        jsonBody("SELECT * FROM player_stats EMIT CHANGES;"))
      assert(c2 === 200)
      assert(out2.contains(""""columns":["PLAYER_ID","PLAYER_NAME","NATIONALITY","GOALS","AVG_GOALS","ASSISTS"]"""))
      assert(out2.contains("""["1","Lionel Messi","Argentinian",1,0.5,2]"""))
      assert(out2.contains("""["2","Cristiano Ronaldo","Portuguese",1,1.0,0]"""))

      // malformed body → 400, wrong method → 405; server stays up
      assert(post(port, "/ksql", """{"nope": 1}""")._1 === 400)
      val (c3, _) = get(port, "/info")
      assert(c3 === 200)
    } finally server.stop(0)
  }

  test("array/map/struct column values render as JSON structures") {
    val engine = new KsqlEngine(spark,
      connectorProvider = (s, _) => Tutorial.playersSeed(s))
    val server = KsqlServer.start(engine, 0)
    val port = server.getAddress.getPort
    try {
      post(port, "/ksql", jsonBody(
        """CREATE STREAM tagged (id INT KEY, tags ARRAY<VARCHAR>)
          WITH (KAFKA_TOPIC='tagged');"""))
      post(port, "/ksql", jsonBody(
        "INSERT INTO tagged VALUES (1, ARRAY['a','b']);"))
      val (c, out) = post(port, "/ksql",
        jsonBody("SELECT id, tags FROM tagged EMIT CHANGES;"))
      assert(c === 200)
      // a JSON array, not the Scala debug string "WrappedArray(a, b)"
      assert(out.contains("""[1,["a","b"]]"""), out)
    } finally server.stop(0)
  }

  test("extractKsqlField binds the KEY token, not a value mentioning " +
      "\"ksql\", and malformed escapes are a 400, not a 500") {
    import graft.ksql.KsqlServer.extractKsqlField
    // a decoy '"ksql"' inside ANOTHER field's string value must not bind
    assert(extractKsqlField(
      """{"note":"about \"ksql\" stuff","ksql":"SHOW TOPICS;"}""")
      === Some("SHOW TOPICS;"))
    assert(extractKsqlField("""{"note":"mentions ksql only"}""") === None)
    // key after the decoy, escapes in the value survive
    assert(extractKsqlField(
      """{"a":"\"ksql\":","ksql":"SELECT 'A';"}""")
      === Some("SELECT 'A';"))
    // NESTED "ksql" keys are some other field's payload, never the
    // statement: binding at any depth would let a property bag smuggle
    // SQL past a proxy inspecting only the top-level field
    assert(extractKsqlField(
      """{"streamsProperties":{"ksql":"SELECT 1;"}}""") === None)
    assert(extractKsqlField(
      """{"configs":[{"ksql":"SELECT 1;"}]}""") === None)
    // ... and a nested decoy before the REAL top-level key still binds
    assert(extractKsqlField(
      """{"props":{"ksql":"DECOY;"},"ksql":"SHOW TOPICS;"}""")
      === Some("SHOW TOPICS;"))
    // malformed \u escape: None (the endpoint answers 400), no throw
    assert(extractKsqlField(
      """{"ksql":"bad !uZZ99 escape"}""".replace('!', '\\')) === None)
    assert(extractKsqlField(
      """{"ksql":"truncated !u00""".replace('!', '\\')) === None)
    // and over the wire: a body whose only "ksql" is inside a value → 400
    val engine = new KsqlEngine(spark,
      connectorProvider = (s, _) => Tutorial.playersSeed(s))
    val server = KsqlServer.start(engine, 0)
    val port = server.getAddress.getPort
    try {
      assert(post(port, "/ksql",
        """{"note":"talks about \"ksql\" here"}""")._1 === 400)
      assert(post(port, "/ksql",
        """{"ksql":"oops !uXYZW"}""".replace('!', '\\'))._1 === 400)
    } finally server.stop(0)
  }

  test("POST /query streams push-query rows over a chunked response — " +
      "INSERTs posted while it is open arrive incrementally") {
    import graft.ksql.{KsqlServer, KsqlStreamingEngine}
    val engine = new KsqlStreamingEngine(spark,
      connectorProvider = (s, _) => Tutorial.playersSeed(s))
    val server = KsqlServer.startStreaming(engine, 0)
    val port = server.getAddress.getPort
    try {
      val (c0, _) = post(port, "/ksql", jsonBody(
        """CREATE STREAM match_event (
          id VARCHAR KEY, event_type VARCHAR, player_id VARCHAR,
          home boolean) WITH (KAFKA_TOPIC='match_event');"""))
      assert(c0 === 200)

      // open the push query; the response must stay OPEN (chunked)
      val conn = new URI(s"http://localhost:$port/query").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setReadTimeout(30000)
      val os = conn.getOutputStream
      try os.write(jsonBody(
        "SELECT id, COUNT(id) AS n FROM match_event GROUP BY id " +
          "EMIT CHANGES;").getBytes(StandardCharsets.UTF_8))
      finally os.close()
      assert(conn.getResponseCode === 200)
      assert(Option(conn.getHeaderField("Transfer-Encoding"))
        .exists(_.equalsIgnoreCase("chunked")),
        s"not chunked: ${conn.getHeaderFields}")
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream,
          StandardCharsets.UTF_8))
      def nextDataLine(): String = { // skip blank heartbeat chunks
        var l = reader.readLine()
        while (l != null && l.trim.isEmpty) l = reader.readLine()
        assert(l != null, "stream closed early")
        l
      }
      val header = nextDataLine()
      assert(header.contains(""""columnNames":["ID","N"]"""), header)

      // rows emitted BEFORE any insert: none — now insert and watch the
      // changelog arrive on the already-open response
      post(port, "/ksql", jsonBody(
        "INSERT INTO match_event VALUES ('1','GOAL','1',true);"))
      val r1 = nextDataLine()
      assert(r1.contains(""""columns":["1",1]"""), r1)

      // a second insert, same open response: the count UPDATES
      post(port, "/ksql", jsonBody(
        "INSERT INTO match_event VALUES ('1','GOAL','2',true);"))
      val r2 = nextDataLine()
      assert(r2.contains(""""columns":["1",2]"""), r2)

      // client closes; server must survive and stay responsive
      conn.disconnect()
      assert(get(port, "/info")._2.contains(""""plane":"streaming""""))

      // non-push statements are refused with 400, not streamed
      assert(post(port, "/query", jsonBody("SHOW STREAMS;"))._1 === 400)
    } finally {
      server.stop(0)
      engine.stopAll()
    }
  }

  test("json escaping survives quotes, backslashes, and control chars") {
    import spark.implicits._
    val engine = new KsqlEngine(spark,
      connectorProvider = (s, _) => Tutorial.playersSeed(s))
    val server = KsqlServer.start(engine, 0)
    val port = server.getAddress.getPort
    try {
      val (c, out) = post(port, "/ksql",
        jsonBody("""SET 'a' = 'quote " and tab	here';""" + "\n" +
          "SHOW TOPICS;"))
      assert(c === 200)
      assert(out.contains(""""status":"SUCCESS""""))
    } finally server.stop(0)
  }
}
