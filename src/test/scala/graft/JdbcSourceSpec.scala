package graft

import graft.engine.Sources

/** Executes the REAL JDBC source paths against an embedded Derby database
  * (in /opt/spark/jars — genuine JDBC URL + DriverManager, no injected
  * stand-in DataFrame): the snapshot read behind `CREATE SOURCE CONNECTOR`
  * (reference: files/ksqldb-cli/all.sql:3-18) and the `mode=incrementing`
  * watermark pull (all.sql:10-12).
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  // Derby 10.16 ships no META-INF/services/java.sql.Driver — register the
  // driver class explicitly, as any production JDBC connector config would
  private val jdbcOpts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def withConn[A](f: java.sql.Connection => A): A = {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(sql: String*): Unit = withConn { c =>
    val st = c.createStatement()
    try sql.foreach(st.executeUpdate) finally st.close()
  }

  test("fromJdbcSnapshot executes a genuine JDBC read (embedded Derby)") {
    exec(
      """CREATE TABLE players(
        |  id INT PRIMARY KEY, name VARCHAR(50), team VARCHAR(50))""".stripMargin,
      "INSERT INTO players VALUES (1,'jorge','valencia')," +
        "(2,'fabio','valencia'),(3,'dani','sevilla')")
    val df = Sources.fromJdbcSnapshot(spark, url, "players", jdbcOpts)
    // Derby folds unquoted identifiers to upper case
    val got = df.select("ID", "NAME", "TEAM").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1, "jorge", "valencia"), (2, "fabio", "valencia"), (3, "dani", "sevilla")))
  }

  test("fromJdbcIncrement: watermark pull sees only rows past lastSeen") {
    exec(
      "CREATE TABLE inc_events(id INT PRIMARY KEY, event_type VARCHAR(20))",
      "INSERT INTO inc_events VALUES (1,'GOAL'),(2,'ASSIST'),(3,'GOAL')")
    // first poll from offset 0: the full table
    val first = Sources.fromJdbcIncrement(spark, url, "inc_events", "id", 0L, jdbcOpts)
      .select("ID").collect().map(_.getInt(0)).toSet
    assert(first === Set(1, 2, 3))
    // rows arrive between polls; the next pull starts past the watermark
    exec("INSERT INTO inc_events VALUES (4,'GOAL'),(5,'CARD')")
    val second = Sources.fromJdbcIncrement(spark, url, "inc_events", "id", 3L, jdbcOpts)
      .select("ID", "EVENT_TYPE").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(second === Set((4, "GOAL"), (5, "CARD")))
    // caught-up poll is empty, not an error
    assert(Sources.fromJdbcIncrement(
      spark, url, "inc_events", "id", 5L, jdbcOpts).isEmpty)
  }

  test("KSQL CREATE SOURCE CONNECTOR pulls through a real JDBC database") {
    // seed Derby with the tutorial players via Spark's own JDBC writer
    graft.streaming.Tutorial.playersSeed(spark).write
      .format("jdbc").option("url", url).option("dbtable", "tut_players")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").save()
    // DEFAULT connector provider — genuine JDBC URL, nothing injected
    val e = new graft.ksql.KsqlEngine(spark)
    e.execute("CREATE SOURCE CONNECTOR tutorial_src WITH (" +
      "'connection.url' = 'jdbc:derby:memory:graftjdbc', " +
      "'connection.driver.class' = 'org.apache.derby.jdbc.EmbeddedDriver', " +
      "'table.whitelist' = 'tut_players');")
    e.execute("""CREATE TABLE players (
      id VARCHAR PRIMARY KEY, name VARCHAR(50), team VARCHAR(50),
      nationality VARCHAR(50)) WITH (KAFKA_TOPIC = 'tut_players');""")
    val got = e.execute("SELECT id, name, team FROM players EMIT CHANGES;")
      .get.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = graft.streaming.Tutorial.playersSeed(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSet === want.toSet)
    assert(got.length === 10)
  }

  test("fromJdbcIncrement rejects identifier injection") {
    intercept[IllegalArgumentException] {
      Sources.fromJdbcIncrement(spark, url, "t; DROP TABLE x", "id", 0L)
    }
    intercept[IllegalArgumentException] {
      Sources.fromJdbcIncrement(spark, url, "t", "id > 0 OR 1=1 --", 0L)
    }
  }
}
