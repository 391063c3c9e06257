package graft

import graft.engine.{Ops, Sinks, TableOps}
import graft.streaming.Tutorial
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Batch replay of every golden output in the reference README
  * (reference: README.md:100-114, 198-203, 221-226, 248-253, 298-304,
  * 339-351, 413-420, 462-464) over the canonical event sequence.
  */
class TutorialGoldenSpec extends SparkSpec {

  private lazy val players = Tutorial.playersSeed(spark)
  private lazy val events = Tutorial.canonicalEventsDF(spark)

  test("players seed matches the 10-row golden table (README.md:100-114)") {
    assert(players.count() === 10)
    val messi = players.filter(col("id") === "1").collect().head
    assert(messi === Row("1", "Lionel Messi", "Paris Saint-Germain", "Argentinian"))
    val sterling = players.filter(col("id") === "10").collect().head
    assert(sterling === Row("10", "Raheem Sterling", "Chelsea", "English"))
  }

  test("UCASE projection (P4, README.md:128-133)") {
    val r = players.select(col("name"), upper(col("team")).as("team"))
      .filter(col("name") === "Kevin De Bruyne").collect().head
    assert(r === Row("Kevin De Bruyne", "MANCHESTER CITY"))
  }

  test("CASE WHEN projection (P5, README.md:136-148)") {
    val labeled = players.select(col("name"),
      Ops.caseLabel(col("team"),
        Seq((col("team") === "Paris Saint-Germain") -> "PSG",
          (col("team") === "Manchester City") -> "CITY"), "OTHER").as("short"))
    assert(labeled.filter(col("short") === "PSG").count() === 3)
    assert(labeled.filter(col("short") === "CITY").count() === 2)
    assert(labeled.filter(col("short") === "OTHER").count() === 5)
  }

  test("WHERE filters (P8/P9, README.md:150-163)") {
    assert(players.filter(col("team") === "Manchester City").count() === 2)
    assert(players.filter(
      col("team") === "Paris Saint-Germain" && col("nationality") === "French")
      .collect().map(_.getString(1)).toSeq === Seq("Kylian Mbappe"))
  }

  test("ASSIST filter on the stream (README.md:221-226)") {
    val assists = events.filter(col("event_type") === "ASSIST")
    assert(assists.count() === 2)
    assert(assists.filter(col("player_id") === "1").count() === 1)
  }

  test("home-goals count evolution endpoint (A1, README.md:248-253)") {
    val counts = events
      .filter(col("home") && col("event_type") === "GOAL")
      .groupBy("id").agg(count(col("id")).as("goals"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("1" -> 2L, "2" -> 1L))
  }

  test("match_results pivot golden 1->(2,1) 2->(1,1) (A2, README.md:298-304)") {
    val mr = Tutorial.matchResults(events)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(mr === Map("1" -> ((2L, 1L)), "2" -> ((1L, 1L))))
  }

  test("match_results Kafka wire format (S5/K1, README.md:339-351)") {
    val kv = Sinks.kafkaKeyValue(Tutorial.matchResults(events), Seq("id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv === Map(
      "1" -> """{"HOME_GOALS":2,"AWAY_GOALS":1}""",
      "2" -> """{"HOME_GOALS":1,"AWAY_GOALS":1}"""))
  }

  test("player_stats golden: Messi (3,1.5,1) / Ronaldo (2,1.0,1) (README.md:413-420)") {
    val ps = Tutorial.playerStats(Tutorial.matchEventPlayer(events), players)
      .orderBy("player_id").collect()
    assert(ps.length === 2)
    assert(ps(0) === Row("1", "Lionel Messi", "Argentinian", 3L, 1.5, 1L))
    assert(ps(1) === Row("2", "Cristiano Ronaldo", "Portuguese", 2L, 1.0, 1L))
  }

  test("composite JSON key encoding (K1, README.md:462-465)") {
    val stats = Tutorial.playerStats(Tutorial.matchEventPlayer(events), players)
      .select("player_id", "player_name", "nationality", "goals")
    val kv = Sinks.kafkaKeyValue(stats, Seq("player_id", "player_name", "nationality"))
      .orderBy("key").collect()
    assert(kv.head.getString(0) ===
      """{"PLAYER_ID":"1","PLAYER_NAME":"Lionel Messi","NATIONALITY":"Argentinian"}""")
    assert(kv.head.getString(1) === """{"GOALS":3}""")
  }

  test("left join keeps unmatched stream rows (J2, all.sql:56-63)") {
    val withGhost = events.unionByName(
      Tutorial.canonicalEventsDF(spark).limit(1)
        .select(lit("3").as("id"), lit("GOAL").as("event_type"),
          lit("99").as("player_id"), lit(true).as("home"), lit(100L).as("_offset")))
    val left = Ops.enrichJoin(
      Tutorial.matchEventPlayer(withGhost), players, "player_id", "id", "left")
    assert(left.count() === 8)
    assert(left.filter(col("name").isNull).count() === 1)
  }

  test("KTable upsert semantics: latest row wins per key (Q3, README.md:92)") {
    import spark.implicits._
    val changelog = Seq(
      ("1", "Lionel Messi", "Barcelona", 0L),
      ("1", "Lionel Messi", "Paris Saint-Germain", 1L),
      ("2", "Cristiano Ronaldo", "Manchester United", 2L))
      .toDF("id", "name", "team", "_offset")
    val latest = TableOps.latestByKey(changelog, Seq("id"), "_offset")
      .select("id", "team").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(latest === Map("1" -> "Paris Saint-Germain", "2" -> "Manchester United"))
  }

  test("exact count distinct aggregator matches countDistinct (A3)") {
    val viaAgg = events.groupBy("player_id")
      .agg(graft.functions.ExactCountDistinct.column(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaBuiltin = events.groupBy("player_id")
      .agg(countDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaBuiltin)
  }

  test("Kafka wire round-trip: kafkaKeyValue encodes what decodeKafkaJson reads") {
    import org.apache.spark.sql.types._
    val kv = Sinks.kafkaKeyValue(Tutorial.matchResults(events), Seq("id"))
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        monotonically_increasing_id().as("offset"))
    val schema = StructType(Seq(
      StructField("HOME_GOALS", LongType), StructField("AWAY_GOALS", LongType)))
    val decoded = graft.engine.Sources.decodeKafkaJson(kv, schema, keyName = "id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(decoded === Map("1" -> ((2L, 1L)), "2" -> ((1L, 1L))))
  }

  test("SparkEntry.entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
