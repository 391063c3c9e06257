package graft

import graft.engine.{Sinks, Sources}
import org.apache.spark.sql.Row

/** JSONL / CSV round trips over adversarial content: embedded delimiters,
  * quotes, JSON metacharacters, newlines, unicode, nulls — the payloads
  * that break naive escaping. The s12/s13 oracle rows prove the happy
  * path on real tables; these prove the quoting machinery.
  */
class SerdeRoundTripSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, """comma, "quoted" and \backslash""", 3.14159),
      (2L, "line1\nline2\ttabbed", -0.0),
      (3L, """{"looks": "like json"}""", 1.0e-300),
      (4L, null: String, Double.MaxValue),
      (5L, "naïve – ünïcödé ✓", 0.1 + 0.2) // 0.30000000000000004
    ).toDF("id", "payload", "x")
  }

  private def roundTrips(write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: String => org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val df = fixture
    val path = java.nio.file.Files.createTempDirectory(dir).toString + "/t"
    write(df, path)
    val back = read(path).select("id", "payload", "x")
    val a = df.collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(b === a)
  }

  test("JSONL round trip preserves quotes, newlines, unicode, nulls, doubles") {
    roundTrips(Sinks.toJsonl, p => Sources.fromJsonl(spark, p, fixture.schema),
      "graft_jsonl_spec")
  }

  test("CSV round trip preserves quotes, unicode, nulls, doubles") {
    // CSV cannot carry a raw newline inside an unquoted line-based read;
    // Spark's writer quotes it but the default reader is line-split, so
    // drop the newline row — the format's documented boundary (JSONL is
    // the lossless interchange; the s13 tables are newline-free).
    import org.apache.spark.sql.functions._
    val df = fixture.filter(col("id") =!= 2L)
    val path = java.nio.file.Files.createTempDirectory("graft_csv_spec")
      .toString + "/t"
    Sinks.toCsv(df, path)
    val back = Sources.fromCsv(spark, path, df.schema)
      .select("id", "payload", "x")
    val a = df.collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(b === a)
  }

  test("ORC round trip reproduces the customer table exactly") {
    val cust = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_orc_spec")
      .toString + "/customer"
    cust.write.mode("overwrite").orc(path)
    val back = spark.read.schema(cust.schema).orc(path)
    assert(back.schema === cust.schema)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).toSet
    assert(key(back) === key(cust))
  }

  test("corrupt CSV rows land in _corrupt_record instead of failing the read") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_csv_bad")
      .toString + "/t"
    Seq("1,ok,2.5", "not-a-long,broken,xyz").toDF("value")
      .coalesce(1).write.text(path)
    val got = Sources.fromCsv(spark, path, fixture.schema).collect()
    assert(got.length === 2)
    val bad = got.filter(r => !r.isNullAt(r.fieldIndex("_corrupt_record")))
    assert(bad.length === 1)
    assert(bad.head.getString(bad.head.fieldIndex("_corrupt_record"))
      .contains("not-a-long"))
  }
}
