package graft

import graft.engine.Avro
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro container-file ingest/egress (engine/Avro.scala): distributed
  * write → distributed read must be lossless for the flat Connect-style
  * payload shape, including nulls and binary fields.
  */
class AvroSourceSpec extends SparkSpec {

  test("avro write→read round-trips primitives, nulls and bytes") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -0.25, true, Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_t")
      .toString + "/data"
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().map(r => (r.getLong(0), r.getAs[String](1),
      Option(r.getAs[java.lang.Double](2)),
      r.getBoolean(3), Option(r.getAs[Array[Byte]](4)).map(_.toSeq))).toSet
    assert(got === Set(
      (1L, "alpha", Some(1.5), true, Some(Seq[Byte](1, 2, 3))),
      (2L, null, None, false, None),
      (3L, "gamma", Some(-0.25), true, Some(Seq.empty[Byte]))))
  }

  test("avro read resolves mixed field orders by NAME (schema evolution)") {
    import spark.implicits._
    // two writers, same field names, different field ORDER — the
    // connector-fed directory shape after a schema evolution. The reader
    // must align by name; a positional decode would swap the columns of
    // every reordered file silently.
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_mix")
      .toString
    Avro.write(Seq((1L, "a1", "b1")).toDF("id", "a", "b"), s"$dir/w1")
    Avro.write(Seq(("b2", 2L, "a2")).toDF("b", "id", "a"), s"$dir/w2")
    val mixed = new java.io.File(s"$dir/mixed"); mixed.mkdirs()
    Seq("w1", "w2").foreach { w =>
      new java.io.File(s"$dir/$w").listFiles()
        .filter(_.getName.endsWith(".avro")).zipWithIndex.foreach {
          case (f, i) =>
            java.nio.file.Files.copy(f.toPath,
              new java.io.File(mixed, s"$w-$i.avro").toPath)
        }
    }
    val back = Avro.read(spark, s"$dir/mixed")
      .select("id", "a", "b").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back === Set((1L, "a1", "b1"), (2L, "a2", "b2")))
  }

  test("read rejects a directory without avro files; write rejects nested types") {
    val empty = java.nio.file.Files.createTempDirectory("graft_avro_e").toString
    intercept[IllegalArgumentException] { Avro.read(spark, empty) }
    import spark.implicits._
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    intercept[IllegalArgumentException] { Avro.write(nested, empty + "/x") }
  }
}
