package graft.engine

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file ingest/egress over `avro-mapred` (part of Spark's
  * own dependency set) — no external datasource needed. Avro is the other
  * standard Kafka-Connect wire format next to the JSON serde the reference
  * runs (files/ksqldb-cli/all.sql:5 `CREATE SOURCE CONNECTOR`), so a
  * connector-fed corpus often lands as `.avro` before its first parquet
  * conversion.
  *
  * Scope: FLAT records of primitive / nullable-primitive fields (string,
  * int, long, float, double, boolean, bytes) — the Connect payload shape.
  * Both directions are fully distributed: the read maps container blocks
  * to input splits (no driver materialization), the write emits one
  * container file per partition via the Hadoop output committer. The only
  * driver-side I/O is one file-header open to learn the writer schema.
  */
object Avro {

  /** The Avro writer schema of `path`'s first container file (Avro files
    * are self-describing); the READER schema for [[read]].
    */
  private def avroSchemaOf(spark: SparkSession, path: String): Schema = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files in $path"))
    val in = fs.open(first)
    try {
      val r = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }

  /** The Spark StructType for `path`'s writer schema (read from the first
    * container file's header — Avro files are self-describing).
    */
  def schemaOf(spark: SparkSession, path: String): StructType =
    toStructType(avroSchemaOf(spark, path))

  /** Distributed read of an Avro container-file directory. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = avroSchemaOf(spark, path)
    val struct = toStructType(avroSchema)
    val n = struct.length
    // set the READER schema on the job: each split resolves its own
    // file's writer schema against it BY FIELD NAME (Avro schema
    // resolution), so files whose fields were written in a different
    // order — schema evolution across a connector-fed directory — decode
    // into the right columns instead of silently misaligning positionally
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, avroSchema)
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      // convert straight out of the (reused) Hadoop record before the
      // reader advances — copies live in the Row, never the Avro datum
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq((0 until n).map(i => fromAvroValue(rec.get(i))))
      }
    spark.createDataFrame(rdd, struct)
  }

  /** Distributed write: one container file per partition, schema derived
    * from the DataFrame. The target directory must not exist (Hadoop
    * output-committer semantics — same contract as any `saveAs*` path).
    */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = toAvroSchema(df.schema).toString
    val spark = df.sparkSession
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    df.rdd
      .mapPartitions { it =>
        // parse once per partition; Schema is not serializable-stable
        // across Avro versions, so ship the json
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < row.length) { rec.put(i, toAvroValue(row.get(i))); i += 1 }
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  private def toStructType(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"expected record, got ${s.getType}")
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (branch, nullable) = unwrapNullable(f.schema())
      StructField(f.name(), primType(branch), nullable)
    })
  }

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only [null, T] unions supported, got ${s.getTypes}")
      (nonNull.head, branches.size > nonNull.size)
    } else (s, false)

  private def primType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(
      s"unsupported avro type for flat ingest: $other")
  }

  private def toAvroSchema(schema: StructType): Schema = {
    def prim(dt: DataType): String = dt match {
      case StringType => "string"
      case IntegerType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case BooleanType => "boolean"
      case BinaryType => "bytes"
      case other => throw new IllegalArgumentException(
        s"unsupported type for flat avro egress: $other")
    }
    val fields = schema.fields.map { f =>
      val t =
        if (f.nullable) s"""["null","${prim(f.dataType)}"]"""
        else s""""${prim(f.dataType)}""""
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"graft_record","fields":[$fields]}""")
  }

  private def fromAvroValue(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case x => x
  }

  private def toAvroValue(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case x => x
  }
}
