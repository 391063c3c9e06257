package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/** Collection kind: the reference's stream/table duality.
  * STREAM = append-only (README.md:164-166); TABLE = upsert-by-key
  * changelog (README.md:74-92).
  */
sealed trait CollectionKind
case object StreamKind extends CollectionKind
case object TableKind extends CollectionKind

/** One registered collection: name, kind, key column(s), backing topic (if
  * Kafka-backed) and the DataFrame that materializes it.
  */
final case class CollectionDef(
    name: String,
    kind: CollectionKind,
    keyCols: Seq[String],
    topic: Option[String],
    df: DataFrame)

/** Engine catalog: the registry behind `SHOW TOPICS` / `SHOW CONNECTORS` /
  * `SHOW STREAMS|TABLES` (S9, reference README.md:64-72) and the target of
  * CSAS/CTAS registration (S4/S5/S6, all.sql:45-51,129-160).
  *
  * Derived collections (CSAS/CTAS) are plain DataFrames whose schema is
  * inferred from the SELECT by Catalyst — exactly the reference's
  * "schema inferred from the SELECT" behavior (SURVEY.md §1.3).
  */
final class Catalog {
  private val defs = TrieMap.empty[String, CollectionDef]

  def registerStream(name: String, df: DataFrame, keyCols: Seq[String] = Nil,
      topic: Option[String] = None): CollectionDef =
    register(CollectionDef(name, StreamKind, keyCols, topic, df))

  def registerTable(name: String, df: DataFrame, keyCols: Seq[String],
      topic: Option[String] = None): CollectionDef =
    register(CollectionDef(name, TableKind, keyCols, topic, df))

  /** CSAS: derive a new stream from a SELECT over an existing collection
    * (S4, all.sql:45-51). `rekeyBy` mirrors `PARTITION BY` — recorded as the
    * new key; the physical repartition only matters when materializing to
    * Kafka (in-engine, Catalyst's EnsureRequirements shuffles for joins
    * automatically — SURVEY.md §4).
    */
  def createStreamAs(name: String, select: DataFrame => DataFrame,
      from: String, rekeyBy: Seq[String] = Nil,
      topic: Option[String] = None): CollectionDef = {
    val src = apply(from).df
    val derived = select(src)
    registerStream(name, derived,
      if (rekeyBy.nonEmpty) rekeyBy else apply(from).keyCols, topic)
  }

  /** CTAS: derive a table (grouped aggregation result) from a SELECT
    * (S5/S6, README.md:308-327, all.sql:129-160). The grouping columns are
    * the table's key and become the sink message key.
    */
  def createTableAs(name: String, select: DataFrame => DataFrame,
      from: String, keyCols: Seq[String],
      topic: Option[String] = None): CollectionDef = {
    val derived = select(apply(from).df)
    registerTable(name, derived, keyCols, topic)
  }

  def apply(name: String): CollectionDef =
    defs.getOrElse(name, throw new NoSuchElementException(
      s"collection '$name' not registered; known: ${defs.keys.mkString(", ")}"))

  def get(name: String): Option[CollectionDef] = defs.get(name)

  /** `SHOW STREAMS` / `SHOW TABLES` / `SHOW TOPICS` (S9). */
  def show(spark: SparkSession): DataFrame = {
    import spark.implicits._
    defs.values.toSeq
      .map(d => (d.name,
        d.kind match { case StreamKind => "STREAM"; case TableKind => "TABLE" },
        d.keyCols.mkString(","), d.topic.getOrElse("")))
      .sortBy(_._1)
      .toDF("name", "kind", "key_columns", "topic")
  }

  /** Re-registering the SAME KIND under a name is legal (idempotent
    * re-runs, `createOrReplaceTempView` semantics); silently turning a
    * STREAM into a TABLE (or back) is not — every reader's semantics
    * (append vs upsert) would flip under them. ksqlDB rejects the
    * duplicate outright; the kind flip is the dangerous half.
    */
  private def register(d: CollectionDef): CollectionDef = {
    defs.get(d.name).foreach(prev => require(prev.kind == d.kind,
      s"collection '${d.name}' already registered as ${prev.kind}; " +
        s"cannot re-register as ${d.kind} — DROP it first"))
    defs.put(d.name, d); d
  }
}
