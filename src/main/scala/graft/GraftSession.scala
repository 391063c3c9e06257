package graft

import org.apache.spark.sql.SparkSession

/** The one SparkSession configuration every diagnostic/benchmark main
  * shares. One definition, eight callers (Bench, ScaleBench, StreamBench,
  * Verify, RecallReport, ShuffleReport, ExplainAll, PlanOf): a config
  * added here — e.g. the ObjectHashAggregate fallback threshold, which
  * changes physical aggregate operator choice — reaches the plan dumps,
  * the benches, and the oracle runner identically. A drifted copy would
  * make dumped plans silently differ from what the benches execute,
  * defeating the plan-audit purpose.
  */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata parquet carries TIMESTAMP(NANOS) — read as nanos-long
      // (TestdataAdapter converts to µs, matching DuckDB's ns→µs floor)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
