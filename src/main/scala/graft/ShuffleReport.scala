package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shuffle/spill telemetry main: run every registered query once at
  * SPARK_GRAFT_SF_DIR and print ONE JSON line with the executed plan's
  * aggregate SQLMetrics per query — shuffle bytes written, shuffle bytes
  * read, broadcast build size, spill, and parquet bytes scanned.
  *
  * Why it exists: the engine's 100 TB claims are plan-shape claims
  * ("corpus never shuffles", "exchange carries only aggregate buffers",
  * "broadcast only dimension-sized relations"). `PLANS_r*.txt` shows the
  * shapes; this artifact shows the measured BYTES behind them at the
  * bench SF, so a corpus-sized exchange can't hide behind a
  * plausible-looking tree. Driver-style contract: one JSON line,
  * per-query objects, queries that throw are recorded and non-zero-exit.
  */
object ShuffleReport {

  /** Flatten the EXECUTED tree: AQE roots expand to their final plan,
    * materialized query stages to their contained plan; reused exchanges
    * stop (their metrics belong to the original, counting them twice
    * would double the bytes).
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Sum one metric key across the flattened tree. */
  private def sumMetric(nodes: Seq[SparkPlan], key: String): Long =
    nodes.iterator.flatMap(_.metrics.get(key)).map(_.value).filter(_ > 0).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        // execute THIS DataFrame's own QueryExecution — df.count() would
        // plan and run a separate aggregate query, leaving every metric
        // on the inspected plan at zero
        df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val nodes = flatten(df.queryExecution.executedPlan)
        // shuffle write is authoritative (one metric per real exchange);
        // read-side totals can exceed it when several consumers re-read
        // one exchange — report both, written is the wire-cost claim
        val sw = sumMetric(nodes, "shuffleBytesWritten")
        val sr = sumMetric(nodes, "localBytesRead") +
          sumMetric(nodes, "remoteBytesRead")
        val bc = nodes.collect {
          case e if e.nodeName.contains("BroadcastExchange") =>
            e.metrics.get("dataSize").map(_.value).getOrElse(0L)
        }.filter(_ > 0).sum
        val spill = sumMetric(nodes, "spillSize") +
          sumMetric(nodes, "diskBytesSpilled")
        val scanned = nodes.collect {
          case s if s.nodeName.contains("Scan") =>
            s.metrics.get("filesSize").map(_.value).getOrElse(0L)
        }.filter(_ > 0).sum
        name -> (s""""$name":{"sec":${math.rint(sec * 1000) / 1000},""" +
          s""""shuffle_write":$sw,"shuffle_read":$sr,"broadcast":$bc,""" +
          s""""spill":$spill,"scan_bytes":$scanned}""", false)
      } catch {
        case e: Throwable =>
          name -> (s""""$name":{"err":"${esc(e.toString.take(200))}"}""", true)
      }
    }
    val nErr = rows.count(_._2._2)
    println(s"""{"metric":"shuffle_bytes","sf":"$sfDir","n_err":$nErr,""" +
      s""""queries":${rows.map(_._2._1).mkString("{", ",", "}")}}""")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
