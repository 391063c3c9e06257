package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: execute ONE registered query and print its FINAL
  * executed plan — AQE has re-planned and WholeStageCodegen boundaries
  * are real, unlike the pre-execution dump `ExplainAll` captures (the
  * static `AdaptiveSparkPlan` hides which stages actually fused).
  *
  * Usage: runMain graft.PlanOf <query> [sfDir]
  */
object PlanOf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    // lazy mode: inspect the operator plan, not a scan of its
    // materialized scratch output
    sys.props("graft.explain.lazy") = "true"
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
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"== $name: $sec s ==")
    println(df.queryExecution.executedPlan.toString)
    // per-node nonzero metrics: where the rows and the time actually went
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      val ms = p.metrics.filter(_._2.value > 0)
      if (ms.nonEmpty)
        println(f"-- ${p.nodeName}%-28s " + ms.map { case (k, m) =>
          s"$k=${m.value}" }.mkString(" "))
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      kids.foreach(walk)
    }
    println("== node metrics (nonzero) ==")
    walk(df.queryExecution.executedPlan)
    spark.stop()
  }
}
