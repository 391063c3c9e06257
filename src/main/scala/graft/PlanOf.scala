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
    // validate BEFORE booting a session: a missing or mistyped name must
    // print usage + the valid names, not cost a multi-second startup and
    // then die with a raw NoSuchElementException
    val name = args.headOption.getOrElse {
      System.err.println("usage: PlanOf <query> [sfDir]")
      sys.exit(2)
    }
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; valid names:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    // lazy mode: inspect the operator plan, not a scan of its
    // materialized scratch output. Caveat: under this mode
    // Scratch.materializeThenFree neither checkpoints nor frees, so every
    // scratch persist of the query stays cached through the run — the
    // wall time printed here is the UNCHECKPOINTED execution; fine for a
    // one-query diagnostic at small SF, not a production timing.
    sys.props("graft.explain.lazy") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
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
