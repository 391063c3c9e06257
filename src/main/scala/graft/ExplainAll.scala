package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps `explain("formatted")` for every registered
  * query so each round's shuffle/pushdown/broadcast review reads one file
  * instead of re-deriving plans by hand.
  *
  * Usage: runMain graft.ExplainAll [sfDir] [outFile]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("/tmp/plans.txt")
    // dump the real operator trees, not lineage-truncated checkpoint scans
    sys.props("graft.explain.lazy") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n${"=" * 70}\n== $name\n${"=" * 70}\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
