package graft

/** Isolated-twin timer: for each query name in args, time it in THIS
  * fresh JVM/session with one untimed warmup run and `SPARK_GRAFT_RUNS`
  * (default 2) timed runs, and print min/median per row as one JSON
  * line. This is the "isolated fresh-JVM twin" measurement the r12-r14
  * verdicts kept reconstructing by hand to adjudicate in-suite bench
  * rows — one committed definition so every future comparison uses the
  * same protocol (same GraftSession config as Bench, same count()
  * materialization, per-query warmup, additive-noise min).
  */
object IsolatedRows {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IsolatedRows <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = GraftSession.local(cpus)
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    def r3(x: Double) = BenchUtil.r3(x)
    val rows = args.toSeq.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // per-query warmup (JIT + session builds)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      s""""$name":{"min":${r3(ts.min)},"median":${
        r3(StreamBench.median(ts))},"runs":[${ts.map(r3).mkString(",")}]}"""
    }
    println(s"""{"metric":"isolated_rows","sf":"$sfDir","cpus":$cpus,"runs":$runs,"queries":{${
      rows.mkString(",")}}}""")
    spark.stop()
  }
}
