package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** In-suite bench-median decomposition (round-15 Next #1): replays the
  * EXACT Bench protocol — one untimed warmup pass, then
  * `SPARK_GRAFT_RUNS` timed passes over every query in alphabetical
  * order inside ONE JVM/session — but snapshots JVM-state counters
  * around every timed query, so a row whose in-suite median reads 2-8×
  * its isolated fresh-JVM twin (BENCH_r14: v18 7.54 s vs 2.29 s, v1
  * 1.28 vs 0.46, v19/v20/t32 likewise) can be attributed to a NAMED
  * session term instead of "session state":
  *
  *   - `jit_ms`   — CompilationMXBean total-compilation-time delta: the
  *                  JIT compiler burning CPU during the query (C2
  *                  threads compete with the 32 worker threads for the
  *                  same cores on local[32]).
  *   - `gc_ms`    — GC-time delta across all collectors (broadcast /
  *                  ContextCleaner backlog shows up here).
  *   - `cc_mb`    — CodeHeap pool usage after the query (sum of the
  *                  three JDK-17 segmented code-cache pools). A SHRINK
  *                  between passes = UseCodeCacheFlushing evicting cold
  *                  nmethods — between-pass cold is exactly a bench
  *                  row's idle pattern, and a flushed hot loop re-runs
  *                  interpreted until recompiled.
  *   - `meta_mb`  — Metaspace used (the 8192-entry codegen-cache
  *                  retention ADVICE r14 flags).
  *   - `classes`  — loaded-class count (codegen class churn).
  *
  * Output: one JSON line with per-query per-pass rows for every query
  * (names sorted), plus pass totals and end-of-pass JVM snapshots.
  * Attribution logic stays in the analysis (SCALE.md), not here — this
  * main only measures.
  */
object SuiteDecompose {
  private case class Snap(jitMs: Long, gcMs: Long, ccMb: Double,
      metaMb: Double, classes: Long)

  private def snap(): Snap = {
    val comp = ManagementFactory.getCompilationMXBean
    val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def used(p: String => Boolean): Double =
      pools.filter(x => p(x.getName)).map(_.getUsage.getUsed).sum / 1e6
    Snap(
      if (comp.isCompilationTimeMonitoringSupported)
        comp.getTotalCompilationTime else -1L,
      gc,
      used(_.startsWith("CodeHeap")),
      used(_ == "Metaspace"),
      ManagementFactory.getClassLoadingMXBean.getTotalLoadedClassCount)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    // SPARK_GRAFT_DECOMP_REF=1 mirrors Bench EXACTLY by also running the
    // host-reference row first and last in every timed pass — the one
    // structural difference between the two protocols, isolated so a row
    // that reads differently under Bench than under this main can be
    // attributed to the ref row's session side effects
    val mirrorRef = sys.env.get("SPARK_GRAFT_DECOMP_REF").contains("1")
    val spark = GraftSession.local(cpus)
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup pass, exactly as Bench
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val warmEnd = snap()
    def r3(x: Double): Double = BenchUtil.r3(x)
    // rows(q) = per-pass records
    val rows = scala.collection.mutable.Map[String,
      List[(Double, Snap, Snap)]]().withDefaultValue(Nil)
    def refRow(): Unit =
      try SparkEntry.queries(ScaleBench.HostRefRow)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    val passEnds = (1 to runs).map { _ =>
      if (mirrorRef) refRow()
      names.foreach { n =>
        val before = snap()
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(_) => () }
        val el = (System.nanoTime() - t0) / 1e9
        rows(n) = rows(n) :+ ((el, before, snap()))
      }
      if (mirrorRef) refRow()
      snap()
    }
    val qJson = names.map { n =>
      val per = rows(n).map { case (el, b, a) =>
        s"""{"sec":${r3(el)},"jit_ms":${a.jitMs - b.jitMs},"gc_ms":${
          a.gcMs - b.gcMs},"cc_mb":${r3(a.ccMb)},"cc_delta_mb":${
          r3(a.ccMb - b.ccMb)},"meta_mb":${r3(a.metaMb)},"classes":${
          a.classes},"class_delta":${a.classes - b.classes}}"""
      }.mkString("[", ",", "]")
      s""""$n":$per"""
    }.mkString("{", ",", "}")
    def snapJson(s: Snap) =
      s"""{"jit_ms":${s.jitMs},"gc_ms":${s.gcMs},"cc_mb":${r3(s.ccMb)},"meta_mb":${
        r3(s.metaMb)},"classes":${s.classes}}"""
    val totals = (0 until runs).map(i =>
      r3(names.map(n => rows(n)(i)._1).sum)).mkString("[", ",", "]")
    val ccMax = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap")).map(_.getUsage.getMax)
      .sum / 1e6
    println(s"""{"metric":"suite_decompose","sf":"$sfDir","cpus":$cpus,"runs":$runs,"cc_max_mb":${
      r3(ccMax)},"warm_end":${snapJson(warmEnd)},"pass_end":[${
      passEnds.map(snapJson).mkString(",")}],"run_totals":$totals,"queries":$qJson}""")
    spark.stop()
  }
}
