package graft

import graft.engine.Layout
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Compaction racing in-flight readers — the isolation boundary of the
  * rename-swap protocols ([[Layout.compact]] / [[Layout.compactBucketed]])
  * exercised, not just asserted in prose.
  *
  * Contract (documented in SCALE.md): without a table format there is no
  * snapshot isolation across processes, so a reader overlapping a
  * compaction swap is allowed to FAIL LOUDLY (missing file / unresolved
  * table while the swap's window is open) and must succeed on retry — but
  * it must NEVER return silently wrong data. Both protocols guarantee
  * that by construction: superseded files are moved aside or deleted,
  * never superseded in place, so a stale listing can only hit
  * missing-file errors (`ignoreMissingFiles` stays false), and the
  * install point is a single rename. These tests hammer a reader loop
  * against repeated compactions and assert every successful read returned
  * the exact pre-compaction answer.
  */
class CompactionRaceSpec extends SparkSpec {

  private def hammer(reads: () => Long, expected: Long,
      compactions: () => Unit): Unit = {
    val results = new ConcurrentLinkedQueue[Either[String, Long]]()
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        try results.add(Right(reads()))
        catch { case e: Exception => results.add(Left(e.getClass.getName)) }
      }
    })
    reader.setDaemon(true)
    reader.start()
    try compactions() finally { stop = true; reader.join(30000) }
    val ok = results.asScala.collect { case Right(n) => n }.toSeq
    val failed = results.asScala.collect { case Left(e) => e }.toSeq
    withClue(s"reads=${ok.size} failed=${failed.distinct}") {
      // the reader loop ran — NOT `ok.nonEmpty`: the contract explicitly
      // allows every read overlapping a swap window to fail loudly, so a
      // slow machine whose reads all land in windows must not flake here
      // (the post-hammer fresh read below guarantees success is reachable)
      assert(ok.size + failed.size > 0)
      // loud-or-correct: every successful read is exact
      assert(ok.forall(_ == expected))
    }
    // after the dust settles a fresh read succeeds — transient failures
    // are retryable, not permanent. One retry allowed: the shared
    // session can serve ONE more loud miss from a listing cached
    // mid-swap (observed flake), which is exactly the retry the
    // contract prescribes; a second failure is a real bug
    val last = try reads() catch { case _: Exception => reads() }
    assert(last === expected)
  }

  test("bucketed-table compaction vs concurrent probes: loud or correct") {
    import spark.implicits._
    val tbl = "graft_race_band"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val df = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v")
    Layout.writeBucketed(df, tbl, "k", 4)
    // accrete append files so each compaction has real work
    (1 to 3).foreach(_ => Layout.appendBucketed(
      (2000L until 2500L).map(i => (i % 97, i)).toDF("k", "v"), tbl, "k", 4))
    val expected = spark.table(tbl).count()
    hammer(
      () => spark.table(tbl).where(col("k") >= 0).count(),
      expected,
      () => (1 to 4).foreach { _ =>
        Layout.compactBucketed(spark, tbl, "k", 4)
        Layout.appendBucketed(spark.table(tbl).limit(0), tbl, "k", 4)
      })
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("path compaction vs concurrent scans: loud or correct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_race_path")
      .resolve("data").toString
    val df = (0L until 5000L).toDF("v")
    df.repartition(8).write.mode("overwrite").parquet(dir)
    val expected = 5000L
    hammer(
      () => spark.read.parquet(dir).count(),
      expected,
      () => (1 to 4).foreach(_ => Layout.compact(spark, dir, 2)))
  }

  test("compactBucketed refuses a bucket-spec change; the pointer swap " +
      "never silently contradicts catalog metadata") {
    import spark.implicits._
    val tbl = "graft_spec_guard"
    Layout.writeBucketed(
      (0L until 100L).map(i => (i, i % 7)).toDF("k", "v"), tbl, "k", 4)
    // changing buckets, key, or sortedness through compaction would
    // leave the live entry claiming the OLD spec over new files
    for ((b, key, s) <- Seq((8, "k", true), (4, "v", true), (4, "k", false)))
      intercept[IllegalArgumentException] {
        Layout.compactBucketed(spark, tbl, key, b, sorted = s)
      }
    // the matching spec still compacts fine
    Layout.compactBucketed(spark, tbl, "k", 4)
    assert(spark.table(tbl).count() === 100L)
    spark.sql(s"DROP TABLE `$tbl`")
  }

  test("a pre-r12 __compacting scaffold is swept when the live table " +
      "also survived the crash") {
    import spark.implicits._
    val tbl = "graft_legacy_zombie"
    Layout.writeBucketed(
      (0L until 60L).map(i => (i, i)).toDF("k", "v"), tbl, "k", 4)
    // simulate the old protocol's crash-before-DROP state: both the live
    // table and the rename scaffold exist (the scaffold is a superseded
    // copy the old code dropped at entry)
    Layout.writeBucketed(
      (0L until 10L).map(i => (i, i)).toDF("k", "v"),
      tbl + "__compacting", "k", 4)
    Layout.compactBucketed(spark, tbl, "k", 4)
    assert(!spark.catalog.tableExists(tbl + "__compacting"),
      "legacy scaffold must be dropped, not zombie forever")
    assert(spark.table(tbl).count() === 60L)
    spark.sql(s"DROP TABLE `$tbl`")
  }
}
