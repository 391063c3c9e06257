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

  test("manifested compaction vs concurrent scans: ZERO failed reads") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_race_manifest")
      .resolve("data").toString
    val df = (0L until 5000L).toDF("v")
    Layout.writeManifested(df, root, targetFiles = 8)
    val expected = 5000L
    // stricter than hammer(): the manifest protocol's two-install sweep
    // deferral means NO read may fail, loudly or otherwise — the reader's
    // resolved version directory survives the entire next compaction
    val results = new ConcurrentLinkedQueue[Either[String, Long]]()
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        try results.add(Right(Layout.readManifested(spark, root).count()))
        catch { case e: Exception => results.add(Left(e.toString.take(200))) }
      }
    })
    reader.setDaemon(true)
    reader.start()
    try (1 to 4).foreach(_ => Layout.compactManifested(spark, root, 2))
    finally { stop = true; reader.join(30000) }
    val ok = results.asScala.collect { case Right(n) => n }.toSeq
    val failed = results.asScala.collect { case Left(e) => e }.toSeq
    withClue(s"reads=${ok.size} failed=$failed") {
      assert(failed.isEmpty, "manifested reads must never fail mid-compaction")
      assert(ok.nonEmpty)
      assert(ok.forall(_ == expected))
    }
    // NO retry on the settled read either — the zero-retry contract
    assert(Layout.readManifested(spark, root).count() === expected)
  }

  test("manifest crash windows: an uncommitted version dir is swept; " +
      "the pointer always resolves a complete snapshot") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_crash")
      .resolve("data").toString
    Layout.writeManifested((0L until 300L).toDF("v"), root, targetFiles = 4)
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // version dirs are uuid-suffixed (v<k>-<uuid8>); assert by prefix
    def verDirs(prefix: String): Seq[String] =
      fs.listStatus(rootP).toSeq.map(_.getPath.getName)
        .filter(n => n == prefix || n.startsWith(prefix + "-"))
    // simulate a writer that crashed after its rewrite but BEFORE the
    // pointer rename: a complete-looking v2 dir no manifest names (the
    // bare legacy name is still in the swept family)
    (0L until 7L).toDF("v").write.parquet(s"$root/v2")
    // readers still resolve v1 (the only committed snapshot)
    assert(Layout.readManifested(spark, root).count() === 300L)
    // the next writer (current = 1) must LEAVE the v2-family orphan
    // alone — at entry it is indistinguishable from a racing winner's
    // in-flight build for version current+1, and sweeping it is how the
    // r13 protocol could commit a deleted directory — and commit ITS v2
    Layout.compactManifested(spark, root, 2)
    assert(Layout.readManifested(spark, root).count() === 300L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v2")),
      "an unreferenced dir at version current+1 must survive the entry " +
        "sweep — it may be a concurrent racer's in-flight build")
    // crashed manifest tmp files are swept; and now that current (2) has
    // advanced past the orphan's version, it is provably dead — swept
    fs.create(new org.apache.hadoop.fs.Path(s"$root/_manifest/.tmp-m9-x"),
      true).close()
    Layout.compactManifested(spark, root, 2)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_manifest"))
      .exists(_.getPath.getName.startsWith(".tmp-")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/v2")),
      "the orphan must be swept one install later, once current >= its version")
    assert(Layout.readManifested(spark, root).count() === 300L)
    // two-install deferral: current is v3, so v2 (the committed one, one
    // install old) is still on disk; v1 died at this entry (two installs
    // old). A reader that resolved m2 just before the v3 install keeps an
    // intact directory through the entire NEXT compaction
    assert(verDirs("v2").nonEmpty)
    Layout.compactManifested(spark, root, 2) // current v3 → builds v4
    assert(verDirs("v1").isEmpty,
      "v1 must be swept once it is two installs old")
    assert(verDirs("v2").nonEmpty)
    assert(Layout.readManifested(spark, root).count() === 300L)
  }

  test("compactManifested refuses to flatten a partitioned snapshot, " +
      "and preserves the layout when partitionCols is re-declared") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_part")
      .resolve("data").toString
    val df = (0L until 400L).map(i => (i, s"p${i % 4}")).toDF("v", "p")
    Layout.writeManifested(df, root, targetFiles = 4, Seq("p"))
    assert(Layout.readManifested(spark, root).count() === 400L)
    // omitting partitionCols would silently flatten the p= layout
    intercept[IllegalArgumentException] {
      Layout.compactManifested(spark, root, 2)
    }
    Layout.compactManifested(spark, root, 2, Seq("p"))
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, cur) = Layout.resolveManifest(fs, rootP).get
    assert(cur.size === 1, "compaction must retire the list to one segment")
    assert(fs.listStatus(cur.head)
      .count(st => st.isDirectory && st.getPath.getName.startsWith("p=")) === 4)
    assert(Layout.readManifested(spark, root).count() === 400L)
  }

  test("appendManifested is a metadata commit: old segments untouched, " +
      "the new manifest names old+new, reads see the union") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_app")
      .resolve("data").toString
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.writeManifested((0L until 300L).toDF("v"), root, targetFiles = 4)
    val (_, seg1) = Layout.resolveManifest(fs, rootP).get
    val seg1Files = fs.listStatus(seg1.head).map(_.getPath.getName).toSet
    Layout.appendManifested((300L until 350L).toDF("v"), root, targetFiles = 2)
    val (k2, seg2) = Layout.resolveManifest(fs, rootP).get
    assert(k2 === 2 && seg2.size === 2, "append = manifest naming old+new")
    assert(seg2.head === seg1.head, "the old segment rides into the new list")
    // no data rewrite: the original segment's file set is bit-for-bit the one
    // the first commit wrote
    assert(fs.listStatus(seg2.head).map(_.getPath.getName).toSet === seg1Files)
    assert(Layout.readManifested(spark, root).count() === 350L)
    // a second append accretes again; compaction retires the list
    Layout.appendManifested((350L until 400L).toDF("v"), root, targetFiles = 2)
    assert(Layout.resolveManifest(fs, rootP).get._2.size === 3)
    assert(Layout.readManifested(spark, root).count() === 400L)
    Layout.compactManifested(spark, root, 2)
    assert(Layout.resolveManifest(fs, rootP).get._2.size === 1)
    assert(Layout.readManifested(spark, root).count() === 400L)
    // layout-mismatch guard: appending a flat segment onto a flat snapshot
    // with partitionCols declared (or vice versa) fails loudly at the write
    intercept[IllegalArgumentException] {
      Layout.appendManifested(
        (0L until 10L).map(i => (i, s"p${i % 2}")).toDF("v", "p"), root, 1,
        Seq("p"))
    }
  }

  test("manifested appends + compactions vs concurrent scans: ZERO failed " +
      "reads, every read a committed prefix") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_race_append")
      .resolve("data").toString
    Layout.writeManifested((0L until 1000L).toDF("v"), root, targetFiles = 4)
    // counts a reader may legitimately observe: each committed snapshot is
    // a prefix of the append sequence (appends of 200 rows × 6, with
    // compactions interleaved — compaction never changes the count)
    val valid = (0 to 6).map(i => 1000L + 200L * i).toSet
    val results = new ConcurrentLinkedQueue[Either[String, Long]]()
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        try results.add(Right(Layout.readManifested(spark, root).count()))
        catch { case e: Exception => results.add(Left(e.toString.take(200))) }
      }
    })
    reader.setDaemon(true)
    reader.start()
    try (1 to 6).foreach { i =>
      Layout.appendManifested(
        ((1000L + 200L * (i - 1)) until (1000L + 200L * i)).toDF("v"),
        root, targetFiles = 2)
      if (i % 2 == 0) Layout.compactManifested(spark, root, 4)
    } finally { stop = true; reader.join(30000) }
    val ok = results.asScala.collect { case Right(n) => n }.toSeq
    val failed = results.asScala.collect { case Left(e) => e }.toSeq
    withClue(s"reads=${ok.size} failed=$failed") {
      assert(failed.isEmpty, "manifested reads must never fail mid-append/compaction")
      assert(ok.nonEmpty)
      assert(ok.forall(valid.contains),
        s"a read saw a non-committed state: ${ok.filterNot(valid.contains).distinct}")
    }
    assert(Layout.readManifested(spark, root).count() === 2200L)
  }

  test("manifest pointer files stay bounded: the sweep retains the newest " +
      "ManifestHistoryKeep and the dataset still resolves") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_cap")
      .resolve("data").toString
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.writeManifested((0L until 50L).toDF("v"), root, targetFiles = 1)
    // fabricate a long pointer history: m2..m70 each re-commit the SAME
    // segment (a legitimate idempotent full-replacement snapshot), so the
    // next real writer enters at current = 70 with 70 pointer files
    val (_, seg) = Layout.resolveManifest(fs, rootP).get
    val md = new org.apache.hadoop.fs.Path(root, "_manifest")
    (2 to 70).foreach { k =>
      val out = fs.create(new org.apache.hadoop.fs.Path(md, s"m$k"), false)
      try out.write(seg.head.getName.getBytes("UTF-8")) finally out.close()
    }
    Layout.appendManifested((50L until 60L).toDF("v"), root, targetFiles = 1)
    val kept = Layout.manifestVersions(fs, rootP).sorted
    assert(kept.max === 71)
    assert(kept.min >= 71 - Layout.ManifestHistoryKeep,
      s"pointer files older than the newest ${Layout.ManifestHistoryKeep} " +
        s"must be swept (min kept: ${kept.min})")
    assert(Layout.readManifested(spark, root).count() === 60L)
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

  // the CURRENT manifest's segment list (root/_manifest/m<max k>) — the
  // observable the tail-fold/tiering tests assert against
  private def manifestNames(root: String): Seq[String] = {
    val md = new org.apache.hadoop.fs.Path(root, "_manifest")
    val fs = md.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val k = fs.listStatus(md).map(_.getPath.getName)
      .collect { case n if n.matches("m\\d+") => n.drop(1).toInt }.max
    val in = fs.open(new org.apache.hadoop.fs.Path(md, s"m$k"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  test("manifested tail fold: O(accretion) fold leaves the base segment " +
      "untouched; the size-tiered step full-folds only at the ratio") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tailfold")
      .resolve("data").toString
    Layout.writeManifested((0L until 5000L).toDF("v"), root, targetFiles = 4)
    val base = manifestNames(root).head
    (0 until 3).foreach { i =>
      Layout.appendManifested(
        ((5000L + i * 10) until (5000L + (i + 1) * 10)).toDF("v"), root, 1)
    }
    assert(manifestNames(root).size === 4)
    Layout.compactManifestedTail(spark, root, 2)
    val m2 = manifestNames(root)
    assert(m2.size === 2 && m2.head === base,
      s"tail fold must commit [base, foldedTail], got $m2")
    assert(Layout.readManifested(spark, root).count() === 5030)
    // <= 2 segments: nothing to fold that isn't the base — no-op
    Layout.compactManifestedTail(spark, root, 2)
    assert(manifestNames(root) === m2)
    // tiered step, small accretion: tail fold (false), base untouched
    Layout.appendManifested((5030L until 5040L).toDF("v"), root, 1)
    assert(!Layout.compactManifestedMaybe(spark, root, 2))
    val m3 = manifestNames(root)
    assert(m3.size === 2 && m3.head === base)
    assert(Layout.readManifested(spark, root).count() === 5040)
    // tiered step, accretion past ratio x base: the full fold fires
    Layout.appendManifested((5040L until 11000L).toDF("v"), root, 2)
    assert(Layout.compactManifestedMaybe(spark, root, 2))
    assert(manifestNames(root).size === 1)
    assert(Layout.readManifested(spark, root).count() === 11000)
  }

  test("size-tiered bucketed compaction: gate holds below the byte " +
      "ratio, fires at it, and the file-count backstop forces the fold") {
    import spark.implicits._
    val tbl = "graft_tiered_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    // 200k-row base: at toy sizes parquet's fixed per-file footprint
    // (~1 KB) would dominate a 40-row append file and trip the byte
    // ratio spuriously; the gate targets real corpora where data bytes
    // dwarf footprint
    Layout.writeBucketed((0L until 200000L).toDF("k"), tbl, "k", 4)
    def files: Int = {
      val loc = graft.engine.Layout.currentTableLocation(spark, tbl)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    }
    val f0 = files
    (1 to 3).foreach { i =>
      Layout.appendBucketed(
        ((200000L * i) until (200000L * i + 40L)).toDF("k"), tbl, "k", 4)
    }
    // 40-row appends against a 200k-row base: below the byte ratio
    assert(!Layout.compactBucketedMaybe(spark, tbl, "k", 4))
    assert(files > f0, "the gate must not have folded")
    // the file-count backstop bounds listing growth regardless of bytes
    assert(Layout.compactBucketedMaybe(spark, tbl, "k", 4,
      maxFilesPerBucket = 2))
    assert(files === 4)
    assert(spark.table(tbl).count() === 200120)
    // an accretion comparable to the base fires on bytes alone
    Layout.appendBucketed((1000000L until 1200000L).toDF("k"), tbl, "k", 4)
    assert(Layout.compactBucketedMaybe(spark, tbl, "k", 4))
    assert(files === 4)
    assert(spark.table(tbl).count() === 400120)
    spark.sql(s"DROP TABLE `$tbl`")
  }

  test("appendManifested layout guard: an EMPTY first snapshot accepts " +
      "either layout; mismatches against real evidence still refuse") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_emptysnap")
      .resolve("data").toString
    // a zero-row partitioned first write leaves no col= dirs AND no
    // top-level data files — r14 inferred layout from the former alone,
    // so this legitimate partitioned append was refused (and a flat one
    // wrongly accepted)
    Layout.writeManifested(Seq.empty[(Long, String)].toDF("v", "p"),
      root, 1, Seq("p"))
    Layout.appendManifested(Seq((1L, "a"), (2L, "b")).toDF("v", "p"),
      root, 1, Seq("p"))
    assert(Layout.readManifested(spark, root).count() === 2)
    // now there IS partition evidence — a flat append must refuse
    intercept[IllegalArgumentException] {
      Layout.appendManifested(Seq((3L, "c")).toDF("v", "p"), root, 1)
    }
    // and a flat snapshot with data refuses a partitioned append
    val root2 = java.nio.file.Files.createTempDirectory("graft_flatsnap")
      .resolve("data").toString
    Layout.writeManifested(Seq((1L, "a")).toDF("v", "p"), root2, 1)
    intercept[IllegalArgumentException] {
      Layout.appendManifested(Seq((2L, "b")).toDF("v", "p"), root2, 1,
        Seq("p"))
    }
  }

  test("staged segment names embed the batch identity (not a hash); " +
      "replay is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_segident")
    val ledger = dir.resolve("ledger").toString
    val root = dir.resolve("data").toString
    def land(batchId: Long, rows: Seq[Long]): Boolean =
      graft.engine.BatchLedger.stagedLanding(spark, ledger, batchId) { st =>
        rows.toDF("v").write.mode("overwrite")
          .parquet(st.segmentInto(root))
      }
    assert(land(0, 0L until 100L))
    assert(Layout.readManifested(spark, root).count() === 100)
    // the committed name is v<k>-<batchId>-<opIndex>: two distinct
    // staged ops can never derive the same name at ANY segment count —
    // the r14 form matched a 4-byte path hash via endsWith against all
    // committed names, where one uuid8 collision deleted a new batch's
    // staged data as a "replay"
    assert(manifestNames(root) === Seq("v1-000000000000-s0"))
    // a genuine replay of the same batch is detected and lands nothing
    assert(!land(0, 0L until 100L))
    assert(Layout.readManifested(spark, root).count() === 100)
    assert(land(1, 100L until 150L))
    assert(manifestNames(root) ===
      Seq("v1-000000000000-s0", "v2-000000000001-s0"))
    assert(Layout.readManifested(spark, root).count() === 150)
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
