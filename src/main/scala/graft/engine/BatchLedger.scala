package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Micro-batch idempotency ledger for `foreachBatch` landings.
  *
  * Structured Streaming's checkpoint commits a batch AFTER the
  * `foreachBatch` body returns, so a crash inside the body replays the
  * SAME batchId on restart — the documented at-least-once boundary of
  * every plain-parquet landing in this engine. For append-only sinks a
  * replay costs duplicate rows; for the moment-state fold it would
  * DOUBLE-ADD into the totals (a corruption, not a storage tax).
  *
  * [[runOnce]] is the standard batchId-dedup recipe from the Structured
  * Streaming guide: a marker file per landed batch, checked before the
  * work runs and written after it completes. The marker write narrows
  * the duplicate window from "every replay" to "crash between the last
  * side effect and the marker".
  *
  * [[stagedLanding]] closes that last window: the batch's outputs are
  * written to a per-batch STAGING directory (no visibility), a manifest
  * of installs is recorded, and the ledger marker becomes the single
  * commit point — written BEFORE any file reaches a visible location.
  * Install then renames staged files into place; a crash at any point
  * either replays the whole batch (marker absent, staging discarded) or
  * completes the pending installs from the manifest (marker present) —
  * never both, so landings are exactly-once on any filesystem with
  * atomic rename (HDFS, local; an object store needs its committer to
  * provide the same, which is the standard S3A/manifest-committer
  * requirement, not a new one).
  *
  * The ledger MUST live inside the query's checkpoint directory: a new
  * checkpoint restarts batchIds at 0, so a ledger that outlived its
  * checkpoint would wrongly skip the fresh query's first batches.
  * Callers pass `s"$checkpointDir/graft_ledger"`.
  */
object BatchLedger {

  /** Collects the staged outputs of one batch: callers obtain target
    * directories from [[appendInto]]/[[replaceInto]] (fresh paths under
    * the staging root) and write there; nothing becomes visible until
    * install. Writers that cannot target an arbitrary path (a bucketed
    * `saveAsTable`) write wherever they must and RENAME the result onto
    * an [[appendInto]] path — see [[Layout.stageBucketedAppend]].
    */
  final class Staging private[BatchLedger] (val root: Path) {
    private[BatchLedger] val ops =
      scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    private var n = 0
    /** A fresh staging dir whose files will be MOVED INTO `destDir`
      * (recursively — partitioned layouts keep their relative paths).
      */
    def appendInto(destDir: String): String = {
      val p = new Path(root, s"a$n"); n += 1
      ops += (("A", p.toString, destDir)); p.toString
    }
    /** A fresh staging dir that will REPLACE `destDir` wholesale (the
      * read-modify-write state shape: write the next state here, the old
      * dir is swapped out at install).
      */
    def replaceInto(destDir: String): String = {
      val p = new Path(root, s"r$n"); n += 1
      ops += (("R", p.toString, destDir)); p.toString
    }
    /** A fresh staging dir whose contents will be committed as ONE new
      * SEGMENT of the manifested dataset at `rootDir` — the
      * [[Layout.appendManifested]] landing shape, with the manifest
      * pointer commit riding the ledger's install phase
      * ([[Layout.installStagedSegment]] — idempotent across every crash
      * window, so the append stays exactly-once AND zero-retry-readable).
      */
    def segmentInto(rootDir: String): String = {
      val p = new Path(root, s"s$n"); n += 1
      ops += (("M", p.toString, rootDir)); p.toString
    }
  }

  private def isData(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Move every data file under `src` into `dest`, preserving relative
    * paths. Idempotent: a file already at its destination (moved before a
    * crash) is skipped; `src` is deleted at the end.
    */
  private def installAppend(fs: FileSystem, src: Path, dest: Path): Unit = {
    if (!fs.exists(src)) return
    def walk(s: Path, d: Path): Unit =
      fs.listStatus(s).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, new Path(d, name))
        else if (isData(name)) {
          fs.mkdirs(d)
          val t = new Path(d, name)
          if (!fs.exists(t))
            require(fs.rename(st.getPath, t), s"cannot install $t")
        }
      }
    walk(src, dest)
    fs.delete(src, true)
  }

  /** Swap `src` in as the new `dest`. The intermediate `dest__replaced`
    * name makes every crash point distinguishable on recovery: src
    * present → finish the swap; src gone → only the old copy (if any)
    * remains to delete.
    */
  private def installReplace(fs: FileSystem, src: Path, dest: Path): Unit = {
    val old = new Path(dest.toString + "__replaced")
    if (fs.exists(src)) {
      if (fs.exists(dest)) {
        if (!fs.exists(old))
          require(fs.rename(dest, old), s"cannot set aside $dest")
        else fs.delete(dest, true) // aside done, install crashed mid-rename
      }
      require(fs.rename(src, dest), s"cannot install $dest")
    }
    if (fs.exists(old)) fs.delete(old, true)
  }

  private def install(fs: FileSystem, op: (String, String, String)): Unit =
    op match {
      case ("A", s, d) => installAppend(fs, new Path(s), new Path(d))
      case ("R", s, d) => installReplace(fs, new Path(s), new Path(d))
      case ("M", s, d) => Layout.installStagedSegment(fs, new Path(s), new Path(d))
      case (o, _, _) => throw new IllegalArgumentException(s"unknown op $o")
    }

  /** Stage-and-commit a batch's landings exactly once.
    *
    * Returns true when this call landed the batch, false when the batch
    * was already committed (a clean replay — any pending installs from a
    * crash after the commit point are completed first, so the caller can
    * rely on the batch being fully visible either way).
    *
    * Side effects inside `stage` MUST go through the [[Staging]] handle
    * to get the exactly-once guarantee; a direct write keeps the plain
    * [[runOnce]] at-least-once semantics (documented per call site).
    */
  def stagedLanding(spark: SparkSession, ledgerDir: String, batchId: Long)(
      stage: Staging => Unit): Boolean = {
    val dir = new Path(ledgerDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(dir, f"batch-$batchId%012d")
    val root = new Path(dir, f"staging-$batchId%012d")
    val manifest = new Path(root, "_MANIFEST")
    if (fs.exists(marker)) {
      if (fs.exists(root)) { // crashed after commit: finish the installs
        if (fs.exists(manifest)) {
          val in = fs.open(manifest)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          txt.linesIterator.filter(_.nonEmpty).foreach { line =>
            val Array(op, s, d) = line.split('\t')
            install(fs, (op, s, d))
            spark.catalog.refreshByPath(d)
          }
        }
        fs.delete(root, true)
      }
      false
    } else {
      if (fs.exists(root)) fs.delete(root, true) // crashed mid-staging
      fs.mkdirs(root)
      val st = new Staging(root)
      stage(st)
      val out = fs.create(manifest, true)
      try out.write(st.ops.map { case (o, s, d) => s"$o\t$s\t$d" }
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.create(marker, false).close() // THE commit point
      st.ops.foreach { op =>
        install(fs, op)
        // install is RENAME, not a Spark write — the session's cached
        // file listings don't see it; a stale listing here made the
        // post-landing compaction rewrite a table WITHOUT the rows the
        // install had just added
        spark.catalog.refreshByPath(op._3)
      }
      fs.delete(root, true)
      true
    }
  }

  /** Run `work` iff `batchId` has not already landed; record it after.
    * Returns true when the work ran, false when the replay was skipped.
    */
  def runOnce(spark: SparkSession, ledgerDir: String, batchId: Long)(
      work: => Unit): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, f"batch-$batchId%012d")
    if (fs.exists(marker)) false
    else {
      work
      fs.mkdirs(dir)
      fs.create(marker, false).close()
      true
    }
  }
}
