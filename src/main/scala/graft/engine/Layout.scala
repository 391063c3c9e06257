package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for repeated-join workloads: pre-bucketing big
  * fact tables on their join key so every subsequent join/aggregation on
  * that key runs WITHOUT an exchange on either side.
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and paying the shuffle exactly once at ingest: Spark's
  * bucketing metadata (`bucketBy` + `saveAsTable`) makes the scan itself
  * report hash-partitioned output, so `EnsureRequirements` inserts no
  * ShuffleExchange (asserted in PlanShapeSpec). `sortBy` additionally
  * pre-sorts each bucket file, letting SortMergeJoin skip its sorts.
  *
  * This is the engine analogue of the reference's manual
  * `PARTITION BY player_id` CSAS (all.sql:45-51) — the same
  * co-partitioning idea, but persisted in table metadata instead of a
  * repartition topic, and consumed automatically by the planner.
  */
object Layout {

  /** Persist `df` as a bucketed (and per-bucket sorted) parquet table in
    * the session catalog. Buckets should be sized so one bucket ≈ one
    * task's worth of data at the target scale.
    *
    * Idempotent across JVMs: a managed-table directory orphaned by a
    * previous session (the table is on disk but not in this catalog —
    * `mode("overwrite")` cannot see it and `saveAsTable` refuses with
    * LOCATION_ALREADY_EXISTS) is dropped before the write. The orphan
    * location is resolved against the session's CURRENT database (where
    * `saveAsTable` puts an unqualified name); qualified `db.tbl` names are
    * rejected up front — resolving their location correctly needs the
    * target database's URI, and a silently wrong path would defeat the
    * cleanup this method exists for.
    */
  /** A managed table's on-disk location in the session's CURRENT
    * database (where `saveAsTable` puts an unqualified name).
    */
  private[graft] def tableLocation(spark: SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.catalog.getDatabase(spark.catalog.currentDatabase).locationUri,
      table.toLowerCase)

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    require(!table.contains("."),
      s"writeBucketed: unqualified table name required, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // ONE file per bucket — the same range-repartition-on-bucket-id
    // shape [[compactBucketed]] rewrites into (see its inline rationale).
    // Without it every upstream task writes its own file per bucket it
    // holds (T tasks → up to T·buckets files from one build), which both
    // degrades scan listing from the first probe and breaks the
    // [[compactBucketedMaybe]] base inference (largest-file-per-bucket =
    // the last fold's output) for never-folded tables.
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val w = df
      .repartitionByRange(buckets, pmod(hash(col(key)), lit(buckets)))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Append to a bucketed table created by [[writeBucketed]] with the
    * SAME (key, buckets, sorted) spec — Spark rejects a mismatched spec,
    * so the table's bucket layout (and the exchange-free join it buys)
    * survives incremental ingest. Each append adds one file per non-empty
    * bucket; compact periodically on high-frequency ingest.
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("append").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** STAGED twin of [[appendBucketed]] for exactly-once landings
    * ([[BatchLedger.stagedLanding]]): bucket files can only be produced
    * through `saveAsTable`, so the append is written to a scratch table
    * `<table>__stage` (same key/buckets/sorted spec — its files carry the
    * same bucket-suffix names the live table's scan decodes) and
    * registered as an external append: the files become visible in the
    * live table's directory only at install, after the ledger marker.
    * The scratch CATALOG entry is dropped immediately — its directory
    * must survive until install, so the drop is catalog-only (external-
    * ize first); recovery in a fresh session needs no catalog at all,
    * just the manifest's paths.
    */
  def stageBucketedAppend(df: DataFrame, table: String, key: String,
      buckets: Int, st: BatchLedger.Staging, sorted: Boolean = true): Unit = {
    val spark = df.sparkSession
    val stage = table + "__stage"
    writeBucketed(df, stage, key, buckets, sorted)
    val src = tableLocation(spark, stage)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // move the scratch table's directory UNDER the staging root (so a
    // crashed batch's cleanup wipes it with everything else), then drop
    // the now-dirless catalog entry — DROP tolerates a missing location
    // (verified against the in-memory catalog); Spark forbids flipping
    // the entry to EXTERNAL, so the move must come first
    // install target = the live table's CATALOG location: after a
    // compactBucketed pointer swap the data dir is a versioned sibling,
    // not the name-derived default — appending into the default would
    // land files in a dead directory no scan reads
    val staged = new org.apache.hadoop.fs.Path(
      st.appendInto(currentTableLocation(spark, table).toString))
    require(fs.rename(src, staged), s"cannot stage $src")
    spark.sql(s"DROP TABLE IF EXISTS `$stage`")
  }

  /** The table's CURRENT data directory from the catalog — NOT the
    * name-derived default: after a [[compactBucketed]] pointer swap the
    * live data lives in a versioned sibling directory.
    */
  private[graft] def currentTableLocation(spark: SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)

  /** Compact a bucketed table back to ONE file per bucket. Each
    * [[appendBucketed]] adds a file per non-empty bucket, and at
    * streaming-ingest frequency that accretion degrades scan planning
    * exactly like the path-based case [[compact]] handles — this is its
    * table-form twin. The rewrite repartitions on the bucket key with the
    * bucket count (Spark's bucket id IS `pmod(murmur3, buckets)`, the
    * same hash family `repartition` uses), so every task holds exactly
    * one bucket's rows and writes exactly one file.
    *
    * The install is an ATOMIC METADATA POINTER SWAP — the move a table
    * format makes, expressed in catalog DDL: the rewrite lands in a
    * fresh versioned sibling directory (`<table>__c<k>`, scaffolded
    * under a throwaway catalog entry of that name), then ONE
    * `ALTER TABLE … SET LOCATION` repoints the live name. The previous
    * protocol (drop-then-rename) was loud-or-correct in PROSE only: a
    * managed DROP deletes the old directory file by file, so a
    * concurrent reader listing mid-delete saw a surviving SUBSET and
    * returned a silently short count (caught by CompactionRaceSpec),
    * and a listing after the directory vanished read silently empty.
    * Under the pointer swap the live name always resolves to a
    * COMPLETE directory; stale listings hold old-version file paths
    * whose deletion is DEFERRED to the next compaction's sweep, so a
    * raced reader either returns the exact pre-compaction answer or
    * fails loudly on a dead path — never a subset.
    *
    * Crash windows (each repaired by the entry sweep on rerun): after
    * the rewrite but before the swap → scaffold entry dropped with its
    * directory; after the swap but before the scaffold detach → the
    * scaffold entry shares the live directory and is detached to a husk
    * before dropping (dropping it outright would delete live data);
    * superseded directories from any earlier compaction are swept here
    * too. The `<table>__c<k>` name family is reserved for this protocol.
    */
  def compactBucketed(spark: SparkSession, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    require(!table.contains("."),
      s"compactBucketed: unqualified table name required, got '$table'")
    val cat = spark.sessionState.catalog
    if (!spark.catalog.tableExists(table)) {
      // pre-r12 drop-then-rename crash state: the only copy is parked
      // under the legacy scaffold name — install it and return
      val legacy = table + "__compacting"
      require(spark.catalog.tableExists(legacy),
        s"compactBucketed: neither $table nor $legacy exists")
      spark.sql(s"ALTER TABLE `$legacy` RENAME TO `$table`")
      return
    }
    // compaction is a LAYOUT rewrite, never a re-bucketing: the pointer
    // swap leaves the live catalog entry's bucket spec untouched, so a
    // (buckets, key, sorted) differing from the table's spec would write
    // files the catalog metadata contradicts — bucket ids the planner
    // drops silently, sorts SortMergeJoin wrongly skips. Refuse loudly;
    // re-bucketing is writeBucketed to a fresh table.
    cat.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).bucketSpec
      .foreach { spec =>
        require(spec.numBuckets == buckets &&
          spec.bucketColumnNames == Seq(key) &&
          spec.sortColumnNames == (if (sorted) Seq(key) else Nil),
          s"compactBucketed: table `$table` is bucketed as " +
            s"(${spec.numBuckets}, ${spec.bucketColumnNames.mkString(",")}" +
            s", sort=${spec.sortColumnNames.mkString(",")}) but was asked " +
            s"for ($buckets, $key, sorted=$sorted) — compaction cannot " +
            "change the bucket spec; write a new table instead")
      }
    val liveLoc = currentTableLocation(spark, table)
    val fs = liveLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def qual(p: org.apache.hadoop.fs.Path) = fs.makeQualified(p)

    // ---- entry sweep: crash leftovers + deferred deletes ----
    // the glob is a catalog-side prefilter only; the STRICT family regex
    // below decides what gets dropped — "<table>__c*" alone would match
    // (and managed-DROP would destroy) an unrelated user table named
    // e.g. `<table>__cache`
    val db = cat.getCurrentDatabase
    // the strict family: this protocol's versioned scaffolds AND the
    // pre-r12 rename protocol's `__compacting` scaffold — when the live
    // table exists, a surviving legacy scaffold is a superseded copy
    // from a pre-r12 crash (the old code dropped it at entry; without
    // this arm it would zombie forever, its data directory included)
    val familyName = s"^${java.util.regex.Pattern.quote(table.toLowerCase)
      }(__c\\d+|__compacting)$$"
    cat.listTables(db, s"${table}__c*")
      .filter(id => !cat.isTempView(id) &&
        id.table.toLowerCase.matches(familyName)).foreach { id =>
        val entryLoc =
          new org.apache.hadoop.fs.Path(cat.getTableMetadata(id).location)
        if (qual(entryLoc) == qual(liveLoc)) {
          // crashed between pointer swap and detach: the scaffold entry
          // shares the LIVE directory — repoint it at an empty husk so
          // the drop deletes nothing that matters
          val husk = new org.apache.hadoop.fs.Path(
            liveLoc.getParent, id.table + "__husk")
          fs.mkdirs(husk)
          spark.sql(s"ALTER TABLE `${id.table}` SET LOCATION '$husk'")
        }
        spark.sql(s"DROP TABLE `${id.table}`")
      }
    // superseded or partial version directories (this table's reserved
    // family: the bare default dir and __c<k> siblings) that are not the
    // live directory — the previous compaction deferred these so no
    // in-flight listing could race a file delete
    val whPath = new org.apache.hadoop.fs.Path(
      cat.getDatabaseMetadata(db).locationUri)
    val family =
      s"^${java.util.regex.Pattern.quote(table.toLowerCase)
        }(__c\\d+|__compacting)?$$"
    if (fs.exists(whPath)) fs.listStatus(whPath).foreach { st =>
      if (st.isDirectory && st.getPath.getName.matches(family) &&
        qual(st.getPath) != qual(liveLoc)) fs.delete(st.getPath, true)
    }

    // ---- rewrite into the next versioned scaffold ----
    // RANGE-repartition on the BUCKET ID (pmod(murmur3, buckets) — the
    // same function the bucket writer assigns files by): contiguous id
    // ranges keep every bucket wholly in one task (one file per bucket)
    // with a near-1:1 bucket→task spread. A hash repartition of the id
    // would re-hash it (task = murmur3(id) mod n): ~1/e of tasks empty,
    // others holding 2-3 whole buckets — lost parallelism at exactly the
    // scale compaction targets.
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val ver = "__c(\\d+)$".r.findFirstMatchIn(liveLoc.getName)
      .map(_.group(1).toInt).getOrElse(0)
    val next = s"${table}__c${ver + 1}"
    val w = spark.table(table)
      .repartitionByRange(buckets, pmod(hash(col(key)), lit(buckets)))
      .write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(next)
    val nextLoc = currentTableLocation(spark, next)

    // ---- atomic install: one catalog CAS ----
    spark.sql(s"ALTER TABLE `$table` SET LOCATION '$nextLoc'")
    // detach + drop the scaffold entry (crash between these two lines
    // leaves the shared-location state the entry sweep repairs)
    val husk = new org.apache.hadoop.fs.Path(
      nextLoc.getParent, next + "__husk")
    fs.mkdirs(husk)
    spark.sql(s"ALTER TABLE `$next` SET LOCATION '$husk'")
    spark.sql(s"DROP TABLE `$next`")
    // liveLoc (now superseded) is deliberately NOT deleted here — a
    // reader that resolved the old pointer moments ago may be listing
    // it right now; the next compaction's sweep collects it
  }

  /** Size-tiered gate for [[compactBucketed]] — the call an ingest loop
    * makes on its compaction cadence instead of folding unconditionally.
    * A fixed-cadence full fold costs O(corpus) every firing, so the
    * per-batch amortized compaction bill GROWS with the corpus (the r14
    * `compact_big_over_small` = 2.11 term); the size-tiered rule — full
    * fold only once the accreted bytes reach `ratio` × the base bytes —
    * fires inversely-proportionally often, keeping the amortized cost
    * O(1) per ingested row. Unlike the manifested datasets there is no
    * O(accretion) tail fold here: a bucketed table is ONE live
    * directory, and removing/moving files from it would violate the
    * never-mutate-a-live-listing contract the pointer-swap protocol
    * exists for — so between folds the table simply accretes one file
    * per bucket per batch, and `maxFilesPerBucket` caps the listing
    * growth by forcing the fold regardless of byte tiering.
    *
    * Base-vs-accretion split is inferred from filesystem metadata only:
    * per bucket, the LARGEST file is taken as the last fold's output
    * (fold outputs are corpus-sized, appends batch-sized — when no fold
    * has happened yet the heuristic undercounts the base, which only
    * makes the first fold fire EARLIER, never silently late). Returns
    * true when the fold fired, so benchmarks can attribute spike
    * batches.
    */
  def compactBucketedMaybe(spark: SparkSession, table: String, key: String,
      buckets: Int, ratio: Double = 0.5, maxFilesPerBucket: Int = 64,
      sorted: Boolean = true): Boolean = {
    require(ratio > 0, s"compactBucketedMaybe: ratio > 0 (got $ratio)")
    require(maxFilesPerBucket >= 2,
      s"compactBucketedMaybe: maxFilesPerBucket >= 2 (got $maxFilesPerBucket)")
    val loc = currentTableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) return false
    // Spark bucket files carry the bucket id as the _NNNNN name suffix
    // before the codec extensions; anything else in the directory is
    // not a bucket data file and does not vote
    val BucketOf = ".*_(\\d{5})\\..*".r
    val byBucket = fs.listStatus(loc)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .flatMap(st => st.getPath.getName match {
        case BucketOf(b) => Some((b.toInt, st.getLen))
        case _ => None
      })
      .groupBy(_._1)
    if (byBucket.isEmpty) return false
    val baseBytes = byBucket.values.map(_.map(_._2).max).sum
    val accreted = byBucket.values.flatten.map(_._2).sum - baseBytes
    val maxFiles = byBucket.values.map(_.length).max
    if (accreted >= ratio * baseBytes || maxFiles > maxFilesPerBucket) {
      compactBucketed(spark, table, key, buckets, sorted)
      true
    } else false
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Directory-partitioned parquet layout on low-cardinality columns
    * (date, source, cell id): reads with partition predicates prune whole
    * directories before any I/O — at 100 TB the first and cheapest lever,
    * ahead of row-group statistics and bucketing. Keep partition
    * cardinality in the 10²-10⁴ range; higher explodes file counts.
    *
    * Rows are hash-repartitioned on the partition columns FIRST, so each
    * directory receives its rows from a bounded number of tasks instead of
    * one file per upstream task — without it a P-partition write under T
    * tasks lands up to P·T small files, and the resulting listing/open
    * cost dominates every later scan (measured: the 100× IVF index wrote
    * 51k files for 1.7k cells; scan planning alone ran tens of seconds per
    * query).
    *
    * `filesPerDir` caps the OTHER failure mode: with a pure key
    * repartition every partition key flows through exactly one task, so a
    * skewed or low-cardinality key serializes its whole directory into one
    * task and one arbitrarily large file. Values > 1 add a deterministic
    * salt (hash of the non-partition columns, mod `filesPerDir`) to the
    * repartition key, splitting each directory across up to `filesPerDir`
    * tasks/files. The default of 1 keeps the exact one-file-per-directory
    * layout the IVF index wants (its cells are size-capped by
    * construction); callers partitioning on organic keys (date, source)
    * should pass the parallelism they want per directory.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    writePartitionedN(df, path, 1, cols: _*)

  def writePartitionedN(df: DataFrame, path: String, filesPerDir: Int,
      cols: String*): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val keys = cols.map(col)
    val rep =
      if (filesPerDir <= 1) df.repartition(keys: _*)
      else {
        // salt on the data columns (deterministic — a rand() salt can
        // duplicate/drop rows under stage retry), never on the partition
        // columns alone (constant within a key, so it would not split)
        val dataCols = df.columns.filterNot(cols.contains).map(col)
        val salt = pmod(hash(dataCols: _*), lit(filesPerDir))
        df.repartition(keys :+ salt: _*)
      }
    rep.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet dataset into `targetFiles`
    * evenly-sized files (per partition directory when `partitionCols` is
    * set), then swap it into place. Streaming ingest (micro-batch appends)
    * accretes file counts that degrade scan planning and shuffle fan-in at
    * 100 TB; periodic compaction is the standard fix. The rewrite lands in
    * a sibling directory and replaces the original with two renames — a
    * reader overlapping the swap window can fail loudly and must retry
    * ([[writeManifested]]/[[compactManifested]] are the zero-retry form:
    * prefer them for any dataset a standing loop compacts; this plain
    * form remains for datasets whose PATH is the interface) — never
    * partially-overwritten, and rerun-safe: a leftover `__precompact` from
    * a crash mid-swap is restored (it holds the only copy when the second
    * rename never ran) or discarded (the install completed), and a
    * leftover `__compacting` is always discarded — otherwise `fs.rename`
    * would move the new data INSIDE the stale directory
    * (rename-into-existing-dir semantics) instead of failing.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int,
      partitionCols: Seq[String] = Nil): Unit = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__precompact")
    // recover from a prior crashed run before touching anything
    if (fs.exists(old)) {
      if (!fs.exists(hadoopPath))
        // crashed between the two renames: old IS the dataset — restore it
        require(fs.rename(old, hadoopPath),
          s"compact: cannot restore $old to $path")
      else
        // crashed after install, before cleanup: old is the superseded copy
        fs.delete(old, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true) // incomplete rewrite, discard
    // a FileStreamSink output is read through its _spark_metadata commit
    // log; a directory swap would orphan every logged file (readers see
    // only post-compact appends) — sink compaction needs a log rewrite,
    // which is table-format territory. Refuse loudly.
    require(
      !fs.exists(new org.apache.hadoop.fs.Path(hadoopPath, "_spark_metadata")),
      s"compact: $path is a FileStreamSink output (_spark_metadata); " +
        "swapping directories would orphan the logged files — compact the " +
        "downstream copy, not the sink")
    // a partitioned dataset rewritten without partitionBy silently loses
    // its directory layout (and with it, partition pruning) — refuse
    // unless the caller re-declares the partitioning
    val looksPartitioned = fs.listStatus(hadoopPath)
      .exists(st => st.isDirectory && st.getPath.getName.contains("="))
    require(!looksPartitioned || partitionCols.nonEmpty,
      s"compact: $path is partitioned; pass partitionCols to preserve layout")
    // rewrite shape shared with the manifested twin — see
    // [[compactionLayout]] for the salted-range rationale
    val in = spark.read.parquet(path)
    val rep = compactionLayout(in, targetFiles, partitionCols)
    val w = rep.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    require(fs.rename(hadoopPath, old), s"compact: cannot move $path aside")
    if (!fs.rename(tmp, hadoopPath)) {
      // restore the original before surfacing the failure — never leave
      // the dataset path empty
      fs.rename(old, hadoopPath)
      throw new IllegalStateException(
        s"compact: cannot install $tmp at $path; original restored")
    }
    fs.delete(old, true)
  }

  // ------------------------------------------------------------------ //
  // Manifested datasets: a minimal snapshot pointer for path layouts    //
  // ------------------------------------------------------------------ //

  /** Manifested parquet dataset: data lives in versioned SEGMENT
    * subdirectories `<root>/v<k>-<uuid8>`; one tiny pointer file
    * `<root>/_manifest/m<k>` — its content a newline-separated LIST of
    * the segment directory names that make up the snapshot — marks each
    * committed version, and readers resolve the HIGHEST manifest. This
    * is the minimal table-format move — Delta's `_delta_log` / Iceberg's
    * manifest list reduced to one indirection file — without adopting a
    * format wholesale.
    *
    * The list is what makes APPEND a metadata commit ([[appendManifested]]):
    * an ingest batch writes ONLY its own new segment directory and
    * commits a manifest naming old segments + the new one — no data
    * rewrite, O(batch) I/O per landing. [[compactManifested]] is then a
    * manifest swap in the other direction: rewrite the union into one
    * segment and commit a one-line manifest that retires the old list.
    *
    * What it closes over [[compact]]'s rename swap: live data is NEVER
    * renamed or deleted in place. A writer builds complete new segment
    * directories first, then commits with a single `fs.rename(tmp,
    * m<k+1>)` to a fresh name — atomic on every Hadoop filesystem
    * (rename-to-nonexistent), so a reader either resolves the old
    * snapshot or the new one, both complete. Superseded segments are
    * swept with a TWO-INSTALL deferral (a segment dies only once neither
    * of the last two committed manifests names it), so a reader that
    * resolved `m<j>` keeps every directory in its list intact through
    * the entire next install — CompactionRaceSpec's manifested hammers
    * (compaction AND append) assert ZERO failed reads, not
    * loud-or-correct-with-retry.
    *
    * Crash windows: before the pointer rename → the orphan segment
    * directory and manifest tmp are swept by a later writer (a version
    * dir no kept manifest names is by definition dead); after it → the
    * install is complete. Concurrent WRITERS are not supported
    * (single-writer discipline, as everywhere in Layout), and a lost
    * race cannot corrupt: each writer builds its own UUID-SUFFIXED
    * segment directory (`v<k>-<uuid8>` — the manifest content, not the
    * name pattern, is what readers resolve), so two racers for version
    * k+1 write disjoint directories and the loser fails loudly at the
    * pointer rename. The entry sweep only ever touches version numbers
    * ≤ the sweeping writer's OWN current version — a racer's in-flight
    * `v<current+1>-…` build is never deleted by the other racer's entry
    * (the r13 sweep deleted any unreferenced version number, which could
    * destroy a directory the race WINNER was about to commit); a loser's
    * orphan is collected one install later, once current has advanced
    * past it.
    *
    * Manifest pointer files are bytes-tiny but the listing must stay
    * bounded at ingest frequency: the sweep retains the newest
    * [[ManifestHistoryKeep]] pointers (far more than the two the reader
    * guarantee needs) and deletes older ones.
    *
    * At 100 TB the same protocol holds on an object store with a
    * rename-capable metadata layer (HDFS, or S3 behind a consistent
    * pointer service); segment directories keep listing cost O(segments
    * since last compaction), and per-FILE lists inside each segment line
    * would be the next step if directory listing itself became the
    * bottleneck.
    */
  private def manifestDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_manifest")
  private val ManifestName = "^m(\\d+)$".r
  // both the r13.0 bare form (v3) and the uuid-suffixed form (v3-1a2b3c4d)
  // suffix alphabet covers both segment-name families: random uuid8
  // ([[writeSegment]]) and the staging-identity form
  // ([[installStagedSegment]], `v<k>-<batchId>-s<n>`) — a staged name
  // outside this pattern would never be swept once superseded
  private val VersionName = "^v(\\d+)(?:-[0-9A-Za-z_-]+)?$".r

  /** Newest-first retained manifest pointers per dataset. Two is what the
    * reader guarantee needs; the rest is recent history for forensics.
    */
  private[graft] val ManifestHistoryKeep = 64

  /** The segment directory names manifest `m<k>` commits (oldest first —
    * append order; a one-line manifest is a full-replacement snapshot,
    * which also keeps every r13-era pointer readable).
    */
  private def readManifestNames(fs: org.apache.hadoop.fs.FileSystem,
      md: org.apache.hadoop.fs.Path, k: Int): Seq[String] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(md, s"m$k"))
    val txt = try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    txt.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private[graft] def manifestVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Array[Int] = {
    val md = manifestDir(root)
    if (!fs.exists(md)) Array.empty
    else fs.listStatus(md).flatMap(_.getPath.getName match {
      case ManifestName(k) => Some(k.toInt)
      case _ => None
    })
  }

  /** (version, segment directories) of the current committed snapshot. */
  private[graft] def resolveManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[(Int, Seq[org.apache.hadoop.fs.Path])] = {
    val versions = manifestVersions(fs, root)
    if (versions.isEmpty) None
    else {
      val k = versions.max
      Some((k, readManifestNames(fs, manifestDir(root), k)
        .map(new org.apache.hadoop.fs.Path(root, _))))
    }
  }

  /** Commit point: write the pointer under a tmp name, rename to the
    * fresh `m<k>` — rename-to-nonexistent is the one atomic primitive
    * every Hadoop FS guarantees. A failed rename means another writer
    * committed this version first: fail loudly (single-writer contract).
    */
  private def installManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, k: Int, dirNames: Seq[String]): Unit = {
    val md = manifestDir(root)
    fs.mkdirs(md)
    val tmp = new org.apache.hadoop.fs.Path(md,
      s".tmp-m$k-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(dirNames.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(md, s"m$k")
    require(fs.rename(tmp, dst),
      s"installManifest: lost the commit race for $dst — concurrent " +
        "writers are not supported on a manifested dataset")
  }

  /** Entry sweep for a writer about to build version `current + 1`:
    * every version-family directory with version number ≤ `current` that
    * neither of the last two COMMITTED manifests (`m<current>`,
    * `m<current-1>`) names is deleted — that covers uncommitted orphans
    * (crashed or race-losing writers' never-pointed-to builds) and
    * superseded segments two installs old (nothing can still resolve
    * them; keeping everything the last two manifests name IS the
    * zero-retry reader guarantee). The `≤ current` bound is load-bearing
    * for the single-corruption race that survived r13: a concurrent
    * racer's IN-FLIGHT `v<current+1>-…` build is unreferenced by any
    * manifest while it is being written, and sweeping it would let that
    * racer's subsequent pointer rename commit a deleted directory; bound
    * the sweep and a winner's directory is untouchable, while a loser's
    * orphan is collected one install later once current has advanced.
    * Crashed manifest tmps go too, and pointer files older than the
    * newest [[ManifestHistoryKeep]] are deleted so the `_manifest`
    * listing stays bounded at ingest frequency.
    */
  private def sweepVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, current: Int): Unit = {
    val md = manifestDir(root)
    val keep: Set[String] = Seq(current, current - 1)
      .filter(k => k >= 1 &&
        fs.exists(new org.apache.hadoop.fs.Path(md, s"m$k")))
      .flatMap(k => readManifestNames(fs, md, k)).toSet
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case n @ VersionName(k) if st.isDirectory && k.toInt <= current &&
            !keep.contains(n) =>
          fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    if (fs.exists(md)) fs.listStatus(md).foreach { st =>
      st.getPath.getName match {
        case n if n.startsWith(".tmp-") => fs.delete(st.getPath, false)
        case ManifestName(k) if k.toInt <= current - ManifestHistoryKeep =>
          fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  /** The shared rewrite-shape: `targetFiles` even files, or per-directory
    * salted range partitioning when the layout is partitioned (see
    * [[compact]]'s inline rationale — this is that logic, factored).
    */
  private def compactionLayout(in: DataFrame, targetFiles: Int,
      partitionCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    if (partitionCols.nonEmpty) {
      val dataCols = in.columns.filterNot(partitionCols.contains).map(col)
      val keys = partitionCols.map(col)
      val n = in.sparkSession.sessionState.conf.numShufflePartitions
      if (dataCols.isEmpty) in.repartition(keys: _*)
      else in.repartitionByRange(n,
        keys :+ pmod(hash(dataCols: _*), lit(targetFiles)): _*)
    } else in.repartition(targetFiles)
  }

  /** Write one complete segment directory for version `next` and return
    * its name (NOT yet committed — the caller's [[installManifest]] is
    * the commit point). The uuid suffix keeps two racers for the same
    * `next` in DISJOINT directories: the loser's pointer rename fails
    * loudly and its orphan is swept once current advances past it, but
    * it can never overwrite a directory a committed pointer references.
    */
  private def writeSegment(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, next: Int, in: DataFrame,
      targetFiles: Int, partitionCols: Seq[String]): String = {
    val name = s"v$next-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = new org.apache.hadoop.fs.Path(root, name)
    val w = compactionLayout(in, targetFiles, partitionCols)
      .write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir.toString)
    name
  }

  /** True when any committed segment carries a `col=value` partition
    * layout — the guard input for the silently-flattened-layout check.
    */
  private def anyPartitioned(fs: org.apache.hadoop.fs.FileSystem,
      dirs: Seq[org.apache.hadoop.fs.Path]): Boolean =
    dirs.exists(d => fs.exists(d) && fs.listStatus(d)
      .exists(st => st.isDirectory && st.getPath.getName.contains("=")))

  /** True when any committed segment holds a TOP-LEVEL data file — the
    * flat-layout evidence twin of [[anyPartitioned]] (a partitioned
    * segment's files live under `col=` subdirectories). A snapshot with
    * neither is EMPTY (a zero-row partitioned write emits no dirs and no
    * files; a zero-row flat write still emits part files, so it reads as
    * flat) and constrains nothing — ADVICE r14: inferring layout from
    * `anyPartitioned == partitionCols.nonEmpty` alone rejected a
    * legitimate partitioned append onto an empty partitioned first write
    * and accepted a flat one.
    */
  private def anyFlatData(fs: org.apache.hadoop.fs.FileSystem,
      dirs: Seq[org.apache.hadoop.fs.Path]): Boolean =
    dirs.exists(d => fs.exists(d) && fs.listStatus(d)
      .exists(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")))

  /** Write `df` as a new snapshot of the manifested dataset at `root`
    * (creating it when absent). Each call is a full replacement commit;
    * continuous ingest should use [[appendManifested]] instead.
    */
  def writeManifested(df: DataFrame, root: String, targetFiles: Int,
      partitionCols: Seq[String] = Nil): Unit = {
    require(targetFiles >= 1,
      s"writeManifested: targetFiles >= 1 (got $targetFiles)")
    val spark = df.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = resolveManifest(fs, rootP).map(_._1).getOrElse(0)
    sweepVersions(fs, rootP, cur)
    val name = writeSegment(fs, rootP, cur + 1, df, targetFiles,
      partitionCols)
    installManifest(fs, rootP, cur + 1, Seq(name))
  }

  /** APPEND `df` to the manifested dataset at `root` as a metadata
    * commit: only the batch's own segment directory is written, and the
    * new manifest names the old segments plus the new one — no data
    * rewrite, O(batch) I/O per landing. This is the incremental-ingest
    * form 100 TB demands (a full-replacement commit per batch rewrites
    * the corpus every time); accreted segments are repaid periodically by
    * [[compactManifested]], which folds the list back to one directory.
    * Creates the dataset when absent (= [[writeManifested]]).
    */
  def appendManifested(df: DataFrame, root: String, targetFiles: Int,
      partitionCols: Seq[String] = Nil): Unit = {
    require(targetFiles >= 1,
      s"appendManifested: targetFiles >= 1 (got $targetFiles)")
    val spark = df.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    resolveManifest(fs, rootP) match {
      case None => writeManifested(df, root, targetFiles, partitionCols)
      case Some((cur, dirs)) =>
        // appending a flat segment onto a partitioned snapshot (or the
        // reverse) would fail only at read time, far from the bug —
        // enforce layout agreement at the write. Each direction checks
        // its own POSITIVE evidence ([[anyFlatData]]): an empty snapshot
        // carries neither and accepts either layout
        require(!(anyPartitioned(fs, dirs) && partitionCols.isEmpty),
          "appendManifested: the committed snapshot at " + root +
            " is partitioned; pass partitionCols to append to it")
        require(!(anyFlatData(fs, dirs) && partitionCols.nonEmpty),
          "appendManifested: the committed snapshot at " + root +
            " is flat; a partitioned append would diverge the layout")
        sweepVersions(fs, rootP, cur)
        val name = writeSegment(fs, rootP, cur + 1, df, targetFiles,
          partitionCols)
        installManifest(fs, rootP, cur + 1,
          dirs.map(_.getName) :+ name)
    }
  }

  /** Idempotent install of a ledger-staged segment as an append commit
    * ([[BatchLedger.Staging.segmentInto]]): move the staged directory
    * under `root` as the next version's segment and commit a manifest
    * naming old segments + new. Replay-safe across every crash window
    * because the segment name is DERIVED from the staging path, not
    * random: a crash between the data rename and the pointer rename
    * replays with the staged dir gone but the named segment present —
    * the manifest commit completes; a replay after the pointer committed
    * finds the segment already named and does nothing. (Random names
    * would re-install a second copy of the batch on exactly that window,
    * which is the duplicate the ledger exists to prevent.)
    *
    * The derived name embeds the staging IDENTITY verbatim — ledger
    * batch id + op index, `…/staging-000000000042/s3` →
    * `v<k>-000000000042-s3` — and the replay check compares each
    * committed name's whole post-version component for equality. The
    * r14 form hashed the path to 4 MD5 bytes and matched with
    * `endsWith` over ALL committed names, so a compaction segment's
    * random uuid8 colliding with the hash (~n_segments/2^32 per append)
    * made a brand-new batch look already-committed and silently deleted
    * its staged data. Identity, not hash: two distinct staged ops can
    * never derive the same name, at any segment count (ADVICE r14).
    */
  private[engine] def installStagedSegment(
      fs: org.apache.hadoop.fs.FileSystem, src: org.apache.hadoop.fs.Path,
      root: org.apache.hadoop.fs.Path): Unit = {
    val cur = resolveManifest(fs, root)
    val k = cur.map(_._1).getOrElse(0)
    val curNames = cur.map(_._2.map(_.getName)).getOrElse(Seq.empty)
    val suffix = (Option(src.getParent).map(_.getName).getOrElse("") +
      "-" + src.getName)
      .stripPrefix("staging-")
      .map(c => if (c.isLetterOrDigit || c == '-' || c == '_') c else '_')
    if (curNames.exists(_.matches(
        "^v\\d+-" + java.util.regex.Pattern.quote(suffix) + "$"))) {
      // committed on a previous attempt — the replay only cleans up
      fs.delete(src, true)
      return
    }
    val name = s"v${k + 1}-$suffix"
    val dst = new org.apache.hadoop.fs.Path(root, name)
    if (fs.exists(src)) {
      fs.mkdirs(root)
      require(fs.rename(src, dst),
        s"installStagedSegment: cannot install $dst")
    }
    require(fs.exists(dst),
      s"installStagedSegment: staged segment $src neither present nor " +
        s"already installed at $dst")
    installManifest(fs, root, k + 1, curNames :+ name)
  }

  /** Read the current snapshot (the union of its committed segments).
    * Every directory in the resolved list stays intact through the
    * ENTIRE NEXT install or compaction (two-install sweep deferral) — no
    * retry contract, unlike the plain-path twins. A lazy handle held
    * across TWO subsequent installs outlives the guarantee and must
    * re-resolve.
    */
  def readManifested(spark: SparkSession, root: String): DataFrame = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, dirs) = resolveManifest(fs, rootP).getOrElse(
      throw new IllegalArgumentException(
        s"readManifested: no committed manifest under $root"))
    spark.read.parquet(dirs.map(_.toString): _*)
  }

  /** [[compact]] for a manifested dataset: rewrite the current snapshot
    * (all committed segments) into `targetFiles` even files and commit a
    * ONE-SEGMENT manifest that retires the old list — the zero-retry
    * form of small-file compaction, and the periodic repayment of
    * [[appendManifested]]'s segment accretion.
    */
  def compactManifested(spark: SparkSession, root: String, targetFiles: Int,
      partitionCols: Seq[String] = Nil): Unit = {
    require(targetFiles >= 1,
      s"compactManifested: targetFiles >= 1 (got $targetFiles)")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (cur, dirs) = resolveManifest(fs, rootP).getOrElse(
      throw new IllegalArgumentException(
        s"compactManifested: no committed manifest under $root"))
    // same guard as [[compact]]: rewriting a partitioned snapshot without
    // re-declaring partitionCols would silently flatten the layout (and
    // with it, partition pruning) while preserving content
    require(!anyPartitioned(fs, dirs) || partitionCols.nonEmpty,
      s"compactManifested: the current snapshot at $root is partitioned; " +
        "pass partitionCols to preserve the layout")
    sweepVersions(fs, rootP, cur)
    val name = writeSegment(fs, rootP, cur + 1,
      spark.read.parquet(dirs.map(_.toString): _*), targetFiles,
      partitionCols)
    installManifest(fs, rootP, cur + 1, Seq(name))
  }

  /** TAIL compaction for a manifested dataset: fold only the ACCRETED
    * segments — everything after the base (first) segment — into one
    * new segment and commit `[base, foldedTail]`. I/O is O(accretion),
    * NOT O(corpus): this is the cadence repayment of
    * [[appendManifested]] that stays O(batch-window) no matter how big
    * the base grows, which a fixed-cadence [[compactManifested]] cannot
    * do (its every-fold cost is the whole corpus — the r14
    * `compact_big_over_small` = 2.11 term). The base itself is repaid
    * by [[compactManifestedMaybe]]'s size-tiered full fold. Safe under
    * the same manifest-pointer protocol as every other install:
    * segments are immutable, the commit is one pointer rename, and
    * zero-retry readers keep the two-install guarantee. No-op when the
    * snapshot has ≤ 2 segments (nothing to fold that isn't the base).
    */
  def compactManifestedTail(spark: SparkSession, root: String,
      targetFiles: Int, partitionCols: Seq[String] = Nil): Unit = {
    require(targetFiles >= 1,
      s"compactManifestedTail: targetFiles >= 1 (got $targetFiles)")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (cur, dirs) = resolveManifest(fs, rootP).getOrElse(
      throw new IllegalArgumentException(
        s"compactManifestedTail: no committed manifest under $root"))
    if (dirs.size <= 2) return
    require(!anyPartitioned(fs, dirs) || partitionCols.nonEmpty,
      s"compactManifestedTail: the current snapshot at $root is " +
        "partitioned; pass partitionCols to preserve the layout")
    sweepVersions(fs, rootP, cur)
    val name = writeSegment(fs, rootP, cur + 1,
      spark.read.parquet(dirs.tail.map(_.toString): _*), targetFiles,
      partitionCols)
    installManifest(fs, rootP, cur + 1, Seq(dirs.head.getName, name))
  }

  /** Size-tiered compaction step for a manifested dataset — the ONE
    * call an ingest loop makes on its compaction cadence. Policy (the
    * LSM/size-tiered rule, which keeps amortized compaction cost O(1)
    * per ingested row): when the accreted tail has grown to
    * `ratio` × the base segment's bytes, pay the FULL fold
    * ([[compactManifested]] — O(corpus), but fired inversely-
    * proportionally often, so the amortized cost per row is constant);
    * otherwise pay only the O(accretion) tail fold
    * ([[compactManifestedTail]]). Between full folds a reader unions at
    * most 2 + batches-per-cadence segments and at most (1 + ratio) × the
    * base's bytes — the read-amplification trade, priced in SCALE.md.
    * Returns true when the full fold fired (benchmarks attribute spikes
    * with it). Byte sizes come from filesystem metadata (one
    * `getContentSummary` per segment — no data I/O in the decision).
    */
  def compactManifestedMaybe(spark: SparkSession, root: String,
      targetFiles: Int, partitionCols: Seq[String] = Nil,
      ratio: Double = 0.5): Boolean = {
    require(ratio > 0, s"compactManifestedMaybe: ratio > 0 (got $ratio)")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, dirs) = resolveManifest(fs, rootP).getOrElse(return false)
    if (dirs.size <= 1) return false
    val sizes = dirs.map(d => fs.getContentSummary(d).getLength)
    if (sizes.tail.sum >= ratio * sizes.head) {
      compactManifested(spark, root, targetFiles, partitionCols)
      true
    } else {
      compactManifestedTail(spark, root, targetFiles, partitionCols)
      false
    }
  }

  /** Morton (Z-order) value: interleave the low `bits` bits of two
    * integer columns — bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Rows close in z-value are close in BOTH dimensions, which
    * is what makes [[zorderWrite]] prune on either column. Pure
    * codegen'd built-ins (shifts/masks/adds folded into one projection);
    * inputs are masked to their low `bits` two's-complement bits
    * (arithmetic shift + `& 1` — the identical extraction DuckDB's
    * `(x >> i) & 1` performs, so the SQL replay agrees even on negative
    * inputs), so callers whose domain exceeds 2^`bits` should scale or
    * bucket first (interleaving only the low bits of a wider domain
    * destroys locality — the same contract as Delta's OPTIMIZE ZORDER,
    * which range-buckets first).
    */
  def zvalue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"zvalue: need 1 <= bits <= 31 (got $bits)")
    import org.apache.spark.sql.functions.{shiftleft, shiftright}
    val al = a.cast("long"); val bl = b.cast("long")
    // & 1, NOT % 2: remainder sign-extends on negative inputs (-1 bits),
    // a mask extracts the two's-complement bit like the SQL replay does
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order clustered write: lay `df` out in `targetFiles` parquet files
    * range-partitioned AND sorted by [[zvalue]] of two columns, so each
    * file (and each row group inside it) covers a small rectangle of the
    * (a, b) plane — parquet min/max stats on BOTH columns become tight,
    * and a scan with a predicate on either column (or a 2-d rectangle)
    * skips most row groups at the reader. This is the multi-column
    * pruning lever directory partitioning can't give: partitioning prunes
    * on ONE hierarchy; z-order trades perfect single-column pruning for
    * good pruning on both (the Delta/Iceberg OPTIMIZE ZORDER idea,
    * expressed as a plain repartitionByRange + sortWithinPartitions —
    * no table format needed).
    *
    * The z value is a transient partitioning/sort EXPRESSION — it is
    * only passed to repartitionByRange/sortWithinPartitions and never
    * becomes a column of the written data (it is derivable, and
    * persisting it would change the schema contract). Range boundaries
    * come from Spark's reservoir sample, so FILE boundaries may vary
    * across runs while content never does — consumers must not depend on
    * file identity (same contract as every layout helper here).
    */
  def zorderWrite(df: DataFrame, path: String, targetFiles: Int,
      colA: String, colB: String, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    require(targetFiles >= 1, s"zorderWrite: targetFiles >= 1 (got $targetFiles)")
    val z = zvalue(col(colA), col(colB), bits)
    df.repartitionByRange(targetFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
