package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * A minimal transactional table layout (round 16, hardened round 17) —
 * the sidecar machinery composed into snapshot-isolated commits, so a
 * mutating 100 TB table gets ATOMIC merge-on-read upserts instead of
 * choosing between [[ParquetIO.upsert]]'s copy-on-write generations
 * (rewrite ∝ table) and raw [[DeleteVectors]] epochs (no atomicity
 * across the delete-then-append pair a CDC batch needs).
 *
 * Layout, all under one root, all object-store safe (create-once
 * markers only — no rename, no pointer, no listing-freshness
 * assumption; the [[Streams]] generation-lifecycle contract):
 *
 * {{{
 *   <root>/data/c<k>/part-….parquet   commit k's added rows (optional)
 *   <root>/_txn/dv/<k>/part-….parquet commit k's deletion vectors (optional)
 *   <root>/_txn/claims/c<k>           id claim (marker EXISTENCE, pre-write)
 *   <root>/_txn/commits/c<k>          the commit bit (marker EXISTENCE)
 * }}}
 *
 * Concurrency contract (round 17): every writer CLAIMS its id first —
 * a create-once marker under `_txn/claims` placed BEFORE any data or
 * vector write. Two racing writers that compute the same next id
 * cannot both claim it: the loser's create-once returns false and it
 * retries with a fresh id having written NOTHING under the contested
 * one, so `mode("overwrite")` can never clobber another writer's
 * directories. Commit-marker creation is likewise REQUIRED to succeed
 * — a pre-existing commit marker for a claimed id means out-of-band
 * interference and fails the operation loudly rather than reporting a
 * commit that may not be this writer's. What the protocol guarantees:
 * no committed data is ever lost or clobbered, and every commit id is
 * written by exactly one writer. What it does NOT provide: key-level
 * conflict detection — two CONCURRENT upserts touching the same key
 * both commit (each kills what was live when IT read), so serializable
 * MERGE semantics still assume one upserting writer per key space (the
 * CDC-stream premise); maintenance ([[checkpoint]], [[compactFiles]],
 * [[expire]], [[vacuum]]) assumes a single maintenance writer.
 *
 * A commit is convention, not manifest: marker c<k> present ⟺ commit
 * k's data dir and DV dir (whichever exist) are visible — readers need
 * ONE `_txn/commits` listing, never a JSON parse. A writer works
 * data-first: rows into `data/c<k>`, vectors into `_txn/dv/<k>`, and
 * only then the marker — a crash at any earlier point leaves
 * directories no reader resolves and [[vacuum]] later sweeps. The
 * delete-then-append pair of an upsert therefore becomes visible
 * ATOMICALLY: both ride the same k, both appear at marker creation or
 * not at all.
 *
 * Reads: the snapshot is (∪ committed data dirs) scanned once with row
 * identity, minus the OR-fold of ALL committed DV dirs (one broadcast,
 * the O(1) codegen'd bit test — [[DeleteVectors.applyVectors]]).
 * Commits written under DIFFERENT schemas reconcile by name at read
 * time (missing columns null — the [[ParquetIO.merge]] S13 contract,
 * oldest commit's columns first); the uniform-schema fast path stays
 * one multi-dir scan with pushdown intact. [[readAt]] is time travel
 * for free: resolve markers ≤ k only, and a later commit's deletes
 * vanish WITH its adds, keeping historical snapshots exact.
 *
 * [[upsert]] is the merge-on-read MERGE with the full latest-wins
 * contract of [[ParquetIO.upsert]]: latest `versionCol` per key inside
 * the batch, then the batch winner competes against the LIVE row —
 * a live row dies only to a batch winner at `version >= live.version`
 * (batch wins ties, the update-side-wins rule), and a batch winner
 * that loses to a strictly newer live row is dropped entirely, so a
 * late/out-of-order CDC batch can never regress committed data.
 * Cost: one table scan + work ∝ BATCH size — no generation rewrite.
 * The batch key set broadcasts below `broadcastKeyLimit` keys and
 * falls back to a shuffled join above it (a backfill is not a CDC
 * batch). At 0.1 %-of-table batches this is the regime where
 * copy-on-write pays 1000× the write volume (SCALE.md round-16
 * `delvec`).
 */
object TxTable {

  private def dataDir(root: String, k: Long) = s"$root/data/c$k"
  private def dvDir(root: String, k: Long) = s"$root/_txn/dv/$k"
  private def commitsDir(root: String) = s"$root/_txn/commits"
  private def claimsDir(root: String) = s"$root/_txn/claims"
  private def checkpointsDir(root: String) = s"$root/_txn/checkpoints"
  private def marker(root: String, k: Long) = s"${commitsDir(root)}/c$k"

  private def markerIds(dir: String): Seq[Long] = {
    if (!Fs.isDirectory(dir)) return Seq.empty
    Fs.listFiles(dir)
      .map(_.getPath.getName)
      .filter(_.matches("c\\d+"))
      .map(_.stripPrefix("c").toLong)
      .sorted
  }

  /** Committed ids, ascending — one listing of the commits dir. */
  def committedIds(root: String): Seq[Long] = markerIds(commitsDir(root))

  /** Committed CHECKPOINT ids: both the checkpoint marker and the
    * commit marker exist (a checkpoint marker alone is a crashed
    * writer's leftover and resolves to nothing). */
  def checkpointIds(root: String): Seq[Long] = {
    val committed = committedIds(root).toSet
    markerIds(checkpointsDir(root)).filter(committed.contains)
  }

  /** Next free id: past every id any directory or marker — commit,
    * claim, or checkpoint; committed or crashed — has touched, so a
    * crashed or in-flight writer's id is never reused and its leftovers
    * can never be adopted by a later commit. */
  private def nextId(root: String): Long = {
    def ids(dir: String, prefix: String): Seq[Long] =
      if (!Fs.isDirectory(dir)) Seq.empty
      else Fs.listDirs(dir).map(_.getPath.getName)
        .filter(n => n.startsWith(prefix) && n.drop(prefix.length).forall(_.isDigit))
        .map(_.drop(prefix.length).toLong)
    (committedIds(root) ++ markerIds(claimsDir(root)) ++
      markerIds(checkpointsDir(root)) ++ ids(s"$root/data", "c") ++
      ids(s"$root/_txn/dv", "") :+ -1L).max + 1
  }

  /** Claim a commit id EXCLUSIVELY, before any write: a create-once
    * marker under `_txn/claims`. A writer that loses the create race
    * (two writers computed the same next id) retries with a fresh id —
    * having written nothing under the contested one, so the winner's
    * directories are never overwritten. The claim marker is litter
    * after a crash; [[vacuum]] sweeps unredeemed claims below the tip. */
  private def claimId(root: String): Long = {
    var attempts = 0
    while (attempts < 64) {
      val k = nextId(root)
      if (Fs.createMarker(s"${claimsDir(root)}/c$k", "claimed")) return k
      attempts += 1
    }
    throw new IllegalStateException(
      s"txtable: could not claim a commit id under $root after 64 attempts")
  }

  /** The commit bit, REQUIRED to be this writer's: under the claim
    * protocol nobody else can be on a claimed id, so a pre-existing
    * commit marker means out-of-band interference — fail the operation
    * loudly instead of reporting an id whose contents may not be ours. */
  private[graft] def commit(root: String, k: Long): Unit =
    require(Fs.createMarker(marker(root, k), dataDir(root, k)),
      s"txtable: commit marker c$k already exists under $root — " +
        "lost a commit race (id written outside the claim protocol?)")

  private def existingDataDirs(root: String, ks: Seq[Long]): Seq[String] =
    ks.map(dataDir(root, _)).filter(Fs.isDirectory(_))
  private def existingDvDirs(root: String, ks: Seq[Long]): Seq[String] =
    ks.map(dvDir(root, _)).filter(Fs.isDirectory(_))

  /** The resolution set: commit ids a reader at `asOf` resolves —
    * newest committed checkpoint ≤ asOf, plus the tail after it. */
  private def resolvedIds(root: String, asOf: Long = Long.MaxValue): Seq[Long] = {
    val all = committedIds(root).filter(_ <= asOf)
    val base = checkpointIds(root).filter(_ <= asOf).lastOption
    base.map(b => all.filter(_ >= b)).getOrElse(all)
  }

  /** Data write with optional parquet bloom filters on `bloomCols` —
    * the write-side half of [[readSkippingEquality]]'s point-lookup
    * path ([[ParquetIO.writeWithBloomFilters]]). */
  private def writeData(df: DataFrame, path: String,
      bloomCols: Seq[String]): Unit =
    if (bloomCols.isEmpty) df.write.mode("overwrite").parquet(path)
    else ParquetIO.writeWithBloomFilters(df, path, bloomCols)

  /** One row-identified scan over data dirs, schema evolution
    * reconciled by NAME: when commits were written under different
    * schemas, each dir scans separately and unions by name with
    * missing columns null ([[ParquetIO.merge]]'s S13 contract), oldest
    * commit's columns leading. Same-schema commits — the common case —
    * keep the single multi-dir scan (pushdown and pruning intact). */
  private def scanResolved(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    if (dirs.size <= 1) return DeleteVectors.scanWithRowId(spark, dirs)
    val schemas = dirs.map(d => spark.read.parquet(d).schema)
    if (schemas.toSet.size <= 1) DeleteVectors.scanWithRowId(spark, dirs)
    else dirs.map(d => DeleteVectors.scanWithRowId(spark, Seq(d)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[scanResolved]] over an explicit FILE subset (the skipping
    * paths): files group back to their commit dirs to detect schema
    * drift, commit order preserved. */
  private def scanResolvedFiles(spark: SparkSession,
      files: Seq[String]): DataFrame = {
    val groups = files
      .groupBy(f => new org.apache.hadoop.fs.Path(f).getParent.toString)
      .toSeq
      .sortBy { case (d, _) =>
        new org.apache.hadoop.fs.Path(d).getName.stripPrefix("c").toLong
      }
    if (groups.size <= 1) return DeleteVectors.scanWithRowId(spark, files)
    val schemas = groups.map { case (_, fs) =>
      spark.read.parquet(fs.head).schema
    }
    if (schemas.toSet.size <= 1) DeleteVectors.scanWithRowId(spark, files)
    else groups.map { case (_, fs) => DeleteVectors.scanWithRowId(spark, fs) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Create the table: the initial snapshot becomes commit 0. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      bloomCols: Seq[String] = Seq.empty): Long = {
    require(committedIds(root).isEmpty,
      s"txtable: $root already has commits — use append/upsert")
    val k = claimId(root)
    writeData(df, dataDir(root, k), bloomCols)
    commit(root, k)
    k
  }

  /** Blind append (no keys touched): one data dir, one marker. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      bloomCols: Seq[String] = Seq.empty): Long = {
    val k = claimId(root)
    writeData(df, dataDir(root, k), bloomCols)
    commit(root, k)
    k
  }

  /** The live snapshot at the latest commit. */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, Long.MaxValue)

  /** Time travel: the snapshot as of commit `asOf` — commits after it,
    * their adds AND their deletes, do not exist for this reader.
    * Resolution starts from the newest committed CHECKPOINT ≤ `asOf`
    * (the checkpoint's data dir IS the folded history before it), so a
    * long-lived table's read plan covers checkpoint + tail, not every
    * commit ever made. */
  def readAt(spark: SparkSession, root: String, asOf: Long): DataFrame = {
    val ks = resolvedIds(root, asOf)
    require(ks.nonEmpty, s"txtable: no commits ≤ $asOf under $root")
    val data = existingDataDirs(root, ks)
    require(data.nonEmpty, s"txtable: no data dirs among commits ≤ $asOf")
    DeleteVectors.applyVectors(
      scanResolved(spark, data),
      DeleteVectors.foldDvDirs(spark, existingDvDirs(root, ks)))
  }

  /**
   * Merge-on-read MERGE of one CDC batch, committed atomically:
   * latest `versionCol` per `keys` wins inside the batch; each winner
   * then competes against the LIVE rows of its key — a live row is
   * marked dead (deletion vectors under this commit's id) only by a
   * winner at `version >= live.version` (batch wins ties — the
   * [[ParquetIO.upsertWrite]] update-side-wins rule), and a winner
   * that loses to a strictly newer live row is dropped, so a late or
   * out-of-order batch never regresses newer committed data. Winners
   * whose `opCol` is not "d" are appended as this commit's data dir;
   * the marker lands last. Returns the commit id. A crash before the
   * marker leaves the snapshot byte-identical.
   *
   * The batch key set broadcasts when the batch has at most
   * `broadcastKeyLimit` winners; above that (a backfill, not a CDC
   * batch) the contested-row join falls back to the shuffled plan.
   */
  def upsert(spark: SparkSession, root: String, batch: DataFrame,
      keys: Seq[String], versionCol: String,
      opCol: Option[String] = None,
      bloomCols: Seq[String] = Seq.empty,
      broadcastKeyLimit: Long = 4L * 1000 * 1000): Long = {
    require(keys.nonEmpty, "txtable.upsert needs key columns")
    val ks = committedIds(root)
    require(ks.nonEmpty, s"txtable: create $root before upserting")
    val k = claimId(root)

    // batch-internal winner per key: latest version, tombstones eligible
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    val winners = batch
      .withColumn("__tx_rn", row_number().over(w))
      .filter(col("__tx_rn") === 1).drop("__tx_rn")

    // contested live rows: one snapshot scan joined against the batch's
    // (key, winner-version) set — broadcast below the key limit, the
    // shuffled plan above it. Persisted (batch-bounded rows) so the
    // kill pass and the beaten-winner pass share ONE table scan.
    val keyed = winners.select(
      keys.map(col) :+ col(versionCol).as("__tx_wv"): _*)
    val keySide =
      if (keyed.count() <= broadcastKeyLimit) broadcast(keyed) else keyed
    val rks = resolvedIds(root)
    val live = DeleteVectors.applyVectorsKeepId(
      scanResolved(spark, existingDataDirs(root, rks)),
      DeleteVectors.foldDvDirs(spark, existingDvDirs(root, rks)))
    val cand = live.join(keySide, keys.toSeq)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // live rows the batch winner beats (ties to the batch) die
      val hits = cand.filter(col("__tx_wv") >= col(versionCol))
        .select(col("__dv_file").as("file_path"), col("__dv_row").as("ri"))
      val vectors = DeleteVectors.buildVectors(hits)
      vectors.write.mode("overwrite").parquet(dvDir(root, k))
      val dvEmpty = !Fs.listFiles(dvDir(root, k)).exists { f =>
        f.getPath.getName.endsWith(".parquet") && f.getLen > 0
      } || spark.read.parquet(dvDir(root, k)).isEmpty
      if (dvEmpty) Fs.deleteRecursive(new org.apache.hadoop.fs.Path(dvDir(root, k)))

      // winners that LOSE to a strictly newer live row are dropped —
      // the live side's latest-wins leg; tombstones drop their key
      val beaten = cand.filter(col(versionCol) > col("__tx_wv"))
        .select(keys.map(col): _*).distinct()
      val adds0 = winners.join(beaten, keys.toSeq, "left_anti")
      val adds = opCol.map(c => adds0.filter(col(c) =!= "d").drop(c))
        .getOrElse(adds0)
      val anyAdds = !adds.isEmpty
      if (anyAdds) writeData(adds, dataDir(root, k), bloomCols)

      if (dvEmpty && !anyAdds) k // no-op batch: nothing to commit
      else { commit(root, k); k }
    } finally { cand.unpersist(); () }
  }

  private def statsPath(root: String) = s"$root/_txn/stats/manifest"

  /** The data FILES of the current resolution set (checkpoint + tail),
    * the universe every skipping decision is made against. */
  private def resolvedFiles(root: String, asOf: Long = Long.MaxValue): Seq[String] = {
    existingDataDirs(root, resolvedIds(root, asOf)).flatMap(d =>
      Fs.listFiles(d).map(_.getPath.toString)
        .filter(p => p.endsWith(".parquet") &&
          !new org.apache.hadoop.fs.Path(p).getName.startsWith("_")))
  }

  /**
   * Build (or rebuild) the file-stats manifest over the CURRENT
   * resolution set — the [[StatsManifest]] footer pass pointed at the
   * commit log's files instead of a directory listing (a raw listing
   * of `data/` would also stat UNCOMMITTED dirs, which must never
   * influence a read). The manifest is an advisory CACHE, not part of
   * the commit protocol: [[readSkipping]] treats any file it doesn't
   * cover as unprunable, so a stale manifest costs performance, never
   * correctness — rebuild it at the same cadence as [[checkpoint]].
   */
  def buildManifest(spark: SparkSession, root: String,
      cols: Seq[String] = Seq.empty): DataFrame = {
    val files = resolvedFiles(root)
    require(files.nonEmpty, s"txtable: nothing committed under $root")
    StatsManifest.statsFor(spark, files, cols)
      .write.mode("overwrite").parquet(statsPath(root))
    spark.read.parquet(statsPath(root))
  }

  /**
   * Range scan with file skipping AND deletion vectors: the file
   * universe is the COMMIT LOG's resolution set (never the manifest's
   * own file list — files committed after the last [[buildManifest]]
   * are simply kept), the manifest's provable exclusions drop files,
   * the DV broadcast drops rows, and the range filter still applies
   * (pushed) on the survivors. Equals the unskipped live read filtered
   * to the range, by construction, whatever the manifest's age.
   */
  def readSkipping(spark: SparkSession, root: String, column: String,
      lo: Any, hi: Any): DataFrame = {
    val files = resolvedFiles(root)
    require(files.nonEmpty, s"txtable: nothing committed under $root")
    val excluded: Set[String] =
      if (!Fs.isDirectory(statsPath(root))) Set.empty
      else StatsManifest.excludedFiles(
        spark.read.parquet(statsPath(root)), column, lo, hi)
    val survivors = files.filterNot(excluded)
    val pred = col(column) >= lit(lo) && col(column) <= lit(hi)
    if (survivors.isEmpty) read(spark, root).filter(lit(false))
    else
      DeleteVectors.applyVectors(
        scanResolvedFiles(spark, survivors),
        DeleteVectors.foldDvDirs(spark, existingDvDirs(root, resolvedIds(root))))
        .filter(pred)
  }

  /**
   * POINT LOOKUP with bloom skipping AND deletion vectors (round 17):
   * [[StatsManifest.pruneEquality]]'s two metadata-only cuts — the
   * manifest interval test, then the split-block bloom probe over the
   * survivors ([[ParquetIO.writeWithBloomFilters]] wrote the bitsets
   * when the table's writes passed `bloomCols`) — composed with the
   * commit log's file universe and the DV broadcast. A bloom rejection
   * is proof of absence, files without blooms or manifest rows are
   * conservatively kept, and the equality filter still applies (and
   * pushes down, re-checking blooms per row group below the file cut),
   * so the result equals the unskipped live read filtered to the value
   * — including zero rows for a key whose erasure is only recorded in
   * deletion vectors.
   */
  def readSkippingEquality(spark: SparkSession, root: String,
      column: String, value: Any): DataFrame = {
    val files = resolvedFiles(root)
    require(files.nonEmpty, s"txtable: nothing committed under $root")
    val excluded: Set[String] =
      if (!Fs.isDirectory(statsPath(root))) Set.empty
      else StatsManifest.excludedFiles(
        spark.read.parquet(statsPath(root)), column, value, value)
    val candidates = files.filterNot(excluded)
    val survivors = StatsManifest.bloomSurvivors(spark, candidates, column, value)
    if (survivors.isEmpty) read(spark, root).filter(lit(false))
    else
      DeleteVectors.applyVectors(
        scanResolvedFiles(spark, survivors),
        DeleteVectors.foldDvDirs(spark, existingDvDirs(root, resolvedIds(root))))
        .filter(col(column) === lit(value))
  }

  /**
   * Row-level CHANGE FEED out of the commit log (round 17) — the
   * merge-on-read twin of [[ParquetIO.changeFeed]]: for each commit
   * k ≥ `fromCommit`, the commit's adds (its data dir) are diffed by
   * `keys` against its kills (`_txn/dv/<k>` resolved back through row
   * identity — a scan bounded by the files the commit TOUCHED, never
   * the table), emitting `op ∈ {i, u, d}` rows with the surviving
   * payload and a `commit` column. An update is one `u` (new values),
   * a pure delete one `d` (last-known values), a pure insert one `i`;
   * a kill+re-add with identical payload — a [[compactFiles]] move —
   * compares equal and is feed-INVISIBLE, and [[checkpoint]] commits
   * (which supersede rather than change) are skipped, so maintenance
   * never pollutes the feed. Replaying the feed in commit order
   * reconstructs any snapshot; requires commits ≥ `fromCommit` to be
   * unexpired. Cost: Σ per-commit (files touched) — run it at CDC
   * cadence, before [[checkpoint]]+[[expire]] collapse the history.
   *
   * Long logs do NOT widen the plan: per-commit deltas fold in chunks
   * of `spillEvery`, each chunk spilled once to scratch parquet (the
   * repo's spill-once candidate-relation pattern), so Catalyst plans
   * O(spillEvery) branches at a time instead of one branch per commit —
   * measured at 40 commits: 14.9 s of pure PLANNING on the flat union
   * vs bounded chunk plans (SCALE.md round-17).
   */
  def changeFeed(spark: SparkSession, root: String, keys: Seq[String],
      fromCommit: Long = 0L, spillEvery: Int = 8): DataFrame = {
    require(keys.nonEmpty, "txtable.changeFeed needs key columns")
    val all = committedIds(root)
    require(all.nonEmpty, s"txtable: nothing committed under $root")
    val cps = checkpointIds(root).toSet
    val feedIds = all.filter(k => k >= fromCommit && !cps.contains(k))
    // ONE job resolves every commit's touched-file list (the sidecars
    // are tiny) — a per-commit collect would issue one job per commit,
    // the driver-loop shape this repo exists to avoid
    val dvPresent = feedIds.filter(k => Fs.isDirectory(dvDir(root, k)))
    val killFiles: Map[Long, Seq[String]] =
      if (dvPresent.isEmpty) Map.empty
      else spark.read.parquet(dvPresent.map(dvDir(root, _)): _*)
        .select(col("file_path"), col("_metadata.file_path").as("__src"))
        .distinct()
        .collect()
        .map { r =>
          val k = new org.apache.hadoop.fs.Path(r.getString(1))
            .getParent.getName.toLong
          (k, r.getString(0))
        }
        .groupBy(_._1).map { case (k, v) =>
          k -> v.map(_._2).distinct.sorted.toSeq
        }
    val feeds = feedIds.flatMap(k =>
      commitChanges(spark, root, k, keys,
        killFiles.getOrElse(k, Seq.empty)))
    if (feeds.isEmpty) {
      val base = read(spark, root)
      val payload = base.columns.filterNot(keys.contains).toSeq
      base.select(keys.map(col) ++ Seq(lit("").as("op")) ++
        payload.map(col) :+ lit(0L).as("commit"): _*).filter(lit(false))
    } else {
      def union(ds: Seq[DataFrame]): DataFrame =
        ds.reduce(_.unionByName(_, allowMissingColumns = true))
      val chunks = feeds.grouped(math.max(1, spillEvery)).toSeq
      if (chunks.size <= 1) union(feeds)
      else union(chunks.map(c =>
        graft.operators.Materialize.viaParquet(union(c), "txfeed")))
    }
  }

  /** One commit's i/u/d delta: kills (DV-resolved rows over the
    * precomputed `killFiles` the commit touched) diffed to adds (the
    * data dir) by key — [[ParquetIO.changeFeed]] does the comparing;
    * schema drift between the two sides reconciles by name first.
    * None when the commit changed nothing. */
  private def commitChanges(spark: SparkSession, root: String, k: Long,
      keys: Seq[String], killFiles: Seq[String]): Option[DataFrame] = {
    val dDir = dataDir(root, k)
    val vDir = dvDir(root, k)
    val adds =
      if (Fs.isDirectory(dDir)) Some(spark.read.parquet(dDir)) else None
    val kills =
      if (killFiles.isEmpty) None
      else Some(DeleteVectors.killedRows(
        scanResolvedFiles(spark, killFiles),
        DeleteVectors.foldDvDirs(spark, Seq(vDir))))
    if (adds.isEmpty && kills.isEmpty) return None
    // widen both sides to the union schema (nulls for the missing leg)
    // so the diff survives schema evolution between commits
    val fields = (adds.toSeq ++ kills.toSeq).flatMap(_.schema.fields)
      .foldLeft(Vector.empty[org.apache.spark.sql.types.StructField]) {
        (acc, f) => if (acc.exists(_.name == f.name)) acc else acc :+ f
      }
    def widen(dfo: Option[DataFrame]): DataFrame = {
      val proto = dfo.orElse(adds).orElse(kills).get
      val df = dfo.getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], proto.schema))
      df.select(fields.map { f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    Some(ParquetIO.changeFeed(widen(kills), widen(adds), keys)
      .withColumn("commit", lit(k)))
  }

  /** Scheme-insensitive identity for crossing the `_metadata.file_path`
    * domain (scan-provided URIs) with listing paths. */
  private def pathKey(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /**
   * File-level FOLD-DOWN (round 17): rewrite ONLY the files whose dead
   * fraction crossed `minDeadFraction`, as one commit — the commit's
   * adds are those files' live rows, its deletion vectors re-kill the
   * same rows at their OLD positions, so the live snapshot is
   * unchanged, cold files stay byte-untouched, and a skewed delete
   * pattern (one hot day-partition) folds at cost ∝ hot files where
   * [[checkpoint]] would rewrite the whole table. Dead counts come
   * from the DV sidecars alone (popcount per file); live totals from a
   * footer pass over the DV-carrying files only — no data read decides
   * anything. Returns the commit id, or None when no file crosses the
   * threshold (or the hot files hold no live rows). Single maintenance
   * writer, like every maintenance pass.
   */
  def compactFiles(spark: SparkSession, root: String,
      minDeadFraction: Double = 0.3,
      targetFileBytes: Long = 512L * 1024 * 1024,
      bloomCols: Seq[String] = Seq.empty): Option[Long] = {
    val ks = committedIds(root)
    require(ks.nonEmpty, s"txtable: nothing committed under $root")
    val rks = resolvedIds(root)
    val dv = DeleteVectors.foldDvDirs(spark, existingDvDirs(root, rks))
    val deadPerFile = dv.groupBy(col("__dv_fp"))
      .agg(sum(bit_count(col("__dv_mask"))).cast("long").as("dead"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (deadPerFile.isEmpty) return None
    // vectors can reference files already folded out of the resolution
    // set (e.g. pre-checkpoint) — only files still resolved count
    val universe = resolvedFiles(root).map(pathKey).toSet
    val cands = deadPerFile.keys.filter(f => universe.contains(pathKey(f)))
      .toSeq.sorted
    if (cands.isEmpty) return None
    val totals = StatsManifest.rowCounts(spark, cands)
    val hot = cands.filter(f =>
      deadPerFile(f).toDouble / math.max(1L, totals.getOrElse(f, 1L)) >=
        minDeadFraction)
    if (hot.isEmpty) return None

    val liveHot = DeleteVectors.applyVectorsKeepId(
      scanResolvedFiles(spark, hot), dv)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (liveHot.isEmpty) return None // fully dead files: nothing to move
      val k = claimId(root)
      val hits = liveHot.select(
        col("__dv_file").as("file_path"), col("__dv_row").as("ri"))
      DeleteVectors.buildVectors(hits)
        .write.mode("overwrite").parquet(dvDir(root, k))
      val hotBytes = ParquetIO.inputBytes(spark, hot)
      val parts = math.max(1L, hotBytes / math.max(1L, targetFileBytes)).toInt
      writeData(liveHot.drop("__dv_file", "__dv_row").coalesce(parts),
        dataDir(root, k), bloomCols)
      commit(root, k)
      Some(k)
    } finally { liveHot.unpersist(); () }
  }

  /**
   * Fold the log: write the CURRENT live snapshot as one clean commit
   * and mark it a checkpoint — readers at or past it resolve
   * checkpoint + tail instead of every commit since creation, which
   * bounds both the read plan and the DV fold of a long-lived CDC
   * table (the same small-files pressure
   * `compactFragmentedPartitions` exists for, answered in-log).
   * Output sizing is computed over the RESOLUTION set's bytes
   * (checkpoint + tail — already-superseded history must not inflate
   * the file count). `sortCols` (round 17) makes the fold a LAYOUT
   * pass too: the live rows range-exchange + sort on those keys (the
   * [[ParquetIO.compactSorted]] recipe), so each checkpoint file is a
   * tight key range and a [[buildManifest]] right after restores
   * file-level pruning that months of unordered CDC commits eroded —
   * mutation and clustered layout stop being either/or. Ordering:
   * data dir, then the checkpoint marker, then the COMMIT marker — a
   * crash leaves either invisible dirs or a
   * checkpoint-marker-without-commit, which [[checkpointIds]] ignores
   * and [[vacuum]] sweeps. History BEFORE the checkpoint stays
   * readable ([[readAt]]) until [[expire]] collapses it.
   */
  def checkpoint(spark: SparkSession, root: String,
      targetFileBytes: Long = 512L * 1024 * 1024,
      bloomCols: Seq[String] = Seq.empty,
      sortCols: Seq[String] = Seq.empty): Long = {
    val k = claimId(root)
    val live = read(spark, root)
    val bytes = ParquetIO.inputBytes(spark,
      existingDataDirs(root, resolvedIds(root)))
    val parts = math.max(1L, bytes / math.max(1L, targetFileBytes)).toInt
    val sized =
      if (sortCols.isEmpty) live.repartition(parts)
      else live.repartitionByRange(parts, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    writeData(sized, dataDir(root, k), bloomCols)
    require(Fs.createMarker(s"${checkpointsDir(root)}/c$k", dataDir(root, k)),
      s"txtable: checkpoint marker c$k already exists under $root — " +
        "lost a commit race")
    commit(root, k)
    k
  }

  /**
   * Collapse history below the newest committed checkpoint: delete the
   * data dirs, DV dirs, and markers of every commit strictly older.
   * The live snapshot is untouched (it resolves from the checkpoint
   * forward); time travel BELOW the checkpoint fails loudly afterwards
   * — the caller is trading history for storage, the generation-
   * retention contract. No-op without a committed checkpoint.
   */
  def expire(spark: SparkSession, root: String): Seq[Long] =
    checkpointIds(root).lastOption match {
      case None => Seq.empty
      case Some(cp) =>
        committedIds(root).filter(_ < cp).map { id =>
          Fs.deleteRecursive(new org.apache.hadoop.fs.Path(dataDir(root, id)))
          Fs.deleteRecursive(new org.apache.hadoop.fs.Path(dvDir(root, id)))
          // the marker goes LAST: a crash mid-expire leaves a committed
          // id with missing dirs only below the checkpoint, where no
          // reader resolves data from anyway
          Fs.deleteIfExists(marker(root, id))
          Fs.deleteIfExists(s"${checkpointsDir(root)}/c$id")
          Fs.deleteIfExists(s"${claimsDir(root)}/c$id")
          id
        }
    }

  /**
   * Log introspection (round 17) — the `DESCRIBE HISTORY` analogue, one
   * row per COMMITTED id: whether it is a checkpoint, its data files /
   * bytes (directory listings, bounded by log length), and its DV kill
   * count (popcount over the commit's own sidecar — tiny). Metadata
   * only: no data page is read, so it is safe to call on any table at
   * any size. Uncommitted (claimed/crashed) ids are invisible here as
   * everywhere; [[vacuum]] reports those.
   */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val committed = committedIds(root)
    val cps = checkpointIds(root).toSet
    // ALL commits' kill counts in one scan of the (tiny) sidecars —
    // commit attribution from the sidecar's own path, never a
    // one-job-per-commit driver loop
    val dvDirs = existingDvDirs(root, committed)
    val killed: Map[Long, Long] =
      if (dvDirs.isEmpty) Map.empty
      else spark.read.parquet(dvDirs: _*)
        .select(col("n_deleted"), col("_metadata.file_path").as("__src"))
        .collect()
        .map { r =>
          (new org.apache.hadoop.fs.Path(r.getString(1))
            .getParent.getName.toLong, r.getLong(0))
        }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val rows = committed.map { k =>
      val d = dataDir(root, k)
      val files =
        if (!Fs.isDirectory(d)) Seq.empty
        else Fs.listFiles(d).filter { f =>
          f.getPath.getName.endsWith(".parquet") &&
            !f.getPath.getName.startsWith("_")
        }
      (k, cps.contains(k), files.size.toLong, files.map(_.getLen).sum,
        killed.getOrElse(k, 0L))
    }
    rows.toDF("commit", "is_checkpoint", "n_files", "bytes", "n_deleted")
  }

  /** Sweep crashed-writer leftovers: data/DV dirs and unredeemed claim
    * markers whose id has no commit marker AND is below the newest
    * committed id (an id above it may be an in-flight writer — never
    * touched, the generation-vacuum rule). Returns the paths removed. */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val committed = committedIds(root).toSet
    val tip = if (committed.isEmpty) -1L else committed.max
    def sweep(dir: String, prefix: String, path: Long => String): Seq[String] =
      if (!Fs.isDirectory(dir)) Seq.empty
      else Fs.listDirs(dir).map(_.getPath.getName)
        .filter(n => n.startsWith(prefix) && n.drop(prefix.length).forall(_.isDigit))
        .map(_.drop(prefix.length).toLong)
        .filter(id => !committed.contains(id) && id < tip)
        .map { id =>
          val p = path(id)
          Fs.deleteRecursive(new org.apache.hadoop.fs.Path(p)); p
        }
    // a crashed checkpoint's marker-without-commit is litter, and so is
    // a claim that never became a commit
    def strayMarkers(dir: String): Seq[String] =
      markerIds(dir)
        .filter(id => !committed.contains(id) && id < tip)
        .map { id =>
          val p = s"$dir/c$id"
          Fs.deleteIfExists(p); p
        }
    sweep(s"$root/data", "c", dataDir(root, _)) ++
      sweep(s"$root/_txn/dv", "", dvDir(root, _)) ++
      strayMarkers(checkpointsDir(root)) ++ strayMarkers(claimsDir(root))
  }
}
