package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * A minimal transactional table layout (round 16) — the round's sidecar
 * machinery composed into snapshot-isolated commits, so a mutating
 * 100 TB table gets ATOMIC merge-on-read upserts instead of choosing
 * between [[ParquetIO.upsert]]'s copy-on-write generations (rewrite ∝
 * table) and raw [[DeleteVectors]] epochs (no atomicity across the
 * delete-then-append pair a CDC batch needs).
 *
 * Layout, all under one root, all object-store safe (create-once
 * markers only — no rename, no pointer, no listing-freshness
 * assumption; the [[Streams]] generation-lifecycle contract):
 *
 * {{{
 *   <root>/data/c<k>/part-….parquet   commit k's added rows (optional)
 *   <root>/_txn/dv/<k>/part-….parquet commit k's deletion vectors (optional)
 *   <root>/_txn/commits/c<k>          the commit bit (marker EXISTENCE)
 * }}}
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
 * [[readAt]] is time travel for free: resolve markers ≤ k only, and a
 * later commit's deletes vanish WITH its adds, keeping historical
 * snapshots exact.
 *
 * [[upsert]] is the merge-on-read MERGE: latest-version-per-key winner
 * selection inside the batch (ties broken like [[ParquetIO.upsert]]),
 * one scan of the live snapshot semi-joined against the batch's keys
 * (broadcast — a CDC batch is small by premise) to mark every current
 * version dead, surviving non-tombstone winners appended as c<k>.
 * Cost: one table scan + work ∝ BATCH size — no generation rewrite.
 * The scan itself stays a plain parquet scan (pushdown intact); at
 * 0.1 %-of-table batches this is the regime where copy-on-write pays
 * 1000× the write volume (SCALE.md round-16 `delvec`).
 */
object TxTable {

  private def dataDir(root: String, k: Long) = s"$root/data/c$k"
  private def dvDir(root: String, k: Long) = s"$root/_txn/dv/$k"
  private def commitsDir(root: String) = s"$root/_txn/commits"
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

  /** Next free id: past every id any directory or marker has touched,
    * committed or crashed — a crashed writer's id is never reused, so
    * its leftovers can never be adopted by a later commit. */
  private def nextId(root: String): Long = {
    def ids(dir: String, prefix: String): Seq[Long] =
      if (!Fs.isDirectory(dir)) Seq.empty
      else Fs.listDirs(dir).map(_.getPath.getName)
        .filter(n => n.startsWith(prefix) && n.drop(prefix.length).forall(_.isDigit))
        .map(_.drop(prefix.length).toLong)
    (committedIds(root) ++ ids(s"$root/data", "c") ++
      ids(s"$root/_txn/dv", "") :+ -1L).max + 1
  }

  private def existingDataDirs(root: String, ks: Seq[Long]): Seq[String] =
    ks.map(dataDir(root, _)).filter(Fs.isDirectory(_))
  private def existingDvDirs(root: String, ks: Seq[Long]): Seq[String] =
    ks.map(dvDir(root, _)).filter(Fs.isDirectory(_))

  /** Create the table: the initial snapshot becomes commit 0. */
  def create(spark: SparkSession, root: String, df: DataFrame): Long = {
    require(committedIds(root).isEmpty,
      s"txtable: $root already has commits — use append/upsert")
    val k = nextId(root)
    df.write.mode("overwrite").parquet(dataDir(root, k))
    Fs.createMarker(marker(root, k), dataDir(root, k))
    k
  }

  /** Blind append (no keys touched): one data dir, one marker. */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val k = nextId(root)
    df.write.mode("overwrite").parquet(dataDir(root, k))
    Fs.createMarker(marker(root, k), dataDir(root, k))
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
    val all = committedIds(root).filter(_ <= asOf)
    require(all.nonEmpty, s"txtable: no commits ≤ $asOf under $root")
    val base = checkpointIds(root).filter(_ <= asOf).lastOption
    val ks = base.map(b => all.filter(_ >= b)).getOrElse(all)
    val data = existingDataDirs(root, ks)
    require(data.nonEmpty, s"txtable: no data dirs among commits ≤ $asOf")
    DeleteVectors.applyVectors(
      DeleteVectors.scanWithRowId(spark, data),
      DeleteVectors.foldDvDirs(spark, existingDvDirs(root, ks)))
  }

  /**
   * Merge-on-read MERGE of one CDC batch, committed atomically:
   * latest `versionCol` per `keys` wins inside the batch; every LIVE
   * row whose key appears in the batch is marked dead (deletion
   * vectors under this commit's id); winners whose `opCol` is not
   * "d" are appended as this commit's data dir; the marker lands
   * last. Returns the commit id. A crash before the marker leaves
   * the snapshot byte-identical.
   */
  def upsert(spark: SparkSession, root: String, batch: DataFrame,
      keys: Seq[String], versionCol: String,
      opCol: Option[String] = None): Long = {
    require(keys.nonEmpty, "txtable.upsert needs key columns")
    val k = nextId(root)
    val ks = committedIds(root)
    require(ks.nonEmpty, s"txtable: create $root before upserting")

    // batch-internal winner per key: latest version, tombstones eligible
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    val winners = batch
      .withColumn("__tx_rn", row_number().over(w))
      .filter(col("__tx_rn") === 1).drop("__tx_rn")

    // mark every live row for a batch key dead — one snapshot scan,
    // key semi-join against the (small, broadcast) batch key set
    val touched = winners.select(keys.map(col): _*).distinct()
    // resolve from the newest checkpoint like every reader — commits
    // it superseded contribute nothing live
    val base0 = checkpointIds(root).lastOption
    val rks = base0.map(b => ks.filter(_ >= b)).getOrElse(ks)
    val live = DeleteVectors.applyVectorsKeepId(
      DeleteVectors.scanWithRowId(spark, existingDataDirs(root, rks)),
      DeleteVectors.foldDvDirs(spark, existingDvDirs(root, rks)))
    val hits = live.join(broadcast(touched), keys, "left_semi")
      .select(col("__dv_file").as("file_path"), col("__dv_row").as("ri"))
    val vectors = DeleteVectors.buildVectors(hits)
    vectors.write.mode("overwrite").parquet(dvDir(root, k))
    val dvEmpty = !Fs.listFiles(dvDir(root, k)).exists { f =>
      f.getPath.getName.endsWith(".parquet") && f.getLen > 0
    } || spark.read.parquet(dvDir(root, k)).isEmpty
    if (dvEmpty) Fs.deleteRecursive(new org.apache.hadoop.fs.Path(dvDir(root, k)))

    // append the surviving winners (tombstones drop their key)
    val adds = opCol.map(c => winners.filter(col(c) =!= "d").drop(c))
      .getOrElse(winners)
    val anyAdds = !adds.isEmpty
    if (anyAdds) adds.write.mode("overwrite").parquet(dataDir(root, k))

    if (dvEmpty && !anyAdds) k // empty batch: nothing to commit
    else { Fs.createMarker(marker(root, k), dataDir(root, k)); k }
  }

  private def statsPath(root: String) = s"$root/_txn/stats/manifest"

  /** The data FILES of the current resolution set (checkpoint + tail),
    * the universe every skipping decision is made against. */
  private def resolvedFiles(root: String, asOf: Long = Long.MaxValue): Seq[String] = {
    val all = committedIds(root).filter(_ <= asOf)
    val base = checkpointIds(root).filter(_ <= asOf).lastOption
    val ks = base.map(b => all.filter(_ >= b)).getOrElse(all)
    existingDataDirs(root, ks).flatMap(d =>
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
    else {
      val ks = committedIds(root)
      val base = checkpointIds(root).lastOption
      val rks = base.map(b => ks.filter(_ >= b)).getOrElse(ks)
      DeleteVectors.applyVectors(
        DeleteVectors.scanWithRowId(spark, survivors),
        DeleteVectors.foldDvDirs(spark, existingDvDirs(root, rks)))
        .filter(pred)
    }
  }

  /**
   * Fold the log: write the CURRENT live snapshot as one clean commit
   * and mark it a checkpoint — readers at or past it resolve
   * checkpoint + tail instead of every commit since creation, which
   * bounds both the read plan and the DV fold of a long-lived CDC
   * table (the same small-files pressure
   * `compactFragmentedPartitions` exists for, answered in-log).
   * Ordering: data dir, then the checkpoint marker, then the COMMIT
   * marker — a crash leaves either invisible dirs or a
   * checkpoint-marker-without-commit, which [[checkpointIds]] ignores
   * and [[vacuum]] sweeps. History BEFORE the checkpoint stays
   * readable ([[readAt]]) until [[expire]] collapses it.
   */
  def checkpoint(spark: SparkSession, root: String,
      targetFileBytes: Long = 512L * 1024 * 1024): Long = {
    val k = nextId(root)
    val live = read(spark, root)
    val bytes = ParquetIO.inputBytes(spark,
      existingDataDirs(root, committedIds(root)))
    val parts = math.max(1L, bytes / math.max(1L, targetFileBytes)).toInt
    live.repartition(parts).write.mode("overwrite").parquet(dataDir(root, k))
    Fs.createMarker(s"${checkpointsDir(root)}/c$k", dataDir(root, k))
    Fs.createMarker(marker(root, k), dataDir(root, k))
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
          id
        }
    }

  /** Sweep crashed-writer leftovers: data/DV dirs whose id has no
    * marker AND is below the newest committed id (an id above it may
    * be an in-flight writer — never touched, the generation-vacuum
    * rule). Returns the paths removed. */
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
    // a crashed checkpoint's marker-without-commit is litter too
    val strayCps = markerIds(checkpointsDir(root))
      .filter(id => !committed.contains(id) && id < tip)
      .map { id =>
        val p = s"${checkpointsDir(root)}/c$id"
        Fs.deleteIfExists(p); p
      }
    sweep(s"$root/data", "c", dataDir(root, _)) ++
      sweep(s"$root/_txn/dv", "", dvDir(root, _)) ++ strayCps
  }
}
