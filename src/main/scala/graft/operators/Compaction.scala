package graft.operators

import org.apache.spark.sql.DataFrame

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest needs: streaming micro-batches and per-partition appends leave
  * thousands of KB-sized parquet files, and at 100 TB the scan's task
  * count (and the namenode/listing load) is proportional to FILE COUNT,
  * not data size. Compaction rewrites a directory into
  * ceil(bytes / targetBytes) files of roughly even size.
  *
  * The file count comes from the SOURCE's actual on-disk size (summed
  * from the files the scan enumerates — no Catalyst stats dependency,
  * correct for any layout), and the rewrite is one round-robin
  * `repartition(n)`: no range shuffle, no sort — compaction must not
  * silently claim to preserve a clustering it doesn't know about; keep
  * order with [[ZOrder.writeZOrdered]] or a repartitionByRange rewrite
  * when the layout matters.
  */
object Compaction {

  /** Identity-bounded cause-chain walk for FileNotFoundException (ADVICE
    * r11: a circular cause chain — constructible via `initCause` between
    * two exceptions — would otherwise recurse to StackOverflowError).
    * Shared by [[retryFileGone]], [[stableAcrossFolds]] and the
    * serving-path probes ([[graft.streaming.EmbedStream.probeVector]])
    * so a future widening (e.g. RemoteException-wrapped FNFE) lands in
    * one place. */
  def causeChainHasFileNotFound(e: Throwable): Boolean = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    var cur = e
    while (cur != null && seen.add(cur)) {
      if (cur.isInstanceOf[java.io.FileNotFoundException]) return true
      cur = cur.getCause
    }
    false
  }

  /** Re-run `build` across a concurrent [[foldBatchDirs]]: a fold can
    * delete a listed `batch=` dir between a store's listStatus and its
    * parquet read (footer fetch or action), surfacing as a
    * FileNotFoundException somewhere in the cause chain. The folded dir
    * carries the same rows, so a rebuild against a fresh listing sees
    * an equivalent store; bounded retries because the store quiesces
    * after one fold. `build` must MATERIALIZE (collect/count/
    * localCheckpoint) for the retry to cover action-time failures —
    * returning a lazy frame only protects the footer read. Retries back
    * off linearly (`backoffMs`, 2×, 3×…) so a fold slower than three
    * instantaneous re-lists still gets a window to finish. For
    * serving-path reads prefer [[stableAcrossFolds]], which also
    * catches the silent-subset listing race this cannot see. */
  def retryFileGone[T](build: => T, attempts: Int = 3,
      backoffMs: Long = 50L): T = {
    var attempt = 0
    while (true) {
      try return build
      catch {
        case e: Throwable if causeChainHasFileNotFound(e) && attempt < attempts =>
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bytes currently on disk under the frame's input files. */
  def inputBytes(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }

  /** Target output file count for a rewrite at `targetBytes` per file
    * (parquet re-encodes, so on-disk size is ~preserved; a compression
    * `ratio` adjusts when re-encoding is expected to shrink/grow). */
  def planFileCount(df: DataFrame, targetBytes: Long, ratio: Double = 1.0): Int = {
    require(targetBytes > 0)
    val bytes = (inputBytes(df) * ratio).toLong
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite `path` into ~targetBytes files. Returns the file count. */
  def compact(df: DataFrame, outPath: String, targetBytes: Long): Int = {
    val n = planFileCount(df, targetBytes)
    df.repartition(n).write.mode("overwrite").parquet(outPath)
    n
  }

  /** Fold a streaming store's `batch=<id>` delta directories (ids
    * strictly below `upTo`) into ONE compacted `batch=<maxFolded>`
    * directory — the maintenance pass behind
    * [[graft.streaming.EmbedStream]]'s stores, which otherwise grow one
    * micro-batch directory forever.
    *
    * Layout-preserving: the folded dir keeps the store's row schema
    * (the `batch` discovery column is delivery bookkeeping and is
    * dropped) and optional `partitionCols` sub-layout, and it keeps the
    * LARGEST folded id as its name — so any reader filtering `batch <
    * N` (the strictly-before replay discipline) sees exactly the rows
    * it saw before for every N > maxFolded. Passing `upTo` = the
    * highest batch id present is replay-safe: foreachBatch can only
    * redeliver the latest uncommitted batch, whose probes read `batch <
    * latest` — all folded.
    *
    * Crash-safe via stage-then-swap with a durable marker: the full
    * union stages into `compact.tmp` plus a `_folded_upto.<m>` marker
    * BEFORE any original is deleted; the swap deletes originals ≤ m and
    * renames. The marker name is dot-separated, NEVER `name=value`:
    * the marker rides inside the dir the swap renames live, and Spark's
    * hidden-file filter KEEPS underscore-prefixed names that contain
    * '=' (they parse as partition dirs) — an `=` marker left by a crash
    * between the rename and the marker delete made the whole store
    * unreadable (CONFLICTING_PARTITION_COLUMN_NAMES) for every reader,
    * with no repair path that ever deleted it (found by the r13
    * crash-kill sweep, RetrainKillSpec). A re-run after a crash at ANY point either discards an
    * incomplete stage (no marker/_SUCCESS yet — originals intact) or
    * completes the recorded swap (stage is a superset of whatever was
    * already deleted). Like every maintenance rewrite here, run it
    * between micro-batches (foreachBatch serializes naturally), not
    * concurrently with probes of the same store.
    *
    * Returns true iff a fold happened (≥2 foldable dirs). */
  def foldBatchDirs(s: org.apache.spark.sql.SparkSession, root: String,
      upTo: Long, targetBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): Boolean =
    rewriteBatchDirs(s, root, upTo, targetBytes, partitionCols,
      identity, minDirs = 2)

  /** [[foldBatchDirs]] with a caller-supplied REWRITE of the folded
    * content — the index-retrain form
    * ([[graft.streaming.EmbedStream.retrainIvf]]): same batch-dir
    * discovery, staging, durable marker and crash-resume protocol, but
    * the staged frame is `rewrite(union)` instead of the union itself
    * (e.g. a re-assignment under rebuilt centroids). `minDirs` = 1
    * because a rewrite is worthwhile even over a single accumulated
    * dir; the rewrite must be deterministic so a crashed swap's re-run
    * stages identical content. */
  def rewriteBatchDirs(s: org.apache.spark.sql.SparkSession, root: String,
      upTo: Long, targetBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil,
      rewrite: DataFrame => DataFrame = identity,
      minDirs: Int = 1): Boolean =
    stageRewriteBatchDirs(s, root, upTo, targetBytes, partitionCols,
      rewrite, minDirs) && commitStagedRewrite(s, root)

  /** Stage phase of [[rewriteBatchDirs]] WITHOUT the swap: writes
    * `rewrite(union)` plus the durable `_folded_upto` marker into
    * `root/<tmpName>` (invisible to `batch=`-dir readers) and returns
    * true, leaving every original dir untouched — so concurrent readers
    * keep serving the old store for the stage's whole data-sized
    * duration. Complete with [[commitStagedRewrite]], whose cost is
    * metadata-only (delete + rename) — the split is what lets a retrain
    * shrink its probe-visible mutation window to milliseconds
    * ([[graft.streaming.EmbedStream.retrainIvf]]).
    *
    * Resume discipline around crashes: a crashed complete FOLD stage
    * (`compact.tmp`) found on entry is finished first — it is
    * content-preserving, so committing it is always safe, and leaving
    * it behind would let it clobber a LATER rewrite when some future
    * fold resumes it. A caller-NAMED stage (`tmpName != compact.tmp`,
    * the retrain path) is the opposite case: its content pairs with
    * sibling state this layer cannot see (rebuilt centroids), so an
    * orphan found on entry is DISCARDED, never resumed here — the
    * CALLER owns the resume decision and must make it BEFORE calling
    * this (ADVICE r12 high: once the crashed commit has begun deleting
    * original dirs, the stage holds those rows' only copy, and a
    * discard-and-restage would silently rebuild from the surviving
    * subset — see [[graft.streaming.EmbedStream.retrainIvf]]'s
    * self-contained-stage resume, which commits such a stage from the
    * sibling state staged INSIDE it). The discard here is safe exactly
    * because a destructive commit implies the caller's durable repair
    * marker is set, and the caller's resume path runs first. */
  def stageRewriteBatchDirs(s: org.apache.spark.sql.SparkSession,
      root: String, upTo: Long, targetBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil,
      rewrite: DataFrame => DataFrame = identity,
      minDirs: Int = 1, tmpName: String = "compact.tmp"): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return false
    // finish (or discard) a crashed FOLD swap before planning — even
    // when staging under a custom name, a stale complete fold stage
    // must not be left to clobber this rewrite's output later — and
    // sweep markers a crashed swap stranded inside live batch dirs: a
    // legacy '='-form marker left by a crash between rename and
    // marker-delete breaks partition inference for EVERY reader, and
    // the fold-only path (compactIndex → foldBatchDirs) would never
    // repair it otherwise (ADVICE r13 medium — only retrainIvf's
    // entry repairStore did)
    resumeFold(fs, rootP, new Path(rootP, "compact.tmp"))
    sweepStrandedMarkers(fs, rootP)
    val tmp = new Path(rootP, tmpName)
    if (tmpName != "compact.tmp") fs.delete(tmp, true) // orphan: discard
    val folds = batchDirs(fs, rootP).filter(_._1 < upTo)
    if (folds.length < minDirs) return false
    val m = folds.map(_._1).max
    val df = rewrite(s.read.option("basePath", root)
      .parquet(folds.map(_._2.toString): _*)
      .drop("batch"))
    fs.delete(tmp, true)
    val n = planFileCount(df, targetBytes)
    // with partition columns, hash on them so each partition value's
    // rows concentrate in one task → ~one output file per value
    val rep = if (partitionCols.isEmpty) df.repartition(n)
      else df.repartition(n, partitionCols.map(col): _*)
    val w = rep.write.mode("overwrite")
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(tmp.toString)
    // record the exact input ids the stage was derived from BEFORE the
    // durable marker: a caller deciding whether a crashed stage is
    // resumable must distinguish "the store lost some of these ids"
    // (a commit began — resume is the only lossless repair) from "the
    // store gained ids since" (it moved on — the stage is stale and a
    // resume would duplicate or tear; see
    // [[graft.streaming.EmbedStream.resumeStagedRetrain]])
    val inputsOut = fs.create(new Path(tmp, "_staged_inputs"), true)
    inputsOut.write(folds.map(_._1).sorted.mkString(",").getBytes("UTF-8"))
    inputsOut.close()
    fs.create(new Path(tmp, s"_folded_upto.$m"), true).close()
    true
  }

  /** The input batch ids recorded by [[stageRewriteBatchDirs]], or None
    * for a stage created before the record existed. */
  def stagedInputs(s: org.apache.spark.sql.SparkSession, root: String,
      tmpName: String): Option[Set[Long]] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$tmpName/_staged_inputs")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try {
        in.readFully(buf)
        Some(new String(buf, "UTF-8").split(",")
          .filter(_.nonEmpty).map(_.toLong).toSet)
      } finally in.close()
    }
  }

  /** Current batch ids of a store (one listing). */
  def batchIds(s: org.apache.spark.sql.SparkSession, root: String): Set[Long] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) Set.empty
    else batchDirs(fs, rootP).map(_._1).toSet
  }

  /** Swap phase of [[rewriteBatchDirs]]: completes a stage left by
    * [[stageRewriteBatchDirs]] (delete originals ≤ m, rename) — metadata
    * ops only. Returns true iff a complete stage existed. */
  def commitStagedRewrite(s: org.apache.spark.sql.SparkSession,
      root: String, tmpName: String = "compact.tmp"): Boolean = {
    import org.apache.hadoop.fs.Path
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new Path(rootP, tmpName)
    val complete = stageMarker(fs, tmp).isDefined &&
      fs.exists(new Path(tmp, "_SUCCESS"))
    if (complete) finishFold(fs, rootP, tmp)
    complete
  }

  /** Repair a batch-dir store's crashed FOLD swap, if any, WITHOUT
    * planning a new fold: completes a `compact.tmp` stage left with its
    * durable marker + _SUCCESS, discards an incomplete one, and clears
    * crash-residue `_fold_inprogress`. Any maintenance or rewrite pass
    * that LISTS the store's batch dirs itself must run this first —
    * a crashed fold commit can leave a subset of dirs on disk (the
    * stage holding the rest), and a pass that plans against that
    * listing would rebuild from the subset and commit the loss
    * ([[graft.streaming.EmbedStream.retrainIvf]]'s entry repair; found
    * by the r13 crash-kill sweep, the fold-mode twin of the ADVICE r12
    * high). [[stageRewriteBatchDirs]] runs the same two repairs
    * (resume + marker sweep) at entry, so the fold-only path
    * (compactIndex → foldBatchDirs) self-heals too. */
  def repairStore(s: org.apache.spark.sql.SparkSession, root: String): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return
    resumeFold(fs, rootP, new org.apache.hadoop.fs.Path(rootP, "compact.tmp"))
    sweepStrandedMarkers(fs, rootP)
  }

  /** Sweep stage markers stranded INSIDE live batch dirs by a crash
    * between a swap's rename and its marker delete — the legacy '='
    * form additionally breaks partition inference for every reader of
    * the store (names with '=' are NOT hidden; the r13 crash-kill
    * find). Idempotent, metadata-only. */
  private def sweepStrandedMarkers(fs: org.apache.hadoop.fs.FileSystem,
      rootP: org.apache.hadoop.fs.Path): Unit =
    batchDirs(fs, rootP).foreach { case (_, d) =>
      fs.listStatus(d).map(_.getPath)
        .filter(_.getName.startsWith("_folded_upto"))
        .foreach(p => fs.delete(p, false))
    }

  /** Monotonic swap counter of a batch-dir store, bumped by every fold/
    * rewrite COMMIT before its first destructive step. A reader whose
    * listing could race a swap brackets its read with this: the
    * delete-originals → rename window shows a SUBSET of the store's
    * dirs with no exception thrown, so exception-based retries alone
    * cannot see it — but any read that straddles the window also
    * straddles the stamp bump. 0 for a store that has never folded. */
  def storeStamp(s: org.apache.spark.sql.SparkSession, root: String): Long =
    storeState(s, root)._1

  /** (swap counter, swap-in-progress) from ONE listing. The counter
    * alone cannot protect a reader BORN inside the delete→rename
    * window (its pre- and post-stamp both read the already-bumped
    * value), so the commit also holds a `_fold_inprogress` marker
    * across the destructive steps — readers require it ABSENT on both
    * bracket sides, exactly the `_retrain_pending` discipline. */
  def storeState(s: org.apache.spark.sql.SparkSession,
      root: String): (Long, Boolean) = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) (0L, false)
    else {
      val names = fs.listStatus(rootP).map(_.getPath.getName)
      (maxStamp(names), names.contains("_fold_inprogress"))
    }
  }

  private def maxStamp(names: Iterable[String]): Long =
    names.filter(_.startsWith("_fold_stamp."))
      .flatMap(_.drop("_fold_stamp.".length).toLongOption)
      .foldLeft(0L)(math.max)

  /** Run `build` to a STAMP-STABLE result across concurrent folds of
    * `roots`: re-attempts on FileNotFound in the cause chain (a listed
    * dir deleted before its read) AND on a fold commit observed via
    * [[storeStamp]] on either side (a dir deleted BEFORE the listing —
    * the silent-subset case no exception ever surfaces). `build` must
    * MATERIALIZE its result (collect/count/localCheckpoint) for the
    * bracket to cover action-time reads. Supersedes bare
    * [[retryFileGone]] for serving-path reads of fold-maintained
    * stores; exhaustion throws with the last failure as cause. */
  def stableAcrossFolds[T](s: org.apache.spark.sql.SparkSession,
      roots: Seq[String], attempts: Int = 8, backoffMs: Long = 50L)(
      build: => T): T = {
    var attempt = 0
    var lastEx: Throwable = null
    while (attempt < attempts) {
      val pre = roots.map(storeState(s, _))
      if (pre.forall(!_._2)) { // no swap in progress on entry
        val res =
          try Some(build)
          catch {
            case e: Throwable if causeChainHasFileNotFound(e) =>
              lastEx = e; None
          }
        res match {
          case Some(r) if {
            val post = roots.map(storeState(s, _))
            post == pre && post.forall(!_._2)
          } => return r
          case _ => () // raced a swap (exception, subset, or marker): retry
        }
      }
      attempt += 1
      if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
    }
    throw new IllegalStateException(
      s"no fold-stable read of ${roots.mkString(", ")} after " +
        s"$attempts attempts", lastEx)
  }

  private def bumpStoreStamp(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val next = maxStamp(fs.listStatus(root).map(_.getPath.getName)) + 1
    fs.create(new org.apache.hadoop.fs.Path(root, s"_fold_stamp.$next"),
      true).close()
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("_fold_stamp.") &&
        p.getName.drop("_fold_stamp.".length).toLongOption.exists(_ < next))
      .foreach(p => fs.delete(p, false))
  }

  private def batchDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith("batch=")) None
        else name.drop("batch=".length).toLongOption.map(_ -> st.getPath)
      }

  private def stageMarker(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(tmp)) None
    else fs.listStatus(tmp).map(_.getPath.getName)
      // accept the legacy '=' separator too: a stage created by a
      // pre-rename build mid-commit must stay resumable (discarding it
      // is the loss class the marker protocol exists to prevent)
      .find(n => n.startsWith("_folded_upto.") || n.startsWith("_folded_upto="))
      .flatMap(_.drop("_folded_upto.".length).toLongOption)

  /** Swap a fully-staged fold in: delete originals ≤ m, rename. The
    * marker rides inside the renamed dir (underscore-prefixed files are
    * invisible to parquet readers) and is removed last, so there is no
    * instant where the stage looks discardable while originals are
    * already gone. */
  private def finishFold(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path): Unit =
    stageMarker(fs, tmp).foreach { m =>
      // marker FIRST, stamp second (ADVICE r12 medium: the reverse
      // order had a gap — a reader whose pre-bracket listing landed
      // between the bump and the marker saw (bumped stamp, no marker),
      // and its post-check saw the same, accepting a mid-swap subset).
      // With marker-before-bump there is no gap: a pre-check before the
      // marker reads the OLD stamp, so the bump fails its post-check;
      // any later pre-check sees the marker until it is deleted LAST,
      // by which point the swap is fully committed.
      val inprog = new org.apache.hadoop.fs.Path(root, "_fold_inprogress")
      fs.create(inprog, true).close()
      bumpStoreStamp(fs, root)
      batchDirs(fs, root).filter(_._1 <= m).foreach(d => fs.delete(d._2, true))
      val live = new org.apache.hadoop.fs.Path(root, s"batch=$m")
      fs.rename(tmp, live)
      fs.delete(new org.apache.hadoop.fs.Path(live, s"_folded_upto.$m"), false)
      fs.delete(new org.apache.hadoop.fs.Path(live, s"_folded_upto=$m"), false)
      fs.delete(inprog, false)
    }

  private def resumeFold(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path): Unit = {
    stageMarker(fs, tmp) match {
      case Some(_) if fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")) =>
        finishFold(fs, root, tmp) // crashed mid-swap: stage is complete
      case _ => fs.delete(tmp, true) // crashed mid-stage: originals intact
    }
    // a leftover in-progress marker is crash residue (maintenance
    // passes serialize by contract) — clear it so readers stop spinning
    fs.delete(new org.apache.hadoop.fs.Path(root, "_fold_inprogress"), false)
  }
}
