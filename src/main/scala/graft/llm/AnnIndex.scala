package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index for exact cosine top-k — the ANN twin of
  * [[MinhashIndex]]: build once, query many times, with the corpus's
  * clustering work materialized into graft tables instead of recomputed
  * per query batch.
  *
  * Layout under `indexPath`:
  *  - `centroids` — (cid, dim, cx): the coarse centroid set as unit
  *    vectors (tiny: nCentroids × dims rows);
  *  - `cellstats` — (cid, cosr, sinr): each cell's angular radius, carried
  *    as (cos r, sin r) so the probe bound never round-trips through
  *    acos/cos;
  *  - `cells` — (cid, nid, uvec): every corpus vector, UNIT-normalized in
  *    double, RANGE-PARTITIONED BY `cid` — the property the whole design
  *    exists for: a query's probed cells translate to a partition-pruned
  *    scan, so at 100 TB a query batch reads only the few cells whose
  *    angular bound can still matter, straight off the manifest.
  *
  * Queries stay EXACT (same angular-bound pruning as [[Ann.ivfTopK]]):
  * pass 1 scores each query's nearest cell exhaustively for a provisional
  * kth-best threshold; pass 2 probes only cells whose bound beats it.
  * Skipped cells provably hold no top-k member. The probed-cell id sets
  * are collected to literals (bounded by nCentroids — metadata-scale by
  * construction) so partition pruning happens at scan PLANNING, not as a
  * runtime join.
  */
object AnnIndex {

  private def centroidsPath(p: String) = s"$p/centroids"
  private def statsPath(p: String) = s"$p/cellstats"
  private def cellsPath(p: String) = s"$p/cells"
  private def assignPath(p: String) = s"$p/assign"

  /** GENERATION pointer: when present, the four index tables live under
    * `indexPath/<gen>/` instead of `indexPath/` directly. The pointer file
    * is swapped with one atomic rename — that is what makes a deferred
    * [[rebuildIfDue]] an ATOMIC swap: the new generation is built fully
    * off to the side while syncs and queries keep using the old one, and
    * a reader sees either the complete old index or the complete new one,
    * never a half-overwritten table set (the in-place [[build]] rewrites
    * all four tables non-atomically, which is fine for first builds but
    * not for rebuilds under live traffic). Pre-generational indexes have
    * no pointer: their tables stay at the root ("gen 0" = root layout). */
  private val GEN_POINTER = "_graft_ann_gen"

  // Every pointer read/write normalizes the index path the same way the
  // sidecar and lock do (scheme stripped, trailing slash dropped): a raw
  // 'file:/x' or '/x/' spelling from SQL CALL args must resolve the SAME
  // generation as the sync/query pipeline's '/x', or a rebuild could
  // swap a pointer nobody else reads while resetting the shared sidecar.
  private def readGen(indexPath: String): Option[String] = {
    val p = java.nio.file.Paths.get(
      graft.meta.SnapshotManagement.normalize(indexPath), GEN_POINTER)
    if (!java.nio.file.Files.exists(p)) None
    else Some(new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim).filter(_.nonEmpty)
  }

  private def writeGen(indexPath: String, gen: String): Unit = {
    val dir = java.nio.file.Paths.get(
      graft.meta.SnapshotManagement.normalize(indexPath))
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, s".$GEN_POINTER", ".tmp")
    java.nio.file.Files.write(tmp,
      gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, dir.resolve(GEN_POINTER),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The directory the CURRENT generation's tables live under
    * (normalized — stable across path spellings). */
  private[graft] def tableRoot(indexPath: String): String = {
    val norm = graft.meta.SnapshotManagement.normalize(indexPath)
    readGen(norm).fold(norm)(g => s"$norm/$g")
  }

  /** Reassemble each vector's unit components from its exploded rows into
    * an array (sorted by dim; struct sort is lexicographic on (dim, nx)
    * and dim is unique per vector; `.getField` over the struct array
    * extracts the components without a higher-order lambda). */
  private def unitVecArray(cu: DataFrame): DataFrame =
    cu.groupBy("nid")
      .agg(array_sort(collect_list(struct(col("dim"), col("nx")))).as("s"))
      .select(col("nid"), col("s").getField("nx").as("uvec"))

  /** Build (or rebuild) the index tables from `corpus`. One pass computes
    * unit rows; centroids refine per `spark.graft.ann.ivf.kmeansIters`
    * (default 1); assignments write range-partitioned by cell. */
  def build(
      spark: SparkSession, indexPath: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, hashBucketNum: Int = 4): Unit =
    buildAt(spark, tableRoot(indexPath), corpus, idCol, vecCol, nCentroids,
      hashBucketNum)

  /** [[build]]'s body, targeting an explicit table root — [[rebuildIfDue]]
    * points it at a STAGING generation directory. */
  private def buildAt(
      spark: SparkSession, indexPath: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, hashBucketNum: Int): Unit = {
    val cu = Ann.unitRows(corpus, idCol, vecCol, "nid", "nx")
      .transform(Checkpoints.stabilize)
    val cents = Checkpoints.stabilize(
      Ann.buildCentroids(corpus, idCol, cu, nCentroids))
    val cellAssign = Checkpoints.stabilize(
      Ann.assignCells(cents)(cu, "nid", "nx"))
    val clamp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => greatest(lit(-1.0d), least(lit(1.0d), c))
    // cnt = live members per cell: with the radius it gives topK a
    // metadata-only kth-best lower bound (no cell scanned to get a
    // threshold). Probing correctness needs cnt <= true count, never the
    // reverse — build writes it exact, sync only ever DECREMENTS it.
    val radii = cellAssign.groupBy("cid")
      .agg(clamp(min(col("csim"))).as("cosr"), count(lit(1)).as("cnt"))
      .withColumn("sinr", sqrt(greatest(lit(0.0d),
        lit(1.0d) - col("cosr") * col("cosr"))))
      .select("cid", "cosr", "sinr", "cnt")
    val unitVec = unitVecArray(cu)
    val cells = cellAssign.select("cid", "nid").join(unitVec, "nid")
      .select(col("cid"), col("nid"), col("uvec"))
    cents.write.format("graft").mode("overwrite").save(centroidsPath(indexPath))
    radii.write.format("graft").mode("overwrite").save(statsPath(indexPath))
    // cells: RANGE-partitioned by cid (partition-pruned probes) AND
    // PK-bucketed by nid (per-vector upsert/tombstone for syncFromTable).
    // hashBucketNum is a caller choice: the creation-time guess goes stale
    // at corpus growth, and REBUCKET can fix it online — but large builds
    // should size it up front
    cells.write.format("graft").mode("overwrite")
      .option("rangePartitions", "cid")
      .option("hashPartitions", "nid")
      .option("hashBucketNum", hashBucketNum.toString)
      .save(cellsPath(indexPath))
    // assign: (nid -> cid), PK nid — the sync path's O(1)-per-id lookup of
    // which SINGLE cell holds a touched vector's old row, so re-assignment
    // tombstones exactly one (cid, nid) instead of fanning out to every
    // cell. Tiny next to cells (two longs/row vs a full unit vector).
    cellAssign.select(col("nid"), col("cid")).write.format("graft")
      .mode("overwrite")
      .option("hashPartitions", "nid")
      .option("hashBucketNum", hashBucketNum.toString)
      .save(assignPath(indexPath))
  }

  /** Keep the index in lockstep with a graft CORPUS table via its change
    * feed — the ANN twin of [[MinhashIndex.syncFromTable]]. Touched
    * vectors re-assign to their nearest EXISTING centroid; the `assign`
    * table pins down the SINGLE cell holding each touched id's previous
    * row, so re-assignment tombstones exactly one (cid, nid) per moved or
    * deleted id — tombstone rows per sync are bounded by |touched|, never
    * |touched|×|cells|. Cell stats stay EXACT across syncs: a conservative
    * grow-only fold lands first (crash-safe — the bound must be valid
    * before fresh members become visible), then, once the cells table
    * holds the post-sync truth, the touched cells are re-statted exactly
    * via one partition-pruned scan of just those cells ([[restatCells]]) —
    * so stats never decay toward probe-everything between full builds.
    * Centroids stay fixed between builds. First call (no sidecar) builds
    * from the full table. Returns the corpus version the index now
    * reflects. */
  def syncFromTable(
      spark: SparkSession, indexPath: String,
      corpusPath: String, idCol: String, vecCol: String,
      nCentroids: Int = 16, hashBucketNum: Int = 4): Long = {
    import graft.meta.SnapshotManagement
    val normCorpus = SnapshotManagement.normalize(corpusPath)
    val normIdx = SnapshotManagement.normalize(indexPath)
    // pinned ONCE: every table this sync touches belongs to this
    // generation, even if a concurrent rebuild flips the pointer mid-sync
    val root = tableRoot(indexPath)
    val current = SnapshotManagement.snapshot(normCorpus).version
    // one sidecar read: synced version + cumulative ids touched since the
    // last FULL build (a build resets the counter) + the rebuild-due mark
    val (last, prevChurn, prevDue) = SyncSidecar.readValidatedFull(
      normIdx, SYNC_FILE, normCorpus, current)
    val corpusNow = spark.read.format("graft").load(corpusPath)
    var churnOut = prevChurn
    var dueOut = prevDue
    if (last < 0 || !SnapshotManagement.exists(assignPath(root))) {
      churnOut = 0L
      dueOut = false
      // no sidecar (first sync) OR a pre-assign-table index layout: both
      // mean incremental bookkeeping can't be trusted — rebuild in full
      build(spark, indexPath, corpusNow, idCol, vecCol, nCentroids,
        hashBucketNum)
    } else if (current > last) {
      val touched = graft.tables.ChangeFeed
        .changes(spark, normCorpus, last + 1, current)
        .select(col(s"`$idCol`")).distinct()
        .transform(Checkpoints.stabilize)
      if (!touched.isEmpty) {
        // CHURN-TRIGGERED REBUILD, DEFERRED: incremental syncs keep the
        // index EXACT but never move centroids, so sustained churn slowly
        // unbalances the cells and the angular bound prunes less (a pure
        // efficiency decay — the remaining silent-degradation mode after
        // the r12 re-stat fix). Track cumulative touched ids since the
        // last full build in the sidecar; once they reach
        // `rebuildChurnFraction` of the live corpus (Σcnt from the tiny
        // stats table — never a corpus scan), mark "rebuild due" and KEEP
        // SYNCING INCREMENTALLY — the sync path's latency stays O(touched)
        // no matter how long the rebuild is deferred, because the decay is
        // efficiency-only. [[rebuildIfDue]] (operator CALL, or
        // [[maintainStream]] with autoRebuild=true) pays the build off the
        // sync path and atomically swaps generations. 0 disables.
        val churnFrac = spark.conf
          .getOption("spark.graft.ann.index.rebuildChurnFraction")
          .map(_.toDouble).getOrElse(0.5)
        // disabled (0) skips ALL bookkeeping — no touched.count() job, no
        // stats scan — the hot sync path pays nothing for an off feature
        if (churnFrac > 0 && !dueOut) {
          val newChurn = churnOut + touched.count()
          val sumRow = spark.read.format("graft").load(statsPath(root))
            .agg(sum(col("cnt"))).collect().head
          // sum over zero rows is NULL (index built from an empty corpus)
          val liveSize = math.max(1L,
            if (sumRow.isNullAt(0)) 0L else sumRow.getLong(0))
          if (newChurn >= churnFrac * liveSize) dueOut = true
          churnOut = newChurn
        }
        // already-due syncs skip ALL churn bookkeeping: the flag is
        // sticky, rebuildIfDue resets the counter unconditionally on
        // swap, and nothing in between reads it — counting touched ids
        // would be a pure extra job on the hot O(touched) path
        val cents = spark.read.format("graft")
          .load(centroidsPath(root)).transform(Checkpoints.stabilize)
        val live = corpusNow.join(broadcast(touched), Seq(idCol), "left_semi")
        val cu = Ann.unitRows(live, idCol, vecCol, "nid", "nx")
          .transform(Checkpoints.stabilize)
        val assignNew = Checkpoints.stabilize(
          Ann.assignCells(cents)(cu, "nid", "nx"))
        val unitVec = unitVecArray(cu)
        val newRows = assignNew.select("cid", "nid").join(unitVec, "nid")
          .select(col("cid"), col("nid"), col("uvec"))
        // the assign table names each touched id's ONE previous cell: a
        // bucketed semi-join on the (tiny, PK-nid) assign table, never a
        // cells-table scan. Tombstone exactly that (cid, nid) when the id
        // moved cells, was deleted, or went zero-norm; an id that stays in
        // its cell needs no marker (the fresh upsert row supersedes it),
        // and a brand-new insert has no old cell at all. Rows written per
        // sync: |new assignments| + |moved ∪ deleted| ≤ 2·|touched|.
        val touchedN = touched.select(col(s"`$idCol`").as("nid"))
        val oldAssign = spark.read.format("graft").load(assignPath(root))
          .join(broadcast(touchedN), Seq("nid"), "left_semi")
          .select(col("nid"), col("cid").as("oldCid"))
          .transform(Checkpoints.stabilize)
        val moved = oldAssign
          .join(assignNew.select(col("nid"), col("cid").as("newCid")),
            Seq("nid"), "left_outer")
          .filter(col("newCid").isNull || col("newCid") =!= col("oldCid"))
        val tomb = moved.select(col("oldCid").as("cid"), col("nid"),
          lit(true).as(graft.meta.Tombstones.COL))
        val delta = newRows.unionByName(tomb, allowMissingColumns = true)
        // assign-table delta: fresh assignments upsert; ids with an old
        // assignment and no new one (deleted / zero-norm) tombstone out
        val assignDelta = assignNew.select(col("nid"), col("cid"))
          .unionByName(
            oldAssign.join(assignNew.select("nid"), Seq("nid"), "left_anti")
              .select(col("nid"), col("oldCid").as("cid"),
                lit(true).as(graft.meta.Tombstones.COL)),
            allowMissingColumns = true)
        // RADII FIRST, cells second: a crash (or concurrent topK) between
        // the two writes must land on the conservative side. An over-grown
        // radius with the old cells only costs extra probes; the reverse
        // order would expose a window where a fresh far-from-centroid
        // member is visible while the bound still claims the old, tighter
        // radius — and the probe would skip its cell, breaking exactness.
        // Grow-only fold of the new members' csims into the stored stats
        // (tiny table — full overwrite is the honest cost).
        val stored = spark.read.format("graft").load(statsPath(root))
        val grown = assignNew.groupBy("cid")
          .agg(greatest(lit(-1.0d), least(lit(1.0d), min(col("csim"))))
            .as("newCosr"))
        // cnt fold mirrors the radii's conservatism, in the direction that
        // keeps the METADATA THRESHOLD valid: cnt must never exceed the
        // cell's true live membership, so sync only DECREMENTS (members
        // leaving their old cell), never counts arrivals — an undercount
        // merely weakens the kth-best bound (more probing), an overcount
        // would let topK skip a cell holding a true neighbor. Replays of a
        // crashed window double-decrement at worst: still conservative.
        // The next full build restores exact counts, like the radii.
        val losses = moved.groupBy(col("oldCid").as("cid"))
          .agg(count(lit(1)).as("loss"))
        // FULL outer: a cell empty at build time (no stored radius) that
        // receives its first member now must enter the stats — an inner or
        // left fold would hide it from the probe's radii join and silently
        // break exactness
        val folded = stored.join(grown, Seq("cid"), "full_outer")
          .join(losses, Seq("cid"), "left_outer")
          .select(col("cid"),
            least(coalesce(col("cosr"), col("newCosr")),
              coalesce(col("newCosr"), col("cosr"))).as("cosr"),
            greatest(lit(0L),
              coalesce(col("cnt"), lit(0L)) - coalesce(col("loss"), lit(0L)))
              .as("cnt"))
          .withColumn("sinr", sqrt(greatest(lit(0.0d),
            lit(1.0d) - col("cosr") * col("cosr"))))
          .select("cid", "cosr", "sinr", "cnt")
          .transform(Checkpoints.stabilize)
        folded.write.format("graft").mode("overwrite")
          .save(statsPath(root))
        val normCells = SnapshotManagement.normalize(cellsPath(root))
        SnapshotManagement.withRewriteTransaction(normCells) { txn =>
          graft.commands.UpsertCommand.runDeltaIn(
            spark, normCells, delta, Map.empty, txn)
        }
        // assign LAST (after cells, before the sidecar): a crash anywhere
        // in between replays the same feed window next sync, and every
        // step is idempotent — re-tombstoning an already-dead (cid, nid)
        // and re-upserting the same rows are both no-ops under the merge
        // reader, whether the replay sees the stale or the fresh assign
        // state
        val normAssign = SnapshotManagement.normalize(assignPath(root))
        SnapshotManagement.withRewriteTransaction(normAssign) { txn =>
          graft.commands.UpsertCommand.runDeltaIn(
            spark, normAssign, assignDelta, Map.empty, txn)
        }
        // threshold-gated compaction (the trigger plain upserts get): sync
        // deltas + death warrants otherwise accumulate in every cell range
        // partition between full builds and every topK merge-read pays the
        // fan-in. Safe under the crash-replay contract — compaction is a
        // semantics-preserving rewrite, and a replayed warrant for a row
        // the compaction already resolved away is a no-op merge-side.
        graft.commands.CompactionCommand.run(spark, normCells, force = false)
        graft.commands.CompactionCommand.run(spark, normAssign, force = false)
        // EXACT RE-STAT of the touched cells, now that the cells table holds
        // the post-sync truth. The grow-only fold above exists only for the
        // crash window (stats must be conservative BEFORE fresh members
        // become visible); left alone it decays — radii grow-only, cnt
        // decrement-only — until the metadata threshold t0 degrades to
        // probe-every-cell. One partition-pruned scan of exactly the cells
        // that gained or lost members (cost ∝ touched cells, the same order
        // as the sync itself) restores build-exact (cosr, cnt) for them; a
        // crash before this write just leaves the valid conservative stats
        // for the replay to tighten.
        restatCells(spark, root, cents,
          assignNew.select("cid").unionByName(moved.select(col("oldCid")
            .as("cid"))).distinct().collect().map(_.get(0)).toSeq)
      }
    }
    if (current != last) {
      // generation re-check: if a concurrent rebuild flipped the pointer
      // while this sync ran, its sidecar (version = rebuild's corpus pin,
      // churn 0) must WIN — this sync wrote into the superseded
      // generation. Overwriting it here would claim versions the new
      // generation never saw (topK would silently miss them), so the
      // CHECK AND WRITE are atomic against rebuildIfDue's swap+write
      // under the per-index lock (JVM monitor + OS file lock, so a
      // rebuild issued from ANOTHER driver process serializes too). The
      // skipped window replays next sync; every sync step is idempotent
      // under replay by design.
      withIndexLock(normIdx) {
        if (tableRoot(indexPath) == root)
          SyncSidecar.write(normIdx, SYNC_FILE, normCorpus, current,
            churnOut, rebuildDue = dueOut)
      }
    }
    current
  }

  // Serializes the sidecar-write-vs-generation-swap decision: a JVM
  // monitor (threads in this process — maintainStream sync vs autoRebuild
  // daemon) NESTING an OS file lock at the index root (other processes —
  // CALL ann_rebuild_if_due can legitimately run from a different
  // driver). Both guarded sections are a couple of tiny file writes, so
  // the file lock is held for microseconds; the monitor prevents
  // same-JVM OverlappingFileLockException.
  private val indexLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withIndexLock[T](normIdx: String)(body: => T): T =
    indexLocks.computeIfAbsent(normIdx, _ => new Object).synchronized {
      val dir = java.nio.file.Paths.get(normIdx)
      java.nio.file.Files.createDirectories(dir)
      val ch = java.nio.channels.FileChannel.open(
        dir.resolve(s"$GEN_POINTER.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try body finally l.release()
      } finally ch.close()
    }

  /** Is a deferred churn-triggered rebuild pending for this index? (One
    * sidecar read; false for a never-synced or pre-flag index.) */
  def rebuildDue(indexPath: String): Boolean =
    SyncSidecar.readRebuildDue(
      graft.meta.SnapshotManagement.normalize(indexPath), SYNC_FILE)

  // one rebuild in flight per index per JVM — a second concurrent call
  // returns false instead of double-building
  private val rebuildActive =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Run the deferred churn-triggered rebuild if one is due (or `force`):
    * builds a FRESH GENERATION of the four index tables off to the side —
    * syncs and topK keep using the current generation, completely
    * unblocked — then atomically swaps the generation pointer and resets
    * the sync sidecar to the corpus version the rebuild pinned. A sync
    * that raced the swap replays its window against the new generation
    * (idempotent); generations older than the one just replaced are
    * deleted, and stranded staging dirs from a CRASHED builder (ahead of
    * the pointer, referenced by nothing) are swept before building.
    * Returns true iff a rebuild ran to completion; false when no rebuild
    * is due or ANOTHER builder — this JVM or any other process — already
    * holds the build. */
  def rebuildIfDue(
      spark: SparkSession, indexPath: String, corpusPath: String,
      idCol: String, vecCol: String,
      nCentroids: Int = 16, hashBucketNum: Int = 4,
      force: Boolean = false): Boolean = {
    import graft.meta.SnapshotManagement
    val normIdx = SnapshotManagement.normalize(indexPath)
    val normCorpus = SnapshotManagement.normalize(corpusPath)
    if (!force && !rebuildDue(indexPath)) return false
    if (!rebuildActive.add(normIdx)) return false
    try {
      // CROSS-PROCESS single-flight: an OS file lock held for the WHOLE
      // build + swap, not just the pointer write. CALL ann_rebuild_if_due
      // may legitimately run from another driver; without this, two
      // builders would read the same old pointer, buildAt into the SAME
      // staging dir with interleaved overwrites, and the loser would keep
      // rewriting the winner's now-live generation after the swap —
      // silently breaking topK exactness. tryLock, not lock: the second
      // builder reports "not rebuilt" instead of queueing a redundant
      // full build (same contract as the JVM-local rebuildActive guard;
      // OverlappingFileLockException covers a same-JVM holder outside
      // that guard, e.g. a test pinning the lock).
      val dir = java.nio.file.Paths.get(normIdx)
      java.nio.file.Files.createDirectories(dir)
      val ch = java.nio.channels.FileChannel.open(
        dir.resolve(s"$GEN_POINTER.buildlock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val bl =
        try ch.tryLock()
        catch {
          case _: java.nio.channels.OverlappingFileLockException => null
        }
      if (bl == null) { ch.close(); return false }
      try {
        val current = SnapshotManagement.snapshot(normCorpus).version
        val oldGen = readGen(indexPath)
        val curNum = oldGen.map(_.stripPrefix("gen-").toLong).getOrElse(0L)
        // sweep CRASHED staging dirs before building: a generation numbered
        // ahead of the pointer is a build that died before its swap — no
        // reader references it, and with the build lock held no writer can
        // be mid-build in it. Left alone it would strand disk space until
        // rebuilds happen to reuse its exact number.
        listGenDirs(dir).foreach { case (n, p) =>
          if (n > curNum) graft.write.TransactionalWrite.deleteRecursively(p)
        }
        val nextGen = s"gen-${curNum + 1L}"
        buildAt(spark, s"$normIdx/$nextGen",
          spark.read.format("graft").load(corpusPath), idCol, vecCol,
          nCentroids, hashBucketNum)
        // THE swap: one atomic rename; then the sidecar records the rebuild's
        // corpus pin with churn reset. Between the two writes a crash leaves
        // the new generation live with the OLD sidecar — the next sync
        // replays [last+1, current] into the new generation, idempotently.
        // Swap + sidecar share the per-index lock with the sync path's
        // check-and-write: without it a sync that applied a NEWER corpus
        // version into the old generation could land its sidecar after this
        // one, claiming versions the new generation never saw.
        withIndexLock(normIdx) {
          // defense-in-depth: the pointer cannot move while the build lock
          // is held (every writer path takes it), so a moved pointer means
          // out-of-band surgery — abandon the staging build loudly rather
          // than swap over state this build never saw
          require(readGen(indexPath) == oldGen,
            s"generation pointer of $normIdx moved during a locked rebuild " +
            s"(was $oldGen) — not swapping; the staging dir $nextGen is " +
            "left for the next rebuild to sweep")
          writeGen(indexPath, nextGen)
          SyncSidecar.write(normIdx, SYNC_FILE, normCorpus, current, 0L,
            rebuildDue = false)
        }
        // keep the generation just replaced (in-flight readers may hold its
        // file lists); drop anything older. Root-layout tables from
        // pre-generational indexes are left in place.
        val keep = Set(nextGen) ++ oldGen
        listGenDirs(dir).foreach { case (_, p) =>
          if (!keep.contains(p.getFileName.toString))
            graft.write.TransactionalWrite.deleteRecursively(p)
        }
        true
      } finally { bl.release(); ch.close() }
    } finally rebuildActive.remove(normIdx)
  }

  /** (number, path) of every `gen-N` directory under `dir`. */
  private def listGenDirs(
      dir: java.nio.file.Path): Seq[(Long, java.nio.file.Path)] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val out = Seq.newBuilder[(Long, java.nio.file.Path)]
    val ls = java.nio.file.Files.list(dir)
    try ls.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith("gen-") && java.nio.file.Files.isDirectory(p)) {
        try out += ((n.stripPrefix("gen-").toLong, p))
        catch { case _: NumberFormatException => () }
      }
    } finally ls.close()
    out.result()
  }

  private val SYNC_FILE = "_graft_ann_sync.json"

  /** Continuous maintenance: tail the corpus table's change feed and run
    * [[syncFromTable]] once per microbatch — see [[graft.streaming.ContinuousSync]] for
    * the liveness-only contract (CDF rows are discarded; each sync
    * re-reads its exact sidecar window under its own pins). Stop the
    * returned query to stop maintenance. */
  def maintainStream(
      spark: SparkSession, indexPath: String, corpusPath: String,
      idCol: String, vecCol: String, checkpointDir: String,
      nCentroids: Int = 16, hashBucketNum: Int = 4,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"),
      autoRebuild: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.ContinuousSync.tail(spark, corpusPath, indexPath, checkpointDir, trigger,
      "ann") {
      syncFromTable(spark, indexPath, corpusPath, idCol, vecCol, nCentroids,
        hashBucketNum)
      // autoRebuild: pay the deferred churn rebuild on a DAEMON thread so
      // the microbatch loop keeps syncing at O(touched) latency while the
      // build runs; rebuildIfDue's single-flight guard makes repeated
      // microbatch kicks no-ops until the running build finishes and swaps
      if (autoRebuild && rebuildDue(indexPath)) {
        val t = new Thread(() => {
          try rebuildIfDue(spark, indexPath, corpusPath, idCol, vecCol,
            nCentroids, hashBucketNum)
          catch { case e: Throwable => System.err.println(
            s"[graft-ann] background rebuild of $indexPath failed: " +
            e.getMessage) }
        }, s"graft-ann-rebuild-$indexPath")
        t.setDaemon(true)
        t.start()
      }
      ()
    }

  /** Recompute (cosr, sinr, cnt) EXACTLY for `touchedCids` from the live
    * cells table and overwrite just those stats rows. `touchedCids` is
    * bounded by nCentroids (metadata-scale), so the isin literal prunes the
    * cells scan to the touched range partitions at planning. A touched cell
    * with zero live members keeps a stats row with cnt=0 and radius 0
    * (cosr=1): it claims nothing for the threshold, its probe bound
    * collapses to cos(a), and probing it reads no rows — whereas dropping
    * the row would make topK's conservative missing-stats default (ub=1)
    * probe it on every query forever. */
  private def restatCells(
      spark: SparkSession, indexPath: String, cents: DataFrame,
      touchedCids: Seq[Any]): Unit = {
    if (touchedCids.isEmpty) return
    val clamp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => greatest(lit(-1.0d), least(lit(1.0d), c))
    val live = spark.read.format("graft").load(cellsPath(indexPath))
      .filter(col("cid").isin(touchedCids: _*))
      .select(col("cid"), col("nid"), posexplode(col("uvec"))
        .as(Seq("dim", "nx")))
      .join(broadcast(cents), Seq("cid", "dim"))
      .groupBy("cid", "nid").agg(sum(col("nx") * col("cx")).as("csim"))
      .groupBy("cid")
      .agg(clamp(min(col("csim"))).as("cosr"), count(lit(1)).as("cnt"))
    val touchedDf = spark.createDataFrame(
      java.util.Arrays.asList(touchedCids.map(c =>
        org.apache.spark.sql.Row(c)): _*),
      org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types
        .StructField("cid", live.schema("cid").dataType))))
    val exact = touchedDf.join(live, Seq("cid"), "left_outer")
      .select(col("cid"), coalesce(col("cosr"), lit(1.0d)).as("cosr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .withColumn("sinr", sqrt(greatest(lit(0.0d),
        lit(1.0d) - col("cosr") * col("cosr"))))
      .select("cid", "cosr", "sinr", "cnt")
    val untouched = spark.read.format("graft").load(statsPath(indexPath))
      .filter(!col("cid").isin(touchedCids: _*))
    untouched.unionByName(exact).transform(Checkpoints.stabilize)
      .write.format("graft").mode("overwrite").save(statsPath(indexPath))
  }

  /** Centroids + cell radii are metadata-scale BY CONSTRUCTION (nCentroids
    * rows), yet as graft tables each read pays snapshot + scan planning —
    * and [[topK]]'s probe logic derives from them in several separate
    * actions. Collect them ONCE per (index, versions) into driver rows and
    * replay as LocalRelations: planning becomes trivial, repeats are free,
    * and a [[build]]/[[syncFromTable]] bump of either table's version
    * invalidates the entry. One entry per index path, so the cache can't
    * grow past the set of indexes a session actually queries. */
  private case class CellMeta(
      centsRows: java.util.List[org.apache.spark.sql.Row],
      centsSchema: org.apache.spark.sql.types.StructType,
      radiiRows: java.util.List[org.apache.spark.sql.Row],
      radiiSchema: org.apache.spark.sql.types.StructType)

  // keyed by the INDEX path (not the generation root — one entry per
  // index, so rebuild swaps replace their index's entry instead of
  // accumulating one dead entry per superseded generation); the value
  // carries the generation root it was read from, so a swap invalidates
  // even if the new generation's table versions coincide with the old
  private val metaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Long, Long, CellMeta)]()

  private def cellMeta(
      spark: SparkSession, normIdx: String,
      root: String): (DataFrame, DataFrame) = {
    import graft.meta.SnapshotManagement
    val cv = SnapshotManagement
      .snapshot(SnapshotManagement.normalize(centroidsPath(root))).version
    val rv = SnapshotManagement
      .snapshot(SnapshotManagement.normalize(statsPath(root))).version
    val cached = metaCache.get(normIdx) match {
      case (croot, ccv, crv, m)
          if croot == root && ccv == cv && crv == rv => m
      case _ =>
        val c = spark.read.format("graft").load(centroidsPath(root))
        val r = spark.read.format("graft").load(statsPath(root))
        val m = CellMeta(c.collectAsList(), c.schema, r.collectAsList(), r.schema)
        metaCache.put(normIdx, (root, cv, rv, m))
        m
    }
    (spark.createDataFrame(cached.centsRows, cached.centsSchema),
      spark.createDataFrame(cached.radiiRows, cached.radiiSchema))
  }

  /** Exact cosine top-k of `queries` against the indexed corpus. Output
    * (qid, rank, nid) — identical to [[Ann.bruteTopK]] over the corpus the
    * index was built from (zero-norm corpus vectors were dropped at build,
    * zero-norm queries return no rows, as everywhere in the ANN family). */
  def topK(
      spark: SparkSession, indexPath: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10): DataFrame = {
    // pinned once per call: a rebuild flipping the pointer mid-query still
    // leaves this call on one coherent generation (kept on disk through
    // the next rebuild)
    val root = tableRoot(indexPath)
    val (cents, radii) = cellMeta(spark,
      graft.meta.SnapshotManagement.normalize(indexPath), root)
    // SINGLE-SCAN probe plan: the kth-best threshold comes from METADATA
    // alone, so the corpus is touched exactly once. Each cell's stats give
    // every member a sim interval around the query: with a = angle(q,
    // centroid) and r = cell radius, every member sim ∈ [cos(a+r),
    // cos(a-r)]. Sorting a query's cells by that LOWER bound and walking
    // until member counts accumulate to k proves "at least k corpus
    // vectors score >= t0" — so any cell whose UPPER bound misses t0
    // provably holds no top-k member and is skipped. t0 is weaker than the
    // old scan-the-nearest-cell threshold, but it is FREE: the old design
    // paid a second corpus-touching phase (scan nearest cells, rank, then
    // probe the rest) whose fixed job cost dominated small query batches,
    // and on weak-bound corpora it degenerated to scanning everything
    // TWICE. cnt is maintained conservatively low by sync (see the fold),
    // which only ever weakens t0 — exactness never depends on it.
    //
    // The ONLY stabilized intermediate is `qu` (upstream cost unknown —
    // the caller's frame). qCell/bounds/probe are per-query metadata
    // derived from `qu` and the LOCAL centroid/stats relations; deriving
    // them twice (once for the cid collect, once inside the final job)
    // costs microseconds, while a localCheckpoint each would cost a full
    // scheduled job.
    // RAW query components, not unit rows: cosine RANKS per query are
    // invariant under the positive per-query scale 1/|q|, so the final
    // scoring join never needs normalized values — only the angular
    // bounds below do, and there cos(q, c) comes from ONE fused aggregate
    // (sum(x·cx) and sum(x²) in the same groupBy — the cid-dim join is
    // dense, so the per-group x² sum IS the query norm). That drops the
    // norm-then-rescale shuffle+join of Ann.unitRows from the plan. Lazy
    // checkpoint: the probe-pair collect below is the first action — it
    // fills qx's blocks and computes the probe plan in ONE scheduled job.
    // SMALL-BATCH DRIVER PROBE (the common point-lookup / small-batch
    // case): centroids and stats are already LOCAL relations, so for a
    // bounded query batch the whole qCell→bounds→t0→probe derivation is
    // a few thousand double ops — running it distributively costs 4-6
    // AQE stage jobs (qx materialization, qCell aggregate, the t0 window
    // + aggregate, the t0 broadcast) of ~70 ms each, ALL of it to decide
    // metadata. One bounded collect of the query vectors replaces every
    // one of those jobs; the math below mirrors the SQL expressions
    // term-for-term (same ascending-dim accumulation the per-group hash
    // aggregate produced, same clamps, same 1e-9 margin — and the bound
    // logic is conservative, so a last-ulp divergence can only cost one
    // extra probed cell, never exactness). Batches over the cap take the
    // distributed path below, unchanged.
    val maxLocalQueries = 8192
    val qCollected = queries
      .select(col(s"`$queryIdCol`").as("qid"),
        col(s"`$queryVecCol`").cast("array<double>").as("qv"))
      .limit(maxLocalQueries + 1).collect()
    if (qCollected.length <= maxLocalQueries)
      return topKLocalProbe(spark, root, qCollected,
        queries.schema(queryIdCol).dataType, cents, radii, k)
    val qx = Checkpoints.stabilize(
      queries.select(col(s"`$queryIdCol`").as("qid"),
        posexplode(col(s"`$queryVecCol`").cast("array<double>"))
          .as(Seq("dim", "x"))),
      eager = false)
    // zero-norm queries drop here (cosine undefined), exactly as
    // Ann.unitRows does for every ANN variant
    val qCell = qx.join(broadcast(cents), "dim")
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("x") * col("cx")).as("dotr"), sum(col("x") * col("x"))
        .as("norm2"))
      .filter(col("norm2") > 0.0d)
      .select(col("qid"), col("cid"),
        (col("dotr") / sqrt(col("norm2"))).as("qcs"))

    val clamp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => greatest(lit(-1.0d), least(lit(1.0d), c))
    val qcsC = clamp(col("qcs"))
    val sinA = sqrt(greatest(lit(0.0d), lit(1.0d) - qcsC * qcsC))
    val cosr = coalesce(col("cosr"), lit(-1.0d))
    val sinr = coalesce(col("sinr"), lit(0.0d))
    // left join + widest-radius default: a cell somehow missing its stats
    // row must be PROBED (ub 1) and must claim nothing for the threshold
    // (lb -1, cnt 0) — conservative costs a scan, the alternative costs
    // exactness. cos(a±r) expands via the angle-sum identities on the
    // stored (cos r, sin r) — no acos anywhere. Clamps: a+r past pi means
    // the interval floor is -1; a-r below 0 means the ceiling is 1.
    val cntCol =
      if (radii.columns.contains("cnt")) coalesce(col("cnt"), lit(0L))
      else lit(0L) // pre-cnt stats: threshold degrades to probe-everything
    val bounds = qCell.join(broadcast(radii), Seq("cid"), "left_outer")
      .select(col("qid"), col("cid"),
        when(qcsC >= cosr, lit(1.0d))
          .otherwise(qcsC * cosr + sinA * sinr).as("ub"),
        when(qcsC < -cosr, lit(-1.0d))
          .otherwise(qcsC * cosr - sinA * sinr).as("lb"),
        cntCol.as("cnt"))
    val wlb = Window.partitionBy("qid")
      .orderBy(col("lb").desc, col("cid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // t0 = lb of the first cell (in lb-desc order) at which cumulative
    // membership reaches k; fewer than k counted members => -2 (probe all)
    val t0 = bounds.withColumn("cum", sum(col("cnt")).over(wlb))
      .groupBy("qid")
      .agg(coalesce(max(when(col("cum") >= k, col("lb"))), lit(-2.0d))
        .as("t0"))
    val probe = bounds.join(broadcast(t0), "qid")
      .filter(col("ub") + lit(1e-9) >= col("t0"))
      .select("qid", "cid")
    // one planning action collects the (qid, cid) probe pairs themselves
    // when they fit (they're bounded by |queries| × probed cells — tiny
    // for the common point-lookup / small-batch case), so the final job
    // joins a LOCAL relation instead of re-deriving the probe plan
    // distributively. The limit(cap + 1) probe is the overflow detector:
    // a truncated collect is discarded and only the distinct cids are
    // collected (bounded by nCentroids — metadata-scale by construction),
    // with the pair set re-derived inside the final job.
    val maxLocalPairs = 100000
    val pairRows = probe.limit(maxLocalPairs + 1).collect()
    val (probeCids, probePairs, pairsLocal) =
      if (pairRows.length <= maxLocalPairs) {
        (pairRows.map(_.get(1)).distinct.toSeq,
          spark.createDataFrame(
            java.util.Arrays.asList(pairRows: _*), probe.schema), true)
      } else {
        (probe.select("cid").distinct().collect().map(_.get(0)).toSeq, probe,
          false)
      }
    if (probeCids.isEmpty) {
      // no query survived unit-normalization — empty, correctly-shaped out
      return qCell.select(col("qid"), lit(0).as("rank"),
        col("cid").as("nid")).limit(0)
    }
    // ONE partition-pruned pass over the probed cells: the isin literals
    // push into the range-partition filter at scan PLANNING, each cell row
    // fans out only to the queries probing that cell, and the rank window
    // finishes the job
    // broadcast hints ONLY when the probe plan collected locally: in the
    // overflow branch (>100k pairs — so the query batch itself is large)
    // forcing a broadcast of the full distributed pair frame could blow the
    // broadcast limit at exactly the scale the fallback exists for; there a
    // plain join lets AQE pick the strategy from real sizes.
    val cellRows = spark.read.format("graft").load(cellsPath(root))
      .filter(col("cid").isin(probeCids: _*))
      .select(col("cid"), col("nid"),
        posexplode(col("uvec")).as(Seq("dim", "nx")))
    val scored = (if (pairsLocal) {
      cellRows.join(broadcast(probePairs), Seq("cid"))
        .join(broadcast(qx), Seq("qid", "dim"))
    } else {
      cellRows.join(probePairs, Seq("cid")).join(qx, Seq("qid", "dim"))
    })
      // raw-x sim = |q| × cosine: same per-query order, same ties
      .groupBy("qid", "nid").agg(sum(col("nx") * col("x")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }

  /** [[topK]]'s small-batch path: the probe PLAN (which cells each query
    * scans, and the metadata threshold t0 deciding it) computed entirely
    * on the DRIVER from the already-local centroid/stats relations — zero
    * scheduled jobs before the single corpus-touching scan, where the
    * distributed derivation paid 4-6 AQE stage jobs of pure metadata
    * work. Mirrors the SQL expressions term-for-term (ascending-dim
    * accumulation, same clamps, same 1e-9 margin); the cell bound is
    * conservative, so a last-ulp divergence can only probe one extra
    * cell, never skip a required one. Driver memory is bounded by the
    * caller's 8k-query cap × dims plus nCentroids metadata rows. */
  private def topKLocalProbe(
      spark: SparkSession, root: String,
      qRows: Array[org.apache.spark.sql.Row],
      qidType: org.apache.spark.sql.types.DataType,
      cents: DataFrame, radii: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val cidType = cents.schema("cid").dataType
    // cents/radii are LOCAL relations — collect() is a LocalTableScan,
    // not a job
    val centComp: Map[Any, Array[(Int, Double)]] = cents.collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .groupBy(_.get(0)).map { case (cid, rs) =>
        cid -> rs.map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1)
      }
    val rCols = radii.columns
    val cosrIdx = rCols.indexOf("cosr")
    val sinrIdx = rCols.indexOf("sinr")
    val cntIdx = rCols.indexOf("cnt") // -1 on pre-cnt stats
    val radiiBy: Map[Any, (Double, Double, Long)] = radii.collect().map { r =>
      // same defaults as the distributed left-outer join: missing/null
      // stats mean widest radius (probe it) and zero claimed members
      val cosr = if (cosrIdx < 0 || r.isNullAt(cosrIdx)) -1.0
        else r.getDouble(cosrIdx)
      val sinr = if (sinrIdx < 0 || r.isNullAt(sinrIdx)) 0.0
        else r.getDouble(sinrIdx)
      val cnt = if (cntIdx < 0 || r.isNullAt(cntIdx)) 0L
        else r.getAs[Number](cntIdx).longValue()
      r.get(0) -> ((cosr, sinr, cnt))
    }.toMap
    val qxRows = scala.collection.mutable.ArrayBuffer.empty[Row]
    val pairRows = scala.collection.mutable.ArrayBuffer.empty[Row]
    qRows.foreach { qr =>
      if (!qr.isNullAt(1)) {
        val qid = qr.get(0)
        val qv = qr.getSeq[Any](1)
        val bounds = centComp.toSeq.flatMap { case (cid, comps) =>
          var dot = 0.0
          var norm2 = 0.0
          comps.foreach { case (dim, cx) =>
            if (dim >= 0 && dim < qv.length && qv(dim) != null) {
              val x = qv(dim).asInstanceOf[Double]
              dot += x * cx
              norm2 += x * x
            }
          }
          if (norm2 <= 0.0) None
          else {
            val qcs = dot / math.sqrt(norm2)
            val qcsC = math.max(-1.0, math.min(1.0, qcs))
            val sinA = math.sqrt(math.max(0.0, 1.0 - qcsC * qcsC))
            val (cosr, sinr, cnt) = radiiBy.getOrElse(cid, (-1.0, 0.0, 0L))
            val ub = if (qcsC >= cosr) 1.0 else qcsC * cosr + sinA * sinr
            val lb = if (qcsC < -cosr) -1.0 else qcsC * cosr - sinA * sinr
            Some((cid, ub, lb, cnt))
          }
        }
        if (bounds.nonEmpty) {
          // t0 = lb of the first cell (lb-desc) at which cumulative
          // membership reaches k; lb ties share a value, so tie order
          // cannot change t0. Fewer than k counted members => -2.
          var cum = 0L
          var t0 = -2.0
          bounds.sortBy(-_._3).foreach { case (_, _, lb, cnt) =>
            cum += cnt
            if (t0 == -2.0 && cum >= k) t0 = lb
          }
          val probed = bounds.filter { case (_, ub, _, _) => ub + 1e-9 >= t0 }
          if (probed.nonEmpty) {
            probed.foreach { case (cid, _, _, _) => pairRows += Row(qid, cid) }
            qv.indices.foreach(d => qxRows += Row(qid, d, qv(d)))
          }
        }
      }
    }
    if (pairRows.isEmpty)
      // no query survived unit-normalization — empty, correctly-shaped out
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType(Seq(StructField("qid", qidType),
          StructField("rank", IntegerType, nullable = false),
          StructField("nid", cidType))))
    val pairsDf = spark.createDataFrame(
      java.util.Arrays.asList(pairRows.toSeq: _*),
      StructType(Seq(StructField("qid", qidType),
        StructField("cid", cidType))))
    val qxDf = spark.createDataFrame(
      java.util.Arrays.asList(qxRows.toSeq: _*),
      StructType(Seq(StructField("qid", qidType),
        StructField("dim", IntegerType, nullable = false),
        StructField("x", DoubleType))))
    val probeCids = pairRows.map(_.get(1)).distinct.toSeq
    // ONE partition-pruned pass over the probed cells — identical to the
    // distributed path's final job (raw-x sim = |q| × cosine: same
    // per-query order, same ties)
    val cellRows = spark.read.format("graft").load(cellsPath(root))
      .filter(col("cid").isin(probeCids: _*))
      .select(col("cid"), col("nid"),
        posexplode(col("uvec")).as(Seq("dim", "nx")))
    val scored = cellRows.join(broadcast(pairsDf), Seq("cid"))
      .join(broadcast(qxDf), Seq("qid", "dim"))
      .groupBy("qid", "nid").agg(sum(col("nx") * col("x")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }
}
