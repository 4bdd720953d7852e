package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Batch-keyed parquet state tables with a MANIFEST-log commit protocol —
  * the durability layer under [[DedupIngest]], designed for the object
  * stores 100 TB corpora actually live on.
  *
  * == Why not rename-commit ==
  *
  * The r11 protocol committed a compaction by `temp-write → atomic rename
  * → retire`, via `java.nio.file`. That contract holds on a local
  * filesystem and on HDFS, but an S3-style object store has NO rename —
  * "rename" is copy-then-delete, non-atomic, and a crash mid-copy leaves a
  * PARTIAL directory that name-based resolution would happily read as a
  * complete snapshot (a silent wrong answer, not a crash). This is
  * precisely why Delta Lake and Iceberg commit through a log of immutable
  * manifest files instead of renames; this class is that public commit
  * shape, reduced to the single-writer case a Structured Streaming
  * foreachBatch loop guarantees.
  *
  * == The protocol ==
  *
  * A table is a directory holding immutable parquet data dirs (`b<id>` per
  * ingested batch, `l<id>` per L1 compaction run, `c<id>` per base
  * compaction, optional `seed`) plus a tiny `_manifest/` log of versioned
  * manifest files `m<seq>`. The CURRENT snapshot is the highest-seq
  * manifest; it lists, by name, exactly the data dirs that are live.
  * Every filesystem touch goes through the Hadoop [[FileSystem]] API, and
  * the protocol needs only two primitives every store provides:
  *
  *  - '''new-object write''' (create-no-overwrite + close / S3 PUT —
  *    atomic visibility: readers see the whole object or nothing). Both
  *    the data dirs and the manifest files are written as NEW objects
  *    under fresh names; nothing live is ever mutated in place. On
  *    local/HDFS filesystems a file IS visible (empty or truncated) the
  *    moment it is created, so a crash between create and close can
  *    leave a partial top manifest — [[snapshot]] treats an unparseable
  *    or zero-length TOP manifest as that uncommitted write and falls
  *    back one level (exactly one crash window exists under the
  *    single-writer contract; a second bad manifest is real corruption
  *    and throws), and [[commit]] clears such debris before re-creating
  *    the name.
  *  - '''a LIST bounded to the manifest log''' (≤ [[KEEP_MANIFESTS]] small
  *    objects — S3 LIST has been strongly consistent since 2020). Data-dir
  *    resolution never lists: [[read]] opens exactly the paths the
  *    manifest names. No rename exists anywhere in the protocol.
  *
  * The manifest write IS the commit point: a crash anywhere before it
  * leaves new data dirs unreferenced (invisible to every read; swept by
  * the next compaction's GC), and a crash anywhere after it loses only
  * already-retired garbage. A replayed micro-batch rewrites its own `b<id>`
  * dir under a fresh part-file set and re-commits an identical manifest —
  * a no-op at the snapshot level (replay safety additionally leans on the
  * `batch` provenance column: see [[DedupIngest]]'s `batch < currentBatchId`
  * reads for the batch-that-fully-committed-but-lost-its-checkpoint case).
  *
  * == Tiered compaction ==
  *
  * [[compact]] is a two-level fold (the size-tiered shape every LSM store
  * uses, reduced to two levels because dedup state is small relative to
  * the corpus):
  *
  *  - '''L1''': the live `b<id>` dirs fold into one `l<id>` run —
  *    per-commit I/O proportional to the NEW data since the last fold,
  *    never to accumulated state;
  *  - '''L2''': only when [[L2_FANIN]] L1 runs have accumulated do the
  *    runs and the previous base fold into a new `c<id>` — the only
  *    commit that rewrites total state, amortized to 1 in
  *    `L2_FANIN × compactEvery` batches.
  *
  * A single-level policy (every fold rewrites the whole base) would make
  * cumulative write volume quadratic in stream lifetime — the r12 watch
  * item this closes. Read fan-in stays bounded: ≤ 1 base + [[L2_FANIN]]
  * runs + `compactEvery` live batch dirs.
  *
  * == GC retention horizon ==
  *
  * Single-writer assumption (what lets commits be plain new-object writes
  * rather than put-if-absent): exactly one loop instance appends to a
  * table, the Structured Streaming checkpoint contract. Concurrent
  * SNAPSHOT readers — the downstream batch jobs a production deployment
  * runs against live state — resolve some committed manifest and open the
  * dirs it names. [[gcOrphans]] therefore keeps every dir referenced by
  * ANY of the newest [[GC_HORIZON]] manifests (Delta-VACUUM-style
  * retention, made possible by the [[KEEP_MANIFESTS]]-deep log). The
  * horizon is sized to one full batch cycle — the write + L1 + L2
  * commits a single compacting batch can emit — so a reader that
  * resolved any snapshot since the previous compaction can still open
  * every dir it names while the current compaction commits and GCs
  * mid-read. Only dirs retired a full cycle ago — and never-referenced
  * crash debris — are swept. Readers staler than that are out of
  * contract (same as Delta's VACUUM horizon) and fail LOUDLY
  * (FileNotFound — manifest-named dirs are always complete, so a
  * partial read is impossible).
  */
object ManifestTable {

  /** Manifest log files kept after each commit (crash-forensics window);
    * bounds the one LIST the protocol performs. */
  val KEEP_MANIFESTS = 8

  /** GC keeps every data dir referenced by any of this many newest
    * manifests (must be ≤ [[KEEP_MANIFESTS]]). 3 = the most commits one
    * ingest batch cycle can emit (batch write + L1 fold + L2 fold), so a
    * reader that resolved ANY snapshot since the previous compaction
    * survives the current compaction's GC — only readers staler than a
    * full compaction cycle are out of contract (and fail loudly). */
  val GC_HORIZON = 3

  /** L1 runs that trigger the base (L2) fold. */
  val L2_FANIN = 4

  /** A committed snapshot: the newest base compaction (`c<id>`, all rows
    * from batches `<= compacted` not in a later run), the L1 runs above
    * it, the live batch dirs above those, and whether the table was
    * seeded with an empty typed parquet dir (so empty reads plan). */
  final case class Snapshot(seq: Long, compacted: Option[Long],
      runs: Seq[Long], live: Seq[Long], seeded: Boolean) {
    def dataPaths(dir: String): Seq[String] =
      (if (seeded) Seq(s"$dir/seed") else Nil) ++
        compacted.map(c => s"$dir/c$c") ++ runs.map(r => s"$dir/l$r") ++
        live.map(b => s"$dir/b$b")
    /** Highest batch id folded into a compaction tier (base or run). */
    def folded: Option[Long] = (compacted.toSeq ++ runs).maxOption
    /** Data dir NAMES this snapshot references (GC keep-set entries). */
    def dirNames: Seq[String] =
      (if (seeded) Seq("seed") else Nil) ++ compacted.map("c" + _) ++
        runs.map("l" + _) ++ live.map("b" + _)
  }

  private def fs(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  private def hconf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  private def manifestDir(root: Path) = new Path(root, "_manifest")

  private def manifestName(seq: Long): String = f"m$seq%020d"

  private def readManifest(f: FileSystem, md: Path, name: String): Snapshot = {
    val text = scala.util.Using.resource(f.open(new Path(md, name))) { in =>
      new String(in.readAllBytes(), StandardCharsets.UTF_8)
    }
    parse(name.drop(1).toLong, text)
  }

  /** Manifest file names present in the log, sorted newest-first. */
  private def manifestNames(f: FileSystem, md: Path): Seq[String] =
    if (!f.exists(md)) Nil
    else f.listStatus(md).map(_.getPath.getName)
      .filter(n => n.startsWith("m") && n.length > 1 &&
        n.drop(1).forall(_.isDigit))
      .sortBy(-_.drop(1).toLong).toSeq

  /** The newest committed manifest, or None for an uninitialized table.
    * The ONLY list call in the read path, bounded to the manifest log.
    *
    * Crash tolerance: on local/HDFS filesystems the manifest file is
    * visible from create time, so a crash between create and close
    * leaves a truncated (usually zero-length) TOP manifest. Exactly one
    * such window exists under the single-writer contract, so an
    * unparseable top manifest falls back to the next-lower seq; a second
    * unparseable manifest is genuine corruption and throws. */
  def snapshot(spark: SparkSession, dir: String): Option[Snapshot] = {
    val (f, root) = fs(dir, hconf(spark))
    val md = manifestDir(root)
    val names = manifestNames(f, md)
    if (names.isEmpty) return None
    try Some(readManifest(f, md, names.head))
    catch {
      case e: Exception if names.size >= 2 =>
        try Some(readManifest(f, md, names(1)))
        catch { case _: Exception => throw e } // two bad: real corruption
      case _: Exception if names.size == 1 =>
        None // the only manifest is an uncommitted partial: empty table
    }
  }

  private def parse(seq: Long, text: String): Snapshot = {
    val kv = text.linesIterator.filter(_.contains(":")).map { l =>
      val i = l.indexOf(':'); (l.take(i), l.drop(i + 1))
    }.toMap
    // v1 manifests (pre-tiering) carry no `runs` key — read as zero runs
    require(kv.get("format").exists(v => v == "graft-manifest-v1" ||
      v == "graft-manifest-v2"),
      s"unrecognized manifest format: ${kv.get("format")}")
    def ids(s: String): Seq[Long] =
      if (s.isEmpty) Nil else s.split(',').toSeq.map(_.toLong)
    Snapshot(seq,
      kv("compacted") match { case "-" => None; case s => Some(s.toLong) },
      ids(kv.getOrElse("runs", "")),
      ids(kv("live")),
      kv("seeded") == "1")
  }

  /** Commit `next` as a NEW manifest object (create-no-overwrite — the
    * single-writer contract makes a PARSEABLE name collision a loud
    * error, never a race to resolve; unparseable debris at the target
    * name is the previous crashed attempt's partial write and is cleared
    * first) and trim the log to [[KEEP_MANIFESTS]]. */
  private def commit(spark: SparkSession, dir: String, next: Snapshot): Unit = {
    val (f, root) = fs(dir, hconf(spark))
    val md = manifestDir(root)
    if (!f.exists(md)) f.mkdirs(md)
    val target = new Path(md, manifestName(next.seq))
    if (f.exists(target)) {
      val committed =
        try { readManifest(f, md, target.getName); true }
        catch { case _: Exception => false }
      if (committed) sys.error(s"manifest ${target.getName} already " +
        s"committed at $dir — single-writer contract violated")
      f.delete(target, false) // truncated debris from a crashed commit
    }
    val body = ("format:graft-manifest-v2\n" +
      s"compacted:${next.compacted.map(_.toString).getOrElse("-")}\n" +
      s"runs:${next.runs.mkString(",")}\n" +
      s"live:${next.live.mkString(",")}\n" +
      s"seeded:${if (next.seeded) "1" else "0"}\n")
      .getBytes(StandardCharsets.UTF_8)
    scala.util.Using.resource(f.create(target, false))(_.write(body))
    // trim the log (not a correctness step — a crash here just leaves a
    // longer history for the next commit to trim)
    f.listStatus(md).map(_.getPath)
      .filter(p => p.getName.startsWith("m") &&
        p.getName.drop(1).forall(_.isDigit) &&
        p.getName.drop(1).toLong <= next.seq - KEEP_MANIFESTS)
      .foreach(p => f.delete(p, false))
  }

  private def withBatch(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("batch", LongType))

  /** Initialize a table with an empty typed `seed` parquet dir (so reads
    * before the first batch plan like every later one) and manifest m0. */
  def init(spark: SparkSession, dir: String, schema: StructType): Unit = {
    spark.createDataFrame(new java.util.ArrayList[Row](), withBatch(schema))
      .write.mode("overwrite").parquet(s"$dir/seed")
    commit(spark, dir, Snapshot(0L, None, Nil, Nil, seeded = true))
  }

  /** The live view: every committed row with its `batch` provenance
    * column. Resolves the manifest — opens exactly the named dirs, no
    * data-dir listing. Fails loudly on an uninitialized, never-written
    * table (seed-less tables exist only once their first batch commits). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val s = snapshot(spark, dir).getOrElse(
      sys.error(s"no manifest at $dir — table never initialized/written"))
    val paths = s.dataPaths(dir)
    require(paths.nonEmpty, s"manifest at $dir names no data dirs")
    spark.read.parquet(paths: _*)
  }

  /** Write `df` (+ `batch` = `bid`) as data dir `b<bid>`, then commit —
    * THE idempotent ingest write. A replayed batch whose write is already
    * committed (live, folded into a run, or folded into the base) is a
    * pure NO-OP: the content is deterministic, and skipping — rather than
    * rewriting — is what keeps every referenced dir immutable (an
    * in-place rewrite of a live dir would reopen the partial-read crash
    * window the manifest exists to close). An UNcommitted leftover dir
    * (crash between data write and commit) is simply overwritten.
    * Auto-initializes a seed-less table on first write (survivor sinks). */
  def writeBatch(df: DataFrame, dir: String, bid: Long): Unit = {
    val spark = df.sparkSession
    val prev = snapshot(spark, dir)
      .getOrElse(Snapshot(-1L, None, Nil, Nil, seeded = false))
    if (prev.folded.exists(bid <= _) || prev.live.contains(bid)) return
    df.withColumn("batch", lit(bid))
      .write.mode("overwrite").parquet(s"$dir/b$bid")
    commit(spark, dir, prev.copy(seq = prev.seq + 1,
      live = (prev.live :+ bid).sorted))
  }

  /** Tiered compaction up to batch `bid` (class doc): L1 folds the live
    * `b<id>` dirs `<= bid` into run `l<bid>`; when [[L2_FANIN]] runs have
    * accumulated, L2 folds the base + runs into a new `c<id>`. Each fold
    * is crash-safe at every window — it writes an unreferenced dir, and
    * only the one-new-object manifest commit publishes it — and replay-
    * idempotent: an already-committed fold short-circuits on the manifest
    * (crash BETWEEN the L1 and L2 commits included: the replay skips L1
    * and re-runs L2). Retired dirs stay on disk for concurrent snapshot
    * readers until they age past [[GC_HORIZON]]; older debris is swept. */
  def compact(spark: SparkSession, dir: String, bid: Long): Unit = {
    val prev = snapshot(spark, dir).getOrElse(
      sys.error(s"no manifest at $dir — nothing to compact"))
    // each commit's Snapshot value is threaded forward rather than
    // re-resolved — one manifest LIST per compaction, not three (the
    // committed state IS the value just passed to commit, single-writer)
    var cur = prev
    // L1: fold the live batch dirs — I/O proportional to new data only
    if (!prev.folded.exists(bid <= _)) {
      val folded = prev.live.filter(_ <= bid)
      if (folded.nonEmpty) {
        spark.read.parquet(folded.map(b => s"$dir/b$b"): _*)
          .write.mode("overwrite").parquet(s"$dir/l$bid")
        cur = prev.copy(seq = prev.seq + 1,
          runs = (prev.runs :+ bid).sorted,
          live = prev.live.filter(_ > bid))
        commit(spark, dir, cur)
      }
    }
    // L2: fold base + runs when the fan-in threshold is reached — the
    // only commit whose I/O is proportional to total state
    if (cur.runs.size >= L2_FANIN) {
      val top = cur.runs.max
      val foldPaths = cur.compacted.map(c => s"$dir/c$c").toSeq ++
        cur.runs.map(r => s"$dir/l$r")
      spark.read.parquet(foldPaths: _*)
        .write.mode("overwrite").parquet(s"$dir/c$top")
      cur = cur.copy(seq = cur.seq + 1, compacted = Some(top), runs = Nil)
      commit(spark, dir, cur)
    }
    gcOrphans(spark, dir, cur)
  }

  /** Delete every data dir that no manifest within the retention horizon
    * references: crash debris (partial dirs a non-atomic copy-then-delete
    * "rename" would have silently READ under the r11 protocol — here
    * unreferenced by construction) and dirs retired more than
    * [[GC_HORIZON]] commits ago. Dirs referenced by any of the newest
    * [[GC_HORIZON]] manifests are KEPT, so a concurrent reader that
    * resolved a recent snapshot can still open every dir it names (class
    * doc). The list calls are maintenance-only: correctness never depends
    * on them, and a crash mid-GC just defers the sweep. */
  def gcOrphans(spark: SparkSession, dir: String, snap: Snapshot): Unit = {
    val (f, root) = fs(dir, hconf(spark))
    if (!f.exists(root)) return
    val md = manifestDir(root)
    val retained = manifestNames(f, md).take(GC_HORIZON).flatMap { n =>
      try Some(readManifest(f, md, n))
      catch { case _: Exception => None } // partial top: references nothing
    }
    val keep = (Seq("_manifest") ++ snap.dirNames ++
      retained.flatMap(_.dirNames)).toSet
    f.listStatus(root).map(_.getPath)
      .filter(p => !keep.contains(p.getName))
      .foreach(p => f.delete(p, true))
  }

  /** Number of data directories currently on disk (bounded-growth
    * assertions in tests; maintenance listing, not a read-path call). */
  def dataDirCount(spark: SparkSession, dir: String): Int = {
    val (f, root) = fs(dir, hconf(spark))
    f.listStatus(root).map(_.getPath.getName)
      .count(n => n == "seed" || ((n.startsWith("b") || n.startsWith("c") ||
        n.startsWith("l")) &&
        n.length > 1 && n.drop(1).forall(_.isDigit)))
  }

  // ---- snapshot-mode tables (bounded-lateness pending buffers) ----
  //
  // A snapshot table's batch dir holds the FULL current value (replacement
  // semantics), not an increment: readers resolve the newest committed dir
  // strictly below their batch id; pruning retires everything older than
  // the newest-below-current (Structured Streaming replays at most the one
  // uncommitted batch, so one predecessor snapshot is the whole replay
  // horizon — kept anyway for every live id the manifest still names).

  /** Rows of the newest committed snapshot dir with id < `bid` (the
    * replay-safe read: a replayed batch's own pre-crash snapshot is
    * excluded), or the typed empty seed when none exists yet. */
  def readSnapshotBefore(spark: SparkSession, dir: String,
      bid: Long): DataFrame = {
    val s = snapshot(spark, dir).getOrElse(
      sys.error(s"no manifest at $dir — table never initialized"))
    val path = s.live.filter(_ < bid).maxOption.map(b => s"$dir/b$b")
      .getOrElse {
        require(s.seeded, s"snapshot table $dir has no seed and no " +
          s"committed snapshot below batch $bid")
        s"$dir/seed"
      }
    spark.read.parquet(path)
  }

  /** Retire every snapshot dir older than the newest one strictly below
    * `bid` (the replay horizon), keeping `bid`'s own dir. */
  def pruneSnapshots(spark: SparkSession, dir: String, bid: Long): Unit = {
    val prev = snapshot(spark, dir).getOrElse(return)
    val floor = prev.live.filter(_ < bid).maxOption
    val keep = prev.live.filter(b => b >= bid || floor.contains(b))
    if (keep != prev.live) {
      commit(spark, dir, prev.copy(seq = prev.seq + 1, live = keep))
      gcOrphans(spark, dir, snapshot(spark, dir).get)
    }
  }
}
