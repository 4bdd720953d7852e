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
  * ingested batch, `c<id>` per compaction, optional `seed`) plus a tiny
  * `_manifest/` log of versioned manifest files `m<seq>`. The CURRENT
  * snapshot is the highest-seq manifest; it lists, by name, exactly the
  * data dirs that are live. Every filesystem touch goes through the Hadoop
  * [[FileSystem]] API, and the protocol needs only two primitives every
  * store provides:
  *
  *  - '''new-object write''' (create-no-overwrite + close / S3 PUT —
  *    atomic visibility: readers see the whole object or nothing). Both
  *    the data dirs and the manifest files are written as NEW objects
  *    under fresh names; nothing live is ever mutated in place.
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
  * Single-writer assumption (what lets commits be plain new-object writes
  * rather than put-if-absent): exactly one loop instance appends to a
  * table, the Structured Streaming checkpoint contract. Concurrent
  * SNAPSHOT readers are safe — they resolve some committed manifest and
  * every dir it names is immutable until a later compaction's GC retires
  * it (readers racing a GC by more than one compaction cycle are out of
  * contract, same as Delta's VACUUM horizon).
  */
object ManifestTable {

  /** Manifest log files kept after each commit (crash-forensics window);
    * bounds the one LIST the protocol performs. */
  val KEEP_MANIFESTS = 8

  /** A committed snapshot: the newest compaction (all rows from batches
    * `<= compacted`), the live batch dirs above it, and whether the table
    * was seeded with an empty typed parquet dir (so empty reads plan). */
  final case class Snapshot(seq: Long, compacted: Option[Long],
      live: Seq[Long], seeded: Boolean) {
    def dataPaths(dir: String): Seq[String] =
      (if (seeded) Seq(s"$dir/seed") else Nil) ++
        compacted.map(c => s"$dir/c$c") ++ live.map(b => s"$dir/b$b")
  }

  private def fs(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  private def hconf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  private def manifestDir(root: Path) = new Path(root, "_manifest")

  private def manifestName(seq: Long): String = f"m$seq%020d"

  /** The highest-seq committed manifest, or None for an uninitialized
    * table. The ONLY list call in the read path, bounded to the manifest
    * log. */
  def snapshot(spark: SparkSession, dir: String): Option[Snapshot] = {
    val (f, root) = fs(dir, hconf(spark))
    val md = manifestDir(root)
    if (!f.exists(md)) return None
    val names = f.listStatus(md).map(_.getPath.getName)
      .filter(n => n.startsWith("m") && n.drop(1).forall(_.isDigit))
    if (names.isEmpty) return None
    val top = names.maxBy(_.drop(1).toLong)
    val text = scala.util.Using.resource(f.open(new Path(md, top))) { in =>
      new String(in.readAllBytes(), StandardCharsets.UTF_8)
    }
    Some(parse(top.drop(1).toLong, text))
  }

  private def parse(seq: Long, text: String): Snapshot = {
    val kv = text.linesIterator.filter(_.contains(":")).map { l =>
      val i = l.indexOf(':'); (l.take(i), l.drop(i + 1))
    }.toMap
    require(kv.get("format").contains("graft-manifest-v1"),
      s"unrecognized manifest format: ${kv.get("format")}")
    Snapshot(seq,
      kv("compacted") match { case "-" => None; case s => Some(s.toLong) },
      kv("live") match {
        case "" => Nil
        case s  => s.split(',').toSeq.map(_.toLong)
      },
      kv("seeded") == "1")
  }

  /** Commit `next` as a NEW manifest object (create-no-overwrite — the
    * single-writer contract makes a name collision a loud error, never a
    * race to resolve) and trim the log to [[KEEP_MANIFESTS]]. */
  private def commit(spark: SparkSession, dir: String, next: Snapshot): Unit = {
    val (f, root) = fs(dir, hconf(spark))
    val md = manifestDir(root)
    if (!f.exists(md)) f.mkdirs(md)
    val body = ("format:graft-manifest-v1\n" +
      s"compacted:${next.compacted.map(_.toString).getOrElse("-")}\n" +
      s"live:${next.live.mkString(",")}\n" +
      s"seeded:${if (next.seeded) "1" else "0"}\n")
      .getBytes(StandardCharsets.UTF_8)
    scala.util.Using.resource(
      f.create(new Path(md, manifestName(next.seq)), false))(_.write(body))
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
    commit(spark, dir, Snapshot(0L, None, Nil, seeded = true))
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
    * committed (live or folded into a compaction) is a pure NO-OP: the
    * content is deterministic, and skipping — rather than rewriting — is
    * what keeps every referenced dir immutable (an in-place rewrite of a
    * live dir would reopen the partial-read crash window the manifest
    * exists to close). An UNcommitted leftover dir (crash between data
    * write and commit) is simply overwritten. Auto-initializes a
    * seed-less table on first write (survivor sinks). */
  def writeBatch(df: DataFrame, dir: String, bid: Long): Unit = {
    val spark = df.sparkSession
    val prev = snapshot(spark, dir)
      .getOrElse(Snapshot(-1L, None, Nil, seeded = false))
    if (prev.compacted.exists(bid <= _) || prev.live.contains(bid)) return
    df.withColumn("batch", lit(bid))
      .write.mode("overwrite").parquet(s"$dir/b$bid")
    commit(spark, dir, prev.copy(seq = prev.seq + 1,
      live = (prev.live :+ bid).sorted))
  }

  /** Fold every live row from batches `<= bid` into one `c<bid>` dir,
    * commit, then GC the retired dirs. Crash-safe at every window: the
    * fold writes an unreferenced dir; the commit is one new-object write;
    * GC failures leave unreferenced garbage the NEXT compaction sweeps
    * (gcOrphans runs first, so a planted or half-"renamed" partial dir
    * from a previous crash is removed before `c<bid>` is written fresh).
    * Idempotent on replay: an already-committed `c<bid>` short-circuits
    * to GC. */
  def compact(spark: SparkSession, dir: String, bid: Long): Unit = {
    val prev = snapshot(spark, dir).getOrElse(
      sys.error(s"no manifest at $dir — nothing to compact"))
    if (!prev.compacted.contains(bid)) {
      if (prev.compacted.exists(bid < _)) return // replay below watermark
      gcOrphans(spark, dir, prev)
      val foldPaths = (if (prev.seeded) Seq(s"$dir/seed") else Nil) ++
        prev.compacted.map(c => s"$dir/c$c") ++
        prev.live.filter(_ <= bid).map(b => s"$dir/b$b")
      spark.read.parquet(foldPaths: _*)
        .write.mode("overwrite").parquet(s"$dir/c$bid")
      commit(spark, dir, prev.copy(seq = prev.seq + 1,
        compacted = Some(bid), live = prev.live.filter(_ > bid)))
    }
    gcOrphans(spark, dir, snapshot(spark, dir).get)
  }

  /** Delete every data dir the committed snapshot does not reference —
    * retired batch dirs, superseded compactions, and partial dirs left by
    * crashes (the debris a non-atomic copy-then-delete "rename" would
    * have silently READ under the r11 protocol; here it is unreferenced
    * by construction). The list call is maintenance-only: correctness
    * never depends on it, and a crash mid-GC just defers the sweep. */
  def gcOrphans(spark: SparkSession, dir: String, snap: Snapshot): Unit = {
    val (f, root) = fs(dir, hconf(spark))
    if (!f.exists(root)) return
    val keep = (Seq("_manifest") ++ (if (snap.seeded) Seq("seed") else Nil) ++
      snap.compacted.map("c" + _) ++ snap.live.map("b" + _)).toSet
    f.listStatus(root).map(_.getPath)
      .filter(p => !keep.contains(p.getName))
      .foreach(p => f.delete(p, true))
  }

  /** Number of data directories currently on disk (bounded-growth
    * assertions in tests; maintenance listing, not a read-path call). */
  def dataDirCount(spark: SparkSession, dir: String): Int = {
    val (f, root) = fs(dir, hconf(spark))
    f.listStatus(root).map(_.getPath.getName)
      .count(n => n == "seed" || ((n.startsWith("b") || n.startsWith("c")) &&
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
