package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{DedupIngest, ManifestTable}

/** Micro-batch REPLAY and manifest-commit crash-safety of the streaming
  * dedup ingest loops — the exactly-once story (r10 ADVICE: the simhash
  * tier's monotone check bricked the stream on replay after a crash
  * between the state write and the checkpoint commit; the minhash tier
  * silently double-counted replayed shingle rows into `sz`, deflating
  * Jaccard and over-admitting; r11 VERDICT: the rename-commit protocol
  * assumed atomic rename and unbounded cheap listing — neither holds on
  * the object stores 100 TB corpora live on). All writes are batch-keyed
  * data dirs published by a [[ManifestTable]] manifest-log commit, so a
  * replay — full or after ANY partial-write crash — is a no-op, partial
  * debris is unreferenced by construction, and compaction (state AND
  * survivor sink) interleaves without changing a single output row.
  */
class IngestReplaySpec extends SparkSpec {
  import spark.implicits._

  // 4 batches of 10 docs; unrelated docs share no tokens (so no
  // accidental near-dups on either tier), planted exact dups give every
  // batch kind of rejection: in-batch (15~14), cross-batch (12~3), a
  // chain continuing across a later batch (21~12~3), and a NULL-text doc
  // (38: admitted, simhash state row with NULL sketch)
  private def text(i: Long): String =
    if (i == 38) null
    else if (i == 12) text(3)
    else if (i == 15) text(14)
    else if (i == 21) text(3)
    else s"a$i b$i c$i d$i e$i f$i"
  private def docs(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, text(i))).toDF("doc_id", "text")
  private val batches: Seq[Seq[Long]] =
    (0L until 40L).grouped(10).map(_.toSeq).toSeq

  private def work(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def survivorIds(dir: String): Set[Long] =
    DedupIngest.readSurvivors(spark, s"$dir/surv")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet

  /** One-shot reference: the whole corpus as a single batch. */
  private def oneShotSimhash(): Set[Long] = {
    val w = work("graft-replay-ref-")
    DedupIngest.initSimhash128State(spark, s"$w/state")
    DedupIngest.simhash128IngestBatch(docs(batches.flatten), 0,
      s"$w/state", s"$w/surv", "doc_id", "text")
    survivorIds(w)
  }

  private def oneShotMinhash(): Set[Long] = {
    val w = work("graft-replay-ref-")
    DedupIngest.initMinhashState(spark, s"$w/state")
    DedupIngest.minhashIngestBatch(docs(batches.flatten), 0,
      s"$w/state", s"$w/surv", "doc_id", "text")
    survivorIds(w)
  }

  /** Reconstruct the "crash before batch `bid`'s manifest commit" disk
    * state: peel manifest files newest-first until the snapshot no longer
    * lists b<bid>. The DATA dir is left in place — that is the honest
    * crash window (rows written, commit lost, dir unreferenced). */
  private def rollbackCommit(dir: String, bid: Long): Unit =
    while (ManifestTable.snapshot(spark, dir).exists(_.live.contains(bid))) {
      val seq = ManifestTable.snapshot(spark, dir).get.seq
      Files.delete(Paths.get(f"$dir/_manifest/m$seq%020d"))
    }

  test("simhash tier: full-batch replay is a no-op, not a brick — " +
      "the crash-between-state-write-and-checkpoint-commit case") {
    val w = work("graft-replay-sh-")
    DedupIngest.initSimhash128State(spark, s"$w/state")
    def runBatch(b: Int): Unit =
      DedupIngest.simhash128IngestBatch(docs(batches(b)), b,
        s"$w/state", s"$w/surv", "doc_id", "text")
    runBatch(0); runBatch(1)
    // the replay: batch 1's state rows are ALREADY committed — the r10
    // code's monotone check read them and require-failed on every
    // restart, permanently killing the stream
    runBatch(1)
    runBatch(2); runBatch(3)
    assert(survivorIds(w) == oneShotSimhash(),
      "replayed run diverged from the one-shot reference")
    // no duplicate state rows either: one sketch row per ingested doc
    val state = DedupIngest.readState(spark, s"$w/state")
    assert(state.count() == 40L, s"state rows = ${state.count()}, want 40")
    assert(state.select("id").distinct().count() == 40L)
  }

  test("minhash tier: replay after a partial-write crash (rows/bands " +
      "committed, wm and survivor commits lost) neither duplicates state " +
      "nor over-admits") {
    val w = work("graft-replay-mh-")
    DedupIngest.initMinhashState(spark, s"$w/state")
    def runBatch(b: Int): Unit =
      DedupIngest.minhashIngestBatch(docs(batches(b)), b,
        s"$w/state", s"$w/surv", "doc_id", "text")
    runBatch(0); runBatch(1)
    // the r10 ADVICE crash window, reconstructed at the commit level:
    // batch 1's rows/bands manifests committed, wm and the survivor
    // manifest commits lost (their data dirs remain on disk,
    // unreferenced — exactly what a crash leaves behind)
    rollbackCommit(s"$w/state/wm", 1L)
    rollbackCommit(s"$w/surv", 1L)
    // the replay: under the r10 append-mode code this duplicated every
    // batch-1 shingle row, inflating sz (shingleSets counts rows) and
    // deflating every future Jaccard against a batch-1 doc — silent
    // over-admission; batch-keyed manifest-committed writes make it exact
    runBatch(1)
    runBatch(2); runBatch(3)
    assert(survivorIds(w) == oneShotMinhash(),
      "partial-crash replay diverged from the one-shot reference")
    // shingle state is exactly the clean recompute — no duplicated rows
    val wantRows = graft.operators.NearDup
      .shingleHashRows(docs(batches.flatten), "doc_id", "text", 3).count()
    val gotRows = DedupIngest.readState(spark, s"$w/state/rows").count()
    assert(gotRows == wantRows, s"state rows $gotRows, want $wantRows")
    // 21 is a dup of 3 via the chain — it must be suppressed (the
    // over-admission symptom would admit it)
    assert(!survivorIds(w).contains(21L))
    assert(survivorIds(w).contains(38L), "contentless doc must be admitted")
  }

  test("compaction folds state without changing outputs, retires folded " +
      "dirs, and is replay-safe") {
    val w = work("graft-compact-sh-")
    DedupIngest.initSimhash128State(spark, s"$w/state")
    def runBatch(b: Int, compactEvery: Int = 2): Unit =
      DedupIngest.simhash128IngestBatch(docs(batches(b)), b,
        s"$w/state", s"$w/surv", "doc_id", "text",
        compactEvery = compactEvery)
    runBatch(0); runBatch(1); runBatch(2)
    // batch 2 compacted: c2 live, b0..b2 retired (GC'd — no longer on
    // disk, and no longer referenced by the manifest)
    assert(Files.exists(Paths.get(s"$w/state/c2")))
    assert(!Files.exists(Paths.get(s"$w/state/b0")))
    assert(!Files.exists(Paths.get(s"$w/state/b1")))
    assert(!Files.exists(Paths.get(s"$w/state/b2")))
    val snap = ManifestTable.snapshot(spark, s"$w/state").get
    assert(snap.compacted.contains(2L) && snap.live.isEmpty)
    // replay the compacting batch itself (crash after the fold, before
    // the checkpoint commit): must neither brick nor double anything
    runBatch(2)
    runBatch(3)
    assert(survivorIds(w) == oneShotSimhash(),
      "compacted run diverged from the one-shot reference")
    val state = DedupIngest.readState(spark, s"$w/state")
    assert(state.count() == 40L, s"state rows = ${state.count()}, want 40")
    // minhash tier: same interleaving over all three tables
    val wm = work("graft-compact-mh-")
    DedupIngest.initMinhashState(spark, s"$wm/state")
    (0 until 4).foreach(b => DedupIngest.minhashIngestBatch(
      docs(batches(b)), b, s"$wm/state", s"$wm/surv", "doc_id", "text",
      compactEvery = 2))
    assert(Files.exists(Paths.get(s"$wm/state/rows/c2")))
    assert(Files.exists(Paths.get(s"$wm/state/wm/c2")))
    assert(survivorIds(wm) == oneShotMinhash(),
      "compacted minhash run diverged from the one-shot reference")
  }

  test("survivor sink compacts on the state cadence: 12 batches at " +
      "compactEvery=4 ≡ one-shot, with bounded dir counts — through " +
      "an explicit file: URI (Hadoop FileSystem addressing, not " +
      "java.nio paths)") {
    // 12 batches via finer slicing of the same 40-doc corpus (the
    // admission policy is batch-boundary invariant); dirs addressed with
    // an explicit scheme to pin that every filesystem touch goes through
    // the Hadoop FileSystem API — java.nio cannot resolve "file:" paths
    val plain = work("graft-survcompact-")
    val w = s"file:$plain"
    DedupIngest.initSimhash128State(spark, s"$w/state")
    val slices = (0L until 40L).grouped(4).map(_.toSeq).toSeq
    require(slices.size == 12 - 2, "40/4 = 10 slices") // 10 batches of 4
    val all = slices ++ Seq(Seq.empty[Long], Seq.empty[Long]) // pad to 12
    all.zipWithIndex.foreach { case (ids, b) =>
      DedupIngest.simhash128IngestBatch(docs(ids), b.toLong,
        s"$w/state", s"$w/surv", "doc_id", "text", compactEvery = 4)
    }
    assert(survivorIds(w) == oneShotSimhash(),
      "survivor-compacted run diverged from the one-shot reference")
    // bounded growth: after compactions at 4 and 8, each table holds one
    // c dir + the live dirs above the watermark (b9..b11) + seed —
    // never the 12 per-batch dirs the r11 sink accumulated forever
    val stateDirs = ManifestTable.dataDirCount(spark, s"$w/state")
    val survDirs = ManifestTable.dataDirCount(spark, s"$w/surv")
    assert(stateDirs <= 5, s"state data dirs = $stateDirs, want ≤ 5")
    assert(survDirs <= 4, s"survivor data dirs = $survDirs, want ≤ 4")
    // the survivor fold preserved every row exactly once (dirs are
    // mutually exclusive by the admission contract)
    val surv = DedupIngest.readSurvivors(spark, s"$w/surv")
    assert(surv.count() == surv.select("doc_id").distinct().count())
  }

  test("FAULT INJECTION: a non-atomic 'rename' crash (partial compaction " +
      "dir on disk) is unreferenced under the manifest protocol; r11's " +
      "name-based resolution would have read it and over-admitted") {
    // Bespoke corpus: 31 (batch 3) duplicates 12 (batch 1) duplicates 3
    // (batch 0) — suppressing 31 REQUIRES batch 1's sketch rows.
    def t(i: Long): String =
      if (i == 12) t(3) else if (i == 31) t(12) else s"a$i b$i c$i d$i e$i"
    def d(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, t(i))).toDF("doc_id", "text")
    val w = work("graft-faultinj-")
    DedupIngest.initSimhash128State(spark, s"$w/state")
    def runBatch(b: Int, compactEvery: Int = 0): Unit =
      DedupIngest.simhash128IngestBatch(
        d((b * 10L) until (b * 10L + 10L)), b,
        s"$w/state", s"$w/surv", "doc_id", "text",
        compactEvery = compactEvery)
    runBatch(0); runBatch(1); runBatch(2)
    // the fault: an object store has no rename — a compaction "renamed"
    // via copy-then-delete crashes 1/3 through the copy, leaving a
    // PARTIAL c2 (here: only batch 0's 10 rows of the 30 a real c2
    // holds) at the state root with no commit anywhere
    DedupIngest.readState(spark, s"$w/state").filter(col("batch") === 0)
      .write.parquet(s"$w/state/c2")
    // r11's protocol resolved BY NAME: newest complete-looking c dir +
    // b dirs above it. Codified here verbatim, it reads the partial dir
    // as truth — 10 state rows instead of 30, batch 1's sketches gone,
    // so a probe for doc 31 finds no ancestor: silent over-admission
    val r11View = spark.read.parquet(s"$w/state/c2") // cMax=2, no b>2
    assert(r11View.count() == 10L,
      "name-based resolution reads the partial dir as a complete snapshot")
    assert(r11View.filter(col("id") === 12L).isEmpty,
      "the suppressor of doc 31 is missing from the corrupt view")
    // the manifest protocol never references the debris: the committed
    // snapshot still reads all 30 rows
    assert(DedupIngest.readState(spark, s"$w/state").count() == 30L)
    // ...and the stream keeps giving the one-shot answer: 31 suppressed
    runBatch(3, compactEvery = 3) // batch 3 also compacts (3 % 3 == 0)
    val got = survivorIds(w)
    assert(!got.contains(31L), "doc 31 must be suppressed (dup chain)")
    assert(!got.contains(12L) && got.size == 40 - 2)
    // the compaction's GC swept the debris and committed the real fold
    assert(ManifestTable.snapshot(spark, s"$w/state").get.compacted
      .contains(3L))
    assert(!Files.exists(Paths.get(s"$w/state/c2")),
      "orphaned partial dir must be GC'd")
    assert(DedupIngest.readState(spark, s"$w/state").count() == 40L)
  }

  test("bounded-lateness admission: shuffled-within-L arrival ≡ one-shot " +
      "(with a replay mid-stream); a release-reordering late arrival " +
      "still fails loudly") {
    val w = work("graft-lateness-")
    DedupIngest.initSimhash128State(spark, s"$w/state")
    val core = (released: DataFrame, bid: Long) =>
      DedupIngest.simhash128IngestBatch(released, bid,
        s"$w/state", s"$w/surv", "doc_id", "text")
    def runBatch(ids: Seq[Long], b: Long): Unit =
      DedupIngest.boundedLatenessBatch(docs(ids), b, s"$w/pending", 5L,
        "doc_id", "text", core)
    // value displacement ≤ 3 (< L = 5): 4-blocks reversed — every batch
    // arrives internally shuffled AND trailing ids spill across batch
    // boundaries through the reorder buffer
    val arrival = (0L until 40L).grouped(4).flatMap(_.reverse).toSeq
    val slices = arrival.grouped(10).toSeq
    slices.zipWithIndex.foreach { case (ids, b) => runBatch(ids, b.toLong) }
    // crash-replay the last batch through the buffer: pending resolution
    // reads the snapshot committed BELOW it, so the release set and the
    // core writes recompute identically
    runBatch(slices.last, slices.size - 1L)
    // drain the disorder window
    DedupIngest.boundedLatenessFlush(spark, slices.size.toLong,
      s"$w/pending", core)
    assert(survivorIds(w) == oneShotSimhash(),
      "shuffled-within-L run diverged from the one-shot reference")
    val state = DedupIngest.readState(spark, s"$w/state")
    assert(state.count() == 40L && state.select("id").distinct().count() == 40L)
    // past-L: doc 2 arrives after the watermark has passed it AND a
    // fresh high id forces its release — the core's monotone assertion
    // must kill the batch, not emit an order-dependent answer
    val ex = intercept[IllegalArgumentException] {
      runBatch(Seq(2L, 45L), slices.size + 1L)
    }
    assert(ex.getMessage.contains("monotone"))
    // null ids are rejected loudly too (unorderable)
    val exNull = intercept[IllegalArgumentException] {
      DedupIngest.boundedLatenessBatch(
        Seq((java.lang.Long.valueOf(50L), "x x x"),
          (null.asInstanceOf[java.lang.Long], "y y y"))
          .toDF("doc_id", "text"),
        slices.size + 2L, s"$w/pending", 5L, "doc_id", "text", core)
    }
    assert(exNull.getMessage.contains("non-null ids"))
  }

  for ((provName, provClass) <- Seq(
    "default provider" ->
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "RocksDB provider" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
  test("kill mid-stream, crash-replay the uncommitted batch, restart " +
      s"resized: survivors ≡ one-shot ($provName)") {
    // The full crash matrix through the REAL checkpoint machinery: the
    // stream is killed after ≥ 2 committed batches; the next
    // (uncommitted) batch is then run to completion OUT OF BAND —
    // exactly the "all writes landed, commit lost" crash window — and
    // the stream restarted from the checkpoint on a session with a
    // DIFFERENT shuffle-partition count. The restart must re-run that
    // batch as a no-op replay (the r10 code require-failed here and
    // bricked the stream) and finish the backlog to the one-shot answer.
    val w = work("graft-streamcrash-")
    import java.nio.file.attribute.FileTime
    val schema = docs(Seq(0L)).schema
    val base = System.currentTimeMillis()
    for (b <- batches.indices) {
      val tmp = s"$w/slice$b"
      docs(batches(b)).coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.createDirectories(Paths.get(s"$w/stage"))
      val dst = Paths.get(s"$w/stage/part$b.parquet")
      Files.move(f.toPath, dst)
      // oldest-first drain order = ascending doc_id = the monotone
      // contract (BoundedRuns' staging discipline)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(base + b * 10000L))
    }
    DedupIngest.initSimhash128State(spark, s"$w/state")
    def start(s: org.apache.spark.sql.SparkSession) =
      DedupIngest.simhash128IngestSink(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$w/stage"),
        s"$w/state", s"$w/surv", "doc_id", "text")
        .option("checkpointLocation", s"$w/ckpt")
    val s1 = spark.newSession()
    s1.conf.set("spark.sql.streaming.stateStore.providerClass", provClass)
    val q1 = start(s1).start()
    def commits: Seq[Long] = {
      val d = Paths.get(s"$w/ckpt/commits")
      if (!Files.exists(d)) Seq.empty
      else scala.util.Using.resource(Files.list(d)) { st =>
        val b = Seq.newBuilder[Long]
        st.forEach { p =>
          val n = p.getFileName.toString
          if (n.forall(_.isDigit)) b += n.toLong
        }
        b.result()
      }
    }
    val deadline = System.currentTimeMillis() + 90000
    while (commits.size < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q1.stop()
    assert(commits.size >= 2, "stream committed < 2 batches before kill")
    // the crash: the next uncommitted batch runs ALL its writes but its
    // checkpoint commit never lands
    val nb = commits.max + 1
    if (nb < batches.size)
      DedupIngest.simhash128IngestBatch(docs(batches(nb.toInt)), nb,
        s"$w/state", s"$w/surv", "doc_id", "text")
    // restart from the checkpoint on a RESIZED session (shuffle
    // partitions 7, co-prime with the suite's 4)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", provClass)
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    val q2 = start(s2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(survivorIds(w) == oneShotSimhash(),
      "kill + crash-replay + resized restart diverged from one-shot")
    val state = DedupIngest.readState(spark, s"$w/state")
    assert(state.count() == 40L && state.select("id").distinct().count() == 40L)
  }

  test("streamed run with compaction on: survivors ≡ the one-shot batch " +
      "policy end-to-end (the DeltaStateSpec invariance, re-proven " +
      "across a mid-stream fold)") {
    val dir = sf()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val pairs = graft.operators.NearDup
      .simhash128NearDupPairs(docs, "doc_id", "text", maxHamming = 3)
    val want = graft.operators.NearDup.nearDupSurvivors(docs, pairs, "doc_id")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val w = work("graft-compact-stream-")
    val got = graft.streaming.BoundedRuns
      .simhash128IngestSurvivors(spark, dir, nSlices = 4,
        workDir = Some(w), compactEvery = 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} " +
      s"extra=${(got -- want).take(3)}")
    // the stream really compacted (4 batches → c2 exists)
    assert(Files.exists(Paths.get(s"$w/state/c2")))
  }
}
