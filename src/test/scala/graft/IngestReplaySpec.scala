package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.DedupIngest

/** Micro-batch REPLAY and state-compaction crash-safety of the streaming
  * dedup ingest loops — the exactly-once story (r10 ADVICE: the simhash
  * tier's monotone check bricked the stream on replay after a crash
  * between the state write and the checkpoint commit; the minhash tier
  * silently double-counted replayed shingle rows into `sz`, deflating
  * Jaccard and over-admitting). All writes are now batch-keyed
  * overwrites, so a replay — full or after ANY partial-write crash — is
  * a no-op, and compaction interleaves without changing a single output
  * row.
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

  test("simhash tier: full-batch replay is a no-op, not a brick — " +
      "the crash-between-state-write-and-checkpoint-commit case") {
    val w = work("graft-replay-sh-")
    DedupIngest.initSimhash128State(spark, s"$w/state")
    def runBatch(b: Int): Unit =
      DedupIngest.simhash128IngestBatch(docs(batches(b)), b,
        s"$w/state", s"$w/surv", "doc_id", "text")
    runBatch(0); runBatch(1)
    // the replay: batch 1's state rows are ALREADY in state — the r10
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
      "written, wm and survivors lost) neither duplicates state nor " +
      "over-admits") {
    val w = work("graft-replay-mh-")
    DedupIngest.initMinhashState(spark, s"$w/state")
    def runBatch(b: Int): Unit =
      DedupIngest.minhashIngestBatch(docs(batches(b)), b,
        s"$w/state", s"$w/surv", "doc_id", "text")
    runBatch(0); runBatch(1)
    // simulate the r10 ADVICE crash window: rows/bands for batch 1 are
    // on disk, wm and the survivor emit are not
    def rm(p: String): Unit = {
      def rec(x: java.nio.file.Path): Unit = {
        if (Files.isDirectory(x))
          scala.util.Using.resource(Files.list(x))(_.forEach(rec))
        Files.deleteIfExists(x)
      }
      rec(Paths.get(p))
    }
    rm(s"$w/state/wm/b1"); rm(s"$w/surv/b1")
    // the replay: under the r10 append-mode code this duplicated every
    // batch-1 shingle row, inflating sz (shingleSets counts rows) and
    // deflating every future Jaccard against a batch-1 doc — silent
    // over-admission; batch-keyed overwrite makes it exact
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
    // batch 2 compacted: c2 present, b0..b2 retired
    assert(Files.exists(Paths.get(s"$w/state/c2")))
    assert(!Files.exists(Paths.get(s"$w/state/b0")))
    assert(!Files.exists(Paths.get(s"$w/state/b1")))
    assert(!Files.exists(Paths.get(s"$w/state/b2")))
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
