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
