package graft

import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** Persisted-state delta ingest (q360's operator): the corpus's LSH state
  * lives in PARQUET (as a daily pipeline would keep it) and the delta
  * batch probes it WITHOUT re-shingling the corpus — proven two ways:
  * the output is identical to a full recompute's delta slice, and the
  * physical plan's only shingling window belongs to the delta side (the
  * corpus contributes two parquet scans and nothing above them).
  */
class DeltaStateSpec extends SparkSpec {

  test("deltaMinhashPairs over parquet state ≡ full recompute's delta slice, corpus scan-only") {
    val docs = graft.sources.Tables.load(spark, sf(), "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val delta = docs.filter(col("doc_id") % 10 === 0)

    // build + persist the warm state the way a pipeline would
    val stateDir = java.nio.file.Files.createTempDirectory("graft-lsh-state")
      .toString
    NearDup.shingleHashRows(corpus, "doc_id", "text", 3)
      .write.mode("overwrite").parquet(s"$stateDir/rows")
    val corpusRows = spark.read.parquet(s"$stateDir/rows")
    NearDup.minhashBands(corpusRows, 192, 3)
      .write.mode("overwrite").parquet(s"$stateDir/bands")
    val corpusBands = spark.read.parquet(s"$stateDir/bands")

    val inc = NearDup.deltaMinhashPairs(corpusRows, corpusBands, delta,
      "doc_id", "text", n = 3, minJ = 0.6)

    // identity: full recompute over corpus ∪ delta, restricted to pairs
    // with >= 1 delta side (the rows ingest ADDS to the corpus pair set)
    val full = NearDup.minhashNearDupPairs(docs, "doc_id", "text",
        n = 3, minJ = 0.6)
      .filter(col("id_a") % 10 === 0 || col("id_b") % 10 === 0)
    val got = inc.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).toSet
    val want = full.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).toSet
    assert(got == want, s"inc=${got.size} full=${want.size} " +
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty) // the split really produces delta-side pairs

    // scan-only corpus: the only shingling KERNEL application in the
    // plan is the DELTA's `graft_shingle_hashes` (the r13 kernel that
    // replaced the lead-window pipeline) — the plan STRING repeats that
    // one subtree per reference (persisted delta arrays are referenced
    // by banding + both verify sides), so count DISTINCT kernel
    // signatures by input expression id, not occurrences. A re-shingled
    // corpus would introduce a second kernel over different ids.
    val plan = inc.queryExecution.executedPlan.toString
    val kernelIds = "graft_shingle_hashes\\(__text#(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(kernelIds.size == 1,
      s"expected 1 distinct (delta-side) shingle kernel, got " +
        s"${kernelIds.size} ($kernelIds)")
    // the corpus state feeds the plan as plain parquet scans
    val nStateScans = "graft-lsh-state".r.findAllIn(plan).size
    assert(nStateScans >= 2, s"expected >=2 parquet state scans, got $nStateScans")
  }

  test("deltaSimhash128Pairs over parquet sketch state ≡ full recompute's delta slice, corpus never re-tokenized") {
    val docs = graft.sources.Tables.load(spark, sf(), "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val delta = docs.filter(col("doc_id") % 10 === 0)

    // warm sketch state on disk, as a daily pipeline keeps it
    val stateDir = java.nio.file.Files.createTempDirectory("graft-sh-state")
      .toString
    corpus.select(col("doc_id").as("id"),
        graft.operators.TextHash.simhash128(col("text")).as("sk128"))
      .select(col("id"), col("sk128").getItem(0).as("hi"),
        col("sk128").getItem(1).as("lo"))
      .write.mode("overwrite").parquet(s"$stateDir/sk")
    val corpusSk = spark.read.parquet(s"$stateDir/sk")

    val inc = NearDup.deltaSimhash128Pairs(corpusSk, delta, "doc_id", "text",
      maxHamming = 3)

    val full = NearDup.simhash128NearDupPairs(docs, "doc_id", "text",
        maxHamming = 3)
      .filter(col("id_a") % 10 === 0 || col("id_b") % 10 === 0)
    val got = inc.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet
    val want = full.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet
    assert(got == want, s"inc=${got.size} full=${want.size} " +
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty)

    // never re-tokenized: the only simhash128 computation in the plan is
    // the DELTA's (one distinct expression subtree — the persisted delta
    // sketch is referenced repeatedly, same expression ids each time);
    // the corpus side contributes the parquet sketch scan only
    val plan = inc.queryExecution.executedPlan.toString
    val skIds = "graft_simhash128\\([^#)]*#(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(skIds.size == 1,
      s"expected 1 distinct (delta-side) simhash128 computation, got " +
        s"${skIds.size} ($skIds)")
    assert("graft-sh-state".r.findAllIn(plan).nonEmpty,
      "expected the corpus sketch state to appear as a parquet scan")
  }

  test("streamed simhash128 ingest: survivors invariant over batch " +
      "slicing and ≡ the one-shot batch policy; state holds every doc") {
    val dir = sf()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val nDocs = docs.count()

    // the one-shot batch answer the stream must reproduce: suppress any
    // doc that pairs (Hamming <= 3 on the 128-bit sketch) with a smaller id
    val pairs = NearDup.simhash128NearDupPairs(docs, "doc_id", "text",
      maxHamming = 3)
    val want = NearDup.nearDupSurvivors(docs, pairs, "doc_id")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(want.size < nDocs,
      "fixture must contain near-dups for the test to bite")

    def run(slices: Int): (Set[Long], String) = {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft-ingest-$slices-").toString
      val got = graft.streaming.BoundedRuns
        .simhash128IngestSurvivors(spark, dir, nSlices = slices,
          workDir = Some(work))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      (got, work)
    }
    val (got4, work4) = run(4)
    val (got1, _) = run(1)
    assert(got4 == want, s"4-batch stream diverged from batch policy: " +
      s"missing=${(want -- got4).take(3)} extra=${(got4 -- want).take(3)}")
    assert(got1 == want, "single-batch stream diverged from batch policy")

    // the state keeps EVERY ingested doc's sketch — rejected ones too
    // (the policy keys on "smaller id", not "smaller surviving id")
    val state = graft.streaming.DedupIngest.readState(spark, s"$work4/state")
    assert(state.count() == nDocs)
    assert(state.select(col("id")).distinct().count() == nDocs)
  }

  test("streamed minhash ingest: survivors invariant over batch slicing " +
      "and ≡ the one-shot q35 policy; both state tables complete") {
    val dir = sf()
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    val pairs = NearDup.minhashNearDupPairs(docs, "doc_id", "text",
      n = 3, minJ = 0.6, numHashes = 192, bandRows = 3)
    val want = NearDup.nearDupSurvivors(docs, pairs, "doc_id")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(want.size < docs.count(),
      "fixture must contain Jaccard near-dups for the test to bite")

    def run(slices: Int): (Set[Long], String) = {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft-mhingest-$slices-").toString
      val got = graft.streaming.BoundedRuns
        .minhashIngestSurvivors(spark, dir, nSlices = slices,
          workDir = Some(work))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      (got, work)
    }
    val (got3, work3) = run(3)
    val (got1, _) = run(1)
    assert(got3 == want, s"3-batch stream diverged from batch policy: " +
      s"missing=${(want -- got3).take(3)} extra=${(got3 -- want).take(3)}")
    assert(got1 == want, "single-batch stream diverged from batch policy")

    // both state tables hold exactly the full-corpus recompute's rows
    // (shingle-bearing docs only — contentless docs have no state rows)
    val fullRows = NearDup.shingleHashRows(docs, "doc_id", "text", 3)
    val stateRows = graft.streaming.DedupIngest
      .readState(spark, s"$work3/state/rows")
    assert(stateRows.count() == fullRows.count())
    val stateBands = graft.streaming.DedupIngest
      .readState(spark, s"$work3/state/bands")
    assert(stateBands.count() ==
      NearDup.minhashBands(fullRows, 192, 3).count())
  }

  test("ingest contract assertion dies loudly on out-of-order arrival — " +
      "even when the violating boundary doc is contentless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val work = java.nio.file.Files
      .createTempDirectory("graft-ingest-ooo-").toString
    graft.streaming.DedupIngest.initMinhashState(spark, s"$work/state")
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupIngest.minhashIngestSink(
        in.toDF().toDF("doc_id", "text"), s"$work/state",
        s"$work/survivors", "doc_id", "text")
      .option("checkpointLocation", s"$work/ckpt")
      .start()
    try {
      // batch 1's max id (100) is a NULL-text doc — it leaves no
      // shingle/band state rows, only the wm watermark can see it
      in.addData((42L, "alpha beta gamma delta"), (100L, null))
      q.processAllAvailable()
      in.addData((77L, "epsilon zeta eta theta")) // 77 < 100: out of order
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        throw new IllegalStateException(
          q.exception.map(_.toString).getOrElse("stream accepted the batch"))
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("monotone"),
        s"expected the monotone-contract failure, got: $msgs")
    } finally q.stop()
  }
}
