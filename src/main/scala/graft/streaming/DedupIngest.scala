package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.{NearDup, TextHash}

/** Streaming near-duplicate INGEST — the frontier loop of a training-data
  * pipeline, where documents arrive continuously and each batch must be
  * admitted or suppressed against everything already seen. The warm state
  * is q358's (id, hi, lo) 128-bit simhash table persisted as parquet
  * (exactly [[NearDup.deltaSimhash128Pairs]]'s corpus side): per
  * micro-batch the loop sketches ONLY the batch, band-probes the state
  * scan + itself, emits the batch's survivors, and appends the batch's
  * sketches — accepted AND rejected — to the state.
  *
  * Admission contract (what makes the stream's output a pure function of
  * the corpus, independent of micro-batch boundaries): a document is
  * suppressed iff some SMALLER-id document — surviving or not — is within
  * `maxHamming` 128-bit Hamming distance. That is exactly
  * [[NearDup.nearDupSurvivors]]'s batch policy, so for ANY slicing of the
  * corpus into monotone-id batches the streamed survivor set equals the
  * one-shot batch computation (DeltaStateSpec proves 1-batch ≡ 4-batch ≡
  * batch reference). Rejected docs stay in state because the policy keys
  * on "smaller id", not "smaller surviving id" — dropping them would make
  * the outcome depend on where batch boundaries fall in a near-dup chain
  * (a ~ b ~ c with a !~ c admits c in a batch pipeline; a state holding
  * only survivors would suppress c whenever b arrived in an earlier
  * batch).
  *
  * Ids must be monotone across batches (ingest-assigned sequence / offset
  * ids — the append-only-log shape; [[NearDup.deltaContainmentPairs]]'s
  * disjoint-id contract, strengthened to ordered). Each batch ASSERTS the
  * contract against the state's max id and fails loudly on out-of-order
  * arrival rather than silently emitting an order-dependent answer.
  *
  * Scale shape per batch at 100 TB: the state contributes a 24-byte-row
  * parquet scan (never re-tokenized, never re-shuffled as text); the
  * probe exchanges are (long, int, long) band rows sized by |batch| +
  * band collisions (2⁻³² per unrelated pair — sub-linear to n ≈ 10⁹,
  * q359's bound); the two driver lookups are single-row contract scalars.
  */
object DedupIngest {

  /** q358's sketch-dump shape — the state table's schema. */
  val sketchSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("hi", LongType),
    StructField("lo", LongType)))

  /** Seed an EMPTY sketch-state directory (zero-row parquet with the
    * schema on disk), so the first batch's state read plans like every
    * later one — no cold-start special case in the loop. */
  def initSimhash128State(spark: SparkSession, stateDir: String): Unit =
    spark.createDataFrame(new java.util.ArrayList[Row](), sketchSchema)
      .write.mode("overwrite").parquet(stateDir)

  /** The ingest sink: attach `.trigger(...)/.start()` (and a checkpoint
    * location) to the returned writer. Survivors land in `survivorsDir`
    * as (idCol, sk_hi, sk_lo) parquet appends; `stateDir` must exist
    * ([[initSimhash128State]] for a fresh corpus, or any q358-shaped dump
    * of an existing one). Idempotence under micro-batch REPLAY holds for
    * the state (sketch rows re-append identically and the band probe
    * dedups candidates) but duplicates survivor-file rows, so exactly-once
    * delivery of `survivorsDir` relies on the checkpoint as usual. */
  def simhash128IngestSink(docs: DataFrame, stateDir: String,
      survivorsDir: String, idCol: String, textCol: String,
      maxHamming: Int = 3): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val bSk = batch.select(col(idCol).cast("long").as("id"),
          TextHash.simhash128(col(textCol)).as("sk128"))
        .select(col("id"), col("sk128").getItem(0).as("hi"),
          col("sk128").getItem(1).as("lo"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val state = spark.read.parquet(stateDir)
        // bounded driver scalars: the monotone-arrival contract check
        val maxState = state.agg(max(col("id"))).head().get(0)
        val minBatch = bSk.agg(min(col("id"))).head().get(0)
        require(maxState == null || minBatch == null ||
          maxState.asInstanceOf[Long] < minBatch.asInstanceOf[Long],
          s"ingest ids must be monotone across batches: state max=" +
            s"$maxState >= batch min=$minBatch (out-of-order arrival)")
        // id_b (the greater id) is always the batch side: state ids are
        // all smaller by the contract, and delta×delta pairs are
        // canonical — so "pairs with a smaller doc" = distinct id_b
        val rejected = NearDup
          .deltaSimhash128PairsFromSketches(state, bSk, maxHamming)
          .select(col("id_b").as("id")).distinct()
        bSk.join(rejected, Seq("id"), "left_anti")
          .select(col("id").as(idCol), col("hi").as("sk_hi"),
            col("lo").as("sk_lo"))
          .write.mode("append").parquet(survivorsDir)
        bSk.write.mode("append").parquet(stateDir)
      } finally bSk.unpersist()
    }

  /** The MINHASH-tier state shapes: `rows` is [[NearDup.shingleHashRows]]
    * output (the exact-verify side), `bands` is [[NearDup.minhashBands]]
    * output (the probe side). */
  val shingleRowsSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("hs", LongType)))
  val bandsSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("band", IntegerType),
    StructField("bhash", LongType)))

  /** Seed an empty minhash state directory (`rows` + `bands` + `wm`
    * subdirs). `wm` is the id WATERMARK table (one max-id row per
    * ingested batch): unlike the simhash tier — whose sketch table has a
    * row for every doc, NULL-text included — the shingle/band tables
    * only hold shingle-BEARING docs, so the monotone-arrival check needs
    * its own record or an out-of-order arrival whose boundary doc is
    * contentless would slip the assertion. */
  def initMinhashState(spark: SparkSession, stateDir: String): Unit = {
    spark.createDataFrame(new java.util.ArrayList[Row](), shingleRowsSchema)
      .write.mode("overwrite").parquet(s"$stateDir/rows")
    spark.createDataFrame(new java.util.ArrayList[Row](), bandsSchema)
      .write.mode("overwrite").parquet(s"$stateDir/bands")
    spark.createDataFrame(new java.util.ArrayList[Row](),
        StructType(Seq(StructField("id", LongType))))
      .write.mode("overwrite").parquet(s"$stateDir/wm")
  }

  /** [[simhash128IngestSink]]'s loop on the MinHash/LSH tier — the
    * Jaccard-threshold admission production ingests actually run (GPT-3
    * style fuzzy dedup at ingest time). Same contract (monotone ids,
    * suppress iff a smaller-id doc is a near-dup — here true n-gram
    * Jaccard ≥ minJ on LSH-discovered, exactly-verified pairs; rejected
    * docs stay in state), but the warm state is TWO tables: the banded
    * signatures the batch probes, and the shingle-hash rows the exact
    * verify reads — each batch shingles only itself
    * ([[NearDup.deltaMinhashPairsFromRows]]) and appends both its frames.
    * Recall is the 1-(1-J³)⁶⁴ LSH bound (≥ 1-2e-7 at J=0.6), identical
    * to the batch q35 policy it mirrors; candidates are exactly verified,
    * so admission never suppresses on a false collision.
    *
    * Scale shape per batch: the state band table is probed by a hash
    * join BUILT on the batch's bands (the corpus side streams); the
    * exact verify touches only candidate ids' shingle sets; exchanges
    * carry (long, long) / (long, int, long) rows — never text. */
  def minhashIngestSink(docs: DataFrame, stateDir: String,
      survivorsDir: String, idCol: String, textCol: String, n: Int = 3,
      minJ: Double = 0.6, numHashes: Int = 192, bandRows: Int = 3)
      : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val b = batch.select(col(idCol).cast("long").as("id"),
          col(textCol).as("__text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val bRows = NearDup.shingleHashRows(b, "id", "__text", n)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val bBands = NearDup.minhashBands(bRows, numHashes, bandRows)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val sRows = spark.read.parquet(s"$stateDir/rows")
        val sBands = spark.read.parquet(s"$stateDir/bands")
        // bounded driver scalars: the monotone-arrival contract check —
        // against the wm table, which records EVERY batch's max id
        // (contentless docs included; the shingle/band tables would miss
        // them)
        val maxState = spark.read.parquet(s"$stateDir/wm")
          .agg(max(col("id"))).head().get(0)
        val minBatch = b.agg(min(col("id"))).head().get(0)
        require(maxState == null || minBatch == null ||
          maxState.asInstanceOf[Long] < minBatch.asInstanceOf[Long],
          s"ingest ids must be monotone across batches: state max=" +
            s"$maxState >= batch min=$minBatch (out-of-order arrival)")
        val rejected = NearDup
          .deltaMinhashPairsFromRows(sRows, sBands, bRows, bBands, minJ)
          .select(col("id_b").as("id")).distinct()
        b.join(rejected, Seq("id"), "left_anti")
          .select(col("id").as(idCol))
          .write.mode("append").parquet(survivorsDir)
        bRows.write.mode("append").parquet(s"$stateDir/rows")
        bBands.write.mode("append").parquet(s"$stateDir/bands")
        b.agg(max(col("id")).as("id")).filter(col("id").isNotNull)
          .write.mode("append").parquet(s"$stateDir/wm")
      } finally { bBands.unpersist(); bRows.unpersist(); b.unpersist() }
    }
}
