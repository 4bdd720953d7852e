package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy maximum-coverage data selection — the submodular-curation
  * primitive of training-set construction: pick the k documents whose
  * union of features (n-gram shingles) covers the most of the corpus.
  * The greedy sweep is the classic (1 − 1/e)-approximation for monotone
  * submodular maximization (Nemhauser, Wolsey & Fisher, 1978); in data
  * curation it is the facility-location / coreset-selection loop.
  *
  * Scale shape, per round:
  *  - one hash aggregation over the REMAINING (doc, feature) pairs for
  *    marginal gains (map-side combine, one shuffle);
  *  - a single-row top-1 reduce (`max(struct(gain, -doc))` — no sort, no
  *    window);
  *  - a broadcast anti-join that deletes the winner's features everywhere
  *    (the winner's feature set is one document's worth — always
  *    broadcastable), which removes the winner's own rows too.
  * The pair frame only ever SHRINKS, and each round ends in an eager
  * `localCheckpoint` — the frame is referenced twice per round (gain agg
  * + anti join), which is GraphCore's multi-reference rule for iterative
  * plans (lazy chaining doubles the analyzed plan per round).
  *
  * Driver state is one (round, doc, gain) triple per round — bounded fit
  * machinery, like every `collect()` in the fit paths.
  */
object Coverage {

  /** Greedy max-coverage over distinct (docCol, featCol) pairs.
    * Returns (round: Int, doc_id, gain: Long), one row per selected
    * document, strongest first; stops early when nothing remains.
    * Ties break toward the smaller doc id — the determinism that makes
    * the sweep oracle-checkable against an unrolled SQL mirror (q254).
    *
    * r13 shape (was: per-round `left_anti` against the winner's features
    * followed by a fresh `localCheckpoint` of the whole shrunk frame —
    * i.e. the full pair set REWRITTEN to storage every round): the pair
    * frame is now checkpointed exactly ONCE and never rewritten; covered
    * features accumulate in a driver-side hash set applied as a
    * map-side `InSet` filter under each round's gain aggregation. The
    * covered set is bounded by the union of the ≤ `rounds` winners'
    * feature sets — the same "one document's worth per round, always
    * broadcastable" bound the anti-join already relied on — so per
    * round the work drops from (rewrite + anti-join build + agg) to one
    * filtered aggregation over the warm cache, and rounds 2..k stop
    * paying round-1's storage write. Gains are identical: count of a
    * doc's features not yet covered. */
  def greedySelect(pairs: DataFrame, docCol: String, featCol: String,
      rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    val base = pairs.select(col(docCol).as("doc"), col(featCol).as("f"))
      .localCheckpoint()
    val covered = new java.util.HashSet[Any]()
    def remaining: DataFrame =
      if (covered.isEmpty) base
      else base.filter(!col("f").isInCollection(
        scala.jdk.CollectionConverters.SetHasAsScala(covered).asScala.toSeq))
    val picks = new ArrayBuffer[(Int, Long, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = remaining.groupBy(col("doc"))
        .agg(count(lit(1)).as("gain"))
        .agg(max(struct(col("gain"), (-col("doc")).as("negdoc"))).as("m"))
        .select(col("m.gain").as("gain"), (-col("m.negdoc")).as("doc"))
        .collect()
      if (top.isEmpty || top(0).isNullAt(0)) done = true
      else {
        val gain = top(0).getLong(0)
        val doc = top(0).getLong(1)
        picks += ((r, doc, gain))
        // winner's still-uncovered features join the covered set (its
        // already-covered ones are in it by construction) — one bounded
        // driver collect per round, the same cardinality the anti-join
        // broadcast shipped
        remaining.filter(col("doc") === lit(doc)).select("f")
          .collect().foreach(row => covered.add(row.get(0)))
        r += 1
      }
    }
    base.unpersist()
    picks.toSeq.toDF("round", "doc_id", "gain")
  }
}
