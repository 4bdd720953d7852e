package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Vectors}

/** LSH ANN quality gates: deterministic output and recall vs brute force.
  * (q34 has no SQL oracle — this spec is its correctness contract.)
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = graft.sources.Tables.load(spark, sf(), "embeddings")

  test("native HyperplaneBuckets is bit-identical to the HOF bucket formula") {
    val v = Vectors.asDouble(col("embedding"))
    val numPlanes = 4
    val numTables = 16
    val cmp = emb.select(
      Similarity.bucketIds(v, numPlanes, numTables).as("native"),
      transform(sequence(lit(0), lit(numTables - 1)),
        t => Similarity.bucketIdHof(v, numPlanes, t)).as("hof"))
    val bad = cmp.filter(!(col("native") <=> col("hof")))
    assert(bad.count() == 0, s"bucket mismatch: ${bad.take(1).mkString}")
  }

  test("annTopK is deterministic for fixed params") {
    val q = emb.filter(col("vec_id") < 10)
    val a = Similarity.annTopK(q, emb, "vec_id", "embedding", 3).collect().toSeq
    val b = Similarity.annTopK(q, emb, "vec_id", "embedding", 3).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("annTopK recall@3 vs brute force on near-uniform synthetic data") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Vectors.bruteForceKnn(q, emb, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(q, emb, "vec_id", "embedding", 3,
        numPlanes = 4, numTables = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // synthetic embeddings are near-uniform (no cluster structure), the
    // hardest case for LSH; 4 planes x 16 tables still recovers most of
    // the true top-3
    assert(recall >= 0.6, s"recall@3 = $recall")
  }

  test("annTopK at default params EQUALS brute force (q34's oracle contract)") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Vectors.bruteForceKnn(q, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val ann = Similarity.annTopK(q, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ann == exact, s"ANN != brute force: missing=${(exact -- ann).take(3)}")
  }

  test("ivfTopK: high recall on clustered data, scans a corpus fraction") {
    import spark.implicits._
    // 20 well-separated clusters x 10 members in 8 dims: the geometry IVF
    // is built for (real embedding corpora cluster; LSH covers the
    // uniform case)
    def vec(cluster: Int, member: Int): Array[Float] =
      Array.tabulate(8) { d =>
        val center = if (d == cluster % 8) 10f * (1 + cluster / 8) else 0f
        center + (member * 7 + d * 3) % 5 * 0.01f
      }
    val data = for (c <- 0 until 20; m <- 0 until 10)
      yield (c * 10L + m, vec(c, m))
    val corpus = data.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 10 === 0) // one per cluster

    val exact = Vectors.bruteForceKnn(queries, corpus, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", 3,
        nlist = 20, nprobe = 3, seed = 42L)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall@3 = $recall")
  }

  test("ivfTopK is deterministic for a fixed seed") {
    val q = emb.filter(col("vec_id") < 5)
    val a = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 3).collect().toSeq
    val b = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 3).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("ivfSearch: broadcast-join fallback is bit-identical to the compiled form") {
    val q = emb.filter(col("vec_id") < 10)
    val centroids = Similarity.ivfFitCentroids(emb, "embedding", nlist = 16)
    val compiled = Similarity.ivfSearch(q, emb, centroids, "vec_id",
        "embedding", k = 3, nprobe = 4)
      .orderBy("query_id", "rank").collect().toSeq
    // compileMaxCoeffs = 0 forces the relational path at any nlist; the
    // outputs (including the double sims) must match exactly — same
    // |c|² − 2·v·c arithmetic, same (d, cell) and (sim, id) tie rules
    val relational = Similarity.ivfSearch(q, emb, centroids, "vec_id",
        "embedding", k = 3, nprobe = 4, compileMaxCoeffs = 0L)
      .orderBy("query_id", "rank").collect().toSeq
    assert(compiled.nonEmpty && compiled == relational)
  }

  test("lshNearDupCandidates covers all pairs above the report threshold") {
    val truth = Vectors.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // degraded params (more planes, fewer tables) still cover most pairs...
    val cand = Similarity.lshNearDupCandidates(emb, "vec_id", "embedding", 4, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val covered = (truth & cand).size.toDouble / math.max(truth.size, 1)
    assert(covered >= 0.6, s"candidate coverage = $covered (${truth.size} true pairs)")
    // ...and the tuned defaults cover ALL of them (q30's oracle contract)
    val candDefault = Similarity.lshNearDupCandidates(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((truth -- candDefault).isEmpty,
      s"default-params candidates miss true pairs: ${(truth -- candDefault).take(3)}")
  }

  test("lshNearDupPairs equals the exact cosine near-dup operator") {
    val exact = Vectors.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact, s"LSH pairs != exact pairs (missing ${(exact -- lsh).take(3)})")
  }
}
