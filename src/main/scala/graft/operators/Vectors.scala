package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators: cosine similarity, brute-force k-NN, and
  * within-group cohesion — the baseline layer of the similarity-search
  * stack (an LSH-bucketed variant lives in [[Similarity]]).
  *
  * All arithmetic is `float -> double` promoted *before* multiplying and
  * accumulated left-to-right, exactly as the DuckDB oracle's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])` does, so similarity scores
  * are bit-identical across engines.
  */
object Vectors {

  /** Promote an array<float> column to array<double> (exact). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Embedding validity envelope: L2 norm (computed in double) must land
    * in [[NormFloor]], [[NormCeil]]]. One predicate subsumes every
    * degenerate-vector class a raw 100 TB corpus ships:
    *   - NaN/Inf elements → dot(v,v) is NaN/Inf → both comparisons false;
    *   - zero vectors → norm 0 < floor (cosine would divide by zero);
    *   - underflow-scale vectors (|x| ~ 1e-30) → norm below floor (their
    *     pairwise dots underflow to 0 → 0/0 NaN similarities);
    *   - corrupt huge-magnitude vectors (|x| ~ 1e18) → norm above ceil
    *     (they overflow the exact-decimal audit paths, e.g. round(x²,12)
    *     into DECIMAL(28,12), and long-cast content fingerprints).
    * NaN comparison semantics agree across engines here: Spark orders NaN
    * greater than any value (so `NaN <= ceil` is false) and DuckDB does
    * the same — the predicate is false for NaN norms on both. Valid
    * duplicates, antipodes, and zero-variance vectors PASS — similarity
    * operators must handle those, and the adversarial fixture keeps them.
    */
  val NormFloor = 1e-6
  val NormCeil = 1e6

  /** L2 norm of a float/double array column, accumulated in double. */
  def l2norm(v: Column): Column = {
    val d = asDouble(v)
    sqrt(call_function("graft_dot", d, d))
  }

  /** The validity predicate (see [[NormFloor]]). */
  def isValidEmbedding(v: Column): Column =
    l2norm(v).between(NormFloor, NormCeil)

  /** Gate a frame to valid embeddings — the mandatory pre-filter of every
    * similarity/centroid/quantization operator in the catalog. A map-side
    * scan filter: no shuffle, and invalid rows never reach the O(n²)/agg
    * machinery. */
  def validEmbeddings(df: DataFrame, vecCol: String): DataFrame =
    df.filter(isValidEmbedding(col(vecCol)))

  /** DuckDB mirror of [[isValidEmbedding]] as a WHERE-clause snippet. */
  def sqlValidEmbedding(expr: String): String =
    s"sqrt(list_dot_product(CAST($expr AS DOUBLE[]), CAST($expr AS DOUBLE[]))) " +
      s"BETWEEN $NormFloor AND $NormCeil"

  /** Sequential-order dot product of two array<double> columns — the
    * native codegen'd [[graft.functions.DotProduct]] expression (requires
    * [[graft.GraftFunctions.register]] / GraftExtensions on the session;
    * all graft entry points install it). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Cosine similarity `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`,
    * computed in one array pass by the native
    * [[graft.functions.CosineSimilarity]] expression. Bit-identical to the
    * composed-from-dots form (same left-to-right accumulation). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Interpreted HOF fallback of [[dot]] for sessions without graft's
    * function registry — identical semantics and accumulation order. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Embedding-cosine near-duplicate pairs: all id-ordered pairs with
    * similarity ≥ minSim. This is the exact O(n²) verifier — at corpus
    * scale run it over LSH bucket candidates ([[Similarity.lshNearDupCandidates]])
    * instead of the full cross product; the expression and output contract
    * are identical. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minSim: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Symmetric int8 quantization audit — the storage/serving compression
    * step of a vector pipeline: per vector, scale = 127 / max|x|,
    * q_i = clamp(floor(x_i·scale + 0.5), ±127), and the audit reports the
    * max reconstruction error, the count of NONZERO inputs crushed to
    * zero (exact input zeros are excluded — they lose nothing), and the
    * L2 norm. `floor(+0.5)` (not `round`) keeps the rounding rule an
    * unambiguous IEEE op on both engines; the L2 sum accumulates in exact
    * decimal (order-independent), per-term snapped at 12 dp.
    *
    * Scale shape: explode → one window max per vector (a single hash
    * shuffle of narrow (id, x) rows) → hash aggregation; everything stays
    * codegen'd — no interpreted array HOFs. Zero vectors quantize to all
    * zeros (guard, not NaN). */
  def int8QuantAudit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val el = df.select(col(idCol).as("id"),
      explode(col(vecCol)).as("xf"))
      .select(col("id"), col("xf").cast("double").as("x"))
    val w = Window.partitionBy(col("id"))
    val qn = el
      .withColumn("mx", max(abs(col("x"))).over(w))
      // ANSI mode: the division itself must be guarded (zero vectors),
      // not just its consumers — the placeholder 1.0 never escapes because
      // every use below branches on mx = 0 first
      .withColumn("scale",
        when(col("mx") === 0.0, lit(1.0)).otherwise(lit(127.0) / col("mx")))
      .withColumn("q",
        when(col("mx") === 0.0, lit(0L)).otherwise(
          greatest(lit(-127L),
            least(lit(127L), floor(col("x") * col("scale") + 0.5).cast("long")))))
      .withColumn("err",
        when(col("mx") === 0.0, lit(0.0))
          .otherwise(abs(col("q") / col("scale") - col("x"))))
    qn.groupBy(col("id"))
      .agg(
        round(max(col("err")), 8).as("max_abs_err"),
        sum(when(col("q") === 0 && col("x") =!= 0.0, 1L).otherwise(0L))
          .as("n_crushed"),
        round(sqrt(sum(round(col("x") * col("x"), 12).cast("decimal(28,12)"))
          .cast("double")), 8).as("l2_norm"))
  }

  /** Brute-force top-k neighbors for the `queries` rows against the full
    * corpus. The query side is broadcast (it is the small side by
    * construction); the corpus streams through map-side only — no shuffle
    * of the 100 TB side. Ranking uses row_number with an id tiebreak so
    * results are deterministic. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }
}
