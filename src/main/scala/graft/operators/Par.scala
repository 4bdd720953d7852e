package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan fan-out for kernel-heavy stages (r13).
  *
  * The r13 per-row kernels (shingling, minhash banding, simhash
  * sketching, wordpiece tokenization, vector arithmetic) collapsed
  * pipelines' first exchange into scan-stage expressions — exposing a
  * small-input hazard: parquet parallelism is bounded by row groups, and
  * the bench fixtures are single-row-group files, so a kernel stage that
  * used to run on 32 post-exchange partitions ran on 1-3 scan tasks
  * (measured: the minhash family regressed 3-4× at sf0.1 when its kernel
  * landed without this; §2.6 of the optimization guide — idle capacity).
  *
  * [[fanOut]] repartitions the narrow pre-kernel projection by a
  * deterministic hash key ONLY when the frame has fewer partitions than
  * the session's parallelism. At production scale a table scan has
  * orders of magnitude more splits than cores, so the condition is
  * structurally false and the plan is untouched — this is a
  * partition-count comparison, not a tuned constant. Hash-by-key (not
  * round-robin) keeps row placement deterministic under task retry
  * (SPARK-38388 class) and skips round-robin's sort-before-repartition
  * pass. Callers project to exactly the columns the kernel needs FIRST,
  * so the exchange moves keys + payload-to-be-hashed and nothing else.
  */
object Par {

  def fanOut(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
