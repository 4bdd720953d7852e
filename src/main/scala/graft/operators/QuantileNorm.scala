package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization — force every group's value distribution onto
  * the POOLED distribution (the batch-effect correction of microarray
  * fame, Bolstad et al. 2003; in ML data prep: making per-source feature
  * distributions comparable before training). Each row's value is
  * replaced by the pooled type-7 quantile at its within-group relative
  * rank p = (r − 0.5) / n_g, so each group's normalized multiset is (an
  * interpolated sampling of) the same pooled curve regardless of how
  * skewed the group started.
  *
  * Scale shape: within-group ranks are PARTITIONED windows; the pooled
  * order statistics come from [[PrefixSum.running]] (bucketed two-pass
  * global rank — never a single-partition sort of the table); the
  * quantile lookup is two equi-joins on integer ranks. Everything is a
  * hash shuffle; nothing data-sized funnels through one partition.
  *
  * Determinism: ranks are total orders (value, then `idCol`); p and the
  * type-7 position are fixed-shape IEEE expressions of exact integers;
  * the interpolation `lo·(1−g) + g·hi` runs on the same doubles in any
  * engine. The final snap is `floor(x·100 + 0.5)/100` (half-up to
  * CENTS) — deliberately NOT `round(·, n)`: engines round the same
  * double differently (Spark via its shortest decimal rendering, DuckDB
  * via the binary expansion — observed flipping one row in 1500 at
  * sf0.001), while `floor` of identical doubles is identical by
  * construction.
  */
object QuantileNorm {

  /** Adds `qn_value` — `valCol` normalized onto the pooled distribution.
    * `idCol` must be unique per row (totalizes both rank orders). */
  def toPooled(df: DataFrame, groupCol: String, valCol: String,
      idCol: String): DataFrame = {
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valCol), col(idCol))
    val wn = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__gr", row_number().over(wg))
      .withColumn("__gn", count(lit(1)).over(wn))
    val pooled = PrefixSum.running(
        df.select(col(valCol).cast("double").as("__v"), col(idCol)),
        "__v", idCol, "__v", descending = false)
      .select(col("rnk").as("__prnk"), col("__v").as("__pv"))
    val n = df.count() // bounded driver state: one long, like every fit
    val pos = lit(1.0) + lit((n - 1).toDouble) *
      (col("__gr").cast("double") - lit(0.5)) / col("__gn").cast("double")
    val lo = floor(pos).cast("long")
    val g = pos - floor(pos)
    val withPos = ranked
      .withColumn("__lo", lo)
      .withColumn("__hi", least(lo + 1, lit(n)))
      .withColumn("__g", g)
    val loV = pooled.select(col("__prnk").as("__lo"), col("__pv").as("__lov"))
    val hiV = pooled.select(col("__prnk").as("__hi"), col("__pv").as("__hiv"))
    withPos.join(loV, "__lo").join(hiV, "__hi")
      .withColumn("qn_value", floor(
        (col("__lov") * (lit(1.0) - col("__g"))
          + col("__g") * col("__hiv")) * lit(100.0) + lit(0.5)) / lit(100.0))
      .drop("__gr", "__gn", "__lo", "__hi", "__g", "__lov", "__hiv")
  }
}
