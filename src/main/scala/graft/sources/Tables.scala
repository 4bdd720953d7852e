package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the TESTDATA star schema (TESTDATA.md / FIXTURES.md §B).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it
  * via the legacy `nanosAsLong` conf and convert to a micros timestamp with
  * *integer* division — epoch nanoseconds (~1.7e18) exceed 2^53, so a
  * double-valued division would corrupt timestamps silently.
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every catalog query flows through here — make sure graft's native
    // SQL functions resolve even on driver-owned sessions
    graft.GraftFunctions.register(spark)
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  private val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /** Events with `ts` as a proper TimestampType (micros, truncated from
    * nanos exactly like DuckDB truncates).
    *
    * Session-conf note: `ParquetToSparkSchemaConverter` reads the
    * `nanosAsLong` switch from the live session conf ONLY — both at schema
    * inference and again inside every scan task; passing it as a reader
    * option is ignored (verified empirically: [PARQUET_TYPE_ILLEGAL] either
    * way). So the conf must be set here and must REMAIN set while plans
    * over this relation execute — Spark offers no narrower mechanism. The
    * set is skipped when already in effect, so repeated loads don't touch
    * the conf again. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.getOption(NanosAsLong).forall(_ != "true"))
      spark.conf.set(NanosAsLong, "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // regenerated fixtures store ts as parquet TIMESTAMP(MICROS,
        // isAdjustedToUTC=false), which Spark infers as TIMESTAMP_NTZ.
        // Queries need LTZ internally (unix_micros, streaming event time
        // / watermarks are LTZ-only); under the engine's fixed UTC
        // session the cast is value-identity, and ntzOut / assertNoLtz
        // still guarantee no LTZ column reaches an output file.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
