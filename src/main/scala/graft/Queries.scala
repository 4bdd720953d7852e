package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The operator catalog: every implemented operator from SURVEY.md §2 (plus
  * the LLM-data-pipeline extensions) exposed as a runnable query over the
  * TESTDATA star schema, each paired with a DuckDB oracle in ANSI SQL.
  * Entries live in [[Catalog1]]..[[Catalog7]] (split by catalog position,
  * original order preserved); shared helpers in [[CatalogBase]].
  *
  * Conventions that make the oracle hash-compare exact:
  *  - money/metric aggregation in exact DECIMAL, finalized to double
  *    ([[graft.functions.Stable]]) — combine-order-independent;
  *  - every query has a total deterministic ORDER BY (ties broken by key);
  *  - aggregate output column names aliased identically on both sides.
  */
object Queries
  extends Catalog1 with Catalog2 with Catalog3 with Catalog4
  with Catalog5 with Catalog6 with Catalog7 {

  val all: Seq[(String, Q)] =
    entries1 ++ entries2 ++ entries3 ++ entries4 ++ entries5 ++ entries6 ++ entries7

  /** name -> builder, for SparkEntry.queries. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.build }.toMap

  /** name -> DuckDB oracle SQL, for SparkEntry.oracleSql. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, q) if q.oracle.isDefined =>
      // Do NOT collapse whitespace: SQL string literals may contain spaces
      // (e.g. '4-NOT SPECIFIED'); Verify JSON-escapes newlines correctly.
      n -> q.oracle.get.trim
    }.toMap

  /** Headline queries for Bench (stress-tier entries excluded — they
    * time separately so one deliberate outlier cannot drown the
    * round-over-round decade signal of the rest). */
  def benchNames: Seq[String] =
    all.collect { case (n, q) if q.bench && !q.stress => n }

  /** The stress tier: benched deliberately-adversarial regimes, pinned
    * as their own artifact (bench_idle_*_stress.json). */
  def stressNames: Seq[String] =
    all.collect { case (n, q) if q.bench && q.stress => n }
}
