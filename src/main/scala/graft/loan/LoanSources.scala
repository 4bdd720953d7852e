package graft.loan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Ingest for the loan domain (SURVEY §2.1 S1/S2): JSONL and JDBC sources
  * behind one trait so pipelines are storage-agnostic and tests swap in
  * fixtures.
  *
  * Both paths declare schemas explicitly — inference is nondeterministic at
  * scale and the reference itself declares DDL
  * (MySQL_Data_Loading.ipynb:437-504). JSON NaNs in double columns are
  * normalized to SQL NULL at the boundary (P7: pandas conflates NaN/None;
  * Spark distinguishes them, and every downstream null-handling operator
  * assumes SQL NULL).
  */
trait LoanSource {
  def applicantInfo: DataFrame
  def financialInfo: DataFrame
  def loanInfo: DataFrame

  /** The merged 12-column analysis table (J1 + P1). */
  def merged: DataFrame =
    LoanTransforms.merged(applicantInfo, financialInfo, loanInfo)
}

object LoanSources {

  /** NaN → NULL for every double column (P7). */
  def normalizeNans(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == DoubleType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name, when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)))
    }

  /** S1: line-delimited JSON files with declared schemas.
    * `spark.read.schema(...).json` streams and splits like any file
    * source — no inference pass over the data. */
  def jsonl(spark: SparkSession, applicantPath: String, financialPath: String,
      loanPath: String): LoanSource = new LoanSource {
    private def read(path: String, schema: StructType): DataFrame =
      normalizeNans(spark.read.schema(schema).json(path))
    def applicantInfo: DataFrame = read(applicantPath, LoanSchemas.applicantInfo)
    def financialInfo: DataFrame = read(financialPath, LoanSchemas.financialInfo)
    def loanInfo: DataFrame = read(loanPath, LoanSchemas.loanInfo)
  }

  /** S2: JDBC tables. Catalyst pushes projections and filters into the
    * generated SQL; `customSchema` pins column types so different drivers
    * produce identical frames. Partitioned reads (`partitionColumn` etc.)
    * are the caller's `options`. */
  def jdbc(spark: SparkSession, url: String,
      options: Map[String, String] = Map.empty,
      applicantTable: String = "applicant_info",
      financialTable: String = "financial_info",
      loanTable: String = "loan_info"): LoanSource = new LoanSource {
    private def read(table: String): DataFrame =
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(options)
        .load()
    def applicantInfo: DataFrame = read(applicantTable)
    def financialInfo: DataFrame = read(financialTable)
    def loanInfo: DataFrame = read(loanTable)
  }

  /** Parquet fixtures laid out as `<dir>/<table>.parquet` (tests). */
  def parquet(spark: SparkSession, dir: String): LoanSource = new LoanSource {
    def applicantInfo: DataFrame = spark.read.parquet(s"$dir/applicant_info.parquet")
    def financialInfo: DataFrame = spark.read.parquet(s"$dir/financial_info.parquet")
    def loanInfo: DataFrame = spark.read.parquet(s"$dir/loan_info.parquet")
  }
}
