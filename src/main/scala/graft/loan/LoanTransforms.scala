package graft.loan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's cleaning / feature-derivation surface as pure Catalyst
  * column expressions — no UDFs anywhere (SURVEY §2.3, §2.8, §2.9).
  */
object LoanTransforms {

  /** P4/P5/P9: `Dependents` sentinel "3+" → 3, parseable → number, junk →
    * null (pandas-NaN semantics — `try_cast`, since Spark 4's default ANSI
    * cast throws on malformed input). Main ipynb:680-681, app.py:42-48. */
  def cleanDependents(c: Column): Column =
    when(c === "3+", lit(3.0)).otherwise(c.try_cast("double"))

  /** P6: target map Y→1, N→0, anything else → null (pandas `.map`
    * semantics: unmapped keys become NaN). Main ipynb:815. */
  def encodeTarget(c: Column): Column =
    when(c === "Y", 1.0).when(c === "N", 0.0).otherwise(lit(null).cast("double"))

  /** The 3-way star join on Loan_ID with USING-semantics (single key
    * column, like pandas `merge(on=)`). Main ipynb:378. At reference scale
    * Catalyst broadcasts; at 100 TB it falls back to sort-merge on the key
    * — no hints needed, AQE decides. */
  def merged(applicant: DataFrame, financial: DataFrame, loan: DataFrame): DataFrame =
    applicant
      .join(financial, Seq(LoanSchemas.keyCol))
      .join(loan, Seq(LoanSchemas.keyCol))

  /** Cleaning applied to the merged table: Dependents numeric column. */
  def cleaned(df: DataFrame): DataFrame =
    df.withColumn("Dependents_num", cleanDependents(col("Dependents")))

  /** P8 + §2.9 README-claimed features, implemented as first-class engine
    * features: Total_Income (app.py:50,59), EMI proxy, loan-to-income
    * ratio, and log1p transforms of the skewed money columns. */
  def withDerivedFeatures(df: DataFrame): DataFrame =
    df.withColumn("Total_Income", col("ApplicantIncome") + col("CoapplicantIncome"))
      .withColumn("EMI_proxy", col("LoanAmount") / col("Loan_Amount_Term"))
      .withColumn("Loan_to_Income",
        when(col("Total_Income") =!= 0.0, col("LoanAmount") / col("Total_Income")))
      .withColumn("Log_ApplicantIncome", log1p(col("ApplicantIncome")))
      .withColumn("Log_Total_Income", log1p(col("Total_Income")))

  /** Label column for training. */
  def withLabel(df: DataFrame): DataFrame =
    df.withColumn("label", encodeTarget(col(LoanSchemas.labelCol)))
}
