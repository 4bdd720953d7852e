package graft.loan

import org.apache.spark.sql.types._

/** Explicit schemas for the loan domain — declared, never inferred
  * (inference is nondeterministic at scale and the reference itself declares
  * them as MySQL DDL: `MySQL_Data_Loading.ipynb:437-444, 468-476, 499-504`).
  */
object LoanSchemas {

  /** applicant_info (MySQL_Data_Loading.ipynb:437-444). */
  val applicantInfo: StructType = StructType(Seq(
    StructField("Loan_ID", StringType, nullable = false),
    StructField("Gender", StringType),
    StructField("Married", StringType),
    StructField("Dependents", StringType),
    StructField("Education", StringType),
    StructField("Self_Employed", StringType)))

  /** financial_info (MySQL_Data_Loading.ipynb:468-476). */
  val financialInfo: StructType = StructType(Seq(
    StructField("Loan_ID", StringType, nullable = false),
    StructField("ApplicantIncome", DoubleType),
    StructField("CoapplicantIncome", DoubleType),
    StructField("LoanAmount", DoubleType),
    StructField("Loan_Amount_Term", DoubleType),
    StructField("Credit_History", DoubleType)))

  /** loan_info (MySQL_Data_Loading.ipynb:499-504). */
  val loanInfo: StructType = StructType(Seq(
    StructField("Loan_ID", StringType, nullable = false),
    StructField("Property_Area", StringType),
    StructField("Loan_Status", StringType)))

  /** Column groups of the merged 614×12 analysis table (main ipynb:546). */
  val numericCols: Seq[String] = Seq("ApplicantIncome", "CoapplicantIncome",
    "LoanAmount", "Loan_Amount_Term", "Credit_History", "Dependents_num")
  val categoricalCols: Seq[String] = Seq("Gender", "Married", "Education",
    "Self_Employed", "Property_Area")
  val labelCol = "Loan_Status"
  val keyCol = "Loan_ID"

  /** Typed row for the merged analysis table (SURVEY §1.4). */
  final case class LoanRecord(
      Loan_ID: String,
      Gender: Option[String], Married: Option[String],
      Dependents: Option[String], Education: Option[String],
      Self_Employed: Option[String],
      ApplicantIncome: Option[Double], CoapplicantIncome: Option[Double],
      LoanAmount: Option[Double], Loan_Amount_Term: Option[Double],
      Credit_History: Option[Double],
      Property_Area: Option[String], Loan_Status: Option[String])
}
