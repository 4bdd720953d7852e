package graft.loan

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic loan-domain data matching the reference's
  * schemas and null patterns (FIXTURES.md §A): string categoricals with
  * nulls, the `"3+"` Dependents sentinel, numeric nulls, and a learnable
  * approval rule (credit history + income) with noise — so ML tests have
  * signal and null-handling paths all fire.
  */
object SyntheticLoanData {

  final case class Rows(applicant: Seq[ApplicantRow], financial: Seq[FinancialRow],
      loan: Seq[LoanRow])

  final case class ApplicantRow(Loan_ID: String, Gender: String, Married: String,
      Dependents: String, Education: String, Self_Employed: String)
  final case class FinancialRow(Loan_ID: String, ApplicantIncome: java.lang.Double,
      CoapplicantIncome: java.lang.Double, LoanAmount: java.lang.Double,
      Loan_Amount_Term: java.lang.Double, Credit_History: java.lang.Double)
  final case class LoanRow(Loan_ID: String, Property_Area: String, Loan_Status: String)

  def rows(n: Int): Rows = {
    val trip = (1 to n).map { i =>
      val id = f"LP$i%04d"
      val gender = if (i % 7 == 0) null else if (i % 3 == 0) "Female" else "Male"
      val married = if (i % 11 == 0) null else if (i % 2 == 0) "Yes" else "No"
      val deps = i % 5 match {
        case 0 => "3+"; case 1 => "0"; case 2 => "1"; case 3 => "2"; case _ => null
      }
      val edu = if (i % 4 == 0) "Not Graduate" else "Graduate"
      val selfEmp = if (i % 13 == 0) null else if (i % 6 == 0) "Yes" else "No"
      val income: java.lang.Double = 2000.0 + (i % 17) * 350.0
      val coIncome: java.lang.Double = if (i % 3 == 0) 0.0 else 800.0 + (i % 5) * 200.0
      val loanAmt: java.lang.Double = if (i % 19 == 0) null else 80.0 + (i % 23) * 8.0
      val term: java.lang.Double = if (i % 29 == 0) null else 360.0
      val credit: java.lang.Double =
        if (i % 9 == 0) null else if (i % 8 == 0) 0.0 else 1.0
      val area = i % 3 match {
        case 0 => "Urban"; case 1 => "Semiurban"; case _ => "Rural"
      }
      val approved = (credit != null && credit == 1.0 && income > 2600.0) || i % 10 == 0
      (ApplicantRow(id, gender, married, deps, edu, selfEmp),
        FinancialRow(id, income, coIncome, loanAmt, term, credit),
        LoanRow(id, area, if (approved) "Y" else "N"))
    }
    Rows(trip.map(_._1), trip.map(_._2), trip.map(_._3))
  }

  /** The merged analysis table directly (what LoanSpec trains on). */
  def mergedDf(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val r = rows(n)
    LoanTransforms.merged(r.applicant.toDF(), r.financial.toDF(), r.loan.toDF())
  }

  /** Write the three tables as JSONL files (S1 fixture) under `dir`;
    * returns (applicantPath, financialPath, loanPath). */
  def writeJsonl(spark: SparkSession, dir: String, n: Int): (String, String, String) = {
    import spark.implicits._
    val r = rows(n)
    def dump(df: DataFrame, name: String): String = {
      val path = s"$dir/$name"
      df.coalesce(1).write.mode("overwrite").json(path)
      path
    }
    (dump(r.applicant.toDF(), "applicant_info"),
      dump(r.financial.toDF(), "financial_info"),
      dump(r.loan.toDF(), "loan_info"))
  }
}
