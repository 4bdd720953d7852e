package graft.loan

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M13 / app.py parity: load a persisted PipelineModel once, score
  * schema-checked single rows (or micro-batches) and return
  * (prediction, P(approved)).
  *
  * The serving input schema is the 11-field shape of app.py:52-65 —
  * `Dependents` arrives raw (possibly "3+") and is cleaned with the same
  * expression used in training, so there is no train/serve skew. Batches
  * are validated against [[inputSchema]] at the boundary (missing column →
  * clear error here, not deep inside an MLlib stage) and columns are cast
  * to the declared types.
  */
class Scorer(val model: PipelineModel, spark: SparkSession) {

  val inputSchema: StructType = StructType(Seq(
    StructField("Gender", StringType),
    StructField("Married", StringType),
    StructField("Dependents", StringType),
    StructField("Education", StringType),
    StructField("Self_Employed", StringType),
    StructField("ApplicantIncome", DoubleType),
    StructField("CoapplicantIncome", DoubleType),
    StructField("LoanAmount", DoubleType),
    StructField("Loan_Amount_Term", DoubleType),
    StructField("Credit_History", DoubleType),
    StructField("Property_Area", StringType)))

  def scoreBatch(input: DataFrame): DataFrame = {
    val missing = inputSchema.fieldNames.filterNot(input.columns.contains)
    require(missing.isEmpty,
      s"scoring input is missing column(s): ${missing.mkString(", ")}")
    val typed = inputSchema.fields.foldLeft(input) { (df, f) =>
      df.withColumn(f.name, col(f.name).cast(f.dataType))
    }
    val prepared = LoanTransforms.cleaned(typed)
    model.transform(prepared)
      .withColumn("p_approved", vector_to_array(col("probability")).getItem(1))
  }

  /** Single-row inference (app.py:67-71). */
  def score(values: Map[String, Any]): Scorer.Prediction = {
    val row = Row.fromSeq(inputSchema.fields.toIndexedSeq.map(f => values.getOrElse(f.name, null)))
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), inputSchema)
    val out = scoreBatch(df).select(col("prediction"), col("p_approved")).head()
    Scorer.Prediction(out.getDouble(0) == 1.0, out.getDouble(1))
  }
}

object Scorer {
  final case class Prediction(approved: Boolean, probability: Double)

  /** S7: model source. */
  def load(path: String, spark: SparkSession): Scorer =
    new Scorer(PipelineModel.load(path), spark)
}
