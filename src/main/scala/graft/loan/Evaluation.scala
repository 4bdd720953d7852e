package graft.loan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M11/M12: evaluation over (label, prediction) — one distributed groupBy
  * producing the confusion counts; all metric math on the tiny driver-side
  * result (scale-independent).
  */
object Evaluation {

  final case class ClassMetrics(precision: Double, recall: Double,
      f1: Double, support: Long)

  final case class Report(accuracy: Double, r2: Double,
      perClass: Map[Double, ClassMetrics]) {

    /** sklearn `classification_report`-style text. */
    def pretty: String = {
      val rows = perClass.toSeq.sortBy(_._1).map { case (cls, m) =>
        f"${cls}%12.1f ${m.precision}%9.3f ${m.recall}%7.3f ${m.f1}%7.3f ${m.support}%8d"
      }
      (f"${"class"}%12s ${"precision"}%9s ${"recall"}%7s ${"f1"}%7s ${"support"}%8s" +:
        rows :+ f"accuracy: $accuracy%.4f  r2(quirk): $r2%.4f").mkString("\n")
    }
  }

  /** Builds the full report from a scored frame in ONE pass over the data:
    * confusion counts via groupBy(label, prediction), then driver math.
    * Includes the reference's r2-on-binary-labels quirk (main ipynb:841)
    * computed from the same counts. */
  def report(scored: DataFrame, labelCol: String = "label",
      predictionCol: String = "prediction"): Report = {
    val counts = scored
      .groupBy(col(labelCol).as("l"), col(predictionCol).as("p"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))

    val total = counts.map(_._3).sum
    val correct = counts.filter(c => c._1 == c._2).map(_._3).sum
    val accuracy = if (total == 0) 0.0 else correct.toDouble / total

    val classes = (counts.map(_._1) ++ counts.map(_._2)).distinct.sorted
    val perClass = classes.map { cls =>
      val tp = counts.filter(c => c._1 == cls && c._2 == cls).map(_._3).sum.toDouble
      val fp = counts.filter(c => c._1 != cls && c._2 == cls).map(_._3).sum.toDouble
      val fn = counts.filter(c => c._1 == cls && c._2 != cls).map(_._3).sum.toDouble
      val precision = if (tp + fp == 0) 0.0 else tp / (tp + fp)
      val recall = if (tp + fn == 0) 0.0 else tp / (tp + fn)
      val f1 = if (precision + recall == 0) 0.0
        else 2 * precision * recall / (precision + recall)
      cls -> ClassMetrics(precision, recall, f1, (tp + fn).toLong)
    }.toMap

    // r2_score(y_true, y_pred) on binary labels from confusion counts:
    // r2 = 1 - SS_res/SS_tot; SS_res = #misclassified (squared error of
    // 0/1 preds), SS_tot = total * var(y_true).
    val nPos = counts.filter(_._1 == 1.0).map(_._3).sum.toDouble
    val meanY = if (total == 0) 0.0 else nPos / total
    val ssTot = nPos * (1 - meanY) * (1 - meanY) + (total - nPos) * meanY * meanY
    val ssRes = (total - correct).toDouble
    val r2 = if (ssTot == 0) 0.0 else 1.0 - ssRes / ssTot

    Report(accuracy, r2, perClass)
  }
}
