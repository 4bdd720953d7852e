package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** Scratch profiler for the MinHash pipeline stages (not part of the
  * driver contract). `sbt "runMain graft.tools.ProfileNearDup [sfDir]"` */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("warm-jvm (count docs)")(docs.count())
    val rows = NearDup.shingleRows(docs, "doc_id", "text", 3)
    time("shingleRows")(rows.write.format("noop").mode("overwrite").save())
    val bands = NearDup.minhashBands(rows, 192, 3)
    time("bands")(bands.write.format("noop").mode("overwrite").save())
    val cand = NearDup.lshCandidates(bands)
    println(s"candidates: ${time("candidates (count)")(cand.count())}")
    val pairs = NearDup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.6, 192, 3)
    println(s"pairs: ${time("full pipeline (count)")(pairs.count())}")
    time("full pipeline 2nd run")(
      NearDup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.6, 192, 3).count())
    spark.stop()
  }
}
