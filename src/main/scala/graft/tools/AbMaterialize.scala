package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Components, NearDup, Similarity}

/** Offline A/B for the `materialize` knob of the MinHash pipeline (not
  * part of the driver contract): times the three catalog consumers of
  * [[NearDup.minhashNearDupPairs]] with the shared shingle subtree
  * recomputed vs persisted, min of `iters` runs each, so the knob's
  * catalog defaults are measured rather than assumed.
  * `sbt "runMain graft.tools.AbMaterialize [sfDir] [iters]"` */
object AbMaterialize {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    def bench(label: String)(f: => DataFrame): Unit = {
      var best = Double.MaxValue
      (1 to iters).foreach { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-34s $best%8.2f s (min of $iters)")
    }

    def pairs(m: Boolean) =
      NearDup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.6, 192, 3,
        materialize = m)

    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    docs.count() // JVM warmup
    for (m <- Seq(false, true)) {
      bench(s"q28 pairs        materialize=$m")(pairs(m))
      bench(s"q35 survivors    materialize=$m")(
        NearDup.nearDupSurvivors(docs, pairs(m), "doc_id").select(col("doc_id")))
      bench(s"q52 components   materialize=$m")(
        Components.connectedComponents(docs, "doc_id", pairs(m))
          .select(col("id").as("doc_id"), col("comp").as("component")))
      bench(s"q47 simhash      materialize=$m")(
        NearDup.simhashNearDupPairs(docs, "doc_id", "text",
          maxHamming = 3, materialize = m))
      bench(s"q30 embed dedup  materialize=$m")(
        Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.4,
          materialize = m))
    }
    spark.stop()
  }
}
