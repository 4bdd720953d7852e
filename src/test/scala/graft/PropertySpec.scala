package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.loan.StratifiedSplit
import graft.ml.{MedianImputer, StringModeImputer}
import graft.operators.NearDup

/** Property-based invariants (SURVEY §5.4): null-handling, split
  * partitioning, dedup idempotence — checked over ScalaCheck-generated
  * inputs with fixed seeds (deterministic runs, a Spark job per case, so
  * the sample count is kept small but varied).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val doubleRows: Gen[List[Option[Double]]] =
    Gen.nonEmptyListOf(Gen.option(Gen.choose(-1000.0, 1000.0)))

  test("MedianImputer leaves no nulls when any value exists") {
    (1L to 5L).foreach { s =>
      val xs = sample(doubleRows.suchThat(_.exists(_.isDefined)), s)
      val df = xs.toDF("x")
      val out = new MedianImputer().setInputCols(Array("x")).fit(df).transform(df)
      assert(out.filter($"x".isNull).count() == 0, s"seed $s")
      assert(out.count() == xs.length)
    }
  }

  test("StringModeImputer fills every null with an existing value") {
    val strRows = Gen.nonEmptyListOf(Gen.option(Gen.oneOf("a", "b", "c", "d")))
    (1L to 5L).foreach { s =>
      val xs = sample(strRows.suchThat(_.exists(_.isDefined)), s)
      val df = xs.toDF("s")
      val out = new StringModeImputer().setInputCols(Array("s")).fit(df).transform(df)
      assert(out.filter($"s".isNull).count() == 0, s"seed $s")
      val domain = xs.flatten.toSet
      assert(out.collect().map(_.getString(0)).forall(domain.contains))
    }
  }

  test("StratifiedSplit is always an exact partition with per-class ceil") {
    val labeled = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 1000L), Gen.oneOf(0.0, 1.0)))
    (1L to 5L).foreach { s =>
      val xs = sample(labeled.suchThat(_.map(_._2).distinct.size == 2), s)
      val df = xs.zipWithIndex.map { case ((v, l), i) => (i.toLong, v, l) }
        .toDF("id", "v", "label")
      val (train, test) = StratifiedSplit.split(df, "label", 0.8, seed = s)
      assert(train.count() + test.count() == xs.size, s"seed $s")
      assert(train.intersect(test).count() == 0)
      val perClass = df.groupBy("label").count().collect()
        .map(r => r.getDouble(0) -> r.getLong(1)).toMap
      val trainPerClass = train.groupBy("label").count().collect()
        .map(r => r.getDouble(0) -> r.getLong(1)).toMap
      perClass.foreach { case (cls, n) =>
        assert(trainPerClass.getOrElse(cls, 0L) == math.ceil(n * 0.8).toLong,
          s"seed $s class $cls")
      }
    }
  }

  test("exact dedup by content key is idempotent and keeps one id per text") {
    val docs = Gen.nonEmptyListOf(Gen.oneOf("t1", "t2", "t3", "t4 t5", ""))
    (1L to 5L).foreach { s =>
      val texts = sample(docs, s)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val dedup1 = df.groupBy(md5($"text").as("h")).agg(min($"doc_id").as("doc_id"))
      val kept = dedup1.count()
      assert(kept == texts.distinct.size, s"seed $s")
      // idempotent: dedup of the dedup result is itself
      val again = df.join(dedup1.select("doc_id"), Seq("doc_id"), "left_semi")
        .groupBy(md5($"text")).agg(min($"doc_id")).count()
      assert(again == kept, s"seed $s")
    }
  }

  test("native hash kernels match their HOF twins on random unicode text") {
    import graft.operators.TextHash
    // mixed-plane text: ascii words, unicode letters, surrogate pairs,
    // stray whitespace — one batch per seed, all three kernels at once
    val wordGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.listOfN(4, Gen.oneOf("é", "ß", "λ", "中", "😀", "x")).map(_.mkString),
      Gen.const(""))
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    (1L to 5L).foreach { s =>
      val texts = sample(Gen.listOfN(40, textGen), s)
      val df = texts.toDF("text")
      val bad = df.select(
          TextHash.simhash($"text").as("sn"), TextHash.simhashHof($"text").as("sh"),
          TextHash.polyHash($"text").as("pn"), TextHash.polyHashHof($"text").as("ph"),
          TextHash.minGramHash($"text", 5).as("gn"), TextHash.minGramHashHof($"text", 5).as("gh"))
        .filter(!($"sn" <=> $"sh") || !($"pn" <=> $"ph") || !($"gn" <=> $"gh"))
      assert(bad.count() == 0, s"seed $s: ${bad.take(2).mkString}")
    }
  }

  test("hyperplane buckets stay in range and match the HOF formula on random vectors") {
    import graft.operators.Similarity
    val vecGen = Gen.listOfN(16, Gen.choose(-5.0, 5.0)).map(_.toArray)
    (1L to 3L).foreach { s =>
      val vecs = sample(Gen.listOfN(25, vecGen), s)
      val df = vecs.toDF("v")
      val planes = 3
      val tables = 8
      val out = df.select(
        Similarity.bucketIds($"v", planes, tables).as("native"),
        transform(sequence(lit(0), lit(tables - 1)),
          t => Similarity.bucketIdHof($"v", planes, t)).as("hof"))
      assert(out.filter(!($"native" <=> $"hof")).count() == 0, s"seed $s")
      val flat = out.select(explode($"native").as("b"))
      assert(flat.filter($"b" < 0 || $"b" >= (1 << planes)).count() == 0, s"seed $s")
    }
  }

  test("tokenEntropy is bounded by [0, log2(n_distinct)] on random token bags") {
    val bag = Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    (1L to 5L).foreach { s =>
      val docs = (0 until 8).map(i =>
        (i.toLong, sample(bag, s * 100 + i).mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      val out = graft.operators.TextStats.tokenEntropy(df, "doc_id", "text")
        .collect()
      assert(out.length == docs.length)
      out.foreach { r =>
        val (nd, h) = (r.getLong(2), r.getDouble(3))
        val hi = math.log(nd.toDouble) / math.log(2.0)
        assert(h >= -1e-9 && h <= hi + 1e-9,
          s"seed $s: entropy $h outside [0, log2($nd)]")
      }
    }
  }

  test("balancedSample never grows a group and keeps a valid subset") {
    val grpGen = Gen.listOfN(60, Gen.oneOf("a", "b", "c"))
    (1L to 5L).foreach { s =>
      val rows = sample(grpGen, s).zipWithIndex
        .map { case (g, i) => (i.toLong, g) }
      val df = rows.toDF("id", "grp")
      val before = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val kept = graft.operators.Sampling.balancedSample(df, "id", "grp")
        .select("id", "grp")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // subset of the input, and no group exceeds its original size
      assert(kept.toSet.subsetOf(rows.map(t => (t._1, t._2)).toSet), s"seed $s")
      kept.groupBy(_._2).foreach { case (g, ks) =>
        assert(ks.size <= before(g), s"seed $s group $g grew")
      }
    }
  }

  test("nearDupSurvivors drops exactly the docs that pair with a smaller id") {
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)
    (1L to 5L).foreach { s =>
      val pairs = sample(pairGen, s)
      val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      val kept = NearDup.nearDupSurvivors(docs, pairs.toDF("id_a", "id_b"), "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == (0L to 9L).toSet -- pairs.map(_._2).toSet, s"seed $s")
    }
  }
}
