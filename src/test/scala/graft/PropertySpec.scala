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

  test("damerauLevenshtein is a metric; jaroWinkler bounded and identity-correct on random text") {
    import graft.functions.TextHashUtil
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.const(' '),
      Gen.oneOf('é', '中'))).map(_.take(12).mkString)
    (1L to 5L).foreach { s =>
      val triples = sample(Gen.listOfN(60,
        Gen.zip(strGen, strGen, strGen)), s)
      for ((a, b, c) <- triples) {
        val ab = TextHashUtil.damerauLevenshtein(u(a), u(b))
        val ba = TextHashUtil.damerauLevenshtein(u(b), u(a))
        val bc = TextHashUtil.damerauLevenshtein(u(b), u(c))
        val ac = TextHashUtil.damerauLevenshtein(u(a), u(c))
        // symmetry, identity, triangle inequality (unrestricted DL is a
        // true metric — the OSA restriction would FAIL this on e.g.
        // ca→abc via ab)
        assert(ab == ba, s"asym ($a, $b)")
        assert((ab == 0) == (a == b), s"identity ($a, $b)")
        assert(ac <= ab + bc, s"triangle ($a, $b, $c): $ac > $ab + $bc")
        // jaro-winkler: bounded, 1 iff equal (for nonempty), symmetric
        val jw = TextHashUtil.jaroWinkler(u(a), u(b))
        assert(jw >= 0.0 && jw <= 1.0, s"jw range ($a, $b): $jw")
        assert(jw == TextHashUtil.jaroWinkler(u(b), u(a)), s"jw asym ($a, $b)")
        if (a.nonEmpty && a == b) assert(jw == 1.0)
      }
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

  test("JdbcUpsert dialect fuzz: random columns and NULL/NaN patterns round-trip Derby, MySQL SQL pinned") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    import graft.sources.JdbcUpsert

    // identifiers prefixed to dodge SQL reserved words; distinct per draw
    val ident: Gen[String] = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield "x_" + cs.mkString
    val valueGen: Gen[Option[Double]] = Gen.oneOf(
      Gen.const(None), Gen.const(Some(Double.NaN)),
      Gen.choose(-100.0, 100.0).map(Some(_)))

    (1L to 5L).foreach { s =>
      val nVals = sample(Gen.choose(1, 4), s)
      val names = sample(
        Gen.listOfN(nVals + 1, ident).suchThat(l => l.distinct.size == l.size), s)
      val keyCol = names.head
      val valCols = names.tail

      // the MySQL dialect is generate-only in this sandbox (no server), so
      // its statement is pinned structurally for ANY column set: every
      // column exactly once, placeholders 1:1, identity bind order —
      // REPLACE INTO's delete-then-insert needs nothing else
      val my = JdbcUpsert.MySqlReplace.upsertSql("t", names, Seq(keyCol))
      assert(my == s"REPLACE INTO t (${names.mkString(", ")}) VALUES (${
        names.map(_ => "?").mkString(", ")})")
      assert(JdbcUpsert.MySqlReplace.bindOrder(names, Seq(keyCol)) == names.indices)

      // the same logical upsert executed through the Derby MERGE dialect:
      // two waves of rows over a small key pool (collisions force the
      // UPDATE branch), values mixing NULL and NaN (NaN must scrub to NULL)
      val schema = StructType(StructField(keyCol, StringType) +:
        valCols.map(c => StructField(c, DoubleType)))
      def toDf(rows: List[(String, List[Option[Double]])]) =
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            rows.map { case (k, vs) =>
              Row.fromSeq(k +: vs.map(_.map(Double.box).orNull))
            }, 2),
          schema)
      val rowGen = for {
        k <- Gen.choose(1, 6)
        vs <- Gen.listOfN(nVals, valueGen)
      } yield (s"k$k", vs)
      val wave1 = toDf(sample(Gen.listOfN(12, rowGen), s * 31 + 1))
      val wave2 = toDf(sample(Gen.listOfN(8, rowGen), s * 31 + 2))

      val url = s"jdbc:derby:memory:fuzz$s;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      conn.createStatement().execute(
        s"CREATE TABLE fuzz_t ($keyCol VARCHAR(20) PRIMARY KEY, ${
          valCols.map(c => s"$c DOUBLE").mkString(", ")})")
      conn.close()

      def winners(df: org.apache.spark.sql.DataFrame): Map[String, List[Any]] =
        JdbcUpsert.dedupLastWins(df, Seq(keyCol), valCols).collect()
          .map(r => r.getString(0) ->
            (1 to nVals).map(i => r.get(i)).toList).toMap
      JdbcUpsert.upsert(JdbcUpsert.dedupLastWins(wave1, Seq(keyCol), valCols),
        url, "fuzz_t", Seq(keyCol), JdbcUpsert.DerbyMerge)
      JdbcUpsert.upsert(JdbcUpsert.dedupLastWins(wave2, Seq(keyCol), valCols),
        url, "fuzz_t", Seq(keyCol), JdbcUpsert.DerbyMerge)

      // expected end state: wave-2 winner where present, else wave-1
      // winner, with NaN scrubbed to NULL at write time
      def scrub(v: Any): Any = v match {
        case d: java.lang.Double if d.isNaN => null
        case other => other
      }
      val expected = (winners(wave1) ++ winners(wave2))
        .map { case (k, vs) => k -> vs.map(scrub) }

      val check = java.sql.DriverManager.getConnection(url)
      val rs = check.createStatement().executeQuery(
        s"SELECT $keyCol, ${valCols.mkString(", ")} FROM fuzz_t")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getString(1) -> (1 to nVals).map { i =>
          val v = r.getObject(i + 1); v
        }.toList).toMap
      check.close()
      assert(got == expected, s"seed $s cols $names:\n got $got\n exp $expected")
    }
  }

  test("connectedComponents: adversarial-diameter path graph fails loudly, converges when allowed") {
    import graft.operators.Components
    // A 1000-node path (0-1-2-…-999) is the adversarial topology for
    // min-label propagation: the label travels ONE hop per round, so the
    // fixpoint needs ~999 rounds — far past the dedup-shaped default
    // maxIter=30. The contract is loud failure (split clusters are wrong,
    // not partial), after exactly maxIter rounds of one-shuffle work.
    val nodes = (0L until 1000L).toDF("id")
    val pathEdges = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Components.connectedComponents(nodes, "id", pathEdges)
    }
    assert(ex.getMessage.contains("did not converge within 30 rounds"))
    // a diameter the budget covers converges to the true labeling: a
    // 25-node path is one component labeled by its smallest id (plus
    // disconnected singletons keeping their own ids)
    val nodes2 = (0L until 30L).toDF("id")
    val chain = (0L until 24L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(nodes2, "id", chain, maxIter = 30)
    val got = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comp.unpersist()
    (0L until 30L).foreach { i =>
      assert(got(i) == (if (i <= 24L) 0L else i), s"node $i")
    }
  }

  test("alternatingComponents: equals min-label on random graphs, log-converges on the adversarial path") {
    import graft.operators.Components
    // random sparse graphs: the star-rewriting labeling must equal the
    // min-label fixpoint exactly (both are THE component-min labeling)
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 49L), Gen.choose(0L, 49L)))
      .map(_.filter { case (a, b) => a != b })
    val nodes = (0L until 50L).toDF("id")
    (1L to 3L).foreach { s =>
      val es = sample(edgeGen, s)
      val edges = (if (es.isEmpty) Seq((0L, 0L)).take(0) else es).toDF("id_a", "id_b")
      val expected = Components.connectedComponents(nodes, "id", edges, maxIter = 60)
      val got = Components.alternatingComponents(nodes, "id", edges)
      assert(got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        expected.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, s"seed $s")
      expected.unpersist(); got.unpersist()
    }
    // the 1000-node path defeats min-label at maxIter=30 (tested above);
    // star alternation converges well inside the default 50 — this is the
    // long-diameter scale path doing its job
    val pathNodes = (0L until 1000L).toDF("id")
    val pathEdges = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Components.alternatingComponents(pathNodes, "id", pathEdges)
    val labels = comp.select(col("comp")).distinct().collect().map(_.getLong(0)).toSeq
    comp.unpersist()
    assert(labels == Seq(0L), s"path should collapse to component 0, got $labels")
  }

  test("Cms.innerProduct upper-bounds the exact join size on random key bags") {
    import graft.operators.Cms
    val bagGen = Gen.nonEmptyListOf(Gen.choose(0, 40).map(i => s"k$i"))
    (1L to 5L).foreach { s =>
      val as = sample(bagGen, s)
      val bs = sample(bagGen, s + 100)
      val truth = {
        val fa = as.groupBy(identity).view.mapValues(_.size.toLong)
        val fb = bs.groupBy(identity).view.mapValues(_.size.toLong)
        fa.map { case (k, n) => n * fb.getOrElse(k, 0L) }.sum
      }
      val est = Cms.innerProduct(
          Cms.sketch(as.toDF("k"), "k"), Cms.sketch(bs.toDF("k"), "k"))
        .first().getLong(0)
      assert(est >= truth, s"seed $s: est $est < truth $truth")
    }
  }

  test("GraphCore.kCoreTrace fixed point equals brute-force peeling on random graphs") {
    import graft.operators.GraphCore
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)
      .suchThat(_.nonEmpty)
    (1L to 5L).foreach { s =>
      val edges = sample(edgeGen, s)
      // brute-force peel to the 2-core fixed point
      var adj = edges
      var nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
      var changed = true
      while (changed) {
        val deg = adj.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .view.mapValues(_.size).toMap
        val keep = nodes.filter(n => deg.getOrElse(n, 0) >= 2)
        changed = keep != nodes
        nodes = keep
        adj = adj.filter(e => nodes(e._1) && nodes(e._2))
      }
      val e = edges.toDF("a", "b")
      val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val last = GraphCore.kCoreTrace(sym, k = 2, rounds = 12)
        .orderBy(col("iter").desc).first()
      assert(last.getLong(1) == nodes.size.toLong,
        s"seed $s: ${last.getLong(1)} vs ${nodes.size}")
      assert(last.getLong(2) == adj.size.toLong, s"seed $s edges")
    }
  }

  test("GraphCore.bfsHops equals brute-force shortest hops on random graphs") {
    import graft.operators.GraphCore
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
      .map(_.collect { case (a, b) if a != b => (a, b) }.distinct)
      .suchThat(_.nonEmpty)
    (1L to 5L).foreach { s =>
      val edges = sample(edgeGen, s)
      val und = edges.flatMap(e => Seq(e, e.swap))
      val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val seed0 = und.map(_._1).min
      // brute-force BFS to depth 3
      var dist = Map(seed0 -> 0)
      var frontier = Set(seed0)
      (1 to 3).foreach { h =>
        frontier = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty))
          .diff(dist.keySet)
        dist ++= frontier.map(_ -> h)
      }
      val e = edges.toDF("a", "b")
      val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val got = GraphCore.bfsHops(sym, Seq(seed0).toDF("a"), maxHops = 3)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == dist, s"seed $s: $got vs $dist")
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

  test("Coverage.greedySelect matches brute-force greedy on random set systems") {
    import graft.operators.Coverage
    val pairsGen = Gen.listOf(Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 19L))).map(_.distinct)
    (1L to 5L).foreach { s =>
      val xs = sample(pairsGen.suchThat(_.nonEmpty), s)
      val got = Coverage.greedySelect(xs.toDF("d", "f"), "d", "f", 4)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
      // brute force: same greedy, gain = uncovered features, tie -> smallest doc
      var sets = xs.groupBy(_._1).map { case (d, ps) => d -> ps.map(_._2).toSet }
      val want = scala.collection.mutable.ListBuffer[(Int, Long, Long)]()
      var covered = Set.empty[Long]
      var r = 1
      var stop = false
      while (r <= 4 && !stop) {
        val gains = sets.map { case (d, fs) => d -> (fs -- covered).size }
          .filter(_._2 > 0)
        if (gains.isEmpty) stop = true
        else {
          val (d, g) = gains.toSeq.minBy { case (d2, g2) => (-g2, d2) }
          want += ((r, d, g.toLong))
          covered ++= sets(d)
          sets -= d
          r += 1
        }
      }
      assert(got == want.toList, s"seed $s")
    }
  }

  test("graft_topk equals window top-k under ties and any partitioning") {
    // Random (group, ord, key) rows with DELIBERATE ord collisions (ords
    // drawn from 5 values) — the tiebreak (ord desc, key asc) must make
    // the native heap aggregate partitioning-independent and identical to
    // the window-function formulation.
    val rowsGen = Gen.listOf(
      Gen.zip(Gen.choose(0, 3), Gen.choose(0, 4).map(_ * 1.5), Gen.choose(0L, 999L)))
      .map(_.distinctBy(t => (t._1, t._3)))
    (1L to 5L).foreach { s =>
      val xs = sample(rowsGen.suchThat(_.nonEmpty), s)
      (1 to 7 by 3).foreach { parts =>
        val df = xs.toDF("g", "ord", "key").repartition(parts, col("key"))
        val got = df.groupBy($"g")
          .agg(expr("graft_topk(ord, key, 3)").as("tk"))
          .select($"g", posexplode($"tk"))
          .select($"g", $"pos", $"col.ord", $"col.key")
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
          .toSet
        val want = xs.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
          rows.sortBy(t => (-t._2, t._3)).take(3).zipWithIndex.map {
            case ((_, o, k), i) => (g, i, o, k)
          }
        }.toSet
        assert(got == want, s"seed $s parts $parts")
      }
    }
  }

  test("graft_topk ignores null ordinates and keys") {
    val df = Seq(
      (1, Some(5.0), Some(10L)), (1, None, Some(11L)),
      (1, Some(7.0), None), (1, Some(3.0), Some(12L)))
      .toDF("g", "ord", "key")
    val out = df.groupBy($"g").agg(expr("graft_topk(ord, key, 2)").as("tk"))
      .select(explode($"tk").as("e")).select($"e.ord", $"e.key")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toList
    assert(out == List((5.0, 10L), (3.0, 12L)))
  }

  test("graft_topk orders NaN as greatest — Spark's double total order") {
    // Regression (r6 advice): primitive `<` is false on any NaN
    // comparison, so a NaN reaching the heap root while under capacity
    // would permanently reject later stronger inserts, and the output
    // comparator turned non-transitive (TimSort contract). The fixed
    // comparator is java.lang.Double.compare: NaN sorts ABOVE +Inf,
    // exactly where Spark's window ORDER BY ... DESC puts it.
    val df = Seq(
      (1, Double.NaN, 20L), (1, 5.0, 10L), (1, 9.0, 11L),
      (1, Double.NaN, 21L), (1, 7.0, 12L), (1, Double.PositiveInfinity, 13L))
      .toDF("g", "ord", "key")
    (1 to 4).foreach { parts =>
      val out = df.repartition(parts, col("key")).groupBy($"g")
        .agg(expr("graft_topk(ord, key, 4)").as("tk"))
        .select(explode($"tk").as("e")).select($"e.ord", $"e.key")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toList
      // NaNs first (smaller key breaking the NaN tie), then +Inf, then 9.0
      assert(out.map(_._2) == List(20L, 21L, 13L, 11L), s"parts $parts: $out")
      assert(out(0)._1.isNaN && out(1)._1.isNaN)
    }
    // heap-wedge shape: NaN inserted FIRST while under capacity, k
    // smaller than the input — later finite values must still displace
    // nothing incorrectly and the NaN must survive as the strongest
    val wedge = Seq((1, Double.NaN, 1L), (1, 2.0, 2L), (1, 3.0, 3L), (1, 4.0, 4L))
      .toDF("g", "ord", "key").coalesce(1)
    val w = wedge.groupBy($"g").agg(expr("graft_topk(ord, key, 2)").as("tk"))
      .select(explode($"tk").as("e")).select($"e.key")
      .collect().map(_.getLong(0)).toList
    assert(w == List(1L, 4L), s"wedge: $w")
  }
}
