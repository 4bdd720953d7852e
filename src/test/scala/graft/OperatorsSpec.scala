package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators._

/** Unit tests per operator over tiny in-memory frames (SURVEY.md §5.1). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Profiling.nullCounts counts nulls per column in one pass") {
    val df = Seq(
      (Some("a"), Some(1.0)), (None, Some(2.0)), (Some("c"), None), (None, None)
    ).toDF("s", "d")
    val r = Profiling.nullCounts(df).first()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
  }

  test("Profiling.duplicateCount matches pandas duplicated().sum() semantics") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    assert(Profiling.duplicateCount(df).first().getLong(0) == 2)
    val noDup = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    assert(Profiling.duplicateCount(noDup).first().getLong(0) == 0)
  }

  test("Profiling.valueCounts normalizes and orders by count desc") {
    val df = Seq("Y", "Y", "Y", "N").toDF("status")
    val rows = Profiling.valueCounts(df, "status").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("Y", "N"))
    assert(rows.head.getDouble(2) == 0.75)
  }

  test("Profiling.mode breaks ties by smallest value (sklearn parity)") {
    val df = Seq("b", "a", "b", "a", "c").toDF("x")
    assert(Profiling.mode(df, "x").first().getString(0) == "a")
  }

  test("TextStats token/punct counts on known strings") {
    val df = Seq("one two  three.", "hi! bye?").toDF("text")
    val r = df.select(
      TextStats.tokenCount(col("text")).as("t"),
      TextStats.punctCount(col("text")).as("p")).collect()
    assert(r(0).getInt(0) == 3 && r(0).getInt(1) == 1)
    assert(r(1).getInt(0) == 2 && r(1).getInt(1) == 2)
  }

  test("Vectors.cosine is 1 for parallel, 0 for orthogonal") {
    val df = Seq(
      (Array(1.0f, 0f), Array(2.0f, 0f)),
      (Array(1.0f, 0f), Array(0f, 3.0f))
    ).toDF("a", "b")
    val sims = df.select(Vectors.cosine(
      Vectors.asDouble(col("a")), Vectors.asDouble(col("b"))).as("sim"))
      .collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1)) < 1e-12)
  }

  test("Incremental merge/retract treat NULL keys as one group (null-safe joins)") {
    // aggState's groupBy puts all NULL-key rows in one group, so the
    // state algebra must too: with plain `=` joins a NULL-key delete
    // never matched its state row (the erased rows survived silently)
    val base = Seq((Some(1L), 10L, 5.0), (None, 20L, 7.0), (None, 21L, 3.0))
      .toDF("k", "id", "v")
    val deletes = base.filter(col("id") === 20L)
    val survivors = base.join(deletes.select("id"), Seq("id"), "left_anti")
    val state = Incremental.aggState(base, Seq("k"), "v")
    val out = Incremental.retract(state, deletes, survivors, Seq("k"), "v")
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toMap
    assert(out == Map(Some(1L) -> 1L, None -> 1L),
      s"retract must subtract from the NULL-key group: ${out.mkString(",")}")
    // merge: state(A) ⊕ state(B) = state(A ∪ B), NULL keys included
    val a = Incremental.aggState(base.filter(col("id") =!= 21L), Seq("k"), "v")
    val b = Incremental.aggState(base.filter(col("id") === 21L), Seq("k"), "v")
    val merged = Incremental.merge(a, b, Seq("k"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toMap
    assert(merged == Map(Some(1L) -> 1L, None -> 2L),
      s"merge must fold the NULL-key halves together: ${merged.mkString(",")}")
  }

  test("Vectors.validEmbeddings gates every degenerate-vector class, keeps valid ones") {
    val df = Seq(
      (0L, Array(0.6f, 0.8f)),                        // valid, unit norm
      (1L, Array(0.6f, 0.8f)),                        // exact duplicate: valid
      (2L, Array(-0.6f, -0.8f)),                      // antipode: valid
      (3L, Array(0.5f, 0.5f)),                        // zero variance: valid
      (4L, Array(0.0f, 0.0f)),                        // zero norm: out
      (5L, Array(1.0e18f, 1.0e18f)),                  // corrupt magnitude: out
      (6L, Array(1.0e-30f, 1.0e-30f)),                // underflow scale: out
      (7L, Array(Float.NaN, 1.0f)),                   // NaN poison: out
      (8L, Array(Float.PositiveInfinity, 0.0f)),      // Inf poison: out
      (9L, Array(1.0e30f, 0.0f))                      // finite but > ceil: out
    ).toDF("vec_id", "embedding")
    val kept = Vectors.validEmbeddings(df, "embedding")
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 3L))
  }

  test("Vectors.bruteForceKnn finds the exact nearest vector") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val knn = Vectors.bruteForceKnn(df.filter(col("vec_id") === 0), df,
      "vec_id", "embedding", k = 2).collect()
    assert(knn.map(_.getLong(2)).toSeq == Seq(1L, 2L))
  }

  test("approx_count_distinct (HLL sketch) lands within rsd of exact") {
    val orders = spark.read.parquet(s"/root/testdata/sf0.001/orders.parquet")
    val exact = orders.select(countDistinct(col("o_custkey"))).first().getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"), 0.02))
      .first().getLong(0)
    // HLL++ with rsd=0.02: allow 3 sigma
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx $approx vs exact $exact")
  }

  test("AsOfJoin picks the latest right row at or before each left ts") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(mins: Int) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val left = Seq((1L, 10L, ts(5)), (1L, 11L, ts(20)), (2L, 20L, ts(5)))
      .toDF("k", "lid", "lts")
    val right = Seq((1L, 100L, ts(0)), (1L, 101L, ts(5)), (1L, 102L, ts(30)))
      .toDF("k", "rid", "rts")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(10L) == Some(101L)) // equal-ts right row counts ("at or before")
    assert(out(11L) == Some(101L)) // rid 102 is in the future
    assert(out(20L) == None)       // key 2 has no right rows -> left-join null
  }

  test("AsOfJoin carries value-level nulls from the matched row (no tearing)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(mins: Int) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    // latest right row at ts(10) has ref=null, amt=9: the left row must get
    // exactly that row's payload — not ref stitched from the older row
    val left = Seq((1L, 10L, ts(20))).toDF("k", "lid", "lts")
    val right = Seq(
      (1L, ts(0), Some("x"), 5L),
      (1L, ts(10), None: Option[String], 9L)
    ).toDF("k", "rts", "ref", "amt")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", Seq("ref", "amt"))
      .select("ref", "amt").head()
    assert(r.isNullAt(0) && r.getLong(1) == 9L)
  }

  test("SkewJoin.saltedInnerJoin equals the plain join, incl. multiplicities") {
    // skewed probe: key 1 dominates; build has duplicate keys too
    val probe = (Seq.fill(50)(1) ++ Seq(2, 2, 3)).zipWithIndex
      .map { case (k, i) => (k, s"p$i") }.toDF("k", "pv")
    val build = Seq((1, "b1"), (1, "b1b"), (2, "b2"), (4, "b4")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(probe, build, Seq("k"), saltFactor = 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("Sessionize splits on gap and keeps within-gap events together") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(mins: Int) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(10)), (1L, 3L, ts(90)),  // gap 80min > 30min
      (2L, 4L, ts(0))
    ).toDF("user_id", "event_id", "ts")
    val sess = Sessionize.sessions(df, "user_id", "ts", "event_id", 1800L)
      .collect()
    val u1 = sess.filter(_.getLong(0) == 1L)
    assert(u1.length == 2)
    assert(u1.map(r => r.getLong(2)).toSeq == Seq(2L, 1L)) // n_events per session
    assert(sess.count(_.getLong(0) == 2L) == 1)
  }

  test("describeApprox tracks the exact describe panel within sketch error") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice")
    val exact = Profiling.describe(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profiling.describeApprox(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      // non-quantile stats are identical by construction
      Seq(1, 2, 3, 4, 8).foreach(i => assert(a.get(i) == e.get(i), s"$c field $i"))
      // quantiles within 1% relative of exact on this data
      Seq(5, 6, 7).foreach { i =>
        val (ev, av) = (e.getDouble(i), a.getDouble(i))
        assert(math.abs(av - ev) <= 0.01 * math.abs(ev).max(1.0), s"$c q$i: $av vs $ev")
      }
    }
  }

  test("Sampling: hash split is a stable partition, invariant to layout") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
    val split = operators.Sampling.hashSplit(df, "id", valBuckets = 10)
    val byS = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("val") + byS("train") == 2000L)
    // ~10% val, tolerance for hash variance
    assert(byS("val") > 120 && byS("val") < 280, s"val=${byS("val")}")
    // identical assignment under different physical layout
    val again = operators.Sampling.hashSplit(df.repartition(13), "id", 10)
    assert(split.exceptAll(again).count() == 0)
    // sample ⊆ input, and equals the split's val side for matching params
    val sampled = operators.Sampling.deterministicSample(df, "id", keep = 10)
    val valIds = split.filter($"split" === "val").select("id")
    assert(sampled.exceptAll(valIds).count() == 0)
    assert(valIds.exceptAll(sampled).count() == 0)
  }

  test("Sampling.balancedSample: min group intact, exact hash-rule rows, layout-invariant") {
    val df = ((1 to 1000).map(i => (i.toLong, "big")) ++
      (2001 to 2100).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val kept = Sampling.balancedSample(df, "id", "grp")
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest group's threshold is the full bucket range -> kept whole
    assert(byGrp("small") == 100L)
    // the big group's survivors are exactly the rows the hash rule admits:
    // thresh = (100 * 10000) div 1000 = 1000
    val expected = df.filter(col("grp") === "big")
      .filter(Sampling.hashBucket(col("id"), 10000) < 1000)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = kept.filter(col("grp") === "big")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected && got.size == byGrp("big").toInt)
    // deterministic under repartitioning (df.sample would not be)
    val again = Sampling.balancedSample(df.repartition(7, col("id")), "id", "grp")
      .filter(col("grp") === "big").select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
    // a NULL group key is a real group: its rows survive (it IS the min
    // group here) instead of being silently dropped by the threshold join
    val withNull = ((1 to 10).map(i => (i.toLong, Some("a"))) ++
      Seq((100L, None), (101L, None))).toDF("id", "grp")
    val keptNull = Sampling.balancedSample(withNull, "id", "grp")
    assert(keptNull.filter(col("grp").isNull).count() == 2L)
  }

  test("Sampling.mixtureSample: geometric-mean targets, min group intact, exact hash rule") {
    val df = ((1 to 1000).map(i => (i.toLong, "big")) ++
      (2001 to 2100).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val kept = Sampling.mixtureSample(df, "id", "grp")
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // min group: target = floor(sqrt(100*100)) = 100 -> thresh 10000 -> whole
    assert(byGrp("small") == 100L)
    // big group: target = floor(sqrt(100*1000)) = 316 -> thresh = 3160;
    // survivors are exactly the rows that hash rule admits, and the count
    // sits strictly between balanced (~100) and natural (1000)
    val expected = df.filter(col("grp") === "big")
      .filter(Sampling.hashBucket(col("id"), 10000) < 3160)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = kept.filter(col("grp") === "big")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(byGrp("big") > 100L && byGrp("big") < 1000L)
    // deterministic under repartitioning
    val again = Sampling.mixtureSample(df.repartition(7, col("id")), "id", "grp")
      .filter(col("grp") === "big").select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("Components.representatives picks max score, ties to smallest id") {
    val labeled = Seq(
      (1L, 1L, 5L), (2L, 1L, 9L), (3L, 1L, 9L), // tie at 9 -> id 2 wins
      (10L, 10L, 3L)
    ).toDF("doc_id", "component", "tok")
    val reps = Components.representatives(labeled, "doc_id", "component", "tok")
      .orderBy("component").collect()
    assert(reps.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq((1L, 3L, 2L, 9L), (10L, 1L, 10L, 3L)))
  }

  test("SnapshotDiff.diff classifies all four change kinds with null-safe compare") {
    val a = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, None, 30L), (5L, None, 50L)
    ).toDF("k", "s", "v")
    val b = Seq(
      (2L, Some("b"), 20L), (3L, Some("z"), 30L),
      (4L, Some("d"), 40L), (5L, None, 50L)
    ).toDF("k", "s", "v")
    val d = SnapshotDiff.diff(a, b, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect()
    val byKey = d.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added", 5L -> "unchanged"))
    // old/new carry the side values, NULL on the absent side
    val r4 = d.find(_.getLong(0) == 4L).get
    assert(r4.isNullAt(r4.fieldIndex("old_s")) &&
      r4.getString(r4.fieldIndex("new_s")) == "d" &&
      r4.getLong(r4.fieldIndex("new_v")) == 40L)
  }

  test("Vectors.int8QuantAudit: hand-checked errors, crush count, zero-vector guard") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.001f, 0.0f)), // mx=1, scale=127
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f, 0.0f))      // zero vector -> guard
    ).toDF("vec_id", "embedding")
    val out = Vectors.int8QuantAudit(df, "vec_id", "embedding")
      .orderBy("id").collect()
    // v1: x*127 = {127, -63.5, 31.75, 0.127, 0} -> q = {127, -63, 32, 0, 0}
    //   errs = {0, 0.5/127, 0.25/127, 0.001, 0}; max = 0.5/127 ~ 0.00393701
    assert(math.abs(out(0).getDouble(1) - 0.00393701) < 1e-7)
    // only the nonzero 0.001 crushed to q=0 counts; the exact 0.0 does not
    assert(out(0).getLong(2) == 1L)
    assert(math.abs(out(0).getDouble(3)
      - math.sqrt(1 + 0.25 + 0.0625 + 1e-6)) < 1e-6)
    // zero vector: all q=0, no NaN, nothing "crushed", zero error and norm
    assert(out(1).getDouble(1) == 0.0 && out(1).getLong(2) == 0L
      && out(1).getDouble(3) == 0.0)
  }

  test("SkewJoin.saltedInnerJoin equals the plain join on a hot-key corpus") {
    import spark.implicits._
    // 90% of the large side lands on key 1 — the classic straggler shape
    val large = (1 to 100000).map { i =>
      (if (i % 10 != 0) 1L else (i % 1000).toLong.max(2L), i.toLong)
    }.toDF("k", "payload")
    val small = (1L to 1000L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k"))
    val salted = operators.SkewJoin.saltedInnerJoin(large, small, Seq("k"), 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // determinism under recomputation: two evaluations salt identically
    assert(salted.exceptAll(operators.SkewJoin.saltedInnerJoin(
      large.repartition(7), small, Seq("k"), 8)).count() == 0)
  }

  test("RangeJoin.pointInInterval: half-open bounds, exactly-once pairs, no BNLJ") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")),   // == start: IN
      (2L, ts("2024-01-01 00:59:59")),   // inside
      (3L, ts("2024-01-01 01:00:00")),   // == end: OUT (half-open)
      (4L, ts("2024-01-02 12:00:00")),   // in overlap of i2 and i3
      (5L, ts("2023-12-31 23:59:59"))    // before everything
    ).toDF("p_id", "p_ts")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (20L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")),
      (30L, ts("2024-01-02 06:00:00"), ts("2024-01-02 18:00:00")),
      (40L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:00"))  // empty
    ).toDF("i_id", "i_start", "i_end")

    val got = RangeJoin.pointInInterval(points, "p_ts",
        intervals, "i_start", "i_end", binSeconds = 3600L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (4L, 20L), (4L, 30L)))

    // equivalence to the naive range condition, at a bin width that forces
    // multi-bin intervals (15 min) — still exactly-once per pair
    val naive = points.join(intervals,
        col("p_ts") >= col("i_start") && col("p_ts") < col("i_end"))
      .select("p_id", "i_id").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val fine = RangeJoin.pointInInterval(points, "p_ts",
        intervals, "i_start", "i_end", binSeconds = 900L)
      .select("p_id", "i_id").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(fine == naive)
    assert(fine.values.forall(_ == 1), "each qualifying pair exactly once")

    // the plan must be an equi-join on the bin, not a nested loop
    val plan = RangeJoin.pointInInterval(points, "p_ts",
        intervals, "i_start", "i_end", binSeconds = 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop plan:\n$plan")

    // mis-sized bins fail loudly instead of exploding
    val boom = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p_ts",
        intervals, "i_start", "i_end",
        binSeconds = 1L, maxBinsPerInterval = 100L).count()
    }
    assert(boom.getMessage != null)
  }

  test("Scd2.fromChangeLog: change rows only, null-safe attrs, closed intervals") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val log = Seq(
      // key 1: a->a (no change), a->NULL (change), NULL->NULL (no change),
      // NULL->b (change): history must be a, NULL, b
      (1L, ts("2024-01-01"), Option("a"), 101L),
      (1L, ts("2024-01-02"), Option("a"), 102L),
      (1L, ts("2024-01-03"), Option.empty[String], 103L),
      (1L, ts("2024-01-04"), Option.empty[String], 104L),
      (1L, ts("2024-01-05"), Option("b"), 105L),
      // key 2: NULL as the FIRST observation still opens a row
      (2L, ts("2024-01-01"), Option.empty[String], 201L),
      (2L, ts("2024-01-02"), Option("x"), 202L)
    ).toDF("k", "ts", "attr", "rid")
    val got = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("attr"), "rid")
      .orderBy("k", "effective_from")
      .select("k", "attr", "effective_from", "effective_to")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(got.toSeq == Seq(
      (1L, Some("a"), ts("2024-01-01"), Some(ts("2024-01-03"))),
      (1L, None, ts("2024-01-03"), Some(ts("2024-01-05"))),
      (1L, Some("b"), ts("2024-01-05"), None),
      (2L, None, ts("2024-01-01"), Some(ts("2024-01-02"))),
      (2L, Some("x"), ts("2024-01-02"), None)))
    // intervals tile each key's history: every from (after the first)
    // equals the previous row's to — no gaps, no overlaps
    got.groupBy(_._1).values.foreach { rows =>
      rows.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._4.get)
        case _ =>
      }
    }
  }

  test("Layout.mortonKey: known interleaves, locality, loud out-of-range") {
    import spark.implicits._
    val df = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (3L, 5L),                       // 0b011 ⨯ 0b101 -> 0b100111 = 39
      (2147483647L, 2147483647L)      // max coord: all 62 low bits set
    ).toDF("x", "y")
    val keys = df.select(Layout.mortonKey(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(keys.toSeq == Seq(0L, 1L, 2L, 3L, 39L, (1L << 62) - 1))
    // locality: within an aligned bucket, both dims are bounded by the
    // bucket's span — the property the key exists for
    val grid = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        shiftright(Layout.mortonKey(col("x"), col("y")), 4).as("b"))
      .groupBy("b")
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
      .as[(Long, Long, Long)].collect()
    assert(grid.forall { case (_, dx, dy) => dx <= 3 && dy <= 3 })
    val boom = intercept[Exception] {
      Seq((-1L, 0L)).toDF("x", "y")
        .select(Layout.mortonKey(col("x"), col("y"))).count()
    }
    assert(boom.getMessage != null)
  }

  test("HeavyHitters.frequentTerms equals the exact query, layout-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 3 heavy terms among a long unique tail — the shape that breaks a
    // too-small summary if the MG guarantee is wrong
    val words = Seq.fill(400)("alpha") ++ Seq.fill(150)("beta") ++
      Seq.fill(60)("gamma") ++ (1 to 2000).map(i => s"tail$i")
    val docs = rnd.shuffle(words).grouped(20).map(_.mkString(" ")).toSeq
      .toDF("text")
    val phiDen = 50L // threshold: 2610/50 ≈ 52 → alpha, beta, gamma
    def exact(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val n = 2610L
    val want = exact(docs).filter(col("cnt") * phiDen >= n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want.map(_._1) == Set("alpha", "beta", "gamma"))
    // minimum legal summary size AND generous one, across layouts
    for (k <- Seq(50, 200); parts <- Seq(1, 7)) {
      val got = HeavyHitters.frequentTerms(
          docs.repartition(parts), "text", phiDen, summaryK = k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"k=$k parts=$parts")
    }
    // a summary below phiDen is refused, not silently incomplete
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTerms(docs, "text", phiDen, summaryK = 10)
    }
  }

  test("Profiling.madOutliers: hand-computed MAD gate, robust to the outlier") {
    import spark.implicits._
    // {1..9, 1000}: median 5.5, adevs {0.5..4.5, 994.5}, MAD 2.5 — the
    // outlier does not drag the gate (mean±3σ here would flag nothing)
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("grp", "x")
    val r = Profiling.madOutliers(df, "grp", "x").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 10L)
    assert(row.getDouble(2) == 5.5 && row.getDouble(3) == 2.5)
    assert(row.getLong(4) == 1L)
  }

  test("Incremental: merged batch states equal the full recompute, associatively") {
    import spark.implicits._
    // keys exclusive to each batch, a NULL measure, and an all-NULL key
    val b1 = Seq(("a", Some(1.5)), ("a", Some(2.5)), ("b", Some(-1.0)),
      ("n", Option.empty[Double])).toDF("k", "v")
    val b2 = Seq(("a", Some(10.0)), ("c", Some(7.0)),
      ("n", Option.empty[Double])).toDF("k", "v")
    val b3 = Seq(("b", Some(100.0)), ("c", Some(-7.0))).toDF("k", "v")
    val all = b1.unionByName(b2).unionByName(b3)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("st_sum", col("st_sum").cast("decimal(22,2)"))
        .orderBy("k").collect().toSeq
    val merged = Incremental.merge(
      Incremental.merge(
        Incremental.aggState(b1, Seq("k"), "v"),
        Incremental.aggState(b2, Seq("k"), "v"), Seq("k")),
      Incremental.aggState(b3, Seq("k"), "v"), Seq("k"))
    assert(canon(merged) == canon(Incremental.aggState(all, Seq("k"), "v")))
    // the all-NULL key carries n=0 and NULL sum/extrema, like SQL aggregates
    val nRow = merged.filter(col("k") === "n").collect().head
    assert(nRow.getLong(1) == 0L && nRow.isNullAt(2) &&
      nRow.isNullAt(3) && nRow.isNullAt(4))
  }

  test("Hll: merge of overlapping sketches equals the direct sketch, idempotently") {
    val d1 = (1 to 3000).map(i => ("g", i.toString)).toDF("g", "key")
    val d2 = (2000 to 5000).map(i => ("g", i.toString)).toDF("g", "key")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("g", "reg").collect().toSeq
    val m = Hll.merge(Hll.sketch(d1, Seq("g"), "key"),
      Hll.sketch(d2, Seq("g"), "key"), Seq("g"))
    // merge ≡ direct even with the 1000-key overlap (max is idempotent)
    assert(canon(m) == canon(Hll.sketch(d1.unionByName(d2), Seq("g"), "key")))
    // and re-merging the same sketch changes nothing
    assert(canon(Hll.merge(m, m, Seq("g"))) == canon(m))
    // estimate of 5000 distinct keys within 3 standard errors (1.04/16)
    val est = Hll.estimate(m, Seq("g")).collect().head
      .getAs[Double]("hll_est")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.20, s"estimate $est")
  }

  test("Bloom: zero false negatives, low fp rate, pruned semi join exact, loud bounds") {
    val keys = (1 to 999 by 2).toDF("k")     // 500 odd keys
    val bitmap = Bloom.fit(keys, "k", 4096, 3)
    val probe = (1 to 1000).toDF("k")
    val passed = probe
      .filter(Bloom.mightContain(col("k"), bitmap, 4096, 3))
      .collect().map(_.getInt(0)).toSet
    // Bloom guarantee: every fitted key passes
    assert((1 to 999 by 2).forall(passed.contains))
    // false positives exist in principle but must be rare at this sizing
    val fps = passed.count(_ % 2 == 0)
    assert(fps < 25, s"$fps false positives out of 500 non-members")
    // composed operator is exactly the semi join
    val facts = (1 to 1000).map(i => (i % 200, i)).toDF("fk", "v")
    val dim = Seq(3, 7, 11, 13).toDF("dk")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("fk", "v").collect().toSeq
    assert(canon(Bloom.prunedSemiJoin(facts, "fk", dim, "dk")) ==
      canon(facts.join(dim, col("fk") === col("dk"), "left_semi")))
    intercept[IllegalArgumentException](Bloom.fit(keys, "k", 100, 3))
    intercept[IllegalArgumentException](Bloom.fit(keys, "k", 1 << 17, 3))
  }

  test("Auc.groupedAuc: perfect, reversed, tie-averaged, and degenerate groups") {
    val df = Seq(
      ("a", 1.0, 0), ("a", 2.0, 0), ("a", 3.0, 1), ("a", 4.0, 1), // separable
      ("b", 1.0, 0), ("b", 1.0, 1), ("b", 2.0, 1),                // tie at 1.0
      ("c", 5.0, 1), ("c", 6.0, 1),                               // no negatives
      ("d", 1.0, 1), ("d", 2.0, 0)                                // anti-predictive
    ).toDF("g", "score", "y")
    val r = Auc.groupedAuc(df, Seq("g"), "score", "y")
      .orderBy("g").collect()
    assert(r(0).getAs[Double]("auc") == 1.0)
    // group b by hand: R+ = 1.5 + 3 = 4.5, P=2, N=1 → (4.5-3)/2 = 0.75
    assert(r(1).getAs[Double]("auc") == 0.75)
    assert(r(2).isNullAt(r(2).fieldIndex("auc")))
    assert(r(3).getAs[Double]("auc") == 0.0)
  }

  test("Binning: exact quartile thresholds, boundary-stable bins, hand-computed WOE") {
    val df = (1 to 100).map(i => (i.toDouble, if (i > 60) 1 else 0)).toDF("x", "y")
    // type-7 interpolated quartiles of 1..100
    assert(Binning.quantileThresholds(df, "x", 4).toSeq ==
      Seq(25.75, 50.5, 75.25))
    val t = Binning.woeTable(df, "x", "y", nBins = 4)
      .orderBy("bin").collect()
    assert(t.map(_.getLong(1)).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(t.map(_.getLong(2)).toSeq == Seq(0L, 0L, 15L, 25L))
    // empty-class bins carry NULL woe, not ±Infinity
    assert(t(0).isNullAt(4) && t(1).isNullAt(4) && t(3).isNullAt(4))
    // bin 2: ln((15/40)/(10/60)) = ln(2.25)
    assert(math.abs(t(2).getDouble(4) - 0.81093022) < 1e-8)
  }

  test("FuzzyJoin.editPairs1 equals brute-force levenshtein ≤ 1 on adversarial strings") {
    // substitution / insertion / deletion / prefix-edit cases, plus dups
    val names = Seq("alpha", "alpha", "alpha!", "blpha", "alph", "aXpha",
      "gamma", "gamm", "delta").toDF("s")
    val got = FuzzyJoin.editPairs1(names, "s")
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val d = names.select(col("s")).distinct()
    val brute = d.as("l").join(d.as("r"), col("l.s") < col("r.s"))
      .filter(levenshtein(col("l.s"), col("r.s")) <= 1)
      .select(col("l.s"), col("r.s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute)
    // and the cases we constructed are all in there
    assert(got.contains(("alph", "alpha")) && got.contains(("alpha", "blpha"))
      && got.contains(("alpha", "alpha!")) && got.contains(("aXpha", "alpha"))
      && got.contains(("gamm", "gamma")))
  }

  test("Trend.groupedLinearFit: exact fit on a known line, NULL on zero variance") {
    // y = 3x + 10 exactly, plus a constant-x degenerate group
    val pts = (1 to 50).map(i => ("line", i, 3.0 * i + 10.0)) ++
      Seq(("flat", 5, 1.0), ("flat", 5, 2.0))
    val df = pts.toDF("g", "x", "y")
    val r = Trend.groupedLinearFit(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    assert(r(0).getString(0) == "flat" && r(0).isNullAt(2) && r(0).isNullAt(3))
    assert(r(1).getDouble(2) == 3.0 && r(1).getDouble(3) == 10.0)
  }

  test("Skyline.frontier2d equals the quadratic dominance definition") {
    // g1: a staircase frontier of 3 points, one revenue tie at a later
    // day (dominated via the strict day axis), one interior point; g2:
    // two mutually incomparable points (both on the frontier)
    val df = Seq(
      ("g1", 1, 90.0), ("g1", 2, 95.0), ("g1", 3, 93.0), ("g1", 5, 100.0),
      ("g1", 7, 99.0), ("g1", 4, 95.0), ("g2", 7, 25.0), ("g2", 3, 20.0)
    ).toDF("g", "day", "rev")
    val got = Skyline.frontier2d(df, Seq("g"), "rev", "day")
      .select("g", "day").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // brute force: keep p iff no q with rev >= and day <= and one strict
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val brute = rows.filter { case (g, d, v) =>
      !rows.exists { case (g2, d2, v2) =>
        g2 == g && v2 >= v && d2 <= d && (v2 > v || d2 < d) }
    }.map(t => (t._1, t._2)).toSet
    assert(got == brute)
    assert(got == Set(("g1", 1), ("g1", 2), ("g1", 5), ("g2", 3), ("g2", 7)))
  }

  test("DataChecks: each check counts its violations, run() orders and flags") {
    val child = Seq(
      (Some(1), "a", 5.0), (Some(1), "b", -1.0), (Some(2), "c", 20.0),
      (None, "zz", 3.0), (Some(9), "a", 4.0)
    ).toDF("fk", "cat", "v")
    val parent = Seq(1, 2, 3).toDF("pk")
    val audit = DataChecks.run(Seq(
      DataChecks.notNull(child, "fk"),            // 1 null
      DataChecks.unique(child, Seq("fk")),        // fk=1 twice -> 1 extra
      DataChecks.inRange(child, "v", 0.0, 10.0),  // -1 and 20 -> 2
      DataChecks.acceptedValues(child, "cat", Seq("a", "b", "c")), // zz -> 1
      DataChecks.refIntegrity(child, "fk", parent, "pk", "t")      // fk=9 -> 1
    )).collect()
    assert(audit.map(_.getString(0)).toSeq == audit.map(_.getString(0)).toSeq.sorted)
    val byName = audit.map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byName("not_null:fk") == ((1L, false)))
    assert(byName("unique:fk") == ((1L, false)))
    assert(byName("range:v") == ((2L, false)))
    assert(byName("accepted:cat") == ((1L, false)))
    assert(byName("ref:t") == ((1L, false)))
    // and a passing check flags true
    val ok = DataChecks.run(Seq(DataChecks.notNull(parent, "pk"))).collect()
    assert(ok.head.getLong(1) == 0L && ok.head.getBoolean(2))
  }

  test("Cms: never underestimates, merge equals direct, bounded grid") {
    // skewed corpus: key i occurs i times, i = 1..60 (1830 rows)
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(i.toString))
    val df = rows.toDF("k")
    val sk = Cms.sketch(df, "k")
    // grid is bounded by d*w no matter the input size
    assert(sk.count() <= Cms.D * Cms.W)
    val probes = (1 to 60).map(_.toString).toDF("k")
    val est = Cms.lookup(sk, probes, "k").collect()
      .map(r => r.getString(0).toInt -> r.getLong(1)).toMap
    // CMS guarantee: estimate >= true count, always
    (1 to 60).foreach(i => assert(est(i) >= i, s"key $i: ${est(i)} < $i"))
    // at n=1830, w=1024 the expected overcount is ~2/row; bound loosely
    assert((1 to 60).map(i => est(i) - i).max <= 40)
    // a never-seen key reports 0 or a small collision artifact
    val unseen = Cms.lookup(sk, Seq("no-such-key").toDF("k"), "k")
      .first().getLong(1)
    assert(unseen <= 40)
    // merge of disjoint halves equals the direct sketch exactly
    val (a, b) = rows.splitAt(900)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("r", "c").collect().toSeq
    assert(canon(Cms.merge(Cms.sketch(a.toDF("k"), "k"),
      Cms.sketch(b.toDF("k"), "k"))) == canon(sk))
  }

  test("Kmv: small sets estimate exactly, large sets within error bound") {
    // small regime: every set below k=64 distinct -> the sketch IS the
    // set and union/intersection estimates are EXACT counts
    val small = ((1 to 40).map(i => ("a", i)) ++ (21 to 50).map(i => ("b", i)))
      .toDF("g", "key")
    val rSmall = Kmv.intersectEstimates(Kmv.sketch(small, "g", "key"), "g")
      .collect().head
    assert(rSmall.getAs[Long]("n_kept") == 50L)        // |A u B| = 50 < k
    assert(rSmall.getAs[Double]("kmv_union_est") == 50.0)
    assert(rSmall.getAs[Double]("kmv_inter_est") == 20.0)
    // duplicate occurrences never change a distinct-value sketch
    val dup = small.unionByName(small)
    assert(Kmv.sketch(dup, "g", "key").orderBy("g", "h").collect().toSeq ==
      Kmv.sketch(small, "g", "key").orderBy("g", "h").collect().toSeq)
    // large regime: 2000-element sets with a 1000-element overlap
    val big = ((1 to 2000).map(i => ("a", i)) ++
      (1001 to 3000).map(i => ("b", i))).toDF("g", "key")
    val rBig = Kmv.intersectEstimates(Kmv.sketch(big, "g", "key"), "g")
      .collect().head
    assert(rBig.getAs[Long]("n_kept") == 64L)
    val u = rBig.getAs[Double]("kmv_union_est")
    val i = rBig.getAs[Double]("kmv_inter_est")
    // standard error ~1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert(math.abs(u - 3000.0) / 3000.0 < 0.4, s"union est $u")
    assert(math.abs(i - 1000.0) / 1000.0 < 0.6, s"inter est $i")
  }

  test("Cohorts.weeklyRetention: hand-computed triangle, week-boundary users") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // cohort 2024-01-01 (Mon): u1 active wk0+wk1, u2 active wk0 only.
    // cohort 2024-01-08: u3 active wk0+wk2. Sunday 23:59 stays in-week.
    val ev = Seq(
      (1L, t("2024-01-02 10:00:00")), (1L, t("2024-01-07 23:59:59")),
      (1L, t("2024-01-10 09:00:00")),
      (2L, t("2024-01-03 08:00:00")),
      (3L, t("2024-01-08 00:00:00")), (3L, t("2024-01-22 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Cohorts.weeklyRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0),
      ("2024-01-08", 2, 1L, 1L, 1.0)))
  }

  test("Sequences: transition matrix row-normalizes; topPaths orders within session") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // u1: a->b->a; u2: a->b. Transitions: a->b x2, b->a x1.
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "a"),
      (1L, t("2024-01-01 00:01:00"), 2L, "b"),
      (1L, t("2024-01-01 00:02:00"), 3L, "a"),
      (2L, t("2024-01-01 00:00:00"), 4L, "a"),
      (2L, t("2024-01-01 00:05:00"), 5L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val tr = Sequences.transitions(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_tok", "to_tok").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(tr.toSeq == Seq(("a", "b", 2L, 2L, 1.0), ("b", "a", 1L, 1L, 1.0)))
    // timestamp tie broken by event_id: ids 6,7 share a ts -> c before d
    val tied = ev.unionByName(Seq(
      (3L, t("2024-01-01 00:00:00"), 6L, "c"),
      (3L, t("2024-01-01 00:00:00"), 7L, "d")
    ).toDF("user_id", "ts", "event_id", "event_type"))
    val paths = Sequences.topPaths(tied, "user_id", "ts", "event_id",
      "event_type", gapSeconds = 1800L, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(paths.toSeq == Seq(("a>b", 1L), ("a>b>a", 1L), ("c>d", 1L)))
    // a gap beyond the threshold splits the session -> two paths
    val gapped = Seq(
      (9L, t("2024-01-01 00:00:00"), 8L, "x"),
      (9L, t("2024-01-01 02:00:00"), 9L, "y")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val p2 = Sequences.topPaths(gapped, "user_id", "ts", "event_id",
      "event_type", gapSeconds = 1800L, k = 10).collect()
      .map(_.getString(0)).sorted
    assert(p2.toSeq == Seq("x", "y"))
  }

  test("Trend.groupedPearson: exact +1/-1 lines, NULL variance, NULL rows dropped") {
    val df = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
      ("down", 1.0, 30.0), ("down", 2.0, 20.0), ("down", 3.0, 10.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0)
    ).toDF("g", "x", "y")
    val r = Trend.groupedPearson(df, Seq("g"), "x", "y").collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), Option(row.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(r("up") == ((3L, Some(1.0))))
    assert(r("down") == ((3L, Some(-1.0))))
    assert(r("flat") == ((3L, None)))        // zero y-variance -> NULL
    // a NULL in either column drops the row (pairwise-complete, like corr)
    val withNull = df.unionByName(
      Seq(("up", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(99.0)))
        .toDF("g", "x", "y"))
    assert(Trend.groupedPearson(withNull, Seq("g"), "x", "y")
      .filter($"g" === "up").head().getLong(1) == 3L)
  }

  test("Profiling.keySkew: uniform vs hot-key distributions") {
    val uniform = (1 to 100).map(i => i % 10).toDF("k")  // 10 keys x 10
    val u = Profiling.keySkew(uniform, "k", "u").head()
    assert(u.getAs[Long]("n_rows") == 100 && u.getAs[Long]("n_keys") == 10)
    assert(u.getAs[Double]("skew_ratio") == 1.0)
    assert(u.getAs[Double]("top1_share") == 0.1)
    // one key holds 91 of 100 rows
    val hot = (Seq.fill(91)(1) ++ (2 to 10)).toDF("k")
    val h = Profiling.keySkew(hot, "k", "h").head()
    assert(h.getAs[Long]("max_cnt") == 91 && h.getAs[Double]("top1_share") == 0.91)
    assert(h.getAs[Double]("skew_ratio") == 9.1)
    // NULL keys are a key like any other (a shuffle hashes them too)
    val withNull = Seq[Integer](1, 1, null, null, null).toDF("k")
    assert(Profiling.keySkew(withNull, "k", "n").head()
      .getAs[Long]("n_keys") == 2)
  }

  test("Contingency.chiSquare: independent and dependent hand-checked tables") {
    // perfectly independent 2x2: chi2 = 0, V = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val ri = Contingency.chiSquare(ind, "u", "v").head()
    assert(ri.getAs[Double]("chi2") == 0.0)
    assert(ri.getAs[Double]("cramers_v") == 0.0)
    assert(ri.getAs[Long]("dof") == 1L)
    // perfectly dependent 2x2 (n=4): chi2 = n = 4, V = 1
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    val rd = Contingency.chiSquare(dep, "u", "v").head()
    assert(rd.getAs[Double]("chi2") == 4.0)
    assert(rd.getAs[Double]("cramers_v") == 1.0)
    // degenerate 1xk: dof 0, NULL V, chi2 0
    val deg = Seq(("a", "x"), ("a", "y")).toDF("u", "v")
    val rg = Contingency.chiSquare(deg, "u", "v").head()
    assert(rg.getAs[Long]("dof") == 0L && rg.isNullAt(rg.fieldIndex("cramers_v")))
  }

  test("Hypothesis.welchTwoSample: hand-computed z, degenerate arms NULL") {
    // arm A = {10, 12, 14} (mean 12, var 4), arm B = {1, 3} (mean 2, var 2)
    // se2 = 4/3 + 2/2 = 7/3; z = 10 / sqrt(7/3) = 6.546537
    val df = Seq(
      ("g", 10.0, true), ("g", 12.0, true), ("g", 14.0, true),
      ("g", 1.0, false), ("g", 3.0, false)
    ).toDF("g", "v", "f")
    val r = Hypothesis.welchTwoSample(df, Seq("g"), "v", "f").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_a") == 12.0 && r.getAs[Double]("mean_b") == 2.0)
    assert(math.abs(r.getAs[Double]("welch_z") - 6.546537) < 1e-6)
    // a single-row arm cannot have a variance -> NULL z, means still real
    val thin = Seq(("g", 5.0, true), ("g", 7.0, false)).toDF("g", "v", "f")
    val rt = Hypothesis.welchTwoSample(thin, Seq("g"), "v", "f").head()
    assert(rt.isNullAt(rt.fieldIndex("welch_z")))
    // identical constant arms: se2 = 0 -> NULL, not a division blowup
    val const = Seq(("g", 5.0, true), ("g", 5.0, true),
      ("g", 5.0, false), ("g", 5.0, false)).toDF("g", "v", "f")
    val rc = Hypothesis.welchTwoSample(const, Seq("g"), "v", "f").head()
    assert(rc.isNullAt(rc.fieldIndex("welch_z")))
  }

  test("Sampling.hashReservoir: exactly k per group, layout-invariant") {
    val df = (1 to 200).map(i => (s"g${i % 4}", i)).toDF("g", "id")
    val got = Sampling.hashReservoir(df, "g", "id", 5)
    val byG = got.collect().map(r => r.getString(0)).groupBy(identity)
    assert(byG.values.forall(_.length == 5) && byG.size == 4)
    // repartitioning must select the IDENTICAL rows
    val re = Sampling.hashReservoir(df.repartition(7), "g", "id", 5)
    assert(got.orderBy("g", "id").collect().toSeq ==
      re.orderBy("g", "id").collect().toSeq)
    // k larger than the group keeps the whole group
    val tiny = Seq(("a", 1), ("a", 2)).toDF("g", "id")
    assert(Sampling.hashReservoir(tiny, "g", "id", 5).count() == 2)
  }

  test("PrefixSum.running equals the naive global window, both directions") {
    val df = (1 to 500).map(i => (s"k$i", ((i * 37) % 100 + 1) * 1.0))
      .toDF("id", "v")
    for (desc <- Seq(true, false)) {
      val ord = if (desc) Seq($"v".desc, $"id") else Seq($"v".asc, $"id")
      val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
      val naive = df
        .withColumn("cum", sum($"v".cast("decimal(18,2)"))
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)).cast("decimal(20,2)"))
        .withColumn("rnk", row_number().over(w))
        .orderBy("id").collect()
        .map(r => (r.getString(0), r.getDecimal(2), r.getInt(3).toLong))
      val dist = PrefixSum.running(df, "v", "id", "v", descending = desc,
          nBuckets = 7)
        .orderBy("id").collect()
        .map(r => (r.getString(0), r.getAs[java.math.BigDecimal]("cum"),
          r.getAs[Long]("rnk")))
      assert(dist.toSeq == naive.toSeq, s"descending=$desc")
    }
    // heavy boundary ties: many rows share the same sort value
    val tied = (1 to 100).map(i => (s"t$i", (i % 3) * 1.0 + 1.0)).toDF("id", "v")
    val naiveT = tied.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"v".desc, $"id")))
      .orderBy("id").collect().map(r => (r.getString(0), r.getInt(2).toLong))
    val distT = PrefixSum.running(tied, "v", "id", "v", descending = true,
        nBuckets = 5)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getAs[Long]("rnk")))
    assert(distT.toSeq == naiveT.toSeq)
  }

  test("PrefixSum.withGlobalLag equals the naive sorted lag, sparse keys included") {
    // sparse, gappy keys (copy-boundary-style jumps) — the exact shape
    // where a k+1 self-equi-join miscounts (q315's r10 sf1 bug); two
    // lag columns, one with repeated values so runs actually form
    val rows = (1 to 300).map { i =>
      val k = i * 13L + (if (i > 100) 100000L else 0L) +
        (if (i > 200) 900000L else 0L)
      (k, s"v${i % 7}", (i % 3).toLong)
    }
    val df = rows.toDF("k", "s", "g").repartition(9)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"k")
    val naive = df
      .withColumn("p_s", lag($"s", 1).over(w))
      .withColumn("p_g", lag($"g", 1).over(w))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(3), Option(r.get(4))))
    val dist = PrefixSum.withGlobalLag(df, "k", Seq("s", "g"), nBuckets = 7)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getAs[String]("p_s"),
        Option(r.getAs[Any]("p_g"))))
    assert(dist.toSeq == naive.toSeq)
    // the global first row (and only it) has NULL predecessors
    assert(dist.head._2 == null && dist.head._3.isEmpty)
    assert(dist.tail.forall(_._2 != null))
  }

  test("PrefixSum.runningLong equals the naive global window; packSequences unchanged") {
    // skewed long values, non-contiguous ids (bucket thresholds land
    // between them), plus repartition-invariance
    val df = (1 to 400).map(i => (i * 7L, ((i * 31) % 97 + 1).toLong))
      .toDF("id", "n").repartition(11)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = df.withColumn("cum", sum($"n").over(w))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val dist = PrefixSum.runningLong(df, "id", "n", nBuckets = 9)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum")))
    assert(dist.toSeq == naive.toSeq)

    // packSequences on top of it: never splits a doc, seq ids monotone,
    // every sequence except possibly the last reaches the budget
    val docs = (1 to 200).map(i => (i.toLong, ((i * 13) % 50 + 5).toLong))
      .toDF("doc_id", "tok")
    val packed = TextStats.packSequences(docs, "doc_id", "tok", budget = 100L)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("seq_id")))
    assert(packed.map(_._1).toSeq == (1 to 200).map(_.toLong))
    val seqIds = packed.map(_._3)
    assert(seqIds.zip(seqIds.tail).forall { case (a, b) => a <= b })
    val perSeq = packed.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val lastSeq = seqIds.max
    perSeq.foreach { case (sid, tot) =>
      if (sid != lastSeq)
        assert(tot >= 100L - 54L, s"seq $sid underfilled: $tot")
    }
  }

  test("WeightedStats.weightedQuantile equals the naive cumulative rule") {
    // deterministic skewed fixture: 3 groups, tied values, lumpy weights
    val rows = for (gi <- 1 to 3; i <- 1 to 200) yield
      (s"g$gi", ((i * 17 + gi * 7) % 40).toDouble, ((i * 13) % 9 + 1).toDouble)
    val df = rows.toDF("g", "v", "w").repartition(7)
    def naive(phi: Double): Map[String, Double] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val sub = rs.groupBy(_._2).view.mapValues(_.map(x => BigDecimal(x._3)).sum)
          .toSeq.sortBy(_._1)
        val total = sub.map(_._2).sum
        var cum = BigDecimal(0)
        g -> sub.collectFirst {
          case (v, w) if { cum += w; cum.toDouble >= total.toDouble * phi } => v
        }.get
      }
    for (phi <- Seq(0.25, 0.5, 0.9); nb <- Seq(4, 32)) {
      val got = WeightedStats.weightedQuantile(df, "g", "v", "w", phi, nb)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("wq")).toMap
      assert(got == naive(phi), s"phi=$phi nBuckets=$nb")
    }
    // single-value group and phi=1.0 edge
    val tiny = Seq(("a", 5.0, 2.0), ("b", 1.0, 1.0), ("b", 9.0, 1.0))
      .toDF("g", "v", "w")
    val t = WeightedStats.weightedQuantile(tiny, "g", "v", "w", 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("wq")).toMap
    assert(t == Map("a" -> 5.0, "b" -> 9.0))
  }

  test("Sampling.weightedSample: heavier rows overrepresented, layout-invariant") {
    // 500 light rows (w=1) + 100 heavy rows (w=50): heavy mass is 10x
    // the light mass, so a 60-row sample should be heavy-dominated
    val df = ((1 to 500).map(i => (s"l$i", 1.0)) ++
      (1 to 100).map(i => (s"h$i", 50.0))).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 60).collect()
      .map(_.getString(0))
    val heavy = got.count(_.startsWith("h"))
    assert(heavy > 40, s"only $heavy heavy rows in ${got.length}")
    // selection is a pure function of (id, w): any layout, same rows
    val re = Sampling.weightedSample(df.repartition(13), "id", "w", 60)
      .collect().map(_.getString(0))
    assert(got.toSeq == re.toSeq)
    // zero/negative weights can never be drawn
    val withZero = df.unionByName(Seq(("z", 0.0)).toDF("id", "w"))
    assert(!Sampling.weightedSample(withZero, "id", "w", 601).collect()
      .map(_.getString(0)).contains("z"))
  }

  test("Trend.fitContinuousXY: exact line recovery, r = ±1, zero variance NULL") {
    val line = (1 to 10).map(i => ("l", i * 0.5, 2.0 * (i * 0.5) + 1.0))
      .toDF("g", "x", "y")
    val r = Trend.fitContinuousXY(line, Seq("g"), "x", "y").head()
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r") == 1.0)
    val anti = (1 to 10).map(i => ("a", i * 1.0, -3.0 * i + 4.0))
      .toDF("g", "x", "y")
    val ra = Trend.fitContinuousXY(anti, Seq("g"), "x", "y").head()
    assert(ra.getAs[Double]("slope") == -3.0 && ra.getAs[Double]("r") == -1.0)
    // constant x: no fit
    val const = Seq(("c", 1.0, 1.0), ("c", 1.0, 2.0)).toDF("g", "x", "y")
    val rc = Trend.fitContinuousXY(const, Seq("g"), "x", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("slope")) && rc.isNullAt(rc.fieldIndex("r")))
  }

  test("Triangles.metrics: known graphs and brute-force equality") {
    def m(edges: Seq[(Int, Int)]) =
      Triangles.metrics(edges.toDF("a", "b")).head()
    // single triangle: 3 wedges, clustering 1
    val tri = m(Seq((1, 2), (2, 3), (1, 3)))
    assert(tri.getAs[Long]("n_triangles") == 1L)
    assert(tri.getAs[Long]("n_wedges") == 3L)
    assert(tri.getAs[Double]("clustering") == 1.0)
    // path 1-2-3: one wedge, no triangle
    val path = m(Seq((1, 2), (2, 3)))
    assert(path.getAs[Long]("n_triangles") == 0L)
    assert(path.getAs[Double]("clustering") == 0.0)
    // K4: 4 triangles, 12 wedges
    val k4 = m(Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)))
    assert(k4.getAs[Long]("n_triangles") == 4L)
    assert(k4.getAs[Long]("n_wedges") == 12L)
    // star hub (worst case for naive orientation): zero triangles
    val star = m((2 to 30).map(i => (1, i)))
    assert(star.getAs[Long]("n_triangles") == 0L)
    // random-ish graph vs the canonical a<b<c brute-force 3-join
    val rnd = (for (i <- 1 to 30; j <- i + 1 to 30
      if (i * 31 + j * 17) % 5 == 0) yield (i, j))
    val e = rnd.toDF("a", "b")
    val brute = e.as("e1").join(e.as("e2"), $"e2.a" === $"e1.b")
      .join(e.as("e3"), $"e3.a" === $"e1.a" && $"e3.b" === $"e2.b")
      .count()
    assert(m(rnd).getAs[Long]("n_triangles") == brute)
  }

  test("AsOfJoin.asOfTolerance: forward/backward windows, tolerance cutoff, ties") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, 100L, t("2024-01-01 10:00:00")))
      .toDF("u", "lid", "lts")
    val right = Seq(
      (1L, t("2024-01-01 09:30:00"), 1L),   // 30 min before
      (1L, t("2024-01-01 10:20:00"), 2L),   // 20 min after
      (1L, t("2024-01-01 13:00:00"), 3L)    // 3 h after
    ).toDF("u", "rts", "rid")
    def run(tolS: Long, fwd: Boolean) =
      AsOfJoin.asOfTolerance(left, right, Seq("u"), "lts", "rts",
        Seq("rid"), tolS, forward = fwd).head()
    // backward 1h: matches the 09:30 row
    assert(run(3600L, fwd = false).getAs[Long]("rid") == 1L)
    // backward 10min: nothing in range -> NULL
    assert(run(600L, fwd = false).isNullAt(3))
    // forward 1h: nearest following = 10:20
    assert(run(3600L, fwd = true).getAs[Long]("rid") == 2L)
    // forward 10min: 10:20 is out of tolerance -> NULL
    assert(run(600L, fwd = true).isNullAt(3))
    // equal timestamps count in both directions; tie -> max payload
    val rEq = Seq((1L, t("2024-01-01 10:00:00"), 7L),
      (1L, t("2024-01-01 10:00:00"), 9L)).toDF("u", "rts", "rid")
    Seq(true, false).foreach { fwd =>
      val r = AsOfJoin.asOfTolerance(left, rEq, Seq("u"), "lts", "rts",
        Seq("rid"), 60L, forward = fwd).head()
      assert(r.getAs[Long]("rid") == 9L, s"fwd=$fwd")
      assert(r.getAs[Timestamp]("asof_ts") == t("2024-01-01 10:00:00"))
    }
  }

  test("PageRank.ranks: symmetry, centrality ordering, layout invariance") {
    def sym(pairs: Seq[(Int, Int)]) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // symmetric triangle: perfectly regular graph -> equal ranks ~ 1/3
    val tri = PageRank.ranks(sym(Seq((1, 2), (2, 3), (1, 3))), 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(tri.values.toSet.size == 1)
    assert(math.abs(tri(1) - PageRank.Scale / 3) < PageRank.Scale / 100)
    // star: the hub out-centralizes the leaves, leaves tie exactly
    val star = PageRank.ranks(sym((2 to 5).map(i => (1, i))), 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((2 to 5).forall(i => star(1) > star(i)))
    assert((2 to 5).map(star).toSet.size == 1)
    // exact same integers at any partitioning
    val e = sym(for (i <- 1 to 20; j <- i + 1 to 20
      if (i * 7 + j * 13) % 4 == 0) yield (i, j))
    val a = PageRank.ranks(e, 4).orderBy("node").collect().toSeq
    val b = PageRank.ranks(e.repartition(9), 4).orderBy("node").collect().toSeq
    assert(a == b)
    // total mass stays within floor-loss of the scale
    val total = a.map(_.getLong(1)).sum
    assert(total <= PageRank.Scale &&
      total > PageRank.Scale - 100L * a.size)
  }

  test("PageRank.ranks: source-only nodes persist and keep contributing") {
    // directed chain 1 -> 2 -> 3 plus 3 -> 2 (so every node has an
    // out-edge). Node 1 has NO in-edges: before the r6 fix it vanished
    // from the rank frame after round 1 (groupBy dst), taking its
    // teleport mass AND its contribution to node 2 with it.
    val e = Seq((1, 2), (2, 3), (3, 2)).toDF("src", "dst")
    val pr = PageRank.ranks(e, 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // node 1 survives all rounds at exactly the teleport base
    val base = ((15L * PageRank.Scale) / 100L) / 3L
    assert(pr.keySet == Set(1, 2, 3))
    assert(pr(1) == base)
    // node 2 receives BOTH node 1's and node 3's full contribution each
    // round; after convergence-ish 5 rounds it must strictly dominate
    // node 3 (which only receives from 2) and base (hand-derived floor:
    // base + 85% of node 1's base-rank contribution alone)
    assert(pr(2) > pr(3))
    assert(pr(2) > base + (85L * base) / 100L)
    // mass conservation within floor loss: without the fix node 1's
    // share (~1/3 of teleport plus its round-1 rank) leaks entirely
    val total = pr.values.sum
    assert(total <= PageRank.Scale && total > PageRank.Scale - 300L)
  }

  test("PageRank.ranks: shuffle-hash rank loop (big-graph path) matches broadcast path exactly") {
    // The per-round join strategy adapts to node count vs the session's
    // broadcast budget: small graphs broadcast the rank frame, big
    // graphs switch to a co-partitioned shuffle_hash join (a
    // billion-node rank frame cannot broadcast). Force the big-graph
    // path by disabling broadcast on a fresh session and pin BOTH
    // halves: identical integers to the default path, and a loop plan
    // with ShuffledHashJoin and zero broadcast joins.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val pairs = for (i <- 1 to 20; j <- i + 1 to 20
      if (i * 7 + j * 13) % 4 == 0) yield (i, j)
    def edges(sess: org.apache.spark.sql.SparkSession) = {
      import sess.implicits._
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    }
    val viaShj = PageRank.ranks(edges(s2), 4)
    val plan = viaShj.queryExecution.sparkPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the forced shuffle-hash rank loop:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "broadcast join present despite threshold -1")
    val a = viaShj.orderBy("node").collect().toSeq.map(r => (r.getInt(0), r.getLong(1)))
    val b = PageRank.ranks(edges(spark), 4).orderBy("node").collect()
      .toSeq.map(r => (r.getInt(0), r.getLong(1)))
    assert(a == b, "shuffle-hash and broadcast rank loops diverged")
  }

  test("Winnowing: brute-force equality, shared-run guarantee, density") {
    // driver-side reference implementation of the exact same algorithm
    def brute(tokens: Seq[String], k: Int, w: Int): Set[(Long, Long)] = {
      if (tokens.length < k + w - 1) return Set.empty
      val hs = tokens.sliding(k).map(_.mkString(" ")).zipWithIndex.map {
        case (g, pos) =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8"))
          val h60 = java.lang.Long.parseLong(
            md5.take(8).map("%02x".format(_)).mkString.take(15), 16)
          (h60 >> 20, pos.toLong)
      }.toVector
      hs.sliding(w).map { win =>
        win.minBy { case (h, p) => (h, -p) }   // min hash, rightmost pos
      }.toSet
    }
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y z a b c d e f q r s"),       // shares the 6-run a..f with 1
      (3L, "p q"),                           // too short for any gram
      (4L, (1 to 40).map(i => s"t${i % 7}").mkString(" "))  // repetitive
    ).toDF("doc_id", "text")
    val got = Winnowing.fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((id, text) <- Seq((1L, "a b c d e f g h i j"),
        (2L, "x y z a b c d e f q r s"),
        (4L, (1 to 40).map(i => s"t${i % 7}").mkString(" ")))) {
      assert(got(id) == brute(text.split(" ").toSeq, 3, 4), s"doc $id")
    }
    assert(!got.contains(3L))
    // guarantee: the shared >= k+w-1 = 6-token run yields a shared hash
    val sharedHashes = got(1L).map(_._1) intersect got(2L).map(_._1)
    assert(sharedHashes.nonEmpty)
    // density ~ 2/(w+1): doc 4 has 38 grams, expect fingerprints well
    // below the gram count but at least m/w
    assert(got(4L).size >= 38 / 4 && got(4L).size < 38)
    // overlap pairs: docs 1 and 2 pair via the shared run; the cap
    // maxDf=1 removes every cross-doc fingerprint -> no pairs at all
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k = 3, w = 4)
    val pairs = Winnowing.overlapPairs(fp, minShared = 1L, maxDf = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(Winnowing.overlapPairs(fp, minShared = 1L, maxDf = 1L).count() == 0L)
  }

  test("Divergence: KL zero for corpus-identical groups, positive for drifted; PSI") {
    // two groups with IDENTICAL term distributions -> corpus matches each
    // -> KL = 0 for both
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("g", "text")
    val kl0 = Divergence.klVsCorpus(same, "g", "text").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("kl_nats")).toMap
    assert(kl0("a") == 0.0 && kl0("b") == 0.0)
    // a drifted group diverges, the dominant one barely moves
    val drift = Seq(("big", "x x x x x x x x y"), ("odd", "z")).toDF("g", "text")
    val kd = Divergence.klVsCorpus(drift, "g", "text").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("kl_nats")).toMap
    assert(kd("odd") > 1.0 && kd("odd") > kd("big") && kd("big") >= 0.0)
    // PSI: identical distributions -> every term 0; shifted -> positive sum
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val refPsi = Divergence.psiBins(ref, ref, "v", 10).collect()
    assert(refPsi.forall(_.getAs[Double]("psi_term") == 0.0))
    val cur = (501 to 1500).map(_.toDouble).toDF("v")
    val terms = Divergence.psiBins(ref, cur, "v", 10).collect()
    val psi = terms.flatMap(r => Option(r.get(5)).map(_.asInstanceOf[Double])).sum
    assert(psi > 0.2, s"psi $psi")  // a half-range shift must trip the gate
    // the top bin holds half of `cur` -> it alone contributes heavily
    val top = terms.find(_.getAs[Long]("bin") == 9L).get
    assert(top.getAs[Long]("n_cur") > 400L)
  }

  test("Cms.innerProduct: join-size estimate >= truth, exact when collision-free") {
    // distinct keys, few enough that no two share a cell in any row with
    // overwhelming probability -> inner product is EXACTLY sum f_a*f_b
    val a = Seq("k1", "k1", "k1", "k2").toDF("k") // f = {k1:3, k2:1}
    val b = Seq("k1", "k2", "k2", "k3").toDF("k") // f = {k1:1, k2:2, k3:1}
    val est = Cms.innerProduct(Cms.sketch(a, "k"), Cms.sketch(b, "k"))
      .first().getLong(0)
    // truth = 3*1 + 1*2 = 5; collisions can only push the estimate UP
    assert(est >= 5L)
    assert(est == 5L, s"4 keys in a 4x1024 grid should not collide: $est")
    // self inner product = second moment F2
    val self = Cms.innerProduct(Cms.sketch(a, "k"), Cms.sketch(a, "k"))
      .first().getLong(0)
    assert(self == 3L * 3 + 1)
    // disjoint key sets -> zero overlap (min over the generated row frame,
    // not only rows the cell join produces)
    val c = Seq("zz").toDF("k")
    val disj = Cms.innerProduct(Cms.sketch(a, "k"), Cms.sketch(c, "k"))
      .first().getLong(0)
    assert(disj == 0L)
  }

  test("GraphCore.kCoreTrace: known graph peels to its 2-core") {
    // triangle {1,2,3} plus a pendant chain 3-4-5: 2-core = the triangle
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val tr = GraphCore.kCoreTrace(sym, k = 2, rounds = 3)
      .orderBy("iter").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(tr(0) == ((5L, 5L)))             // all nodes, all edges
    assert(tr(1) == ((4L, 4L)))             // node 5 peeled (degree 1)
    assert(tr(2) == ((3L, 3L)))             // then node 4
    assert(tr(3) == ((3L, 3L)))             // fixed point: the triangle
  }

  test("GraphCore.bfsHops: path graph distances, visited never re-expanded") {
    // path 1-2-3-4-5, seed {1}: hop = node - 1, capped at maxHops
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val seeds = Seq(1L).toDF("a")
    val d = GraphCore.bfsHops(sym, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)) // 5 unreached
    // cycle: two frontiers meet; every node gets its MINIMUM distance
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val csym = cyc.unionByName(cyc.select(col("b").as("a"), col("a").as("b")))
    val cd = GraphCore.bfsHops(csym, Seq(1L).toDF("a"), maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cd == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("TextStats.bm25: rare terms outscore common, tf saturates, dl penalizes") {
    val docs = Seq(
      ("d1", "rare alpha beta gamma"),
      ("d2", "common alpha beta gamma"),
      ("d3", "common common common alpha"),
      ("d4", "common alpha beta gamma delta epsilon zeta eta theta iota"),
      ("d5", "alpha beta gamma delta"),
      ("d6", "common beta gamma delta")).toDF("id", "text")
    val s = TextStats.bm25(docs, "id", "text", Seq("rare", "common"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(!s.contains("d5"))                       // no query term -> no row
    // rare (df=1) beats common (df=3) at equal tf and dl
    assert(s("d1")._2 > s("d2")._2)
    // tf=3 scores higher than tf=1 but saturates: well under 3x
    assert(s("d3")._2 > s("d2")._2 && s("d3")._2 < 2.5 * s("d2")._2)
    // longer doc, same tf -> lower score
    assert(s("d4")._2 < s("d2")._2)
    assert(s("d1")._1 == 1L && s("d3")._1 == 1L)
  }

  test("Hypothesis.anovaOneWay: textbook SS decomposition, degenerate NULLs") {
    import spark.implicits._
    import graft.operators.Hypothesis
    // Classic 3-group example: g1={1,2,3}, g2={4,5,6}, g3={7,8,9}.
    // Grand mean 5; SSB = 3·(16+0+16) hmm: means 2,5,8 → SSB = 3·(9+0+9)=54;
    // SSW = 2+2+2 = 6; F = (54/2)/(6/6) = 27.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0),
      ("b", 6.0), ("c", 7.0), ("c", 8.0), ("c", 9.0)).toDF("g", "v")
    val r = Hypothesis.anovaOneWay(df, "g", "v").head()
    assert(r.getAs[Long]("k_groups") == 3L && r.getAs[Long]("n_total") == 9L)
    assert(math.abs(r.getAs[Double]("ss_between") - 54.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ss_within") - 6.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("f_stat") - 27.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("eta_sq") - 0.9) < 1e-6)
    // all groups identical constant -> SSW = 0 -> F NULL, eta NULL
    val const = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v")
    val rc = Hypothesis.anovaOneWay(const, "g", "v").head()
    assert(rc.isNullAt(rc.fieldIndex("f_stat")))
    assert(rc.isNullAt(rc.fieldIndex("eta_sq")))
    // single group -> between dof 0 -> F NULL
    val one = Seq(("a", 1.0), ("a", 5.0)).toDF("g", "v")
    assert(Hypothesis.anovaOneWay(one, "g", "v").head()
      .isNullAt(2 + 2)) // f_stat is col index 4
  }

  test("Hypothesis.mannWhitney: scipy-parity U with ties, symmetric arms") {
    import spark.implicits._
    import graft.operators.Hypothesis
    // a={1,2,4}, b={3,5}: ranks 1,2,4 for a (rank of 4 is 4) → Ra=7,
    // Ua = 7 − 3·4/2 = 1 ... wait sorted: 1,2,3,4,5 → a ranks {1,2,4},
    // Ra = 7, Ua = 7 − 6 = 1. scipy.mannwhitneyu(a,b): U=1? U_a
    // counts (a<b) pairs... standard Ua = Ra − na(na+1)/2 = 1.
    val df = Seq((1.0, true), (2.0, true), (4.0, true), (3.0, false),
      (5.0, false)).toDF("v", "f")
    val r = Hypothesis.mannWhitney(df, "v", "f").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_stat") == 1.0)
    // midranks with ties: a={1,2,2}, b={2,3}: sorted 1,2,2,2,3 — the
    // three 2s share midrank 3. Ra = 1+3+3 = 7, Ua = 7−6 = 1.
    val t = Seq((1.0, true), (2.0, true), (2.0, true), (2.0, false),
      (3.0, false)).toDF("v", "f")
    val rt = Hypothesis.mannWhitney(t, "v", "f").head()
    assert(rt.getAs[Double]("u_stat") == 1.0)
    // swapping arms reflects U around na·nb/2: Ua + Ub = na·nb
    val df2 = df.withColumn("f", !col("f"))
    val r2 = Hypothesis.mannWhitney(df2, "v", "f").head()
    assert(r.getAs[Double]("u_stat") + r2.getAs[Double]("u_stat") == 3.0 * 2.0)
    // all values identical -> tie-corrected variance 0 -> z NULL
    val z0 = Seq((2.0, true), (2.0, true), (2.0, false)).toDF("v", "f")
    assert(Hypothesis.mannWhitney(z0, "v", "f").head()
      .isNullAt(3)) // z_stat
  }

  test("Trend.ols2: recovers an exact plane, NULLs on a singular design") {
    import spark.implicits._
    import graft.operators.Trend
    // y = 2 + 3·x1 − 1·x2 exactly -> betas recovered, R² = 1
    val pts = for { x1 <- 0 to 3; x2 <- 0 to 3 }
      yield (x1.toDouble, x2.toDouble, 2.0 + 3.0 * x1 - x2)
    val r = Trend.ols2(pts.toDF("x1", "x2", "y"), "x1", "x2", "y").head()
    assert(r.getAs[Long]("n") == 16L)
    assert(math.abs(r.getAs[Double]("beta0") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta1") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta2") + 1.0) < 1e-6)
    assert(r.getAs[Double]("r2") == 1.0)
    // collinear design (x2 = 2·x1): determinant 0 -> all NULL, no crash
    val sing = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 7.0), (3.0, 6.0, 9.0))
      .toDF("x1", "x2", "y")
    val rs = Trend.ols2(sing, "x1", "x2", "y").head()
    assert(rs.isNullAt(rs.fieldIndex("beta1")))
    assert(rs.isNullAt(rs.fieldIndex("r2")))
  }

  test("KMeans.fit2d: two separated blobs resolve exactly, wcss hand-checked") {
    import spark.implicits._
    import graft.operators.KMeans
    val pts = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0),
      (10.0, 10.0), (10.0, 11.0), (11.0, 10.0), (11.0, 11.0)).toDF("x", "y")
    val r = KMeans.fit2d(pts, "x", "y", k = 2, iters = 3).collect()
      .map(x => x.getInt(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(0) == ((4L, 0.5, 0.5, 2.0)))   // unit square -> 4·(0.5²+0.5²)
    assert(r(1) == ((4L, 10.5, 10.5, 2.0)))
    // degenerate: all points identical — one cluster takes all, others
    // keep their (empty-guarded) grid centroids and report n=0 rows absent
    val same = Seq.fill(5)((3.0, 3.0)).toDF("x", "y")
    val rs = KMeans.fit2d(same, "x", "y", k = 2, iters = 2).collect()
    assert(rs.map(_.getLong(1)).sum == 5L)
    assert(rs.forall(_.getDouble(4) == 0.0)) // zero spread -> zero wcss
  }

  test("KMeans.elbow2d equals per-k fit2d totals (one-scan sweep parity)") {
    // The elbow sweep computes every k in ONE scan set; its contract is
    // per-k COLUMN-IDENTICAL arithmetic to fit2d. Assert the curve
    // equals the independently-fitted totals, aggregated exactly the
    // way q242 aggregates fit2d output.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, round, sum}
    import graft.operators.KMeans
    val pts = (1 to 60).map(i =>
      ((i % 7).toDouble + i * 0.01, (i % 5).toDouble - i * 0.02)).toDF("x", "y")
    val sweep = KMeans.elbow2d(pts, "x", "y", ks = Seq(2, 3, 4), iters = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for (k <- Seq(2, 3, 4)) {
      val one = KMeans.fit2d(pts, "x", "y", k = k, iters = 3)
        .agg(sum(col("n_points")).as("n"),
          round(sum(col("wcss").cast("decimal(24,4)")), 4)
            .cast("double").as("w")).head()
      assert(sweep(k) == ((one.getLong(0), one.getDouble(1))),
        s"k=$k: sweep ${sweep(k)} vs fit2d ${(one.getLong(0), one.getDouble(1))}")
    }
    // WCSS must be non-increasing in k on the same data
    val ws = Seq(2, 3, 4).map(k => sweep(k)._2)
    assert(ws.zip(ws.tail).forall { case (a, b) => b <= a })
  }

  test("TaskMetricsListener: shuffle/input deltas observed for a real shuffle") {
    // the bench telemetry contract: a groupBy over a parquet scan must
    // move BOTH the shuffle-write and input-bytes counters; deltas are
    // asserted as strict increases (the listener is session-global, so
    // concurrent suites can only ADD — monotonicity keeps this safe)
    import org.apache.spark.sql.functions.{col, sum}
    import graft.tools.TaskMetricsListener
    val lm = new TaskMetricsListener
    spark.sparkContext.addSparkListener(lm)
    try {
      val before = lm.settledSnapshot()
      graft.sources.Tables.load(spark, sf(), "lineitem")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
        .write.format("noop").mode("overwrite").save()
      val d = lm.delta(before, lm.settledSnapshot())
      assert(d("shuf_write") > 0, s"expected shuffle write bytes, got $d")
      assert(d("shuf_read") > 0, s"expected shuffle read bytes, got $d")
      assert(d("shuf_recs") > 0, s"expected shuffle records, got $d")
      assert(d("input_bytes") > 0 && d("input_recs") > 0,
        s"expected parquet scan input, got $d")
      assert(d.values.forall(_ >= 0), s"counters must be monotone, got $d")
    } finally spark.sparkContext.removeSparkListener(lm)
  }

  test("Trend.pcaFirstComponent: perfect pair→λ=2 equal loadings, identity→λ=1") {
    import spark.implicits._
    import graft.operators.Trend
    // y = 3x: correlation matrix [[1,1],[1,1]] -> λ1 = 2, v = (1,1)/√2
    val perfect = Seq((1.0, 3.0), (2.0, 6.0), (3.0, 9.0), (4.0, 12.0))
      .toDF("x", "y")
    val rp = Trend.pcaFirstComponent(perfect, Seq("x", "y"), iters = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(rp("x")._2 == 2.0 && rp("y")._2 == 2.0)       // eigenvalue
    assert(math.abs(rp("x")._1 - 0.707107) < 1e-6)       // loading 1/√2
    assert(rp("x")._1 == rp("y")._1)
    // exactly uncorrelated pair: R = I -> λ1 = 1, start vector is fixed
    val ident = Seq((1.0, 1.0), (2.0, 1.0), (1.0, -1.0), (2.0, -1.0))
      .toDF("x", "y")
    val ri = Trend.pcaFirstComponent(ident, Seq("x", "y"), iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ri("x") == 1.0)
  }

  test("Trend.holtLinear: hand-traced fold, constant series is a fixed point") {
    import spark.implicits._
    import graft.operators.Trend
    // α=β=0.5 on y=[10,20,30]: l=(10,15,23.75), b=(0,2.5,5.625)
    // forecast_2 = 23.75 + 2·5.625 = 35.0
    val df = Seq(("s", 1L, 10.0), ("s", 2L, 20.0), ("s", 3L, 30.0))
      .toDF("g", "t", "y")
    val r = Trend.holtLinear(df, Seq("g"), "t", "y", 0.5, 0.5, 2).head()
    assert(r.getAs[Long]("n_obs") == 3L)
    assert(r.getAs[Double]("level") == 23.75)
    assert(r.getAs[Double]("trend") == 5.625)
    assert(r.getAs[Double]("forecast_2") == 35.0)
    // constant series: level sticks, trend stays 0, forecast = the constant
    val const = Seq(("c", 1L, 7.0), ("c", 2L, 7.0), ("c", 3L, 7.0), ("c", 4L, 7.0))
      .toDF("g", "t", "y")
    val rc = Trend.holtLinear(const, Seq("g"), "t", "y", 0.3, 0.2, 7).head()
    assert(rc.getAs[Double]("level") == 7.0 && rc.getAs[Double]("trend") == 0.0)
    assert(rc.getAs[Double]("forecast_7") == 7.0)
  }

  test("Hits.ranks: hand-traced bipartite scores, zero for role-less side") {
    import spark.implicits._
    import graft.operators.Hits
    // hubs {1,2} → authorities {10,11}: 1→10, 2→10, 2→11
    // r1: a=(2S,S)→norm(100000,50000); h=(a10, a10+a11)=(100000,150000)
    //     →norm(66666,100000)
    // r2: a=(h1+h2, h2)=(166666,100000)→norm(100000, 1e10//166666=60000)
    //     h=(100000, 160000)→norm(1e10//160000=62500, 100000)
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val r = Hits.ranks(edges, iters = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(10L) == ((100000L, 0L)))  // top authority; never a hub
    assert(r(11L) == ((60000L, 0L)))
    assert(r(2L) == ((0L, 100000L)))   // top hub; never an authority
    assert(r(1L) == ((0L, 62500L)))
  }

  test("Contingency.mutualInformation: independent→0, identical→H, nmi=1") {
    import spark.implicits._
    import graft.operators.Contingency
    // balanced independent 2x2: every cell count 5 -> MI exactly 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val ri = Contingency.mutualInformation(ind, "a", "b").head()
    assert(ri.getAs[Double]("mi_nats") == 0.0)
    assert(ri.getAs[Double]("nmi") == 0.0)
    // identical columns: MI = H(A) = H(B), nmi = 1; H for a fair coin = ln 2
    val same = (Seq.fill(8)("x") ++ Seq.fill(8)("y")).map(v => (v, v))
      .toDF("a", "b")
    val rs = Contingency.mutualInformation(same, "a", "b").head()
    assert(math.abs(rs.getAs[Double]("h_a_nats") - math.log(2)) < 1e-6)
    assert(rs.getAs[Double]("mi_nats") == rs.getAs[Double]("h_a_nats"))
    assert(rs.getAs[Double]("nmi") == 1.0)
    // constant column: zero entropy -> nmi NULL, MI 0
    val const = Seq(("x", "u"), ("x", "v"), ("x", "u")).toDF("a", "b")
    val rc = Contingency.mutualInformation(const, "a", "b").head()
    assert(rc.getAs[Double]("mi_nats") == 0.0)
    assert(rc.isNullAt(rc.fieldIndex("nmi")))
    // NULL is an ordinary level: (x,null) pairs count
    val withNull = Seq(("x", null), ("x", null), ("y", "u"), ("y", "u"))
      .toDF("a", "b")
    val rn = Contingency.mutualInformation(withNull, "a", "b").head()
    assert(rn.getAs[Long]("levels_b") == 2L)
    assert(rn.getAs[Double]("nmi") == 1.0) // b fully determined by a
  }

  test("Trend.correlationMatrix: exact ±1 lines, NULL variance, pearson parity") {
    import spark.implicits._
    import graft.operators.Trend
    // y = 2x (r=1), z = -x (r(x,z) = -1, r(y,z) = -1), w constant (NULL)
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0))
      .toDF("x", "y", "z", "w")
    val r = Trend.correlationMatrix(df, Seq("x", "y", "z", "w")).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap
    assert(r.size == 6)
    assert(r(("x", "y")) == Some(1.0) && r(("x", "z")) == Some(-1.0)
      && r(("y", "z")) == Some(-1.0))
    assert(r(("x", "w")).isEmpty && r(("y", "w")).isEmpty && r(("z", "w")).isEmpty)
    // matches groupedPearson on the same pair (same moment discipline)
    val viaPair = Trend.groupedPearson(
      df.withColumn("g", lit(1)), Seq("g"), "x", "y").head().getAs[Double]("r")
    assert(r(("x", "y")) == Some(viaPair))
    // a row with ANY null drops listwise: n reflects it
    val withNull = df.unionByName(Seq((5.0, 10.0, -5.0, Double.NaN))
      .toDF("x", "y", "z", "w").withColumn("w", lit(null).cast("double")))
    val n = Trend.correlationMatrix(withNull, Seq("x", "y", "w"))
      .head().getAs[Long]("n")
    assert(n == 4L)
  }

  test("Intervals.unionLength: merges overlaps, counts islands, adjacency joins") {
    import spark.implicits._
    import graft.operators.Intervals
    // key 1: [0,10) ∪ [5,12) ∪ [20,25) → 2 islands, covered 12+5=17;
    // [12,15) is ADJACENT to [5,12) half-open → same island (gap=0).
    val df = Seq((1L, 0L, 10L, 1L), (1L, 5L, 12L, 2L), (1L, 20L, 25L, 3L),
      (2L, 0L, 10L, 4L), (2L, 10L, 15L, 5L))
      .toDF("k", "s", "e", "tie")
    val r = Intervals.unionLength(df, "k", "s", "e", "tie").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((3L, 2L, 17L)))
    assert(r(2L) == ((2L, 1L, 15L))) // adjacent half-open intervals merge
    // nested interval fully inside another adds nothing
    val nested = Seq((9L, 0L, 100L, 1L), (9L, 10L, 20L, 2L)).toDF("k", "s", "e", "tie")
    val rn = Intervals.unionLength(nested, "k", "s", "e", "tie").head()
    assert(rn.getLong(2) == 1L && rn.getLong(3) == 100L)
    // end <= start is rejected loudly
    val bad = Seq((1L, 5L, 5L, 1L)).toDF("k", "s", "e", "tie")
    val ex = intercept[Exception] {
      Intervals.unionLength(bad, "k", "s", "e", "tie").collect()
    }
    assert(ex.getMessage.contains("end <= start")
      || ex.getCause != null && ex.getCause.getMessage.contains("end <= start"))
  }

  test("Intervals.calendarize: conserves value, splits by day overlap") {
    import spark.implicits._
    import graft.operators.Intervals
    import java.sql.Date
    // 30 days Jan 16..Feb 14, value 3000: 16 days Jan (1600), 14 Feb (1400)
    val df = Seq((Date.valueOf("2020-01-16"), Date.valueOf("2020-02-14"), 3000.0),
      (Date.valueOf("2020-03-05"), Date.valueOf("2020-03-09"), 50.0))
      .toDF("s", "e", "v")
    val r = Intervals.calendarize(df, "s", "e", "v").collect()
      .map(x => x.getDate(0).toString -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("2020-01-01") == ((1L, 1600.0)))
    assert(r("2020-02-01") == ((1L, 1400.0)))
    assert(r("2020-03-01") == ((1L, 50.0)))   // fully inside one month
    // conservation: total allocated equals total value (exact here)
    assert(r.values.map(_._2).sum == 3050.0)
  }

  test("Hypothesis.ksTwoSample: identical→0, disjoint→1, hand-computed mid") {
    import spark.implicits._
    import graft.operators.Hypothesis
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "f")
    assert(Hypothesis.ksTwoSample(same, "v", "f").head()
      .getAs[Double]("d_stat") == 0.0)
    val disj = Seq((1.0, true), (2.0, true), (10.0, false), (11.0, false))
      .toDF("v", "f")
    assert(Hypothesis.ksTwoSample(disj, "v", "f").head()
      .getAs[Double]("d_stat") == 1.0)
    // a={1,3}, b={2,4}: at v=1 gap |1/2−0|=.5; v=2 |1/2−1/2|=0;
    // v=3 |1−1/2|=.5; v=4 0 → D=0.5
    val mid = Seq((1.0, true), (3.0, true), (2.0, false), (4.0, false))
      .toDF("v", "f")
    assert(Hypothesis.ksTwoSample(mid, "v", "f").head()
      .getAs[Double]("d_stat") == 0.5)
  }

  test("Isotonic.fitBinned equals sequential PAV and is monotone") {
    import spark.implicits._
    // brute-force reference: classic pool-adjacent-violators stack over
    // the (score-sorted) bins — the algorithm the minimax closed form
    // must reproduce block-for-block
    def pav(bins: Seq[(Long, Long, Long)]): Map[Long, Double] = {
      // (score, n, k) sorted by score -> pooled blocks of (n, k, scores)
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, List[Long])]
      bins.foreach { case (s, n, k) =>
        stack += ((n, k, List(s)))
        while (stack.length > 1 && {
          val (n2, k2, _) = stack(stack.length - 1)
          val (n1, k1, _) = stack(stack.length - 2)
          k1.toDouble / n1 >= k2.toDouble / n2
        }) {
          val (n2, k2, s2) = stack.remove(stack.length - 1)
          val (n1, k1, s1) = stack.remove(stack.length - 1)
          stack += ((n1 + n2, k1 + k2, s1 ++ s2))
        }
      }
      stack.flatMap { case (n, k, ss) =>
        ss.map(_ -> k.toDouble / n) }.toMap
    }
    val rng = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val units = (1 to 400).map { i =>
        val score = rng.nextInt(12).toLong
        // non-monotone on purpose: rate dips at scores 5-7
        val p = if (score >= 5 && score <= 7) 0.2 else 0.1 + score * 0.06
        (score, if (rng.nextDouble() < p) 1L else 0L)
      }
      val got = Isotonic.fitBinned(units.toDF("score", "pos"),
          "score", "pos")
        .orderBy("score").collect()
        .map(r => (r.getLong(0), r.getDouble(4)))
      val binsRef = units.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (s, us) => (s, us.size.toLong, us.map(_._2).sum) }
      val want = pav(binsRef)
      got.foreach { case (s, iso) =>
        assert(math.abs(iso - want(s)) < 1e-8, s"trial $trial score $s")
      }
      got.sliding(2).foreach { case Array((_, a), (_, b)) =>
        assert(a <= b + 1e-12, s"trial $trial not monotone")
      case _ => }
    }
  }

  test("Incremental.retract is indistinguishable from recomputing the survivors") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      // rows (key, id, value?); deletions chosen to hit every hard case:
      // the group min, the group max, a whole key, and NULL-measure rows
      val rows = (1 to 120).map { i =>
        val k = i % 8
        val v: Option[Double] =
          if (rng.nextDouble() < 0.1) None
          else Some((rng.nextInt(2000) - 1000) / 100.0)
        (k.toLong, i.toLong, v)
      }
      val base = rows.toDF("k", "id", "v")
      val delIds = rows.filter { case (k, i, v) =>
        k == 3 ||                                   // whole key erased
        v.exists(_ < -5.0) ||                       // hits minima
        v.exists(_ > 8.0) ||                        // hits maxima
        (v.isEmpty && i % 2 == 0)                   // NULL-measure rows
      }.map(_._2).toSet
      val deletes = base.filter(col("id").isin(delIds.toSeq: _*))
      val survivors = base.join(deletes.select("id"), Seq("id"), "left_anti")
      val got = Incremental.retract(
          Incremental.aggState(base, Seq("k"), "v"),
          deletes, survivors, Seq("k"), "v")
        .orderBy("k").collect().map(_.toSeq).toSeq
      val want = Incremental.aggState(survivors, Seq("k"), "v")
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(got == want, s"trial $trial")
    }
  }

  test("QuantileNorm makes equal-size groups identical and preserves in-group order") {
    import spark.implicits._
    // two 50-row groups with wildly different scales/shapes; equal sizes
    // mean both groups sample the pooled curve on the SAME p-grid, so
    // their normalized multisets must be identical
    val rows = (1 to 50).map(i => ("a", i.toLong, i * i * 0.3)) ++
      (1 to 50).map(i => ("b", 100L + i, 1000.0 + 7.0 * i))
    val out = QuantileNorm.toPooled(rows.toDF("g", "id", "x"), "g", "x", "id")
      .select($"g", $"x", $"qn_value").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val a = out.filter(_._1 == "a").sortBy(_._2).map(_._3)
    val b = out.filter(_._1 == "b").sortBy(_._2).map(_._3)
    assert(a.toSeq == b.toSeq, "equal-size groups must normalize identically")
    assert(a.sorted.toSeq == a.toSeq, "normalization must preserve order")
    // normalized values live inside the pooled range
    val xs = rows.map(_._3)
    assert(a.forall(v => v >= xs.min - 1e-9 && v <= xs.max + 1e-9))
  }

  test("Trend.groupedOls2 recovers exact planes and NULLs out collinearity") {
    import spark.implicits._
    // exact plane y = 2 + 3*x1 - 0.5*x2, no noise -> coefficients exact
    // to the 8-decimal snap and R² = 1
    val pts = for (x1 <- 0 to 6; x2 <- 0 to 5)
      yield ("g", x1.toDouble, x2.toDouble, 2.0 + 3.0 * x1 - 0.5 * x2)
    val fit = Trend.groupedOls2(pts.toDF("g", "x1", "x2", "y"),
      Seq("g"), "x1", "x2", "y").head()
    assert(math.abs(fit.getAs[Double]("b0") - 2.0) < 1e-6)
    assert(math.abs(fit.getAs[Double]("b1") - 3.0) < 1e-6)
    assert(math.abs(fit.getAs[Double]("b2") + 0.5) < 1e-6)
    assert(math.abs(fit.getAs[Double]("r2") - 1.0) < 1e-6)
    // collinear regressors (x2 = 2*x1): det = 0 -> NULL b1/b2/r2, loud
    // instead of garbage
    val col2 = (0 to 9).map(i =>
      ("g", i.toDouble, 2.0 * i, 1.0 + i))
    val bad = Trend.groupedOls2(col2.toDF("g", "x1", "x2", "y"),
      Seq("g"), "x1", "x2", "y").head()
    assert(bad.isNullAt(bad.fieldIndex("b1")) &&
      bad.isNullAt(bad.fieldIndex("b2")) &&
      bad.isNullAt(bad.fieldIndex("r2")))
    // single-regressor sanity: matches fitContinuousXY's slope when x2
    // is constant-free noise with zero coefficient
    val single = (0 to 20).map(i =>
      ("g", i.toDouble, (i % 3).toDouble, 5.0 + 2.0 * i))
    val s2 = Trend.groupedOls2(single.toDF("g", "x1", "x2", "y"),
      Seq("g"), "x1", "x2", "y").head()
    assert(math.abs(s2.getAs[Double]("b1") - 2.0) < 1e-6)
    assert(math.abs(s2.getAs[Double]("b2")) < 1e-6)
  }

  test("q307 Shapley efficiency axiom: the phis sum to v(full) - v(empty)") {
    // Efficiency is THE structural property of Shapley values: total
    // credit distributed = total value created. phi6 are exact integer
    // sixths, so the check is exact integer arithmetic, no tolerance.
    val rows = Queries.queries("q307_shapley_attribution")(spark, sf())
      .collect()
    val phi6Sum = rows.map(_.getAs[Long]("phi6")).sum
    val peru = graft.sources.Tables.load(spark, sf(), "events")
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"),
        max(when(col("event_type").isin("view", "click", "signup"), 1)
          .otherwise(0)).as("touched"))
    val vFull = peru.agg(sum(col("conv"))).head().getLong(0)
    val vEmpty = peru.filter(col("touched") === 0)
      .agg(coalesce(sum(col("conv")), lit(0L))).head().getLong(0)
    assert(phi6Sum == 6L * (vFull - vEmpty),
      s"sum(phi6)=$phi6Sum vs 6*(v(N)-v(0))=${6L * (vFull - vEmpty)}")
  }

  test("q316 IPF raking: both margins converge to N/5 after three sweeps") {
    val rows = Queries.queries("q316_ipf_raking")(spark, sf()).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    val target = n / 5.0
    // column (region) margin was scaled LAST -> exact to the 8-dec snap;
    // row (segment) margin one half-sweep stale -> loose tolerance
    val byReg = rows.groupBy(_.getAs[String]("reg"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("w_raked")).sum }
    byReg.foreach(m => assert(math.abs(m - target) < 1e-4,
      s"region margin $m vs $target"))
    val bySeg = rows.groupBy(_.getAs[String]("seg"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("w_raked")).sum }
    bySeg.foreach(m => assert(math.abs(m - target) < 0.05 * target,
      s"segment margin $m vs $target"))
  }

  test("q324 Theil decomposition: within-share recomposes from the parts") {
    // t_within is reported as t_total - t_between; the structural
    // identity says it must ALSO equal sum(share_g * t_g). Both sides
    // carry 6-decimal snaps through ~25 terms, so tolerance 1e-3.
    val rows = Queries.queries("q324_theil_decomposition")(spark, sf())
      .collect()
    val within = rows.head.getAs[Double]("t_within")
    val recomposed = rows.map(r =>
      r.getAs[Double]("share") * r.getAs[Double]("t_g")).sum
    assert(math.abs(within - recomposed) < 1e-3,
      s"t_within=$within vs sum(share*t_g)=$recomposed")
    assert(rows.head.getAs[Double]("t_total") >= 0.0)
  }

  test("q322 Huber IRLS downweights an injected outlier-heavy tail") {
    // Structural property of the robust fit: total weight after the
    // first reweighting step is strictly below n (something got
    // downweighted on real revenue data), and never increases across
    // steps once k is fixed... steps may oscillate slightly, so assert
    // only step1..3 < step0 = n.
    val rows = Queries.queries("q322_huber_irls")(spark, sf()).collect()
      .sortBy(_.getAs[Int]("step"))
    val n = rows.head.getAs[Double]("total_w")
    rows.tail.foreach { r =>
      assert(r.getAs[Double]("total_w") < n,
        s"step ${r.getAs[Int]("step")} weight not below n=$n")
    }
  }

  test("Stable.portableDouble is bit-identical to the DuckDB mirror " +
      "through 10^33 (three-word split; the r10 single-split bound bug)") {
    // Expected bit patterns computed by running sqlPortableDouble
    // verbatim in DuckDB 1.x on the same literals. The first case
    // (10^25 + 7) sits ABOVE the old single-split portability bound
    // 2^83 ≈ 9.7e24 — under the r10 code, Spark's hi word exceeded 2^53
    // and the recombination was engine-dependent; the three-word split
    // is exact-IEEE-identical by construction.
    val cases = Seq(
      ("10000000000000000000000007", 4981134201117475472L),
      ("12345678901234567890123457", 4982226492974234964L),
      ("999999999999999999999999999999999", 5100510072459938204L))
    for ((lit25, wantBits) <- cases) {
      val got = spark.sql(
          s"SELECT CAST('$lit25' AS DECIMAL(38,0)) AS v")
        .select(graft.functions.Stable.portableDouble(col("v")).as("d"))
        .head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(got) == wantBits,
        s"portableDouble($lit25) = $got " +
          s"(bits ${java.lang.Double.doubleToLongBits(got)}, want $wantBits)")
    }
  }
}
