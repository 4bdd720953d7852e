package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration 2-D Lloyd k-means, deterministic end to end — the
  * clustering baseline (quantization grids, segment discovery) built the
  * way a 100 TB engine has to build it: each round is ONE scan
  * (assignment against a BROADCAST k-row centroid frame + conditional
  * exact-decimal aggregation for the update); no sampling, no RNG.
  *
  * Everything that could wobble is pinned:
  *  - init is a deterministic grid (centroid j at the (j+½)/k point of
  *    each dimension's [min,max] span) — not random restarts;
  *  - assignment breaks distance ties toward the SMALLEST cluster id
  *    (least() then a first-match CASE chain, identical both engines);
  *  - updates aggregate coordinates as exact decimals, and the new
  *    mean's division is the only float — a fixed-shape expression
  *    snapped at 6, so centroids are bit-identical cross-engine;
  *  - an EMPTIED cluster keeps its previous centroid (guarded
  *    coalesce) instead of poisoning the next round with NULL;
  *  - per-point distances feeding WCSS are snapped at 6 into an exact
  *    decimal sum (davg convention).
  *
  * The centroid frame is one row of 2k scalars, localCheckpoint'ed per
  * round (the PCA lesson: stop projection collapse from snowballing the
  * scalar tree).
  */
object KMeans {

  /** Returns (cluster, n_points, cx, cy, wcss) after `iters` Lloyd
    * rounds of k clusters on (`xCol`, `yCol`); NULL coordinate rows are
    * excluded. */
  def fit2d(df: DataFrame, xCol: String, yCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k >= 2 && k <= 16, s"k must be in [2,16], got $k")
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val bounds = pts.agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    var cent = bounds.select(
      (0 until k).flatMap { j =>
        val f = lit((2 * j + 1).toDouble) / lit((2 * k).toDouble)
        Seq((col("xmin") + f * (col("xmax") - col("xmin"))).as(s"cx_$j"),
          (col("ymin") + f * (col("ymax") - col("ymin"))).as(s"cy_$j"))
      }: _*)
      .localCheckpoint(true)

    def assign(c: DataFrame): DataFrame = {
      var a = pts.crossJoin(broadcast(c))
      (0 until k).foreach { j =>
        a = a.withColumn(s"d_$j",
          (col("x") - col(s"cx_$j")) * (col("x") - col(s"cx_$j"))
            + (col("y") - col(s"cy_$j")) * (col("y") - col(s"cy_$j")))
      }
      a = a.withColumn("dmin", least((0 until k).map(j => col(s"d_$j")): _*))
      // first-match CASE chain -> distance ties go to the smallest id
      val cl = (0 until k).reverse.foldLeft(lit(null).cast("int")) {
        (acc, j) => when(col(s"d_$j") === col("dmin"), lit(j)).otherwise(acc)
      }
      a.withColumn("cluster", cl)
    }

    var t = 0
    while (t < iters) {
      val a = assign(cent)
      val aggsU = (0 until k).flatMap { j =>
        val in = col("cluster") === j
        Seq(count(when(in, lit(1))).as(s"n_$j"),
          sum(when(in, col("x").cast("decimal(18,6)"))).as(s"sx_$j"),
          sum(when(in, col("y").cast("decimal(18,6)"))).as(s"sy_$j"))
      }
      val upd = a.agg(aggsU.head, aggsU.tail: _*)
      cent = upd.crossJoin(broadcast(cent)).select(
        (0 until k).flatMap { j =>
          Seq(
            when(col(s"n_$j") > 0, round(col(s"sx_$j").cast("double")
              / col(s"n_$j").cast("double"), 6))
              .otherwise(col(s"cx_$j")).as(s"cx_$j"),
            when(col(s"n_$j") > 0, round(col(s"sy_$j").cast("double")
              / col(s"n_$j").cast("double"), 6))
              .otherwise(col(s"cy_$j")).as(s"cy_$j"))
        }: _*)
        .localCheckpoint(true)
      t += 1
    }

    val fin = assign(cent)
    fin.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        max((0 until k).foldLeft(lit(null).cast("double")) { (acc, j) =>
          when(col("cluster") === j, col(s"cx_$j")).otherwise(acc) }).as("cx"),
        max((0 until k).foldLeft(lit(null).cast("double")) { (acc, j) =>
          when(col("cluster") === j, col(s"cy_$j")).otherwise(acc) }).as("cy"),
        round(sum(round(col("dmin"), 6).cast("decimal(20,6)")), 4)
          .cast("double").as("wcss"))
      .orderBy(col("cluster"))
  }

  /** The elbow sweep as ONE job: fits every k in `ks` simultaneously —
    * per Lloyd round a single scan computes every k's assignments and
    * update moments side by side (the centroid row just carries
    * Σ_k 2k scalars instead of 2k), so the sweep costs |iters|+2 scans
    * TOTAL instead of per k. At 100 TB that is the difference between
    * an elbow diagnostic and |ks| full training runs. Per-k arithmetic
    * is COLUMN-IDENTICAL to [[fit2d]] (same init, same tie-break, same
    * decimal snaps), so results — and the DuckDB oracle built from
    * per-k [[sqlCtes]] — are unchanged.
    *
    * Returns one row per k: (k, n_points, total_wcss), where
    * total_wcss aggregates the per-cluster wcss values exactly as
    * `fit2d(...).agg(sum(wcss cast decimal(24,4)))` does (per-cluster
    * snap at 4 first, then the decimal sum — order-independent). */
  def elbow2d(df: DataFrame, xCol: String, yCol: String, ks: Seq[Int],
      iters: Int): DataFrame = {
    require(ks.nonEmpty && ks.distinct == ks, "ks must be distinct, nonempty")
    ks.foreach(k => require(k >= 2 && k <= 16, s"k must be in [2,16], got $k"))
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val bounds = pts.agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    // one centroid row carrying every k's grid init side by side
    var cent = bounds.select(
      ks.flatMap { k =>
        (0 until k).flatMap { j =>
          val f = lit((2 * j + 1).toDouble) / lit((2 * k).toDouble)
          Seq((col("xmin") + f * (col("xmax") - col("xmin"))).as(s"k${k}_cx_$j"),
            (col("ymin") + f * (col("ymax") - col("ymin"))).as(s"k${k}_cy_$j"))
        }
      }: _*)
      .localCheckpoint(true)

    def assign(c: DataFrame): DataFrame = {
      var a = pts.crossJoin(broadcast(c))
      ks.foreach { k =>
        (0 until k).foreach { j =>
          a = a.withColumn(s"k${k}_d_$j",
            (col("x") - col(s"k${k}_cx_$j")) * (col("x") - col(s"k${k}_cx_$j"))
              + (col("y") - col(s"k${k}_cy_$j")) * (col("y") - col(s"k${k}_cy_$j")))
        }
        a = a.withColumn(s"k${k}_dmin",
          least((0 until k).map(j => col(s"k${k}_d_$j")): _*))
        val cl = (0 until k).reverse.foldLeft(lit(null).cast("int")) {
          (acc, j) =>
            when(col(s"k${k}_d_$j") === col(s"k${k}_dmin"), lit(j)).otherwise(acc)
        }
        a = a.withColumn(s"k${k}_cluster", cl)
      }
      a
    }

    var t = 0
    while (t < iters) {
      val a = assign(cent)
      val aggsU = ks.flatMap { k =>
        (0 until k).flatMap { j =>
          val in = col(s"k${k}_cluster") === j
          Seq(count(when(in, lit(1))).as(s"k${k}_n_$j"),
            sum(when(in, col("x").cast("decimal(18,6)"))).as(s"k${k}_sx_$j"),
            sum(when(in, col("y").cast("decimal(18,6)"))).as(s"k${k}_sy_$j"))
        }
      }
      val upd = a.agg(aggsU.head, aggsU.tail: _*)
      cent = upd.crossJoin(broadcast(cent)).select(
        ks.flatMap { k =>
          (0 until k).flatMap { j =>
            Seq(
              when(col(s"k${k}_n_$j") > 0, round(col(s"k${k}_sx_$j").cast("double")
                / col(s"k${k}_n_$j").cast("double"), 6))
                .otherwise(col(s"k${k}_cx_$j")).as(s"k${k}_cx_$j"),
              when(col(s"k${k}_n_$j") > 0, round(col(s"k${k}_sy_$j").cast("double")
                / col(s"k${k}_n_$j").cast("double"), 6))
                .otherwise(col(s"k${k}_cy_$j")).as(s"k${k}_cy_$j"))
          }
        }: _*)
        .localCheckpoint(true)
      t += 1
    }

    // final pass: every k's per-cluster wcss partials (snap at 4, like
    // fit2d's per-cluster rows) plus the shared point count, in one agg
    val fin = assign(cent)
    val finAggs = count(lit(1)).as("n_points") +: ks.flatMap { k =>
      (0 until k).map { j =>
        round(sum(when(col(s"k${k}_cluster") === j,
          round(col(s"k${k}_dmin"), 6).cast("decimal(20,6)"))), 4)
          .cast("double").as(s"k${k}_wcss_$j")
      }
    }
    val one = fin.agg(finAggs.head, finAggs.tail: _*).localCheckpoint(true)
    ks.map { k =>
      one.select(lit(k).as("k"), col("n_points"),
        round((0 until k).map(j =>
            coalesce(col(s"k${k}_wcss_$j"), lit(0.0)).cast("decimal(24,4)"))
          .reduce(_ + _), 4).cast("double").as("total_wcss"))
    }.reduce(_ unionByName _).orderBy(col("k"))
  }

  /** DuckDB mirror of [[fit2d]] over `tbl`: emits CTEs (prefixed `pfx`, default `km`) ending in `$pfx`
    * (cluster, n_points, cx, cy, wcss). `xSql`/`ySql` are the coordinate
    * expressions. */
  def sqlCtes(tbl: String, xSql: String, ySql: String, k: Int,
      iters: Int, pfx: String = "km"): String = {
    val ks = 0 until k
    val distCols = ks.map { j =>
      s"(p.x - c.cx_$j) * (p.x - c.cx_$j) + (p.y - c.cy_$j) * (p.y - c.cy_$j) AS d_$j"
    }.mkString(",\n          ")
    val dminE = "least(" + ks.map(j => s"d_$j").mkString(", ") + ")"
    val caseE = "CASE " +
      ks.map(j => s"WHEN d_$j = dmin THEN $j").mkString(" ") + " END"
    val sb = new StringBuilder
    sb.append(s"""${pfx}_pts AS (
      SELECT CAST($xSql AS DOUBLE) AS x, CAST($ySql AS DOUBLE) AS y
      FROM $tbl
      WHERE ($xSql) IS NOT NULL AND ($ySql) IS NOT NULL),
    ${pfx}_b AS (
      SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
      FROM ${pfx}_pts),
    ${pfx}_c0 AS MATERIALIZED (
      SELECT ${ks.flatMap { j =>
        val f = s"CAST(${2 * j + 1} AS DOUBLE) / CAST(${2 * k} AS DOUBLE)"
        Seq(s"xmin + $f * (xmax - xmin) AS cx_$j",
          s"ymin + $f * (ymax - ymin) AS cy_$j")
      }.mkString(",\n        ")}
      FROM ${pfx}_b)""")
    for (t <- 1 to iters) {
      sb.append(s""",
    ${pfx}_a$t AS (
      SELECT x, y, dmin, $caseE AS cluster
      FROM (
        SELECT x, y, ${ks.map(j => s"d_$j").mkString(", ")},
          $dminE AS dmin
        FROM (
          SELECT p.x, p.y,
          $distCols
          FROM ${pfx}_pts p CROSS JOIN ${pfx}_c${t - 1} c))),
    ${pfx}_c$t AS MATERIALIZED (
      SELECT ${ks.flatMap { j =>
        Seq(s"""CASE WHEN u.n_$j > 0
            THEN round(CAST(u.sx_$j AS DOUBLE) / CAST(u.n_$j AS DOUBLE), 6)
            ELSE c.cx_$j END AS cx_$j""",
          s"""CASE WHEN u.n_$j > 0
            THEN round(CAST(u.sy_$j AS DOUBLE) / CAST(u.n_$j AS DOUBLE), 6)
            ELSE c.cy_$j END AS cy_$j""")
      }.mkString(",\n        ")}
      FROM (
        SELECT ${ks.flatMap { j =>
        Seq(s"count(CASE WHEN cluster = $j THEN 1 END) AS n_$j",
          s"sum(CASE WHEN cluster = $j THEN CAST(x AS DECIMAL(18,6)) END) AS sx_$j",
          s"sum(CASE WHEN cluster = $j THEN CAST(y AS DECIMAL(18,6)) END) AS sy_$j")
      }.mkString(",\n          ")}
        FROM ${pfx}_a$t) u CROSS JOIN ${pfx}_c${t - 1} c)""")
    }
    sb.append(s""",
    ${pfx}_af AS (
      SELECT x, y, dmin, $caseE AS cluster
      FROM (
        SELECT x, y, ${ks.map(j => s"d_$j").mkString(", ")},
          $dminE AS dmin
        FROM (
          SELECT p.x, p.y,
          $distCols
          FROM ${pfx}_pts p CROSS JOIN ${pfx}_c$iters c))),
    $pfx AS (
      SELECT a.cluster, count(*) AS n_points,
        max(${ks.foldLeft("CAST(NULL AS DOUBLE)") { (acc, j) =>
          s"CASE WHEN a.cluster = $j THEN c.cx_$j ELSE $acc END" }}) AS cx,
        max(${ks.foldLeft("CAST(NULL AS DOUBLE)") { (acc, j) =>
          s"CASE WHEN a.cluster = $j THEN c.cy_$j ELSE $acc END" }}) AS cy,
        CAST(round(sum(CAST(round(a.dmin, 6) AS DECIMAL(20,6))), 4)
          AS DOUBLE) AS wcss
      FROM ${pfx}_af a CROSS JOIN ${pfx}_c$iters c
      GROUP BY 1)""")
    sb.toString
  }
}
