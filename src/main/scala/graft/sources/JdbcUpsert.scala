package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S5: batched keyed **upsert** into a JDBC table — the reference's
  * `REPLACE INTO … executemany` loop (MySQL_Data_Loading.ipynb:515-527).
  * Spark's JDBC sink has no upsert mode, so this writes per partition with
  * batched statements (SURVEY §2.1 S5 option b).
  *
  * Scale design: input is first deduplicated to one row per key
  * (deterministic last-write-wins via a total ordering), then each
  * partition opens one connection and flushes `batchSize` rows per
  * executeBatch — the executor→DB fan-in is `numPartitions` connections,
  * controlled by the caller via `df.repartition(n)`. Upserts are idempotent:
  * re-running the same batch leaves the table unchanged.
  */
object JdbcUpsert {

  sealed trait Dialect {
    /** Full upsert statement with `?` placeholders for `cols`. */
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String
    /** Order in which row values bind to the statement's `?` slots, as
      * indices into `cols`. Default: one placeholder per column, in column
      * order. Dialects whose statement mentions a column more than once
      * (e.g. MERGE with separate UPDATE and INSERT branches) override. */
    def bindOrder(cols: Seq[String], keyCols: Seq[String]): Seq[Int] = cols.indices
  }

  /** MySQL `REPLACE INTO` — delete-then-insert keyed overwrite, exactly the
    * reference's semantics. */
  case object MySqlReplace extends Dialect {
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String =
      s"REPLACE INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
  }

  /** ANSI MERGE (Derby, and standard SQL:2003 engines). */
  case object AnsiMerge extends Dialect {
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
      val valueAlias = cols.mkString(", ")
      val on = keyCols.map(k => s"t.$k = v.$k").mkString(" AND ")
      val nonKey = cols.filterNot(keyCols.contains)
      val setClause = nonKey.map(c => s"t.$c = v.$c").mkString(", ")
      val insertCols = cols.mkString(", ")
      val insertVals = cols.map(c => s"v.$c").mkString(", ")
      val update = if (nonKey.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause " else ""
      s"""MERGE INTO $table t
         |USING (VALUES (${cols.map(_ => "?").mkString(", ")})) AS v($valueAlias)
         |ON $on
         |${update}WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
    }
  }

  /** Derby-style MERGE keyed on the target row itself (Derby's MERGE source
    * must be a base table, so the single-row `SYSIBM.SYSDUMMY1` + dynamic
    * parameters pattern is used; placeholders appear key-cols, non-key-cols,
    * then all cols for the INSERT branch). */
  case object DerbyMerge extends Dialect {
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
      val on = keyCols.map(k => s"t.$k = ?").mkString(" AND ")
      val nonKey = cols.filterNot(keyCols.contains)
      val update =
        if (nonKey.isEmpty) ""
        else s"WHEN MATCHED THEN UPDATE SET ${nonKey.map(c => s"$c = ?").mkString(", ")} "
      s"""MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON $on
         |${update}WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    }
    override def bindOrder(cols: Seq[String], keyCols: Seq[String]): Seq[Int] = {
      val keyIdx = keyCols.map(cols.indexOf)
      val nonKeyIdx = cols.indices.filterNot(keyIdx.contains)
      keyIdx ++ nonKeyIdx ++ cols.indices
    }
  }

  /** Derby MERGE with a **version guard**: an existing row is updated only
    * when the incoming `versionCol` is strictly newer (`t.$versionCol < ?`).
    * This closes the cross-batch contract boundary documented on
    * [[graft.streaming.EventStreams.upsertSink]]: with an unconditional
    * MERGE, a source that delivers an older version in a LATER micro-batch
    * regresses the key; the guard makes the end state the true
    * max-version row per key regardless of batch arrival order — and
    * makes batch replay (same versions) a no-op. `versionCol` must be a
    * non-key column with a total order (e.g. epoch micros). */
  final case class DerbyMergeVersioned(versionCol: String) extends Dialect {
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
      require(cols.contains(versionCol) && !keyCols.contains(versionCol),
        s"versionCol $versionCol must be a non-key column of $cols")
      val on = keyCols.map(k => s"t.$k = ?").mkString(" AND ")
      val nonKey = cols.filterNot(keyCols.contains)
      s"""MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON $on
         |WHEN MATCHED AND t.$versionCol < ? THEN UPDATE SET ${nonKey.map(c => s"$c = ?").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    }
    override def bindOrder(cols: Seq[String], keyCols: Seq[String]): Seq[Int] = {
      val keyIdx = keyCols.map(cols.indexOf)
      val nonKeyIdx = cols.indices.filterNot(keyIdx.contains)
      (keyIdx :+ cols.indexOf(versionCol)) ++ nonKeyIdx ++ cols.indices
    }
  }

  /** Dedup to one row per key: deterministic last-write-wins ordered by
    * `versionCols` (ties broken by all remaining columns, so the outcome is
    * partitioning-independent). */
  def dedupLastWins(df: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(keyCols.contains).map(col).toIndexedSeq
    val order = (versionCols.map(c => col(c).desc) ++ others.map(_.desc)).toIndexedSeq
    val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      dialect: Dialect, batchSize: Int = 500,
      props: Map[String, String] = Map.empty): Unit = {
    val cols = df.columns.toSeq
    val sql = dialect.upsertSql(table, cols, keyCols)
    val binds = dialect.bindOrder(cols, keyCols).toArray
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = {
          val p = new java.util.Properties()
          props.foreach { case (k, v) => p.setProperty(k, v) }
          DriverManager.getConnection(url, p)
        }
        conn.setAutoCommit(false)
        try {
          val stmt: PreparedStatement = conn.prepareStatement(sql)
          var inBatch = 0
          rows.foreach { row =>
            binds.indices.foreach { slot =>
              // NaN -> NULL scrub, like the reference's per-value isnan
              // check (MySQL_Data_Loading.ipynb:522-524)
              val v = row.get(binds(slot)) match {
                case d: java.lang.Double if d.isNaN => null
                case f: java.lang.Float if f.isNaN => null
                case other => other
              }
              if (v == null) stmt.setObject(slot + 1, null)
              else stmt.setObject(slot + 1, v)
            }
            stmt.addBatch()
            inBatch += 1
            if (inBatch >= batchSize) { stmt.executeBatch(); inBatch = 0 }
          }
          if (inBatch > 0) stmt.executeBatch()
          conn.commit()
          stmt.close()
        } catch {
          case t: Throwable =>
            // roll the open transaction back before close: Derby (and
            // other embedded engines) refuse to close a connection with
            // an active transaction, and that close() error would MASK
            // the real failure (first seen when a MERGE hit a NULL key
            // mid-batch — the task retry loop then reported the close
            // error instead of the constraint violation)
            try conn.rollback() catch { case _: Exception => () }
            throw t
        } finally {
          conn.close()
        }
      }
    }
  }
}
