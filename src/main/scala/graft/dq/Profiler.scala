package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiler (reference `src/dq.py:39-79`), batched for scale:
  *
  *  - ONE wide aggregation computes count/nulls/distinct + all
  *    type-specific stats for every column in a single job (the
  *    reference does pandas passes per column over a local sample).
  *  - ONE melt → groupBy → window pass computes top-k value counts for
  *    ALL profiled columns together, instead of one job per column.
  *
  * Two accuracy modes (the 100 TB cliff SURVEY §2.8 flags):
  *
  *  - `exact = true` (default; what [[DqEngine.runChecks]] uses on its
  *    BOUNDED ≤ 200 000-row samples and what the oracle queries pin):
  *    exact interpolated `percentile` and exact `count_distinct`. The
  *    N-column exact distincts make Catalyst Expand-multiply the input
  *    (N+1)× before the shuffle, and exact percentile buffers every
  *    value per partition — both fine at sample scale, both the first
  *    thing to break on a full table.
  *  - `exact = false` ([[profileFull]]): sketch-based
  *    `approx_percentile` (rank error ≤ 1/accuracy of the row count,
  *    so the default 10 000 bounds p50/p95 to ±0.01% of ranks; returns
  *    an actual data value, not an interpolation) and HyperLogLog++
  *    `approx_count_distinct` (relative sd 5% default, exact at small
  *    cardinalities, no Expand — the agg stays a single partial-merge
  *    pass). This is the mode a full-table profile on a cluster should
  *    run; the memory per column is O(accuracy), not O(rows).
  *
  * Pandas-parity semantics (exact mode): nulls are excluded from
  * distinct, stats and top-k (`dropna()` throughout the reference);
  * std is population std (`ddof=0`, `src/dq.py:56`); percentiles are
  * exact with linear interpolation (pandas default = DuckDB
  * `quantile_cont` = Spark `percentile`).
  */
object Profiler {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Full-table profiling entry point: sketch aggregates throughout
    * (see class doc for the error bounds). */
  def profileFull(df: DataFrame, topK: Int = 5,
      accuracy: Int = 10000): Seq[ColumnProfile] =
    profile(df, topK, exact = false, accuracy)

  def profile(df: DataFrame, topK: Int = 5, exact: Boolean = true,
      accuracy: Int = 10000): Seq[ColumnProfile] = {
    val fields = df.schema.fields.toSeq

    def pctl(c: org.apache.spark.sql.Column, p: Double) =
      if (exact) percentile(c, lit(p))
      else approx_percentile(c, lit(p), lit(accuracy))
    def cdist(c: org.apache.spark.sql.Column) =
      if (exact) count_distinct(c) else approx_count_distinct(c)

    def quoted(name: String) = "`" + name.replace("`", "``") + "`"

    // Pass 1: one wide agg — 3 base metrics + type stats per column.
    val aggs = fields.flatMap { f =>
      val c = col(quoted(f.name))
      val base = Seq(
        sum(c.isNull.cast("long")).as(s"nulls__${f.name}"),
        cdist(c).as(s"distinct__${f.name}"))
      val typed = f.dataType match {
        case dt if isNumeric(dt) => Seq(
          min(c).cast("double").as(s"min__${f.name}"),
          max(c).cast("double").as(s"max__${f.name}"),
          // cast: avg/percentile of a DECIMAL column return Decimal,
          // which would CCE on the Double read-back below
          avg(c).cast("double").as(s"mean__${f.name}"),
          stddev_pop(c).as(s"std__${f.name}"),
          pctl(c, 0.5).cast("double").as(s"p50__${f.name}"),
          pctl(c, 0.95).cast("double").as(s"p95__${f.name}"))
        case _: TimestampType => Seq(
          date_format(min(c), "yyyy-MM-dd HH:mm:ss").as(s"tsmin__${f.name}"),
          date_format(max(c), "yyyy-MM-dd HH:mm:ss").as(s"tsmax__${f.name}"))
        case _: StringType => Seq(
          min(length(c)).cast("long").as(s"lmin__${f.name}"),
          max(length(c)).cast("long").as(s"lmax__${f.name}"),
          pctl(length(c), 0.95).cast("double").as(s"lp95__${f.name}"))
        case _ => Nil
      }
      base ++ typed
    }
    val row = df.agg(count(lit(1)).as("n"), aggs: _*).collect()(0)
    val total = row.getAs[Long]("n")
    def opt[T](name: String): Option[T] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        Some(row.getAs[T](name))
      else None

    // Pass 2: top-k for all columns at once via melt (null-excluded).
    val stackExpr = fields.map { f =>
      // escape backslashes BEFORE quotes: with Spark's default
      // escapedStringLiterals=false a raw backslash in a column name
      // either eats the closing quote (ParseException for a schema
      // Spark itself accepts) or decodes to a control char, silently
      // desyncing the groupBy key from f.name
      val lit = f.name.replace("\\", "\\\\").replace("'", "\\'")
      s"'$lit', CAST(${quoted(f.name)} AS STRING)"
    }.mkString(", ")
    val w = Window.partitionBy("column")
      .orderBy(desc("cnt"), col("value"))
    val topRows = df
      .selectExpr(s"stack(${fields.size}, $stackExpr) AS (column, value)")
      .where(col("value").isNotNull)
      .groupBy("column", "value").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .collect()
      .groupBy(_.getAs[String]("column"))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getAs[Int]("rn"))
          .map(r => TopValue(r.getAs[String]("value"), r.getAs[Long]("cnt"))).toSeq
      }

    fields.map { f =>
      ColumnProfile(
        column = f.name,
        count = total,
        nulls = opt[Long](s"nulls__${f.name}").getOrElse(0L),
        distinct = opt[Long](s"distinct__${f.name}").getOrElse(0L),
        numeric =
          if (isNumeric(f.dataType))
            Some(NumericStats(
              opt[Double](s"min__${f.name}").getOrElse(Double.NaN),
              opt[Double](s"max__${f.name}").getOrElse(Double.NaN),
              opt[Double](s"mean__${f.name}").getOrElse(Double.NaN),
              opt[Double](s"std__${f.name}").getOrElse(Double.NaN),
              opt[Double](s"p50__${f.name}").getOrElse(Double.NaN),
              opt[Double](s"p95__${f.name}").getOrElse(Double.NaN)))
          else None,
        timestamp = opt[String](s"tsmin__${f.name}").map(mn =>
          TimestampStats(mn, opt[String](s"tsmax__${f.name}").getOrElse(mn))),
        stringLength = opt[Long](s"lmin__${f.name}").map(mn =>
          StringLengthStats(mn,
            opt[Long](s"lmax__${f.name}").getOrElse(mn),
            opt[Double](s"lp95__${f.name}").getOrElse(mn.toDouble))),
        topValues = topRows.getOrElse(f.name, Nil))
    }
  }
}
