package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table

/** Relational operator coverage over the driver-generated TPC-H-ish tables.
  *
  * Numeric convention shared with the DuckDB oracle SQL: double-valued
  * aggregates are computed over `DECIMAL(18,2)` casts so sums are exact and
  * independent of partition/accumulation order, then cast back to DOUBLE for
  * the output column. A plain double sum differs between engines in the last
  * ulp depending on add order; decimal arithmetic hash-matches exactly.
  * Averages are expressed as exact decimal sum cast to double, divided by an
  * exact count — one double division with identical operands in both engines.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary. One shuffle keyed on a tiny grouping
    * domain with map-side partial aggregation — at 100 TB the shuffle carries
    * only (#map tasks × #groups) rows. */
  val q1_agg: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1_agg
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
