package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental view maintenance over CDC-out: keep a grouped sum/count
 * aggregate current from a base aggregate plus the pre/post-image change
 * frame of [[IceLiteTable.changesBetween]] (includeBefore = true) — the
 * standard retraction algebra (insert adds the post-image, delete retracts
 * the pre-image, update does both; a group change moves weight between
 * groups). Cost is O(base + changes) with ONE hash aggregation — never a
 * rescan of the table, which is the point at 10^10 rows.
 */
object Maintain {

  /** Maintain `SELECT group, sum(value) AS sum_<value>, count(*) AS n`:
    * `base` must carry (`group`, `sum_<value>`, `n`) — e.g. the same
    * aggregate computed once over `readVersion(fromV)` — and `changes` must
    * carry pre/post images. Groups whose count reaches zero disappear,
    * matching the from-scratch aggregate. */
  def sumCount(base: DataFrame, changes: DataFrame,
               group: String, value: String): DataFrame = {
    val sumCol = s"sum_$value"
    val add = changes.filter(col("change_op") =!= "delete")
      .select(col(group).as("__g"), col(value).cast("long").as("__dv"), lit(1L).as("__dn"))
    val retract = changes.filter(col("change_op") =!= "insert")
      .select(col(s"before_$group").as("__g"),
        (-col(s"before_$value").cast("long")).as("__dv"), lit(-1L).as("__dn"))
    val baseRows = base.select(
      col(group).as("__g"), col(sumCol).cast("long").as("__dv"), col("n").as("__dn"))
    baseRows.unionByName(add).unionByName(retract)
      .groupBy(col("__g"))
      .agg(sum(col("__dv")).as(sumCol), sum(col("__dn")).as("n"))
      .filter(col("n") > 0)
      .select(col("__g").as(group), col(sumCol), col("n"))
  }
}
