package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the most recent right row
  * strictly before it on the same key. Hive 1.2 has no such operator and a
  * naive theta join (`l.ts > r.ts`) explodes quadratically; DuckDB ships it
  * as ASOF JOIN (which is exactly what the oracle uses).
  *
  * Implementation is the union + ordered-window trick (SURVEY §2.3): tag
  * both sides, union, and carry the latest right payload forward with
  * `last(..., ignoreNulls)` over a (key, time)-ordered window. Left rows
  * sort BEFORE right rows at equal timestamps, so "strictly before"
  * falls out of the sort order.
  *
  * Scale: one shuffle on the key + one windowed scan — linear in
  * |left| + |right|, state bounded by one payload per key. This is the
  * 100 TB formulation of as-of; no range-join blowup.
  */
object AsOf {

  /** @param left      rows to annotate
    * @param right     rows providing the as-of payload
    * @param key       equi-join key column name (both sides)
    * @param tsCol     event-time column name (both sides)
    * @param payloads  right-side columns to carry (emitted as prior_<name>)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payloads: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val leftCols = left.columns
    // payloads travel wrapped in a single-field struct: the STRUCT is
    // non-null exactly on right rows, so last(ignoreNulls) below finds the
    // latest prior right ROW even when its payload value is legitimately
    // NULL — same semantics as the native AsOfJoinExec
    val lTagged = left
      .withColumn("__is_left", lit(1))
      .withColumns(payloads.map(p => s"__p_$p" -> lit(null)).toMap)
    val rTagged = right
      .select((Seq(col(key), col(tsCol)) ++
        payloads.map(p => struct(col(p).as("v")).as(s"__p_$p"))): _*)
      .withColumn("__is_left", lit(0))
    val unioned = lTagged.select(
      (Seq(col(key), col(tsCol), col("__is_left")) ++
        payloads.map(p => col(s"__p_$p")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col)): _*)
      .unionByName(rTagged, allowMissingColumns = true)
    // left (__is_left=1) sorts before right (0) at equal ts via descending
    // tag order → a left row never sees a same-timestamp right row; the
    // payload structs break remaining right-side (key, ts) ties so "latest
    // wins" is deterministic (max payload, same rule as AsOfJoinExec)
    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col(tsCol).asc, col("__is_left").desc) ++
        payloads.map(p => col(s"__p_$p").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val annotated = payloads.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"prior_$p",
        last(col(s"__p_$p"), ignoreNulls = true).over(w).getField("v"))
    }
    annotated.filter(col("__is_left") === 1)
      .select((leftCols.map(col) ++ payloads.map(p => col(s"prior_$p"))): _*)
  }
}
