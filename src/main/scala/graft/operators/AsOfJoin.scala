package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, attach the payload of
  * the single right row with the greatest `rightTs <= leftTs` in the
  * same key group — the trades-to-latest-quote pattern, and the batch
  * analog of a stream-stream temporal join.
  *
  * Implementation is the union-and-carry-forward form, which is the
  * scalable one: tag both inputs, union them, and run ONE window over
  * (keys, ts) carrying the latest right payload forward into each left
  * row. Cost is a single hash shuffle on `keys` plus an in-partition
  * sort — the same shape as any windowed aggregation, and it holds at
  * 100 TB (contrast a range-condition join, which Spark plans as a
  * broadcast-nested-loop or an exploding theta join; or per-left-row
  * subqueries, which never distribute). Hot keys behave like any
  * skewed window partition: AQE splits the shuffle read, and the sort
  * is the only per-key serial cost.
  *
  * Semantics match an `ASOF LEFT JOIN` with `ON keys AND leftTs >=
  * rightTs`: ties on the timestamp are inclusive (a right row AT the
  * left row's timestamp wins — right rows sort before left rows at
  * equal ts), and left rows with no prior right row keep NULL payload
  * columns.
  *
  * The right side must be unique per (keys, rightTs) — pre-aggregate
  * duplicates first (the catalog's q34 does) — otherwise which
  * same-timestamp payload wins is partition-order dependent.
  *
  * Output: every left column (timestamp under its original name) plus
  * every right payload column; right payload names must not collide
  * with left column names.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == leftTs)
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(rightPayload.nonEmpty, "right side has no payload columns")
    val collisions = rightPayload.intersect(left.columns)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")}")

    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftPayload.map(col): _*)
    // a null right timestamp never satisfies `leftTs >= rightTs` in
    // comparison semantics — but it would sort FIRST in the window and
    // act as a universal fallback match, so drop such rows up front.
    // (Null LEFT timestamps also sort first, see no prior right row,
    // and correctly keep null payload.)
    val r = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rightPayload.map(col): _*).as("__r")): _*)

    // right rows (side 0) sort before left rows (side 1) at equal ts,
    // making the as-of inequality inclusive.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++ leftPayload.map(col) ++
          rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
