package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the most recent right row with
  * `rightTime < leftTime` (strict) sharing the partition keys.
  *
  * Spark has no built-in as-of join; the idiomatic scale-out formulation is
  * union + ordered window rather than a per-row correlated subquery or a
  * range cross-join: tag both inputs, union them, and take
  * `last(right_payload, ignoreNulls)` over a window ordered by
  * (time, side) within the keys. One shuffle on the keys, linear scan per
  * partition — at 100 TB this is a single sort-shuffle, versus a quadratic
  * range join. Time-skewed keys are handled by AQE skew splitting.
  */
object AsOfJoin {

  /** @param left      rows to annotate
    * @param right     rows to look up as-of
    * @param keys      equality keys present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param valueCols columns from `right` to carry (suffixed `_asof`)
    * @param strict    if true (default) right rows at exactly leftTime are
    *                  excluded (`<`); else included (`<=`)
    * @param toleranceSeconds optional max staleness: a match further than
    *                  this many seconds before leftTime yields null (the
    *                  pandas merge_asof `tolerance` semantics); evaluated
    *                  post-window, so the plan shape is unchanged
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, valueCols: Seq[String],
               strict: Boolean = true,
               toleranceSeconds: Option[Double] = None): DataFrame = {
    val keyCols = keys.map(col)
    // side ordering at equal timestamps decides strict vs inclusive:
    // strict  → left sorts before right (right at same t not yet visible)
    // inclusive → right sorts first
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__r", lit(null).cast(
        right.select(struct((valueCols.map(col) :+ col(rightTime).as("__rt")): _*))
          .schema.head.dataType))
    val rTagged = right
      .select((keyCols :+ col(rightTime).as("__t")) :+
        struct((valueCols.map(col) :+ col(rightTime).as("__rt")): _*).as("__r"): _*)
      .withColumn("__side", lit(rightSide))

    val unioned = lTagged.select(
        (left.columns.toSeq.map(col) ++ Seq(col("__t"), col("__side"), col("__r"))): _*)
      .unionByName(
        rTagged.select(
          (keyCols ++ left.columns.filterNot(keys.contains).map(c => lit(null).cast(
            left.schema(c).dataType).as(c)) ++ Seq(col("__t"), col("__side"), col("__r"))): _*),
        allowMissingColumns = false)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val annotated = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide && col("__t").isNotNull)

    val within = toleranceSeconds.map(tol =>
      (col("__t").cast("double") -
        col("__asof").getField("__rt").cast("double")) <= tol).getOrElse(lit(true))
    val carried = valueCols.map(c =>
      when(within, col("__asof").getField(c)).as(s"${c}_asof"))
    annotated.select(left.columns.toSeq.map(col) ++ carried: _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTime > leftTime` (strict) sharing the keys — the mirror of
    * [[backward]], realized by ordering the union descending so "last seen"
    * walking the partition is the nearest future right row. Same one-
    * shuffle cost profile.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String, valueCols: Seq[String],
              strict: Boolean = true,
              toleranceSeconds: Option[Double] = None): DataFrame = {
    val keyCols = keys.map(col)
    // descending time: at equal timestamps a strict forward join must not
    // see right rows, so they sort after left rows in the descending order.
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__r", lit(null).cast(
        right.select(struct((valueCols.map(col) :+ col(rightTime).as("__rt")): _*))
          .schema.head.dataType))
    val rTagged = right
      .select((keyCols :+ col(rightTime).as("__t")) :+
        struct((valueCols.map(col) :+ col(rightTime).as("__rt")): _*).as("__r"): _*)
      .withColumn("__side", lit(rightSide))

    val unioned = lTagged.select(
        (left.columns.toSeq.map(col) ++ Seq(col("__t"), col("__side"), col("__r"))): _*)
      .unionByName(
        rTagged.select(
          (keyCols ++ left.columns.filterNot(keys.contains).map(c => lit(null).cast(
            left.schema(c).dataType).as(c)) ++ Seq(col("__t"), col("__side"), col("__r"))): _*),
        allowMissingColumns = false)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val annotated = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide && col("__t").isNotNull)

    val within = toleranceSeconds.map(tol =>
      (col("__asof").getField("__rt").cast("double") -
        col("__t").cast("double")) <= tol).getOrElse(lit(true))
    val carried = valueCols.map(c =>
      when(within, col("__asof").getField(c)).as(s"${c}_asof"))
    annotated.select(left.columns.toSeq.map(col) ++ carried: _*)
  }
}
