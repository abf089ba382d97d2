package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks entirely (SURVEY §2.2
  * "Joins: absent") but a production analytics engine needs; both are
  * built by composing existing Spark operators (preference (a) of the
  * custom-operator ladder) so they stay inside whole-stage codegen and
  * Catalyst keeps optimizing around them.
  *
  * Scale posture (100 TB):
  *
  *   - [[asofJoin]] — the naive spelling is a per-row correlated
  *     subquery (O(n·m) nested loop, unusable at scale). This spelling
  *     is union-tag → ONE hash shuffle on the equi-keys → one sort by
  *     (key, time, side) → a running `last(ignoreNulls)` window. Cost
  *     is a single exchange + sort of left+right combined, the same
  *     plan shape a dedicated AsofJoinExec would produce; skew is
  *     bounded by per-key event counts, not pair counts.
  *   - [[rangeJoin]] — the naive spelling is a BroadcastNestedLoopJoin
  *     on the interval predicate. This spelling buckets time into
  *     `width`-sized cells, equi-joins on (key, bucket) (left rows are
  *     duplicated into the ≤ 1 + ceil(window/width) buckets their
  *     interval can touch), then applies the exact residual predicate.
  *     Shuffle volume is O(n · buckets-per-row), pair work is confined
  *     to same-cell candidates — the standard interval-bucketing range
  *     join (what Databricks' range-join hint does).
  */
object Joins {

  /** Backward as-of join: for every left row, attach the single right
    * row with the greatest `rightTime <= leftTime` (strictly earlier
    * with `strict = true`), matching on `keys`. Right payload columns
    * come back null when no prior right row exists (left-outer
    * semantics, like DuckDB's ASOF LEFT JOIN).
    *
    * `tolerance`: optional max staleness in seconds — matches older
    * than `leftTime - tolerance` are nulled out.
    *
    * Requirements: `keys` column names exist on both sides; time
    * columns are timestamps; right (key, time) pairs should be unique
    * for deterministic payloads (true of the `events` fixture).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      strict: Boolean = false,
      tolerance: Option[Double] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // Tag sides and align schemas: left keeps its columns, carries a
    // null payload struct; right contributes only keys + time + the
    // payload struct. At equal times the right row must sort BEFORE
    // the left probe for `<=` semantics (side 0 < side 1); `strict`
    // flips that so a tied right row is not yet visible.
    val payloadStruct = struct(rightPayload.map(col): _*)
    val rightSide = (if (strict) 1 else 0)
    val leftSide = 1 - rightSide

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val rTagged = right
      .withColumn("__payload", payloadStruct)
      .select((keys.map(col) :+ col(rightTime).as("__t") :+ col("__payload")): _*)
      .withColumn("__side", lit(rightSide))
    // align columns for union: left-only columns are null on right rows
    val union = lTagged.select(
      (leftCols.map(col) ++ Seq(col("__t"), col("__side"), col("__payload"))): _*)
      .unionByName(
        rTagged.select(
          (leftCols.map(c =>
            if (keys.contains(c)) col(c)
            else lit(null).cast(left.schema(c).dataType).as(c)) ++
            Seq(col("__t"), col("__side"), col("__payload"))): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = union
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .withColumn("__matchTime", last(
        when(col("__side") === rightSide, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)

    val withinTol = tolerance match {
      case Some(secs) =>
        matched.withColumn("__ok",
          col("__matchTime").isNotNull &&
            (unix_micros(col("__t")) - unix_micros(col("__matchTime"))) <=
              (secs * 1e6).toLong)
      case None => matched.withColumn("__ok", col("__matchTime").isNotNull)
    }
    val out = rightPayload.foldLeft(
      withinTol.withColumn("matched_time",
        when(col("__ok"), col("__matchTime")))) {
      case (df, p) => df.withColumn(p, when(col("__ok"), col(s"__match.$p")))
    }
    out.select((leftCols.map(col) :+ col("matched_time")) ++
      rightPayload.map(col): _*)
  }

  /** Interval range join: pairs (l, r) matching on `keys` with
    * `rightTime` in `[leftTime + lowerSec, leftTime + upperSec]`
    * (seconds, inclusive). Implemented as a bucketed equi-join: left
    * rows explode into every `width`-second cell their window can
    * touch, right rows land in their own cell, join on (keys, cell),
    * exact predicate applied as a residual filter. `width` defaults to
    * the window span so each left row lands in ≤ 2 cells.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      lowerSec: Double,
      upperSec: Double,
      widthSec: Option[Double] = None): DataFrame = {
    require(upperSec >= lowerSec, "upperSec must be >= lowerSec")
    val loMicros = math.round(lowerSec * 1e6)
    val hiMicros = math.round(upperSec * 1e6)
    val wMicros = widthSec.map(w => math.max((w * 1e6).toLong, 1L))
      .getOrElse(math.max(hiMicros - loMicros, 1L))
    // all cell math in integer microseconds — no interval parsing, no
    // float drift at epoch scale
    def cellOf(micros: Column): Column = floor(micros / wMicros).cast("long")

    val l = left.withColumn("__cell",
      explode(sequence(
        cellOf(unix_micros(col(leftTime)) + loMicros),
        cellOf(unix_micros(col(leftTime)) + hiMicros))))
    val r = right.withColumn("__cell", cellOf(unix_micros(col(rightTime))))

    val joinCond = (keys.map(k => l(k) === r(k)) :+ (l("__cell") === r("__cell")))
      .reduce(_ && _)
    val dtMicros = unix_micros(r(rightTime)) - unix_micros(l(leftTime))
    l.join(r, joinCond)
      .filter(dtMicros >= loMicros && dtMicros <= hiMicros)
      .drop(l("__cell")).drop(r("__cell"))
      .drop(keys.map(r(_)).head, keys.map(r(_)).tail: _*)
  }
}
