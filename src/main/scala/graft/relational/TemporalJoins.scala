package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — the two temporal join shapes Spark's join
  * zoo lacks natively (the reference's alert feeds express both as
  * date-window SQL the warehouse executes, e.g. the date-range filters
  * of `app/routes/datasets/queries.py` / `features.py:131-137`;
  * GROUPED here into reusable operators).
  *
  * Both are built from existing Catalyst operators (window + union for
  * as-of, bucketized equi-join for range) rather than a custom
  * `SparkPlan` — the composed plans already give the asymptotically
  * right shuffle shape, so a bespoke physical operator would buy
  * nothing but bypass AQE.
  */
object TemporalJoins {

  /** Strict as-of join: for every left row, attach the single right
    * row with the greatest `asof_t` strictly less than the left row's
    * `asof_t` within the same `asof_key` (ties on `asof_t` broken by
    * greatest `asof_tb`). Unmatched left rows keep a null match
    * (left-outer semantics).
    *
    * Contract: `left` carries `asof_key`, `asof_t` (monotone long,
    * e.g. epoch micros) plus any payload columns; `right` carries
    * `asof_key`, `asof_t`, `asof_tb` (unique tiebreak) and
    * `asof_payload` (a struct of the columns to attach). Returns the
    * left columns plus `asof_match` (nullable struct).
    *
    * Shape — this is deliberately NOT a range join: both sides union
    * into one stream, shuffled ONCE on `asof_key`, and a running
    * `last(_, ignoreNulls)` window carries the latest right payload
    * forward to each left row. Cost is one shuffle + one per-key sort,
    * linear in |left|+|right| at any scale; the naive formulation
    * (join on key with a `<` predicate, then argmax per left row)
    * shuffles the same data but materializes every (left, preceding
    * right) pair first — quadratic per key. Strictness falls out of
    * the sort order: left rows tag 0 sort BEFORE right rows tag 1 at
    * equal `asof_t`, so a same-instant right row is invisible to the
    * left row's frame. Skewed keys: the window is a per-key scan, so
    * a single hot key serializes; the standard mitigation (time-slice
    * the key range and carry the slice-boundary payload forward) is a
    * planner-level rewrite left to the caller because no fixture or
    * probe has produced a key hot enough to need it.
    */
  def asofStrict(left: DataFrame, right: DataFrame): DataFrame = {
    val payloadType = right.schema("asof_payload").dataType
    val l = left
      .withColumn("asof_tag", lit(0))
      .withColumn("asof_tb", lit(null).cast("long"))
      .withColumn("asof_payload", lit(null).cast(payloadType))
    val r = right.withColumn("asof_tag", lit(1))
    val w = Window
      .partitionBy("asof_key")
      .orderBy(col("asof_t").asc, col("asof_tag").asc, col("asof_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof_match", last(col("asof_payload"), ignoreNulls = true).over(w))
      .where(col("asof_tag") === 0)
      .drop("asof_tag", "asof_tb", "asof_payload")
  }

  /** Bucketized range (interval containment) join: every point row
    * (`rj_t` + payload) against every interval row (`rj_lo`
    * inclusive, `rj_hi` exclusive + payload) with
    * `rj_lo <= rj_t < rj_hi`.
    *
    * Shape: intervals explode to the coarse time buckets they cover
    * (`sequence(lo div b, (hi-1) div b)` — fan-out is bounded by
    * interval span / bucket width, a constant chosen per workload),
    * points compute their single bucket, and the containment check
    * rides an EQUI-join on the bucket key — one shuffle, hash join,
    * AQE-eligible. The naive `ON t BETWEEN lo AND hi` plan is a
    * BroadcastNestedLoopJoin: fine when one side is tiny (g8's grid
    * join uses exactly that), quadratic when both sides scale. Each
    * matching (interval, point) pair joins in exactly ONE bucket (the
    * point's own), so no post-join dedup is needed.
    */
  def bucketRangeJoin(points: DataFrame, intervals: DataFrame,
                      bucketUs: Long): DataFrame = {
    // FLOOR division, not `div`: Spark's `div` truncates toward zero
    // while the natural bucket function floors, so a pre-epoch
    // (negative) timestamp would land one bucket high and miss its
    // intervals; `(x - pmod(x, b)) div b` floors for any sign. And
    // empty/inverted intervals (rj_hi <= rj_lo) are dropped BEFORE the
    // explode: Spark's `sequence(lo, hi)` with lo > hi generates a
    // DESCENDING sequence, so one bad interval row (hi ≪ lo) would
    // fan out to an unbounded bucket range — the containment predicate
    // filters the junk pairs but only after paying the blow-up.
    def fdiv(x: String): String =
      s"($x - pmod($x, $bucketUs)) div $bucketUs"
    val bI = intervals.where(expr("rj_hi > rj_lo")).withColumn(
      "rj_bkt", explode(expr(s"sequence(${fdiv("rj_lo")}, ${fdiv("(rj_hi - 1)")})")))
    val bP = points.withColumn("rj_bkt", expr(fdiv("rj_t")))
    bP.join(bI, bP("rj_bkt") === bI("rj_bkt") &&
        bP("rj_t") >= bI("rj_lo") && bP("rj_t") < bI("rj_hi"))
      .drop("rj_bkt")
  }
}
