package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark has no inequality-join strategy: `points JOIN intervals ON t >= lo
  * AND t < hi` plans as BroadcastNestedLoopJoin (or a cartesian product) —
  * an O(points × intervals) scan that works only while one side is tiny.
  * The engines that special-case this (DuckDB's IEJoin) sort both sides;
  * the distributed equivalent is BUCKETIZATION: pick a bucket width, land
  * each point in exactly ONE bucket (`floor(t / width)`), replicate each
  * interval to every bucket it covers, and equi-join on the bucket with the
  * residual range predicate. Each matching pair meets in exactly one bucket
  * (the point's), so no dedup pass is needed; the join is a plain shuffled
  * equi-join Catalyst and AQE already know how to size, skew-split, or
  * broadcast.
  *
  * Cost model: replication factor = interval span / width. Pick the width
  * near the TYPICAL interval length — replication stays O(1) per interval
  * and the bucket key spreads points uniformly at any corpus size. A
  * pathological interval (span > `maxSpanBuckets` buckets) THROWS rather
  * than silently fanning out (the degenerate-interval trap: one
  * "1970..2100" row would replicate to millions of buckets); route such
  * outliers to a small broadcast side instead.
  *
  * Semantics: half-open `[lo, hi)` on integer (epoch-second-style) longs;
  * empty and inverted intervals match nothing.
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, tCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, maxSpanBuckets: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val t = col(tCol).cast("long")
    val lo = col(loCol).cast("long")
    val hi = col(hiCol).cast("long")
    val w = lit(bucketWidth)
    // floor-division buckets (epochs are non-negative in practice, but
    // floor() keeps negative timestamps correct too, unlike integer `/`).
    def bucketOf(c: Column): Column = floor(c / w).cast("long")
    val p = points.withColumn("__bucket", bucketOf(t))
    val span = bucketOf(hi - 1) - bucketOf(lo) + 1
    val iv = intervals
      .withColumn("__span_ok",
        when(hi <= lo, lit(true))
          .when(span <= maxSpanBuckets, lit(true))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval spans more than $maxSpanBuckets " +
              s"buckets of width $bucketWidth ([") , lo, lit(", "), hi,
            lit(")) — widen bucketWidth or broadcast degenerate intervals " +
              "separately")))))
      .withColumn("__bucket",
        explode(when(hi > lo && col("__span_ok"),
          sequence(bucketOf(lo), bucketOf(hi - 1)))
          .otherwise(array().cast("array<long>"))))
      .drop("__span_ok")
    p.join(iv, p("__bucket") === iv("__bucket") && t >= lo && t < hi)
      .drop("__bucket")
  }
}
