package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the lake-layout primitive
  * behind multi-column data skipping (Delta/Iceberg OPTIMIZE ZORDER BY;
  * Morton 1966, public). Sorting by one column makes its min/max file
  * stats tight and every other column's useless; interleaving the BITS
  * of two quantized columns gives a curve where ranges of BOTH columns
  * map to contiguous curve segments, so per-file footer stats stay tight
  * on both and a 100 TB scan with predicates on either column prunes
  * most files (the parquet_metadata row-group view is exactly the
  * stats a reader consults).
  *
  * Everything here is EXACT integer arithmetic — quantization is
  * `floor((x - min) * (2^bits - 1) / (max - min))` carried out in Long
  * multiply-then-divide (no float rounding to diverge on), and the
  * interleave is a fold of shift/mask terms — so a SQL engine
  * recomputes z-values bit-for-bit (the declared lane's oracle does).
  */
object ZOrder {

  /** Quantize `x` (already integral) into `bits`-bit buckets over
    * [minV, maxV] with pure Long arithmetic. Degenerate range → 0.
    */
  def quantize(x: Column, minV: Long, maxV: Long, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    if (maxV <= minV) lit(0L)
    else {
      // Both (x - min) and (max - min) can leave Long for ranges wider
      // than 2^63 — widen EVERYTHING to decimal(38,0) before any
      // arithmetic (Spark's decimal→long cast ROUNDS, so the floor is
      // explicit; the numerator is non-negative, so floor == the Long
      // integer division wherever Long doesn't overflow and SQL oracles
      // recompute it bit-for-bit).
      val range = new java.math.BigDecimal((BigInt(maxV) - BigInt(minV)).bigInteger)
      floor((x.cast("decimal(38,0)") - lit(minV)) * lit(buckets) / lit(range))
        .cast("long")
    }
  }

  /** Morton interleave of two `bits`-bit quantized values: bit i of `qx`
    * lands at position 2i, of `qy` at 2i+1.
    */
  def interleave(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_)).cast("long")

  /** The z-value column for two integral columns under fixed bounds. */
  def zValue(x: Column, y: Column, minX: Long, maxX: Long,
      minY: Long, maxY: Long, bits: Int = 8): Column =
    interleave(quantize(x, minX, maxX, bits), quantize(y, minY, maxY, bits),
      bits)

  /** Cluster `df` on the Morton curve of (xCol, yCol): bounds from one
    * exact min/max pass, range-partition + in-partition sort by z-value
    * — ONE shuffle, the write-path shape (each output task then writes
    * one curve segment, so every file's footer stats are tight on BOTH
    * columns). Returns the clustered frame with the `z` column attached.
    */
  def cluster(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8, partitions: Int = 0): DataFrame = {
    val b = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    // Empty or all-null input has no bounds: every row (there may be
    // null-keyed rows even when the frame isn't empty) lands on z = 0.
    if (b.isNullAt(0) || b.isNullAt(2))
      return df.withColumn("z", lit(0L))
    val z = zValue(col(xCol), col(yCol), b.getLong(0), b.getLong(1),
      b.getLong(2), b.getLong(3), bits)
    val out = df.withColumn("z", z)
    val parts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    out.repartitionByRange(parts, col("z")).sortWithinPartitions("z")
  }
}
