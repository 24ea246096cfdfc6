package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the events table.
  *
  * The declared query runs the real streaming engine (FileStreamSource ->
  * windowed stateful aggregation -> memory sink) with Trigger.AvailableNow,
  * so a bounded run is reproducible and oracle-comparable against the batch
  * equivalent; on a cluster the same pipeline with a kafka source, a
  * watermark, and append mode is the intended deployment (watermarked
  * variants are exercised in StreamingSpec with a controllable source).
  */
object EventsStreaming {

  /** Raw events schema as stored (ts = TIMESTAMP(NANOS), surfaced as long
    * nanos under the legacy conf — see graft.Engine.events).
    */
  val rawSchema: StructType = StructType.fromDDL(
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")

  /** Hourly tumbling-window counts/sums per event_type, computed by the
    * streaming engine. Output matches the batch q25 shape:
    * (hour_epoch, event_type, n, value_cents).
    */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FileStreamSource wants a directory; select just the events file out
    // of the shared testdata dir with a glob filter.
    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
    val name = "graft_stream_hourly"
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    spark.table(name)
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("value_cents"))
      .orderBy("hour_epoch", "event_type")
  }
}
