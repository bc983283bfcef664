package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSuite {

  test("streaming ingestion (availableNow) matches the batch windowed agg") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val schema = batch.schema

    // the file-stream source requires a directory
    val streamDir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> event-time type
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ev_agg")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM ev_agg")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val expected = batch
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == expected)
  }

  test("streaming sessionization emits exactly the batch operator's sessions") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val streamDir = java.nio.file.Files.createTempDirectory("events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(batch.schema).parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val sessions = graft.streaming.EventStream.sessionizeStream(
      spark, stream, "user_id", gapSeconds = 1800)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ev_sess")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT k, start_us, end_us, n_events FROM ev_sess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val all = graft.operators.Sessionize
      .summarize(batch, "user_id", "ts", "event_id", gapSeconds = 1800)
      .select(col("user_id").cast("long"), col("start_us"), col("end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // every emitted session is exactly a batch session
    assert(streamed.subsetOf(all), s"extra sessions: ${streamed -- all}")
    // at minimum, every session closed by a later event must have been emitted
    // (the per-key final session may stay open if the final watermark never
    // passes its timeout before AvailableNow stops)
    val lastPerKey = all.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    assert((all -- lastPerKey).subsetOf(streamed),
      s"missing closed sessions: ${(all -- lastPerKey) -- streamed}")
  }

  test("streaming dedup drops duplicate event ids (watermark-bounded state)") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val streamDir = java.nio.file.Files.createTempDirectory("events_dup")
    // write the events TWICE: the stream must emit each event_id once
    batch.write.mode("append").parquet(streamDir.toString)
    batch.write.mode("append").parquet(streamDir.toString)
    val stream = spark.readStream.schema(batch.schema).parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val deduped = graft.streaming.EventStream.dedupStream(stream, "event_id")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ev_dedup")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT count(*), count(DISTINCT event_id) FROM ev_dedup").head()
    val expected = batch.count()
    assert(got.getLong(0) == expected && got.getLong(1) == expected,
      s"got ${got.getLong(0)} rows / ${got.getLong(1)} distinct, want $expected")
  }

  test("mapGroupsWithState running totals accumulate across triggers") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val streamDir = java.nio.file.Files.createTempDirectory("events_state")
    batch.write.mode("append").parquet(streamDir.toString)
    val stream = spark.readStream.schema(batch.schema).parquet(streamDir.toString)
    val totals = graft.streaming.EventStream.runningTotals(spark, stream, "event_type")
    val q = totals.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("ev_totals")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // latest running_total per key == batch counts
    val got = spark.sql(
      """SELECT event_type, max(running_total) FROM ev_totals GROUP BY event_type""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = batch.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
