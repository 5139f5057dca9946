package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling counts == batch tumbling counts (AvailableNow)") {
    val events = Util.table(spark, "/root/testdata/sf0.001", "events")
    // stage a micros-typed copy: Structured Streaming's parquet source hits
    // the same TIMESTAMP(NANOS) rejection as batch, so a real deployment
    // would stream from micros-typed files
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(dir)
    val batch = EventsStream.tumblingCounts(events, "1 day")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val stream = EventsStream.streamingTumblingCounts(spark, dir, "1 day")
    val q = stream.writeStream
      .format("memory").queryName("graft_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("graft_stream_test")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
  }

  test("mapGroupsWithState running totals == plain groupBy in batch") {
    val events = Util.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.UserEvent]
    val stateful = EventsStream.userRunningTotals(events)
      .collect().map(s => (s.user_id, s.n_events)).toMap
    val plain = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stateful === plain)
  }
}
