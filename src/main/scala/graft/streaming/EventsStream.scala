package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly batch (SURVEY.md §2.9), so this module is part
  * of the beyond-parity track: the same tumbling-window aggregation is
  * expressed once for batch (oracle-checkable) and once as a Structured
  * Streaming query (file source → watermark → windowed agg), plus a typed
  * stateful operator via `mapGroupsWithState`.
  */
object EventsStream {

  /** Batch tumbling-window aggregation — identical semantics to the
    * streaming variant below, checkable against a SQL oracle. */
  def tumblingCounts(events: DataFrame, duration: String = "1 day"): DataFrame =
    events
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming variant: parquet file source (schema from a static read),
    * 1-hour watermark, tumbling window. Run with Trigger.AvailableNow for
    * a bounded backfill, or continuously on a live directory. */
  def streamingTumblingCounts(spark: SparkSession, dir: String,
                              duration: String = "1 day"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream
      .schema(schema)
      .parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Per-user sessionization with a gap timeout: Spark's native
    * `session_window` (merges events closer than `gap`; works identically
    * in batch and Structured Streaming, where it becomes stateful with a
    * watermark). Semantics match the classic lag/cumulative-sum
    * sessionization, which is what the SQL oracle replicates. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"))

  /** Streaming exact dedup: drop re-delivered events by id, keeping state
    * only within the watermark horizon (`dropDuplicatesWithinWatermark`),
    * so state size is bounded by the delay window instead of growing with
    * the whole stream — the shape an at-least-once ingest pipeline needs.
    * In batch the same call degenerates to a plain `dropDuplicates`. */
  def streamingDedupById(spark: SparkSession, dir: String,
                         delay: String = "1 hour"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream
      .schema(schema)
      .parquet(dir)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
  }

  /** Watermarked stream-stream interval join: each purchase joined to the
    * same user's clicks at most `horizon` before it. Both sides carry
    * watermarks and the join condition bounds event time on both sides, so
    * Spark can expire buffered state — unbounded-state stream-stream joins
    * never survive production. Append output only (the streaming-join
    * contract). */
  def clickToPurchaseJoin(spark: SparkSession, dir: String,
                          horizon: String = "1 hour",
                          lateness: String = null): DataFrame = {
    // The watermark must cover at least the join horizon: a click inside
    // the horizon of a purchase is a valid match, so expiring it earlier
    // would drop rows the batch twin produces. Callers with late data add
    // slack via `lateness`; it defaults to the horizon itself.
    val delay = Option(lateness).getOrElse(horizon)
    val schema = spark.read.parquet(dir).schema
    def src = spark.readStream.schema(schema).parquet(dir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
  }

  /** Batch reference for `clickToPurchaseJoin` — same predicate as a plain
    * join, for equivalence tests and the oracle. */
  def clickToPurchaseBatch(events: DataFrame, horizon: String = "1 hour")
      : DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
  }

  /** Restartable ingest leg: file source → parquet file sink with a write-
    * ahead checkpoint. The checkpoint records which source files each batch
    * consumed and the sink's _spark_metadata commits atomically, so a
    * crash-and-restart (or the next AvailableNow run) resumes exactly where
    * the last committed batch ended — exactly-once file output without any
    * dedup pass. Returns an UNSTARTED writer, like every builder in this
    * package: callers pick the trigger via `trigger` and call `start()`. */
  def parquetIngest(spark: SparkSession, srcDir: String, outDir: String,
                    checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
  }

  final case class UserEvent(user_id: Long, seq: Long, event_type: String,
                             value: Double)
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  final case class Anomaly(user_id: Long, value: Double, running_mean: Double)

  /** Variable-arity stateful operator: `flatMapGroupsWithState` emits 0..n
    * rows per group — here, the events whose value exceeds `factor` × the
    * user's running mean so far (a simple online anomaly detector). State
    * is the (count, sum) pair per user. */
  def userAnomalies(events: Dataset[UserEvent],
                    factor: Double = 3.0,
                    stateTtlMillis: Option[Long] = None): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), Anomaly](
        OutputMode.Append(), ttlConf(stateTtlMillis)) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) { // inactive past the TTL: drop the state
            state.remove()
            Iterator.empty
          } else {
          var (n, total) = state.getOption.getOrElse((0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer[Anomaly]()
          // the group iterator's order is NOT guaranteed (it follows the
          // shuffle), and a running-mean detector is order-sensitive —
          // sort the batch by the caller-provided sequence so results are
          // deterministic under any partitioning
          it.toArray.sortBy(_.seq).foreach { e =>
            if (n > 0 && e.value > factor * (total / n))
              out += Anomaly(uid, e.value, total / n)
            n += 1; total += e.value
          }
          state.update((n, total))
          stateTtlMillis.foreach(state.setTimeoutDuration)
          out.iterator
          }
      }
  }

  final case class FunnelState(stage: Int, last_seq: Long)
  final case class FunnelProgress(user_id: Long, max_stage: Int)

  /** Streaming funnel-stage tracking: the incremental twin of
    * `graft.ops.Funnel.maxStagePerUser`. State per user is (current stage,
    * last applied sequence number); each micro-batch folds its (sorted)
    * events into the stage exactly like the batch operator's ordered
    * `aggregate` fold, so for any prefix of the stream the emitted stage
    * equals the batch fold over the same events — the parity the spec
    * locks via AvailableNow. Late events (seq below the high-water mark)
    * cannot rewind the stage: a funnel is monotone, so they are skipped
    * rather than reprocessed out of order. Batch parity therefore
    * requires per-user IN-ORDER delivery ACROSS micro-batches (within a
    * batch we sort): if seq 10 arrives in batch N and seq 5 only in
    * batch N+1, the non-matching 10 was already consumed and is never
    * revisited — order by a Kafka key = user_id or run AvailableNow over
    * ordered files to satisfy the precondition. State is two longs per
    * user — horizontal scale is the key partitioning. By default state
    * has NO timeout (right for bounded backfills and the batch-parity
    * contract); on an unbounded churning user population pass
    * `stateTtlMillis` so inactive users are flushed and dropped (see
    * [[ttlConf]]) instead of growing the state store monotonically. */
  def funnelStages(events: Dataset[UserEvent],
                   stages: Seq[String],
                   stateTtlMillis: Option[Long] = None)
      : Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelProgress](
        ttlConf(stateTtlMillis)) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // inactive past the TTL: flush the final stage and forget the
            // user — a later reappearance restarts the funnel at stage 0
            val last = state.get
            state.remove()
            FunnelProgress(uid, last.stage)
          } else {
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            it.toArray.sortBy(_.seq).foreach { e =>
              if (e.seq > st.last_seq && st.stage < stages.size &&
                  e.event_type == stages(st.stage))
                st = FunnelState(st.stage + 1, e.seq)
            }
            state.update(st)
            stateTtlMillis.foreach(state.setTimeoutDuration)
            FunnelProgress(uid, st.stage)
          }
      }
  }

  /** Typed stateful aggregation: running per-user totals via
    * `mapGroupsWithState` (KeyValueGroupedDataset). In batch the state
    * starts empty and the result equals a plain groupBy — the test locks
    * that equivalence. */
  def userRunningTotals(events: Dataset[UserEvent],
                        stateTtlMillis: Option[Long] = None)
      : Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](ttlConf(stateTtlMillis)) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            // inactive past the TTL: flush the final totals and forget —
            // a later reappearance starts a fresh count (windowed-lifetime
            // semantics, the price of bounded state on a churning keyspace)
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0))
            var n = prev.n_events
            var tot = prev.total_value
            it.foreach { e => n += 1; tot += e.value }
            val next = UserStats(uid, n, tot)
            state.update(next)
            stateTtlMillis.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** Bounded-state knob shared by the stateful operators: with a TTL the
    * state store stops growing monotonically on an unbounded, churning
    * user population — the processing-time timeout drops (and flushes)
    * any key inactive for `ttl`, at the cost of windowed-lifetime rather
    * than true-lifetime semantics for keys that outlive it. Without a
    * TTL (the default, and the batch-parity mode) state is kept forever:
    * right for bounded backfills, wrong for perpetual streams. */
  private def ttlConf(ttl: Option[Long]): GroupStateTimeout =
    ttl.map { t =>
      require(t > 0, s"stateTtlMillis must be > 0, got $t")
      GroupStateTimeout.ProcessingTimeTimeout()
    }.getOrElse(GroupStateTimeout.NoTimeout())
}
