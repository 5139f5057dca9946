package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered-stage funnels, step transitions, and
  * cohort retention. These are the product-analytics counterparts of the
  * reference's survey aggregations (counts over condition classes,
  * `/root/reference/varinfo-update.R:200-231`) lifted to event streams.
  *
  * Scale shape: every operator is a single shuffle on the user key (plus a
  * rows-proportional aggregate), never a self-join. The funnel fold keeps
  * one sorted per-user event array in memory — bounded by events-per-user,
  * which in clickstream data is capped by session length, not corpus size.
  * For degenerate heavy-hitter users (bots with millions of events) the
  * right pre-step is a per-user `TopKPerKey` cap, which composes directly.
  */
object Funnel {

  /** Highest funnel stage each user reaches, where stages must occur in
    * order: stage k counts only if an event of type `stages(k)` occurs
    * strictly later (in `(tsCol, orderCol)` order) than the event that
    * satisfied stage k-1. One shuffle: groupBy(user) + an ordered fold
    * (`aggregate` over the sorted event array) — no iterative joins, no
    * per-stage passes. Output: (userCol, max_stage int, 0 = none reached).
    */
  def maxStagePerUser(events: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, orderCol: String,
                      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageArr = array(stages.map(lit): _*)
    // sort_array on structs orders by leading fields (ts, then the
    // tie-breaker), so the fold sees events in deterministic time order
    val evs = sort_array(collect_list(struct(
      col(tsCol).as("ts"), col(orderCol).as("ord"), col(typeCol).as("t"))))
    events.groupBy(col(userCol))
      .agg(aggregate(evs, lit(0),
        (st, e) => when(st < lit(stages.size) &&
          e("t") === element_at(stageArr, st + 1), st + 1).otherwise(st))
        .as("max_stage"))
  }

  /** Classic funnel report: for each stage, how many users reached it (in
    * order). Emits EVERY stage, including zero-user tail stages, so the
    * report shape is schema-stable. Output: (stage_idx, stage, n_users). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, orderCol: String, stages: Seq[String]): DataFrame = {
    val reached = maxStagePerUser(events, userCol, typeCol, tsCol, orderCol, stages)
      .filter(col("max_stage") >= 1)
      // a user with max_stage = m contributes to stages 1..m; the explode is
      // bounded by #stages (constant), not data size
      .select(explode(sequence(lit(1), col("max_stage"))).as("stage_no"))
      .groupBy(col("stage_no")).agg(count(lit(1)).as("n"))
    val all = events.sparkSession.createDataFrame(
      stages.zipWithIndex.map { case (s, i) => (i, s) })
      .toDF("stage_idx", "stage")
    all.join(reached, all("stage_idx") === reached("stage_no") - 1, "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n"), lit(0L)).as("n_users"))
  }

  /** Markov-style step transitions: counts of (event_type -> next event_type)
    * pairs within each user's timeline. One window shuffle on the user key.
    * Output: (prev_type, next_type, n_pairs). */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderCol))
    events
      .select(col(typeCol).as("prev_type"),
        lead(col(typeCol), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Most-common session paths: events are sessionized by an inactivity
    * gap (`gapMicros`, gap >= gapMicros starts a new session — same rule
    * as `EventsStream.sessionize`), each session is rendered as its
    * `'>'`-joined event-type sequence, and the `topN` most frequent paths
    * are returned with a deterministic (count desc, path) tiebreak.
    * Two window passes + two aggregates, all partitioned by the user key;
    * the final top-N is a bounded sort over distinct paths only.
    * Output: (path, n_sessions). */
  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, orderCol: String,
                   gapMicros: Long = 1800000000L, topN: Int = 20): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderCol))
    val sid = events
      .withColumn("__us", expr(s"unix_micros(${graft.Util.q(tsCol)})"))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull ||
          col("__us") - lag(col("__us"), 1).over(w) >= gapMicros, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sid.groupBy(col(userCol), col("__sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(tsCol).as("ts"),
          col(orderCol).as("ord"), col(typeCol).as("t")))),
        e => e("t")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event; for each (cohort_week, week_offset), how many of that cohort
    * were active offset weeks later. Two aggregates + one equi-join on the
    * user key — the (user, week) distinct bounds the join input to
    * users x active-weeks, tiny relative to raw events.
    * NULL users are EXCLUDED by the (null-unsafe) self-join, matching the
    * SQL equivalent: a null user id carries no identity to track across
    * weeks, so counting all null-id activity as one "user" would
    * fabricate a phantom retained cohort member. (Deliberate divergence
    * from maxStagePerUser/scd2, which keep a NULL group: those aggregate
    * within one frame rather than re-identify across joins.)
    * Output: (cohort_week date, week_offset int, n_users). */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("w"))
      .distinct()
    val cohort = weeks.groupBy(col(userCol)).agg(min(col("w")).as("cw"))
    weeks.join(cohort, userCol)
      // render the week as yyyy-MM-dd text: engines disagree on whether a
      // DATE round-trips as a date or a midnight timestamp
      .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("w"), col("cw")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
