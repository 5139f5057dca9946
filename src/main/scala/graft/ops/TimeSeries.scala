package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping: calendar resampling with zero-filled gaps and
  * gap-aware RANGE-frame rolling aggregates. Complements `q_window_frame`'s
  * ROWS frame: a ROWS frame over daily rows silently narrows when days are
  * missing, while the RANGE frame here is anchored to the calendar.
  */
object TimeSeries {

  /** Per-key daily activity with missing days zero-filled between each
    * key's first and last active day. The scaffold is built per key with
    * `sequence()` — its explode is bounded by each key's day span (not the
    * corpus), and the fill join is an equi-join on (key, day), so nothing
    * here is quadratic. Day is rendered as yyyy-MM-dd text (engines
    * disagree on DATE round-trip types). Output: (keyCol, day, n_events).
    */
  def resampleDaily(events: DataFrame, keyCol: String,
                    tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val scaffold = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"))
    // NULL-SAFE fill join (r12): groupBy keeps a NULL-key group, so the
    // scaffold emits its days — but a null-unsafe join never matches
    // them back to `daily`, fabricating n_events=0 for every day of the
    // NULL-key group while its real counts silently vanish. <=> on the
    // key (day is never null: it comes from min/max of non-null groups)
    // keeps the NULL group's true counts; the committed oracle uses IS
    // NOT DISTINCT FROM to match.
    scaffold.alias("s").join(daily.alias("d"),
        col("s." + graft.Util.q(keyCol)) <=> col("d." + graft.Util.q(keyCol))
          && col("s.day") === col("d.day"),
        "left")
      .select(col("s." + graft.Util.q(keyCol)).as(keyCol),
        date_format(col("s.day"), "yyyy-MM-dd").as("day"),
        coalesce(col("d.n"), lit(0L)).as("n_events"))
  }

  /** SCD type-2 / gaps-and-islands compaction: collapse each key's
    * consecutive runs of an equal attribute value into one validity
    * interval (valid_from = first ts of the run, valid_to = ts of the NEXT
    * change, null while current). The island id is the classic two-window
    * form — a change flag (lag) cumulatively summed — so the whole
    * operator is two windows + one aggregate + one lead, all partitioned
    * by the key: no self-joins, parallelism = #keys at every step.
    * Output: (keyCol, attr, valid_from, valid_to, n_events). */
  def scd2(events: DataFrame, keyCol: String, tsCol: String,
           orderCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    val runs = events
      // null-SAFE change flag: `lag =!= attr` evaluates to null when the
      // current attr is null, so a null state would silently merge into
      // the preceding run (and split the equal-value run around it) —
      // wrong point-in-time history. row_number marks the first row
      // (lag-is-null cannot: a genuine null attr looks the same), <=>
      // compares null states as values.
      .withColumn("__chg",
        when(row_number().over(w) === 1 ||
          !(lag(col(attrCol), 1).over(w) <=> col(attrCol)), 1).otherwise(0))
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__run"))
      .agg(min(col(attrCol)).as("attr"), // constant within the run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    // order the interval chain by the run id, not valid_from: run ids are
    // strictly increasing in (ts, order) sequence, so tied first-event
    // timestamps between adjacent runs cannot make the lead ambiguous
    val wk = Window.partitionBy(col(keyCol)).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .select(col(keyCol), col("attr"), col("valid_from"), col("valid_to"),
        col("n_events"))
  }

  /** Point-in-time lookup against an SCD2 dimension (the output shape of
    * [[scd2]]): each fact row picks the dimension version whose
    * [valid_from, valid_to) interval contains its timestamp — the
    * join that makes "what was the attribute AT THE TIME" queries
    * correct instead of leaking current values into history.
    *
    * Physical shape: hash equi-join on the key with the interval
    * predicate as a join residual — version chains per key are short
    * (bounded by attribute churn, not event volume), so the residual
    * scan is constant-ish per probe and no range-join machinery is
    * needed. Dimension tables are key×versions — usually broadcastable
    * even when facts are not. */
  def scd2Lookup(facts: DataFrame, dim: DataFrame, keyCol: String,
                 tsCol: String): DataFrame = {
    val f = facts.alias("f")
    val d = dim.alias("d")
    // LEFT join: a fact before its key's first version (or for a key the
    // dimension never saw) survives with a null attribute — silently
    // dropping it would undercount any rollup over the result (same
    // convention as AsOfJoin)
    // output-name deconfliction (r13, the AsOfJoin `_right` convention
    // this scaladoc already cites): facts that carry their own `attr` or
    // `valid_from` — e.g. the output of a PREVIOUS scd2Lookup — used to
    // come back with duplicate column names, failing the next select
    // with AMBIGUOUS_REFERENCE. The fact column always survives
    // untouched; the dimension's column takes the suffix.
    val taken = scala.collection.mutable.Set(facts.columns: _*)
    def out(c: String): String = {
      var n = if (taken.contains(c)) c + "_right" else c
      while (taken.contains(n)) n = n + "_"
      taken += n
      n
    }
    val attrOut = out("attr")
    val vfOut = out("valid_from")
    f.join(d,
        col("f." + graft.Util.q(keyCol)) === col("d." + graft.Util.q(keyCol))
          && col("d.valid_from") <= col("f." + graft.Util.q(tsCol)) &&
          (col("d.valid_to").isNull ||
            col("f." + graft.Util.q(tsCol)) < col("d.valid_to")),
        "left")
      .select(f.columns.map(c => col("f." + graft.Util.q(c))) :+
        col("d.attr").as(attrOut) :+ col("d.valid_from").as(vfOut): _*)
  }

  /** Calendar-anchored rolling sum: per key, the sum of `valueExpr` over
    * the trailing `days`-day window INCLUDING missing days (RANGE frame
    * over the epoch-day number, so a 7-day window spans 7 calendar days
    * regardless of how many of them had data). Money-style values must be
    * pre-aggregated through DECIMAL by the caller for exactness; this
    * operator's own math is frame-sum over the per-day rows. One window
    * shuffle on the key. Output: (keyCol, day, day_value, rolling_value).
    */
  def rollingDailySum(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, days: Int): DataFrame = {
    require(days >= 1, s"days=$days must be >= 1")
    val daily = events
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      // decimal(38,6), not 18,6 (r13): the per-value cast at 18,6 made
      // |value| >= 10^12 an ANSI CAST_OVERFLOW cliff (micro-unit money
      // crosses it at $1.5M) — or a silent null-out with ANSI off. The
      // wide cast rounds identically for in-range values, so oracle
      // parity is unchanged.
      .agg(sum(col(valueCol).cast("decimal(38,6)")).as("__dv"))
      .withColumn("__dayno", datediff(col("day"), lit("1970-01-01")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__dayno"))
      .rangeBetween(-(days - 1).toLong, 0L)
    daily
      .withColumn("__rv", sum(col("__dv")).over(w))
      // DECIMAL all the way through the frame sum, DOUBLE only at the edge:
      // exact and partial-agg-order-independent on both engines
      .select(col(keyCol), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("__dv").cast("double").as("day_value"),
        col("__rv").cast("double").as("rolling_value"))
  }
}
