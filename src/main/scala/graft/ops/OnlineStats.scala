package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass moments via Welford/Chan: count, mean, and M2
  * (sum of squared deviations) with an exact pairwise MERGE step — the
  * property that makes one pass work distributed: every partition reduces
  * locally and the combiner merges partials in any order without the
  * catastrophic cancellation the naive sum/sum-of-squares form suffers.
  *
  * Demonstrates the `Aggregator` extension tier (typed buffer + encoders),
  * usable from the typed API (`ds.select(OnlineStats.toColumn)`) or
  * registered untyped via `functions.udaf`. Results match the built-in
  * avg/var_pop to float tolerance (merge order differs, so not
  * bit-exact — the built-ins use the same merge algebra) — EXCEPT on
  * empty/all-null groups, a deliberate divergence (r13, documented
  * honestly): the result struct is non-nullable per field, so n=0
  * groups report (n=0, mean=0.0, variance=0.0) where avg/var_pop
  * return SQL NULL. `n` is the authoritative "was there data" signal;
  * consumers must check it before treating mean 0.0 as a statistic.
  */
final case class StatsState(n: Long, mean: Double, m2: Double)
final case class StatsResult(n: Long, mean: Double, variance: Double)

object OnlineStats extends Aggregator[java.lang.Double, StatsState, StatsResult] {
  type State = StatsState
  type Result = StatsResult
  private def State(n: Long, mean: Double, m2: Double) = StatsState(n, mean, m2)
  private def Result(n: Long, mean: Double, v: Double) = StatsResult(n, mean, v)

  override def zero: State = State(0L, 0.0, 0.0)

  // boxed input + null skip: the built-ins (avg/var_pop) ignore NULL
  // rows, and a primitive Double input would either coerce null to 0.0
  // or throw, silently diverging from them
  override def reduce(s: State, x: java.lang.Double): State = {
    if (x == null) return s
    val v = x.doubleValue
    val n = s.n + 1
    val d = v - s.mean
    val mean = s.mean + d / n
    State(n, mean, s.m2 + d * (v - mean))
  }

  override def merge(a: State, b: State): State = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      State(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  override def finish(s: State): Result =
    Result(s.n, if (s.n == 0) 0.0 else s.mean,
      if (s.n == 0) 0.0 else s.m2 / s.n)

  override def bufferEncoder: Encoder[State] = Encoders.product[State]
  override def outputEncoder: Encoder[Result] = Encoders.product[Result]
}
