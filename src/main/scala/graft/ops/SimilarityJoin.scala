package graft.ops

import graft.Util.q
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J1/F1 — Levenshtein similarity (theta) join
  * (reference varinfo-update.R:99-105: `stringdist_left_join`, method "lv",
  * `max_dist` config at :15, emitted `distance_col`).
  *
  * Physical strategy, in order of scale:
  *  1. `leftJoin` — BroadcastNestedLoopJoin with two always-sound prefilters:
  *     a length band (levenshtein >= |len(a)-len(b)|) and Spark's
  *     early-exit 3-arg `levenshtein(l, r, threshold)`, which abandons a
  *     pair as soon as the running distance exceeds the bound. Right for a
  *     small (broadcastable) right side — the reference's case (~260 rows).
  *  2. `blockedInnerJoin` — replicates each right row once per candidate
  *     length in [len-d, len+d] and equi-joins on exact string length. This
  *     turns the O(|L|·|R|) nested loop into a shuffle hash join keyed on an
  *     int, so both sides scale out; the true distance is verified after the
  *     equi match. Replication factor is only (2d+1).
  */
object SimilarityJoin {

  /** Sound candidate prefilter: edit distance is >= length difference. */
  def lengthBand(l: Column, r: Column, maxDist: Int): Column =
    abs(length(l) - length(r)) <= maxDist

  /** Early-exit bounded distance: value in [0, maxDist], or -1 if above. */
  def boundedDistance(l: Column, r: Column, maxDist: Int): Column =
    levenshtein(l, r, maxDist)

  /** Full join predicate for distance <= maxDist. */
  def condition(l: Column, r: Column, maxDist: Int): Column =
    lengthBand(l, r, maxDist) && boundedDistance(l, r, maxDist) >= 0

  /** Theta left join: one output row per qualifying (left, right) pair plus
    * the distance; left rows with no qualifying partner survive with nulls
    * (distance null too), mirroring `stringdist_left_join`. */
  def leftJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String, maxDist: Int,
               distCol: String = "string_distance"): DataFrame = {
    val l = left.alias("sj_l")
    val r = right.alias("sj_r")
    val lk = col(s"sj_l.${q(leftKey)}")
    val rk = col(s"sj_r.${q(rightKey)}")
    l.join(r, condition(lk, rk, maxDist), "left")
      .withColumn(distCol,
        when(rk.isNotNull, boundedDistance(lk, rk, maxDist)))
  }

  /** Banded inner variant for large×large joins: equi-join on exact length
    * (right side exploded over its 2d+1 admissible partner lengths), then
    * verify the true bounded distance. Each qualifying pair matches exactly
    * once because the band value equals the left string's length. */
  def blockedInnerJoin(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String, maxDist: Int,
                       distCol: String = "string_distance"): DataFrame = {
    val band = "__graft_len_band"
    val l = left.withColumn(band, length(qc(leftKey))).alias("sj_l")
    val r = right
      .withColumn(band,
        explode(sequence(length(qc(rightKey)) - maxDist,
                         length(qc(rightKey)) + maxDist)))
      .alias("sj_r")
    val lk = col(s"sj_l.${q(leftKey)}")
    val rk = col(s"sj_r.${q(rightKey)}")
    l.join(r, col(s"sj_l.$band") === col(s"sj_r.$band") &&
              boundedDistance(lk, rk, maxDist) >= 0)
      .withColumn(distCol, boundedDistance(lk, rk, maxDist))
      .drop(band)
  }

  /** Left-join semantics on top of the blocked kernel: inner matches plus
    * never-matched left rows (null right columns / null distance). */
  def blockedLeftJoin(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String, maxDist: Int,
                      distCol: String = "string_distance"): DataFrame = {
    val inner = blockedInnerJoin(left, right, leftKey, rightKey, maxDist, distCol)
    val matchedKeys = inner.select(qc(leftKey)).distinct()
    val unmatched = left.join(matchedKeys,
        left(leftKey) <=> matchedKeys(leftKey), "left_anti")
    val rightCols = right.columns.filterNot(left.columns.contains)
    val padded = rightCols.foldLeft(unmatched) { (df, c) =>
        df.withColumn(c, lit(null))
      }
      .withColumn(distCol, lit(null).cast("int"))
    inner.unionByName(padded, allowMissingColumns = true)
  }

  private def qc(name: String): Column = col(q(name))
}
