package graft.ops

import graft.Util.{nullifEmpty, q, qcol}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F3/F4/A3/F8/A4/F9/P5/O2 — recency derivation + priority sort
  * (reference varinfo-update.R:156-223 `sort_varinfo`).
  *
  * The codebook schema widens every year, so the `SurveyAdmin*` columns are
  * rediscovered from the ACTUAL runtime schema (the phase-2 input is a
  * human-edited file; reference README.md:57-59). Everything row-level
  * compiles to built-in expressions — no UDFs.
  */
object Recency {

  /** F3 — regex column discovery. */
  def discoverRecencyCols(df: DataFrame): Seq[String] =
    df.columns.filter(_.matches("^SurveyAdmin.*")).toSeq

  /** F4 — digit recency key: all digit runs concatenated then read as an
    * integer ("SurveyAdminTerm25-2" → 252, "SurveyAdminYear2023" → 2023;
    * reference varinfo-update.R:166-168). Digitless names sort oldest. */
  def digitKey(name: String): Long = {
    val digits = "\\d+".r.findAllIn(name).mkString
    if (digits.isEmpty) Long.MinValue
    else BigInt(digits).min(BigInt(Long.MaxValue)).toLong
  }

  /** Newest (largest digit key) first; name as deterministic tiebreaker.
    * Ordered with a reverse Ordering, NOT by negating the key:
    * -Long.MinValue (the digitless sentinel) wraps back to Long.MinValue
    * and would sort digitless columns NEWEST instead of oldest. */
  def sortedNewestFirst(cols: Seq[String]): Seq[String] =
    cols.sorted(Ordering.by((c: String) => (digitKey(c), c))(
      Ordering.Tuple2(Ordering.Long.reverse, Ordering.String)))

  /** A3 — per-column single-value extraction, one aggregate pass: for each
    * recency column, the FIRST (by `rowIdCol`) non-NA/non-"" value, plus the
    * distinct count so callers can reproduce the reference's ">1 distinct"
    * warning (varinfo-update.R:172-185). */
  def adminValues(df: DataFrame, cols: Seq[String], rowIdCol: String)
      : Seq[(String, Option[String], Long)] = {
    if (cols.isEmpty) return Nil
    val aggs = cols.flatMap { c =>
      val v = nullifEmpty(qcol(c))
      Seq(
        min(when(v.isNotNull, struct(col(q(rowIdCol)).as("ord"), v.as("v"))))
          .as(s"first_$c"),
        countDistinct(v).as(s"n_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.map { c =>
      val s = row.getAs[org.apache.spark.sql.Row](s"first_$c")
      val v = Option(s).map(_.getAs[String]("v"))
      (c, v, row.getAs[Long](s"n_$c"))
    }
  }

  /** F8 — value → rank map, rank 1 = newest; on duplicate values the first
    * (newest) occurrence wins, matching R's named-vector lookup
    * (varinfo-update.R:187). NA values get no rank. */
  def recencyRank(valuesNewestFirst: Seq[Option[String]]): Seq[(String, Int)] = {
    val b = scala.collection.mutable.LinkedHashMap[String, Int]()
    valuesNewestFirst.zipWithIndex.foreach {
      case (Some(v), i) => if (!b.contains(v)) b += (v -> (i + 1))
      case _ =>
    }
    b.toSeq
  }

  /** A4/F9 — `most_recent`: over the row's recency-column values (NA/""
    * dropped, non-ranked values dropped), the value whose rank is smallest.
    * Compiled to `least` over per-column (rank, value) structs — ranks are
    * unique per distinct value, so the struct order is total; `least` skips
    * NULLs, reproducing `which.min` over the intersect
    * (varinfo-update.R:191-211). */
  def mostRecentCol(recencyCols: Seq[String], rank: Seq[(String, Int)]): Column = {
    if (recencyCols.isEmpty || rank.isEmpty)
      return lit(null).cast("string")
    val structs = recencyCols.map { c =>
      val v = nullifEmpty(qcol(c))
      val r = rankOf(v, rank)
      when(r.isNotNull, struct(r.as("r"), v.as("v")))
    }
    val best =
      if (structs.size == 1) structs.head else least(structs: _*)
    best.getField("v")
  }

  /** Rank lookup as a CASE chain (small driver-side map folded into the
    * plan — SURVEY.md §1.4). */
  def rankOf(v: Column, rank: Seq[(String, Int)]): Column =
    rank.foldLeft(lit(null).cast("int")) { case (acc, (value, r)) =>
      when(v === lit(value), lit(r)).otherwise(acc)
    }

  /** P5 — priority: admin/metadata rows first (−1), else the recency rank of
    * `most_recent` (NULL if none — sorted last). R's `%in%` never yields NA,
    * so NULL ITEM_TYPE rows take the else branch (varinfo-update.R:213-216). */
  def priorityCol(itemType: Column, mostRecent: Column,
                  rank: Seq[(String, Int)],
                  adminTypes: Seq[String] = Seq("administrative", "metadata"))
      : Column =
    when(coalesce(itemType.isin(adminTypes.map(lit): _*), lit(false)),
      lit(-1)).otherwise(rankOf(mostRecent, rank))

  /** Full `sort_varinfo`: rediscover columns, derive `most_recent`, sort by
    * (priority ASC NULLS LAST, original row order) — R `arrange` puts NA
    * last; Spark's default asc is nulls-FIRST, hence `asc_nulls_last` (O2).
    * Row order of `df` is taken as the file order (id assigned on entry). */
  def sortVarinfo(df: DataFrame,
                  recencyColsInOrder: Option[Seq[String]] = None,
                  itemTypeCol: String = "ITEM_TYPE"): DataFrame = {
    val withId = RowId.withRowId1(df, "__graft_row_id")
    val cols = recencyColsInOrder.getOrElse(
      sortedNewestFirst(discoverRecencyCols(df)))
    val values = adminValues(withId, cols, "__graft_row_id")
    values.foreach { case (c, _, n) =>
      if (n > 1)
        System.err.println(
          s"[graft] warning: column $c has $n distinct non-NA values; using the first")
    }
    val rank = recencyRank(values.map(_._2))
    val withMr = withId.withColumn("most_recent", mostRecentCol(cols, rank))
    val withPri = withMr.withColumn("__graft_priority",
      priorityCol(qcol(itemTypeCol), col("most_recent"), rank))
    withPri
      .orderBy(col("__graft_priority").asc_nulls_last, col("__graft_row_id"))
      .drop("__graft_priority", "__graft_row_id")
  }
}
