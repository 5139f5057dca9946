package graft.pipeline

import graft.Util.{nullifEmpty, q, qcol}
import graft.io.{Csv, QualtricsReader}
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end varinfo pipeline (reference varinfo-update.R:235-259),
  * re-expressed as one lazy Spark DAG per phase with the human checkpoint
  * between phases (reference README.md:39-43: the script is run twice; run 1
  * stops after exporting the manual-update files, run 2 resumes from the
  * human-edited file).
  */
object VarinfoUpdate {

  /** Match statistics (reference varinfo-update.R:110-136 messages).
    * Intentional deviation: `unmatchedText`/`stillUnmatched` subtract
    * DISTINCT matched variables from the variable total — the reference
    * subtracts matched prior-ROW counts, which double-counts a variable
    * matched by several codebook rows and goes negative on cumulative
    * codebooks. `exact`/`fuzzy` stay row tallies like the reference. */
  final case class MatchStats(totalVars: Long, exact: Long, fuzzy: Long,
                              unmatchedText: Long, totalMatched: Long,
                              stillUnmatched: Long) {
    def additionalMatches: Long = unmatchedText - stillUnmatched
  }

  /** Steps 1–2 of the reference main script: fuzzy join + best match +
    * variable-name rescue join + unmatched extraction
    * (varinfo-update.R:93-145). Returns (joined, unmatched, stats). */
  def joinVarinfo(priorVarinfo: DataFrame, columnInfo: DataFrame,
                  cfg: VarinfoConfig): (DataFrame, DataFrame, MatchStats) = {
    val d = QualtricsReader.DynamicColumns(cfg.surveyYear)

    // row_id (W1) + NA→"" on the text key (P4), then the similarity join
    // (J1) and best-match-per-row selection (J2). The right side's original
    // position is carried as a deterministic tiebreaker — R keeps the
    // first-encountered tie, which is order-dependent; we pin it.
    val ciWithId = RowId.withRowId1(columnInfo, "__graft_ci_id")
    val prior = RowId.withRowId1(priorVarinfo, "row_id")
      .withColumn(cfg.joinColumnText,
        coalesce(qcol(cfg.joinColumnText), lit("")))
    // Kernel selection by right-side size: a broadcastable column_info
    // (every real survey — hundreds of variables) takes the banded
    // broadcast theta join; a huge one switches to the blocked equi-join
    // kernel so neither side needs to fit in memory.
    val rightRows = ciWithId.count()
    val pairs =
      if (rightRows <= cfg.broadcastRightLimit)
        SimilarityJoin.leftJoin(
          prior, ciWithId, cfg.joinColumnText, d.questionTextColName,
          cfg.maxStringDistance)
      else
        SimilarityJoin.blockedLeftJoin(
          prior, ciWithId, cfg.joinColumnText, d.questionTextColName,
          cfg.maxStringDistance)
    val fuzzyJoined = BestMatch.topOnePerKey(
        pairs, Seq(col("row_id")),
        Seq(col("string_distance").asc_nulls_last,
            col("__graft_ci_id").asc_nulls_last))
      .drop("__graft_ci_id")
      .cache() // reused by stats, rescue join, and both sinks

    // totalVars reuses the kernel-selection count (r13: it IS
    // columnInfo.count() — ciWithId adds only a row id — and the two
    // used to run as two separate jobs). It includes the SENTINEL row,
    // and the matched counts never do (count_distinct skips its NULL
    // name) — deliberately: the reference's own stats count the
    // sentinel in total_rows (nrow(column_info),
    // varinfo-update.R:110) and a sentinel match never counts as
    // matched there either (!is.na(qualtrics_col_name), :129), so a
    // perfect run reports 1 unmatched on both engines.
    val totalVars = rightRows
    // unmatched counts subtract DISTINCT matched variables, not matched
    // prior rows: a cumulative codebook has many rows per variable, and
    // row counts would drive "N unmatched (out of M)" negative
    // (the reference's row arithmetic CAN — varinfo-update.R:113,130)
    val statsRow = fuzzyJoined.agg(
      count(when(col("string_distance") === 0 &&
        qcol(d.qualtricsColName).isNotNull, 1)).as("exact"),
      count(when(col("string_distance") > 0 &&
        qcol(d.qualtricsColName).isNotNull, 1)).as("fuzzy"),
      count_distinct(qcol(d.qualtricsColName)).as("vars_matched")
    ).collect()(0)
    val (exact, fuzzy) =
      (statsRow.getAs[Long]("exact"), statsRow.getAs[Long]("fuzzy"))
    val unmatchedText = totalVars - statsRow.getAs[Long]("vars_matched")

    // Rescue join by variable name with column-wise coalesce (J3) — values
    // from the fuzzy join win over the variable-name join.
    val joined = CoalesceJoin.coalesceLeftJoin(
      fuzzyJoined, columnInfo, cfg.joinColumnVar, d.qualtricsColName)

    // release the stage cache before returning (the codebase-wide
    // finishAndRelease convention): the checkpoint severs the outputs'
    // lineage from the cached plan, so a service calling this per batch
    // accumulates no persisted state. Checkpoint FIRST, then aggregate
    // the stats from the checkpointed frame (r13): aggregating the lazy
    // `joined` plan before materializing it executed the whole rescue
    // join twice per call.
    val joinedFinal = graft.Util.finishAndRelease(joined, fuzzyJoined)

    val totalMatched = joinedFinal
      .agg(count_distinct(qcol(d.qualtricsColName))).collect()(0)
      .getLong(0)
    val stillUnmatched = totalVars - totalMatched
    val stats = MatchStats(totalVars, exact, fuzzy, unmatchedText,
      totalMatched, stillUnmatched)

    // Unmatched new variables (J4) — null-safe keys like dplyr's
    // na_matches = "na", so the sentinel row (NULL name) is excluded when
    // any prior row stayed unmatched.
    val unmatched =
      AntiJoin.antiJoin(columnInfo, joinedFinal, d.qualtricsColName)

    (joinedFinal, unmatched, stats)
  }

  /** Phase 1 (reference Steps 1–2): read inputs, join, export the two
    * manual-update files, stop. */
  def phase1(spark: SparkSession, cfg: VarinfoConfig): MatchStats = {
    val columnInfo = QualtricsReader.loadSurveyColumnInfo(
      spark, cfg.responseFile, cfg.surveyYear)
    val prior = Csv.readAsStrings(spark, cfg.priorVarinfoFile)
    val (joined, unmatched, stats) = joinVarinfo(prior, columnInfo, cfg)
    Csv.writeSingle(joined, cfg.needsManualUpdateFile)
    Csv.writeSingle(unmatched, cfg.unmatchedVarsFile)
    println(s"[graft] Fuzzy text join (max distance = ${cfg.maxStringDistance}): " +
      s"${stats.exact} exact, ${stats.fuzzy} fuzzy, " +
      s"${stats.unmatchedText} unmatched (out of ${stats.totalVars}).")
    println(s"[graft] After variable-name join: ${stats.additionalMatches} " +
      s"additional matches, ${stats.totalMatched} total matched, " +
      s"${stats.stillUnmatched} still unmatched (out of ${stats.totalVars}).")
    stats
  }

  /** Phase 2 (reference Steps 3–6): resume from the human-edited file,
    * derive `most_recent`, priority-sort, write the cumulative codebook and
    * the dashboard trim. */
  def phase2(spark: SparkSession, cfg: VarinfoConfig): DataFrame = {
    val updated = Csv.readAsStrings(spark, cfg.manuallyUpdatedFile)
    // The cumulative codebook must NOT carry phase 1's join internals:
    // the reference's own cumulative fixture has neither row_id nor
    // string_distance (its rowid_to_column would even ERROR on a
    // pre-existing row_id next cycle), and OUR next cycle's
    // withRowId1(prior, "row_id") would hit an ambiguous reference —
    // the pipeline has to round-trip its own output as priorVarinfoFile.
    val sorted = Recency.sortVarinfo(updated)
      .drop("row_id", "string_distance")
    Csv.writeSingle(sorted, cfg.outputFile)
    val dash = Dashboard.dashboard(sorted, cfg.joinColumnVar)
    Csv.writeSingle(dash, cfg.trimmedOutputFile)
    sorted
  }

  /** One entry point honoring the checkpoint protocol: run phase 1 always;
    * run phase 2 only if the human-edited file exists (§3.4). */
  def run(spark: SparkSession, cfg: VarinfoConfig): Unit = {
    phase1(spark, cfg)
    val fs = new org.apache.hadoop.fs.Path(cfg.manuallyUpdatedFile)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(cfg.manuallyUpdatedFile)))
      phase2(spark, cfg)
    else
      println("[graft] Exported joined data for manual updates. Save the " +
        "edited file to manuallyUpdatedFile and re-run to continue.")
  }
}
