package graft.pipeline

/** S5 — config-driven parameters & path templating
  * (reference varinfo-update.R:10-31).
  */
final case class VarinfoConfig(
    surveyYear: String = "2025",
    surveyName: String = "experience",
    /** Question-text column of the PRIOR codebook used for the fuzzy join
      * (reference varinfo-update.R:13). */
    joinColumnText: String = "QuestionText.2023",
    /** Variable-name column of the prior codebook used for the rescue join
      * (reference varinfo-update.R:14). */
    joinColumnVar: String = "ITEM_NAME",
    /** Fuzzy-matching leniency (reference varinfo-update.R:15). */
    maxStringDistance: Int = 6,
    /** Right-side row bound for the broadcast similarity kernel; above it
      * the pipeline switches to the blocked (length-banded equi-join)
      * kernel. Both produce identical results. */
    broadcastRightLimit: Long = 100000L,
    responseFile: String = "",
    priorVarinfoFile: String = "",
    workDir: String = "",
    varinfoFolder: String = "") {

  def needsManualUpdateFile: String =
    s"$workDir/${surveyName}_cumulative_varinfo_manual-update-needed.csv"
  def unmatchedVarsFile: String =
    s"$workDir/${surveyName}_unmatched_variables.csv"
  def manuallyUpdatedFile: String =
    s"$workDir/${surveyName}_cumulative_varinfo_manually-updated.csv"
  def outputFile: String =
    s"$varinfoFolder/${surveyName}_cumulative-varinfo_updated-$surveyYear.csv"
  def trimmedOutputFile: String =
    s"$varinfoFolder/${surveyName}_cumulative-varinfo_updated-$surveyYear" +
      "_2-trimmed-for-dashboard.csv"
}
