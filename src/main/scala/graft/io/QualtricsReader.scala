package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.jdk.CollectionConverters._

/** S2/S3 — Qualtrics ingest: header-as-data transpose + sentinel row
  * (reference varinfo-update.R:53-64 `load_survey_column_info`).
  *
  * The raw Qualtrics CSV stores variable names as the header row and the
  * question text as DATA row 1, so the schema itself is pivoted into a
  * (variable, question-text, admin-year) table. This is inherently a
  * driver-side operation — but it is schema-sized (hundreds of columns, one
  * collected row), never data-sized, so it stays O(#columns) regardless of
  * response volume.
  */
object QualtricsReader {

  /** Dynamic column names (reference varinfo-update.R:38-44
    * `generate_dynamic_columns`). */
  final case class DynamicColumns(surveyYear: String) {
    val qualtricsColName: String = s"QualtricsVariableName.$surveyYear"
    val questionTextColName: String = s"QuestionText.$surveyYear"
    val surveyAdminYearColName: String = s"SurveyAdminYear.$surveyYear"
  }

  /** Build `column_info`: one row per response column plus one sentinel row
    * whose question text is "" (so NA-question codebook rows exact-match the
    * sentinel instead of fuzzy-matching arbitrary short strings —
    * varinfo-update.R:61). */
  def loadSurveyColumnInfo(spark: SparkSession, responseFile: String,
                           surveyYear: String): DataFrame = {
    val responses = Csv.readAsStrings(spark, responseFile)
    columnInfoFrom(responses, surveyYear)
  }

  /** Same, from an already-loaded responses frame (row 1 = question text). */
  def columnInfoFrom(responses: DataFrame, surveyYear: String): DataFrame = {
    val d = DynamicColumns(surveyYear)
    val names = responses.columns
    val firstRow = responses.limit(1).collect().headOption
    val texts: Array[String] = firstRow match {
      case Some(r) => names.indices.map { i =>
        val v = r.get(i); if (v == null) null else v.toString
      }.toArray
      case None => Array.fill[String](names.length)(null)
    }
    val rows: Seq[Row] =
      names.zip(texts).toSeq.map { case (n, t) => Row(n, t, surveyYear) } :+
        Row(null, "", null) // sentinel: only the question-text column is set
    val schema = StructType(Seq(
      StructField(d.qualtricsColName, StringType, nullable = true),
      StructField(d.questionTextColName, StringType, nullable = true),
      StructField(d.surveyAdminYearColName, StringType, nullable = true)))
    responses.sparkSession.createDataFrame(rows.asJava, schema)
  }
}
