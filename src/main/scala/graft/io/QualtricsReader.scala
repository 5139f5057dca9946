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
    // single-file contract ENFORCED (r13): columnInfoFrom reads "the
    // file's first data row" via limit(1), but over a multi-file
    // directory/glob Spark's limit takes row 1 of an arbitrary
    // partition while the schema comes from the listing-order first
    // file — question texts silently attributed to the wrong variables.
    // A Qualtrics export is one file; refuse anything else loudly.
    val p = new org.apache.hadoop.fs.Path(responseFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val dataFiles = matched.flatMap { s =>
      if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s)
    }.filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith("."))
    require(dataFiles.size <= 1,
      s"loadSurveyColumnInfo expects ONE response export file, but " +
        s"$responseFile resolves to ${dataFiles.size} files — the " +
        "question-text row (row 1) is only well-defined for a single " +
        "file; point at the export itself")
    val responses = Csv.readAsStrings(spark, responseFile)
    columnInfoFrom(responses, surveyYear)
  }

  /** Same, from an already-loaded responses frame (row 1 = question
    * text; the caller owns the single-file guarantee —
    * [[loadSurveyColumnInfo]] enforces it for path inputs). */
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
