package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format most training-data
  * pipelines ingest (one JSON document per line, appendable; uncompressed
  * text splits freely, gzip parts split only at file granularity — see
  * [[write]]).
  *
  * Always read WITH an explicit schema at scale: schema inference is a
  * full extra pass over the data, and a drifting field in one file would
  * silently widen columns for the whole load. `readInferred` exists for
  * exploration only.
  */
object Jsonl {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Exploration-only: schema inference costs one full pass. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Ingest-grade read: malformed lines do not kill the job — they land
    * with null fields and the raw line preserved in `_corrupt_record`, so
    * the caller can route them to a quarantine sink and gate on their
    * ratio (see quality/Expectations) instead of discovering the bad
    * producer via a stage failure three hours in.
    *
    * Spark disallows plans that reference ONLY `_corrupt_record` over the
    * raw files (nothing would force a parse): `cache()` or persist the
    * parsed batch before filtering on the corrupt column. */
  def readPermissive(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Multi-file JSONL sink; gzip-compressed parts by default. Honest
    * scale note: a .gz part is NOT splittable — each becomes exactly one
    * task on every later read, so downstream parallelism equals the part
    * COUNT, not the byte count. That is the industry JSONL posture (many
    * moderately-sized gzip parts); just never coalesce to a few giant
    * parts before writing compressed — repartition so parts land
    * ~100-500 MB, or pass compress=false for intra-file splittability. */
  def write(df: DataFrame, path: String, compress: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }
}
