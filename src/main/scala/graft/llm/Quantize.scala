package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding scalar quantization — the storage/memory half of ANN at
  * corpus scale: float32 vectors compress 4× to 8-bit codes against
  * per-dimension [min, max] ranges (the faiss `SQ8` shape). At 100 TB the
  * stats pass is one narrow posexplode + map-side-combined aggregate whose
  * result is DIMENSION-sized (a few KB), so it broadcasts; quantization
  * itself is per-row work against the broadcast ranges — no shuffle of the
  * vectors.
  *
  * All arithmetic runs in double with a fixed expression order —
  * float32 → double promotion is exact and `floor` has no rounding-mode
  * ambiguity, so the codes are bit-identical on any engine
  * (oracle-checked). */
object Quantize {

  /** Per-dimension corpus ranges: (pos, mn, mx), one row per dimension. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "val")))
      .groupBy(col("pos"))
      .agg(min(col("val")).as("mn"), max(col("val")).as("mx"))

  /** 8-bit code for one value against its dimension range: 0 for a
    * degenerate (constant) dimension, else ⌊(v−mn)/(mx−mn)·256⌋ clamped
    * into [0, 255] — 256 equal cells of width (mx−mn)/256, the clamp
    * folding the single point v == mx into the top cell. Midpoint
    * reconstruction error is then ≤ half a cell everywhere. */
  def code8(v: Column, mn: Column, mx: Column): Column =
    // null guard FIRST: least() skips nulls, so a null element would
    // otherwise silently quantize to the top cell (code 255)
    when(v.isNull, lit(null).cast("long"))
      .when(mx === mn, lit(0L))
      .otherwise(
        least(lit(255L), floor((v.cast("double") - mn.cast("double")) /
          (mx.cast("double") - mn.cast("double")) * lit(256))))
      .cast("long")

  /** Quantize every vector: one exploded (id, dim, code) row per element,
    * the ranges broadcast. `dims` rows per vector — rebuild packed arrays
    * with `packed`. */
  def quantize8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val stats = dimStats(df, vecCol)
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "val")))
      .join(broadcast(stats), "pos")
      .select(col(idCol), col("pos").cast("int").as("dim"),
        code8(col("val"), col("mn"), col("mx")).as("code"))
  }

  /** Packed form: (id, codes array<long> in dimension order) — what an ANN
    * index stores. */
  def packed(quantized: DataFrame, idCol: String): DataFrame =
    quantized.groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("code")))),
        x => x("code")).as("codes"))

  /** Reconstruction: code → range midpoint of its quantization cell,
    * `mn + (code + 0.5)/256 · (mx − mn)` — for measuring quantization
    * error or coarse re-scoring before an exact re-rank. */
  def dequantize(code: Column, mn: Column, mx: Column): Column =
    mn.cast("double") + (code.cast("double") + lit(0.5)) / lit(256.0) *
      (mx.cast("double") - mn.cast("double"))
}
