package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting.
  *
  * AQE's skew-join handling (on by default) splits oversized shuffle
  * partitions at runtime, but it only helps sort-merge joins and only after
  * the skewed partition materialized. Salting attacks the skew at the
  * source: the fact side gets a random-but-deterministic salt in [0, n),
  * the dimension side is exploded across all n salts, and the join key
  * becomes (key, salt) — one hot key now spreads over n tasks.
  *
  * Deterministic: the salt is `pmod(xxhash64(row fingerprint), n)`, not
  * `rand()`, so replays and retries see identical assignments.
  */
object SkewJoin {

  def saltedInnerJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      salts: Int = 8,
                      fingerprint: Seq[String] = Nil): DataFrame =
    saltedJoin(fact, dim, factKey, dimKey, salts, fingerprint, "inner")

  /** LEFT-outer variant — the fact ⟕ dim enrichment join, which hits the
    * same hot-key regime (every fact row carrying a hot key lands in one
    * task). Salting the FACT side and exploding the DIM side preserves
    * left semantics directly: each fact row exists exactly once at one
    * salt, every dim row exists at all salts, so the (key, salt) match
    * set per fact row equals the plain key match set, and an unmatched
    * fact row null-pads exactly once. Null fact keys pad as in a plain
    * left join (null never equals). */
  def saltedLeftJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     salts: Int = 8,
                     fingerprint: Seq[String] = Nil): DataFrame =
    saltedJoin(fact, dim, factKey, dimKey, salts, fingerprint, "left")

  private def saltedJoin(fact: DataFrame, dim: DataFrame,
                         factKey: String, dimKey: String,
                         salts: Int, fingerprint: Seq[String],
                         joinType: String): DataFrame = {
    require(salts > 0, s"salts=$salts must be > 0")
    // qcol: bare col() would parse dotted names as struct-field access
    val fpCols: Seq[Column] =
      if (fingerprint.nonEmpty) fingerprint.map(graft.Util.qcol)
      else fact.columns.toSeq.map(graft.Util.qcol)
    val saltedFact = fact.withColumn("__graft_salt",
      pmod(xxhash64(fpCols: _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // dataset-qualified refs are backtick-quoted so dotted column names
    // don't parse as nested field access
    val q = graft.Util.q _
    saltedFact.join(saltedDim,
        saltedFact(q(factKey)) === saltedDim(q(dimKey)) &&
          saltedFact("__graft_salt") === saltedDim("__graft_salt"),
        joinType)
      .drop("__graft_salt")
  }
}
