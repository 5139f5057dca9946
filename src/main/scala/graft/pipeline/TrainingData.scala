package graft.pipeline

import graft.llm.{Dedup, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data preparation flow, composed from the
  * engine's operators — the pipeline a corpus actually runs before
  * tokenization:
  *
  *   1. clean      — normalize + PII-redact the text;
  *   2. filter     — drop documents below a minimum token count;
  *   3. exact dedup — one survivor (min id) per identical cleaned text;
  *   4. near dedup  — Jaccard pair kernel → connected components → keep
  *                    each cluster's representative;
  *   5. pack       — contiguous-fill token-budget bins per source shard.
  *
  * The shared stage outputs (cleaned text, exact-deduped corpus) are
  * persisted for their multiple consumers and released before returning —
  * the result comes back eagerly materialized (Util.finishAndRelease), so
  * the regex-cleaning and exact-dedup shuffles run once, not once per
  * downstream stage, and no cached state outlives the call. At 100 TB each
  * stage keeps the scale shape documented in SCALE.md — nothing here
  * collects to the driver.
  */
object TrainingData {

  def prepare(docs: DataFrame, idCol: String, textCol: String,
              sourceCol: String, minTokens: Int = 5,
              jaccardThreshold: Double = 0.9,
              packBudget: Long = 256L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // redact BEFORE normalize (r13): normalizeText maps every char
    // outside [a-z0-9 ] to a space, so redactPii applied AFTER it could
    // never match an email (no '@' or '.' survives) and most formatted
    // phone numbers broke into sub-7-digit runs — the PII pass was
    // silently a near-no-op. Raw-text redaction fires for real (the
    // q_text_clean registry query already ran this order); the
    // placeholder tags then normalize to plain "email"/"number" tokens.
    val cleaned = docs.select(
      col(idCol), col(sourceCol),
      TextFunctions.normalizeText(TextFunctions.redactPii(col(textCol)))
        .as("clean_text"))
      .withColumn("n_tokens",
        size(TextFunctions.tokens(col("clean_text"))).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // exact dedup: keep the minimum id per identical cleaned text —
    // keyed on unhex(md5(clean_text)), not the text itself: a full-text
    // group key ships every document's whole cleaned text through the
    // exchange, i.e. the dedup shuffle carries the corpus. The 128-bit
    // key cuts that payload by orders of magnitude with the same
    // collision semantics as Dedup.exactDuplicates' md5 key. A 64-bit
    // key (xxhash64) is NOT enough here (r14): at billion-doc scale a
    // birthday collision is a few-percent event, and a collision
    // silently DROPS a document — the min-id keeper wins for both texts
    // and the near-dup stage can only remove more docs, never restore
    // one. unhex packs the key to its 16 raw bytes — md5()'s 32-char
    // hex string would double the key payload on this hot exchange for
    // the same 128 bits.
    val keepers = cleaned.groupBy(unhex(md5(col("clean_text"))))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val exactDeduped = cleaned.join(keepers, Seq(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // near dedup: pair kernel within source groups, cluster, keep reps
    val pairs = Dedup.jaccardPairsWithinGroupPrefix(
      exactDeduped, idCol, "clean_text", sourceCol, jaccardThreshold)
    val nearDeduped = Dedup.dedupedCorpus(exactDeduped, idCol, pairs)

    // pack surviving docs into token-budget bins per source shard.
    // clean_text rides through to the output (r12): it is the pipeline's
    // PRIMARY artifact — the text tokenization actually consumes — and
    // the cached frames are released on return, so dropping it forced
    // callers to re-run the whole regex-cleaning pass over the corpus to
    // recover what this function had already computed
    val packed = TextFunctions.packBins(nearDeduped, idCol, "n_tokens",
        sourceCol, packBudget)
      .select(col(idCol), col(sourceCol), col("clean_text"),
        col("n_tokens"), col("bin"))
    graft.Util.finishAndRelease(packed, cleaned, exactDeduped)
  }
}
