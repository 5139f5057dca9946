package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) left join: for each left row, the single right row
  * with the greatest right timestamp <= the left timestamp, per key.
  * Spark has no native ASOF JOIN; the naive formulation is a per-row
  * correlated subquery or an exploding range join. This operator composes
  * built-ins instead:
  *
  *   union both sides tagged → one window per key ordered by
  *   (ts, right-before-left) → `last_value(..., ignoreNulls)` carries the
  *   most recent right payload forward → keep the left rows.
  *
  * One shuffle on the key, one per-key sort, zero row explosion — the
  * shape that survives a 100 TB fact side. Ties at the same (key, ts) on
  * the right must be pre-deduplicated by the caller for determinism.
  */
object AsOfJoin {

  /** Output: all left columns + the requested right payload columns
    * (null when no right row is at-or-before — `direction = "backward"`,
    * the default — or at-or-after — `"forward"` — the left timestamp).
    * A payload name that collides with a left column is emitted with a
    * `_right` suffix (underscores appended until unique), SQL-join style —
    * the left column always survives untouched.
    *
    * `toleranceSeconds` (pandas `merge_asof` parity): a match further than
    * the tolerance from the left timestamp is treated as no match — its
    * payload comes back null. Implemented by carrying the matched right
    * timestamp through the same window as the payload and nulling
    * out-of-tolerance rows afterwards, so the plan shape (one shuffle, one
    * per-key sort) is unchanged. */
  def asofLeftJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   payload: Seq[String],
                   direction: String = "backward",
                   toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(toleranceSeconds.forall(_ >= 0), "tolerance must be >= 0")
    // reserved internal names (r13): an input column literally named
    // __graft_ts/__graft_key/... would be silently OVERWRITTEN by the
    // withColumns below and returned corrupted (the final select reads
    // it back by name) — refuse loudly instead
    val reserved = (left.columns ++ right.columns)
      .filter(_.startsWith("__graft_"))
    require(reserved.isEmpty,
      s"asofLeftJoin: input columns ${reserved.mkString(", ")} collide " +
        "with reserved __graft_* internal names — rename them first")
    val leftCols = left.columns.toSeq
    // tolerance needs the matched right timestamp: ride it through the
    // carry window as one more (internal) payload column
    val matchTs = "__graft_mts"
    val payloadAll =
      if (toleranceSeconds.isDefined) payload :+ matchTs else payload
    // output name per payload column: auto-deconflict against left names
    // and against the other payload output names
    val outName: Map[String, String] = {
      var taken = leftCols.toSet
      payloadAll.map { c =>
        var n = if (taken.contains(c)) c + "_right" else c
        while (taken.contains(n)) n = n + "_"
        taken += n
        c -> n
      }.toMap
    }
    // NULL-key left rows can match nothing (the right side's null keys
    // are filtered below), yet routed through the window they ALL land
    // in the single NULL partition — one task sorts every null-key fact
    // row, a straggler at clickstream null-id density (r13). They need
    // no carry at all: route them AROUND the window and union them back
    // null-padded at the end.
    val lNullKey = left.filter(col(leftKey).isNull)
    val l = left.filter(col(leftKey).isNotNull)
      .withColumn("__graft_key", col(leftKey))
      .withColumn("__graft_ts", col(leftTs))
      .withColumn("__graft_is_left", lit(1))
    // a NULL right timestamp can never satisfy ts <= / >= anything (ASOF
    // semantics; DuckDB agrees) — but unfiltered it would sort first and
    // its payload would be carried into early left rows. A NULL right KEY
    // can never satisfy the equality either (r12): the window's
    // partitionBy groups NULL keys together, so unfiltered it would match
    // NULL-key left rows the way no SQL equality join does
    val r = right.filter(col(rightTs).isNotNull && col(rightKey).isNotNull)
      .withColumn("__graft_key", col(rightKey))
      .withColumn("__graft_ts", col(rightTs))
      .withColumn("__graft_is_left", lit(0))
      .withColumn(matchTs, col(rightTs))
    // the payload is carried as ONE struct, never column-by-column: a
    // NULL cell in the matched row must come through as NULL, not be
    // papered over by an older row's non-null value for that column
    // (per-column ignoreNulls carries would stitch together a row that
    // never existed)
    val rProjected = r.select(col("__graft_key"), col("__graft_ts"),
      col("__graft_is_left"),
      struct(payloadAll.map(c => col(c).as(c)): _*).as("__graft_p"))
    val pType = rProjected.schema("__graft_p").dataType
    val lProjected = l
      .withColumn("__graft_p", lit(null).cast(pType))
      .select((leftCols ++
        Seq("__graft_key", "__graft_ts", "__graft_is_left", "__graft_p"))
        .map(col): _*)
    val unioned = lProjected.unionByName(rProjected,
      allowMissingColumns = true)
    // backward: right rows sort before left rows at equal ts and the most
    // recent right payload is carried FORWARD over (preceding..current] —
    // so a right row AT the left timestamp matches (<= semantics).
    // forward: the mirror image — right rows sort after left rows at equal
    // ts and the NEXT right payload is carried BACKWARD over
    // [current..following) (>= semantics).
    val carried =
      if (direction == "backward") {
        val w = Window.partitionBy(col("__graft_key"))
          .orderBy(col("__graft_ts"), col("__graft_is_left"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__graft_c",
          last(col("__graft_p"), ignoreNulls = true).over(w))
      } else {
        val w = Window.partitionBy(col("__graft_key"))
          .orderBy(col("__graft_ts"), col("__graft_is_left").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        unioned.withColumn("__graft_c",
          first(col("__graft_p"), ignoreNulls = true).over(w))
      }
    // a NULL LEFT timestamp matches nothing in either direction (r12):
    // ascending sort puts NULLs first, which the backward frame handles
    // by accident (nothing precedes) but the forward frame does not —
    // [current..following) from a NULL-ts row sees EVERY right row and
    // would carry the earliest payload into a row ASOF semantics says
    // must stay null-padded
    val kept = payloadAll.foldLeft(
        carried.filter(col("__graft_is_left") === 1))((df, c) =>
      df.withColumn(outName(c),
        when(col("__graft_ts").isNotNull, col("__graft_c").getField(c))))
    val toleranced = toleranceSeconds match {
      case None => kept
      case Some(tol) =>
        val inTol = col(outName(matchTs)).isNotNull &&
          abs(unix_micros(col("__graft_ts").cast("timestamp")) -
            unix_micros(col(outName(matchTs)).cast("timestamp"))) <=
            tol * 1000000L
        payload.foldLeft(kept)((df, c) =>
          df.withColumn(outName(c), when(inTol, col(outName(c)))))
    }
    val outCols = leftCols ++ payload.map(outName)
    val joined = toleranced.select(outCols.map(col): _*)
    // the routed-around null-key rows, padded with typed null payloads —
    // exactly what the window produced for them before (right null keys
    // never matched), minus the straggler
    val pStruct = pType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val padded = payload.foldLeft(lNullKey)((df, c) =>
      df.withColumn(outName(c), lit(null).cast(pStruct(c).dataType)))
    joined.unionByName(padded.select(outCols.map(col): _*))
  }
}
