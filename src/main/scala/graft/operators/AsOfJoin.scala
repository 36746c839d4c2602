package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTime <= leftTime` within the same key (the classic
  * "latest click before each purchase" / trades-quotes shape).
  *
  * Spark has no built-in; rather than a custom SparkStrategy this is
  * the union + running-`last(ignoreNulls)` window rewrite:
  *
  *   1. tag right rows 0, left rows 1, union them;
  *   2. one window over (key ORDER BY time, tag): carry the latest
  *      non-null right payload forward;
  *   3. keep only left rows.
  *
  * Ties (right.time == left.time) match, mirroring DuckDB's inclusive
  * ASOF JOIN: at equal time the right row sorts first (tag 0 < 1).
  * Ties among RIGHT rows (equal key AND time, different payload) are
  * broken deterministically: the window order carries the payload
  * columns, so the greatest payload tuple wins — never
  * partition-order-dependent.
  *
  * Scale: exactly ONE shuffle (hash by key, sort by time within
  * partitions) regardless of per-key row counts — strictly better than
  * the range-join alternative, which explodes candidate pairs before
  * re-aggregating. Skewed keys degrade to a single partition's sort,
  * handled by AQE skew splitting on the exchange.
  */
object AsOfJoin {

  /** @param left       rows to enrich (kept, one output row each)
    * @param right      rows providing the as-of payload
    * @param key        equi-join key column (same name both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right columns to carry (renamed as given)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Map[String, String]): DataFrame = {

    val leftCols = left.columns.toSeq
    // common layout: key, time, tag, left payload (nulls on right rows),
    // right payload (nulls on left rows)
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .select(
        Seq(col(key), col("_t"), col("_tag")) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          payload.values.toSeq.map(a => lit(null).as(a)): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(0))
      .select(
        Seq(col(key), col("_t"), col("_tag")) ++
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map { case (src, alias) => col(src).as(alias) }.toSeq: _*)

    // Order ties among right rows by the payload columns (nulls-first,
    // so left rows' null payloads never outrank a real right row at the
    // same timestamp); `last()` then deterministically picks the
    // greatest payload tuple among tied right rows.
    val tieBreak = payload.values.toSeq.sorted.map(a => col(a).asc_nulls_first)
    val w = Window.partitionBy(key)
      .orderBy(col("_t").asc +: col("_tag").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.values.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, a) => df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1).drop("_t", "_tag")
  }

  /** FORWARD as-of: earliest right row at-or-after each left row per
    * key (pandas merge_asof direction='forward'). The same one-shuffle
    * union+window kernel run under the reversed time ordering: at
    * equal (key, time) the right row still sorts before the left (tag
    * 0 first under descending tag? no — tag order flips with the
    * direction so ties stay INCLUSIVE), and ties among right rows
    * break toward the SMALLEST payload tuple — the mirror of asof's
    * greatest-tuple rule.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Map[String, String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .select(
        Seq(col(key), col("_t"), col("_tag")) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          payload.values.toSeq.map(a => lit(null).as(a)): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(0))
      .select(
        Seq(col(key), col("_t"), col("_tag")) ++
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map { case (src, alias) => col(src).as(alias) }.toSeq: _*)

    // descending time: "last non-null so far" == earliest right row
    // at-or-after. Right rows (tag 0) sort before left at equal time
    // under ascending tag, keeping equality inclusive; payload
    // descending-nulls-first mirrors asof's deterministic tie rule.
    val tieBreak = payload.values.toSeq.sorted.map(a => col(a).desc_nulls_first)
    val w = Window.partitionBy(key)
      .orderBy(col("_t").desc +: col("_tag").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.values.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, a) => df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1).drop("_t", "_tag")
  }

  /** Backward as-of with a MATCH-VALIDITY bound — pandas merge_asof's
    * `tolerance`: the latest right row at-or-before each left row
    * counts only while `within(leftTime, matchedRightTime)` holds;
    * a staler match leaves the payload null (the left row survives —
    * this bounds STALENESS, it does not filter rows). `within` is a
    * caller-shaped predicate so the bound works for any time type
    * (e.g. `(l, r) => unix_micros(l) - unix_micros(r) <= lit(3600L *
    * 1000000L)` for a one-hour staleness cap on timestamps).
    *
    * Same ONE-shuffle union+window kernel as [[asof]]: the matched
    * right TIME rides the window as one more carried column, and the
    * bound is a pure map-side mask after it — no second join, no
    * candidate blow-up (the range-join formulation of tolerance
    * explodes every in-window pair before re-aggregating).
    */
  def asofWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Map[String, String],
      within: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): DataFrame = {
    val Seq(matchT) = Cols.fresh("asofrt", 1, left, right)
    val joined = asof(left,
      right.withColumn(matchT, col(rightTime)),
      key, leftTime, rightTime,
      payload + (matchT -> matchT))
    val ok = col(matchT).isNotNull && within(col(leftTime), col(matchT))
    payload.values.foldLeft(joined) { (df, a) =>
      df.withColumn(a, when(ok, col(a)))
    }.drop(matchT)
  }

  /** NEAREST as-of (pandas merge_asof direction='nearest'): the closer
    * of the backward and forward matches by absolute time distance;
    * ties (equidistant) go backward, matching pandas. Cost = both
    * directional kernels (two shuffles total) plus a column-wise pick —
    * still linear, still no join blow-up. Only sensible for a single
    * time-typed payload column (the distance is measured on it).
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadAlias: String): DataFrame = {
    val back = asof(left, right, key, leftTime, rightTime,
      Map(rightTime -> "_back"))
    val fwd = asofForward(back, right, key, leftTime, rightTime,
      Map(rightTime -> "_fwd"))
    val lt = col(leftTime).cast("double")
    val db = abs(lt - col("_back").cast("double"))
    val df_ = abs(lt - col("_fwd").cast("double"))
    fwd.withColumn(payloadAlias,
        when(col("_back").isNull, col("_fwd"))
          .when(col("_fwd").isNull, col("_back"))
          .when(db <= df_, col("_back")) // tie -> backward, like pandas
          .otherwise(col("_fwd")))
      .drop("_back", "_fwd")
  }

  /** One tagged event of [[asofStream]]'s merged input: left rows
    * (the side being enriched) carry their event_id; right rows' ids
    * are ignored. */
  case class AsOfEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, is_left: Boolean)
  /** A finalized left row: its latest right timestamp at-or-before it
    * (micros), or null if no right row preceded it. */
  case class AsOfMatched(user_id: Long, event_id: Long, tsMicros: Long,
      matchTsMicros: java.lang.Long)
  private[operators] case class AsOfPend(eventId: Long, tsMicros: Long)
  private[operators] case class AsOfBuffers(clicks: Seq[Long],
      pending: Seq[AsOfPend])

  /** STREAM-STREAM as-of join (T14) — the [[asof]] batch kernel's
    * streaming dual. The union+window rewrite cannot run live (no
    * unbounded window functions over a stream), so the live path
    * keeps per-key buffers in the state store and finalizes each left
    * row only when the EVENT-TIME WATERMARK passes its timestamp —
    * the point after which no earlier right row can still arrive, so
    * the emitted match equals the batch answer by construction.
    *
    * Input contract: tag both streams into [[AsOfEvent]], union them,
    * and `withWatermark("ts", <delay>)` the union BEFORE calling (the
    * watermark drives finalization; without one nothing ever emits).
    *
    * Semantics, matching [[asof]]: inclusive ties (right at exactly
    * the left's timestamp matches); a left row with no preceding
    * right row emits a null match. Late rows — arriving with ts
    * already at-or-under the watermark — are DROPPED (the T4
    * contract): a late right row could otherwise retroactively change
    * an already-emitted answer, which append-mode streaming forbids.
    *
    * State is bounded by the watermark horizon: pending left rows sit
    * only until the watermark passes them, and of the right buffer
    * only rows above the watermark plus the SINGLE latest at-or-below
    * it survive pruning (that one dominates every older right row for
    * any future left row). EventTimeTimeout flushes keys whose
    * finalization is driven purely by other keys advancing the
    * watermark. Output: Append-mode [[AsOfMatched]] rows.
    */
  def asofStream(events: org.apache.spark.sql.Dataset[AsOfEvent])
      : org.apache.spark.sql.Dataset[AsOfMatched] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    def micros(e: AsOfEvent): Long = e.ts.getTime * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfBuffers, AsOfMatched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[AsOfEvent],
            state: GroupState[AsOfBuffers]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmMicros = wmMs * 1000L
          val st0 = state.getOption.getOrElse(AsOfBuffers(Nil, Nil))
          // late-data drop: ts at-or-under the watermark is final
          // territory — admitting it could contradict emitted rows
          val fresh = evs.toArray
            .filter(e => wmMs == 0L || e.ts.getTime > wmMs)
          val clicks = st0.clicks ++
            fresh.filter(!_.is_left).map(micros)
          val pending = st0.pending ++ fresh.filter(_.is_left)
            .map(e => AsOfPend(e.event_id, micros(e)))
          val (ready, stillPending) =
            pending.partition(_.tsMicros <= wmMicros)
          val out = ready.sortBy(p => (p.tsMicros, p.eventId)).map { p =>
            val m = clicks.filter(_ <= p.tsMicros)
            AsOfMatched(user, p.eventId, p.tsMicros,
              if (m.isEmpty) null else java.lang.Long.valueOf(m.max))
          }
          // prune the right buffer: everything above the watermark,
          // plus the one dominating row at-or-below it
          val (newer, older) = clicks.partition(_ > wmMicros)
          val keptClicks =
            (if (older.nonEmpty) Seq(older.max) else Nil) ++ newer
          if (keptClicks.isEmpty && stillPending.isEmpty) state.remove()
          else {
            state.update(AsOfBuffers(keptClicks, stillPending))
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(
                stillPending.map(_.tsMicros).min / 1000L + 1L)
          }
          out.iterator
      }
  }
}
