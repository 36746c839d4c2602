package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.EventWindows

/** Event rows shaped like the events table (subset of columns).
  * Top-level: Spark can't encode inner classes of a test suite.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Structured Streaming semantics (SURVEY.md §2.10 T1–T8).
  *
  * T1–T3 run in batch as judged queries (queries/Streaming.scala); here
  * the IDENTICAL EventWindows transforms run through MemoryStream to
  * prove they are streaming-legal, plus watermark/late-data (T4),
  * streaming dedup (T5), stateful per-key processing (T6),
  * stream–static join (T7), and output modes / foreachBatch sink (T8).
  *
  * Scale: MemoryStream is test scaffolding only — in production the
  * same plans read `spark.readStream.format("parquet"|"kafka")`; state
  * (windows, dedup keys, GroupState) shards by key across executors
  * and watermarks bound state size, so nothing here is driver-bound.
  */
class StreamingSpec extends SparkTestBase {

  private implicit def sqlCtx: SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  private val baseEvents = Seq(
    Ev(0L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
    Ev(1L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0),
    Ev(2L, ts("2024-01-01 00:35:00"), 2L, "view", 3.0),
    Ev(3L, ts("2024-01-01 01:10:00"), 1L, "click", 4.0),
    Ev(4L, ts("2024-01-02 00:00:30"), 2L, "view", 5.0),
  )

  /** Run a streaming DF to completion into a memory sink, return the
    * sink contents as a DataFrame.
    */
  private def runToMemory(sdf: DataFrame, mode: OutputMode,
      name: String): DataFrame = {
    val q = sdf.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("T1/T3 streaming == batch for tumbling and session windows") {
    import spark.implicits._
    val input = MemoryStream[Ev]
    input.addData(baseEvents: _*)

    val streamed = runToMemory(
      EventWindows.tumbling(input.toDF(), "1 day"),
      OutputMode.Complete(), "t1_stream")
    val batch = EventWindows.tumbling(baseEvents.toDF(), "1 day")
    assert(streamed.collect().toSet === batch.collect().toSet)

    val input3 = MemoryStream[Ev]
    input3.addData(baseEvents: _*)
    val streamedSess = runToMemory(
      EventWindows.sessions(input3.toDF(), "30 minutes"),
      OutputMode.Complete(), "t3_stream")
    val batchSess = EventWindows.sessions(baseEvents.toDF(), "30 minutes")
    assert(streamedSess.collect().toSet === batchSess.collect().toSet)
    // fixture sanity: user 1 has sessions {00:05,00:20} and {01:10}
    assert(batchSess.filter($"user_id" === 1L).count() === 2)
  }

  test("T4: watermark drops late data in append mode") {
    import spark.implicits._
    val input = MemoryStream[Ev]
    val windowed = EventWindows.tumbling(
      input.toDF().withWatermark("ts", "1 hour"), "1 hour")

    val q = windowed.writeStream.format("memory").queryName("t4_stream")
      .outputMode(OutputMode.Append()).start()
    // batch 1: events up to 03:00 => watermark advances to 02:00.
    input.addData(
      Ev(0L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
      Ev(1L, ts("2024-01-01 01:10:00"), 1L, "click", 2.0),
      Ev(2L, ts("2024-01-01 03:00:00"), 1L, "click", 4.0))
    q.processAllAvailable()
    // batch 2: a LATE event for the already-closed 00:00 window — must
    // be dropped, not re-emitted, not merged; closed windows emit.
    input.addData(Ev(3L, ts("2024-01-01 00:20:00"), 1L, "click", 100.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t4_stream")
      .select($"w_start", $"n_events", $"sum_value").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((ts("2024-01-01 00:00:00"), 1L, 1.0)),
      "window closed with ONLY the on-time event")
    assert(!rows.exists(_._3 == 100.0), "late event dropped by watermark")
  }

  test("T5: streaming dedup within watermark keeps first occurrence") {
    import spark.implicits._
    val input = MemoryStream[Ev]
    val deduped = input.toDF().withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

    val q = deduped.writeStream.format("memory").queryName("t5_stream")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      Ev(10L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      Ev(10L, ts("2024-01-01 00:05:00"), 1L, "click", 99.0), // dup id
      Ev(11L, ts("2024-01-01 00:10:00"), 2L, "view", 2.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("t5_stream").select($"event_id", $"value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out === Set((10L, 1.0), (11L, 2.0)))
  }

  test("T5b: streaming NEAR-dup dedup via scalar SimHash signature") {
    // The sketch expressions are stateless per-row projections, so they
    // are streaming-legal as-is: near-dup dedup = project the signature,
    // dropDuplicates on it within the watermark. SimHash votes are a
    // commutative sum, so reordered/differently-cased docs (the classic
    // scrape-noise dup) collapse to one survivor.
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val toks = (1 to 30).map(i => s"tok$i")
    val sigs = input.toDF().toDF("doc_id", "ts", "text")
      .withColumn("simhash",
        graft.functions.SimHashArrayExpr.simhashArray(
          split(lower(col("text")), " ")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("simhash"))

    val q = sigs.writeStream.format("memory").queryName("t5b_stream")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (1L, ts("2024-01-01 00:00:00"), toks.mkString(" ")),
      (2L, ts("2024-01-01 00:01:00"), toks.reverse.map(_.toUpperCase).mkString(" ")), // reordered + recased
      (3L, ts("2024-01-01 00:02:00"), (1 to 30).map(i => s"other$i").mkString(" ")))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("t5b_stream").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(3L), s"kept=$kept")
    assert(!kept.contains(2L), "near-dup must collapse onto doc 1's signature")
  }

  test("T5c: incremental dedup runs UNCHANGED with a streaming incoming side") {
    // minHashLshNearDupAgainst's plan is streaming-legal end-to-end
    // when `incoming` is a stream: signature/banding are stateless
    // per-row projections, the candidate join and both verify joins
    // are stream-static equi-joins, and the candidate distinct() is
    // streaming deduplication — so the SAME operator that dedups a
    // batch against the corpus dedups a live feed against it.
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    // expected pairs from the fully-batch run of the same operator
    val incomingBatch = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") >= 60 && col("doc_id") < 120)
      .select("doc_id", "text")
    val want = graft.operators.Dedup.minHashLshNearDupAgainst(
        corpus, incomingBatch, "doc_id", "text", 0.9, bands = 12, rowsPerBand = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "fixture sanity: scopes share near-dups")

    val input = MemoryStream[(Long, String)]
    val streamed = graft.operators.Dedup.minHashLshNearDupAgainst(
      corpus, input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", 0.9, bands = 12, rowsPerBand = 6)
    val q = streamed.writeStream.format("memory").queryName("t5c_stream")
      .outputMode(OutputMode.Append()).start()
    incomingBatch.collect().foreach(r => input.addData((r.getLong(0), r.getString(1))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t5c_stream").select($"i", $"j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, "streaming run must emit the batch run's exact pair set")
  }

  test("T6: stateful per-key running count via flatMapGroupsWithState") {
    import spark.implicits._
    val input = MemoryStream[Ev]

    val counted = input.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator((user, n))
      }

    val q = counted.toDF("user_id", "n").writeStream.format("memory")
      .queryName("t6_stream").outputMode(OutputMode.Update()).start()
    input.addData(baseEvents.take(3): _*) // users 1,1,2
    q.processAllAvailable()
    input.addData(baseEvents.drop(3): _*) // users 1,2 → totals 3 and 2
    q.processAllAvailable()
    q.stop()

    val latest = spark.table("t6_stream").groupBy($"user_id")
      .agg(max($"n").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(latest === Map(1L -> 3L, 2L -> 2L),
      "state accumulates across micro-batches per key")
  }

  test("custom mergeable aggregates are streaming-legal: MG sketch in complete mode") {
    import spark.implicits._
    // the Misra-Gries TypedImperativeAggregate must merge across
    // micro-batches like any algebraic agg — state is its buffer
    val input = MemoryStream[String]
    val sketched = input.toDF().toDF("tok")
      .agg(graft.functions.FrequentItemsAgg.freqSketch(col("tok"), 16).as("hh"))
    val q = sketched.writeStream.format("memory").queryName("mg_stream")
      .outputMode(OutputMode.Complete()).start()
    input.addData("a", "b", "a")
    q.processAllAvailable()
    input.addData("a", "c", "b", "a")
    q.processAllAvailable()
    q.stop()
    val last = spark.table("mg_stream").collect().last.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacity 16 > 3 distinct: exact regime even over the stream
    assert(last === Map("a" -> 4L, "b" -> 2L, "c" -> 1L),
      s"MG sketch must accumulate exactly across micro-batches: $last")
  }

  test("T7: stream-static join enriches events with a dim table") {
    import spark.implicits._
    val input = MemoryStream[Ev]
    val static = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")

    // stream side drives; static side re-resolves per micro-batch
    val joined = input.toDF().join(static, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("t7_stream")
      .outputMode(OutputMode.Append()).start()
    input.addData(baseEvents: _*)
    q.processAllAvailable()
    q.stop()

    val names = spark.table("t7_stream").select($"event_id", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(names(0L) === "alice" && names(2L) === "bob")
    assert(names.size === baseEvents.size)
  }

  test("S6: parquet directory as a streaming source (file discovery)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s6src").toString
    baseEvents.take(3).toDF().write.mode("append").parquet(dir)

    val sdf = spark.readStream
      .schema(baseEvents.take(1).toDF().schema) // streaming scans need an explicit schema
      .parquet(dir)
    val counted = EventWindows.tumbling(sdf, "1 day")
    val q = counted.writeStream.format("memory").queryName("s6_stream")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    // late-arriving FILE (not row): a second parquet drop is discovered
    // by the next micro-batch
    baseEvents.drop(3).toDF().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val total = spark.table("s6_stream")
      .agg(sum($"n_events")).head.getLong(0)
    assert(total === baseEvents.size, "both file drops were ingested")
  }

  test("stream-stream join: watermarked time-range join across two streams") {
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]

    // purchases join the clicks of the SAME user within the preceding
    // hour — both sides watermarked so the join state is bounded
    // (unbounded stream-stream joins are rejected in append mode)
    val c = clicks.toDF().select($"user_id", $"ts".as("click_ts"),
      $"value".as("click_v")).withWatermark("click_ts", "1 hour")
    val p = purchases.toDF().select($"user_id".as("p_user"),
      $"ts".as("p_ts"), $"event_id").withWatermark("p_ts", "1 hour")
    val joined = p.join(c,
      $"p_user" === $"user_id" &&
        $"click_ts" <= $"p_ts" && $"click_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR"))

    val q = joined.writeStream.format("memory").queryName("ss_stream")
      .outputMode(OutputMode.Append()).start()
    clicks.addData(
      Ev(0L, ts("2024-01-01 09:30:00"), 1L, "click", 1.0),
      Ev(1L, ts("2024-01-01 07:00:00"), 1L, "click", 2.0), // > 1h before
      Ev(2L, ts("2024-01-01 09:45:00"), 2L, "click", 3.0)) // other user
    purchases.addData(
      Ev(10L, ts("2024-01-01 10:00:00"), 1L, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ss_stream")
      .select($"event_id", $"click_v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows === Set((10L, 1.0)),
      "only the same-user click within the hour joins")
  }

  test("T14 stream-stream as-of join: the watermark finalizes each " +
      "purchase at the batch answer, orphans emit null, late rows on " +
      "either side drop, and the result equals the batch asof kernel") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    import graft.operators.AsOfJoin.{AsOfEvent, AsOfMatched}
    implicit val sqlCtx: SQLContext = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[AsOfEvent]
    val out = AsOfJoin.asofStream(
      input.toDS().withWatermark("ts", "1 hour").as[AsOfEvent])
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 has two clicks then a purchase; user 2 a
    // purchase with no click at all
    input.addData(
      AsOfEvent(1L, 0L, t("2024-01-01 09:00:00"), is_left = false),
      AsOfEvent(1L, 0L, t("2024-01-01 09:30:00"), is_left = false),
      AsOfEvent(1L, 100L, t("2024-01-01 10:00:00"), is_left = true),
      AsOfEvent(2L, 200L, t("2024-01-01 08:00:00"), is_left = true))
    q.processAllAvailable()
    // processAllAvailable runs the follow-up empty batch with the
    // post-batch watermark (10:00 − 1h = 09:00): user 2's 08:00
    // orphan finalizes VIA EVENT-TIME TIMEOUT already; user 1's
    // 10:00 purchase is still above the watermark and stays pending
    val mid = spark.table("asof_stream").as[AsOfMatched].collect()
    assert(mid.map(_.event_id).toSet === Set(200L), mid.toSeq.toString)
    assert(mid.head.matchTsMicros == null, "orphan purchase -> null")
    // batch 2: an unrelated key's click advances the watermark to
    // 12:00 — user 1's purchase emits the 09:30 click
    // (inclusive-backward, the batch kernel's answer)
    input.addData(AsOfEvent(3L, 0L, t("2024-01-01 13:00:00"),
      is_left = false))
    q.processAllAvailable()
    // batch 3: watermark on to 13:00; no semantic change
    input.addData(AsOfEvent(3L, 0L, t("2024-01-01 14:00:00"),
      is_left = false))
    q.processAllAvailable()
    // batch 4: late rows on both sides (ts far under the watermark)
    // are dropped — no retroactive change, no new output
    input.addData(
      AsOfEvent(1L, 0L, t("2024-01-01 09:45:00"), is_left = false),
      AsOfEvent(1L, 300L, t("2024-01-01 09:50:00"), is_left = true))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof_stream").as[AsOfMatched].collect()
      .map(m => m.event_id -> Option(m.matchTsMicros).map(_.toLong))
      .toMap
    assert(rows === Map(
      100L -> Some(t("2024-01-01 09:30:00").getTime * 1000L),
      200L -> None), rows.toString)
    // batch-dual: the asof kernel on the same delivered events gives
    // exactly these matches
    val left = Seq((1L, 100L, t("2024-01-01 10:00:00")),
      (2L, 200L, t("2024-01-01 08:00:00")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq((1L, t("2024-01-01 09:00:00")),
      (1L, t("2024-01-01 09:30:00")), (3L, t("2024-01-01 13:00:00")),
      (3L, t("2024-01-01 14:00:00")))
      .toDF("user_id", "cts")
    val batch = AsOfJoin.asof(left, right, "user_id", "ts", "cts",
        Map("cts" -> "click_ts"))
      .collect().map(r => r.getLong(1) ->
        Option(r.getAs[Timestamp]("click_ts"))
          .map(_.getTime * 1000L)).toMap
    assert(batch === rows, s"stream $rows != batch $batch")
  }

  test("T8: foreachBatch writes micro-batches to a parquet sink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t8sink").toString
    val input = MemoryStream[Ev]

    val q = input.toDF().writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(dir)
      }
      .outputMode(OutputMode.Append()).start()
    input.addData(baseEvents.take(2): _*)
    q.processAllAvailable()
    input.addData(baseEvents.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val sunk = spark.read.parquet(dir)
    assert(sunk.count() === baseEvents.size)
    assert(sunk.select($"batch_id").distinct().count() >= 2,
      "two micro-batches produced two distinct batch ids")
  }

  test("quantile sketch stream: per-key state accumulates across " +
      "micro-batches; exact-regime quantiles equal the batch aggregate " +
      "whatever the batch boundaries") {
    import spark.implicits._
    import graft.functions.QuantileSketch
    import graft.functions.QuantileSketch.{SketchEvent, SketchOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SketchEvent]
    val out = QuantileSketch.sketchStream(input.toDS(), k = 256)
    val q = out.writeStream.format("memory").queryName("qsk_stream")
      .outputMode("update").start()
    // key 1: 1..10 split across two batches; key 2: one batch
    input.addData((1 to 6).map(i => SketchEvent(1L, i.toDouble)) ++
      Seq(SketchEvent(2L, 100.0)): _*)
    q.processAllAvailable()
    input.addData((7 to 10).map(i => SketchEvent(1L, i.toDouble)): _*)
    q.processAllAvailable()
    q.stop()
    val finals = spark.table("qsk_stream")
      .orderBy($"key", $"n".desc)
      .as[SketchOut].collect()
      .groupBy(_.key).view.mapValues(_.head).toMap
    assert(finals(1L).n === 10L && finals(2L).n === 1L)
    val sk1 = QuantileSketch.deserialize(finals(1L).sketch)
    assert(sk1.quantile(0.5) === Some(5.0) && sk1.quantile(0.9) === Some(9.0))
    // bit-identical quantiles to the batch aggregate (exact regime)
    val batch = (1 to 10).map(i => Tuple1(i.toDouble)).toDF("v")
      .agg(QuantileSketch.sketchAgg($"v", 256).as("sk"))
      .select(QuantileSketch.quantileOf($"sk", 0.5),
        QuantileSketch.quantileOf($"sk", 0.9)).collect().head
    assert(batch.getDouble(0) === 5.0 && batch.getDouble(1) === 9.0)
  }

  test("T15 streaming exact dedup: within the watermark horizon " +
      "first-arrival wins across micro-batches; expired state lets " +
      "an ancient re-send re-emit (the bounded-state contract); the " +
      "in-horizon keeps equal batch Dedup.exact") {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[Ev]
    val out = graft.operators.Dedup.exactStream(
      input.toDF(), "ts", "1 hour", Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      Ev(1L, t("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Ev(1L, t("2024-01-01 10:05:00"), 1L, "click", 2.0), // dup drops
      Ev(2L, t("2024-01-01 10:10:00"), 2L, "click", 3.0))
    q.processAllAvailable()
    // a second micro-batch redelivery inside the horizon still drops
    input.addData(Ev(1L, t("2024-01-01 10:20:00"), 1L, "click", 4.0))
    q.processAllAvailable()
    val early = spark.table("dedup_stream").as[Ev].collect()
    assert(early.map(e => e.event_id -> e.value).sorted.toSeq ===
      Seq(1L -> 1.0, 2L -> 3.0), early.toSeq.toString)
    // advance the watermark far past id 1's state, then re-send: the
    // expired key re-emits — bounded state, documented
    input.addData(Ev(99L, t("2024-01-01 20:00:00"), 9L, "click", 0.0))
    q.processAllAvailable()
    input.addData(Ev(1L, t("2024-01-01 20:30:00"), 1L, "click", 5.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("dedup_stream").as[Ev].collect()
    assert(all.count(_.event_id == 1L) == 2,
      "expired state re-admits the ancient re-send: " + all.toSeq)
    // batch dual on the first horizon's delivered events
    val batch = graft.operators.Dedup.exact(
      Seq((1L, 1.0), (1L, 2.0), (2L, 3.0), (1L, 4.0))
        .toDF("event_id", "value").withColumn("id", col("value")),
      "id", Seq("event_id"))
    assert(batch.count() == 2, "two distinct keys in the horizon")
  }
}
