package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.EventWindows

/** Row-level sessionization: hand fixture, consistency with the
  * session_window aggregates on the real events table, and
  * tie/partitioning determinism.
  */
class SessionizeSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def fixture = {
    import spark.implicits._
    Seq(
      // user u1: 0m, 10m, then 40m (gap 30m >= 30m -> NEW session),
      // then 41m (same session)
      ("u1", 1L, ts(0)), ("u1", 2L, ts(10)), ("u1", 3L, ts(40)),
      ("u1", 4L, ts(41)),
      // user u2: single event
      ("u2", 5L, ts(5)),
    ).toDF("user_id", "event_id", "ts")
  }

  test("gap >= threshold opens a session; first event is session 1") {
    val out = EventWindows.sessionize(fixture, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "event_id", "session_no")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      ("u1", 1L, 1L), ("u1", 2L, 1L), ("u1", 3L, 2L), ("u1", 4L, 2L),
      ("u2", 5L, 1L)))
  }

  test("per-(user, session) bounds agree with session_window aggregates") {
    val events = graft.tables.TableLoader.events(spark, sfDir)
    val rows = EventWindows.sessionize(events, "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id", "session_no")
      .agg(min("ts").as("s_start"), max("ts").as("mx"),
        count(lit(1)).as("n_events"))
      .withColumn("s_end", col("mx") + expr("INTERVAL 30 MINUTE"))
      .select("user_id", "s_start", "s_end", "n_events")
    val agg = EventWindows.sessions(events, "30 minutes")
      .select("user_id", "s_start", "s_end", "n_events")
    assert(rows.exceptAll(agg).count() === 0L)
    assert(agg.exceptAll(rows).count() === 0L)
  }

  test("streaming sessionize == batch sessionize on the real events table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.EventWindows.SessionEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = graft.tables.TableLoader.events(spark, sfDir)
    val batch = EventWindows.sessionize(events, "user_id", "ts", "event_id", 1800L)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("session_no"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // feed events in event-time order split across TWO micro-batches so
    // cursors must survive the batch boundary
    val ordered = events.select(col("user_id").cast("long"),
        col("event_id").cast("long"), unix_micros(col("ts")).as("us"))
      .orderBy("us", "event_id")
      .collect().map(r => SessionEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
    val input = MemoryStream[SessionEvent]
    val q = EventWindows.sessionizeStream(input.toDS(), 1800L)
      .toDF("user_id", "event_id", "session_no")
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append()).start()
    val (first, second) = ordered.splitAt(ordered.length / 2)
    input.addData(first.toIndexedSeq: _*)
    q.processAllAvailable()
    input.addData(second.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch,
      "streaming cursor must reproduce the batch window result exactly")
  }

  test("timestamp ties break on the tie column, not on partitioning") {
    import spark.implicits._
    val tied = Seq(
      ("u1", 2L, ts(0)), ("u1", 1L, ts(0)), ("u1", 3L, ts(45)),
    ).toDF("user_id", "event_id", "ts")
    val a = EventWindows.sessionize(tied, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_no").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = EventWindows.sessionize(tied.repartition(7), "user_id", "ts",
        "event_id", 1800L)
      .select("event_id", "session_no").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("sessionTranscripts: hand fixture with ties and a gap") {
    import spark.implicits._
    val t0 = 1700000000000000L // epoch micros
    def ts(offSec: Long) = new Timestamp((t0 + offSec * 1000000L) / 1000L)
    val ev = Seq(
      (1L, 1L, ts(0), "view"),
      (1L, 3L, ts(60), "click"),   // same ts as event 2: tie broken by id
      (1L, 2L, ts(60), "view"),
      (1L, 4L, ts(60 + 1800), "buy") // exactly the gap: new session
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventWindows.sessionTranscripts(ev, "user_id", "ts",
        "event_id", "event_type", gapSeconds = 1800L)
      .orderBy("session_no").collect()
      .map(r => (r.getAs[Long]("session_no"), r.getAs[String]("transcript"),
        r.getAs[Long]("n_events"), r.getAs[Long]("span_sec")))
    assert(out.toSeq === Seq(
      (1L, "view>view>click", 3L, 60L), // id 2 before id 3 on the tied ts
      (2L, "buy", 1L, 0L)))
  }

  test("sessionTranscripts on real events: consistent with sessionize") {
    val events = graft.tables.TableLoader.events(spark, sfDir)
    val tr = EventWindows.sessionTranscripts(events, "user_id", "ts",
      "event_id", "event_type", 1800L).cache()
    val sess = EventWindows.sessionize(events, "user_id", "ts",
      "event_id", 1800L)
    assert(tr.count() ===
      sess.select("user_id", "session_no").distinct().count(),
      "one transcript per (user, session)")
    assert(tr.agg(sum("n_events")).collect().head.getLong(0) === events.count(),
      "every event lands in exactly one transcript")
    // separator count == n_events - 1 for every transcript
    val bad = tr.filter(
      size(split(col("transcript"), ">", -1)) =!= col("n_events")).count()
    assert(bad === 0L, "transcript length matches n_events")
    tr.unpersist()
  }

  test("topPaths: flows never cross a session boundary; counts exact") {
    import spark.implicits._
    // u1 session A: a,b,c,b -> paths a>b>c, b>c>b; 30-min gap; then
    // session B: a,b,c -> a>b>c again. u2: a,b,c -> a>b>c.
    val df = Seq(
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(1), "b"), (1L, 3L, ts(2), "c"),
      (1L, 4L, ts(3), "b"),
      (1L, 5L, ts(40), "a"), (1L, 6L, ts(41), "b"), (1L, 7L, ts(42), "c"),
      (2L, 8L, ts(0), "a"), (2L, 9L, ts(1), "b"), (2L, 10L, ts(2), "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventWindows.topPaths(df, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800L, pathLen = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 3L, "b>c>b" -> 1L),
      s"no path spans the u1 session gap (no c>b>a / b>a>b): $out")
  }

  test("topPaths: k truncates under the (n DESC, path ASC) total order") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, ts(0), "x"), (1L, 2L, ts(1), "y"), (1L, 3L, ts(2), "z"),
      (2L, 4L, ts(0), "p"), (2L, 5L, ts(1), "q"), (2L, 6L, ts(2), "r"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventWindows.topPaths(df, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800L, pathLen = 3, k = 1)
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "p>q>r",
      s"tie on n=1 broken by path asc: ${out.toList}")
  }

  test("dwellTimes hand fixture: exact micros, last event excluded") {
    import spark.implicits._
    // u1: a@0s -> b@10s -> a@25s (last excluded): dwell(a)=10s, dwell(b)=15s
    // u2: a@0s -> a@2s: dwell(a)=2s
    val ev = Seq(
      ("u1", Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a"),
      ("u1", Timestamp.valueOf("2024-01-01 00:00:10"), 2L, "b"),
      ("u1", Timestamp.valueOf("2024-01-01 00:00:25"), 3L, "a"),
      ("u2", Timestamp.valueOf("2024-01-01 00:00:00"), 4L, "a"),
      ("u2", Timestamp.valueOf("2024-01-01 00:00:02"), 5L, "a"))
      .toDF("u", "ts", "eid", "t")
    val out = EventWindows.dwellTimes(ev, "u", "ts", "eid", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") == ((2L, 12L, 6.0)), out.toString)
    assert(out("b") == ((1L, 15L, 15.0)), out.toString)
  }

  test("streaming debounce == batch debounce on real events; " +
      "streaming dwell aggregates to batch dwellTimes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.EventWindows.TypedEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = graft.tables.TableLoader.events(spark, sfDir)
      .select(col("user_id").cast("long").as("u"), col("event_type").as("t"),
        col("event_id").cast("long").as("eid"), unix_micros(col("ts")).as("us"))
    val typed = ev.collect().map(r =>
      TypedEvent(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.orderMicros, e.event_id))

    val batchDebounce = graft.operators.EventWindows.debounce(
        graft.tables.TableLoader.events(spark, sfDir),
        "user_id", "ts", "event_id", "event_type", minGapSeconds = 3600)
      .select(col("event_id").cast("long")).collect().map(_.getLong(0)).toSet
    val inD = MemoryStream[TypedEvent]
    val qd = graft.operators.EventWindows.debounceStream(inD.toDS(), 3600L)
      .writeStream.format("memory").queryName("deb_stream")
      .outputMode(OutputMode.Append()).start()
    val (d1, d2) = typed.splitAt(typed.length / 2)
    inD.addData(d1.toIndexedSeq: _*); qd.processAllAvailable()
    inD.addData(d2.toIndexedSeq: _*); qd.processAllAvailable()
    qd.stop()
    val streamedDebounce = spark.table("deb_stream")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamedDebounce === batchDebounce,
      "streaming survivors must equal the batch lag filter exactly")

    val batchDwell = graft.operators.EventWindows.dwellTimes(
        graft.tables.TableLoader.events(spark, sfDir),
        "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val inW = MemoryStream[TypedEvent]
    val qw = graft.operators.EventWindows.dwellStream(inW.toDS())
      .writeStream.format("memory").queryName("dwell_stream")
      .outputMode(OutputMode.Append()).start()
    inW.addData(d1.toIndexedSeq: _*); qw.processAllAvailable()
    inW.addData(d2.toIndexedSeq: _*); qw.processAllAvailable()
    qw.stop()
    val streamedDwell = spark.table("dwell_stream")
      .groupBy(col("etype").as("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(dwell_micros) DIV 1000000 AS BIGINT)").as("tot"),
        round(sum("dwell_micros") / (count(lit(1)) * lit(1000000.0)), 6)
          .cast("double").as("avg"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(streamedDwell === batchDwell,
      "per-type aggregate of streamed dwells must equal batch dwellTimes")
  }

  test("topKStream: cross-batch merge keeps the true top-k; one-batch " +
      "emission equals the window reference on real events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.EventWindows.TopKRow
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // cross-batch merge on a hand key
    val in1 = MemoryStream[TopKRow]
    val q1 = graft.operators.EventWindows.topKStream(in1.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_merge")
      .outputMode(OutputMode.Append()).start()
    in1.addData(TopKRow("a", 1L, 1.0), TopKRow("a", 2L, 5.0),
      TopKRow("a", 3L, 3.0))
    q1.processAllAvailable()
    in1.addData(TopKRow("a", 4L, 4.0))
    q1.processAllAvailable()
    q1.stop()
    val emissions = spark.table("topk_merge").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // batch 1 emits {(2,5),(3,3)}; batch 2 re-emits (2,5) with (4,4)
    assert(emissions == Map((2L, 5.0) -> 2, (3L, 3.0) -> 1,
      (4L, 4.0) -> 1), emissions.toString)

    // single-batch equivalence with the window reference on real data
    val ev = graft.tables.TableLoader.events(spark, sfDir)
      .select(col("event_type").as("key"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
    val expect = ev.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val in2 = MemoryStream[TopKRow]
    val q2 = graft.operators.EventWindows.topKStream(in2.toDS(), k = 5)
      .writeStream.format("memory").queryName("topk_real")
      .outputMode(OutputMode.Append()).start()
    in2.addData(ev.collect().map(r =>
      TopKRow(r.getString(0), r.getLong(1), r.getDouble(2))).toIndexedSeq: _*)
    q2.processAllAvailable()
    q2.stop()
    val got = spark.table("topk_real").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect,
      "one-batch streaming top-k must equal the batch window top-k")
  }

  test("cohortValue hand fixture: exact cumulative LTV per cohort member") {
    import spark.implicits._
    // cohort 2024-01-01: u1, u2 (both first-seen day 1).
    //   day 0: u1 spends 10, u2 spends 6 -> cum 16, per-user 8.0
    //   day 2: u1 spends 4            -> cum 20, per-user 10.0
    // cohort 2024-01-02: u3 alone, spends 3 -> per-user 3.0
    val ev = Seq(
      ("u1", Timestamp.valueOf("2024-01-01 01:00:00"), 10.0),
      ("u2", Timestamp.valueOf("2024-01-01 02:00:00"), 6.0),
      ("u1", Timestamp.valueOf("2024-01-03 01:00:00"), 4.0),
      ("u3", Timestamp.valueOf("2024-01-02 01:00:00"), 3.0))
      .toDF("u", "ts", "v")
    val out = EventWindows.cohortValue(ev, "u", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("2024-01-01", 0L)) == ((2L, 8.0)), out.toString)
    assert(out(("2024-01-01", 2L)) == ((1L, 10.0)), out.toString)
    assert(out(("2024-01-02", 0L)) == ((1L, 3.0)), out.toString)
  }

  test("debounce hand fixture: gap to previous RAW event, per (user, type)") {
    import spark.implicits._
    // gap 5s: a@0 keep, a@3 drop (3s gap), a@7 drop (4s from the RAW
    // previous a@3 — survivor-relative would have kept it), a@13 keep
    // (6s); b@1 keeps independently of the a-chain
    val ev = Seq(
      ("u", Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a"),
      ("u", Timestamp.valueOf("2024-01-01 00:00:03"), 2L, "a"),
      ("u", Timestamp.valueOf("2024-01-01 00:00:07"), 3L, "a"),
      ("u", Timestamp.valueOf("2024-01-01 00:00:13"), 4L, "a"),
      ("u", Timestamp.valueOf("2024-01-01 00:00:01"), 5L, "b"))
      .toDF("u", "ts", "eid", "t")
    val kept = EventWindows.debounce(ev, "u", "ts", "eid", "t",
        minGapSeconds = 5)
      .collect().map(_.getLong(2)).toSet
    assert(kept == Set(1L, 4L, 5L), kept.toString)
  }

  test("cusumStream is row-for-row bit-equal to batch cusumDetect " +
      "on real events (cross-batch state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.EventWindows.KeyedValue
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val raw = graft.tables.TableLoader.events(spark, sfDir)
    val batch = graft.operators.Stats.cusumDetect(raw,
        "event_type", "event_id", "value",
        target = 100.0, slack = 5.0, threshold = 500.0)
      .collect().map(r => r.getLong(1) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    // the batch order key is event_id, so the stream's order key must
    // be the same total order — feed event_id as orderMicros (in
    // production both sides would key on the same event-time column)
    val typed = raw.select(col("event_type"), col("event_id").cast("long"),
        col("value").cast("double"))
      .collect().map(r =>
        KeyedValue(r.getString(0), r.getLong(1), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e.orderMicros, e.event_id))
    val in = MemoryStream[KeyedValue]
    val q = graft.operators.EventWindows.cusumStream(in.toDS(),
        target = 100.0, slack = 5.0, threshold = 500.0)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode(OutputMode.Append()).start()
    val (c1, c2) = typed.splitAt(typed.length / 2)
    in.addData(c1.toIndexedSeq: _*); q.processAllAvailable()
    in.addData(c2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cusum_stream").collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(streamed.size == batch.size)
    batch.foreach { case (id, sv) =>
      assert(streamed(id) == sv, s"event $id: ${streamed(id)} vs $sv")
    }
  }

  test("attributionStream emissions aggregate to batch touchAttribution " +
      "on real events (cross-batch state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.EventWindows.TypedEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val raw = graft.tables.TableLoader.events(spark, sfDir)
    val batch = graft.operators.EventWindows.touchAttribution(raw,
        "user_id", "ts", "event_id", "event_type",
        col("event_type") === "purchase")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val typed = raw.select(col("user_id").cast("long"), col("event_type"),
        col("event_id").cast("long"), unix_micros(col("ts")))
      .collect().map(r =>
        TypedEvent(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.orderMicros, e.event_id))
    val in = MemoryStream[TypedEvent]
    val q = graft.operators.EventWindows.attributionStream(in.toDS(),
        "purchase")
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode(OutputMode.Append()).start()
    val (a1, a2) = typed.splitAt(typed.length / 2)
    in.addData(a1.toIndexedSeq: _*); q.processAllAvailable()
    in.addData(a2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val emissions = spark.table("attr_stream").collect()
      .map(r => (r.getString(2), r.getString(3)))
    val streamed = (emissions.map(_._1).groupBy(identity).keySet ++
      emissions.map(_._2).groupBy(identity).keySet ++ batch.keySet)
      .map { ch =>
        ch -> ((emissions.count(_._1 == ch).toLong,
          emissions.count(_._2 == ch).toLong))
      }.filter { case (_, (f, l)) => f > 0 || l > 0 }.toMap
    assert(streamed === batch,
      "per-channel (first, last) credits must equal the batch operator")
  }

  test("positionAttributionStream emissions aggregate to batch " +
      "positionAttribution on real events (cross-batch paths)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.EventWindows.TypedEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val raw = graft.tables.TableLoader.events(spark, sfDir)
    val batch = graft.operators.EventWindows.positionAttribution(raw,
        "user_id", "ts", "event_id", "event_type",
        col("event_type") === "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val typed = raw.select(col("user_id").cast("long"), col("event_type"),
        col("event_id").cast("long"), unix_micros(col("ts")))
      .collect().map(r =>
        TypedEvent(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.orderMicros, e.event_id))
    val in = MemoryStream[TypedEvent]
    val q = graft.operators.EventWindows.positionAttributionStream(
        in.toDS(), "purchase")
      .writeStream.format("memory").queryName("pos_stream")
      .outputMode(OutputMode.Append()).start()
    val (a1, a2) = typed.splitAt(typed.length / 2)
    in.addData(a1.toIndexedSeq: _*); q.processAllAvailable()
    in.addData(a2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    // per-channel aggregation of the emissions: exact decimal sums of
    // the 6-dp-frozen credits, matching the batch decimal(38,6) fold
    val streamed = spark.table("pos_stream").collect()
      .map(r => (r.getString(2), r.getDouble(3), r.getDouble(4)))
      .groupBy(_._1).map { case (ch, rows) =>
        ch -> ((rows.length.toLong,
          rows.map(t => BigDecimal(t._2)).sum.toDouble,
          rows.map(t => BigDecimal(t._3)).sum.toDouble))
      }
    assert(streamed === batch,
      "per-channel (touches, linear, u) credits must equal the batch operator")
  }

  test("conversionsStream (with trailing flush) aggregates to batch " +
      "windowedConversions on real events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.EventWindows.TypedEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val raw = graft.tables.TableLoader.events(spark, sfDir)
    val batch = graft.operators.EventWindows.windowedConversions(raw,
        "user_id", "ts", "event_id", "event_type",
        "click", "purchase", windowSeconds = 3600)
      .collect().head
    val typed = raw.select(col("user_id").cast("long"), col("event_type"),
        col("event_id").cast("long"), unix_micros(col("ts")))
      .collect().map(r =>
        TypedEvent(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.orderMicros, e.event_id))
    // trailing flush per user (far beyond every window) closes every
    // pending from as not-converted; flush rows are neither from- nor
    // to-typed, so the batch aggregate over the same input is unchanged
    val maxUs = typed.map(_.orderMicros).max
    val maxId = typed.map(_.event_id).max
    val flush = typed.map(_.user).distinct.zipWithIndex.map {
      case (u, i) =>
        TypedEvent(u, "zz_flush", maxId + i + 1, maxUs + 10L * 3600000000L)
    }
    val in = MemoryStream[TypedEvent]
    val q = graft.operators.EventWindows.conversionsStream(in.toDS(),
        "click", "purchase", windowSeconds = 3600)
      .writeStream.format("memory").queryName("conv_stream")
      .outputMode(OutputMode.Append()).start()
    val (c1, c2) = typed.splitAt(typed.length / 2)
    in.addData(c1.toIndexedSeq: _*); q.processAllAvailable()
    in.addData(c2.toIndexedSeq: _*); q.processAllAvailable()
    in.addData(flush.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val rows = spark.table("conv_stream").collect()
      .map(r => r.getLong(1) -> r.getBoolean(2))
    assert(rows.map(_._1).distinct.length == rows.length,
      "each from event resolves exactly once")
    assert(rows.length.toLong == batch.getLong(0),
      s"every from event must resolve: ${rows.length} vs ${batch.getLong(0)}")
    assert(rows.count(_._2).toLong == batch.getLong(1),
      s"converted count: ${rows.count(_._2)} vs ${batch.getLong(1)}")
  }
}
