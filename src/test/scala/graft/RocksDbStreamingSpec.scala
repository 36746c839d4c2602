package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.operators.EventWindows

/** Stateful streaming (T3–T6) on the RocksDB state-store provider —
  * the production state backend named in SURVEY.md §3.4/M5. The
  * in-memory (HDFS-backed) default keeps every key's state on the JVM
  * heap; at 100 TB keyspaces RocksDB is the provider that survives
  * (state spills to local SSD, snapshot+changelog checkpointing), so
  * the semantics the judged queries rely on must be proven there too.
  *
  * Each test asserts BOTH the results and — via the streaming progress
  * metrics — that RocksDB actually backed the stateful operator (the
  * provider's custom metrics are rocksdb-prefixed).
  */
class RocksDbStreamingSpec extends SparkTestBase {

  private implicit def sqlCtx: SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  private val baseEvents = Seq(
    Ev(0L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
    Ev(1L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0),
    Ev(2L, ts("2024-01-01 00:35:00"), 2L, "view", 3.0),
    Ev(3L, ts("2024-01-01 01:10:00"), 1L, "click", 4.0),
    Ev(4L, ts("2024-01-02 00:00:30"), 2L, "view", 5.0),
  )

  private def withRocksDb[T](body: => T): T = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** The provider's fingerprint in the progress metrics: stateful
    * operators report rocksdb-prefixed custom metrics only when the
    * RocksDB provider actually holds their state.
    */
  private def assertRocksDbBacked(q: StreamingQuery): Unit = {
    val ops = q.lastProgress.stateOperators
    assert(ops.nonEmpty, "query has a stateful operator")
    assert(ops.exists(_.customMetrics.keySet.toArray
        .exists(_.toString.startsWith("rocksdb"))),
      s"state operator metrics must be rocksdb-backed: " +
        ops.flatMap(_.customMetrics.keySet.toArray).mkString(","))
  }

  private def runAndCheck(sdf: DataFrame, mode: OutputMode,
      name: String): DataFrame = {
    val q = sdf.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    assertRocksDbBacked(q)
    q.stop()
    spark.table(name)
  }

  test("T3 on RocksDB: session windows match the batch result") {
    import spark.implicits._
    withRocksDb {
      val input = MemoryStream[Ev]
      input.addData(baseEvents: _*)
      val streamed = runAndCheck(
        EventWindows.sessions(input.toDF(), "30 minutes"),
        OutputMode.Complete(), "rdb_t3")
      val batch = EventWindows.sessions(baseEvents.toDF(), "30 minutes")
      assert(streamed.collect().toSet === batch.collect().toSet)
    }
  }

  test("T4 on RocksDB: watermark still drops late data") {
    import spark.implicits._
    withRocksDb {
      val input = MemoryStream[Ev]
      val windowed = EventWindows.tumbling(
        input.toDF().withWatermark("ts", "1 hour"), "1 hour")
      val q = windowed.writeStream.format("memory").queryName("rdb_t4")
        .outputMode(OutputMode.Append()).start()
      input.addData(
        Ev(0L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
        Ev(1L, ts("2024-01-01 03:00:00"), 1L, "click", 4.0))
      q.processAllAvailable()
      input.addData(Ev(2L, ts("2024-01-01 00:20:00"), 1L, "click", 100.0))
      q.processAllAvailable()
      assertRocksDbBacked(q)
      q.stop()
      val rows = spark.table("rdb_t4")
        .select($"w_start", $"n_events", $"sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((ts("2024-01-01 00:00:00"), 1L, 1.0)))
      assert(!rows.exists(_._3 == 100.0), "late event dropped on RocksDB too")
    }
  }

  test("T5 on RocksDB: streaming dedup keeps the first occurrence") {
    import spark.implicits._
    withRocksDb {
      val input = MemoryStream[Ev]
      val deduped = input.toDF().withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(Seq("event_id"))
      val q = deduped.writeStream.format("memory").queryName("rdb_t5")
        .outputMode(OutputMode.Append()).start()
      input.addData(
        Ev(10L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        Ev(10L, ts("2024-01-01 00:05:00"), 1L, "click", 99.0),
        Ev(11L, ts("2024-01-01 00:10:00"), 2L, "view", 2.0))
      q.processAllAvailable()
      assertRocksDbBacked(q)
      q.stop()
      val out = spark.table("rdb_t5").select($"event_id", $"value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(out === Set((10L, 1.0), (11L, 2.0)))
    }
  }

  test("T6 on RocksDB: flatMapGroupsWithState accumulates across batches") {
    import spark.implicits._
    withRocksDb {
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
        .queryName("rdb_t6").outputMode(OutputMode.Update()).start()
      input.addData(baseEvents.take(3): _*)
      q.processAllAvailable()
      input.addData(baseEvents.drop(3): _*)
      q.processAllAvailable()
      assertRocksDbBacked(q)
      q.stop()
      val latest = spark.table("rdb_t6").groupBy($"user_id")
        .agg(max($"n").as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(latest === Map(1L -> 3L, 2L -> 2L),
        "state survives micro-batch boundaries in RocksDB")
    }
  }
}
