package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range join == the naive theta join it replaces, including
  * boundary points, intervals spanning many bins, and bin-edge-aligned
  * interval ends.
  */
class RangeJoinSpec extends SparkTestBase {

  test("binned == naive theta join, half-open semantics, multi-bin spans") {
    import spark.implicits._
    val points = Seq(
      (1L, 0.0), (2L, 999.0), (3L, 1000.0),      // bin edges
      (4L, 2500.0), (5L, 9999.9), (6L, 10000.0), // wide-span interval hits
      (7L, -500.0),                              // negative point
    ).toDF("pid", "p")
    val intervals = Seq(
      (10L, 0.0, 1000.0),       // hi exactly on a bin edge
      (11L, 500.0, 2600.0),     // spans 3 bins
      (12L, 0.0, 10000.0),      // spans 10 bins
      (13L, -1000.0, 0.0),      // negative interval
      (14L, 5000.0, 5000.0),    // empty interval (lo == hi)
    ).toDF("iid", "lo", "hi")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = pairs(points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi")))
    val binned = pairs(RangeJoin.binned(points, intervals, "p", "lo", "hi", 1000L))
    assert(binned === naive, s"binned=$binned naive=$naive")
    // fixture sanity: half-open means p=1000 misses [0,1000) but the
    // negative point lands in the negative interval
    assert(!naive.contains((3L, 10L)) && naive.contains((7L, 13L)))
    // no duplicate pairs from multi-bin intervals
    val rows = RangeJoin.binned(points, intervals, "p", "lo", "hi", 1000L).count()
    assert(rows === naive.size.toLong, "each match must appear exactly once")
  }

  test("overlapBinned == naive theta join on adversarial intervals; no dup pairs") {
    import spark.implicits._
    val left = Seq(
      (1L, 0.0, 1000.0),     // ends on a bin edge
      (2L, 500.0, 2600.0),   // spans 3 bins
      (3L, -1500.0, -100.0), // fully negative
      (4L, 4000.0, 4000.0),  // degenerate (point) interval
      (5L, 0.0, 9000.0),     // spans many bins
    ).toDF("lid", "l_lo", "l_hi")
    val right = Seq(
      (10L, 1000.0, 1500.0), // touches lid=1 exactly at 1000 (closed: match)
      (11L, 2600.0, 2600.0), // degenerate on lid=2's right edge
      (12L, -200.0, 100.0),  // crosses zero
      (13L, 8999.0, 20000.0) // long right tail
    ).toDF("rid", "r_lo", "r_hi")

    val naive = left.join(right,
        col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binnedDf = RangeJoin.overlapBinned(left, right,
      "lid", "l_lo", "l_hi", "rid", "r_lo", "r_hi", binWidth = 1000L)
    val binned = binnedDf.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === naive, s"binned=$binned naive=$naive")
    // closed-interval sanity: edge touch and degenerate intervals match
    assert(naive.contains((1L, 10L)) && naive.contains((2L, 11L))
      && naive.contains((3L, 12L)) && naive.contains((5L, 13L)))
    // multi-bin co-span must not duplicate a pair
    assert(binnedDf.count() === naive.size.toLong)
  }

  test("overlapBinned plans an equi-join, not a nested loop") {
    import spark.implicits._
    val left = (0 until 100).map(i => (i.toLong, i * 40.0, i * 40.0 + 90.0))
      .toDF("lid", "l_lo", "l_hi")
    val right = (0 until 60).map(i => (i.toLong, i * 70.0, i * 70.0 + 50.0))
      .toDF("rid", "r_lo", "r_hi")
    val plan = RangeJoin.overlapBinned(left, right,
        "lid", "l_lo", "l_hi", "rid", "r_lo", "r_hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join must be an equi-join:\n$plan")
  }

  test("binned range join plans an equi-join, not a nested loop") {
    import spark.implicits._
    val points = (0 until 100).map(i => (i.toLong, i * 37.0)).toDF("pid", "p")
    val intervals = (0 until 50).map(i => (i.toLong, i * 50.0, i * 50.0 + 120.0))
      .toDF("iid", "lo", "hi")
    val plan = RangeJoin.binned(points, intervals, "p", "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned range join must be an equi-join:\n$plan")
  }
}
