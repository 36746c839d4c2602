package graft

import java.sql.Timestamp

import graft.operators.Resample

/** Hand-computed interpolation/ffill semantics for the resample
  * operators (the judged q_resample_ffill covers lastFill against
  * DuckDB; here the math itself is pinned on a tiny fixture).
  */
class ResampleSpec extends SparkTestBase {

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000L)

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, ts(0), 10.0),
      (1L, ts(100), 20.0),
      (2L, ts(30), 5.0), // single observation
    ).toDF("k", "t", "v")
  }

  test("linear interpolation hits exact fractions between observations") {
    val out = Resample.linearInterp(fixture, "k", "t", "v", 50L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (1L, 0L, Some(10.0)),    // on the event
      (1L, 50L, Some(15.0)),   // halfway => exact midpoint
      (1L, 100L, Some(20.0)),  // on the event
      (2L, 0L, None),          // before the only observation
    ))
  }

  test("last-fill carries the previous value, null before first") {
    val out = Resample.lastFill(fixture, "k", "t", "v", 50L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (1L, 0L, Some(10.0)),
      (1L, 50L, Some(10.0)),   // carried forward, not interpolated
      (1L, 100L, Some(20.0)),
      (2L, 0L, None),
    ))
  }
}
