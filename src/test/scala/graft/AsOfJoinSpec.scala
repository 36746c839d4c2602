package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

/** Hand-computed fixtures for the as-of join's edge semantics. */
class AsOfJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // before any right row
    ).toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 09:30:00")),
    ).toDF("user_id", "ts")

    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts",
      Map("ts" -> "m_ts")).collect().map(r =>
        (r.getAs[String]("name"), Option(r.getAs[Timestamp]("m_ts")))).toMap

    assert(out("p1").contains(ts("2024-01-01 09:30:00")))
    assert(out("p2").contains(ts("2024-01-01 11:00:00")))
    assert(out("p3").isEmpty, "left row before all right rows gets null")
  }

  test("asof tie: right row at exactly left time matches (inclusive)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("user_id", "ts", "name")
    val right = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val got = AsOfJoin.asof(left, right, "user_id", "ts", "ts", Map("ts" -> "m_ts"))
      .collect()(0).getAs[Timestamp]("m_ts")
    assert(got == ts("2024-01-01 10:00:00"))
  }

  test("asofWithin: stale matches null out, rows survive, fresh matches keep") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, unix_micros}
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),   // 30 min after match
      (1L, ts("2024-01-01 12:00:00"), "stale"),   // 61 min after match
      (2L, ts("2024-01-01 09:00:00"), "nomatch"), // no right row at all
    ).toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00")),
      (1L, ts("2024-01-01 10:59:00")),
    ).toDF("user_id", "ts")
    val out = AsOfJoin.asofWithin(left, right, "user_id", "ts", "ts",
        Map("ts" -> "m_ts"),
        within = (l, r) =>
          unix_micros(l) - unix_micros(r) <= lit(3600L * 1000000L))
      .collect().map(r =>
        (r.getAs[String]("name"), Option(r.getAs[Timestamp]("m_ts")))).toMap
    assert(out.size === 3, "tolerance masks payloads, never drops rows")
    assert(out("fresh").contains(ts("2024-01-01 09:30:00")))
    assert(out("stale").isEmpty,
      "the latest match violates the bound -> null, NOT a fallback to older rows")
    assert(out("nomatch").isEmpty)
  }

  test("asofWithin at infinite tolerance equals plain asof") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val left = (1 to 60).map(i => ((i % 5).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"), s"r$i"))
      .toDF("user_id", "ts", "name")
    val right = (1 to 40).map(i => ((i % 7).toLong, ts(f"2024-01-01 ${i % 24}%02d:30:00")))
      .toDF("user_id", "ts")
    val plain = AsOfJoin.asof(left, right, "user_id", "ts", "ts", Map("ts" -> "m_ts"))
    val tol = AsOfJoin.asofWithin(left, right, "user_id", "ts", "ts",
      Map("ts" -> "m_ts"), within = (_, _) => lit(true))
    assert(plain.exceptAll(tol).count() === 0L)
    assert(tol.exceptAll(plain).count() === 0L)
  }

  test("asof preserves left row count (left-outer semantics)") {
    import spark.implicits._
    val left = (1 to 100).map(i => ((i % 7).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"), s"r$i"))
      .toDF("user_id", "ts", "name")
    val right = (1 to 30).map(i => ((i % 5).toLong, ts(f"2024-01-01 ${i % 24}%02d:30:00")))
      .toDF("user_id", "ts")
    assert(AsOfJoin.asof(left, right, "user_id", "ts", "ts", Map("ts" -> "m_ts")).count() == 100)
  }

  test("forward asof picks earliest right row at-or-after, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"), // after the last right row
      (2L, ts("2024-01-01 09:30:00"), "p3"), // exactly on a right row
    ).toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00")), // before p1: must not match
      (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 09:30:00")),
    ).toDF("user_id", "ts")

    val out = AsOfJoin.asofForward(left, right, "user_id", "ts", "ts",
      Map("ts" -> "n_ts")).collect().map(r =>
        (r.getAs[String]("name"), Option(r.getAs[java.sql.Timestamp]("n_ts")))).toMap

    assert(out("p1").contains(ts("2024-01-01 11:00:00")))
    assert(out("p2").isEmpty, "no right row after the last left row")
    assert(out("p3").contains(ts("2024-01-01 09:30:00")), "equal time is inclusive")
  }

  test("nearest asof picks the closer side; ties go backward") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "pA"), // back 09:00 (1h) vs fwd 10:30 (30m) -> fwd
      (1L, ts("2024-01-01 11:00:00"), "pB"), // back 10:30 (30m) vs fwd 11:30 (30m) -> tie -> back
      (2L, ts("2024-01-01 08:00:00"), "pC"), // only fwd exists
    ).toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-01 10:30:00")),
      (1L, ts("2024-01-01 11:30:00")),
      (2L, ts("2024-01-01 09:00:00")),
    ).toDF("user_id", "ts")

    val out = AsOfJoin.asofNearest(left, right, "user_id", "ts", "ts", "near_ts")
      .collect().map(r =>
        (r.getAs[String]("name"), Option(r.getAs[java.sql.Timestamp]("near_ts")))).toMap
    assert(out("pA").contains(ts("2024-01-01 10:30:00")))
    assert(out("pB").contains(ts("2024-01-01 10:30:00")), "equidistant -> backward")
    assert(out("pC").contains(ts("2024-01-01 09:00:00")))
  }

  test("geo_mean UDAF matches exp(avg(ln)) on a known fixture") {
    import spark.implicits._
    graft.functions.Udfs.register(spark)
    Seq(2.0, 8.0).toDF("x").createOrReplaceTempView("gm_fixture")
    val gm = spark.sql("SELECT geo_mean(x) AS gm FROM gm_fixture").collect()(0).getDouble(0)
    assert(math.abs(gm - 4.0) < 1e-9) // sqrt(2*8) = 4
  }
}
