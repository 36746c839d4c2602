package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKStructAgg

/** Laws for the bounded partial-aggregatable top-k heap: equivalence
  * to the window formulation, partitioning independence (the property
  * that makes map-side partials safe), and buffer serialization
  * round-trips (exercised implicitly by multi-partition runs, which
  * ship partial heaps through the exchange).
  */
class TopKStructAggSpec extends SparkTestBase {

  private def data() = {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    (0 until 500).map { i =>
      (i.toLong, s"k${i % 7}", math.floor(rng.nextDouble() * 50) / 10.0)
    }.toDF("id", "key", "score")
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("key")
      .agg(TopKStructAgg.topKStructs(struct(col("score"), col("id")), k)
        .as("tk"))
      .select(col("key"), posexplode(col("tk")).as(Seq("p", "e")))
      .select(col("key"), col("e.score"), col("e.id"),
        (col("p") + 1).cast("bigint").as("rank"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("matches row_number window formulation exactly") {
    val df = data()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("score"), col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("key", "score", "id", "rank")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3).toLong))
      .toSet
    assert(viaAgg(df, 5) == want)
  }

  test("result is partitioning-independent (map-side partials merge)") {
    val df = data()
    val base = viaAgg(df, 4)
    Seq(1, 3, 13).foreach { n =>
      assert(viaAgg(df.repartition(n), 4) == base,
        s"top-k changed under repartition($n)")
    }
  }

  test("k larger than the group returns the whole group, sorted") {
    import spark.implicits._
    val df = Seq((1L, "a", 3.0), (2L, "a", 1.0), (3L, "a", 2.0))
      .toDF("id", "key", "score")
    val got = df.groupBy("key")
      .agg(TopKStructAgg.topKStructs(struct(col("score"), col("id")), 10)
        .as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id")).as[Long].collect().toSeq
    assert(got == Seq(2L, 3L, 1L), s"ascending by (score, id): $got")
  }

  test("nulls in the input child are skipped, k >= 1 enforced") {
    import spark.implicits._
    val df = Seq((Some(1.0), 1L), (None, 2L), (Some(0.5), 3L))
      .toDF("score", "id")
    // struct() of a null field is non-null; drop null scores upstream,
    // the documented contract for ordinal fields
    val got = df.filter(col("score").isNotNull)
      .agg(TopKStructAgg.topKStructs(struct(col("score"), col("id")), 1)
        .as("tk"))
      .select(explode(col("tk")).as("e")).select(col("e.id"))
      .as[Long].collect().toSeq
    assert(got == Seq(3L))
    intercept[IllegalArgumentException] {
      TopKStructAgg(null, 0)
    }
  }
}
