package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorMeanAgg.vectorMean

/** Native mean-pooling aggregate: correctness, merge behavior across
  * partitionings, and the loud-failure rules.
  */
class VectorMeanSpec extends SparkTestBase {

  test("vectorMean equals the hand-computed elementwise mean") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 2.0f, 3.0f)),
      ("a", Seq(3.0f, 4.0f, 5.0f)),
      ("b", Seq(10.0f, 0.0f, -2.0f)),
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(vectorMean(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") === Seq(2.0, 3.0, 4.0))
    assert(out("b") === Seq(10.0, 0.0, -2.0))
  }

  test("partial merge: result is partitioning-independent") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def pooled(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("label").agg(vectorMean(col("embedding")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val a = pooled(emb)
    val b = pooled(emb.repartition(13))
    assert(a.keySet === b.keySet)
    // identical partials summed in different orders: equal to 1e-12
    a.foreach { case (k, v) =>
      v.zip(b(k)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-12, s"label $k diverged: $x vs $y")
      }
    }
    // sanity vs Spark's own per-position average
    val ref = emb.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos").agg(avg("col").as("m"))
      .groupBy("label").agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("s"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1))).toMap
    a.foreach { case (k, v) =>
      v.zip(ref(k)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"label $k vs posexplode ref: $x vs $y")
      }
    }
  }

  test("dimension mismatch and null elements fail loudly") {
    import spark.implicits._
    val ragged = Seq(Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)).toDF("v")
    intercept[Exception] {
      ragged.agg(vectorMean(col("v"))).collect()
    }
    val withNull = Seq(Seq(Some(1.0f), None)).toDF("v")
    intercept[Exception] {
      withNull.agg(vectorMean(col("v"))).collect()
    }
    // null ROWS are skipped (standard agg semantics), not errors
    val withNullRow = Seq(Some(Seq(2.0f, 4.0f)), None).toDF("v")
    val m = withNullRow.agg(vectorMean(col("v"))).head().getSeq[Double](0)
    assert(m === Seq(2.0, 4.0))
  }
}
