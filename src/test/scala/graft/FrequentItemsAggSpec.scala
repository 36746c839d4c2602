package graft

import org.apache.spark.sql.functions._

import graft.functions.FrequentItemsAgg

/** Misra–Gries laws: exact regime, under-estimate + completeness
  * bounds in the approximate regime, partition invariance where
  * guaranteed, and the map-side-bounded plan shape.
  */
class FrequentItemsAggSpec extends SparkTestBase {

  test("exact regime: distinct <= capacity gives plain group-by counts") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("x")
      .repartition(4) // exactness must survive partial merges
    val got = df.agg(FrequentItemsAgg.frequentItems(col("x"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == Seq("a" -> 3L, "b" -> 2L, "c" -> 1L),
      s"(n DESC, item ASC) order with exact counts: ${got.toSeq}")
  }

  test("approximate regime: under-estimate and completeness bounds hold") {
    import spark.implicits._
    // 1000 rows: one item at 400, one at 300, 300 singleton noise items
    val rows = Seq.fill(400)("heavy1") ++ Seq.fill(300)("heavy2") ++
      (0 until 300).map(i => s"noise_$i")
    val df = rows.toDF("x").repartition(8)
    val cap = 10
    val got = df.agg(FrequentItemsAgg.frequentItems(col("x"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= cap)
    val n = rows.size
    val slack = n / (cap + 1) // 90
    // completeness: true > N/(cap+1) must be present
    assert(got.contains("heavy1") && got.contains("heavy2"),
      s"true heavies above N/(cap+1) must survive: $got")
    // under-estimate within slack, for every reported item
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (item, est) =>
      val t = truth(item)
      assert(est <= t && est >= t - slack,
        s"$item: est $est outside [${t - slack}, $t]")
    }
  }

  test("exact regime is partition-order invariant") {
    import spark.implicits._
    val rows = (0 until 500).map(i => s"k${i % 6}")
    val a = rows.toDF("x").repartition(1)
      .agg(FrequentItemsAgg.frequentItems(col("x"), 6).as("hh")).collect()
    val b = rows.reverse.toDF("x").repartition(16)
      .agg(FrequentItemsAgg.frequentItems(col("x"), 6).as("hh")).collect()
    assert(a.head.getSeq[Any](0) == b.head.getSeq[Any](0),
      "distinct <= capacity must be partitioning-independent")
  }

  test("NULL items are skipped, serialization round-trips strings") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("x")
      .repartition(3)
    val got = df.agg(FrequentItemsAgg.frequentItems(col("x"), 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == Seq("a" -> 2L, "b" -> 1L), got.toSeq.toString)
  }

  test("container/binary item types are rejected at analysis (key-equality hazard)") {
    // struct keys would fragment across the shuffle merge: update()
    // retains GenericInternalRow keys while deserialize() rebuilds
    // UnsafeRow keys, and UnsafeRow.equals only matches other
    // UnsafeRows — silently wrong counts. Rejected up front instead.
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("s", "i")
    for (bad <- Seq(struct(col("s"), col("i")), array(col("i")),
        col("s").cast("binary"))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(FrequentItemsAgg.frequentItems(bad, 4)).collect()
      }
      assert(e.getMessage.contains("flat comparable"), e.getMessage)
    }
  }

  test("freqSketch compat shape: same sketch, (tok, cnt) field names") {
    import spark.implicits._
    val df = Seq("a", "a", "b").toDF("x").repartition(2)
    val got = df.agg(FrequentItemsAgg.freqSketch(col("x"), 4).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.tok"), col("e.cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == Seq("a" -> 2L, "b" -> 1L), got.toSeq.toString)
  }

  test("plan shape: partial frequent_items before the exchange, no raw rows") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs.groupBy(col("source"))
      .agg(FrequentItemsAgg.frequentItems(col("lang"), 16).as("hh"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_frequent_items"),
      s"map tasks must forward capacity-bounded sketches, not rows:\n$p")
  }
}
