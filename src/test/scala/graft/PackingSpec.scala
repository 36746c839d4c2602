package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing: both semantics against an in-Scala reference
  * model, plus the capacity guarantee that distinguishes them.
  */
class PackingSpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    // (group, id, nTokens): mixed sizes incl. one oversized doc (id 13)
    Seq(
      ("a", 10L, 6L), ("a", 11L, 3L), ("a", 12L, 5L), ("a", 13L, 25L),
      ("a", 14L, 2L), ("a", 15L, 9L), ("a", 16L, 1L),
      ("b", 20L, 10L), ("b", 21L, 10L), ("b", 22L, 1L),
    ).toDF("grp", "id", "n")
  }

  test("packByOffset matches the stream-cut reference model") {
    val out = Packing.packByOffset(fixture, Seq("grp"), "id", col("n"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // reference: exclusive running sum per group, bin = start / budget
    val expected = Seq(
      ("a", 10L, 6L, 0L, 0L), ("a", 11L, 3L, 6L, 0L), ("a", 12L, 5L, 9L, 0L),
      ("a", 13L, 25L, 14L, 1L), ("a", 14L, 2L, 39L, 3L), ("a", 15L, 9L, 41L, 4L),
      ("a", 16L, 1L, 50L, 5L),
      ("b", 20L, 10L, 0L, 0L), ("b", 21L, 10L, 10L, 1L), ("b", 22L, 1L, 20L, 2L))
    assert(out.toSeq === expected)
  }

  test("packGreedyCapacity: first-fit reference model, capacity strict") {
    val out = Packing.packGreedyCapacity(fixture, "grp", "id", col("n"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // greedy: 6+3 | 5 (13's 25 won't fit) | 25 | 2 (9 won't fit... 2+9 > 10? no: 2+9=11>10) ...
    val expected = Seq(
      ("a", 10L, 6L, 0L), ("a", 11L, 3L, 0L), // 6+3=9 <= 10
      ("a", 12L, 5L, 1L),                     // 9+5 > 10 -> new bin
      ("a", 13L, 25L, 2L),                    // 5+25 > 10 -> own (oversized) bin
      ("a", 14L, 2L, 3L),                     // 25+2 > 10 -> new bin
      ("a", 15L, 9L, 4L),                     // 2+9 = 11 > 10 -> new bin
      ("a", 16L, 1L, 4L),                     // 9+1 = 10 fits exactly
      ("b", 20L, 10L, 0L), ("b", 21L, 10L, 1L), ("b", 22L, 1L, 2L)) // 10+1 > 10
    assert(out.toSeq === expected)
  }

  test("packGreedyCapacity on real docs: bins respect the budget") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val budget = 64
    val packed = Packing.packGreedyCapacity(docs, "lang", "doc_id",
      size(split(lower(col("text")), " ")), budget)
    val binTotals = packed.groupBy("lang", "bin")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n_docs"))
      .collect()
    assert(binTotals.nonEmpty)
    binTotals.foreach { r =>
      val (tot, nDocs) = (r.getLong(2), r.getLong(3))
      assert(tot <= budget || nDocs == 1L,
        s"bin over budget with multiple docs: $r")
    }
    // row-preserving: every doc lands in exactly one bin
    assert(packed.count() === docs.count())
    // bins are contiguous 0..max per group
    val perGroup = packed.groupBy("lang")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("nb")).collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(3) === r.getLong(2) + 1,
        s"bins not contiguous: $r")
    }
  }

  test("packByOffset never under-fills interior bins vs greedy bin count") {
    // stream-offset packing wastes no capacity except straddle tails,
    // so it never uses MORE bins than capacity-strict greedy
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val offBins = Packing.packByOffset(docs, Seq("lang"), "doc_id",
        size(split(lower(col("text")), " ")), 128)
      .groupBy("lang").agg(countDistinct("bin").as("nb")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val greedyBins = Packing.packGreedyCapacity(docs, "lang", "doc_id",
        size(split(lower(col("text")), " ")), 128)
      .groupBy("lang").agg(countDistinct("bin").as("nb")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    offBins.foreach { case (lang, nb) =>
      assert(nb <= greedyBins(lang), s"offset packing used more bins for $lang")
    }
  }

  test("bucketBatches: batches respect size, bucket purity, and length spread") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Packing.bucketBatches(docs, "doc_id", col("n_chars"),
      bucketWidth = 200, batchSize = 32).cache()
    assert(out.count() === docs.count(), "row-preserving")
    val byBatch = out.groupBy("batch_id")
      .agg(count(lit(1)).as("n"), countDistinct("bucket").as("nb"),
        (max("len") - min("len")).as("spread"),
        countDistinct("pos_in_batch").as("npos")).collect()
    byBatch.foreach { r =>
      assert(r.getAs[Long]("n") <= 32, "a batch never exceeds batchSize")
      assert(r.getAs[Long]("nb") === 1L, "a batch never mixes buckets")
      assert(r.getAs[Long]("spread") < 200, "in-batch length spread < bucketWidth")
      assert(r.getAs[Long]("npos") === r.getAs[Long]("n"),
        "positions within a batch are distinct")
    }
    // at most one under-filled batch per bucket (the tail)
    val tails = out.groupBy("bucket", "batch_id").agg(count(lit(1)).as("n"))
      .filter(col("n") < 32)
      .groupBy("bucket").agg(count(lit(1)).as("small")).collect()
    tails.foreach(r => assert(r.getAs[Long]("small") === 1L,
      s"bucket ${r.get(0)} has more than one under-filled batch"))
    out.unpersist()
  }

  test("bucketBatches is deterministic under input partitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Packing.bucketBatches(docs, "doc_id", col("n_chars"), 200, 32)
    val b = Packing.bucketBatches(docs.repartition(13), "doc_id", col("n_chars"), 200, 32)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }
}
