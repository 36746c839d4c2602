package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkTestBase {

  /** Reference Morton interleave (plain Scala bit math). */
  private def morton(a: Long, b: Long): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xFFFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }
    spread(a) | (spread(b) << 1)
  }

  test("zValue equals the reference Morton interleave") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong)) ++
      Seq((0L, 0L), (1L, 0L), (0L, 1L), // bit-0 of b outranks bit-0 of a
        ((1L << 31) - 1, (1L << 31) - 1)) // max domain: fills bit 61, stays positive
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) === morton(a, b), s"($a, $b)")
      assert(got((a, b)) >= 0L, "62-bit key keeps signed ordering valid")
    }
    assert(got((0L, 1L)) === 2L && got((1L, 0L)) === 1L)
  }

  test("clusterByZ: partitions own disjoint contiguous z-ranges") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val clustered = ZOrder.clusterByZ(li, "l_partkey", "l_suppkey", 4)
    // recompute z per row and collect each partition's (min, max)
    import spark.implicits._
    val ranges = clustered
      .select(ZOrder.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .as[Long]
      .mapPartitions(it => if (it.isEmpty) Iterator.empty else {
        val s = it.toSeq; Iterator((s.min, s.max))
      })
      .collect().sortBy(_._1)
    assert(ranges.length >= 2, "expect multiple non-empty partitions")
    ranges.sliding(2).foreach {
      case Array((_, hiPrev), (loNext, _)) =>
        assert(hiPrev <= loNext, s"overlapping z-ranges: $hiPrev > $loNext")
      case _ =>
    }
    // clustering only reorders: same multiset of rows
    assert(clustered.count() === li.count())
    // plan shape: one range exchange (the sort partitioning), no hash
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"clusterByZ must range-partition:\n$plan")
  }
}
