package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-join pruning: before shuffling a huge probe table
  * into a join, broadcast a Bloom filter of the (much smaller) build
  * side's keys and drop probe rows that cannot possibly match.
  *
  * The subsequent REAL join eliminates the Bloom filter's false
  * positives, so results are exactly those of the plain join — what
  * changes is shuffle volume: probe rows without a partner (often the
  * overwhelming majority in selective joins at 100 TB) are filtered at
  * the scan instead of being shuffled and discarded at the join.
  * Spark's own runtime row-group Bloom pushdown only fires in narrow
  * cases; this makes the pattern explicit and composable.
  */
object BloomJoin {

  /** Membership predicate dispatched on the probe key's dtype: integral
    * keys test via mightContainLong, strings via mightContainString;
    * anything else fails loudly. (A single Long-typed UDF would let
    * Spark cast a string key to bigint — yielding null for every row
    * and silently emptying the join.) Null keys test false, matching
    * equi-join semantics (null never matches).
    */
  private def mightContainCol(df: DataFrame, key: String,
      bloom: BloomFilter): Column = {
    val bloomBc = df.sparkSession.sparkContext.broadcast(bloom)
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val f = udf((k: Long) => bloomBc.value.mightContainLong(k))
        f(col(key).cast("long"))
      case StringType =>
        val f = udf((k: String) => k != null && bloomBc.value.mightContainString(k))
        f(col(key))
      case dt => throw new IllegalArgumentException(
        s"BloomJoin key '$key' has unsupported type $dt: " +
          "expected an integral or string column")
    }
  }

  /** The build and probe key columns must agree on type FAMILY
    * (integral vs string): the bloom filter was populated with one
    * representation, and probing it with the other representation
    * always misses — the probe dispatch alone can't see that, so the
    * join would silently empty where the plain equi-join (with Spark's
    * implicit cast) would match.
    */
  private def requireCompatibleKeys(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String): Unit = {
    def family(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case StringType => "string"
      case other => other.typeName
    }
    val bf = family(big.schema(bigKey).dataType)
    val sf = family(small.schema(smallKey).dataType)
    require(bf == sf,
      s"BloomJoin keys must share a type family: big.$bigKey is $bf, " +
        s"small.$smallKey is $sf — a cross-family bloom probe always misses")
  }

  /** `big` semi-joined/inner-joined to `small` on big.bigKey ==
    * small.smallKey, with a Bloom pre-filter on the big side.
    * `expectedItems`/`fpp` size the filter (bits ≈ -n·ln(fpp)/ln²2 —
    * 1M keys at 1% ≈ 1.2 MB broadcast).
    */
  def inner(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    requireCompatibleKeys(big, bigKey, small, smallKey)
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    big.filter(mightContainCol(big, bigKey, bloom))
      .join(small, col(bigKey) === col(smallKey))
  }

  /** Pre-filter only (no join): the building block for custom plans —
    * exact false positives remain, callers must re-verify.
    */
  def probeFilter(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    requireCompatibleKeys(big, bigKey, small, smallKey)
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    big.filter(mightContainCol(big, bigKey, bloom))
  }
}
