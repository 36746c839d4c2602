package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so every
  * subsequent join/aggregation on the bucket key runs WITHOUT an
  * exchange.
  *
  * At 100 TB this is the difference between re-shuffling the fact
  * table on every query and shuffling it once at ingest: two tables
  * bucketed into the same bucket count on the same key join
  * bucket-for-bucket (SortMergeJoin with zero Exchange — BucketingSpec
  * asserts the plan), and a groupBy on the bucket key skips its
  * exchange the same way.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (parquet).
    * Bucket count should divide evenly into cluster parallelism; both
    * join sides must use the SAME count for co-located joins.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata flows from the
    * catalog; scans report SelectedBucketsCount and joins on the
    * bucket key skip their shuffle).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
