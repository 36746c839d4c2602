package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-extension surface (SURVEY.md §2.9): the reference lets users
  * run arbitrary Python over frames outside SQL; the Spark-native
  * equivalents are registered functions usable from SQL and the
  * DataFrame API.
  *
  * Note on scale: scalar Scala UDFs are JIT-compiled but opaque to
  * Catalyst (no pushdown through them, breaks whole-stage codegen at
  * the call site). Use built-in expressions when one exists; UDFs only
  * for genuinely custom logic (here: demonstration of the surface, and
  * the hot vector kernels in VectorOps where a tight JVM loop beats
  * interpreted higher-order functions).
  */
object Udfs {

  /** Price banding — the reference-style "arbitrary user function". */
  val priceBand: Double => String = p =>
    if (p < 50000.0) "low" else if (p < 150000.0) "mid" else "high"

  /** Geometric mean UDAF via a typed Aggregator: exp(mean(ln(x))).
    * Partial aggregation works map-side (sum of logs + count merge), so
    * the shuffle carries one (Double, Long) pair per group per task —
    * the same contract as built-in aggregates.
    */
  val geoMean: Aggregator[Double, (Double, Long), Double] =
    new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), x: Double): (Double, Long) =
        if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): Double =
        if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Register all user functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("price_band", priceBand)
    spark.udf.register("geo_mean", udaf(geoMean))
  }
}
