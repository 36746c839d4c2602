package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Percentiles

/** exactValues must be BIT-IDENTICAL to Spark's exact `percentile`
  * aggregate (same interpolation formula) on arbitrary data — that is
  * the contract that lets the bounded-memory path replace the
  * value-buffering aggregate with zero semantic change.
  */
class PercentilesSpec extends SparkTestBase {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12).withWorkers(1)

  private def sparkExact(df: org.apache.spark.sql.DataFrame,
      ps: Seq[Double]): Seq[Double] =
    df.agg(percentile(col("x").cast("double"), array(ps.map(lit): _*)))
      .head().getSeq[Double](0)

  test("equals Spark percentile bit-for-bit on arbitrary data incl. ties") {
    val dataGen = Gen.choose(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000, 1000))) // ints -> heavy ties
    val psGen = Gen.nonEmptyListOf(
      Gen.oneOf(0.0, 0.125, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0))
    val res = SCTest.check(params, Prop.forAll(dataGen, psGen) { (xs, ps) =>
      import spark.implicits._
      val df = xs.map(_.toDouble).toDF("x")
      val got = Percentiles.exactValues(df, col("x"), ps, accuracy = 100)
      val want = sparkExact(df, ps)
      got == want // exact double equality — same formula or bust
    })
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("edge cases: single row, constant column, p=0 and p=1") {
    import spark.implicits._
    val one = Seq(42.0).toDF("x")
    assert(Percentiles.exactValues(one, col("x"), Seq(0.0, 0.5, 1.0))
      === Seq(42.0, 42.0, 42.0))
    val const = Seq.fill(50)(7.5).toDF("x")
    assert(Percentiles.exactValues(const, col("x"), Seq(0.25, 0.75))
      === Seq(7.5, 7.5))
  }

  test("nulls are excluded, like the percentile aggregate") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, 2.0, 3.0, null).toDF("x")
    assert(Percentiles.exactValues(df, col("x"), Seq(0.5)) === Seq(2.0))
    assert(sparkExact(df, Seq(0.5)) === Seq(2.0))
  }

  test("empty input fails loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Percentiles.exactValues(Seq.empty[Double].toDF("x"), col("x"), Seq(0.5))
    }
  }
}
