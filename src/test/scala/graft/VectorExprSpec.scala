package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorExpressions, VectorOps}

/** The native codegen cosine expression must agree bit-for-bit with the
  * UDF kernel (same double fold order) on real embeddings, in BOTH the
  * whole-stage-codegen and interpreted paths.
  */
class VectorExprSpec extends SparkTestBase {

  test("native expression == UDF kernel on sf0.001 embeddings, bit-exact") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    val paired = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      .crossJoin(emb.select(col("vec_id").as("id2"), col("embedding").as("v2")))
      .filter(col("id1") < col("id2")).limit(5000)
    val diff = paired.select(
      VectorExpressions.cosine(col("v1"), col("v2")).as("native"),
      VectorOps.cosineUdf(col("v1"), col("v2")).as("viaUdf"))
      .filter(col("native") =!= col("viaUdf"))
    assert(diff.count() === 0, "fold order identical => bitwise-equal doubles")
  }

  test("expression survives codegen AND interpreted evaluation") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val q = emb.select(
      VectorExpressions.cosine(col("embedding"), col("embedding")).as("self"))
    // self-cosine of a nonzero vector is exactly 1.0 up to fp rounding
    val vals = q.collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))

    val before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = q.collect().map(_.getDouble(0))
      assert(interpreted.toSeq === vals.toSeq,
        "nullSafeEval and doGenCode implement the same math")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", before)
  }

  test("nulls propagate: null vector => null cosine") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1f, 0f)), Some(Seq(1f, 0f))),
      (None, Some(Seq(1f, 0f))),
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.cosine($"a", $"b").as("c")).collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).isNullAt(0))
  }

  test("quantize fails loudly on a null element instead of fabricating 0") {
    import spark.implicits._
    val df = Seq(Seq[java.lang.Float](1.0f, null, 3.0f)).toDF("v")
    val e = intercept[Exception] {
      df.select(VectorExpressions.quantize($"v")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage).exists(_.contains("null element"))),
      s"expected the null-element error, got: $e")
  }

  test("int8 cosine fails loudly on a null element") {
    import spark.implicits._
    val df = Seq((Seq[java.lang.Byte](1.toByte, null), Seq[java.lang.Byte](1.toByte, 2.toByte)))
      .toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.cosineInt8($"a", $"b")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("null element"))),
      s"expected the null-element error, got: $e")
  }
}
