package graft

import org.apache.spark.sql.functions._

import graft.operators.Projection

/** JL random projection: determinism, the md5 sign contract, linearity,
  * expected-norm preservation, and loud dim-mismatch failure.
  */
class ProjectionSpec extends SparkTestBase {

  test("sign matrix is ±1, deterministic, and pins the md5 low-bit contract") {
    val m = Projection.signMatrix(4, 3, "s")
    assert(m.length === 3 && m.forall(_.length === 4))
    assert(m.flatten.forall(s => s == 1.0 || s == -1.0))
    assert(m.map(_.toSeq).toSeq === Projection.signMatrix(4, 3, "s").map(_.toSeq).toSeq)
    // cross-engine pin: DuckDB ('0x'||SUBSTR(MD5('s:0:0'),1,15))::BIGINT & 1
    // evaluates to 0 => sign -1 (verified against DuckDB 1.0.0)
    assert(m(0)(0) === -1.0)
  }

  test("projection emits outDim doubles per row and is deterministic") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(8)(0.5f)), (2L, (1 to 8).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val out = Projection.project(df, "embedding", 8, 4, "t")
    assert(out.columns.toSeq === Seq("vec_id", "embedding", "proj"))
    val rows = out.select("proj").as[Seq[Double]].collect()
    assert(rows.forall(_.length === 4))
    val again = Projection.project(df, "embedding", 8, 4, "t")
      .select("proj").as[Seq[Double]].collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("projection is linear: proj(u + v) == proj(u) + proj(v)") {
    import spark.implicits._
    val u = (1 to 8).map(_.toFloat)
    val v = (1 to 8).map(i => (9 - i).toFloat)
    val sum = u.zip(v).map { case (a, b) => a + b }
    val df = Seq((1L, u), (2L, v), (3L, sum)).toDF("vec_id", "embedding")
    val got = Projection.project(df, "embedding", 8, 4, "t")
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    got(1L).indices.foreach { k =>
      assert(math.abs(got(1L)(k) + got(2L)(k) - got(3L)(k)) < 1e-9)
    }
  }

  test("expected-norm preservation on the embeddings fixture") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ratio = Projection.project(emb, "embedding", 64, 16, "jl")
      .withColumn("n2", expr(
        "aggregate(transform(embedding, x -> cast(x as double) * x), 0D, (a, t) -> a + t)"))
      .withColumn("p2", expr(
        "aggregate(transform(proj, x -> x * x), 0D, (a, t) -> a + t)"))
      .agg(avg(col("p2") / col("n2"))).head().getDouble(0)
    // E[!proj!^2] = !v!^2; the MEAN ratio over the fixture concentrates
    assert(ratio > 0.8 && ratio < 1.25, s"mean norm ratio $ratio")
  }

  test("wrong-length vectors fail loudly; null vectors project to null") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Projection.project(bad, "embedding", 8, 4, "t").collect()
    }
    assert(e.getMessage.contains("expected 8 dims"))
    val withNull = Seq((1L, Option(Seq.fill(8)(1.0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val out = Projection.project(withNull, "embedding", 8, 4, "t")
    assert(out.filter(col("vec_id") === 2L).head().isNullAt(2))
    assert(!out.filter(col("vec_id") === 1L).head().isNullAt(2))
  }
}
