package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{RankEval, Resample, Spectral, TextAnalysis}
import QueryDefs._

/** Round-8 judged queries: spectral projection, ranking-agreement
  * evaluation, time-decayed aggregation, cross-doc duplicate-n-gram
  * quality, and the source-vocabulary Jaccard matrix. Oracles replay
  * the identical arithmetic in DuckDB under the SURVEY.md §5.4
  * determinism rules (rounded quanta, total orders, exact-integer
  * ratios wherever possible).
  */
object AnalyticsOps {

  /** Two unrolled power iterations to the dominant principal
    * direction, then per-vector projections — every cross-row sum
    * 6-dp-quantized, the start vector ROUND(1/sqrt(d), 6) computed
    * from the same closed form on both engines.
    */
  val qPcaPower: QueryFn = withTables { spark =>
    Spectral.principalProjection(
        spark.table("embeddings"), "vec_id", "embedding", iters = 2)
      .orderBy("vec_id")
  }

  /** Truncated RBO@10 (p=0.9) between two user rankings per event
    * type: by 6-dp-rounded total value vs by event count. Rank
    * comparators are total orders; the depth weights are one shared
    * literal table on both engines.
    */
  val qRboEval: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    def ranking(metric: Column) = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(metric.as("m"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("m").desc_nulls_last, col("user_id"))))
      .filter(col("rnk") <= 10)
    val byValue = ranking(round(sum(col("value")), 6))
    val byCount = ranking(count(lit(1)))
    RankEval.rbo(byValue, byCount, "event_type", "user_id", "rnk",
        k = 10, p = 0.9)
      .orderBy("event_type")
  }

  /** Stepped-half-life decayed value sums per (event_type, user):
    * weights are exact dyadic 2^(-k), so the only cross-engine float
    * work is the final 6-dp-rounded sum.
    */
  val qDecayAgg: QueryFn = withTables { spark =>
    Resample.decayedSum(spark.table("events"),
        Seq("event_type", "user_id"), "ts", "value",
        asOf = "2024-02-01", halfLifeDays = 7)
      .orderBy("event_type", "user_id")
  }

  /** Cross-document duplicate-5-gram fraction per doc (MassiveText
    * quality rule): exact integer ratio, 6-dp-rounded; short docs
    * report 0 spans and a NULL fraction.
    */
  val qDupNgrams: QueryFn = withTables { spark =>
    TextAnalysis.duplicateNgramFraction(
        spark.table("documents"), "doc_id", "text", n = 5, minDocs = 2)
      .orderBy("doc_id")
  }

  /** Pairwise source-vocabulary Jaccard matrix: pure set-overlap
    * integers until the final rounded ratio.
    */
  val qVocabJaccard: QueryFn = withTables { spark =>
    TextAnalysis.vocabJaccard(spark.table("documents"), "source", "text")
      .orderBy("g1", "g2")
  }

  val queries: Map[String, QueryFn] = Map(
    "q_pca_power" -> qPcaPower,
    "q_rbo_eval" -> qRboEval,
    "q_decay_agg" -> qDecayAgg,
    "q_dup_ngrams" -> qDupNgrams,
    "q_vocab_jaccard" -> qVocabJaccard,
  )

  // RBO depth weights: ONE Scala computation feeds both the Spark
  // literal lookup (RankEval.rbo) and the oracle CASE below —
  // Double.toString round-trips, so both engines parse the identical
  // doubles.
  private val rboCase: String =
    RankEval.rboWeights(10, 0.9).zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
      .mkString("CASE GREATEST(a.ra, b.rb) ", " ", " ELSE 0.0 END")

  val oracles: Map[String, String] = Map(

    // Two unrolled matrix-free power iterations: per-row dots fold in
    // index order (LIST_SUM over LIST_TRANSFORM = the aggregate/
    // zip_with fold), cross-row dimension sums rounded at 6 dp, the
    // renormalization running on identical rounded inputs (/, sqrt
    // are IEEE-exact).
    "q_pca_power" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      u0 AS (SELECT ROUND(1.0 / SQRT(MIN(LEN(v))), 6) AS u FROM v),
      d1 AS (SELECT vec_id, v,
               ROUND(LIST_SUM(LIST_TRANSFORM(v, x -> x * u)), 6) AS dot
             FROM v CROSS JOIN u0),
      ex1 AS (SELECT UNNEST(v) AS x, GENERATE_SUBSCRIPTS(v, 1) AS i, dot FROM d1),
      y1 AS (SELECT i, ROUND(SUM(x * dot), 6) AS y FROM ex1 GROUP BY i),
      n1 AS (SELECT SQRT(SUM(y * y)) AS nrm FROM y1),
      c1 AS (SELECT LIST(ROUND(y / nrm, 6) ORDER BY i) AS c
             FROM y1 CROSS JOIN n1),
      d2 AS (SELECT vec_id, v,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(v) + 1),
                 i -> v[i] * c[i])), 6) AS dot
             FROM v CROSS JOIN c1),
      ex2 AS (SELECT UNNEST(v) AS x, GENERATE_SUBSCRIPTS(v, 1) AS i, dot FROM d2),
      y2 AS (SELECT i, ROUND(SUM(x * dot), 6) AS y FROM ex2 GROUP BY i),
      n2 AS (SELECT SQRT(SUM(y * y)) AS nrm FROM y2),
      c2 AS (SELECT LIST(ROUND(y / nrm, 6) ORDER BY i) AS c
             FROM y2 CROSS JOIN n2)
      SELECT vec_id,
             CAST(ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(v) + 1),
               i -> v[i] * c[i])), 6) AS DOUBLE) AS proj
      FROM v CROSS JOIN c2
      ORDER BY vec_id""",

    "q_rbo_eval" -> s"""
      WITH ag AS (SELECT event_type, user_id, ROUND(SUM(value), 6) AS m
                  FROM events GROUP BY event_type, user_id),
      ar AS (SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY m DESC NULLS LAST, user_id) AS ra
             FROM ag),
      bg AS (SELECT event_type, user_id, COUNT(*) AS m
             FROM events GROUP BY event_type, user_id),
      br AS (SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY m DESC NULLS LAST, user_id) AS rb
             FROM bg),
      m AS (SELECT a.event_type,
              ROUND(SUM($rboCase), 6) AS rbo,
              COUNT(*) AS n_common
            FROM ar a JOIN br b
              ON a.event_type = b.event_type AND a.user_id = b.user_id
            WHERE a.ra <= 10 AND b.rb <= 10
            GROUP BY a.event_type),
      q AS (SELECT DISTINCT event_type FROM events)
      SELECT q.event_type,
             CAST(COALESCE(m.rbo, 0.0) AS DOUBLE) AS rbo,
             COALESCE(m.n_common, 0)::BIGINT AS n_common
      FROM q LEFT JOIN m USING (event_type)
      ORDER BY event_type""",

    // weight = 1/2^k with integer k: exact dyadic on both engines, no
    // libm anywhere; ages clamp to [0, 52] half-lives.
    "q_decay_agg" -> """
      SELECT event_type, user_id,
             CAST(ROUND(SUM(value * (1.0 / POWER(2.0,
               LEAST(GREATEST(FLOOR(DATE_DIFF('day', CAST(ts AS DATE),
                 DATE '2024-02-01') / 7), 0), 52)))), 6) AS DOUBLE)
               AS decayed_sum,
             CAST(ROUND(SUM(value), 6) AS DOUBLE) AS raw_sum,
             COUNT(*) AS n_rows
      FROM events
      GROUP BY event_type, user_id
      ORDER BY event_type, user_id""",

    "q_dup_ngrams" -> """
      WITH t AS (SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS toks
                 FROM documents),
      sh AS (SELECT doc_id, ARRAY_TO_STRING(toks[i:i+4], ' ') AS tok
             FROM t, UNNEST(RANGE(1, GREATEST(LEN(toks) - 3, 1))) r(i)),
      f AS (SELECT tok, COUNT(DISTINCT doc_id) AS ndocs FROM sh GROUP BY tok),
      per AS (SELECT s.doc_id, COUNT(*) AS n_spans,
                SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup
              FROM sh s JOIN f USING (tok) GROUP BY s.doc_id)
      SELECT d.doc_id,
             COALESCE(p.n_spans, 0)::BIGINT AS n_spans,
             COALESCE(p.n_dup, 0)::BIGINT AS n_dup_spans,
             CAST(ROUND(p.n_dup * 1.0 / p.n_spans, 6) AS DOUBLE) AS dup_frac
      FROM documents d LEFT JOIN per p USING (doc_id)
      ORDER BY d.doc_id""",

    "q_vocab_jaccard" -> """
      WITH gt AS (SELECT DISTINCT source AS g,
                    UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
                  FROM documents),
      gv AS (SELECT g, tok FROM gt WHERE tok <> ''),
      sizes AS (SELECT g, COUNT(*) AS s FROM gv GROUP BY g),
      inter AS (SELECT a.g AS g1, b.g AS g2, COUNT(*) AS i
                FROM gv a JOIN gv b USING (tok)
                WHERE a.g < b.g GROUP BY a.g, b.g)
      SELECT s1.g AS g1, s2.g AS g2,
             COALESCE(i.i, 0)::BIGINT AS n_inter,
             (s1.s + s2.s - COALESCE(i.i, 0))::BIGINT AS n_union,
             CAST(ROUND(COALESCE(i.i, 0) * 1.0
               / (s1.s + s2.s - COALESCE(i.i, 0)), 6) AS DOUBLE) AS jaccard
      FROM sizes s1 JOIN sizes s2 ON s1.g < s2.g
      LEFT JOIN inter i ON i.g1 = s1.g AND i.g2 = s2.g
      ORDER BY g1, g2""",
  )
}
