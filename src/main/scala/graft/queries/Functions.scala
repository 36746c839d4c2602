package graft.queries

import org.apache.spark.sql.functions._
import QueryDefs._
import graft.functions.Udfs
import graft.operators.AsOfJoin

/** Scalar-function + UDF/UDAF + as-of-join surface (SURVEY.md §2.8,
  * §2.9, J10). All built-ins stay inside whole-stage codegen; the UDF
  * queries demonstrate the user-extension surface the reference exposes
  * as "any Python function over frames".
  */
object Functions {

  /** Dialect-portable SQL (same text both engines). */
  val sqlTexts: Map[String, String] = Map(

    // F1: string functions — 1-based SUBSTR in both dialects; LENGTH
    // cast to BIGINT (Spark INT vs DuckDB BIGINT).
    "q_str_funcs" -> """
      SELECT c_custkey,
             UPPER(c_mktsegment) AS seg_u,
             LOWER(c_name) AS name_l,
             SUBSTR(c_name, 10, 9) AS id_str,
             CAST(LENGTH(c_name) AS BIGINT) AS name_len,
             CONCAT(c_mktsegment, ':', c_custkey) AS seg_key,
             LPAD(TRIM(c_mktsegment), 12, '.') AS seg_pad
      FROM customer
      ORDER BY c_custkey
      LIMIT 1000""",

    // F2: regex — [0-9] instead of \d (portable across literal-escape
    // rules), group-1 extraction on the Brand#N fixture.
    "q_regex" -> """
      SELECT p_partkey,
             CAST(REGEXP_EXTRACT(p_brand, '#([0-9]+)', 1) AS INT) AS brand_num,
             REGEXP_REPLACE(p_name, ' ', '_') AS name_u
      FROM part
      ORDER BY p_partkey
      LIMIT 1000""",

    // F5: math functions — floating results rounded (§5.4 rule 3).
    "q_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(SQRT(l_quantity), 6) AS DOUBLE) AS sqrt_qty,
             CAST(ROUND(LN(l_extendedprice), 6) AS DOUBLE) AS ln_price,
             CAST(ROUND(EXP(l_discount), 6) AS DOUBLE) AS exp_disc,
             CAST(ROUND(POW(l_tax, 2), 6) AS DOUBLE) AS tax_sq,
             ABS(l_quantity - 25.0) AS qty_dev,
             CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
             MOD(l_orderkey, 7) AS key_mod
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
      LIMIT 1000""",
  )

  /** Spark-side text where dialects diverge. */
  val sparkOnlySql: Map[String, String] = Map(

    // F4: date/time functions.
    "q_date_funcs" -> """
      SELECT o_orderkey,
             YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
             CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
             CAST(DATEDIFF(DATE'1998-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_to_98,
             CAST(DATE_ADD(CAST(o_orderdate AS DATE), 30) AS DATE) AS plus30
      FROM orders
      ORDER BY o_orderkey
      LIMIT 1000""",

    // F6: array ops over embeddings (dim 64). Float->double widening is
    // exact in both engines, so no rounding needed.
    "q_array_funcs" -> """
      SELECT vec_id,
             CAST(SIZE(embedding) AS BIGINT) AS dim,
             CAST(ELEMENT_AT(embedding, 1) AS DOUBLE) AS first_val,
             CAST(ELEMENT_AT(embedding, 64) AS DOUBLE) AS last_val,
             CAST(SIZE(SLICE(embedding, 1, 8)) AS BIGINT) AS slice_len
      FROM embeddings
      ORDER BY vec_id
      LIMIT 1000""",

    // F9: JSON extraction from the events props column.
    "q_json_extract" -> """
      SELECT event_id, event_type,
             CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS k_val
      FROM events
      ORDER BY event_id
      LIMIT 1000""",

    // F8: higher-order functions — transform/aggregate/zip_with over
    // the embedding arrays. Both engines left-fold in array order after
    // exact float->double widening, so sums agree bit-for-bit (rounded
    // to 6 dp as a guard).
    "q_hof_vector" -> """
      SELECT vec_id,
             CAST(ROUND(SQRT(AGGREGATE(TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, x) -> a + x)), 6) AS DOUBLE) AS l2_norm,
             CAST(ROUND(AGGREGATE(ZIP_WITH(embedding, REVERSE(embedding), (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, x) -> a + x), 6) AS DOUBLE) AS rev_dot,
             CAST(ROUND(AGGREGATE(TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE))), 0D, (a, x) -> a + x), 6) AS DOUBLE) AS l1_norm
      FROM embeddings
      ORDER BY vec_id""",
  )

  /** DuckDB oracle SQL for everything not portable. */
  val oracleOverrides: Map[String, String] = Map(

    "q_date_funcs" -> """
      SELECT o_orderkey,
             CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m, CAST(DAY(o_orderdate) AS INT) AS d,
             CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
             CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30
      FROM orders
      ORDER BY o_orderkey
      LIMIT 1000""",

    "q_array_funcs" -> """
      SELECT vec_id,
             CAST(LEN(embedding) AS BIGINT) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first_val,
             CAST(embedding[64] AS DOUBLE) AS last_val,
             CAST(LEN(embedding[1:8]) AS BIGINT) AS slice_len
      FROM embeddings
      ORDER BY vec_id
      LIMIT 1000""",

    "q_json_extract" -> """
      SELECT event_id, event_type,
             CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val
      FROM events
      ORDER BY event_id
      LIMIT 1000""",

    // F8 oracle: DuckDB list HOFs; list_reduce seeds with the first
    // element, giving the same left-to-right summation sequence.
    "q_hof_vector" -> """
      SELECT vec_id,
             CAST(ROUND(SQRT(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), (a, b) -> a + b)), 6) AS DOUBLE) AS l2_norm,
             CAST(ROUND(list_reduce(list_transform(list_zip(CAST(embedding AS DOUBLE[]), list_reverse(CAST(embedding AS DOUBLE[]))), p -> p[1] * p[2]), (a, b) -> a + b), 6) AS DOUBLE) AS rev_dot,
             CAST(ROUND(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> ABS(x)), (a, b) -> a + b), 6) AS DOUBLE) AS l1_norm
      FROM embeddings
      ORDER BY vec_id""",

    // U3 oracle: bigrams via 1-based inclusive list slicing.
    "q_udtf_ngrams" -> """
      WITH t AS (SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS toks
                 FROM documents)
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             ARRAY_TO_STRING(toks[i:i+1], ' ') AS ngram
      FROM t, UNNEST(RANGE(1, LEN(toks))) r(i)
      ORDER BY doc_id, pos""",

    // U1: the UDF's semantics expressed as portable CASE.
    "q_udf_band" -> """
      SELECT o_orderkey,
             CASE WHEN o_totalprice < 50000.0 THEN 'low'
                  WHEN o_totalprice < 150000.0 THEN 'mid'
                  ELSE 'high' END AS band
      FROM orders
      ORDER BY o_orderkey
      LIMIT 1000""",

    // U2: geometric mean == exp(avg(ln(x))).
    "q_udaf_geomean" -> """
      SELECT o_orderpriority,
             CAST(ROUND(EXP(AVG(LN(o_totalprice))), 4) AS DOUBLE) AS gm
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // J10-nearest: closer of the two directional ASOF matches, ties
    // backward (pandas rule).
    "q_join_asof_nearest" -> """
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'click'),
           b AS (SELECT p.event_id, c.ts AS back_ts
                 FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
           f AS (SELECT p.event_id, c.ts AS fwd_ts
                 FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts)
      SELECT p.event_id, p.user_id, p.ts,
             CASE WHEN back_ts IS NULL THEN fwd_ts
                  WHEN fwd_ts IS NULL THEN back_ts
                  WHEN ABS(EPOCH(p.ts) - EPOCH(back_ts)) <= ABS(EPOCH(p.ts) - EPOCH(fwd_ts)) THEN back_ts
                  ELSE fwd_ts END AS near_click_ts
      FROM p
      JOIN b ON p.event_id = b.event_id
      JOIN f ON p.event_id = f.event_id
      ORDER BY p.event_id""",

    // J10-forward: ASOF with the reversed inequality = earliest right
    // row at-or-after each left row.
    "q_join_asof_forward" -> """
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.ts, c.ts AS next_click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.event_id""",

    // J10: DuckDB's native ASOF JOIN (inclusive >=), with ns->µs
    // truncation applied BEFORE the comparison to mirror Spark's view.
    "q_join_asof" -> """
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id""",

    // J10-tolerance: the ASOF match masked by the same integer-micros
    // staleness bound the Spark side applies (EPOCH_US == unix_micros).
    "q_join_asof_tol" -> """
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'click'),
           m AS (SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
                 FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts)
      SELECT event_id, user_id, ts,
             CASE WHEN click_ts IS NOT NULL
                   AND EPOCH_US(ts) - EPOCH_US(click_ts) <= 21600000000
                  THEN click_ts END AS click_ts
      FROM m
      ORDER BY event_id""",
  )

  /** U1: scalar UDF through the registered-function surface. */
  val qUdfBand: QueryFn = withTables { spark =>
    Udfs.register(spark)
    spark.sql("""
      SELECT o_orderkey, price_band(o_totalprice) AS band
      FROM orders
      ORDER BY o_orderkey
      LIMIT 1000""")
  }

  /** U2: typed Aggregator UDAF (partial-aggregating, map-side combine). */
  val qUdafGeomean: QueryFn = withTables { spark =>
    Udfs.register(spark)
    spark.sql("""
      SELECT o_orderpriority,
             CAST(ROUND(geo_mean(o_totalprice), 4) AS DOUBLE) AS gm
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** U3: custom Catalyst Generator (UDTF) — bigrams with positions. */
  val qUdtfNgrams: QueryFn = withTables { spark =>
    graft.functions.NGramsGenerator.register(spark)
    spark.sql("""
      SELECT doc_id, pos, ngram
      FROM documents
      LATERAL VIEW ngrams(split(lower(text), ' '), 2) t AS pos, ngram
      ORDER BY doc_id, pos""")
  }

  /** J10-forward: EARLIEST click at-or-after each purchase per user
    * (pandas merge_asof direction='forward'); DuckDB's ASOF with a
    * reversed inequality is the oracle.
    */
  val qJoinAsofForward: QueryFn = withTables { spark =>
    val events = spark.table("events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "ts")
    AsOfJoin.asofForward(purchases, clicks,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        payload = Map("ts" -> "next_click_ts"))
      .select("event_id", "user_id", "ts", "next_click_ts")
      .orderBy("event_id")
  }

  /** J10-nearest: the closer click (either direction, ties backward)
    * per purchase — merge_asof direction='nearest' parity.
    */
  val qJoinAsofNearest: QueryFn = withTables { spark =>
    val events = spark.table("events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "ts")
    AsOfJoin.asofNearest(purchases, clicks,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        payloadAlias = "near_click_ts")
      .select("event_id", "user_id", "ts", "near_click_ts")
      .orderBy("event_id")
  }

  /** J10: as-of join — latest click at-or-before each purchase per user. */
  val qJoinAsof: QueryFn = withTables { spark =>
    val events = spark.table("events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "ts")
    AsOfJoin.asof(purchases, clicks,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        payload = Map("ts" -> "click_ts"))
      .select("event_id", "user_id", "ts", "click_ts")
      .orderBy("event_id")
  }

  /** J10-tolerance (pandas merge_asof `tolerance`): the backward match
    * counts only within a 6-hour staleness bound — older clicks leave
    * the purchase unattributed (null payload, row kept). Same
    * one-shuffle kernel + map-side mask; bound compared in integer
    * micros on both engines.
    */
  val qJoinAsofTol: QueryFn = withTables { spark =>
    val events = spark.table("events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "ts")
    AsOfJoin.asofWithin(purchases, clicks,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        payload = Map("ts" -> "click_ts"),
        within = (l, r) =>
          unix_micros(l) - unix_micros(r) <= lit(6L * 3600L * 1000000L))
      .select("event_id", "user_id", "ts", "click_ts")
      .orderBy("event_id")
  }

  val queries: Map[String, QueryFn] =
    (sqlTexts ++ sparkOnlySql).map { case (k, v) => k -> QueryDefs.sql(v) } ++ Map(
      "q_udf_band" -> qUdfBand,
      "q_udaf_geomean" -> qUdafGeomean,
      "q_udtf_ngrams" -> qUdtfNgrams,
      "q_join_asof" -> qJoinAsof,
      "q_join_asof_tol" -> qJoinAsofTol,
      "q_join_asof_forward" -> qJoinAsofForward,
      "q_join_asof_nearest" -> qJoinAsofNearest,
    )

  val oracles: Map[String, String] = sqlTexts ++ oracleOverrides
}
