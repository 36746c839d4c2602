package graft.queries

import org.apache.spark.sql.functions._
import QueryDefs._

/** Core relational surface (SURVEY.md §2.2–§2.7): the capabilities the
  * reference's SQL compiler provides (SELECT/WHERE/JOIN/GROUP BY/ORDER
  * BY/CASE/nested queries — sql4pandas compiles these to pandas ops)
  * plus the standard-SQL surface Spark provides natively.
  *
  * Judged-output typing policy (SURVEY.md §5.4):
  *  - exact aggregates computed in DECIMAL (exact in both engines),
  *    rounded, then CAST to DOUBLE so parquet schemas match;
  *  - window/ranking outputs CAST to BIGINT (DuckDB's native width);
  *  - integer SUMs CAST to BIGINT in the oracle (DuckDB yields HUGEINT);
  *  - every query totally ordered.
  *
  * Most queries are dialect-portable: the same text runs on Spark and
  * DuckDB, held once in `sqlTexts` and overridden per-dialect only
  * where the engines genuinely diverge.
  */
object Core {

  /** Dialect-portable SQL: same text is the Spark query AND the oracle. */
  val sqlTexts: Map[String, String] = Map(

    // Ordered event funnel (view -> click -> purchase) per user: one
    // grouped pass computes each user's first time at every stage;
    // stage survival = ordered timestamp comparisons. Group key =
    // user_id, so the single shuffle is user-count sized at any SF.
    "q_funnel" -> """
      WITH m AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
      SELECT COUNT(*) AS n_users,
             COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
             COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
             COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
                        THEN 1 END) AS n_full_funnel
      FROM m""",

    // Equi-width histogram: bucket = exact integer math (floor to
    // bigint first, so no engine's decimal-division rounding is in
    // play), one hash agg, ~bucket-count rows out at any SF.
    "q_histogram" -> """
      SELECT CAST(FLOOR(CAST(FLOOR(l_extendedprice) AS BIGINT) / 5000)
                  AS BIGINT) AS bucket,
             COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS total
      FROM lineitem
      GROUP BY 1
      ORDER BY bucket""",

    // TPC-H Q1 shape: scan + filter + hash agg + sort. Partial agg
    // map-side; 6-row group key => negligible shuffle at any scale.
    "q_agg_tpch1" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
             COUNT(*) AS cnt
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    // TPC-H Q5 shape: 5-table star join. nation/region broadcast; the
    // big fact joins shuffle on their keys; AQE broadcasts small sides.
    "q_join_star" -> """
      SELECT n_name,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    // Global top-k => TakeOrderedAndProject: per-partition heap of k,
    // driver merge — no global sort materialization.
    "q_sort_limit" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 100""",

    // P1+P2: projection/alias/arithmetic; ReadSchema prunes to 5 of 11
    // lineitem columns at the parquet scan.
    "q_scan_project" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)), 4) AS DOUBLE) AS charge
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
      LIMIT 1000""",

    // P3+P4+P5: predicates pushed to the scan (PushedFilters).
    "q_filter_cmp" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_totalprice BETWEEN 1000.0 AND 50000.0
        AND o_orderstatus IN ('F', 'O')
        AND o_orderpriority LIKE '1-%'
        AND NOT (o_custkey = 0)
      ORDER BY o_orderkey""",

    // P6: CASE WHEN — reference compiles to np.where chains; Catalyst
    // codegens inline.
    "q_case_when" -> """
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity < 10 THEN 'small'
                  WHEN l_quantity < 30 THEN 'medium'
                  ELSE 'large' END AS qty_band,
             CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS flag_code
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
      LIMIT 1000""",

    // P7: NULL semantics — testdata has zero nulls; manufacture them.
    "q_null_handling" -> """
      SELECT l_returnflag,
             COUNT(*) AS n_rows,
             COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
             CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
             CAST(ROUND(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), 0.0) AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_nonzero_disc
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // P8: DISTINCT — hash dedup, shuffle on the full row.
    "q_distinct" -> """
      SELECT DISTINCT c_mktsegment, c_nationkey
      FROM customer
      ORDER BY c_mktsegment, c_nationkey""",

    // W-extra: time-based RANGE frame (1-hour rolling sum per user) —
    // the interval-window surface beyond ROWS frames; DECIMAL-exact
    // sum, peers-at-equal-ts semantics identical on both engines.
    "q_win_time_range" -> """
      SELECT event_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS rolling_1h
      FROM events
      ORDER BY event_id""",

    // LATERAL correlated subquery (top-2 orders per customer) — the
    // per-row dependent-subquery surface; both engines plan it as a
    // correlated join (Spark rewrites to a window/join under the
    // hood). Raw column passthrough, no arithmetic => exact.
    "q_lateral" -> """
      SELECT c_custkey, o_orderkey, o_totalprice
      FROM customer,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c_custkey < 300
      ORDER BY c_custkey, o_orderkey""",

    // Wide-to-long UNPIVOT (SQL-standard form, parses on both
    // engines): per-row metric rows from typed columns — the inverse
    // of the PIVOT queries. Values pre-cast to one type (UNPIVOT
    // requires homogeneous value columns).
    "q_unpivot" -> """
      SELECT o_orderkey, metric, val
      FROM (SELECT o_orderkey,
                   CAST(o_totalprice AS DOUBLE) AS price,
                   CAST(o_custkey AS DOUBLE) AS cust
            FROM orders WHERE o_orderkey < 1000)
      UNPIVOT (val FOR metric IN (price, cust))
      ORDER BY o_orderkey, metric""",

    // J1b: NULL-SAFE equi-join (IS NOT DISTINCT FROM): null keys match
    // null keys instead of vanishing — the semantics `=` silently
    // drops. Nulls are manufactured (testdata has none); the null
    // bucket is one hot key by construction, which is exactly the
    // skew case Salting handles at scale.
    "q_join_nullsafe" -> """
      SELECT a.o_orderkey, b.c_custkey
      FROM (SELECT o_orderkey, NULLIF(o_custkey % 50, 7) AS k
            FROM orders WHERE o_orderkey < 2000) a
      JOIN (SELECT c_custkey, NULLIF(c_custkey % 50, 7) AS k
            FROM customer WHERE c_custkey < 200) b
        ON a.k IS NOT DISTINCT FROM b.k
      ORDER BY o_orderkey, c_custkey""",

    // J1: inner equi-join; AQE broadcasts customer when small.
    "q_join_inner" -> """
      SELECT o_orderkey, c_name, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > 100000.0
      ORDER BY o_orderkey""",

    // J2: left outer with a join-side predicate => NULL order columns.
    "q_join_left" -> """
      SELECT c_custkey, c_name, o_orderkey, o_totalprice
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 200000.0
      WHERE c_nationkey < 5
      ORDER BY c_custkey, o_orderkey NULLS FIRST""",

    // J3: full outer — sort-merge only (no broadcast full-outer);
    // anti-correlated halves synthesize nulls on both sides.
    "q_join_full" -> """
      SELECT a.k AS k_small, a.n_small, b.k AS k_large, b.n_large
      FROM (SELECT o_custkey AS k, COUNT(*) AS n_small FROM orders WHERE o_totalprice < 5000.0 GROUP BY o_custkey) a
      FULL JOIN (SELECT o_custkey AS k, COUNT(*) AS n_large FROM orders WHERE o_totalprice > 250000.0 GROUP BY o_custkey) b
        ON a.k = b.k
      ORDER BY k_small NULLS FIRST, k_large NULLS FIRST""",

    // J4: EXISTS => Catalyst RewritePredicateSubquery => LeftSemi.
    "q_join_semi" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey""",

    // J5: NOT EXISTS => LeftAnti.
    "q_join_anti" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    // J6: explicit cartesian (25×5) — broadcast nested loop.
    "q_join_cross" -> """
      SELECT n_name, r_name
      FROM nation CROSS JOIN region
      ORDER BY n_name, r_name""",

    // J7: non-equi range join against a tiny inline dim =>
    // BroadcastNestedLoopJoin; at 100 TB the band table stays
    // broadcast-size so this never shuffles the fact side.
    "q_join_range" -> """
      SELECT b.band_name, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      FROM orders o
      JOIN (SELECT 'low' AS band_name, 0.0 AS lo, 50000.0 AS hi
            UNION ALL SELECT 'mid', 50000.0, 150000.0
            UNION ALL SELECT 'high', 150000.0, 1000000000.0) b
        ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
      GROUP BY b.band_name
      ORDER BY b.band_name""",

    // W-extras: navigation + distribution window functions
    // (first/last/nth value, percent_rank, cume_dist), named WINDOW
    // clause. Same engine-default frames on both sides; LAST_VALUE
    // gets an explicit full frame (the default current-row frame would
    // be a trivial self-reference).
    "q_win_navigation" -> """
      SELECT o_custkey, o_orderkey,
             CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_p,
             CAST(LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_p,
             CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DOUBLE) AS second_p,
             CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DOUBLE) AS pr,
             CAST(ROUND(CUME_DIST() OVER w, 6) AS DOUBLE) AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    // A-extras: explicit GROUPING SETS (beyond ROLLUP/CUBE).
    "q_grouping_sets" -> """
      SELECT COALESCE(c_mktsegment, 'ALL') AS seg, c_nationkey, COUNT(*) AS n
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      ORDER BY seg, c_nationkey NULLS FIRST""",

    // A2: global (ungrouped) aggregate.
    "q_agg_global" -> """
      SELECT COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
             CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS min_price,
             CAST(ROUND(MAX(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS max_price
      FROM lineitem""",

    // A3: HAVING.
    "q_agg_having" -> """
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) >= 15
      ORDER BY o_custkey""",

    // A7: ROLLUP via Expand.
    "q_agg_rollup" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    // A8: CUBE + GROUPING() to disambiguate generated nulls.
    "q_agg_cube" -> """
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS INT) AS g_status, CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
             COUNT(*) AS cnt
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    // A10: conditional agg (portable pivot).
    "q_pivot_conditional" -> """
      SELECT c_mktsegment,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    // W1+W5: ranking — orderBy carries a unique tiebreaker so ranks are
    // total and oracle-stable.
    "q_win_rank" -> """
      SELECT o_custkey, o_orderkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
             CAST(RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS drnk,
             CAST(NTILE(4)     OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
      FROM orders
      ORDER BY o_custkey, rn""",

    // W2+W3: running aggregates, ROWS and RANGE frames.
    "q_win_running" -> """
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend,
             COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_to_date
      FROM orders
      ORDER BY o_custkey, o_orderkey""",

    // W4: lag/lead.
    "q_win_lag_lead" -> """
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS d,
             CAST(LAG(o_orderdate, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE) AS prev_d,
             CAST(LEAD(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE) AS next_d
      FROM orders
      ORDER BY o_custkey, o_orderkey""",

    // O3: UNION ALL (Spark `union` == SQL UNION ALL).
    "q_union_all" -> """
      SELECT c_custkey AS k, 'customer' AS src FROM customer WHERE c_custkey <= 100
      UNION ALL
      SELECT o_custkey AS k, 'orders' AS src FROM orders WHERE o_custkey <= 100
      ORDER BY k, src""",

    // O4: UNION (distinct). Key widths differ (int32 vs int64) — cast.
    "q_union_distinct" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
      UNION
      SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier
      ORDER BY k""",

    // O5: INTERSECT.
    "q_intersect" -> """
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000.0
      INTERSECT
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      ORDER BY k""",

    // O6: EXCEPT.
    "q_except" -> """
      SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey AS k FROM orders
      ORDER BY k""",

    // Q1: derived table in FROM — the reference's "nested queries"
    // (inner statement executed first, registered as a table).
    "q_subquery_from" -> """
      SELECT t.o_custkey, t.n_orders
      FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) t
      WHERE t.n_orders >= 15
      ORDER BY t.o_custkey""",

    // Q4: RECURSIVE CTE (Spark 4's UnionLoop): a recursive bucket
    // spine drives a price histogram via theta join — LEFT JOIN keeps
    // empty buckets, so the recursion's full output is observable.
    "q_recursive_cte" -> """
      WITH RECURSIVE spine(b) AS (
        SELECT 0
        UNION ALL
        SELECT b + 50000 FROM spine WHERE b < 450000
      )
      SELECT b AS bucket_lo, COUNT(o_orderkey) AS n_orders
      FROM spine LEFT JOIN orders
        ON o_totalprice >= b AND o_totalprice < b + 50000
      GROUP BY b
      ORDER BY b""",

    // Q2: scalar subquery, decorrelated by Catalyst. Threshold computed
    // in decimal then rounded so both engines compare the same constant.
    "q_subquery_scalar" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 1.5 * (SELECT CAST(ROUND(AVG(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) FROM orders)
      ORDER BY o_orderkey""",
  )

  /** Spark-side text where the dialects diverge. */
  val sparkOnlySql: Map[String, String] = Map(
    // A-extra: ordered string aggregation — Spark spells it LISTAGG
    // WITHIN GROUP (SQL:2016), DuckDB STRING_AGG(expr, sep ORDER BY),
    // hence the override.
    "q_string_agg" -> """
      SELECT c_mktsegment,
             LISTAGG(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS names
      FROM customer WHERE c_custkey < 100
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    // Cohort retention: cohort = first active day per user, one row per
    // (cohort, day-offset) with active-user counts. DATEDIFF arg order
    // differs between dialects, hence the override.
    "q_retention" -> """
      WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
                 FROM events GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      SELECT CAST(f.d0 AS STRING) AS cohort,
             CAST(DATEDIFF(a.d, f.d0) AS BIGINT) AS day_offset,
             COUNT(*) AS n_active
      FROM a JOIN f ON a.user_id = f.user_id
      GROUP BY f.d0, DATEDIFF(a.d, f.d0)
      ORDER BY cohort, day_offset""",
    // A10-extra: the explicit PIVOT clause (vs q_pivot_conditional's
    // conditional aggregation); oracle re-expresses as FILTERed counts.
    "q_pivot_clause" -> """
      SELECT user_id,
             COALESCE(n_click, 0) AS n_click,
             COALESCE(n_view, 0) AS n_view,
             COALESCE(n_purchase, 0) AS n_purchase
      FROM (
        SELECT * FROM (SELECT user_id, event_type FROM events)
        PIVOT (COUNT(*) FOR event_type IN ('click' AS n_click, 'view' AS n_view, 'purchase' AS n_purchase))
      )
      ORDER BY user_id""",

    // A-extras: array aggregation, sorted so both engines'
    // nondeterministic accumulation orders compare equal, then
    // serialized to a CSV string — the judged output carries only
    // scalar columns (SURVEY.md §5.4 rule 6: the driver's pandas-based
    // hash diff cannot hash array cells).
    "q_array_agg" -> """
      SELECT l_orderkey,
             ARRAY_JOIN(TRANSFORM(ARRAY_SORT(COLLECT_LIST(l_linenumber)), x -> CAST(x AS STRING)), ',') AS lines,
             CAST(SIZE(COLLECT_LIST(l_linenumber)) AS BIGINT) AS n
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY l_orderkey""",

    // A5+A6: Spark PERCENTILE() vs DuckDB quantile_cont().
    "q_agg_stats" -> """
      SELECT l_returnflag,
             CAST(ROUND(STDDEV_SAMP(l_quantity), 6) AS DOUBLE) AS sd_qty,
             CAST(ROUND(VAR_SAMP(l_quantity), 6) AS DOUBLE) AS var_qty,
             CAST(ROUND(PERCENTILE(l_quantity, 0.5), 6) AS DOUBLE) AS median_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // F-extra: regexp_extract_all — group 1 spelled explicitly because
    // the DEFAULT differs (Spark 1, DuckDB 0). Matches are serialized
    // to a CSV scalar (SURVEY.md §5.4 rule 6: the driver's pandas hash
    // diff cannot sort/hash array cells) — Spark spells it ARRAY_JOIN,
    // DuckDB ARRAY_TO_STRING, hence the override pair.
    "q_regexp_extract_all" -> """
      SELECT event_id,
             ARRAY_JOIN(REGEXP_EXTRACT_ALL(props, '([0-9]+)', 1), ',') AS nums
      FROM events
      ORDER BY event_id""",

    // A4: Spark reads the shimmed `events` view (ts already µs).
    "q_agg_count_distinct" -> """
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(DISTINCT user_id) AS u
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
      ORDER BY event_type, d""",
  )

  /** Oracle overrides paired with `sparkOnlySql` + oracles for queries
    * defined via the DataFrame API below.
    */
  val oracleOverrides: Map[String, String] = Map(
    "q_string_agg" -> """
      SELECT c_mktsegment,
             STRING_AGG(c_name, '|' ORDER BY c_name) AS names
      FROM customer WHERE c_custkey < 100
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q_profile" -> """
      SELECT * FROM (
        SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(l_orderkey) AS n_null,
               COUNT(DISTINCT l_orderkey) AS n_distinct,
               CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
               CAST(MAX(l_orderkey) AS VARCHAR) AS max_val
        FROM lineitem
        UNION ALL
        SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
               COUNT(DISTINCT l_linenumber),
               CAST(MIN(l_linenumber) AS VARCHAR),
               CAST(MAX(l_linenumber) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', COUNT(*), COUNT(*) - COUNT(l_linestatus),
               COUNT(DISTINCT l_linestatus),
               CAST(MIN(l_linestatus) AS VARCHAR),
               CAST(MAX(l_linestatus) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
               COUNT(DISTINCT l_returnflag),
               CAST(MIN(l_returnflag) AS VARCHAR),
               CAST(MAX(l_returnflag) AS VARCHAR)
        FROM lineitem)
      ORDER BY col_name""",

    "q_retention" -> """
      WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
                 FROM events GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      SELECT CAST(f.d0 AS VARCHAR) AS cohort,
             CAST(DATEDIFF('day', f.d0, a.d) AS BIGINT) AS day_offset,
             COUNT(*) AS n_active
      FROM a JOIN f ON a.user_id = f.user_id
      GROUP BY f.d0, DATEDIFF('day', f.d0, a.d)
      ORDER BY cohort, day_offset""",

    "q_pivot_clause" -> """
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
             COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",

    "q_array_agg" -> """
      SELECT l_orderkey,
             ARRAY_TO_STRING(LIST_SORT(LIST(l_linenumber)), ',') AS lines,
             CAST(LEN(LIST(l_linenumber)) AS BIGINT) AS n
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY l_orderkey""",

    "q_regexp_extract_all" -> """
      SELECT event_id,
             ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(props, '([0-9]+)', 1), ',') AS nums
      FROM events
      ORDER BY event_id""",

    "q_agg_stats" -> """
      SELECT l_returnflag,
             CAST(ROUND(STDDEV_SAMP(l_quantity), 6) AS DOUBLE) AS sd_qty,
             CAST(ROUND(VAR_SAMP(l_quantity), 6) AS DOUBLE) AS var_qty,
             CAST(ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS DOUBLE) AS median_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // DuckDB reads raw parquet: ts is TIMESTAMP_NS, cast truncates to µs
    // identically to the Spark shim (verified, SURVEY.md §1.3).
    "q_agg_count_distinct" -> """
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, COUNT(DISTINCT user_id) AS u
      FROM events
      GROUP BY event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE)
      ORDER BY event_type, d""",

    // J9 broadcast-hint query — same semantics, plan-only difference.
    "q_join_broadcast" -> """
      SELECT n_name, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    // W6 top-k per group (same oracle judges the custom operator).
    "q_topk_custom" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",

    // W6 top-k per group.
    "q_topk_pergroup" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",
  )

  /** J9: explicit broadcast hint via the DataFrame API — pins
    * broadcast-hash regardless of size estimates (at 100 TB, dims like
    * nation/customer-sample stay broadcast-able; the fact side never
    * shuffles for the join).
    */
  val qJoinBroadcast: QueryFn = withTables { spark =>
    spark.table("orders")
      .join(broadcast(spark.table("customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(spark.table("nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").as("total"))
      .orderBy(col("n_name"))
  }

  /** J1 through the Bloom pre-join filter (operators/BloomJoin.scala):
    * the probe side is filtered by a broadcast Bloom filter of the
    * build side's keys BEFORE the join shuffles it, and the real join
    * then removes the filter's false positives — so the result equals
    * the plain inner join (judged against q_join_inner's exact oracle)
    * while probe rows without a partner never ride the shuffle. The
    * 100 TB win: in selective joins most probe rows are partnerless.
    * PlanSpec pins the probe-side filter sitting below the join.
    */
  val qJoinBloom: QueryFn = withTables { spark =>
    graft.operators.BloomJoin.inner(
        spark.table("orders").filter(col("o_totalprice") > 100000.0),
        spark.table("customer"), "o_custkey", "c_custkey")
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Z-order key computation, judged value-exact: the Morton interleave
    * of (l_partkey, l_suppkey) — the sort key behind two-dimensional
    * data-skipping layouts (operators/ZOrder.scala; clusterByZ's
    * range-partition + local sort is pinned by ZOrderSpec). The bit
    * ladder is pure arithmetic, so DuckDB restates it verbatim.
    */
  val qZorder: QueryFn = withTables { spark =>
    spark.table("lineitem").filter(col("l_orderkey") <= 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.ZOrder.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy("z", "l_orderkey", "l_linenumber")
  }

  /** Skew-safe join + aggregation through BOTH Salting helpers
    * (operators/Salting.scala): the orders→customer join runs salted
    * (8 deterministic salts, small side replicated) and the revenue
    * rollup runs as a two-phase salted aggregation (partial on
    * (key, salt), merge on key). Result-identical to the plain
    * join+agg — the oracle states exactly that — while a monster key
    * would spread over 8 reducers instead of one.
    */
  val qJoinSalted: QueryFn = withTables { spark =>
    val orders = spark.table("orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val cust = spark.table("customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val joined = graft.operators.Salting.saltedJoin(
      orders, cust, Seq("custkey"), numSalts = 8, how = "inner")
    graft.operators.Salting.saltedAgg(joined, Seq("c_mktsegment"), numSalts = 8,
        partial = Seq(count(lit(1)).as("pc"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("ps")),
        merge = Seq(sum(col("pc")).cast("bigint").as("n_orders"),
          round(sum(col("ps")), 2).cast("double").as("total")))
      .orderBy("c_mktsegment")
  }

  /** W6: top-k per group via the DataFrame API — the canonical
    * row_number + filter pattern (shuffles once on the partition key).
    */
  val qTopkPergroup: QueryFn = withTables { spark =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    spark.table("orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** W6 via the custom TopKPerKey physical operator (plans/TopKPerKey
    * .scala): same clustering+sort as the window formulation but
    * streams each sorted run in O(k) memory instead of buffering the
    * group — judged against the same row_number oracle (o_orderkey
    * tie-break makes ranks deterministic).
    */
  val qTopkCustom: QueryFn = withTables { spark =>
    graft.plans.TopK.perKey(spark.table("orders"),
        Seq("o_custkey"), "o_totalprice", k = 3,
        desc = true, tieBreakCols = Seq("o_orderkey"))
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** The user-facing facade exercised as a judged query: Graft.sql()
    * over DataFrames passed as a Map — the reference's
    * `sql4pandas(query, {name: frame})` call shape, with its README
    * demo surface (nested query + CASE + join + aggregate). The view
    * names are facade-local (fcust/fnat), proving the query runs
    * against the frames the CALLER handed in, not the pre-registered
    * catalog.
    */
  val qSqlFacade: QueryFn = (spark, sfDir) => {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
    graft.Graft.sql(spark, """
      SELECT n.n_name, seg.bucket, COUNT(*) AS n_cust
      FROM (SELECT c_custkey, c_nationkey,
                   CASE WHEN c_acctbal < 0 THEN 'neg'
                        WHEN c_acctbal < 5000 THEN 'mid'
                        ELSE 'high' END AS bucket
            FROM fcust) seg
      JOIN fnat n ON seg.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, seg.bucket
      ORDER BY n.n_name, seg.bucket""",
      Map("fcust" -> cust, "fnat" -> nat))
  }

  /** J7 at two-big-sides scale: the binned range join. 150 overlapping
    * price bands (width 7500, stride 3000 — each order matches ~2-3)
    * equi-join orders on 5000-wide bins instead of nested-looping; the
    * oracle states the same range predicate directly. PlanSpec pins
    * that no nested-loop join appears.
    */
  /** J7c: INTERVAL-overlap join (both sides ranged) via two-sided
    * binning — ±2000 price windows around each order vs generated
    * 6000-wide bands; every overlapping pair with its overlap length.
    * The raw conjunction would plan a nested loop; overlapBinned makes
    * it a bin equi-join with pair-level dedup (RangeJoinSpec pins
    * equality to the naive theta join on arbitrary intervals).
    */
  val qJoinOverlap: QueryFn = withTables { spark =>
    val o = spark.table("orders").filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        (col("o_totalprice") - 2000.0).as("l_lo"),
        (col("o_totalprice") + 2000.0).as("l_hi"))
    val bands = spark.range(0, 112).select(
      col("id").as("band_id"),
      (col("id") * 4500.0).as("r_lo"),
      (col("id") * 4500.0 + 6000.0).as("r_hi"))
    graft.operators.RangeJoin.overlapBinned(o, bands,
        "o_orderkey", "l_lo", "l_hi", "band_id", "r_lo", "r_hi",
        binWidth = 5000L)
      .select(col("o_orderkey"), col("band_id"),
        round(least(col("l_hi"), col("r_hi")) - greatest(col("l_lo"), col("r_lo")), 2)
          .cast("double").as("overlap"))
      .orderBy("o_orderkey", "band_id")
  }

  val qJoinRangeBinned: QueryFn = withTables { spark =>
    val intervals = spark.range(0, 150).select(
      col("id").as("band_id"),
      (col("id") * 3000.0).as("lo"),
      (col("id") * 3000.0 + 7500.0).as("hi"))
    graft.operators.RangeJoin.binned(
        spark.table("orders"), intervals, "o_totalprice", "lo", "hi", 5000L)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("total"))
      .orderBy("band_id")
  }

  /** Column profiling, judged at the exact-distinct regime (bounded
    * scope); the production default is the HLL sketch path. ONE
    * aggregation pass for all four columns — the oracle restates it as
    * four per-column aggregates unioned.
    */
  val qProfile: QueryFn = withTables { spark =>
    graft.operators.Profiling.profile(spark.table("lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_linestatus", "l_returnflag"),
        exactDistinct = true)
      .orderBy("col_name")
  }

  /** All §2.2–§2.7 judged queries. */
  val queries: Map[String, QueryFn] =
    (sqlTexts ++ sparkOnlySql).map { case (k, v) => k -> QueryDefs.sql(v) } ++ Map(
      "q_profile" -> qProfile,
      "q_join_broadcast" -> qJoinBroadcast,
      "q_join_bloom" -> qJoinBloom,
      "q_join_salted" -> qJoinSalted,
      "q_zorder" -> qZorder,
      "q_topk_pergroup" -> qTopkPergroup,
      "q_topk_custom" -> qTopkCustom,
      "q_sql_facade" -> qSqlFacade,
      "q_join_range_binned" -> qJoinRangeBinned,
      "q_join_overlap" -> qJoinOverlap,
    )

  /** All §2.2–§2.7 oracle SQL. */
  val oracles: Map[String, String] = sqlTexts ++ oracleOverrides ++ Map(
    // the identical Morton bit-spread ladder, one CTE per doubling
    // step (masks in decimal: 0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF,
    // 0x0F0F0F0F0F0F0F0F, 0x3333333333333333, 0x5555555555555555)
    "q_zorder" -> """
      WITH s0 AS (SELECT l_orderkey, l_linenumber,
                         CAST(l_partkey AS BIGINT) AS xa,
                         CAST(l_suppkey AS BIGINT) AS xb
                  FROM lineitem WHERE l_orderkey <= 1000),
      s1 AS (SELECT l_orderkey, l_linenumber,
                    (xa | (xa << 16)) & 281470681808895 AS xa,
                    (xb | (xb << 16)) & 281470681808895 AS xb FROM s0),
      s2 AS (SELECT l_orderkey, l_linenumber,
                    (xa | (xa << 8)) & 71777214294589695 AS xa,
                    (xb | (xb << 8)) & 71777214294589695 AS xb FROM s1),
      s3 AS (SELECT l_orderkey, l_linenumber,
                    (xa | (xa << 4)) & 1085102592571150095 AS xa,
                    (xb | (xb << 4)) & 1085102592571150095 AS xb FROM s2),
      s4 AS (SELECT l_orderkey, l_linenumber,
                    (xa | (xa << 2)) & 3689348814741910323 AS xa,
                    (xb | (xb << 2)) & 3689348814741910323 AS xb FROM s3),
      s5 AS (SELECT l_orderkey, l_linenumber,
                    (xa | (xa << 1)) & 6148914691236517205 AS xa,
                    (xb | (xb << 1)) & 6148914691236517205 AS xb FROM s4)
      SELECT l_orderkey, l_linenumber, xa | (xb << 1) AS z
      FROM s5
      ORDER BY z, l_orderkey, l_linenumber""",

    // the Bloom pre-filter is result-transparent: the oracle is the
    // plain inner join (identical to q_join_inner's)
    "q_join_bloom" -> sqlTexts("q_join_inner"),

    // salting is result-transparent too: plain join + aggregate
    "q_join_salted" -> """
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    // the binned equi-join's semantics stated as the raw range
    // predicate over a generated band table
    "q_join_range_binned" -> """
      SELECT n AS band_id, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      FROM orders, UNNEST(RANGE(0, 150)) r(n)
      WHERE o_totalprice >= n * 3000.0 AND o_totalprice < n * 3000.0 + 7500.0
      GROUP BY n
      ORDER BY band_id""",

    // J7c: the naive theta join the binned overlap must equal —
    // closed-interval intersection, identical overlap arithmetic.
    "q_join_overlap" -> """
      WITH o AS (SELECT o_orderkey,
                        o_totalprice - 2000.0 AS l_lo,
                        o_totalprice + 2000.0 AS l_hi
                 FROM orders WHERE o_orderkey < 1000),
           b AS (SELECT n AS band_id, n * 4500.0 AS r_lo,
                        n * 4500.0 + 6000.0 AS r_hi
                 FROM UNNEST(RANGE(0, 112)) r(n))
      SELECT o_orderkey, band_id,
             CAST(ROUND(LEAST(l_hi, r_hi) - GREATEST(l_lo, r_lo), 2) AS DOUBLE) AS overlap
      FROM o JOIN b ON l_lo <= r_hi AND r_lo <= l_hi
      ORDER BY o_orderkey, band_id""",

    // same query over the canonical table names
    "q_sql_facade" -> """
      SELECT n.n_name, seg.bucket, COUNT(*) AS n_cust
      FROM (SELECT c_custkey, c_nationkey,
                   CASE WHEN c_acctbal < 0 THEN 'neg'
                        WHEN c_acctbal < 5000 THEN 'mid'
                        ELSE 'high' END AS bucket
            FROM customer) seg
      JOIN nation n ON seg.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, seg.bucket
      ORDER BY n.n_name, seg.bucket""",
  )
}
