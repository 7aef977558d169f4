"""DuckDB oracle SQL for the relational query set (SURVEY.md §2.7).

Each string is ANSI SQL executable by DuckDB over the driver-registered
parquet views. Column aliases match the Spark plans in relational.py exactly
(the driver's comparator sorts columns by name before hashing).

Type alignment notes:
- money sums: CAST(...AS DECIMAL(18,2)) inside AND outside SUM so both
  engines emit decimal(18,2) (Spark sum widens to (28,2), DuckDB to (38,2)).
- DuckDB SUM(INTEGER/BIGINT) returns HUGEINT (int128) — cast to BIGINT to
  match Spark's long.
"""

from diepy_spark.operators.sketch import hex_frac_sql

RELATIONAL_ORACLES: dict[str, str] = {
    "r1_scan_projection": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    "r2_filter": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000 ORDER BY o_orderkey
    """,
    "r3_hash_aggregate": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "r4_join3_aggregate": """
        SELECT n.n_name, COUNT(*) AS num_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
    """,
    "r5_left_outer_join": """
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS cnt FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    "r6_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        ORDER BY c_custkey
    """,
    "r7_anti_join": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
        ORDER BY c_custkey
    """,
    "r8_topk": """
        SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "r9_distinct": """
        SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority
    """,
    "r10_union": """
        SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k
    """,
    "r11_date_functions": """
        SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
               COUNT(*) AS c
        FROM orders GROUP BY 1,2 ORDER BY 1,2
    """,
    "r12_string_functions": """
        SELECT upper(r_name) AS u, lower(r_name) AS l, length(r_name) AS n,
               substr(r_name,1,3) AS s3, trim(concat('  ', r_name, '  ')) AS t
        FROM region ORDER BY r_name
    """,
    "r13_conditional_aggregation": """
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS hi,
               CAST(SUM(CASE WHEN o_totalprice <= 150000 THEN 1 ELSE 0 END) AS BIGINT) AS lo
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "r14_ranking_window": """
        SELECT o_custkey, o_orderkey, rk FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) t WHERE rk <= 2 ORDER BY o_custkey, rk
    """,
    "r15_dedup_accounting": """
        SELECT lang, COUNT(*) AS total, COUNT(DISTINCT text) AS distinct_texts
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "r16_tumbling_window": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type,
               COUNT(*) AS c, ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE),2) AS s
        FROM events GROUP BY 1,2 ORDER BY 1,2
    """,
    "r17_text_stats": """
        SELECT source, COUNT(*) AS c, MIN(n_chars) AS mn, MAX(n_chars) AS mx,
               CAST(SUM(n_chars) AS BIGINT) AS s
        FROM documents GROUP BY source ORDER BY source
    """,
    "r18_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "r19_range_join": """
        SELECT p_brand, COUNT(*) AS c FROM part JOIN lineitem
          ON p_partkey = l_partkey AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        GROUP BY p_brand ORDER BY p_brand
    """,
    "r20_cosine_pairs": """
        WITH u AS (SELECT vec_id, unnest(embedding) AS x,
                          generate_subscripts(embedding,1) AS i
                   FROM embeddings WHERE vec_id < 20)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(SUM(a.x*b.x)/(SQRT(SUM(a.x*a.x))*SQRT(SUM(b.x*b.x))),4) AS cos
        FROM u a JOIN u b ON a.i=b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id ORDER BY 1,2 LIMIT 20
    """,
    "r21_intersect": """
        SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k
    """,
    "r22_except": """
        SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        EXCEPT SELECT o_orderkey FROM orders WHERE o_totalprice > 300000 ORDER BY k
    """,
    "r23_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "r24_sliding_frame": """
        WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                              COUNT(*) AS c
                       FROM events GROUP BY 1,2)
        SELECT event_type, d,
               CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY d
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS c7
        FROM daily ORDER BY event_type, d LIMIT 100
    """,
    "r25_json_extraction": """
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS bucket, COUNT(*) AS c
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "r26_lag_window": """
        WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS c
                       FROM events GROUP BY 1)
        SELECT d, c, c - LAG(c, 1, 0) OVER (ORDER BY d) AS delta
        FROM daily ORDER BY d LIMIT 60
    """,
    "r27_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status, COUNT(*) AS c
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "r28_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    # r28b: same histogram construction as the Spark plan — double division
    # for the bucket, ceil(n*q) target rank in IEEE double, lower bucket
    # edge as the estimate. Two parallel unnests zip in DuckDB.
    "r28b_histogram_quantiles": """
        WITH h AS (
          SELECT l_returnflag, m.metric, m.bucket, count(*) AS c
          FROM lineitem,
          LATERAL (
            SELECT unnest(['qty', 'price']) AS metric,
                   unnest([CAST(floor(CAST(l_quantity AS DOUBLE) / 5) AS BIGINT),
                           CAST(floor(CAST(l_extendedprice AS DOUBLE) / 1000) AS BIGINT)]) AS bucket
          ) m
          GROUP BY 1, 2, 3
        ),
        w AS (
          SELECT l_returnflag, metric, bucket,
                 SUM(c) OVER (PARTITION BY l_returnflag, metric ORDER BY bucket) AS cum,
                 SUM(c) OVER (PARTITION BY l_returnflag, metric) AS n
          FROM h
        )
        SELECT l_returnflag,
               CAST(MIN(CASE WHEN metric = 'qty'
                             AND cum >= ceil(n * 0.5::DOUBLE) THEN bucket * 5 END) AS DOUBLE)
                 AS median_qty_est,
               CAST(MIN(CASE WHEN metric = 'price'
                             AND cum >= ceil(n * 0.9::DOUBLE) THEN bucket * 1000 END) AS DOUBLE)
                 AS p90_price_est
        FROM w GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "r29_exists_subquery": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        ORDER BY c_custkey
    """,
    "r30_regexp": """
        SELECT c_custkey,
               CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) AS cust_num,
               regexp_replace(c_name, '\\d', 'x', 'g') AS name_masked,
               CAST(len(string_split_regex(c_mktsegment, '[^A-Z]+')) AS INT) AS segment_words
        FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey
    """,
    "r31_array_agg": """
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), '|') AS nations,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    # DuckDB's native ASOF JOIN is the oracle for the union+window Spark plan.
    "r32_asof_join": """
        SELECT c.event_id AS click_id, c.ts AS click_ts,
               v.event_id AS view_id, v.ts AS view_ts
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY click_id
    """,
    # hex_frac_sql is shared verbatim with the Spark plan (operators/sketch.py)
    # so both engines compute the identical double, term for term.
    "r33_kmv_sketch": f"""
        WITH hv AS (SELECT DISTINCT lang, md5(CAST(text AS VARCHAR)) AS h FROM documents),
        ranked AS (
          SELECT lang, {hex_frac_sql("h")} AS f,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
          FROM hv
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_distinct_true,
               ROUND(CAST(CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                          ELSE 63.0 / MAX(CASE WHEN rn = 64 THEN f END)
                          END AS DOUBLE), 4) AS kmv_estimate
        FROM ranked GROUP BY lang ORDER BY lang
    """,
    "r34_sessionize": """
        WITH g AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM g
        )
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        FROM s GROUP BY user_id, sess ORDER BY user_id, session_start
    """,
    # Oracle uses the conditional-aggregation form PIVOT desugars to.
    "r35_pivot": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    # Elements cast to double before the sequential fold -> bit-identical
    # to Spark's aggregate() lambda.
    "r36_array_hof": """
        SELECT vec_id,
               ROUND(list_aggregate(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_sum,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
               ROUND(list_aggregate(list_transform(embedding,
                       x -> CAST(x AS DOUBLE)), 'max'), 4) AS mx
        FROM embeddings WHERE vec_id < 200 ORDER BY vec_id
    """,
    "r37_window_analytics": """
        SELECT o_custkey, o_orderkey,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               FIRST_VALUE(o_orderkey) OVER w AS first_ok,
               NTH_VALUE(o_orderkey, 2) OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
        FROM orders WHERE o_custkey < 500
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_custkey, quartile, o_orderkey
    """,
    "r38_date_arith": """
        SELECT o_orderkey, o_orderdate AS d,
               o_orderdate + INTERVAL 30 DAY AS d_plus30,
               CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
               CAST(isodow(o_orderdate) AS INT) AS iso_dow,
               CAST(date_diff('day', DATE '2024-01-01', o_orderdate) AS INT) AS days_from_2024
        FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey
    """,
    "r39_scalar_subquery": """
        SELECT c_custkey, c_name,
               (SELECT MAX(o.o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_price
        FROM customer c WHERE c_custkey < 2000 ORDER BY c_custkey
    """,
    "r40_null_functions": """
        SELECT r_regionkey,
               coalesce(nullif(r_name, 'EUROPE'), 'EU') AS nm,
               CAST(least(r_regionkey, 2) AS BIGINT) AS l,
               CAST(greatest(r_regionkey, 2) AS BIGINT) AS g
        FROM region ORDER BY r_regionkey
    """,
    # r41: the Spark plan exercises map_from_entries/element_at/map_keys;
    # the oracle computes the same VALUES with conditional aggregation
    # (element_at on a missing key is NULL == SUM(CASE) with no ELSE).
    "r41_map_functions": """
        SELECT o_orderpriority AS priority,
               CAST(count(DISTINCT o_orderstatus) AS INT) AS n_statuses,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS cnt_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS cnt_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS cnt_p,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        FROM orders GROUP BY o_orderpriority ORDER BY priority
    """,
    # r42: moments from EXACT integer sums (x*100 is integral; HUGEINT in
    # DuckDB mirrors Spark's DECIMAL(38,0)) — aggregation-order independent,
    # one double division at the end. Mirrors the Spark plan's closed forms.
    "r42_variance_stats": """
        WITH s AS (
          SELECT l_returnflag,
                 CAST(count(*) AS HUGEINT) AS n,
                 SUM(CAST(round(l_quantity*100) AS HUGEINT)) AS sx,
                 SUM(CAST(round(l_extendedprice*100) AS HUGEINT)) AS sy,
                 SUM(CAST(round(l_quantity*100) AS HUGEINT)
                     * CAST(round(l_quantity*100) AS HUGEINT)) AS sxx,
                 SUM(CAST(round(l_extendedprice*100) AS HUGEINT)
                     * CAST(round(l_extendedprice*100) AS HUGEINT)) AS syy,
                 SUM(CAST(round(l_quantity*100) AS HUGEINT)
                     * CAST(round(l_extendedprice*100) AS HUGEINT)) AS sxy
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               ROUND(CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 100), 6) AS mean_qty,
               ROUND(CAST(n*sxx - sx*sx AS DOUBLE)
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) * 10000), 6) AS var_qty,
               ROUND(SQRT(CAST(n*sxx - sx*sx AS DOUBLE)
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) * 10000)), 6) AS std_qty,
               ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                     / SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6)
                 AS corr_qty_price
        FROM s ORDER BY l_returnflag
    """,
    # r43: FILTER-clause aggregates + ordered string_agg of the top-3
    # customers by balance (row_number CTE replicates Spark's window rank).
    "r43_string_agg_filter": """
        WITH ranked AS (
          SELECT c_nationkey, c_name, c_acctbal, c_mktsegment, c_custkey,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rk
          FROM customer
        ),
        g AS (
          SELECT c_nationkey,
                 CAST(count(*) AS BIGINT) AS n_cust,
                 CAST(count(*) FILTER (WHERE c_acctbal > 0) AS BIGINT) AS n_positive,
                 ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                            FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE)
                       / count(*) FILTER (WHERE c_mktsegment = 'BUILDING'), 4)
                   AS avg_bal_building,
                 string_agg(c_name, ',' ORDER BY rk) FILTER (WHERE rk <= 3) AS top3_names
          FROM ranked GROUP BY c_nationkey
        )
        SELECT n_name, n_cust, n_positive, avg_bal_building, top3_names
        FROM g JOIN nation ON c_nationkey = n_nationkey
        ORDER BY n_name
    """,
    # r44: bucket on integer floor-divided microseconds (identical
    # truncation to Spark's `div`), dense spine per key via range(), LOCF
    # via last_value IGNORE NULLS.
    "r44_resample_gapfill": """
        WITH agg AS (
          SELECT event_type AS k,
                 (epoch_us(ts) // 900000000) * 900 AS bucket_s,
                 ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS s,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT k, min(bucket_s) AS lo, max(bucket_s) AS hi FROM agg GROUP BY k),
        spine AS (SELECT k, unnest(range(lo, hi + 1, 900)) AS bucket_s FROM bounds),
        dense AS (
          SELECT s.k, s.bucket_s, a.s, a.n
          FROM spine s LEFT JOIN agg a ON a.k = s.k AND a.bucket_s = s.bucket_s
        )
        SELECT k AS event_type,
               CAST(to_timestamp(bucket_s) AS TIMESTAMP) AS bucket,
               last_value(s IGNORE NULLS) OVER (
                 PARTITION BY k ORDER BY bucket_s ROWS UNBOUNDED PRECEDING) AS s_filled,
               CAST(coalesce(n, 0) AS BIGINT) AS n,
               s IS NULL AS was_gap
        FROM dense ORDER BY event_type, bucket
    """,
    # r45: epoch-day = integer floor-division of microseconds — identical
    # arithmetic to the Spark plan, no tz/calendar dependence
    "r45_cohort_retention": """
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
        ),
        cohort AS (
          SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id
        ),
        ret AS (
          SELECT c.cohort_day, e.d - c.cohort_day AS day_offset,
                 count(DISTINCT e.user_id) AS active_users
          FROM ev e JOIN cohort c ON e.user_id = c.user_id
          GROUP BY 1, 2
        )
        SELECT cohort_day, day_offset, active_users,
               round(active_users / max(CASE WHEN day_offset = 0 THEN active_users END)
                     OVER (PARTITION BY cohort_day), 4) AS retention_pct
        FROM ret ORDER BY cohort_day, day_offset
    """,
    "r46_market_basket": """
        WITH ob0 AS (
          SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        sz AS (SELECT ok, count(*) AS bs FROM ob0 GROUP BY ok),
        ob AS (SELECT ob0.ok, ob0.brand FROM ob0 JOIN sz ON sz.ok = ob0.ok
               WHERE sz.bs <= 30)
        SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_orders
        FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY n_orders DESC, brand_a, brand_b LIMIT 50
    """,
    # r47: strict-order funnel; ts comparisons are micros-exact in both
    # engines (DuckDB truncates the parquet nanos identically)
    "r47_funnel": """
        WITH v AS (SELECT user_id, min(ts) AS since FROM events
                   WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) AS since
              FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.since
              WHERE e.event_type = 'click' GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS since
              FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.since
              WHERE e.event_type = 'purchase' GROUP BY 1),
        s AS (
          SELECT 1 AS step, 'view' AS stage, count(*) AS users FROM v
          UNION ALL SELECT 2, 'click', count(*) FROM c
          UNION ALL SELECT 3, 'purchase', count(*) FROM p
        )
        SELECT step, stage, users,
               round(users / lag(users) OVER (ORDER BY step), 4) AS conv_from_prev,
               round(users / first_value(users) OVER (ORDER BY step), 4) AS conv_from_first
        FROM s ORDER BY step
    """,
    "r48_transitions": """
        WITH pairs AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events
        ),
        counts AS (
          SELECT prev AS from_type, event_type AS to_type, count(*) AS n
          FROM pairs WHERE prev IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT), 4) AS p
        FROM counts ORDER BY from_type, to_type
    """,
    # r49: each (day, user) pair contributes to the 7 following window
    # anchors — exact rolling distinct without per-day self-joins
    "r49_rolling_dau": """
        WITH du AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
        ),
        b AS (SELECT min(d) AS lo, max(d) AS hi FROM du),
        e AS (
          SELECT du.user_id, b.lo, unnest(range(du.d, least(du.d + 7, b.hi + 1))) AS day
          FROM du, b
        )
        SELECT CAST(day - lo AS BIGINT) AS day_idx,
               count(DISTINCT user_id) AS wau
        FROM e GROUP BY 1 ORDER BY day_idx
    """,
    "r50_equidepth_binning": """
        WITH h AS (SELECT floor(o_totalprice / 1000.0) AS bucket, count(*) AS c
                   FROM orders GROUP BY 1),
        w AS (SELECT bucket, sum(c) OVER (ORDER BY bucket) AS cum,
                     sum(c) OVER () AS n FROM h),
        b AS (SELECT min(CASE WHEN cum >= ceil(n * 0.1) THEN bucket * 1000.0 END) AS b1,
                     min(CASE WHEN cum >= ceil(n * 0.2) THEN bucket * 1000.0 END) AS b2,
                     min(CASE WHEN cum >= ceil(n * 0.3) THEN bucket * 1000.0 END) AS b3,
                     min(CASE WHEN cum >= ceil(n * 0.4) THEN bucket * 1000.0 END) AS b4,
                     min(CASE WHEN cum >= ceil(n * 0.5) THEN bucket * 1000.0 END) AS b5,
                     min(CASE WHEN cum >= ceil(n * 0.6) THEN bucket * 1000.0 END) AS b6,
                     min(CASE WHEN cum >= ceil(n * 0.7) THEN bucket * 1000.0 END) AS b7,
                     min(CASE WHEN cum >= ceil(n * 0.8) THEN bucket * 1000.0 END) AS b8,
                     min(CASE WHEN cum >= ceil(n * 0.9) THEN bucket * 1000.0 END) AS b9
              FROM w)
        SELECT bin, count(*) AS cnt, round(min(p), 2) AS lo, round(max(p), 2) AS hi
        FROM (SELECT o.o_totalprice AS p,
                     1 + (CASE WHEN o.o_totalprice >= b.b1 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b2 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b3 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b4 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b5 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b6 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b7 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b8 THEN 1 ELSE 0 END) + (CASE WHEN o.o_totalprice >= b.b9 THEN 1 ELSE 0 END) AS bin
              FROM orders o, b)
        GROUP BY bin ORDER BY bin
    """,
    "r51_unpivot": """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
}


def _ewma_oracle() -> str:
    # constants shared with the Spark plan (memory: never hardcode a copy);
    # the fold lambda spells alpha*x + beta*a in the SAME operation order
    # as operators/timeseries.py:ewma. list_reduce treats the first
    # element as the initial accumulator — exactly s_1 = x_1. The per-
    # prefix list_reduce is O(n^2) per key, fine for an oracle; the Spark
    # side is the linear recurrence.
    from diepy_spark.plans.relational import EWMA_ALPHA

    a, b = repr(EWMA_ALPHA), repr(1.0 - EWMA_ALPHA)
    return f"""
        WITH s AS (
          SELECT user_id, list(value ORDER BY ts, event_id) AS vs
          FROM events GROUP BY user_id
        ),
        e AS (
          SELECT user_id, len(vs) AS n,
                 list_transform(generate_series(1, len(vs)),
                   i -> list_reduce(vs[1:i], (acc, x) -> {a} * x + {b} * acc)) AS es
          FROM s
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_events, es[n] AS ewma_last,
               list_max(es) AS ewma_max, list_min(es) AS ewma_min
        FROM e ORDER BY user_id
    """


RELATIONAL_ORACLES["r52_ewma"] = _ewma_oracle()

# percent_rank/cume_dist: both engines define them identically
# ((rank-1)/(n-1), cum_rows/n — exact integer rationals); ties broken by
# the same (price, orderkey) order so ranks are deterministic.
RELATIONAL_ORACLES["r54_mode"] = """
    SELECT o_orderstatus, mode_priority, mode_count FROM (
      SELECT o_orderstatus, o_orderpriority AS mode_priority,
             CAST(count(*) AS BIGINT) AS mode_count,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY 1, 2)
    WHERE rn = 1 ORDER BY o_orderstatus
"""

RELATIONAL_ORACLES["r53_dist_windows"] = """
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders WHERE o_custkey < 500
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
    ORDER BY o_custkey, o_orderkey
"""

RELATIONAL_ORACLES["r55_weighted_median"] = """
    WITH h AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS wc
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, q, wc,
             CAST(SUM(wc) OVER (PARTITION BY l_returnflag ORDER BY q
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(wc) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
      FROM h
    )
    SELECT l_returnflag,
           round(CAST(min(q) AS BIGINT) / 100.0, 2) AS weighted_median_qty
    FROM c WHERE 2 * cum >= tot
    GROUP BY 1 ORDER BY l_returnflag
"""

RELATIONAL_ORACLES["r56_trailing_range_window"] = """
    WITH d AS (
      SELECT o_custkey, o_orderkey,
             CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
                  AS BIGINT) AS day,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders WHERE o_custkey < 500
    )
    SELECT o_custkey, o_orderkey, day,
           round(CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                 / 100.0, 2) AS trail_7d
    FROM d ORDER BY o_custkey, day, o_orderkey
"""

RELATIONAL_ORACLES["r57_window_navigation"] = """
    WITH d AS (
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders WHERE o_custkey < 300
    )
    SELECT o_custkey, o_orderkey,
           round(first_value(cents) OVER w / 100.0, 2) AS first_spend,
           round(last_value(cents) OVER wf / 100.0, 2) AS last_spend,
           round(nth_value(cents, 2) OVER wf / 100.0, 2) AS second_spend,
           round((cents - lag(cents, 1) OVER w) / 100.0, 2) AS prev_delta
    FROM d
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
"""

RELATIONAL_ORACLES["r58_rank_functions"] = """
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM orders WHERE o_custkey < 400
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
"""
