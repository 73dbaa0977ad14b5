"""DuckDB oracle SQL for every oracle-checkable query in QUERIES.

Keys match ``luxo_rs_spark.plans.queries.QUERIES``. The driver registers
the fixture parquet files as views named region/nation/customer/supplier/
part/orders/lineitem/events/documents/embeddings, then hash-compares
each query's result with ours (column names sorted before hashing, so
aliases must match exactly).

Queries implemented with semantics DuckDB cannot express (seeded fnv1a64
hashing, LSH signatures) are intentionally absent — the driver records a
rows-only check for those and Spark-internal tests pin their semantics.
"""

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["q01_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)                                            AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)                                       AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)                    AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE)      AS sum_charge,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / count(l_quantity)                        AS avg_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) / count(l_extendedprice)              AS avg_price,
       CAST(round(sum(CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) / count(l_discount)                        AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLE_SQL["q02_join_chain"] = """
SELECT r_name, count(*) AS n_customers, CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""

ORACLE_SQL["q03_anti_join"] = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["q04_semi_join"] = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_SQL["q05_range_join"] = """
WITH buckets(bucket_name, lo, hi) AS (
  VALUES ('small', 1, 17), ('medium', 17, 34), ('large', 34, 51)
)
SELECT bucket_name, count(*) AS n_parts, CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,6))), 2) AS DOUBLE) / count(p_retailprice) AS avg_price
FROM part JOIN buckets ON p_size >= lo AND p_size < hi
GROUP BY bucket_name
ORDER BY bucket_name
"""

ORACLE_SQL["q06_asof_join"] = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       (SELECT max(epoch_us(o_orderdate)) FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_order_date_us
FROM events e
ORDER BY event_id
"""

ORACLE_SQL["q07_rollup"] = """
SELECT cast(grouping(o_orderpriority) AS BIGINT) AS g_pri,
       cast(grouping(o_orderstatus) AS BIGINT)   AS g_st,
       o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY g_pri, g_st, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""

ORACLE_SQL["q08_count_distinct"] = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q09_topk_per_group"] = """
SELECT o_custkey, o_orderkey, total_price, rn FROM (
  SELECT o_custkey, o_orderkey,
         round(o_totalprice, 2) AS total_price,
         cast(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
"""

ORACLE_SQL["q10_window_frames"] = """
WITH daily AS (
  SELECT cast(o_orderdate AS DATE) AS d, sum(o_totalprice) AS total
  FROM orders GROUP BY 1
)
SELECT cast(d AS VARCHAR) AS day,
       round(sum(total) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
             / count(total) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mov_avg_7d,
       round(sum(total) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING), 2) AS run_sum,
       round(lag(total, 1) OVER (ORDER BY d), 2) AS prev_total
FROM daily
ORDER BY day
"""

ORACLE_SQL["q11_set_ops"] = """
SELECT 'both' AS tag, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'cust_only' AS tag, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
ORDER BY tag, nationkey
"""

ORACLE_SQL["q12_string_battery"] = """
SELECT p_partkey,
       upper(p_name)                                   AS up,
       lower(p_brand)                                  AS lo,
       cast(length(p_name) AS BIGINT)                  AS len,
       substring(p_type, 1, 4)                         AS sub4,
       concat_ws('|', p_brand, p_type)                 AS joined,
       replace(p_name, ' ', '_')                       AS underscored,
       lpad(p_brand, 12, '.')                          AS lpadded,
       rpad(p_type, 10, '.')                           AS rpadded,
       trim('  ' || p_name || '  ')                    AS trimmed,
       cast(strpos(p_name, 'e') AS BIGINT)             AS pos_e,
       string_split(p_name, ' ')[1]                    AS first_word,
       regexp_extract(p_name, '([a-z]+)', 1)           AS first_token,
       cast(p_name LIKE '%ring%' AS INT)               AS has_ring,
       cast(regexp_matches(p_name, '^(red|blue)') AS INT) AS rb_prefix,
       cast(contains(p_name, 'bolt') AS INT)           AS has_bolt
FROM part
WHERE p_partkey < 200
ORDER BY p_partkey
"""

ORACLE_SQL["q13_math_battery"] = """
SELECT p_partkey,
       round(sqrt(p_retailprice), 2)                    AS sqrt_price,
       round(power(p_size, 2), 2)                       AS size_sq,
       cast(abs(p_size - 25) AS BIGINT)                 AS abs_off,
       cast(floor(p_retailprice) AS BIGINT)             AS floor_price,
       cast(ceil(p_retailprice) AS BIGINT)              AS ceil_price,
       round(ln(p_retailprice), 2)                      AS ln_price,
       round(log10(p_retailprice), 2)                   AS log10_price,
       cast(sign(p_size - 25) AS BIGINT)                AS sign_off,
       cast(p_partkey % 7 AS BIGINT)                    AS mod7,
       cast(greatest(p_size, 25) AS BIGINT)             AS gst,
       cast(least(p_size, 25) AS BIGINT)                AS lst,
       round(round(p_retailprice / 1000, 1), 2)         AS br
FROM part
WHERE p_partkey < 200
ORDER BY p_partkey
"""

ORACLE_SQL["q14_date_battery"] = """
SELECT o_orderkey,
       cast(year(o_orderdate) AS BIGINT)                       AS y,
       cast(month(o_orderdate) AS BIGINT)                      AS m,
       cast(day(o_orderdate) AS BIGINT)                        AS dom,
       cast(isodow(o_orderdate) AS BIGINT)                     AS dow_iso,
       cast(cast(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR  AS plus30,
       cast(cast(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)::VARCHAR AS plus2mo,
       cast(datediff('day', cast(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_1999,
       cast(cast(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
       epoch_us(o_orderdate)                                   AS date_us,
       cast(quarter(o_orderdate) AS BIGINT)                    AS qtr
FROM orders
WHERE o_orderkey < 300
ORDER BY o_orderkey
"""

ORACLE_SQL["q15_json_extract"] = """
SELECT event_type,
       round(avg(cast(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
       max(cast(json_extract_string(props, '$.k') AS BIGINT))           AS max_k,
       min(cast(json_extract_string(props, '$.k') AS BIGINT))           AS min_k,
       count(*)                                                         AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["q16_array_ops"] = """
SELECT vec_id,
       cast(len(embedding) AS BIGINT)                                    AS dim,
       round(list_aggregate(embedding::DOUBLE[], 'sum') / len(embedding), 4) AS mean_comp,
       round(cast(embedding[1] AS DOUBLE), 4)                            AS first_comp,
       round(cast(embedding[-1] AS DOUBLE), 4)                           AS last_comp,
       round(cast(list_aggregate(embedding, 'max') AS DOUBLE), 4)        AS max_comp,
       round(cast(list_aggregate(embedding, 'min') AS DOUBLE), 4)        AS min_comp,
       round(cast(list_sort(embedding)[2] AS DOUBLE), 4)                 AS second_smallest,
       cast(len(list_filter(embedding, x -> x > 0)) AS BIGINT)           AS n_pos
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
"""

ORACLE_SQL["q17_pivot"] = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS p1,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS p2,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS p3,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS p5
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

ORACLE_SQL["q18_topk_offset"] = """
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 5
"""

ORACLE_SQL["q19_percentile_stats"] = """
SELECT c_mktsegment,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       round(stddev_samp(o_totalprice), 2)        AS sd_price,
       round(var_pop(o_totalprice) / 1e9, 4)      AS varp_price_g,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) / count(o_totalprice) AS avg_price,
       count(*)                                   AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["q20_tumbling_window"] = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*)                         AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)             AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

ORACLE_SQL["q21_sliding_window"] = """
WITH expanded AS (
  SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts)) AS window_start_us, value FROM events
  UNION ALL
  SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'), value FROM events
)
SELECT window_start_us, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) / count(value) AS avg_value
FROM expanded
GROUP BY window_start_us
ORDER BY window_start_us
"""

ORACLE_SQL["q22_session_window"] = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       epoch_us(min(ts))    AS session_start_us,
       count(*)             AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""

ORACLE_SQL["q23_first_last_by"] = """
SELECT o_orderpriority,
       arg_max(o_orderkey, cast(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey) AS top_order,
       arg_min(o_orderkey, cast(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey) AS bottom_order,
       round(max(o_totalprice), 2) AS max_price,
       round(min(o_totalprice), 2) AS min_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_SQL["q24_collect_list"] = """
SELECT l_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',')                AS linenumbers,
       array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags
FROM lineitem
WHERE l_orderkey < 30
GROUP BY l_orderkey
ORDER BY l_orderkey
"""

ORACLE_SQL["q25_grouping_sets"] = """
SELECT cast(grouping(c_mktsegment) AS BIGINT) AS g_seg,
       cast(grouping(n_name) AS BIGINT)       AS g_nat,
       c_mktsegment, n_name,
       count(*)                               AS n,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)               AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((c_mktsegment), (n_name), (c_mktsegment, n_name), ())
ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, n_name NULLS FIRST
"""

ORACLE_SQL["q26_theta_join"] = """
SELECT s_nationkey,
       count(*) AS n_pairs,
       CAST(round(sum(CAST(s_acctbal - c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*) AS avg_gap
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
GROUP BY s_nationkey
ORDER BY s_nationkey
"""

ORACLE_SQL["q27_case_coalesce"] = """
SELECT l_returnflag,
       cast(sum(CASE WHEN l_discount >= 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       cast(sum(CASE WHEN l_discount >= 0.04 AND l_discount < 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
       round(sum(coalesce(nullif(l_discount, 0.0), 0.01) * l_extendedprice), 2) AS adj_disc_value,
       cast(sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_notax
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q28_event_dedup"] = """
SELECT user_id, event_type,
       first_event_id,
       first_ts_us
FROM (
  SELECT user_id, event_type,
         event_id AS first_event_id,
         epoch_us(ts) AS first_ts_us,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
"""

ORACLE_SQL["q29_predicates"] = """
SELECT p_partkey, p_brand, p_size, round(p_retailprice, 2) AS price
FROM part
WHERE p_size BETWEEN 10 AND 20
  AND p_brand IN ('Brand#1', 'Brand#7', 'Brand#13', 'Brand#19')
  AND p_name LIKE '%e%'
  AND p_retailprice IS NOT NULL
  AND p_type <> 'PROMO'
ORDER BY p_partkey
"""

ORACLE_SQL["q30_dedup_exact"] = """
SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_unique
FROM documents
GROUP BY source
ORDER BY source
"""

_JACCARD_PAIRS_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(words) - 2),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM w WHERE len(words) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da, db,
       round(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 4) AS jac
FROM inter JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= 0.8
ORDER BY da, db
"""

ORACLE_SQL["q31_ngram_jaccard_neardup"] = _JACCARD_PAIRS_SQL
# the LSH path must reproduce the exact operator's output
ORACLE_SQL["q32_minhash_lsh_neardup"] = _JACCARD_PAIRS_SQL

ORACLE_SQL["q34_cosine_topk"] = """
WITH t AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 1)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], q::DOUBLE[])
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(q::DOUBLE[], q::DOUBLE[]))), 4) AS sim
FROM embeddings, t
WHERE vec_id <> 1
ORDER BY list_dot_product(embedding::DOUBLE[], q::DOUBLE[])
         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            * sqrt(list_dot_product(q::DOUBLE[], q::DOUBLE[]))) DESC, vec_id
LIMIT 5
"""

ORACLE_SQL["q35_embedding_neardup"] = """
SELECT a.vec_id AS va, b.vec_id AS vb,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
ORDER BY va, vb
"""

_STOP = {
    "en": "['the','a','of','and','to','in','is','it']",
    "de": "['der','die','das','und','ist','ein','nicht','mit']",
    "es": "['el','la','de','que','y','en','un','es']",
    "fr": "['le','la','de','et','un','est','que','pour']",
}

ORACLE_SQL["q37_lang_id"] = f"""
WITH scored AS (
  SELECT lang,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["en"]})) AS s_en,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["de"]})) AS s_de,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["es"]})) AS s_es,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["fr"]})) AS s_fr
  FROM documents
), pred AS (
  SELECT lang,
         CASE
           WHEN s_en > 0 AND s_en >= greatest(s_en, s_de, s_es, s_fr) THEN 'en'
           WHEN s_de > 0 AND s_de >= greatest(s_en, s_de, s_es, s_fr) THEN 'de'
           WHEN s_es > 0 AND s_es >= greatest(s_en, s_de, s_es, s_fr) THEN 'es'
           WHEN s_fr > 0 AND s_fr >= greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
           ELSE 'und'
         END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, count(*) AS n
FROM pred
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""

ORACLE_SQL["q38_quality_score"] = f"""
WITH m AS (
  SELECT doc_id,
         cast(length(text) AS BIGINT) AS n_chars_calc,
         cast(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_words,
         cast(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS nonspace,
         cast(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         cast(len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["en"]})) AS BIGINT) AS stop_hits
  FROM documents
  WHERE doc_id < 300
)
SELECT doc_id, n_chars_calc, n_words,
       nonspace * 1.0 / n_words           AS avg_word_len,
       stop_hits * 1.0 / n_words          AS stopword_ratio,
       least(n_words / 100.0, 1.0) * 0.5
         + least(stop_hits * 1.0 / n_words * 10, 1.0) * 0.3
         + (1.0 - least(n_punct * 1.0 / n_chars_calc * 10, 1.0)) * 0.2 AS quality
FROM m
ORDER BY doc_id
"""

ORACLE_SQL["q39_token_count"] = """
SELECT source,
       cast(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS BIGINT) AS sum_words,
       cast(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS sum_tokens,
       count(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q41_left_outer_join"] = """
SELECT c_mktsegment,
       count(*) AS n_rows,
       cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
       CAST(round(sum(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["q42_full_outer_join"] = """
WITH cn AS (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(ck, sk) AS nationkey,
       CASE WHEN ck IS NULL THEN 'supp_only'
            WHEN sk IS NULL THEN 'cust_only'
            ELSE 'both' END AS tag,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON ck = sk
ORDER BY nationkey
"""

ORACLE_SQL["q43_cross_join"] = """
SELECT r_name, o_orderstatus, n_orders
FROM region
CROSS JOIN (SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY 1)
ORDER BY r_name, o_orderstatus
"""

ORACLE_SQL["q44_window_battery"] = """
SELECT o_orderkey, o_orderpriority,
       cast(dense_rank() OVER w AS BIGINT)   AS drank,
       percent_rank() OVER w                 AS prank,
       cume_dist() OVER w                    AS cdist,
       cast(ntile(4) OVER w AS BIGINT)       AS quartile,
       nth_value(o_orderkey, 2) OVER wf      AS second_key,
       first_value(o_orderkey) OVER wf       AS top_key,
       last_value(o_orderkey) OVER wf        AS bottom_key
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey),
       wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_orderpriority, o_orderkey
"""

ORACLE_SQL["q45_range_frame"] = """
SELECT event_id, event_type,
       epoch_us(ts) AS ts_us,
       round(sum(value) OVER w, 2) AS trailing_1h_sum,
       count(*) OVER w             AS trailing_1h_n
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

ORACLE_SQL["q46_map_from_json"] = """
SELECT event_id,
       array_to_string(json_keys(props), ',')                    AS keys_joined,
       cast(json_extract_string(props, '$.k') AS BIGINT)         AS k_val,
       cast(len(json_keys(props)) AS BIGINT)                     AS n_keys
FROM events
WHERE event_id < 500
ORDER BY event_id
"""

ORACLE_SQL["q47_cast_battery"] = """
SELECT l_orderkey, l_linenumber,
       cast(l_quantity AS BIGINT)                         AS qty_int,
       cast(cast(l_shipdate AS DATE) AS VARCHAR)          AS ship_str,
       cast(l_orderkey AS VARCHAR)                        AS key_str,
       cast(cast(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
       cast(l_linenumber AS DOUBLE)                       AS line_dbl,
       cast('42' AS BIGINT)                               AS answer
FROM lineitem
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
"""

ORACLE_SQL["q48_dedup_survivors"] = """
WITH survivors AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
SELECT d.source,
       count(*)      AS n_kept,
       min(d.doc_id) AS min_kept,
       max(d.doc_id) AS max_kept
FROM documents d JOIN survivors USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""

ORACLE_SQL["q49_udtf_tokens"] = """
SELECT token, count(*) AS n
FROM (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
)
WHERE length(token) > 0
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""

ORACLE_SQL["q51_correlated_subqueries"] = """
SELECT n_name,
       count(*)                 AS n_rich,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_bal
FROM customer c JOIN nation n ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n_name
ORDER BY n_name
"""

ORACLE_SQL["q52_right_outer_join"] = """
SELECT n_name,
       count(s_suppkey)                       AS n_suppliers,
       coalesce(CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE), 0.0) AS sum_bal
FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

ORACLE_SQL["q53_multiset_ops"] = """
WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey < 1000),
     b AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey >= 500 AND l_orderkey < 1500),
     i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
     e AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
SELECT 'intersect_all' AS tag, count(*) AS n_rows,
       count(DISTINCT l_suppkey) AS n_distinct, CAST(sum(l_suppkey) AS BIGINT) AS sum_keys
FROM i
UNION ALL
SELECT 'except_all' AS tag, count(*) AS n_rows,
       count(DISTINCT l_suppkey) AS n_distinct, CAST(sum(l_suppkey) AS BIGINT) AS sum_keys
FROM e
ORDER BY tag
"""

ORACLE_SQL["q54_higher_order_lambdas"] = """
SELECT a.vec_id AS va,
       round((SELECT sum(CAST(t.x AS DOUBLE) * CAST(t.y AS DOUBLE))
              FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y) t), 4) AS dot_next,
       round(sqrt(list_sum(list_transform(a.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)                        AS norm_a,
       len(list_filter(a.embedding, x -> x > 0))                                      AS n_pos,
       round(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * 2.0)), 4)  AS sum_scaled
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id < 200
ORDER BY va
"""

ORACLE_SQL["q55_regexp_battery"] = """
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+)', 1)                   AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g')            AS devoweled,
       length(regexp_replace(p_name, '[^ ]', '', 'g'))        AS n_spaces
FROM part
WHERE regexp_matches(p_name, '^[a-f]')
ORDER BY p_partkey
LIMIT 300
"""

ORACLE_SQL["q56_date_interval_math"] = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')                        AS d,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')      AS plus30d,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d')     AS plus3m,
       strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS qtr_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')              AS month_end,
       dayofyear(CAST(o_orderdate AS DATE))                                   AS doy,
       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')          AS days_to_98
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
"""

ORACLE_SQL["q57_decimal_agg"] = """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price_exact,
       CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)                        AS min_price,
       CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)                        AS max_price,
       count(*)                                                                            AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q58_corr_covar"] = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 4) AS covar_s,
       round(covar_pop(l_quantity, l_discount), 4)  AS covar_p,
       count(*)                                     AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q59_map_battery"] = """
SELECT p_partkey,
       p_brand       AS brand,
       p_type        AS ptype,
       2             AS n_keys,
       'brand,ptype' AS keys_sorted
FROM part
WHERE p_partkey <= 300
ORDER BY p_partkey
"""

ORACLE_SQL["q60_calendar_densify"] = """
WITH spine AS (
  SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                INTERVAL 1 DAY))::DATE AS day
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
  FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
  GROUP BY 1
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       coalesce(d.n, 0)            AS n_orders,
       coalesce(d.total, 0.0)      AS total
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY day
"""

ORACLE_SQL["q61_parquet_sink_roundtrip"] = """
SELECT o_orderpriority,
       count(*)                    AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total,
       min(o_orderkey)             AS min_key
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_SQL["q62_csv_json_roundtrip"] = """
SELECT c_mktsegment,
       count(*)                 AS n_csv,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS bal_csv,
       count(*)                 AS n_json,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS bal_json
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["q63_udaf_weighted_avg"] = """
SELECT l_returnflag,
       CAST(round(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / sum(l_quantity) AS w_avg_price,
       count(*)                                                      AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q65_neardup_clusters"] = """
WITH RECURSIVE w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(words) - 2),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM w WHERE len(words) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT da, db FROM inter
  JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
  WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= 0.8
), edges AS (
  SELECT da AS a, db AS b FROM pairs
  UNION ALL
  SELECT db, da FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), clust AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
)
SELECT d.source,
       count(*)                                                     AS n_docs,
       count(DISTINCT c.cluster_id)                                 AS n_clusters,
       CAST(sum(CASE WHEN d.doc_id = c.cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
FROM documents d JOIN clust c ON d.doc_id = c.doc_id
GROUP BY d.source
ORDER BY d.source
"""

ORACLE_SQL["q66_knn_join"] = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20
), scored AS (
  SELECT q.qid, e.vec_id AS nbr,
         list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[])
           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
              * sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.qid
), ranked AS (
  SELECT qid, nbr, sim,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nbr) AS BIGINT) AS rn
  FROM scored
)
SELECT qid, nbr, round(sim, 4) AS sim, rn
FROM ranked
WHERE rn <= 3
ORDER BY qid, rn
"""

# q67: reference-exact FNV-1a over the 8 LE bytes of doc_id, folded with
# a recursive CTE in HUGEINT arithmetic (mod 2^64 after each multiply);
# bucket = u64 state mod 10 -> train(<8) / val(8) / test(9).
ORACLE_SQL["q67_hash_split"] = """
WITH RECURSIVE f(doc_id, n_chars, k, state) AS (
  SELECT doc_id, n_chars, 0, CAST(14695981039346656037 AS HUGEINT) FROM documents
  UNION ALL
  SELECT doc_id, n_chars, k + 1,
         (xor(state, (CAST(doc_id AS HUGEINT) >> (8 * k)) & 255) * 1099511628211)
           % 18446744073709551616
  FROM f WHERE k < 8
), split_of AS (
  SELECT doc_id, n_chars,
         CASE WHEN state % 10 < 8 THEN 'train'
              WHEN state % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM f WHERE k = 8
)
SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM split_of
GROUP BY split
ORDER BY split
"""

ORACLE_SQL["q68_vocabulary"] = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
)
SELECT token, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_count
FROM toks WHERE token <> ''
GROUP BY token
ORDER BY doc_freq DESC, total_count DESC, token
LIMIT 30
"""

ORACLE_SQL["q69_tfidf_topk"] = """
WITH docs AS (SELECT * FROM documents WHERE doc_id < 50),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM docs
), toks2 AS (SELECT * FROM toks WHERE token <> ''),
tf AS (SELECT doc_id, token, count(*) AS cnt FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks2 GROUP BY 1),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
scored AS (
  SELECT tf.doc_id, tf.token,
         (cnt * 1.0 / doc_len) * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (token) CROSS JOIN n
), ranked AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
  FROM scored
)
SELECT doc_id, token, round(tfidf, 4) AS tfidf, rn
FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn
"""

ORACLE_SQL["q70_inverted_index"] = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
), toks2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT token, count(*) AS doc_freq,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM toks2 CROSS JOIN n
GROUP BY token, n_docs
HAVING count(*) >= n_docs * 0.04 AND count(*) <= n_docs * 0.79
ORDER BY doc_freq DESC, token
LIMIT 100
"""

ORACLE_SQL["q71_contamination"] = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(words) - 7),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
                words[i+3] || ' ' || words[i+4] || ' ' || words[i+5] || ' ' ||
                words[i+6] || ' ' || words[i+7]))) AS shingle
  FROM w WHERE len(words) >= 8
), corpus_sh AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
eval_sh AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
cold AS (
  SELECT * FROM corpus_sh
  WHERE shingle NOT IN (
    SELECT shingle FROM corpus_sh GROUP BY shingle
    HAVING count(DISTINCT doc_id) > 100)
)
SELECT e.doc_id AS eval_id, c.doc_id AS corpus_id,
       CAST(count(DISTINCT c.shingle) AS BIGINT) AS n_shared
FROM cold c JOIN eval_sh e ON c.shingle = e.shingle
WHERE c.doc_id <> e.doc_id
GROUP BY 1, 2
ORDER BY eval_id, corpus_id
"""

ORACLE_SQL["q72_incremental_dedup"] = """
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
newb AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
fresh AS (
  SELECT * FROM newb n
  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = n.text)
), kept AS (
  SELECT min(doc_id) AS doc_id FROM fresh GROUP BY text
)
SELECT source, count(*) AS n_new,
       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM kept) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(CASE WHEN doc_id IN (SELECT doc_id FROM kept) THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM newb
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q73_stratified_sample"] = """
WITH ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY lang ORDER BY (doc_id * 48271) % 65536, doc_id) AS rn
  FROM documents
)
SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_id, max(doc_id) AS max_id,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM ranked WHERE rn <= 20
GROUP BY lang
ORDER BY lang
"""

ORACLE_SQL["q74_label_centroids"] = """
WITH ex AS (
  SELECT label, vec_id,
         unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
), cent AS (
  SELECT label, pos, avg(x) AS c FROM ex GROUP BY 1, 2
), cstats AS (
  SELECT label, count(*) AS dims, sqrt(sum(c * c)) AS cnorm FROM cent GROUP BY 1
), mem AS (
  SELECT e.label, e.vec_id, sum(e.x * c.c) AS dotc, sqrt(sum(e.x * e.x)) AS xnorm
  FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
  GROUP BY 1, 2
)
SELECT m.label, count(*) AS n_vectors, any_value(s.dims) AS dims,
       round(any_value(s.cnorm), 4) AS centroid_norm,
       round(avg(m.dotc / (m.xnorm * s.cnorm)), 4) AS avg_cos
FROM mem m JOIN cstats s ON m.label = s.label
GROUP BY m.label
ORDER BY m.label
"""

ORACLE_SQL["q75_pmi_pairs"] = """
WITH docs AS (SELECT * FROM documents WHERE doc_id < 500),
toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM docs
), toks2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
dfreq AS (
  SELECT token, count(*) AS df FROM toks2 GROUP BY token HAVING count(*) >= 30
), kept AS (
  SELECT t.doc_id, t.token, d.df FROM toks2 t JOIN dfreq d USING (token)
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
pairs AS (
  SELECT a.token AS ta, b.token AS tb, a.df AS dfa, b.df AS dfb,
         count(*) AS n_pair
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2, 3, 4
)
SELECT ta, tb, n_pair, round(ln(n_pair * n_docs * 1.0 / (dfa * dfb)), 4) AS pmi
FROM pairs CROSS JOIN n
ORDER BY n_pair * n_docs * 1.0 / (dfa * dfb) DESC, ta, tb
LIMIT 20
"""

ORACLE_SQL["q76_binary_battery"] = """
SELECT doc_id,
       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
       md5(text)                                AS md5_hex,
       sha256(text)                             AS sha_hex,
       substring(hex(text::BLOB), 1, 16)        AS head_hex
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
"""

ORACLE_SQL["q77_struct_battery"] = """
SELECT lang,
       {'n': count(*), 'chars': sum(n_chars)}.n                    AS n,
       CAST({'n': count(*), 'chars': sum(n_chars)}.chars AS BIGINT) AS chars,
       min_by(doc_id, CAST(n_chars AS BIGINT) * 1000000 + doc_id)  AS smallest_doc,
       list_sort(list({'nc': CAST(n_chars AS BIGINT), 'id': doc_id}))[1].id
                                                                   AS first_sorted_doc
FROM documents
GROUP BY lang
ORDER BY lang
"""

ORACLE_SQL["q78_disjunctive_filter"] = """
SELECT l_returnflag, count(*) AS n_items,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20
       AND p_type LIKE '%ECO%')
   OR (p_size BETWEEN 11 AND 30 AND l_quantity BETWEEN 10 AND 35
       AND p_type LIKE '%STANDARD%')
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# q79/q80: the fake media container is a pure function of (doc_id, text)
# (multimodal/media.py synth_media_table): kind = doc_id % 3 -> {0: image,
# 1: audio, 2: video}; width/height/sample_rate are modular functions of
# doc_id; the payload is the utf-8 text.
ORACLE_SQL["q79_media_decode"] = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST((doc_id % 64 + 1) * 16 AS INT)  AS width,
       CAST((doc_id % 48 + 1) * 16 AS INT)  AS height,
       CAST(8000 * (doc_id % 4 + 1) AS INT) AS sample_rate,
       CAST(octet_length(text::BLOB) AS BIGINT) AS payload_bytes
FROM documents
WHERE doc_id < 200
ORDER BY media_id
"""

ORACLE_SQL["q80_frame_sample"] = """
WITH vids AS (
  SELECT doc_id AS media_id, octet_length(text::BLOB) AS payload_bytes
  FROM documents
  WHERE doc_id < 200 AND doc_id % 3 = 2
), frames AS (
  SELECT media_id, CAST(unnest(generate_series(0,
           CAST(least(8, payload_bytes // 64) AS INT) - 1)) AS INT) AS frame_idx
  FROM vids
  WHERE payload_bytes // 64 >= 1
)
SELECT media_id, frame_idx,
       CAST(14 + frame_idx * 64 AS BIGINT) AS frame_offset,
       CAST(64 AS BIGINT) AS frame_bytes
FROM frames
ORDER BY media_id, frame_idx
"""

ORACLE_SQL["q81_merge_upsert"] = """
WITH upd AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 100.0 AS o_totalprice,
         (o_orderkey % 11 = 0) AS is_del
  FROM orders
  WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
), merged AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd WHERE NOT is_del
)
SELECT o_orderstatus, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

ORACLE_SQL["q82_sequence_packing"] = """
WITH toks AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT lang, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens AS BIGINT) AS tok_offset
  FROM toks
)
SELECT lang, doc_id, n_tokens, tok_offset,
       CAST(floor(tok_offset / 2048) AS BIGINT) AS seq_id
FROM packed
ORDER BY lang, doc_id
"""

ORACLE_SQL["q83_filter_funnel"] = f"""
WITH m AS (
  SELECT length(text) >= 200 AS len_ok,
         cast(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_words,
         cast(length(text) AS BIGINT) AS n_chars_calc,
         cast(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["en"]})) AS s_en,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["de"]})) AS s_de,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["es"]})) AS s_es,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), {_STOP["fr"]})) AS s_fr
  FROM documents
), staged AS (
  SELECT len_ok,
         len_ok AND (CASE
           WHEN s_en > 0 AND s_en >= greatest(s_en, s_de, s_es, s_fr) THEN 'en'
           WHEN s_de > 0 AND s_de >= greatest(s_en, s_de, s_es, s_fr) THEN 'de'
           WHEN s_es > 0 AND s_es >= greatest(s_en, s_de, s_es, s_fr) THEN 'es'
           WHEN s_fr > 0 AND s_fr >= greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
           ELSE 'und'
         END IN ('en', 'de', 'es', 'fr')) AS lang_ok,
         (least(n_words / 100.0, 1.0) * 0.5
           + least(s_en * 1.0 / n_words * 10, 1.0) * 0.3
           + (1.0 - least(n_punct * 1.0 / n_chars_calc * 10, 1.0)) * 0.2) AS quality
  FROM m
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
       CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
       CAST(sum(CASE WHEN lang_ok AND quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok
FROM staged
"""

ORACLE_SQL["q84_mixture_weights"] = """
WITH tgt(source, target_frac) AS (
  VALUES ('src0', 0.3), ('src1', 0.2), ('src2', 0.1)
), counts AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), total AS (SELECT count(*) AS n_total FROM documents)
SELECT counts.source AS domain, n_docs,
       round(n_docs * 1.0 / n_total, 6)               AS actual_frac,
       round(coalesce(target_frac, 0.0), 6)            AS target_frac,
       round(coalesce(target_frac, 0.0) / (n_docs * 1.0 / n_total), 6) AS factor
FROM counts CROSS JOIN total LEFT JOIN tgt ON counts.source = tgt.source
ORDER BY domain
"""

ORACLE_SQL["q85_asof_forward"] = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       (SELECT min(epoch_us(o_orderdate)) FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate > e.ts) AS next_order_date_us
FROM events e
ORDER BY event_id
"""

ORACLE_SQL["q86_rollup_hierarchy"] = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, sum(value) AS sv
  FROM events GROUP BY 1, 2
)
SELECT epoch_us(date_trunc('day', h)) AS day_us, event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(sv AS DECIMAL(18,6))), 2) AS DOUBLE)      AS sum_value,
       CAST(count(*) AS BIGINT) AS n_hours
FROM hourly
GROUP BY 1, 2
ORDER BY day_us, event_type
"""

ORACLE_SQL["q87_order_streaks"] = """
WITH days AS (
  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
), islands AS (
  SELECT o_custkey, d,
         d - CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS INT) AS grp
  FROM days
), streaks AS (
  SELECT o_custkey, grp, count(*) AS streak_days, min(d) AS start_d, max(d) AS end_d
  FROM islands GROUP BY 1, 2
)
SELECT o_custkey, CAST(streak_days AS BIGINT) AS streak_days,
       CAST(start_d AS VARCHAR) AS start_day,
       CAST(end_d AS VARCHAR)   AS end_day
FROM streaks
WHERE streak_days >= 2
ORDER BY streak_days DESC, o_custkey, start_day
"""

ORACLE_SQL["q88_null_semantics"] = """
WITH t AS (
  SELECT nullif(o_orderstatus, 'O') AS nkey, o_totalprice,
         nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS nsafe_f,
         nullif(o_orderstatus, 'O') = 'F' AS plain_f
  FROM orders
)
SELECT nkey, count(*) AS n_rows,
       CAST(count(nkey) AS BIGINT) AS n_nonnull,
       CAST(sum(CASE WHEN nsafe_f THEN 1 ELSE 0 END) AS BIGINT) AS n_nsafe_f,
       CAST(sum(CASE WHEN plain_f IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM t
GROUP BY nkey
ORDER BY nkey NULLS FIRST
"""

ORACLE_SQL["q89_curation_pipeline"] = """
WITH RECURSIVE ded AS (
  SELECT d.* FROM documents d
  JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
    ON d.doc_id = k.doc_id
), w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM ded
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(words) - 2),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM w WHERE len(words) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT da, db FROM inter
  JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
  WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= 0.8
), edges AS (
  SELECT da AS a, db AS b FROM pairs
  UNION ALL
  SELECT db, da FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), clust AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
  FROM ded d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
), kept AS (
  SELECT d.* FROM ded d JOIN clust c ON d.doc_id = c.doc_id
  WHERE d.doc_id = c.cluster_id AND d.n_chars >= 200
), f(doc_id, n_chars, k, state) AS (
  SELECT doc_id, n_chars, 0, CAST(14695981039346656037 AS HUGEINT) FROM kept
  UNION ALL
  SELECT doc_id, n_chars, k + 1,
         (xor(state, (CAST(doc_id AS HUGEINT) >> (8 * k)) & 255) * 1099511628211)
           % 18446744073709551616
  FROM f WHERE k < 8
), split_of AS (
  SELECT doc_id, n_chars,
         CASE WHEN state % 10 < 8 THEN 'train'
              WHEN state % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM f WHERE k = 8
)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_id
FROM split_of
GROUP BY split
ORDER BY split
"""

ORACLE_SQL["q90_date_battery2"] = """
SELECT o_orderkey,
       CAST(make_date(2024, CAST(month(o_orderdate) AS INT), 1) AS VARCHAR) AS m1,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS ld,
       CAST(quarter(o_orderdate) AS BIGINT)    AS q,
       CAST(dayofyear(o_orderdate) AS BIGINT)  AS doy,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy
FROM orders WHERE o_orderkey < 300
ORDER BY o_orderkey
"""

ORACLE_SQL["q91_array_set_ops"] = """
SELECT p_partkey,
       array_to_string(list_sort(list_distinct([p_size, p_size + 1, p_size + 2] || [p_size + 2, p_size + 4])), ',') AS uni,
       array_to_string(list_sort(list_intersect([p_size, p_size + 1, p_size + 2], [p_size + 2, p_size + 4])), ',') AS inter,
       array_to_string(list_sort(list_filter([p_size, p_size + 1, p_size + 2],
                 x -> NOT list_contains([p_size + 2, p_size + 4], x))), ',') AS exc,
       CAST(list_position([p_size, p_size + 1, p_size + 2], p_size + 1) AS BIGINT) AS pos,
       array_to_string([p_size, p_size + 1, p_size + 2] || [p_size + 2, p_size + 4], ',') AS flat
FROM part WHERE p_partkey < 300
ORDER BY p_partkey
"""

ORACLE_SQL["q92_bitwise_battery"] = """
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT)    AS band,
       CAST(o_orderkey | 256 AS BIGINT)    AS bor,
       CAST(xor(o_orderkey, 170) AS BIGINT) AS bxor,
       CAST(o_orderkey << 3 AS BIGINT)     AS shl,
       CAST(o_orderkey >> 2 AS BIGINT)     AS shr,
       CAST(~o_orderkey AS BIGINT)         AS bnot,
       CAST(bit_count(o_orderkey) AS BIGINT) AS pop
FROM orders WHERE o_orderkey < 300
ORDER BY o_orderkey
"""

ORACLE_SQL["q93_sole_last_shipper"] = """
WITH fin AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey, max(l_shipdate) AS mx, count(DISTINCT l_suppkey) AS nsupp
  FROM fin GROUP BY 1
), last AS (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM fin f JOIN per_order p ON f.l_orderkey = p.l_orderkey
  WHERE f.l_shipdate = p.mx AND p.nsupp >= 2
), sole AS (
  SELECT l_orderkey FROM last GROUP BY 1 HAVING count(*) = 1
)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM last
WHERE l_orderkey IN (SELECT l_orderkey FROM sole)
GROUP BY l_suppkey
ORDER BY numwait DESC, l_suppkey
LIMIT 20
"""

ORACLE_SQL["q94_order_count_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

ORACLE_SQL["q95_wealthy_inactive"] = """
SELECT cast(c_custkey % 10 AS BIGINT) AS cntrycode,
       count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
ORDER BY cntrycode
"""

ORACLE_SQL["q96_repetition_quality"] = """
WITH docs AS (SELECT * FROM documents WHERE doc_id < 40),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token,
         generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos
  FROM docs
), toks2 AS (SELECT * FROM toks WHERE token <> ''),
cnts AS (SELECT doc_id, token, count(*) AS c FROM toks2 GROUP BY 1, 2),
top AS (
  SELECT doc_id, max(c) AS top_cnt, cast(sum(c) AS BIGINT) AS n_tokens
  FROM cnts GROUP BY 1
),
grams AS (
  SELECT doc_id,
         token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
  FROM toks2
),
g2 AS (
  SELECT doc_id, count(gram) AS total_2g, count(DISTINCT gram) AS dist_2g
  FROM grams GROUP BY 1
)
SELECT doc_id, n_tokens,
       top_cnt * 1.0 / n_tokens AS top_tok_ratio,
       1.0 - dist_2g * 1.0 / total_2g AS dup_2gram_frac
FROM top JOIN g2 USING (doc_id)
ORDER BY doc_id
"""

ORACLE_SQL["q97_unigram_entropy"] = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE doc_id < 40
), toks2 AS (SELECT * FROM toks WHERE token <> ''),
cnts AS (SELECT doc_id, token, count(*) AS c FROM toks2 GROUP BY 1, 2),
withn AS (
  SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM cnts
)
SELECT doc_id, cast(max(n) AS BIGINT) AS n_tokens,
       round(sum(-(c * 1.0 / n) * log2(c * 1.0 / n)), 4) AS entropy
FROM withn
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLE_SQL["q98_bm25_topk"] = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
), toks2 AS (SELECT * FROM toks WHERE token <> ''),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT sum(dl) * 1.0 / count(*) AS avgdl, count(*) AS n_docs FROM dl),
dfreq AS (
  SELECT token, count(*) AS df FROM tf
  WHERE token IN ('spark', 'hash', 'join') GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf.tf * (1.2 + 1))
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
  FROM tf
  JOIN dfreq USING (token)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.token IN ('spark', 'hash', 'join')
)
SELECT doc_id, round(sum(s), 4) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""

ORACLE_SQL["q99_embedding_quantize"] = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), mm AS (
  SELECT vec_id, e,
         list_min(e) AS mn,
         (list_max(e) - list_min(e)) / 255.0 AS scale
  FROM base
), q AS (
  SELECT vec_id, scale,
         list_transform(
           list_zip(e,
                    list_transform(e, x -> mn + floor((x - mn) / scale + 0.5) * scale)),
           p -> abs(p[1] - p[2])) AS err
  FROM mm
)
SELECT vec_id,
       round(scale, 6) AS scale_6,
       round(list_max(err), 6) AS max_abs_err,
       round(list_reduce(err, (acc, x) -> acc + x) / len(err), 6) AS mean_abs_err
FROM q
ORDER BY vec_id
"""

ORACLE_SQL["q100_top_revenue_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""

ORACLE_SQL["q101_conversion_funnel"] = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > t1 GROUP BY 1
), p AS (
  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1
)
SELECT '1_view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT '2_click', count(*) FROM c
UNION ALL SELECT '3_purchase', count(*) FROM p
ORDER BY stage
"""

ORACLE_SQL["q102_cohort_retention"] = """
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       cast(date_diff('day', cw::DATE, aw::DATE) / 7 AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""

ORACLE_SQL["q103_locf_gapfill"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS h,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', min(ts))::TIMESTAMP AS h0,
         date_trunc('hour', max(ts))::TIMESTAMP AS h1
  FROM events
), spine AS (
  SELECT t.event_type, s.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN bounds
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
  ) s
), j AS (
  SELECT spine.event_type, spine.h, hourly.v
  FROM spine LEFT JOIN hourly
    ON spine.event_type = hourly.event_type AND spine.h = hourly.h
)
SELECT event_type, epoch_us(h) AS hour_us,
       coalesce(last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS value_locf,
       cast(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
FROM j
ORDER BY event_type, hour_us
"""

ORACLE_SQL["q104_histogram_cdf"] = """
WITH b AS (
  -- this duckdb build has no width_bucket(); spell out its arithmetic
  SELECT cast(CASE WHEN o_totalprice < 0 THEN 0
                   WHEN o_totalprice >= 500000.0 THEN 21
                   ELSE floor(o_totalprice * 20 / 500000.0) + 1 END AS BIGINT) AS bucket,
         count(*) AS n_orders,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
  FROM orders GROUP BY 1
), t AS (SELECT count(*) AS total FROM orders)
SELECT bucket, n_orders, sum_price,
       cast(sum(n_orders) OVER w AS BIGINT) AS cum_orders,
       sum(n_orders) OVER w * 1.0 / total AS cdf
FROM b CROSS JOIN t
WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY bucket
"""

ORACLE_SQL["q105_skew_profile"] = """
WITH per_key AS (
  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1
), stats AS (
  SELECT count(*) AS n_keys, sum(cnt) AS total FROM per_key
), ranked AS (
  SELECT l_suppkey, cnt,
         row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rank
  FROM per_key
)
SELECT cast(rank AS BIGINT) AS rank, l_suppkey, cast(cnt AS BIGINT) AS cnt,
       cnt * 1.0 / total AS share,
       cnt * 1.0 * n_keys / total AS skew_factor
FROM ranked CROSS JOIN stats
WHERE rank <= 5
ORDER BY rank
"""

ORACLE_SQL["q106_scd2_intervals"] = """
WITH ev AS (SELECT * FROM events WHERE user_id < 10),
marked AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM ev
), changes AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       coalesce(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)), -1) AS valid_to_us
FROM changes
ORDER BY user_id, valid_from_us
"""

ORACLE_SQL["q107_editdistance_neardup"] = """
SELECT a.p_brand AS p_brand,
       count(*) AS n_pairs,
       cast(sum(CASE WHEN levenshtein(a.p_name, b.p_name) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
GROUP BY 1
ORDER BY p_brand
"""

ORACLE_SQL["q108_small_quantity_revenue"] = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#4'
JOIN per_part ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_qty
"""

ORACLE_SQL["q109_shipping_priority"] = """
SELECT l_orderkey,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ORACLE_SQL["q110_local_supplier_volume"] = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

ORACLE_SQL["q111_volume_shipping"] = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       cast(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""

ORACLE_SQL["q112_market_share"] = """
SELECT cast(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(CASE WHEN sn.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))), 2) AS DOUBLE)
         / CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS mkt_share,
       count(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'ECONOMY'
  AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY o_year
"""

ORACLE_SQL["q113_returned_items"] = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLE_SQL["q114_promo_revenue"] = """
SELECT 100.0 * CAST(round(sum(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END AS DECIMAL(18,6))), 2) AS DOUBLE)
         / CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS promo_pct,
       count(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""

ORACLE_SQL["q115_large_volume_orders"] = """
WITH big AS (
  SELECT l_orderkey, CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) > 250.0
)
SELECT c_custkey, c_name,
       l_orderkey AS o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = orders.o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

ORACLE_SQL["q116_supplier_diversity"] = """
SELECT p_brand, p_type, p_size,
       cast(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLE_SQL["q117_majority_supplier"] = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
per_p AS (
  SELECT l_partkey, sum(sq) AS tq FROM per_ps GROUP BY 1
)
SELECT s_suppkey, s_name, count(*) AS n_parts_dominated
FROM per_ps
JOIN per_p USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE sq / tq > 0.5
GROUP BY 1, 2
ORDER BY n_parts_dominated DESC, s_suppkey
"""

ORACLE_SQL["q118_best_price_supplier"] = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT l_partkey, l_suppkey, s_name, s_acctbal,
         min(l_extendedprice / l_quantity) AS supp_price
  FROM lineitem
  JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY 1, 2, 3, 4
),
best AS (
  SELECT l_partkey, min(supp_price) AS best_price FROM offers GROUP BY 1
)
SELECT offers.l_partkey AS p_partkey,
       l_suppkey AS s_suppkey,
       s_name, s_acctbal,
       round(supp_price, 2) AS best_unit_price
FROM offers
JOIN best ON offers.l_partkey = best.l_partkey
         AND offers.supp_price = best.best_price
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
LIMIT 20
"""

ORACLE_SQL["q119_pii_redaction"] = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or admin' || doc_id
              || '@mail.test from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
           AS a
  FROM documents
),
red AS (
  SELECT doc_id, a,
         regexp_replace(
           regexp_replace(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS r
  FROM aug
)
SELECT doc_id,
       cast(len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       cast(len(regexp_extract_all(a, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
       cast(length(r) AS BIGINT) AS redacted_len,
       md5(r) AS redacted_md5
FROM red
ORDER BY doc_id
"""

ORACLE_SQL["q120_text_normalization"] = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       cast(length(norm) AS BIGINT) AS norm_len,
       cast(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
       string_split(norm, ' ')[1] AS first_tok,
       md5(norm) AS norm_md5
FROM n
ORDER BY doc_id
"""

ORACLE_SQL["q121_url_domains"] = """
WITH u AS (
  SELECT 'https://site' || (doc_id % 7) || '.example.org/docs/' || source
           || '/' || doc_id AS url,
         n_chars
  FROM documents
)
SELECT regexp_extract(url, '://([^/]+)/', 1) AS host,
       count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars
FROM u
GROUP BY 1
ORDER BY host
"""

ORACLE_SQL["q122_bigram_topk"] = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(lower(trim(text)), '\\s+'), 1) AS pos
  FROM documents
),
b AS (
  SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM t
)
SELECT bigram, count(*) AS n
FROM b
WHERE bigram IS NOT NULL
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT 20
"""

ORACLE_SQL["q123_source_kl_divergence"] = """
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
),
f AS (SELECT source, tok FROM toks WHERE tok <> ''),
st AS (SELECT source, tok, count(*) AS c_st FROM f GROUP BY 1, 2),
corpus AS (SELECT tok, count(*) AS c_t FROM f GROUP BY 1),
tot AS (SELECT count(*) AS n FROM f),
terms AS (
  SELECT source, c_st,
         (c_st * 1.0 / sum(c_st) OVER (PARTITION BY source))
           * log2((c_st * 1.0 / sum(c_st) OVER (PARTITION BY source))
                  / (c_t * 1.0 / n)) AS term
  FROM st JOIN corpus USING (tok) CROSS JOIN tot
)
SELECT source,
       cast(sum(c_st) AS BIGINT) AS n_tokens,
       round(sum(term), 4) AS kl_bits
FROM terms
GROUP BY 1
ORDER BY source
"""

ORACLE_SQL["q124_zorder_clustering"] = """
WITH d AS (
  SELECT cast(p_size AS BIGINT) AS sz,
         cast(floor(p_retailprice / 100.0) AS BIGINT) AS pb
  FROM part
),
z AS (
  SELECT sz, pb, ((((sz >> 0) & 1) << 0) | (((pb >> 0) & 1) << 1) | (((sz >> 1) & 1) << 2) | (((pb >> 1) & 1) << 3) | (((sz >> 2) & 1) << 4) | (((pb >> 2) & 1) << 5) | (((sz >> 3) & 1) << 6) | (((pb >> 3) & 1) << 7) | (((sz >> 4) & 1) << 8) | (((pb >> 4) & 1) << 9) | (((sz >> 5) & 1) << 10) | (((pb >> 5) & 1) << 11) | (((sz >> 6) & 1) << 12) | (((pb >> 6) & 1) << 13) | (((sz >> 7) & 1) << 14) | (((pb >> 7) & 1) << 15)) >> 10 AS z_bucket FROM d
)
SELECT z_bucket, count(*) AS n_parts,
       min(sz) AS min_size, max(sz) AS max_size,
       min(pb) AS min_pricebucket, max(pb) AS max_pricebucket
FROM z
GROUP BY 1
ORDER BY z_bucket
"""

ORACLE_SQL["q125_vector_normalize"] = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS l2r
  FROM v
)
SELECT vec_id,
       cast(len(e) AS BIGINT) AS dim,
       round(l2r, 4) AS l2,
       round(e[1] / l2r, 4) AS u0,
       round(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b) / (l2r * l2r), 4) AS self_cos
FROM n
ORDER BY vec_id
LIMIT 100
"""

ORACLE_SQL["q126_priority_exists"] = """
SELECT o_orderpriority, cast(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY 1
ORDER BY o_orderpriority
"""

ORACLE_SQL["q127_forecast_revenue"] = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       cast(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLE_SQL["q128_nation_year_profit"] = """
SELECT n_name AS nation,
       cast(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              - 80.0 * l_quantity AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%rod%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

ORACLE_SQL["q129_important_parts"] = """
WITH per_part AS (
  SELECT cast(l_partkey AS BIGINT) AS partkey,
         sum(l_extendedprice * (1 - l_discount)) AS raw_value
  FROM lineitem GROUP BY 1
),
total AS (
  SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
  FROM lineitem
)
SELECT partkey, round(raw_value, 2) AS part_value
FROM per_part, total
WHERE round(raw_value, 2) > total_value * 0.001
ORDER BY part_value DESC, partkey
"""

ORACLE_SQL["q130_status_priority"] = """
SELECT l_linestatus,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

ORACLE_SQL["q131_domain_cap"] = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         cast(row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 1000000007, doc_id
         ) AS BIGINT) AS pick_rank
  FROM documents
)
SELECT source, pick_rank, doc_id, n_chars
FROM ranked
WHERE pick_rank <= 10
ORDER BY source, pick_rank
"""

ORACLE_SQL["q132_doc_chunking"] = """
WITH chunks AS (
  SELECT doc_id,
         cast(s.i / 150 AS BIGINT) AS chunk_id,
         substring(text, s.i + 1, 200) AS chunk
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, greatest(n_chars - 1, 0), 150)) AS i) s
)
SELECT doc_id, chunk_id,
       cast(length(chunk) AS BIGINT) AS chunk_len,
       md5(chunk) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_id
"""

ORACLE_SQL["q133_running_distinct"] = """
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         CASE WHEN row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) = 1 THEN 1 ELSE 0 END AS is_first
  FROM events
  WHERE user_id % 97 = 0
)
SELECT user_id, ts_us, event_id, event_type,
       cast(sum(is_first) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_types_so_far
FROM flagged
ORDER BY user_id, ts_us, event_id
"""

ORACLE_SQL["q134_winsorize"] = """
WITH bounds AS (
  SELECT quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem
)
SELECT l_returnflag,
       cast(count(*) AS BIGINT) AS n,
       round(avg(l_extendedprice), 2) AS avg_raw,
       round(avg(least(greatest(l_extendedprice, p01), p99)), 2) AS avg_winsorized,
       cast(sum(CASE WHEN l_extendedprice < p01 OR l_extendedprice > p99
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM lineitem, bounds
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q135_passage_dedup"] = """
WITH grams AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), s.i, s.i + 7), ' ')
           AS passage
  FROM documents,
       LATERAL (
         SELECT unnest(generate_series(
           1, greatest(length(string_split(text, ' ')) - 7, 0))) AS i
       ) s
)
SELECT md5(passage) AS passage_md5,
       cast(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       cast(count(*) AS BIGINT) AS n_occurrences
FROM grams
GROUP BY 1
HAVING count(DISTINCT doc_id) > 1
ORDER BY n_docs DESC, n_occurrences DESC, passage_md5
LIMIT 100
"""

ORACLE_SQL["q136_asof_tolerance"] = """
WITH matched AS (
  SELECT e.event_type, e.ts,
         CASE WHEN e.ts - x.asof <= INTERVAL 30 DAY THEN x.asof END AS asof_date
  FROM events e
  LEFT JOIN LATERAL (
    SELECT max(o.o_orderdate) AS asof
    FROM orders o
    WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  ) x ON true
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n,
       cast(count(asof_date) AS BIGINT) AS n_matched,
       round(avg((epoch_us(ts) - epoch_us(asof_date)) / 86400000000.0), 2)
         AS avg_gap_days
FROM matched
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["q137_profile_stats"] = """
WITH prepared AS (
  SELECT 'l_quantity' AS col_name, cast(l_quantity AS VARCHAR) AS val FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', cast(l_extendedprice AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_returnflag', l_returnflag FROM lineitem
  UNION ALL
  SELECT 'l_shipdate', strftime(l_shipdate, '%Y-%m-%d') FROM lineitem
)
SELECT col_name,
       cast(count(*) AS BIGINT) AS n_rows,
       cast(count(*) - count(val) AS BIGINT) AS n_null,
       cast(count(DISTINCT val) AS BIGINT) AS n_distinct,
       min(val) AS min_val,
       max(val) AS max_val
FROM prepared
GROUP BY col_name
ORDER BY col_name
"""

ORACLE_SQL["q138_zscore_outliers"] = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(CASE WHEN abs((value - mu) / sigma) > 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       round(min((value - mu) / sigma), 2) AS min_z,
       round(max((value - mu) / sigma), 2) AS max_z
FROM events e JOIN stats s ON e.event_type = s.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""

ORACLE_SQL["q139_session_islands"] = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id % 7 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
),
sessions AS (
  SELECT user_id, session_id,
         cast(count(*) AS BIGINT) AS n_events,
         (max(epoch_us(ts)) - min(epoch_us(ts))) / 60000000.0 AS dur_min
  FROM numbered
  GROUP BY user_id, session_id
)
SELECT user_id,
       cast(count(*) AS BIGINT) AS n_sessions,
       floor(avg(n_events) * 100 + 0.5) / 100 AS avg_events_per_session,
       floor(max(dur_min) * 100 + 0.5) / 100 AS max_session_min
FROM sessions
GROUP BY user_id
ORDER BY user_id
"""

ORACLE_SQL["q140_customer_deciles"] = """
WITH spend AS (
  SELECT o_custkey, sum(o_totalprice) AS spend
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, spend,
         cast(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS decile
  FROM spend
)
SELECT decile,
       cast(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(spend AS DECIMAL(18,6))), 2) AS DOUBLE) AS decile_spend,
       round(min(spend), 2) AS min_spend,
       round(max(spend), 2) AS max_spend
FROM tiled
GROUP BY decile
ORDER BY decile
"""

ORACLE_SQL["q141_string_battery2"] = """
SELECT cast(p_partkey AS BIGINT) AS p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       split_part(p_name, ' ', 1) AS first_word,
       split_part(p_name, ' ', -1) AS last_word,
       left(p_name, 5) AS left5,
       right(p_name, 5) AS right5,
       cast(ascii(p_name) AS BIGINT) AS first_code,
       chr(ascii(p_name)) AS first_chr,
       repeat('ab', 3) AS rep,
       reverse(p_name) AS rev,
       cast(strpos(p_name, 'a') AS BIGINT) AS a_pos
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
"""

ORACLE_SQL["q142_twap"] = """
WITH obs AS (
  SELECT user_id,
         date_trunc('day', ts) AS day,
         ts, event_id, value,
         coalesce(
           lead(epoch_us(ts)) OVER (
             PARTITION BY user_id, date_trunc('day', ts)
             ORDER BY ts, event_id
           ),
           epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY)
         ) - epoch_us(ts) AS w_us
  FROM events
  WHERE user_id % 11 = 0
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       round(sum(value * w_us) / sum(w_us), 2) AS twap,
       cast(count(*) AS BIGINT) AS n_obs
FROM obs
GROUP BY user_id, day
ORDER BY user_id, day
"""

ORACLE_SQL["q143_ohlc_bars"] = """
WITH ranked AS (
  SELECT date_trunc('hour', ts) AS bar, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_asc,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_desc
  FROM events
  WHERE event_type = 'purchase'
)
SELECT epoch_us(bar) AS bar_us,
       round(max(CASE WHEN rn_asc = 1 THEN value END), 2) AS open,
       round(max(value), 2) AS high,
       round(min(value), 2) AS low,
       round(max(CASE WHEN rn_desc = 1 THEN value END), 2) AS close,
       cast(count(*) AS BIGINT) AS n_trades
FROM ranked
GROUP BY bar
ORDER BY bar_us
"""

ORACLE_SQL["q144_salted_heavy_hitters"] = """
SELECT event_type,
       cast(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["q145_last_touch"] = """
WITH touches AS (
  SELECT user_id, ts AS touch_ts, max(event_type) AS touch_type
  FROM events
  WHERE event_type IN ('click', 'view')
  GROUP BY user_id, ts
),
attributed AS (
  SELECT e.value,
         CASE WHEN e.ts - x.touch_ts <= INTERVAL 7 DAY
              THEN x.touch_type END AS matched_type
  FROM events e
  LEFT JOIN LATERAL (
    SELECT t.touch_ts, t.touch_type
    FROM touches t
    WHERE t.user_id = e.user_id AND t.touch_ts <= e.ts
    ORDER BY t.touch_ts DESC
    LIMIT 1
  ) x ON true
  WHERE e.event_type = 'purchase'
)
SELECT coalesce(matched_type, 'unattributed') AS channel,
       cast(count(*) AS BIGINT) AS n_purchases,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS attributed_value
FROM attributed
GROUP BY 1
ORDER BY channel
"""

ORACLE_SQL["q146_math_battery2"] = """
SELECT cast(n_nationkey AS BIGINT) AS n_nationkey,
       round(sin(n_nationkey / 7.0), 6) AS sin_x,
       round(cos(n_nationkey / 7.0), 6) AS cos_x,
       round(tan(n_nationkey / 7.0), 6) AS tan_x,
       round(atan2(n_nationkey / 7.0, 2.0), 6) AS atan2_x,
       round(degrees(n_nationkey / 7.0), 6) AS deg_x,
       round(radians(cast(n_nationkey AS DOUBLE)), 6) AS rad_k,
       round(cbrt(cast(n_nationkey AS DOUBLE)), 6) AS cbrt_k,
       round(log2(n_nationkey + 1.0), 6) AS log2_k1,
       cast(factorial(cast(n_nationkey % 10 AS INT)) AS BIGINT) AS fact_mod
FROM nation
ORDER BY n_nationkey
"""

ORACLE_SQL["q147_weighted_median"] = """
WITH cum AS (
  SELECT l_returnflag, l_extendedprice, l_quantity,
         sum(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cumw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
  FROM lineitem
)
SELECT l_returnflag,
       round(min(l_extendedprice), 2) AS weighted_median_price,
       round(max(totw), 2) AS total_weight
FROM cum
WHERE cumw >= totw / 2
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q148_wow_movers"] = """
WITH weekly AS (
  SELECT cast(l_partkey AS BIGINT) AS partkey,
         date_trunc('week', l_shipdate) AS week,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  GROUP BY 1, 2
),
moved AS (
  SELECT partkey,
         strftime(week, '%Y-%m-%d') AS week,
         round(rev, 2) AS rev,
         round(prev_rev, 2) AS prev_rev,
         round((rev - prev_rev) / prev_rev * 100, 2) AS pct_change
  FROM (
    SELECT *, lag(rev) OVER (PARTITION BY partkey ORDER BY week) AS prev_rev
    FROM weekly
  )
  WHERE prev_rev IS NOT NULL AND prev_rev > 0
)
SELECT * FROM moved
ORDER BY abs(pct_change) DESC, partkey, week
LIMIT 50
"""

ORACLE_SQL["q149_null_safe_join"] = """
WITH a AS (
  SELECT nullif(l_returnflag, 'N') AS k,
         cast(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
),
b AS (
  SELECT nullif(CASE o_orderstatus WHEN 'F' THEN 'A'
                                   WHEN 'O' THEN 'N'
                                   ELSE 'R' END, 'N') AS k,
         cast(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT coalesce(a.k, '<null>') AS key, n_lines, n_orders
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY key
"""

ORACLE_SQL["q150_multi_distinct"] = """
SELECT l_returnflag,
       cast(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       cast(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       cast(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
       cast(sum(l_quantity) AS BIGINT) AS sum_qty,
       cast(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q151_explode_outer"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> length(t) > 6) AS arr
  FROM documents
  WHERE doc_id < 120
),
exploded AS (
  SELECT t.doc_id,
         u.pos - 1 AS pos,
         u.token
  FROM toks t
  LEFT JOIN LATERAL (
    SELECT unnest(arr) AS token,
           generate_subscripts(arr, 1) AS pos
  ) u ON true
)
SELECT doc_id,
       cast(coalesce(pos, -1) AS BIGINT) AS pos,
       coalesce(token, '<none>') AS token
FROM exploded
ORDER BY doc_id, pos
"""

ORACLE_SQL["q152_percent_of_total"] = """
WITH rev AS (
  SELECT r_name, n_name,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(round(rev, 2) AS DOUBLE) AS nation_rev,
       round(CAST(rev AS DOUBLE)
             / CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE)
             * 100, 2) AS pct_of_region
FROM rev
ORDER BY r_name, n_name
"""

ORACLE_SQL["q153_dense_grid"] = """
WITH years AS (
  SELECT unnest(generate_series(1995, 2002)) AS year
),
spine AS (
  SELECT year, r_regionkey, r_name FROM years CROSS JOIN region
),
actual AS (
  SELECT year(l_shipdate) AS year, n_regionkey AS r_regionkey,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT cast(s.year AS BIGINT) AS year, s.r_name,
       round(coalesce(a.rev, 0.0), 2) AS revenue
FROM spine s
LEFT JOIN actual a ON s.year = a.year AND s.r_regionkey = a.r_regionkey
ORDER BY year, r_name
"""

ORACLE_SQL["q154_group_concat"] = """
SELECT p_type,
       string_agg(DISTINCT p_brand, ',' ORDER BY p_brand) AS brands,
       cast(count(DISTINCT p_brand) AS BIGINT) AS n_brands
FROM part
GROUP BY p_type
ORDER BY p_type
"""

ORACLE_SQL["q155_pareto_curve"] = """
WITH per_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT row_number() OVER (ORDER BY rev DESC, l_partkey) AS rnk,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / sum(rev) OVER () AS cum_share
  FROM per_part
),
thresholds AS (
  SELECT unnest([0.5, 0.8, 0.9, 0.95]) AS threshold
)
SELECT round(cast(threshold AS DOUBLE), 2) AS threshold,
       cast(min(rnk) AS BIGINT) AS parts_needed
FROM thresholds
JOIN ranked ON cum_share >= threshold
GROUP BY threshold
ORDER BY threshold
"""

ORACLE_SQL["q156_mode_per_group"] = """
WITH counts AS (
  SELECT lang, token, cast(count(*) AS BIGINT) AS n
  FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
  )
  WHERE length(token) >= 4
  GROUP BY lang, token
),
ranked AS (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rn
  FROM counts
)
SELECT lang, token AS mode_token, n
FROM ranked WHERE rn = 1
ORDER BY lang
"""

ORACLE_SQL["q157_trailing_collect"] = """
SELECT user_id,
       epoch_us(ts) AS ts_us,
       event_id,
       concat_ws(',',
         cast(round(lag(value, 2) OVER w, 2) AS VARCHAR),
         cast(round(lag(value, 1) OVER w, 2) AS VARCHAR),
         cast(round(value, 2) AS VARCHAR)) AS last3
FROM events
WHERE user_id % 23 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts_us, event_id
"""

ORACLE_SQL["q158_vocab_overlap"] = """
WITH vocab AS (
  SELECT DISTINCT source, token
  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE length(token) >= 4
),
sizes AS (
  SELECT source, count(*) AS v_size FROM vocab GROUP BY source
),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         cast(count(*) AS BIGINT) AS n_common
  FROM vocab a JOIN vocab b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       round(n_common / (sa.v_size + sb.v_size - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
"""

ORACLE_SQL["q159_mad"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       round(max(m), 4) AS median_value,
       round(quantile_cont(abs(value - m), 0.5), 4) AS mad,
       cast(count(*) AS BIGINT) AS n
FROM events e JOIN med USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""

ORACLE_SQL["q160_vocab_growth"] = """
WITH first_seen AS (
  SELECT first_doc, count(*) AS new_tokens
  FROM (
    SELECT token, min(doc_id) AS first_doc
    FROM (
      SELECT doc_id,
             array_to_string(list_slice(string_split(text, ' '), s.i, s.i + 1), ' ')
               AS token
      FROM documents,
           LATERAL (SELECT unnest(generate_series(
             1, greatest(length(string_split(text, ' ')) - 1, 0))) AS i) s
    )
    GROUP BY token
  )
  GROUP BY first_doc
),
curve AS (
  SELECT first_doc, new_tokens,
         cast(sum(new_tokens) OVER (ORDER BY first_doc
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS vocab_size
  FROM first_seen
)
SELECT cast(first_doc AS BIGINT) AS first_doc,
       cast(new_tokens AS BIGINT) AS new_tokens,
       vocab_size
FROM curve
WHERE first_doc % 20 = 0
ORDER BY first_doc
"""

ORACLE_SQL["q161_bpe_tokenize"] = """
WITH per_doc AS (
  SELECT doc_id, source,
         cast(length(regexp_extract_all(text,
           '(''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+)',
           1)) AS BIGINT) AS n_tokens,
         cast(n_chars AS BIGINT) AS n_chars
  FROM documents
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 2) AS avg_tokens_per_doc,
       round(sum(n_chars) / sum(n_tokens), 2) AS chars_per_token
FROM per_doc
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q162_decayed_score"] = """
SELECT user_id,
       round(sum(value * exp(-((epoch_us(TIMESTAMP '2024-04-01 00:00:00')
                                - epoch_us(ts)) / 86400000000.0) * 0.0231)), 2)
         AS decayed_value,
       cast(count(*) AS BIGINT) AS n_events
FROM events
WHERE user_id % 13 = 0
GROUP BY user_id
ORDER BY user_id
"""

ORACLE_SQL["q163_benford"] = """
WITH counts AS (
  SELECT cast(substring(cast(o_totalprice AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         cast(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT digit, n,
       round(n / sum(n) OVER () * 100, 2) AS pct,
       round(log10(1 + 1 / cast(digit AS DOUBLE)) * 100, 2) AS benford_pct,
       round(abs(round(n / sum(n) OVER () * 100, 2)
                 - round(log10(1 + 1 / cast(digit AS DOUBLE)) * 100, 2)), 2)
         AS abs_dev
FROM counts
ORDER BY digit
"""

ORACLE_SQL["q164_transition_matrix"] = """
WITH trans AS (
  SELECT prev_type, event_type AS next_type,
         cast(count(*) AS BIGINT) AS n
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(n / sum(n) OVER (PARTITION BY prev_type), 4) AS p
FROM trans
ORDER BY prev_type, next_type
"""

ORACLE_SQL["q165_sql_cte_window"] = """
WITH cust_rev AS (
  SELECT o_custkey, sum(o_totalprice) AS rev, count(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT c_nationkey, c_name, rev, n_orders,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY rev DESC, c_name) AS rn
  FROM cust_rev JOIN customer ON o_custkey = c_custkey
)
SELECT n_name, c_name,
       round(rev, 2) AS rev,
       cast(n_orders AS BIGINT) AS n_orders
FROM ranked JOIN nation ON c_nationkey = n_nationkey
WHERE rn <= 3
ORDER BY n_name, rev DESC, c_name
"""

ORACLE_SQL["q166_rfm_segmentation"] = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS freq,
         sum(o_totalprice) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, monetary,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
         ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
  FROM per_cust
)
SELECT concat_ws('-', r, f, m) AS segment,
       cast(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(monetary AS DECIMAL(18,6))), 2) AS DOUBLE) AS segment_value
FROM scored
GROUP BY 1
ORDER BY segment
"""

ORACLE_SQL["q167_market_basket"] = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
basket_total AS (
  SELECT cast(count(DISTINCT ok) AS DOUBLE) AS n_baskets FROM items
),
per_part AS (
  SELECT pk, count(*) AS n_p FROM items GROUP BY pk
),
pairs AS (
  SELECT a.pk AS pa, b.pk AS pb, cast(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING count(*) >= 3
)
SELECT cast(pa AS BIGINT) AS pa, cast(pb AS BIGINT) AS pb, n_ab,
       round(n_ab / n_baskets * 1000, 4) AS support_pm,
       round(n_ab / na.n_p, 4) AS confidence,
       round(n_ab * n_baskets / (na.n_p * nb.n_p), 4) AS lift
FROM pairs, basket_total
JOIN per_part na ON na.pk = pa
JOIN per_part nb ON nb.pk = pb
ORDER BY lift DESC, pa, pb
LIMIT 50
"""

ORACLE_SQL["q168_gap_histogram"] = """
WITH gaps AS (
  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0 AS gap_s
  FROM events
)
-- width_bucket(v, 0, 7, 14) spelled out (duckdb build lacks it);
-- v = log10(clamped gap) >= 0 = lo, so only the upper edge needs a cap
SELECT cast(least(floor(log10(greatest(gap_s, 1.0)) / 0.5) + 1, 15) AS BIGINT)
         AS bucket,
       cast(count(*) AS BIGINT) AS n
FROM gaps
WHERE gap_s IS NOT NULL
GROUP BY 1
ORDER BY bucket
"""

ORACLE_SQL["q169_orphan_audit"] = """
SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
       cast(count(*) AS BIGINT) AS n_orphans
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'lineitem.l_partkey->part',
       cast(count(*) AS BIGINT)
FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       cast(count(*) AS BIGINT)
FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
UNION ALL
SELECT 'orders.o_custkey->customer',
       cast(count(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'customer.c_nationkey->nation',
       cast(count(*) AS BIGINT)
FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       cast(count(*) AS BIGINT)
FROM supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
ORDER BY fk_edge
"""

ORACLE_SQL["q170_max_drawdown"] = """
WITH signed AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('purchase', 'signup') THEN value
              ELSE -value END AS sv
  FROM events
  WHERE user_id % 17 = 0
),
cumser AS (
  SELECT user_id, ts, event_id, sv,
         sum(sv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM signed
),
dd AS (
  SELECT user_id, sv, cum,
         max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM cumser
)
SELECT user_id,
       round(max(peak - cum), 2) AS max_drawdown,
       round(max(peak), 2) AS max_peak,
       CAST(round(sum(CAST(sv AS DECIMAL(18,6))), 2) AS DOUBLE) AS final_position,
       cast(count(*) AS BIGINT) AS n_events
FROM dd
GROUP BY user_id
ORDER BY user_id
"""

ORACLE_SQL["q171_python_udtf"] = """
SELECT o_orderkey,
       cast(g.k AS BIGINT) AS offset_years,
       cast(year(o_orderdate) + g.k AS BIGINT) AS milestone_year
FROM orders,
     LATERAL (SELECT unnest(generate_series(1, 3)) AS k) g
WHERE o_orderkey % 1000 = 0
ORDER BY o_orderkey, offset_years
"""

ORACLE_SQL["q172_grouped_map_norm"] = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events
  WHERE user_id % 29 = 0
  GROUP BY event_type
)
SELECT e.event_type, e.event_id,
       round((e.value - s.mu) / s.sd, 4) AS z
FROM events e JOIN stats s USING (event_type)
WHERE e.user_id % 29 = 0 AND e.event_id % 10 = 0
ORDER BY e.event_type, e.event_id
"""

ORACLE_SQL["q173_quartile_bands"] = """
WITH bounds AS (
  SELECT quantile_cont(l_extendedprice, 0.25) AS p25,
         quantile_cont(l_extendedprice, 0.50) AS p50,
         quantile_cont(l_extendedprice, 0.75) AS p75
  FROM lineitem
)
SELECT CASE WHEN l_extendedprice <= p25 THEN 'Q1'
            WHEN l_extendedprice <= p50 THEN 'Q2'
            WHEN l_extendedprice <= p75 THEN 'Q3'
            ELSE 'Q4' END AS band,
       cast(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS band_value,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem, bounds
GROUP BY 1
ORDER BY band
"""

ORACLE_SQL["q174_ignore_nulls_nav"] = """
SELECT user_id,
       epoch_us(ts) AS ts_us,
       event_id,
       round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS last_purchase,
       round(first_value(CASE WHEN event_type = 'purchase' THEN value END
                         IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS first_purchase_ever
FROM events
WHERE user_id % 31 = 0
QUALIFY event_id % 5 = 0
ORDER BY user_id, ts_us, event_id
"""

ORACLE_SQL["q175_reset_running_sum"] = """
WITH staged AS (
  SELECT user_id, ts, event_id, value,
         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM events
  WHERE user_id % 19 = 0
)
SELECT user_id,
       epoch_us(ts) AS ts_us,
       event_id,
       cast(seg AS BIGINT) AS seg,
       round(sum(value) OVER (
         PARTITION BY user_id, seg ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS spend_since_signup
FROM staged
QUALIFY event_id % 7 = 0
ORDER BY user_id, ts_us, event_id
"""

ORACLE_SQL["q176_orc_roundtrip"] = """
SELECT cast(year(o_orderdate) AS BIGINT) AS o_year,
       cast(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY 1
ORDER BY o_year
"""

ORACLE_SQL["q177_schema_evolution"] = """
WITH merged AS (
  SELECT o_orderkey, o_totalprice, NULL AS priority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT coalesce(priority, '<pre-evolution>') AS priority,
       cast(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM merged
GROUP BY 1
ORDER BY priority
"""

ORACLE_SQL["q178_snapshot_diff"] = """
WITH old AS (
  SELECT o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 10 < 8
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 10 > 1
)
SELECT CASE WHEN o.price IS NULL THEN 'added'
            WHEN n.price IS NULL THEN 'removed'
            WHEN o.price <> n.price THEN 'changed'
            ELSE 'unchanged' END AS status,
       cast(count(*) AS BIGINT) AS n_keys
FROM old o FULL JOIN new n USING (o_orderkey)
GROUP BY 1
ORDER BY status
"""

ORACLE_SQL["q179_heatmap_2d"] = """
SELECT cast(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
       cast(floor(l_discount * 20) AS BIGINT) AS disc_bucket,
       cast(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY 1, 2
ORDER BY qty_bucket, disc_bucket
"""

ORACLE_SQL["q180_percentile_disc"] = """
WITH staged AS (
  SELECT c_mktsegment, o_totalprice,
         cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice)
           AS cd
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment,
       round(min(CASE WHEN cd >= 0.5 THEN o_totalprice END), 2) AS p50_disc,
       round(min(CASE WHEN cd >= 0.9 THEN o_totalprice END), 2) AS p90_disc,
       cast(count(*) AS BIGINT) AS n
FROM staged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["q181_interval_attribution"] = """
WITH epochs AS (
  SELECT o_custkey AS user_id, o_orderkey,
         o_orderdate AS valid_from,
         coalesce(lead(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           TIMESTAMP '2100-01-01') AS valid_to
  FROM orders
)
SELECT o_orderkey,
       cast(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS epoch_value
FROM events e
JOIN epochs p ON e.user_id = p.user_id
             AND e.ts >= p.valid_from AND e.ts < p.valid_to
GROUP BY o_orderkey
ORDER BY o_orderkey
"""

ORACLE_SQL["q182_weighted_sample"] = """
WITH mx AS (SELECT cast(max(n_chars) AS DOUBLE) AS max_chars FROM documents),
kept AS (
  SELECT source, n_chars
  FROM documents, mx
  WHERE cast((doc_id * 2654435761) % 1000000007 AS DOUBLE) / 1000000007.0
        < n_chars / max_chars
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_kept,
       round(avg(n_chars), 2) AS avg_len_kept
FROM kept
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q183_rollup_share"] = """
WITH base AS (
  SELECT r_name, n_name,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS amt
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
nations AS (
  SELECT r_name, n_name, sum(amt) AS nation_rev FROM base GROUP BY 1, 2
),
regions AS (
  SELECT r_name, sum(amt) AS region_rev FROM base GROUP BY 1
),
total AS (SELECT sum(amt) AS total_rev FROM base)
SELECT n.r_name, n.n_name,
       CAST(round(nation_rev, 2) AS DOUBLE) AS nation_rev,
       round(CAST(nation_rev AS DOUBLE) / CAST(region_rev AS DOUBLE)
             * 100, 2) AS pct_of_region,
       round(CAST(region_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)
             * 100, 2) AS region_pct_of_total
FROM nations n
JOIN regions r ON n.r_name = r.r_name
CROSS JOIN total
ORDER BY n.r_name, n.n_name
"""

ORACLE_SQL["q184_revenue_anomalies"] = """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem GROUP BY 1
),
flagged AS (
  SELECT day, rev,
         avg(rev) OVER w AS base_mu,
         stddev_samp(rev) OVER w AS base_sd
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(rev, 2) AS rev,
       round(base_mu, 2) AS baseline,
       round((rev - base_mu) / base_sd, 2) AS sigmas
FROM flagged
WHERE base_sd IS NOT NULL AND abs(rev - base_mu) > 3 * base_sd
ORDER BY day
"""

ORACLE_SQL["q185_time_to_convert"] = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           AS first_view_us,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS first_buy_us
  FROM events GROUP BY user_id
),
gaps AS (
  SELECT (first_buy_us - first_view_us) / 3600000000.0 AS hours
  FROM per_user
  WHERE first_view_us IS NOT NULL AND first_buy_us IS NOT NULL
    AND first_buy_us > first_view_us
)
SELECT cast(count(*) AS BIGINT) AS n_converters,
       round(quantile_cont(hours, 0.5), 4) AS median_hours,
       round(quantile_cont(hours, 0.9), 4) AS p90_hours,
       round(avg(hours), 2) AS mean_hours
FROM gaps
"""

ORACLE_SQL["q186_map_lambdas"] = """
WITH mult(mk, mult) AS (VALUES ('key2', 2), ('key3', 3), ('key10', 10))
SELECT cast(n_nationkey AS BIGINT) AS k,
       mk,
       cast(n_nationkey * mult * 2 AS BIGINT) AS doubled_v,
       cast((CASE WHEN n_nationkey * 2 >= 30 THEN 1 ELSE 0 END)
          + (CASE WHEN n_nationkey * 3 >= 30 THEN 1 ELSE 0 END)
          + (CASE WHEN n_nationkey * 10 >= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_big
FROM nation CROSS JOIN mult
ORDER BY k, mk
"""

ORACLE_SQL["q187_zip_inline"] = """
WITH toks AS (
  SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS arr
  FROM documents WHERE doc_id < 60
)
SELECT doc_id,
       cast(s.i - 1 AS BIGINT) AS pos,
       arr[s.i] AS tok,
       cast(length(arr[s.i]) AS BIGINT) AS tok_len
FROM toks,
     LATERAL (SELECT unnest(generate_series(1, length(arr))) AS i) s
ORDER BY doc_id, pos
"""

ORACLE_SQL["q188_try_ops"] = """
SELECT cast(l_orderkey AS BIGINT) AS l_orderkey,
       cast(l_linenumber AS BIGINT) AS l_linenumber,
       CASE WHEN l_quantity - l_quantity = 0 THEN NULL
            ELSE l_extendedprice / (l_quantity - l_quantity) END AS div0,
       floor(l_extendedprice / l_quantity * 100) / 100 AS unit_price,
       try_cast(l_returnflag AS DOUBLE) AS flag_num,
       try_cast(concat(l_returnflag, cast(l_quantity AS VARCHAR)) AS DOUBLE)
         AS messy_num,
       round(try_cast(cast(l_quantity AS VARCHAR) AS DOUBLE), 2) AS good_num
FROM lineitem
WHERE l_orderkey <= 2000
ORDER BY l_orderkey, l_linenumber
"""

ORACLE_SQL["q189_encoding_battery"] = """
SELECT cast(p_partkey AS BIGINT) AS p_partkey,
       base64(encode(p_name)) AS b64,
       sha256(p_name) AS sha256_hex,
       cast(octet_length(encode(p_name)) AS BIGINT) AS n_bytes,
       decode(from_base64(base64(encode(p_name)))) = p_name AS roundtrip_ok,
       substring(hex(encode(p_name)), 1, 16) AS hex16
FROM part
WHERE p_partkey <= 150
ORDER BY p_partkey
"""

ORACLE_SQL["q190_regex_battery2"] = """
SELECT doc_id,
       cast(length(regexp_extract_all(text, '[aeiou]{2}')) AS BIGINT)
         AS double_vowels,
       cast(CASE WHEN m = '' THEN 0 ELSE strpos(text, m) END AS BIGINT)
         AS first_kw_pos,
       substring(regexp_replace(text, '^(\\w+) (\\w+)', '\\2 \\1'), 1, 30)
         AS swapped_head
FROM (
  SELECT doc_id, text,
         regexp_extract(text, 'data|table|query', 0) AS m
  FROM documents
  WHERE doc_id < 80
)
ORDER BY doc_id
"""

ORACLE_SQL["q191_pagerank_transitions"] = """
WITH trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
edges AS (
  SELECT prev_type, next_type,
         n * 1.0 / sum(n) OVER (PARTITION BY prev_type) AS p
  FROM trans
),
nodes AS (SELECT DISTINCT prev_type AS node FROM edges),
nn AS (SELECT cast(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
c1 AS (
  SELECT next_type AS node, sum(p * r) AS inflow
  FROM edges JOIN r0 ON edges.prev_type = r0.node GROUP BY 1
),
r1 AS (
  SELECT nodes.node, (1 - 0.85) / nn.n + 0.85 * coalesce(inflow, 0.0) AS r
  FROM nodes LEFT JOIN c1 ON nodes.node = c1.node CROSS JOIN nn
),
c2 AS (
  SELECT next_type AS node, sum(p * r) AS inflow
  FROM edges JOIN r1 ON edges.prev_type = r1.node GROUP BY 1
),
r2 AS (
  SELECT nodes.node, (1 - 0.85) / nn.n + 0.85 * coalesce(inflow, 0.0) AS r
  FROM nodes LEFT JOIN c2 ON nodes.node = c2.node CROSS JOIN nn
),
c3 AS (
  SELECT next_type AS node, sum(p * r) AS inflow
  FROM edges JOIN r2 ON edges.prev_type = r2.node GROUP BY 1
),
r3 AS (
  SELECT nodes.node, (1 - 0.85) / nn.n + 0.85 * coalesce(inflow, 0.0) AS r
  FROM nodes LEFT JOIN c3 ON nodes.node = c3.node CROSS JOIN nn
)
SELECT node, round(r, 6) AS pagerank
FROM r3
ORDER BY pagerank DESC, node
"""

ORACLE_SQL["q192_linreg_trend"] = """
WITH daily AS (
  SELECT l_returnflag,
         cast(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS DOUBLE)
           AS x,
         sum(l_extendedprice * (1 - l_discount)) AS y
  FROM lineitem
  GROUP BY 1, 2
)
SELECT l_returnflag,
       round(covar_pop(x, y) / var_pop(x), 4) AS slope,
       round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 2) AS intercept,
       round(pow(corr(x, y), 2), 6) AS r2,
       cast(count(*) AS BIGINT) AS n_days
FROM daily
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q193_leaderboard_churn"] = """
WITH monthly AS (
  SELECT date_trunc('month', l_shipdate) AS month, l_partkey AS pk,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY 1, 2
),
top AS (
  SELECT month, pk
  FROM (
    SELECT month, pk,
           row_number() OVER (PARTITION BY month ORDER BY rev DESC, pk) AS rnk
    FROM monthly
  )
  WHERE rnk <= 10
)
SELECT strftime(t.month, '%Y-%m') AS month,
       cast(count(*) AS BIGINT) AS n_new_entrants
FROM top t
LEFT JOIN top p ON p.month + INTERVAL 1 MONTH = t.month AND p.pk = t.pk
WHERE p.pk IS NULL
GROUP BY 1
ORDER BY month
"""

ORACLE_SQL["q194_vector_stats"] = """
WITH s1 AS (
  SELECT vec_id,
         cast(embedding AS DOUBLE[]) AS e,
         cast(len(embedding) AS DOUBLE) AS n
  FROM embeddings
),
s2 AS (
  SELECT vec_id, e, n, list_sum(e) / n AS mean FROM s1
)
SELECT vec_id,
       cast(n AS BIGINT) AS dim,
       round(mean, 6) AS mean,
       round(list_sum(list_transform(e, x -> (x - mean) * (x - mean))) / n, 6)
         AS var_pop,
       round(list_min(e), 6) AS vmin,
       round(list_max(e), 6) AS vmax
FROM s2
ORDER BY vec_id
LIMIT 200
"""

ORACLE_SQL["q195_linear_attribution"] = """
WITH joined AS (
  SELECT t.event_type AS channel, p.event_id AS pid, p.value
  FROM events p
  JOIN events t ON p.user_id = t.user_id
               AND t.event_type IN ('click', 'view')
               AND t.ts <= p.ts
               AND t.ts > p.ts - INTERVAL 7 DAY
  WHERE p.event_type = 'purchase'
),
credited AS (
  SELECT channel,
         value / count(*) OVER (PARTITION BY pid) AS credit
  FROM joined
)
SELECT channel,
       CAST(round(sum(CAST(credit AS DECIMAL(18,6))), 2) AS DOUBLE) AS credited_value,
       cast(count(*) AS BIGINT) AS n_touch_credits
FROM credited
GROUP BY channel
ORDER BY channel
"""

ORACLE_SQL["q196_skyline"] = """
SELECT cast(a.p_partkey AS BIGINT) AS p_partkey,
       round(a.p_retailprice, 2) AS price,
       cast(a.p_size AS BIGINT) AS size
FROM part a
WHERE a.p_partkey <= 2000
  AND NOT EXISTS (
    SELECT 1 FROM part b
    WHERE b.p_partkey <= 2000
      AND b.p_retailprice <= a.p_retailprice
      AND b.p_size >= a.p_size
      AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
  )
ORDER BY p_partkey
"""

ORACLE_SQL["q197_seat_allocation"] = """
WITH rev AS (
  SELECT r_name, sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
),
staged AS (
  SELECT r_name,
         rev / sum(rev) OVER () * 100 AS quota,
         cast(floor(rev / sum(rev) OVER () * 100) AS BIGINT) AS floor_seats,
         rev / sum(rev) OVER () * 100
           - floor(rev / sum(rev) OVER () * 100) AS frac
  FROM rev
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY frac DESC, r_name) AS extra_rank,
         100 - sum(floor_seats) OVER () AS short
  FROM staged
)
SELECT r_name,
       round(quota, 4) AS exact_quota,
       cast(floor_seats + CASE WHEN extra_rank <= short THEN 1 ELSE 0 END
            AS BIGINT) AS seats
FROM ranked
ORDER BY r_name
"""

ORACLE_SQL["q198_ytd_running"] = """
WITH monthly AS (
  SELECT cast(year(l_shipdate) AS BIGINT) AS yr,
         cast(month(l_shipdate) AS BIGINT) AS mo,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS rev
  FROM lineitem GROUP BY 1, 2
)
SELECT yr, mo,
       CAST(round(rev, 2) AS DOUBLE) AS month_rev,
       CAST(round(sum(rev) OVER (PARTITION BY yr ORDER BY mo
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS ytd_rev,
       round(CAST(rev AS DOUBLE)
             / CAST(sum(rev) OVER (PARTITION BY yr) AS DOUBLE) * 100, 2)
         AS pct_of_year
FROM monthly
ORDER BY yr, mo
"""

ORACLE_SQL["q199_json_export"] = """
SELECT cast(n_nationkey AS BIGINT) AS n_nationkey,
       to_json(struct_pack(
         id := cast(n_nationkey AS BIGINT),
         nation := n_name,
         region := r_name)) AS doc
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_nationkey
"""

ORACLE_SQL["q200_ops_dashboard"] = """
WITH base AS (
  SELECT date_trunc('month', l_shipdate) AS month, n_name,
         cast(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS amt,
         l_orderkey
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
),
by_nation AS (
  SELECT month, n_name, sum(amt) AS nrev FROM base GROUP BY 1, 2
),
top_nation AS (
  SELECT month, n_name AS top_nation
  FROM (
    SELECT month, n_name,
           row_number() OVER (PARTITION BY month
                              ORDER BY nrev DESC, n_name DESC) AS rn
    FROM by_nation
  )
  WHERE rn = 1
),
monthly AS (
  SELECT month, sum(amt) AS rev, count(DISTINCT l_orderkey) AS n_orders
  FROM base GROUP BY 1
)
SELECT strftime(m.month, '%Y-%m') AS month,
       cast(round(rev, 2) AS DOUBLE) AS revenue,
       cast(n_orders AS BIGINT) AS n_orders,
       round(cast(rev AS DOUBLE) / n_orders, 2) AS rev_per_order,
       top_nation,
       round(cast(rev - lag(rev) OVER (ORDER BY m.month) AS DOUBLE)
             / cast(lag(rev) OVER (ORDER BY m.month) AS DOUBLE) * 100, 2)
         AS mom_pct
FROM monthly m JOIN top_nation t ON m.month = t.month
ORDER BY month
"""

ORACLE_SQL["q201_cross_entropy"] = """
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
  FROM documents
),
toks_f AS (SELECT * FROM toks WHERE length(token) > 0),
lm AS (SELECT token, count(*) AS tf FROM toks_f GROUP BY token),
totals AS (
  SELECT cast(sum(tf) AS DOUBLE) AS n_tokens,
         cast(count(*) AS DOUBLE) AS vocab
  FROM lm
),
per_doc AS (
  SELECT doc_id, source,
         -avg(ln((tf + 1.0) / (n_tokens + vocab))) AS ce_raw,
         cast(count(*) AS BIGINT) AS n_toks
  FROM toks_f JOIN lm USING (token) CROSS JOIN totals
  GROUP BY doc_id, source
)
SELECT source,
       round(avg(ce_raw), 4) AS mean_ce,
       round(min(ce_raw), 4) AS min_ce,
       round(max(ce_raw), 4) AS max_ce,
       cast(sum(n_toks) AS BIGINT) AS total_tokens
FROM per_doc
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q202_pq_grid"] = """
WITH staged AS (
  SELECT vec_id, cast(embedding AS DOUBLE[]) AS e, len(embedding) AS dim
  FROM embeddings
),
bounds AS (
  SELECT min(list_min(e)) AS lo, max(list_max(e)) AS hi, max(dim) AS d
  FROM staged
),
exploded AS (
  SELECT vec_id, lo, hi, d,
         s.i AS pos,
         e[s.i] AS x
  FROM staged CROSS JOIN bounds,
       LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) s
),
coded AS (
  SELECT cast(floor((pos - 1) * 4 / d) AS BIGINT) AS subspace,
         cast(least(15, floor((x - lo) / (hi - lo) * 16)) AS BIGINT) AS code,
         abs(x - (lo + (least(15, floor((x - lo) / (hi - lo) * 16)) + 0.5)
                  * (hi - lo) / 16)) AS err
  FROM exploded
)
SELECT subspace,
       cast(count(DISTINCT code) AS BIGINT) AS codes_used,
       round(avg(err), 6) AS mean_abs_err,
       round(max(err), 6) AS max_abs_err,
       cast(count(*) AS BIGINT) AS n_components
FROM coded
GROUP BY subspace
ORDER BY subspace
"""

ORACLE_SQL["q203_wordlist_screen"] = """
WITH hits AS (
  SELECT doc_id, source, count(*) AS n_hits
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
        FROM documents)
  WHERE t IN ('slow', 'error', 'bad', 'crash')
  GROUP BY doc_id, source
),
per_doc AS (
  SELECT d.source, coalesce(h.n_hits, 0) AS n_hits
  FROM documents d LEFT JOIN hits h USING (doc_id, source)
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       round(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) * 100.0 / count(*),
             2) AS flag_pct,
       cast(sum(n_hits) AS BIGINT) AS total_hits
FROM per_doc
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q204_length_drift"] = """
WITH grid AS (SELECT unnest(generate_series(50, 550, 50)) AS thr),
src AS (
  SELECT source, thr,
         sum(CASE WHEN n_chars <= thr THEN 1 ELSE 0 END) * 1.0 / count(*)
           AS cdf_src
  FROM documents CROSS JOIN grid
  GROUP BY source, thr
),
corpus AS (
  SELECT thr,
         sum(CASE WHEN n_chars <= thr THEN 1 ELSE 0 END) * 1.0 / count(*)
           AS cdf_all
  FROM documents CROSS JOIN grid
  GROUP BY thr
)
SELECT source,
       round(max(abs(cdf_src - cdf_all)), 4) AS ks_stat
FROM src JOIN corpus USING (thr)
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q205_best_snippet"] = """
WITH windows AS (
  SELECT doc_id,
         s.i - 1 AS wpos,
         list_slice(string_split(text, ' '), s.i, s.i + 9) AS win
  FROM documents,
       LATERAL (SELECT unnest(generate_series(
         1, greatest(length(string_split(text, ' ')) - 9, 1))) AS i) s
  WHERE doc_id < 100
),
scored AS (
  SELECT doc_id,
         cast(wpos AS BIGINT) AS wpos,
         cast(length(list_filter(win,
           t -> t IN ('data', 'query', 'table', 'index'))) AS BIGINT)
           AS score,
         array_to_string(win, ' ') AS snippet
  FROM windows
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, wpos) AS rn
  FROM scored
)
SELECT doc_id, wpos, score, snippet
FROM ranked
WHERE rn = 1 AND score > 0
ORDER BY doc_id
"""

ORACLE_SQL["q206_autocorrelation"] = """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY 1
),
paired AS (
  SELECT rev,
         lag(rev, 1) OVER (ORDER BY day) AS rev_l1,
         lag(rev, 7) OVER (ORDER BY day) AS rev_l7
  FROM daily
)
SELECT round(corr(rev, rev_l1), 6) AS acf_1,
       round(corr(rev, rev_l7), 6) AS acf_7,
       cast(count(*) AS BIGINT) AS n_days
FROM paired
"""

ORACLE_SQL["q207_seasonality_index"] = """
WITH cells AS (
  SELECT cast(dayofweek(ts) + 1 AS BIGINT) AS dow,
         cast(hour(ts) AS BIGINT) AS hod,
         cast(count(*) AS BIGINT) AS n,
         avg(value) AS avg_v
  FROM events GROUP BY 1, 2
),
overall AS (SELECT avg(value) AS g_avg FROM events)
SELECT dow, hod, n,
       round(avg_v / g_avg * 100, 2) AS seasonal_index
FROM cells CROSS JOIN overall
ORDER BY dow, hod
"""

ORACLE_SQL["q208_rolling_wau"] = """
WITH user_days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
covered AS (
  SELECT user_id, day + to_days(cast(o.k AS INTEGER)) AS window_end
  FROM user_days,
       LATERAL (SELECT unnest(generate_series(0, 6)) AS k) o
)
SELECT strftime(window_end, '%Y-%m-%d') AS window_end,
       cast(count(DISTINCT user_id) AS BIGINT) AS wau
FROM covered
GROUP BY window_end
ORDER BY window_end
"""

ORACLE_SQL["q209_json_nested"] = """
WITH entries AS (
  SELECT cast(n_regionkey AS BIGINT) AS region_key,
         cast(n_nationkey AS BIGINT) AS id,
         n_name AS name
  FROM nation
  UNION ALL
  SELECT cast(n_regionkey AS BIGINT),
         cast(n_nationkey + 100 AS BIGINT),
         upper(n_name)
  FROM nation
)
SELECT region_key, id, name
FROM entries
ORDER BY id, name
"""

ORACLE_SQL["q210_quantile_contour"] = """
WITH per AS (
  SELECT event_type,
         quantile_cont(value, [0.10, 0.25, 0.50, 0.75, 0.90]) AS vals
  FROM events GROUP BY event_type
),
labels(quantile, idx) AS (
  VALUES ('p10', 1), ('p25', 2), ('p50', 3), ('p75', 4), ('p90', 5)
)
SELECT event_type, quantile, round(vals[idx], 4) AS value
FROM per CROSS JOIN labels
ORDER BY event_type, quantile
"""

ORACLE_SQL["q211_es_weighted_sample"] = """
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         pow((cast((doc_id * 2654435761) % 1000000007 AS DOUBLE) + 1)
             / 1000000008.0, 1.0 / n_chars) AS es_key
  FROM documents
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY source
                            ORDER BY es_key DESC, doc_id) AS rnk
  FROM keyed
)
SELECT source, cast(rnk AS BIGINT) AS rnk, doc_id,
       cast(n_chars AS BIGINT) AS n_chars,
       round(es_key, 6) AS es_key
FROM ranked
WHERE rnk <= 5
ORDER BY source, rnk
"""

ORACLE_SQL["q212_path_mining"] = """
WITH grams AS (
  SELECT lag(event_type, 2) OVER w AS s1,
         lag(event_type, 1) OVER w AS s2,
         event_type AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT concat_ws('>', s1, s2, s3) AS path,
       cast(count(*) AS BIGINT) AS n
FROM grams
WHERE s1 IS NOT NULL
GROUP BY s1, s2, s3
ORDER BY n DESC, path
LIMIT 20
"""

ORACLE_SQL["q213_revenue_bridge"] = """
WITH a AS (
  SELECT l_partkey AS pk, sum(l_quantity) AS qty_a,
         sum(l_extendedprice * (1 - l_discount)) / sum(l_quantity) AS price_a
  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1
),
b AS (
  SELECT l_partkey AS pk, sum(l_quantity) AS qty_b,
         sum(l_extendedprice * (1 - l_discount)) / sum(l_quantity) AS price_b
  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1
),
j AS (SELECT * FROM a FULL JOIN b USING (pk))
SELECT
  CAST(round(sum(CAST(CASE WHEN qty_a IS NOT NULL AND qty_b IS NOT NULL
                 THEN (qty_b - qty_a) * price_a ELSE 0.0 END AS DECIMAL(18,6))), 2) AS DOUBLE)
    AS volume_effect,
  CAST(round(sum(CAST(CASE WHEN qty_a IS NOT NULL AND qty_b IS NOT NULL
                 THEN (price_b - price_a) * qty_b ELSE 0.0 END AS DECIMAL(18,6))), 2) AS DOUBLE)
    AS price_effect,
  CAST(round(sum(CAST(CASE WHEN qty_a IS NULL THEN qty_b * price_b ELSE 0.0 END AS DECIMAL(18,6))), 2) AS DOUBLE)
    AS new_parts_effect,
  CAST(round(sum(CAST(CASE WHEN qty_b IS NULL THEN -qty_a * price_a ELSE 0.0 END AS DECIMAL(18,6))), 2) AS DOUBLE)
    AS lost_parts_effect,
  cast(count(*) AS BIGINT) AS n_parts
FROM j
"""

ORACLE_SQL["q214_try_overflow"] = """
WITH h AS (
  SELECT cast(n_nationkey AS BIGINT) AS k,
         cast(9223372036854775807 AS HUGEINT) AS mx
  FROM nation
)
SELECT k,
       cast(mx - k + k AS BIGINT) AS edge_ok,
       CASE WHEN (mx - k) + k * 2 > mx THEN NULL
            ELSE cast((mx - k) + k * 2 AS BIGINT) END AS overflow_add,
       CASE WHEN (cast(3037000499 AS HUGEINT) + k) * 3037000499 > mx
            THEN NULL
            ELSE cast((cast(3037000499 AS HUGEINT) + k) * 3037000499
                      AS BIGINT) END AS overflow_mul,
       cast(k * k AS BIGINT) AS small_mul
FROM h
ORDER BY k
"""

ORACLE_SQL["q215_survival_curve"] = """
WITH horizon AS (SELECT max(epoch_us(ts)) AS h_us FROM events),
per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t1
  FROM events GROUP BY user_id
),
durations AS (
  SELECT CASE WHEN t1 IS NOT NULL AND t1 >= t0
              THEN (t1 - t0) / 3600000000.0 END AS event_t,
         CASE WHEN t1 IS NULL OR t1 < t0
              THEN (h_us - t0) / 3600000000.0 END AS censor_t
  FROM per_user CROSS JOIN horizon
  WHERE t0 IS NOT NULL
),
n_total AS (SELECT cast(count(*) AS DOUBLE) AS n0 FROM durations),
events_t AS (
  SELECT round(event_t, 6) AS t, cast(count(*) AS DOUBLE) AS d
  FROM durations WHERE event_t IS NOT NULL GROUP BY 1
),
at_risk AS (
  SELECT e.t, e.d,
         n0 - (SELECT cast(count(*) AS DOUBLE) FROM durations x
               WHERE coalesce(x.event_t, x.censor_t) < e.t) AS n_risk
  FROM events_t e CROSS JOIN n_total
),
curve AS (
  SELECT t, d, n_risk,
         exp(sum(ln(1 - d / n_risk)) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS surv
  FROM at_risk
)
SELECT round(t, 2) AS t_hours,
       cast(d AS BIGINT) AS n_events,
       cast(n_risk AS BIGINT) AS n_at_risk,
       round(surv, 6) AS survival
FROM curve
ORDER BY t_hours
LIMIT 100
"""

ORACLE_SQL["q216_activity_bitmaps"] = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       cast(bit_or(cast(1 AS BIGINT) << cast(user_id % 63 AS INTEGER))
            AS BIGINT) AS bitmap,
       cast(bit_count(bit_or(cast(1 AS BIGINT)
                             << cast(user_id % 63 AS INTEGER))) AS BIGINT)
         AS slots_active
FROM events
GROUP BY date_trunc('day', ts)
ORDER BY day
"""

ORACLE_SQL["q217_time_hierarchy"] = """
WITH staged AS (
  SELECT cast(year(l_shipdate) AS BIGINT) AS yr,
         cast(quarter(l_shipdate) AS BIGINT) AS qtr,
         cast(month(l_shipdate) AS BIGINT) AS mo,
         l_extendedprice * (1 - l_discount) AS amt
  FROM lineitem
),
rolled AS (
  SELECT yr, qtr, mo,
         CAST(round(sum(CAST(amt AS DECIMAL(18,6))), 2) AS DOUBLE) AS rev,
         cast(count(*) AS BIGINT) AS n_lines,
         grouping(yr) * 4 + grouping(qtr) * 2 + grouping(mo) AS gid
  FROM staged
  GROUP BY ROLLUP (yr, qtr, mo)
)
SELECT CASE gid WHEN 7 THEN 'total' WHEN 3 THEN 'year'
                WHEN 1 THEN 'quarter' ELSE 'month' END AS level,
       coalesce(yr, -1) AS yr,
       coalesce(qtr, -1) AS qtr,
       coalesce(mo, -1) AS mo,
       rev, n_lines
FROM rolled
ORDER BY yr, qtr, mo, level
"""

ORACLE_SQL["q218_gini"] = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT x,
         cast(row_number() OVER (ORDER BY x, o_custkey)
              AS DECIMAL(12,0)) AS i
  FROM spend
)
SELECT round(2 * CAST(sum(i * x) AS DOUBLE)
             / (count(*) * CAST(sum(x) AS DOUBLE))
             - (count(*) + 1.0) / count(*), 6) AS gini,
       cast(count(*) AS BIGINT) AS n_customers,
       CAST(CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE) AS DOUBLE) AS total_spend
FROM ranked
"""

ORACLE_SQL["q219_equidepth_histogram"] = """
WITH bounds AS (
  SELECT quantile_cont(o_totalprice,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
  FROM orders
)
SELECT cast(list_sum(list_transform(bs,
         b -> CASE WHEN o_totalprice > b THEN 1 ELSE 0 END)) AS BIGINT)
         AS bucket,
       cast(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders CROSS JOIN bounds
GROUP BY 1
ORDER BY bucket
"""

ORACLE_SQL["q220_interval_union"] = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) - 15 * 60 * 1000000 AS s,
         epoch_us(ts) + 15 * 60 * 1000000 AS e,
         event_id
  FROM events
  WHERE user_id % 37 = 0
),
staged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_period,
         event_id
  FROM iv
),
numbered AS (
  SELECT user_id, s, e,
         sum(new_period) OVER (PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS period_id
  FROM staged
),
periods AS (
  SELECT user_id, period_id, min(s) AS ps, max(e) AS pe
  FROM numbered GROUP BY user_id, period_id
)
SELECT user_id,
       cast(count(*) AS BIGINT) AS n_periods,
       CAST(round(sum(CAST((pe - ps) / 60000000.0 AS DECIMAL(18,6))), 2) AS DOUBLE) AS covered_minutes
FROM periods
GROUP BY user_id
ORDER BY user_id
"""

ORACLE_SQL["q221_unpivot_melt"] = """
WITH long AS (
  SELECT l_orderkey, 'quantity' AS measure,
         cast(l_quantity AS DOUBLE) AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'discount', cast(l_discount AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'tax', cast(l_tax AS DOUBLE) FROM lineitem
)
SELECT measure,
       cast(count(*) AS BIGINT) AS n,
       round(avg(val), 2) AS mean_val,
       round(max(val), 2) AS max_val
FROM long
GROUP BY measure
ORDER BY measure
"""

ORACLE_SQL["q222_random_projection"] = """
WITH staged AS (
  SELECT vec_id,
         cast(embedding AS DOUBLE[]) AS e
  FROM embeddings
),
proj AS (
  SELECT vec_id,
         list_transform(range(0, 8), j ->
           list_sum(list_transform(e, (x, i) ->
             x * (cast(((i - 1) * 2654435761 + j * 40503) % 1000003
                       AS DOUBLE) / 1000003.0 - 0.5)))) AS y
  FROM staged
)
SELECT vec_id,
       round(y[1], 6) AS y0,
       round(y[2], 6) AS y1,
       round(y[3], 6) AS y2,
       round(sqrt(list_sum(list_transform(y, v -> v * v))), 6) AS y_norm
FROM proj
ORDER BY vec_id
LIMIT 300
"""

ORACLE_SQL["q223_decile_migration"] = """
WITH a AS (
  SELECT o_custkey,
         cast(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT)
           AS from_decile
  FROM (SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1)
),
b AS (
  SELECT o_custkey,
         cast(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT)
           AS to_decile
  FROM (SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1)
)
SELECT coalesce(from_decile, 0) AS from_decile,
       coalesce(to_decile, 0) AS to_decile,
       cast(count(*) AS BIGINT) AS n_customers
FROM a FULL JOIN b USING (o_custkey)
GROUP BY 1, 2
ORDER BY from_decile, to_decile
"""

ORACLE_SQL["q224_higher_moments"] = """
-- Spark's skewness/kurtosis are POPULATION moments; duckdb's named
-- aggregates are sample-corrected -> kurtosis_pop + manual m3/m2^1.5
WITH staged AS (
  SELECT l_returnflag, l_extendedprice AS x,
         avg(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mu
  FROM lineitem
)
SELECT l_returnflag,
       round(avg(pow(x - mu, 3)) / pow(avg(pow(x - mu, 2)), 1.5), 4)
         AS skew_price,
       round(kurtosis_pop(x), 4) AS kurt_price,
       round(stddev_samp(x), 2) AS sd_price,
       cast(count(*) AS BIGINT) AS n
FROM staged
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q225_corr_matrix"] = """
WITH wide AS (
  SELECT round(corr(l_quantity, l_extendedprice), 6) AS q_e,
         round(corr(l_quantity, l_discount), 6) AS q_d,
         round(corr(l_quantity, l_tax), 6) AS q_t,
         round(corr(l_extendedprice, l_discount), 6) AS e_d,
         round(corr(l_extendedprice, l_tax), 6) AS e_t,
         round(corr(l_discount, l_tax), 6) AS d_t
  FROM lineitem
)
SELECT 'quantity' AS measure_a, 'extendedprice' AS measure_b, q_e AS corr FROM wide
UNION ALL SELECT 'quantity', 'discount', q_d FROM wide
UNION ALL SELECT 'quantity', 'tax', q_t FROM wide
UNION ALL SELECT 'extendedprice', 'discount', e_d FROM wide
UNION ALL SELECT 'extendedprice', 'tax', e_t FROM wide
UNION ALL SELECT 'discount', 'tax', d_t FROM wide
ORDER BY measure_a, measure_b
"""

ORACLE_SQL["q226_cv_folds"] = """
SELECT cast(((vec_id * 2654435761) % 1000000007) % 5 AS BIGINT) AS fold,
       label,
       cast(count(*) AS BIGINT) AS n
FROM embeddings
GROUP BY 1, 2
ORDER BY fold, label
"""

ORACLE_SQL["q227_chi_square"] = """
WITH obs AS (
  SELECT event_type, dayofweek(ts) AS dow,
         cast(count(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
),
row_m AS (SELECT event_type, sum(o) AS row_t FROM obs GROUP BY 1),
col_m AS (SELECT dow, sum(o) AS col_t FROM obs GROUP BY 1),
grand AS (SELECT sum(o) AS g FROM obs),
cells AS (
  SELECT o, row_t * col_t / g AS e
  FROM obs
  JOIN row_m USING (event_type)
  JOIN col_m USING (dow)
  CROSS JOIN grand
)
SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2,
       cast(count(*) AS BIGINT) AS n_cells,
       cast((SELECT count(DISTINCT event_type) - 1 FROM obs) AS BIGINT)
         AS df_rows,
       cast((SELECT count(DISTINCT dow) - 1 FROM obs) AS BIGINT) AS df_cols
FROM cells
"""

ORACLE_SQL["q228_rolling_slope"] = """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         sum(l_extendedprice * (1 - l_discount)) AS y
  FROM lineitem GROUP BY 1
),
staged AS (
  SELECT day, y,
         cast(date_diff('day', TIMESTAMP '1995-01-01', day) AS DOUBLE) AS x
  FROM daily
),
rolled AS (
  SELECT day,
         (avg(x * y) OVER w - avg(x) OVER w * avg(y) OVER w)
           / (avg(x * x) OVER w - avg(x) OVER w * avg(x) OVER w) AS slope,
         count(*) OVER w AS n_win
  FROM staged
  WINDOW w AS (ORDER BY x ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(slope, 2) AS slope_14d
FROM rolled
WHERE n_win = 14
ORDER BY day
LIMIT 200
"""

ORACLE_SQL["q229_hhi"] = """
WITH per_sup AS (
  SELECT n_name, s_suppkey,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT n_name, sum(rev) AS nation_rev FROM per_sup GROUP BY 1)
SELECT n_name,
       round(sum(pow(rev / nation_rev, 2)) * 10000, 2) AS hhi,
       cast(count(*) AS BIGINT) AS n_suppliers
FROM per_sup JOIN tot USING (n_name)
GROUP BY n_name
ORDER BY n_name
"""

ORACLE_SQL["q230_auc"] = """
WITH labeled AS (
  SELECT round(value, 2) AS score,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS pos
  FROM events
),
by_score AS (
  SELECT score, cast(count(*) AS DOUBLE) AS n, sum(pos) AS n_pos
  FROM labeled GROUP BY score
),
ranked AS (
  SELECT *,
         coalesce(sum(n) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
           + (n + 1) / 2 AS avg_rank
  FROM by_score
)
SELECT round((sum(avg_rank * n_pos) - sum(n_pos) * (sum(n_pos) + 1) / 2)
             / (sum(n_pos) * (sum(n) - sum(n_pos))), 6) AS auc,
       cast(sum(n_pos) AS BIGINT) AS n_positive,
       cast(sum(n) - sum(n_pos) AS BIGINT) AS n_negative
FROM ranked
"""

ORACLE_SQL["q231_csv_malformed"] = """
SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'corrupt' ELSE 'ok' END AS status,
       cast(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(CASE WHEN o_orderkey % 10 = 0 THEN NULL
                      ELSE o_totalprice END AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM orders
GROUP BY 1
ORDER BY status
"""

ORACLE_SQL["q232_format_battery"] = """
SELECT cast(n_nationkey AS BIGINT) AS k,
       printf('N-%05d', n_nationkey) AS padded_id,
       printf('%s/%02d', n_name, n_regionkey) AS composed,
       printf('%08.3f', n_nationkey * 1.5) AS fixed_float
FROM nation
ORDER BY k
"""

ORACLE_SQL["q233_array_index_semantics"] = """
WITH staged AS (
  SELECT doc_id, list_slice(string_split(text, ' '), 1, 4) AS a
  FROM documents WHERE doc_id < 150
)
SELECT doc_id,
       a[1] AS first_el,
       a[-1] AS last_el,
       a[99] AS oob_null,
       cast(coalesce(list_position(a, 'the'), 0) AS BIGINT) AS pos_the,
       a[100] AS get_oob,
       cast(length(a) AS BIGINT) AS n
FROM staged
ORDER BY doc_id
"""

ORACLE_SQL["q234_behavior_entropy"] = """
WITH mix AS (
  SELECT user_id, event_type, cast(count(*) AS DOUBLE) AS n
  FROM events
  WHERE user_id % 5 = 0
  GROUP BY 1, 2
),
p AS (
  SELECT user_id, event_type, n,
         n / sum(n) OVER (PARTITION BY user_id) AS p
  FROM mix
)
SELECT user_id,
       round(sum(-p * ln(p)), 6) AS entropy_nats,
       cast(count(DISTINCT event_type) AS BIGINT) AS n_types,
       cast(sum(n) AS BIGINT) AS n_events
FROM p
GROUP BY user_id
ORDER BY user_id
"""

ORACLE_SQL["q235_welch_t"] = """
WITH agg AS (
  SELECT avg(CASE WHEN event_type = 'purchase' THEN value END) AS m1,
         var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
         cast(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
           AS n1,
         avg(CASE WHEN event_type = 'view' THEN value END) AS m2,
         var_samp(CASE WHEN event_type = 'view' THEN value END) AS v2,
         cast(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS n2
  FROM events
  WHERE event_type IN ('purchase', 'view')
)
SELECT round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
       round(pow(v1 / n1 + v2 / n2, 2)
             / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 2)
         AS df_welch,
       cast(n1 AS BIGINT) AS n_purchase,
       cast(n2 AS BIGINT) AS n_view
FROM agg
"""

ORACLE_SQL["q236_haversine"] = """
WITH pts AS (
  SELECT cast(n_nationkey AS BIGINT) AS k,
         cast((n_nationkey * 37) % 140 - 70 AS DOUBLE) AS lat,
         cast((n_nationkey * 73) % 340 - 170 AS DOUBLE) AS lon
  FROM nation
),
pairs AS (
  SELECT a.k AS ka, b.k AS kb,
         2 * 6371.0 * asin(sqrt(
           pow(sin(radians(b.lat - a.lat) / 2), 2)
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * pow(sin(radians(b.lon - a.lon) / 2), 2))) AS km
  FROM pts a CROSS JOIN pts b
  WHERE a.k <> b.k
),
ranked AS (
  SELECT ka, kb, km,
         row_number() OVER (PARTITION BY ka ORDER BY km, kb) AS rn
  FROM pairs
)
SELECT ka, kb AS nearest, round(km, 2) AS km
FROM ranked
WHERE rn = 1
ORDER BY ka
"""

ORACLE_SQL["q238_regr_battery"] = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       cast(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# DuckDB's skewness/kurtosis are SAMPLE-adjusted; derive the
# population forms (Spark's definition) from explicit central moments.
ORACLE_SQL["q239_moment_stats"] = """
WITH mu AS (
  SELECT o_orderstatus, avg(o_totalprice) AS m
  FROM orders GROUP BY o_orderstatus
),
mom AS (
  SELECT o.o_orderstatus,
         avg(pow(o_totalprice - m, 2)) AS m2,
         avg(pow(o_totalprice - m, 3)) AS m3,
         avg(pow(o_totalprice - m, 4)) AS m4,
         count(*) AS n
  FROM orders o JOIN mu USING (o_orderstatus)
  GROUP BY o.o_orderstatus
)
SELECT o_orderstatus,
       round(m3 / pow(m2, 1.5), 4) AS skew,
       round(m4 / pow(m2, 2) - 3, 4) AS kurt,
       cast(n AS BIGINT) AS n
FROM mom
ORDER BY o_orderstatus
"""

ORACLE_SQL["q240_price_histogram"] = """
SELECT least(cast(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
       cast(count(*) AS BIGINT) AS n_orders,
       round(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 2) AS avg_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY 1
ORDER BY bucket
"""

ORACLE_SQL["q241_bit_bool_aggs"] = """
SELECT o_orderpriority,
       bit_and(o_orderkey) AS key_and,
       bit_or(o_orderkey) AS key_or,
       bit_xor(o_orderkey) AS key_xor,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 450000) AS any_over_450k,
       cast(count(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_SQL["q242_cohort_retention"] = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
  FROM events GROUP BY user_id
)
SELECT strftime(c.cohort_w, '%Y-%m-%d') AS cohort,
       cast(date_diff('day', c.cohort_w, date_trunc('week', e.ts)) / 7
            AS BIGINT) AS weeks_since,
       cast(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN cohorts c USING (user_id)
GROUP BY 1, 2
ORDER BY cohort, weeks_since
"""

ORACLE_SQL["q243_zscore_anomaly"] = """
WITH scored AS (
  SELECT event_type,
         CASE WHEN stddev_samp(value) OVER w > 0
              THEN (value - avg(value) OVER w)
                   / stddev_samp(value) OVER w
         END AS z
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_anomalies,
       round(max(abs(z)), 3) AS max_abs_z
FROM scored
WHERE abs(z) > 2.5
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["q244_funnel_stages"] = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, v.t_view, min(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL 24 HOUR
  GROUP BY e.user_id, v.t_view
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT CASE WHEN p.t_purchase IS NOT NULL THEN 3
            WHEN c.t_click IS NOT NULL THEN 2
            ELSE 1 END AS stage_reached,
       cast(count(*) AS BIGINT) AS n_users
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
GROUP BY 1
ORDER BY stage_reached
"""

ORACLE_SQL["q245_range_similarity"] = """
WITH t AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 1),
s AS (
  SELECT vec_id,
         list_dot_product(embedding::DOUBLE[], q::DOUBLE[])
         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            * sqrt(list_dot_product(q::DOUBLE[], q::DOUBLE[]))) AS s
  FROM embeddings, t
  WHERE vec_id <> 1
)
SELECT vec_id, round(s, 4) AS sim
FROM s
WHERE s >= 0.30 AND s < 0.42
ORDER BY sim DESC, vec_id
"""

ORACLE_SQL["q246_scd2_intervals"] = """
WITH iv AS (
  SELECT event_type,
         epoch_us(ts) AS from_us,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)) AS to_us
  FROM events
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_intervals,
       cast(sum(CASE WHEN to_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       round(sum(to_us - from_us) / count(to_us - from_us) / 1e6, 2)
         AS avg_closed_sec
FROM iv
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["q247_sessionization"] = """
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                   OR lag(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, us,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM flagged
),
sessions AS (
  SELECT user_id, sess_no, count(*) AS n_events,
         max(us) - min(us) AS dur_us
  FROM numbered GROUP BY user_id, sess_no
)
SELECT cast(count(*) AS BIGINT) AS n_sessions,
       round(sum(n_events) / count(*), 4) AS avg_events,
       round(sum(dur_us) / count(*) / 6e7, 4) AS avg_minutes,
       cast(max(n_events) AS BIGINT) AS max_events
FROM sessions
"""

ORACLE_SQL["q248_benford_digits"] = """
WITH d AS (
  SELECT cast(floor(o_totalprice / pow(10, floor(log10(o_totalprice))))
              AS BIGINT) AS digit
  FROM orders
),
g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
SELECT digit, cast(n AS BIGINT) AS n,
       round(n / (SELECT sum(n) FROM g), 4) AS observed,
       round(log10(1 + 1 / digit::DOUBLE), 4) AS benford,
       round(abs(round(n / (SELECT sum(n) FROM g), 4)
                 - round(log10(1 + 1 / digit::DOUBLE), 4)), 4) AS abs_dev
FROM g
ORDER BY digit
"""

ORACLE_SQL["q249_interevent_percentiles"] = """
WITH gaps AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY event_type ORDER BY ts, event_id)) / 1e6 AS gap_s
  FROM events
)
SELECT event_type,
       round(quantile_cont(gap_s, 0.5), 3) AS p50_s,
       round(quantile_cont(gap_s, 0.9), 3) AS p90_s,
       round(quantile_cont(gap_s, 0.99), 3) AS p99_s,
       cast(count(gap_s) AS BIGINT) AS n_gaps
FROM gaps
WHERE gap_s IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["q250_url_battery"] = """
WITH u AS (
  SELECT 'https://' || source || '.example.org/docs/' || doc_id
         || '?page=' || (doc_id % 7) || '&lang=' || lang AS url
  FROM documents
),
x AS (
  SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
         cast(regexp_extract(url, '[?&]page=(\\d+)', 1) AS BIGINT) AS page,
         regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS doc_path
  FROM u
)
SELECT host,
       cast(count(*) AS BIGINT) AS n_urls,
       cast(count(DISTINCT doc_path) AS BIGINT) AS n_paths,
       round(sum(page) / count(*), 4) AS avg_page
FROM x
GROUP BY host
ORDER BY host
"""

ORACLE_SQL["q251_decile_lift"] = """
WITH ranked AS (
  SELECT ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv
  FROM orders
),
by_dec AS (
  SELECT decile, count(*) AS n, sum(conv) AS conversions
  FROM ranked GROUP BY decile
)
SELECT decile, cast(n AS BIGINT) AS n,
       cast(conversions AS BIGINT) AS conversions,
       round(conversions / n, 4) AS rate,
       cast(sum(conversions) OVER (ORDER BY decile
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_conversions
FROM by_dec
ORDER BY decile
"""

ORACLE_SQL["q252_mad"] = """
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       round(any_value(m.med), 2) AS median_price,
       round(quantile_cont(abs(o.o_totalprice - m.med), 0.5), 2) AS mad,
       cast(count(*) AS BIGINT) AS n
FROM orders o JOIN med m USING (o_orderpriority)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

ORACLE_SQL["q253_mode_tiebreak"] = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY n DESC, o_orderpriority) AS rn
  FROM counts
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, cast(n AS BIGINT) AS n
FROM ranked WHERE rn = 1
ORDER BY o_orderstatus
"""

ORACLE_SQL["q254_mom_revenue"] = """
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         sum(cast(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT month,
       cast(rev AS DOUBLE) AS revenue,
       round(cast(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE), 2) AS delta,
       round(cast(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE)
             / cast(lag(rev) OVER (ORDER BY month) AS DOUBLE), 4) AS pct_change
FROM monthly
ORDER BY month
"""

ORACLE_SQL["q255_share_excl_self"] = """
WITH per_supp AS (
  SELECT s.s_nationkey, s.s_suppkey,
         sum(cast(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, s.s_suppkey
)
, shares AS (
  SELECT cast(s_nationkey AS BIGINT) AS nation,
         cast(s_suppkey AS BIGINT) AS supplier,
         cast(rev AS DOUBLE) AS revenue,
         sum(rev) OVER (PARTITION BY s_nationkey) - rev AS rest
  FROM per_supp
)
SELECT nation, supplier, revenue,
       round(revenue / cast(rest AS DOUBLE), 6) AS share_vs_rest
FROM shares
WHERE rest > 0
ORDER BY share_vs_rest DESC, nation, supplier
LIMIT 25
"""

ORACLE_SQL["q256_readability"] = """
WITH per_doc AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z]+')) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS v
  FROM documents
),
agg AS (
  SELECT source,
         cast(sum(w) AS BIGINT) AS total_words,
         cast(sum(s) AS BIGINT) AS total_sentences,
         cast(sum(v) AS BIGINT) AS total_syllables,
         cast(count(*) AS BIGINT) AS n_docs
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, total_words,
       round(206.835
             - 1.015 * (total_words / total_sentences)
             - 84.6 * (total_syllables / total_words), 3) AS flesch_score
FROM agg
ORDER BY source
"""

ORACLE_SQL["q257_hash_battery"] = """
WITH h AS (
  SELECT substring(md5(c_name), 1, 1) AS md5_nibble,
         substring(sha256(c_name), 1, 8) AS sha_prefix
  FROM customer
)
SELECT md5_nibble,
       cast(count(*) AS BIGINT) AS n,
       min(sha_prefix) AS min_sha_prefix,
       max(sha_prefix) AS max_sha_prefix
FROM h
GROUP BY md5_nibble
ORDER BY md5_nibble
"""

ORACLE_SQL["q258_key_gaps"] = """
WITH k AS (
  SELECT o_orderkey AS k,
         lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
  FROM orders
  WHERE o_orderstatus = 'F'
)
SELECT cast(k + 1 AS BIGINT) AS gap_start,
       cast(nxt - 1 AS BIGINT) AS gap_end,
       cast(nxt - k - 1 AS BIGINT) AS gap_len
FROM k
WHERE nxt > k + 1
ORDER BY gap_start
LIMIT 20
"""

ORACLE_SQL["q259_dow_hour_heatmap"] = """
SELECT cast(isodow(ts) AS BIGINT) AS isodow,
       cast(hour(ts) AS BIGINT) AS hour,
       cast(count(*) AS BIGINT) AS n,
       round(sum(value) / count(*), 3) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY isodow, hour
"""

ORACLE_SQL["q260_weighted_median"] = """
WITH rows_ AS (
  SELECT l_returnflag,
         l_extendedprice / l_quantity AS unit_price,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice / l_quantity,
                                        l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
  FROM lineitem
)
SELECT l_returnflag,
       round(min(unit_price), 4) AS weighted_median_price
FROM rows_
WHERE 2 * cumw >= totw
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE_SQL["q261_gini_concentration"] = """
WITH rev AS (
  SELECT s.s_nationkey, s.s_suppkey,
         sum(cast(l_extendedprice AS DECIMAL(18,2))) AS x
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, s.s_suppkey
),
ranked AS (
  SELECT s_nationkey, x,
         row_number() OVER (PARTITION BY s_nationkey
                            ORDER BY x, s_suppkey) AS i
  FROM rev
)
SELECT cast(s_nationkey AS BIGINT) AS nation,
       cast(count(*) AS BIGINT) AS n_suppliers,
       round(2 * cast(sum(i * x) AS DOUBLE)
               / (count(*) * cast(sum(x) AS DOUBLE))
             - (count(*) + 1) / cast(count(*) AS DOUBLE), 6) AS gini
FROM ranked
GROUP BY s_nationkey
ORDER BY nation
"""

ORACLE_SQL["q262_pareto_80"] = """
WITH rev AS (
  SELECT s.s_nationkey, s.s_suppkey,
         sum(cast(l_extendedprice AS DECIMAL(18,2))) AS x
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, s.s_suppkey
),
ranked AS (
  SELECT s_nationkey,
         row_number() OVER (PARTITION BY s_nationkey
                            ORDER BY x DESC, s_suppkey) AS rn,
         sum(x) OVER (PARTITION BY s_nationkey
                      ORDER BY x DESC, s_suppkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(x) OVER (PARTITION BY s_nationkey) AS tot,
         count(*) OVER (PARTITION BY s_nationkey) AS n
  FROM rev
)
SELECT cast(s_nationkey AS BIGINT) AS nation,
       cast(min(rn) AS BIGINT) AS suppliers_to_80pct,
       cast(any_value(n) AS BIGINT) AS n_suppliers,
       round(min(rn) / cast(any_value(n) AS DOUBLE), 4) AS concentration
FROM ranked
WHERE 5 * cum >= 4 * tot
GROUP BY s_nationkey
ORDER BY nation
"""

ORACLE_SQL["q263_autocorr_lag1"] = """
WITH daily AS (
  SELECT o_orderdate AS d,
         cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY o_orderdate
),
pairs AS (
  SELECT rev, lag(rev) OVER (ORDER BY d) AS prev FROM daily
)
SELECT round(corr(rev, prev), 4) AS lag1_autocorr,
       cast(count(*) AS BIGINT) AS n_days
FROM pairs
WHERE prev IS NOT NULL
"""

ORACLE_SQL["q264_seasonal_index"] = """
WITH daily AS (
  SELECT o_orderdate AS d,
         sum(cast(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_orderdate
),
m AS (
  SELECT month(d) AS month_of_year, sum(rev) AS msum, count(*) AS mdays
  FROM daily GROUP BY month(d)
)
SELECT cast(month_of_year AS BIGINT) AS month_of_year,
       cast(mdays AS BIGINT) AS n_days,
       round((cast(msum AS DOUBLE) / mdays)
             / (cast((SELECT sum(msum) FROM m) AS DOUBLE)
                / (SELECT sum(mdays) FROM m)), 4) AS seasonal_index
FROM m
ORDER BY month_of_year
"""

ORACLE_SQL["q265_rfm_segments"] = """
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
per_cust AS (
  SELECT o_custkey,
         min(date_diff('day', o_orderdate, mx)) AS recency_d,
         count(*) AS frequency,
         sum(cast(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders, anchor
  GROUP BY o_custkey
),
scored AS (
  SELECT ntile(5) OVER (ORDER BY recency_d, o_custkey) AS r,
         ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
         ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m
  FROM per_cust
)
SELECT r::VARCHAR || f::VARCHAR || m::VARCHAR AS segment,
       cast(count(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY 1
ORDER BY n_customers DESC, segment
LIMIT 15
"""

ORACLE_SQL["q266_cusum_changepoint"] = """
WITH daily AS (
  SELECT o_orderdate AS d,
         sum(cast(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_orderdate
),
dev AS (
  SELECT d,
         cast(rev AS DOUBLE)
           - cast((SELECT sum(rev) FROM daily) AS DOUBLE)
             / (SELECT count(*) FROM daily) AS dev
  FROM daily
),
cs AS (
  SELECT d, sum(dev) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cusum
  FROM dev
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY abs(cusum) DESC, d) AS rn FROM cs
)
SELECT strftime(d, '%Y-%m-%d') AS changepoint_date,
       round(cusum, 2) AS peak_cusum
FROM ranked WHERE rn = 1
"""

ORACLE_SQL["q267_max_drawdown"] = """
WITH daily AS (
  SELECT o_orderdate AS d,
         sum(cast(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_orderdate
),
dd AS (
  SELECT d,
         (cast(max(rev) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE)
          - cast(rev AS DOUBLE))
         / cast(max(rev) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           AS drawdown
  FROM daily
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY drawdown DESC, d) AS rn FROM dd
)
SELECT strftime(d, '%Y-%m-%d') AS worst_date,
       round(drawdown, 6) AS max_drawdown
FROM ranked WHERE rn = 1
"""

ORACLE_SQL["q268_bloom_semi_prune"] = """
SELECT o_orderpriority,
       cast(count(*) AS BIGINT) AS n_orders,
       cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_SQL["q269_expectation_suite"] = """
WITH m AS (
  SELECT count(*) AS n,
         count(o_custkey) AS nn_cust,
         count(DISTINCT o_orderkey) AS uniq_key,
         sum(CASE WHEN o_totalprice > 0 AND o_totalprice < 1000000
                  THEN 1 ELSE 0 END) AS in_range,
         sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS in_set,
         sum(CASE WHEN o_orderdate <= TIMESTAMP '1998-12-31 00:00:00'
                  THEN 1 ELSE 0 END) AS fresh
  FROM orders
), u AS (
  SELECT 'completeness_custkey' AS check_name,
         CAST(nn_cust AS DOUBLE) / n AS metric FROM m
  UNION ALL SELECT 'uniqueness_orderkey', CAST(uniq_key AS DOUBLE) / n FROM m
  UNION ALL SELECT 'range_totalprice', CAST(in_range AS DOUBLE) / n FROM m
  UNION ALL SELECT 'set_orderstatus', CAST(in_set AS DOUBLE) / n FROM m
  UNION ALL SELECT 'freshness_orderdate', CAST(fresh AS DOUBLE) / n FROM m
)
SELECT check_name, round(metric, 6) AS metric,
       round(metric, 6) >= 1.0 AS passed
FROM u ORDER BY check_name
"""

ORACLE_SQL["q270_setsim_prefix_join"] = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, len(words) - 2),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
  FROM w WHERE len(words) >= 3
), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
isect AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b,
       round(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
FROM isect JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7
ORDER BY doc_a, doc_b
"""

ORACLE_SQL["q271_tfidf_cosine_topk"] = """
WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM docs
), t2 AS (SELECT * FROM toks WHERE token <> ''),
tf AS (SELECT doc_id, token, count(*) AS cnt FROM t2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doc_len FROM t2 GROUP BY 1),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM t2 GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
post AS (
  SELECT tf.doc_id, tf.token,
         CAST(round((cnt * 1.0 / doc_len)
              * ln((n_docs + 1.0) / (df + 1.0)) * 1000000.0) AS BIGINT) AS w
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (token) CROSS JOIN n
  WHERE df <= 0.6 * n_docs
), norms AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM post GROUP BY 1
), dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db, sum(a.w * b.w) AS dot
  FROM post a JOIN post b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sims AS (
  SELECT da, db, dot / (na.nrm * nb.nrm) AS sim
  FROM dots JOIN norms na ON na.doc_id = da JOIN norms nb ON nb.doc_id = db
), sym AS (
  SELECT da AS doc_id, db AS nbr, sim FROM sims
  UNION ALL
  SELECT db AS doc_id, da AS nbr, sim FROM sims
), ranked AS (
  SELECT doc_id, nbr, sim,
         row_number() OVER (PARTITION BY doc_id ORDER BY sim DESC, nbr) AS rn
  FROM sym
)
SELECT doc_id, nbr, round(sim, 6) AS sim, rn
FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn
"""

ORACLE_SQL["q272_kmv_sketch"] = """
WITH hashed AS (
  SELECT DISTINCT l_returnflag,
         ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM lineitem
), ranked AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM hashed
), kth AS (
  SELECT l_returnflag, count(*) AS n_hashes,
         max(CASE WHEN rn = 64 THEN h END) AS kth_hash
  FROM ranked GROUP BY 1
), exact AS (
  SELECT l_returnflag, count(DISTINCT l_suppkey) AS exact_ndv
  FROM lineitem GROUP BY 1
)
SELECT k.l_returnflag, e.exact_ndv,
       coalesce(k.kth_hash, -1) AS kth_hash,
       round(CASE WHEN k.n_hashes < 64 THEN k.n_hashes * 1.0
                  ELSE 63.0 / (k.kth_hash / 1152921504606846976.0)
             END, 2) AS est_ndv
FROM kth k JOIN exact e USING (l_returnflag)
ORDER BY l_returnflag
"""

ORACLE_SQL["q273_cdc_compaction"] = """
WITH log AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM log
)
SELECT user_id, epoch_us(ts) AS ts_us, event_id, round(value, 2) AS value
FROM ranked WHERE rn = 1 AND op = 'U'
ORDER BY user_id
"""

ORACLE_SQL["q274_seasonal_backtest"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), lagged AS (
  SELECT d, rev, lag(rev, 7) OVER (ORDER BY d) AS fcst FROM daily
), scored AS (
  SELECT d, abs(rev - fcst)::DOUBLE / rev::DOUBLE AS ape
  FROM lagged WHERE fcst IS NOT NULL
)
SELECT strftime(d, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n_days,
       round(round(sum(ape), 6) / count(*), 6) AS mape
FROM scored GROUP BY 1 ORDER BY month
"""

ORACLE_SQL["q275_triangle_count"] = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS s
  FROM op x JOIN op y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
), edges AS (
  SELECT a, b FROM pairs WHERE s >= 2
), tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b
), nodes AS (
  SELECT unnest([a, b, c]) AS node FROM tri
)
SELECT CAST(count(*) / 3 AS BIGINT) AS n_triangles,
       CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
FROM nodes
"""

ORACLE_SQL["q276_media_resize"] = """
SELECT doc_id AS media_id,
       CAST((doc_id % 8 + 1) * 4 AS INTEGER) AS orig_w,
       CAST((doc_id % 6 + 1) * 4 AS INTEGER) AS orig_h,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(192 AS BIGINT) AS payload_bytes
FROM documents WHERE doc_id < 200
ORDER BY media_id
"""

ORACLE_SQL["q277_audio_features"] = """
WITH c AS (
  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS clean
  FROM documents WHERE doc_id < 200
), c2 AS (SELECT * FROM c WHERE length(clean) >= 2),
chars AS (
  SELECT doc_id, unnest(generate_series(1, length(clean))) AS i, clean
  FROM c2
), samples AS (
  SELECT doc_id, i,
         (unicode(substr(clean, i, 1)) - 64) * 256 AS s
  FROM chars
), sb AS (
  SELECT doc_id, i, s,
         CASE WHEN s < 0 THEN 1 ELSE 0 END AS neg
  FROM samples
), zc AS (
  SELECT doc_id, i, s, neg,
         abs(neg - lag(neg) OVER (PARTITION BY doc_id ORDER BY i)) AS flip
  FROM sb
)
SELECT doc_id AS media_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       round(sqrt(avg(pow(s / 32768.0, 2))), 6) AS rms,
       round(coalesce(avg(flip), 0), 6) AS zcr,
       CAST(max(abs(s)) AS INTEGER) AS peak
FROM zc GROUP BY doc_id
ORDER BY media_id
"""

ORACLE_SQL["q279_lexical_richness"] = """
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
), t2 AS (SELECT * FROM tok WHERE token <> ''),
per_tok AS (
  SELECT source, token, count(*) AS cnt, sum(length(token)) AS len_sum
  FROM t2 GROUP BY 1, 2
)
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(count(*) AS DOUBLE) / sum(cnt), 6) AS ttr,
       round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_ratio,
       round(CAST(sum(len_sum) AS DOUBLE) / sum(cnt), 6) AS mean_tok_len
FROM per_tok GROUP BY source ORDER BY source
"""

ORACLE_SQL["q280_bigram_lm_ce"] = """
WITH ws AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS w
  FROM documents
), ws2 AS (SELECT * FROM ws WHERE len(w) >= 2),
big AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(w) - 1),
                i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS bg
  FROM ws2
), big2 AS (
  SELECT doc_id, source, bg.w1 AS w1, bg.w2 AS w2 FROM big
), train AS (SELECT * FROM big2 WHERE doc_id % 10 <> 0),
held AS (SELECT * FROM big2 WHERE doc_id % 10 = 0),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM train GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY 1),
vocab AS (SELECT count(DISTINCT w2) AS v FROM train),
scored AS (
  SELECT h.source,
         -ln((coalesce(c2.c2, 0) + 1.0)
             / (coalesce(c1.c1, 0) + vocab.v)) AS nll
  FROM held h
  LEFT JOIN c2 ON h.w1 = c2.w1 AND h.w2 = c2.w2
  LEFT JOIN c1 ON h.w1 = c1.w1
  CROSS JOIN vocab
)
SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(round(sum(nll), 6) / count(*), 6) AS ce
FROM scored GROUP BY source ORDER BY source
"""

ORACLE_SQL["q281_cuped_adjustment"] = """
WITH per_user AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN value ELSE 0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                  THEN value ELSE 0 END) AS y,
         CAST(user_id % 2 AS INTEGER) AS arm
  FROM events GROUP BY user_id
), mom AS (
  SELECT avg(x) AS mx, covar_pop(x, y) AS cxy, var_pop(x) AS vx
  FROM per_user
), adj AS (
  SELECT arm, y, y - (cxy / vx) * (x - mx) AS y_adj
  FROM per_user CROSS JOIN mom
)
SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
       round(round(sum(y), 6) / count(*), 6) AS mean_raw,
       round(round(sum(y_adj), 6) / count(*), 6) AS mean_cuped
FROM adj GROUP BY arm ORDER BY arm
"""

ORACLE_SQL["q282_cohort_ltv"] = """
WITH first AS (
  SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
  FROM orders GROUP BY 1
), aged AS (
  SELECT strftime(f.cohort, '%Y-%m') AS cohort_month,
         CAST(datediff('month', f.cohort,
                       date_trunc('month', o.o_orderdate)) AS INTEGER) AS age,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
  WHERE datediff('month', f.cohort, date_trunc('month', o.o_orderdate)) <= 5
), grid AS (
  SELECT cohort_month, age, sum(p) AS rev FROM aged GROUP BY 1, 2
)
SELECT cohort_month, age,
       CAST(rev AS DOUBLE) AS rev,
       CAST(sum(rev) OVER (PARTITION BY cohort_month ORDER BY age
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
FROM grid ORDER BY cohort_month, age
"""

ORACLE_SQL["q283_consistent_sampling"] = """
WITH flagged AS (
  SELECT doc_id,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000)
           AS bucket
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN bucket < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_2pct,
       CAST(sum(CASE WHEN bucket < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_5pct,
       CAST(sum(CASE WHEN bucket < 20 AND bucket >= 50 THEN 1 ELSE 0 END)
            AS BIGINT) AS subset_violations
FROM flagged
"""

ORACLE_SQL["q284_partition_checksum"] = """
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_rows,
       bit_xor(('0x' || substr(md5(
           CAST(o_orderkey AS VARCHAR) || '|' ||
           CAST(o_custkey AS VARCHAR) || '|' ||
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
           o_orderstatus), 1, 15))::BIGINT) AS xor_fp
FROM orders
GROUP BY 1 ORDER BY day
"""

ORACLE_SQL["q285_catalog_audit"] = """
WITH u AS (
  SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(2 AS BIGINT) AS n_cols,
         CAST(count(DISTINCT r_regionkey) AS BIGINT) AS n_keys FROM region
  UNION ALL
  SELECT 'nation', count(*), 3, count(DISTINCT n_nationkey) FROM nation
  UNION ALL
  SELECT 'customer', count(*), 5, count(DISTINCT c_custkey) FROM customer
  UNION ALL
  SELECT 'supplier', count(*), 4, count(DISTINCT s_suppkey) FROM supplier
  UNION ALL
  SELECT 'part', count(*), 6, count(DISTINCT p_partkey) FROM part
  UNION ALL
  SELECT 'orders', count(*), 6, count(DISTINCT o_orderkey) FROM orders
)
SELECT table_name, n_rows, n_cols, n_keys, n_rows = n_keys AS key_unique
FROM u ORDER BY table_name
"""

ORACLE_SQL["q286_incremental_rollup"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
            / count(*) AS avg_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_SQL["q287_kmv_set_ops"] = """
WITH pop AS (
  SELECT l_returnflag, l_suppkey,
         ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM lineitem WHERE l_returnflag IN ('A', 'R')
), ka AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM pop WHERE l_returnflag = 'A')
  ) WHERE rn <= 64
), kr AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM pop WHERE l_returnflag = 'R')
  ) WHERE rn <= 64
), ku AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT h FROM ka UNION SELECT h FROM kr)
  ) WHERE rn <= 64
), ests AS (
  SELECT (SELECT 63.0 / (max(h) / 1152921504606846976.0) FROM ka) AS est_a,
         (SELECT 63.0 / (max(h) / 1152921504606846976.0) FROM kr) AS est_r,
         (SELECT 63.0 / (max(h) / 1152921504606846976.0) FROM ku) AS est_union
), exact AS (
  SELECT count(DISTINCT l_suppkey) AS exact_union,
         count(DISTINCT CASE WHEN l_returnflag = 'A' THEN l_suppkey END) AS exact_a,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS exact_r
  FROM pop
)
SELECT CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_r AS BIGINT) AS exact_r,
       CAST(exact_union AS BIGINT) AS exact_union,
       round(est_a, 2) AS est_a,
       round(est_r, 2) AS est_r,
       round(est_union, 2) AS est_union,
       round(est_a + est_r - est_union, 2) AS est_intersection
FROM exact CROSS JOIN ests
"""

ORACLE_SQL["q289_max_concurrency"] = """
WITH iv AS (
  SELECT ts AS start, ts + INTERVAL 5 MINUTE AS "end"
  FROM events
  WHERE CAST(ts AS DATE) = CAST(ts + INTERVAL 5 MINUTE AS DATE)
), points AS (
  SELECT start AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT "end" AS t, -1 AS delta FROM iv
), running AS (
  SELECT CAST(t AS DATE) AS d,
         sum(delta) OVER (PARTITION BY CAST(t AS DATE)
                          ORDER BY t, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM points
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM running GROUP BY d ORDER BY day
"""

ORACLE_SQL["q290_padding_waste"] = """
WITH toks AS (
  SELECT doc_id,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok
  FROM documents
), t2 AS (SELECT doc_id, n_tok FROM toks WHERE n_tok > 0),
binned AS (
  SELECT doc_id, n_tok,
         CAST(pow(2.0, ceil(log2(n_tok))) AS BIGINT) AS bin
  FROM t2
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_tok) AS BIGINT) AS max_len,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(count(*) * bin - sum(n_tok) AS BIGINT) AS padding_waste,
       round((count(*) * bin - sum(n_tok)) * 1.0
             / (count(*) * bin) * 100, 4) AS waste_pct
FROM binned GROUP BY bin ORDER BY bin
"""

ORACLE_SQL["q291_dataset_card"] = """
WITH base AS (
  SELECT doc_id, lang, source, length(text) AS n_chars, md5(text) AS fp
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_texts,
       round((count(*) - count(DISTINCT fp)) * 1.0 / count(*) * 100, 4)
         AS dup_pct,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       round(median(n_chars), 2) AS median_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       round(CAST(round(sum(CAST(n_chars AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*), 2) AS mean_chars
FROM base
"""

ORACLE_SQL["q292_seasonal_decompose"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), win AS (
  SELECT d, rev,
         count(*) OVER w AS n_win,
         round(sum(rev) OVER w, 6) / count(*) OVER w AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dec AS (
  SELECT rev - trend AS detrended,
         CAST(isodow(d) AS INTEGER) AS dow
  FROM win WHERE n_win = 7
)
SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
       round(round(sum(detrended), 6) / count(*), 2) AS seasonal,
       round(stddev_samp(detrended), 2) AS resid_sd
FROM dec GROUP BY dow ORDER BY dow
"""

ORACLE_SQL["q293_fulfillment_sla"] = """
WITH last_ship AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY 1
), lat AS (
  SELECT o.o_orderpriority,
         datediff('day', CAST(o.o_orderdate AS DATE), ls.last_ship) AS lat_days
  FROM orders o JOIN last_ship ls ON o.o_orderkey = ls.l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(quantile_cont(lat_days, 0.5), 2) AS p50,
       round(quantile_cont(lat_days, 0.9), 2) AS p90,
       CAST(max(lat_days) AS BIGINT) AS max_days,
       round(sum(CASE WHEN lat_days <= 60 THEN 1 ELSE 0 END) * 1.0
             / count(*) * 100, 4) AS within_60d_pct
FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLE_SQL["q294_mahalanobis_outliers"] = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_totalprice AS price,
         CAST(count(*) AS DOUBLE) AS n_items,
         CAST(sum(l.l_quantity) AS DOUBLE) AS qty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
), mom AS (
  SELECT avg(price) AS mp, var_pop(price) AS vp,
         avg(n_items) AS mi, var_pop(n_items) AS vi,
         avg(qty) AS mq, var_pop(qty) AS vq
  FROM per_order
)
SELECT o_orderkey,
       round(sqrt(pow(price - mp, 2) / vp
                + pow(n_items - mi, 2) / vi
                + pow(qty - mq, 2) / vq), 6) AS mdist
FROM per_order CROSS JOIN mom
ORDER BY mdist DESC, o_orderkey
LIMIT 20
"""

ORACLE_SQL["q295_sprt_monitor"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events WHERE user_id % 2 = 1
  GROUP BY 1
), scored AS (
  SELECT d, n, conv,
         conv * ln(0.25 / 0.20)
           + (n - conv) * ln(0.75 / 0.80) AS llr_day
  FROM daily
), cum AS (
  SELECT d, n, conv,
         round(sum(llr_day) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING), 6)
           AS llr
  FROM scored
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n, CAST(conv AS BIGINT) AS conv, llr,
       CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
            WHEN llr <= -ln(19.0) THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum ORDER BY day
"""

ORACLE_SQL["q296_record_linkage"] = """
WITH cust AS (
  SELECT c_custkey, c_nationkey,
         regexp_extract(c_name, '([0-9]+)', 1) AS c_digits,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS c_band
  FROM customer
), supp AS (
  SELECT s_suppkey, s_nationkey,
         regexp_extract(s_name, '([0-9]+)', 1) AS s_digits,
         CAST(floor(s_acctbal / 1000) AS BIGINT) AS s_band
  FROM supplier
), pairs AS (
  SELECT c_custkey, s_suppkey,
         (CASE WHEN right(lpad(c_digits, 2, '0'), 2)
                  = right(lpad(s_digits, 2, '0'), 2)
               THEN 2.0 ELSE -0.5 END
          + CASE WHEN c_band = s_band THEN 1.5 ELSE -0.3 END) AS score
  FROM cust JOIN supp ON c_nationkey = s_nationkey
)
SELECT c_custkey, s_suppkey, round(score, 1) AS score
FROM pairs WHERE score >= 3.0
ORDER BY c_custkey, s_suppkey
"""

ORACLE_SQL["q297_rolling_kmv_distinct"] = """
WITH day_hash AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
), days AS (
  SELECT DISTINCT d FROM day_hash
), eligible AS (
  SELECT d FROM (
    SELECT d, row_number() OVER (ORDER BY d) AS rn FROM days
  ) WHERE rn >= 7
), win AS (
  SELECT e.d, dh.h
  FROM eligible e
  JOIN day_hash dh
    ON dh.d BETWEEN e.d - INTERVAL 6 DAY AND e.d
  GROUP BY e.d, dh.h
), ranked AS (
  SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rn
  FROM win
), kth AS (
  SELECT d, count(*) FILTER (rn <= 64) AS state_size,
         count(*) AS n_hashes,
         max(CASE WHEN rn = 64 THEN h END) AS kth_hash
  FROM ranked GROUP BY d
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(state_size AS BIGINT) AS state_size,
       round(CASE WHEN n_hashes < 64 THEN n_hashes * 1.0
                  ELSE 63.0 / (kth_hash / 1152921504606846976.0) END, 2)
         AS est_users_7d
FROM kth ORDER BY day
"""

ORACLE_SQL["q298_abc_classification"] = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)) AS rev
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(rev) AS tot FROM per_part),
classed AS (
  SELECT rev, tot,
         CASE WHEN sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) * 100 <= tot * 80
              THEN 'A'
              WHEN sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) * 100 <= tot * 95
              THEN 'B' ELSE 'C' END AS cls
  FROM per_part CROSS JOIN tot
)
SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(rev) AS DOUBLE) / max(tot) * 100, 4) AS rev_share_pct,
       (CAST(sum(rev) AS DOUBLE) / 10000) / count(*) AS avg_rev
FROM classed GROUP BY cls ORDER BY cls
"""

ORACLE_SQL["q299_histogram_quantile"] = """
WITH rng AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
), binned AS (
  SELECT o_orderpriority, lo, hi,
         CAST(least(99, floor((o_totalprice - lo) / (hi - lo) * 100))
              AS BIGINT) AS bin
  FROM orders CROSS JOIN rng
), hist AS (
  SELECT o_orderpriority, bin, lo, hi, count(*) AS c
  FROM binned GROUP BY 1, 2, 3, 4
), interp AS (
  SELECT o_orderpriority, bin, lo, hi, c,
         sum(c) OVER (PARTITION BY o_orderpriority ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY o_orderpriority) AS tot
  FROM hist
), med AS (
  SELECT o_orderpriority,
         lo + (bin + (tot * CAST(0.5 AS DOUBLE) - (cum - c)) / c)
              * ((hi - lo) / 100) AS est_median
  FROM interp
  WHERE (cum - c) < tot * CAST(0.5 AS DOUBLE)
    AND cum >= tot * CAST(0.5 AS DOUBLE)
), exact AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.5) AS exact_median
  FROM orders GROUP BY 1
)
SELECT m.o_orderpriority,
       floor(m.est_median * 100 + 0.5) / 100 AS est_median,
       floor(e.exact_median * 100 + 0.5) / 100 AS exact_median,
       floor(abs(m.est_median - e.exact_median) / e.exact_median * 100
             * 10000 + 0.5) / 10000 AS err_pct
FROM med m JOIN exact e USING (o_orderpriority)
ORDER BY o_orderpriority
"""

ORACLE_SQL["q300_one_big_table"] = """
WITH wide AS (
  SELECT l.l_orderkey, l.l_linenumber, c.c_name, n.n_name, r.r_name,
         s.s_name, p.p_name, o.o_orderpriority
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT r_name) AS BIGINT) AS n_regions,
       CAST(sum(CASE WHEN c_name IS NULL OR s_name IS NULL OR p_name IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS null_dim_rows,
       bit_xor(('0x' || substr(md5(
           CAST(l_orderkey AS VARCHAR) || '|' ||
           CAST(l_linenumber AS VARCHAR) || '|' ||
           c_name || '|' || n_name || '|' || r_name || '|' ||
           s_name || '|' || p_name || '|' || o_orderpriority
       ), 1, 15))::BIGINT) AS xor_fp
FROM wide
"""

ORACLE_SQL["q301_purge_audit"] = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), to_delete AS (
  SELECT user_id FROM ranked WHERE rn = 1 AND event_type = 'error'
), kept AS (
  SELECT * FROM events WHERE user_id NOT IN (SELECT user_id FROM to_delete)
), purged AS (
  SELECT * FROM events WHERE user_id IN (SELECT user_id FROM to_delete)
), daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS purged_rows
  FROM purged GROUP BY 1
), totals AS (
  SELECT (SELECT count(*) FROM kept) AS kept_rows,
         (SELECT count(DISTINCT user_id) FROM kept) AS kept_users,
         (SELECT count(*) FROM kept
          WHERE user_id IN (SELECT user_id FROM to_delete)) AS leaked_rows,
         (SELECT count(*) FROM to_delete) AS deleted_users
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(purged_rows AS BIGINT) AS purged_rows,
       CAST(kept_rows AS BIGINT) AS kept_rows,
       CAST(kept_users AS BIGINT) AS kept_users,
       CAST(deleted_users AS BIGINT) AS deleted_users,
       CAST(leaked_rows AS BIGINT) AS leaked_rows
FROM daily CROSS JOIN totals ORDER BY day
"""

ORACLE_SQL["q302_ewma_alerts"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), hist AS (
  SELECT d, rev,
         list(rev) OVER (ORDER BY d
                         ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS h
  FROM daily
), scored AS (
  SELECT d, rev, len(h) AS n,
         round(
           list_sum(list_transform(generate_series(1, len(h)),
                    i -> h[i] * pow(0.8, len(h) - i)))
           / list_sum(list_transform(generate_series(1, len(h)),
                      i -> pow(0.8, len(h) - i))), 6) AS ewma
  FROM hist WHERE len(h) >= 7
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       round(rev, 2) AS rev,
       round(ewma, 2) AS ewma,
       round((rev - ewma) / ewma * 100, 4) AS dev_pct,
       abs(round((rev - ewma) / ewma * 100, 4)) > 25.0 AS alert
FROM scored ORDER BY day
"""

ORACLE_SQL["q303_business_day_sla"] = """
WITH promised AS (
  SELECT o_orderkey, o_orderpriority,
         CASE isodow(CAST(o_orderdate AS DATE))
           WHEN 6 THEN CAST(o_orderdate AS DATE) + 2
           WHEN 7 THEN CAST(o_orderdate AS DATE) + 1
           ELSE CAST(o_orderdate AS DATE) END + 7 AS promised
  FROM orders
), last_ship AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY 1
), scored AS (
  SELECT p.o_orderpriority, p.promised, ls.last_ship
  FROM promised p JOIN last_ship ls ON p.o_orderkey = ls.l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN last_ship <= promised THEN 1 ELSE 0 END)
            AS BIGINT) AS on_time,
       round(sum(CASE WHEN last_ship <= promised THEN 1 ELSE 0 END) * 1.0
             / count(*) * 100, 4) AS on_time_pct
FROM scored GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLE_SQL["q304_embedding_drift"] = """
WITH comp AS (
  SELECT label, vec_id % 2 AS half,
         unnest(embedding) AS x,
         generate_subscripts(embedding, 1) - 1 AS pos
  FROM embeddings
), cent AS (
  SELECT label, half, pos,
         round(sum(CAST(x AS DOUBLE)), 6) / count(*) AS c
  FROM comp GROUP BY 1, 2, 3
), a AS (SELECT label, pos, c AS ca FROM cent WHERE half = 0),
b AS (SELECT label, pos, c AS cb FROM cent WHERE half = 1)
SELECT label,
       round(sum(ca * cb) / (sqrt(sum(ca * ca)) * sqrt(sum(cb * cb))), 6)
         AS centroid_cosine,
       round(sqrt(sum(ca * ca)) / sqrt(sum(cb * cb)), 6) AS norm_ratio
FROM a JOIN b USING (label, pos)
GROUP BY label ORDER BY label
"""

ORACLE_SQL["q305_zipf_audit"] = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
), freq AS (
  SELECT token, count(*) AS f FROM toks WHERE token <> '' GROUP BY 1
), ranked AS (
  SELECT ln(row_number() OVER (ORDER BY f DESC, token)) AS lx,
         ln(f) AS ly
  FROM freq
)
SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       round(regr_slope(ly, lx), 6) AS zipf_slope,
       round(regr_r2(ly, lx), 6) AS r2
FROM ranked
"""

ORACLE_SQL["q306_repeat_buyers"] = """
WITH cq AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 4 + (quarter(o_orderdate) - 1) AS qi
  FROM orders
), islands AS (
  SELECT o_custkey, qi,
         qi - row_number() OVER (PARTITION BY o_custkey ORDER BY qi) AS grp
  FROM cq
), streaks AS (
  SELECT o_custkey, grp, count(*) AS len,
         min(qi) AS q_from, max(qi) AS q_to
  FROM islands GROUP BY 1, 2
), best AS (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY len DESC, q_from) AS rn
  FROM streaks
)
SELECT o_custkey,
       CAST(len AS BIGINT) AS streak_quarters,
       CAST(q_from AS BIGINT) AS q_from,
       CAST(q_to AS BIGINT) AS q_to
FROM best WHERE rn = 1 AND len >= 3
ORDER BY o_custkey
"""

ORACLE_SQL["q307_new_vs_returning"] = """
WITH first AS (
  SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS first_m
  FROM orders GROUP BY 1
), classed AS (
  SELECT o.*, date_trunc('month', o.o_orderdate) = f.first_m AS is_new
  FROM orders o JOIN first f USING (o_custkey)
), agg AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         sum(CASE WHEN is_new
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS new_rev_d,
         sum(CASE WHEN NOT is_new
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS ret_rev_d,
         count(DISTINCT CASE WHEN is_new THEN o_custkey END) AS new_customers
  FROM classed GROUP BY 1
)
SELECT month,
       CAST(coalesce(new_rev_d, 0) AS DOUBLE) AS new_rev,
       CAST(coalesce(ret_rev_d, 0) AS DOUBLE) AS ret_rev,
       CAST(new_customers AS BIGINT) AS new_customers,
       round(CAST(coalesce(new_rev_d, 0) AS DOUBLE) * 100
             / CAST(coalesce(new_rev_d, 0) + coalesce(ret_rev_d, 0) AS DOUBLE),
             4) AS new_share_pct
FROM agg ORDER BY month
"""

ORACLE_SQL["q308_basket_poisson"] = """
WITH sizes AS (
  SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1
), mom AS (
  SELECT count(*) AS n,
         round(sum(k), 6) / count(*) AS lam
  FROM sizes
), dist AS (
  SELECT k, count(*) AS obs FROM sizes GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(obs AS BIGINT) AS obs,
       round(n * exp(-lam) * pow(lam, k) / factorial(CAST(k AS INTEGER)), 4)
         AS expected,
       round(obs - round(n * exp(-lam) * pow(lam, k)
             / factorial(CAST(k AS INTEGER)), 4), 4) AS excess
FROM dist CROSS JOIN mom ORDER BY k
"""

ORACLE_SQL["q309_price_anomaly_iqr"] = """
WITH q AS (
  SELECT p_brand,
         quantile_cont(p_retailprice, 0.25) AS q1,
         quantile_cont(p_retailprice, 0.75) AS q3
  FROM part GROUP BY 1
)
SELECT p.p_partkey, p.p_brand,
       round(p.p_retailprice, 2) AS price,
       round(q.q1, 4) AS q1, round(q.q3, 4) AS q3
FROM part p JOIN q USING (p_brand)
WHERE p.p_retailprice < q.q1 - 1.5 * (q.q3 - q.q1)
   OR p.p_retailprice > q.q3 + 1.5 * (q.q3 - q.q1)
ORDER BY p_partkey
"""

ORACLE_SQL["q310_waterfall_allocation"] = """
WITH o2 AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderpriority = '1-URGENT'
), alloc AS (
  SELECT o_orderkey, d, price,
         coalesce(sum(price) OVER (ORDER BY d, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS prior
  FROM o2
)
SELECT o_orderkey,
       CAST(price AS DOUBLE) AS price,
       CAST(greatest(0, least(price, 10000000 - prior)) AS DOUBLE)
         AS allocated,
       greatest(0, least(price, 10000000 - prior)) < price AS partial
FROM alloc
WHERE greatest(0, least(price, 10000000 - prior)) > 0
ORDER BY d, o_orderkey
"""

ORACLE_SQL["q311_duplicate_payments"] = """
SELECT a.o_custkey,
       a.o_orderkey AS order_a,
       b.o_orderkey AS order_b,
       CAST(CAST(a.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       CAST(abs(datediff('day', CAST(b.o_orderdate AS DATE),
                CAST(a.o_orderdate AS DATE))) AS BIGINT) AS gap_days
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND CAST(a.o_totalprice AS DECIMAL(18,2)) = CAST(b.o_totalprice AS DECIMAL(18,2))
 AND a.o_orderkey < b.o_orderkey
WHERE abs(datediff('day', CAST(b.o_orderdate AS DATE),
          CAST(a.o_orderdate AS DATE))) <= 3
ORDER BY a.o_custkey, order_a, order_b
"""

ORACLE_SQL["q312_ar_aging"] = """
WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
aged AS (
  SELECT o_orderpriority, o_totalprice,
         datediff('day', CAST(o_orderdate AS DATE), anchor) AS age
  FROM orders CROSS JOIN anchor
  WHERE o_orderstatus = 'O'
)
SELECT o_orderpriority,
       CASE WHEN age <= 30 THEN '0-30'
            WHEN age <= 60 THEN '31-60'
            WHEN age <= 90 THEN '61-90'
            ELSE '90+' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS outstanding
FROM aged GROUP BY 1, 2 ORDER BY o_orderpriority, bucket
"""

ORACLE_SQL["q313_purchase_rhythm"] = """
WITH gaps AS (
  SELECT o_custkey,
         datediff('day',
           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders
), g2 AS (SELECT * FROM gaps WHERE gap IS NOT NULL),
per_cust AS (
  SELECT o_custkey, count(*) AS n_gaps,
         round(sum(gap), 6) / count(*) AS mean_gap,
         stddev_pop(gap) AS sd_gap
  FROM g2 GROUP BY 1 HAVING count(*) >= 5
), seg AS (
  SELECT *, round(sd_gap / mean_gap, 6) AS cv,
         CASE WHEN round(sd_gap / mean_gap, 6) < 0.6
              THEN 'regular' ELSE 'irregular' END AS segment
  FROM per_cust
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
       round(round(sum(mean_gap), 6) / count(*), 4) AS avg_mean_gap,
       round(round(sum(cv), 6) / count(*), 4) AS avg_cv
FROM seg GROUP BY segment ORDER BY segment
"""

ORACLE_SQL["q314_supplier_leadtime"] = """
WITH lag_t AS (
  SELECT l.l_suppkey,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS lead
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), stats AS (
  SELECT l_suppkey, count(*) AS n,
         round(sum(lead), 6) / count(*) AS mean_lead,
         quantile_cont(lead, 0.9) AS p90_lead,
         sqrt((sum(lead * lead) - sum(lead) * sum(lead) / count(*))
              / (count(*) - 1)) AS sd_lead
  FROM lag_t GROUP BY 1 HAVING count(*) >= 20
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY sd_lead ASC, l_suppkey)
           AS consistency_rank
  FROM stats
)
SELECT consistency_rank, l_suppkey, CAST(n AS BIGINT) AS n,
       round(mean_lead, 4) AS mean_lead,
       round(p90_lead, 2) AS p90_lead,
       round(sd_lead, 4) AS sd_lead
FROM ranked WHERE consistency_rank <= 15
ORDER BY consistency_rank
"""

ORACLE_SQL["q315_return_rate_wilson"] = """
WITH base AS (
  SELECT p.p_brand, count(*) AS n,
         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT p_brand, CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_returned,
       round(r * 1.0 / n, 6) AS raw_rate,
       round(((r * 1.0 / n) + 1.96 * 1.96 / (2 * n)
              - 1.96 * sqrt(((r * 1.0 / n) * (1 - r * 1.0 / n)
                             + 1.96 * 1.96 / (4 * n)) / n))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_lo,
       round(((r * 1.0 / n) + 1.96 * 1.96 / (2 * n)
              + 1.96 * sqrt(((r * 1.0 / n) * (1 - r * 1.0 / n)
                             + 1.96 * 1.96 / (4 * n)) / n))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_hi
FROM base ORDER BY p_brand
"""

ORACLE_SQL["q316_discount_response"] = """
WITH banded AS (
  SELECT l_returnflag,
         CAST(floor(l_discount * 100 / 2) AS BIGINT) * 2 AS band,
         l_quantity
  FROM lineitem
), grid AS (
  SELECT l_returnflag, band, count(*) AS n,
         round(sum(l_quantity), 6) / count(*) AS avg_qty
  FROM banded GROUP BY 1, 2
)
SELECT l_returnflag, band, CAST(n AS BIGINT) AS n,
       round(avg_qty, 4) AS avg_qty,
       round(avg_qty - lag(avg_qty) OVER (PARTITION BY l_returnflag
                                          ORDER BY band), 4)
         AS delta_vs_prev_band
FROM grid ORDER BY l_returnflag, band
"""

ORACLE_SQL["q317_dead_stock"] = """
WITH anchor AS (SELECT max(CAST(l_shipdate AS DATE)) AS anchor FROM lineitem),
last_sale AS (
  SELECT l_partkey, max(CAST(l_shipdate AS DATE)) AS last_sale
  FROM lineitem GROUP BY 1
), joined AS (
  SELECT p.p_brand, p.p_retailprice, ls.last_sale,
         datediff('day', ls.last_sale, a.anchor) AS days_idle
  FROM part p
  LEFT JOIN last_sale ls ON p.p_partkey = ls.l_partkey
  CROSS JOIN anchor a
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_dead_parts,
       CAST(sum(CASE WHEN last_sale IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS never_sold,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
         AS at_risk_value
FROM joined
WHERE last_sale IS NULL OR days_idle > 90
GROUP BY p_brand ORDER BY p_brand
"""

ORACLE_SQL["q318_wallet_share"] = """
WITH mix AS (
  SELECT o.o_custkey, p.p_brand,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS spend
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), top AS (
  SELECT o_custkey, spend,
         sum(spend) OVER (PARTITION BY o_custkey) AS tot,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY spend DESC, p_brand) AS rn
  FROM mix
), t1 AS (
  SELECT o_custkey, spend * 1.0 / tot AS share FROM top WHERE rn = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       round(round(sum(share), 6) / count(*), 6) AS avg_top_share,
       CAST(sum(CASE WHEN share > 0.4 THEN 1 ELSE 0 END) AS BIGINT)
         AS loyal_over_40pct
FROM t1
"""

ORACLE_SQL["q319_linenumber_audit"] = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n, min(l_linenumber) AS mn,
         max(l_linenumber) AS mx,
         count(DISTINCT l_linenumber) AS nd
  FROM lineitem GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN mn <> 1 OR mx <> n OR nd <> n
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(max(mx) AS BIGINT) AS max_lines_per_order,
       round(round(sum(n), 6) / count(*), 4) AS avg_lines_per_order
FROM per_order
"""

ORACLE_SQL["q320_supplier_scorecard"] = """
WITH base AS (
  SELECT l.l_suppkey, count(*) AS vol,
         round(sum(datediff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE))), 6)
           / count(*) AS lead,
         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
           / count(*) AS ret
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1 HAVING count(*) >= 20
), mom AS (
  SELECT min(lead) AS lead_lo, max(lead) AS lead_hi,
         min(ret) AS ret_lo, max(ret) AS ret_hi,
         min(vol) AS vol_lo, max(vol) AS vol_hi
  FROM base
), scored AS (
  SELECT b.l_suppkey, b.vol, b.lead, b.ret,
         round(0.4 * (1 - (b.lead - m.lead_lo) / (m.lead_hi - m.lead_lo))
             + 0.4 * (1 - (b.ret - m.ret_lo) / (m.ret_hi - m.ret_lo))
             + 0.2 * ((b.vol - m.vol_lo) * 1.0 / (m.vol_hi - m.vol_lo)), 6)
           AS score
  FROM base b CROSS JOIN mom m
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, l_suppkey) AS rank
  FROM scored
)
SELECT rank, l_suppkey, CAST(vol AS BIGINT) AS vol,
       round(lead, 4) AS mean_lead,
       round(ret, 6) AS return_rate, score
FROM ranked WHERE rank <= 10 ORDER BY rank
"""

ORACLE_SQL["q321_demand_correlation"] = """
WITH top AS (
  SELECT l_partkey FROM (
    SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1
    ORDER BY n DESC, l_partkey LIMIT 10
  )
), daily AS (
  SELECT l.l_partkey, CAST(l.l_shipdate AS DATE) AS d,
         sum(l.l_quantity) AS q
  FROM lineitem l JOIN top t ON l.l_partkey = t.l_partkey
  GROUP BY 1, 2
)
SELECT a.l_partkey AS pa, b.l_partkey AS pb,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(a.q, b.q), 6) AS corr
FROM daily a JOIN daily b ON a.d = b.d AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= 10
ORDER BY pa, pb
"""

ORACLE_SQL["q322_calendar_coverage"] = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS days_seen,
       CAST(day(last_day(min(CAST(o_orderdate AS DATE)))) AS BIGINT)
         AS days_in_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(count(DISTINCT CAST(o_orderdate AS DATE)) * 1.0
             / day(last_day(min(CAST(o_orderdate AS DATE)))) * 100, 4)
         AS coverage_pct
FROM orders GROUP BY 1 ORDER BY month
"""

ORACLE_SQL["q323_timezone_battery"] = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York',
                '%Y-%m-%d %H:%M:%S') AS ny_wall,
       CAST((epoch(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')
             - epoch(ts)) / 3600 AS INTEGER) AS ny_offset_h,
       strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Europe/Berlin',
                '%Y-%m-%d %H:%M:%S') AS berlin_wall,
       CAST((epoch(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Europe/Berlin')
             - epoch(ts)) / 3600 AS INTEGER) AS berlin_offset_h,
       strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo',
                '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
       CAST((epoch(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo')
             - epoch(ts)) / 3600 AS INTEGER) AS tokyo_offset_h
FROM events
WHERE event_id % 97 = 0
ORDER BY event_id
"""

ORACLE_SQL["q324_label_silhouette"] = """
WITH comp AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cent AS (
  SELECT label AS clabel, pos, round(sum(x), 6) / count(*) AS c
  FROM comp GROUP BY 1, 2
), paired AS (
  SELECT v.vec_id, v.label AS vlabel, ct.clabel, v.x, ct.c
  FROM comp v JOIN cent ct USING (pos)
), dists AS (
  SELECT vec_id, vlabel, clabel,
         1 - sum(x * c) / (sqrt(sum(x * x)) * sqrt(sum(c * c))) AS dist
  FROM paired GROUP BY 1, 2, 3
), own AS (
  SELECT vec_id, vlabel, dist AS a FROM dists WHERE vlabel = clabel
), other AS (
  SELECT vec_id, min(dist) AS b FROM dists WHERE vlabel <> clabel GROUP BY 1
), sil AS (
  SELECT o.vlabel, (t.b - o.a) / greatest(o.a, t.b) AS s
  FROM own o JOIN other t USING (vec_id)
)
SELECT vlabel AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(round(sum(s), 6) / count(*), 6) AS mean_silhouette,
       CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_misplaced
FROM sil GROUP BY 1 ORDER BY label
"""

ORACLE_SQL["q325_vocab_coverage"] = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
), freq AS (
  SELECT token, count(*) AS f FROM toks WHERE token <> '' GROUP BY 1
), ranked AS (
  SELECT f,
         row_number() OVER (ORDER BY f DESC, token) AS rnk,
         sum(f) OVER (ORDER BY f DESC, token ROWS UNBOUNDED PRECEDING)
           AS cum_f
  FROM freq
), tot AS (SELECT sum(f) AS tot FROM freq)
SELECT CAST(rnk AS BIGINT) AS vocab_budget,
       round(cum_f * 1.0 / tot * 100, 4) AS coverage_pct
FROM ranked CROSS JOIN tot
WHERE rnk IN (100, 500, 1000, 2000)
ORDER BY vocab_budget
"""

ORACLE_SQL["q326_knn_loo_accuracy"] = """
WITH emb2 AS (SELECT * FROM embeddings WHERE vec_id < 300),
sims AS (
  SELECT a.vec_id AS qid, a.label AS qlabel,
         b.vec_id AS nid, b.label AS nlabel,
         list_sum(list_transform(generate_series(1, len(a.embedding)),
             i -> CAST(a.embedding[i] AS DOUBLE)
                  * CAST(b.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(a.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
               i -> CAST(b.embedding[i] AS DOUBLE)
                    * CAST(b.embedding[i] AS DOUBLE))))) AS sim
  FROM emb2 a JOIN emb2 b ON a.vec_id <> b.vec_id
), top3 AS (
  SELECT * FROM (
    SELECT qid, qlabel, nid, nlabel,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
    FROM sims
  ) WHERE rn <= 3
), votes AS (
  SELECT qid, qlabel, nlabel, count(*) AS v
  FROM top3 GROUP BY 1, 2, 3
), pred AS (
  SELECT * FROM (
    SELECT qid, qlabel, nlabel,
           row_number() OVER (PARTITION BY qid ORDER BY v DESC, nlabel) AS rv
    FROM votes
  ) WHERE rv = 1
)
SELECT qlabel AS label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) * 1.0
             / count(*) * 100, 4) AS accuracy_pct
FROM pred GROUP BY 1 ORDER BY label
"""

ORACLE_SQL["q327_quantile_effects"] = """
WITH armed AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS arm, value FROM events
), q AS (
  SELECT arm,
         quantile_cont(value, 0.1) AS p1, quantile_cont(value, 0.2) AS p2,
         quantile_cont(value, 0.3) AS p3, quantile_cont(value, 0.4) AS p4,
         quantile_cont(value, 0.5) AS p5, quantile_cont(value, 0.6) AS p6,
         quantile_cont(value, 0.7) AS p7, quantile_cont(value, 0.8) AS p8,
         quantile_cont(value, 0.9) AS p9
  FROM armed GROUP BY arm
), piv AS (
  SELECT u.pct,
         max(CASE WHEN arm = 0 THEN u.v END) AS v0,
         max(CASE WHEN arm = 1 THEN u.v END) AS v1
  FROM (
    SELECT arm, 10 AS pct, p1 AS v FROM q UNION ALL
    SELECT arm, 20, p2 FROM q UNION ALL SELECT arm, 30, p3 FROM q
    UNION ALL SELECT arm, 40, p4 FROM q UNION ALL SELECT arm, 50, p5 FROM q
    UNION ALL SELECT arm, 60, p6 FROM q UNION ALL SELECT arm, 70, p7 FROM q
    UNION ALL SELECT arm, 80, p8 FROM q UNION ALL SELECT arm, 90, p9 FROM q
  ) u GROUP BY u.pct
)
SELECT CAST(pct AS BIGINT) AS pct,
       round(v0, 6) AS control,
       round(v1, 6) AS treatment,
       round(v1 - v0, 6) AS effect
FROM piv ORDER BY pct
"""

ORACLE_SQL["q328_churn_risk"] = """
WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
gaps AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         datediff('day',
           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders
), per_cust AS (
  SELECT o_custkey, max(d) AS last_order,
         count(gap) AS n_gaps,
         quantile_cont(gap, 0.5) AS med_gap
  FROM gaps GROUP BY 1 HAVING count(gap) >= 5
), risk AS (
  SELECT o_custkey,
         datediff('day', last_order, anchor) AS recency,
         med_gap
  FROM per_cust CROSS JOIN anchor
  WHERE datediff('day', last_order, anchor) > 2 * med_gap
)
SELECT o_custkey,
       CAST(recency AS BIGINT) AS recency_days,
       round(med_gap, 2) AS med_gap,
       round(recency / med_gap, 4) AS overdue_ratio
FROM risk ORDER BY overdue_ratio DESC, o_custkey
LIMIT 25
"""

ORACLE_SQL["q329_price_endings"] = """
WITH grid AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 100) AS BIGINT) % 100 AS ending,
         count(*) AS n
  FROM part GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, ending, n,
         sum(n) OVER (PARTITION BY p_brand) AS tot,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY n DESC, ending) AS rn
  FROM grid
)
SELECT p_brand,
       CAST(ending AS BIGINT) AS modal_ending,
       CAST(n AS BIGINT) AS n_at_mode,
       round(n * 1.0 / tot * 100, 4) AS mode_share_pct
FROM ranked WHERE rn = 1 ORDER BY p_brand
"""

ORACLE_SQL["q330_dq_scorecard"] = """
WITH o AS (
  SELECT 'orders' AS table_name,
         CAST(count(o_custkey) AS DOUBLE) / count(*) AS m1,
         CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*) AS m2,
         CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS m3
  FROM orders
), l AS (
  SELECT 'lineitem',
         CAST(count(l_orderkey) AS DOUBLE) / count(*),
         CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 1
                       THEN 1 ELSE 0 END) AS DOUBLE) / count(*),
         CAST(sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*)
  FROM lineitem
), c AS (
  SELECT 'customer',
         CAST(count(c_name) AS DOUBLE) / count(*),
         CAST(count(DISTINCT c_custkey) AS DOUBLE) / count(*),
         CAST(sum(CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING',
              'FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*)
  FROM customer
), u AS (
  SELECT * FROM o UNION ALL SELECT * FROM l UNION ALL SELECT * FROM c
)
SELECT table_name,
       round(m1, 6) AS completeness,
       round(m2, 6) AS validity,
       round(m3, 6) AS range_ok,
       round((m1 + m2 + m3) / 3 * 100, 4) AS dq_score
FROM u ORDER BY table_name
"""

ORACLE_SQL["q331_brand_geo_mix"] = """
WITH grid AS (
  SELECT p.p_brand, n.n_name,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, n_name, rev,
         sum(rev) OVER (PARTITION BY p_brand) AS tot,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY rev DESC, n_name) AS rn
  FROM grid
)
SELECT p_brand, n_name AS top_nation,
       round(rev * 1.0 / tot * 100, 4) AS top_nation_share_pct
FROM ranked WHERE rn = 1 ORDER BY p_brand
"""

ORACLE_SQL["q332_seasonal_peaks"] = """
WITH grid AS (
  SELECT p.p_brand, month(l.l_shipdate) AS m, sum(l.l_quantity) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, m, qty,
         sum(qty) OVER (PARTITION BY p_brand) AS tot,
         row_number() OVER (PARTITION BY p_brand ORDER BY qty DESC, m) AS rn
  FROM grid
)
SELECT p_brand, CAST(m AS BIGINT) AS peak_month,
       round(qty / tot * 100, 4) AS peak_share_pct
FROM ranked WHERE rn = 1 ORDER BY p_brand
"""

ORACLE_SQL["q333_mtbf"] = """
WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
gaps AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id))) / 60000000.0 AS gap_min
  FROM err
), g2 AS (SELECT * FROM gaps WHERE gap_min IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(round(sum(gap_min), 6) / count(*), 4) AS mtbf_min,
       round(quantile_cont(gap_min, 0.5), 4) AS p50_min,
       round(quantile_cont(gap_min, 0.9), 4) AS p90_min
FROM g2
"""

ORACLE_SQL["q334_cannibalization"] = """
WITH top AS (
  SELECT l_partkey FROM (
    SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1
    ORDER BY n DESC, l_partkey LIMIT 40
  )
), daily AS (
  SELECT p.p_brand, l.l_partkey, CAST(l.l_shipdate AS DATE) AS d,
         sum(l.l_quantity) AS q
  FROM lineitem l
  JOIN top t ON l.l_partkey = t.l_partkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2, 3
)
SELECT a.p_brand, a.l_partkey AS pa, b.l_partkey AS pb,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(a.q, b.q), 6) AS corr
FROM daily a
JOIN daily b ON a.d = b.d AND a.p_brand = b.p_brand
            AND a.l_partkey < b.l_partkey
GROUP BY 1, 2, 3
HAVING count(*) >= 10 AND round(corr(a.q, b.q), 6) < 0
ORDER BY a.p_brand, pa, pb
"""

ORACLE_SQL["q335_replenishment_point"] = """
WITH base AS (
  SELECT p.p_brand, l.l_quantity, CAST(l.l_shipdate AS DATE) AS sd,
         greatest(0, datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE))) AS lt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
), daily AS (
  SELECT p_brand, sd, sum(l_quantity) AS q FROM base GROUP BY 1, 2
), demand AS (
  SELECT p_brand, round(sum(q), 6) / count(*) AS mean_d,
         stddev_samp(q) AS sd_d
  FROM daily GROUP BY 1
), lead AS (
  SELECT p_brand, round(sum(lt), 6) / count(*) AS mean_lt
  FROM base GROUP BY 1
)
SELECT d.p_brand,
       round(d.mean_d, 4) AS mean_daily_demand,
       round(d.sd_d, 4) AS sd_daily_demand,
       round(l.mean_lt, 4) AS mean_lead_days,
       round(d.mean_d * l.mean_lt + 1.65 * d.sd_d * sqrt(l.mean_lt), 4)
         AS reorder_point
FROM demand d JOIN lead l USING (p_brand)
ORDER BY p_brand
"""

ORACLE_SQL["q336_otif_score"] = """
WITH promised AS (
  SELECT o_orderkey, o_orderpriority,
         CASE isodow(CAST(o_orderdate AS DATE))
           WHEN 6 THEN CAST(o_orderdate AS DATE) + 2
           WHEN 7 THEN CAST(o_orderdate AS DATE) + 1
           ELSE CAST(o_orderdate AS DATE) END + 7 AS promised
  FROM orders
), per_order AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship,
         count(*) AS n_lines
  FROM lineitem GROUP BY 1
), scored AS (
  SELECT p.o_orderpriority, po.n_lines,
         po.last_ship <= p.promised AS otif
  FROM promised p JOIN per_order po ON p.o_orderkey = po.l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN otif THEN 1 ELSE 0 END) AS BIGINT) AS n_otif,
       round(sum(CASE WHEN otif THEN 1 ELSE 0 END) * 1.0
             / count(*) * 100, 4) AS otif_pct,
       round(round(sum(n_lines), 6) / count(*), 4) AS avg_lines
FROM scored GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLE_SQL["q337_share_shift"] = """
WITH rng AS (
  SELECT min(CAST(l_shipdate AS DATE)) AS lo,
         max(CAST(l_shipdate AS DATE)) AS hi
  FROM lineitem
), mid AS (
  SELECT lo + CAST(datediff('day', lo, hi) / 2 AS INTEGER) AS mid FROM rng
), staged AS (
  SELECT p.p_brand,
         CASE WHEN CAST(l.l_shipdate AS DATE) <= m.mid
              THEN 'h1' ELSE 'h2' END AS half,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  CROSS JOIN mid m
  GROUP BY 1, 2
), shares AS (
  SELECT p_brand, half,
         rev * 1.0 / sum(rev) OVER (PARTITION BY half) AS share
  FROM staged
), h1 AS (SELECT p_brand, share AS s1 FROM shares WHERE half = 'h1'),
h2 AS (SELECT p_brand, share AS s2 FROM shares WHERE half = 'h2')
SELECT coalesce(h1.p_brand, h2.p_brand) AS p_brand,
       round(coalesce(s1, 0) * 100, 4) AS h1_share_pct,
       round(coalesce(s2, 0) * 100, 4) AS h2_share_pct,
       round((coalesce(s2, 0) - coalesce(s1, 0)) * 100, 4) AS shift_pct
FROM h1 FULL JOIN h2 USING (p_brand)
ORDER BY p_brand
"""

ORACLE_SQL["q338_brand_acquisition"] = """
WITH first_orders AS (
  SELECT o_orderkey AS first_ok FROM (
    SELECT o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
  ) WHERE rn = 1
), flagged AS (
  SELECT p.p_brand, o.o_custkey,
         f.first_ok IS NOT NULL AS is_first
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  LEFT JOIN first_orders f ON l.l_orderkey = f.first_ok
)
SELECT p_brand,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_buyers,
       CAST(count(DISTINCT CASE WHEN is_first THEN o_custkey END) AS BIGINT)
         AS n_acquired,
       round(count(DISTINCT CASE WHEN is_first THEN o_custkey END) * 1.0
             / count(DISTINCT o_custkey) * 100, 4) AS acquisition_pct
FROM flagged GROUP BY p_brand ORDER BY p_brand
"""

ORACLE_SQL["q339_dedup_yield_curve"] = """
WITH clusters AS (
  SELECT md5(text) AS fp, count(*) AS sz FROM documents GROUP BY 1
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_docs,
       CAST((sz - 1) * count(*) AS BIGINT) AS removable
FROM clusters GROUP BY sz ORDER BY cluster_size
"""

ORACLE_SQL["q340_terminal_digit_audit"] = """
WITH hist AS (
  SELECT CAST(CAST(floor(o_totalprice) AS BIGINT) % 10 AS BIGINT) AS digit,
         count(*) AS n
  FROM orders GROUP BY 1
), tot AS (SELECT sum(n) AS tot FROM hist)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(tot / 10.0, 2) AS expected,
       round(pow(n - tot / 10.0, 2) / (tot / 10.0), 6) AS chi2_term
FROM hist CROSS JOIN tot ORDER BY digit
"""

ORACLE_SQL["q341_burstiness"] = """
WITH per_min AS (
  SELECT event_type, date_trunc('minute', ts) AS m, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_minutes,
       round(round(sum(n), 6) / count(*), 6) AS mean_rate,
       round(var_pop(n), 6) AS var_rate,
       round(var_pop(n) / (round(sum(n), 6) / count(*)), 6) AS fano
FROM per_min GROUP BY event_type ORDER BY event_type
"""

ORACLE_SQL["q342_retention_decay"] = """
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY 1
), aged AS (
  SELECT e.user_id, f.cohort,
         CAST(floor((epoch_us(date_trunc('week', e.ts))
               - epoch_us(f.cohort)) / (7 * 86400 * 1000000.0)) AS INTEGER)
           AS age_w
  FROM events e JOIN first f USING (user_id)
), a2 AS (SELECT * FROM aged WHERE age_w >= 0),
grid AS (
  SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, age_w,
         count(DISTINCT user_id) AS active
  FROM a2 GROUP BY 1, 2
)
SELECT cohort_week,
       CAST(count(*) AS BIGINT) AS n_points,
       round(regr_slope(ln(active), age_w), 6) AS decay_rate,
       round(regr_r2(ln(active), age_w), 6) AS r2
FROM grid GROUP BY cohort_week HAVING count(*) >= 3
ORDER BY cohort_week
"""

ORACLE_SQL["q343_revenue_var"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), v AS (SELECT quantile_cont(rev, 0.05) AS var5 FROM daily)
SELECT strftime(d, '%Y-%m-%d') AS day,
       round(rev, 2) AS rev,
       round(var5, 2) AS var5,
       round((var5 - rev) / var5 * 100, 4) AS breach_depth_pct
FROM daily CROSS JOIN v
WHERE rev < var5
ORDER BY day
"""

ORACLE_SQL["q344_bounce_rate"] = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
), entry AS (
  SELECT user_id, sess_id, event_type,
         first_value(event_type) OVER (PARTITION BY user_id, sess_id
                                       ORDER BY ts, event_id) AS entry
  FROM sess
), sessions AS (
  SELECT user_id, sess_id, count(*) AS n_events,
         max(entry) AS entry_type
  FROM entry GROUP BY 1, 2
)
SELECT entry_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*) * 100, 4) AS bounce_pct
FROM sessions GROUP BY entry_type ORDER BY entry_type
"""

ORACLE_SQL["q345_steps_to_purchase"] = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
), seq AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
                               ORDER BY ts, event_id) AS step
  FROM sess
), first_buy AS (
  SELECT user_id, sess_id, min(step) AS steps_to_buy
  FROM seq WHERE event_type = 'purchase' GROUP BY 1, 2
), n_sessions AS (
  SELECT user_id, sess_id FROM seq GROUP BY 1, 2
), joined AS (
  SELECT n.user_id, n.sess_id, f.steps_to_buy
  FROM n_sessions n LEFT JOIN first_buy f USING (user_id, sess_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(steps_to_buy) AS BIGINT) AS n_converting,
       round(count(steps_to_buy) * 1.0 / count(*) * 100, 4)
         AS conversion_pct,
       round(quantile_cont(steps_to_buy, 0.5), 2) AS median_steps,
       round(quantile_cont(steps_to_buy, 0.9), 2) AS p90_steps
FROM joined
"""

ORACLE_SQL["q346_brand_crossshop"] = """
WITH buyers AS (
  SELECT DISTINCT p.p_brand, o.o_custkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
), top AS (
  SELECT p_brand FROM (
    SELECT p_brand, count(*) AS nb FROM buyers GROUP BY 1
    ORDER BY nb DESC, p_brand LIMIT 8
  )
), tb AS (
  SELECT b.* FROM buyers b JOIN top t USING (p_brand)
), inter AS (
  SELECT a.p_brand AS ba, b.p_brand AS bb, count(*) AS i
  FROM tb a JOIN tb b
    ON a.o_custkey = b.o_custkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
), sizes AS (
  SELECT p_brand, count(*) AS sz FROM tb GROUP BY 1
)
SELECT i.ba, i.bb,
       CAST(i.i AS BIGINT) AS shared_buyers,
       round(i.i * 1.0 / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.p_brand = i.ba
JOIN sizes sb ON sb.p_brand = i.bb
ORDER BY ba, bb
"""

ORACLE_SQL["q347_second_order_latency"] = """
WITH ranked AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
), first AS (SELECT o_custkey, d AS d1 FROM ranked WHERE rn = 1),
second AS (SELECT o_custkey, d AS d2 FROM ranked WHERE rn = 2),
lat AS (
  SELECT c.c_mktsegment, datediff('day', f.d1, s.d2) AS days
  FROM first f JOIN second s USING (o_custkey)
  JOIN customer c ON f.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_repeaters,
       round(quantile_cont(days, 0.5), 2) AS median_days,
       round(quantile_cont(days, 0.9), 2) AS p90_days
FROM lat GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

ORACLE_SQL["q348_arpu_trend"] = """
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         count(DISTINCT o_custkey) AS active
  FROM orders GROUP BY 1
), a AS (
  SELECT month, active,
         CAST(rev AS DOUBLE) / active AS arpu
  FROM monthly
)
SELECT month, CAST(active AS BIGINT) AS active_customers, arpu,
       arpu - lag(arpu) OVER (ORDER BY month) AS arpu_delta
FROM a ORDER BY month
"""

ORACLE_SQL["q349_supply_risk"] = """
WITH grid AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
  FROM lineitem GROUP BY 1, 2
), tops AS (
  SELECT l_partkey, q,
         sum(q) OVER (PARTITION BY l_partkey) AS tot,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY q DESC, l_suppkey) AS rn
  FROM grid
), t1 AS (
  SELECT l_partkey, q / tot AS top_share FROM tops WHERE rn = 1
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN t.top_share > 0.6 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_concentrated,
       round(sum(CASE WHEN t.top_share > 0.6 THEN 1 ELSE 0 END) * 1.0
             / count(*) * 100, 4) AS concentrated_pct
FROM t1 t JOIN part p ON t.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p_brand
"""

ORACLE_SQL["q350_executive_panel"] = """
WITH core AS (
  SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         count(*) AS n_orders,
         count(DISTINCT o_custkey) AS active
  FROM orders
), repeat AS (
  SELECT sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS repeaters,
         count(*) AS all_cust
  FROM (SELECT o_custkey, count(*) AS k FROM orders GROUP BY 1)
), top_brand AS (
  SELECT p_brand AS top_brand FROM (
    SELECT p.p_brand,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) AS brev
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1 ORDER BY brev DESC, p_brand LIMIT 1
  )
)
SELECT CAST(rev AS DOUBLE) AS revenue,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(round(rev, 2) AS DOUBLE) / n_orders AS aov,
       CAST(active AS BIGINT) AS active_customers,
       CAST(repeaters AS BIGINT) AS repeat_customers,
       round(repeaters * 1.0 / all_cust * 100, 4) AS repeat_rate_pct,
       top_brand
FROM core CROSS JOIN repeat CROSS JOIN top_brand
"""

ORACLE_SQL["q351_discount_leakage"] = """
WITH banded AS (
  SELECT CAST(floor(l_discount * 100 / 2) * 2 AS BIGINT) AS band,
         count(*) AS n,
         sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
           AS leak_i
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(leak_i) AS tot FROM banded)
SELECT band, CAST(n AS BIGINT) AS n_lines,
       CAST(leak_i / 10000.0 AS DOUBLE) AS foregone,
       round(leak_i * 1.0 / tot * 100, 4) AS leak_share_pct
FROM banded CROSS JOIN tot ORDER BY band
"""

ORACLE_SQL["q352_session_pmi"] = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess0 AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
), sess AS (SELECT DISTINCT user_id, sess_id, event_type FROM sess0),
ns AS (SELECT count(*) AS ns FROM (SELECT DISTINCT user_id, sess_id FROM sess)),
singles AS (SELECT event_type, count(*) AS c1 FROM sess GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS c2
  FROM sess a JOIN sess b
    ON a.user_id = b.user_id AND a.sess_id = b.sess_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb,
       CAST(p.c2 AS BIGINT) AS n_cooccur,
       round(ln((p.c2 * CAST(ns.ns AS DOUBLE)) / (ca.c1 * cb.c1)), 6) AS pmi
FROM pairs p
JOIN singles ca ON ca.event_type = p.ta
JOIN singles cb ON cb.event_type = p.tb
CROSS JOIN ns
ORDER BY ta, tb
"""

ORACLE_SQL["q353_rank_stability"] = """
WITH rng AS (
  SELECT min(CAST(l_shipdate AS DATE)) AS lo,
         max(CAST(l_shipdate AS DATE)) AS hi
  FROM lineitem
), mid AS (
  SELECT lo + CAST(datediff('day', lo, hi) / 2 AS INTEGER) AS mid FROM rng
), staged AS (
  SELECT p.p_brand,
         CASE WHEN CAST(l.l_shipdate AS DATE) <= m.mid
              THEN 'h1' ELSE 'h2' END AS half,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  CROSS JOIN mid m
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, half,
         row_number() OVER (PARTITION BY half
                            ORDER BY rev DESC, p_brand) AS r
  FROM staged
), r1 AS (SELECT p_brand, r AS r1 FROM ranked WHERE half = 'h1'),
r2 AS (SELECT p_brand, r AS r2 FROM ranked WHERE half = 'h2'),
d AS (
  SELECT pow(r1.r1 - r2.r2, 2) AS d2 FROM r1 JOIN r2 USING (p_brand)
)
SELECT CAST(count(*) AS BIGINT) AS n_brands,
       CAST(sum(d2) AS BIGINT) AS sum_d2,
       round(1 - 6 * sum(d2) / (count(*) * (pow(count(*), 2) - 1)), 6)
         AS spearman_rho
FROM d
"""

ORACLE_SQL["q354_lifetime_span"] = """
WITH span AS (
  SELECT o_custkey, count(*) AS k,
         datediff('day', min(CAST(o_orderdate AS DATE)),
                  max(CAST(o_orderdate AS DATE))) AS span
  FROM orders GROUP BY 1 HAVING count(*) >= 2
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(quantile_cont(span, 0.5), 2) AS median_span,
       round(quantile_cont(span, 0.9), 2) AS p90_span,
       CAST(max(span) AS BIGINT) AS max_span
FROM span s JOIN customer c ON s.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c_mktsegment
"""

ORACLE_SQL["q355_length_quality_corr"] = """
WITH ws AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS w0,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS w
  FROM documents
), feats AS (
  SELECT source,
         CAST(len(w) AS DOUBLE) AS n_words,
         len(list_filter(w, t -> t IN ('the','a','of','and','to','in',
             'is','it'))) * 1.0 / len(w) AS stop_share,
         list_sum(list_transform(w, t -> length(t))) * 1.0 / len(w)
           AS mean_wlen
  FROM ws WHERE len(w) > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(corr(n_words, stop_share), 6) AS corr_len_stop,
       round(corr(n_words, mean_wlen), 6) AS corr_len_wlen
FROM feats GROUP BY source ORDER BY source
"""

ORACLE_SQL["q356_cross_source_dup"] = """
WITH fp AS (
  SELECT DISTINCT source, md5(text) AS fp FROM documents
), shared AS (
  SELECT a.source AS sa, b.source AS sb, count(*) AS n_shared
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.source <> b.source
  GROUP BY 1, 2
), sizes AS (SELECT source, count(*) AS n FROM fp GROUP BY 1)
SELECT s.sa, s.sb,
       CAST(s.n_shared AS BIGINT) AS n_shared,
       round(s.n_shared * 1.0 / z.n * 100, 4) AS pct_of_a_in_b
FROM shared s JOIN sizes z ON z.source = s.sa
ORDER BY sa, sb
"""

ORACLE_SQL["q357_format_fingerprint"] = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0)
             / sum(length(text)), 6) AS upper_share,
       round(sum(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0)
             / sum(length(text)), 6) AS digit_share,
       round(sum(length(text)
                 - length(regexp_replace(text, '[^A-Za-z0-9[:space:]]', '',
                                          'g'))) * 1.0
             / sum(length(text)), 6) AS punct_share,
       round(sum(length(text)
                 - length(regexp_replace(text, '[[:space:]]', '', 'g')))
             * 1.0 / sum(length(text)), 6) AS space_share
FROM documents WHERE length(text) > 0
GROUP BY source ORDER BY source
"""

ORACLE_SQL["q358_vocab_drift"] = """
WITH mid AS (SELECT quantile_cont(doc_id, 0.5) AS mid FROM documents),
tok AS (
  SELECT DISTINCT d.source,
         CASE WHEN d.doc_id <= m.mid THEN 'h1' ELSE 'h2' END AS half,
         t.token
  FROM documents d
  CROSS JOIN mid m
  CROSS JOIN unnest(regexp_split_to_array(lower(trim(d.text)), '\\s+'))
    AS t(token)
  WHERE t.token <> ''
), h1 AS (SELECT source, token FROM tok WHERE half = 'h1'),
h2 AS (SELECT source, token FROM tok WHERE half = 'h2'),
inter AS (
  SELECT h1.source, count(*) AS i
  FROM h1 JOIN h2 ON h1.source = h2.source AND h1.token = h2.token
  GROUP BY 1
), s1 AS (SELECT source, count(*) AS n1 FROM h1 GROUP BY 1),
s2 AS (SELECT source, count(*) AS n2 FROM h2 GROUP BY 1)
SELECT i.source,
       CAST(s1.n1 AS BIGINT) AS vocab_h1,
       CAST(s2.n2 AS BIGINT) AS vocab_h2,
       round(i.i * 1.0 / (s1.n1 + s2.n2 - i.i), 6) AS jaccard
FROM inter i JOIN s1 USING (source) JOIN s2 USING (source)
ORDER BY source
"""

ORACLE_SQL["q360_heavy_hitters"] = """
WITH tok AS (
  SELECT t.token AS term
  FROM documents d
  CROSS JOIN unnest(regexp_split_to_array(lower(trim(d.text)), '\\s+'))
    AS t(token)
  WHERE t.token <> ''
)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM tok
GROUP BY term
HAVING count(*) > (SELECT count(*) FROM tok) / 50.0
ORDER BY cnt DESC, term
"""

# q362: PNG is lossless, so since round 7 the oracle pins the FULL
# decoded payload md5, not just geometry: pixels tile the raw text
# bytes (the corpus is pure ASCII — verified per fixture build — so
# char arithmetic IS byte arithmetic), empty text is the explicit
# all-zero payload. The Adam7 lanes (odd ids) change only the
# container bytes, never the decoded payload.
ORACLE_SQL["q362_png_decode"] = """
WITH t AS (
  SELECT doc_id, text,
         CAST(doc_id % 13 + 3 AS INTEGER) AS w,
         CAST(doc_id % 7 + 2 AS INTEGER) AS h
  FROM documents WHERE doc_id < 150
), px AS (
  SELECT doc_id, w, h,
         CASE WHEN coalesce(length(text), 0) = 0
              THEN repeat(chr(0), w * h * 3)
              ELSE substring(
                     repeat(text, CAST(w * h * 3 / length(text) AS INT) + 1),
                     1, w * h * 3)
         END AS payload
  FROM t
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(w * h * 3 AS BIGINT) AS payload_bytes,
       md5(payload) AS payload_md5
FROM px
ORDER BY media_id
"""

ORACLE_SQL["q364_lsh_calibration"] = """
WITH cfg(bands, rows_per_band) AS (VALUES (8,16),(16,8),(32,4),(64,2)),
grid AS (
  SELECT bands, rows_per_band, t.i / 20.0 AS s
  FROM cfg CROSS JOIN generate_series(1, 19) t(i)
)
SELECT CAST(bands AS INTEGER) AS bands,
       CAST(rows_per_band AS INTEGER) AS rows_per_band,
       round(s, 2) AS s,
       round(1 - pow(1 - pow(s, rows_per_band), bands), 6) AS p_candidate,
       round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS s50
FROM grid
ORDER BY bands, s
"""

ORACLE_SQL["q365_shingle_df_spectrum"] = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(words) - 2),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM w WHERE len(words) >= 3
), dfreq AS (
  SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1
)
SELECT CASE WHEN df = 1 THEN '1' WHEN df <= 2 THEN '2'
            WHEN df <= 4 THEN '3-4' WHEN df <= 8 THEN '5-8'
            WHEN df <= 16 THEN '9-16' ELSE '17+' END AS df_band,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(df * (df - 1) / 2) AS BIGINT) AS join_pairs
FROM dfreq
GROUP BY 1
ORDER BY df_band
"""

ORACLE_SQL["q366_order_consistency"] = """
WITH charges AS (
  SELECT l_orderkey,
         sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS charge
  FROM lineitem GROUP BY 1
), j AS (
  SELECT o.o_orderstatus,
         abs(o.o_totalprice - coalesce(c.charge, 0.0)) / o.o_totalprice AS rel
  FROM orders o LEFT JOIN charges c ON o.o_orderkey = c.l_orderkey
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN rel <= 0.001 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reconciled,
       CAST(round(sum(CAST(rel * 100 AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*) AS avg_rel_delta_pct,
       round(max(rel * 100), 2) AS max_rel_delta_pct
FROM j
GROUP BY 1
ORDER BY o_orderstatus
"""

ORACLE_SQL["q368_source_scorecard"] = f"""
WITH m AS (
  SELECT source, n_chars, md5(text) AS fp,
         cast(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT)
           AS n_words,
         cast(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
           AS nonspace,
         cast(length(text) -
              length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))
           AS BIGINT) AS n_punct,
         cast(length(text) AS BIGINT) AS n_chars_calc,
         cast(len(list_intersect(
              list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
              {_STOP["en"]})) AS BIGINT) AS stop_hits
  FROM documents
), q AS (
  SELECT source, n_chars, fp,
         least(n_words / 100.0, 1.0) * 0.5
           + least(stop_hits * 1.0 / n_words * 10, 1.0) * 0.3
           + (1.0 - least(n_punct * 1.0 / n_chars_calc * 10, 1.0)) * 0.2 AS qv
  FROM m
), agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         1 - count(DISTINCT fp) * 1.0 / count(*) AS dup_rate,
         avg(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS short_frac,
         CAST(round(sum(CAST(qv AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*) AS mean_quality
  FROM q GROUP BY 1
)
SELECT source, n_docs,
       round(dup_rate, 4) AS dup_rate,
       round(short_frac, 4) AS short_frac,
       round(mean_quality, 4) AS mean_quality,
       round(mean_quality * 0.6 + (1 - dup_rate) * 0.25
             + (1 - short_frac) * 0.15, 4) AS admission_score
FROM agg
ORDER BY admission_score DESC, source
"""

ORACLE_SQL["q369_substring_dup_coverage"] = """
WITH grams AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), s.i, s.i + 7), ' ')
           AS gram
  FROM documents,
       LATERAL (
         SELECT unnest(generate_series(
           1, greatest(length(string_split(text, ' ')) - 7, 0))) AS i
       ) s
), per_doc_gram AS (
  SELECT doc_id, gram, count(*) AS n_pos
  FROM grams GROUP BY doc_id, gram
), with_docs AS (
  SELECT doc_id, n_pos,
         count(*) OVER (PARTITION BY gram) AS n_docs
  FROM per_doc_gram
), per_doc AS (
  SELECT doc_id,
         cast(sum(n_pos) AS BIGINT) AS n_grams,
         cast(coalesce(sum(n_pos) FILTER (WHERE n_docs > 1), 0) AS BIGINT)
           AS n_dup_grams
  FROM with_docs GROUP BY doc_id
)
SELECT doc_id, n_grams, n_dup_grams,
       cast((n_dup_grams * 10000) // n_grams AS BIGINT) AS dup_bps
FROM per_doc
WHERE n_dup_grams > 0
ORDER BY dup_bps DESC, n_grams DESC, doc_id
LIMIT 100
"""

ORACLE_SQL["q370_xml_roundtrip"] = """
SELECT o_orderstatus,
       cast(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
       cast(min(o_orderkey) AS BIGINT) AS min_key,
       cast(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

ORACLE_SQL["q371_variant_props"] = """
SELECT event_type,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       cast(min(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       cast(max(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       cast(count(DISTINCT cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS n_distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

from luxo_rs_spark.plans.queries import _Q372_SQL

ORACLE_SQL["q372_recursive_bfs"] = _Q372_SQL

ORACLE_SQL["q373_pipe_syntax"] = """
SELECT cast(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       round(avg(l_quantity), 2) AS avg_qty,
       l_returnflag, l_linestatus
FROM lineitem
WHERE l_quantity > 5
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLE_SQL["q374_sql_udf"] = """
SELECT l.l_returnflag,
       cast(count(*) AS BIGINT) AS n,
       round(sum(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)), 2)
         AS charged
FROM lineitem l
JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') o
  ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""

ORACLE_SQL["q375_session_variables"] = """
SELECT c_nationkey,
       cast(count(*) AS BIGINT) AS n_rich,
       round(avg(c_acctbal), 2) AS avg_bal
FROM customer
WHERE c_acctbal >= 1000.0 AND c_mktsegment = 'BUILDING'
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

# q376: the fixed-point PageRank iterations UNROLLED (6 rounds, no
# recursive CTE needed because the round count is fixed). Every value
# is BIGINT, every division is floor division on nonnegative operands
# (DuckDB `//` == Spark `div` there), every gather an exact integer
# sum — so the hashes match bit-for-bit regardless of engine summation
# order (the reason the former float version had to be rows-only).
def _pagerank_fp_oracle(iters: int = 6) -> str:
    scale, num, den = 10**15, 17, 20
    prev = "pr0"
    rounds = []
    sep = ",\n"
    for i in range(1, iters + 1):
        rounds.append(
            f"""pr{i} AS MATERIALIZED (
  SELECT nd.node,
         CAST(({den - num} * {scale}) // ({den} * (SELECT n FROM nn))
              + ({num} * COALESCE(inb.g, 0)) // {den} AS BIGINT) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // d.out_deg) AS g
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) inb ON inb.node = nd.node)"""
        )
        prev = f"pr{i}"
    return f"""
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (
  SELECT x.l_partkey AS a, y.l_partkey AS b
  FROM op x JOIN op y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b AS src, a AS dst FROM pairs),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS out_deg
        FROM edges GROUP BY src),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
pr0 AS MATERIALIZED (SELECT node,
               CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS r
        FROM nodes),
{sep.join(rounds)}
SELECT node AS part_id, r AS rank_fp
FROM {prev}
ORDER BY rank_fp DESC, part_id
LIMIT 20
"""


ORACLE_SQL["q376_pagerank"] = _pagerank_fp_oracle(6)

ORACLE_SQL["q377_arrow_doc_stats"] = """
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(length(text)) AS BIGINT) AS sum_chars,
       cast(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
       cast(sum(length(string_split(text, ' '))) AS BIGINT) AS sum_words,
       cast(max(length(string_split(text, ' '))) AS BIGINT) AS max_words
FROM documents
GROUP BY source
ORDER BY source
"""

ORACLE_SQL["q378_polymorphic_udtf"] = """
SELECT event_type,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["q379_linear_interpolation"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*) AS v
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events
), spine AS (
  SELECT e.event_type, gs.h
  FROM (SELECT DISTINCT event_type FROM events) e,
       bounds b,
       LATERAL (
         SELECT unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
       ) gs
), joined AS (
  SELECT s.event_type,
         cast(epoch_us(s.h) AS BIGINT) AS t,
         hourly.v
  FROM spine s LEFT JOIN hourly
    ON s.event_type = hourly.event_type AND s.h = hourly.h
), ctx AS (
  SELECT event_type, t, v,
         last_value(v IGNORE NULLS) OVER w_back AS prev_v,
         first_value(v IGNORE NULLS) OVER w_fwd AS next_v,
         last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER w_back AS prev_t,
         first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER w_fwd AS next_t
  FROM joined
  WINDOW
    w_back AS (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY event_type ORDER BY t
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, t AS hour_us,
       CASE WHEN v IS NOT NULL THEN v
            ELSE prev_v + (next_v - prev_v)
                 * ((t - prev_t) / cast(next_t - prev_t AS DOUBLE))
       END AS v_interp,
       v IS NULL AS was_gap
FROM ctx
ORDER BY event_type, hour_us
"""

ORACLE_SQL["q381_parameterized_sql"] = """
SELECT o_orderpriority,
       cast(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice >= 50000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_SQL["q382_group_by_all"] = """
SELECT o_orderstatus, o_orderpriority,
       cast(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority, n, sum_price
"""

ORACLE_SQL["q383_json_key_profile"] = """
WITH total AS (SELECT count(*) AS t FROM events), counts AS (
  SELECT 'event_id' AS key, count(*) AS n_present FROM events
  UNION ALL
  SELECT 'value', count(*) FROM events WHERE value IS NOT NULL
  UNION ALL
  SELECT 'etype', count(*) FROM events WHERE value > 50
  UNION ALL
  SELECT 'buyer', count(*) FROM events WHERE event_type = 'purchase'
)
SELECT key, cast(n_present AS BIGINT) AS n_present,
       cast((n_present * 10000) // t AS BIGINT) AS presence_pct
FROM counts, total
WHERE n_present > 0
ORDER BY key
"""

ORACLE_SQL["q384_entity_resolution"] = """
WITH c AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         cast(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer
), pairs AS (
  SELECT x.c_custkey AS cust_a, y.c_custkey AS cust_b,
         cast(
           (CASE WHEN x.c_mktsegment = y.c_mktsegment THEN 20 ELSE 0 END)
           + (CASE WHEN abs(x.c_acctbal - y.c_acctbal) <= 50.0
                   THEN 15 ELSE 0 END)
           + (CASE WHEN substring(x.c_name, -1, 1) = substring(y.c_name, -1, 1)
                   THEN 5 ELSE 0 END)
         AS BIGINT) AS score_x10
  FROM c x JOIN c y
    ON x.c_nationkey = y.c_nationkey AND x.bal_band = y.bal_band
   AND x.c_custkey < y.c_custkey
)
SELECT cust_a, cust_b, score_x10
FROM pairs
WHERE score_x10 >= 35
ORDER BY score_x10 DESC, cust_a, cust_b
LIMIT 200
"""

ORACLE_SQL["q385_data_contract"] = """
WITH checks AS (
  SELECT 'totalprice_positive' AS "check",
         count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, false))
           AS n_violations
  FROM orders
  UNION ALL
  SELECT 'status_in_domain',
         count(*) FILTER (
           WHERE NOT coalesce(o_orderstatus IN ('F', 'O', 'P'), false))
  FROM orders
  UNION ALL
  SELECT 'orderdate_not_null',
         count(*) FILTER (WHERE o_orderdate IS NULL)
  FROM orders
  UNION ALL
  SELECT 'priority_prefix_digit',
         count(*) FILTER (WHERE NOT coalesce(
           substring(o_orderpriority, 1, 1) IN ('1','2','3','4','5'), false))
  FROM orders
  UNION ALL
  SELECT 'orderkey_unique',
         coalesce((SELECT sum(n - 1) FROM (
           SELECT count(*) AS n FROM orders GROUP BY o_orderkey
         ) WHERE n > 1), 0)
  UNION ALL
  SELECT 'custkey_references_customer',
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
)
SELECT "check", cast(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS pass
FROM checks
ORDER BY "check"
"""

ORACLE_SQL["q386_bigram_perplexity"] = """
WITH bigrams AS (
  SELECT doc_id,
         list_extract(string_split(text, ' '), s.i) AS w1,
         list_extract(string_split(text, ' '), s.i + 1) AS w2
  FROM documents,
       LATERAL (
         SELECT unnest(generate_series(
           1, greatest(length(string_split(text, ' ')) - 1, 0))) AS i
       ) s
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1
), v AS (
  SELECT count(DISTINCT w1) AS vocab FROM bigrams
)
SELECT b.doc_id,
       cast(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-log2((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.vocab))), 4)
         AS cross_entropy
FROM bigrams b
JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
JOIN c1 ON b.w1 = c1.w1
CROSS JOIN v
GROUP BY b.doc_id
ORDER BY cross_entropy DESC, doc_id
LIMIT 30
"""

ORACLE_SQL["q387_containment_pairs"] = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(words) - 2),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM w WHERE len(words) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b,
       cast(n_inter AS BIGINT) AS n_shared,
       cast((n_inter * 10000) // least(x.n_sh, y.n_sh) AS BIGINT)
         AS containment_pct
FROM inter JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
WHERE (n_inter * 10000) // least(x.n_sh, y.n_sh) >= 5000
ORDER BY containment_pct DESC, doc_a, doc_b
LIMIT 100
"""

ORACLE_SQL["q388_weighted_sample"] = """
WITH keyed AS (
  SELECT source, doc_id, cast(n_chars AS BIGINT) AS weight,
         pow(
           cast(concat('0x', substring(md5(cast(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) / 4294967296.0,
           1.0 / n_chars
         ) AS es_key
  FROM documents
), ranked AS (
  SELECT source, doc_id, weight,
         row_number() OVER (PARTITION BY source
                            ORDER BY es_key DESC, doc_id) AS rk
  FROM keyed
)
SELECT source, cast(rk AS BIGINT) AS rk, doc_id, weight
FROM ranked WHERE rk <= 5
ORDER BY source, rk
"""

ORACLE_SQL["q389_mix_shift"] = """
WITH med AS (
  SELECT quantile_cont(epoch(o_orderdate), 0.5) AS m FROM orders
), per AS (
  SELECT o_orderpriority,
         CASE WHEN epoch(o_orderdate) <= med.m THEN 0 ELSE 1 END AS p,
         count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS rev
  FROM orders, med
  GROUP BY 1, 2
), piv AS (
  SELECT o_orderpriority,
         coalesce(sum(n) FILTER (WHERE p = 0), 0) AS n0,
         coalesce(sum(n) FILTER (WHERE p = 1), 0) AS n1,
         coalesce(sum(rev) FILTER (WHERE p = 0), 0) AS r0,
         coalesce(sum(rev) FILTER (WHERE p = 1), 0) AS r1
  FROM per GROUP BY 1
)
SELECT o_orderpriority,
       cast(n0 AS BIGINT) AS n_before,
       cast(n1 AS BIGINT) AS n_after,
       round(r1 - r0, 2) AS delta_rev,
       round((n1 - n0) * (r0 / n0), 2) AS volume_effect,
       round(n1 * (r1 / n1 - r0 / n0), 2) AS rate_effect,
       round((n1 - n0) * (r0 / n0) + n1 * (r1 / n1 - r0 / n0)
             - (r1 - r0), 2) AS residual
FROM piv
ORDER BY o_orderpriority
"""

ORACLE_SQL["q390_rolling_mad_outliers"] = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS v
  FROM orders GROUP BY 1
), med AS (
  SELECT d, v,
         quantile_cont(v, 0.5) OVER
           (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_med
  FROM daily
), mad AS (
  SELECT d, v, roll_med,
         quantile_cont(abs(v - roll_med), 0.5) OVER
           (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_mad
  FROM med
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       v AS revenue,
       round(roll_med, 2) AS roll_med,
       round(roll_mad, 2) AS roll_mad,
       cast(floor(abs(v - roll_med) * 100 /
                  nullif(1.4826 * roll_mad, 0)) AS BIGINT) AS dev_ratio_pct,
       abs(v - roll_med) > 3 * 1.4826 * roll_mad AS is_outlier
FROM mad
ORDER BY day
"""

ORACLE_SQL["q391_regression_battery"] = """
SELECT p_brand,
       cast(regr_count(l_quantity, l_discount) AS BIGINT) AS n,
       round(regr_slope(l_quantity, l_discount), 4) AS slope,
       round(regr_intercept(l_quantity, l_discount), 4) AS intercept,
       round(regr_r2(l_quantity, l_discount), 6) AS r2
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""

ORACLE_SQL["q392_benford_audit"] = """
WITH total AS (
  SELECT count(*) AS t FROM orders WHERE o_totalprice <> 0
), digits AS (
  SELECT cast(substring(regexp_replace(
           format('{:.10f}', abs(o_totalprice)), '[0.,]', '', 'g'), 1, 1)
         AS INT) AS digit
  FROM orders WHERE o_totalprice <> 0
)
SELECT digit, cast(count(*) AS BIGINT) AS n,
       cast((count(*) * 10000) // t AS BIGINT) AS observed_bps,
       cast(floor(log10(1 + 1.0 / digit) * 10000) AS BIGINT) AS benford_bps,
       cast((count(*) * 10000) // t
            - floor(log10(1 + 1.0 / digit) * 10000) AS BIGINT)
         AS deviation_bps
FROM digits, total
GROUP BY digit, t
ORDER BY digit
"""

ORACLE_SQL["q393_jpeg_decode"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 11 + 6 AS INTEGER) AS width,
       CAST(doc_id % 5 + 4 AS INTEGER) AS height,
       CAST((doc_id % 5 + 4) * (doc_id % 11 + 6) * 3 AS BIGINT) AS payload_bytes
FROM documents
WHERE doc_id < 150
ORDER BY media_id
"""

ORACLE_SQL["q395_jpeg_progressive_decode"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 23 + 14 AS INTEGER) AS width,
       CAST(doc_id % 13 + 10 AS INTEGER) AS height,
       CAST((doc_id % 13 + 10) * (doc_id % 23 + 14) * 3 AS BIGINT) AS payload_bytes
FROM documents
WHERE doc_id < 150
ORDER BY media_id
"""

ORACLE_SQL["q394_jpeg_420_restart_decode"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 23 + 14 AS INTEGER) AS width,
       CAST(doc_id % 13 + 10 AS INTEGER) AS height,
       CAST((doc_id % 13 + 10) * (doc_id % 23 + 14) * 3 AS BIGINT) AS payload_bytes
FROM documents
WHERE doc_id < 150
ORDER BY media_id
"""

ORACLE_SQL["q397_segment_boilerplate"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), idx AS (
  SELECT doc_id, t,
         unnest(range(GREATEST(CAST(ceil(len(t) / 3.0) AS BIGINT), 1))) AS i
  FROM toks
), segs AS (
  SELECT doc_id, CAST(i AS INT) AS seg_idx,
         array_to_string(t[i*3+1 : i*3+3], ' ') AS seg
  FROM idx
), boiler AS (
  SELECT md5(seg) AS h FROM segs
  GROUP BY md5(seg) HAVING count(DISTINCT doc_id) >= 2
), flagged AS (
  SELECT s.doc_id, s.seg_idx, s.seg, (b.h IS NOT NULL) AS is_b
  FROM segs s LEFT JOIN boiler b ON md5(s.seg) = b.h
)
SELECT doc_id,
  count(*) AS n_seg,
  CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
  round(CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
    AS boiler_frac,
  md5(COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
               FILTER (WHERE NOT is_b), '')) AS clean_md5
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLE_SQL["q398_url_normalize"] = """
SELECT doc_id,
  'WWW.' || source || '.Example.COM' AS host,
  '/docs/' || doc_id AS path,
  'sec-' || (doc_id % 7) AS frag,
  CAST(doc_id AS VARCHAR) AS qid,
  'example.com' AS reg_domain,
  'https://' || lower(source) || '.example.com/docs/' || doc_id ||
    '?id=' || doc_id || '&ref=' || lang AS norm_url
FROM documents
ORDER BY doc_id
"""

ORACLE_SQL["q399_k_anonymity_audit"] = """
SELECT c_nationkey, c_mktsegment,
  count(*) AS k_size,
  count(DISTINCT floor(c_acctbal / 1000)) AS l_div,
  round(CAST(1.0 AS DOUBLE) / count(*), 4) AS reid_risk,
  count(*) >= 5 AS k_anon_5,
  count(DISTINCT floor(c_acctbal / 1000)) >= 3 AS l_div_3
FROM customer
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
"""

ORACLE_SQL["q400_warc_ingest"] = """
SELECT doc_id,
  200 AS status,
  lang,
  'Doc ' || doc_id AS title,
  length(text) AS n_chars,
  md5(text) AS text_md5
FROM documents
ORDER BY doc_id
"""

# q401: full-resolution lanes decode to the tile verbatim; the round-8
# subsampled lanes (doc_id%9 in (4, 8)) replicate top-left-decimated
# chroma, so payload[y,x,c>0] = tile[((y - y%sy)*w + x - x%sx)*3 + c].
ORACLE_SQL["q401_jpeg_lossless_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h,
         CAST(CASE WHEN doc_id % 9 IN (4, 8) THEN 2 ELSE 1 END
              AS INTEGER) AS sx,
         CAST(CASE WHEN doc_id % 9 = 4 THEN 2 ELSE 1 END AS INTEGER) AS sy
  FROM documents WHERE doc_id < 150
), px AS (
  SELECT doc_id, w, h, sx, sy,
         substring(repeat(hx, CAST(h * w * 3 / 32 AS INTEGER) + 1),
                   1, h * w * 3) AS tile
  FROM t
), pay AS (
  SELECT doc_id, w, h,
    CASE WHEN sx = 1 AND sy = 1 THEN tile
    ELSE array_to_string(list_transform(range(0, w * h * 3), i ->
      substring(tile,
        CASE WHEN i % 3 = 0 THEN CAST(i + 1 AS INTEGER)
        ELSE CAST(((i // (3 * w)) - ((i // (3 * w)) % sy)) * 3 * w
                  + (((i % (3 * w)) // 3)
                     - (((i % (3 * w)) // 3) % sx)) * 3
                  + (i % 3) + 1 AS INTEGER) END, 1)), '')
    END AS payload
  FROM px
)
SELECT doc_id AS media_id, w AS width, h AS height,
  md5(payload) AS pixel_md5
FROM pay ORDER BY media_id
"""

ORACLE_SQL["q402_deterministic_shuffle"] = """
WITH keyed AS (
  SELECT doc_id,
         md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
), sharded AS (
  SELECT doc_id, shuffle_key,
         CAST(CAST('0x' || substring(shuffle_key, 1, 2) AS INTEGER) % 16
              AS INTEGER) AS shard
  FROM keyed
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY shuffle_key)
            AS INTEGER) AS pos,
       shuffle_key
FROM sharded
ORDER BY shard, pos
"""

ORACLE_SQL["q403_observed_metrics"] = """
SELECT
  (SELECT count(*) FROM documents) AS rows_in,
  (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS chars_in,
  count(*) AS rows_kept,
  CAST(sum(n_chars) AS BIGINT) AS chars_kept,
  max(doc_id) AS max_id_kept
FROM documents
WHERE n_chars >= 100 AND lang <> 'zh'
"""

ORACLE_SQL["q404_jpeg12_decode"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 11 + 6 AS INTEGER) AS width,
       CAST(doc_id % 5 + 4 AS INTEGER) AS height,
       CAST((doc_id % 5 + 4) * (doc_id % 11 + 6) * 3 * 2 AS BIGINT)
         AS payload_bytes
FROM documents
WHERE doc_id < 150
ORDER BY media_id
"""

ORACLE_SQL["q405_count_min_sketch"] = """
WITH stream AS (
  SELECT CAST(l_partkey % 500 AS VARCHAR) AS k FROM lineitem
), cells AS (
  SELECT d.depth,
         CAST('0x' || substring(md5(CAST(d.depth AS VARCHAR) || ':' || k),
                                1, 8) AS BIGINT) % 64 AS col,
         count(*) AS cnt
  FROM stream, (SELECT unnest(range(4)) AS depth) d
  GROUP BY 1, 2
), truth AS (
  SELECT k, count(*) AS true_cnt FROM stream GROUP BY k
), probes AS (
  SELECT t.k, t.true_cnt, d.depth,
         CAST('0x' || substring(md5(CAST(d.depth AS VARCHAR) || ':' || t.k),
                                1, 8) AS BIGINT) % 64 AS col
  FROM truth t, (SELECT unnest(range(4)) AS depth) d
), est AS (
  SELECT p.k, any_value(p.true_cnt) AS true_cnt,
         min(COALESCE(c.cnt, 0)) AS cms_est
  FROM probes p LEFT JOIN cells c ON p.depth = c.depth AND p.col = c.col
  GROUP BY p.k
)
SELECT k, true_cnt, cms_est, cms_est - true_cnt AS overcount
FROM est ORDER BY true_cnt DESC, k LIMIT 30
"""

ORACLE_SQL["q406_robots_filter"] = """
WITH urls AS (
  SELECT doc_id, source AS host,
         '/docs/' || CASE WHEN doc_id % 7 = 0 THEN 'private/'
                          WHEN doc_id % 7 = 1 THEN 'private/ok/'
                          ELSE 'public/' END || doc_id AS path
  FROM documents
), rules(rhost, verdict, prefix) AS (
  VALUES ('*', 'disallow', '/docs/private'),
         ('*', 'allow', '/docs/private/ok'),
         ('src0', 'disallow', '/docs')
), expanded AS (
  SELECT h.host, r.verdict, r.prefix
  FROM (SELECT DISTINCT host FROM urls) h
  JOIN rules r ON r.rhost = h.host OR r.rhost = '*'
), matched AS (
  SELECT u.doc_id,
         max_by(e.verdict,
                length(e.prefix) * 2
                + CAST(e.verdict = 'allow' AS INTEGER)) AS verdict
  FROM urls u JOIN expanded e
    ON u.host = e.host AND starts_with(u.path, e.prefix)
  GROUP BY u.doc_id
)
SELECT u.doc_id, u.host, u.path,
       COALESCE(m.verdict = 'allow', TRUE) AS allowed
FROM urls u LEFT JOIN matched m ON u.doc_id = m.doc_id
ORDER BY u.doc_id
"""









# ---------------------------------------------------------------------------
# Precomputed-input oracles (round-2 verdict item: oracle-ify the
# rows-only queries whose outputs are bit-deterministic).
#
# q367 (zlib compressibility) and q380 (BPE token counts) cannot be
# expressed in DuckDB SQL alone (no zlib, no iterative merge loop), but
# their PER-DOCUMENT values are pure deterministic functions of the
# document text. So we recompute those values here driver-side in pure
# Python — zlib level-6 bytes are fully specified; the BPE merge loop
# is the same Sennrich Algorithm-1 reference loop — and embed them as a
# VALUES table keyed by md5(text). The banding / joining / aggregation
# under test then runs as genuine DuckDB SQL against the documents
# view. Keying on md5(text) (not doc_id) makes one oracle string valid
# for EVERY fixture scale at once: the per-doc value is a function of
# the text, and each sf dir's texts are embedded (fixture texts are
# globally distinct; an md5 collision across scales would be harmless
# anyway because the value is text-determined).
#
# What this checks that rows-only did not: Spark's distributed
# Arrow-batched UDF application, the banding boundaries, and the final
# aggregation all hash-compare against an independent sequential
# recomputation. If the fixture parquet is absent (foreign
# environment), the entries are simply not installed and the driver
# falls back to the declared rows-only check.
#
# Installation is LAZY + memoized (round-3 advice fix: the old
# module-import side effect cost multi-second zlib + BPE recompute for
# every consumer of plans.oracle and hardcoded absolute fixture
# paths): callers that actually serve oracles — __spark_entry__.
# oracle_sql(), tools/replica_check.py, tests/test_oracle.py — invoke
# install_precomputed_oracles() first; everyone else imports
# ORACLE_SQL instantly. The fixture root derives from the same
# SPARK_GRAFT_SF_DIR mechanism bench.py uses (parent dir of the
# configured sf dir, scanning its sf* siblings) so the values cover
# every fixture scale the driver might run at.
# ---------------------------------------------------------------------------
_PRECOMPUTED_INSTALLED = False


def install_precomputed_oracles() -> None:
    global _PRECOMPUTED_INSTALLED
    if _PRECOMPUTED_INSTALLED:
        return
    _PRECOMPUTED_INSTALLED = True

    import glob
    import hashlib
    import os
    import zlib

    import duckdb

    from luxo_rs_spark.functions.bpe import (
        _encode_word,
        _word_freqs,
        train_from_freqs,
    )

    sf_root = os.path.dirname(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
    )
    sf_dirs = sorted(glob.glob(os.path.join(sf_root, "sf*")))
    corpora = []
    for d in sf_dirs:
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            continue
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT doc_id, text FROM '{p}' ORDER BY doc_id"
        ).fetchall()
        con.close()
        corpora.append(rows)
    if not corpora:
        return

    # --- q367: zlib level-6 compression ratio per text --------------------
    ratio_vals: dict[str, float] = {}
    for rows in corpora:
        for _id, t in rows:
            if not t:
                continue
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in ratio_vals:
                b = t.encode("utf-8")
                ratio_vals[h] = len(zlib.compress(b, 6)) / len(b)
    values367 = ",\n  ".join(
        f"('{h}', {r!r})" for h, r in sorted(ratio_vals.items())
    )
    ORACLE_SQL["q367_compressibility"] = f"""
WITH ratio(h, r) AS (VALUES
  {values367}
), rated AS (
  SELECT d.source, ratio.r
  FROM documents d JOIN ratio ON md5(d.text) = ratio.h
)
SELECT source,
       CASE WHEN r < 0.3 THEN 'high_repetition'
            WHEN r < 0.7 THEN 'normal'
            ELSE 'incompressible' END AS band,
       cast(count(*) AS BIGINT) AS n_docs,
       round(avg(r), 4) AS avg_ratio
FROM rated
GROUP BY source, band
ORDER BY source, band
"""

    # --- q380: BPE token count per text (per-corpus merge table) ----------
    tok_vals: dict[str, int] = {}
    for rows in corpora:
        sample = [t for _id, t in rows[:1024]]
        merges = train_from_freqs(_word_freqs(sample), 384)
        ranks = {p: i for i, p in enumerate(merges)}
        word_cache: dict[str, int] = {}
        for _id, t in rows:
            h = hashlib.md5((t or "").encode("utf-8")).hexdigest()
            n = 0
            for w in (t or "").split():
                c = word_cache.get(w)
                if c is None:
                    c = len(_encode_word(w, ranks))
                    word_cache[w] = c
                n += c
            # The SQL joins on md5(text) alone, so a text shared by two
            # corpora must tokenize identically under both corpus models
            # (the merge tables are trained per corpus). Assert instead
            # of silently keeping first-wins (round-5 ADVICE).
            if h in tok_vals and tok_vals[h] != n:
                raise AssertionError(
                    f"q380 oracle: md5 {h} tokenizes to {tok_vals[h]} and "
                    f"{n} under different corpus models; the hash-keyed "
                    "VALUES oracle cannot represent this corpus"
                )
            tok_vals[h] = n
    values380 = ",\n  ".join(
        f"('{h}', {n})" for h, n in sorted(tok_vals.items())
    )
    ORACLE_SQL["q380_bpe_tokenize"] = f"""
WITH tok(h, n_tokens) AS (VALUES
  {values380}
), t AS (
  SELECT d.source, d.n_chars, tok.n_tokens
  FROM documents d JOIN tok ON md5(d.text) = tok.h
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS sum_tokens,
       round(cast(sum(n_chars) AS DOUBLE) / sum(n_tokens), 2)
         AS chars_per_token
FROM t
GROUP BY source
ORDER BY source
"""

    # --- q416: unigram-LM piece count per text (per-corpus model) ---------
    from luxo_rs_spark.functions.unigram import (
        text_word_freqs,
        train_unigram,
        viterbi,
    )

    piece_vals: dict[str, int] = {}
    for rows in corpora:
        train_texts = [t for _id, t in rows if _id < 512]
        probs = train_unigram(
            text_word_freqs(train_texts), seed_multi=384, target_multi=192
        )
        wcache: dict[str, int] = {}
        for _id, t in rows:
            h = hashlib.md5((t or "").encode("utf-8")).hexdigest()
            n = 0
            for w in (t or "").split():
                c = wcache.get(w)
                if c is None:
                    c = len(viterbi(w, probs))
                    wcache[w] = c
                n += c
            # Same cross-corpus consistency contract as q380 above: the
            # unigram model is trained per corpus (doc_id < 512 slice),
            # so a text repeated across corpora must piece-count equally
            # under every model or the md5-keyed oracle is ambiguous.
            if h in piece_vals and piece_vals[h] != n:
                raise AssertionError(
                    f"q416 oracle: md5 {h} piece-counts to "
                    f"{piece_vals[h]} and {n} under different corpus "
                    "models; the hash-keyed VALUES oracle cannot "
                    "represent this corpus"
                )
            piece_vals[h] = n
    values416 = ",\n  ".join(
        f"('{h}', {n})" for h, n in sorted(piece_vals.items())
    )
    ORACLE_SQL["q416_unigram_tokenize"] = f"""
WITH tok(h, n_pieces) AS (VALUES
  {values416}
), t AS (
  SELECT d.source, d.n_chars, tok.n_pieces
  FROM documents d JOIN tok ON md5(d.text) = tok.h
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_pieces) AS BIGINT) AS sum_pieces,
       round(cast(sum(n_chars) AS DOUBLE) / sum(n_pieces), 2)
         AS chars_per_piece
FROM t
GROUP BY source
ORDER BY source
"""

    # --- q423: IMA ADPCM decode stats (sequential recompute) --------------
    # The synth->encode path imports the media module's encoder (the
    # q380 convention: the oracle re-runs it sequentially), but the
    # DECODE is retyped here inline from the public IMA step tables so
    # a decoder bug in media.py cannot self-certify.
    from luxo_rs_spark.multimodal.media import _ima_adpcm_encode

    _STEPS = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ]
    _IDX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]

    def _ref_nib(nib: int, pred: int, idx: int) -> tuple[int, int]:
        step = _STEPS[idx]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IDX[nib]))
        return pred, idx

    def _ref_adpcm_decode(
        data: bytes, align: int, total: int, channels: int = 1
    ) -> list[int]:
        import struct as _s

        chans: list[list[int]] = [[] for _ in range(channels)]
        groups = (align - 4 * channels) // (4 * channels)
        for b0 in range(0, len(data), align):
            block = data[b0 : b0 + align]
            states = []
            for c in range(channels):
                pred, idx, _r = _s.unpack_from("<hBB", block, 4 * c)
                chans[c].append(pred)
                states.append([pred, idx])
            p = 4 * channels
            if channels == 1:
                st = states[0]
                for byte in block[4:]:
                    for nib in (byte & 0x0F, byte >> 4):
                        st[0], st[1] = _ref_nib(nib, st[0], st[1])
                        chans[0].append(st[0])
            else:
                # stereo: interleaved 4-byte-per-channel nibble groups
                for _g in range(groups):
                    for c in range(channels):
                        st = states[c]
                        for byte in block[p : p + 4]:
                            for nib in (byte & 0x0F, byte >> 4):
                                st[0], st[1] = _ref_nib(nib, st[0], st[1])
                                chans[c].append(st[0])
                        p += 4
        out: list[int] = []
        for c in range(channels):
            out.extend(chans[c][:total])
        return out

    import numpy as _np

    adpcm_vals: dict[tuple[str, int], tuple[int, int, int, int]] = {}
    for rows in corpora:
        for _id, t in rows:
            if _id >= 300:
                continue
            par = _id % 2  # odd ids are the round-7 STEREO lanes
            h = hashlib.md5((t or "").encode("utf-8")).hexdigest()
            if (h, par) in adpcm_vals:
                continue
            b = (t or "x").encode("utf-8")[:1500]
            mono = (
                (_np.frombuffer(b, dtype=_np.uint8).astype(_np.int32) - 100)
                * 231
            ).astype("<i2")
            if par:
                samples = _np.stack([mono, mono[::-1]], axis=1)
            else:
                samples = mono
            dec = _ref_adpcm_decode(
                _ima_adpcm_encode(samples, 256),
                256,
                len(mono),
                channels=2 if par else 1,
            )
            adpcm_vals[(h, par)] = (len(dec), sum(dec), min(dec), max(dec))
    values423 = ",\n  ".join(
        f"('{h}', {par}, {n}, {s}, {mn}, {mx})"
        for (h, par), (n, s, mn, mx) in sorted(adpcm_vals.items())
    )
    ORACLE_SQL["q423_adpcm_decode"] = f"""
WITH st(h, par, n_samples, sample_sum, sample_min, sample_max) AS (VALUES
  {values423}
)
SELECT d.doc_id AS media_id,
       8000 AS sample_rate,
       CAST(st.n_samples AS BIGINT) AS n_samples,
       CAST(st.sample_sum AS BIGINT) AS sample_sum,
       CAST(st.sample_min AS INTEGER) AS sample_min,
       CAST(st.sample_max AS INTEGER) AS sample_max
FROM documents d JOIN st ON md5(d.text) = st.h AND d.doc_id % 2 = st.par
WHERE d.doc_id < 300
ORDER BY media_id
"""

    # --- q437 (round 7): the audio track's codec cycles by doc_id%4 —
    # lanes 0 (PCM) / 1 (mu-law) / 3 (A-law) stay PURE-SQL per-char LUT
    # recomputes (the q417/q427 constants); lane 2 (IMA ADPCM) is a
    # sequential decode and embeds text-keyed VALUES exactly like q423,
    # using the SAME independently-retyped step-table decoder.
    adp437: dict[tuple[str, int], tuple[int, int, int, int]] = {}
    for rows in corpora:
        for _id, t in rows:
            if _id >= 300 or _id % 4 != 2:
                continue
            reps = _id % 3 + 1
            hh = hashlib.md5((t or "").encode("utf-8")).hexdigest()
            if (hh, reps) in adp437:
                continue
            data = hh.encode("ascii") * (reps * 24)
            samples = (
                (_np.frombuffer(data, dtype=_np.uint8).astype(_np.int32)
                 - 100) * 231
            ).astype("<i2")
            dec = _ref_adpcm_decode(
                _ima_adpcm_encode(samples, 256), 256, len(samples)
            )
            adp437[(hh, reps)] = (len(dec), sum(dec), min(dec), max(dec))
    values437 = ",\n  ".join(
        f"('{hh}', {reps}, {n}, {s}, {mn}, {mx})"
        for (hh, reps), (n, s, mn, mx) in sorted(adp437.items())
    ) or "('x', -1, 0, 0, 0, 0)"
    ORACLE_SQL["q437_avi_av_demux"] = f"""
WITH pcml(ch, v) AS (VALUES
  ('0', -12012), ('1', -11781), ('2', -11550), ('3', -11319),
  ('4', -11088), ('5', -10857), ('6', -10626), ('7', -10395),
  ('8', -10164), ('9', -9933),  ('a', -693),   ('b', -462),
  ('c', -231),   ('d', 0),      ('e', 231),    ('f', 462)
), glut(law, ch, lin) AS (VALUES
  ('u', '0', -3900), ('a', '0', -11008),
  ('u', '1', -3772), ('a', '1', -10496),
  ('u', '2', -3644), ('a', '2', -12032),
  ('u', '3', -3516), ('a', '3', -11520),
  ('u', '4', -3388), ('a', '4', -8960),
  ('u', '5', -3260), ('a', '5', -8448),
  ('u', '6', -3132), ('a', '6', -9984),
  ('u', '7', -3004), ('a', '7', -9472),
  ('u', '8', -2876), ('a', '8', -15104),
  ('u', '9', -2748), ('a', '9', -14592),
  ('u', 'a', -356),  ('a', 'a', -1312),
  ('u', 'b', -340),  ('a', 'b', -1504),
  ('u', 'c', -324),  ('a', 'c', -1440),
  ('u', 'd', -308),  ('a', 'd', -1120),
  ('u', 'e', -292),  ('a', 'e', -1056),
  ('u', 'f', -276),  ('a', 'f', -1248)
), adp(ah, areps, an, asum, amn, amx) AS (VALUES
  {values437}
), t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 4 + 2 AS INTEGER) AS n_frames,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h,
         CAST(doc_id % 3 + 1 AS INTEGER) AS reps,
         CAST(doc_id % 4 AS INTEGER) AS lane
  FROM documents WHERE doc_id < 300
), per_char AS (
  SELECT doc_id, lane, reps, substring(hx, CAST(i AS INTEGER), 1) AS ch
  FROM t, unnest(range(1, 33)) AS u(i)
  WHERE lane <> 2
), agg AS (
  SELECT p.doc_id, any_value(p.reps) AS reps,
         sum(CASE WHEN p.lane = 0 THEN pl.v ELSE gl.lin END) AS s,
         min(CASE WHEN p.lane = 0 THEN pl.v ELSE gl.lin END) AS mn,
         max(CASE WHEN p.lane = 0 THEN pl.v ELSE gl.lin END) AS mx
  FROM per_char p
  LEFT JOIN pcml pl ON p.lane = 0 AND pl.ch = p.ch
  LEFT JOIN glut gl
    ON gl.law = CASE p.lane WHEN 1 THEN 'u' WHEN 3 THEN 'a' END
   AND gl.ch = p.ch
  GROUP BY p.doc_id
), stats AS (
  SELECT doc_id, CAST(32 * reps AS BIGINT) AS n_samples,
         CAST(s * reps AS BIGINT) AS sample_sum,
         CAST(mn AS INTEGER) AS sample_min,
         CAST(mx AS INTEGER) AS sample_max
  FROM agg
  UNION ALL
  SELECT t.doc_id, CAST(a.an AS BIGINT), CAST(a.asum AS BIGINT),
         CAST(a.amn AS INTEGER), CAST(a.amx AS INTEGER)
  FROM t JOIN adp a ON a.ah = t.hx AND a.areps = t.reps
  WHERE t.lane = 2
)
SELECT t.doc_id AS media_id, t.n_frames, t.w AS width, t.h AS height,
       8000 AS sample_rate, st.n_samples, st.sample_sum,
       st.sample_min, st.sample_max
FROM t JOIN stats st ON st.doc_id = t.doc_id
ORDER BY media_id
"""

    # --- q33 + q40: per-doc SimHash signature and fnv1a64 fingerprint -----
    # (round-3 verdict item #5: these are fully deterministic functions
    # of the text, so the per-doc value is recomputed here sequentially
    # — same tokenize/shingle/fnv1a spec, independent of Spark's
    # distributed execution — and the PAIRING/banding under test runs
    # as genuine DuckDB SQL: q33's chunk-banded join is exact for
    # hamming <= 3 by pigeonhole, so an all-pairs xor/bit_count in SQL
    # is the same relation; q40's min/max runs over the embedded
    # per-doc values.) Docs with < 3 words yield no shingles and are
    # absent from both outputs — the inner join reproduces that.
    import re

    from luxo_rs_spark.functions.fnv1a import fnv1a64_bytes_py

    def _doc_words(t: str) -> list[str]:
        t = (t or "").strip().lower()
        return re.split(r"\s+", t) if t else []

    def _doc_shingles(t: str, n: int = 3) -> list[str]:
        w = _doc_words(t)
        if len(w) < n:
            return []
        return list(
            dict.fromkeys(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
        )

    def _signed64(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    fp_vals: dict[str, tuple[int, int]] = {}
    sim_vals: dict[str, int] = {}
    for rows in corpora:
        for _id, t in rows:
            h = hashlib.md5((t or "").encode("utf-8")).hexdigest()
            if h in fp_vals:
                continue
            hs = [
                fnv1a64_bytes_py(s.encode("utf-8"))
                for s in _doc_shingles(t)
            ]
            if not hs:
                continue
            signed = [_signed64(x) for x in hs]
            fp_vals[h] = (min(signed), max(signed))
            sim_u = 0
            for bit in range(64):
                vote = sum(
                    1 if (x >> bit) & 1 else -1 for x in hs
                )
                if vote > 0:
                    sim_u |= 1 << bit
            sim_vals[h] = _signed64(sim_u)

    values40 = ",\n  ".join(
        f"('{h}', {lo}, {hi})" for h, (lo, hi) in sorted(fp_vals.items())
    )
    ORACLE_SQL["q40_fingerprint"] = f"""
WITH fp(h, lo, hi) AS (VALUES
  {values40}
)
SELECT d.doc_id,
       CAST(fp.lo AS BIGINT) AS fp_min,
       CAST(fp.hi AS BIGINT) AS fp_max
FROM documents d JOIN fp ON md5(d.text) = fp.h
ORDER BY d.doc_id
"""

    values33 = ",\n  ".join(
        f"('{h}', {s})" for h, s in sorted(sim_vals.items())
    )
    ORACLE_SQL["q33_simhash_neardup"] = f"""
WITH sims(h, sh) AS (VALUES
  {values33}
), sd AS (
  SELECT d.doc_id, CAST(sims.sh AS BIGINT) AS sh
  FROM documents d JOIN sims ON md5(d.text) = sims.h
)
SELECT a.doc_id AS da, b.doc_id AS db,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sd a JOIN sd b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
ORDER BY da, db
"""

    # q446 (round 7): the leakage audit composes the q33 near-dup
    # relation with the q67 fnv1a split assignment — both already
    # independently retyped here — keeping cross-split pairs only.
    ORACLE_SQL["q446_split_leakage_audit"] = f"""
WITH RECURSIVE sims(h, sh) AS (VALUES
  {values33}
), f(doc_id, k, state) AS (
  SELECT doc_id, 0, CAST(14695981039346656037 AS HUGEINT) FROM documents
  UNION ALL
  SELECT doc_id, k + 1,
         (xor(state, (CAST(doc_id AS HUGEINT) >> (8 * k)) & 255)
          * 1099511628211) % 18446744073709551616
  FROM f WHERE k < 8
), split_of AS (
  SELECT doc_id,
         CASE WHEN state % 10 < 8 THEN 'train'
              WHEN state % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM f WHERE k = 8
), sd AS (
  SELECT d.doc_id, CAST(sims.sh AS BIGINT) AS sh, s.split
  FROM documents d
  JOIN sims ON md5(d.text) = sims.h
  JOIN split_of s ON s.doc_id = d.doc_id
)
SELECT a.doc_id AS da, b.doc_id AS db,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming,
       a.split AS split_a, b.split AS split_b
FROM sd a JOIN sd b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3 AND a.split <> b.split
ORDER BY da, db
"""

    # --- Embedding-corpus-keyed oracles: q361, q36, q64, q278, q237,
    # q288 ------------------------------------------------------------------
    # These six queries are WHOLE-CORPUS results of fully deterministic
    # seeded machinery (JL projection, hyperplane LSH, driver-sample
    # kmeans, grid-quantized ADC), so the per-corpus answer is
    # recomputed here sequentially and embedded as a VALUES block keyed
    # by a corpus discriminator of the embeddings view — (count,
    # sum(vec_id), exact content checksum); count+ids alone collide
    # across fixture scales that share id ranges. Output similarities
    # are recomputed with the SAME sequential left-to-right double fold
    # functions/vectors.py uses; threshold/selection decisions use a
    # numpy prefilter with a 1e-6 margin and a seq-fold recheck inside
    # the margin, so BLAS-vs-fold rounding can never flip a decision.
    # Squares are products (x*x), never pow: JVM Math.pow(x,2) == x*x
    # exactly, Python's **/math.pow is NOT. The 4-decimal round happens
    # in SQL like every other oracle.
    import math
    from collections import defaultdict

    import numpy as np

    from luxo_rs_spark.functions.xxh64 import xxh64_long_signed
    from luxo_rs_spark.operators.similarity import (
        derive_lsh_bands,
        kmeans_euclidean_numpy,
        kmeans_numpy,
        opq_train_numpy,
        pq_distance_table,
        pq_encode_numpy,
    )

    proj = (
        np.random.default_rng(42).standard_normal((64, 16)) / np.sqrt(16)
    ).astype(np.float64)
    planes6 = (
        np.random.default_rng(42).standard_normal((6, 64)).astype(np.float64)
    )

    def _seq_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def _seq_cos(a, b) -> float:
        return _seq_dot(a, b) / (
            math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b))
        )

    b361, b36, b64, b278, b237, b288, b396 = [], [], [], [], [], [], []
    b430: list = []
    b439: list = []
    b452: list = []
    b473: list = []
    seen_keys: set = set()
    for d in sf_dirs:
        p = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(p):
            continue
        con = duckdb.connect()
        erows = con.execute(
            f"SELECT vec_id, embedding FROM '{p}' ORDER BY vec_id"
        ).fetchall()
        con.close()
        if not erows or erows[0][0] != 0:
            continue
        ids = [r[0] for r in erows]
        vecs = [list(r[1]) for r in erows]
        nvec = len(ids)
        mat = np.array(vecs, dtype=np.float64)
        csum = sum(
            int(math.floor(float(v[0]) * 1_000_000)) for v in vecs
        )
        key = (nvec, sum(ids), csum)
        if key in seen_keys:
            continue
        seen_keys.add(key)
        idx_of = {v: i for i, v in enumerate(ids)}
        norms = np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        mnorm = mat / norms

        # q361 — JL-projected top-10 of vec 0 (float32-truncated space)
        red = (mat @ proj).astype(np.float32)
        tgt = red[idx_of[0]]
        ntgt = math.sqrt(_seq_dot(tgt, tgt))
        scored = [
            (
                vid,
                _seq_dot(red[i], tgt)
                / (math.sqrt(_seq_dot(red[i], red[i])) * ntgt),
            )
            for i, vid in enumerate(ids)
            if vid != 0
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        b361.append((key, scored[:10]))

        # q36 — hyperplane-LSH multiprobe (radius 2) top-5 of vec 1
        sigs6 = (mat @ planes6.T > 0) @ (1 << np.arange(6, dtype=np.int64))
        t1 = idx_of[1]
        qsig = int(sigs6[t1])
        qvec = vecs[t1]
        scored = [
            (ids[i], _seq_cos(vecs[i], qvec))
            for i in range(nvec)
            if ids[i] != 1 and bin(int(sigs6[i]) ^ qsig).count("1") <= 2
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        b36.append((key, scored[:5]))

        # q64 — IVF top-5 of vec 1 (16 centroids, 4 probes). The
        # kmeans training matrix replicates kmeans_centroids'
        # hash-STRIDED driver sample exactly: ids where
        # pmod(xxhash64(id), ceil(N/4096)) == 0, id-ordered, first
        # 4096 (stride 1 below 4096 rows — the sf1 gate caught q278
        # diverging when the stride first exceeded 1).
        stride = max(1, -(-nvec // 4096))
        if stride == 1:
            train = mat
        else:
            sel = [
                i
                for i in range(nvec)
                if xxh64_long_signed(ids[i]) % stride == 0
            ][:4096]
            train = mat[sel]
        cent = kmeans_numpy(train, 16, 42, 8)
        qn1 = mat[t1] / max(np.linalg.norm(mat[t1]), 1e-12)
        probes = {int(c) for c in np.argsort(-(cent @ qn1))[:4]}
        assign = np.argmax(mnorm @ cent.T, axis=1)
        scored = [
            (ids[i], _seq_cos(vecs[i], qvec))
            for i in range(nvec)
            if int(assign[i]) in probes and ids[i] != 1
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        b64.append((key, scored[:5]))

        # q430 — persisted-IVF pruned probe of vec 2: SAME centroids
        # as q64 (16, seed 42, strided train), 4 probe clusters for
        # vec 2, top-8 exact cosines with the assigned cluster id
        t2 = idx_of[2]
        q2 = vecs[t2]
        qn2 = mat[t2] / max(np.linalg.norm(mat[t2]), 1e-12)
        probes2 = {int(c) for c in np.argsort(-(cent @ qn2))[:4]}
        scored430 = [
            (ids[i], int(assign[i]), _seq_cos(vecs[i], q2))
            for i in range(nvec)
            if int(assign[i]) in probes2 and ids[i] != 2
        ]
        scored430.sort(key=lambda kv: (-kv[2], kv[0]))
        b430.append((key, scored430[:8]))

        # q278 — IVF-ADC: same probes, ADC shortlist on the uniform
        # grid (exact double arithmetic, same expression order as the
        # Column fold), exact re-rank of the 32-id shortlist
        lo = min(min(v) for v in vecs)
        hi = max(max(v) for v in vecs)
        width = (hi - lo) / 16
        adcs = []
        for i in range(nvec):
            if int(assign[i]) not in probes or ids[i] == 1:
                continue
            acc = 0.0
            for x, qi in zip(vecs[i], qvec):
                code = min(15, math.floor((x - lo) / (hi - lo) * 16))
                recon = lo + (code + 0.5) * width
                dv = qi - recon
                acc = acc + dv * dv
            adcs.append((acc, ids[i]))
        short_ids = {vid for _a, vid in sorted(adcs)[:32]}
        scored = [
            (ids[i], _seq_cos(vecs[i], qvec))
            for i in range(nvec)
            if ids[i] in short_ids
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        b278.append((key, scored[:5]))

        # q439 — persisted IVF+ADC probe of vec 3: SAME centroids and
        # global [lo, hi] grid, 256 codes stored center-shifted as
        # TINYINT (c = code-128), ADC fold in the probe's exact op
        # order (recon = lo + ((c+128)+0.5)*width, dv*dv, left fold),
        # shortlist 32 by (adc, id), exact-cosine top-8 re-rank with
        # the assigned cluster id
        t3 = idx_of[3]
        q3 = vecs[t3]
        qn3 = mat[t3] / max(np.linalg.norm(mat[t3]), 1e-12)
        probes3 = {int(c) for c in np.argsort(-(cent @ qn3))[:4]}
        width256 = (hi - lo) / 256
        adcs439 = []
        for i in range(nvec):
            if int(assign[i]) not in probes3 or ids[i] == 3:
                continue
            acc = 0.0
            for x, qi in zip(vecs[i], q3):
                c_st = min(255, math.floor((x - lo) / (hi - lo) * 256)) - 128
                recon = lo + ((c_st + 128.0) + 0.5) * width256
                dv = qi - recon
                acc = acc + dv * dv
            adcs439.append((acc, ids[i]))
        short439 = {vid for _a, vid in sorted(adcs439)[:32]}
        scored439 = [
            (ids[i], int(assign[i]), _seq_cos(vecs[i], q3))
            for i in range(nvec)
            if ids[i] in short439
        ]
        scored439.sort(key=lambda kv: (-kv[2], kv[0]))
        b439.append((key, scored439[:8]))

        # q452 — trained-PQ IVF probe of vec 3: SAME coarse centroids
        # (cent) and probed clusters as q439, per-subspace Lloyd
        # codebooks trained on residuals of the SAME strided sample
        # (seed 42+j per subspace), codes / asymmetric-distance tables
        # / left-folded ADC sums all via the shared similarity-module
        # functions so Spark's per-Arrow-batch encode and this
        # whole-corpus replay agree bit-for-bit; shortlist 32 by
        # (adc, id), exact-cosine top-8 re-rank with the cluster id
        train_n = train / np.maximum(
            np.linalg.norm(train, axis=1, keepdims=True), 1e-12
        )
        assign_tr = np.argmax(train_n @ cent.T, axis=1)
        R_tr = train - cent[assign_tr]
        books = np.stack(
            [
                kmeans_euclidean_numpy(
                    np.ascontiguousarray(R_tr[:, j * 8 : (j + 1) * 8]),
                    256,
                    42 + j,
                    8,
                )
                for j in range(8)
            ]
        )
        cand452 = [
            i
            for i in range(nvec)
            if int(assign[i]) in probes3 and ids[i] != 3
        ]
        codes452 = pq_encode_numpy(
            mat[cand452], assign[cand452], cent, books
        )
        q3a = np.asarray(q3, dtype=np.float64)
        tabs452 = {
            c: pq_distance_table(q3a, cent[c], books) for c in probes3
        }
        adcs452 = []
        for row, i in enumerate(cand452):
            tab = tabs452[int(assign[i])]
            acc = float(tab[0][codes452[row][0]])
            for j in range(1, 8):
                acc = acc + float(tab[j][codes452[row][j]])
            adcs452.append((acc, ids[i]))
        short452 = {vid for _a, vid in sorted(adcs452)[:32]}
        scored452 = [
            (ids[i], int(assign[i]), _seq_cos(vecs[i], q3))
            for i in range(nvec)
            if ids[i] in short452
        ]
        scored452.sort(key=lambda kv: (-kv[2], kv[0]))
        b452.append((key, scored452[:8]))

        # q473 — OPQ probe of vec 3: same coarse layer and probes,
        # rotation + codebooks from opq_train_numpy on the SAME
        # strided-sample residuals (the numpy core Spark's trainer
        # calls), rotated-residual codes and distance tables, same
        # shortlist/re-rank arithmetic as q452
        rot473, books473 = opq_train_numpy(
            R_tr, m=8, n_codes=256, seed=42, iters=8, opq_iters=6
        )
        codes473 = pq_encode_numpy(
            mat[cand452], assign[cand452], cent, books473, rot473
        )
        tabs473 = {
            c: pq_distance_table(q3a, cent[c], books473, rot473)
            for c in probes3
        }
        adcs473 = []
        for row, i in enumerate(cand452):
            tab = tabs473[int(assign[i])]
            acc = float(tab[0][codes473[row][0]])
            for j in range(1, 8):
                acc = acc + float(tab[j][codes473[row][j]])
            adcs473.append((acc, ids[i]))
        short473 = {vid for _a, vid in sorted(adcs473)[:32]}
        scored473 = [
            (ids[i], int(assign[i]), _seq_cos(vecs[i], q3))
            for i in range(nvec)
            if ids[i] in short473
        ]
        scored473.sort(key=lambda kv: (-kv[2], kv[0]))
        b473.append((key, scored473[:8]))

        # q237 — banded-LSH near-dup pairs at threshold 0.45 with the
        # corpus-adaptive band derivation (same formula, same seed)
        nb_, bb_ = derive_lsh_bands(nvec, None, None)
        planes_b = (
            np.random.default_rng(42)
            .standard_normal((nb_ * bb_, 64))
            .astype(np.float64)
        )
        bbits = (mat @ planes_b.T > 0).reshape(nvec, nb_, bb_)
        bsig = (bbits * (1 << np.arange(bb_, dtype=np.int64))).sum(axis=2)
        buckets: dict = defaultdict(list)
        for i in range(nvec):
            for b in range(nb_):
                buckets[(b, int(bsig[i, b]))].append(i)
        cand_pairs: set = set()
        for lst in buckets.values():
            for a_ in range(len(lst)):
                for c_ in range(a_ + 1, len(lst)):
                    cand_pairs.add((lst[a_], lst[c_]))  # ids ascending
        approx_all = mnorm @ mnorm.T
        pairs = []
        for i, j in cand_pairs:
            if approx_all[i, j] < 0.45 - 1e-6:
                continue
            sim = _seq_cos(vecs[i], vecs[j])
            if sim >= 0.45:
                pairs.append((ids[i], ids[j], sim))
        pairs.sort()
        b237.append((key, pairs))

        # q396 — partition-pruned LSH probe of vec 0 at the fixed
        # 8x8 band config (sharing >= 1 band signature with the
        # target), exact-cosine verified at 0.1 with margin recheck
        planes96 = (
            np.random.default_rng(42)
            .standard_normal((64, 64))
            .astype(np.float64)
        )
        bits96 = (mat @ planes96.T > 0).reshape(nvec, 8, 8)
        sig96 = (bits96 * (1 << np.arange(8, dtype=np.int64))).sum(axis=2)
        t0i = idx_of[0]
        q0 = vecs[t0i]
        probe_scored = []
        for i in range(nvec):
            if ids[i] == 0:
                continue
            if not any(sig96[i, b] == sig96[t0i, b] for b in range(8)):
                continue
            if float(mnorm[i] @ mnorm[t0i]) < 0.1 - 1e-6:
                continue
            sim = _seq_cos(vecs[i], q0)
            if sim >= 0.1:
                probe_scored.append((ids[i], sim))
        probe_scored.sort(key=lambda kv: (-kv[1], kv[0]))
        b396.append((key, probe_scored))

        # q288 — SemDeDup rollup: derived cluster count, min-id
        # survivor rule, numpy prefilter + seq-fold recheck at the
        # threshold margin
        ncl = max(16, math.ceil(nvec / 128))
        cent288 = kmeans_numpy(train, ncl, 42, 8)
        assign288 = np.argmax(mnorm @ cent288.T, axis=1)
        rows288 = []
        for c in sorted({int(a) for a in assign288}):
            members = np.where(assign288 == c)[0]
            sims_c = mnorm[members] @ mnorm[members].T
            ndup = 0
            for a_ in range(1, len(members)):
                over = np.where(sims_c[a_, :a_] >= 0.45 - 1e-6)[0]
                if len(over) and any(
                    _seq_cos(
                        vecs[members[b_]], vecs[members[a_]]
                    )
                    >= 0.45
                    for b_ in over
                ):
                    ndup += 1
            rows288.append((c, len(members), ndup))
        b288.append((key, rows288))

    def _corpus_sql(cols: str, values: list[str], select: str) -> str:
        # a sentinel row keeps the VALUES clause non-empty when every
        # corpus produced zero result rows (impossible key -1)
        body = ",\n  ".join(values) if values else ""
        sentinel = "(-1, -1, -1" + ", 0" * (cols.count(",") - 2) + ")"
        allvals = ",\n  ".join([sentinel] + ([body] if body else []))
        return f"""
WITH corp AS (
  SELECT count(*) AS n, sum(vec_id) AS s,
         sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)
                  AS BIGINT)) AS c
  FROM embeddings
), vals({cols}) AS (VALUES
  {allvals}
)
{select}
"""

    topk_select = """SELECT CAST(v.vec_id AS BIGINT) AS vec_id,
       round(v.sim, 4) AS sim
FROM vals v, corp x
WHERE v.n = x.n AND v.s = x.s AND v.c = x.c
ORDER BY sim DESC, vec_id"""
    for qname, blocks_ in (
        ("q361_random_projection_topk", b361),
        ("q36_ann_lsh_topk", b36),
        ("q64_ann_ivf_topk", b64),
        ("q278_ivf_adc_topk", b278),
        ("q396_lsh_bucketed_probe", b396),
    ):
        if not blocks_:
            continue
        vals = [
            f"({n}, {s}, {c}, {vid}, {sim!r})"
            for (n, s, c), top in blocks_
            for vid, sim in top
        ]
        ORACLE_SQL[qname] = _corpus_sql(
            "n, s, c, vec_id, sim", vals, topk_select
        )

    if b430:
        vals = [
            f"({n}, {s}, {c}, {vid}, {cl}, {sim!r})"
            for (n, s, c), top in b430
            for vid, cl, sim in top
        ]
        ORACLE_SQL["q430_ivf_pruned_probe"] = _corpus_sql(
            "n, s, c, vec_id, ivf_cluster, sim",
            vals,
            """SELECT CAST(v.vec_id AS BIGINT) AS vec_id,
       CAST(v.ivf_cluster AS INTEGER) AS ivf_cluster,
       round(v.sim, 4) AS sim
FROM vals v, corp x
WHERE v.n = x.n AND v.s = x.s AND v.c = x.c
ORDER BY sim DESC, vec_id""",
        )

    if b439:
        vals = [
            f"({n}, {s}, {c}, {vid}, {cl}, {sim!r})"
            for (n, s, c), top in b439
            for vid, cl, sim in top
        ]
        ORACLE_SQL["q439_ivf_adc_pruned_probe"] = _corpus_sql(
            "n, s, c, vec_id, ivf_cluster, sim",
            vals,
            """SELECT CAST(v.vec_id AS BIGINT) AS vec_id,
       CAST(v.ivf_cluster AS INTEGER) AS ivf_cluster,
       round(v.sim, 4) AS sim
FROM vals v, corp x
WHERE v.n = x.n AND v.s = x.s AND v.c = x.c
ORDER BY sim DESC, vec_id""",
        )

    if b452:
        vals = [
            f"({n}, {s}, {c}, {vid}, {cl}, {sim!r})"
            for (n, s, c), top in b452
            for vid, cl, sim in top
        ]
        ORACLE_SQL["q452_ivf_pq_trained_probe"] = _corpus_sql(
            "n, s, c, vec_id, ivf_cluster, sim",
            vals,
            """SELECT CAST(v.vec_id AS BIGINT) AS vec_id,
       CAST(v.ivf_cluster AS INTEGER) AS ivf_cluster,
       round(v.sim, 4) AS sim
FROM vals v, corp x
WHERE v.n = x.n AND v.s = x.s AND v.c = x.c
ORDER BY sim DESC, vec_id""",
        )

    if b473:
        vals = [
            f"({n}, {s}, {c}, {vid}, {cl}, {sim!r})"
            for (n, s, c), top in b473
            for vid, cl, sim in top
        ]
        ORACLE_SQL["q473_opq_ivf_probe"] = _corpus_sql(
            "n, s, c, vec_id, ivf_cluster, sim",
            vals,
            """SELECT CAST(v.vec_id AS BIGINT) AS vec_id,
       CAST(v.ivf_cluster AS INTEGER) AS ivf_cluster,
       round(v.sim, 4) AS sim
FROM vals v, corp x
WHERE v.n = x.n AND v.s = x.s AND v.c = x.c
ORDER BY sim DESC, vec_id""",
        )

    if b237:
        vals = [
            f"({n}, {s}, {c}, {va}, {vb}, {sim!r})"
            for (n, s, c), prs in b237
            for va, vb, sim in prs
        ]
        ORACLE_SQL["q237_embedding_neardup_lsh"] = _corpus_sql(
            "n, s, c, va, vb, sim",
            vals,
            """SELECT CAST(v.va AS BIGINT) AS va, CAST(v.vb AS BIGINT) AS vb,
       round(v.sim, 4) AS sim
FROM vals v, corp x
WHERE v.n = x.n AND v.s = x.s AND v.c = x.c
ORDER BY va, vb""",
        )

    if b288:
        vals = [
            f"({n}, {s}, {c}, {cl}, {nv}, {nd})"
            for (n, s, c), rows_ in b288
            for cl, nv, nd in rows_
        ]
        ORACLE_SQL["q288_semantic_dedup"] = _corpus_sql(
            "n, s, c, cluster, n_vectors, n_dups",
            vals,
            """SELECT CAST(v.cluster AS INTEGER) AS cluster,
       CAST(v.n_vectors AS BIGINT) AS n_vectors,
       CAST(v.n_dups AS BIGINT) AS n_dups
FROM vals v, corp x
WHERE v.n = x.n AND v.s = x.s AND v.c = x.c
ORDER BY cluster""",
        )


# q407: the SAME compiled rule literals the Spark query broadcasts
# (functions/robots.py translation, pinned by the RFC-example unit
# battery in tests/test_robots.py) embedded as a VALUES block — both
# engines then run identical column-pattern LIKE matching + max_by.
from luxo_rs_spark.functions.robots import compile_rules as _compile_robots
from luxo_rs_spark.plans.queries import _Q407_RULES

_q407_values = ",\n         ".join(
    f"('{h}', '{v}', '{lp}', {sp})"
    for h, v, lp, sp in _compile_robots(_Q407_RULES)
)
ORACLE_SQL["q407_robots_wildcards"] = f"""
WITH urls AS (
  SELECT doc_id, source AS host,
         '/site/' || CASE WHEN doc_id % 4 = 0 THEN 'tmp/'
                          WHEN doc_id % 4 = 1 THEN 'pub/'
                          WHEN doc_id % 4 = 2 THEN 'user/alice/'
                          ELSE 'user/bob/' END
                  || 'page' || doc_id
                  || CASE WHEN doc_id % 3 = 0 THEN '.php'
                          WHEN doc_id % 3 = 1 THEN '.html'
                          ELSE '' END AS path
  FROM documents
), rules(rhost, verdict, like_pat, spec) AS (
  VALUES {_q407_values}
), expanded AS (
  SELECT h.host, r.verdict, r.like_pat, r.spec
  FROM (SELECT DISTINCT host FROM urls) h
  JOIN rules r ON r.rhost = h.host OR r.rhost = '*'
), matched AS (
  SELECT u.doc_id,
         max_by(e.verdict,
                e.spec * 2 + CAST(e.verdict = 'allow' AS INTEGER))
           AS verdict
  FROM urls u JOIN expanded e
    ON u.host = e.host AND u.path LIKE e.like_pat
  GROUP BY u.doc_id
)
SELECT u.doc_id, u.host, u.path,
       COALESCE(m.verdict = 'allow', TRUE) AS allowed
FROM urls u LEFT JOIN matched m ON u.doc_id = m.doc_id
ORDER BY u.doc_id
"""


ORACLE_SQL["q408_k_anon_generalize"] = """
WITH recs AS (
  SELECT cast(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|'
           || cast(cast(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR) AS qi0,
         cast(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|'
           || cast(cast(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR) AS qi1,
         cast(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS qi2,
         cast(c_nationkey AS VARCHAR) AS qi3,
         '*' AS qi4
  FROM customer
), lev AS (
  SELECT 0 AS level, qi0 AS qi FROM recs
  UNION ALL SELECT 1, qi1 FROM recs
  UNION ALL SELECT 2, qi2 FROM recs
  UNION ALL SELECT 3, qi3 FROM recs
  UNION ALL SELECT 4, qi4 FROM recs
), counts AS (
  SELECT level, qi, cast(count(*) AS BIGINT) AS k
  FROM lev GROUP BY level, qi
), base AS (
  SELECT qi0, qi1, qi2, qi3, qi4, cast(count(*) AS BIGINT) AS k0
  FROM recs GROUP BY qi0, qi1, qi2, qi3, qi4
), melted AS (
  SELECT qi0, 0 AS level, qi0 AS qi FROM base
  UNION ALL SELECT qi0, 1, qi1 FROM base
  UNION ALL SELECT qi0, 2, qi2 FROM base
  UNION ALL SELECT qi0, 3, qi3 FROM base
  UNION ALL SELECT qi0, 4, qi4 FROM base
), minlev AS (
  SELECT m.qi0,
         cast(min(CASE WHEN c.k >= 5 THEN m.level END) AS INTEGER)
           AS min_level
  FROM melted m JOIN counts c ON c.level = m.level AND c.qi = m.qi
  GROUP BY m.qi0
), gnode AS (
  SELECT cast(max(min_level) AS INTEGER) AS global_level FROM minlev
), published AS (
  SELECT b.qi0, b.k0, l.min_level, g.global_level,
         CASE g.global_level WHEN 0 THEN b.qi0 WHEN 1 THEN b.qi1
              WHEN 2 THEN b.qi2 WHEN 3 THEN b.qi3 ELSE b.qi4 END
           AS final_qi
  FROM base b JOIN minlev l ON l.qi0 = b.qi0 CROSS JOIN gnode g
)
SELECT p.qi0, p.k0, p.min_level, p.global_level, p.final_qi,
       c.k AS final_k, c.k >= 5 AS k_anon_5
FROM published p
JOIN counts c ON c.level = p.global_level AND c.qi = p.final_qi
ORDER BY p.qi0
"""


ORACLE_SQL["q409_warc_cdx_probe"] = """
SELECT doc_id,
  200 AS status,
  lang,
  'Doc ' || doc_id AS title,
  length(text) AS n_chars,
  md5(text) AS text_md5
FROM documents
WHERE doc_id % 10 = 3
ORDER BY doc_id
"""


# q410: compiled output of parse_robots_txt + robots_rule_to_like on
# the two literal robots.txt bodies (parser pinned by the RFC group-
# semantics battery in tests/test_robots.py), embedded as VALUES; the
# own-file-replaces-default expansion and the gate run as genuine SQL.
from luxo_rs_spark.plans.queries import _q410_rules

_q410_values = ",\n         ".join(
    f"('{h}', '{v}', '{lp}', {sp})" for h, v, lp, sp in _q410_rules()
)
ORACLE_SQL["q410_robots_end_to_end"] = f"""
WITH urls AS (
  SELECT doc_id, source AS host,
         CASE doc_id % 7
              WHEN 0 THEN '/internal/page'
              WHEN 1 THEN '/draft/pub'
              WHEN 2 THEN '/draft/secret'
              WHEN 3 THEN '/docs/page'
              WHEN 4 THEN '/files/page'
              ELSE '/docs/page' END
         || doc_id
         || CASE doc_id % 7 WHEN 3 THEN '.html'
                            WHEN 5 THEN '.php'
                            ELSE '' END AS path
  FROM documents
), rules(rhost, verdict, like_pat, spec) AS (
  VALUES {_q410_values}
), hosts AS (SELECT DISTINCT source AS host FROM documents
), expanded AS (
  SELECT h.host, r.verdict, r.like_pat, r.spec
  FROM hosts h JOIN rules r ON r.rhost = h.host
  UNION ALL
  SELECT h.host, r.verdict, r.like_pat, r.spec
  FROM hosts h JOIN rules r ON r.rhost = '*'
  WHERE h.host NOT IN (SELECT rhost FROM rules WHERE rhost <> '*')
), matched AS (
  SELECT u.doc_id,
         max_by(e.verdict,
                e.spec * 2 + CAST(e.verdict = 'allow' AS INTEGER))
           AS verdict
  FROM urls u JOIN expanded e
    ON u.host = e.host AND u.path LIKE e.like_pat
  GROUP BY u.doc_id
)
SELECT u.doc_id, u.host, u.path,
       COALESCE(m.verdict = 'allow', TRUE) AS allowed
FROM urls u LEFT JOIN matched m ON u.doc_id = m.doc_id
ORDER BY u.doc_id
"""


# q411/q412: geometry is doc_id arithmetic (the synth encoder derives
# dims from doc_id; 8-bit RGB payload = h*w*3 bytes); matches_huffman
# is the cross-entropy-coder pixel-identity invariant — TRUE for every
# row, asserted by the oracle as a literal so a single diverging pixel
# between the QM-arithmetic and Huffman decodes hash-mismatches.
ORACLE_SQL["q411_jpeg_arith_decode"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 11 + 6 AS INTEGER) AS width,
       CAST(doc_id % 5 + 4 AS INTEGER) AS height,
       CAST((doc_id % 5 + 4) * (doc_id % 11 + 6) * 3 AS BIGINT)
         AS payload_bytes,
       TRUE AS matches_huffman
FROM documents
WHERE doc_id < 120
ORDER BY media_id
"""

ORACLE_SQL["q412_jpeg_arith_progressive"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 11 + 6 AS INTEGER) AS width,
       CAST(doc_id % 5 + 4 AS INTEGER) AS height,
       CAST((doc_id % 5 + 4) * (doc_id % 11 + 6) * 3 AS BIGINT)
         AS payload_bytes,
       TRUE AS matches_huffman
FROM documents
WHERE doc_id < 100
ORDER BY media_id
"""


ORACLE_SQL["q413_ngram_lm_perplexity"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     t -> t <> '') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks), 1)),
             i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])
           )) AS b
    FROM tok
  )
), train_uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(toks) AS w FROM tok WHERE doc_id % 5 <> 0)
  GROUP BY w
), n AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n_tok FROM train_uni
), train_bi AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
  FROM bg WHERE doc_id % 5 <> 0
  GROUP BY w1, w2
), scored AS (
  SELECT s.doc_id,
         CASE WHEN b.c IS NOT NULL
              THEN b.c / CAST(u1.c AS DOUBLE)
              ELSE 0.4 * COALESCE(u2.c, 1) / n.n_tok END AS p,
         CASE WHEN b.c IS NULL THEN 1 ELSE 0 END AS oov
  FROM bg s
  LEFT JOIN train_bi b ON s.w1 = b.w1 AND s.w2 = b.w2
  LEFT JOIN train_uni u1 ON s.w1 = u1.w
  LEFT JOIN train_uni u2 ON s.w2 = u2.w
  CROSS JOIN n
  WHERE s.doc_id % 5 = 0
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(oov) AS BIGINT) AS oov_bigrams,
       round(avg(-ln(p)), 3) AS log_ppl
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


# q414: GIF is lossless, so the oracle recomputes the FULL decoded RGB
# payload md5 — indices tile the md5 hex of the text, the 256-gray
# palette maps index i to (i, i, i), i.e. every tiled char appears
# three times in the payload
ORACLE_SQL["q414_gif_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h,
         substring(repeat(hx, CAST(h * w / 32 AS INTEGER) + 1),
                   1, h * w) AS s
  FROM t
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(h * w * 3 AS BIGINT) AS payload_bytes,
       md5(array_to_string(
             list_transform(range(1, h * w + 1),
               i -> repeat(substring(s, CAST(i AS INTEGER), 1), 3)),
             '')) AS payload_md5
FROM px ORDER BY media_id
"""


ORACLE_SQL["q415_substring_dup_spans"] = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n_chars
  FROM documents WHERE doc_id < 400
), grams AS (
  SELECT doc_id, g['pos'] AS pos, g['h'] AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(n_chars - 20 + 1, 0) + 1),
             i -> struct_pack(pos := i,
                              h := md5(substring(text, CAST(i AS INTEGER),
                                                 20)))
           )) AS g
    FROM d
  )
), dup AS (
  SELECT h FROM grams GROUP BY h HAVING count(*) >= 2
), marked AS (
  SELECT doc_id, pos FROM grams WHERE h IN (SELECT h FROM dup)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos - lag(pos) OVER w > 20 THEN 1 ELSE 0 END AS ns
  FROM marked
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), islands AS (
  SELECT doc_id,
         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island,
         pos
  FROM flagged
), spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + 20 - 1 AS e
  FROM islands GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_dup_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.dup_chars, 0) AS dup_chars,
       CASE WHEN d.n_chars > 0
            THEN round(COALESCE(p.dup_chars, 0)
                       / CAST(d.n_chars AS DOUBLE), 4)
            ELSE 0.0 END AS dup_frac
FROM d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# q417: the (law, companded hex char) -> 16-bit linear LUT is a
# text-independent constant of the G.711 spec, embedded literally
ORACLE_SQL["q417_g711_decode"] = """
WITH lut(law, ch, lin) AS (VALUES
  ('u', '0', -3900), ('a', '0', -11008),
  ('u', '1', -3772), ('a', '1', -10496),
  ('u', '2', -3644), ('a', '2', -12032),
  ('u', '3', -3516), ('a', '3', -11520),
  ('u', '4', -3388), ('a', '4', -8960),
  ('u', '5', -3260), ('a', '5', -8448),
  ('u', '6', -3132), ('a', '6', -9984),
  ('u', '7', -3004), ('a', '7', -9472),
  ('u', '8', -2876), ('a', '8', -15104),
  ('u', '9', -2748), ('a', '9', -14592),
  ('u', 'a', -356),  ('a', 'a', -1312),
  ('u', 'b', -340),  ('a', 'b', -1504),
  ('u', 'c', -324),  ('a', 'c', -1440),
  ('u', 'd', -308),  ('a', 'd', -1120),
  ('u', 'e', -292),  ('a', 'e', -1056),
  ('u', 'f', -276),  ('a', 'f', -1248)
), t AS (
  SELECT doc_id, md5(text) AS hx,
         CASE WHEN doc_id % 2 = 0 THEN 'u' ELSE 'a' END AS law,
         CAST(doc_id % 4 + 1 AS INTEGER) AS reps
  FROM documents WHERE doc_id < 300
), per_char AS (
  SELECT doc_id, law, reps,
         substring(hx, CAST(i AS INTEGER), 1) AS ch
  FROM t, unnest(range(1, 33)) AS u(i)
), agg AS (
  SELECT p.doc_id,
         any_value(p.reps) AS reps,
         sum(l.lin) AS sum1,
         min(l.lin) AS min1,
         max(l.lin) AS max1
  FROM per_char p JOIN lut l ON l.law = p.law AND l.ch = p.ch
  GROUP BY p.doc_id
)
SELECT doc_id AS media_id,
       8000 AS sample_rate,
       CAST(32 * reps AS BIGINT) AS n_samples,
       CAST(sum1 * reps AS BIGINT) AS sample_sum,
       CAST(min1 AS INTEGER) AS sample_min,
       CAST(max1 AS INTEGER) AS sample_max
FROM agg ORDER BY media_id
"""


ORACLE_SQL["q418_triangle_count"] = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_partkey % 50 = 0
), e AS (
  SELECT a.l_suppkey AS a, b.l_suppkey AS b
  FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
                     AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
), tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT unnest([u, v, w]) AS node FROM tri
)
GROUP BY node
ORDER BY node
"""


ORACLE_SQL["q419_jpeg12_progressive"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 11 + 6 AS INTEGER) AS width,
       CAST(doc_id % 5 + 4 AS INTEGER) AS height,
       CAST((doc_id % 5 + 4) * (doc_id % 11 + 6) * 3 * 2 AS BIGINT)
         AS payload_bytes,
       TRUE AS matches_sequential,
       TRUE AS matches_arith
FROM documents
WHERE doc_id < 100
ORDER BY media_id
"""


ORACLE_SQL["q420_geo_nearest_supplier"] = """
WITH cust AS (
  SELECT c_custkey,
         (c_custkey % 120) - 60 + 0.5 AS lat,
         (c_custkey * 7 % 360) - 180 + 0.5 AS lon,
         CAST(floor(((c_custkey % 120) - 60 + 0.5) / 2.0) AS INTEGER) AS cy,
         CAST(floor(((c_custkey * 7 % 360) - 180 + 0.5) / 2.0) AS INTEGER)
           AS cx
  FROM customer WHERE c_custkey % 17 = 0
), supp AS (
  SELECT s_suppkey,
         (s_suppkey * 3 % 120) - 60 + 0.25 AS r_lat,
         (s_suppkey * 11 % 360) - 180 + 0.25 AS r_lon,
         CAST(floor(((s_suppkey * 3 % 120) - 60 + 0.25) / 2.0) AS INTEGER)
           AS cy,
         CAST(floor(((s_suppkey * 11 % 360) - 180 + 0.25) / 2.0) AS INTEGER)
           AS cx
  FROM supplier
), cand AS (
  SELECT c.c_custkey, s.s_suppkey,
         round(2 * 6371.0088 * asin(sqrt(
           sin(radians(s.r_lat - c.lat) / 2) * sin(radians(s.r_lat - c.lat) / 2)
           + cos(radians(c.lat)) * cos(radians(s.r_lat))
             * sin(radians(s.r_lon - c.lon) / 2)
             * sin(radians(s.r_lon - c.lon) / 2)
         )), 6) AS d
  FROM cust c
  JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy ON TRUE
  JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox ON TRUE
  JOIN supp s ON s.cy = c.cy + oy.dy AND s.cx = c.cx + ox.dx
)
SELECT c_custkey, n_candidates, s_suppkey AS nearest_supplier,
       d AS nearest_km
FROM (
  SELECT c_custkey, s_suppkey, d,
         CAST(count(*) OVER (PARTITION BY c_custkey) AS BIGINT)
           AS n_candidates,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY d, s_suppkey) AS rn
  FROM cand
)
WHERE rn = 1
ORDER BY c_custkey
"""


ORACLE_SQL["q421_doc_chunking"] = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
  FROM documents WHERE doc_id < 300
), sized AS (
  SELECT doc_id, t, len(t) AS n,
         CASE WHEN len(t) <= 0 THEN 0
              ELSE 1 + CAST(ceil(greatest(len(t) - 64, 0) / 48.0) AS BIGINT)
         END AS n_win
  FROM d
), chunks AS (
  SELECT doc_id, w.i AS chunk_idx,
         array_to_string(t[(w.i * 48 + 1):(w.i * 48 + 64)], ' ') AS chunk
  FROM sized, unnest(range(0, n_win)) AS w(i)
), digested AS (
  SELECT doc_id, chunk_idx,
         len(list_filter(string_split(chunk, ' '), x -> x <> ''))
           AS n_tokens,
         md5(chunk) AS chunk_md5
  FROM chunks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       md5(string_agg(chunk_md5, '|' ORDER BY chunk_idx)) AS chunks_md5
FROM digested
GROUP BY doc_id
ORDER BY doc_id
"""


# q422: TIFF is lossless, so the decoded payload md5 is recomputable
# from the synthesis rule alone (q401/q414 strength): even doc_ids are
# RGB whose payload IS the md5-hex tiling truncated at w*h*3; odd ids
# are grayscale whose w*h tiled bytes expand x3 on decode. Compression
# / byte order / predictor / LAYOUT (strips vs 16x16 tiles, chunky vs
# planar-2 — the doc_id%7 lanes, round 7) variants change the container
# bytes, never the decoded payload — which is exactly what the oracle
# asserts; only the tiled lanes' larger dims surface here.
ORACLE_SQL["q422_tiff_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(CASE WHEN doc_id % 7 IN (1, 5) THEN doc_id % 23 + 14
                   ELSE doc_id % 11 + 6 END AS INTEGER) AS w,
         CAST(CASE WHEN doc_id % 7 IN (1, 5) THEN doc_id % 13 + 10
                   ELSE doc_id % 5 + 4 END AS INTEGER) AS h
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h,
         CASE WHEN doc_id % 2 = 0
              THEN substring(repeat(hx, CAST(w * h * 3 / 32 AS INTEGER) + 1),
                             1, w * h * 3)
              ELSE array_to_string(
                     list_transform(range(1, w * h + 1),
                       i -> repeat(substring(
                              repeat(hx, CAST(w * h / 32 AS INTEGER) + 1),
                              CAST(i AS INTEGER), 1), 3)),
                     '')
         END AS payload
  FROM t
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(w * h * 3 AS BIGINT) AS payload_bytes,
       md5(payload) AS payload_md5
FROM px ORDER BY media_id
"""


# q424: lossless frames make the WHOLE video pipeline SQL-checkable —
# frame f of doc d tiles md5(text) rotated by f chars; stride-2
# sampling keeps frames 0,2,... of doc_id%4+2 total.
ORACLE_SQL["q424_video_frame_sample"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h,
         CAST(doc_id % 4 + 2 AS INTEGER) AS n_frames
  FROM documents WHERE doc_id < 200
), fr AS (
  SELECT doc_id, w, h,
         CAST(u.f AS INTEGER) AS frame_idx,
         substring(hx, CAST(u.f AS INTEGER) + 1)
           || substring(hx, 1, CAST(u.f AS INTEGER)) AS rot
  FROM t, unnest(range(0, n_frames, 2)) AS u(f)
)
SELECT doc_id AS media_id, frame_idx, w AS width, h AS height,
       CAST(w * h * 3 AS BIGINT) AS payload_bytes,
       md5(substring(repeat(rot, CAST(w * h * 3 / 32 AS INTEGER) + 1),
                     1, w * h * 3)) AS payload_md5
FROM fr ORDER BY media_id, frame_idx
"""


# q425: hierarchical-lossless means the decode reproduces the tiled
# md5-hex pixels bit-exactly regardless of pyramid depth — same oracle
# shape as q401.
ORACLE_SQL["q425_jpeg_hierarchical_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h
  FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id, w AS width, h AS height,
  CAST(w * h * 3 AS BIGINT) AS payload_bytes,
  md5(substring(repeat(hx, CAST(h * w * 3 / 32 AS INTEGER) + 1),
                1, h * w * 3)) AS payload_md5
FROM t ORDER BY media_id
"""


# q426: arithmetic-lossless (SOF11/SOF15) — same lossless guarantee,
# same oracle shape as q401/q425.
ORACLE_SQL["q426_jpeg_arith_lossless_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h
  FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id, w AS width, h AS height,
  CAST(w * h * 3 AS BIGINT) AS payload_bytes,
  md5(substring(repeat(hx, CAST(h * w * 3 / 32 AS INTEGER) + 1),
                1, h * w * 3)) AS payload_md5
FROM t ORDER BY media_id
"""


# q427: FLAC is lossless, so the decoded samples equal the hex-derived
# source exactly — stats recomputed in SQL from a 16-row LUT
# (value = (ascii(ch) - 100) * 231), tiled doc_id%5+2 times.
ORACLE_SQL["q427_flac_decode"] = """
WITH lut(ch, v) AS (VALUES
  ('0', -12012), ('1', -11781), ('2', -11550), ('3', -11319),
  ('4', -11088), ('5', -10857), ('6', -10626), ('7', -10395),
  ('8', -10164), ('9', -9933),  ('a', -693),   ('b', -462),
  ('c', -231),   ('d', 0),      ('e', 231),    ('f', 462)
), t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 5 + 2 AS INTEGER) AS reps
  FROM documents WHERE doc_id < 300
), per_char AS (
  SELECT doc_id, reps, substring(hx, CAST(i AS INTEGER), 1) AS ch
  FROM t, unnest(range(1, 33)) AS u(i)
), agg AS (
  SELECT p.doc_id,
         max(p.reps) AS reps,
         sum(lut.v) AS s,
         min(lut.v) AS mn,
         max(lut.v) AS mx
  FROM per_char p JOIN lut ON p.ch = lut.ch
  GROUP BY p.doc_id
)
SELECT doc_id AS media_id,
       8000 AS sample_rate,
       CAST(32 * reps AS BIGINT) AS n_samples,
       CAST(s * reps AS BIGINT) AS sample_sum,
       CAST(mn AS INTEGER) AS sample_min,
       CAST(mx AS INTEGER) AS sample_max
FROM agg ORDER BY media_id
"""


# q428: the flip decision is a pure md5 function, so DuckDB replays
# the mechanism exactly; the debiased estimate is one exact-integer
# expression divided by 2.0 (deterministic double on both engines).
ORACLE_SQL["q428_dp_randomized_response"] = """
WITH resp AS (
  SELECT c_mktsegment,
         abs(CAST(c_acctbal < 0 AS INTEGER)
             - CAST(CAST(concat('0x', substring(
                     md5(concat('rr', CAST(c_custkey AS VARCHAR))), 1, 8))
                   AS BIGINT) % 4 = 0 AS INTEGER)) AS r
  FROM customer
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_respondents,
       CAST(sum(r) AS BIGINT) AS noisy_yes,
       CAST(4 * sum(r) - count(*) AS DOUBLE) / 2.0 AS est_true_yes
FROM resp
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# q429: same exact-integer 24ths-of-a-cent pipeline; one final
# division of exact integers keeps the double deterministic.
ORACLE_SQL["q429_seasonal_decomposition"] = """
WITH monthly AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS t,
         month(o_orderdate) AS m,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s
  FROM orders GROUP BY 1, 2
), win AS (
  SELECT m,
         s,
         sum(s) OVER (ORDER BY t ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
           AS win_sum,
         count(s) OVER (ORDER BY t ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
           AS win_cnt,
         lag(s, 6) OVER (ORDER BY t) AS lag6,
         lead(s, 6) OVER (ORDER BY t) AS lead6
  FROM monthly
), detr AS (
  SELECT m, 24 * s - (24 * win_sum - 12 * lag6 - 12 * lead6) AS d24
  FROM win WHERE win_cnt = 13
)
SELECT CAST(m AS INTEGER) AS month,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(d24) AS BIGINT) AS sum_detrended24,
       CAST(sum(d24) AS DOUBLE)
         / (24.0 * CAST(count(*) AS DOUBLE) * 100.0) AS seasonal_index
FROM detr
GROUP BY m
ORDER BY month
"""


# q431: the lossless finish makes the hierarchical-DCT decode
# bit-exact — payload = the tiled md5 hex itself (x3 bytes on the
# round-8 RGB lanes, doc_id%5>=3).
ORACLE_SQL["q431_jpeg_hier_dct_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h,
         CAST(CASE WHEN doc_id % 5 >= 3 THEN 3 ELSE 1 END AS INTEGER) AS nc
  FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id, w AS width, h AS height,
  CAST(w * h * nc AS BIGINT) AS payload_bytes,
  md5(substring(repeat(hx, CAST(h * w * nc / 32 AS INTEGER) + 1),
                1, h * w * nc)) AS payload_md5
FROM t ORDER BY media_id
"""


# q432: the Roaring portable format is a deterministic function of the
# value set, so SQL recomputes container types (runOptimize's rule:
# run iff 2+4*n_runs < min(2*card bounded to array range, 8192)) and
# the exact serialized size: 4-byte cookie header + ceil(n/8) run
# bitset + 4n descriptors + 4n offsets + container bodies.
ORACLE_SQL["q432_roaring_bitmaps"] = """
WITH vals AS (
  SELECT DISTINCT p.p_brand AS g,
         (l.l_orderkey * 7 + l.l_linenumber) % 300000 AS v
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), marked AS (
  SELECT g, v // 65536 AS high, v % 65536 AS lo,
         CASE WHEN lag(v % 65536) OVER (
                PARTITION BY g, v // 65536 ORDER BY v % 65536
              ) = v % 65536 - 1 THEN 0 ELSE 1 END AS runstart
  FROM vals
), cont AS (
  SELECT g, high, count(*) AS card, sum(runstart) AS n_runs
  FROM marked GROUP BY g, high
), typed AS (
  SELECT g, card,
         CASE WHEN 2 + 4 * n_runs <
                   least(CASE WHEN card <= 4096
                              THEN least(2 * card, 8192)
                              ELSE 8192 END, 8192)
              THEN 2
              WHEN card <= 4096 THEN 0
              ELSE 1 END AS ctype,
         n_runs
  FROM cont
), sized AS (
  SELECT g, card, ctype,
         CASE ctype WHEN 2 THEN 2 + 4 * n_runs
                    WHEN 0 THEN 2 * card
                    ELSE 8192 END AS body_bytes
  FROM typed
)
SELECT g AS brand,
       CAST(sum(card) AS BIGINT) AS cardinality,
       CAST(sum(CASE WHEN ctype = 0 THEN 1 ELSE 0 END) AS INTEGER)
         AS n_array,
       CAST(sum(CASE WHEN ctype = 1 THEN 1 ELSE 0 END) AS INTEGER)
         AS n_bitmap,
       CAST(sum(CASE WHEN ctype = 2 THEN 1 ELSE 0 END) AS INTEGER)
         AS n_run,
       CAST(4 + (count(*) + 7) // 8 + 8 * count(*) + sum(body_bytes)
            AS BIGINT) AS blob_bytes
FROM sized
GROUP BY g
ORDER BY brand
"""


# q433: repair(mangle(x)) == x exactly, so the oracle recomputes only
# the ORIGINAL text's md5; marker/bloat counts are the deterministic
# byte arithmetic of the fixed non-ASCII suffix ('é' and 'ï' are the
# 2-byte C3-led chars -> 2 markers each appearing as 'Ã'+1, the 3-byte
# E280-led em-dash/ellipsis lead with 'â' -> 2 more markers, and the
# mangled form gains one char per continuation byte: 2*1 + 2*2 = 6).
ORACLE_SQL["q433_mojibake_repair"] = """
SELECT doc_id,
       CAST(doc_id % 2 AS INTEGER) AS lane,
       CAST(4 AS INTEGER) AS n_markers,
       CAST(6 AS INTEGER) AS bloat,
       md5(text || ' — café naïve…') AS repaired_md5,
       TRUE AS roundtrip_ok
FROM documents
WHERE doc_id < 400
ORDER BY doc_id
"""


# q434: all five lanes are lossless and share the geometry rule, so a
# CASE over doc_id%5 recomputes every payload digest: lanes 0/2/3 are
# the RGB tiling, lane 1 the char-x3 gray expansion, lane 4 the tiling
# of the hex ROTATED by n_frames-1 (the AVI container decode's last
# frame).
ORACLE_SQL["q434_mixed_media_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 11 + 6 AS INTEGER) AS w,
         CAST(doc_id % 5 + 4 AS INTEGER) AS h,
         CAST(doc_id % 5 AS INTEGER) AS lane,
         CAST(doc_id % 4 + 1 AS INTEGER) AS last_f
  FROM documents WHERE doc_id < 300
), px AS (
  SELECT doc_id, w, h, lane,
         CASE lane
           WHEN 1 THEN array_to_string(
             list_transform(range(1, w * h + 1),
               i -> repeat(substring(
                      repeat(hx, CAST(w * h / 32 AS INTEGER) + 1),
                      CAST(i AS INTEGER), 1), 3)), '')
           WHEN 4 THEN substring(
             repeat(substring(hx, last_f + 1) || substring(hx, 1, last_f),
                    CAST(w * h * 3 / 32 AS INTEGER) + 1), 1, w * h * 3)
           ELSE substring(repeat(hx, CAST(w * h * 3 / 32 AS INTEGER) + 1),
                          1, w * h * 3)
         END AS payload
  FROM t
)
SELECT doc_id AS media_id,
       CASE lane WHEN 0 THEN 'tiff' WHEN 1 THEN 'gif'
                 WHEN 2 THEN 'jpeg' WHEN 3 THEN 'jpeg'
                 ELSE 'avi' END AS format,
       w AS width, h AS height,
       CAST(w * h * 3 AS BIGINT) AS payload_bytes,
       md5(payload) AS payload_md5
FROM px ORDER BY media_id
"""


# q435: identical hash-split mechanism and IDENTICAL closed-form
# expression tree over exact integer counts -> identical doubles.
ORACLE_SQL["q435_ab_test_readout"] = """
WITH per_user AS (
  SELECT CAST(CAST(concat('0x', substring(
             md5(concat('ab', CAST(user_id AS VARCHAR))), 1, 8))
           AS BIGINT) % 2 AS INTEGER) AS variant,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              >= 14 AS INTEGER) AS converted
  FROM events GROUP BY user_id
), agg AS (
  SELECT variant,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS c
  FROM per_user GROUP BY variant
), j AS (
  SELECT a.n AS n0, a.c AS c0, b.n AS n1, b.c AS c1
  FROM agg a, agg b WHERE a.variant = 0 AND b.variant = 1
)
, stat AS (
  SELECT n0, c0, n1, c1,
         CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
         CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
         sqrt(
           (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
           * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
           * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
         ) AS denom
  FROM j
)
SELECT n0, c0, n1, c1,
  round(p0, 6) AS rate_a,
  round(p1, 6) AS rate_b,
  round(CASE WHEN denom > 0 THEN (p0 - p1) / denom END, 6) AS z_stat,
  coalesce(abs(CASE WHEN denom > 0 THEN (p0 - p1) / denom END)
           > 1.959964, FALSE) AS significant_95
FROM stat
"""


# q436: the bisection's fixed point is the exact k-th order statistic
# (smallest cent value whose cumulative count reaches 80%); the round
# count is the deterministic log2 of the initial integer range.
ORACLE_SQL["q436_sql_scripting_bisection"] = """
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
), n AS (
  SELECT count(*) AS n, min(c) - 1 AS lo0, max(c) AS hi0 FROM cents
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c) AS rn FROM cents
), thr AS (
  SELECT min(c) AS t FROM ranked, n WHERE rn * 5 >= n.n * 4
)
SELECT thr.t AS p80_cents,
       CAST(thr.t AS DOUBLE) / 100.0 AS p80_price,
       (SELECT count(*) FROM cents WHERE c <= thr.t) AS n_covered,
       n.n AS n_orders
FROM thr, n
"""


# q437's oracle is registered by install_precomputed_oracles() (round
# 7: the IMA ADPCM audio lane needs a text-keyed sequential recompute;
# the PCM and G.711 lanes remain pure-SQL LUT recomputes inside it).


# q438: identical sweep-line; the (t, d) ordering with ends first
# makes the running-sum maximum order-invariant within equal keys.
ORACLE_SQL["q438_peak_concurrency"] = """
WITH spans AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
         min(epoch(ts)) AS t0, max(epoch(ts)) AS t1
  FROM events GROUP BY 1, 2
), deltas AS (
  SELECT day, t0 AS t, 1 AS d FROM spans
  UNION ALL
  SELECT day, t1 + 1 AS t, -1 AS d FROM spans
), curve AS (
  SELECT day,
         sum(d) OVER (PARTITION BY day ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS live
  FROM deltas
)
SELECT day,
       CAST(max(live) AS BIGINT) AS peak_concurrent,
       CAST(count(*) / 2 AS BIGINT) AS n_users
FROM curve
GROUP BY day
ORDER BY day
"""


# q440: the PII is injected deterministically from doc_id, so the
# whole pipeline — Luhn check-digit construction, corruption parity,
# regex counts on the combined text, full-fold re-validation of the
# EXTRACTED card, redaction md5 — is recomputable in pure SQL. The
# regex subset used (classes, bounded repeats, \b) behaves identically
# in Java regex and RE2.
ORACLE_SQL["q440_pii_redaction"] = r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS text,
         '4' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 14, '0') AS pfx
  FROM documents WHERE doc_id < 400
), chk AS (
  SELECT doc_id, text, pfx,
         (10 - list_sum(list_transform(range(1, 16), i -> CASE
             WHEN (17 - i) % 2 = 0 THEN
               CASE WHEN CAST(substring(pfx, CAST(i AS INT), 1) AS INT) * 2 > 9
                    THEN CAST(substring(pfx, CAST(i AS INT), 1) AS INT) * 2 - 9
                    ELSE CAST(substring(pfx, CAST(i AS INT), 1) AS INT) * 2 END
             ELSE CAST(substring(pfx, CAST(i AS INT), 1) AS INT) END)) % 10
         ) % 10 AS chk0
  FROM base
), built AS (
  SELECT doc_id, text,
         pfx || CAST(CASE WHEN doc_id % 2 = 0 THEN chk0
                          ELSE (chk0 + 1) % 10 END AS VARCHAR) AS card,
         (doc_id % 2 = 0) AS card_luhn_valid
  FROM chk
), injected AS (
  SELECT doc_id, card_luhn_valid,
         text || ' contact u' || doc_id || '@ex' || (doc_id % 7)
              || '.com tel +1-'
              || lpad(CAST(doc_id % 800 + 200 AS VARCHAR), 3, '0')
              || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ip 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
              || '.' || (doc_id % 100)
              || ' card ' || card AS t
  FROM built
), det AS (
  SELECT doc_id, card_luhn_valid, t,
         regexp_extract(t, '\b\d{16}\b') AS ext
  FROM injected
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(t, '\+1-\d{3}-555-\d{4}')) AS INT) AS n_phones,
  CAST(len(regexp_extract_all(t,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
  (length(ext) = 16) AS card_found,
  (list_sum(list_transform(range(1, 17), i -> CASE
      WHEN (17 - i) % 2 = 0 THEN
        CASE WHEN CAST(substring(ext, CAST(i AS INT), 1) AS INT) * 2 > 9
             THEN CAST(substring(ext, CAST(i AS INT), 1) AS INT) * 2 - 9
             ELSE CAST(substring(ext, CAST(i AS INT), 1) AS INT) * 2 END
      ELSE CAST(substring(ext, CAST(i AS INT), 1) AS INT) END)) % 10 = 0
  ) AS luhn_ok,
  card_luhn_valid,
  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
      '\b\d{16}\b', '[CARD]', 'g'),
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      '\+1-\d{3}-555-\d{4}', '[PHONE]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')) AS redacted_md5
FROM det
ORDER BY doc_id
"""


# q441: the oracle applies the SAME change batch to the base table and
# recomputes the view from scratch — equality proves the signed-delta
# incremental merge maintains the exact state.
ORACLE_SQL["q441_incremental_mv"] = """
WITH post AS (
  SELECT o_orderstatus, o_orderdate,
         CASE WHEN o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
              THEN o_totalprice + 50.0 ELSE o_totalprice END AS p
  FROM orders
  WHERE NOT (o_orderkey % 17 = 0)
)
SELECT o_orderstatus,
       strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       CAST(round(sum(CAST(p AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM post
GROUP BY o_orderstatus, month
ORDER BY o_orderstatus, month
"""


# q442: same tokenize rule, same boolean algebra in set SQL.
ORACLE_SQL["q442_boolean_retrieval"] = """
WITH postings AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
    FROM documents
  ) WHERE token <> ''
), q1 AS (
  SELECT doc_id FROM postings
  WHERE token IN ('hash', 'join', 'filter')
  GROUP BY doc_id HAVING count(*) = 3
), q2 AS (
  SELECT DISTINCT doc_id FROM postings WHERE token IN ('stream', 'vector')
), q3 AS (
  SELECT doc_id FROM postings WHERE token = 'scan'
  AND doc_id NOT IN (SELECT doc_id FROM postings WHERE token = 'merge')
)
SELECT 'q1' AS query_id, 'hash AND join AND filter' AS expr,
       count(*) AS n_hits,
       CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_checksum,
       min(doc_id) AS first_hit FROM q1
UNION ALL
SELECT 'q2', 'stream OR vector', count(*),
       CAST(coalesce(sum(doc_id), 0) AS BIGINT), min(doc_id) FROM q2
UNION ALL
SELECT 'q3', 'scan AND NOT merge', count(*),
       CAST(coalesce(sum(doc_id), 0) AS BIGINT), min(doc_id) FROM q3
ORDER BY query_id
"""


# q443: identical rank-weighted integer Gini over the frequency table;
# the (cnt, key) rank is a deterministic total order.
ORACLE_SQL["q443_skew_diagnostics"] = """
WITH freq AS (
  SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
), ranked AS (
  SELECT key, cnt, row_number() OVER (ORDER BY cnt, key) AS r FROM freq
)
SELECT count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_key_rows,
       round(max(cnt) * count(*) / CAST(sum(cnt) AS DOUBLE), 4) AS skew_factor,
       round(CAST(2 * sum(r * cnt) - (count(*) + 1) * sum(cnt) AS DOUBLE)
             / CAST(count(*) * sum(cnt) AS DOUBLE), 6) AS gini
FROM ranked
"""


# q444: ZIP is lossless — member payload md5 == md5(text), method is
# id parity, archive_members is the per-source doc count.
ORACLE_SQL["q444_zip_roundtrip"] = """
WITH d AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id < 400
), grp AS (
  SELECT source, count(*) AS n FROM d GROUP BY source
)
SELECT d.source AS "group",
       d.doc_id,
       CAST(CASE WHEN d.doc_id % 2 = 1 THEN 8 ELSE 0 END AS INT) AS method,
       CAST(octet_length(coalesce(d.text, '')::BLOB) AS BIGINT)
         AS payload_bytes,
       md5(coalesce(d.text, '')) AS payload_md5,
       TRUE AS crc_ok,
       CAST(grp.n AS INT) AS archive_members
FROM d JOIN grp ON grp.source = d.source
ORDER BY d.doc_id
"""


# q445: identical token stream, same integer signal definitions.
ORACLE_SQL["q445_repetition_signals"] = """
WITH toks AS (
  SELECT doc_id, u.tok, CAST(u.pos AS INT) AS pos FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok,
           generate_subscripts(
             regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos
    FROM documents WHERE doc_id < 300
  ) u WHERE u.tok <> ''
), seq AS (
  SELECT doc_id, tok, pos,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prv
  FROM toks
), isl AS (
  SELECT doc_id, tok, pos,
         sum(CASE WHEN prv IS NULL OR prv <> tok THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM seq
), runs AS (
  SELECT doc_id, grp, count(*) AS rl FROM isl GROUP BY doc_id, grp
), max_run AS (
  SELECT doc_id, max(rl) AS max_token_run FROM runs GROUP BY doc_id
), tc AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), tok_stats AS (
  SELECT doc_id, sum(c) AS n_tokens,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_toks
  FROM tc GROUP BY doc_id
), bg AS (
  SELECT doc_id, tok, nxt, count(*) AS c FROM seq
  WHERE nxt IS NOT NULL GROUP BY doc_id, tok, nxt
), bg_stats AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_n,
         sum(CASE WHEN c > 1 THEN c * 2 ELSE 0 END) AS dup_bigram_toks
  FROM bg GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       round(t.dup_toks / CAST(t.n_tokens AS DOUBLE), 4) AS dup_token_frac,
       round(b.top_bigram_n / CAST(b.n_bigrams AS DOUBLE), 4)
         AS top_bigram_share,
       round(least(b.dup_bigram_toks / CAST(t.n_tokens AS DOUBLE), 1.0), 4)
         AS dup_bigram_token_frac,
       CAST(m.max_token_run AS BIGINT) AS max_token_run
FROM tok_stats t JOIN bg_stats b ON t.doc_id = b.doc_id
JOIN max_run m ON t.doc_id = m.doc_id
ORDER BY t.doc_id
"""


# q447: one-pass exact profile; min/max are taken NATIVELY then cast
# (both engines print doubles below 1e7 identically in shortest form).
ORACLE_SQL["q447_column_profile"] = """
WITH one AS (
  SELECT count(*) AS n,
    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS k_nulls,
    count(DISTINCT o_orderkey) AS k_ndv,
    CAST(min(o_orderkey) AS VARCHAR) AS k_min,
    CAST(max(o_orderkey) AS VARCHAR) AS k_max,
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS c_nulls,
    count(DISTINCT o_custkey) AS c_ndv,
    CAST(min(o_custkey) AS VARCHAR) AS c_min,
    CAST(max(o_custkey) AS VARCHAR) AS c_max,
    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS s_nulls,
    count(DISTINCT o_orderstatus) AS s_ndv,
    CAST(min(o_orderstatus) AS VARCHAR) AS s_min,
    CAST(max(o_orderstatus) AS VARCHAR) AS s_max,
    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS t_nulls,
    count(DISTINCT o_totalprice) AS t_ndv,
    CAST(min(o_totalprice) AS VARCHAR) AS t_min,
    CAST(max(o_totalprice) AS VARCHAR) AS t_max,
    sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS p_nulls,
    count(DISTINCT o_orderpriority) AS p_ndv,
    CAST(min(o_orderpriority) AS VARCHAR) AS p_min,
    CAST(max(o_orderpriority) AS VARCHAR) AS p_max
  FROM orders
)
SELECT u.column_name, CAST(n AS BIGINT) AS n_rows,
       CAST(u.n_nulls AS BIGINT) AS n_nulls,
       CAST(u.n_distinct AS BIGINT) AS n_distinct,
       u.min_value, u.max_value
FROM one, (
  SELECT 'o_orderkey' AS column_name, k_nulls AS n_nulls, k_ndv AS n_distinct,
         k_min AS min_value, k_max AS max_value FROM one
  UNION ALL SELECT 'o_custkey', c_nulls, c_ndv, c_min, c_max FROM one
  UNION ALL SELECT 'o_orderstatus', s_nulls, s_ndv, s_min, s_max FROM one
  UNION ALL SELECT 'o_totalprice', t_nulls, t_ndv, t_min, t_max FROM one
  UNION ALL SELECT 'o_orderpriority', p_nulls, p_ndv, p_min, p_max FROM one
) u
ORDER BY u.column_name
"""


# q448: same dyadic-weight numerator; /65536 is exact in doubles.
ORACLE_SQL["q448_exp_smoothing"] = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
), lagged AS (
  SELECT day, cents,
         lag(cents, 1) OVER (ORDER BY day) AS l1,
         lag(cents, 2) OVER (ORDER BY day) AS l2,
         lag(cents, 3) OVER (ORDER BY day) AS l3,
         lag(cents, 4) OVER (ORDER BY day) AS l4,
         lag(cents, 5) OVER (ORDER BY day) AS l5,
         lag(cents, 6) OVER (ORDER BY day) AS l6,
         lag(cents, 7) OVER (ORDER BY day) AS l7
  FROM daily
)
SELECT day, cents AS revenue_cents,
  (coalesce(cents, 0) * 16384
   + coalesce(l1, 0) * 12288
   + coalesce(l2, 0) * 9216
   + coalesce(l3, 0) * 6912
   + coalesce(l4, 0) * 5184
   + coalesce(l5, 0) * 3888
   + coalesce(l6, 0) * 2916
   + coalesce(l7, 0) * 2187) / 65536.0 AS smooth_cents,
  CAST((CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END)
   + (CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0 END)
   + (CASE WHEN l2 IS NOT NULL THEN 1 ELSE 0 END)
   + (CASE WHEN l3 IS NOT NULL THEN 1 ELSE 0 END)
   + (CASE WHEN l4 IS NOT NULL THEN 1 ELSE 0 END)
   + (CASE WHEN l5 IS NOT NULL THEN 1 ELSE 0 END)
   + (CASE WHEN l6 IS NOT NULL THEN 1 ELSE 0 END)
   + (CASE WHEN l7 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_lags
FROM lagged
ORDER BY day
"""


# q449: lossless tar members — md5(text) and per-source counts.
ORACLE_SQL["q449_targz_roundtrip"] = """
WITH d AS (
  SELECT doc_id, source, coalesce(text, '') AS text
  FROM documents WHERE doc_id < 400
), grp AS (
  SELECT source, count(*) AS n FROM d GROUP BY source
)
SELECT d.source AS "group",
       d.doc_id,
       CAST(octet_length(d.text::BLOB) AS BIGINT) AS payload_bytes,
       md5(d.text) AS payload_md5,
       TRUE AS chksum_ok,
       CAST(grp.n AS INT) AS archive_members
FROM d JOIN grp ON grp.source = d.source
ORDER BY d.doc_id
"""


# q450: same canonical row rendering, same 60-bit md5 prefix, exact
# commutative sum (HUGEINT == the decimal sum, rendered as a string).
ORACLE_SQL["q450_table_fingerprint"] = """
WITH r AS (
  SELECT CAST(CAST(('0x' || substring(md5(
           o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|'
           || CAST(round(o_totalprice * 100) AS BIGINT) || '|'
           || strftime(o_orderdate, '%Y-%m-%d') || '|' || o_orderpriority
         ), 1, 15)) AS BIGINT) AS HUGEINT) AS h
  FROM orders
)
SELECT count(*) AS n_rows,
       CAST(sum(h) AS VARCHAR) AS fingerprint,
       CAST(max(h) AS BIGINT) AS max_row_hash
FROM r
"""


# q451: container by source parity; members are lossless either way.
ORACLE_SQL["q451_mixed_archive_decode"] = """
WITH d AS (
  SELECT doc_id, source, coalesce(text, '') AS text,
         CAST(substring(source, 4) AS INT) % 2 AS par
  FROM documents WHERE doc_id < 400
), grp AS (
  SELECT source, count(*) AS n FROM d GROUP BY source
)
SELECT d.source AS "group",
       CASE WHEN d.par = 0 THEN 'zip' ELSE 'tar.gz' END AS container,
       d.doc_id,
       CAST(octet_length(d.text::BLOB) AS BIGINT) AS payload_bytes,
       md5(d.text) AS payload_md5,
       TRUE AS integrity_ok,
       CAST(grp.n AS INT) AS archive_members
FROM d JOIN grp ON grp.source = d.source
ORDER BY d.doc_id
"""


# q453: G4 is lossless bilevel — the decoded ink bit at pixel p IS bit
# (3 - p%4) of tiled-md5-hex digit p//4, so the whole digest row
# (black count, position-weighted checksum, md5 of the '0'/'1'
# string) recomputes from documents.text alone. Photometric/byte
# order/strip lanes change container bytes, never the ink.
ORACLE_SQL["q453_ccitt_g4_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 19 + 9 AS INTEGER) AS w,
         CAST(doc_id % 7 + 5 AS INTEGER) AS h
  FROM documents WHERE doc_id < 200
), bits AS (
  SELECT doc_id, w, h,
         array_to_string(
           list_transform(range(0, w * h), p ->
             CAST(((CASE WHEN instr('0123456789abcdef',
                       substring(repeat(hx, CAST((w * h) // 128 + 1
                                              AS INTEGER) + 1),
                                CAST(p // 4 AS INTEGER) + 1, 1)) > 0
                    THEN instr('0123456789abcdef',
                       substring(repeat(hx, CAST((w * h) // 128 + 1
                                              AS INTEGER) + 1),
                                CAST(p // 4 AS INTEGER) + 1, 1)) - 1
                    ELSE 0 END
                    >> CAST(3 - p % 4 AS INTEGER)) & 1) AS VARCHAR)),
           '') AS bs
  FROM t
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(length(bs) - length(replace(bs, '1', '')) AS BIGINT)
         AS black_px,
       CAST((SELECT coalesce(sum((i + 1) *
                 CAST(substring(bs, CAST(i AS INTEGER) + 1, 1) AS BIGINT)), 0)
             FROM unnest(range(0, w * h)) AS u(i)) AS BIGINT)
         AS ink_checksum,
       md5(bs) AS ink_md5
FROM bits ORDER BY media_id
"""


# q454: lossless frames + arithmetic synth make SHOT DETECTION itself
# SQL-checkable: boundary energy into shot s is
# sum_p |tile_{s-1}[p] + (L-1) - tile_s[p]| (the previous shot's last
# frame carries +L-1 on every byte), the detector's threshold rule
# (E > 2*w*h*3) and group segmentation are replayed with a running
# flag sum, and the keyframe md5 is md5 of the shot's base tile (its
# first frame is the +0 lane, pure ASCII).
ORACLE_SQL["q454_video_shot_detection"] = """
WITH t AS (
  SELECT doc_id, text,
         CAST(doc_id % 3 + 2 AS INTEGER) AS L,
         CAST(doc_id % 2 + 2 AS INTEGER) AS n_shots,
         CAST((doc_id % 11 + 6) * (doc_id % 5 + 4) * 3 AS BIGINT) AS need
  FROM documents WHERE doc_id < 150
), shots AS (
  SELECT t.doc_id, t.L, t.need,
         CAST(u.si AS INTEGER) AS si,
         substring(repeat(md5(t.text || ':' || CAST(u.si AS VARCHAR)),
                          CAST(t.need // 32 AS INTEGER) + 1),
                   1, CAST(t.need AS INTEGER)) AS tile
  FROM t, unnest(range(0, t.n_shots)) AS u(si)
), eners AS (
  SELECT a.doc_id, a.si,
         (SELECT sum(abs(ascii(substring(b.tile, CAST(p AS INTEGER) + 1, 1))
                         + (a.L - 1)
                         - ascii(substring(a.tile, CAST(p AS INTEGER) + 1, 1))))
          FROM unnest(range(0, a.need)) AS u(p)) AS e
  FROM shots a JOIN shots b
    ON b.doc_id = a.doc_id AND b.si = a.si - 1
), g AS (
  SELECT sh.doc_id, sh.si, sh.L, sh.need, sh.tile,
         CAST(coalesce(en.e, 0) AS BIGINT) AS e,
         CASE WHEN coalesce(en.e, 0) > 2 * sh.need THEN 1 ELSE 0 END AS flag
  FROM shots sh LEFT JOIN eners en
    ON en.doc_id = sh.doc_id AND en.si = sh.si
), g2 AS (
  SELECT *, sum(flag) OVER (
           PARTITION BY doc_id ORDER BY si
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS grp
  FROM g
), agg AS (
  SELECT doc_id, grp,
         min(si) AS s0, max(si) AS s1, count(*) AS nshots,
         max(L) AS L, max(need) AS need,
         arg_min(e, si) AS entry_e,
         sum(e) AS sum_e,
         arg_min(tile, si) AS key_tile
  FROM g2 GROUP BY doc_id, grp
)
SELECT doc_id AS media_id,
       CAST(grp AS INTEGER) AS shot_idx,
       CAST(s0 * L AS INTEGER) AS start_frame,
       CAST((s1 + 1) * L - 1 AS INTEGER) AS end_frame,
       CAST(nshots * L AS INTEGER) AS n_frames,
       CAST(entry_e AS BIGINT) AS entry_energy,
       CAST(nshots * (L - 1) * need + sum_e - entry_e AS BIGINT)
         AS motion_energy,
       md5(key_tile) AS keyframe_md5
FROM agg ORDER BY media_id, shot_idx
"""


# q455: the decoded deep samples' hex rendering IS the md5-hex tiling
# (bits/4 digits per sample), so samples_md5 = md5 of the tiled
# string and every integer stat recomputes from positional digit
# arithmetic (exact shifts, no doubles).
ORACLE_SQL["q455_tiff_deep_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 13 + 5 AS INTEGER) AS w,
         CAST(doc_id % 7 + 3 AS INTEGER) AS h,
         CAST(CASE WHEN doc_id % 2 = 1 THEN 12 ELSE 16 END AS INTEGER)
           AS bits,
         CAST(CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 4 END AS INTEGER) AS nd
  FROM documents WHERE doc_id < 200
), tl AS (
  SELECT doc_id, w, h, bits, nd,
         substring(repeat(hx, CAST((w * h * nd) // 32 AS INTEGER) + 2),
                   1, w * h * nd) AS tiled
  FROM t
), vl AS (
  SELECT doc_id, w, h, bits, tiled,
         list_transform(range(0, w * h), p ->
           list_sum(list_transform(range(0, nd), j ->
             CAST(instr('0123456789abcdef',
                    substring(tiled,
                              CAST(p * nd + j AS INTEGER) + 1, 1)) - 1
                  AS BIGINT)
             << CAST(4 * (nd - 1 - j) AS INTEGER)))) AS v
  FROM tl
)
SELECT doc_id AS media_id, w AS width, h AS height, bits,
       CAST(list_sum(v) AS BIGINT) AS sample_sum,
       CAST(list_min(v) AS BIGINT) AS sample_min,
       CAST(list_max(v) AS BIGINT) AS sample_max,
       CAST(list_sum(list_transform(range(0, w * h),
                     p -> (CAST(p AS BIGINT) + 1) * v[CAST(p AS INTEGER) + 1]))
            AS BIGINT) AS pos_checksum,
       md5(tiled) AS samples_md5
FROM vl ORDER BY media_id
"""


# q456: the model's fixed-point integer log-counts make the naive-
# Bayes sum exact BIGINT algebra, so the whole train+score pipeline
# replays in SQL: same trigrams (raw code-point substrings, no
# normalization), same Laplace smoothing against the global train
# vocabulary, same (score desc, lang asc) argmax.
ORACLE_SQL["q456_trained_lang_id"] = """
WITH d AS (
  SELECT doc_id, lang, coalesce(text, '') AS text FROM documents
), tri AS (
  SELECT doc_id, lang,
         unnest(list_transform(
           range(1, CAST(length(text) AS INTEGER) - 1),
           i -> substring(text, CAST(i AS INTEGER), 3))) AS g
  FROM d
), model AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS c
  FROM tri WHERE doc_id % 5 <> 0 GROUP BY lang, g
), v AS (
  SELECT count(DISTINCT g) AS vocab FROM model
), mfp AS (
  SELECT lang, g,
         CAST(round(ln(c + 1) * 1000000) AS BIGINT) AS logc_fp
  FROM model
), den AS (
  SELECT m.lang,
         CAST(round(ln(sum(m.c) + max(v.vocab)) * 1000000) AS BIGINT)
           AS logden_fp
  FROM model m, v GROUP BY m.lang
), ntri AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tri GROUP BY doc_id
), hits AS (
  SELECT t.doc_id, m.lang, CAST(sum(m.logc_fp) AS BIGINT) AS s
  FROM tri t JOIN mfp m ON m.g = t.g GROUP BY t.doc_id, m.lang
), scores AS (
  SELECT nt.doc_id, de.lang,
         coalesce(h.s, 0) - nt.n * de.logden_fp AS score_fp,
         nt.n
  FROM ntri nt CROSS JOIN den de
  LEFT JOIN hits h ON h.doc_id = nt.doc_id AND h.lang = de.lang
), best AS (
  SELECT doc_id, lang AS pred_lang, score_fp, n,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score_fp DESC, lang
         ) AS rn
  FROM scores
)
SELECT b.doc_id, d.lang, b.pred_lang,
       CAST(b.n AS BIGINT) AS n_trigrams,
       CAST(b.score_fp AS BIGINT) AS best_score_fp,
       (b.pred_lang = d.lang) AS correct
FROM best b JOIN d ON d.doc_id = b.doc_id
WHERE b.rn = 1 ORDER BY b.doc_id
"""


# q457: SOF3 segments are lossless, so Compression=7 changes container
# bytes only — the decoded payload md5 is the q422 rule with q457's
# own lane-cycled dims (tiled lanes are doc_id%3==1).
ORACLE_SQL["q457_jpeg_in_tiff_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(CASE WHEN doc_id % 3 = 1 THEN doc_id % 23 + 14
                   ELSE doc_id % 11 + 6 END AS INTEGER) AS w,
         CAST(CASE WHEN doc_id % 3 = 1 THEN doc_id % 13 + 10
                   ELSE doc_id % 5 + 4 END AS INTEGER) AS h
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h,
         CASE WHEN doc_id % 2 = 0
              THEN substring(repeat(hx, CAST(w * h * 3 / 32 AS INTEGER) + 1),
                             1, w * h * 3)
              ELSE array_to_string(
                     list_transform(range(1, w * h + 1),
                       i -> repeat(substring(
                              repeat(hx, CAST(w * h / 32 AS INTEGER) + 1),
                              CAST(i AS INTEGER), 1), 3)),
                     '')
         END AS payload
  FROM t
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(w * h * 3 AS BIGINT) AS payload_bytes,
       md5(payload) AS payload_md5
FROM px ORDER BY media_id
"""


# q458: snapshot lifecycle replayed as four SELECTs over orders — v1 is
# the create slice, v2 adds the appended slice, v3 removes the CoW
# delete range, v4 (compaction) is logically identical to v3.
ORACLE_SQL["q458_snaptable_time_travel"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 4096
), u AS (
  SELECT 1 AS version, 'create' AS operation, *
  FROM base WHERE k % 4 <> 3
  UNION ALL SELECT 2, 'append', * FROM base
  UNION ALL SELECT 3, 'delete', * FROM base WHERE k NOT BETWEEN 900 AND 1800
  UNION ALL SELECT 4, 'compact', * FROM base WHERE k NOT BETWEEN 900 AND 1800
)
SELECT version, operation,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(k) AS BIGINT) AS sum_key,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(count(DISTINCT c) AS BIGINT) AS n_cust
FROM u GROUP BY version, operation ORDER BY version
"""


# q459: the manifest skipping arithmetic is a pure function of orders —
# one file per bucket (k div 512), a file is scanned iff its actual
# [min, max] intersects [700, 2300]; matched-row aggregate is exact
# integer money algebra.
ORACLE_SQL["q459_snaptable_data_skipping"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 512 AS b
  FROM orders WHERE o_orderkey < 4096
), fstats AS (
  SELECT b, min(k) AS mn, max(k) AS mx, count(*) AS n FROM base GROUP BY b
)
SELECT CAST((SELECT count(*) FROM fstats) AS INT) AS files_total,
       CAST((SELECT count(*) FROM fstats
             WHERE mn <= 2300 AND mx >= 700) AS INT) AS files_scanned,
       CAST((SELECT coalesce(sum(n), 0) FROM fstats
             WHERE mx < 700 OR mn > 2300) AS BIGINT) AS rows_skipped,
       CAST((SELECT count(*) FROM base
             WHERE k BETWEEN 700 AND 2300) AS BIGINT) AS n_rows,
       CAST((SELECT sum(cents) FROM base
             WHERE k BETWEEN 700 AND 2300) AS BIGINT) AS sum_cents
"""


# q460: winnowing replayed — same 60-bit md5 k-gram hash, same w=12
# window minimum; fingerprint set checksum as HUGEINT (sum of <=2^60
# values overflows BIGINT).
ORACLE_SQL["q460_winnowing_fingerprints"] = """
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= 19
), kg0 AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - 7)) AS i
  FROM d
), kg AS (
  SELECT doc_id, i - 1 AS pos,
         CAST(('0x' || substring(md5(substring(text, CAST(i AS INT), 8)),
                                 1, 15)) AS BIGINT) AS h
  FROM kg0
), win AS (
  SELECT doc_id, pos,
         CASE WHEN pos >= 11 THEN
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
         END AS fp
  FROM kg
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_kgrams,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_fingerprints,
       CAST(CAST(sum(DISTINCT fp) AS HUGEINT) AS VARCHAR) AS fp_checksum
FROM win GROUP BY doc_id ORDER BY doc_id
"""


# q461: the tug-of-war counters are order-independent sums, so the
# sketch state replays exactly — same md5 sign bit, same 16 estimators.
ORACLE_SQL["q461_ams_f2_sketch"] = """
WITH k AS (
  SELECT o_custkey AS key FROM orders
), signs AS (
  SELECT j,
         CAST(sum(1 - 2 * (CAST(('0x' || substring(
             md5(CAST(key AS VARCHAR)),
             CAST(j + 1 AS INT), 1)) AS INT) % 2)) AS BIGINT) AS s
  FROM k, (SELECT unnest(range(16)) AS j) js
  GROUP BY j
), est AS (
  SELECT CAST(sum(s * s) AS BIGINT) AS sum_sq_est FROM signs
), exact AS (
  SELECT CAST(sum(n * n) AS BIGINT) AS exact_f2
  FROM (SELECT count(*) AS n FROM k GROUP BY key) c
)
SELECT exact_f2,
       CAST(16 AS INT) AS n_estimators,
       sum_sq_est,
       CAST(abs(sum_sq_est - 16 * exact_f2) AS BIGINT) AS err_x16
FROM exact, est
"""


# q462: the merge replayed — CASE doubles the updated range, UNION adds
# the inserted slice.
ORACLE_SQL["q462_snaptable_merge"] = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), merged AS (
  SELECT k, CASE WHEN k BETWEEN 1000 AND 1500 THEN cents * 2
                 ELSE cents END AS cents
  FROM o WHERE k < 4096
  UNION ALL
  SELECT k, cents FROM o WHERE k BETWEEN 4096 AND 4599
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(k) AS BIGINT) AS sum_key,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(CASE WHEN k BETWEEN 1000 AND 1500 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_updated_range
FROM merged
"""


# q463: CDC(1->3) = {deletes: v1 rows inside the deleted range,
# inserts: appended rows outside it}; CDC(3->4) is a compaction and
# contributes no rows.
ORACLE_SQL["q463_snaptable_cdc"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 4096
), ch AS (
  SELECT 'delete' AS change_type, k, cents FROM base
  WHERE k % 4 <> 3 AND k BETWEEN 900 AND 1800
  UNION ALL
  SELECT 'insert', k, cents FROM base
  WHERE k % 4 = 3 AND k NOT BETWEEN 900 AND 1800
)
SELECT CAST(1 AS INT) AS from_v, CAST(3 AS INT) AS to_v, change_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(k) AS BIGINT) AS sum_key,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM ch GROUP BY change_type ORDER BY from_v, change_type
"""


# q464: the bloom is a pure function of each file's value set — a file
# passes iff every needle probe bit (3 md5 draws mod 4096) appears
# among the file's value bits; the oracle replays that rule exactly.
ORACLE_SQL["q464_snaptable_bloom_skipping"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 512 AS b
  FROM orders WHERE o_orderkey < 4096
), needle AS (
  SELECT min(c) AS nc FROM base
), nbits AS (
  SELECT DISTINCT
    CAST(('0x' || substring(md5(CAST(nc AS VARCHAR) || ':'
         || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 4096 AS bit
  FROM needle, (SELECT unnest(range(3)) AS j) js
), fbits AS (
  SELECT DISTINCT b,
    CAST(('0x' || substring(md5(CAST(c AS VARCHAR) || ':'
         || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 4096 AS bit
  FROM base, (SELECT unnest(range(3)) AS j) js
), fpass AS (
  SELECT f.b
  FROM fbits f JOIN nbits n ON f.bit = n.bit
  GROUP BY f.b
  HAVING count(DISTINCT f.bit) = (SELECT count(*) FROM nbits)
), frows AS (
  SELECT b, count(*) AS n FROM base GROUP BY b
)
SELECT
  CAST((SELECT count(*) FROM frows) AS INT) AS files_total,
  CAST((SELECT count(*) FROM fpass) AS INT) AS files_scanned,
  CAST((SELECT coalesce(sum(n), 0) FROM frows
        WHERE b NOT IN (SELECT b FROM fpass)) AS BIGINT) AS rows_skipped,
  CAST((SELECT count(*) FROM base, needle WHERE c = nc) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM base, needle WHERE c = nc)
       AS BIGINT) AS sum_cents
"""


# q465: the q460 winnow replayed, then the fingerprint self-join.
ORACLE_SQL["q465_winnowing_neardup_join"] = """
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= 19
), kg0 AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - 7)) AS i
  FROM d
), kg AS (
  SELECT doc_id, i - 1 AS pos,
         CAST(('0x' || substring(md5(substring(text, CAST(i AS INT), 8)),
                                 1, 15)) AS BIGINT) AS h
  FROM kg0
), win AS (
  SELECT doc_id, pos,
         CASE WHEN pos >= 11 THEN
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
         END AS fp
  FROM kg
), fps0 AS (
  SELECT DISTINCT doc_id, fp FROM win WHERE fp IS NOT NULL
), df AS (
  SELECT fp FROM (SELECT fp, count(*) AS n FROM fps0 GROUP BY fp)
  WHERE n <= 32
), fps AS (
  SELECT f.doc_id, f.fp FROM fps0 f JOIN df USING (fp)
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM fps GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= 3
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       da.n_fp AS n_fp_a, db.n_fp AS n_fp_b
FROM pairs p
JOIN per_doc da ON da.doc_id = p.doc_a
JOIN per_doc db ON db.doc_id = p.doc_b
WHERE 2 * p.n_shared >= least(da.n_fp, db.n_fp)
ORDER BY p.doc_a, p.doc_b
"""


# q466: every number is a predicate over orders — v1 = the create
# slice, deltas = the q463 CDC rows, v3 = v2 minus the delete range.
ORACLE_SQL["q466_snaptable_incremental_agg"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 4096
), v1 AS (
  SELECT * FROM base WHERE k % 4 <> 3
), v3 AS (
  SELECT * FROM base WHERE k NOT BETWEEN 900 AND 1800
), ins AS (
  SELECT * FROM base WHERE k % 4 = 3 AND k NOT BETWEEN 900 AND 1800
), del AS (
  SELECT * FROM base WHERE k % 4 <> 3 AND k BETWEEN 900 AND 1800
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM v1) AS v1_rows,
  (SELECT CAST(sum(cents) AS BIGINT) FROM v1) AS v1_cents,
  (SELECT CAST(count(*) - (SELECT count(*) FROM del) AS BIGINT)
   FROM ins) AS d_rows,
  (SELECT CAST(coalesce(sum(cents), 0)
          - (SELECT coalesce(sum(cents), 0) FROM del) AS BIGINT)
   FROM ins) AS d_cents,
  (SELECT CAST(count(*) AS BIGINT) FROM v3) AS incr_rows,
  (SELECT CAST(sum(cents) AS BIGINT) FROM v3) AS incr_cents,
  (SELECT CAST(count(*) AS BIGINT) FROM v3) AS v3_rows,
  (SELECT CAST(sum(cents) AS BIGINT) FROM v3) AS v3_cents,
  TRUE AS incremental_matches
"""


# q467: RAKE replayed — same stop list, same islands, same fixed-point
# floor division, same (score desc, phrase asc) tie-break.
ORACLE_SQL["q467_rake_keywords"] = """
WITH d AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), tok0 AS (
  SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws
  FROM d
), tok AS (
  SELECT doc_id, i - 1 AS pos,
         regexp_replace(ws[CAST(i AS INT)], '[^a-z0-9]', '', 'g') AS w
  FROM tok0
), flagged AS (
  SELECT doc_id, pos, w,
         CASE WHEN w IN ('the','a','of','and','to','in','is','it')
                   OR w = '' THEN 1 ELSE 0 END AS stop
  FROM tok
), grped AS (
  SELECT doc_id, pos, w, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM flagged
), cand AS (
  SELECT doc_id, grp, pos, w FROM grped WHERE stop = 0
), phrases AS (
  SELECT doc_id, grp,
         CAST(count(*) AS BIGINT) AS plen,
         string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM cand GROUP BY doc_id, grp
), wstat AS (
  SELECT c.doc_id, c.w,
         CAST(sum(p.plen) AS BIGINT) AS deg,
         CAST(count(*) AS BIGINT) AS freq
  FROM cand c JOIN phrases p ON p.doc_id = c.doc_id AND p.grp = c.grp
  GROUP BY c.doc_id, c.w
), wscore AS (
  SELECT doc_id, w, (deg * 1000000) // freq AS wscore_fp FROM wstat
), pscore AS (
  SELECT c.doc_id, c.grp, CAST(sum(s.wscore_fp) AS BIGINT) AS score_fp
  FROM cand c JOIN wscore s ON s.doc_id = c.doc_id AND s.w = c.w
  GROUP BY c.doc_id, c.grp
), uniq AS (
  SELECT DISTINCT p.doc_id, p.phrase, p.plen AS n_words, sc.score_fp
  FROM phrases p JOIN pscore sc
    ON sc.doc_id = p.doc_id AND sc.grp = p.grp
), ranked AS (
  SELECT doc_id, phrase, n_words, score_fp,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score_fp DESC, phrase ASC) AS INT) AS rank
  FROM uniq
)
SELECT doc_id, rank, phrase, n_words, score_fp
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


# q468: the q467 CTE chain rolled up per source with the same df >= 2
# gate and (df desc, score desc, phrase asc) ranking.
ORACLE_SQL["q468_corpus_keyphrases"] = """
WITH d AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), tok0 AS (
  SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws
  FROM d
), tok AS (
  SELECT doc_id, i - 1 AS pos,
         regexp_replace(ws[CAST(i AS INT)], '[^a-z0-9]', '', 'g') AS w
  FROM tok0
), flagged AS (
  SELECT doc_id, pos, w,
         CASE WHEN w IN ('the','a','of','and','to','in','is','it')
                   OR w = '' THEN 1 ELSE 0 END AS stop
  FROM tok
), grped AS (
  SELECT doc_id, pos, w, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM flagged
), cand AS (
  SELECT doc_id, grp, pos, w FROM grped WHERE stop = 0
), phrases AS (
  SELECT doc_id, grp,
         CAST(count(*) AS BIGINT) AS plen,
         string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM cand GROUP BY doc_id, grp
), wstat AS (
  SELECT c.doc_id, c.w,
         CAST(sum(p.plen) AS BIGINT) AS deg,
         CAST(count(*) AS BIGINT) AS freq
  FROM cand c JOIN phrases p ON p.doc_id = c.doc_id AND p.grp = c.grp
  GROUP BY c.doc_id, c.w
), wscore AS (
  SELECT doc_id, w, (deg * 1000000) // freq AS wscore_fp FROM wstat
), pscore AS (
  SELECT c.doc_id, c.grp, CAST(sum(s.wscore_fp) AS BIGINT) AS score_fp
  FROM cand c JOIN wscore s ON s.doc_id = c.doc_id AND s.w = c.w
  GROUP BY c.doc_id, c.grp
), uniq AS (
  SELECT DISTINCT p.doc_id, p.phrase, p.plen AS n_words, sc.score_fp
  FROM phrases p JOIN pscore sc
    ON sc.doc_id = p.doc_id AND sc.grp = p.grp
), per_source AS (
  SELECT dd.source, u.phrase,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(u.score_fp) AS BIGINT) AS total_score_fp
  FROM uniq u JOIN documents dd ON dd.doc_id = u.doc_id
  GROUP BY dd.source, u.phrase
  HAVING count(*) >= 2
), ranked AS (
  SELECT source, phrase, df, total_score_fp,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY df DESC, total_score_fp DESC, phrase ASC)
              AS INT) AS rank
  FROM per_source
)
SELECT source, rank, phrase, df, total_score_fp
FROM ranked WHERE rank <= 3
ORDER BY source, rank
"""


# q469: first-occurrence accounting replayed — same bucket rule, same
# running sums.
ORACLE_SQL["q469_vocab_growth"] = """
WITH d AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), b AS (
  SELECT max(doc_id) AS max_id FROM d
), toks AS (
  SELECT doc_id * 10 // (b.max_id + 1) AS bucket, doc_id,
         unnest(ws) AS w
  FROM d, b
), tok AS (
  SELECT bucket, doc_id, w FROM toks WHERE w <> ''
), per_bucket AS (
  SELECT bucket,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_instances
  FROM tok GROUP BY bucket
), firsts AS (
  SELECT first_bucket AS bucket,
         CAST(count(*) AS BIGINT) AS n_new
  FROM (SELECT w, min(bucket) AS first_bucket FROM tok GROUP BY w)
  GROUP BY first_bucket
), merged AS (
  SELECT p.bucket, p.n_docs, p.n_instances,
         coalesce(f.n_new, 0) AS n_new
  FROM per_bucket p LEFT JOIN firsts f ON f.bucket = p.bucket
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(sum(n_docs) OVER win AS BIGINT) AS cum_docs,
       CAST(sum(n_instances) OVER win AS BIGINT) AS cum_instances,
       CAST(sum(n_new) OVER win AS BIGINT) AS cum_vocab
FROM merged
WINDOW win AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
ORDER BY bucket
"""


# q471: the full OPTIMIZE ZORDER layout replayed in SQL — exact global
# min/max bounds, the equal-width bucket assignment, the Morton bit
# interleave (z2_sql, the same expression family as q124), the
# high-4-bit tile id, then the before/after per-file min/max skipping
# arithmetic and the matched-row aggregates.
ORACLE_SQL["q471_snaptable_zorder_optimize"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 256 AS b
  FROM orders WHERE o_orderkey < 4096
), f1 AS (
  SELECT b, min(c) AS mnc, max(c) AS mxc, count(*) AS n
  FROM base GROUP BY b
), bounds AS (
  SELECT min(k) AS klo, max(k) AS khi, min(c) AS clo, max(c) AS chi
  FROM base
), zed AS (
  SELECT k, c, cents,
    least(greatest(CAST(floor(((k - klo) * 256) / (khi - klo + 1))
                   AS BIGINT), 0), 255) AS za,
    least(greatest(CAST(floor(((c - clo) * 256) / (chi - clo + 1))
                   AS BIGINT), 0), 255) AS zb
  FROM base, bounds
), tiled AS (
  SELECT k, c, cents, ((((za >> 0) & 1) << 0) | (((zb >> 0) & 1) << 1) | (((za >> 1) & 1) << 2) | (((zb >> 1) & 1) << 3) | (((za >> 2) & 1) << 4) | (((zb >> 2) & 1) << 5) | (((za >> 3) & 1) << 6) | (((zb >> 3) & 1) << 7) | (((za >> 4) & 1) << 8) | (((zb >> 4) & 1) << 9) | (((za >> 5) & 1) << 10) | (((zb >> 5) & 1) << 11) | (((za >> 6) & 1) << 12) | (((zb >> 6) & 1) << 13) | (((za >> 7) & 1) << 14) | (((zb >> 7) & 1) << 15)) >> 12 AS tile FROM zed
), f2 AS (
  SELECT tile, min(c) AS mnc, max(c) AS mxc,
         min(k) AS mnk, max(k) AS mxk, count(*) AS n
  FROM tiled GROUP BY tile
)
SELECT '1_c_pre' AS probe,
  CAST((SELECT count(*) FROM f1) AS INT) AS files_total,
  CAST((SELECT count(*) FROM f1 WHERE mxc >= 100 AND mnc <= 400) AS INT)
    AS files_scanned,
  CAST((SELECT coalesce(sum(n), 0) FROM f1
        WHERE NOT (mxc >= 100 AND mnc <= 400)) AS BIGINT) AS rows_skipped,
  CAST((SELECT count(*) FROM base WHERE c BETWEEN 100 AND 400) AS BIGINT)
    AS n_rows,
  CAST((SELECT sum(cents) FROM base WHERE c BETWEEN 100 AND 400) AS BIGINT)
    AS sum_cents
UNION ALL
SELECT '2_c_post',
  CAST((SELECT count(*) FROM f2) AS INT),
  CAST((SELECT count(*) FROM f2 WHERE mxc >= 100 AND mnc <= 400) AS INT),
  CAST((SELECT coalesce(sum(n), 0) FROM f2
        WHERE NOT (mxc >= 100 AND mnc <= 400)) AS BIGINT),
  CAST((SELECT count(*) FROM base WHERE c BETWEEN 100 AND 400) AS BIGINT),
  CAST((SELECT sum(cents) FROM base WHERE c BETWEEN 100 AND 400) AS BIGINT)
UNION ALL
SELECT '3_k_post',
  CAST((SELECT count(*) FROM f2) AS INT),
  CAST((SELECT count(*) FROM f2 WHERE mxk >= 700 AND mnk <= 2300) AS INT),
  CAST((SELECT coalesce(sum(n), 0) FROM f2
        WHERE NOT (mxk >= 700 AND mnk <= 2300)) AS BIGINT),
  CAST((SELECT count(*) FROM base WHERE k BETWEEN 700 AND 2300) AS BIGINT),
  CAST((SELECT sum(cents) FROM base WHERE k BETWEEN 700 AND 2300) AS BIGINT)
ORDER BY probe
"""


# q472: partitioned lifecycle replayed — file population = group by
# (partition value, bucket) per commit's own partition spec, composed
# skipping = intersection of the per-predicate admit sets (the create's
# files carry status stats, the evolved append's files carry BOTH
# status and prio stats), aggregates exact.
ORACLE_SQL["q472_snaptable_partitioned"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 1024 AS b
  FROM orders WHERE o_orderkey < 2048
), extra AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 1024 AS b
  FROM orders WHERE o_orderkey >= 2048 AND o_orderkey < 3072
), f1 AS (
  SELECT status AS part, b, min(k) AS mnk, max(k) AS mxk,
         min(status) AS mns, max(status) AS mxs, count(*) AS n
  FROM base GROUP BY status, b
), f2 AS (
  SELECT prio AS part, b, min(k) AS mnk, max(k) AS mxk,
         min(status) AS mns, max(status) AS mxs,
         min(prio) AS mnp, max(prio) AS mxp, count(*) AS n
  FROM extra GROUP BY prio, b
), alln AS (
  SELECT coalesce((SELECT sum(n) FROM f1), 0)
       + coalesce((SELECT sum(n) FROM f2), 0) AS total_rows,
         (SELECT count(*) FROM f1) + (SELECT count(*) FROM f2) AS total_files
)
SELECT '1_status_k' AS probe,
  CAST((SELECT total_files FROM alln) AS INT) AS files_total,
  CAST((SELECT count(*) FROM f1
        WHERE mxs >= 'F' AND mns <= 'F' AND mxk >= 0 AND mnk <= 1023)
     + (SELECT count(*) FROM f2
        WHERE mxs >= 'F' AND mns <= 'F' AND mxk >= 0 AND mnk <= 1023)
       AS INT) AS files_scanned,
  CAST((SELECT total_rows FROM alln)
     - (SELECT coalesce(sum(n), 0) FROM f1
        WHERE mxs >= 'F' AND mns <= 'F' AND mxk >= 0 AND mnk <= 1023)
     - (SELECT coalesce(sum(n), 0) FROM f2
        WHERE mxs >= 'F' AND mns <= 'F' AND mxk >= 0 AND mnk <= 1023)
       AS BIGINT) AS rows_skipped,
  CAST((SELECT count(*) FROM base
        WHERE status = 'F' AND k BETWEEN 0 AND 1023) AS BIGINT) AS n_rows,
  CAST((SELECT coalesce(sum(cents), 0) FROM base
        WHERE status = 'F' AND k BETWEEN 0 AND 1023) AS BIGINT) AS sum_cents
UNION ALL
SELECT '2_prio',
  CAST((SELECT total_files FROM alln) AS INT),
  CAST((SELECT count(*) FROM f1)
     + (SELECT count(*) FROM f2
        WHERE mxp >= '1-URGENT' AND mnp <= '1-URGENT') AS INT),
  CAST((SELECT coalesce(sum(n), 0) FROM f2
        WHERE NOT (mxp >= '1-URGENT' AND mnp <= '1-URGENT')) AS BIGINT),
  CAST((SELECT count(*) FROM base WHERE prio = '1-URGENT') +
       (SELECT count(*) FROM extra WHERE prio = '1-URGENT') AS BIGINT),
  CAST((SELECT coalesce(sum(cents), 0) FROM base WHERE prio = '1-URGENT') +
       (SELECT coalesce(sum(cents), 0) FROM extra WHERE prio = '1-URGENT')
       AS BIGINT)
ORDER BY probe
"""


# q474: VP8L is lossless end to end, so the oracle recomputes the FULL
# decoded RGB payload md5 from the documents table: the synth pixels
# tile the md5 hex of the text (char i -> (i, i, i)), dims from doc_id.
ORACLE_SQL["q474_webp_lossless_decode"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 12 + 5 AS INTEGER) AS w,
         CAST(doc_id % 6 + 4 AS INTEGER) AS h
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h,
         substring(repeat(hx, CAST(h * w / 32 AS INTEGER) + 1),
                   1, h * w) AS s
  FROM t
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(h * w * 3 AS BIGINT) AS payload_bytes,
       md5(array_to_string(
             list_transform(range(1, h * w + 1),
               i -> repeat(substring(s, CAST(i AS INTEGER), 1), 3)),
             '')) AS payload_md5
FROM px ORDER BY media_id
"""


# q475: deletion vectors replayed — live rows = base minus the UNION of
# the two overlapping delete ranges; dv'd files = buckets whose min/max
# ADMIT either range; dv_rows = matching-row count (set union, no
# double count); scan skipping on the physical per-bucket stats; CDC
# deletes = exactly the dv'd rows; compaction materializes (2 files).
ORACLE_SQL["q475_snaptable_deletion_vectors"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 256 AS b
  FROM orders WHERE o_orderkey < 2048
), fstats AS (
  SELECT b, min(k) AS mn, max(k) AS mx, count(*) AS n FROM base GROUP BY b
), dvf AS (
  SELECT b FROM fstats
  WHERE (mx >= 100 AND mn <= 299) OR (mx >= 250 AND mn <= 449)
), live AS (
  SELECT * FROM base WHERE k NOT BETWEEN 100 AND 449
), dead AS (
  SELECT * FROM base WHERE k BETWEEN 100 AND 449
)
SELECT '1_after_dv' AS probe,
  CAST((SELECT count(*) FROM fstats) AS INT) AS files_total,
  CAST((SELECT count(*) FROM dvf) AS INT) AS files_scanned,
  CAST((SELECT count(*) FROM dead) AS BIGINT) AS dv_rows,
  CAST((SELECT count(*) FROM live) AS BIGINT) AS n_rows,
  CAST((SELECT coalesce(sum(cents), 0) FROM live) AS BIGINT) AS sum_cents
UNION ALL
SELECT '2_scan_0_1023',
  CAST((SELECT count(*) FROM fstats) AS INT),
  CAST((SELECT count(*) FROM fstats WHERE mx >= 0 AND mn <= 1023) AS INT),
  CAST(0 AS BIGINT),
  CAST((SELECT count(*) FROM live WHERE k BETWEEN 0 AND 1023) AS BIGINT),
  CAST((SELECT coalesce(sum(cents), 0) FROM live
        WHERE k BETWEEN 0 AND 1023) AS BIGINT)
UNION ALL
SELECT '3_cdc_deletes', 0, 0, CAST(0 AS BIGINT),
  CAST((SELECT count(*) FROM dead) AS BIGINT),
  CAST((SELECT coalesce(sum(cents), 0) FROM dead) AS BIGINT)
UNION ALL
SELECT '4_after_compact', 2, 0, CAST(0 AS BIGINT),
  CAST((SELECT count(*) FROM live) AS BIGINT),
  CAST((SELECT coalesce(sum(cents), 0) FROM live) AS BIGINT)
ORDER BY probe
"""


# q476: the delta-log lifecycle replayed — one file per (k div 512)
# bucket per commit generation, live rows after the CoW delete, and the
# scan's skipping arithmetic over post-delete per-bucket min/max.
ORACLE_SQL["q476_delta_log_lifecycle"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 512 AS bucket
  FROM orders WHERE o_orderkey < 2560
), v0 AS (SELECT * FROM base WHERE k < 1024),
v1 AS (SELECT * FROM base WHERE k < 2048),
v2 AS (SELECT * FROM v1 WHERE k NOT BETWEEN 300 AND 899),
v3 AS (SELECT * FROM base WHERE k NOT BETWEEN 300 AND 899),
f3 AS (
  SELECT bucket, min(k) AS mn, max(k) AS mx, count(*) AS n
  FROM v3 GROUP BY bucket
)
SELECT 'v0' AS probe,
  CAST((SELECT count(DISTINCT bucket) FROM v0) AS INT) AS files_total,
  0 AS files_scanned,
  CAST((SELECT count(*) FROM v0) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM v0) AS BIGINT) AS sum_cents
UNION ALL
SELECT 'v1', CAST((SELECT count(DISTINCT bucket) FROM v1) AS INT), 0,
  CAST((SELECT count(*) FROM v1) AS BIGINT),
  CAST((SELECT sum(cents) FROM v1) AS BIGINT)
UNION ALL
SELECT 'v2', CAST((SELECT count(DISTINCT bucket) FROM v2) AS INT), 0,
  CAST((SELECT count(*) FROM v2) AS BIGINT),
  CAST((SELECT sum(cents) FROM v2) AS BIGINT)
UNION ALL
SELECT 'v3', CAST((SELECT count(DISTINCT bucket) FROM v3) AS INT), 0,
  CAST((SELECT count(*) FROM v3) AS BIGINT),
  CAST((SELECT sum(cents) FROM v3) AS BIGINT)
UNION ALL
SELECT 'scan_600_1500',
  CAST((SELECT count(*) FROM f3) AS INT),
  CAST((SELECT count(*) FROM f3 WHERE mx >= 600 AND mn <= 1500) AS INT),
  CAST((SELECT count(*) FROM v3 WHERE k BETWEEN 600 AND 1500) AS BIGINT),
  CAST((SELECT sum(cents) FROM v3 WHERE k BETWEEN 600 AND 1500) AS BIGINT)
ORDER BY probe
"""


# q477: UPDATE + RESTORE replayed — the CoW update as a CASE over the
# match range, the delete as a predicate, the restore as version 2's
# state verbatim.
ORACLE_SQL["q477_snaptable_update_restore"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 2048
), upd AS (
  SELECT k,
         CASE WHEN k BETWEEN 300 AND 899 THEN '9-UPDATED' ELSE prio END
           AS prio,
         CASE WHEN k BETWEEN 300 AND 899 THEN cents + 555 ELSE cents END
           AS cents
  FROM base
), del AS (
  SELECT * FROM upd WHERE k NOT BETWEEN 600 AND 1199
)
SELECT 1 AS version, 'create' AS operation,
  CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM base) AS BIGINT) AS sum_cents,
  CAST(0 AS BIGINT) AS n_updated
UNION ALL
SELECT 2, 'update',
  CAST((SELECT count(*) FROM upd) AS BIGINT),
  CAST((SELECT sum(cents) FROM upd) AS BIGINT),
  CAST((SELECT count(*) FROM upd WHERE prio = '9-UPDATED') AS BIGINT)
UNION ALL
SELECT 3, 'delete',
  CAST((SELECT count(*) FROM del) AS BIGINT),
  CAST((SELECT sum(cents) FROM del) AS BIGINT),
  CAST((SELECT count(*) FROM del WHERE prio = '9-UPDATED') AS BIGINT)
UNION ALL
SELECT 4, 'restore',
  CAST((SELECT count(*) FROM upd) AS BIGINT),
  CAST((SELECT sum(cents) FROM upd) AS BIGINT),
  CAST((SELECT count(*) FROM upd WHERE prio = '9-UPDATED') AS BIGINT)
ORDER BY version
"""


# q478: expected per-container counts derived from the generator rule
# (one file per doc per lane) — Spark counts from CONTENT magic bytes;
# the two agree iff the sniffer reads every family correctly.
ORACLE_SQL["q478_magic_byte_detection"] = """
WITH a AS (SELECT count(*) AS n FROM documents WHERE doc_id < 100),
     b AS (SELECT count(*) AS n FROM documents WHERE doc_id < 40)
SELECT 'avi' AS container, CAST((SELECT n FROM b) AS BIGINT) AS n_files
UNION ALL SELECT 'bmp', CAST((SELECT n FROM a) AS BIGINT)
UNION ALL SELECT 'flac', CAST((SELECT n FROM b) AS BIGINT)
UNION ALL SELECT 'gif', CAST((SELECT n FROM a) AS BIGINT)
UNION ALL SELECT 'png', CAST((SELECT n FROM a) AS BIGINT)
UNION ALL SELECT 'tiff', CAST((SELECT n FROM b) AS BIGINT)
UNION ALL SELECT 'unknown', CAST((SELECT n FROM a) AS BIGINT)
UNION ALL SELECT 'wav', CAST((SELECT n FROM a) AS BIGINT)
UNION ALL SELECT 'webp', CAST((SELECT n FROM a) AS BIGINT)
ORDER BY container
"""

# q479: the Delta v3 lifecycle replayed — one file per (generation,
# bucket) where generations never share a bucket value, live rows after
# two stacking DV deletes, per-version DV cardinalities, and the scan's
# skipping arithmetic over the files' PRE-DELETE min/max (a DV'd add
# keeps its original stats).
ORACLE_SQL["q479_delta_v3_dv_column_mapping"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 512 AS bucket
  FROM orders WHERE o_orderkey < 2048
), v0 AS (SELECT * FROM base WHERE k < 1024),
v4 AS (SELECT * FROM base WHERE k NOT BETWEEN 300 AND 899),
v5 AS (SELECT * FROM v4 WHERE k NOT BETWEEN 1200 AND 1499),
f AS (
  SELECT bucket, min(k) AS mn, max(k) AS mx FROM base GROUP BY bucket
)
SELECT 'v0' AS probe,
  CAST((SELECT count(DISTINCT bucket) FROM v0) AS INT) AS files_total,
  0 AS files_scanned,
  CAST((SELECT count(*) FROM v0) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM v0) AS BIGINT) AS sum_cents,
  CAST(0 AS BIGINT) AS dv_rows
UNION ALL
SELECT 'v3', CAST((SELECT count(DISTINCT bucket) FROM base) AS INT), 0,
  CAST((SELECT count(*) FROM base) AS BIGINT),
  CAST((SELECT sum(cents) FROM base) AS BIGINT),
  CAST(0 AS BIGINT)
UNION ALL
SELECT 'v4', CAST((SELECT count(DISTINCT bucket) FROM base) AS INT), 0,
  CAST((SELECT count(*) FROM v4) AS BIGINT),
  CAST((SELECT sum(cents) FROM v4) AS BIGINT),
  CAST((SELECT count(*) FROM base WHERE k BETWEEN 300 AND 899) AS BIGINT)
UNION ALL
SELECT 'v5', CAST((SELECT count(DISTINCT bucket) FROM base) AS INT), 0,
  CAST((SELECT count(*) FROM v5) AS BIGINT),
  CAST((SELECT sum(cents) FROM v5) AS BIGINT),
  CAST((SELECT count(*) FROM base WHERE k BETWEEN 300 AND 899
        OR k BETWEEN 1200 AND 1499) AS BIGINT)
UNION ALL
SELECT 'scan_600_1500',
  CAST((SELECT count(DISTINCT bucket) FROM base) AS INT),
  CAST((SELECT count(*) FROM f WHERE mx >= 600 AND mn <= 1500) AS INT),
  CAST((SELECT count(*) FROM v5 WHERE k BETWEEN 600 AND 1500) AS BIGINT),
  CAST((SELECT sum(cents) FROM v5 WHERE k BETWEEN 600 AND 1500) AS BIGINT),
  CAST(0 AS BIGINT)
ORDER BY probe
"""

# q480: conditional MERGE replayed — the first-match-wins CASE (update
# shadows delete on k%4=0, so deletes fire only on k%4=2), subset
# assignments, and the conditional insert, all as plain SQL over orders.
ORACLE_SQL["q480_snaptable_conditional_merge"] = """
WITH t0 AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 2048
), src AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 50) AS BIGINT) AS scents
  FROM orders WHERE o_orderkey >= 1024 AND o_orderkey < 3072
), merged AS (
  SELECT t.k,
    CASE WHEN s.k IS NOT NULL AND s.k % 4 = 0 THEN 'M-UPD'
         ELSE t.prio END AS prio,
    CASE WHEN s.k IS NOT NULL AND s.k % 4 = 0 THEN t.cents + s.scents
         ELSE t.cents END AS cents
  FROM t0 t LEFT JOIN src s ON t.k = s.k
  WHERE NOT (s.k IS NOT NULL AND s.k % 4 <> 0 AND s.k % 2 = 0)
), ins AS (
  SELECT s.k, 'M-INS' AS prio, s.scents AS cents
  FROM src s LEFT JOIN t0 t ON t.k = s.k
  WHERE t.k IS NULL AND s.k % 2 = 0
), v2 AS (
  SELECT * FROM merged UNION ALL SELECT * FROM ins
)
SELECT 'v1' AS probe,
  CAST((SELECT count(*) FROM t0) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM t0) AS BIGINT) AS sum_cents,
  CAST(0 AS BIGINT) AS n_updated,
  CAST(0 AS BIGINT) AS n_inserted
UNION ALL
SELECT 'v2',
  CAST((SELECT count(*) FROM v2) AS BIGINT),
  CAST((SELECT sum(cents) FROM v2) AS BIGINT),
  CAST((SELECT count(*) FROM v2 WHERE prio = 'M-UPD') AS BIGINT),
  CAST((SELECT count(*) FROM v2 WHERE prio = 'M-INS') AS BIGINT)
ORDER BY probe
"""

# q481: the Iceberg lifecycle replayed — one file per (snapshot,
# bucket) where the two snapshots never share a bucket, and the scan's
# skipping over per-bucket min/max bounds.
ORACLE_SQL["q481_iceberg_v2_lifecycle"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 512 AS bucket
  FROM orders WHERE o_orderkey < 2048
), s1 AS (SELECT * FROM base WHERE k < 1024),
f AS (
  SELECT bucket, min(k) AS mn, max(k) AS mx FROM base GROUP BY bucket
)
SELECT 's1' AS probe,
  CAST((SELECT count(DISTINCT bucket) FROM s1) AS INT) AS files_total,
  0 AS files_scanned,
  CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM s1) AS BIGINT) AS sum_cents
UNION ALL
SELECT 's2', CAST((SELECT count(DISTINCT bucket) FROM base) AS INT), 0,
  CAST((SELECT count(*) FROM base) AS BIGINT),
  CAST((SELECT sum(cents) FROM base) AS BIGINT)
UNION ALL
SELECT 'scan_600_1500',
  CAST((SELECT count(DISTINCT bucket) FROM base) AS INT),
  CAST((SELECT count(*) FROM f WHERE mx >= 600 AND mn <= 1500) AS INT),
  CAST((SELECT count(*) FROM base WHERE k BETWEEN 600 AND 1500) AS BIGINT),
  CAST((SELECT sum(cents) FROM base WHERE k BETWEEN 600 AND 1500)
       AS BIGINT)
ORDER BY probe
"""

# q482: SELECTIVE zorder replayed — carried low-half bucket files keep
# their group-by-bucket stats; the rewritten high half re-tiles with
# q471's bounds/bucket/interleave arithmetic computed over the
# SUBSET's own min/max; post-compact scans prune over the union.
ORACLE_SQL["q482_snaptable_selective_optimize"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey // 256 AS b
  FROM orders WHERE o_orderkey < 4096
), fstats AS (
  SELECT b, min(k) AS mnk, max(k) AS mxk FROM base GROUP BY b
), lo AS (  -- carried: files PROVABLY disjoint from [700, 4095]
  SELECT base.* FROM base JOIN fstats USING (b)
  WHERE mxk < 700 OR mnk > 4095
), hi AS (
  SELECT base.* FROM base JOIN fstats USING (b)
  WHERE NOT (mxk < 700 OR mnk > 4095)
), f_lo AS (
  SELECT b, min(k) AS mnk, max(k) AS mxk, min(c) AS mnc, max(c) AS mxc,
         count(*) AS n
  FROM lo GROUP BY b
), bounds AS (
  SELECT min(k) AS klo, max(k) AS khi, min(c) AS clo, max(c) AS chi
  FROM hi
), zed AS (
  SELECT k, c, cents,
    least(greatest(CAST(floor(((k - klo) * 256) / (khi - klo + 1))
                   AS BIGINT), 0), 255) AS za,
    least(greatest(CAST(floor(((c - clo) * 256) / (chi - clo + 1))
                   AS BIGINT), 0), 255) AS zb
  FROM hi, bounds
), tiled AS (
  SELECT k, c, cents, ((((za >> 0) & 1) << 0) | (((zb >> 0) & 1) << 1) | (((za >> 1) & 1) << 2) | (((zb >> 1) & 1) << 3) | (((za >> 2) & 1) << 4) | (((zb >> 2) & 1) << 5) | (((za >> 3) & 1) << 6) | (((zb >> 3) & 1) << 7) | (((za >> 4) & 1) << 8) | (((zb >> 4) & 1) << 9) | (((za >> 5) & 1) << 10) | (((zb >> 5) & 1) << 11) | (((za >> 6) & 1) << 12) | (((zb >> 6) & 1) << 13) | (((za >> 7) & 1) << 14) | (((zb >> 7) & 1) << 15)) >> 12 AS tile FROM zed
), f_hi AS (
  SELECT tile, min(k) AS mnk, max(k) AS mxk, min(c) AS mnc,
         max(c) AS mxc, count(*) AS n
  FROM tiled GROUP BY tile
), f_all AS (
  SELECT mnk, mxk, mnc, mxc, n FROM f_lo
  UNION ALL
  SELECT mnk, mxk, mnc, mxc, n FROM f_hi
)
SELECT '0_carried' AS probe,
  CAST((SELECT count(*) FROM f_lo) AS INT) AS files_total,
  0 AS files_scanned, CAST(0 AS BIGINT) AS rows_skipped,
  CAST(0 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS sum_cents
UNION ALL
SELECT '1_c_post',
  CAST((SELECT count(*) FROM f_all) AS INT),
  CAST((SELECT count(*) FROM f_all WHERE mxc >= 100 AND mnc <= 400)
       AS INT),
  CAST((SELECT coalesce(sum(n), 0) FROM f_all
        WHERE NOT (mxc >= 100 AND mnc <= 400)) AS BIGINT),
  CAST((SELECT count(*) FROM base WHERE c BETWEEN 100 AND 400) AS BIGINT),
  CAST((SELECT sum(cents) FROM base WHERE c BETWEEN 100 AND 400)
       AS BIGINT)
UNION ALL
SELECT '2_k_post',
  CAST((SELECT count(*) FROM f_all) AS INT),
  CAST((SELECT count(*) FROM f_all WHERE mxk >= 900 AND mnk <= 1300)
       AS INT),
  CAST((SELECT coalesce(sum(n), 0) FROM f_all
        WHERE NOT (mxk >= 900 AND mnk <= 1300)) AS BIGINT),
  CAST((SELECT count(*) FROM base WHERE k BETWEEN 900 AND 1300)
       AS BIGINT),
  CAST((SELECT sum(cents) FROM base WHERE k BETWEEN 900 AND 1300)
       AS BIGINT)
ORDER BY probe
"""

# q483: Iceberg position deletes replayed — stacking range deletes as
# predicates, and the sequence-number rule as a plain UNION (the
# post-delete re-append of a deleted range survives).
ORACLE_SQL["q483_iceberg_position_deletes"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 2048
), s2 AS (SELECT * FROM base WHERE k NOT BETWEEN 300 AND 899),
s3 AS (SELECT * FROM s2 WHERE k NOT BETWEEN 1200 AND 1499),
re AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 600
), s4 AS (SELECT * FROM s3 UNION ALL SELECT * FROM re)
SELECT 's1' AS probe,
  CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM base) AS BIGINT) AS sum_cents
UNION ALL
SELECT 's2', CAST((SELECT count(*) FROM s2) AS BIGINT),
  CAST((SELECT sum(cents) FROM s2) AS BIGINT)
UNION ALL
SELECT 's3', CAST((SELECT count(*) FROM s3) AS BIGINT),
  CAST((SELECT sum(cents) FROM s3) AS BIGINT)
UNION ALL
SELECT 's4', CAST((SELECT count(*) FROM s4) AS BIGINT),
  CAST((SELECT sum(cents) FROM s4) AS BIGINT)
ORDER BY probe
"""

# q484: the dedup->DV pipeline replayed — clones at +100000 for
# doc_id%3==0, duplicates = the clones (their originals sort first),
# exactly one file (the clones') gains a vector.
ORACLE_SQL["q484_dedup_dv_pipeline"] = """
WITH docs AS (SELECT doc_id, text FROM documents),
off AS (SELECT max(doc_id) + 1 AS v FROM docs),
clones AS (
  SELECT doc_id + (SELECT v FROM off) AS doc_id, text
  FROM docs WHERE doc_id % 3 = 0
), corpus AS (
  SELECT * FROM docs UNION ALL SELECT * FROM clones
), live AS (  -- keep the smallest doc_id per text (sf1 originals
              -- already contain replica duplicates — replay the RULE,
              -- not the clones-only assumption)
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM corpus
  ) WHERE rn = 1
), dead AS (
  SELECT doc_id FROM corpus EXCEPT SELECT doc_id FROM live
)
SELECT 'v1' AS probe,
  CAST((SELECT count(*) FROM corpus) AS BIGINT) AS a,
  CAST((SELECT sum(doc_id) FROM corpus) AS BIGINT) AS b
UNION ALL
SELECT 'v2',
  CAST((SELECT count(*) FROM live) AS BIGINT),
  CAST((SELECT sum(doc_id) FROM live) AS BIGINT)
UNION ALL
SELECT 'dv_accounting',
  CAST((SELECT count(DISTINCT CASE WHEN doc_id >= (SELECT v FROM off)
                     THEN 1 ELSE 0 END) FROM dead) AS BIGINT),
  CAST((SELECT count(*) FROM dead) AS BIGINT)
ORDER BY probe
"""

# q485: animated WebP is lossless per frame, so the sampled-frame
# pipeline is fully SQL-checkable — frame f of doc d tiles md5(text)
# rotated by f chars under the q474 gray (c,c,c) pixel convention;
# stride-2 keeps frames 0,2,... of doc_id%4+2 total.
ORACLE_SQL["q485_webp_anim_frame_sample"] = """
WITH t AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(doc_id % 12 + 5 AS INTEGER) AS w,
         CAST(doc_id % 6 + 4 AS INTEGER) AS h,
         CAST(doc_id % 4 + 2 AS INTEGER) AS n_frames
  FROM documents WHERE doc_id < 200
), fr AS (
  SELECT doc_id, w, h,
         CAST(u.f AS INTEGER) AS frame_idx,
         substring(hx, CAST(u.f AS INTEGER) + 1)
           || substring(hx, 1, CAST(u.f AS INTEGER)) AS rot
  FROM t, unnest(range(0, n_frames, 2)) AS u(f)
), px AS (
  SELECT doc_id, w, h, frame_idx,
         substring(repeat(rot, CAST(h * w / 32 AS INTEGER) + 1),
                   1, h * w) AS s
  FROM fr
)
SELECT doc_id AS media_id, frame_idx, w AS width, h AS height,
       CAST(h * w * 3 AS BIGINT) AS payload_bytes,
       md5(array_to_string(
             list_transform(range(1, h * w + 1),
               i -> repeat(substring(s, CAST(i AS INTEGER), 1), 3)),
             '')) AS payload_md5
FROM px ORDER BY media_id, frame_idx
"""

# q486: the migration chain preserves the LIVE state at every hop;
# the scan probe encodes the skipping arithmetic in its label (one
# bucket file of four admits [1024, 1535]).
ORACLE_SQL["q486_cross_format_migration"] = """
WITH live AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey < 2048 AND o_orderkey NOT BETWEEN 300 AND 899
)
SELECT '1_delta_live' AS probe,
  CAST((SELECT count(*) FROM live) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM live) AS BIGINT) AS sum_cents
UNION ALL
SELECT '2_snaptable',
  CAST((SELECT count(*) FROM live) AS BIGINT),
  CAST((SELECT sum(cents) FROM live) AS BIGINT)
UNION ALL
SELECT '3_iceberg',
  CAST((SELECT count(*) FROM live) AS BIGINT),
  CAST((SELECT sum(cents) FROM live) AS BIGINT)
UNION ALL
SELECT '4_scan_'
  || CAST((SELECT count(*) FROM (
       SELECT k // 512 AS b, min(k) AS mn, max(k) AS mx
       FROM live GROUP BY b) f
       WHERE mx >= 1024 AND mn <= 1535) AS VARCHAR)
  || '_of_'
  || CAST((SELECT count(DISTINCT k // 512) FROM live) AS VARCHAR),
  CAST((SELECT count(*) FROM live WHERE k BETWEEN 1024 AND 1535)
       AS BIGINT),
  CAST((SELECT sum(cents) FROM live WHERE k BETWEEN 1024 AND 1535)
       AS BIGINT)
ORDER BY probe
"""

# q487: foreign-Delta CDC replayed — the append's inserts, the DV
# delete's exact rows, the CoW delete's rows, and the 0->3 net diff.
ORACLE_SQL["q487_delta_cdc"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 2048
), ins1 AS (SELECT * FROM base WHERE k % 4 = 3),
del2 AS (SELECT * FROM base WHERE k BETWEEN 300 AND 899),
del3 AS (SELECT * FROM base
         WHERE k BETWEEN 1200 AND 1499
           AND k NOT BETWEEN 300 AND 899),
net_del AS (
  SELECT * FROM base
  WHERE (k BETWEEN 300 AND 899 OR k BETWEEN 1200 AND 1499)
    AND k % 4 <> 3
), net_ins AS (
  SELECT * FROM ins1
  WHERE k NOT BETWEEN 300 AND 899 AND k NOT BETWEEN 1200 AND 1499
)
SELECT 0 AS from_v, 1 AS to_v, 'insert' AS change_type,
  CAST((SELECT count(*) FROM ins1) AS BIGINT) AS n_rows,
  CAST((SELECT sum(k) FROM ins1) AS BIGINT) AS sum_key,
  CAST((SELECT sum(cents) FROM ins1) AS BIGINT) AS sum_cents
UNION ALL
SELECT 1, 2, 'delete',
  CAST((SELECT count(*) FROM del2) AS BIGINT),
  CAST((SELECT sum(k) FROM del2) AS BIGINT),
  CAST((SELECT sum(cents) FROM del2) AS BIGINT)
UNION ALL
SELECT 2, 3, 'delete',
  CAST((SELECT count(*) FROM del3) AS BIGINT),
  CAST((SELECT sum(k) FROM del3) AS BIGINT),
  CAST((SELECT sum(cents) FROM del3) AS BIGINT)
UNION ALL
SELECT 0, 3, 'delete',
  CAST((SELECT count(*) FROM net_del) AS BIGINT),
  CAST((SELECT sum(k) FROM net_del) AS BIGINT),
  CAST((SELECT sum(cents) FROM net_del) AS BIGINT)
UNION ALL
SELECT 0, 3, 'insert',
  CAST((SELECT count(*) FROM net_ins) AS BIGINT),
  CAST((SELECT sum(k) FROM net_ins) AS BIGINT),
  CAST((SELECT sum(cents) FROM net_ins) AS BIGINT)
ORDER BY from_v, to_v, change_type
"""

# q488: the foreign-Delta streaming tail replayed — phase 1 is the
# full base (the OPTIMIZE commit adds no rows), phase 2 appends the
# k%5 slice (the CoW delete is skipped by skipChangeCommits), the
# startingVersion=0 replay equals phase 2 exactly (append-only
# history), and the live read applies the delete.
ORACLE_SQL["q488_delta_stream_tail"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 1024
), appended AS (
  SELECT * FROM base WHERE k % 5 = 0
), tail AS (
  SELECT * FROM base UNION ALL SELECT * FROM appended
), live AS (
  SELECT * FROM base WHERE k NOT BETWEEN 300 AND 600
  UNION ALL SELECT * FROM appended
)
SELECT 'p1_snapshot' AS phase,
  CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
  CAST((SELECT sum(k) FROM base) AS BIGINT) AS sum_k,
  CAST((SELECT sum(cents) FROM base) AS BIGINT) AS sum_cents
UNION ALL
SELECT 'p2_tail',
  CAST((SELECT count(*) FROM tail) AS BIGINT),
  CAST((SELECT sum(k) FROM tail) AS BIGINT),
  CAST((SELECT sum(cents) FROM tail) AS BIGINT)
UNION ALL
SELECT 'p3_replay',
  CAST((SELECT count(*) FROM tail) AS BIGINT),
  CAST((SELECT sum(k) FROM tail) AS BIGINT),
  CAST((SELECT sum(cents) FROM tail) AS BIGINT)
UNION ALL
SELECT 'p4_live',
  CAST((SELECT count(*) FROM live) AS BIGINT),
  CAST((SELECT sum(k) FROM live) AS BIGINT),
  CAST((SELECT sum(cents) FROM live) AS BIGINT)
ORDER BY phase
"""

# q489: the foreign-Iceberg streaming tail replayed — identical
# algebra to q488 (the two sources share the phase semantics by
# design): phase 1 = full base (the replace/compaction snapshot adds
# no rows), phase 2 appends the k%5 slice (the delete snapshot is
# skipped), the startingSequence=1 replay equals phase 2, the live
# read applies the position delete.
ORACLE_SQL["q489_iceberg_stream_tail"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 1024
), appended AS (
  SELECT * FROM base WHERE k % 5 = 0
), tail AS (
  SELECT * FROM base UNION ALL SELECT * FROM appended
), live AS (
  SELECT * FROM base WHERE k NOT BETWEEN 300 AND 600
  UNION ALL SELECT * FROM appended
)
SELECT 'p1_snapshot' AS phase,
  CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
  CAST((SELECT sum(k) FROM base) AS BIGINT) AS sum_k,
  CAST((SELECT sum(cents) FROM base) AS BIGINT) AS sum_cents
UNION ALL
SELECT 'p2_tail',
  CAST((SELECT count(*) FROM tail) AS BIGINT),
  CAST((SELECT sum(k) FROM tail) AS BIGINT),
  CAST((SELECT sum(cents) FROM tail) AS BIGINT)
UNION ALL
SELECT 'p3_replay',
  CAST((SELECT count(*) FROM tail) AS BIGINT),
  CAST((SELECT sum(k) FROM tail) AS BIGINT),
  CAST((SELECT sum(cents) FROM tail) AS BIGINT)
UNION ALL
SELECT 'p4_live',
  CAST((SELECT count(*) FROM live) AS BIGINT),
  CAST((SELECT sum(k) FROM live) AS BIGINT),
  CAST((SELECT sum(cents) FROM live) AS BIGINT)
ORDER BY phase
"""

# q490: the retention lifecycle replayed — the row algebra is pure
# SQL over orders; the file/log accounting is DETERMINISTIC because
# every lane write is coalesce(1): Delta vacuum removes exactly the
# overwritten create's 1 data file and the 2 pre-checkpoint commit
# JSONs; Iceberg expire drops 3 snapshots whose closure is exactly 9
# files (3 manifest-lists + 2 data manifests + 1 delete manifest +
# 2 data files + 1 position-delete parquet).
ORACLE_SQL["q490_foreign_retention"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 1024
), delta_live AS (
  SELECT * FROM base
  WHERE k % 2 = 0 AND k NOT BETWEEN 100 AND 300
), sevens AS (
  SELECT * FROM base WHERE k % 7 = 0
), delta_post AS (
  SELECT * FROM delta_live UNION ALL SELECT * FROM sevens
), ice_live AS (
  SELECT * FROM base WHERE k NOT BETWEEN 100 AND 300
), ice_post AS (
  SELECT * FROM ice_live UNION ALL SELECT * FROM sevens
)
SELECT 'delta_vacuum' AS probe,
  CAST(1 AS BIGINT) AS n_removed, CAST(2 AS BIGINT) AS n_meta,
  CAST((SELECT count(*) FROM delta_live) AS BIGINT) AS n_rows,
  CAST((SELECT sum(cents) FROM delta_live) AS BIGINT) AS sum_cents
UNION ALL
SELECT 'delta_post_append', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
  CAST((SELECT count(*) FROM delta_post) AS BIGINT),
  CAST((SELECT sum(cents) FROM delta_post) AS BIGINT)
UNION ALL
SELECT 'iceberg_expire', CAST(9 AS BIGINT), CAST(3 AS BIGINT),
  CAST((SELECT count(*) FROM ice_live) AS BIGINT),
  CAST((SELECT sum(cents) FROM ice_live) AS BIGINT)
UNION ALL
SELECT 'iceberg_post_append', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
  CAST((SELECT count(*) FROM ice_post) AS BIGINT),
  CAST((SELECT sum(cents) FROM ice_post) AS BIGINT)
ORDER BY probe
"""

# q491: timestampAsOf replayed — asof_1500 sees only v0 (k%3=0),
# asof_2000 adds v1 (k%3=1), asof_9999 the full base; the history row
# is (3 commits, 3 single-file data adds, 3 WRITE operations).
ORACLE_SQL["q491_delta_timestamp_travel"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 1024
), v0 AS (SELECT * FROM base WHERE k % 3 = 0),
v01 AS (SELECT * FROM base WHERE k % 3 IN (0, 1))
SELECT 'asof_1500' AS probe,
  CAST((SELECT count(*) FROM v0) AS BIGINT) AS n_rows,
  CAST((SELECT sum(k) FROM v0) AS BIGINT) AS sum_k,
  CAST((SELECT sum(cents) FROM v0) AS BIGINT) AS sum_cents
UNION ALL
SELECT 'asof_2000',
  CAST((SELECT count(*) FROM v01) AS BIGINT),
  CAST((SELECT sum(k) FROM v01) AS BIGINT),
  CAST((SELECT sum(cents) FROM v01) AS BIGINT)
UNION ALL
SELECT 'asof_9999',
  CAST((SELECT count(*) FROM base) AS BIGINT),
  CAST((SELECT sum(k) FROM base) AS BIGINT),
  CAST((SELECT sum(cents) FROM base) AS BIGINT)
UNION ALL
SELECT 'history', CAST(3 AS BIGINT), CAST(3 AS BIGINT),
  CAST(3 AS BIGINT)
ORDER BY probe
"""
