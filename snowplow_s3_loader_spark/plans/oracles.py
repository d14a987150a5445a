"""DuckDB oracle SQL — one entry per queries.py entry (q28_ann_srp excluded:
approximate-by-design, rows-only check).

Type-parity rules applied everywhere (Spark is the reference type):
  - DuckDB sum(INT) is HUGEINT -> CAST AS BIGINT
  - year()/month()/length()/len()/strlen()/row_number() are BIGINT -> CAST AS
    INTEGER where Spark yields int
  - float aggregates rounded identically on both sides
  - decimal literals written ::DOUBLE so DuckDB doesn't do DECIMAL math
"""

from __future__ import annotations

_STOP_EN = "('the','a','and','of','to','in','is')"
_TOKS = "string_split_regex(trim(text), ' +')"
_PUNCT = "CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)"
_FP = "md5(lower(regexp_replace(trim(text), ' +', ' ', 'g')))"

_SDJ_VALID_FILTER = "event_id % 10 NOT IN (0, 5)"
_SDJ_VALID_LINE = (
    "'{\"schema\": \"iglu:com.acme/' || event_type || '/jsonschema/1-0-' || "
    "CAST(event_id % 3 AS VARCHAR) || '\", \"data\": ' || props || '}'"
)

ORACLES: dict[str, str] = {}

ORACLES["q01_scan_filter_project"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
ORDER BY l_orderkey, l_linenumber
"""

ORACLES["q02_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q03_broadcast_join"] = """
SELECT r_name, n_name
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY r_name, n_name
"""

ORACLES["q04_shipping_priority"] = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

ORACLES["q05_semi_join"] = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
ORDER BY c_custkey
"""

ORACLES["q06_anti_join"] = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
ORDER BY c_custkey
"""

ORACLES["q07_window_topn_per_customer"] = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""

# (orderkey, linenumber) is NOT unique in the synthetic lineitem; the
# cent value as final ORDER BY key makes remaining ties sum-neutral.
ORACLES["q08_running_revenue"] = """
SELECT l_suppkey, l_orderkey, l_linenumber,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0::DOUBLE
    AS running_revenue
FROM lineitem
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""

ORACLES["q09_rollup_revenue"] = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

ORACLES["q10_count_distinct"] = """
SELECT count(DISTINCT l_orderkey) AS distinct_orders, count(*) AS total_rows FROM lineitem
"""

ORACLES["q11_set_ops"] = """
WITH urgent AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     ff AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'union' AS op, o_orderkey FROM (SELECT o_orderkey FROM urgent UNION SELECT o_orderkey FROM ff)
UNION ALL
SELECT 'intersect' AS op, o_orderkey FROM (SELECT o_orderkey FROM urgent INTERSECT SELECT o_orderkey FROM ff)
UNION ALL
SELECT 'except' AS op, o_orderkey FROM (SELECT o_orderkey FROM urgent EXCEPT SELECT o_orderkey FROM ff)
ORDER BY op, o_orderkey
"""

ORACLES["q12_scalar_functions"] = """
SELECT o_orderkey,
  upper(substr(o_orderpriority, 3, 6)) AS pri_word,
  o_orderstatus || '-' || o_orderpriority AS tag,
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(month(o_orderdate) AS INTEGER) AS mo,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
  round(o_totalprice * 0.2::DOUBLE, 2) AS price_fifth,
  round(abs(o_totalprice - 100000.0::DOUBLE), 2) AS price_dev,
  CAST(length(o_orderpriority) AS INTEGER) AS pri_len,
  replace(o_orderpriority, '-', '_') AS pri_sub,
  (o_orderpriority LIKE '1-%') AS is_urgent
FROM orders
ORDER BY o_orderkey
"""

ORACLES["q13_topk_recent_events"] = """
SELECT event_type, event_id, ts, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT event_type, event_id, ts,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id) AS rn
  FROM events
)
WHERE rn <= 10
ORDER BY event_type, rn
"""

ORACLES["q14_dedup_events"] = """
WITH first AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT event_type, count(*) AS n_unique_pairs, round(sum(value), 2) AS total_value
FROM first GROUP BY event_type ORDER BY event_type
"""

ORACLES["q15_sdj_parse"] = f"""
SELECT 'com.acme' AS vendor, event_type AS name, CAST(event_id % 3 AS INTEGER) AS addition,
       count(*) AS n
FROM events
WHERE {_SDJ_VALID_FILTER}
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

ORACLES["q16_bad_row_classify"] = """
SELECT CASE WHEN event_id % 10 = 5 THEN 'Can''t parse JSON holding self-describing event'
            ELSE 'Can''t extract schema from self-describing event: INVALID_DATA_PAYLOAD'
       END AS bad_message,
       count(*) AS n
FROM events
WHERE event_id % 10 IN (0, 5)
GROUP BY 1
ORDER BY 1
"""

ORACLES["q17_size_violation_trim"] = """
SELECT doc_id,
  CASE WHEN strlen(text) >= 300 THEN 'SizeViolation' ELSE 'GenericError' END AS kind,
  CASE WHEN strlen(text) >= 300 THEN substr(text, 1, 30) ELSE text END AS payload_out
FROM documents
ORDER BY doc_id
"""

ORACLES["q18_enriched_parse"] = """
SELECT CAST(ts AS DATE) AS day,
  min(date_trunc('second', ts)) AS min_ts,
  max(date_trunc('second', ts)) AS max_ts,
  count(*) AS n
FROM events
GROUP BY 1
ORDER BY 1
"""

ORACLES["q19_partition_paths"] = f"""
SELECT 'com.acme.' || event_type || '/model=1/date=' || strftime(ts, '%Y-%m-%d') AS path,
       count(*) AS n
FROM events
WHERE {_SDJ_VALID_FILTER}
GROUP BY 1
ORDER BY 1
"""

ORACLES["q20_batch_group_bytes"] = f"""
SELECT 'iglu:com.acme/' || event_type || '/jsonschema/1-0-' || CAST(event_id % 3 AS VARCHAR)
         AS schema_uri,
       count(*) AS n,
       CAST(sum(strlen({_SDJ_VALID_LINE})) AS BIGINT) AS total_bytes
FROM events
WHERE {_SDJ_VALID_FILTER}
GROUP BY 1
ORDER BY 1
"""

ORACLES["q21_latency_metric"] = """
SELECT date_trunc('hour', ts) AS hour, min(ts) AS min_ts,
  date_diff('microsecond', min(ts), TIMESTAMP '2024-02-01 00:00:00') // 1000000 AS latency_sec,
  count(*) AS n
FROM events
GROUP BY 1
ORDER BY 1
"""

# Loader roundtrip: files written+read by Spark must reproduce exactly the
# per-partition counts derivable from the raw events.
ORACLES["q22_loader_roundtrip"] = ORACLES["q19_partition_paths"]

ORACLES["q23_dedup_exact"] = """
SELECT count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_unique_texts,
       count(*) - count(DISTINCT md5(text)) AS n_dup_docs
FROM documents
"""

ORACLES["q24_token_jaccard"] = f"""
WITH d AS (
  SELECT doc_id AS id, lang AS blk, list_distinct({_TOKS}) AS toks
  FROM documents WHERE doc_id % 10 = 0
),
sz AS (SELECT id, len(toks) AS sz FROM d),
p AS (SELECT id, blk, unnest(toks) AS tok FROM d),
c AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
  FROM p a JOIN p b ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
FROM c JOIN sz sa ON sa.id = c.id_a JOIN sz sb ON sb.id = c.id_b
WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.5
ORDER BY id_a, id_b
"""

ORACLES["q25_minhash_lsh"] = f"""
WITH d AS (
  SELECT doc_id AS id, list_distinct({_TOKS}) AS toks
  FROM documents WHERE doc_id % 10 = 0
),
t AS (SELECT id, unnest(toks) AS tok FROM d),
s AS (SELECT id, tok, unnest(range(16)) AS seed FROM t),
h AS (
  SELECT id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || tok)) AS mh
  FROM s GROUP BY id, seed
),
b AS (
  SELECT id, seed // 4 AS band_id, string_agg(mh, '|' ORDER BY seed) AS band_hash
  FROM h GROUP BY id, seed // 4
)
SELECT DISTINCT a.id AS id_a, b2.id AS id_b
FROM b a JOIN b b2 ON a.band_id = b2.band_id AND a.band_hash = b2.band_hash AND a.id < b2.id
ORDER BY id_a, id_b
"""

ORACLES["q26_simhash"] = f"""
WITH d AS (
  SELECT doc_id AS id, list_distinct({_TOKS}) AS toks
  FROM documents WHERE doc_id % 10 = 0
),
t AS (SELECT id, unnest(toks) AS tok FROM d),
hh AS (SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t),
bits AS (SELECT id, h, unnest(range(60)) AS bit FROM hh),
v AS (
  SELECT id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM bits GROUP BY id, bit
)
SELECT id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM v GROUP BY id ORDER BY id
"""

ORACLES["q27_ann_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
s AS (
  SELECT query_id, e.vec_id AS neighbor_id,
    round(list_dot_product(qv, v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
  FROM q JOIN e ON e.vec_id != q.query_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
ORDER BY query_id, rank
"""

ORACLES["q29_lang_id"] = f"""
WITH t AS (SELECT lang, {_TOKS} AS toks FROM documents),
h AS (
  SELECT lang,
    len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS h_de,
    len(list_filter(toks, x -> x IN {_STOP_EN})) AS h_en,
    len(list_filter(toks, x -> x IN ('el','la','los','y','es'))) AS h_es,
    len(list_filter(toks, x -> x IN ('le','les','et','est','une'))) AS h_fr,
    len(list_filter(toks, x -> x IN ('de','shi','le'))) AS h_zh
  FROM t
),
p AS (
  SELECT lang,
    CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'unknown'
         WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
         WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
         WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
         WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
         ELSE 'zh'
    END AS pred_lang
  FROM h
)
SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["q30_text_quality"] = f"""
WITH b AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS INTEGER) AS n_tokens,
  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6)
    AS avg_token_len,
  round({_PUNCT} / length(text), 6) AS punct_ratio,
  round(CAST(len(list_filter(toks, x -> x IN {_STOP_EN})) AS DOUBLE) / len(toks), 6)
    AS stopword_ratio,
  round(0.4::DOUBLE * least(1.0::DOUBLE, CAST(len(toks) AS DOUBLE) / 50.0::DOUBLE)
        + 0.3::DOUBLE * (1.0::DOUBLE - {_PUNCT} / length(text))
        + 0.3::DOUBLE * (CAST(len(list_filter(toks, x -> x IN {_STOP_EN})) AS DOUBLE) / len(toks)),
        6) AS quality
FROM b ORDER BY doc_id
"""

ORACLES["q31_token_corpus_stats"] = f"""
WITH tok AS (SELECT lang, doc_id, unnest({_TOKS}) AS tok FROM documents)
SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS total_tokens,
       count(DISTINCT tok) AS distinct_tokens
FROM tok GROUP BY lang ORDER BY lang
"""

ORACLES["q32_fingerprint"] = f"""
SELECT source, count(*) AS n_docs,
       count(DISTINCT {_FP}) AS n_unique_fp,
       min({_FP}) AS min_fp
FROM documents GROUP BY source ORDER BY source
"""

ORACLES["q33_multimodal_features"] = """
SELECT doc_id AS media_id, 'text/plain' AS mime,
  CAST(strlen(text) AS INTEGER) AS n_bytes,
  CAST((strlen(text) + 255) // 256 AS INTEGER) AS n_chunks,
  md5(text) AS digest
FROM documents ORDER BY media_id
"""

ORACLES["q35_cube_revenue"] = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

ORACLES["q36_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

# q37: HLL error-bound invariant — the sketch value itself is engine-specific,
# but |approx-exact|/exact <= 0.05 is deterministic for a fixed input+rsd
# (measured <= 0.0041 at all SFs), so the oracle emits exact + literal 1.
ORACLES["q37_approx_distinct"] = """
SELECT count(DISTINCT l_orderkey) AS exact_orders,
       count(*) AS total_rows,
       1 AS hll_within_error
FROM lineitem
"""

ORACLES["q38_sessionization"] = """
WITH g AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM g
),
r AS (
  SELECT user_id, ts, event_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM s
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM r GROUP BY user_id, session_id ORDER BY user_id, session_id
"""

ORACLES["q39_range_join"] = """
SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["q40_asof_join"] = """
WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
     signups AS (SELECT * FROM events WHERE event_type = 'signup')
SELECT c.event_id, s.event_id AS signup_event_id,
       date_diff('microsecond', s.ts, c.ts) // 1000000 AS gap_sec
FROM clicks c ASOF LEFT JOIN signups s ON c.user_id = s.user_id AND c.ts >= s.ts
ORDER BY c.event_id
"""

ORACLES["q41_brand_revenue"] = """
SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
HAVING count(*) > 50
ORDER BY p_brand
"""

ORACLES["q42_supplier_rank"] = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, revenue,
       CAST(dense_rank() OVER (ORDER BY revenue DESC, s_suppkey) AS INTEGER) AS rnk,
       CAST(ntile(4) OVER (ORDER BY revenue DESC, s_suppkey) AS INTEGER) AS quartile
FROM rev JOIN supplier ON l_suppkey = s_suppkey
ORDER BY rnk, s_suppkey
"""

ORACLES["q43_scalar_subquery"] = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
ORDER BY o_orderkey
"""

ORACLES["q44_not_exists"] = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate >= TIMESTAMP '2001-01-01'
)
ORDER BY s_suppkey
"""

ORACLES["q45_full_outer_join"] = """
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
  ON c.c_nationkey = s.s_nationkey
ORDER BY nationkey
"""

ORACLES["q46_json_extract"] = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLES["q47_subword_tokens"] = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER)
    AS n_subwords,
  CAST(len(string_split_regex(trim(text), ' +')) AS INTEGER) AS n_whitespace_tokens
FROM documents ORDER BY doc_id
"""

# q48: IVF recall invariant — assignments are engine-specific, but recall@5 of
# the seeded IVF result vs the in-query brute-force top-5 is deterministic
# (measured per-query min 0.4 at sf0.01 and sf0.1; threshold 0.2 = 2x margin),
# so the oracle emits the query-id list with literal 1.
ORACLES["q48_ann_ivf"] = """
SELECT vec_id AS query_id, 1 AS recall_ok
FROM embeddings
WHERE vec_id % 100 = 0
ORDER BY query_id
"""

ORACLES["q49_grouped_percentiles"] = """
SELECT event_type,
  round(quantile_cont(value, 0.5), 6) AS p50,
  round(quantile_cont(value, 0.95), 6) AS p95,
  count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["q50_embedding_near_dup"] = """
WITH e AS (SELECT label, vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.id AS id_a, b.id AS id_b,
  round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
    AS cos_sim
FROM e a JOIN e b ON a.label = b.label AND a.id < b.id
WHERE round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
ORDER BY id_a, id_b
"""

ORACLES["q51_null_handling"] = """
WITH s AS (
  SELECT event_type,
         CASE WHEN event_id % 7 != 0 THEN value END AS v,
         nullif(event_type, 'error') AS et_nn
  FROM events
)
SELECT event_type,
  count(*) AS n_rows,
  count(v) AS n_nonnull,
  round(sum(coalesce(v, 0.0)), 2) AS sum_coalesced,
  count(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 END) AS n_null_safe_null,
  count(et_nn) AS n_not_error
FROM s GROUP BY event_type ORDER BY event_type
"""

ORACLES["q52_array_functions"] = """
WITH g AS (SELECT event_type, list_sort(list(event_id)) AS ids FROM events GROUP BY event_type)
SELECT event_type,
  array_to_string(ids[1:5], ',') AS first5_ids,
  CAST(len(ids) AS INTEGER) AS n_ids,
  ids[1] AS min_id,
  ids[-1] AS max_id
FROM g ORDER BY event_type
"""

ORACLES["q53_window_analytics"] = """
SELECT user_id, event_id,
  lag(event_id, 1, -1) OVER w AS prev_id,
  lead(event_id, 2, -1) OVER w AS next2_id,
  first_value(event_id) OVER w AS first_id,
  last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume
FROM events
WHERE user_id % 10 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""

ORACLES["q34_frame_sample"] = """
WITH m AS (SELECT doc_id AS media_id, strlen(text) AS nb FROM documents),
c AS (SELECT media_id, nb, unnest(range((nb + 255) // 256)) AS chunk_idx FROM m)
SELECT media_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(least(256, nb - chunk_idx * 256) AS INTEGER) AS chunk_bytes
FROM c WHERE chunk_idx % 4 = 0
ORDER BY media_id, chunk_idx
"""

ORACLES["q54_pivot"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
FROM orders GROUP BY 1 ORDER BY yr
"""

ORACLES["q55_unpivot"] = """
WITH wide AS (
  SELECT l_returnflag,
    round(sum(l_quantity), 2) AS qty,
    round(sum(l_extendedprice), 2) AS price,
    round(sum(l_discount), 4) AS disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
  UNION ALL SELECT l_returnflag, 'price', price FROM wide
  UNION ALL SELECT l_returnflag, 'disc', disc FROM wide
) ORDER BY l_returnflag, measure
"""

# char-3-gram shingles over lowercased, whitespace-collapsed text; texts
# shorter than 3 chars contribute their whole text as one shingle (matches
# dedup.char_ngrams)
_NORMT = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
_SHINGLES = (
    f"list_distinct([CAST('0x' || substr(md5(substr({_NORMT}, x, 3)), 1, 15) AS BIGINT) "
    f"for x in range(1, greatest(strlen({_NORMT}) - 2, 1) + 1)])"
)

ORACLES["q56_ngram_jaccard"] = f"""
WITH d AS (
  SELECT doc_id AS id, lang AS blk, {_SHINGLES} AS toks
  FROM documents WHERE doc_id % 10 = 0
),
sz AS (SELECT id, len(toks) AS sz FROM d),
p AS (SELECT id, blk, unnest(toks) AS tok FROM d),
c AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
  FROM p a JOIN p b ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
FROM c JOIN sz sa ON sa.id = c.id_a JOIN sz sb ON sb.id = c.id_b
WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.6
ORDER BY id_a, id_b
"""

ORACLES["q57_time_bucket_gapfill"] = """
WITH rolled AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
  FROM rolled GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM span
)
SELECT s.event_type, s.bucket,
       coalesce(r.n_events, 0) AS n_events,
       coalesce(r.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN rolled r
  ON r.event_type = s.event_type AND r.bucket = s.bucket
ORDER BY s.event_type, s.bucket
"""

ORACLES["q58_deterministic_split"] = """
WITH assigned AS (
  SELECT doc_id, text,
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id,
       round(avg(strlen(text)), 4) AS avg_len
FROM assigned GROUP BY split ORDER BY split
"""

ORACLES["q59_map_functions"] = """
WITH b AS (
  SELECT o_orderkey,
         MAP {'status': o_orderstatus, 'pri': o_orderpriority} AS m
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o_orderkey,
  array_to_string(map_keys(m), ',') AS keys_csv,
  array_to_string(map_values(m), '|') AS vals_csv,
  m['status'][1] AS status_val,
  CAST(cardinality(m) AS INTEGER) AS n_entries,
  list_contains(map_keys(m), 'pri') AS has_pri,
  list_contains(map_keys(m), 'clerk') AS has_clerk,
  CAST(cardinality(map_concat(m, MAP {'extra': 'x'})) AS INTEGER) AS n_after_concat
FROM b ORDER BY o_orderkey
"""

# recompute fake_decode_image's md5-keyed pixel stream in SQL: 48 digests of
# md5(text || ':' || i), 16 bytes each = 768 bytes = one 16x16x3 image;
# channel = position % 3; mean-pool by 2 preserves exact channel means
# (integer sums / 256, exact in float64 in both engines)
ORACLES["q60_image_stats"] = """
WITH m AS (SELECT doc_id AS media_id, text AS p FROM documents WHERE doc_id % 20 = 0),
d AS (SELECT media_id, i, md5(p || ':' || CAST(i AS VARCHAR)) AS hx
      FROM m, (SELECT unnest(range(48)) AS i)),
b AS (SELECT media_id, i*16 + j AS pos,
             CAST('0x' || substr(hx, CAST(j*2+1 AS INT), 2) AS INT) AS byte
      FROM d, (SELECT unnest(range(16)) AS j)),
ch AS (SELECT media_id, pos % 3 AS c, avg(byte) AS mean FROM b GROUP BY 1, 2)
SELECT media_id,
  printf('%.4f', max(CASE WHEN c=0 THEN mean END)) AS mean_r,
  printf('%.4f', max(CASE WHEN c=1 THEN mean END)) AS mean_g,
  printf('%.4f', max(CASE WHEN c=2 THEN mean END)) AS mean_b,
  8 AS ds_height, 8 AS ds_width
FROM ch GROUP BY media_id ORDER BY media_id
"""

ORACLES["q61_stratified_sample"] = """
WITH kept AS (
  SELECT doc_id, lang FROM documents
  WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
     OR (lang = 'de' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'gggg')
     OR (lang = 'fr' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000')
)
SELECT lang, count(*) AS n_kept, min(doc_id) AS min_id
FROM kept GROUP BY lang ORDER BY lang
"""

ORACLES["q62_sequence_packing"] = f"""
WITH t AS (
  SELECT doc_id, lang, CAST(len({_TOKS}) AS INTEGER) AS n_tokens FROM documents
),
p AS (
  SELECT lang, n_tokens,
    CAST((sum(n_tokens) OVER w - n_tokens) // 2048 AS BIGINT) AS pack_id,
    CAST((sum(n_tokens) OVER w - n_tokens) % 2048 AS BIGINT) AS pack_offset
  FROM t
  WINDOW w AS (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT lang, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(pack_offset) AS first_offset
FROM p GROUP BY lang, pack_id ORDER BY lang, pack_id
"""

ORACLES["q63_regexp_functions"] = r"""
SELECT o_orderkey,
  regexp_extract(o_orderpriority, '^(\d+)-(\w+)$', 1) AS pri_num,
  regexp_extract(o_orderpriority, '^(\d+)-(\w+)$', 2) AS pri_word,
  regexp_matches(o_orderpriority, '^[12]-') AS is_high,
  CAST(len(regexp_extract_all(o_orderpriority, '[AEIOU]')) AS INTEGER) AS n_vowels,
  array_to_string(regexp_extract_all(o_orderpriority, '[A-Z]+'), '_') AS caps,
  regexp_replace(o_orderpriority, '\d', '#', 'g') AS masked
FROM orders WHERE o_orderkey % 50 = 0
ORDER BY o_orderkey
"""

ORACLES["q64_conditional_functions"] = """
SELECT l_orderkey, l_linenumber,
  nullif(l_returnflag, 'N') AS flag_or_null,
  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_filled,
  CASE WHEN nullif(l_returnflag, 'N') IS NOT NULL THEN 'returned' ELSE 'kept' END AS nvl2_tag,
  greatest(l_quantity, l_discount * 100) AS greatest_v,
  least(round(l_extendedprice, 0), 10000.0::DOUBLE) AS least_v,
  CASE WHEN l_quantity < 10 THEN 'small'
       WHEN l_quantity < 30 THEN 'medium'
       ELSE 'large' END AS size_band
FROM lineitem WHERE l_orderkey % 200 = 0
ORDER BY l_orderkey, l_linenumber
"""

ORACLES["q65_dedup_clusters"] = f"""
WITH RECURSIVE d AS (
  SELECT doc_id AS id, lang AS blk, list_distinct({_TOKS}) AS toks
  FROM documents WHERE doc_id % 10 = 0
),
sz AS (SELECT id, len(toks) AS sz FROM d),
p AS (SELECT id, blk, unnest(toks) AS tok FROM d),
c AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
  FROM p a JOIN p b ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
),
pr AS (
  SELECT c.id_a, c.id_b
  FROM c JOIN sz sa ON sa.id = c.id_a JOIN sz sb ON sb.id = c.id_b
  WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.5
),
e AS (SELECT id_a AS s, id_b AS t FROM pr UNION SELECT id_b, id_a FROM pr),
walk(v, r) AS (
  SELECT s, s FROM e
  UNION
  SELECT w.v, e.t FROM walk w JOIN e ON w.r = e.s
)
SELECT v AS doc_id, MIN(r) AS cluster_id FROM walk GROUP BY v ORDER BY doc_id
"""

ORACLES["q66_repetition_quality"] = f"""
WITH t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
base AS (
  SELECT id, toks,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
  FROM t
),
b AS (
  SELECT id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_token_ratio,
         CASE WHEN len(bg) > 0
              THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
              ELSE 0.0 END AS dup_bigram_frac
  FROM base
),
tc AS (
  SELECT id, tok, count(*) AS c
  FROM (SELECT id, unnest(toks) AS tok FROM t) GROUP BY 1, 2
),
tm AS (SELECT id, max(c) AS top_c FROM tc GROUP BY id)
SELECT b.id, b.n_tokens, b.distinct_token_ratio,
       round(CAST(tm.top_c AS DOUBLE) / b.n_tokens, 6) AS top_token_frac,
       b.dup_bigram_frac,
       (b.distinct_token_ratio >= 0.2
        AND round(CAST(tm.top_c AS DOUBLE) / b.n_tokens, 6) <= 0.2
        AND b.dup_bigram_frac <= 0.9) AS keep
FROM b JOIN tm ON b.id = tm.id
ORDER BY b.id
"""

ORACLES["q67_tfidf_top_terms"] = f"""
WITH t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents WHERE doc_id % 10 = 0),
tf AS (
  SELECT id, tok AS term, count(*) AS tf
  FROM (SELECT id, unnest(toks) AS tok FROM t) GROUP BY 1, 2
),
n AS (SELECT count(*) AS n FROM t),
dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
s AS (
  SELECT tf.id, tf.term,
         round(tf.tf * ln((n.n + 1.0) / (dfr.df + 1.0)), 6) AS score
  FROM tf JOIN dfr ON tf.term = dfr.term CROSS JOIN n
)
SELECT id, term, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY score DESC, term ASC) AS rank
  FROM s
) WHERE rank <= 3
ORDER BY id, rank
"""

ORACLES["q68_bm25_search"] = f"""
WITH t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
n AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM t),
tf AS (
  SELECT id, tok AS term, count(*) AS tf
  FROM (SELECT id, unnest(toks) AS tok FROM t)
  WHERE tok IN ('spark', 'join', 'fast')
  GROUP BY 1, 2
),
dl AS (SELECT id, len(toks) AS dl FROM t),
dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per AS (
  SELECT tf.id, tf.term,
         ln(1.0 + (n.n - dfr.df + 0.5) / (dfr.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avgdl)) AS s
  FROM tf JOIN dfr ON tf.term = dfr.term JOIN dl ON tf.id = dl.id CROSS JOIN n
),
sc AS (
  SELECT id,
         round(coalesce(sum(CASE WHEN term = 'spark' THEN s END), 0.0)
             + coalesce(sum(CASE WHEN term = 'join' THEN s END), 0.0)
             + coalesce(sum(CASE WHEN term = 'fast' THEN s END), 0.0), 6) AS score
  FROM per GROUP BY id
)
SELECT id, score, CAST(rn AS INTEGER) AS rank FROM (
  SELECT id, score, row_number() OVER (ORDER BY score DESC, id ASC) AS rn FROM sc
) WHERE rn <= 10
ORDER BY rank
"""


def _srp_planes_values(n_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    """The SAME hyperplanes the Spark operator uses (rounded to 6 decimals,
    so the literals are exact in both engines), rendered as a SQL VALUES
    list — SRP-LSH is deterministic given its planes, which makes the
    'approximate' ANN oracle-checkable after all."""
    from snowplow_s3_loader_spark.operators.similarity import srp_planes

    rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(w) for w in plane))
        for p, plane in enumerate(srp_planes(dim, n_planes, seed))
    )
    return rows


ORACLES["q28_ann_srp"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pl AS (SELECT * FROM (VALUES
    {_srp_planes_values()}
) AS t(p, plane)),
bits AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(e.v, pl.plane) >= 0
                  THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id
),
eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN bits b USING (vec_id)),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM eb WHERE vec_id % 100 = 0),
s AS (
  SELECT q.query_id, eb.vec_id AS neighbor_id,
    round(list_dot_product(qv, v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
  FROM q JOIN eb ON eb.bucket = q.bucket AND eb.vec_id != q.query_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
ORDER BY query_id, rank
"""

# q70: overlapping fixed-window chunking — 64-token windows, stride 48;
# starts 0, 48, ..., last stride multiple with unseen tokens (short docs ->
# exactly one chunk). DuckDB '//' floors toward -inf like Spark floor(/).
ORACLES["q70_chunk_documents"] = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents
),
starts AS (
  SELECT doc_id, toks,
         unnest(range(0, 1 + greatest(0, (len(toks) - 17) // 48))) AS chunk_id
  FROM toks
)
SELECT doc_id AS id,
       CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(chunk_id * 48 AS INTEGER) AS start_token,
       CAST(len(toks[chunk_id*48+1 : chunk_id*48+64]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(toks[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text
FROM starts
ORDER BY id, chunk_id
"""

# q71: SemDeDup invariant — k-means cells are engine-specific, so the
# oracle emits the id spine with literal 1 and the ENGINE must land ok=1
# for every vector via a falsifiable audit (components of the pair graph
# recomputed independently of the keep decisions; each component must
# have exactly one survivor and it must be the component-min id; isolated
# vectors must be kept). Wrong survivor / double-keep / zero-keep /
# dropped-isolated all flip ok->0 and fail the hash (same engine-side-
# invariant pattern as q48's recall bound; round-5 ADVICE fix).
ORACLES["q71_semantic_dedup"] = """
SELECT vec_id, 1 AS ok FROM embeddings ORDER BY vec_id
"""

# q72: leakage-safe split — assignment is keyed on md5(text), thresholds
# are the same cumulative hex bounds split_thresholds derives for
# {train .8, val .1, test .1} at hex_chars=4 (0xcccc / 0xe666); a single
# mis-assigned row moves n_docs AND sum_id and fails the hash.
ORACLES["q72_leakage_safe_split"] = """
WITH assigned AS (
  SELECT doc_id, md5(text) AS grp,
         CASE WHEN substr(md5(md5(text)), 1, 4) < 'cccc' THEN 'train'
              WHEN substr(md5(md5(text)), 1, 4) < 'e666' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       CAST(sum(doc_id) AS BIGINT) AS sum_id
FROM assigned GROUP BY split ORDER BY split
"""

# q73: per-group reservoir — identical (md5(id), id) ranking window; the
# kept-id checksum makes the selected SET falsifiable, not just its size.
ORACLES["q73_group_reservoir"] = """
WITH ranked AS (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rk
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       min(event_id) AS min_id,
       CAST(sum(event_id) AS BIGINT) AS sum_id
FROM ranked WHERE rk <= 50 GROUP BY event_type ORDER BY event_type
"""

# q74: the bloom prefilter is exact by construction (false positives are
# removed by the exact semi join), so the oracle is the plain semi join;
# a bloom that DROPPED a true match would change these integer checksums.
ORACLES["q74_bloom_semi_join"] = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag ORDER BY l_returnflag
"""

# q75: exact top-15 tokens (count desc, token asc — deterministic ties)
# above the MG guarantee threshold n_total/(capacity+1); found/bound_ok
# are literal 1s the Spark-side sketch audit must reproduce.
ORACLES["q75_heavy_hitters"] = f"""
WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
cnt AS MATERIALIZED (SELECT token, CAST(count(*) AS BIGINT) AS exact_count
        FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(exact_count) AS BIGINT) AS n FROM cnt),
topk AS (SELECT token, exact_count FROM cnt
         ORDER BY exact_count DESC, token LIMIT 15)
SELECT token, exact_count, 1 AS found, 1 AS bound_ok
FROM topk, tot
WHERE exact_count > CAST(floor(n / 257) AS BIGINT)
ORDER BY exact_count DESC, token
"""

# q76: Morton interleave of the low 10 bits of (user_id, event_id) pmod
# buckets, written out as plain bit operators.
_ZTERMS = " | ".join(
    f"((((user_id % 1024) >> {i}) & 1) << {2 * i}) | "
    f"((((event_id % 1024) >> {i}) & 1) << {2 * i + 1})"
    for i in range(10)
)
ORACLES["q76_zorder_layout"] = f"""
SELECT event_id,
       CAST(user_id % 1024 AS BIGINT) AS x_bucket,
       CAST(event_id % 1024 AS BIGINT) AS y_bucket,
       CAST({_ZTERMS} AS BIGINT) AS zval
FROM events ORDER BY event_id
"""

# q77: hashed bag-of-words linear scoring — identical md5 bucket and
# Knuth-mix weight arithmetic, exact BIGINT end to end.
_W77 = (
    "((CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 4096) * 2654435761)"
    " % 2000001 - 1000000"
)
ORACLES["q77_quality_classifier"] = f"""
SELECT doc_id,
       CAST(list_sum(list_transform({_TOKS}, t -> {_W77})) AS BIGINT)
         AS score_micro,
       list_sum(list_transform({_TOKS}, t -> {_W77})) > 0 AS label
FROM documents ORDER BY doc_id
"""

# q78: GK percentile_approx rank-bound audit — exact group sizes plus
# literal 1s the Spark-side in-query rank check must reproduce.
ORACLES["q78_approx_quantiles"] = """
SELECT event_type, p, CAST(count(*) AS BIGINT) AS n, 1 AS within_bound
FROM events CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS p) ps
GROUP BY event_type, p ORDER BY event_type, p
"""

# q79: token-budget mixture — rates from exact totals via one double
# multiply+divide (bit-identical IEEE both engines), md5-threshold keep.
ORACLES["q79_token_budget_mixture"] = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ntok
  FROM documents
),
tot AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS avail FROM t GROUP BY source),
r AS (
  -- least() ignores NULLs in DuckDB too: keep absent-weight sources NULL
  SELECT source,
         CASE WHEN w IS NULL THEN NULL
              ELSE least(1.0, w * 2000.0 / avail) END AS rate
  FROM (
    SELECT source, avail,
           CASE source
               WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
               WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1 END AS w
    FROM tot
  )
),
kept AS (
  SELECT t.* FROM t JOIN r USING (source)
  WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
             AS DOUBLE) / 4503599627370496.0 < rate
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(ntok) AS BIGINT) AS tokens_kept,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       CAST(sum(doc_id) AS BIGINT) AS sum_id
FROM kept GROUP BY source ORDER BY source
"""

# q80: FFD pack-layout audit — exact per-language doc/token totals and
# the ceil(total/budget) lower bound; the packer's invariant flags are
# literal 1s (overfilled or lost assignments flip them Spark-side).
ORACLES["q80_ffd_packing"] = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(len({_TOKS})) / 256.0) AS BIGINT) AS lb,
       1 AS all_fit,
       1 AS lb_ok
FROM documents GROUP BY lang ORDER BY lang
"""

# q81: robust outlier stats — exact interpolated medians (quantile_cont
# == Spark percentile), unrounded values feed the comparison, rounding
# only at the output.
ORACLES["q81_robust_outliers"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT m.event_type, m.n,
       round(m.med, 6) AS med,
       round(d.mad, 6) AS mad,
       CAST(sum(CASE WHEN abs(e.value - m.med) > (3.5 * 1.4826) * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN med m USING (event_type) JOIN mad d ON d.event_type = m.event_type
GROUP BY m.event_type, m.n, m.med, d.mad
ORDER BY m.event_type
"""

# q82: containment pairs — all-pairs within the slice+block in SQL (the
# engine's prefix filter is lossless, so the sets must match exactly).
ORACLES["q82_containment_pairs"] = """
WITH d AS (
  SELECT doc_id AS id, lang,
         list_sort(list_distinct(string_split_regex(trim(text), ' +'))) AS toks
  FROM documents WHERE doc_id % 10 = 0
)
SELECT a.id AS id_a, b.id AS id_b,
       round(len(list_intersect(a.toks, b.toks)) / len(a.toks), 6) AS containment
FROM d a JOIN d b ON a.lang = b.lang AND a.id != b.id
WHERE len(b.toks) >= ceil(0.8 * len(a.toks))
  AND round(len(list_intersect(a.toks, b.toks)) / len(a.toks), 6) >= 0.8
ORDER BY id_a, id_b
"""

# q83: exact-integer PageRank — 3 unrolled power iterations in BIGINT
# micro-units; `//` (floor) equals Spark's `div` (truncation) because
# every quantity is non-negative. Edges are the symmetric closure of the
# distinct customer->supplier trade relation.
_PR_ITER = """
  SELECT nd.node,
         (1000000000000 * 15) // (100 * p.n) + COALESCE(c.s, 0) AS pr
  FROM nodes nd CROSS JOIN p
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((pr.pr * 85) // (100 * d.outdeg)) AS BIGINT) AS s
    FROM edges e
    JOIN {prev} pr ON pr.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
"""

ORACLES["q83_pagerank"] = f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
p AS (SELECT COUNT(*) AS n FROM nodes),
pr0 AS (SELECT node, 1000000000000 // p.n AS pr FROM nodes CROSS JOIN p),
it1 AS ({_PR_ITER.format(prev="pr0")}),
it2 AS ({_PR_ITER.format(prev="it1")}),
it3 AS ({_PR_ITER.format(prev="it2")})
SELECT node, CAST(pr AS BIGINT) AS rank_micro
FROM it3
ORDER BY rank_micro DESC, node
LIMIT 20
"""

# q84: CDC merge — last-writer-wins changelog application; row_number
# tie-break mirrors cdc.latest_changes (seq desc, op desc).
ORACLES["q84_cdc_merge"] = """
WITH ch AS (
  SELECT o_custkey AS c_custkey,
         'upd_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         round(o_totalprice, 2) AS c_acctbal,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 50 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders
),
latest AS (
  SELECT * FROM (
    SELECT ch.*,
           row_number() OVER (PARTITION BY c_custkey
                              ORDER BY seq DESC, op DESC) AS rn
    FROM ch
  ) WHERE rn = 1
)
SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS c_acctbal
FROM customer c
WHERE c.c_custkey NOT IN (SELECT c_custkey FROM latest)
UNION ALL
SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'D'
ORDER BY c_custkey
"""

# q85: Gopher rule audit — every flag recomputed with the same exact
# cross-multiplied integer comparisons as text.gopher_quality_flags.
ORACLES["q85_gopher_rules"] = """
WITH f AS (
  SELECT lang,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS symbols,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> starts_with(l, '- ')
                                   OR starts_with(l, '* ')
                                   OR starts_with(l, '•'))) AS bullet_lines,
         len(list_filter(lines, l -> ends_with(l, '...'))) AS ellipsis_lines,
         len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha_words,
         (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(toks, 'in') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(toks, 'is') THEN 1 ELSE 0 END) AS n_stop
  FROM (
    SELECT lang, text,
           string_split_regex(trim(text), ' +') AS toks,
           str_split(text, chr(10)) AS lines
    FROM documents
  )
),
flags AS (
  SELECT lang,
         (n_words BETWEEN 50 AND 100000) AS word_count_ok,
         (3 * n_words <= total_chars AND total_chars <= 10 * n_words) AS mean_word_len_ok,
         (10 * symbols <= n_words) AS symbol_ratio_ok,
         (10 * bullet_lines <= 9 * n_lines) AS bullet_ratio_ok,
         (10 * ellipsis_lines <= 3 * n_lines) AS ellipsis_ratio_ok,
         (5 * alpha_words >= 4 * n_words) AS alpha_ratio_ok,
         (n_stop >= 2) AS stopword_ok
  FROM f
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN word_count_ok AND mean_word_len_ok AND symbol_ratio_ok
                      AND bullet_ratio_ok AND ellipsis_ratio_ok AND alpha_ratio_ok
                      AND stopword_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN NOT word_count_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_count,
       CAST(SUM(CASE WHEN NOT mean_word_len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_mean_word_len,
       CAST(SUM(CASE WHEN NOT symbol_ratio_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_symbol_ratio,
       CAST(SUM(CASE WHEN NOT bullet_ratio_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_bullet_ratio,
       CAST(SUM(CASE WHEN NOT ellipsis_ratio_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_ellipsis_ratio,
       CAST(SUM(CASE WHEN NOT alpha_ratio_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha_ratio,
       CAST(SUM(CASE WHEN NOT stopword_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopword
FROM flags
GROUP BY lang
ORDER BY lang
"""

# q86: incremental aggregate maintenance — the oracle is the FULL
# recompute over all events; the engine must reproduce it from
# base-state + delta merge, so the hash check is the differential.
ORACLES["q86_incremental_agg"] = """
SELECT event_type,
       date_trunc('hour', ts) AS bucket,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
       max(CAST(round(value * 100) AS BIGINT)) AS max_cents
FROM events
GROUP BY 1, 2
ORDER BY event_type, bucket
"""

# q87: int8 scalar quantization — bounds over the FULL corpus, codes on
# the 5% slice; all arithmetic in DOUBLE (explicit casts: DuckDB would
# otherwise subtract FLOATs where Spark widens to double first).
ORACLES["q87_quantize_embeddings"] = """
WITH u AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
b AS (
  SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos
),
c AS (
  SELECT u.vec_id, u.pos,
         CASE WHEN b.mx > b.mn THEN
           LEAST(255, CAST(floor(((CAST(u.v AS DOUBLE) - CAST(b.mn AS DOUBLE))
                                   * 255.0)
                                  / (CAST(b.mx AS DOUBLE) - CAST(b.mn AS DOUBLE)))
                           AS INTEGER))
         ELSE 0 END AS code
  FROM u JOIN b ON b.pos = u.pos
  WHERE u.vec_id % 20 = 0
)
SELECT vec_id,
       CAST(count(*) AS INTEGER) AS n_dims,
       CAST(sum(code * pos) AS BIGINT) AS code_checksum,
       min(code) AS code_min,
       max(code) AS code_max
FROM c
GROUP BY vec_id
ORDER BY vec_id
"""

# q88: ordered funnel — the same min-after-previous cascade in SQL.
ORACLES["q88_funnel"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id,
       CAST(1 + (s2.t2 IS NOT NULL)::INTEGER + (s3.t3 IS NOT NULL)::INTEGER
            AS INTEGER) AS stage,
       s1.t1, s2.t2, s3.t3
FROM s1
LEFT JOIN s2 ON s2.user_id = s1.user_id
LEFT JOIN s3 ON s3.user_id = s1.user_id
ORDER BY s1.user_id
"""

# q89: weekly cohort retention — cohort by first-event week; DuckDB
# date_trunc('week') and Spark both truncate to Monday, and
# date_diff('week', ...) on week-truncated stamps counts exact weeks.
ORACLES["q89_cohort_retention"] = """
WITH first AS (
  -- CAST: DuckDB date_trunc('week') yields DATE; Spark yields TIMESTAMP
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS period
  FROM events
)
SELECT f.cohort, a.period,
       count(*) AS n_users,
       CAST(date_diff('week', f.cohort, a.period) AS INTEGER) AS periods_since
FROM active a JOIN first f ON f.user_id = a.user_id
GROUP BY f.cohort, a.period
ORDER BY f.cohort, a.period
"""

# q90: interval overlap join — the oracle is the ALL-PAIRS overlap
# condition (the engine's grid bucketing is lossless, so the sets must
# match exactly); epoch micros arithmetic is exact BIGINT both sides.
ORACLES["q90_interval_overlap"] = """
WITH ev AS (
  SELECT event_id,
         epoch_us(ts) AS start_us,
         CAST(round(value * 100) AS BIGINT) * 600000 AS dur_us
  FROM events
),
l AS (
  SELECT event_id AS id_l, start_us AS l_start, start_us + dur_us AS l_end
  FROM ev WHERE event_id % 50 = 0
),
r AS (
  SELECT event_id AS id_r, start_us AS r_start,
         start_us + 1800000000 AS r_end
  FROM ev WHERE event_id % 70 = 0
)
SELECT l.id_l, l.l_start, l.l_end, r.id_r, r.r_start, r.r_end
FROM l JOIN r ON l.l_start <= r.r_end AND r.r_start <= l.l_end
ORDER BY l.id_l, r.id_r
"""

# q91: triangle counting — the oracle closes wedges with an ordered
# triple join over the undirected co-occurrence edge list (x < y < z
# enumerates every triangle exactly once).
ORACLES["q91_triangle_count"] = """
WITH e AS (
  SELECT DISTINCT a.l_suppkey AS x, b.l_suppkey AS y
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  WHERE a.l_orderkey % 10 = 0
),
tri AS (
  SELECT e1.x AS u, e1.y AS v, e2.y AS w
  FROM e e1
  JOIN e e2 ON e2.x = e1.y
  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
),
members AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
),
tot AS (SELECT count(*) AS t FROM tri)
SELECT node,
       CAST(count(*) AS BIGINT) AS n_triangles,
       CAST(tot.t AS BIGINT) AS total_triangles
FROM members CROSS JOIN tot
GROUP BY node, tot.t
ORDER BY node
"""

# q92: table profile — one UNION ALL branch per column; VARCHAR casts of
# doubles use the same shortest-round-trip formatting as Java/Spark.
_PROFILE_COL = """
SELECT '{name}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {minexpr} AS min_value, {maxexpr} AS max_value
FROM events
"""

ORACLES["q92_profile_events"] = " UNION ALL ".join(
    _PROFILE_COL.format(
        name=n,
        minexpr=f"strftime(min({n}), '%Y-%m-%d %H:%M:%S')" if n == "ts"
        else f"CAST(min({n}) AS VARCHAR)",
        maxexpr=f"strftime(max({n}), '%Y-%m-%d %H:%M:%S')" if n == "ts"
        else f"CAST(max({n}) AS VARCHAR)",
    )
    for n in ("event_id", "ts", "user_id", "event_type", "value")
) + ' ORDER BY "column"'

# q93: frequent pairs — all-pairs support count in SQL (the engine's
# apriori prune is lossless at min_support, so the sets must match).
ORACLES["q93_frequent_pairs"] = """
WITH items AS (
  SELECT DISTINCT
    CAST(user_id AS VARCHAR) || '@' || strftime(date_trunc('day', ts), '%Y-%m-%d')
      AS basket,
    event_type AS item
  FROM events
)
SELECT a.item AS item_a, b.item AS item_b, count(*) AS support
FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
GROUP BY a.item, b.item
HAVING count(*) >= 5
ORDER BY item_a, item_b
"""

# q94: equi-depth histogram — DuckDB's ntile over the same total order.
ORACLES["q94_equi_depth_histogram"] = """
WITH b AS (
  SELECT value,
         ntile(16) OVER (ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT bucket, count(*) AS n, min(value) AS low, max(value) AS high
FROM b GROUP BY bucket ORDER BY bucket
"""

# q95: exact moments — identical integer algebra; DuckDB sums promote to
# HUGEINT, so every combination casts back to BIGINT.
ORACLES["q95_exact_correlation"] = """
WITH b AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice / 100) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY l_returnflag
)
SELECT l_returnflag, n, sx, sy,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_x_num,
       CAST(n * syy - sy * sy AS BIGINT) AS var_y_num
FROM m
ORDER BY l_returnflag
"""

# q97: declarative data-quality suite — exact BIGINT violation counts per
# check from one aggregation CTE (mirrors the single-scan Spark shape) +
# an anti-join count for the referential check. The in_set and in_range
# checks are DESIGNED to fail on the synthetic data ('error' event type;
# value max ~490 vs the [0,100] bound) so the suite demonstrably reports
# red, not only green. Multi-column uniqueness: no (user_id, ts) nulls
# exist in the synthetic events, so DuckDB's row-struct distinct equals
# Spark's any-null-skipping count_distinct.
ORACLES["q97_quality_checks"] = """
WITH m AS (
  SELECT
    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_event,
    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_props,
    CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS uq_event,
    CAST(count(*) - count(DISTINCT (user_id, ts)) AS BIGINT) AS uq_user_ts,
    CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
      ('view','click','purchase','signup','refund') THEN 1 ELSE 0 END) AS BIGINT)
      AS set_type,
    CAST(sum(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 100.0)
      THEN 1 ELSE 0 END) AS BIGINT) AS rng_value,
    CAST(sum(CASE WHEN event_type IS NOT NULL AND NOT
      regexp_matches(event_type, '^[a-z_]+$') THEN 1 ELSE 0 END) AS BIGINT)
      AS re_type
  FROM events
),
refk AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM lineitem
  WHERE l_orderkey IS NOT NULL
    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
)
SELECT check_name, metric, CAST(metric <= 0 AS INTEGER) AS passed FROM (
  SELECT 'not_null(event_id)' AS check_name, nn_event AS metric FROM m
  UNION ALL SELECT 'not_null(props)', nn_props FROM m
  UNION ALL SELECT 'unique(event_id)', uq_event FROM m
  UNION ALL SELECT 'unique(user_id,ts)', uq_user_ts FROM m
  UNION ALL SELECT 'in_set(event_type)', set_type FROM m
  UNION ALL SELECT 'in_range(value)', rng_value FROM m
  UNION ALL SELECT 'matches(event_type)', re_type FROM m
  UNION ALL SELECT 'ref(l_orderkey->orders)', orphans FROM refk
)
ORDER BY check_name
"""

# q98: round-1 BPE pair statistics — weighted adjacent character pairs
# over the word-frequency vocabulary, pair identity chr(31)-joined (the
# same unit separator the Spark side uses); top 50 by (n desc, pair).
# The 8 'merge' audit rows are literal 1s (independent python-reference
# differential on the Spark side).
ORACLES["q98_bpe_tokenizer"] = """
WITH wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(trim(text), ' +')) AS word FROM documents
  ) WHERE len(word) > 0 GROUP BY word
),
pairs AS (
  SELECT unnest(list_transform(
           range(1, len(word)),
           i -> substr(word, CAST(i AS INTEGER), 1) || chr(31) ||
                substr(word, CAST(i AS INTEGER) + 1, 1)
         )) AS pair,
         freq
  FROM wc WHERE len(word) > 1
),
stats AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM pairs GROUP BY pair
  ORDER BY n DESC, pair LIMIT 50
)
SELECT kind, key, v FROM (
  SELECT 'pairstats' AS kind, pair AS key, n AS v FROM stats
  UNION ALL
  SELECT 'merge', CAST(i AS VARCHAR), CAST(1 AS BIGINT)
  FROM range(1, 9) t(i)
)
ORDER BY kind, key, v
"""

# q99: deterministic random walks — the same md5(seed|walk|step|neighbor)
# arg-min choice, unrolled 3 levels; DuckDB || implicitly casts the
# BIGINT walk/neighbor ids into the hash string exactly like Spark's
# concat_ws.
ORACLES["q99_random_walks"] = """
WITH p AS (
  SELECT DISTINCT a.l_suppkey AS x, b.l_suppkey AS y
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  WHERE a.l_orderkey % 10 = 0
),
e AS (SELECT x AS s, y AS d FROM p UNION SELECT y, x FROM p),
w0 AS (SELECT DISTINCT s AS walk, s AS cur FROM e),
s1 AS (SELECT walk, arg_min(d, md5('0|' || walk || '|1|' || d)) AS cur
       FROM w0 JOIN e ON e.s = w0.cur GROUP BY walk),
s2 AS (SELECT walk, arg_min(d, md5('0|' || walk || '|2|' || d)) AS cur
       FROM s1 JOIN e ON e.s = s1.cur GROUP BY walk),
s3 AS (SELECT walk, arg_min(d, md5('0|' || walk || '|3|' || d)) AS cur
       FROM s2 JOIN e ON e.s = s2.cur GROUP BY walk)
SELECT walk, CAST(step AS INTEGER) AS step, node FROM (
  SELECT walk, 0 AS step, cur AS node FROM w0
  UNION ALL SELECT walk, 1, cur FROM s1
  UNION ALL SELECT walk, 2, cur FROM s2
  UNION ALL SELECT walk, 3, cur FROM s3
)
ORDER BY walk, step
"""

# q100: first/last-touch attribution — the same strictly-before RANGE
# window; the last touch's type resolves via a max(type) lookup at the
# exact last-touch instant (deterministic on same-instant ties, matching
# the Spark side's groupBy max).
ORACLES["q100_attribution"] = """
WITH e AS (
  SELECT user_id, ts, event_type, epoch_us(ts) AS us FROM events
),
w AS (
  SELECT user_id, ts, event_type,
    min(CASE WHEN event_type IN ('view','click') THEN ts END) OVER win
      AS first_touch_ts,
    max(CASE WHEN event_type IN ('view','click') THEN ts END) OVER win
      AS last_touch_ts,
    count(CASE WHEN event_type IN ('view','click') THEN us END) OVER win
      AS n_touches,
    max(CASE WHEN event_type IN ('view','click') THEN us END) OVER win
      AS last_us
  FROM e
  WINDOW win AS (
    PARTITION BY user_id ORDER BY us
    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  )
)
SELECT user_id, ts AS conv_ts, first_touch_ts, last_touch_ts,
       CAST(n_touches AS BIGINT) AS n_touches,
       (SELECT max(t.event_type) FROM e t
        WHERE t.user_id = w.user_id AND t.us = w.last_us
          AND t.event_type IN ('view','click')) AS last_touch_type
FROM w WHERE event_type = 'purchase'
ORDER BY user_id, conv_ts
"""

# q101: PQ recall invariant — literal 1s over the seeded query-id list
# (the q48 pattern; the Spark side computes actual recall@5 of the
# ADC+re-rank pipeline vs in-query brute force).
ORACLES["q101_pq_ann"] = """
SELECT vec_id AS query_id, 1 AS recall_ok
FROM embeddings
WHERE vec_id % 100 = 0
ORDER BY query_id
"""

# q102: k-core audit — literal 1s over the SQL-enumerable node list of
# the supplier pair graph (the Spark side differentially compares its
# distributed peel against an independent python reference per node).
ORACLES["q102_k_core"] = """
SELECT node, 1 AS is_match FROM (
  SELECT DISTINCT a.l_suppkey AS node
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  WHERE a.l_orderkey % 10 = 0
)
ORDER BY node
"""

# q103: exact-integer HITS — two mutual-reinforcement rounds unrolled,
# max-normalized with truncating integer division (DuckDB // on BIGINT)
# in the same micro-units as the Spark loop.
ORACLES["q103_hits"] = """
WITH e AS (
  SELECT DISTINCT o_custkey AS s, 1000000 + l_suppkey AS d
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_orderkey % 4 = 0
),
n AS (SELECT s AS node FROM e UNION SELECT d FROM e),
ra1 AS (SELECT d, CAST(count(*) AS BIGINT) * 1000000 AS raw FROM e GROUP BY d),
ma1 AS (SELECT max(raw) AS m FROM ra1),
a1 AS (
  SELECT n.node, CAST(coalesce(ra1.raw, 0) * 1000000 // ma1.m AS BIGINT) AS auth
  FROM n LEFT JOIN ra1 ON ra1.d = n.node CROSS JOIN ma1
),
rh1 AS (
  SELECT e.s, CAST(sum(a1.auth) AS BIGINT) AS raw
  FROM e JOIN a1 ON a1.node = e.d GROUP BY e.s
),
mh1 AS (SELECT max(raw) AS m FROM rh1),
h1 AS (
  SELECT n.node, CAST(coalesce(rh1.raw, 0) * 1000000 // mh1.m AS BIGINT) AS hub
  FROM n LEFT JOIN rh1 ON rh1.s = n.node CROSS JOIN mh1
),
ra2 AS (
  SELECT e.d, CAST(sum(h1.hub) AS BIGINT) AS raw
  FROM e JOIN h1 ON h1.node = e.s GROUP BY e.d
),
ma2 AS (SELECT max(raw) AS m FROM ra2),
a2 AS (
  SELECT n.node, CAST(coalesce(ra2.raw, 0) * 1000000 // ma2.m AS BIGINT) AS auth
  FROM n LEFT JOIN ra2 ON ra2.d = n.node CROSS JOIN ma2
),
rh2 AS (
  SELECT e.s, CAST(sum(a2.auth) AS BIGINT) AS raw
  FROM e JOIN a2 ON a2.node = e.d GROUP BY e.s
),
mh2 AS (SELECT max(raw) AS m FROM rh2),
h2 AS (
  SELECT n.node, CAST(coalesce(rh2.raw, 0) * 1000000 // mh2.m AS BIGINT) AS hub
  FROM n LEFT JOIN rh2 ON rh2.s = n.node CROSS JOIN mh2
)
SELECT h2.node, h2.hub AS hub_micro, a2.auth AS auth_micro
FROM h2 JOIN a2 ON a2.node = h2.node
ORDER BY h2.node
"""

# q104: SCD2 validity timeline over the q84 changelog — the same lead()
# window (seq is a genuine total order here: o_orderkey), deletes close
# the preceding version and vanish.
ORACLES["q104_scd2_history"] = """
WITH ch AS (
  SELECT o_custkey AS c_custkey,
         'upd_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         round(o_totalprice, 2) AS c_acctbal,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 50 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders
),
v AS (
  SELECT *, lead(seq) OVER (PARTITION BY c_custkey ORDER BY seq) AS next_seq
  FROM ch
)
SELECT c_custkey, c_name, c_acctbal,
       seq AS valid_from_seq, next_seq AS valid_to_seq,
       next_seq IS NULL AS is_current
FROM v WHERE op <> 'D'
ORDER BY c_custkey, valid_from_seq
"""

# q105: brute-force levenshtein over the same customer-name slice the
# PassJoin-blocked Spark operator runs on — per-node neighbor profile
# over both pair directions, sensitive to any missing/spurious pair.
ORACLES["q105_fuzzy_join"] = """
WITH c AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 5 = 0
),
p AS (
  SELECT a.c_custkey AS x, b.c_custkey AS y
  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1
),
u AS (SELECT x AS node, y AS nbr FROM p UNION ALL SELECT y AS node, x AS nbr FROM p)
SELECT node AS c_custkey,
       count(*) AS n_matches,
       min(nbr) AS min_match,
       max(nbr) AS max_match
FROM u GROUP BY node ORDER BY c_custkey
"""

# q106: recursive (node, dist) expansion over the symmetrized q103 edge
# set; UNION dedupes exact tuples so the walk is bounded by
# |V| x depth, min(dist) recovers the BFS level.
ORACLES["q106_bfs_distances"] = """
WITH RECURSIVE e AS (
  SELECT DISTINCT o_custkey AS s, 1000000 + l_suppkey AS d
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_orderkey % 4 = 0
),
sym AS (SELECT s, d FROM e UNION SELECT d AS s, s AS d FROM e),
seeds AS (SELECT DISTINCT s AS node FROM e WHERE s % 200 = 0),
walk(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT sym.d, walk.dist + 1
  FROM walk JOIN sym ON sym.s = walk.node
  WHERE walk.dist < 3
)
SELECT node, CAST(min(dist) AS INTEGER) AS dist
FROM walk GROUP BY node ORDER BY node
"""

# q107: snapshot diff as a full-outer join + CASE classifier with
# IS DISTINCT FROM payload comparison (NULL vs value is a change).
ORACLES["q107_snapshot_diff"] = """
WITH old AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT * FROM (
  SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN (old.o_custkey IS DISTINCT FROM new.o_custkey)
                OR (old.o_orderstatus IS DISTINCT FROM new.o_orderstatus)
                OR (old.o_totalprice IS DISTINCT FROM new.o_totalprice)
              THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
WHERE change_type <> 'unchanged'
ORDER BY o_orderkey
"""

# q108: lead() transitions + truncating integer division in micro-units
# (// on positive BIGINTs matches Spark's div exactly).
ORACLES["q108_transition_matrix"] = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS prob_micro
FROM counts
ORDER BY from_type, to_type
"""

# q109: identical rolling-window SQL — BIGINT sums over ROWS BETWEEN 20
# PRECEDING AND 1 PRECEDING, exact integer inequality.
ORACLES["q109_rolling_anomalies"] = """
WITH ev AS (
  SELECT event_id, event_type, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT event_id, event_type, cents,
         count(cents) OVER win AS n,
         sum(cents)   OVER win AS s,
         sum(cents * cents) OVER win AS q
  FROM ev
  WINDOW win AS (
    PARTITION BY event_type ORDER BY ts, event_id
    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id, event_type, cents
FROM w
WHERE n >= 8 AND (cents * n - s) * (cents * n - s) > 9 * (n * q - s * s)
ORDER BY event_id
"""

# q110: the Count-Min sketch is rebuilt IDENTICALLY in SQL (portable md5
# cell hash), so estimates — including collision overestimates — are
# deterministic and hash-checked exactly, not audited probabilistically.
ORACLES["q110_cms_frequency"] = f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS tok FROM documents
),
rows_ AS (SELECT unnest(range(4)) AS row),
sk AS (
  SELECT row,
         CAST('0x' || substr(md5(CAST(row AS VARCHAR) || '|' || tok), 1, 15)
              AS BIGINT) % 2048 AS cell,
         count(*) AS n
  FROM toks, rows_
  GROUP BY 1, 2
),
q AS (
  SELECT DISTINCT unnest({_TOKS}) AS token
  FROM documents WHERE doc_id % 97 = 0
),
qc AS (
  SELECT token, row,
         CAST('0x' || substr(md5(CAST(row AS VARCHAR) || '|' || token), 1, 15)
              AS BIGINT) % 2048 AS cell
  FROM q, rows_
),
est AS (
  SELECT token, min(coalesce(sk.n, 0)) AS est_n
  FROM qc LEFT JOIN sk USING (row, cell)
  GROUP BY token
),
tr AS (SELECT tok AS token, count(*) AS true_n FROM toks GROUP BY tok)
SELECT token, true_n, est_n
FROM est JOIN tr USING (token)
ORDER BY token
"""

# q111: identical regex chain — tags -> space, entity unescape,
# whitespace collapse; tag counts + cleaned length/tail hash-checked.
ORACLES["q111_markup_strip"] = """
WITH marked AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR)
           || '</h1><p class="main">' || text
           || '</p><br/>&amp; footer &lt;links&gt;</body></html>'
         ELSE text END AS marked
  FROM documents
),
clean AS (
  SELECT doc_id, marked,
         trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(marked, '<[^>]*>', ' ', 'g'),
             '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '),
           ' +', ' ', 'g')) AS clean
  FROM marked
)
SELECT doc_id,
       CAST(len(regexp_extract_all(marked, '<[^>]*>')) AS INTEGER) AS n_tags,
       CAST(length(clean) AS INTEGER) AS clean_len,
       right(clean, 40) AS clean_tail
FROM clean
ORDER BY doc_id
"""

# q112: two label-propagation rounds unrolled — most frequent neighbor
# label, ties to the minimum (row_number over (n DESC, lbl ASC)).
ORACLES["q112_label_propagation"] = """
WITH p AS (
  SELECT DISTINCT a.l_suppkey AS s, b.l_suppkey AS d
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  WHERE a.l_orderkey % 10 = 0
),
e AS (SELECT s, d FROM p UNION SELECT d AS s, s AS d FROM p),
l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e),
c1 AS (
  SELECT e.s, l0.lbl, count(*) AS n
  FROM e JOIN l0 ON l0.v = e.d GROUP BY e.s, l0.lbl
),
l1 AS (
  SELECT s AS v, lbl FROM (
    SELECT s, lbl,
           row_number() OVER (PARTITION BY s ORDER BY n DESC, lbl ASC) AS rn
    FROM c1
  ) WHERE rn = 1
),
c2 AS (
  SELECT e.s, l1.lbl, count(*) AS n
  FROM e JOIN l1 ON l1.v = e.d GROUP BY e.s, l1.lbl
),
l2 AS (
  SELECT s AS v, lbl FROM (
    SELECT s, lbl,
           row_number() OVER (PARTITION BY s ORDER BY n DESC, lbl ASC) AS rn
    FROM c2
  ) WHERE rn = 1
)
SELECT v AS node, lbl AS label FROM l2 ORDER BY node
"""

# q113: the bitmap path is exact, so the oracle is plain
# COUNT(DISTINCT) per type (twice — the merged-halves rows must equal
# the full recompute) plus a distinct-pair join for the intersection
# matrix (inner-join semantics: only pairs with >= 1 common user).
ORACLES["q113_bitmap_distinct"] = """
WITH ev AS (
  SELECT event_type, user_id FROM events WHERE event_id % 37 = 0
),
du AS (SELECT DISTINCT event_type, user_id FROM ev)
SELECT 'type' AS kind, event_type AS key, COUNT(DISTINCT user_id) AS n
FROM ev GROUP BY event_type
UNION ALL
SELECT 'merged' AS kind, event_type AS key, COUNT(DISTINCT user_id) AS n
FROM ev GROUP BY event_type
UNION ALL
SELECT 'pair' AS kind, a.event_type || '@' || b.event_type AS key,
       COUNT(*) AS n
FROM du a JOIN du b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY kind, key
"""

# q114: 2-D skyline closed form — per distinct day keep the max price,
# then a strict-prefix RANGE window (equal-day peers excluded) keeps a
# day iff its price beats every strictly earlier day's best.
ORACLES["q114_skyline"] = """
WITH pts AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01',
              CAST(o_orderdate AS DATE)) AS BIGINT) AS order_day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
),
d AS (
  SELECT order_day, max(price_cents) AS price_cents
  FROM pts GROUP BY order_day
),
w AS (
  SELECT order_day, price_cents,
         max(price_cents) OVER (
           ORDER BY order_day
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS pm
  FROM d
)
SELECT order_day, price_cents FROM w
WHERE pm IS NULL OR price_cents > pm
ORDER BY order_day
"""

# q115: CUSUM via the prefix-sum closed form — s = P - min(0, running
# min of P) on BIGINT cents, the identical two stacked windows.
ORACLES["q115_cusum"] = """
WITH e AS (
  SELECT event_type, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
p AS (
  SELECT event_type, event_id, ts,
         sum(cents - 6000) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_hi,
         sum(4000 - cents) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_lo
  FROM e
),
s AS (
  SELECT event_type, event_id,
         p_hi - least(min(p_hi) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s_hi,
         p_lo - least(min(p_lo) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s_lo
  FROM p
),
a AS (SELECT * FROM s WHERE s_hi > 50000 OR s_lo > 50000)
SELECT 'summary' AS kind, event_type AS key,
       CAST(count(*) AS BIGINT) AS a, CAST(max(s_hi) AS BIGINT) AS b
FROM a GROUP BY event_type
UNION ALL
SELECT 'row' AS kind,
       event_type || '@' || CAST(event_id AS VARCHAR) AS key,
       CAST(s_hi AS BIGINT) AS a, CAST(s_lo AS BIGINT) AS b
FROM a WHERE event_id % 11 = 0
ORDER BY kind, key
"""

# q116: five-sum closed-form OLS; positive-operand // so the truncating
# division matches Spark's div exactly (sign applied separately).
ORACLES["q116_group_trend"] = """
WITH pts AS (
  SELECT o_custkey,
         CAST(date_diff('day', DATE '1995-01-01',
              CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
s AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY o_custkey
)
SELECT o_custkey, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE CAST((CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
                 * (abs(n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx))
                 AS BIGINT)
       END AS slope_milli
FROM s
WHERE n >= 5 AND o_custkey % 7 = 0
ORDER BY o_custkey
"""

# q117: apriori-pruned co-occurrence + squared-cosine micro-units
# (positive-operand // = Spark div); ties rank by neighbor id.
ORACLES["q117_item_similarity"] = """
WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
cnt AS MATERIALIZED (SELECT i, CAST(count(*) AS BIGINT) AS c FROM it GROUP BY i),
keep AS (SELECT i FROM cnt WHERE c >= 2),
pr AS (
  SELECT a.i AS ia, b2.i AS ib, CAST(count(*) AS BIGINT) AS s
  FROM it a JOIN it b2 ON a.b = b2.b AND a.i < b2.i
  WHERE a.i IN (SELECT i FROM keep) AND b2.i IN (SELECT i FROM keep)
  GROUP BY a.i, b2.i HAVING count(*) >= 2
),
sym AS (
  SELECT ia AS item, ib AS neighbor, s FROM pr
  UNION ALL
  SELECT ib AS item, ia AS neighbor, s FROM pr
),
sc AS (
  SELECT sym.item, sym.neighbor, sym.s AS support,
         CAST(sym.s * sym.s * 1000000 // (ci.c * cj.c) AS BIGINT)
           AS sim2_micro
  FROM sym
  JOIN cnt ci ON ci.i = sym.item
  JOIN cnt cj ON cj.i = sym.neighbor
),
r AS (
  SELECT item, neighbor, support, sim2_micro,
         row_number() OVER (
           PARTITION BY item ORDER BY sim2_micro DESC, neighbor ASC
         ) AS rn
  FROM sc
)
SELECT item, neighbor, support, sim2_micro, CAST(rn AS INT) AS rnk
FROM r WHERE rn <= 5
ORDER BY item, rnk
"""

# q118: integer priority sampling — identical md5-60-bit uniform and
# positive-operand // division, so the selected set matches exactly.
ORACLES["q118_weighted_sample"] = """
WITH d AS (
  SELECT lang, doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
           // greatest(CAST(n_chars AS BIGINT), 1) AS priority
  FROM documents
),
r AS (
  SELECT lang, doc_id, priority,
         row_number() OVER (
           PARTITION BY lang ORDER BY priority, doc_id
         ) AS rn
  FROM d
)
SELECT lang, doc_id, priority FROM r WHERE rn <= 15
ORDER BY lang, doc_id
"""

# q119: per-key counts once; all ratios truncating micro-units on
# positive operands (// == Spark div).
ORACLES["q119_skew_report"] = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id
),
t AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n) AS BIGINT) AS max_n
  FROM c
),
top AS (
  SELECT user_id, n,
         row_number() OVER (ORDER BY n DESC, user_id ASC) AS rnk
  FROM c QUALIFY rnk <= 10
)
SELECT 'key' AS kind,
       CAST(rnk AS VARCHAR) || '@' || CAST(user_id AS VARCHAR) AS key,
       n AS a,
       CAST(n * 1000000 // (SELECT n_rows FROM t) AS BIGINT) AS b,
       CAST(NULL AS BIGINT) AS c
FROM top
UNION ALL
SELECT 'stats1' AS kind, 'all' AS key, n_rows AS a, n_keys AS b,
       max_n AS c
FROM t
UNION ALL
SELECT 'stats2' AS kind, 'all' AS key,
       CAST(max_n * n_keys * 1000000 // n_rows AS BIGINT) AS a,
       CAST((SELECT sum(n) FROM top) * 1000000 // n_rows AS BIGINT) AS b,
       CAST(NULL AS BIGINT) AS c
FROM t
ORDER BY kind, key
"""

# q120: join size forecast from the two count frames; the raw tables
# are never joined on either side.
ORACLES["q120_join_explosion"] = """
WITH ca AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_a
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
cb AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_b
  FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
  GROUP BY user_id
),
pk AS (
  SELECT ca.user_id, n_a, n_b, n_a * n_b AS out_rows
  FROM ca JOIN cb ON ca.user_id = cb.user_id
),
tb AS (
  SELECT CAST(count(*) AS BIGINT) AS rows_b
  FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
),
ta AS (
  SELECT CAST(count(*) AS BIGINT) AS rows_a
  FROM events WHERE user_id IS NOT NULL
),
top AS (
  SELECT user_id, n_a, n_b, out_rows,
         row_number() OVER (ORDER BY out_rows DESC, user_id ASC) AS rnk
  FROM pk QUALIFY rnk <= 10
)
SELECT 'key' AS kind,
       CAST(rnk AS VARCHAR) || '@' || CAST(user_id AS VARCHAR) AS key,
       n_a AS a, n_b AS b, CAST(out_rows AS BIGINT) AS c,
       CAST(out_rows * 1000000 // (n_a + n_b) AS BIGINT) AS d
FROM top
UNION ALL
SELECT 'stats' AS kind, 'all' AS key,
       CAST(count(*) AS BIGINT) AS a,
       CAST(sum(out_rows) AS BIGINT) AS b,
       (SELECT rows_b FROM tb) AS c,
       CAST(sum(out_rows) * 1000000
            // ((SELECT rows_a FROM ta) + (SELECT rows_b FROM tb))
            AS BIGINT) AS d
FROM pk
ORDER BY kind, key
"""

# q121: (rn-1)*1e6 // (n-1) over the identical total order; the
# single-row-group guard mirrors the operator's 0 literal.
ORACLES["q121_quantile_rank"] = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, event_id, cents,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cents, event_id
         ) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
)
SELECT event_type, event_id, cents,
       CASE WHEN n > 1
            THEN CAST((rn - 1) * 1000000 // (n - 1) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS pct_micro
FROM r WHERE event_id % 23 = 0
ORDER BY event_type, event_id
"""

# q122: most frequent lang per source, ties to the minimum lang.
ORACLES["q122_group_mode"] = """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents WHERE lang IS NOT NULL
  GROUP BY source, lang
),
r AS (
  SELECT source, lang, n,
         row_number() OVER (
           PARTITION BY source ORDER BY n DESC, lang ASC
         ) AS rn
  FROM c
)
SELECT source, lang AS lang_mode, n AS mode_n
FROM r WHERE rn = 1
ORDER BY source
"""

# q123: phrase occurrences via a 1-based list scan (DuckDB range is
# half-open; i+k-1 stays in bounds by construction).
ORACLES["q123_phrase_search"] = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
),
m2 AS (
  SELECT doc_id,
         len(list_filter(range(1, len(t)),
             i -> t[i] = 'fast' AND t[i+1] = 'table')) AS n
  FROM toks
),
m3 AS (
  SELECT doc_id,
         len(list_filter(range(1, len(t) - 1),
             i -> t[i] = 'value' AND t[i+1] = 'table'
                  AND t[i+2] = 'part')) AS n
  FROM toks
)
SELECT 'p2' AS kind, doc_id, CAST(n AS BIGINT) AS n_matches
FROM m2 WHERE n >= 1
UNION ALL
SELECT 'p3' AS kind, doc_id, CAST(n AS BIGINT) AS n_matches
FROM m3 WHERE n >= 1
ORDER BY kind, doc_id
"""

# q124: identical injection + line pipeline; string_agg skips NULLs and
# orders by pos, mirroring the engine's collect_list/array_sort
# reassembly; all-boilerplate docs coalesce to ''.
ORACLES["q124_line_dedup"] = """
WITH marked AS (
  SELECT doc_id,
         '(c) example corp - all rights reserved' || chr(10) ||
         'doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
         text || chr(10) ||
         CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter'
              ELSE 'ref #' || CAST(doc_id AS VARCHAR) END || chr(10) ||
         'home | about | contact' AS m
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(m, chr(10))) AS line,
         unnest(range(1, len(string_split(m, chr(10))) + 1)) AS pos
  FROM marked
),
boiler AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line
  ) WHERE df > 5
),
flagged AS (
  SELECT l.doc_id, l.pos, l.line, b.line IS NOT NULL AS is_b
  FROM lines l LEFT JOIN boiler b ON l.line = b.line
),
agg AS (
  SELECT doc_id,
         count(*) AS n_lines,
         sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS n_removed,
         coalesce(
           string_agg(CASE WHEN NOT is_b THEN line END, chr(10) ORDER BY pos),
           '') AS clean
  FROM flagged GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_removed AS BIGINT) AS n_removed,
       CAST(length(clean) AS BIGINT) AS clean_len,
       right(clean, 30) AS clean_tail
FROM agg ORDER BY doc_id
"""


def _kmeans_sql(k: int, n_iter: int, scale: int) -> str:
    """The UNROLLED Lloyd iterations as DuckDB CTEs (the q103/HITS
    discipline): lowest-id seeding, exact integer squared-L2 argmin with
    ties to the lowest cid, truncating-toward-zero centroid division
    (sign separated — DuckDB // floors), empty clusters keeping their
    previous centroid via the LEFT JOIN + coalesce."""

    def assign(src: str, cents: str, out: str) -> str:
        return f"""{out} AS (
  SELECT vec_id, v, cid, d FROM (
    SELECT q.vec_id, q.v, c.cid,
           CAST(list_sum(list_transform(range(1, len(q.v) + 1),
                i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT) AS d
    FROM {src} q CROSS JOIN {cents} c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
)"""

    def update(assigned: str, prev: str, out: str) -> str:
        return f"""{out}_u AS (
  SELECT cid, pos, CAST(sum(val) AS BIGINT) AS s, count(*) AS n
  FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS pos
        FROM {assigned})
  GROUP BY cid, pos
),
{out}_l AS (
  SELECT cid,
         list(CAST(CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END
              AS BIGINT) ORDER BY pos) AS v
  FROM {out}_u GROUP BY cid
),
{out} AS (
  SELECT p.cid, coalesce(l.v, p.v) AS v
  FROM {prev} p LEFT JOIN {out}_l l USING (cid)
)"""

    ctes = [
        f"""q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v
  FROM q QUALIFY row_number() OVER (ORDER BY vec_id) <= {k}
)""",
    ]
    cur = "c0"
    for it in range(1, n_iter + 1):
        ctes.append(assign("q", cur, f"a{it}"))
        ctes.append(update(f"a{it}", cur, f"c{it}"))
        cur = f"c{it}"
    ctes.append(assign("q", cur, "afinal"))
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT vec_id, cid AS cluster, d AS dist2 FROM afinal ORDER BY vec_id"
    )


ORACLES["q125_kmeans"] = _kmeans_sql(k=4, n_iter=2, scale=1000)

# q126: the INDEPENDENT trailing-distinct formulation — a day-range
# self-join with COUNT(DISTINCT) — so the hash match proves the bitmap
# algebra (fan-out + bit_or + popcount), not mere reproducibility.
ORACLES["q126_trailing_distinct"] = """
WITH e AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day,
         user_id
  FROM events WHERE user_id IS NOT NULL
),
d AS (SELECT DISTINCT day FROM e)
SELECT d.day,
       CAST(count(DISTINCT CASE WHEN e.day = d.day THEN e.user_id END)
            AS BIGINT) AS n_same_day,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_trailing
FROM d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
ORDER BY d.day
"""


def _bm25_sql(terms: list[str], k: int) -> str:
    """Parameterized q68 BM25 SQL (same constants k1=1.2 b=0.75, same
    fixed-order float summation) returning (id, score, rank)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    term_sum = "\n             + ".join(
        f"coalesce(sum(CASE WHEN term = '{t}' THEN s END), 0.0)" for t in terms
    )
    return f"""
WITH t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
n AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM t),
tf AS (
  SELECT id, tok AS term, count(*) AS tf
  FROM (SELECT id, unnest(toks) AS tok FROM t)
  WHERE tok IN ({in_list})
  GROUP BY 1, 2
),
dl AS (SELECT id, len(toks) AS dl FROM t),
dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per AS (
  SELECT tf.id, tf.term,
         ln(1.0 + (n.n - dfr.df + 0.5) / (dfr.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avgdl)) AS s
  FROM tf JOIN dfr ON tf.term = dfr.term JOIN dl ON tf.id = dl.id CROSS JOIN n
),
sc AS (
  SELECT id, round({term_sum}, 6) AS score
  FROM per GROUP BY id
)
SELECT id, score, CAST(rn AS INTEGER) AS rank FROM (
  SELECT id, score, row_number() OVER (ORDER BY score DESC, id ASC) AS rn
  FROM sc
) WHERE rn <= {k}
"""


ORACLES["q127_hybrid_search"] = f"""
WITH ra AS ({_bm25_sql(["spark", "query", "stream"], 30)}),
rb AS ({_bm25_sql(["join", "fast", "merge"], 30)}),
u AS (
  SELECT id, rank FROM ra UNION ALL SELECT id, rank FROM rb
),
f AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_lists,
         CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_micro
  FROM u GROUP BY id
)
SELECT id, n_lists, rrf_micro,
       CAST(row_number() OVER (ORDER BY rrf_micro DESC, id ASC) AS INTEGER)
         AS fused_rank
FROM f ORDER BY fused_rank
"""

# q128: dimension-index cross products against the quantized vectors —
# the same floor() bridge as q87, exact BIGINT sums throughout.
ORACLES["q128_embedding_covariance"] = """
WITH q AS (
  SELECT list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings WHERE len(embedding) >= 16
),
ii AS (SELECT unnest(range(1, 17)) AS i),
jj AS (SELECT unnest(range(1, 17)) AS j),
ex AS (
  SELECT ii.i, jj.j, q.v[CAST(ii.i AS INTEGER)] AS xi,
         q.v[CAST(jj.j AS INTEGER)] AS xj
  FROM q, ii, jj WHERE jj.j >= ii.i
)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       count(*) AS n,
       CAST(sum(xi) AS BIGINT) AS s_i,
       CAST(sum(xj) AS BIGINT) AS s_j,
       CAST(sum(xi * xj) AS BIGINT) AS s_ij,
       CAST(count(*) * sum(xi * xj) - sum(xi) * sum(xj) AS BIGINT) AS cov_num
FROM ex GROUP BY i, j
ORDER BY i, j
"""

# q129: bigrams via zipped list slices (parallel unnests align in
# DuckDB); the lift arithmetic mirrors the operator's
# divide-then-multiply order exactly (// on positive operands == div).
ORACLES["q129_collocations"] = f"""
WITH toks AS (SELECT {_TOKS} AS t FROM documents),
uni AS (
  SELECT w, count(*) AS n FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM uni),
bi AS (
  SELECT w1, w2, count(*) AS n_ab FROM (
    SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
    FROM toks WHERE len(t) >= 2
  ) GROUP BY w1, w2 HAVING count(*) >= 5
),
scored AS (
  SELECT bi.w1, bi.w2, bi.n_ab, a.n AS n_a, b.n AS n_b,
         CAST((bi.n_ab * 1000000 // a.n) * t.n_total // b.n AS BIGINT)
           AS lift_micro
  FROM bi JOIN uni a ON bi.w1 = a.w
          JOIN uni b ON bi.w2 = b.w
          CROSS JOIN tot t
)
SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       lift_micro, CAST(rn AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY lift_micro DESC, w1, w2) AS rn
  FROM scored
) WHERE rn <= 40
ORDER BY rnk
"""

# q130: the q121 percentile ladder + conditional bound aggregation +
# pure-expression clip; bounds from ALL rows, output id-sliced.
ORACLES["q130_winsorize"] = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, event_id, cents,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cents, event_id
         ) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
),
p AS (
  SELECT event_type, event_id, cents,
         CASE WHEN n > 1
              THEN CAST((rn - 1) * 1000000 // (n - 1) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS pct_micro
  FROM r
),
b AS (
  SELECT event_type,
         min(CASE WHEN pct_micro >= 100000 THEN cents END) AS lo_bound,
         max(CASE WHEN pct_micro <= 900000 THEN cents END) AS hi_bound
  FROM p GROUP BY event_type
)
SELECT p.event_type, p.event_id, p.cents, p.pct_micro,
       b.lo_bound, b.hi_bound,
       least(greatest(p.cents, b.lo_bound), b.hi_bound) AS clipped
FROM p JOIN b ON p.event_type = b.event_type
WHERE p.event_id % 29 = 0
ORDER BY p.event_type, p.event_id
"""

# q131: the q38 sessionization + per-session ordered path strings
# capped at 4 via list slicing (slices past the end are legal both
# sides).
ORACLES["q131_session_paths"] = """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM g
),
r AS (
  SELECT user_id, ts, event_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM s
),
per AS (
  SELECT user_id, sid,
         array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:4], '>') AS path
  FROM r GROUP BY user_id, sid
)
SELECT path, count(*) AS n_sessions
FROM per GROUP BY path HAVING count(*) >= 5
ORDER BY n_sessions DESC, path
"""

# q132: doubled average ranks via 2*rank() + t - 1 (== min+max of the
# tie group's consecutive global row numbers — the engine computes the
# same identity from min/max); the rho expression is term-for-term
# identical so the IEEE doubles agree.
ORACLES["q132_spearman"] = """
WITH e AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice / 100) AS BIGINT) AS y
  FROM lineitem WHERE l_orderkey % 8 = 0
),
r AS (
  SELECT x, y,
         2 * rank() OVER (ORDER BY x) + count(*) OVER (PARTITION BY x) - 1
           AS ar2x,
         2 * rank() OVER (ORDER BY y) + count(*) OVER (PARTITION BY y) - 1
           AS ar2y
  FROM e
),
tstats AS (
  SELECT
    (SELECT CAST(sum(t*t*t - t) AS BIGINT)
     FROM (SELECT count(*) AS t FROM e GROUP BY x)) AS tx,
    (SELECT CAST(sum(t*t*t - t) AS BIGINT)
     FROM (SELECT count(*) AS t FROM e GROUP BY y)) AS ty
),
m AS (
  SELECT count(*) AS n,
         CAST(sum((ar2x - ar2y) * (ar2x - ar2y)) AS BIGINT) AS d2
  FROM r
)
SELECT m.n, m.d2, t.tx, t.ty,
       round(
         ((CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
             - CAST(m.n AS DOUBLE) - CAST(t.tx AS DOUBLE)) / 12.0
          + (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
             - CAST(m.n AS DOUBLE) - CAST(t.ty AS DOUBLE)) / 12.0
          - CAST(m.d2 AS DOUBLE) / 4.0)
         / (2.0 * sqrt(
             ((CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                 - CAST(m.n AS DOUBLE) - CAST(t.tx AS DOUBLE)) / 12.0)
             * ((CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                 - CAST(m.n AS DOUBLE) - CAST(t.ty AS DOUBLE)) / 12.0))),
         6) AS rho
FROM m CROSS JOIN tstats t
"""

# q133: same quantized sums via unnest + generate_subscripts.
ORACLES["q133_label_scatter"] = """
WITH q AS (
  SELECT label,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
per AS (
  SELECT label, count(*) AS n,
         CAST(sum(list_sum(list_transform(v, x -> x * x))) AS BIGINT)
           AS norm2_sum
  FROM q GROUP BY label
),
dims AS (
  SELECT label, pos, CAST(sum(val) AS BIGINT) AS s
  FROM (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos
        FROM q)
  GROUP BY label, pos
),
sd AS (
  SELECT label, CAST(sum(s * s) AS BIGINT) AS sum_sd2 FROM dims GROUP BY label
)
SELECT per.label, per.n, per.norm2_sum,
       per.n * per.norm2_sum - sd.sum_sd2 AS trace_num
FROM per JOIN sd ON per.label = sd.label
ORDER BY per.label
"""

# q134: the recursive-CTE replay (the q106 pattern) — longest path from
# the in-degree-0 sources; UNION ALL keeps path multiplicity, which the
# divisor DAG bounds binomially.
ORACLES["q134_topo_layers"] = """
WITH RECURSIVE nodes AS (
  SELECT DISTINCT p_partkey % 4096 AS n FROM part
  WHERE p_partkey % 4096 >= 1
),
edges AS (
  SELECT n AS a, n * 2 AS b FROM nodes
  WHERE n * 2 <= 4095 AND n * 2 IN (SELECT n FROM nodes)
  UNION ALL
  SELECT n AS a, n * 3 AS b FROM nodes
  WHERE n * 3 <= 4095 AND n * 3 IN (SELECT n FROM nodes)
),
paths(v, len) AS (
  SELECT n, 0 FROM nodes WHERE n NOT IN (SELECT b FROM edges)
  UNION ALL
  SELECT e.b, p.len + 1 FROM paths p JOIN edges e ON e.a = p.v
)
SELECT v AS node, CAST(max(len) AS INTEGER) AS layer
FROM paths GROUP BY v ORDER BY node
"""

# q135: link prediction — the wedge enumeration at the center, identical
# truncating micro-unit arithmetic (// == Spark div on positives), the
# same degree-200 hub cutoff, full-graph degrees in the Jaccard/RA terms.
ORACLES["q135_link_prediction"] = """
WITH li AS (
  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_orderkey % 10 = 0
),
e0 AS (
  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
),
und AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a),
ctr AS (
  SELECT u.a AS w, u.b AS n, 1000000 // d.deg AS rw
  FROM und u JOIN deg d ON u.a = d.a
  WHERE d.deg <= 200
),
cand AS (
  SELECT l.n AS u, r.n AS v,
         CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(sum(l.rw) AS BIGINT) AS ra_micro
  FROM ctr l JOIN ctr r ON l.w = r.w AND l.n < r.n
  GROUP BY l.n, r.n
  HAVING count(*) >= 2
),
nonedge AS (
  SELECT c.* FROM cand c
  LEFT JOIN e0 ON c.u = e0.a AND c.v = e0.b
  WHERE e0.a IS NULL
)
SELECT ne.u, ne.v, ne.common_neighbors, ne.ra_micro,
       CAST((ne.common_neighbors * 1000000)
            // (du.deg + dv.deg - ne.common_neighbors) AS BIGINT)
         AS jaccard_micro
FROM nonedge ne
JOIN deg du ON ne.u = du.a
JOIN deg dv ON ne.v = dv.a
ORDER BY ne.ra_micro DESC, ne.common_neighbors DESC, ne.u, ne.v
LIMIT 200
"""

# q136: KMV sketch — full replay of the deterministic md5-48-bit
# pipeline: distinct hashes, rank <= k, the exact-int64 estimator
# identity floor((k-1)M/h_k) = (k-1)(M div h_k) + ((k-1)(M mod h_k))
# div h_k, and the merged-halves == full invariant.
_KMV_H = "CAST('0x' || substr(md5(CAST(item AS VARCHAR)), 1, 12) AS BIGINT)"
_KMV_EST = """
  CASE WHEN kmv_n < 256 THEN kmv_n
       ELSE 255 * (281474976710656 // kth)
            + (255 * (281474976710656 % kth)) // kth
  END"""
ORACLES["q136_kmv_distinct"] = f"""
WITH ev AS (
  SELECT event_type, user_id * 131 + event_id % 97 AS item, event_id
  FROM events
),
hf AS (SELECT DISTINCT event_type, {_KMV_H} AS h FROM ev
       WHERE {_KMV_H} IS NOT NULL),
skf AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
  FROM hf
),
estf AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS kmv_n,
         max(CASE WHEN rnk = 256 THEN h END) AS kth
  FROM skf WHERE rnk <= 256 GROUP BY event_type
),
full_est AS (
  SELECT event_type, kmv_n, CAST({_KMV_EST} AS BIGINT) AS kmv_est FROM estf
),
h1 AS (SELECT DISTINCT event_type, {_KMV_H} AS h FROM ev
       WHERE event_id % 2 = 0 AND {_KMV_H} IS NOT NULL),
sk1 AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
    FROM h1) WHERE rnk <= 256
),
h2 AS (SELECT DISTINCT event_type, {_KMV_H} AS h FROM ev
       WHERE event_id % 2 = 1 AND {_KMV_H} IS NOT NULL),
sk2 AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
    FROM h2) WHERE rnk <= 256
),
mu AS (SELECT event_type, h FROM sk1 UNION SELECT event_type, h FROM sk2),
skm AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
  FROM mu
),
estm AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS kmv_n,
         max(CASE WHEN rnk = 256 THEN h END) AS kth
  FROM skm WHERE rnk <= 256 GROUP BY event_type
),
merged_est AS (
  SELECT event_type, kmv_n, CAST({_KMV_EST} AS BIGINT) AS kmv_est FROM estm
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT item) AS BIGINT) AS exact_distinct
  FROM ev GROUP BY event_type
)
SELECT f.event_type, x.exact_distinct, f.kmv_n, f.kmv_est,
       CAST(abs(f.kmv_est - x.exact_distinct) * 4 <= x.exact_distinct
            AS BIGINT) AS bound_ok,
       CAST(f.kmv_est = m.kmv_est AND f.kmv_n = m.kmv_n AS BIGINT)
         AS merge_match
FROM full_est f
JOIN merged_est m ON f.event_type = m.event_type
JOIN exact x ON f.event_type = x.event_type
ORDER BY f.event_type
"""

# q137: winnowing — the INDEPENDENT brute-force replay: every window of
# 4 consecutive 3-gram hashes picks its rightmost minimum via
# row_number (h ASC, pos DESC); short docs get the single clipped
# window. A hash match against Spark's exists-rule formulation proves
# the two selection rules equivalent.
ORACLES["q137_winnow_fingerprints"] = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), ' +'),
                     t -> t <> '') AS t
  FROM documents WHERE doc_id % 7 = 0
),
g AS (
  SELECT doc_id, CAST(x - 1 AS INTEGER) AS pos,
         CAST('0x' || substr(md5(array_to_string(t[x:x+2], ' ')), 1, 15)
              AS BIGINT) AS h
  FROM d, unnest(range(1, greatest(len(t) - 3 + 2, 1))) AS u(x)
),
n AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
win AS (
  SELECT doc_id, s
  FROM n, unnest(range(0, greatest(n - 4 + 1, 1))) AS u(s)
),
sel AS (
  SELECT DISTINCT doc_id, pos, h FROM (
    SELECT w.doc_id, g.pos, g.h,
           row_number() OVER (PARTITION BY w.doc_id, w.s
                              ORDER BY g.h ASC, g.pos DESC) AS rn
    FROM win w
    JOIN g ON g.doc_id = w.doc_id AND g.pos BETWEEN s AND s + 3
  ) WHERE rn = 1
)
SELECT doc_id, pos, h FROM sel ORDER BY doc_id, pos
"""


# q138: exact ACF — identical integer num/den pieces (mean cleared by
# n^2), the ratio as the one shared double division; lags unrolled via
# a VALUES lateral.
ORACLES["q138_event_acf"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s
  FROM daily GROUP BY event_type
),
c AS (
  SELECT d.event_type, st.n * d.x - st.s AS c0,
         st.n * lead(d.x, 1) OVER w - st.s AS c1,
         st.n * lead(d.x, 2) OVER w - st.s AS c2,
         st.n * lead(d.x, 3) OVER w - st.s AS c3,
         st.n * lead(d.x, 4) OVER w - st.s AS c4,
         st.n * lead(d.x, 5) OVER w - st.s AS c5,
         st.n * lead(d.x, 6) OVER w - st.s AS c6,
         st.n * lead(d.x, 7) OVER w - st.s AS c7
  FROM daily d JOIN st USING (event_type)
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
),
agg AS (
  SELECT event_type,
         CAST(sum(c0 * c0) AS BIGINT) AS acf_den,
         CAST(sum(c0 * c1) AS BIGINT) AS n1,
         CAST(sum(c0 * c2) AS BIGINT) AS n2,
         CAST(sum(c0 * c3) AS BIGINT) AS n3,
         CAST(sum(c0 * c4) AS BIGINT) AS n4,
         CAST(sum(c0 * c5) AS BIGINT) AS n5,
         CAST(sum(c0 * c6) AS BIGINT) AS n6,
         CAST(sum(c0 * c7) AS BIGINT) AS n7
  FROM c GROUP BY event_type
)
SELECT event_type, v.lag, v.acf_num, acf_den,
       CASE WHEN acf_den <> 0
            THEN CAST(v.acf_num AS DOUBLE) / CAST(acf_den AS DOUBLE)
       END AS acf
FROM agg, LATERAL (VALUES (CAST(1 AS INTEGER), n1), (CAST(2 AS INTEGER), n2), (CAST(3 AS INTEGER), n3), (CAST(4 AS INTEGER), n4), (CAST(5 AS INTEGER), n5), (CAST(6 AS INTEGER), n6), (CAST(7 AS INTEGER), n7)) AS v(lag, acf_num)
ORDER BY event_type, v.lag
"""

# q139: chi-square association — identical integer dev and the shared
# double contrib expression (dev^2 / (r*c*n), left-assoc), zero cells
# materialized from the margin cross spine.
ORACLES["q139_association"] = """
WITH cells AS (
  SELECT event_type AS a, user_id % 5 AS b, CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS row_total FROM cells GROUP BY a),
cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS col_total FROM cells GROUP BY b),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
grid AS (
  SELECT ra.a, cb.b, ra.row_total, cb.col_total,
         COALESCE(cells.o, 0) AS observed
  FROM ra CROSS JOIN cb
  LEFT JOIN cells ON ra.a = cells.a AND cb.b = cells.b
)
SELECT g.a AS event_type, g.b AS cohort, g.observed,
       g.row_total, g.col_total,
       t.n * g.observed - g.row_total * g.col_total AS dev,
       CAST(t.n * g.observed - g.row_total * g.col_total AS DOUBLE)
         * CAST(t.n * g.observed - g.row_total * g.col_total AS DOUBLE)
         / (CAST(g.row_total AS DOUBLE) * CAST(g.col_total AS DOUBLE)
            * CAST(t.n AS DOUBLE)) AS contrib
FROM grid g CROSS JOIN tot t
ORDER BY event_type, cohort
"""

# q140: exact AUC — identical doubled-average-rank construction
# (min+max row_number per score tie group) and truncating micro-unit
# division.
ORACLES["q140_auc"] = """
WITH base AS (
  SELECT user_id % 4 AS cohort,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(event_type = 'purchase' AS BIGINT) AS l
  FROM events
),
rn AS (
  SELECT cohort, cents, l,
         row_number() OVER (PARTITION BY cohort ORDER BY cents) AS r
  FROM base
),
dbl AS (
  SELECT cohort, cents, l,
         min(r) OVER (PARTITION BY cohort, cents)
         + max(r) OVER (PARTITION BY cohort, cents) AS d
  FROM rn
),
agg AS (
  SELECT cohort,
         CAST(sum(l) AS BIGINT) AS n1,
         CAST(sum(1 - l) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN l = 1 THEN d END) AS BIGINT) AS r1
  FROM dbl GROUP BY cohort
)
SELECT cohort, n1, n0,
       COALESCE(r1, 0) - n1 * (n1 + 1) AS u_dbl,
       CASE WHEN n1 > 0 AND n0 > 0
            THEN ((COALESCE(r1, 0) - n1 * (n1 + 1)) * 500000) // (n1 * n0)
       END AS auc_micro
FROM agg ORDER BY cohort
"""

# q141: OHLC bars + TWAP — identical total-order (ts, event_id) window,
# last-row flag via n - row_number + 1 (no second sort), duration to the
# next tick or the bar end, and the sign-separated truncating TWAP
# division (both // operands non-negative, so floor == truncate in both
# engines).
ORACLES["q141_ohlc_bars"] = """
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id,
         CAST(round(value * 100) AS BIGINT) - 2500 AS c
  FROM events
),
ann AS (
  SELECT event_type, bucket, c,
         row_number() OVER w AS ra,
         count(*) OVER (PARTITION BY event_type, bucket)
           - row_number() OVER w + 1 AS rd,
         date_diff('microsecond', ts,
             coalesce(lead(ts) OVER w, bucket + INTERVAL 1 HOUR)) AS dur
  FROM base
  WINDOW w AS (PARTITION BY event_type, bucket ORDER BY ts, event_id)
),
agg AS (
  SELECT event_type, bucket,
         max(CASE WHEN ra = 1 THEN c END) AS open_cents,
         max(c) AS high_cents,
         min(c) AS low_cents,
         max(CASE WHEN rd = 1 THEN c END) AS close_cents,
         CAST(count(*) AS BIGINT) AS n_ticks,
         CAST(sum(c * dur) AS BIGINT) AS twap_num,
         CAST(sum(dur) AS BIGINT) AS twap_den
  FROM ann GROUP BY event_type, bucket
)
SELECT event_type, bucket, open_cents, high_cents, low_cents, close_cents,
       n_ticks, twap_num, twap_den,
       CASE WHEN twap_num >= 0 THEN twap_num // twap_den
            ELSE -((-twap_num) // twap_den) END AS twap_cents
FROM agg
ORDER BY event_type, bucket
"""

# q142: unigram-LM tokenizer training — FULL SQL replay of the
# hard-EM/Viterbi pipeline: seed substring counts, the rank-capped
# vocabulary, quantized ln(c/N)*1e6 scores, the Viterbi DP as a
# lockstep recursive CTE carrying a sliding window of the last 4 best
# values (so each step only needs the previous iteration's row), ties
# to the longest piece via the descending-length CASE, and the
# backtrack as a second recursive CTE walking pred = j - lstar.
# shared CTE chain for the unigram family: q142 (train) selects the
# m-step piece counts; q144 (encode) joins the per-word segment lengths
# back to the exploded document words
_UNIGRAM_CTES = """
WITH RECURSIVE
wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(trim(text), ' +')) AS word
    FROM documents
  ) WHERE len(word) > 0 GROUP BY word
),
starts AS (SELECT word, freq, unnest(range(1, len(word)+1)) AS s FROM wc),
subpieces AS (
  SELECT substr(word, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece,
         freq
  FROM (SELECT word, freq, s,
               unnest(range(1, least(4, len(word) - s + 1) + 1)) AS l
        FROM starts)
),
cnt AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS c
        FROM subpieces GROUP BY piece),
kept AS (SELECT piece, c FROM cnt WHERE len(piece) = 1 OR c >= 2),
multi AS (
  SELECT piece, c FROM (
    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS r
    FROM kept WHERE len(piece) > 1) WHERE r <= 8192
),
vocab0 AS MATERIALIZED (
  SELECT piece, c FROM kept WHERE len(piece) = 1
  UNION ALL SELECT piece, c FROM multi
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab0),
vocab AS MATERIALIZED (
  SELECT piece, c,
         CAST(round(ln(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS score_micro
  FROM vocab0 CROSS JOIN tot t
),
dp(word, freq, n, j, b0, b1, b2, b3, lstar) AS (
  SELECT word, freq, CAST(len(word) AS INTEGER), 0, CAST(0 AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS INTEGER)
  FROM wc
  UNION ALL
  SELECT word, freq, n, j + 1, best, b0, b1, b2, lst FROM (
    SELECT d.word, d.freq, d.n, d.j, d.b0, d.b1, d.b2,
           greatest(d.b0 + v1.score_micro,
                    d.b1 + v2.score_micro,
                    d.b2 + v3.score_micro,
                    d.b3 + v4.score_micro) AS best,
           CASE WHEN d.b3 + v4.score_micro = best THEN 4
                WHEN d.b2 + v3.score_micro = best THEN 3
                WHEN d.b1 + v2.score_micro = best THEN 2
                ELSE 1 END AS lst
    FROM dp d
    LEFT JOIN vocab v1 ON v1.piece = substr(d.word, d.j + 1, 1)
    LEFT JOIN vocab v2 ON d.j >= 1 AND v2.piece = substr(d.word, d.j, 2)
    LEFT JOIN vocab v3 ON d.j >= 2 AND v3.piece = substr(d.word, d.j - 1, 3)
    LEFT JOIN vocab v4 ON d.j >= 3 AND v4.piece = substr(d.word, d.j - 2, 4)
    WHERE d.j < d.n
  )
),
bt(word, freq, j, l) AS (
  SELECT word, freq, j, lstar FROM dp WHERE j = n
  UNION ALL
  SELECT b.word, b.freq, d.j, d.lstar
  FROM bt b JOIN dp d ON d.word = b.word AND d.j = b.j - b.l
  WHERE b.j - b.l > 0
),
em AS MATERIALIZED (
  SELECT substr(word, j - l + 1, l) AS piece,
         CAST(sum(freq) AS BIGINT) AS em_count
  FROM bt GROUP BY piece
)
"""

# q142 runs TWO EM iterations with the second unrolled in SQL (the
# q125 k-means discipline): iteration 2's vocabulary is iteration 1's
# used pieces with singles floored at count 1, rescored, and the whole
# Viterbi DP + backtrack chain replayed against the new scores.
ORACLES["q142_unigram_lm"] = _UNIGRAM_CTES + """
, vocab2_0 AS MATERIALIZED (
  SELECT v.piece, COALESCE(e.em_count, 1) AS c
  FROM vocab v LEFT JOIN em e ON e.piece = v.piece
  WHERE len(v.piece) = 1 OR e.em_count IS NOT NULL
),
tot2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab2_0),
vocab2 AS MATERIALIZED (
  SELECT piece, c,
         CAST(round(ln(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS score_micro
  FROM vocab2_0 CROSS JOIN tot2 t
),
dp2(word, freq, n, j, b0, b1, b2, b3, lstar) AS (
  SELECT word, freq, CAST(len(word) AS INTEGER), 0, CAST(0 AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS INTEGER)
  FROM wc
  UNION ALL
  SELECT word, freq, n, j + 1, best, b0, b1, b2, lst FROM (
    SELECT d.word, d.freq, d.n, d.j, d.b0, d.b1, d.b2,
           greatest(d.b0 + v1.score_micro,
                    d.b1 + v2.score_micro,
                    d.b2 + v3.score_micro,
                    d.b3 + v4.score_micro) AS best,
           CASE WHEN d.b3 + v4.score_micro = best THEN 4
                WHEN d.b2 + v3.score_micro = best THEN 3
                WHEN d.b1 + v2.score_micro = best THEN 2
                ELSE 1 END AS lst
    FROM dp2 d
    LEFT JOIN vocab2 v1 ON v1.piece = substr(d.word, d.j + 1, 1)
    LEFT JOIN vocab2 v2 ON d.j >= 1 AND v2.piece = substr(d.word, d.j, 2)
    LEFT JOIN vocab2 v3 ON d.j >= 2 AND v3.piece = substr(d.word, d.j - 1, 3)
    LEFT JOIN vocab2 v4 ON d.j >= 3 AND v4.piece = substr(d.word, d.j - 2, 4)
    WHERE d.j < d.n
  )
),
bt2(word, freq, j, l) AS (
  SELECT word, freq, j, lstar FROM dp2 WHERE j = n
  UNION ALL
  SELECT b.word, b.freq, d.j, d.lstar
  FROM bt2 b JOIN dp2 d ON d.word = b.word AND d.j = b.j - b.l
  WHERE b.j - b.l > 0
),
em2 AS MATERIALIZED (
  SELECT substr(word, j - l + 1, l) AS piece,
         CAST(sum(freq) AS BIGINT) AS em_count
  FROM bt2 GROUP BY piece
)
SELECT v.piece, s.c AS seed_count, v.score_micro, e.em_count
FROM vocab2 v
JOIN em2 e ON e.piece = v.piece
JOIN vocab0 s ON s.piece = v.piece
ORDER BY v.piece
"""

# q144: tokenizer APPLICATION — per-word segment lengths from the same
# replayed Viterbi (|bt| rows per word), joined back to the exploded
# document words; one doc-keyed aggregation. avg is the truncating
# pieces-per-word in micro-units (both operands non-negative).
ORACLES["q144_unigram_encode"] = _UNIGRAM_CTES + """
, seg_len AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_pieces FROM bt GROUP BY word
),
docw AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS word
  FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(s.n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(len(d.word)) AS BIGINT) AS n_chars,
       (CAST(sum(s.n_pieces) AS BIGINT) * 1000000)
         // CAST(count(*) AS BIGINT) AS avg_pieces_micro
FROM docw d JOIN seg_len s ON s.word = d.word
WHERE len(d.word) > 0
GROUP BY doc_id
ORDER BY doc_id
"""

# q143: URL dedup — identical messy-URL synthesis, then the full
# canonicalization contract replayed step by step (note the 'g' flag on
# the slash-collapse: DuckDB regexp_replace is first-match-only by
# default while Spark's replaces all). Rank order inside a domain is
# (md5(url), url) in both engines.
ORACLES["q143_url_dedup"] = r"""
WITH raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END)
    || '://' || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END)
    || 'Site' || CAST(doc_id % 7 AS VARCHAR)
    || (CASE WHEN doc_id % 11 = 0 THEN '.co.uk' ELSE '.com' END)
    || (CASE WHEN doc_id % 3 = 0 THEN
          (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
        ELSE '' END)
    || '/' || source
    || (CASE WHEN doc_id % 4 = 0 THEN '//' ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
        ELSE '?a=1&b=2' END)
    || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
  FROM documents
),
c1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS u FROM raw),
parts AS (
  SELECT doc_id,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM c1
),
hp AS (SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS hostport FROM parts),
hh AS (
  SELECT *,
    regexp_replace(lower(regexp_extract(hp2, '^(\[[^\]]*\]|[^:]*)', 1)),
                   '^www\.', '') AS host,
    regexp_extract(hp2, '^(?:\[[^\]]*\]|[^:]*):([0-9]+)$', 1) AS port,
    substr(rest, len(hostport) + 1) AS pathq
  FROM (SELECT *, regexp_replace(hostport, '^[^@/]*@', '') AS hp2 FROM hp)
),
pq AS (
  SELECT *,
    CASE WHEN port = '' THEN ''
         WHEN scheme = 'http' AND port = '80' THEN ''
         WHEN scheme = 'https' AND port = '443' THEN ''
         ELSE ':' || port END AS keep_port,
    regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                   '/{2,}', '/', 'g') AS path0,
    regexp_extract(pathq, '\?(.*)$', 1) AS query
  FROM hh
),
cn AS (
  SELECT doc_id,
    CASE WHEN scheme <> '' AND host <> '' THEN
      scheme || '://' || host || keep_port
      || (CASE WHEN path0 = '' THEN '/'
               WHEN path0 <> '/' THEN regexp_replace(path0, '/$', '')
               ELSE path0 END)
      || (CASE WHEN kp <> '' THEN '?' || kp ELSE '' END)
    END AS canonical_url
  FROM (
    SELECT *,
      array_to_string(list_sort(list_filter(string_split(query, '&'),
        p -> NOT regexp_matches(p, '^(utm_|fbclid|gclid)')
             AND p <> '')), '&') AS kp
    FROM pq
  )
),
agg AS (
  SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_dups,
         min(doc_id) AS keep_id
  FROM cn WHERE canonical_url IS NOT NULL GROUP BY canonical_url
),
dom AS (
  SELECT *,
    CASE WHEN regexp_matches(h, '^(\[|[0-9.]+$)') THEN h
         WHEN len(labels) <= 2 THEN h
         WHEN labels[-2] || '.' || labels[-1] IN
              ('co.uk','org.uk','gov.uk','ac.uk','com.au','net.au',
               'org.au','co.jp','co.kr','com.br','com.cn')
              AND len(labels) >= 3
         THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
         ELSE labels[-2] || '.' || labels[-1] END AS domain
  FROM (
    SELECT *, string_split(h, '.') AS labels FROM (
      SELECT *, regexp_extract(canonical_url,
                '^[a-z0-9+.-]+://(\[[^\]]*\]|[^/:?]*)', 1) AS h
      FROM agg
    )
  )
)
SELECT canonical_url, n_dups, keep_id, domain,
       row_number() OVER (PARTITION BY domain
                          ORDER BY md5(canonical_url), canonical_url)
         AS drank,
       CAST((row_number() OVER (PARTITION BY domain
                          ORDER BY md5(canonical_url), canonical_url)
             <= 3) AS INTEGER) AS kept
FROM dom
ORDER BY canonical_url
"""

# q145: WOE bins — DuckDB's ntile over the identical total order (the
# q94 parity), exact counts, BIGINT dev, and the one shared double
# ln((pos*NEG)/(neg*POS)) quantized to micro-units.
ORACLES["q145_feature_woe"] = """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id,
         CAST(event_type = 'purchase' AS BIGINT) AS l
  FROM events
),
b AS (
  SELECT ntile(10) OVER (ORDER BY cents, event_id) AS bin, l FROM e
),
agg AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(l) AS BIGINT) AS n_pos,
         CAST(sum(1 - l) AS BIGINT) AS n_neg
  FROM b GROUP BY bin
),
tot AS (
  SELECT CAST(sum(n_pos) AS BIGINT) AS pos,
         CAST(sum(n_neg) AS BIGINT) AS neg
  FROM agg
)
SELECT bin, n, n_pos, n_neg,
       n_pos * t.neg - n_neg * t.pos AS dev,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         CAST(round(ln(CAST(n_pos * t.neg AS DOUBLE)
                       / CAST(n_neg * t.pos AS DOUBLE)) * 1000000, 0)
              AS BIGINT)
       END AS woe_micro
FROM agg CROSS JOIN tot t
ORDER BY bin
"""

# q146: DSIR importance resampling — identical md5-prefix bucket hash
# (the portable 60-bit idiom), unigram+bigram occurrences (q129's
# zipped-slice bigram construction), add-1 smoothed bucket multinomials
# over a full 1024-bucket spine, quantized log-ratio micro-nats, and
# the deterministic top-100 selection. feats is MATERIALIZED (it feeds
# four consumers; DuckDB inlines non-recursive CTEs at every reference
# — the round-9 q142 lesson).
ORACLES["q146_dsir_selection"] = """
WITH base AS (
  SELECT doc_id, CAST(lang = 'en' AS INT) AS t,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, t, unnest(list_filter(toks, x -> x <> '')) AS g FROM base
  UNION ALL
  SELECT doc_id, t,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM base WHERE len(toks) >= 2
),
feats AS MATERIALIZED (
  SELECT doc_id, t,
         CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS bucket
  FROM grams
),
tc AS (SELECT bucket, count(*) AS ct FROM feats WHERE t = 1 GROUP BY bucket),
rc AS (SELECT bucket, count(*) AS cr FROM feats GROUP BY bucket),
tot AS (
  SELECT CAST(sum(t) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS nr
  FROM feats
),
model AS MATERIALIZED (
  SELECT s.bucket,
    CAST(round(ln(CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE)
                  / CAST(tot.nt + 1024 AS DOUBLE)) * 1000000, 0) AS BIGINT)
    - CAST(round(ln(CAST(coalesce(rc.cr, 0) + 1 AS DOUBLE)
                    / CAST(tot.nr + 1024 AS DOUBLE)) * 1000000, 0) AS BIGINT)
      AS diff
  FROM (SELECT unnest(range(0, 1024)) AS bucket) s
  LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket) CROSS JOIN tot
),
w AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(diff) AS BIGINT) AS weight_micro
  FROM feats JOIN model USING (bucket) GROUP BY doc_id
),
sel AS (SELECT doc_id FROM w ORDER BY weight_micro DESC, doc_id LIMIT 100)
SELECT w.doc_id, n_feats, weight_micro,
       CAST(w.doc_id IN (SELECT doc_id FROM sel) AS INT) AS selected
FROM w
ORDER BY doc_id
"""

# q147: token-balanced shard assignment — the identical (md5(id), id)
# permutation, exclusive window prefix sum, and the contiguous cut
# shard = (start * 16) // total. DuckDB's window sum over BIGINTs is
# exact (integers, not the float segment-tree caveat).
ORACLES["q147_token_shards"] = """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS w
  FROM documents
),
t AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM d),
o AS (
  SELECT doc_id, w,
    CAST(row_number() OVER (
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn,
    CAST(coalesce(sum(w) OVER (
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start
  FROM d
),
s AS (
  SELECT o.*, CAST((start * 16) // t.total AS INTEGER) AS shard
  FROM o CROSS JOIN t
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS tokens,
       CAST(min(rn) AS INTEGER) AS rn_min,
       CAST(max(rn) AS INTEGER) AS rn_max,
       CAST(min(start) AS BIGINT) AS start_min
FROM s GROUP BY shard
ORDER BY shard
"""

# q148: Moore-Lewis cross-entropy difference — the lm-composite's
# bigram construction and add-0.5 smoothing replayed for BOTH models
# (target slice vs raw pool) with per-bigram independent micro-nat
# quantization; V is the shared raw vocabulary (blank-doc '' token
# included, matching Spark's split-of-empty convention). bgw is
# MATERIALIZED (five consumers — the q142 CTE-inlining lesson).
ORACLES["q148_moore_lewis"] = """
WITH base AS (
  SELECT doc_id, CAST(lang = 'en' AS INT) AS t,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents
),
bgw AS MATERIALIZED (
  SELECT doc_id, t, gram, string_split(gram, ' ')[1] AS w1 FROM (
    SELECT doc_id, t,
           unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS gram
    FROM base WHERE len(toks) >= 2
  )
),
c2r AS (SELECT gram, count(*) AS c2r FROM bgw GROUP BY gram),
ctxr AS (SELECT w1, count(*) AS c1r FROM bgw GROUP BY w1),
c2t AS (SELECT gram, count(*) AS c2t FROM bgw WHERE t = 1 GROUP BY gram),
ctxt AS (SELECT w1, count(*) AS c1t FROM bgw WHERE t = 1 GROUP BY w1),
v AS (SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(toks) AS tok FROM base)),
scored AS (
  SELECT doc_id,
    CAST(round(ln((coalesce(c2t.c2t, 0) + 0.5)
                  / (coalesce(ctxt.c1t, 0) + 0.5 * (SELECT v FROM v)))
               * 1000000, 0) AS BIGINT) AS mt,
    CAST(round(ln((c2r.c2r + 0.5)
                  / (ctxr.c1r + 0.5 * (SELECT v FROM v)))
               * 1000000, 0) AS BIGINT) AS mr
  FROM bgw JOIN c2r USING (gram) JOIN ctxr USING (w1)
  LEFT JOIN c2t USING (gram) LEFT JOIN ctxt USING (w1)
),
g AS (
  SELECT doc_id, count(*) AS n, sum(mt) AS st, sum(mr) AS sr
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id AS id, CAST(coalesce(g.n, 0) AS BIGINT) AS n_bigrams,
       CAST(g.st AS BIGINT) AS sum_logp_target,
       CAST(g.sr AS BIGINT) AS sum_logp_raw,
       CAST(g.st - g.sr AS BIGINT) AS ml_micronats
FROM documents d LEFT JOIN g USING (doc_id)
ORDER BY id
"""

# q150: incremental MinHash dedup — the q25 banding idiom replayed for
# the history store and the constructed new snapshot; membership is a
# DISTINCT-store join (Spark's semi join counts each new band at most
# once regardless of store multiplicity).
ORACLES["q150_incremental_dedup"] = f"""
WITH hist AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
newd AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 2 = 1 AND p.text IS NOT NULL THEN p.text
              ELSE d.text END AS text
  FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1
  WHERE d.doc_id % 3 = 0
),
ht AS (
  SELECT doc_id AS id, unnest(list_distinct({_TOKS})) AS tok FROM hist
),
hs AS (SELECT id, tok, unnest(range(16)) AS seed FROM ht),
hh AS (
  SELECT id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || tok)) AS mh
  FROM hs GROUP BY id, seed
),
hb AS (
  SELECT DISTINCT seed // 4 AS band_id,
         string_agg(mh, '|' ORDER BY seed) AS band_hash
  FROM hh GROUP BY id, seed // 4
),
nt AS (
  SELECT doc_id AS id, unnest(list_distinct({_TOKS})) AS tok FROM newd
),
ns AS (SELECT id, tok, unnest(range(16)) AS seed FROM nt),
nh AS (
  SELECT id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || tok)) AS mh
  FROM ns GROUP BY id, seed
),
nb AS (
  SELECT id, seed // 4 AS band_id,
         string_agg(mh, '|' ORDER BY seed) AS band_hash
  FROM nh GROUP BY id, seed // 4
),
hits AS (
  SELECT nb.id, CAST(count(*) AS BIGINT) AS n
  FROM nb JOIN (SELECT DISTINCT band_id, band_hash FROM hb) s
    USING (band_id, band_hash)
  GROUP BY nb.id
)
SELECT newd.doc_id AS id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_hit_bands,
       CAST(coalesce(h.n, 0) >= 1 AS INTEGER) AS is_dup
FROM newd LEFT JOIN hits h ON h.id = newd.doc_id
ORDER BY id
"""

# q151: PSI drift — DuckDB's ntile over the identical reference order
# yields the same equi-depth edges; both snapshots then count by the
# shared value rule bin = 1 + |edges < v|; the PSI term multiplies two
# IEEE-exact ratios by the one relied-upon transcendental and rounds
# once.
ORACLES["q151_psi_drift"] = """
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id,
         event_type = 'purchase' AS p
  FROM events
),
ref AS MATERIALIZED (
  SELECT cents, event_id FROM ev WHERE event_id % 2 = 0
),
cur AS (
  SELECT cents + CASE WHEN p THEN 700 ELSE 0 END AS cents, event_id
  FROM ev WHERE event_id % 2 = 1
),
rb AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents, event_id) AS bin FROM ref
),
edges AS MATERIALIZED (
  SELECT bin, max(cents) AS edge FROM rb WHERE bin < 10 GROUP BY bin
),
rc AS (
  SELECT 1 + (SELECT count(*) FROM edges e WHERE e.edge < r.cents) AS bin,
         count(*) AS n_ref
  FROM ref r GROUP BY 1
),
cc AS (
  SELECT 1 + (SELECT count(*) FROM edges e WHERE e.edge < c.cents) AS bin,
         count(*) AS n_cur
  FROM cur c GROUP BY 1
),
spine AS (SELECT unnest(range(1, 11)) AS bin),
bins AS (
  SELECT s.bin,
         (SELECT edge FROM edges e WHERE e.bin = s.bin) AS upper_edge,
         CAST(coalesce(rc.n_ref, 0) AS BIGINT) AS n_ref,
         CAST(coalesce(cc.n_cur, 0) AS BIGINT) AS n_cur
  FROM spine s LEFT JOIN rc ON rc.bin = s.bin LEFT JOIN cc ON cc.bin = s.bin
),
tot AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS nr, CAST(sum(n_cur) AS BIGINT) AS nc
  FROM bins
)
SELECT CAST(bin AS INTEGER) AS bin, upper_edge, n_ref, n_cur,
       CASE WHEN n_ref > 0 AND n_cur > 0 THEN
         CAST(round((CAST(n_ref AS DOUBLE) / t.nr
                     - CAST(n_cur AS DOUBLE) / t.nc)
                    * ln((CAST(n_ref AS DOUBLE) / t.nr)
                         / (CAST(n_cur AS DOUBLE) / t.nc))
                    * 1000000, 0) AS BIGINT)
       END AS psi_micro
FROM bins CROSS JOIN tot t
ORDER BY bin
"""

# q149: first-occurrence trigram novelty — identical gram construction
# (q129's zipped-slice idiom generalized to 3-grams), min-id owners,
# truncating micro ratio.
ORACLES["q149_ngram_novelty"] = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS gram
  FROM toks WHERE len(t) >= 3
),
dg AS MATERIALIZED (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS occ
  FROM grams GROUP BY doc_id, gram
),
own AS (SELECT gram, min(doc_id) AS owner FROM dg GROUP BY gram),
st AS (
  SELECT dg.doc_id,
         CAST(sum(occ) AS BIGINT) AS n_grams,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(CASE WHEN dg.doc_id = own.owner THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM dg JOIN own USING (gram) GROUP BY dg.doc_id
)
SELECT d.doc_id AS id,
       CAST(coalesce(st.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(st.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(coalesce(st.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN st.n_distinct > 0
            THEN st.n_novel * 1000000 // st.n_distinct END AS novelty_micro
FROM documents d LEFT JOIN st USING (doc_id)
ORDER BY id
"""

# q152: exact-substring duplication — CONTENT-DEFINED anchors (60-bit
# md5 prefix of the 8-char head, 0 mod 20 — the ngram_bucket parity
# family), full 40-char window md5 at anchors, >= 2 occurrences
# corpus-wide = duplicated, truncating micro ratio. DuckDB range() is
# stop-EXCLUSIVE, Spark sequence() stop-INCLUSIVE: range(1, len-40+2)
# == sequence(1, len-40+1).
ORACLES["q152_substring_dedup"] = """
WITH wins AS (
  SELECT doc_id,
         md5(substr(text, CAST(p AS INTEGER), 40)) AS h
  FROM documents,
       unnest(range(1, CAST(length(text) AS BIGINT) - 40 + 2)) AS t(p)
  WHERE length(text) >= 40
    AND CAST('0x' || substr(md5(substr(text, CAST(p AS INTEGER), 8)),
                            1, 15) AS BIGINT) % 20 = 0
),
occ AS (SELECT h, count(*) AS n FROM wins GROUP BY h),
st AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(CASE WHEN occ.n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS nd
  FROM wins JOIN occ USING (h) GROUP BY doc_id
)
SELECT d.doc_id AS id,
       CAST(coalesce(st.nw, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(st.nd, 0) AS BIGINT) AS n_dup_windows,
       CASE WHEN st.nw > 0 THEN st.nd * 1000000 // st.nw END AS dup_micro
FROM documents d LEFT JOIN st USING (doc_id)
ORDER BY id
"""

# q153: two-sample KS between the q151 snapshots — exact integer
# sup-distance numerator over ordered distinct values (window cumsums
# here; the Spark side rides ONE packed literal-boundary prefix sum).
ORACLES["q153_ks_drift"] = """
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id,
         event_type = 'purchase' AS p
  FROM events
),
u AS (
  SELECT cents AS v, 1 AS isr FROM ev WHERE event_id % 2 = 0
  UNION ALL
  SELECT cents + CASE WHEN p THEN 700 ELSE 0 END AS v, 0 AS isr
  FROM ev WHERE event_id % 2 = 1
),
g AS (
  SELECT v, sum(isr) AS dr, sum(1 - isr) AS dc FROM u GROUP BY v
),
cum AS (
  SELECT sum(dr) OVER (ORDER BY v) AS cr,
         sum(dc) OVER (ORDER BY v) AS cc
  FROM g
),
tot AS (
  SELECT CAST(sum(dr) AS BIGINT) AS nr, CAST(sum(dc) AS BIGINT) AS nc
  FROM g
)
SELECT nr AS n_ref, nc AS n_cur,
       CAST(max(abs(cr * nc - cc * nr)) AS BIGINT) AS d_num,
       CAST(max(abs(cr * nc - cc * nr)) * 1000000 // (nr * nc)
            AS BIGINT) AS ks_micro
FROM cum CROSS JOIN tot
GROUP BY nr, nc
"""

# q154: Zipf slope over the top-1000 token frequencies — milli-nat
# quantized moments (exact int64, all < 2^53 so the closing division
# computes on exactly-represented doubles in both engines).
ORACLES["q154_zipf_fit"] = """
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), ' +')) AS tok
  FROM documents
),
counts AS (
  SELECT tok, count(*) AS freq FROM toks WHERE tok <> '' GROUP BY tok
),
top AS (SELECT tok, freq FROM counts ORDER BY freq DESC, tok LIMIT 1000),
ranked AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY freq DESC, tok)
                            AS DOUBLE)) * 1000) AS BIGINT) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1000) AS BIGINT) AS y
  FROM top
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM ranked
)
SELECT n_terms, sx, sy, sxx, sxy,
       CASE WHEN n_terms >= 2 AND (n_terms * sxx - sx * sx) <> 0 THEN
         CAST(round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                    / CAST(n_terms * sxx - sx * sx AS DOUBLE)
                    * 1000000) AS BIGINT)
       END AS slope_micro
FROM m
"""


# q155: KMV source-overlap matrix — identical trigram construction to
# q149, 60-bit md5-prefix hashes, per-source bottom-64 distinct, union
# bottom-64 membership counts, truncating micro Jaccard.
ORACLES["q155_source_overlap"] = """
WITH toks AS (
  SELECT source, string_split_regex(trim(text), ' +') AS t FROM documents
),
sh AS (
  SELECT source,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
  FROM toks WHERE len(t) >= 3
),
hashed AS (
  SELECT DISTINCT source,
         CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
  FROM sh
),
sigs AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hashed QUALIFY rk <= 64
),
pairs AS (
  SELECT a.source AS ga, b.source AS gb
  FROM (SELECT DISTINCT source FROM sigs) a,
       (SELECT DISTINCT source FROM sigs) b
  WHERE a.source < b.source
),
u AS (
  SELECT ga, gb, h,
         max(CASE WHEN s.source = ga THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.source = gb THEN 1 ELSE 0 END) AS in_b
  FROM pairs JOIN sigs s ON s.source = ga OR s.source = gb
  GROUP BY ga, gb, h
),
topu AS (
  SELECT ga, gb, in_a, in_b,
         row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
  FROM u QUALIFY rk <= 64
)
SELECT ga, gb, CAST(count(*) AS BIGINT) AS k_used,
       CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
       CAST(sum(in_a * in_b) AS BIGINT) * 1000000 // count(*)
         AS jaccard_micro
FROM topu GROUP BY ga, gb
ORDER BY ga, gb
"""

# q156: calibration bins — the q77 scoring SQL squashed by the
# sign-separated truncating integer map, 10 equal-width bins with the
# exact (n, n_pos, sum_score) triple, k-row spine via range(), ECE
# numerator as a window sum over the bounded bin frame.
ORACLES["q156_calibration"] = f"""
WITH scored AS (
  SELECT CAST(list_sum(list_transform({_TOKS}, t -> {_W77})) AS BIGINT)
           AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
squashed AS (
  SELECT least(greatest(500000 + CASE WHEN s >= 0 THEN s // 24
                                      ELSE -((-s) // 24) END,
                        0), 1000000) AS p, y
  FROM scored
),
binned AS (
  SELECT least((p * 10) // 1000000, 9) AS bin, p, y FROM squashed
),
per_bin AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(p) AS BIGINT) AS ss
  FROM binned GROUP BY bin
),
spine AS (SELECT unnest(range(0, 10)) AS bin),
full_bins AS (
  SELECT CAST(spine.bin AS INTEGER) AS bin,
         coalesce(n, 0) AS n, coalesce(n_pos, 0) AS n_pos,
         coalesce(ss, 0) AS ss
  FROM spine LEFT JOIN per_bin ON spine.bin = per_bin.bin
),
ratios AS (
  SELECT bin, n, n_pos,
         CASE WHEN n > 0 THEN ss // n END AS avg_score_micro,
         CASE WHEN n > 0 THEN (n_pos * 1000000) // n END AS frac_pos_micro
  FROM full_bins
),
gaps AS (
  SELECT *, CASE WHEN n > 0
                 THEN abs(avg_score_micro - frac_pos_micro) END AS gap_micro
  FROM ratios
)
SELECT bin, n, n_pos, avg_score_micro, frac_pos_micro, gap_micro,
       CAST(sum(coalesce(n * gap_micro, 0)) OVER () AS BIGINT) AS ece_num
FROM gaps ORDER BY bin
"""

# q170: isotonic recalibration — the q156 binning replayed, then the
# quantized-minimax weighted PAV (max over j <= i of min over k >= i of
# truncating pooled rates) on the non-empty-bin frame.
ORACLES["q170_isotonic"] = f"""
WITH scored AS (
  SELECT CAST(list_sum(list_transform({_TOKS}, t -> {_W77})) AS BIGINT)
           AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
squashed AS (
  SELECT least(greatest(500000 + CASE WHEN s >= 0 THEN s // 24
                                      ELSE -((-s) // 24) END,
                        0), 1000000) AS p, y
  FROM scored
),
binned AS (
  SELECT least((p * 10) // 1000000, 9) AS bin, p, y FROM squashed
),
per_bin AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(p) AS BIGINT) AS ss
  FROM binned GROUP BY bin
),
spine AS (SELECT unnest(range(0, 10)) AS bin),
full_bins AS (
  SELECT CAST(spine.bin AS INTEGER) AS bin,
         coalesce(n, 0) AS n, coalesce(n_pos, 0) AS n_pos,
         coalesce(ss, 0) AS ss
  FROM spine LEFT JOIN per_bin ON spine.bin = per_bin.bin
),
ratios AS (
  SELECT bin, n, n_pos,
         CASE WHEN n > 0 THEN ss // n END AS avg_score_micro,
         CASE WHEN n > 0 THEN (n_pos * 1000000) // n END AS frac_pos_micro
  FROM full_bins
),
ne AS (
  SELECT bin, n, n_pos,
         CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS idx,
         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS pn,
         CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS pp
  FROM full_bins WHERE n > 0
),
lo AS (SELECT idx AS j, pn - n AS en_j, pp - n_pos AS ep_j FROM ne),
hi AS (SELECT idx AS kk, pn AS pn_k, pp AS pp_k FROM ne),
rates AS (
  SELECT j, kk,
         CAST(((pp_k - ep_j) * 1000000) // (pn_k - en_j) AS BIGINT)
           AS rate
  FROM lo JOIN hi ON j <= kk
),
inner_min AS (
  SELECT ii.idx AS i_idx, ii.bin, r.j,
         CAST(min(r.rate) AS BIGINT) AS mn
  FROM ne ii JOIN rates r ON r.j <= ii.idx AND r.kk >= ii.idx
  GROUP BY ii.idx, ii.bin, r.j
),
fit AS (
  SELECT bin, CAST(max(mn) AS BIGINT) AS fitted_micro
  FROM inner_min GROUP BY i_idx, bin
)
SELECT ra.bin, ra.n, ra.n_pos, ra.avg_score_micro, ra.frac_pos_micro,
       f.fitted_micro
FROM ratios ra LEFT JOIN fit f ON f.bin = ra.bin
ORDER BY ra.bin
"""

# q171: CUPED — exact integer pooled moments + per-variant sums, one
# closing double per variant row mirrored node for node (the q157
# rule); sign-separated truncating mean.
ORACLES["q171_cuped"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                           THEN CAST(round(value) AS BIGINT) END), 0)
              AS BIGINT) AS x,
         CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                           THEN CAST(round(value) AS BIGINT) END), 0)
              AS BIGINT) AS y
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
),
units AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant, x, y
  FROM per_user
),
pooled AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(x) AS BIGINT) AS gsx,
         CAST(count(*) AS BIGINT) * CAST(sum(x * y) AS BIGINT)
           - CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT) AS cov_num,
         CAST(count(*) AS BIGINT) * CAST(sum(x * x) AS BIGINT)
           - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT)
           AS var_x_num
  FROM units
),
per_v AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sum_y,
         CAST(sum(x) AS BIGINT) AS sum_x
  FROM units GROUP BY variant
)
SELECT v.variant, v.n, v.sum_y, v.sum_x,
       CASE WHEN v.sum_y >= 0 THEN (v.sum_y * 1000000) // v.n
            ELSE -(((-v.sum_y) * 1000000) // v.n) END AS mean_y_micro,
       CASE WHEN p.var_x_num != 0 THEN
         CAST(round((CAST(v.sum_y AS DOUBLE) / v.n
              - (CAST(p.cov_num AS DOUBLE) / p.var_x_num)
                * (CAST(v.sum_x AS DOUBLE) / v.n
                   - CAST(p.gsx AS DOUBLE) / p.n_total)) * 1000000)
              AS BIGINT)
       END AS adj_mean_micro,
       p.n_total, p.cov_num, p.var_x_num
FROM per_v v, pooled p
ORDER BY v.variant
"""

# q157: two-proportion z per event_type — integer cross-multiply
# success rule, exact counts, ONE closing double expression mirroring
# the Spark tree node for node (every operand an exactly-represented
# int64, sqrt IEEE-defined — the q116/q154 portability rule).
ORACLES["q157_ab_test"] = """
WITH ev AS (
  SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
users AS (SELECT DISTINCT user_id FROM ev),
types AS (SELECT DISTINCT event_type FROM ev),
counts AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_t
  FROM ev GROUP BY event_type, user_id
),
totals AS (
  SELECT event_type, CAST(sum(n_t) AS BIGINT) AS total_t
  FROM counts GROUP BY event_type
),
nu AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM users),
grid AS (
  SELECT t.event_type,
         u.user_id % 2 = 0 AS variant,
         CASE WHEN coalesce(c.n_t, 0) * nu.nu > tt.total_t
              THEN 1 ELSE 0 END AS success
  FROM users u
  CROSS JOIN types t
  LEFT JOIN counts c ON c.event_type = t.event_type
                    AND c.user_id = u.user_id
  JOIN totals tt ON tt.event_type = t.event_type
  CROSS JOIN nu
),
agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN variant THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN variant THEN success ELSE 0 END) AS BIGINT)
           AS x_a,
         CAST(sum(CASE WHEN variant THEN 0 ELSE success END) AS BIGINT)
           AS x_b
  FROM grid GROUP BY event_type
)
SELECT event_type, n_a, n_b, x_a, x_b,
       x_a * n_b - x_b * n_a AS diff_num,
       CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
                 AND x_a + x_b < n_a + n_b THEN
         CAST(round(
           (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt(
               (CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))
             )
           * 1000000) AS BIGINT)
       END AS z_micro
FROM agg ORDER BY event_type
"""

# q158: FD profiling — (det, dep) pair counts reduced per determinant
# group to (distinct-dep incl. NULL, plurality count, row mass), then
# per declared pair to (n_groups, n_violating, max_dep_values, holds,
# n_rows, g3_micro) — TANE's g3 in exact truncating micro-units.
ORACLES["q158_fd_profile"] = """
WITH
fd1 AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS keep, CAST(sum(c) AS BIGINT) AS nr
  FROM (SELECT o_orderkey, o_custkey, count(*) AS c
        FROM orders GROUP BY o_orderkey, o_custkey)
  GROUP BY o_orderkey
),
fd2 AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS keep, CAST(sum(c) AS BIGINT) AS nr
  FROM (SELECT o_custkey, o_orderstatus, count(*) AS c
        FROM orders GROUP BY o_custkey, o_orderstatus)
  GROUP BY o_custkey
),
fd3 AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS keep, CAST(sum(c) AS BIGINT) AS nr
  FROM (SELECT l_orderkey, l_linenumber, l_partkey, count(*) AS c
        FROM lineitem GROUP BY l_orderkey, l_linenumber, l_partkey)
  GROUP BY l_orderkey, l_linenumber
),
fd4 AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS keep, CAST(sum(c) AS BIGINT) AS nr
  FROM (SELECT l_orderkey, l_returnflag, count(*) AS c
        FROM lineitem GROUP BY l_orderkey, l_returnflag)
  GROUP BY l_orderkey
),
fd5 AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS keep, CAST(sum(c) AS BIGINT) AS nr
  FROM (SELECT event_id, user_id, count(*) AS c
        FROM events GROUP BY event_id, user_id)
  GROUP BY event_id
),
fd6 AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS keep, CAST(sum(c) AS BIGINT) AS nr
  FROM (SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type)
  GROUP BY user_id
),
rows_out AS (
  SELECT 'orders' AS tbl, 'o_orderkey->o_custkey' AS fd,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
         CAST(max(nd) AS BIGINT) AS max_dep_values,
         CAST(sum(nr) AS BIGINT) AS n_rows,
         CAST(sum(keep) AS BIGINT) AS n_keep
  FROM fd1
  UNION ALL
  SELECT 'orders', 'o_custkey->o_orderstatus', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(nd) AS BIGINT),
         CAST(sum(nr) AS BIGINT),
         CAST(sum(keep) AS BIGINT)
  FROM fd2
  UNION ALL
  SELECT 'lineitem', 'l_orderkey,l_linenumber->l_partkey',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(nd) AS BIGINT),
         CAST(sum(nr) AS BIGINT),
         CAST(sum(keep) AS BIGINT)
  FROM fd3
  UNION ALL
  SELECT 'lineitem', 'l_orderkey->l_returnflag', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(nd) AS BIGINT),
         CAST(sum(nr) AS BIGINT),
         CAST(sum(keep) AS BIGINT)
  FROM fd4
  UNION ALL
  SELECT 'events', 'event_id->user_id', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(nd) AS BIGINT),
         CAST(sum(nr) AS BIGINT),
         CAST(sum(keep) AS BIGINT)
  FROM fd5
  UNION ALL
  SELECT 'events', 'user_id->event_type', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(nd) AS BIGINT),
         CAST(sum(nr) AS BIGINT),
         CAST(sum(keep) AS BIGINT)
  FROM fd6
)
SELECT tbl, fd, n_groups,
       coalesce(n_violating, 0) AS n_violating,
       coalesce(max_dep_values, 0) AS max_dep_values,
       CAST(CASE WHEN coalesce(n_violating, 0) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS holds,
       coalesce(n_rows, 0) AS n_rows,
       coalesce(CAST(((n_rows - n_keep) * 1000000) // n_rows AS BIGINT),
                0) AS g3_micro
FROM rows_out ORDER BY tbl, fd
"""

# q159: char-level Shannon entropy — per-term quantized ln(c) micro-nats
# (round once per distinct (doc, char) count), exact int64 sums, one
# truncating closing division; empty docs NULL.
ORACLES["q159_char_entropy"] = """
WITH chars AS (
  SELECT doc_id, substr(text, CAST(p AS INTEGER), 1) AS ch
  FROM documents,
       unnest(range(1, CAST(length(text) AS BIGINT) + 1)) AS t(p)
),
pc AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
  FROM chars GROUP BY doc_id, ch
),
q AS (
  SELECT doc_id, c, CAST(round(ln(c) * 1000000) AS BIGINT) AS t FROM pc
),
st AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(c * t) AS BIGINT) AS s
  FROM q GROUP BY doc_id
)
SELECT d.doc_id AS id,
       coalesce(st.n, 0) AS n_chars,
       coalesce(st.nd, 0) AS n_distinct_chars,
       CASE WHEN st.n > 0
            THEN CAST(round(ln(st.n) * 1000000) AS BIGINT) - s // st.n
       END AS entropy_micro
FROM documents d LEFT JOIN st USING (doc_id)
ORDER BY id
"""

# q160: token-budget quality selection — the q77 scoring SQL, exclusive
# running token mass over (score DESC, doc_id) via a window frame ending
# at 1 PRECEDING (integer sums — no float prefix issues), keep iff the
# better-ranked mass is under the literal budget.
ORACLES["q160_budget_select"] = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS tk FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(tk, t -> {_W77})) AS BIGINT)
           AS score_micro,
         CAST(len(tk) AS BIGINT) AS n_tokens
  FROM toks
),
c AS (
  SELECT *,
         CAST(coalesce(sum(n_tokens) OVER (
                ORDER BY score_micro DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM scored
)
SELECT doc_id AS id, score_micro, n_tokens, cum_before,
       cum_before < 12000 AS kept
FROM c ORDER BY id
"""

# q161: Kaplan-Meier per cohort — (group, t)-keyed counts, exclusive
# prefix for the risk set, per-step round(ln(1 - d/n)*1e6), integer
# cumulative curve; a d = n step kills the curve (NULL poison carried
# by a running max of the death flag, mirroring the Spark gate).
ORACLES["q161_survival"] = """
WITH per_user AS (
  SELECT user_id,
         min(ts) AS f,
         max(ts) AS l,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS lp
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
subjects AS (
  SELECT user_id % 3 AS cohort,
         CAST(CASE WHEN lp IS NOT NULL
              THEN date_diff('day', CAST(f AS DATE), CAST(lp AS DATE))
              ELSE date_diff('day', CAST(f AS DATE), CAST(l AS DATE))
         END AS BIGINT) AS t,
         CASE WHEN lp IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM per_user
),
per_t AS (
  SELECT cohort AS "group", t,
         CAST(sum(e) AS BIGINT) AS n_events,
         CAST(sum(1 - e) AS BIGINT) AS n_censored
  FROM subjects GROUP BY cohort, t
),
risk AS (
  SELECT *,
         CAST(sum(n_events + n_censored) OVER
                (PARTITION BY "group") AS BIGINT)
         - CAST(coalesce(sum(n_events + n_censored) OVER
                (PARTITION BY "group" ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_at_risk
  FROM per_t
),
stepped AS (
  SELECT *,
         CASE WHEN n_events > 0 AND n_events < n_at_risk THEN
           CAST(round(ln(1 - CAST(n_events AS DOUBLE)
                             / CAST(n_at_risk AS DOUBLE)) * 1000000)
                AS BIGINT)
         WHEN n_events = 0 THEN CAST(0 AS BIGINT)
         END AS step_ln_micro
  FROM risk
),
gated AS (
  SELECT *,
         max(CASE WHEN step_ln_micro IS NULL THEN 1 ELSE 0 END) OVER
           (PARTITION BY "group" ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
  FROM stepped
)
SELECT "group", t, n_at_risk, n_events, n_censored, step_ln_micro,
       CASE WHEN dead = 0 THEN
         CAST(sum(step_ln_micro) OVER
                (PARTITION BY "group" ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT)
       END AS cum_ln_micro
FROM gated ORDER BY "group", t
"""

# q162: Kleinberg two-state bursts — forward integer Viterbi and the
# pinned-tie backward pass as lockstep recursive CTEs over the per-key
# gap sequences (all keys advance together; each stops at its own
# n_gaps). BIG = 2^62 is the 'started in base state' sentinel; gaps in
# integer seconds via date_diff('microsecond') div 1e6 (the
# timestampdiff truncation rule).
ORACLES["q162_bursts"] = """
WITH RECURSIVE ev AS (
  SELECT event_type AS key, ts, event_id FROM events
  WHERE event_id % 4 = 0
),
g0 AS (
  SELECT key,
         row_number() OVER (PARTITION BY key ORDER BY ts, event_id) - 1
           AS i,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY key ORDER BY ts, event_id),
                   ts) // 1000000 AS gap_s
  FROM ev
),
gaps AS MATERIALIZED (
  SELECT key, CAST(i AS INTEGER) AS i, CAST(gap_s AS BIGINT) AS gap_s
  FROM g0 WHERE gap_s IS NOT NULL
),
consts AS MATERIALIZED (
  SELECT key, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(count(*) + 1 AS BIGINT) AS n_events,
         CAST(sum(gap_s) AS BIGINT) // CAST(count(*) AS BIGINT)
           AS mean_gap
  FROM gaps GROUP BY key
),
params AS MATERIALIZED (
  SELECT key, n_gaps, n_events, mean_gap,
         (1000000 * CAST(round(ln(n_events) * 1000000) AS BIGINT))
           // 1000000 AS trans
  FROM consts WHERE n_gaps >= 2
),
deltas AS MATERIALIZED (
  SELECT g.key, g.i,
         (g.gap_s * 1000000) // p.mean_gap - 693147 AS delta
  FROM gaps g JOIN params p USING (key)
),
fwd(key, i, dp0, dp1) AS (
  SELECT key, 0, CAST(0 AS BIGINT), CAST(4611686018427387904 AS BIGINT)
  FROM params
  UNION ALL
  SELECT f.key, f.i + 1,
         least(f.dp0, f.dp1),
         least(f.dp1, f.dp0 + p.trans) + d.delta
  FROM fwd f
  JOIN params p ON p.key = f.key
  JOIN deltas d ON d.key = f.key AND d.i = f.i + 1
  WHERE f.i < p.n_gaps
),
-- the recursive fwd CTE is RE-EVALUATED at every reference inside
-- another recursive CTE's step (the q142 inlining lesson, recursive
-- flavor): pin it once
fwd_m AS MATERIALIZED (SELECT * FROM fwd),
bwd(key, i, s) AS (
  SELECT f.key, f.i,
         CASE WHEN f.dp0 <= f.dp1 THEN 0 ELSE 1 END
  FROM fwd_m f JOIN params p ON p.key = f.key AND f.i = p.n_gaps
  UNION ALL
  SELECT b.key, b.i - 1,
         CASE WHEN b.s = 0
              THEN CASE WHEN f.dp0 <= f.dp1 THEN 0 ELSE 1 END
              ELSE CASE WHEN f.dp1 <= f.dp0 + p.trans THEN 1 ELSE 0 END
         END
  FROM bwd b
  JOIN fwd_m f ON f.key = b.key AND f.i = b.i - 1
  JOIN params p ON p.key = b.key
  WHERE b.i > 1
),
runs AS (
  SELECT key, i, s,
         lag(s, 1, 0) OVER (PARTITION BY key ORDER BY i) AS prev_s
  FROM bwd
),
summary AS (
  SELECT key,
         CAST(sum(s) AS BIGINT) AS n_burst_gaps,
         CAST(sum(CASE WHEN s = 1 AND prev_s = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_bursts
  FROM runs GROUP BY key
),
islands AS (
  SELECT key, i - row_number() OVER (PARTITION BY key ORDER BY i)
           AS isl
  FROM runs WHERE s = 1
),
longest AS (
  SELECT key, CAST(max(c) AS BIGINT) AS max_burst_gaps
  FROM (SELECT key, isl, count(*) AS c FROM islands GROUP BY key, isl)
  GROUP BY key
),
final_cost AS (
  SELECT f.key, least(f.dp0, f.dp1) AS cost_micro
  FROM fwd_m f JOIN params p ON p.key = f.key AND f.i = p.n_gaps
)
SELECT c.key, c.n_events, c.n_gaps,
       CASE WHEN c.n_gaps >= 2 THEN c.mean_gap END AS mean_gap_s,
       coalesce(s.n_burst_gaps, 0) AS n_burst_gaps,
       coalesce(s.n_bursts, 0) AS n_bursts,
       coalesce(l.max_burst_gaps, 0) AS max_burst_gaps,
       fc.cost_micro
FROM consts c
LEFT JOIN summary s ON s.key = c.key
LEFT JOIN longest l ON l.key = c.key
LEFT JOIN final_cost fc ON fc.key = c.key
ORDER BY c.key
"""

# q165: burst intervals — the q162 lockstep forward/backward DP, with
# the gap frame additionally carrying each gap's bounding event
# timestamps; burst-state islands reduce to (start_ts, end_ts, counts,
# integer gap mass) per maximal run. Keyed per user bucket (session
# structure), gamma = 0.3 (trans below).
ORACLES["q165_burst_intervals"] = """
WITH RECURSIVE ev AS (
  SELECT user_id % 40 AS key, ts, event_id FROM events
  WHERE user_id IS NOT NULL
),
g0 AS (
  SELECT key,
         row_number() OVER (PARTITION BY key ORDER BY ts, event_id) - 1
           AS i,
         lag(ts) OVER (PARTITION BY key ORDER BY ts, event_id) AS t0,
         ts AS t1,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY key ORDER BY ts, event_id),
                   ts) // 1000000 AS gap_s
  FROM ev
),
gaps AS MATERIALIZED (
  SELECT key, CAST(i AS INTEGER) AS i, CAST(gap_s AS BIGINT) AS gap_s,
         t0, t1
  FROM g0 WHERE gap_s IS NOT NULL
),
consts AS MATERIALIZED (
  SELECT key, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(count(*) + 1 AS BIGINT) AS n_events,
         CAST(sum(gap_s) AS BIGINT) // CAST(count(*) AS BIGINT)
           AS mean_gap
  FROM gaps GROUP BY key
),
params AS MATERIALIZED (
  SELECT key, n_gaps, n_events, mean_gap,
         (300000 * CAST(round(ln(n_events) * 1000000) AS BIGINT))
           // 1000000 AS trans
  FROM consts WHERE n_gaps >= 2
),
deltas AS MATERIALIZED (
  SELECT g.key, g.i,
         (g.gap_s * 1000000) // p.mean_gap - 693147 AS delta
  FROM gaps g JOIN params p USING (key)
),
fwd(key, i, dp0, dp1) AS (
  SELECT key, 0, CAST(0 AS BIGINT), CAST(4611686018427387904 AS BIGINT)
  FROM params
  UNION ALL
  SELECT f.key, f.i + 1,
         least(f.dp0, f.dp1),
         least(f.dp1, f.dp0 + p.trans) + d.delta
  FROM fwd f
  JOIN params p ON p.key = f.key
  JOIN deltas d ON d.key = f.key AND d.i = f.i + 1
  WHERE f.i < p.n_gaps
),
fwd_m AS MATERIALIZED (SELECT * FROM fwd),
bwd(key, i, s) AS (
  SELECT f.key, f.i,
         CASE WHEN f.dp0 <= f.dp1 THEN 0 ELSE 1 END
  FROM fwd_m f JOIN params p ON p.key = f.key AND f.i = p.n_gaps
  UNION ALL
  SELECT b.key, b.i - 1,
         CASE WHEN b.s = 0
              THEN CASE WHEN f.dp0 <= f.dp1 THEN 0 ELSE 1 END
              ELSE CASE WHEN f.dp1 <= f.dp0 + p.trans THEN 1 ELSE 0 END
         END
  FROM bwd b
  JOIN fwd_m f ON f.key = b.key AND f.i = b.i - 1
  JOIN params p ON p.key = b.key
  WHERE b.i > 1
),
islands AS MATERIALIZED (
  SELECT key, i,
         i - row_number() OVER (PARTITION BY key ORDER BY i) AS isl
  FROM bwd WHERE s = 1
),
bursts AS MATERIALIZED (
  SELECT key, isl, min(i) AS i_a, max(i) AS i_b,
         CAST(count(*) AS BIGINT) AS n_gaps
  FROM islands GROUP BY key, isl
),
spans AS (
  SELECT b.key, b.isl, CAST(sum(g.gap_s) AS BIGINT) AS span_s
  FROM bursts b
  JOIN gaps g ON g.key = b.key AND g.i BETWEEN b.i_a AND b.i_b
  GROUP BY b.key, b.isl
)
SELECT b.key,
       CAST(row_number() OVER (PARTITION BY b.key ORDER BY b.i_a)
            AS BIGINT) AS burst_id,
       ga.t0 AS start_ts, gb.t1 AS end_ts,
       b.n_gaps, b.n_gaps + 1 AS n_events, sp.span_s
FROM bursts b
JOIN gaps ga ON ga.key = b.key AND ga.i = b.i_a
JOIN gaps gb ON gb.key = b.key AND gb.i = b.i_b
JOIN spans sp ON sp.key = b.key AND sp.isl = b.isl
ORDER BY b.key, burst_id
"""

# q166: 3-state burst hierarchy — the q162/q165 lockstep pattern with
# all three DP columns carried through the forward recursion and the
# pinned stay-else-lowest backtrack expanded per current state.
# Constants: s = 2 (ln_s = 693147; delta1 = c0 - ln_s,
# delta2 = 3*c0 - 2*ln_s), gamma = 0.3.
ORACLES["q166_burst_hierarchy"] = """
WITH RECURSIVE ev AS (
  SELECT user_id % 40 AS key, ts, event_id FROM events
  WHERE user_id IS NOT NULL
),
g0 AS (
  SELECT key,
         row_number() OVER (PARTITION BY key ORDER BY ts, event_id) - 1
           AS i,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY key ORDER BY ts, event_id),
                   ts) // 1000000 AS gap_s
  FROM ev
),
gaps AS MATERIALIZED (
  SELECT key, CAST(i AS INTEGER) AS i, CAST(gap_s AS BIGINT) AS gap_s
  FROM g0 WHERE gap_s IS NOT NULL
),
consts AS MATERIALIZED (
  SELECT key, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(count(*) + 1 AS BIGINT) AS n_events,
         CAST(sum(gap_s) AS BIGINT) // CAST(count(*) AS BIGINT)
           AS mean_gap
  FROM gaps GROUP BY key
),
params AS MATERIALIZED (
  SELECT key, n_gaps, n_events, mean_gap,
         (300000 * CAST(round(ln(n_events) * 1000000) AS BIGINT))
           // 1000000 AS trans
  FROM consts WHERE n_gaps >= 2
),
deltas AS MATERIALIZED (
  SELECT g.key, g.i,
         (g.gap_s * 1000000) // p.mean_gap - 693147 AS d1,
         3 * ((g.gap_s * 1000000) // p.mean_gap) - 1386294 AS d2
  FROM gaps g JOIN params p USING (key)
),
fwd(key, i, dp0, dp1, dp2) AS (
  SELECT key, 0, CAST(0 AS BIGINT),
         CAST(4611686018427387904 AS BIGINT),
         CAST(4611686018427387904 AS BIGINT)
  FROM params
  UNION ALL
  SELECT f.key, f.i + 1,
         least(f.dp0, f.dp1, f.dp2),
         least(f.dp0 + p.trans, f.dp1, f.dp2) + d.d1,
         least(f.dp0 + 2 * p.trans, f.dp1 + p.trans, f.dp2) + d.d2
  FROM fwd f
  JOIN params p ON p.key = f.key
  JOIN deltas d ON d.key = f.key AND d.i = f.i + 1
  WHERE f.i < p.n_gaps
),
fwd_m AS MATERIALIZED (SELECT * FROM fwd),
bwd(key, i, s) AS (
  SELECT f.key, f.i,
         CASE WHEN f.dp0 <= f.dp1 AND f.dp0 <= f.dp2 THEN 0
              WHEN f.dp1 <= f.dp2 THEN 1 ELSE 2 END
  FROM fwd_m f JOIN params p ON p.key = f.key AND f.i = p.n_gaps
  UNION ALL
  SELECT b.key, b.i - 1,
         CASE b.s
           WHEN 0 THEN
             CASE WHEN f.dp0 <= f.dp1 AND f.dp0 <= f.dp2 THEN 0
                  WHEN f.dp1 <= f.dp2 THEN 1 ELSE 2 END
           WHEN 1 THEN
             CASE WHEN f.dp1 <= f.dp0 + p.trans AND f.dp1 <= f.dp2
                    THEN 1
                  WHEN f.dp0 + p.trans <= f.dp2 THEN 0 ELSE 2 END
           ELSE
             CASE WHEN f.dp2 <= f.dp0 + 2 * p.trans
                    AND f.dp2 <= f.dp1 + p.trans THEN 2
                  WHEN f.dp0 + 2 * p.trans <= f.dp1 + p.trans THEN 0
                  ELSE 1 END
         END
  FROM bwd b
  JOIN fwd_m f ON f.key = b.key AND f.i = b.i - 1
  JOIN params p ON p.key = b.key
  WHERE b.i > 1
),
runs AS (
  SELECT key, i, s,
         CASE WHEN s >= 1 THEN 1 ELSE 0 END AS b,
         lag(CASE WHEN s >= 1 THEN 1 ELSE 0 END, 1, 0)
           OVER (PARTITION BY key ORDER BY i) AS prev_b
  FROM bwd
),
summary AS (
  SELECT key,
         CAST(max(s) AS BIGINT) AS max_state,
         CAST(sum(b) AS BIGINT) AS n_burst_gaps,
         CAST(sum(CASE WHEN b = 1 AND prev_b = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_bursts,
         CAST(sum(s) AS BIGINT) AS state_mass
  FROM runs GROUP BY key
),
final_cost AS (
  SELECT f.key, least(f.dp0, f.dp1, f.dp2) AS cost_micro
  FROM fwd_m f JOIN params p ON p.key = f.key AND f.i = p.n_gaps
)
SELECT c.key, c.n_events, c.n_gaps,
       CASE WHEN c.n_gaps >= 2 THEN c.mean_gap END AS mean_gap_s,
       coalesce(s.max_state, 0) AS max_state,
       coalesce(s.n_burst_gaps, 0) AS n_burst_gaps,
       coalesce(s.n_bursts, 0) AS n_bursts,
       coalesce(s.state_mass, 0) AS state_mass,
       fc.cost_micro
FROM consts c
LEFT JOIN summary s ON s.key = c.key
LEFT JOIN final_cost fc ON fc.key = c.key
ORDER BY c.key
"""

# q167: offline changepoint — windowed prefix sums, argmax |n*P - t*S|
# with smallest-t tiebreak; segment means through HUGEINT-exact // on
# non-negative operands (the Spark side rides DECIMAL(38,0) div).
ORACLES["q167_changepoint"] = """
WITH base AS (
  SELECT event_type AS "group", ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
),
pref AS (
  SELECT "group",
         CAST(sum(x) OVER (PARTITION BY "group" ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS p,
         CAST(row_number() OVER (PARTITION BY "group"
              ORDER BY ts, event_id) AS BIGINT) AS t,
         CAST(count(*) OVER (PARTITION BY "group") AS BIGINT) AS n,
         CAST(sum(x) OVER (PARTITION BY "group") AS BIGINT) AS s
  FROM base
),
cand AS (
  SELECT "group", t, n, s, p, abs(n * p - t * s) AS a
  FROM pref WHERE t < n
),
best AS (
  SELECT "group", n, s AS total, t AS t_hat, CAST(a AS BIGINT) AS a_max,
         p,
         row_number() OVER (PARTITION BY "group" ORDER BY a DESC, t)
           AS rk
  FROM cand QUALIFY rk = 1
)
SELECT "group", n, total, t_hat, a_max,
       CAST((p * 1000000) // t_hat AS BIGINT) AS mean_left_micro,
       CAST(((total - p) * 1000000) // (n - t_hat) AS BIGINT)
         AS mean_right_micro,
       CAST(((total - p) * 1000000) // (n - t_hat)
            - (p * 1000000) // t_hat AS BIGINT) AS shift_micro
FROM best ORDER BY "group"
"""

# q168: Benford first-digit profile — substr of the positive integer's
# decimal repr, full 9-digit spine per group, truncating micro
# fractions, expectation quantized once per digit in-engine.
ORACLES["q168_benford"] = """
WITH vals AS (
  SELECT o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
digits AS (
  SELECT priority,
         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM vals GROUP BY priority, digit
),
totals AS (
  SELECT priority, CAST(sum(n) AS BIGINT) AS nn FROM digits
  GROUP BY priority
),
spine AS (
  SELECT t.priority, t.nn, CAST(d AS INTEGER) AS digit
  FROM totals t, unnest(range(1, 10)) AS s(d)
)
SELECT sp.priority, sp.digit,
       coalesce(dg.n, 0) AS n,
       (coalesce(dg.n, 0) * 1000000) // sp.nn AS obs_micro,
       CAST(round(log10(1 + 1.0 / sp.digit) * 1000000) AS BIGINT)
         AS exp_micro,
       (coalesce(dg.n, 0) * 1000000) // sp.nn
         - CAST(round(log10(1 + 1.0 / sp.digit) * 1000000) AS BIGINT)
         AS dev_micro
FROM spine sp
LEFT JOIN digits dg ON dg.priority = sp.priority AND dg.digit = sp.digit
ORDER BY sp.priority, sp.digit
"""

# q169: mutual information — the three q159-shaped entropies (per-term
# quantized ln, exact sums, one truncating division each) off the
# distinct-pair frame; MI assembled from the quantized entropies.
ORACLES["q169_mutual_information"] = """
WITH xy AS (
  SELECT l_returnflag AS x, l_linestatus AS y,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY x, y
),
mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS c FROM xy GROUP BY x),
my AS (SELECT y, CAST(sum(c) AS BIGINT) AS c FROM xy GROUP BY y),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS dx,
         CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT)
           AS s
  FROM mx
),
ey AS (
  SELECT CAST(count(*) AS BIGINT) AS dy,
         CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT)
           AS s
  FROM my
),
exy AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS dxy,
         CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT)
           AS s
  FROM xy
),
hs AS (
  SELECT exy.n, ex.dx, ey.dy, exy.dxy,
         CAST(round(ln(exy.n) * 1000000) AS BIGINT) - ex.s // exy.n
           AS h_x_micro,
         CAST(round(ln(exy.n) * 1000000) AS BIGINT) - ey.s // exy.n
           AS h_y_micro,
         CAST(round(ln(exy.n) * 1000000) AS BIGINT) - exy.s // exy.n
           AS h_xy_micro
  FROM exy, ex, ey
)
SELECT n, dx AS x_distinct, dy AS y_distinct, dxy AS xy_distinct,
       h_x_micro, h_y_micro, h_xy_micro,
       h_x_micro + h_y_micro - h_xy_micro AS mi_micro
FROM hs
"""

# q163: truncation recall — both top-5 lists replayed with the q27
# cosine/rank contract (round 6, neighbor-id tiebreak), overlap counted
# on the rank-5 join.
ORACLES["q163_truncation_recall"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         CAST(embedding[1:16] AS DOUBLE[]) AS tv
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, tv AS qtv FROM e
      WHERE vec_id % 100 = 0),
sf AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(qv, v)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(v, v))), 6) AS c
  FROM q JOIN e ON e.vec_id != q.query_id
),
rf AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC,
                            neighbor_id) AS rk
  FROM sf QUALIFY rk <= 5
),
st AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(qtv, tv)
               / (sqrt(list_dot_product(qtv, qtv))
                  * sqrt(list_dot_product(tv, tv))), 6) AS c
  FROM q JOIN e ON e.vec_id != q.query_id
),
rt AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC,
                            neighbor_id) AS rk
  FROM st QUALIFY rk <= 5
),
common AS (
  SELECT rf.query_id, CAST(count(*) AS BIGINT) AS n_common
  FROM rf JOIN rt ON rt.query_id = rf.query_id
                 AND rt.neighbor_id = rf.neighbor_id
  GROUP BY rf.query_id
)
SELECT q.query_id,
       (SELECT CAST(count(*) AS BIGINT) FROM rf WHERE rf.query_id = q.query_id)
         AS n_full,
       (SELECT CAST(count(*) AS BIGINT) FROM rt WHERE rt.query_id = q.query_id)
         AS n_trunc,
       coalesce(c.n_common, 0) AS n_common,
       (coalesce(c.n_common, 0) * 1000000) // 5 AS recall_micro
FROM q LEFT JOIN common c ON c.query_id = q.query_id
ORDER BY q.query_id
"""

# q164: charset mix — the same length-difference class counts, the same
# truncating fractions, other = 1e6 - the four truncated fractions.
ORACLES["q164_charset_mix"] = r"""
WITH base AS (
  SELECT doc_id AS id,
         CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS l,
         CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS d,
         CAST(length(text)
              - length(regexp_replace(text, ' ', '', 'g'))
              AS BIGINT) AS s,
         CAST(length(text)
              - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))
              AS BIGINT) AS na
  FROM documents
),
fr AS (
  SELECT id, n_chars,
         CASE WHEN n_chars > 0 THEN (l * 1000000) // n_chars END
           AS letter_micro,
         CASE WHEN n_chars > 0 THEN (d * 1000000) // n_chars END
           AS digit_micro,
         CASE WHEN n_chars > 0 THEN (s * 1000000) // n_chars END
           AS space_micro,
         CASE WHEN n_chars > 0 THEN (na * 1000000) // n_chars END
           AS nonascii_micro
  FROM base
)
SELECT *,
       CASE WHEN n_chars > 0 THEN
         1000000 - letter_micro - digit_micro - space_micro
                 - nonascii_micro
       END AS other_micro
FROM fr ORDER BY id
"""
