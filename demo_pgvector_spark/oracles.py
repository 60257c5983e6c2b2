"""DuckDB oracle SQL for every registry key (registry hygiene split,
round 3: VERDICT r2 asked for the SQL constants to move out of the
2,500-line registry.py so the operator code stays reviewable).

Each ``O_<KEY>`` constant is the ANSI-SQL equivalent of the same-named
Spark query in registry.py, run by the driver through DuckDB over the
same parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings). The SQL re-implements each
operator INDEPENDENTLY (including multi-stage pipelines like MinHash
banding, LSH signatures, and the unrolled Lloyd iterations) — shared
constants come only from fixtures.py and the operator modules'
parameter values, never from the Spark execution path.

Parity rules are documented in registry.py's module docstring.
"""

from __future__ import annotations

from demo_pgvector_spark.fixtures import (
    CM_PROBE_MOD,
    DEDUP_BATCH_MOD,
    IOJ_A_MOD,
    IOJ_B_MOD,
    _BPE_CHUNK_TOKENS,
    _CHUNK_TOKENS,
    _EXTS,
    _SIDECARS,
    _SOURCE_COLS,
    BFS_MAX_HOPS,
    BFS_SEED_MOD,
    FILTERED_K,
    FILTERED_LABEL,
    FUZZY_MAX_KEY,
    FUZZY_TAU,
    FUZZY_W1,
    FUZZY_W2,
    FUZZY_W3,
    LPA_ITERS,
    MMR_K,
    MMR_LAMBDA,
    MMR_POOL,
    PAGERANK_ITERS,
    PRIORITY_K,
    PRIORITY_SALT,
    QUERY_VEC_ID,
    RAG_PROMPT,
    SUPP_NODE_OFFSET,
    TRI_QTY_MIN,
    TS_USER_MOD,
    ZORDER_BOX,
    ZORDER_BUCKET_BITS,
)
from demo_pgvector_spark.functions import textstats
from demo_pgvector_spark.operators import chunking as chunk_ops
from demo_pgvector_spark.operators import curation as curation_ops
from demo_pgvector_spark.operators import dedup as dedup_ops
from demo_pgvector_spark.operators import ivf as ivf_ops
from demo_pgvector_spark.operators import sketch as sketch_ops
from demo_pgvector_spark.operators import skew as skew_ops


_ORACLE_QVEC = (
    "SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0"
)


_ORACLE_SIM = "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)"


O_VEC_SIM_TOPK = f"""
WITH q AS ({_ORACLE_QVEC}),
scored AS (
  SELECT e.vec_id, {_ORACLE_SIM} AS sim
  FROM embeddings e, q
),
hits AS (
  SELECT vec_id, sim FROM scored WHERE sim >= 0.2
  ORDER BY sim DESC, vec_id ASC LIMIT 10
)
SELECT h.vec_id AS chunk_id, ROUND(h.sim, 6) AS similarity_score,
       d.text AS chunk_text, d.lang, d.source
FROM hits h JOIN documents d ON h.vec_id = d.doc_id
"""


O_VEC_COSINE_DIST = f"""
WITH q AS ({_ORACLE_QVEC})
SELECT e.vec_id, ROUND(1.0 - {_ORACLE_SIM}, 6) AS cosine_distance,
       ROUND(list_distance(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS l2_dist,
       ROUND(-list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS neg_ip,
       ROUND({_ORACLE_SIM}, 4) AS sim4,
       ROUND(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                   CAST(e.embedding AS DOUBLE[]))), 6) AS norm,
       ROUND(sqrt(list_dot_product(
         list_transform(CAST(e.embedding AS DOUBLE[]),
           x -> x / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))),
         list_transform(CAST(e.embedding AS DOUBLE[]),
           x -> x / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))))), 6) AS unit_norm
FROM embeddings e, q
"""


O_PROJ_SIMILARITY = f"""
WITH q AS ({_ORACLE_QVEC})
SELECT e.vec_id AS id, ROUND({_ORACLE_SIM}, 6) AS similarity_score,
       d.text AS chunk_text, d.source AS metadata_source
FROM embeddings e, q
JOIN documents d ON e.vec_id = d.doc_id
"""


O_VEC_KNN_JOIN = """
WITH probes AS (
  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT p.probe_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv) AS sim,
         ROW_NUMBER() OVER (PARTITION BY p.probe_id
                            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv) DESC,
                                     e.vec_id ASC) AS rank
  FROM embeddings e CROSS JOIN probes p
  WHERE p.probe_id <> e.vec_id
)
SELECT probe_id, vec_id AS neighbor_id, ROUND(sim, 6) AS similarity_score, rank
FROM scored WHERE rank <= 3
"""


O_FILT_THRESHOLD = f"""
WITH q AS ({_ORACLE_QVEC})
SELECT e.vec_id, ROUND({_ORACLE_SIM}, 6) AS similarity_score
FROM embeddings e, q
WHERE {_ORACLE_SIM} >= 0.15
"""


O_FILT_MODEL_EQ = "SELECT doc_id FROM documents WHERE source = 'src3'"


O_FILT_NULLSAFE = """
SELECT c_custkey FROM (
  SELECT c_custkey,
         NULLIF(c_mktsegment, 'BUILDING') AS seg,
         NULLIF(c_nationkey, 7) AS nat
  FROM customer
) WHERE seg IS NOT DISTINCT FROM NULL AND nat IS NOT DISTINCT FROM NULL
"""


# Composite row: filt_model_eq + filt_nullsafe, tagged per branch (the
# consolidation that freed correctness-window slots for the TPC-H family).
O_FILT_PREDICATES = f"""
SELECT 'model_eq' AS branch, CAST(doc_id AS BIGINT) AS id
FROM ({O_FILT_MODEL_EQ})
UNION ALL
SELECT 'nullsafe' AS branch, CAST(c_custkey AS BIGINT) AS id
FROM ({O_FILT_NULLSAFE})
"""


O_JOIN_CHUNK_DATA = """
SELECT e.vec_id, d.text AS chunk_text, d.lang, d.source, e.label
FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
"""


# Composite row: proj_similarity + filt_threshold + join_chunk_data as
# branch-tagged sparse union (round-4 consolidation).
O_PROJ_SIM_FAMILY = f"""
SELECT 'proj' AS branch, CAST(id AS BIGINT) AS id, similarity_score,
       chunk_text, CAST(NULL AS VARCHAR) AS lang,
       metadata_source AS source, CAST(NULL AS INTEGER) AS label
FROM ({O_PROJ_SIMILARITY})
UNION ALL
SELECT 'filt', CAST(vec_id AS BIGINT), similarity_score,
       NULL, NULL, NULL, NULL
FROM ({O_FILT_THRESHOLD})
UNION ALL
SELECT 'join', CAST(vec_id AS BIGINT), CAST(NULL AS DOUBLE),
       chunk_text, lang, source, label
FROM ({O_JOIN_CHUNK_DATA})
"""


O_CLASSIFY_SOURCE_TYPE = """
WITH staged AS (
  SELECT doc_id,
    CASE lang WHEN 'en' THEN 'Novel' WHEN 'fr' THEN ' SCI-FI '
              WHEN 'de' THEN 'essay' WHEN 'zh' THEN 'poem' END AS text_type,
    CASE WHEN source IN ('src1','src2','src3') THEN 'Horror'
         WHEN source = 'src4' THEN 'biography' END AS genre
  FROM documents
)
SELECT doc_id,
  CASE WHEN lower(trim(coalesce(text_type,''))) IN
         ('short story','novel','novella','poem','fiction','science fiction',
          'sci-fi','sf','fantasy','fable','drama','play') THEN 1
       WHEN lower(trim(coalesce(genre,''))) IN
         ('science fiction','fantasy','horror','mystery','thriller') THEN 1
       ELSE 2 END AS source_type
FROM staged
"""


O_EXTRACT_YEAR = """
SELECT o_orderkey,
       substring(publication_date, 1, 4) AS year_str,
       TRY_CAST(substring(publication_date, 1, 4) AS INTEGER) AS year
FROM (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN o_orderpriority
              ELSE CAST(o_orderdate AS VARCHAR) END AS publication_date
  FROM orders
)
"""


O_STR_SCALARS = r"""
WITH toks AS (
  SELECT doc_id, text, source,
         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}_]+'),
                     x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       CASE WHEN length(text) > 500 THEN substring(text, 1, 500) || '...'
            ELSE text END AS display_text,
       length(text) AS n_len,
       lower(trim('  ' || upper(source) || ' ' || chr(9))) AS normalized,
       CAST(len(t) AS INTEGER) AS n_tokens, t[1] AS first_token,
       sha256(text) AS sha256_hex, md5(text) AS md5_hex,
       CAST(('0x' || substring(sha256(text), 1, 8))::UBIGINT AS BIGINT) AS base_seed
FROM toks
"""


O_STR_TOKENIZE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}_]+'),
                     x -> x <> '') AS t
  FROM documents
)
SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens, t[1] AS first_token FROM toks
"""


O_AGG_WORD_COUNTS = r"""
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}_]+'),
                            x -> x <> '')) AS word
  FROM documents
)
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 50
"""


O_JSON_METADATA = """
SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso_ts
FROM events
"""


O_TPCH_Q3 = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


O_TPCH_Q5 = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


O_TPCH_Q6 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


O_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
  ROUND(CAST(SUM(qty) AS DOUBLE), 2) AS sum_qty,
  ROUND(CAST(SUM(price) AS DOUBLE), 2) AS sum_base_price,
  ROUND(CAST(SUM(price * (1 - disc)) AS DOUBLE), 2) AS sum_disc_price,
  ROUND(CAST(SUM(price * (1 - disc) * (1 + tax)) AS DOUBLE), 2) AS sum_charge,
  ROUND(CAST(SUM(qty) / COUNT(*) AS DOUBLE), 6) AS avg_qty,
  ROUND(CAST(SUM(price) / COUNT(*) AS DOUBLE), 6) AS avg_price,
  ROUND(CAST(SUM(disc) / COUNT(*) AS DOUBLE), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         CAST(l_discount AS DECIMAL(18,2)) AS disc,
         CAST(l_tax AS DECIMAL(18,2)) AS tax
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


O_JOIN_LINEITEM_ORDERS = """
SELECT o_orderpriority,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
  COUNT(DISTINCT o_orderkey) AS n_orders,
  COUNT(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


O_EMB_HASH_EMBED = f"""
SELECT d.doc_id,
       {", ".join(f"round(g.embedding[{i + 1}], 6) AS emb_{i}" for i in range(8))}
FROM documents d
JOIN read_parquet('/root/repo/golden/emb_hash_embed.parquet') g
  ON sha256(d.text) = g.text_sha
"""


O_HASH_SHA256 = """
SELECT doc_id, sha256(text) AS sha256_hex, md5(text) AS md5_hex,
       CAST(('0x' || substring(sha256(text), 1, 8))::UBIGINT AS BIGINT) AS base_seed
FROM documents
"""


O_EMB_GENERATE = f"""
SELECT d.doc_id,
       'Analyze and understand this text: ' || d.text || chr(10) || chr(10) ||
       'The key concepts in this text are:' AS analysis_prompt,
       {", ".join(f"round(g.embedding[{i + 1}], 6) AS emb_{i}" for i in range(4))}
FROM documents d
JOIN read_parquet('/root/repo/golden/emb_hash_embed.parquet') g
  ON sha256(d.text) = g.text_sha
"""


_ORACLE_ANN_COMMON = """
p AS (SELECT t, j, plane FROM read_parquet('/root/repo/golden/ann_planes.parquet')),
vsig AS (
  SELECT e.vec_id, p.t,
         SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.plane) >= 0
             THEN (1 << p.j) ELSE 0 END) AS sig
  FROM embeddings e CROSS JOIN p GROUP BY e.vec_id, p.t
)"""


O_VEC_ANN_TOPK = f"""
WITH {_ORACLE_ANN_COMMON},
q AS ({_ORACLE_QVEC}),
qsig AS (
  SELECT p.t,
         SUM(CASE WHEN list_dot_product(q.qv, p.plane) >= 0
             THEN (1 << p.j) ELSE 0 END) AS sig
  FROM q CROSS JOIN p GROUP BY p.t
),
buckets AS (
  SELECT t, sig FROM qsig
  UNION ALL
  SELECT qsig.t, xor(qsig.sig, CAST(1 << p.j AS BIGINT))
  FROM qsig JOIN p ON p.t = qsig.t
),
cand AS (SELECT DISTINCT v.vec_id FROM vsig v JOIN buckets b ON v.t = b.t AND v.sig = b.sig),
scored AS (
  SELECT c.vec_id, {_ORACLE_SIM} AS sim
  FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id, q
)
SELECT vec_id, ROUND(sim, 6) AS similarity_score,
       CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


_O_FILEPATH = (
    "'/import/' || source || '/doc_' || doc_id || '.' || "
    f"(['{_EXTS[0]}', '{_EXTS[1]}', '{_EXTS[2]}', '{_EXTS[3]}'])[(doc_id % 4 + 1)]"
)


_O_MIME = (
    "CASE (doc_id % 4) WHEN 0 THEN 'text/plain' WHEN 1 THEN 'application/epub+zip' "
    "WHEN 2 THEN 'text/markdown' ELSE 'application/octet-stream' END"
)


O_SRC_ROUTE = f"""
WITH f AS (SELECT doc_id, {_O_FILEPATH} AS filepath, {_O_MIME} AS mime FROM documents)
SELECT doc_id, filepath, mime,
       mime <> 'text/plain' AS needs_conversion,
       mime = 'application/epub+zip' AS is_convertible,
       CASE WHEN mime = 'text/plain' THEN 'ready'
            WHEN mime = 'application/epub+zip' THEN 'convert'
            ELSE 'rejected' END AS route
FROM f
"""


O_FILT_FILES = f"""
WITH f AS (SELECT doc_id, {_O_MIME} AS mime FROM documents)
SELECT doc_id, mime,
       CASE WHEN mime = 'text/plain' THEN 'ready' ELSE 'convert' END AS route
FROM f WHERE mime IN ('text/plain', 'application/epub+zip')
"""


_O_SIDECAR_VALUES = ", ".join(f"('{s}', '{a}', '{g}')" for s, a, g in _SIDECARS)


O_META_SIDECAR = f"""
WITH sc(source, author, genre) AS (VALUES {_O_SIDECAR_VALUES}),
j AS (
  SELECT d.doc_id, d.source,
         CASE WHEN sc.source IS NULL THEN '{{}}'
              ELSE '{{"author":"' || sc.author || '","genre":"' || sc.genre || '"}}'
         END AS sidecar_json
  FROM documents d LEFT JOIN sc ON d.source = sc.source
),
f AS (SELECT doc_id, {_O_FILEPATH} AS filepath FROM documents),
psc AS (
  SELECT filepath || '.meta.yml' AS meta_path, TRUE AS has_sidecar
  FROM f WHERE doc_id % 3 = 0
)
SELECT j.doc_id, j.source, j.sidecar_json,
       f.filepath || '.meta.yml' AS meta_path,
       COALESCE(psc.has_sidecar, FALSE) AS has_sidecar
FROM j
JOIN f ON j.doc_id = f.doc_id
LEFT JOIN psc ON f.filepath || '.meta.yml' = psc.meta_path
"""


O_SINK_STDOUT = f"""
WITH q AS ({_ORACLE_QVEC}),
scored AS (
  SELECT e.vec_id, {_ORACLE_SIM} AS sim FROM embeddings e, q
),
hits AS (
  SELECT vec_id, sim FROM scored WHERE sim >= 0.2
  ORDER BY sim DESC, vec_id ASC LIMIT 10
),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS rank,
         h.vec_id, ROUND(h.sim, 4) AS sim4,
         CASE WHEN length(d.text) > 500 THEN substring(d.text, 1, 500) || '...'
              ELSE d.text END AS disp_text
  FROM hits h JOIN documents d ON h.vec_id = d.doc_id
)
SELECT rank,
       printf('--- Chunk %d ---
Chunk ID: %d
Similarity Score: %.4f
Text: %s
', rank, vec_id, sim4, disp_text) AS display
FROM ranked
"""


O_JOIN_ASOF = """
WITH probes AS (
  SELECT event_id, user_id AS o_custkey,
         TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (event_id % 2400) DAY AS t
  FROM events
),
q AS (
  SELECT o_custkey, o_orderdate AS t, o_orderkey, o_totalprice
  FROM orders
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1
)
SELECT p.event_id, p.o_custkey, strftime(p.t, '%Y-%m-%d %H:%M:%S') AS asof_ts,
       q.o_orderkey, ROUND(q.o_totalprice, 2) AS o_totalprice
FROM probes p ASOF LEFT JOIN q ON p.o_custkey = q.o_custkey AND p.t >= q.t
"""


O_JOIN_RANGE = """
SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS revenue
FROM lineitem l JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL '120 days'
GROUP BY l_returnflag
"""


O_AGG_CUBE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


O_AGG_ROLLUP = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


O_AGG_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


O_SET_INTERSECT = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
"""


O_SET_EXCEPT = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
"""


O_SET_OPS = """
SELECT 'intersect' AS branch, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
)
UNION ALL
SELECT 'except' AS branch, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
)
"""


O_AGG_MULTIDIM = """
SELECT 'cube' AS branch, l_returnflag AS k1, l_linestatus AS k2,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS metric
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'rollup' AS branch, o_orderpriority AS k1, o_orderstatus AS k2,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS metric
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
UNION ALL
SELECT 'gsets' AS branch, l_returnflag AS k1, l_linestatus AS k2,
       COUNT(*) AS n, CAST(NULL AS DOUBLE) AS metric
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


O_WIN_RANK_TOPN = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
FROM orders QUALIFY rank <= 3
"""


O_SRC_CONVERT_EPUB = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id,
         array_to_string(w[1:CAST(ceil(len(w) / 2.0) AS BIGINT)], ' ') AS ch1,
         array_to_string(w[CAST(ceil(len(w) / 2.0) AS BIGINT) + 1:len(w)], ' ') AS ch2
  FROM t
)
SELECT doc_id,
       '# Chapter 1' || chr(10) || chr(10) || ch1 || chr(10) || chr(10) ||
       '# Chapter 2' || chr(10) || chr(10) || ch2 AS markdown
FROM c
"""


def _o_mm_hexchain(prefix: str, n_bytes: str) -> str:
    return (
        f"array_to_string(list_transform(range(CAST(ceil(({n_bytes}) / 16.0) AS BIGINT)),"
        f" b -> md5('{prefix}:' || doc_id || ':' || b)), '')"
    )


O_MM_DECODE_IMAGE = f"""
WITH dims AS (
  SELECT doc_id, CAST(4 + doc_id % 8 AS INT) AS width,
         CAST(3 + doc_id % 5 AS INT) AS height
  FROM documents
),
px AS (
  SELECT doc_id, width, height,
         list_transform(range(width * height),
           i -> CAST(('0x' || substr({_o_mm_hexchain('img', 'width * height')},
                                     CAST(2 * i + 1 AS INT), 2))::UBIGINT AS INT)) AS p
  FROM dims
)
SELECT doc_id, width, height, CAST(len(p) AS INT) AS n_pixels,
       ROUND(list_avg(p), 4) AS mean_intensity,
       list_max(p) AS max_intensity, list_min(p) AS min_intensity
FROM px
"""


O_MM_AUDIO_FEATURES = f"""
WITH dims AS (
  SELECT doc_id, CAST(32 + (doc_id % 4) * 16 AS INT) AS n FROM documents
),
smp AS (
  SELECT doc_id, n,
         list_transform(range(n),
           i -> CAST(('0x' || substr({_o_mm_hexchain('aud', 'n')},
                                     CAST(2 * i + 1 AS INT), 2))::UBIGINT AS INT)) AS s
  FROM dims
)
SELECT doc_id, 16000 AS sample_rate, n AS n_samples,
       ROUND(list_avg(s), 4) AS mean_amp,
       ROUND(sqrt(list_avg(list_transform(s, x -> CAST(x AS DOUBLE) * x))), 4) AS rms
FROM smp
"""


O_MM_FRAME_SAMPLE = """
WITH v AS (SELECT doc_id, 2 + doc_id % 4 AS nf FROM documents)
SELECT doc_id, CAST(u.f AS INT) AS frame_no,
       md5('vid:' || doc_id || ':' || u.f) AS frame_hex
FROM v CROSS JOIN (SELECT unnest(range(6)) AS f) u
WHERE u.f < v.nf
"""


# The stride-2 resize over the same SPKM pixel grid: pixel i (0-based)
# sits at (row i//w, col i%w); the resized image keeps even rows/cols.
O_MM_RESIZE = f"""
WITH dims AS (
  SELECT doc_id, CAST(4 + doc_id % 8 AS INT) AS width,
         CAST(3 + doc_id % 5 AS INT) AS height
  FROM documents
),
px AS (
  SELECT doc_id, width, height,
         list_transform(range(width * height),
           i -> CAST(('0x' || substr({_o_mm_hexchain('img', 'width * height')},
                                     CAST(2 * i + 1 AS INT), 2))::UBIGINT AS INT)) AS p
  FROM dims
),
sampled AS (
  SELECT doc_id, width, height,
         list_filter(
           list_transform(range(width * height),
             i -> CASE WHEN (i // width) % 2 = 0 AND (i % width) % 2 = 0
                       THEN p[i + 1] END),
           x -> x IS NOT NULL) AS sp
  FROM px
)
SELECT doc_id,
       CAST((width + 1) // 2 AS INT) AS r_width,
       CAST((height + 1) // 2 AS INT) AS r_height,
       ROUND(list_avg(sp), 4) AS r_mean
FROM sampled
"""


# Composite row: the four modality pipelines as a branch-tagged sparse
# union (round-4 consolidation). The resize branch reuses the image
# columns for the resized dims/mean.
def _o_mm_phash(incremental: bool = False) -> str:
    """Perceptual block-mean-hash near-dup oracle (registry
    q_mm_phash_dedup, operators/multimodal.py fake_images_neardup →
    image_blockhash → phash_pairs): recompute every pixel of the
    planted 16×16 SPKM images from the md5-chain spec (the blobs are
    never parsed — the hex chain IS the payload), replay the 64
    integer block-mean bits into the two 32-bit fingerprint halves,
    band them 8×8, and verify candidates with the exact Hamming
    distance — mirroring the Spark operator stage for stage.

    ``incremental``: the q_mm_phash_incremental contract — the SAME
    full computation RESTRICTED to pairs touching the daily batch
    (doc_id % DEDUP_BATCH_MOD = 0), tagged batch_batch/cross: the
    index-served operator must lose nothing and add nothing vs a full
    re-fingerprint, exactly the O_DEDUP_INCREMENTAL argument."""
    # block k: by = k//8, bx = k%8; its four pixels (1-based list idx)
    def blk_sum(k: int) -> str:
        by, bx = divmod(k, 8)
        j1 = 32 * by + 2 * bx
        return f"(p[{j1 + 1}] + p[{j1 + 2}] + p[{j1 + 17}] + p[{j1 + 18}])"

    lo = " + ".join(
        f"(CASE WHEN 2 * {blk_sum(k)} > 1020 THEN {1 << k} ELSE 0 END)"
        for k in range(32)
    )
    hi = " + ".join(
        f"(CASE WHEN 2 * {blk_sum(k + 32)} > 1020 THEN {1 << k} ELSE 0 END)"
        for k in range(32)
    )
    mod = DEDUP_BATCH_MOD
    pair_kind = (
        f",\n       CASE WHEN id_a % {mod} = 0 AND id_b % {mod} = 0"
        f" THEN 'batch_batch' ELSE 'cross' END AS pair_kind"
        if incremental
        else ""
    )
    restrict = (
        f"\n  AND (id_a % {mod} = 0 OR id_b % {mod} = 0)" if incremental else ""
    )
    return f"""
WITH m AS (
  SELECT doc_id, doc_id % 25 AS g, doc_id // 25 AS rep
  FROM documents WHERE doc_id < 200
),
hx AS (
  SELECT doc_id,
         substr(base, 1, 128) || repeat('ff', rep * 2)
           || substr(base, 129 + rep * 4, 512) AS h
  FROM (
    SELECT doc_id, rep,
           array_to_string(list_transform(range(16),
             b -> md5('imgnd:' || CAST(g AS VARCHAR) || ':'
                      || CAST(b AS VARCHAR))), '') AS base
    FROM m
  )
),
px AS (
  SELECT doc_id,
         list_transform(range(256),
           j -> CAST(CAST('0x' || substr(h, 2 * j + 1, 2) AS UBIGINT)
                     AS BIGINT)) AS p
  FROM hx
),
fp AS (
  SELECT doc_id,
         CAST({lo} AS BIGINT) AS phash_lo,
         CAST({hi} AS BIGINT) AS phash_hi
  FROM px
),
banded AS (
  SELECT doc_id, phash_lo, phash_hi, band,
         CASE WHEN band < 4 THEN (phash_lo >> (band * 8)) & 255
              ELSE (phash_hi >> ((band - 4) * 8)) & 255 END AS key
  FROM fp, (SELECT unnest(range(8)) AS band) bs
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         a.phash_lo AS la, a.phash_hi AS ha,
         b2.phash_lo AS lb, b2.phash_hi AS hb
  FROM banded a
  JOIN banded b2 ON a.band = b2.band AND a.key = b2.key
                AND a.doc_id < b2.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS INT)
         AS hamming{pair_kind}
FROM cand
WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3{restrict}
"""


O_MM_PHASH_DEDUP = _o_mm_phash()
O_MM_PHASH_INCREMENTAL = _o_mm_phash(incremental=True)


O_MM_MEDIA = f"""
SELECT 'image' AS branch, doc_id, width, height, n_pixels, mean_intensity,
       max_intensity, min_intensity,
       CAST(NULL AS INTEGER) AS sample_rate, CAST(NULL AS INTEGER) AS n_samples,
       CAST(NULL AS DOUBLE) AS mean_amp, CAST(NULL AS DOUBLE) AS rms,
       CAST(NULL AS INTEGER) AS frame_no, CAST(NULL AS VARCHAR) AS frame_hex
FROM ({O_MM_DECODE_IMAGE})
UNION ALL
SELECT 'audio', doc_id, NULL, NULL, NULL, NULL, NULL, NULL,
       sample_rate, n_samples, mean_amp, rms, NULL, NULL
FROM ({O_MM_AUDIO_FEATURES})
UNION ALL
SELECT 'video', doc_id, NULL, NULL, NULL, NULL, NULL, NULL,
       NULL, NULL, NULL, NULL, frame_no, frame_hex
FROM ({O_MM_FRAME_SAMPLE})
UNION ALL
SELECT 'resize', doc_id, r_width, r_height, NULL, r_mean, NULL, NULL,
       NULL, NULL, NULL, NULL, NULL, NULL
FROM ({O_MM_RESIZE})
"""


O_STREAM_WINDOW_COUNTS = """
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


O_STREAM_SLIDING_COUNTS = """
WITH expanded AS (
  SELECT e.*,
         time_bucket(INTERVAL '5 minutes', e.ts) - u.k * INTERVAL '5 minutes' AS w_start
  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) u
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
FROM expanded GROUP BY 1, 2
"""


# Composite row: tumbling + sliding window aggregates, tagged by kind.
O_STREAM_WINDOWS = f"""
SELECT 'tumbling' AS kind, * FROM ({O_STREAM_WINDOW_COUNTS})
UNION ALL
SELECT 'sliding' AS kind, * FROM ({O_STREAM_SLIDING_COUNTS})
"""


O_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type FROM events
"""


# Batch replay of the REAL dropDuplicatesWithinWatermark drain
# (streaming/windows.py run_stream_dedup): with the 45-day delay no
# key's state evicts mid-drain, so each key emits exactly once, in the
# first ascending time-range micro-batch containing it — (key,
# MIN(batch_no)). batch_no classification by whole-second boundaries is
# nanos→micros-truncation-invariant, so scoring the ORIGINAL events
# table here matches the staged micro-files the stream reads.
O_STREAM_DEDUP_WATERMARK = """
SELECT user_id, event_type,
       MIN(CASE WHEN ts >= TIMESTAMP '2024-01-21' THEN 2
                WHEN ts >= TIMESTAMP '2024-01-11' THEN 1
                ELSE 0 END) AS batch_no
FROM events
GROUP BY user_id, event_type
"""


# Two tie/boundary semantics pinned here (both probed empirically and
# both invisible at small SF where (user_id, ts) never collides):
# - Spark's session_window MERGES an event at exactly prev_ts+gap
#   (diff <= gap merges; touching ranges coalesce), so the islands
#   predicate is strictly >.
# - Duplicate (user_id, ts) rows must all land in ONE session (their
#   per-event ranges are identical), so the cumulative-flag window uses
#   a RANGE frame: a ROWS frame orders ts-peers arbitrarily and can put
#   some duplicates before the peer that carries the new-session flag,
#   silently attaching them to the PREVIOUS session (found via a 1-row
#   mismatch on 10x-replicated events).
O_STREAM_SESSION_WINDOWS = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '5 minutes' OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
       user_id, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM sessions GROUP BY user_id, session_id
"""


_O_TOKS = "string_split(lower(text), ' ')"


def _o_lang_hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_O_TOKS}, t -> t IN ({lst})))"


_O_LANG_HITS = {
    lang: _o_lang_hits(words) for lang, words in sorted(textstats.LANG_PROFILES.items())
}


_O_LANG_GREATEST = "greatest(" + ", ".join(f"hits_{lang}" for lang in _O_LANG_HITS) + ")"


_O_LANG_CASE = " ".join(
    f"WHEN hits_{lang} = m THEN '{lang}'" for lang in sorted(_O_LANG_HITS)
)


O_TEXT_LANG_ID = f"""
WITH h AS (
  SELECT doc_id,
         {", ".join(f"{expr} AS hits_{lang}" for lang, expr in _O_LANG_HITS.items())}
  FROM documents
),
m AS (SELECT *, {_O_LANG_GREATEST} AS m FROM h)
SELECT doc_id, {", ".join(f"hits_{lang}" for lang in _O_LANG_HITS)},
       CASE WHEN m = 0 THEN 'unknown' {_O_LANG_CASE} ELSE 'unknown' END AS pred_lang
FROM m
"""


_O_STOP = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)


O_TEXT_QUALITY = f"""
WITH q AS (
  SELECT doc_id,
         text,
         length(text) AS n_chars,
         len({_O_TOKS}) AS n_tokens,
         len(list_filter({_O_TOKS}, t -> t IN ({_O_STOP}))) AS stop_hits,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS punct
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       ROUND(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       ROUND(CAST(punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
       ROUND(0.4 * least(n_tokens / 50.0, 1.0)
           + 0.3 * least(CAST(stop_hits AS DOUBLE) / n_tokens * 5.0, 1.0)
           + 0.3 * (1.0 - least(CAST(punct AS DOUBLE) / n_chars * 4.0, 1.0)), 6) AS quality,
       len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS bpe_tokens,
       CAST(ceil(length(text) / 4.0) AS INT) AS subword_estimate
FROM q
"""


_O_GOPHER_STOP = ", ".join(f"'{w}'" for w in textstats.GOPHER_STOPWORDS)


# Replays the registry row's deterministic augmentation (doc_id % 7
# lanes making each rule demonstrably fire), then the integer
# cross-multiplied Gopher verdicts — no float division anywhere, so
# every count and flag is bit-identical.
O_TEXT_GOPHER_QUALITY = f"""
WITH aug AS (
  SELECT doc_id,
         CASE doc_id % 7
           WHEN 0 THEN text || ' ' || repeat('# ', 11) || '#'
           WHEN 1 THEN text || repeat(chr(10) || '- item', 10)
           WHEN 2 THEN text || repeat(chr(10) || 'wait for it...', 4)
           WHEN 3 THEN text || repeat(' 12345', 30)
           WHEN 4 THEN text || repeat(' abcdefghijklmnopqrstuvwxyz', 40)
           WHEN 5 THEN text || ' to be of and that'
           ELSE text END AS text
  FROM documents
),
t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS w,
         string_split(text, chr(10)) AS ln
  FROM aug
),
c AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT)
           AS word_chars,
         CAST(len(regexp_extract_all(text, '#'))
            + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS sym_hits,
         CAST(len(ln) AS BIGINT) AS n_lines,
         CAST(len(list_filter(ln, l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT)
           AS bullet_lines,
         CAST(len(list_filter(ln, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS BIGINT)
           AS ellipsis_lines,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
           AS alpha_words,
         CAST(len(list_filter([{_O_GOPHER_STOP}], s -> list_contains(w, s))) AS BIGINT)
           AS stop_hits
  FROM t
),
f AS (
  SELECT *,
         (n_words >= {textstats.GOPHER_MIN_WORDS}
          AND n_words <= {textstats.GOPHER_MAX_WORDS}) AS ok_words,
         (word_chars >= 3 * n_words AND word_chars <= 10 * n_words) AS ok_mean_len,
         (10 * sym_hits <= n_words) AS ok_symbol,
         (10 * bullet_lines <= 9 * n_lines) AS ok_bullet,
         (10 * ellipsis_lines <= 3 * n_lines) AS ok_ellipsis,
         (5 * alpha_words >= 4 * n_words) AS ok_alpha,
         (stop_hits >= 2) AS ok_stop
  FROM c
)
SELECT doc_id, n_words, word_chars, sym_hits, n_lines, bullet_lines,
       ellipsis_lines, alpha_words, stop_hits,
       ok_words, ok_mean_len, ok_symbol, ok_bullet, ok_ellipsis, ok_alpha,
       ok_stop,
       (ok_words AND ok_mean_len AND ok_symbol AND ok_bullet AND ok_ellipsis
        AND ok_alpha AND ok_stop) AS keep
FROM f
"""


O_TEXT_REPETITION = f"""
WITH t AS (
  SELECT doc_id, {_O_TOKS} AS w, string_split(text, chr(10)) AS ln
  FROM documents
),
g AS (
  SELECT doc_id, w, ln,
         CASE WHEN len(w) >= 2
              THEN list_transform(range(len(w) - 1), i -> w[i + 1] || ' ' || w[i + 2])
              ELSE CAST([] AS VARCHAR[]) END AS g2,
         CASE WHEN len(w) >= 3
              THEN list_transform(range(len(w) - 2),
                                  i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3])
              ELSE CAST([] AS VARCHAR[]) END AS g3
  FROM t
),
f AS (
  SELECT doc_id,
         CAST(len(w)  - len(list_distinct(w))  AS DOUBLE) / greatest(len(w),  1) AS u,
         CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / greatest(len(g2), 1) AS b,
         CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / greatest(len(g3), 1) AS tr,
         CAST(len(ln) - len(list_distinct(ln)) AS DOUBLE) / greatest(len(ln), 1) AS l
  FROM g
)
SELECT doc_id,
       ROUND(u, 6) AS dup_unigram_frac,
       ROUND(b, 6) AS dup_bigram_frac,
       ROUND(tr, 6) AS dup_trigram_frac,
       ROUND(l, 6) AS dup_line_frac,
       (u > 0.3 OR b > 0.2 OR l > 0.3) AS flagged
FROM f
"""


O_TEXT_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({_O_TOKS},
             w -> CAST(('0x' || substr(md5(w), 1, 8))::UBIGINT AS BIGINT))),
         (acc, x) -> (acc * {textstats.FINGERPRINT_MULT} + x) % {textstats.FINGERPRINT_P}
       ) AS fingerprint
FROM documents
"""


O_CHUNK_DOCLING = f"""
WITH t AS (SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, lang, source, n_chars,
       unnest(list_transform(range(CAST(ceil(len(w) / {_CHUNK_TOKENS}.0) AS BIGINT)),
         i -> {{'chunk_number': CAST(i AS INT),
               'chunk_text': array_to_string(w[i * {_CHUNK_TOKENS} + 1:i * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}], ' ')}}),
         recursive := true)
FROM t
"""


O_CHUNK_ENRICH = f"""
WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id, lang, source,
         unnest(list_transform(range(CAST(ceil(len(w) / {_CHUNK_TOKENS}.0) AS BIGINT)),
           i -> {{'chunk_number': CAST(i AS INT),
                 'chunk_text': array_to_string(w[i * {_CHUNK_TOKENS} + 1:i * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}], ' ')}}),
           recursive := true)
  FROM t
)
SELECT doc_id, chunk_number, chunk_text,
       '{chunk_ops.DEFAULT_TOKENIZER_MODEL}' AS chunk_tokenizer_model,
       {_CHUNK_TOKENS} AS chunk_size,
       '{chunk_ops.FIXED_IMPORT_DATE}' AS import_date,
       '{{"lang":"' || lang || '","source":"' || source ||
       '","chunk_tokenizer_model":"{chunk_ops.DEFAULT_TOKENIZER_MODEL}"' ||
       ',"chunk_size":"{_CHUNK_TOKENS}","chunk_number":"' || chunk_number ||
       '","import_date":"{chunk_ops.FIXED_IMPORT_DATE}"}}' AS metadata_json
FROM c
"""


O_WIN_CHUNK_NUMBER = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id,
         CAST(unnest(range(CAST(ceil(len(w) / {_CHUNK_TOKENS}.0) AS BIGINT))) AS INT) AS i
  FROM t
)
SELECT doc_id, i AS chunk_number, i * {_CHUNK_TOKENS} AS token_offset,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i * {_CHUNK_TOKENS}) - 1 AS INT) AS chunk_number_w,
       COUNT(*) OVER (PARTITION BY doc_id) AS n_chunks
FROM c
"""


# Piece costs come from the committed golden table (tools/train_bpe.py
# materializes token counts under golden/bpe_merges.txt — DuckDB cannot
# run the BPE merge loop itself). The golden covers every distinct piece
# of the sf0.001/0.01/0.1 corpora, so the inner join is total at every
# driver SF. The pretrained variant differs ONLY in its cost table
# (golden/bpe_pretrained_piece_costs.parquet — 10k merges trained on an
# open synthetic corpus by tools/train_bpe_pretrained.py, the
# HF-pretrained-tokenizer contract of reference src/lib/documents.py).
def _o_chunk_bpe(cost_parquet: str) -> str:
    return rf"""
WITH p AS (
  SELECT doc_id, regexp_extract_all(text, '\w+|[^\w\s]') AS ps FROM documents
),
e0 AS (
  SELECT doc_id,
         unnest(list_transform(range(len(ps)),
           i -> {{'pos': CAST(i AS INT), 'piece': ps[i + 1]}}),
           recursive := true)
  FROM p
),
e AS (
  SELECT e0.doc_id, e0.pos, e0.piece, g.cost
  FROM e0 JOIN read_parquet('/root/repo/golden/{cost_parquet}') g
    ON e0.piece = g.piece
),
c AS (
  SELECT doc_id, pos, piece, cost,
         SUM(cost) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM e
)
SELECT doc_id,
       CAST(FLOOR((cum - cost) / {_BPE_CHUNK_TOKENS}.0) AS INT) AS chunk_number,
       COUNT(*) AS n_pieces,
       CAST(SUM(cost) AS BIGINT) AS n_bpe_tokens,
       string_agg(piece, ' ' ORDER BY pos) AS chunk_text
FROM c
GROUP BY doc_id, CAST(FLOOR((cum - cost) / {_BPE_CHUNK_TOKENS}.0) AS INT)
"""


O_CHUNK_BPE = _o_chunk_bpe("bpe_piece_costs.parquet")
O_CHUNK_BPE_PRETRAINED = _o_chunk_bpe("bpe_pretrained_piece_costs.parquet")


O_VEC_IVF_TOPK = f"""
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS ({_ORACLE_QVEC}),
assign AS (
  SELECT e.vec_id,
         arg_max(c.cid, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)) AS cluster
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id
),
topc AS (
  SELECT c.cid FROM c, q
  ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid ASC LIMIT 4
),
cand AS (SELECT a.vec_id FROM assign a JOIN topc t ON a.cluster = t.cid),
scored AS (
  SELECT cd.vec_id, {_ORACLE_SIM} AS sim
  FROM cand cd JOIN embeddings e ON cd.vec_id = e.vec_id, q
)
SELECT vec_id, ROUND(sim, 6) AS similarity_score,
       CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


_KM_DIM = 64


_KM_CAND = 32  # k=4 × oversample=8


def _o_km_assign(centroid_cte: str) -> str:
    """DuckDB fragment: assign every vector to its argmax-cosine centroid
    from ``centroid_cte`` (cid, v), ties to the lowest cid — mirrors
    assign_clusters' max_by(cid, struct(_sim, -cid))."""
    return f"""
  SELECT e.vec_id,
         first(c.cid ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.v) DESC,
                              c.cid ASC) AS cluster
  FROM embeddings e CROSS JOIN {centroid_cte} c GROUP BY e.vec_id"""


def _o_km_means(assign_cte: str, prev_cte: str) -> str:
    """DuckDB fragment: per-cluster element-wise mean rounded to 6dp,
    empty clusters keeping the previous centroid."""
    return f"""
  SELECT p.cid, COALESCE(m.v, p.v) AS v FROM {prev_cte} p LEFT JOIN (
    SELECT cluster AS cid, list(m ORDER BY pos) AS v FROM (
      SELECT a.cluster, u.i AS pos,
             ROUND(AVG(CAST(e.embedding[u.i + 1] AS DOUBLE)), 6) AS m
      FROM {assign_cte} a JOIN embeddings e USING (vec_id)
      CROSS JOIN (SELECT unnest(range({_KM_DIM})) AS i) u
      GROUP BY a.cluster, u.i
    ) GROUP BY cluster
  ) m ON p.cid = m.cid"""


# The full unrolled Lloyd chain (hash-ordered candidate sample → 3
# greedy max-min seed CTEs → two assign+mean rounds → final assignment
# a3 against the trained centroids c2), shared by the cluster_kmeans row
# and the trained-quantizer IVF row so the training replay cannot
# diverge between them.
_O_KM_CHAIN = f"""cand AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS pos
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT {_KM_CAND}
),
s0 AS (SELECT v FROM cand WHERE pos = 1),
m1 AS (SELECT c.pos, c.v, list_cosine_similarity(c.v, s0.v) AS ms FROM cand c, s0),
s1 AS (SELECT v FROM m1 ORDER BY ms ASC, pos ASC LIMIT 1),
m2 AS (SELECT m1.pos, m1.v, greatest(m1.ms, list_cosine_similarity(m1.v, s1.v)) AS ms
       FROM m1, s1),
s2 AS (SELECT v FROM m2 ORDER BY ms ASC, pos ASC LIMIT 1),
m3 AS (SELECT m2.pos, m2.v, greatest(m2.ms, list_cosine_similarity(m2.v, s2.v)) AS ms
       FROM m2, s2),
s3 AS (SELECT v FROM m3 ORDER BY ms ASC, pos ASC LIMIT 1),
c0 AS (
  SELECT 0 AS cid, v FROM s0 UNION ALL SELECT 1, v FROM s1
  UNION ALL SELECT 2, v FROM s2 UNION ALL SELECT 3, v FROM s3
),
a1 AS ({_o_km_assign('c0')}),
c1 AS ({_o_km_means('a1', 'c0')}),
a2 AS ({_o_km_assign('c1')}),
c2 AS ({_o_km_means('a2', 'c1')}),
a3 AS ({_o_km_assign('c2')})"""


O_CLUSTER_KMEANS = f"""
WITH {_O_KM_CHAIN}
SELECT vec_id, cluster FROM a3
"""


# Trained-coarse-quantizer IVF (registry q_vec_ivf_trained): the SAME
# unrolled Lloyd chain produces the serving centroids (c2, 6dp-quantized
# per iteration so both engines see identical doubles) and the cell
# assignment (a3); the probe then ranks cells against the query vector,
# keeps nprobe=2 of k=4, and exact-re-ranks the members — the
# production IVF lifecycle (train → assign at ingest → prune at serve)
# end to end in one oracle.
O_VEC_IVF_TRAINED = f"""
WITH {_O_KM_CHAIN},
q AS ({_ORACLE_QVEC}),
topc AS (
  SELECT c.cid FROM c2 c, q
  ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.cid ASC LIMIT 2
),
candv AS (SELECT a.vec_id FROM a3 a JOIN topc t ON a.cluster = t.cid),
scored AS (
  SELECT cd.vec_id, {_ORACLE_SIM} AS sim
  FROM candv cd JOIN embeddings e ON cd.vec_id = e.vec_id, q
)
SELECT vec_id, ROUND(sim, 6) AS similarity_score,
       CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


O_DEDUP_EXACT = """
SELECT sha256(text) AS text_sha, MIN(doc_id) AS keeper_id,
       COUNT(*) AS dup_count
FROM documents GROUP BY sha256(text)
"""


_O_SHINGLES = f"""
sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split(lower(text), ' ')) < {dedup_ops.SHINGLE_K}
              THEN [lower(text)]
              ELSE list_distinct(list_transform(
                range(len(string_split(lower(text), ' ')) - {dedup_ops.SHINGLE_K - 1}),
                i -> array_to_string((string_split(lower(text), ' '))[i + 1:i + {dedup_ops.SHINGLE_K}], ' ')
              )) END AS shingles
  FROM documents
)"""


_O_BASE = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


_O_MINHASH = f"""
bases AS (
  SELECT doc_id,
         list_transform(shingles, s -> {_O_BASE.format(s='s')}) AS bs
  FROM sh
),
mh AS (
  SELECT doc_id,
         [{", ".join(f"list_min(list_transform(bs, x -> ({a} * x + {b}) % {dedup_ops.MINHASH_P}))" for a, b in zip(dedup_ops.MINHASH_A, dedup_ops.MINHASH_B))}] AS minhash
  FROM bases
)"""


_O_BANDS_N = dedup_ops.NUM_HASHES // dedup_ops.BAND_R


O_DEDUP_MINHASH_PAIRS = f"""
WITH {_O_SHINGLES},
{_O_MINHASH},
bands AS (
  SELECT doc_id, u.i AS band,
         CAST(minhash[2 * u.i + 1] AS VARCHAR) || '_' ||
         CAST(minhash[2 * u.i + 2] AS VARCHAR) AS key
  FROM mh CROSS JOIN (SELECT unnest(range({_O_BANDS_N})) AS i) u
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cand c
JOIN sh sa ON c.id_a = sa.doc_id
JOIN sh sb ON c.id_b = sb.doc_id
"""


# URL-canonicalization dedup (registry q_dedup_url, operators/dedup.py
# url_canonicalize/dedup_url): the testdata has no URL column, so the
# row synthesizes one deterministically from c_custkey (the
# join_edit_distance word-wheel precedent) — every div-4 block of keys
# emits the SAME canonical URL as four raw variants (scheme / www. /
# trailing slash / utm query, one of eight fully uppercased). Both
# engines synthesize and canonicalize with identical string ops.
O_DEDUP_URL = """
WITH raw AS (
  SELECT c_custkey AS doc_id,
         CASE WHEN c_custkey % 8 = 5 THEN upper(u) ELSE u END AS url
  FROM (
    SELECT c_custkey,
      (CASE WHEN c_custkey % 2 = 0 THEN 'https://' ELSE 'http://' END)
      || (CASE WHEN c_custkey % 4 = 1 THEN 'www.' ELSE '' END)
      || 'shop' || CAST((c_custkey // 4) % 100 AS VARCHAR) || '.example.com'
      || '/p/' || CAST((c_custkey // 4) // 100 AS VARCHAR)
      || (CASE WHEN c_custkey % 4 = 2 THEN '/' ELSE '' END)
      || (CASE WHEN c_custkey % 8 = 6
               THEN '#sec' || CAST(c_custkey % 5 AS VARCHAR)
               ELSE '' END)
      || (CASE WHEN c_custkey % 8 = 3
               THEN '?page=' || CAST(c_custkey % 3 AS VARCHAR)
                    || '&utm_source=feed&utm_campaign=c'
                    || CAST(c_custkey % 9 AS VARCHAR)
               WHEN c_custkey % 8 = 7
               THEN '?utm_source=feed&utm_campaign=c'
                    || CAST(c_custkey % 9 AS VARCHAR)
               ELSE '' END) AS u
    FROM customer
  )
),
-- lowercase -> strip scheme/www -> strip fragment -> remove ONLY
-- tracking params AT A [?&] BOUNDARY (ADVICE r9: the unanchored form
-- matched names embedded in longer params; two passes mirror
-- dedup.py's TRACKING_AMP_RE/TRACKING_QMARK_RE — 'g': replace-all) ->
-- clean a dangling '?'/'&'
canon0 AS (
  SELECT doc_id, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               split_part(
                 regexp_replace(
                   regexp_replace(lower(url), '^https?://', ''),
                   '^www\\.', ''),
                 '#', 1),
               '&(utm_[a-z0-9]+|fbclid|gclid)=[^&]*', '', 'g'),
             '\\?(utm_[a-z0-9]+|fbclid|gclid)=[^&]*&?', '?', 'g'),
           '[?&]+$', '') AS c
  FROM raw
),
canon AS (
  SELECT doc_id, url,
         regexp_replace(split_part(c, '?', 1), '/+$', '')
         || (CASE WHEN strpos(c, '?') > 0
                  THEN '?' || split_part(c, '?', 2) ELSE '' END)
           AS canon_url
  FROM canon0
)
SELECT canon_url, COUNT(*) AS n_raw,
       COUNT(DISTINCT url) AS n_distinct_raw,
       MIN(doc_id) AS keeper_id
FROM canon GROUP BY canon_url
"""


# Incremental near-dup pairs (registry q_dedup_incremental, operators/
# dedup.py minhash_pairs_incremental): the operator computes ONLY
# batch-touching pairs (batch = doc_id % DEDUP_BATCH_MOD = 0, corpus =
# the rest); because signatures and bands are per-document, that set is
# EXACTLY the full minhash_pairs output restricted to pairs with a
# batch member — so the oracle replays the full computation and applies
# the restriction, proving both the pairs and the never-corpus×corpus
# contract (pair_kind).
O_DEDUP_INCREMENTAL = f"""
WITH pairs AS MATERIALIZED ({O_DEDUP_MINHASH_PAIRS})
SELECT id_a, id_b, jaccard,
       CASE WHEN id_a % {DEDUP_BATCH_MOD} = 0 AND id_b % {DEDUP_BATCH_MOD} = 0
            THEN 'batch_batch' ELSE 'cross' END AS pair_kind
FROM pairs
WHERE id_a % {DEDUP_BATCH_MOD} = 0 OR id_b % {DEDUP_BATCH_MOD} = 0
"""


# Corpus band index summary (registry q_dedup_index_write →
# operators/dedup.py band_index_write + band_index_append): the Spark
# side writes the index as CORPUS rows (doc_id % MOD != 0) then APPENDS
# the batch (doc_id % MOD = 0) and summarizes the read-back layout; the
# oracle bands the FULL documents table in one shot — a green row
# therefore proves write + append ≡ full re-band (banding is a pure
# per-document function; the ivf_append argument), not merely that some
# parquet landed on disk.
O_DEDUP_INDEX = f"""
WITH {_O_SHINGLES},
{_O_MINHASH},
bands AS (
  SELECT doc_id, u.i AS band,
         CAST(minhash[2 * u.i + 1] AS VARCHAR) || '_' ||
         CAST(minhash[2 * u.i + 2] AS VARCHAR) AS key
  FROM mh CROSS JOIN (SELECT unnest(range({_O_BANDS_N})) AS i) u
),
bk AS (
  SELECT band, key, COUNT(*) AS n_docs FROM bands GROUP BY band, key
)
SELECT band, CAST(SUM(n_docs) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys,
       COUNT(*) FILTER (WHERE n_docs >= 2) AS n_multi
FROM bk GROUP BY band
"""


# Pairs → keeper assignment: connected components of the minhash pair
# graph. The recursive walk collects every label reachable over the
# symmetric edge set; MIN over reachable labels (plus the node's own id)
# is the component minimum — identical to min-label propagation at its
# fixed point (operators/dedup.py dedup_assign). Three replica-scale
# bounds (VERDICT r5 #6, measured 1297 s → 20 s at 30×):
# - ``pairs`` is MATERIALIZED: DuckDB 1.0 inlines CTEs per reference,
#   and ``edges`` reads pairs twice — without the hint the whole
#   minhash + 2.4M-pair jaccard replay runs TWICE;
# - the recursion seeds from EDGE VERTICES only — an isolated document
#   is trivially its own keeper via the outer LEFT JOIN;
# - the recursive step propagates the grouped MIN per node instead of
#   every reachable label: on replica corpora components are
#   near-complete graphs, and enumerating all (node, label) pairs costs
#   |component|² rows × degree joins per iteration, while min-label
#   propagation converges to the same fixed point (same invariant as
#   the Spark operator's pointer-doubling) touching one row per node
#   per improvement.
O_DEDUP_ASSIGN = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({O_DEDUP_MINHASH_PAIRS}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
verts AS (SELECT DISTINCT src AS id FROM edges),
walk(id, lbl) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.src, MIN(w.lbl) FROM edges e JOIN walk w ON w.id = e.dst
  GROUP BY e.src
),
comp AS (SELECT id, MIN(lbl) AS k FROM walk GROUP BY id)
SELECT d.doc_id AS id,
       COALESCE(c.k, d.doc_id) AS keeper_id,
       COALESCE(c.k, d.doc_id) = d.doc_id AS is_keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
"""


# SemDeDup replay (operators/dedup.py semdedup): the 16-seed argmax-cosine
# assignment (byte-identical convention to O_VEC_IVF_TOPK's assign CTE,
# ties to the lowest cid), brute-force within-cluster pairwise cosine at τ
# (the Spark side's BLAS matmul candidates must match this EXACT set —
# row parity proves the cluster-bounded enumeration lost no pair), the
# bounded grouped-min CC recursion (the curate_fuzzy convention), then the
# SemDeDup keep rule: per component, keeper = min (ROUND(cent_cos,6), id)
# — both engines rank on the identical rounded double (keyword_tfidf
# convention).
O_DEDUP_SEMANTIC = f"""
WITH RECURSIVE c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
assign AS MATERIALIZED (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
         first(c.cid ORDER BY
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC,
               c.cid ASC) AS cluster,
         max(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)) AS cent_cos
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id, v
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {dedup_ops.SEMDEDUP_TAU}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
verts AS (SELECT DISTINCT src AS id FROM edges),
walk(id, lbl) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e2.src, MIN(w.lbl) FROM edges e2 JOIN walk w ON w.id = e2.dst
  GROUP BY e2.src
),
comp AS (SELECT id, MIN(lbl) AS comp_id FROM walk GROUP BY id),
labeled AS (
  SELECT a.vec_id, a.cluster, ROUND(a.cent_cos, 6) AS cent_cos,
         COALESCE(cm.comp_id, a.vec_id) AS component
  FROM assign a LEFT JOIN comp cm ON a.vec_id = cm.id
),
keep AS (
  SELECT component, first(vec_id ORDER BY cent_cos ASC, vec_id ASC) AS keeper_id
  FROM labeled GROUP BY component
)
SELECT l.vec_id, l.cluster, l.component, k.keeper_id,
       l.vec_id = k.keeper_id AS is_keeper, l.cent_cos
FROM labeled l JOIN keep k USING (component)
"""


# Stream-stream join replay (streaming/joins.py): with disjoint
# ascending time-range batches and delay > band, the drained APPEND
# result of the watermarked inner join equals the BATCH band join —
# eviction can never outrun a partner that arrives at most `band` later
# (the module docstring carries the argument). lag is floor-seconds of
# each timestamp subtracted (Spark unix_timestamp semantics) — BIGINT.
# Sessionized-funnel state machine replay (registry
# q_stream_stateful_funnel, streaming/stateful.py funnel_sessions): one
# row per user about the user's FIRST click — 'converted' with the first
# purchase strictly after it in (ts, event_id) order and within 24 h, or
# 'expired' when the final watermark strictly passed the click's window
# (wm = ms-truncated max event time − 1 day delay, the availableNow
# trailing-batch value; eviction is t < wm STRICTLY — a timeout at
# exactly wm stays in state, boundary probed in tests/test_streaming.py).
# Pending funnels and clickless users emit nothing.
O_STREAM_STATEFUL_FUNNEL = """
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
  FROM events WHERE event_type IN ('click', 'purchase')
),
a AS (
  SELECT user_id, event_id AS a_id, ts AS a_ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM ev WHERE event_type = 'click'
),
first_a AS (SELECT user_id, a_id, a_ts FROM a WHERE rn = 1),
conv AS (
  SELECT f.user_id, f.a_id, b.event_id AS b_id,
         (epoch_us(b.ts) - epoch_us(f.a_ts)) // 1000000 AS lag_seconds,
         ROW_NUMBER() OVER (PARTITION BY f.user_id ORDER BY b.ts, b.event_id)
           AS rn
  FROM first_a f
  JOIN ev b ON b.user_id = f.user_id AND b.event_type = 'purchase'
   AND (b.ts > f.a_ts OR (b.ts = f.a_ts AND b.event_id > f.a_id))
   AND b.ts <= f.a_ts + INTERVAL 24 HOURS
),
converted AS (
  SELECT user_id, a_id, b_id, 'converted' AS outcome, lag_seconds
  FROM conv WHERE rn = 1
),
wm AS (SELECT epoch_ms(max(ts)) - 86400000 AS wm_ms FROM ev),
expired AS (
  SELECT f.user_id, f.a_id, CAST(NULL AS BIGINT) AS b_id,
         'expired' AS outcome, CAST(NULL AS BIGINT) AS lag_seconds
  FROM first_a f, wm
  WHERE f.user_id NOT IN (SELECT user_id FROM converted)
    AND epoch_ms(f.a_ts) + 86400000 < wm.wm_ms
)
SELECT user_id, a_id, b_id, outcome, lag_seconds FROM converted
UNION ALL
SELECT user_id, a_id, b_id, outcome, lag_seconds FROM expired
"""


O_STREAM_JOIN = """
SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
       CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS lag_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
WHERE a.event_type = 'error' AND b.event_type = 'purchase'
"""


# Left-outer stream-stream replay: matched pairs (the inner contract)
# UNION the unmatched lefts whose band end the final watermark passed
# STRICTLY — wm = min(per-side ms-truncated max event time) − delay,
# computed by availableNow's trailing no-data batch; a left row at
# exactly wm − band stays in state (empirically probed boundary).
O_STREAM_JOIN_OUTER = """
WITH m AS (
  SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
         CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS lag_seconds
  FROM events a JOIN events b
    ON a.user_id = b.user_id
   AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
  WHERE a.event_type = 'error' AND b.event_type = 'purchase'
),
wm AS (
  SELECT least(
    (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'error'),
    (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'purchase')
  ) - 86400000 AS wm_ms
),
unm AS (
  SELECT a.event_id AS a_id, CAST(NULL AS BIGINT) AS b_id, a.user_id,
         CAST(NULL AS BIGINT) AS lag_seconds
  FROM events a, wm
  WHERE a.event_type = 'error'
    AND NOT EXISTS (
      SELECT 1 FROM events b
      WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
        AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
    )
    AND epoch_ms(a.ts) + 7200000 < wm.wm_ms
)
SELECT * FROM m UNION ALL SELECT * FROM unm
"""


# Right-outer stream-stream replay — the symmetric pin: unmatched RIGHT
# rows emit null-extended iff b.ts < wm STRICTLY (a right row at exactly
# wm stays in state — probed; future lefts with a.ts <= b.ts would be
# late once wm passes b.ts, so eviction keys on b.ts itself).
O_STREAM_JOIN_RIGHT = """
WITH m AS (
  SELECT a.event_id AS a_id, b.event_id AS b_id, b.user_id,
         CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS lag_seconds
  FROM events a JOIN events b
    ON a.user_id = b.user_id
   AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
  WHERE a.event_type = 'error' AND b.event_type = 'purchase'
),
wm AS (
  SELECT least(
    (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'error'),
    (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'purchase')
  ) - 86400000 AS wm_ms
),
unm AS (
  SELECT CAST(NULL AS BIGINT) AS a_id, b.event_id AS b_id, b.user_id,
         CAST(NULL AS BIGINT) AS lag_seconds
  FROM events b, wm
  WHERE b.event_type = 'purchase'
    AND NOT EXISTS (
      SELECT 1 FROM events a
      WHERE a.event_type = 'error' AND a.user_id = b.user_id
        AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
    )
    AND epoch_ms(b.ts) < wm.wm_ms
)
SELECT * FROM m UNION ALL SELECT * FROM unm
"""


# Full-outer stream-stream replay: the three-way UNION of the two
# independently pinned contracts — matched pairs, strict left predicate
# (a.ts + band < wm), strict right predicate (b.ts < wm).
O_STREAM_JOIN_FULL = """
WITH wm AS (
  SELECT least(
    (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'error'),
    (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'purchase')
  ) - 86400000 AS wm_ms
)
SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
       CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS lag_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
WHERE a.event_type = 'error' AND b.event_type = 'purchase'
UNION ALL
SELECT a.event_id, CAST(NULL AS BIGINT), a.user_id, CAST(NULL AS BIGINT)
FROM events a, wm
WHERE a.event_type = 'error'
  AND NOT EXISTS (
    SELECT 1 FROM events b
    WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
  )
  AND epoch_ms(a.ts) + 7200000 < wm.wm_ms
UNION ALL
SELECT CAST(NULL AS BIGINT), b.event_id, b.user_id, CAST(NULL AS BIGINT)
FROM events b, wm
WHERE b.event_type = 'purchase'
  AND NOT EXISTS (
    SELECT 1 FROM events a
    WHERE a.event_type = 'error' AND a.user_id = b.user_id
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
  )
  AND epoch_ms(b.ts) < wm.wm_ms
"""


# Stream-static enrichment replay: stateless per-batch broadcast join —
# the drained stream equals the batch join by construction.
O_STREAM_STATIC_JOIN = """
SELECT e.event_id, e.user_id, c.c_mktsegment, n.n_name AS nation
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE e.event_type = 'purchase'
"""


# Model-based quality filter replay (operators/curation.py
# quality_model_score): unigram+bigram features with 0-based positions
# (unigrams 0..n-1, bigrams n..2n-2 — the Spark side's order), joined to
# the golden weight table by TERM STRING (Spark joins xxhash64 of the
# same strings — the hash-match doubles as a collision check, the
# decontaminate convention), matched weights summed by the ORDERED
# position fold (list_sum over list(... ORDER BY pos) — serial
# left-to-right, the same addend order as Spark's aggregate(array_sort(
# collect_list))), z = bias + wsum/n_feats bit-identical across engines.
O_TEXT_QUALITY_MODEL = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
feats AS (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, t[u.i] AS term
  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
  UNION ALL
  SELECT doc_id, CAST(len(t) + u.i - 1 AS INT) AS pos,
         t[u.i] || ' ' || t[u.i + 1] AS term
  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t))) AS i) u
),
m AS (
  SELECT f.doc_id, f.pos, g.weight
  FROM feats f
  JOIN read_parquet('/root/repo/golden/quality_model.parquet') g USING (term)
),
s AS (
  SELECT doc_id, list_sum(list(weight ORDER BY pos)) AS wsum
  FROM m GROUP BY doc_id
),
meta AS (
  SELECT bias FROM read_parquet('/root/repo/golden/quality_model_meta.parquet')
),
base AS (
  SELECT doc_id, CAST(2 * len(t) - 1 AS INT) AS n_feats FROM toks
)
SELECT b.doc_id, b.n_feats,
       ROUND(1.0 / (1.0 + EXP(-(meta.bias + COALESCE(s.wsum, 0.0) / b.n_feats))), 6)
         AS score,
       (meta.bias + COALESCE(s.wsum, 0.0) / b.n_feats) >= 0 AS keep
FROM base b LEFT JOIN s USING (doc_id) CROSS JOIN meta
"""


# Streaming ingest replay: three micro-batches (event_id % 3, processed
# in batch order), each applying the write-path upsert — within-batch
# first-event-wins dedup (batch_order = event_id), novel-keys-only across
# batches, ids = max(id so far) + row_number over user_id ASC NULLS FIRST
# per batch ≡ one global row_number over (batch, user_id).
O_STREAM_INGEST = """
WITH tagged AS (
  SELECT event_id % 3 AS b, event_id, user_id, event_type, ROUND(value, 6) AS value
  FROM events
),
batch_winner AS (
  SELECT * FROM (
    SELECT t.*, ROW_NUMBER() OVER (PARTITION BY b, user_id
                                   ORDER BY event_id ASC NULLS FIRST) AS rn
    FROM tagged t
  ) WHERE rn = 1
),
first_batch AS (
  SELECT * FROM (
    SELECT w.*, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY b ASC) AS rn2
    FROM batch_winner w
  ) WHERE rn2 = 1
)
SELECT ROW_NUMBER() OVER (ORDER BY b ASC, user_id ASC NULLS FIRST) AS id,
       event_id, user_id, event_type, value
FROM first_batch
"""


_O_SIMHASH_SUMS = ",\n         ".join(
    f"SUM(CASE WHEN (h & {1 << j}) <> 0 THEN 1 ELSE -1 END) AS v_{j}"
    for j in range(dedup_ops.SIMHASH_BITS)
)


_O_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(dedup_ops.SIMHASH_BITS)
)


O_DEDUP_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
hashed AS (SELECT doc_id, {_O_BASE.format(s='tok')} AS h FROM toks),
v AS (
  SELECT doc_id,
         {_O_SIMHASH_SUMS}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({_O_SIMHASH_BITS} AS BIGINT) AS simhash FROM v
"""


O_DEDUP_EMBEDDING = f"""
WITH {_ORACLE_ANN_COMMON},
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM vsig a JOIN vsig b
    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
),
scored AS (
  SELECT pr.id_a, pr.id_b,
         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                CAST(eb.embedding AS DOUBLE[])) AS cosine
  FROM pairs pr
  JOIN embeddings ea ON pr.id_a = ea.vec_id
  JOIN embeddings eb ON pr.id_b = eb.vec_id
)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM scored WHERE cosine >= 0.25
"""


O_VEC_ANN_JOIN = f"""
WITH {_ORACLE_ANN_COMMON},
probes AS (
  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
  FROM embeddings WHERE vec_id < 20
),
psig AS (
  SELECT pr.probe_id, p.t,
         SUM(CASE WHEN list_dot_product(pr.pv, p.plane) >= 0
             THEN (1 << p.j) ELSE 0 END) AS sig
  FROM probes pr CROSS JOIN p GROUP BY pr.probe_id, p.t
),
pbuckets AS (
  SELECT probe_id, t, sig FROM psig
  UNION ALL
  SELECT psig.probe_id, psig.t, xor(psig.sig, CAST(1 << p.j AS BIGINT))
  FROM psig JOIN p ON p.t = psig.t
),
cand AS (
  SELECT DISTINCT b.probe_id, v.vec_id
  FROM vsig v JOIN pbuckets b ON v.t = b.t AND v.sig = b.sig
),
scored AS (
  SELECT c.probe_id, c.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), pr.pv) AS sim
  FROM cand c
  JOIN embeddings e ON c.vec_id = e.vec_id
  JOIN probes pr ON c.probe_id = pr.probe_id
),
ranked AS (
  SELECT probe_id, vec_id, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                                 ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT probe_id, vec_id AS neighbor_id, ROUND(sim, 6) AS similarity_score, rank
FROM ranked WHERE rank <= 3
"""


O_UPSERT_MODEL = """
WITH existing AS (
  SELECT CAST(n_nationkey + 1 AS BIGINT) AS id, n_name AS name,
         CAST(64 AS INTEGER) AS embedding_dim
  FROM nation WHERE n_nationkey < 15
),
incoming_raw AS (
  SELECT n_name AS name, CAST(128 AS INTEGER) AS embedding_dim
  FROM nation WHERE n_nationkey % 2 = 0
  UNION ALL
  SELECT r_name, CAST(128 AS INTEGER) FROM region
),
batch AS (
  SELECT name, embedding_dim FROM (
    SELECT name, embedding_dim,
           ROW_NUMBER() OVER (PARTITION BY name ORDER BY name ASC NULLS FIRST) AS rn
    FROM incoming_raw
  ) WHERE rn = 1
),
novel AS (
  SELECT b.* FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.name IS NOT DISTINCT FROM b.name)
),
mx AS (SELECT COALESCE(MAX(id), 0) AS m FROM existing)
SELECT id, name, embedding_dim FROM existing
UNION ALL
SELECT CAST(m + ROW_NUMBER() OVER (ORDER BY name ASC NULLS FIRST) AS BIGINT),
       name, embedding_dim
FROM novel, mx
"""


_ORACLE_STAGED_SOURCES = """
  SELECT c_custkey AS k,
         NULLIF('a' || (c_custkey % 5), 'a3') AS author,
         't' || (c_custkey % 7) AS title,
         CAST(NULLIF(1900 + (c_custkey % 3), 1901) AS INTEGER) AS year,
         CAST(c_custkey % 2 AS BIGINT) AS model_id,
         'u' || (c_custkey % 4) AS url,
         NULLIF('g' || (c_custkey % 5), 'g2') AS genre,
         CAST(NULL AS VARCHAR) AS subgenre,
         CAST(1 + (c_custkey % 2) AS INTEGER) AS source_type
  FROM customer
"""


O_UPSERT_SOURCE = f"""
WITH staged AS ({_ORACLE_STAGED_SOURCES}),
existing AS (
  SELECT CAST(k AS BIGINT) AS id, {', '.join(_SOURCE_COLS)} FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY model_id, author, title, year
                                 ORDER BY k ASC) AS rn
    FROM staged WHERE k < 100
  ) WHERE rn = 1
),
batch AS (
  SELECT {', '.join(_SOURCE_COLS)} FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY model_id, author, title, year
                                 ORDER BY k ASC NULLS FIRST) AS rn
    FROM staged WHERE k BETWEEN 50 AND 450
  ) WHERE rn = 1
),
novel AS (
  SELECT b.* FROM batch b
  WHERE NOT EXISTS (
    SELECT 1 FROM existing e
    WHERE e.model_id IS NOT DISTINCT FROM b.model_id
      AND e.author IS NOT DISTINCT FROM b.author
      AND e.title IS NOT DISTINCT FROM b.title
      AND e.year IS NOT DISTINCT FROM b.year)
),
mx AS (SELECT COALESCE(MAX(id), 0) AS m FROM existing)
SELECT id, {', '.join(_SOURCE_COLS)} FROM existing
UNION ALL
SELECT CAST(m + ROW_NUMBER() OVER (ORDER BY model_id ASC NULLS FIRST,
                                   author ASC NULLS FIRST,
                                   title ASC NULLS FIRST,
                                   year ASC NULLS FIRST) AS BIGINT),
       {', '.join(_SOURCE_COLS)}
FROM novel, mx
"""


O_INS_CHUNK_TXN = """
WITH existing AS (
  SELECT CAST(vec_id + 1 AS BIGINT) AS id FROM embeddings WHERE vec_id < 100
),
batch AS (
  SELECT CAST(e.vec_id % 10 AS BIGINT) AS source_id,
         CAST(1 AS BIGINT) AS model_id,
         e.vec_id AS chunk_number,
         to_json(struct_pack(chunk_number := e.vec_id)) AS metadata,
         d.text AS chunk_text
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE e.vec_id BETWEEN 100 AND 199
),
mx AS (SELECT COALESCE(MAX(id), 0) AS m FROM existing)
SELECT CAST(m + ROW_NUMBER() OVER (ORDER BY source_id ASC NULLS FIRST,
                                   chunk_number ASC NULLS FIRST) AS BIGINT) AS id,
       source_id, model_id, metadata, chunk_text
FROM batch, mx
"""


_ORACLE_RAG_HITS = f"""
WITH q AS ({_ORACLE_QVEC}),
scored AS (
  SELECT e.vec_id, {_ORACLE_SIM} AS sim FROM embeddings e, q
  WHERE e.vec_id <> 0
),
hits AS (
  SELECT vec_id, sim FROM scored WHERE sim >= {{threshold}}
  ORDER BY sim DESC, vec_id ASC LIMIT 5
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY h.sim DESC, h.vec_id ASC) AS rank,
         'doc-' || d.doc_id AS title,
         'author-' || (d.doc_id % 7) AS author,
         '19' || lpad(CAST(d.doc_id % 100 AS VARCHAR), 2, '0') AS publication_date,
         d.text AS chunk_text
  FROM hits h JOIN documents d ON h.vec_id = d.doc_id
)
"""


_ORACLE_EXCERPT = (
    "chr(10) || 'Excerpt from \"' || title || '\", by ' || author || "
    "', published in ' || publication_date || ':' || chr(10) || '>>>' || chr(10) || "
    "chunk_text || chr(10) || '<<<' || chr(10) || chr(10) || chr(10)"
)


O_AGG_CONTEXT_CONCAT = (
    _ORACLE_RAG_HITS.format(threshold=0.01)
    + f"""
SELECT coalesce(string_agg({_ORACLE_EXCERPT}, '' ORDER BY rank), '') AS agg_chunk_text
FROM ranked
"""
)


def _oracle_rag_prompt(threshold: float) -> str:
    pre = (
        'chr(10) || \'You are a helpful assistant with a library that you refer to as "the Archives"\''
        " || chr(10) || 'designed to be helpful for the sorts'"
        " || chr(10) || 'of questions whose investigations you are likely to be asked to contribute to.'"
        " || chr(10)"
    )
    p = RAG_PROMPT
    no_ctx = (
        f"{pre} || chr(10) || 'However, when you consulted the library for information related to the prompt'"
        f" || chr(10) || '\"{p}\", you found no relevant information.' || chr(10) || chr(10)"
        " || 'Please respond to the following prompt with a disclaimer that notes the lack of'"
        " || chr(10) || 'information and, if you can appropriately determine the category, genre,'"
        " || chr(10) || 'author, etc. for information that might prove helpful, suggest how the library'"
        " || chr(10) || 'might be expanded to include more information.' || chr(10) || chr(10)"
        f" || 'The prompt to which you must respond is:' || chr(10) || '    \"{p}\"' || chr(10)"
    )
    with_ctx = (
        f"{pre} || chr(10) || 'When you consulted the library for information related to the prompt'"
        f" || chr(10) || '\"{p}\", you found the following relevant information:' || chr(10)"
        " || '''''''' || chr(10) || ctx || chr(10) || '''''''' || chr(10) || chr(10)"
        " || 'Please respond to the following prompt and, if the information from the library'"
        " || chr(10) || 'is relevant, use the information to respond to the prompt. Include references'"
        " || chr(10) || 'to the source data by including the few lines of text from'"
        " || chr(10) || 'the source data that contain the information you are referring to along with the'"
        " || chr(10) || 'author, title of the work and the publication date.' || chr(10) || chr(10)"
        f" || 'The prompt to which you must respond is:' || chr(10) || '    \"{p}\"' || chr(10)"
    )
    return (
        _ORACLE_RAG_HITS.format(threshold=threshold)
        + f""",
agg AS (
  SELECT coalesce(string_agg({_ORACLE_EXCERPT}, '' ORDER BY rank), '') AS ctx
  FROM ranked
)
SELECT CASE WHEN ctx = '' THEN {no_ctx} ELSE {with_ctx} END AS prompt FROM agg
"""
    )


# Composite row: both RAG template branches (real top-5 retrieval and the
# impossible-threshold empty retrieval), tagged. DuckDB allows a WITH
# inside a parenthesized FROM subquery, so each branch keeps its own CTE
# chain.
O_RAG_PROMPTS = f"""
SELECT 'context' AS branch, prompt FROM ({_oracle_rag_prompt(0.01)})
UNION ALL
SELECT 'nocontext' AS branch, prompt FROM ({_oracle_rag_prompt(1.0 - 1e-12)})
"""


O_WIN_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_total,
       strftime(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS prev_date,
       strftime(lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS next_date,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6) AS ma3
FROM orders
"""


O_AGG_PIVOT = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS f_n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             FILTER (o_orderstatus = 'F') AS DOUBLE), 2) AS f_rev,
       COUNT(*) FILTER (o_orderstatus = 'O') AS o_n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             FILTER (o_orderstatus = 'O') AS DOUBLE), 2) AS o_rev,
       COUNT(*) FILTER (o_orderstatus = 'P') AS p_n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             FILTER (o_orderstatus = 'P') AS DOUBLE), 2) AS p_rev
FROM orders GROUP BY o_orderpriority
"""


O_AGG_PERCENTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# Tolerance-band gates for the sketch keys (VERDICT r4 #8): sketch
# VALUES have no cross-engine replay, so the Spark side emits boolean
# in-band verdicts (rank-guarantee check for percentile_approx, 5σ
# relative-error check for HLL) and the oracle independently recomputes
# the exact quantities and asserts the verdicts TRUE — a sketch straying
# out of band flips a boolean and hash-mismatches.
O_AGG_PERCENTILES_APPROX = """
SELECT l_returnflag, COUNT(*) AS n,
       TRUE AS p50_in_band, TRUE AS p90_in_band
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


O_AGG_APPROX_DISTINCT = """
SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS within_band
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- curation: decontamination + BM25 (operators/curation.py) --------------
#
# The Spark side joins on xxhash64 of the gram string (8-byte shuffle
# keys — the 100 TB posture); the oracle joins on the gram STRINGS
# themselves, so a hash collision would surface as a parity mismatch
# rather than hide inside identical wrong answers.
# Bloom-filter decontamination (registry q_decon_bloom, operators/
# curation.py bloom_build/bloom_decontaminate): exact replay of the
# bloom — same salted-md5 positions, same all-k maybe test — so the
# row gates the bounded-memory screen's arithmetic; the no-false-
# negative property vs the exact screen is pinned in pytest.
_O_BLOOM_POS = (
    "CAST(('0x' || substr(md5('{j}' || ':' || {g}), 1, 8))::UBIGINT"
    " AS BIGINT) % {m}"
)


def _bloom_oracle(m: int, k: int) -> str:
    hs = ", ".join(_O_BLOOM_POS.format(j=j, g="gram", m=m) for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) < 13 THEN []
              ELSE list_distinct(list_transform(
                range(len(w) - 12),
                i -> array_to_string(w[i + 1:i + 13], ' ')
              )) END AS g
  FROM toks
),
eg AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 41 = 0
),
bloom AS (
  SELECT DISTINCT unnest([{hs}]) AS pos FROM eg
),
tg AS (
  SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 41 <> 0
),
probe AS (
  SELECT doc_id, gram, unnest([{hs}]) AS pos FROM tg
),
gh AS (
  SELECT p.doc_id, p.gram, COUNT(b.pos) = {k} AS maybe
  FROM probe p LEFT JOIN bloom b USING (pos)
  GROUP BY p.doc_id, p.gram
),
pd AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         COUNT(*) FILTER (maybe) AS n_maybe
  FROM gh GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(pd.n_grams, 0) AS n_grams,
       COALESCE(pd.n_maybe, 0) AS n_maybe,
       COALESCE(pd.n_maybe, 0) > 0 AS bloom_contaminated
FROM documents d LEFT JOIN pd USING (doc_id)
WHERE d.doc_id % 41 <> 0
"""


O_DECON_BLOOM = _bloom_oracle(curation_ops.BLOOM_M, curation_ops.BLOOM_K)


def _curate_incremental_oracle() -> str:
    """Daily-batch curation audit replay (registry q_curate_incremental
    -> operators/curation.py curate_incremental). Splits: eval =
    doc_id % 41 = 0; batch = % {bm} = 0 excluding eval; corpus = the
    rest. Four INDEPENDENT verdicts per batch doc: exact (corpus hash
    membership / smaller-id batch twin), length, near-dup (the full
    minhash pair set restricted to non-eval batch-touching pairs at
    jaccard >= tau — cross pairs drop the batch side, within-batch
    pairs drop the larger id), bloom contamination (the _bloom_oracle
    machinery probed with BATCH docs only). kept = none of the four."""
    m, k = curation_ops.BLOOM_M, curation_ops.BLOOM_K
    bm = DEDUP_BATCH_MOD
    tau = curation_ops.CURATE_INC_TAU
    mt = curation_ops.CURATE_INC_MIN_TOKENS
    n = curation_ops.DECON_N
    hs = ", ".join(_O_BLOOM_POS.format(j=j, g="gram", m=m) for j in range(k))
    return f"""
WITH b AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {bm} = 0 AND doc_id % 41 <> 0
),
c AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {bm} <> 0 AND doc_id % 41 <> 0
),
bh AS (SELECT doc_id, sha256(text) AS h FROM b),
ch AS (SELECT DISTINCT sha256(text) AS h FROM c),
bmin AS (SELECT h, MIN(doc_id) AS mn FROM bh GROUP BY h),
exact AS (
  SELECT bh.doc_id,
         (ch.h IS NOT NULL) OR (bh.doc_id > bmin.mn) AS exact_dup
  FROM bh LEFT JOIN ch ON bh.h = ch.h JOIN bmin ON bh.h = bmin.h
),
shorts AS (
  SELECT doc_id,
         len(string_split(lower(text), ' ')) < {mt} AS too_short
  FROM b
),
pairs AS MATERIALIZED ({O_DEDUP_MINHASH_PAIRS}),
nd AS (
  SELECT DISTINCT d FROM (
    SELECT CASE WHEN id_a % {bm} = 0 THEN id_a ELSE id_b END AS d
    FROM pairs
    WHERE jaccard >= {tau} AND id_a % 41 <> 0 AND id_b % 41 <> 0
      AND ((id_a % {bm} = 0) <> (id_b % {bm} = 0))
    UNION ALL
    SELECT id_b FROM pairs
    WHERE jaccard >= {tau} AND id_a % 41 <> 0 AND id_b % 41 <> 0
      AND id_a % {bm} = 0 AND id_b % {bm} = 0
  )
),
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) < {n} THEN []
              ELSE list_distinct(list_transform(
                range(len(w) - {n - 1}),
                i -> array_to_string(w[i + 1:i + {n}], ' ')
              )) END AS g
  FROM toks
),
eg AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 41 = 0),
bloom AS (SELECT DISTINCT unnest([{hs}]) AS pos FROM eg),
tg AS (
  SELECT g2.doc_id, unnest(g2.g) AS gram
  FROM grams g2 JOIN b ON g2.doc_id = b.doc_id
),
probe AS (SELECT doc_id, gram, unnest([{hs}]) AS pos FROM tg),
gh AS (
  SELECT p.doc_id, p.gram, COUNT(bl.pos) = {k} AS maybe
  FROM probe p LEFT JOIN bloom bl USING (pos)
  GROUP BY p.doc_id, p.gram
),
pd AS (
  SELECT doc_id, COUNT(*) FILTER (maybe) AS n_maybe FROM gh GROUP BY doc_id
)
SELECT b.doc_id, e.exact_dup, s.too_short,
       (nd.d IS NOT NULL) AS near_dup,
       COALESCE(pd.n_maybe, 0) > 0 AS contaminated,
       NOT (e.exact_dup OR s.too_short OR (nd.d IS NOT NULL)
            OR COALESCE(pd.n_maybe, 0) > 0) AS kept
FROM b
JOIN exact e ON b.doc_id = e.doc_id
JOIN shorts s ON b.doc_id = s.doc_id
LEFT JOIN nd ON nd.d = b.doc_id
LEFT JOIN pd ON pd.doc_id = b.doc_id
"""


O_CURATE_INCREMENTAL = _curate_incremental_oracle()


O_TEXT_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) < 13 THEN []
              ELSE list_distinct(list_transform(
                range(len(w) - 12),
                i -> array_to_string(w[i + 1:i + 13], ' ')
              )) END AS g
  FROM toks
),
eg AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 41 = 0
),
tg AS (
  SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 41 <> 0
),
counts AS (
  SELECT t.doc_id, COUNT(*) AS n_grams, COUNT(e.gram) AS n_overlap
  FROM tg t LEFT JOIN eg e USING (gram) GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(c.n_grams, 0) AS n_grams,
       COALESCE(c.n_overlap, 0) AS n_overlap,
       COALESCE(c.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN counts c USING (doc_id)
WHERE d.doc_id % 41 <> 0
"""


def _o_bm25(terms: list[str], k1: float, b: float, k: int, where: str = "") -> str:
    """Okapi BM25 oracle mirroring operators/curation.py bm25_topk
    expression-for-expression (same idf form, same rounding, same
    tiebreak) over per-document tf projections — no posting list."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * tf_{i} * {k1 + 1.0}"
        f" / (tf_{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    return f"""
WITH pd AS (
  SELECT doc_id, len(w) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents{(' ' + where) if where else ''})
),
st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl,
         {df_cols}
  FROM pd
)
SELECT doc_id, ROUND({score}, 4) AS bm25
FROM pd, st
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


O_TEXT_BM25 = _o_bm25(
    curation_ops.BM25_TERMS,
    curation_ops.BM25_K1,
    curation_ops.BM25_B,
    curation_ops.BM25_TOPK,
)


# Hybrid retrieval fusion (registry q_retrieval_rrf, operators/
# retrieval.py rrf_fuse): dense cosine top-15 (selection on RAW sim +
# id, the flagship's contract) and BM25 top-15 (the _o_bm25 replay),
# each ranked within-list on the ROUNDED display score + id, fused by
# integer-scaled reciprocal rank (floor(1e9/(60+rank)), BIGINT floor
# division on both engines), top-10 by (score DESC, id ASC).
O_RETRIEVAL_RRF = f"""
WITH q AS ({_ORACLE_QVEC}),
dense_hits AS (
  SELECT e.vec_id AS doc_id, {_ORACLE_SIM} AS sim
  FROM embeddings e, q
  ORDER BY sim DESC, e.vec_id ASC LIMIT 15
),
dense AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
      ORDER BY ROUND(sim, 6) DESC, doc_id ASC) AS INT) AS rank_dense
  FROM dense_hits
),
sparse AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
      ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank_sparse
  FROM ({_o_bm25(curation_ops.BM25_TERMS, curation_ops.BM25_K1,
                 curation_ops.BM25_B, 15)}) b
)
SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
       d.rank_dense, s.rank_sparse,
       CAST(COALESCE(1000000000 // (60 + d.rank_dense), 0)
          + COALESCE(1000000000 // (60 + s.rank_sparse), 0) AS BIGINT)
         AS rrf_scaled
FROM dense d FULL OUTER JOIN sparse s ON d.doc_id = s.doc_id
ORDER BY rrf_scaled DESC, doc_id ASC LIMIT 10
"""


# Salted-ticket stratified sampling (operators/curation.py
# sample_stratified): md5-derived ticket, same rates CASE as
# registry.SAMPLE_RATES/SAMPLE_DEFAULT.
O_SAMPLE_STRATIFIED = """
SELECT * FROM (
  SELECT doc_id, text, lang, source, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r4'), 1, 8))::UBIGINT
              AS BIGINT) % 1000 AS ticket
  FROM documents
)
WHERE ticket < CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 300 ELSE 500 END
"""


# Token-budget packing (operators/curation.py pack_sequences): stratum
# prefix sums over id order; pack may overflow by its final doc.
O_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / 256.0) AS BIGINT) AS pack_id
FROM t
"""


# End-to-end curation cascade (operators/curation.py curate_corpus):
# dedup keepers -> length screen -> decontaminate vs the %41 eval split
# -> stratified sample -> token-budget packing. Every stage mirrors its
# standalone oracle above.
O_CURATE_CORPUS = """
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
),
longd AS (
  SELECT d.* FROM documents d JOIN keep USING (doc_id)
  WHERE len(string_split(lower(d.text), ' ')) >= 15
),
toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) < 13 THEN []
              ELSE list_distinct(list_transform(
                range(len(w) - 12),
                i -> array_to_string(w[i + 1:i + 13], ' ')
              )) END AS g
  FROM toks
),
eg AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 41 = 0
),
train AS (
  SELECT * FROM longd WHERE doc_id % 41 <> 0
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT g2.doc_id, unnest(g2.g) AS gram
        FROM grams g2 JOIN train USING (doc_id)) t
  JOIN eg USING (gram)
),
clean AS (
  SELECT * FROM train
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
sampled AS (
  SELECT * FROM clean
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r4'), 1, 8))::UBIGINT
             AS BIGINT) % 1000
        < CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 300 ELSE 500 END
),
st AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM sampled
)
SELECT doc_id, source, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / 256.0) AS BIGINT) AS pack_id
FROM st
"""


# PII scrub + C4-style line filter (operators/curation.py scrub_text).
# The synthetic corpus carries no PII and no newlines, so the row
# deterministically augments each document with a 2-word junk line and a
# contact line (email + IPv4 + phone) before scrubbing — proving the
# masks and the line screen actually fire.  Patterns are byte-identical
# to curation.PII_EMAIL / PII_IPV4 / PII_PHONE and are valid in both
# Java regex and RE2 (no lookaround / backreferences).
O_TEXT_SCRUB = r"""
WITH aug AS (
  SELECT doc_id,
         text || chr(10) || 'ab cd' || chr(10) || 'contact ' || source
              || CAST(doc_id AS VARCHAR) || '@example.com at 10.0.0.'
              || CAST(doc_id % 250 + 1 AS VARCHAR) || ' or +1 555 000 '
              || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
  FROM documents
),
masked AS (
  SELECT doc_id, text,
         string_split(
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+\d[\d()\- ]{6,}\d', '<PHONE>', 'g'),
           chr(10)) AS lines
  FROM aug
)
SELECT doc_id,
       array_to_string(
         list_filter(lines, x -> len(string_split_regex(trim(x), ' +')) >= 3),
         chr(10)) AS clean_text,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
       len(regexp_extract_all(text, '\+\d[\d()\- ]{6,}\d')) AS n_phones,
       len(list_filter(lines,
           x -> len(string_split_regex(trim(x), ' +')) >= 3)) AS n_lines_kept,
       len(lines) AS n_lines_total
FROM masked
"""


# Co-bucketed revenue join (operators/relational.py write_bucketed +
# bucketed_revenue_join): the bucketed layout changes the PLAN, not the
# answer, so the oracle is the plain per-order join aggregation.
O_JOIN_BUCKETED = """
SELECT o_orderkey, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_orderpriority
"""


# TPC-H Q18-style large-quantity orders (registry q_tpch_q18): the
# HAVING screen's aggregate is reused for sum_qty instead of re-joining
# lineitem — identical result, one less scan.
O_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, ROUND(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
) b
JOIN orders ON o_orderkey = b.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# Salted skew join (operators/skew.py salted_join): salting is a plan
# transformation only — the oracle is the PLAIN join + rollup, so any
# row salting duplicated or dropped breaks the hash.
O_JOIN_SKEW_SALTED = """
WITH dim AS (
  SELECT event_type, MIN(event_id) AS type_min_id FROM events GROUP BY event_type
)
SELECT e.event_type, d.type_min_id,
       COUNT(*) AS n_events, CAST(SUM(e.event_id) AS BIGINT) AS sum_ids
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type, d.type_min_id
ORDER BY e.event_type
"""


# Diagnose-then-cure join (registry q_join_skew_adaptive →
# operators/skew.py adaptive_join): the oracle replays BOTH halves of
# the contract — the DECISION (the same integer per-mille hottest-key
# share over each case's key; event_type ≈ 200‰ → 'salted', user_id
# ≤ 8‰ → 'plain' on every testdata sf) and the RESULT (the plain join
# rollup, because salting must not change a row — the
# join_skew_salted invariant extended to the branch that picks it).
O_JOIN_SKEW_ADAPTIVE_TMPL = """
WITH ev AS (SELECT event_id, event_type, user_id FROM events),
tcnt AS (SELECT COUNT(*) AS cnt FROM ev GROUP BY event_type),
tstat AS (SELECT MAX(cnt) AS mx, CAST(SUM(cnt) AS BIGINT) AS n FROM tcnt),
tdim AS (SELECT event_type, MIN(event_id) AS dim_id FROM ev GROUP BY event_type),
tjoin AS (
  SELECT COUNT(*) AS n_rows, CAST(SUM(e.event_id) AS BIGINT) AS sum_big_ids,
         CAST(SUM(d.dim_id) AS BIGINT) AS sum_dim_ids
  FROM ev e JOIN tdim d ON e.event_type = d.event_type
),
ucnt AS (SELECT COUNT(*) AS cnt FROM ev GROUP BY user_id),
ustat AS (SELECT MAX(cnt) AS mx, CAST(SUM(cnt) AS BIGINT) AS n FROM ucnt),
udim AS (SELECT user_id, MIN(event_id) AS dim_id FROM ev GROUP BY user_id),
ujoin AS (
  SELECT COUNT(*) AS n_rows, CAST(SUM(e.event_id) AS BIGINT) AS sum_big_ids,
         CAST(SUM(d.dim_id) AS BIGINT) AS sum_dim_ids
  FROM ev e JOIN udim d ON e.user_id = d.user_id
)
SELECT 'event_type' AS case_name,
       CASE WHEN (mx * 1000) // n >= {hot_pm} THEN 'salted'
            ELSE 'plain' END AS strategy,
       n_rows, sum_big_ids, sum_dim_ids
FROM tstat, tjoin
UNION ALL
SELECT 'user_id' AS case_name,
       CASE WHEN (mx * 1000) // n >= {hot_pm} THEN 'salted'
            ELSE 'plain' END AS strategy,
       n_rows, sum_big_ids, sum_dim_ids
FROM ustat, ujoin
"""

O_JOIN_SKEW_ADAPTIVE = O_JOIN_SKEW_ADAPTIVE_TMPL.format(
    hot_pm=skew_ops.SKEW_HOT_PER_MILLE
)


# IVF occupancy-drift diagnostic (registry q_vec_ivf_drift ->
# operators/ivf.py ivf_drift): replays the SAME seed-centroid
# assignment as O_VEC_IVF_TOPK, splits it into the training slice
# (vec_id % 5 != 0 -- the ivf_append layout's base corpus) vs the full
# grown corpus, and reproduces the integer per-mille share-drift math
# plus the global retrain flag. A green row proves the maintenance
# loop's re-train TRIGGER computes the same decision on both engines.
O_VEC_IVF_DRIFT = f"""
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
assign AS (
  SELECT e.vec_id,
         arg_max(c.cid, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)) AS cluster
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id
),
train AS (
  SELECT cluster, COUNT(*) AS n_train FROM assign
  WHERE vec_id % 5 != 0 GROUP BY cluster
),
now_t AS (SELECT cluster, COUNT(*) AS n_now FROM assign GROUP BY cluster),
j AS (
  SELECT COALESCE(n.cluster, t.cluster) AS cluster,
         COALESCE(t.n_train, 0) AS n_train,
         COALESCE(n.n_now, 0) AS n_now
  FROM now_t n FULL OUTER JOIN train t ON n.cluster = t.cluster
),
tot AS (
  SELECT CAST(SUM(n_train) AS BIGINT) AS tt,
         CAST(SUM(n_now) AS BIGINT) AS tn FROM j
),
s AS (
  SELECT cluster, n_train, n_now,
         (n_train * 1000) // tt AS share_train_pm,
         (n_now * 1000) // tn AS share_now_pm,
         abs((n_train * 1000) // tt - (n_now * 1000) // tn) AS drift_pm
  FROM j, tot
)
SELECT CAST(cluster AS INT) AS cluster, n_train, n_now,
       share_train_pm, share_now_pm, drift_pm,
       CAST((SELECT MAX(drift_pm) FROM s) >= {ivf_ops.IVF_DRIFT_PER_MILLE}
            AS INT) AS retrain
FROM s
"""


# Product-quantization top-k (operators/ann.py pq_topk): fully
# data-driven replay against the TRAINED codebooks (tools/train_pq.py →
# golden/pq_codebooks.parquet — per-subspace Lloyd k-means, the same
# file the Spark query loads driver-side, so the doubles are
# bit-identical). Codes are per-subspace argmin-L2 (ties to lowest cid),
# ADC sums the query-to-codeword subdistances, and the shortlist
# re-ranks by true L2.
O_VEC_PQ_TOPK = """
WITH cb AS (
  SELECT s, cid, cv FROM read_parquet('/root/repo/golden/pq_codebooks.parquet')
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
codes AS (
  SELECT e.vec_id, cb.s,
         first(cb.cid ORDER BY
           list_sum(list_transform(range(8),
             i -> (CAST(e.embedding[cb.s * 8 + i + 1] AS DOUBLE)
                   - cb.cv[i + 1]) ^ 2)) ASC,
           cb.cid ASC) AS code
  FROM embeddings e CROSS JOIN cb
  GROUP BY e.vec_id, cb.s
),
adc AS (
  -- s-ordered list fold, NOT a plain SUM: the Spark side chains the 8
  -- subspace terms left-to-right in s order, and an unordered hash-agg
  -- SUM could differ by an ulp on a run-dependent basis
  SELECT c.vec_id,
         list_sum(list(list_sum(list_transform(range(8),
           i -> (q.qv[c.s * 8 + i + 1] - cb.cv[i + 1]) ^ 2))
           ORDER BY c.s)) AS adc
  FROM codes c JOIN cb ON cb.s = c.s AND cb.cid = c.code CROSS JOIN q
  GROUP BY c.vec_id
),
cand AS (SELECT vec_id, adc FROM adc ORDER BY adc ASC, vec_id ASC LIMIT 50),
ex AS (
  SELECT cand.vec_id, cand.adc,
         list_sum(list_transform(range(64),
           i -> (CAST(e.embedding[i + 1] AS DOUBLE) - q.qv[i + 1]) ^ 2)) AS l2
  FROM cand JOIN embeddings e USING (vec_id) CROSS JOIN q
)
SELECT vec_id, ROUND(adc, 6) AS adc_dist, ROUND(l2, 6) AS l2_dist
FROM ex ORDER BY l2 ASC, vec_id ASC LIMIT 10
"""


# IVF + PQ composite (operators/ann.py ivfpq_topk): the IVF prefix is
# byte-identical to O_VEC_IVF_TOPK's (argmax-cosine assignment, top-4
# probe cells); the PQ suffix is O_VEC_PQ_TOPK's codes → ADC → re-rank
# restricted to the probed candidates.
O_VEC_IVFPQ_TOPK = f"""
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS ({_ORACLE_QVEC}),
assign AS (
  SELECT e.vec_id,
         arg_max(c.cid, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)) AS cluster
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id
),
topc AS (
  SELECT c.cid FROM c, q
  ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid ASC LIMIT 4
),
cand0 AS (SELECT a.vec_id FROM assign a JOIN topc t ON a.cluster = t.cid),
-- 'c' doubles as the PQ codebook table: cents == codebooks is this
-- row's deliberate contract (same 16 seed vectors in both roles)
sub AS (SELECT unnest(range(8)) AS s),
codes AS (
  SELECT e.vec_id, sub.s,
         first(c.cid ORDER BY
           list_sum(list_transform(range(8),
             i -> (CAST(e.embedding[sub.s * 8 + i + 1] AS DOUBLE)
                   - c.cv[sub.s * 8 + i + 1]) ^ 2)) ASC,
           c.cid ASC) AS code
  FROM embeddings e JOIN cand0 USING (vec_id)
  CROSS JOIN sub CROSS JOIN c
  GROUP BY e.vec_id, sub.s
),
adc AS (
  -- s-ordered list fold to match Spark's fixed s=0..7 chain (see
  -- O_VEC_PQ_TOPK)
  SELECT cd.vec_id,
         list_sum(list(list_sum(list_transform(range(8),
           i -> (q.qv[cd.s * 8 + i + 1] - c.cv[cd.s * 8 + i + 1]) ^ 2))
           ORDER BY cd.s)) AS adc
  FROM codes cd JOIN c ON c.cid = cd.code CROSS JOIN q
  GROUP BY cd.vec_id
),
cand AS (SELECT vec_id, adc FROM adc ORDER BY adc ASC, vec_id ASC LIMIT 50),
ex AS (
  SELECT cand.vec_id, cand.adc,
         list_sum(list_transform(range(64),
           i -> (CAST(e.embedding[i + 1] AS DOUBLE) - q.qv[i + 1]) ^ 2)) AS l2
  FROM cand JOIN embeddings e USING (vec_id) CROSS JOIN q
)
SELECT vec_id, ROUND(adc, 6) AS adc_dist, ROUND(l2, 6) AS l2_dist
FROM ex ORDER BY l2 ASC, vec_id ASC LIMIT 10
"""


# Pruned IVFADC (operators/ann.py ivfpq_write + ivfpq_topk_pruned):
# same IVF prefix as O_VEC_IVFPQ_TOPK (seed centroids, argmax-cosine
# assignment, top-4 probe cells), but the PQ suffix scores the TRAINED
# golden codebooks — the storage path where codes are precomputed at
# write time is a plan change only, so the oracle replays the logical
# computation: assignment → probe filter → codes → ADC → exact re-rank.
O_VEC_IVFPQ_PRUNED = f"""
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS ({_ORACLE_QVEC}),
assign AS (
  SELECT e.vec_id,
         arg_max(c.cid, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)) AS cluster
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id
),
topc AS (
  SELECT c.cid FROM c, q
  ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid ASC LIMIT 4
),
cand0 AS (SELECT a.vec_id FROM assign a JOIN topc t ON a.cluster = t.cid),
cb AS (
  SELECT s, cid, cv FROM read_parquet('/root/repo/golden/pq_codebooks.parquet')
),
codes AS (
  SELECT e.vec_id, cb.s,
         first(cb.cid ORDER BY
           list_sum(list_transform(range(8),
             i -> (CAST(e.embedding[cb.s * 8 + i + 1] AS DOUBLE)
                   - cb.cv[i + 1]) ^ 2)) ASC,
           cb.cid ASC) AS code
  FROM embeddings e JOIN cand0 USING (vec_id) CROSS JOIN cb
  GROUP BY e.vec_id, cb.s
),
adc AS (
  -- s-ordered list fold to match Spark's fixed s=0..7 chain (see
  -- O_VEC_PQ_TOPK)
  SELECT cd.vec_id,
         list_sum(list(list_sum(list_transform(range(8),
           i -> (q.qv[cd.s * 8 + i + 1] - cb.cv[i + 1]) ^ 2))
           ORDER BY cd.s)) AS adc
  FROM codes cd JOIN cb ON cb.s = cd.s AND cb.cid = cd.code CROSS JOIN q
  GROUP BY cd.vec_id
),
cand AS (SELECT vec_id, adc FROM adc ORDER BY adc ASC, vec_id ASC LIMIT 50),
ex AS (
  SELECT cand.vec_id, cand.adc,
         list_sum(list_transform(range(64),
           i -> (CAST(e.embedding[i + 1] AS DOUBLE) - q.qv[i + 1]) ^ 2)) AS l2
  FROM cand JOIN embeddings e USING (vec_id) CROSS JOIN q
)
SELECT vec_id, ROUND(adc, 6) AS adc_dist, ROUND(l2, 6) AS l2_dist
FROM ex ORDER BY l2 ASC, vec_id ASC LIMIT 10
"""


# CCNet-style INTERPOLATED-BIGRAM log-probability screen
# (operators/curation.py bigram_logprob): LM self-trained in-plan;
# λ=0.75 / 0.25 are exactly-representable literals on both engines, and
# the per-document mean is an ORDERED fold over token position
# (list_sum(list(logp ORDER BY pos)) here, aggregate over a
# pos-array_sort'ed collect_list on the Spark side) — the same
# left-to-right addend chain, so the doubles are bit-identical across
# engines (the ADVICE r4 unordered-AVG flake class is closed).
O_TEXT_PERPLEXITY = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos, t[u.i] AS w,
         CASE WHEN u.i = 1 THEN NULL ELSE t[u.i - 1] END AS wp
  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
),
uni AS (SELECT w, COUNT(*) AS cw FROM pos GROUP BY w),
tot AS (SELECT SUM(cw) AS n FROM uni),
uni_lm AS (
  SELECT w, CAST(cw AS DOUBLE) / CAST(n AS DOUBLE) AS pu FROM uni CROSS JOIN tot
),
bi AS (SELECT wp, w, COUNT(*) AS cb FROM pos WHERE wp IS NOT NULL GROUP BY wp, w),
ctx AS (SELECT wp, SUM(cb) AS cctx FROM bi GROUP BY wp),
bi_lm AS (
  SELECT b.wp, b.w, CAST(b.cb AS DOUBLE) / CAST(c.cctx AS DOUBLE) AS pb
  FROM bi b JOIN ctx c USING (wp)
),
scored AS (
  SELECT p.doc_id, p.pos,
         CASE WHEN p.wp IS NULL THEN ln(u.pu)
              ELSE ln(0.75 * COALESCE(b.pb, 0.0) + 0.25 * u.pu) END AS logp
  FROM pos p JOIN uni_lm u USING (w)
  LEFT JOIN bi_lm b ON b.wp = p.wp AND b.w = p.w
)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(list_sum(list(logp ORDER BY pos)) / COUNT(*), 6) AS avg_logp
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Round-5 TPC-H plan-feature set (registry q_tpch_q4..q22). Same
# adaptations as the Spark side: no partsupp/l_shipmode/l_commitdate in
# the testdata, so Q4 keys lateness off shipdate-vs-orderdate, Q16
# bridges part-supplier through observed lineitem pairs, and Q22's
# "no recent orders" screen replaces the phone-prefix filter.
# ---------------------------------------------------------------------------

O_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


O_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
         AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


O_TPCH_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
         AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


# Both sums are exact DECIMALs, so casting each to DOUBLE and dividing
# performs the identical pair of IEEE operations on both engines.
O_TPCH_Q14 = """
WITH agg AS (
  SELECT SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS total
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
    AND l.l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT ROUND(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS promo_pct,
       ROUND(CAST(promo AS DOUBLE), 2) AS promo_revenue,
       ROUND(CAST(total AS DOUBLE), 2) AS total_revenue
FROM agg
"""


O_TPCH_Q16 = """
WITH bridge AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT b.l_suppkey) AS supplier_cnt
FROM bridge b
JOIN part p ON b.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44)
  AND b.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC LIMIT 50
"""


# The 20%-of-average screen is phrased as qty * (10 * cnt) < 2 * sum —
# DECIMAL/BIGINT arithmetic only, exact on both engines.
O_TPCH_Q17 = """
WITH j AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#3'
),
stats AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         COUNT(*) AS cnt
  FROM j GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(j.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_small
FROM j JOIN stats s ON j.l_partkey = s.l_partkey
WHERE CAST(j.l_quantity AS DECIMAL(18,2)) * (10 * s.cnt) < 2 * s.sq
"""


O_TPCH_Q19 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
         AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# Threshold compare in integer cents: c_cents * n_pos > sum_cents —
# BIGINT on both engines, no double-summation-order sensitivity.
O_TPCH_Q22 = """
WITH pos AS (
  SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_cents,
         COUNT(*) AS n_pos
  FROM customer WHERE c_acctbal > 0
),
recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01'
),
wealthy AS (
  SELECT c.c_mktsegment, c.c_acctbal
  FROM customer c CROSS JOIN pos
  WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n_pos > pos.sum_cents
    AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey)
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS totacctbal
FROM wealthy GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# Round-6 TPC-H completions (VERDICT r5 #4): q8 two-level market-share
# ratio, q9 LIKE-filtered profit, q12 CASE-counted derived ship modes,
# q20 nested IN + correlated scalar aggregate. Same schema adaptations
# as the rest of the set (no partsupp / l_shipmode / l_*date triplet);
# every integer CASE sum is CAST AS BIGINT (the r5 HUGEINT lesson) and
# every money/quantity sum runs in DECIMAL before one double cast.

O_TPCH_Q8 = """
WITH asia_cust AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
vols AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         n.n_name AS supp_nation,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS vol
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND o.o_custkey IN (SELECT c_custkey FROM asia_cust)
),
agg AS (
  SELECT o_year,
         SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_vol,
         SUM(vol) AS total_vol
  FROM vols GROUP BY o_year
)
SELECT o_year,
       ROUND(CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE), 6)
         AS mkt_share,
       ROUND(CAST(nation_vol AS DOUBLE), 2) AS nation_volume,
       ROUND(CAST(total_vol AS DOUBLE), 2) AS total_volume
FROM agg ORDER BY o_year
"""


# Profit in integer TEN-THOUSANDTHS (the q22 cents convention): a
# triple DECIMAL product overflows the 38-digit cap with
# engine-specific scale reduction, and a double ROUND can land exactly
# on a half-cent (both caught by the 10×/30× replica probes); BIGINT e4
# units + integer HALF-UP-to-cents (// truncates toward zero on both
# engines; operands kept positive) are exact everywhere, with cents/100
# as the only float op.
O_TPCH_Q9 = """
WITH g AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         SUM(
           CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
           - CAST(round(p.p_retailprice * 10) AS BIGINT)
             * CAST(l.l_quantity AS BIGINT) * 100
         ) AS s
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%bolt%'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY nation, o_year
)
SELECT nation, o_year,
       CAST(CASE WHEN s >= 0 THEN (s + 50) // 100
                 ELSE -((-s + 50) // 100) END AS DOUBLE) / 100.0
         AS sum_profit
FROM g ORDER BY nation ASC, o_year DESC
"""


O_TPCH_Q12 = """
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
            THEN 'FAST' ELSE 'SLOW' END AS ship_mode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY ship_mode ORDER BY ship_mode
"""


O_TPCH_Q20 = """
SELECT s_name, s_acctbal FROM supplier
WHERE s_suppkey IN (
  SELECT l.l_suppkey FROM lineitem l
  WHERE l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
         > CAST(0.5 AS DECIMAL(18,2)) * (
      SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
      FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
        AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l2.l_shipdate <  TIMESTAMP '1997-01-01'
    )
)
ORDER BY s_name
"""


# EXACT n-gram-Jaccard pairs (registry q_dedup_ngram, operators/dedup.py
# ngram_jaccard_pairs): deliberately NOT a replay of the prefix-filter
# algorithm — this is the brute-force shared-gram pair enumeration with
# exact Jaccard, so a prefix filter that lost a single true pair would
# break row-count parity (completeness proof, not just agreement).
# k=3 word grams, τ=0.3, round-then-filter on both sides.
O_DEDUP_NGRAM = """
WITH sh3 AS (
  SELECT doc_id,
         CASE WHEN len(string_split(lower(text), ' ')) < 3
              THEN [lower(text)]
              ELSE list_distinct(list_transform(
                range(len(string_split(lower(text), ' ')) - 2),
                i -> array_to_string((string_split(lower(text), ' '))[i + 1:i + 3], ' ')
              )) END AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh3),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
           AS jaccard
  FROM cand c
  JOIN sh3 sa ON c.id_a = sa.doc_id
  JOIN sh3 sb ON c.id_b = sb.doc_id
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.3
"""


# Exact-substring runs (registry q_dedup_substring, operators/dedup.py
# substring_pairs): positioned 12-token grams → shared-gram self-join
# (id_a < id_b) → gaps-and-islands run-merging per (pair, diagonal).
# The oracle replays the whole chain on the raw text, so it also proves
# the Spark side's xxhash64 candidate stage + slice-verify backstop
# added and lost nothing. Same tokenization as O_DEDUP_NGRAM
# (string_split on ' ' over lower(text)).
O_DEDUP_SUBSTRING = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
g0 AS (
  SELECT doc_id, unnest(range(len(toks) - 11)) AS pos, toks
  FROM t WHERE len(toks) >= 12
),
g AS (
  SELECT doc_id, pos, array_to_string(toks[pos + 1:pos + 12], ' ') AS gram
  FROM g0
),
hits AS (
  SELECT a.doc_id AS id_a, a.pos AS pos_a, b.doc_id AS id_b, b.pos AS pos_b
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
       COUNT(*) + 11 AS span_len
FROM (
  SELECT *, pos_a - ROW_NUMBER() OVER (
      PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS isl
  FROM hits
)
GROUP BY id_a, id_b, pos_a - pos_b, isl
"""


# Brute-force ORDERED-pair containment (registry q_dedup_containment):
# same completeness contract as O_DEDUP_NGRAM — every shared-gram pair
# is enumerated and scored, so parity proves the asymmetric prefix
# filter (contained-side prefix + containing-side full explode) lost
# nothing.
O_DEDUP_CONTAINMENT = """
WITH sh3 AS (
  SELECT doc_id,
         CASE WHEN len(string_split(lower(text), ' ')) < 3
              THEN [lower(text)]
              ELSE list_distinct(list_transform(
                range(len(string_split(lower(text), ' ')) - 2),
                i -> array_to_string((string_split(lower(text), ' '))[i + 1:i + 3], ' ')
              )) END AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh3),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
               / len(sa.shingles), 6) AS containment
  FROM cand c
  JOIN sh3 sa ON c.id_a = sa.doc_id
  JOIN sh3 sb ON c.id_b = sb.doc_id
)
SELECT id_a, id_b, containment FROM scored WHERE containment >= 0.9
"""


def _duck_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _pagerank_oracle(iters: int) -> str:
    """Unrolled GraphX-style static PageRank replay (registry
    q_graph_pagerank, operators/graph.py): INTEGER FIXED POINT — micro
    ranks (r0 = 1000000), nano contributions ``(r·1000) // outdeg``,
    damping as 17/20 — so every intermediate is a BIGINT and the sums
    are order-independent; the engines agree bit-identically with no
    rounding-boundary luck (the r6 6dp-DOUBLE design lost two rows at
    sf0.001 to a .5-ulp boundary). Final ``pr = r / 1000000.0`` is one
    exact-operand IEEE division, identical everywhere."""
    sql = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS src, l_suppkey + {SUPP_NODE_OFFSET} AS dst
  FROM lineitem
),
nodes AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
"""
    for t in range(iters):
        sql += f"""c{t} AS (
  SELECT e.dst, SUM((r.r * 1000) // d.outdeg) AS s
  FROM edges e JOIN r{t} r ON r.id = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r{t + 1} AS MATERIALIZED (
  SELECT n.id,
         CAST(150000 + (17 * COALESCE(c.s, 0)) // 20000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{t} c ON c.dst = n.id
),
"""
    return (
        sql.rstrip().rstrip(",")
        + f"\nSELECT id AS node_id, r / 1000000.0 AS pr FROM r{iters}"
    )


O_GRAPH_PAGERANK = _pagerank_oracle(PAGERANK_ITERS)


def _ppr_oracle(iters: int) -> str:
    """Unrolled personalized-PageRank replay (registry q_graph_ppr,
    operators/graph.py personalized_pagerank): the TrustRank restart —
    reset mass lands ONLY on the BFS seed set — over the same
    symmetrized part—supplier graph as O_GRAPH_BFS (self-loops
    filtered). Integer fixed point exactly as _pagerank_oracle, so the
    engines agree bit-identically; final division is one exact-operand
    IEEE op."""
    sql = f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS src, l_suppkey + {SUPP_NODE_OFFSET} AS dst
  FROM lineitem
),
sym AS MATERIALIZED (
  SELECT s, d FROM (
    SELECT src AS s, dst AS d FROM e
    UNION
    SELECT dst AS s, src AS d FROM e
  ) WHERE s <> d
),
seeds AS MATERIALIZED (
  SELECT DISTINCT s_suppkey + {SUPP_NODE_OFFSET} AS id
  FROM supplier WHERE s_suppkey % {BFS_SEED_MOD} = 0
),
nodes AS MATERIALIZED (
  SELECT n.id,
         CAST(CASE WHEN sd.id IS NOT NULL THEN 150000 ELSE 0 END AS BIGINT)
           AS reset
  FROM (SELECT DISTINCT s AS id FROM sym) n
  LEFT JOIN seeds sd ON sd.id = n.id
),
deg AS MATERIALIZED (SELECT s, COUNT(*) AS outdeg FROM sym GROUP BY s),
r0 AS (SELECT id, (reset * 20) // 3 AS r FROM nodes),
"""
    for t in range(iters):
        sql += f"""c{t} AS (
  SELECT sym.d, SUM((r.r * 1000) // g.outdeg) AS s_c
  FROM sym JOIN r{t} r ON r.id = sym.s JOIN deg g ON g.s = sym.s
  GROUP BY sym.d
),
r{t + 1} AS MATERIALIZED (
  SELECT n.id,
         CAST(n.reset + (17 * COALESCE(c.s_c, 0)) // 20000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{t} c ON c.d = n.id
),
"""
    return (
        sql.rstrip().rstrip(",")
        + f"\nSELECT id AS node_id, r / 1000000.0 AS ppr FROM r{iters}"
    )


O_GRAPH_PPR = _ppr_oracle(PAGERANK_ITERS)


# Edit-distance fuzzy join (registry q_join_edit_distance,
# operators/fuzzy.py): the oracle is the BRUTE-FORCE pairwise
# levenshtein join over the same deterministically synthesized entity
# names (fixtures.FUZZY_* word wheels keyed on c_custkey — DuckDB 1-based
# list indexing), so row parity proves the PassJoin segment filter lost
# no pair — the dedup_ngram proof shape. DuckDB's `levenshtein` is the
# same classic insert/delete/substitute distance as Spark's built-in.
O_JOIN_EDIT_DISTANCE = f"""
WITH ent AS (
  SELECT DISTINCT c_custkey AS id FROM customer
  WHERE c_custkey < {FUZZY_MAX_KEY}
),
names AS (
  SELECT id,
         {_duck_list(FUZZY_W1)}[CAST(id % {len(FUZZY_W1)} AS INT) + 1]
         || '-' ||
         {_duck_list(FUZZY_W2)}[CAST(id % {len(FUZZY_W2)} AS INT) + 1]
         || '-' ||
         {_duck_list(FUZZY_W3)}[CAST(id % {len(FUZZY_W3)} AS INT) + 1]
           AS name
  FROM ent
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.id < b.id
WHERE levenshtein(a.name, b.name) <= {FUZZY_TAU}
"""


# Numeric RANGE frame (registry q_win_range_numeric): DuckDB's native
# RANGE BETWEEN n PRECEDING AND n FOLLOWING over the same BIGINT key;
# DECIMAL band sums make peer order unobservable.
O_WIN_RANGE_NUMERIC = """
SELECT l_orderkey, l_linenumber, l_partkey,
       CAST(l_quantity AS BIGINT) AS qty,
       COUNT(*) OVER w AS n_band,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w
                  AS DOUBLE), 2) AS band_rev
FROM lineitem WHERE l_partkey < 200
WINDOW w AS (PARTITION BY l_partkey ORDER BY CAST(l_quantity AS BIGINT)
             RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
"""


# Domain-mixture sampling (registry q_sample_mixture,
# operators/curation.py sample_mixture): integer-exact acceptance —
# ticket·W·n_d < T·w_d·1000 with W=10, T=300 — over the same md5
# ticket scheme as O_SAMPLE_STRATIFIED (salt ':r5').
O_SAMPLE_MIXTURE = """
WITH cnt AS (SELECT lang, COUNT(*) AS n_dom FROM documents GROUP BY lang),
t AS (
  SELECT d.doc_id, d.lang, d.source, c.n_dom,
         CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':r5'), 1, 8))::UBIGINT
              AS BIGINT) % 1000 AS ticket
  FROM documents d JOIN cnt c USING (lang)
)
SELECT doc_id, lang, source, ticket
FROM t
WHERE ticket * 10 * n_dom <
      300 * (CASE lang WHEN 'en' THEN 5 WHEN 'de' THEN 2
                       WHEN 'fr' THEN 1 WHEN 'zh' THEN 1
                       WHEN 'es' THEN 1 ELSE 0 END) * 1000
"""


# Watermark-gated late-data stream (registry q_stream_late_data,
# streaming/late.py): replay of the empirically-pinned batch-wise
# watermark cascade. Semantics (probed on Spark 4.1, boundaries
# included): the LATE filter in batch n drops rows with
# window_end <= wm computed from data through batch n−2; append
# EVICTION at batch n emits windows with window_end <= wm from data
# through n−1; availableNow then runs a trailing NO-DATA batch whose
# eviction applies the watermark from ALL data, so the final emitted
# set is exactly { windows with end <= wm(all data) } and each emitted
# window counts every filter-surviving row (a row for an
# already-evicted window can never pass the filter — eviction at n
# implies end <= filter_wm(n+1)). Watermarks are ms-truncated max
# event time minus the 2-day delay, exactly as Spark computes them.
O_STREAM_LATE_DATA = """
WITH ev AS (
  SELECT event_id, ts, event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-08' AND event_id % 2 = 0 THEN 0
              WHEN ts >= TIMESTAMP '2024-01-08'
                   AND ts < TIMESTAMP '2024-01-15' THEN 1
              WHEN ts >= TIMESTAMP '2024-01-15'
                   AND ts < TIMESTAMP '2024-01-22' THEN 2
              ELSE 3 END AS b
  FROM events
),
batch_max AS (SELECT b, MAX(ts) AS mx FROM ev GROUP BY b),
fw AS (
  SELECT e.b,
         date_trunc('milliseconds', MAX(m.mx)) - INTERVAL 2 DAY AS filter_wm
  FROM (SELECT DISTINCT b FROM ev) e
  LEFT JOIN batch_max m ON m.b <= e.b - 2
  GROUP BY e.b
),
kept AS (
  SELECT ev.event_id, ev.event_type, date_trunc('day', ev.ts) AS wstart
  FROM ev JOIN fw USING (b)
  WHERE fw.filter_wm IS NULL
     OR date_trunc('day', ev.ts) + INTERVAL 1 DAY > fw.filter_wm
),
final_wm AS (
  SELECT date_trunc('milliseconds', MAX(mx)) - INTERVAL 2 DAY AS wm
  FROM batch_max
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_ids
FROM kept CROSS JOIN final_wm
WHERE wstart + INTERVAL 1 DAY <= final_wm.wm
GROUP BY wstart, event_type
"""


# TPC-H Q2-style minimum-cost supplier (registry q_tpch_q2): observed
# MIN(l_extendedprice) per (partkey, suppkey) stands in for partsupp;
# the correlated MIN decorrelates as aggregate + rejoin on
# (part, cost = min). DECIMAL cost so the equality is exact.
O_TPCH_Q2 = """
WITH costs AS (
  SELECT l.l_partkey AS p_partkey, s.s_name, s.s_acctbal, n.n_name,
         MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD' AND p.p_size <= 10
  GROUP BY l.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
),
mins AS (
  SELECT p_partkey, MIN(cost) AS min_cost FROM costs GROUP BY p_partkey
)
SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey,
       CAST(c.cost AS DOUBLE) AS cost
FROM costs c JOIN mins m
  ON c.p_partkey = m.p_partkey AND c.cost = m.min_cost
ORDER BY c.s_acctbal DESC, c.n_name ASC, c.s_name ASC, c.p_partkey ASC
LIMIT 100
"""


# Fuzzy-dedup curation cascade (registry q_curate_fuzzy,
# operators/curation.py curate_corpus_fuzzy): the minhash-pair →
# jaccard ≥ 0.8 screen → recursive-CTE connected components replaces
# O_CURATE_CORPUS's exact-dedup keeper stage; everything downstream is
# the identical screen/sample/pack cascade (same literals as
# O_CURATE_CORPUS: min 15 tokens, doc_id % 41 eval split, ':r4' salt,
# src0 800 / src1 300 / else 500 per-mille, 256-token packs).
O_CURATE_FUZZY = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({O_DEDUP_MINHASH_PAIRS}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.8
  UNION
  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.8
),
verts AS (SELECT DISTINCT src AS id FROM edges),
walk(id, lbl) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.src, MIN(w.lbl) FROM edges e JOIN walk w ON w.id = e.dst
  GROUP BY e.src
),
comp AS (SELECT id, MIN(lbl) AS k FROM walk GROUP BY id),
keep AS (
  SELECT d.doc_id FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
  WHERE c.id IS NULL OR c.k = d.doc_id
),
longd AS (
  SELECT d.* FROM documents d JOIN keep USING (doc_id)
  WHERE len(string_split(lower(d.text), ' ')) >= 15
),
toks13 AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
grams13 AS (
  SELECT doc_id,
         CASE WHEN len(w) < 13 THEN []
              ELSE list_distinct(list_transform(
                range(len(w) - 12),
                i -> array_to_string(w[i + 1:i + 13], ' ')
              )) END AS g
  FROM toks13
),
eg AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams13 WHERE doc_id % 41 = 0
),
train AS (
  SELECT * FROM longd WHERE doc_id % 41 <> 0
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT g2.doc_id, unnest(g2.g) AS gram
        FROM grams13 g2 JOIN train USING (doc_id)) t
  JOIN eg USING (gram)
),
clean AS (
  SELECT * FROM train
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
sampled AS (
  SELECT * FROM clean
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r4'), 1, 8))::UBIGINT
             AS BIGINT) % 1000
        < CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 300 ELSE 500 END
),
st AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM sampled
)
SELECT doc_id, source, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / 256.0) AS BIGINT) AS pack_id
FROM st
"""


# TPC-H Q15-style top supplier (registry q_tpch_q15): revenue view +
# global-max scalar subquery, DECIMAL-exact equality join back.
O_TPCH_Q15 = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       ROUND(CAST(r.total AS DOUBLE), 2) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total = (SELECT MAX(total) FROM rev)
ORDER BY s.s_suppkey
"""


# TPC-H Q21-style waiting suppliers (registry q_tpch_q21): the oracle
# deliberately runs the TEXTBOOK correlated double EXISTS / NOT-EXISTS
# form — the Spark side runs the per-order-aggregate decorrelation, so
# the value-hash match proves the rewrite's equivalence on real data.
O_TPCH_Q21 = """
WITH j AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cand AS (
  SELECT DISTINCT j1.l_orderkey, j1.l_suppkey
  FROM j j1
  WHERE j1.late
    AND EXISTS (SELECT 1 FROM j j2
                WHERE j2.l_orderkey = j1.l_orderkey
                  AND j2.l_suppkey <> j1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM j j3
                    WHERE j3.l_orderkey = j1.l_orderkey
                      AND j3.l_suppkey <> j1.l_suppkey AND j3.late)
)
SELECT s.s_name, COUNT(*) AS numwait
FROM cand c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 20
"""


# Top-k tf-idf keywords per document (registry q_text_keywords,
# operators/curation.py keyword_tfidf): tf/df/N integers, division in
# double then ln — the same cross-engine ln determinism contract as the
# perplexity rows; ties break by term ASC.
O_TEXT_KEYWORDS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) AS tfidf_raw
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, df, tfidf_raw,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY ROUND(tfidf_raw, 6) DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       ROUND(tfidf_raw, 6) AS tfidf, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


# Time-RANGE window frame (registry q_win_range_frame): DuckDB's native
# RANGE INTERVAL frame vs Spark's epoch-seconds rangeBetween — identical
# peer semantics (RANGE includes all order-date ties); DECIMAL sums.
O_WIN_RANGE_FRAME = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
         AS rev_30d,
       COUNT(*) OVER w AS n_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
"""


# TPC-H Q13-style order-count distribution (registry q_tpch_q13):
# LEFT OUTER join keeps zero-order customers; two-level aggregate.
O_TPCH_Q13 = """
WITH counts AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS custdist
FROM counts GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# TPC-H Q11-style important stock (registry q_tpch_q11): HAVING
# against a scalar subquery — 1.5× the average per-part value,
# compared in exact DECIMAL/BIGINT via value·2·n_parts > total·3.
O_TPCH_Q11 = """
WITH value AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS v
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l.l_partkey
)
SELECT l_partkey, ROUND(CAST(v AS DOUBLE), 2) AS value
FROM value CROSS JOIN (SELECT SUM(v) AS total, COUNT(*) AS n_parts FROM value) t
WHERE v * 2 * t.n_parts > t.total * 3
ORDER BY value DESC, l_partkey ASC
"""


# Event-sequence funnel (registry q_seq_funnel): first 'view', first
# 'click' strictly after it, converted iff within 24 hours.
O_SEQ_FUNNEL = """
WITH fa AS (
  SELECT user_id, MIN(ts) AS ts_a FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
fb AS (
  SELECT e.user_id, MIN(e.ts) AS ts_b
  FROM events e JOIN fa ON e.user_id = fa.user_id
  WHERE e.event_type = 'click' AND e.ts > fa.ts_a
  GROUP BY e.user_id
)
SELECT fa.user_id,
       strftime(fa.ts_a, '%Y-%m-%d %H:%M:%S') AS first_view,
       strftime(fb.ts_b, '%Y-%m-%d %H:%M:%S') AS first_click_after,
       COALESCE(fb.ts_b <= fa.ts_a + INTERVAL 24 HOUR, FALSE) AS converted
FROM fa LEFT JOIN fb ON fa.user_id = fb.user_id
ORDER BY fa.user_id
"""


# UPDATE-mode watermarked windows (registry q_stream_late_update,
# streaming/late.py run_late_data_stream_update): per batch, every
# (window, type) group with ≥1 filter-surviving row emits its
# CUMULATIVE count/sum through that batch — the changelog multiset.
# Same empirically-pinned filter cascade as O_STREAM_LATE_DATA
# (filter watermark = ms-truncated max event time through batch n−2,
# minus 2 days; drop iff window_end <= wm); eviction drops state
# silently and emits nothing, and a no-data trailing batch emits
# nothing.
O_STREAM_LATE_UPDATE = """
WITH ev AS (
  SELECT event_id, ts, event_type,
         CASE WHEN event_id % 2 = 0 THEN 0
              WHEN ts < TIMESTAMP '2024-01-15' THEN 1
              ELSE 2 END AS b
  FROM events
),
batch_max AS (SELECT b, MAX(ts) AS mx FROM ev GROUP BY b),
fw AS (
  SELECT e.b,
         date_trunc('milliseconds', MAX(m.mx)) - INTERVAL 2 DAY AS filter_wm
  FROM (SELECT DISTINCT b FROM ev) e
  LEFT JOIN batch_max m ON m.b <= e.b - 2
  GROUP BY e.b
),
kept AS (
  SELECT ev.event_id, ev.event_type, ev.b,
         date_trunc('day', ev.ts) AS wstart
  FROM ev JOIN fw USING (b)
  WHERE fw.filter_wm IS NULL
     OR date_trunc('day', ev.ts) + INTERVAL 1 DAY > fw.filter_wm
),
per_batch AS (
  SELECT wstart, event_type, b,
         COUNT(*) AS nb, SUM(event_id) AS sb
  FROM kept GROUP BY wstart, event_type, b
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       CAST(SUM(nb) OVER (PARTITION BY wstart, event_type ORDER BY b) AS BIGINT)
         AS n,
       CAST(SUM(sb) OVER (PARTITION BY wstart, event_type ORDER BY b) AS BIGINT)
         AS sum_ids
FROM per_batch
"""


# Per-node triangle counts (registry q_graph_triangles, operators/
# graph.py triangle_counts): replays edge construction (part co-order
# pairs over l_quantity-thinned lineitem), degree orientation, the
# wedge join and the closing semi-join in plain SQL — BIGINT-exact, so
# parity is bit-identical and also proves the oriented enumeration
# found every triangle the unoriented definition implies.
O_GRAPH_TRIANGLES = f"""
WITH raw AS (
  SELECT a.l_partkey AS s, b.l_partkey AS d
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > {TRI_QTY_MIN} AND b.l_quantity > {TRI_QTY_MIN}
),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
  FROM raw WHERE s <> d
),
nodes AS MATERIALIZED (SELECT a AS id FROM und UNION SELECT b FROM und),
deg AS MATERIALIZED (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
  ) GROUP BY v
),
orient AS MATERIALIZED (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS lo,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS hi
  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b
),
tri AS (
  SELECT o1.lo AS x, o1.hi AS y, o2.hi AS z
  FROM orient o1 JOIN orient o2 ON o2.lo = o1.hi
  WHERE EXISTS (
    SELECT 1 FROM orient o3 WHERE o3.lo = o1.lo AND o3.hi = o2.hi
  )
),
corners AS (
  SELECT id, COUNT(*) AS t FROM (
    SELECT x AS id FROM tri
    UNION ALL SELECT y AS id FROM tri
    UNION ALL SELECT z AS id FROM tri
  ) GROUP BY id
)
SELECT n.id AS node_id, CAST(COALESCE(c.t, 0) AS BIGINT) AS triangles
FROM nodes n LEFT JOIN corners c ON c.id = n.id
"""


def _bfs_oracle(max_hops: int) -> str:
    """Unrolled multi-source BFS replay (registry q_graph_bfs,
    operators/graph.py bfs_hops): Bellman-Ford relaxation over the
    symmetrized part—supplier edge list, seeds at hop 0, one CTE pair
    per round — integer-exact, bit-identical parity."""
    k1 = max_hops + 1
    sql = f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS src, l_suppkey + {SUPP_NODE_OFFSET} AS dst
  FROM lineitem
),
sym AS MATERIALIZED (
  SELECT s, d FROM (
    SELECT src AS s, dst AS d FROM e
    UNION
    SELECT dst AS s, src AS d FROM e
  ) WHERE s <> d
),
d0 AS (
  SELECT DISTINCT s_suppkey + {SUPP_NODE_OFFSET} AS id,
         CAST(0 AS BIGINT) AS hops
  FROM supplier WHERE s_suppkey % {BFS_SEED_MOD} = 0
),
"""
    for t in range(max_hops):
        sql += f"""r{t} AS (
  SELECT sym.d, MIN(p.hops + 1) AS h
  FROM sym JOIN d{t} p ON p.id = sym.s
  GROUP BY sym.d
),
d{t + 1} AS MATERIALIZED (
  SELECT COALESCE(p.id, r.d) AS id,
         LEAST(COALESCE(p.hops, {k1}), COALESCE(r.h, {k1})) AS hops
  FROM d{t} p FULL OUTER JOIN r{t} r ON r.d = p.id
),
"""
    return (
        sql.rstrip().rstrip(",")
        + f"\nSELECT id AS node_id, CAST(hops AS BIGINT) AS hops FROM d{max_hops}"
    )


O_GRAPH_BFS = _bfs_oracle(BFS_MAX_HOPS)


# Exact-k weighted sampling via priority sampling (registry
# q_sample_priority, operators/curation.py sample_priority): same
# salted-md5 ticket scheme as O_SAMPLE_STRATIFIED mapped to [1, 2^20];
# priority = (w · 2^20) // ticket — TRUE integer division on both
# engines (Spark `div`, DuckDB `//`), exact BIGINT with no float op
# anywhere (ADVICE r7 #2). Ties break on ascending doc_id, so the
# k-set is unique.
O_SAMPLE_PRIORITY = f"""
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{PRIORITY_SALT}'), 1, 8))::UBIGINT
              AS BIGINT) % 1048576 + 1 AS ticket
  FROM documents
)
SELECT doc_id, n_chars, ticket,
       CAST((CAST(n_chars AS BIGINT) * 1048576) // ticket AS BIGINT) AS priority
FROM t
ORDER BY priority DESC, doc_id ASC
LIMIT {PRIORITY_K}
"""


# Z-order layout envelopes (registry q_layout_zorder, operators/
# layout.py zorder_envelopes): the Morton bit-spread as a CTE chain of
# the same shift/mask steps the Spark column expression applies —
# BIGINT-exact — then the identical per-bucket min/max aggregation.
O_LAYOUT_ZORDER = f"""
WITH z0 AS (
  SELECT l_partkey AS xr, l_suppkey AS yr,
         (l_partkey & 65535) AS x, (l_suppkey & 65535) AS y
  FROM lineitem
),
z1 AS (SELECT xr, yr, ((x | (x << 8)) & 16711935) AS x,
              ((y | (y << 8)) & 16711935) AS y FROM z0),
z2 AS (SELECT xr, yr, ((x | (x << 4)) & 252645135) AS x,
              ((y | (y << 4)) & 252645135) AS y FROM z1),
z3 AS (SELECT xr, yr, ((x | (x << 2)) & 858993459) AS x,
              ((y | (y << 2)) & 858993459) AS y FROM z2),
z4 AS (SELECT xr, yr, ((x | (x << 1)) & 1431655765) AS x,
              ((y | (y << 1)) & 1431655765) AS y FROM z3)
SELECT (x | (y << 1)) >> {2 * 16 - ZORDER_BUCKET_BITS} AS bucket,
       COUNT(*) AS n_rows,
       MIN(xr) AS x_min, MAX(xr) AS x_max,
       MIN(yr) AS y_min, MAX(yr) AS y_max
FROM z4 GROUP BY bucket
"""


# Pure interval-overlap join (registry q_join_interval, operators/
# relational.py interval_overlap_join): the oracle is the PLAIN
# inequality join — DuckDB's optimizer handles the small replay, while
# the Spark side must manufacture a hash key via grid cells; identical
# results prove the grid + ownership trick loses/invents nothing.
# All-integer interval bounds, exact parity.
O_JOIN_INTERVAL = f"""
WITH a AS (
  SELECT o_orderkey AS a_id,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS a_start,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              + o_orderkey % 30 AS BIGINT) AS a_end
  FROM orders WHERE o_orderkey % {IOJ_A_MOD} = 0
),
b AS (
  SELECT p_partkey AS b_id,
         CAST((p_partkey * 7) % 2400 AS BIGINT) AS b_start,
         CAST((p_partkey * 7) % 2400 + 10 + p_partkey % 45 AS BIGINT) AS b_end
  FROM part WHERE p_partkey % {IOJ_B_MOD} = 0
)
SELECT b_id, COUNT(*) AS n_overlaps,
       MIN(a_id) AS a_min, MAX(a_id) AS a_max
FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
GROUP BY b_id
"""


# Pruned rectangle query over the z-ordered LAYOUT (registry
# q_layout_zorder_pruned, operators/layout.py zorder_write →
# zorder_pruned_scan): physically the Spark side reads only the
# partition dirs whose Morton tile intersects ZORDER_BOX — the oracle
# replays the LOGICAL computation (same bit-spread chain, rectangle
# WHERE, per-bucket aggregate) because the layout changes the plan,
# not the answer (the vec_ivf_pruned precedent). Quantity sums go
# through DECIMAL(18,2) so the aggregate is order-insensitive exact.
O_LAYOUT_ZORDER_PRUNED = f"""
WITH z0 AS (
  SELECT l_partkey AS xr, l_suppkey AS yr,
         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         (l_partkey & 65535) AS x, (l_suppkey & 65535) AS y
  FROM lineitem
  WHERE l_partkey BETWEEN {ZORDER_BOX[0]} AND {ZORDER_BOX[1]}
    AND l_suppkey BETWEEN {ZORDER_BOX[2]} AND {ZORDER_BOX[3]}
),
z1 AS (SELECT xr, yr, qty, ((x | (x << 8)) & 16711935) AS x,
              ((y | (y << 8)) & 16711935) AS y FROM z0),
z2 AS (SELECT xr, yr, qty, ((x | (x << 4)) & 252645135) AS x,
              ((y | (y << 4)) & 252645135) AS y FROM z1),
z3 AS (SELECT xr, yr, qty, ((x | (x << 2)) & 858993459) AS x,
              ((y | (y << 2)) & 858993459) AS y FROM z2),
z4 AS (SELECT xr, yr, qty, ((x | (x << 1)) & 1431655765) AS x,
              ((y | (y << 1)) & 1431655765) AS y FROM z3)
SELECT (x | (y << 1)) >> {2 * 16 - ZORDER_BUCKET_BITS} AS z_bucket,
       COUNT(*) AS n_rows,
       ROUND(CAST(SUM(qty) AS DOUBLE), 2) AS sum_qty,
       MIN(xr) AS x_min, MAX(xr) AS x_max,
       MIN(yr) AS y_min, MAX(yr) AS y_max
FROM z4 GROUP BY z_bucket
"""


# Per-event sessionization (registry q_win_sessionize, operators/
# relational.py sessionize): lag + cumsum gaps-and-islands with integer
# epoch-second gap math and the (ts, event_id) total order — the same
# islands form as O_STREAM_SESSION_WINDOWS but emitting every event's
# (session_seq, event_seq) instead of the per-session aggregates.
O_WIN_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, ts, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
  FROM events
),
lagged AS (
  SELECT user_id, event_id, ts, es,
         CASE WHEN es - LAG(es) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 300
              THEN 1 ELSE 0 END AS ns
  FROM e
),
isl AS (
  SELECT user_id, event_id, ts,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM lagged
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(island + 1 AS BIGINT) AS session_seq,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id, island
                               ORDER BY ts, event_id) AS BIGINT) AS event_seq
FROM isl
"""


def _mmr_oracle(pool_size: int, k: int, lam: float) -> str:
    """Unrolled MMR greedy recursion (registry q_vec_mmr_rerank,
    operators/similarity.py mmr_rerank): pool by rounded cosine, pool²
    pairwise sims, then one CTE pair per greedy step — every argmax on
    (ROUND(score, 6) DESC, vec_id ASC), mirroring the Spark operator's
    determinism contract expression for expression."""
    one_m = 1.0 - lam
    sql = f"""
WITH q AS ({_ORACLE_QVEC}),
scored AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS simq
  FROM embeddings e, q
  WHERE e.vec_id <> {QUERY_VEC_ID}
),
pool AS MATERIALIZED (
  SELECT * FROM scored ORDER BY simq DESC, vec_id ASC LIMIT {pool_size}
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_cosine_similarity(a.v, b.v), 6) AS simp
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
s1 AS MATERIALIZED (
  SELECT vec_id, CAST(1 AS BIGINT) AS mmr_rank,
         ROUND({lam} * simq, 6) AS mmr_score
  FROM pool ORDER BY ROUND({lam} * simq, 6) DESC, vec_id ASC LIMIT 1
),
sel1 AS MATERIALIZED (SELECT vec_id FROM s1),
"""
    for t in range(2, k + 1):
        sql += f"""s{t} AS MATERIALIZED (
  SELECT p.vec_id, CAST({t} AS BIGINT) AS mmr_rank,
         ROUND({lam} * p.simq - {one_m} * m.maxp, 6) AS mmr_score
  FROM pool p
  JOIN (SELECT id_a, MAX(simp) AS maxp FROM pairs
        WHERE id_b IN (SELECT vec_id FROM sel{t - 1}) GROUP BY id_a) m
    ON m.id_a = p.vec_id
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
  ORDER BY mmr_score DESC, p.vec_id ASC LIMIT 1
),
sel{t} AS MATERIALIZED (SELECT vec_id FROM sel{t - 1} UNION ALL SELECT vec_id FROM s{t}),
"""
    sql = sql.rstrip().rstrip(",") + "\n"
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, mmr_rank, mmr_score FROM s{t}" for t in range(1, k + 1)
    )
    return sql + union


O_VEC_MMR_RERANK = _mmr_oracle(MMR_POOL, MMR_K, MMR_LAMBDA)


# Hourly forward-fill resampling (registry q_ts_resample, operators/
# timeseries.py resample_ffill): per-(user, hour) last observation via
# the (ts, event_id) total order, a generate_series grid over each
# user's span, LEFT JOIN + IGNORE NULLS running last_value for the
# fill. Values pass through from the shared parquet untouched.
O_TS_RESAMPLE = f"""
WITH ev AS (
  SELECT * FROM events WHERE user_id % {TS_USER_MOD} = 0
),
ranked AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
           AS n_obs
  FROM ev
),
obs AS (
  SELECT user_id, bucket, value AS v_last, n_obs FROM ranked WHERE rn = 1
),
grid AS (
  SELECT user_id,
         unnest(generate_series(date_trunc('hour', mn),
                                date_trunc('hour', mx),
                                INTERVAL 1 HOUR)) AS bucket
  FROM (SELECT user_id, MIN(ts) AS mn, MAX(ts) AS mx FROM ev
        GROUP BY user_id)
),
filled AS (
  SELECT g.user_id, g.bucket,
         last_value(o.v_last IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
         COALESCE(o.n_obs, 0) AS n_obs
  FROM grid g LEFT JOIN obs o
    ON o.user_id = g.user_id AND o.bucket = g.bucket
)
SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       ROUND(value_ff, 6) AS value_ff, CAST(n_obs AS BIGINT) AS n_obs
FROM filled
"""


# Count-min sketch frequency estimates (registry q_sketch_countmin,
# operators/sketch.py): the oracle replays the EXACT sketch — same
# salted-md5 hash rows, same d×w cells, same min-over-rows estimate —
# plus the true count per probe, so the row gates both the sketch
# arithmetic and the overestimate property (est ≥ exact always).
# All-BIGINT.
_O_CM_H = (
    "CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || "
    "CAST({item} AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % {w}"
)

O_SKETCH_COUNTMIN = f"""
WITH cells AS (
  SELECT r.i AS r,
         {_O_CM_H.format(item='user_id', w=256)} AS bucket,
         COUNT(*) AS cnt
  FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) r
  GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {{cm_mod}} = 0
),
pb AS (
  SELECT p.user_id, r.i AS r,
         {_O_CM_H.format(item='p.user_id', w=256)} AS bucket
  FROM probes p CROSS JOIN (SELECT unnest(range(4)) AS i) r
),
est AS (
  SELECT pb.user_id, MIN(COALESCE(c.cnt, 0)) AS est
  FROM pb LEFT JOIN cells c ON c.r = pb.r AND c.bucket = pb.bucket
  GROUP BY pb.user_id
),
ex AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events
  WHERE user_id % {{cm_mod}} = 0 GROUP BY user_id
)
SELECT e.user_id, e.est, x.exact_cnt
FROM est e JOIN ex x ON x.user_id = e.user_id
"""
O_SKETCH_COUNTMIN = O_SKETCH_COUNTMIN.replace("{cm_mod}", str(CM_PROBE_MOD))


# Join-key skew diagnostic (registry q_profile_skew, operators/
# relational.py profile_skew): per-key counts → top-N + single-row
# summary, all-BIGINT ratios via integer division.
O_PROFILE_SKEW = """
WITH c AS (
  SELECT event_type AS key_value, COUNT(*) AS cnt
  FROM events GROUP BY event_type
),
t AS (
  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         MAX(cnt) AS max_cnt FROM c
),
top AS (
  SELECT key_value, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, key_value ASC) AS rank
  FROM c ORDER BY cnt DESC, key_value ASC LIMIT 5
)
SELECT CAST(rank AS BIGINT) AS rank, key_value, cnt,
       CAST((cnt * 1000) // n_rows AS BIGINT) AS per_mille,
       n_keys,
       CAST((max_cnt * n_keys * 100) // n_rows AS BIGINT) AS skew_x100
FROM top CROSS JOIN t
"""


# Linear-interpolation resampling (registry q_ts_interpolate,
# operators/timeseries.py resample_interpolate): same obs/grid CTEs as
# O_TS_RESAMPLE, then prev/next observed (value, bucket-index) frames
# and the IDENTICAL IEEE interpolation expression the Spark side uses —
# integer index differences cast to double, one divide, one multiply,
# one add, 6dp display rounding. Index differences make any constant
# epoch offset cancel.
O_TS_INTERPOLATE = f"""
WITH ev AS (
  SELECT * FROM events WHERE user_id % {TS_USER_MOD} = 0
),
ranked AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
           AS n_obs
  FROM ev
),
obs AS (
  SELECT user_id, bucket, value AS v_last, n_obs FROM ranked WHERE rn = 1
),
grid AS (
  SELECT user_id,
         unnest(generate_series(date_trunc('hour', mn),
                                date_trunc('hour', mx),
                                INTERVAL 1 HOUR)) AS bucket
  FROM (SELECT user_id, MIN(ts) AS mn, MAX(ts) AS mx FROM ev
        GROUP BY user_id)
),
idxd AS (
  SELECT g.user_id, g.bucket, o.v_last, COALESCE(o.n_obs, 0) AS n_obs,
         CAST(FLOOR(epoch(g.bucket)) AS BIGINT) // 3600 AS i,
         CASE WHEN o.v_last IS NOT NULL
              THEN CAST(FLOOR(epoch(g.bucket)) AS BIGINT) // 3600 END AS oi
  FROM grid g LEFT JOIN obs o
    ON o.user_id = g.user_id AND o.bucket = g.bucket
),
framed AS (
  SELECT user_id, bucket, v_last, n_obs, i,
         last_value(v_last IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
         last_value(oi IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ip,
         first_value(v_last IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
         first_value(oi IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS i_n
  FROM idxd
)
SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(FLOOR((CASE WHEN v_last IS NOT NULL THEN v_last
                        ELSE vp + (vn - vp) * (CAST(i - ip AS DOUBLE)
                                               / CAST(i_n - ip AS DOUBLE))
                        END) * 1000000 + 0.5) AS BIGINT) AS value_li_e6,
       CAST(n_obs AS BIGINT) AS n_obs
FROM framed
"""


def _lpa_oracle(iters: int) -> str:
    """Unrolled synchronous label propagation (registry q_graph_lpa,
    operators/graph.py label_propagation): per round a neighbor-label
    count and a ROW_NUMBER argmax (cnt DESC, label ASC) — integer-exact,
    bit-identical parity. Edge build shared with O_GRAPH_TRIANGLES."""
    sql = f"""
WITH raw AS (
  SELECT a.l_partkey AS s, b.l_partkey AS d
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > {TRI_QTY_MIN} AND b.l_quantity > {TRI_QTY_MIN}
),
sym AS MATERIALIZED (
  SELECT DISTINCT s, d FROM (
    SELECT s, d FROM raw UNION ALL SELECT d AS s, s AS d FROM raw
  ) WHERE s <> d
),
nodes AS MATERIALIZED (SELECT DISTINCT s AS id FROM sym),
l0 AS (SELECT id, id AS label FROM nodes),
"""
    for t in range(iters):
        sql += f"""c{t} AS (
  SELECT sym.d, l.label, COUNT(*) AS cnt
  FROM sym JOIN l{t} l ON l.id = sym.s
  GROUP BY sym.d, l.label
),
l{t + 1} AS MATERIALIZED (
  SELECT d AS id, label FROM (
    SELECT d, label,
           ROW_NUMBER() OVER (PARTITION BY d ORDER BY cnt DESC, label ASC)
             AS rn
    FROM c{t}
  ) WHERE rn = 1
),
"""
    return (
        sql.rstrip().rstrip(",")
        + f"\nSELECT id AS node_id, label FROM l{iters}"
    )


O_GRAPH_LPA = _lpa_oracle(LPA_ITERS)


def _profile_oracle(int_cols: tuple, str_cols: tuple) -> str:
    """Per-column profile replay (registry q_profile_table, operators/
    relational.py profile_columns): one UNION ALL branch per column —
    COUNT(col) is the non-null count, n_null the complement, exact
    COUNT(DISTINCT), min/max as strings (BIGINT/string columns only;
    engine-exact string forms)."""
    branches = []
    for c in (*int_cols, *str_cols):
        branches.append(f"""SELECT '{c}' AS "column",
       COUNT({c}) AS n,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM lineitem""")
    return "\nUNION ALL\n".join(branches)


O_PROFILE_TABLE = _profile_oracle(
    ("l_orderkey", "l_partkey", "l_suppkey"),
    ("l_returnflag", "l_linestatus"),
)


# Weakly-connected components over the co-order part graph (registry
# q_graph_cc): the dedup_assign oracle convention — bounded grouped-MIN
# recursion (min-label propagation, the Spark operator's own fixed
# point) over MATERIALIZED edges; component_id = component min id.
O_GRAPH_CC = f"""
WITH RECURSIVE raw AS MATERIALIZED (
  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > {TRI_QTY_MIN} AND b.l_quantity > {TRI_QTY_MIN}
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM raw
  UNION
  SELECT id_b, id_a FROM raw
),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
walk(id, lbl) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.src, MIN(w.lbl) FROM edges e JOIN walk w ON w.id = e.dst
  GROUP BY e.src
),
comp AS (SELECT id, MIN(lbl) AS k FROM walk GROUP BY id)
SELECT v.id AS node_id, COALESCE(c.k, v.id) AS component_id
FROM verts v LEFT JOIN comp c ON v.id = c.id
"""


# HyperLogLog distinct-count sketch (registry q_sketch_hll,
# operators/sketch.py hll_build/hll_estimate; Flajolet et al. 2007):
# full register replay — md5-hex→BIGINT 32-bit hash, bottom-10-bit
# register, rho via length(bin(suffix)), per-register MAX, exact BIGINT
# z_num, ONE float division by the Python-folded alpha·m²·2^(Q+1)
# literal (identical IEEE op sequence to the Spark side), linear
# counting below 2.5·m.
_HLL_M = 1 << sketch_ops.HLL_P
_HLL_Q = sketch_ops.HLL_BITS - sketch_ops.HLL_P
O_SKETCH_HLL = f"""
WITH h AS (
  SELECT l_returnflag,
         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS _h
  FROM lineitem
),
regs AS (
  SELECT l_returnflag, _h % {_HLL_M} AS register,
         MAX(CASE WHEN _h // {_HLL_M} = 0 THEN {_HLL_Q + 1}
                  ELSE {_HLL_Q} - length(bin(_h // {_HLL_M})) + 1 END) AS rho
  FROM h GROUP BY 1, 2
),
g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS INT) AS n_set,
         CAST({_HLL_M} - COUNT(*) AS INT) AS zeros,
         CAST(({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {_HLL_Q + 1})
           + SUM(CAST(1 AS BIGINT) << ({_HLL_Q + 1} - rho)) AS BIGINT) AS z_num
  FROM regs GROUP BY 1
),
est AS (
  SELECT l_returnflag, n_set, zeros, z_num,
         round(CASE WHEN ({sketch_ops.hll_alpha_num()!r} / z_num) <= {2.5 * _HLL_M}
                         AND zeros > 0
                    THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / zeros)
                    ELSE {sketch_ops.hll_alpha_num()!r} / z_num END, 4) AS hll_est
  FROM g
),
ex AS (
  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders
  FROM lineitem GROUP BY 1
)
SELECT e.l_returnflag, e.n_set, e.zeros, e.z_num, e.hll_est,
       x.exact_orders,
       abs(e.hll_est - x.exact_orders) <= 0.2 * x.exact_orders AS within_band
FROM est e JOIN ex x USING (l_returnflag)
"""


# Content-based MIME sniff (registry q_src_sniff_magic, operators/
# ingest.py sniff_mime — the libmagic verdict as hex-prefix CASE): the
# oracle rebuilds the identical container hex (lane header + hex(text))
# and replays every magic rule, the EPUB offset-30 'mimetype' check,
# the printable-ASCII fallback (uppercase-hex lexicographic order ==
# numeric byte order), and the content-first routing.
O_SRC_SNIFF_MAGIC = """
WITH c AS (
  SELECT doc_id,
         CASE CAST(doc_id % 8 AS INT)
           WHEN 0 THEN '255044462D312E34' || hex(text)
           WHEN 1 THEN '89504E470D0A1A0A' || hex(text)
           WHEN 2 THEN 'FFD8FFE000104A464946' || hex(text)
           WHEN 3 THEN '1F8B0800' || hex(text)
           WHEN 4 THEN '504B030400000000000000000000000000000000000000000000000000006D696D65747970656170706C69636174696F6E2F657075622B7A6970' || hex(text)
           WHEN 5 THEN '504B03040000000000000000000000000000000000000000000000000000636F6E74656E742E786D6C' || hex(text)
           WHEN 6 THEN '3C21444F43545950452068746D6C3E3C703E' || hex(text)
           WHEN 7 THEN hex(text)
         END AS hx,
         CASE CAST((doc_id // 8) % 4 AS INT)
           WHEN 0 THEN 'text/plain'
           WHEN 1 THEN 'application/epub+zip'
           WHEN 2 THEN 'text/markdown'
           ELSE 'application/octet-stream'
         END AS ext_mime
  FROM documents
),
s AS (
  SELECT doc_id, ext_mime,
    CASE
      WHEN starts_with(hx, '504B0304') THEN
        CASE WHEN substr(hx, 61, 56) = '6D696D65747970656170706C69636174696F6E2F657075622B7A6970'
             THEN 'application/epub+zip' ELSE 'application/zip' END
      WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'image/png'
      WHEN starts_with(hx, '255044462D') THEN 'application/pdf'
      WHEN starts_with(hx, 'FFD8FF') THEN 'image/jpeg'
      WHEN starts_with(hx, '1F8B') THEN 'application/gzip'
      WHEN starts_with(hx, '3C21444F43545950452068746D6C')
        OR starts_with(hx, '3C68746D6C') THEN 'text/html'
      WHEN substr(hx, 1, 2) IN ('09', '0A', '0D')
        OR (substr(hx, 1, 2) >= '20' AND substr(hx, 1, 2) <= '7E')
        THEN 'text/plain'
      ELSE 'application/octet-stream'
    END AS content_mime
  FROM c
)
SELECT doc_id, ext_mime, content_mime,
       content_mime <> ext_mime AS mismatch,
       CASE WHEN content_mime = 'text/plain' THEN 'ready'
            WHEN content_mime = 'application/epub+zip' THEN 'convert'
            ELSE 'rejected' END AS route
FROM s
"""


# SQ8 scalar-quantization top-k (registry q_vec_sq8_topk, operators/
# ann.py sq8_topk): the oracle independently retrains the per-dimension
# bounds, re-quantizes the corpus with the identical left-associated
# float op sequence, decodes, and re-scores the FLOAT query against the
# decoded values with the same strict left fold (ADC — a raw uint8 dot
# is not order-preserving) — any divergence in bounds, codes, decode,
# or fold order hash-mismatches.
O_VEC_SQ8_TOPK = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
d AS (SELECT unnest(range(1, 65)) AS i),
pb AS (
  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
  FROM e CROSS JOIN d GROUP BY i
),
b AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM pb),
qn AS (
  SELECT e.vec_id, e.label,
         list_transform(range(1, 65), i ->
           COALESCE(CAST(least(255.0, greatest(0.0,
             floor((v[i] - b.mn[i]) * 255.0
                   / nullif(b.mx[i] - b.mn[i], 0.0)))) AS INT), 0)) AS q
  FROM e CROSS JOIN b
),
dec AS (
  SELECT qn.vec_id, qn.label,
         list_transform(range(1, 65), i ->
           b.mn[i] + CAST(q[i] AS DOUBLE) * ((b.mx[i] - b.mn[i]) / 255.0)) AS dv
  FROM qn CROSS JOIN b
),
qv AS (SELECT v FROM e WHERE vec_id = 0),
scored AS (
  SELECT n.vec_id, n.label,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(range(1, 65), i -> qv.v[i] * n.dv[i])),
           (acc, x) -> acc + x) AS s
  FROM dec n CROSS JOIN qv
)
SELECT vec_id, label, round(s, 6) AS sq8_score
FROM scored
ORDER BY s DESC, vec_id
LIMIT 10
"""


# DSIR importance weights (registry q_text_dsir, operators/curation.py
# dsir_weights; Xie et al. 2023): the oracle replays hashed-bigram
# buckets (md5-hex→BIGINT bridge), both smoothed bucket distributions,
# the per-bucket log ratio, and the position-ordered per-document fold.
O_TEXT_DSIR = """
WITH toks AS (
  SELECT doc_id, source IN ('src0', 'src1', 'src2', 'src3') AS is_t,
         string_split(lower(text), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, is_t, CAST(u.i AS INT) AS pos,
         CAST(('0x' || substr(md5(t[u.i - 1] || ' ' || t[u.i]), 1, 8))::UBIGINT AS BIGINT)
           % 4096 AS bucket
  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(2, len(t) + 1)) AS i) u
  WHERE len(t) >= 2
),
tc AS (SELECT bucket, COUNT(*) AS ct FROM grams WHERE is_t GROUP BY bucket),
rc AS (SELECT bucket, COUNT(*) AS cr FROM grams WHERE NOT is_t GROUP BY bucket),
tt AS (SELECT COUNT(*) AS n FROM grams WHERE is_t),
rt AS (SELECT COUNT(*) AS n FROM grams WHERE NOT is_t),
ratios AS (
  SELECT bucket,
         ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / CAST(tt.n + 4096 AS DOUBLE))
         - ln(CAST(COALESCE(cr, 0) + 1 AS DOUBLE) / CAST(rt.n + 4096 AS DOUBLE)) AS lr
  FROM tc FULL JOIN rc USING (bucket) CROSS JOIN tt CROSS JOIN rt
),
scored AS (
  SELECT g.doc_id, g.pos, r.lr
  FROM grams g JOIN ratios r USING (bucket)
  WHERE NOT g.is_t
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         list_sum(list(lr ORDER BY pos)) AS w
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, ROUND(w, 6) AS dsir_logw
FROM agg ORDER BY w DESC, doc_id LIMIT 50
"""


# CCNet head/middle/tail perplexity terciles (registry
# q_text_ccnet_buckets; Wenzek et al. 2020 §4.3): the bigram-LM score
# chain of O_TEXT_PERPLEXITY verbatim, then NTILE(3) over the rounded
# score with doc_id tiebreak — both engines window over bit-identical
# 6dp doubles, and NTILE's ±1 width contract is deterministic given a
# total order.
O_TEXT_CCNET_BUCKETS = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos, t[u.i] AS w,
         CASE WHEN u.i = 1 THEN NULL ELSE t[u.i - 1] END AS wp
  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
),
uni AS (SELECT w, COUNT(*) AS cw FROM pos GROUP BY w),
tot AS (SELECT SUM(cw) AS n FROM uni),
uni_lm AS (
  SELECT w, CAST(cw AS DOUBLE) / CAST(n AS DOUBLE) AS pu FROM uni CROSS JOIN tot
),
bi AS (SELECT wp, w, COUNT(*) AS cb FROM pos WHERE wp IS NOT NULL GROUP BY wp, w),
ctx AS (SELECT wp, SUM(cb) AS cctx FROM bi GROUP BY wp),
bi_lm AS (
  SELECT b.wp, b.w, CAST(b.cb AS DOUBLE) / CAST(c.cctx AS DOUBLE) AS pb
  FROM bi b JOIN ctx c USING (wp)
),
scored AS (
  SELECT p.doc_id, p.pos,
         CASE WHEN p.wp IS NULL THEN ln(u.pu)
              ELSE ln(0.75 * COALESCE(b.pb, 0.0) + 0.25 * u.pu) END AS logp
  FROM pos p JOIN uni_lm u USING (w)
  LEFT JOIN bi_lm b ON b.wp = p.wp AND b.w = p.w
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         ROUND(list_sum(list(logp ORDER BY pos)) / COUNT(*), 6) AS avg_logp
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_tokens, avg_logp,
       (['head', 'middle', 'tail'])[
         NTILE(3) OVER (ORDER BY avg_logp DESC, doc_id)] AS bucket
FROM agg
"""


# Binary-quantization top-k (registry q_vec_bq_topk, operators/ann.py
# bq_topk — the BQ + exact-rescore serving pattern): sign-bit pack of
# corpus and query replayed in SQL (same > 0 rule on the same stored
# doubles), integer Hamming shortlist of 50 with id tiebreak, exact
# cosine re-rank @6dp of the shortlist down to 10.
O_VEC_BQ_TOPK = f"""
WITH q AS ({_ORACLE_QVEC}),
qp AS (
  SELECT CAST(list_sum(list_transform(range(0, 32), i -> CASE WHEN qv[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - 0)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS qlo,
         CAST(list_sum(list_transform(range(32, 64), i -> CASE WHEN qv[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS qhi
  FROM q
),
packed AS (
  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v,
         CAST(list_sum(list_transform(range(0, 32), i -> CASE WHEN (CAST(e.embedding AS DOUBLE[]))[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - 0)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
         CAST(list_sum(list_transform(range(32, 64), i -> CASE WHEN (CAST(e.embedding AS DOUBLE[]))[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
  FROM embeddings e
),
short AS (
  SELECT p.vec_id, p.label, p.v,
         CAST(bit_count(xor(p.lo, qp.qlo))
              + bit_count(xor(p.hi, qp.qhi)) AS INT) AS hamming
  FROM packed p, qp
  ORDER BY hamming ASC, p.vec_id ASC LIMIT 50
)
SELECT s.vec_id, s.label, s.hamming,
       ROUND(list_cosine_similarity(s.v, q.qv), 6) AS bq_score
FROM short s, q
ORDER BY bq_score DESC, s.vec_id ASC LIMIT 10
"""


# IVF-SQ8 pruned probe (registry q_vec_ivfsq_pruned, operators/ann.py
# ivfsq_write/ivfsq_topk_pruned): the O_VEC_IVF_TOPK assignment/probe
# chain composed with the O_VEC_SQ8_TOPK bounds/quantize/decode/fold
# chain, restricted to the probed clusters.
O_VEC_IVFSQ_PRUNED = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT e2.vec_id,
         arg_max(c.cid, list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]), c.cv)) AS cluster
  FROM embeddings e2 CROSS JOIN c GROUP BY e2.vec_id
),
topc AS (
  SELECT c.cid FROM c, q
  ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid ASC LIMIT 4
),
d AS (SELECT unnest(range(1, 65)) AS i),
pb AS (
  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
  FROM e CROSS JOIN d GROUP BY i
),
b AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM pb),
cand AS (
  SELECT e.vec_id, e.v FROM e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN topc t ON a.cluster = t.cid
),
qn AS (
  SELECT cand.vec_id,
         list_transform(range(1, 65), i ->
           COALESCE(CAST(least(255.0, greatest(0.0,
             floor((v[i] - b.mn[i]) * 255.0
                   / nullif(b.mx[i] - b.mn[i], 0.0)))) AS INT), 0)) AS cq
  FROM cand CROSS JOIN b
),
dec AS (
  SELECT qn.vec_id,
         list_transform(range(1, 65), i ->
           b.mn[i] + CAST(cq[i] AS DOUBLE) * ((b.mx[i] - b.mn[i]) / 255.0)) AS dv
  FROM qn CROSS JOIN b
),
scored AS (
  SELECT n.vec_id,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(range(1, 65), i -> qv.v[i] * n.dv[i])),
           (acc, x) -> acc + x) AS s
  FROM dec n CROSS JOIN (SELECT qv AS v FROM q) qv
)
SELECT vec_id, ROUND(s, 6) AS sq8_score,
       CAST(ROW_NUMBER() OVER (ORDER BY s DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY s DESC, vec_id ASC LIMIT 10
"""


# SCD2 dimension maintenance (registry q_scd2_apply, operators/write.py
# scd2_apply): the oracle rebuilds the seeded dimension and change
# batch, takes the same three per-key verdicts through one full join of
# the current slice, and unions history + untouched + closed + opened.
O_SCD2_APPLY = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal,
         '1992-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
         TRUE AS is_current
  FROM customer
),
hist AS (
  SELECT c_custkey, 'OLD ' || c_name AS c_name, c_acctbal,
         '1990-01-01' AS valid_from, '1992-01-01' AS valid_to,
         FALSE AS is_current
  FROM customer WHERE c_custkey % 13 = 0
),
changes AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal
  FROM customer WHERE c_custkey % 7 = 1
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW ' || c_name, c_acctbal
  FROM customer WHERE c_custkey % 7 = 2
),
j AS (
  SELECT cur.c_custkey AS k, cur.c_name AS nm, cur.c_acctbal AS bal,
         cur.valid_from AS vf, cur.valid_to AS vt, cur.is_current AS ic,
         ch.c_custkey AS bk, ch.c_name AS bnm, ch.c_acctbal AS bbal,
         (cur.c_custkey IS NOT NULL AND ch.c_custkey IS NOT NULL) AS matched,
         (cur.c_name IS NOT DISTINCT FROM ch.c_name
          AND cur.c_acctbal IS NOT DISTINCT FROM ch.c_acctbal) AS same
  FROM base cur FULL JOIN changes ch ON cur.c_custkey = ch.c_custkey
)
SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to, is_current
FROM (
  SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
         valid_from, valid_to, is_current
  FROM hist
  UNION ALL
  SELECT k, nm, ROUND(bal, 2), vf, vt, ic FROM j
  WHERE bk IS NULL OR (matched AND same)
  UNION ALL
  SELECT k, nm, ROUND(bal, 2), vf, '1995-06-01', FALSE FROM j
  WHERE matched AND NOT same
  UNION ALL
  SELECT bk, bnm, ROUND(bbal, 2), '1995-06-01', CAST(NULL AS VARCHAR), TRUE
  FROM j WHERE (matched AND NOT same) OR k IS NULL
)
"""


# HLL set algebra (registry q_sketch_hll_algebra): the oracle rebuilds
# both register tables, MAX-merges them for the union, replays all
# three estimates, and recomputes the exact per-order flag sets.
O_SKETCH_HLL_ALGEBRA = """
WITH ra_h AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS _h
  FROM lineitem WHERE l_returnflag = 'R'
),
ra AS (
  SELECT _h % 1024 AS register,
         MAX(CASE WHEN _h // 1024 = 0 THEN 23
                  ELSE 22 - length(bin(_h // 1024)) + 1 END) AS rho
  FROM ra_h GROUP BY 1
),
rb_h AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS _h
  FROM lineitem WHERE l_returnflag = 'N'
),
rb AS (
  SELECT _h % 1024 AS register,
         MAX(CASE WHEN _h // 1024 = 0 THEN 23
                  ELSE 22 - length(bin(_h // 1024)) + 1 END) AS rho
  FROM rb_h GROUP BY 1
),
ru AS (
  SELECT register, MAX(rho) AS rho FROM (
    SELECT * FROM ra UNION ALL SELECT * FROM rb
  ) GROUP BY register
),
ea AS (
  SELECT round(CASE WHEN (6337943536492.971 / z_num) <= 2560.0 AND zeros > 0
                    THEN 1024.0 * ln(1024.0 / zeros)
                    ELSE 6337943536492.971 / z_num END, 4) AS est
  FROM (
    SELECT CAST(1024 - COUNT(*) AS INT) AS zeros,
           CAST((1024 - COUNT(*)) * (CAST(1 AS BIGINT) << 23)
             + SUM(CAST(1 AS BIGINT) << (23 - rho)) AS BIGINT) AS z_num
    FROM ra
  )
),
eb AS (
  SELECT round(CASE WHEN (6337943536492.971 / z_num) <= 2560.0 AND zeros > 0
                    THEN 1024.0 * ln(1024.0 / zeros)
                    ELSE 6337943536492.971 / z_num END, 4) AS est
  FROM (
    SELECT CAST(1024 - COUNT(*) AS INT) AS zeros,
           CAST((1024 - COUNT(*)) * (CAST(1 AS BIGINT) << 23)
             + SUM(CAST(1 AS BIGINT) << (23 - rho)) AS BIGINT) AS z_num
    FROM rb
  )
),
eu AS (
  SELECT round(CASE WHEN (6337943536492.971 / z_num) <= 2560.0 AND zeros > 0
                    THEN 1024.0 * ln(1024.0 / zeros)
                    ELSE 6337943536492.971 / z_num END, 4) AS est
  FROM (
    SELECT CAST(1024 - COUNT(*) AS INT) AS zeros,
           CAST((1024 - COUNT(*)) * (CAST(1 AS BIGINT) << 23)
             + SUM(CAST(1 AS BIGINT) << (23 - rho)) AS BIGINT) AS z_num
    FROM ru
  )
),
flags AS (
  SELECT l_orderkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS b
  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY l_orderkey
),
ex AS (
  SELECT CAST(SUM(a) AS BIGINT) AS exact_a, CAST(SUM(b) AS BIGINT) AS exact_b,
         COUNT(*) AS exact_union,
         CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
  FROM flags
)
SELECT ea.est AS est_a, eb.est AS est_b, eu.est AS est_union,
       round(ea.est + eb.est - eu.est, 4) AS est_inter,
       exact_a, exact_b, exact_union, exact_inter,
       abs(ea.est + eb.est - eu.est - exact_inter) <= 0.15 * exact_union AS within_band
FROM ea CROSS JOIN eb CROSS JOIN eu CROSS JOIN ex
"""


# Pearson correlation profiling (registry q_profile_corr): the oracle
# replays the exact cent-integer moments (HUGEINT sums cast to
# DECIMAL(38,0) parity with Spark's decimal accumulators) and the same
# 6-op double formula.
O_PROFILE_CORR = """
WITH ints AS (
  SELECT CAST(round(l_quantity * 100) AS HUGEINT) AS q,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS p,
         CAST(round(l_discount * 100) AS HUGEINT) AS d
  FROM lineitem
),
m AS (
  SELECT COUNT(*) AS n,
         SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd,
         SUM(q * q) AS sqq, SUM(p * p) AS spp, SUM(d * d) AS sdd,
         SUM(q * p) AS sqp, SUM(q * d) AS sqd, SUM(p * d) AS spd
  FROM ints
)
SELECT u.pair, n,
       round((CAST(n AS DOUBLE) * CAST(u.sxy AS DOUBLE)
              - CAST(u.sx AS DOUBLE) * CAST(u.sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(u.sxx AS DOUBLE)
                     - CAST(u.sx AS DOUBLE) * CAST(u.sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(u.syy AS DOUBLE)
                       - CAST(u.sy AS DOUBLE) * CAST(u.sy AS DOUBLE))), 6)
         AS corr_r
FROM m, LATERAL (
  SELECT unnest([
    {'pair': 'quantity_price',    'sx': sq, 'sy': sp, 'sxy': sqp, 'sxx': sqq, 'syy': spp},
    {'pair': 'quantity_discount', 'sx': sq, 'sy': sd, 'sxy': sqd, 'sxx': sqq, 'syy': sdd},
    {'pair': 'price_discount',    'sx': sp, 'sy': sd, 'sxy': spd, 'sxx': spp, 'syy': sdd}
  ], recursive := true)
) u
"""



def _mmr_step_ctes(k: int, lam: float) -> tuple[str, str]:
    """The unrolled MMR greedy steps of ``_mmr_oracle`` as a reusable
    fragment: returns (step CTE text expecting existing ``pool``/
    ``pairs`` CTEs, the UNION ALL select over s1..sk). Used by the
    composed O_RAG_HYBRID_PROMPTS where the pool comes from the RRF
    fusion rather than a global cosine top-N."""
    one_m = 1.0 - lam
    sql = f"""s1 AS MATERIALIZED (
  SELECT vec_id, CAST(1 AS BIGINT) AS mmr_rank,
         ROUND({lam} * simq, 6) AS mmr_score
  FROM pool ORDER BY ROUND({lam} * simq, 6) DESC, vec_id ASC LIMIT 1
),
sel1 AS MATERIALIZED (SELECT vec_id FROM s1),
"""
    for t in range(2, k + 1):
        sql += f"""s{t} AS MATERIALIZED (
  SELECT p.vec_id, CAST({t} AS BIGINT) AS mmr_rank,
         ROUND({lam} * p.simq - {one_m} * m.maxp, 6) AS mmr_score
  FROM pool p
  JOIN (SELECT id_a, MAX(simp) AS maxp FROM pairs
        WHERE id_b IN (SELECT vec_id FROM sel{t - 1}) GROUP BY id_a) m
    ON m.id_a = p.vec_id
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
  ORDER BY mmr_score DESC, p.vec_id ASC LIMIT 1
),
sel{t} AS MATERIALIZED (SELECT vec_id FROM sel{t - 1} UNION ALL SELECT vec_id FROM s{t}),
"""
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, mmr_rank FROM s{t}" for t in range(1, k + 1)
    )
    return sql, union


_HYBRID_STEPS, _HYBRID_UNION = _mmr_step_ctes(5, 0.5)
_HYBRID_HEADER = "Answer the question using the retrieved context.\n\n"


# Modernized end-to-end read path (registry q_rag_hybrid_prompts):
# RRF fusion (dense+sparse, query doc excluded from both lists) ->
# 10-doc pool -> unrolled MMR k=5 -> byte-exact prompt assembly.
O_RAG_HYBRID_PROMPTS = f"""
WITH q AS ({_ORACLE_QVEC}),
dense_hits AS (
  SELECT e.vec_id AS doc_id, {_ORACLE_SIM} AS sim
  FROM embeddings e, q WHERE e.vec_id <> {QUERY_VEC_ID}
  ORDER BY sim DESC, e.vec_id ASC LIMIT 15
),
dense AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
      ORDER BY ROUND(sim, 6) DESC, doc_id ASC) AS INT) AS rank_dense
  FROM dense_hits
),
sparse AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
      ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank_sparse
  FROM ({_o_bm25(curation_ops.BM25_TERMS, curation_ops.BM25_K1,
                 curation_ops.BM25_B, 15,
                 where=f"WHERE doc_id <> {QUERY_VEC_ID}")}) b
),
fused AS MATERIALIZED (
  SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id
  FROM dense d FULL OUTER JOIN sparse s ON d.doc_id = s.doc_id
  ORDER BY CAST(COALESCE(1000000000 // (60 + d.rank_dense), 0)
              + COALESCE(1000000000 // (60 + s.rank_sparse), 0) AS BIGINT) DESC,
           COALESCE(d.doc_id, s.doc_id) ASC
  LIMIT 10
),
pool AS MATERIALIZED (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS simq
  FROM embeddings e JOIN fused f ON e.vec_id = f.doc_id, q
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_cosine_similarity(a.v, b.v), 6) AS simp
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
{_HYBRID_STEPS}sel AS ({_HYBRID_UNION}),
ex AS (
  SELECT s.mmr_rank,
         'Excerpt ' || CAST(s.mmr_rank AS VARCHAR) || ' (doc '
           || CAST(d.doc_id AS VARCHAR) || ', ' || d.source || '): '
           || d.text AS line
  FROM sel s JOIN documents d ON d.doc_id = s.vec_id
)
SELECT CAST(COUNT(*) AS INT) AS n_context,
       '{_HYBRID_HEADER}' || string_agg(line, '\n\n' ORDER BY mmr_rank)
         AS prompt
FROM ex
"""


# Embedding-space outlier scoring (registry q_vec_ood_score): the
# oracle replays seed-centroid assignment, 6dp-rounded scaled sims,
# exact HUGEINT cluster moments, and the one-double z formula.
O_VEC_OOD_SCORE = """
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
assign AS (
  SELECT e.vec_id,
         arg_max(c.cid, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)) AS cluster
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id
),
sims AS (
  SELECT a.vec_id, a.cluster,
         CAST(floor(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 6)
              * 1000000 + 0.5) AS BIGINT) AS sim_scaled
  FROM assign a
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN c ON c.cid = a.cluster
),
mom AS (
  SELECT cluster, COUNT(*) AS n,
         CAST(SUM(sim_scaled) AS BIGINT) AS s1,
         CAST(SUM(sim_scaled * sim_scaled) AS BIGINT) AS s2
  FROM sims GROUP BY cluster
)
SELECT s.vec_id, s.cluster, s.sim_scaled,
       round(CAST(n * s.sim_scaled - s1 AS DOUBLE)
             / nullif(sqrt(CAST(CAST(n AS HUGEINT) * s2
                           - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)), 0.0), 4)
         AS z,
       COALESCE(CAST(n * s.sim_scaled - s1 AS DOUBLE)
                / nullif(sqrt(CAST(CAST(n AS HUGEINT) * s2
                              - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)), 0.0)
                < -2.0, FALSE) AS is_outlier
FROM sims s JOIN mom USING (cluster)
"""


# Rolling z-score anomaly detection (registry q_ts_anomaly): exact
# integer window moments over the trailing-20 frame, the vec_ood_score
# z formula, flag at |z| > 3 with >= 8 history rows.
# Temperature-balanced sampling at T = 2 (registry q_sample_temperature,
# operators/curation.py sample_temperature): per-lang counts, the
# ordered-fold sqrt denominator (list ORDER BY lang — the bigram
# addend-order contract), the shared-shape floored threshold, and the
# same salted md5 ticket as the sampling siblings.
O_SAMPLE_TEMPERATURE = """
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
den AS (
  SELECT list_sum(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)) AS s
  FROM counts
),
thr AS (
  SELECT lang,
         CAST(floor((400000000.0 * sqrt(CAST(n AS DOUBLE)))
                    / (s * CAST(n AS DOUBLE))) AS BIGINT) AS thr
  FROM counts, den
)
SELECT d.doc_id, d.lang, d.source,
       CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':r11t'), 1, 8))::UBIGINT AS BIGINT) % 1000000 AS ticket
FROM documents d JOIN thr USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':r11t'), 1, 8))::UBIGINT AS BIGINT) % 1000000 < thr.thr
"""


# Corpus-wide line dedup (registry q_dedup_lines, operators/dedup.py
# line_dedup — the CCNet/C4/Dolma boilerplate screen): identical
# augmentation, 60-bit md5-bridge line keys, COUNT(DISTINCT doc) per
# key, position-ordered reassembly via string_agg(... ORDER BY pos).
O_DEDUP_LINES = """
WITH aug AS (
  SELECT doc_id,
         text || chr(10) || 'Share this article on social media.'
              || chr(10) || source || ' newsletter - subscribe today!'
              || chr(10) || 'ref code ' || CAST(doc_id AS VARCHAR)
              || '-' || CAST(doc_id % 97 AS VARCHAR) AS t
  FROM documents
),
lines AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos, s[u.i] AS line,
         CAST(('0x' || substr(md5(lower(trim(s[u.i]))), 1, 15))::UBIGINT
           AS BIGINT) AS k
  FROM (SELECT doc_id, string_split(t, chr(10)) AS s FROM aug)
  CROSS JOIN LATERAL (SELECT unnest(range(1, len(s) + 1)) AS i) u
),
per_key AS (SELECT k, COUNT(DISTINCT doc_id) AS ndocs FROM lines GROUP BY k),
kept AS (SELECT l.* FROM lines l JOIN per_key p USING (k) WHERE p.ndocs < 2),
ka AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id
),
la AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines FROM lines GROUP BY doc_id)
SELECT la.doc_id, la.n_lines, COALESCE(ka.n_kept, 0) AS n_kept,
       COALESCE(ka.text_clean, '') AS text_clean
FROM la LEFT JOIN ka USING (doc_id)
"""


# EWMA over the trailing 16 events, α = 1/2 (registry q_ts_ewma,
# operators/timeseries.py ewma_trailing): every weight an exact power
# of two, numerator/denominator exact BIGINT sums of micro-scaled
# integers, ONE double division — the same indexed fold Spark runs,
# via windowed list() + the indexed list_transform lambda. Element p
# (1-based) of an n-element frame list sits at lag n − p → weight
# 2^(16−1−n+p). Display is the module's floor-micro contract
# (ewma_e6 BIGINT = floor(num/den + 0.5)) — the quotient is already
# micro-scaled, and floor on the IEEE-identical quotient sidesteps
# the round() HALF_UP-vs-float divergence.
O_TS_EWMA = """
WITH scaled AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events
),
framed AS (
  SELECT event_id, user_id, ts, v,
         list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
  FROM scaled
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       v AS v_scaled,
       CAST(len(arr) AS INT) AS n_window,
       CAST(floor(CAST(list_sum(list_transform(arr,
                 (x, p) -> x * ((1::BIGINT) << (15 - len(arr) + p))))
               AS DOUBLE)
             / CAST(((1::BIGINT) << 16) - ((1::BIGINT) << (16 - len(arr)))
               AS DOUBLE)
             + 0.5) AS BIGINT) AS ewma_e6
FROM framed
"""


O_TS_ANOMALY = """
WITH scaled AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_scaled
  FROM events
),
stats AS (
  SELECT event_id, user_id, ts, v_scaled,
         COUNT(*) OVER w AS n_prev,
         CAST(SUM(v_scaled) OVER w AS BIGINT) AS s1,
         CAST(SUM(CAST(v_scaled AS HUGEINT) * v_scaled) OVER w AS HUGEINT) AS s2
  FROM scaled
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, v_scaled,
       CAST(n_prev AS INT) AS n_prev,
       round(CAST(n_prev * v_scaled - s1 AS DOUBLE)
             / nullif(sqrt(CAST(CAST(n_prev AS HUGEINT) * s2
                           - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)), 0.0), 4)
         AS z,
       (n_prev >= 8 AND COALESCE(
          abs(CAST(n_prev * v_scaled - s1 AS DOUBLE)
              / nullif(sqrt(CAST(CAST(n_prev AS HUGEINT) * s2
                            - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)), 0.0))
          > 3.0, FALSE)) AS is_anomaly
FROM stats
"""



def _o_mm_audiohash() -> str:
    """Audio energy-sign near-dup oracle (registry q_mm_audio_dedup,
    operators/multimodal.py fake_audio_neardup → audio_energyhash →
    audiohash_pairs): recompute every sample from the md5-chain spec,
    replay the 65 integer frame energies and the 64 sign bits into the
    two 32-bit halves, band 8×8, verify with exact Hamming — the
    _o_mm_phash recipe with energies instead of block means."""
    n, frames = 256, 65
    bounds = [(i * n) // frames for i in range(frames + 1)]
    en_cols = ",\n         ".join(
        "list_sum(list_transform(p[{}:{}], x -> x * x)) AS e{}".format(
            bounds[i] + 1, bounds[i + 1], i
        )
        for i in range(frames)
    )
    lo = " + ".join(
        f"(CASE WHEN e{k + 1} > e{k} THEN {1 << k} ELSE 0 END)"
        for k in range(32)
    )
    hi = " + ".join(
        f"(CASE WHEN e{k + 33} > e{k + 32} THEN {1 << k} ELSE 0 END)"
        for k in range(32)
    )
    return f"""
WITH m AS (
  SELECT doc_id, doc_id % 25 AS g, doc_id // 25 AS rep
  FROM documents WHERE doc_id < 200
),
hx AS (
  SELECT doc_id,
         substr(base, 1, 128) || repeat('ff', rep * 2)
           || substr(base, 129 + rep * 4, 512) AS h
  FROM (
    SELECT doc_id, rep,
           array_to_string(list_transform(range(16),
             b -> md5('audnd:' || CAST(g AS VARCHAR) || ':'
                      || CAST(b AS VARCHAR))), '') AS base
    FROM m
  )
),
px AS (
  SELECT doc_id,
         list_transform(range({n}),
           j -> CAST(CAST('0x' || substr(h, 2 * j + 1, 2) AS UBIGINT)
                     AS BIGINT)) AS p
  FROM hx
),
en AS (
  SELECT doc_id,
         {en_cols}
  FROM px
),
fp AS (
  SELECT doc_id,
         CAST({lo} AS BIGINT) AS phash_lo,
         CAST({hi} AS BIGINT) AS phash_hi
  FROM en
),
banded AS (
  SELECT doc_id, phash_lo, phash_hi, band,
         CASE WHEN band < 4 THEN (phash_lo >> (band * 8)) & 255
              ELSE (phash_hi >> ((band - 4) * 8)) & 255 END AS key
  FROM fp, (SELECT unnest(range(8)) AS band) bs
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         a.phash_lo AS la, a.phash_hi AS ha,
         b2.phash_lo AS lb, b2.phash_hi AS hb
  FROM banded a
  JOIN banded b2 ON a.band = b2.band AND a.key = b2.key
                AND a.doc_id < b2.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS INT)
         AS hamming
FROM cand
WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3
"""


O_MM_AUDIO_DEDUP = _o_mm_audiohash()


# Nearest-in-time as-of join (registry q_join_asof_nearest,
# operators/relational.py asof_join_nearest): DuckDB's native ASOF run
# both directions + the backward-tie rule — an independent engine's
# nearest semantics gating the union+carry implementation.
O_JOIN_ASOF_NEAREST = """
WITH probes AS (
  SELECT event_id, user_id AS o_custkey,
         TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (event_id % 2400) DAY AS t
  FROM events
),
q AS (
  SELECT o_custkey, o_orderdate AS t, o_orderkey, o_totalprice
  FROM orders
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1
),
b AS (
  SELECT p.event_id, p.o_custkey, p.t,
         q.t AS qt, q.o_orderkey, q.o_totalprice
  FROM probes p ASOF LEFT JOIN q ON p.o_custkey = q.o_custkey AND p.t >= q.t
),
f AS (
  SELECT p.event_id, q.t AS qt, q.o_orderkey, q.o_totalprice
  FROM probes p ASOF LEFT JOIN q ON p.o_custkey = q.o_custkey AND p.t <= q.t
)
SELECT b.event_id, b.o_custkey,
       strftime(b.t, '%Y-%m-%d %H:%M:%S') AS asof_ts,
       CASE WHEN b.qt IS NULL AND f.qt IS NULL THEN NULL
            WHEN (f.qt IS NULL OR (b.qt IS NOT NULL AND epoch(b.t) - epoch(CAST(b.qt AS TIMESTAMP)) <= epoch(CAST(f.qt AS TIMESTAMP)) - epoch(b.t))) THEN 'backward' ELSE 'forward' END AS side,
       CASE WHEN b.qt IS NULL AND f.qt IS NULL THEN NULL
            WHEN (f.qt IS NULL OR (b.qt IS NOT NULL AND epoch(b.t) - epoch(CAST(b.qt AS TIMESTAMP)) <= epoch(CAST(f.qt AS TIMESTAMP)) - epoch(b.t))) THEN strftime(b.qt, '%Y-%m-%d')
            ELSE strftime(f.qt, '%Y-%m-%d') END AS matched_date,
       CASE WHEN (f.qt IS NULL OR (b.qt IS NOT NULL AND epoch(b.t) - epoch(CAST(b.qt AS TIMESTAMP)) <= epoch(CAST(f.qt AS TIMESTAMP)) - epoch(b.t))) THEN b.o_orderkey ELSE f.o_orderkey END AS o_orderkey,
       ROUND(CASE WHEN (f.qt IS NULL OR (b.qt IS NOT NULL AND epoch(b.t) - epoch(CAST(b.qt AS TIMESTAMP)) <= epoch(CAST(f.qt AS TIMESTAMP)) - epoch(b.t))) THEN b.o_totalprice
                  ELSE f.o_totalprice END, 2) AS o_totalprice
FROM b JOIN f USING (event_id)
"""


# Versioned-table time travel (registry q_table_time_travel): each
# snapshot's membership recomputed from the batch definitions — a doc
# is visible from its commit onward; version 4 is the compaction
# rewrite and must equal version 3 exactly.
O_TABLE_TIME_TRAVEL = """
SELECT v.version, d.doc_id, d.n_chars
FROM documents d
CROSS JOIN (SELECT CAST(unnest(range(1, 5)) AS INT) AS version) v
WHERE d.doc_id % 3 < LEAST(v.version, 3)
"""


# k-core membership (registry q_graph_kcore, operators/graph.py
# kcore_membership): the oracle unrolls the identical fixed peeling
# rounds over the same symmetrized co-order part graph.
# HITS hubs/authorities (registry q_graph_hits, operators/graph.py
# hits): 4 max-normalized power-iteration rounds unrolled as a CTE
# chain in the same integer fixed point as the Spark loop — micro-unit
# scores, `//` integer division matching Spark's `div` on positive
# operands, normalization by the round's MAX via a scalar subquery.
# The display division by 1e6 is the chain's only float.
O_GRAPH_HITS = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity > 25
),
h0 AS MATERIALIZED (SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS h FROM e),
a1r AS MATERIALIZED (
  SELECT e.dst, SUM(h0.h) AS s FROM e JOIN h0 ON h0.id = e.src GROUP BY e.dst
),
a1 AS MATERIALIZED (
  SELECT dst AS id, (s * 1000000) // (SELECT MAX(s) FROM a1r) AS a FROM a1r
),
h1r AS MATERIALIZED (
  SELECT e.src, SUM(a1.a) AS s FROM e JOIN a1 ON a1.id = e.dst GROUP BY e.src
),
h1 AS MATERIALIZED (
  SELECT src AS id, (s * 1000000) // (SELECT MAX(s) FROM h1r) AS h FROM h1r
),
a2r AS MATERIALIZED (
  SELECT e.dst, SUM(h1.h) AS s FROM e JOIN h1 ON h1.id = e.src GROUP BY e.dst
),
a2 AS MATERIALIZED (
  SELECT dst AS id, (s * 1000000) // (SELECT MAX(s) FROM a2r) AS a FROM a2r
),
h2r AS MATERIALIZED (
  SELECT e.src, SUM(a2.a) AS s FROM e JOIN a2 ON a2.id = e.dst GROUP BY e.src
),
h2 AS MATERIALIZED (
  SELECT src AS id, (s * 1000000) // (SELECT MAX(s) FROM h2r) AS h FROM h2r
),
a3r AS MATERIALIZED (
  SELECT e.dst, SUM(h2.h) AS s FROM e JOIN h2 ON h2.id = e.src GROUP BY e.dst
),
a3 AS MATERIALIZED (
  SELECT dst AS id, (s * 1000000) // (SELECT MAX(s) FROM a3r) AS a FROM a3r
),
h3r AS MATERIALIZED (
  SELECT e.src, SUM(a3.a) AS s FROM e JOIN a3 ON a3.id = e.dst GROUP BY e.src
),
h3 AS MATERIALIZED (
  SELECT src AS id, (s * 1000000) // (SELECT MAX(s) FROM h3r) AS h FROM h3r
),
a4r AS MATERIALIZED (
  SELECT e.dst, SUM(h3.h) AS s FROM e JOIN h3 ON h3.id = e.src GROUP BY e.dst
),
a4 AS MATERIALIZED (
  SELECT dst AS id, (s * 1000000) // (SELECT MAX(s) FROM a4r) AS a FROM a4r
),
h4r AS MATERIALIZED (
  SELECT e.src, SUM(a4.a) AS s FROM e JOIN a4 ON a4.id = e.dst GROUP BY e.src
),
h4 AS MATERIALIZED (
  SELECT src AS id, (s * 1000000) // (SELECT MAX(s) FROM h4r) AS h FROM h4r
)
SELECT id AS node_id, 'hub' AS kind, h / 1000000.0 AS score FROM h4
UNION ALL
SELECT id AS node_id, 'authority' AS kind, a / 1000000.0 AS score FROM a4
"""


# HyperBall harmonic centrality (registry q_graph_hyperball,
# operators/graph.py hyperball_harmonic; Boldi & Vigna 2013): 3
# register-MAX merge rounds over the symmetrized co-order graph
# replayed as a CTE chain — md5-bridge registers at the HyperANF
# per-node counter size (p = 6, m = 64), exact-BIGINT z_num, the
# shared one-literal estimate @4dp per round, and the harmonic
# displayed via the floor(x·1e4 + 0.5) BIGINT contract (round() at
# 4dp flipped last digits on 8/2000 near-boundary sums).
O_GRAPH_HYPERBALL = """
WITH raw AS (
  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > 25 AND b.l_quantity > 25
),
sym AS MATERIALIZED (
  SELECT DISTINCT id_a AS src, id_b AS dst FROM raw
  UNION
  SELECT DISTINCT id_b, id_a FROM raw
),
verts AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
s0 AS MATERIALIZED (
  SELECT node, _h % 64 AS register,
         MAX(CASE WHEN _h // 64 = 0 THEN 27
                  ELSE 26 - length(bin(_h // 64)) + 1 END) AS rho
  FROM (
    SELECT node,
           CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS _h
    FROM verts
  ) GROUP BY 1, 2
),
g0 AS (
  SELECT node, CAST(64 - COUNT(*) AS INT) AS zeros,
         CAST((64 - COUNT(*)) * (CAST(1 AS BIGINT) << 27)
           + SUM(CAST(1 AS BIGINT) << (27 - rho)) AS BIGINT) AS z_num
  FROM s0 GROUP BY 1
),
e0 AS (
  SELECT node, round(CASE WHEN (389964313951.88196 / z_num) <= 160.0 AND zeros > 0
                          THEN 64.0 * ln(64.0 / zeros)
                          ELSE 389964313951.88196 / z_num END, 4) AS est
  FROM g0
),
s1 AS MATERIALIZED (
  SELECT node, register, MAX(rho) AS rho FROM (
    SELECT node, register, rho FROM s0
    UNION ALL
    SELECT e.src AS node, s.register, s.rho
    FROM sym e JOIN s0 s ON s.node = e.dst
  ) GROUP BY 1, 2
),
g1 AS (
  SELECT node, CAST(64 - COUNT(*) AS INT) AS zeros,
         CAST((64 - COUNT(*)) * (CAST(1 AS BIGINT) << 27)
           + SUM(CAST(1 AS BIGINT) << (27 - rho)) AS BIGINT) AS z_num
  FROM s1 GROUP BY 1
),
e1 AS (
  SELECT node, round(CASE WHEN (389964313951.88196 / z_num) <= 160.0 AND zeros > 0
                          THEN 64.0 * ln(64.0 / zeros)
                          ELSE 389964313951.88196 / z_num END, 4) AS est
  FROM g1
),
s2 AS MATERIALIZED (
  SELECT node, register, MAX(rho) AS rho FROM (
    SELECT node, register, rho FROM s1
    UNION ALL
    SELECT e.src AS node, s.register, s.rho
    FROM sym e JOIN s1 s ON s.node = e.dst
  ) GROUP BY 1, 2
),
g2 AS (
  SELECT node, CAST(64 - COUNT(*) AS INT) AS zeros,
         CAST((64 - COUNT(*)) * (CAST(1 AS BIGINT) << 27)
           + SUM(CAST(1 AS BIGINT) << (27 - rho)) AS BIGINT) AS z_num
  FROM s2 GROUP BY 1
),
e2 AS (
  SELECT node, round(CASE WHEN (389964313951.88196 / z_num) <= 160.0 AND zeros > 0
                          THEN 64.0 * ln(64.0 / zeros)
                          ELSE 389964313951.88196 / z_num END, 4) AS est
  FROM g2
),
s3 AS MATERIALIZED (
  SELECT node, register, MAX(rho) AS rho FROM (
    SELECT node, register, rho FROM s2
    UNION ALL
    SELECT e.src AS node, s.register, s.rho
    FROM sym e JOIN s2 s ON s.node = e.dst
  ) GROUP BY 1, 2
),
g3 AS (
  SELECT node, CAST(64 - COUNT(*) AS INT) AS zeros,
         CAST((64 - COUNT(*)) * (CAST(1 AS BIGINT) << 27)
           + SUM(CAST(1 AS BIGINT) << (27 - rho)) AS BIGINT) AS z_num
  FROM s3 GROUP BY 1
),
e3 AS (
  SELECT node, round(CASE WHEN (389964313951.88196 / z_num) <= 160.0 AND zeros > 0
                          THEN 64.0 * ln(64.0 / zeros)
                          ELSE 389964313951.88196 / z_num END, 4) AS est
  FROM g3
)
SELECT e0.node AS node_id, e1.est AS ball_1, e2.est AS ball_2, e3.est AS ball_3,
       CAST(floor((0.0 + (e1.est - e0.est) / 1.0 + (e2.est - e1.est) / 2.0 + (e3.est - e2.est) / 3.0) * 10000 + 0.5) AS BIGINT) AS harmonic_e4
FROM e0
JOIN e1 ON e1.node = e0.node
JOIN e2 ON e2.node = e0.node
JOIN e3 ON e3.node = e0.node
"""


O_GRAPH_KCORE = """
WITH raw AS (
  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > 25 AND b.l_quantity > 25
),
edges AS MATERIALIZED (
  SELECT DISTINCT id_a AS src, id_b AS dst FROM raw
  UNION
  SELECT DISTINCT id_b, id_a FROM raw
),
verts AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
k0 AS MATERIALIZED (SELECT node FROM verts),
k1 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k0 a ON a.node = e.src
    JOIN k0 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k2 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k1 a ON a.node = e.src
    JOIN k1 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k3 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k2 a ON a.node = e.src
    JOIN k2 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k4 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k3 a ON a.node = e.src
    JOIN k3 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k5 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k4 a ON a.node = e.src
    JOIN k4 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k6 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k5 a ON a.node = e.src
    JOIN k5 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k7 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k6 a ON a.node = e.src
    JOIN k6 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k8 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k7 a ON a.node = e.src
    JOIN k7 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k9 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k8 a ON a.node = e.src
    JOIN k8 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k10 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k9 a ON a.node = e.src
    JOIN k9 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k11 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k10 a ON a.node = e.src
    JOIN k10 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
k12 AS MATERIALIZED (
  SELECT src AS node FROM (
    SELECT e.src, COUNT(*) AS deg
    FROM edges e
    JOIN k11 a ON a.node = e.src
    JOIN k11 b ON b.node = e.dst
    GROUP BY e.src
  ) WHERE deg >= 14
),
fin AS (SELECT node FROM k12)
SELECT v.node AS node_id, f.node IS NOT NULL AS in_kcore,
       (SELECT COUNT(*) FROM k11) = (SELECT COUNT(*) FROM k12) AS converged
FROM verts v LEFT JOIN fin f ON f.node = v.node
"""


# Graph-ANN (small-world) top-k (registry q_vec_hnsw_topk,
# operators/ann.py smallworld_build + smallworld_topk — the HNSW
# serving pattern as a single navigable layer): the oracle rebuilds the
# IDENTICAL neighbor graph from the shared golden planes (6-bit
# signature prefix per table -> bucket-mate pairs -> top-6 by exact
# cosine, id tiebreak) and replays the identical unrolled beam walk
# (c0 = the top-3 by query cosine of the MIN-id representative per
# table-0 bucket — the deterministic stand-in for HNSW's routing
# layers — then three rounds of top-12 by query cosine over
# beam ∪ out-neighbors; SQL UNION dedupes exactly like the Spark
# distinct()), then displays the final beam's top-10 @6dp.
O_VEC_HNSW_TOPK = f"""
WITH p AS (
  SELECT t, j, plane
  FROM read_parquet('/root/repo/golden/ann_planes.parquet') WHERE j < 6
),
vsig AS (
  SELECT e.vec_id, p.t,
         SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.plane) >= 0
             THEN (1 << p.j) ELSE 0 END) AS sig
  FROM embeddings e CROSS JOIN p GROUP BY e.vec_id, p.t
),
pairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM vsig a JOIN vsig b ON a.t = b.t AND a.sig = b.sig AND a.vec_id <> b.vec_id
),
sp AS (
  SELECT pr.src, pr.dst,
         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                CAST(eb.embedding AS DOUBLE[])) AS s
  FROM pairs pr
  JOIN embeddings ea ON ea.vec_id = pr.src
  JOIN embeddings eb ON eb.vec_id = pr.dst
),
adj AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rn
    FROM sp
  ) WHERE rn <= 6
),
q AS ({_ORACLE_QVEC}),
qs AS (SELECT e.vec_id AS id, {_ORACLE_SIM} AS s FROM embeddings e, q),
reps AS (SELECT MIN(vec_id) AS id FROM vsig WHERE t = 0 GROUP BY sig),
c0 AS (
  SELECT qs.id FROM qs JOIN reps USING (id) ORDER BY s DESC, id ASC LIMIT 3
),
e1 AS (SELECT id FROM c0 UNION SELECT a.dst FROM adj a JOIN c0 ON a.src = c0.id),
b1 AS (SELECT qs.id, qs.s FROM qs JOIN e1 USING (id) ORDER BY s DESC, id ASC LIMIT 12),
e2 AS (SELECT id FROM b1 UNION SELECT a.dst FROM adj a JOIN b1 ON a.src = b1.id),
b2 AS (SELECT qs.id, qs.s FROM qs JOIN e2 USING (id) ORDER BY s DESC, id ASC LIMIT 12),
e3 AS (SELECT id FROM b2 UNION SELECT a.dst FROM adj a JOIN b2 ON a.src = b2.id),
b3 AS (SELECT qs.id, qs.s FROM qs JOIN e3 USING (id) ORDER BY s DESC, id ASC LIMIT 12)
SELECT id AS vec_id, ROUND(s, 6) AS similarity_score,
       CAST(ROW_NUMBER() OVER (ORDER BY s DESC, id ASC) AS INT) AS rank
FROM b3 ORDER BY s DESC, id ASC LIMIT 10
"""


# Incremental graph-ANN maintenance (registry q_vec_hnsw_append,
# operators/ann.py smallworld_append): the corpus splits 4/5 base (the
# standing index) + 1/5 batch (the appended crawl, vec_id % 5 = 0 —
# the ivf_append convention). The oracle rebuilds BOTH adjacency
# halves exactly as the engine maintains them — base nodes' top-6
# among BASE bucket-mates (the bootstrap build, untouched by the
# append), batch nodes' top-6 among GROWN-corpus bucket-mates PLUS
# their reverses (the bidirectional insert half; duplicates harmless,
# the walk set-unions candidates) — then replays the identical
# routing + unrolled beam walk over the merged graph (reps over the
# full corpus).
O_VEC_HNSW_APPEND = f"""
WITH p AS (
  SELECT t, j, plane
  FROM read_parquet('/root/repo/golden/ann_planes.parquet') WHERE j < 6
),
vsig AS (
  SELECT e.vec_id, p.t,
         SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.plane) >= 0
             THEN (1 << p.j) ELSE 0 END) AS sig
  FROM embeddings e CROSS JOIN p GROUP BY e.vec_id, p.t
),
pairs_base AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM vsig a JOIN vsig b ON a.t = b.t AND a.sig = b.sig AND a.vec_id <> b.vec_id
  WHERE a.vec_id % 5 <> 0 AND b.vec_id % 5 <> 0
),
pairs_batch AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM vsig a JOIN vsig b ON a.t = b.t AND a.sig = b.sig AND a.vec_id <> b.vec_id
  WHERE a.vec_id % 5 = 0
),
sp AS (
  SELECT pr.src, pr.dst, 'base' AS half,
         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                CAST(eb.embedding AS DOUBLE[])) AS s
  FROM pairs_base pr
  JOIN embeddings ea ON ea.vec_id = pr.src
  JOIN embeddings eb ON eb.vec_id = pr.dst
  UNION ALL
  SELECT pr.src, pr.dst, 'batch' AS half,
         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                CAST(eb.embedding AS DOUBLE[])) AS s
  FROM pairs_batch pr
  JOIN embeddings ea ON ea.vec_id = pr.src
  JOIN embeddings eb ON eb.vec_id = pr.dst
),
fwd AS (
  SELECT src, dst, half FROM (
    SELECT src, dst, half,
           ROW_NUMBER() OVER (PARTITION BY half, src ORDER BY s DESC, dst ASC) AS rn
    FROM sp
  ) WHERE rn <= 6
),
adj AS (
  SELECT src, dst FROM fwd
  UNION ALL
  -- the batch insert's bidirectional half: backlinks of the appended
  -- forward links (HNSW's existing->new edges; pruning deferred)
  SELECT dst AS src, src AS dst FROM fwd WHERE half = 'batch'
),
q AS ({_ORACLE_QVEC}),
qs AS (SELECT e.vec_id AS id, {_ORACLE_SIM} AS s FROM embeddings e, q),
reps AS (SELECT MIN(vec_id) AS id FROM vsig WHERE t = 0 GROUP BY sig),
c0 AS (
  SELECT qs.id FROM qs JOIN reps USING (id) ORDER BY s DESC, id ASC LIMIT 3
),
e1 AS (SELECT id FROM c0 UNION SELECT a.dst FROM adj a JOIN c0 ON a.src = c0.id),
b1 AS (SELECT qs.id, qs.s FROM qs JOIN e1 USING (id) ORDER BY s DESC, id ASC LIMIT 12),
e2 AS (SELECT id FROM b1 UNION SELECT a.dst FROM adj a JOIN b1 ON a.src = b1.id),
b2 AS (SELECT qs.id, qs.s FROM qs JOIN e2 USING (id) ORDER BY s DESC, id ASC LIMIT 12),
e3 AS (SELECT id FROM b2 UNION SELECT a.dst FROM adj a JOIN b2 ON a.src = b2.id),
b3 AS (SELECT qs.id, qs.s FROM qs JOIN e3 USING (id) ORDER BY s DESC, id ASC LIMIT 12)
SELECT id AS vec_id, ROUND(s, 6) AS similarity_score,
       CAST(ROW_NUMBER() OVER (ORDER BY s DESC, id ASC) AS INT) AS rank
FROM b3 ORDER BY s DESC, id ASC LIMIT 10
"""


# fp16 / halfvec top-k (registry q_vec_f16_topk, operators/ann.py
# f16_topk — pgvector's halfvec storage type): the oracle re-rounds the
# corpus to IEEE binary16 with the identical exact power-of-two scheme
# (threshold fold over the 30 normal exponents — no log2, so boundary
# exponents cannot disagree; fixed 2^24 subnormal scale; round_even ==
# Spark rint == round-half-to-even, pinned against numpy float16 in
# tests/test_ann.py) and re-scores the FLOAT query against the rounded
# doubles with the same strict left fold.
_O_F16_SCALE = (
    "list_reduce(list_prepend(CAST(16777216 AS DOUBLE), "
    "list_transform(range(-14, 16), i -> CAST(i AS DOUBLE))), "
    "(acc, i) -> CASE WHEN abs(x) >= power(2.0, i) "
    "THEN power(2.0, 10 - i) ELSE acc END)"
)

O_VEC_F16_TOPK = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
h AS (
  SELECT vec_id, label,
         list_transform(v, x ->
           round_even(x * {_O_F16_SCALE}, 0) / {_O_F16_SCALE}) AS hv
  FROM e
),
qv AS (SELECT v FROM e WHERE vec_id = 0),
scored AS (
  SELECT h.vec_id, h.label,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(range(1, 65), i -> qv.v[i] * h.hv[i])),
           (acc, x) -> acc + x) AS s
  FROM h CROSS JOIN qv
)
SELECT vec_id, label, round(s, 6) AS f16_score
FROM scored
ORDER BY s DESC, vec_id
LIMIT 10
"""


# Filtered ANN with iterative probe expansion (registry
# q_vec_filtered_topk, operators/ivf.py ivf_topk_filtered — the
# pgvector 0.8 iterative_scan contract): the oracle replays the full
# deterministic semantics — seed-centroid assignment (the
# O_VEC_IVF_TOPK convention), the centroid-distance probe ORDER, the
# MINIMAL PREFIX of that order whose label-surviving count reaches k
# (all 16 clusters if none does), and the exact-cosine top-k among
# survivors inside that prefix. A wrong probe order, an off-by-one
# prefix, or a filter evaluated after the top-k instead of before all
# hash-mismatch.
O_VEC_FILTERED_TOPK = f"""
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS ({_ORACLE_QVEC}),
corder AS (
  SELECT cid,
         CAST(ROW_NUMBER() OVER (
           ORDER BY list_cosine_similarity(cv, q.qv) DESC, cid ASC
         ) AS INT) AS pos
  FROM c, q
),
assign AS (
  SELECT e.vec_id,
         arg_max(c.cid, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)) AS cluster
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id
),
surv AS (
  SELECT a.vec_id, co.pos
  FROM assign a
  JOIN corder co ON a.cluster = co.cid
  JOIN embeddings e ON a.vec_id = e.vec_id
  WHERE e.label = {FILTERED_LABEL}
),
cnt AS (SELECT pos, COUNT(*) AS n FROM surv GROUP BY pos),
pref AS (
  SELECT p.pos, SUM(COALESCE(cnt.n, 0)) OVER (ORDER BY p.pos) AS cumn
  FROM (SELECT CAST(unnest(range(1, 17)) AS INT) AS pos) p
  LEFT JOIN cnt USING (pos)
),
chosen AS (
  SELECT COALESCE(MIN(pos) FILTER (WHERE cumn >= {FILTERED_K}), 16) AS pstar
  FROM pref
),
cand AS (SELECT s.vec_id FROM surv s, chosen WHERE s.pos <= chosen.pstar),
scored AS (
  SELECT cd.vec_id, e.label, {_ORACLE_SIM} AS sim
  FROM cand cd JOIN embeddings e ON cd.vec_id = e.vec_id, q
)
SELECT vec_id, label, ROUND(sim, 6) AS similarity_score,
       CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY sim DESC, vec_id ASC LIMIT {FILTERED_K}
"""
