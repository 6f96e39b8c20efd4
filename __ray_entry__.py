"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown(). See fdpg_query_data_validation_ray/ for the
engine; pipelines/queries.py holds the Ray implementations whose schemas match
oracle_sql() exactly (column names included; aggregates integer-exact
fixed-point so value hashes can't drift on float summation order).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: derive the (repo,path,commit,lang,content) corpus from
    sf0.001 documents, run the checkpointed validation pipeline (row checks +
    routing fallback + uniqueness + stats + sha256 digests), return the
    dedup-counted issue table."""
    from fdpg_query_data_validation_ray.pipelines.queries import q_corpus_validate

    return q_corpus_validate(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from fdpg_query_data_validation_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents (views pre-registered per table name). Keys missing
    here (dedup_minhash/simhash/ngram, cosine_near_dup, knn_cosine_ivf,
    drift_docs, lang_id, quality, fingerprint, stats_sketches,
    multimodal_decode, corpus_validate) are non-SQL-expressible
    (sketch/LSH/IVF/heuristic/stateful pipelines) → rows-only check."""
    row_checks_union = """
        SELECT 'not_null(text)' AS rule_id, 'error' AS severity, 'text' AS location,
               'minimum required = 1, but only found 0' AS diagnostics,
               CAST(doc_id AS VARCHAR) AS row_key, CAST(NULL AS VARCHAR) AS actual
        FROM documents WHERE text IS NULL
        UNION ALL
        SELECT 'in_set(lang)', 'error', 'lang',
               'none of the values provided are in the value set',
               CAST(doc_id AS VARCHAR), lang
        FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','es','de','fr')
        UNION ALL
        SELECT 'range(n_chars)', 'error', 'n_chars', 'value out of allowed range',
               CAST(doc_id AS VARCHAR), CAST(n_chars AS VARCHAR)
        FROM documents WHERE n_chars IS NOT NULL AND (n_chars < 50 OR n_chars > 400)
        UNION ALL
        SELECT 'regex(source)', 'error', 'source', 'value does not match required pattern',
               CAST(doc_id AS VARCHAR), source
        FROM documents WHERE source IS NOT NULL AND NOT regexp_matches(source, '^(?:src[0-9]+)$')
    """
    return {
        "row_checks_documents": row_checks_union,
        "issue_dedup_counts": f"""
            SELECT rule_id, severity, location, diagnostics, COUNT(*) AS n_issues
            FROM ({row_checks_union}) GROUP BY rule_id, severity, location, diagnostics
        """,
        "unique_docs_lang_nchars": """
            SELECT lang, n_chars, COUNT(*) AS dup_count
            FROM documents GROUP BY lang, n_chars HAVING COUNT(*) > 1
        """,
        "fk_orders_customer": """
            SELECT 'foreign_key(o_custkey->customer)' AS rule_id, 'error' AS severity,
                   'o_custkey' AS location, 'referenced key does not exist' AS diagnostics,
                   CAST(o_orderkey AS VARCHAR) AS row_key, CAST(o_custkey AS VARCHAR) AS actual
            FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
        """,
        "fk_lineitem_orders_hash": """
            SELECT CAST(l.l_orderkey AS VARCHAR) AS fk_key, COUNT(*) AS n_rows
            FROM lineitem l
            LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0) o
              ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL
            GROUP BY 1
        """,
        "col_stats_lineitem": """
            SELECT 'l_quantity' AS col_name, COUNT(*) AS n_rows,
                   COUNT(*) - COUNT(l_quantity) AS n_nulls,
                   MIN(l_quantity) AS min_value, MAX(l_quantity) AS max_value FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
                   MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
            UNION ALL
            SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
                   MIN(l_discount), MAX(l_discount) FROM lineitem
            UNION ALL
            SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
                   MIN(l_tax), MAX(l_tax) FROM lineitem
        """,
        "distinct_exact": """
            SELECT 'lang' AS col_name, COUNT(DISTINCT lang) AS n_distinct FROM documents
            UNION ALL
            SELECT 'source', COUNT(DISTINCT source) FROM documents
        """,
        "lang_distribution": "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang",
        "content_length_hist": """
            SELECT CAST(FLOOR(n_chars / 50) AS BIGINT) AS bucket, COUNT(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_hourly_moving": """
            WITH h AS (
                SELECT event_type, date_trunc('hour', ts) AS hour,
                       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
                FROM events GROUP BY 1, 2)
            SELECT event_type, hour,
                   CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS moving_sum_cents
            FROM h
        """,
        "events_props_k": """
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                       AS sum_k
            FROM events GROUP BY event_type
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                       AS BIGINT) AS sum_disc_price_e4,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                       * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_building_orders": """
            SELECT l_orderkey AS o_orderkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
            FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                WHERE c.c_mktsegment = 'BUILDING')
            GROUP BY 1
            ORDER BY revenue_e4 DESC, o_orderkey
            LIMIT 10
        """,
        "top_users_by_events": """
            SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
            ORDER BY n_events DESC, user_id LIMIT 20
        """,
        "events_recent_topk": """
            SELECT event_id, ts, event_type FROM events
            ORDER BY ts DESC, event_id LIMIT 50
        """,
        "segment_order_totals": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_totalprice_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "first_docs_per_lang": """
            SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
                FROM documents)
            WHERE rn <= 5
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "dedup_exact_props": """
            SELECT md5(props) AS text_md5, MIN(event_id) AS keep_id, COUNT(*) AS n_copies
            FROM events GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "supplier_balance_by_region": """
            SELECT r_name, COUNT(*) AS n_suppliers,
                   CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS sum_acctbal_cents
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "parts_by_brand_size": """
            SELECT p_brand, p_size, COUNT(*) AS n_parts,
                   CAST(MIN(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                       AS min_price_cents,
                   CAST(MAX(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                       AS max_price_cents
            FROM part GROUP BY p_brand, p_size
        """,
        "dedup_keep_first": """
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM documents)
            WHERE rn = 1
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                       WHERE vec_id IN (0, 1, 2, 3, 4)),
            s AS (SELECT q.query_id, e.vec_id,
                         list_cosine_similarity(q.qe, e.embedding) AS sim
                  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
            SELECT query_id, vec_id, CAST(rn AS BIGINT) AS rank FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
                FROM s)
            WHERE rn <= 5
        """,
        "top_words": """
            SELECT word, COUNT(*) AS n_occurrences FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
                FROM documents WHERE text IS NOT NULL)
            WHERE word <> ''
            GROUP BY word ORDER BY n_occurrences DESC, word LIMIT 50
        """,
        "token_count_docs": """
            SELECT doc_id,
                   CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
    }
