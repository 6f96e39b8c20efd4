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


def _stopword_sql_lists() -> tuple[str, str, str, str, str]:
    """SQL IN-lists generated from the engine's STOPWORDS so the lang-id /
    quality oracles can never drift from the implementation."""
    from fdpg_query_data_validation_ray.stages.text import STOPWORDS

    def lst(words) -> str:
        return ",".join(f"'{w}'" for w in sorted(words))

    return (
        lst(STOPWORDS["en"]),
        lst(STOPWORDS["de"]),
        lst(STOPWORDS["fr"]),
        lst(STOPWORDS["es"]),
        lst(set().union(*STOPWORDS.values())),
    )


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """Unrolled k-core peeling oracle (the pagerank unrolled-CTE pattern):
    round i derives degrees of r{i}, keeps nodes with degree >= k, and
    filters r{i+1} to edges whose endpoints both survive."""
    parts = [
        """WITH pairs0 AS (
                SELECT a.l_suppkey AS u, b.l_suppkey AS v
                FROM lineitem a JOIN lineitem b
                     ON a.l_orderkey = b.l_orderkey
                WHERE a.l_suppkey < b.l_suppkey
                GROUP BY 1, 2
                HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
            r0 AS (
                SELECT u, v FROM pairs0
                WHERE (md5_number_lower(
                           'tri|' || CAST(u AS VARCHAR) || '|'
                                  || CAST(v AS VARCHAR))
                       & ((1::UBIGINT << 60) - 1)) % 4 = 0)"""
    ]
    for i in range(rounds):
        parts.append(
            f"""d{i} AS (
                SELECT node, COUNT(*) AS d FROM (
                    SELECT u AS node FROM r{i}
                    UNION ALL SELECT v FROM r{i})
                GROUP BY 1),
            a{i} AS (SELECT node FROM d{i} WHERE d >= {k}),
            r{i + 1} AS (
                SELECT u, v FROM r{i}
                WHERE u IN (SELECT node FROM a{i})
                  AND v IN (SELECT node FROM a{i}))"""
        )
    final = f"""
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
                SELECT u AS node FROM r{rounds}
                UNION ALL SELECT v FROM r{rounds})
            GROUP BY 1"""
    return ",\n".join(parts) + final


def _bm25_values() -> str:
    """VALUES list for the BM25 oracle, generated from the engine's query
    set so the two can never drift."""
    from fdpg_query_data_validation_ray.pipelines.queries import BM25_QUERIES

    return ", ".join(
        f"({qid}, '{term}')"
        for qid in sorted(BM25_QUERIES)
        for term in BM25_QUERIES[qid]
    )


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents (views pre-registered per table name). Keys missing
    here (dedup_minhash/simhash, cosine_near_dup, knn_cosine_ivf, drift_docs,
    stats_sketches, multimodal_decode, corpus_validate) are
    non-SQL-expressible (sketch/LSH/IVF/stateful pipelines) → rows-only
    check; each has a property or cross-check test instead. The DDSketch
    quantile family IS oracle-checked via quantiles_nchars (the bucket math
    is a pure function of the value, replayed in SQL); stats_sketches stays
    rows-only for its HLL/KLL columns. lang_id, quality,
    fingerprint and ngram-jaccard ARE oracle-checked: the heuristics are
    re-expressed in pure SQL (stopword IN-lists, md5_number_lower gram
    hashing, list_intersect jaccard) with integer/fixed-point outputs."""
    en_sw, de_sw, fr_sw, es_sw, all_sw = _stopword_sql_lists()
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
    # split/sample thresholds: generated from the SAME arithmetic as the
    # engine (stages/split.py) so the oracle can never drift from it
    from fdpg_query_data_validation_ray.stages.split import _SCALE, _thresholds

    _split_names, _split_cum = _thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    _t1, _t2 = int(_split_cum[0]), int(_split_cum[1])
    _sample_t = int(0.2 * _SCALE)
    _dsir_sql = """
            WITH rtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            ttoks AS (SELECT doc_id, t FROM rtoks WHERE doc_id % 13 = 0),
            tu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                   FROM (SELECT unnest(t) AS w FROM ttoks) GROUP BY w),
            ts AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n,
                          CAST(COUNT(*) AS BIGINT) AS v FROM tu),
            ru AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                   FROM (SELECT unnest(t) AS w FROM rtoks) GROUP BY w),
            rs AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n,
                          CAST(COUNT(*) AS BIGINT) AS v FROM ru),
            tbg AS (
              SELECT t[x] AS a, t[x+1] AS b
              FROM ttoks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS x)
              WHERE len(t) >= 2),
            tb AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                   FROM tbg GROUP BY a, b),
            tbs AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n,
                           CAST(COUNT(*) AS BIGINT) AS v FROM tb),
            rbg AS (
              SELECT doc_id, t[x] AS a, t[x+1] AS b
              FROM rtoks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS x)
              WHERE len(t) >= 2),
            rb AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                   FROM rbg GROUP BY a, b),
            rbs AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n,
                           CAST(COUNT(*) AS BIGINT) AS v FROM rb),
            au AS (SELECT doc_id, unnest(t) AS w FROM rtoks),
            gu AS (
              SELECT au.doc_id,
                CAST(FLOOR(1e6 * (
                  ln((coalesce(tu.c, 0) + 1) / GREATEST(ts.n + ts.v, 1))
                  - ln((coalesce(ru.c, 0) + 1) / GREATEST(rs.n + rs.v, 1))
                ) + 0.5) AS BIGINT) AS r
              FROM au
              LEFT JOIN tu ON au.w = tu.w
              LEFT JOIN ru ON au.w = ru.w
              CROSS JOIN ts CROSS JOIN rs),
            gb AS (
              SELECT rbg.doc_id,
                CAST(FLOOR(1e6 * (
                  ln((coalesce(tb.c, 0) + 1) / GREATEST(tbs.n + tbs.v, 1))
                  - ln((coalesce(rb.c, 0) + 1) / GREATEST(rbs.n + rbs.v, 1))
                ) + 0.5) AS BIGINT) AS r
              FROM rbg
              LEFT JOIN tb ON rbg.a = tb.a AND rbg.b = tb.b
              LEFT JOIN rb ON rbg.a = rb.a AND rbg.b = rb.b
              CROSS JOIN tbs CROSS JOIN rbs),
            aggu AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                            CAST(SUM(r) AS BIGINT) AS s
                     FROM gu GROUP BY doc_id),
            aggb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                            CAST(SUM(r) AS BIGINT) AS s
                     FROM gb GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(u.n, 0) + coalesce(b.n, 0) AS BIGINT) AS n_feats,
                   CAST(coalesce(u.s, 0) + coalesce(b.s, 0) AS BIGINT) AS dsir_e6_sum
            FROM documents d
            LEFT JOIN aggu u USING (doc_id)
            LEFT JOIN aggb b USING (doc_id)
        """

    _h60 = "md5_number_lower('{salt}|' || CAST(doc_id AS VARCHAR)) & ((1::UBIGINT << 60) - 1)"

    d = {
        "split_docs": f"""
            SELECT doc_id,
                   CASE WHEN h < {_t1}::UBIGINT THEN 'train'
                        WHEN h < {_t2}::UBIGINT THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, {_h60.format(salt="split")} AS h FROM documents)
        """,
        "sample_docs": f"""
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang, {_h60.format(salt="sample")} AS h FROM documents
            ) WHERE h < {_sample_t}::UBIGINT
        """,
        # weighted mixture replay: per-source-salted md5 Bernoulli filters,
        # UNION ALL. en rate 1.0 keeps every row (h is 60-bit); rest rate
        # 0.25 -> threshold 2^58 exactly (int(0.25 * 2^60))
        "mixture_docs": f"""
            SELECT doc_id, lang, 'en' AS source FROM documents
            WHERE lang = 'en'
            UNION ALL
            SELECT doc_id, lang, 'rest' AS source FROM (
                SELECT doc_id, lang, {_h60.format(salt="mix|rest")} AS h
                FROM documents WHERE lang <> 'en'
            ) WHERE h < {int(0.25 * _SCALE)}::UBIGINT
        """,
        "normalize_docs": r"""
            SELECT doc_id,
                   trim(regexp_replace(lower(nfc_normalize(text)),
                                       '[ \t\n\r]+', ' ', 'g'), ' ') AS text_norm
            FROM documents
        """,
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
        # DDSketch quantile replay: the sketch's bucket index is a pure
        # function of the value (k = ceil(ln(x) * 1/ln(gamma)), gamma from
        # alpha=0.01 — the SAME float expressions the engine evaluates, so
        # IEEE doubles agree bit-for-bit), bucket counts are exact, and the
        # quantile walk is first k (ascending) with cum > q*(n-1). value =
        # 2*exp(k*lg)/(exp(lg)+1) in fixed-point micro-units
        # (FLOOR(v*1e6+0.5) — same IEEE ops both sides; ROUND()/round()
        # disagree at half-grid boundaries).
        # PII scrub replay: plant the same email/phone/IP literals with SQL
        # || that the engine plants with Arrow concat kernels, count on the
        # pristine text, then the same three regexp_replace passes in rule
        # order. Patterns are RE2-safe ASCII classes (stages/text.py
        # PII_RULES) so Python re and DuckDB RE2 agree byte-for-byte;
        # doc_id & 255 (bit semantics) on both sides, not % 256.
        "redact_pii_docs": r"""
            WITH aug AS (
              SELECT doc_id,
                coalesce(text,'') || ' contact user' ||
                CAST(doc_id AS VARCHAR) || '@example.com or +49170' ||
                lpad(CAST(doc_id AS VARCHAR), 7, '0') || ' from 10.' ||
                CAST(doc_id & 255 AS VARCHAR) || '.0.1' AS t
              FROM documents)
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '\+[0-9]{7,15}\b', '<PHONE>', 'g'),
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                '<IP>', 'g') AS text_redacted,
              CAST(len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(t, '\+[0-9]{7,15}\b'))
                AS BIGINT) AS n_phones,
              CAST(len(regexp_extract_all(t,
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                AS BIGINT) AS n_ips
            FROM aug
        """,
        # decontamination replay: distinct word-3-gram md5_low60 per doc
        # (same gram basis as fingerprint_docs), benchmark = docs with
        # doc_id % 97 = 0, contaminated = sharing >= 3 distinct grams.
        "decontaminate_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     [array_to_string(t[x:x+2], ' ')
                      for x in generate_series(1, len(t)-2)] AS gs
              FROM toks WHERE len(t) >= 3),
            h AS (
              SELECT DISTINCT doc_id,
                CAST(md5_number_lower(g.gram) & 1152921504606846975 AS BIGINT) AS hv
              FROM grams, LATERAL (SELECT unnest(gs) AS gram) g),
            bench AS (SELECT DISTINCT hv FROM h WHERE doc_id % 97 = 0),
            agg AS (
              SELECT h.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_grams_distinct,
                     CAST(SUM(CASE WHEN b.hv IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_contaminated
              FROM h LEFT JOIN bench b ON h.hv = b.hv
              GROUP BY h.doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_grams_distinct, 0) AS n_grams_distinct,
                   coalesce(a.n_contaminated, 0) AS n_contaminated,
                   coalesce(a.n_contaminated, 0) >= 3 AS is_contaminated
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # deterministic stratified sample: 10 smallest salted-md5 hashes
        # per lang (same _h60 mechanism as split/sample/mixture)
        "sample_n_per_lang": f"""
            SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY {_h60.format(salt="strat")}, doc_id
                       ) AS rn
                FROM documents
                WHERE lang IS NOT NULL AND doc_id IS NOT NULL)
            WHERE rn <= 10
        """,
        # TF-IDF top-3 terms per doc: term identity = md5-low60 of the
        # lowercased \S+ token (the engine's exact hash — a collision merges
        # the same two terms on both sides), idf_e6 = floor(ln(n/df)*1e6+.5)
        # replayed in the same IEEE order, ties broken by term hash. Docs
        # with fewer than 3 distinct terms emit fewer rows; empty/null docs
        # emit none (the GROUP BY drops them on both sides).
        "tfidf_topk_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            words AS (SELECT doc_id, unnest(t) AS w FROM toks),
            h AS (SELECT doc_id,
                         CAST(md5_number_lower(w) & 1152921504606846975
                              AS BIGINT) AS hv
                  FROM words),
            tf AS (SELECT doc_id, hv, COUNT(*) AS tf
                   FROM h GROUP BY doc_id, hv),
            df AS (SELECT hv, COUNT(DISTINCT doc_id) AS df
                   FROM h GROUP BY hv),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.hv,
                     tf.tf * CAST(FLOOR(LN(nd.n / df.df) * 1e6 + 0.5)
                                  AS BIGINT) AS tfidf_e6
              FROM tf JOIN df USING (hv), nd),
            ranked AS (
              SELECT doc_id, hv, tfidf_e6,
                     ROW_NUMBER() OVER (
                         PARTITION BY doc_id
                         ORDER BY tfidf_e6 DESC, hv ASC) AS rnk
              FROM scored)
            SELECT doc_id, hv AS term_hash, CAST(rnk AS BIGINT) AS rank,
                   tfidf_e6
            FROM ranked WHERE rnk <= 3
        """,
        # global dense rank by (n_chars DESC, doc_id) — the engine computes
        # it shuffle-light (histogram combiner + broadcast bases + one
        # groupby); the oracle is the plain window function. Null keys
        # excluded on both sides.
        "docs_ranked_by_len": """
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
                        AS BIGINT) AS rank
            FROM documents
            WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
        """,
        # C4 duplicate-span removal replay: non-overlapping full 3-token
        # spans, identity = md5_low60 of the space-joined span (the engine's
        # exact hash), first (doc_id, span_idx) occurrence wins; text_clean
        # is the canonical lower + single-space rejoin of kept tokens.
        "span_dedup_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            fs AS (
              SELECT doc_id, CAST(g.si AS BIGINT) AS span_idx,
                     CAST(md5_number_lower(
                            array_to_string(t[3*g.si+1 : 3*g.si+3], ' '))
                          & 1152921504606846975 AS BIGINT) AS h
              FROM toks,
                   LATERAL (SELECT unnest(generate_series(0, len(t)//3 - 1))
                            AS si) g
              WHERE len(t) >= 3),
            ranked AS (
              SELECT doc_id, span_idx,
                     ROW_NUMBER() OVER (PARTITION BY h
                                        ORDER BY doc_id, span_idx) AS rn
              FROM fs),
            removed AS (SELECT doc_id, span_idx FROM ranked WHERE rn > 1),
            kept AS (
              SELECT p.doc_id, p.x, p.tok
              FROM (SELECT doc_id, CAST(g.x AS BIGINT) AS x, t[g.x] AS tok
                    FROM toks,
                         LATERAL (SELECT unnest(generate_series(1, len(t)))
                                  AS x) g) p
              LEFT JOIN removed r
                ON r.doc_id = p.doc_id AND r.span_idx = (p.x-1)//3
              WHERE r.doc_id IS NULL)
            SELECT d.doc_id,
                   CAST(coalesce(ns.n, 0) AS BIGINT) AS n_spans,
                   CAST(coalesce(nr.n, 0) AS BIGINT) AS n_spans_removed,
                   coalesce(kt.txt, '') AS text_clean
            FROM documents d
            LEFT JOIN (SELECT doc_id, count(*) AS n FROM fs
                       GROUP BY doc_id) ns USING (doc_id)
            LEFT JOIN (SELECT doc_id, count(*) AS n FROM removed
                       GROUP BY doc_id) nr USING (doc_id)
            LEFT JOIN (SELECT doc_id,
                              string_agg(tok, ' ' ORDER BY x) AS txt
                       FROM kept GROUP BY doc_id) kt USING (doc_id)
        """,
        # exact ROW_NUMBER by a near-unique FLOAT key — the range-partitioned
        # total-sort leg (KLL boundaries + exact per-range counts). NaN and
        # null excluded on both sides; DuckDB orders NaN above all reals,
        # numpy sorts it last, so the filter keeps the orders identical.
        # incremental ingestion: post-cutoff lineitems whose
        # (l_partkey, l_suppkey) pair never shipped pre-cutoff. The Ray plan
        # is the bloom-sieve anti-join (stages/incremental.py); NOT EXISTS is
        # its exact relational statement. Cutoff pinned by
        # pipelines/queries.py INCR_CUTOFF.
        "incremental_new_lineitem": """
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND NOT EXISTS (
                SELECT 1 FROM lineitem s
                WHERE s.l_shipdate < TIMESTAMP '1997-01-01'
                  AND s.l_partkey = l.l_partkey
                  AND s.l_suppkey = l.l_suppkey)
        """,
        # percentile cut: integer-math threshold (n+9)//10 mirrors the
        # engine's (n·numer + denom − 1)//denom — no float CEIL drift
        "top_fraction_docs": """
            WITH r AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
                          AS BIGINT) AS rank
              FROM documents
              WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
            )
            SELECT doc_id, rank FROM r
            WHERE rank <= (SELECT (COUNT(*) + 9) // 10 FROM r)
        """,
        "distinct_terms_per_lang": """
            WITH words AS (
              SELECT lang,
                     unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '\\S+')) AS term
              FROM documents WHERE lang IS NOT NULL)
            SELECT lang, CAST(COUNT(DISTINCT term) AS BIGINT)
                     AS n_distinct_terms
            FROM words GROUP BY lang
        """,
        # C4 line filter over planted 4-word lines: list slicing replays the
        # engine's word regrouping; the parity CASE replays the punctuation
        # planting; then the two published line rules + the doc-level HAVING
        "c4_filter_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''), '\\S+') AS t
              FROM documents),
            lines AS (
              SELECT doc_id,
                     CAST((x - 1) // 4 AS BIGINT) AS li,
                     array_to_string(t[x:least(x + 3, len(t))], ' ') ||
                       CASE WHEN (doc_id + (x - 1) // 4) % 2 = 0
                            THEN '.' ELSE '' END AS line,
                     least(x + 3, len(t)) - x + 1 AS n_words
              FROM toks,
                   LATERAL (SELECT unnest(generate_series(1, len(t), 4)) AS x)),
            kept AS (
              SELECT doc_id, li, line FROM lines
              WHERE regexp_matches(line, '[.!?]$') AND n_words >= 4)
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY li) AS text_clean,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM kept GROUP BY doc_id HAVING COUNT(*) >= 3
        """,
        "sample_k_docs": """
            SELECT doc_id,
                   CAST(md5_number_lower('samplek|' || CAST(doc_id AS VARCHAR))
                        & ((1::UBIGINT << 60) - 1) AS BIGINT) AS sample_key
            FROM documents
            WHERE doc_id IS NOT NULL
            ORDER BY sample_key, doc_id
            LIMIT 100
        """,
        "events_ranked_by_value": """
            SELECT event_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY value DESC, event_id)
                        AS BIGINT) AS rank
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
                  AND event_id IS NOT NULL
        """,
        # per-label embedding centroid sums: each float32 element promoted
        # to double and floored to e6 integers BEFORE the sum — the
        # (label, dim) sums are order-free exact integers. dim is 1-based
        # on both sides.
        # second-moment (Gram) matrix over e3-quantized vectors: exact
        # integer sums of pairwise products, 1-based upper triangle plus a
        # (0,0,n) sentinel — the same FLOOR quantization convention as
        # embedding_centroids (e3 here: products must stay inside int64).
        "embedding_gram": """
            WITH e AS (
              SELECT vec_id,
                     u.dim,
                     CAST(FLOOR(1e3 * u.v + 0.5) AS BIGINT) AS q
              FROM embeddings,
              LATERAL (SELECT unnest(embedding) AS v,
                              unnest(generate_series(1, len(embedding))) AS dim) u)
            SELECT CAST(a.dim AS BIGINT) AS dim_i,
                   CAST(b.dim AS BIGINT) AS dim_j,
                   CAST(SUM(a.q * b.q) AS BIGINT) AS sum_q2
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
            GROUP BY a.dim, b.dim
            UNION ALL
            SELECT 0, 0, COUNT(*) FROM embeddings
        """,
        "embedding_centroids": """
            WITH e AS (
              SELECT label,
                     u.dim,
                     CAST(FLOOR(1e6 * u.v + 0.5) AS BIGINT) AS q
              FROM embeddings,
              LATERAL (SELECT unnest(embedding) AS v,
                              unnest(generate_series(1, len(embedding))) AS dim) u)
            SELECT label, CAST(dim AS BIGINT) AS dim,
                   CAST(SUM(q) AS BIGINT) AS sum_e6,
                   CAST(COUNT(*) AS BIGINT) AS n_vectors
            FROM e GROUP BY label, dim
        """,
        # CCNet-style LM quality filter: interpolated word-bigram LM trained
        # on the doc_id % 17 == 0 reference subset, every doc scored by its
        # quantized bigram NLL. Per-gram NLL is floored to e6 integers
        # BEFORE the per-doc SUM, so the sum is exact (no float order
        # drift); ln parity rests on the documented libm assumption
        # (see the quantiles_nchars note).
        # DSIR importance weights: per-occurrence quantized log-ratio of
        # target (doc_id % 13 = 0) vs raw (all docs) feature distributions,
        # unigrams + bigrams, add-one smoothing per side — the engine
        # quantizes each occurrence BEFORE the per-doc sum, so this replays
        # the identical FLOOR(1e6·(ln−ln)+0.5) IEEE sequence.
        "dsir_weights_docs": _dsir_sql,
        # DSIR importance resampling: Gumbel-max top-100 ∝ exp(w) — the
        # draw u is a pure function of the salted md5 of the doc id, so the
        # sample is deterministic and this replays the identical
        # floor(1e6·(−ln(−ln(u)))+0.5) integer key.
        "dsir_resample_docs": f"""
            WITH w AS ({_dsir_sql}),
            k AS (
              SELECT doc_id, dsir_e6_sum,
                     CAST(dsir_e6_sum + FLOOR(1e6 * (-ln(-ln(
                       (CAST(md5_number_lower('dsirg|' || CAST(doc_id AS VARCHAR))
                             & ((1::UBIGINT << 60) - 1) AS DOUBLE) + 0.5)
                       / 1152921504606846976.0
                     ))) + 0.5) AS BIGINT) AS key_e6
              FROM w)
            SELECT doc_id, dsir_e6_sum, key_e6
            FROM (SELECT k.*, ROW_NUMBER() OVER (ORDER BY key_e6 DESC, doc_id) AS rn
                  FROM k)
            WHERE rn <= 100
        """,
        # deterministic global shuffle: exact position by salted-md5 order
        "shuffle_docs": f"""
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY {_h60.format(salt='shuffle')}, doc_id) AS BIGINT) AS pos
            FROM documents
            WHERE doc_id IS NOT NULL
        """,
        "lm_score_docs": """
            WITH ttoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents WHERE doc_id % 17 = 0),
            twords AS (SELECT unnest(t) AS w FROM ttoks),
            uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM twords GROUP BY w),
            stats AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n_tok,
                             CAST(COUNT(*) AS BIGINT) AS v FROM uni),
            tbg AS (
              SELECT t[x] AS a, t[x+1] AS b
              FROM ttoks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS x)
              WHERE len(t) >= 2),
            bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                   FROM tbg GROUP BY a, b),
            atoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            abg AS (
              SELECT doc_id, t[x] AS a, t[x+1] AS b
              FROM atoks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS x)
              WHERE len(t) >= 2),
            g AS (
              SELECT abg.doc_id,
                CAST(FLOOR(1e6 * -ln(
                  0.75 * (CASE WHEN ua.c IS NULL THEN 0
                               ELSE coalesce(bi.c, 0) / ua.c END)
                  + 0.25 * ((coalesce(ub.c, 0) + 1) / (s.n_tok + s.v))
                ) + 0.5) AS BIGINT) AS nll
              FROM abg
              LEFT JOIN uni ua ON abg.a = ua.w
              LEFT JOIN uni ub ON abg.b = ub.w
              LEFT JOIN bi ON abg.a = bi.a AND abg.b = bi.b
              CROSS JOIN stats s),
            agg AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(nll) AS BIGINT) AS sm
              FROM g GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.n, 0) AS n_bigrams,
                   coalesce(a.sm, 0) AS nll_e6_sum
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # Gopher repetition signals: per-doc word/bigram frequency maxima,
        # fixed-point via the same FLOOR(x*1e6+0.5) IEEE sequence as the
        # engine. Bigram identity is positional (list slicing), word counts
        # by GROUP BY; zero-token docs and docs without bigrams coalesce 0.
        "repetition_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            words AS (SELECT doc_id, unnest(t) AS w FROM toks),
            wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w),
            agg AS (
              SELECT doc_id, SUM(c) AS nw, MAX(c) AS maxw, COUNT(*) AS ndist
              FROM wc GROUP BY doc_id),
            bg AS (
              SELECT doc_id, array_to_string(t[x:x+1], ' ') AS g
              FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS x)
              WHERE len(t) >= 2),
            bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
            bga AS (SELECT doc_id, MAX(c) AS maxbg, SUM(c) AS nbg
                    FROM bgc GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(coalesce(FLOOR(1e6 * a.maxw / a.nw + 0.5), 0) AS BIGINT)
                AS rep_top_word_e6,
              CAST(coalesce(FLOOR(1e6 * (a.nw - a.ndist) / a.nw + 0.5), 0) AS BIGINT)
                AS dup_word_frac_e6,
              CAST(coalesce(FLOOR(1e6 * b.maxbg / b.nbg + 0.5), 0) AS BIGINT)
                AS rep_top_bigram_e6
            FROM documents d
            LEFT JOIN agg a USING (doc_id)
            LEFT JOIN bga b USING (doc_id)
        """,
        # composed pretraining pipeline: one CTE per engine stage —
        # normalize → lang-ID 'en' filter → Gopher repetition filter
        # (top-word fraction <= 0.16) → md5 keep-first dedup on the
        # normalized text → 3-gram decontamination vs the mod-97 benchmark
        # (drop at >= 3 distinct shared grams) → CCNet LM filter (bigram LM
        # on the normalized mod-17 subset, integer avg-NLL compare) → the 3
        # PII regexp_replace passes → token cumsum + generate_series
        # packing. Each CTE replays the exact formula its standalone oracle
        # uses, so this checks the COMPOSITION, not new math.
        "pretrain_corpus": f"""
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(nfc_normalize(text)),
                                         '[ \\t\\n\\r]+', ' ', 'g'), ' ') AS text_norm
              FROM documents),
            lbase AS (
              SELECT doc_id, coalesce(text,'') AS t,
                     len(coalesce(text,'')) AS nc,
                     len(regexp_extract_all(coalesce(text,''), '[一-鿿]')) AS cjk,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-zà-ÿ]+') AS ws
              FROM documents),
            lwords AS (SELECT doc_id, unnest(ws) AS w FROM lbase),
            lscores AS (
              SELECT doc_id,
                CAST(SUM(CASE WHEN w IN ({en_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_en,
                CAST(SUM(CASE WHEN w IN ({de_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_de,
                CAST(SUM(CASE WHEN w IN ({fr_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_fr,
                CAST(SUM(CASE WHEN w IN ({es_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_es
              FROM lwords GROUP BY doc_id),
            en AS (
              SELECT n.doc_id, n.text_norm
              FROM norm n JOIN lbase b USING (doc_id)
              LEFT JOIN lscores s USING (doc_id)
              WHERE b.nc > 0
                AND NOT (b.cjk > 0.05 * greatest(1, b.nc))
                AND len(b.ws) > 0
                AND greatest(s.s_en, s.s_de, s.s_fr, s.s_es) > 0.01
                AND s.s_en >= s.s_de AND s.s_en >= s.s_fr AND s.s_en >= s.s_es),
            enw AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(coalesce(text_norm,'')),
                                               '\\S+')) AS w
              FROM en),
            enwc AS (SELECT doc_id, w, COUNT(*) AS c FROM enw GROUP BY doc_id, w),
            rep AS (
              SELECT doc_id,
                     CAST(FLOOR(1e6 * MAX(c) / SUM(c) + 0.5) AS BIGINT) AS r
              FROM enwc GROUP BY doc_id),
            enr AS (
              SELECT e.doc_id, e.text_norm
              FROM en e JOIN rep USING (doc_id) WHERE rep.r <= 160000),
            dedup AS (
              SELECT doc_id, text_norm FROM (
                SELECT doc_id, text_norm,
                       ROW_NUMBER() OVER (PARTITION BY md5(text_norm)
                                          ORDER BY doc_id) AS rn
                FROM enr)
              WHERE rn = 1),
            lt AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text_norm,'')), '\\S+') AS t
              FROM norm WHERE doc_id % 17 = 0),
            lw AS (SELECT unnest(t) AS w FROM lt),
            luni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM lw GROUP BY w),
            lstats AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n_tok,
                              CAST(COUNT(*) AS BIGINT) AS v FROM luni),
            ltbg AS (
              SELECT t[x] AS a, t[x+1] AS b
              FROM lt, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS x)
              WHERE len(t) >= 2),
            lbi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                    FROM ltbg GROUP BY a, b),
            ntoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text_norm,'')), '\\S+') AS t
              FROM norm),
            ngrams AS (
              SELECT doc_id,
                     [array_to_string(t[x:x+2], ' ')
                      for x in generate_series(1, len(t)-2)] AS gs
              FROM ntoks WHERE len(t) >= 3),
            nh AS (
              SELECT DISTINCT doc_id,
                CAST(md5_number_lower(g.gram) & 1152921504606846975 AS BIGINT) AS hv
              FROM ngrams, LATERAL (SELECT unnest(gs) AS gram) g),
            nbench AS (SELECT DISTINCT hv FROM nh WHERE doc_id % 97 = 0),
            hits AS (
              SELECT nh.doc_id,
                     CAST(SUM(CASE WHEN b.hv IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hit
              FROM nh LEFT JOIN nbench b ON nh.hv = b.hv
              GROUP BY nh.doc_id),
            clean AS (
              SELECT d.doc_id, d.text_norm
              FROM dedup d LEFT JOIN hits h USING (doc_id)
              WHERE coalesce(h.n_hit, 0) < 3),
            cbg AS (
              SELECT c.doc_id, t.t[x] AS a, t.t[x+1] AS b
              FROM clean c JOIN ntoks t USING (doc_id),
              LATERAL (SELECT unnest(generate_series(1, len(t.t)-1)) AS x)
              WHERE len(t.t) >= 2),
            lg AS (
              SELECT cbg.doc_id,
                CAST(FLOOR(1e6 * -ln(
                  0.75 * (CASE WHEN ua.c IS NULL THEN 0
                               ELSE coalesce(lbi.c, 0) / ua.c END)
                  + 0.25 * ((coalesce(ub.c, 0) + 1) / (s.n_tok + s.v))
                ) + 0.5) AS BIGINT) AS nll
              FROM cbg
              LEFT JOIN luni ua ON cbg.a = ua.w
              LEFT JOIN luni ub ON cbg.b = ub.w
              LEFT JOIN lbi ON cbg.a = lbi.a AND cbg.b = lbi.b
              CROSS JOIN lstats s),
            lagg AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(nll) AS BIGINT) AS sm
              FROM lg GROUP BY doc_id),
            lclean AS (
              SELECT c.doc_id, c.text_norm
              FROM clean c LEFT JOIN lagg USING (doc_id)
              WHERE coalesce(lagg.sm, 0) <= 3826000 * coalesce(lagg.n, 0)),
            red AS (
              SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(text_norm,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                  '<EMAIL>', 'g'),
                  '\\+[0-9]{{7,15}}\\b', '<PHONE>', 'g'),
                  '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b',
                  '<IP>', 'g') AS text_red
              FROM lclean),
            toks AS (
              SELECT doc_id, 1 + len(text_red) // 4 AS tokens FROM red),
            offs AS (
              SELECT doc_id, tokens,
                     COALESCE(SUM(tokens) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS start
              FROM toks)
            SELECT doc_id,
                   unnest(generate_series(
                       CAST(start // 1024 AS BIGINT),
                       CAST((start + tokens - 1) // 1024 AS BIGINT)
                   )) AS seq_id
            FROM offs
        """,
        # sequence-packing replay: concat-and-chunk in doc_id order; each
        # doc's global token offset is a window cumsum, and it belongs to
        # every 1024-token window its span [start, start+tokens) overlaps.
        # The engine computes the same offsets with a range-partitioned
        # distributed prefix sum (stages/pack.py) — no global sort.
        "pack_sequences": """
            WITH d AS (
                SELECT doc_id, 1 + n_chars // 4 AS tokens
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                  AND 1 + n_chars // 4 > 0
            ),
            o AS (
                SELECT doc_id, tokens,
                       COALESCE(SUM(tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS start
                FROM d
            )
            SELECT doc_id,
                   unnest(generate_series(
                       CAST(start // 1024 AS BIGINT),
                       CAST((start + tokens - 1) // 1024 AS BIGINT)
                   )) AS seq_id
            FROM o
        """,
        # frame-sampling replay: the sampled (doc_id, frame_index, width,
        # height) set is a pure formula of doc_id (1 + doc_id%4 frames,
        # every 2nd sampled, frame f sized (8+doc_id%8) x (8+f%8)) — the
        # engine derives it by demuxing + decoding REAL BMP container
        # bytes; the oracle replays the formula with generate_series.
        "multimodal_frames": """
            SELECT doc_id,
                   unnest(generate_series(0, CAST(doc_id % 4 AS BIGINT), 2))
                       AS frame_index,
                   CAST(8 + doc_id % 8 AS BIGINT) AS width,
                   8 + unnest(generate_series(0, CAST(doc_id % 4 AS BIGINT), 2)) % 8
                       AS height
            FROM documents
        """,
        # drift-PSI formula replay: exact integer counts per half + the
        # engine's per-category term (a-e)*ln(a/e) with the 1e-6 clamp, in
        # the SAME expression order (per-row terms — no sum-order float
        # drift). Output is fixed-point micro-units via FLOOR(x*1e6 + 0.5):
        # DuckDB ROUND() and Python round() disagree at half-grid
        # boundaries, FLOOR of the same IEEE doubles cannot. doc_id >= 0 is
        # ENFORCED on both sides (engine filters it too): only there does
        # %2 == bit_wise_and(,1); null lang excluded on both sides.
        "psi_terms_lang": """
            WITH e AS (
                SELECT lang, COUNT(*) AS c FROM documents
                WHERE doc_id >= 0 AND doc_id % 2 = 0 AND lang IS NOT NULL
                GROUP BY 1
            ),
            a AS (
                SELECT lang, COUNT(*) AS c FROM documents
                WHERE doc_id >= 0 AND doc_id % 2 = 1 AND lang IS NOT NULL
                GROUP BY 1
            ),
            keys AS (SELECT lang FROM e UNION SELECT lang FROM a),
            tot AS (
                SELECT greatest(1, (SELECT COALESCE(SUM(c), 0) FROM e)) AS et,
                       greatest(1, (SELECT COALESCE(SUM(c), 0) FROM a)) AS at
            )
            SELECT k.lang AS lang,
                   COALESCE(e.c, 0) AS e_count,
                   COALESCE(a.c, 0) AS a_count,
                   CAST(FLOOR(
                       (greatest(COALESCE(a.c, 0) / tot.at, 1e-6)
                        - greatest(COALESCE(e.c, 0) / tot.et, 1e-6))
                       * ln(greatest(COALESCE(a.c, 0) / tot.at, 1e-6)
                            / greatest(COALESCE(e.c, 0) / tot.et, 1e-6))
                       * 1000000.0 + 0.5) AS BIGINT) AS psi_term_micro
            FROM keys k
            LEFT JOIN e ON e.lang = k.lang
            LEFT JOIN a ON a.lang = k.lang
            CROSS JOIN tot
            ORDER BY lang
        """,
        # LIBM-PARITY ASSUMPTION: this oracle replays DDSketch's bucket math
        # (ceil(ln(x)/ln(gamma)), exp back-projection) in SQL and relies on
        # DuckDB's ln/exp/ceil producing bit-identical IEEE doubles to
        # numpy's (functions/sketches.py:_keys_of) — true when both link the
        # same libm, as on this host. A build pairing with a different math
        # library could flip a value sitting exactly on a bucket boundary by
        # one key; if this check ever fails with a single-bucket off-by-one,
        # suspect libm divergence (a ±1-key near-miss), not sketch logic.
        "quantiles_nchars": """
            WITH p AS (
                SELECT ln((1.0+0.01)/(1.0-0.01)) AS lg
            ),
            v AS (
                SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
                WHERE n_chars > 0
            ),
            b AS (
                SELECT CAST(ceil(ln(x) * (1.0/(SELECT lg FROM p))) AS BIGINT) AS k,
                       COUNT(*) AS c
                FROM v GROUP BY 1
            ),
            o AS (
                SELECT k, SUM(c) OVER (ORDER BY k) AS cum,
                       (SELECT SUM(c) FROM b) AS n
                FROM b
            ),
            qs(q) AS (VALUES (0.01),(0.25),(0.5),(0.75),(0.9),(0.99))
            SELECT qs.q AS q,
                   CAST(FLOOR(2*exp(MIN(o.k) * (SELECT lg FROM p))
                              / (exp((SELECT lg FROM p)) + 1)
                              * 1000000.0 + 0.5) AS BIGINT) AS value_micro
            FROM qs JOIN o ON o.cum > qs.q * (o.n - 1)
            GROUP BY qs.q
            ORDER BY qs.q
        """,
        "quantiles_value_by_type": """
            WITH p AS (
                SELECT ln((1.0+0.01)/(1.0-0.01)) AS lg
            ),
            v AS (
                SELECT event_type, CAST(value AS DOUBLE) AS x FROM events
                WHERE event_type IS NOT NULL AND value > 0
            ),
            b AS (
                SELECT event_type,
                       CAST(ceil(ln(x) * (1.0/(SELECT lg FROM p))) AS BIGINT) AS k,
                       COUNT(*) AS c
                FROM v GROUP BY 1, 2
            ),
            o AS (
                SELECT event_type, k,
                       SUM(c) OVER (PARTITION BY event_type ORDER BY k) AS cum,
                       SUM(c) OVER (PARTITION BY event_type) AS n
                FROM b
            ),
            qs(q) AS (VALUES (0.25),(0.5),(0.9),(0.99))
            SELECT o.event_type, qs.q AS q,
                   CAST(FLOOR(2*exp(MIN(o.k) * (SELECT lg FROM p))
                              / (exp((SELECT lg FROM p)) + 1)
                              * 1000000.0 + 0.5) AS BIGINT) AS value_micro
            FROM qs JOIN o ON o.cum > qs.q * (o.n - 1)
            GROUP BY o.event_type, qs.q
        """,
        "events_type_pivot": """
            SELECT user_id,
                   COUNT(*) FILTER (event_type = 'click')    AS n_click,
                   COUNT(*) FILTER (event_type = 'view')     AS n_view,
                   COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
                   COUNT(*) FILTER (event_type = 'error')    AS n_error,
                   COUNT(*) FILTER (event_type IS NULL OR event_type NOT IN
                       ('click','view','purchase','signup','error'))
                       AS n_other
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id
        """,
        "zscore_events_by_type": """
            WITH q AS (
                SELECT event_id, event_type,
                       CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5)
                            AS BIGINT) AS x_e
                FROM events
                WHERE event_type IS NOT NULL AND value IS NOT NULL
                      AND NOT isnan(value)
            ),
            m AS (
                SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(x_e) AS BIGINT) AS sum_e,
                       CAST(SUM(x_e * x_e) AS BIGINT) AS ssq_e
                FROM q GROUP BY 1
            )
            SELECT q.event_id, q.event_type,
                   CASE WHEN m.n >= 2
                             AND (m.ssq_e / m.n
                                  - (m.sum_e / m.n) * (m.sum_e / m.n)) > 0
                        THEN CAST(FLOOR(
                            (q.x_e - m.sum_e / m.n)
                            / sqrt(m.ssq_e / m.n
                                   - (m.sum_e / m.n) * (m.sum_e / m.n))
                            * 1000000.0 + 0.5) AS BIGINT)
                        ELSE NULL END AS z_e6
            FROM q JOIN m USING (event_type)
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
        "top_docs_per_lang": """
            SELECT lang, doc_id, n_chars, CAST(rn AS BIGINT) AS rnk FROM (
                SELECT lang, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) AS rn
                FROM documents WHERE lang IS NOT NULL)
            WHERE rn <= 3
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
        # BPE merge statistic: adjacent char pairs of each distinct token,
        # weighted by the token's corpus frequency; pair i = substring(tok,
        # i, 2) for i in 1..len-1 (a length-1 token yields no pairs because
        # generate_series(1, 0) is empty)
        "bpe_pair_counts": """
            WITH toks AS (
                SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
                FROM documents WHERE text IS NOT NULL),
            tf AS (
                SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
                FROM toks WHERE tok <> '' GROUP BY tok),
            pairs AS (
                SELECT substring(tok,
                                 CAST(unnest(generate_series(1, length(tok) - 1)) AS INTEGER),
                                 2) AS pair,
                       f
                FROM tf)
            SELECT pair, CAST(SUM(f) AS BIGINT) AS freq
            FROM pairs GROUP BY pair
            ORDER BY freq DESC, pair LIMIT 50
        """,
        "truncate_docs": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(coalesce(text, ''), '\\S+') AS tl
                FROM documents)
            SELECT doc_id,
                   array_to_string(tl[1:64], ' ') AS text_trunc,
                   CAST(len(tl) AS BIGINT) AS n_tokens,
                   len(tl) > 64 AS was_truncated
            FROM toks
        """,
        "corr_lineitem": """
            WITH q AS (
                SELECT l_returnflag AS k,
                       CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 1.0 + 0.5)
                            AS BIGINT) AS xe,
                       CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 1.0
                                  + 0.5) AS BIGINT) AS ye
                FROM lineitem
                WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
                      AND l_extendedprice IS NOT NULL
            ),
            m AS (
                SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(xe) AS BIGINT) AS sx,
                       CAST(SUM(ye) AS BIGINT) AS sy,
                       CAST(SUM(xe * ye) AS BIGINT) AS sxy,
                       CAST(SUM(xe * xe) AS BIGINT) AS sxx,
                       CAST(SUM(ye * ye) AS BIGINT) AS syy
                FROM q GROUP BY k
            )
            SELECT k AS l_returnflag, n,
                   CASE WHEN n >= 2
                             AND CAST(n AS DOUBLE) * sxx
                                 - CAST(sx AS DOUBLE) * sx > 0
                             AND CAST(n AS DOUBLE) * syy
                                 - CAST(sy AS DOUBLE) * sy > 0
                        THEN CAST(FLOOR(
                            (CAST(n AS DOUBLE) * sxy
                             - CAST(sx AS DOUBLE) * sy)
                            / (sqrt(CAST(n AS DOUBLE) * sxx
                                    - CAST(sx AS DOUBLE) * sx)
                               * sqrt(CAST(n AS DOUBLE) * syy
                                      - CAST(sy AS DOUBLE) * sy))
                            * 1000000.0 + 0.5) AS BIGINT)
                        ELSE NULL END AS corr_e6
            FROM m
        """,
        "diff_docs_halves": """
            WITH a AS (
                SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_a
                FROM documents WHERE doc_id % 2 = 0 GROUP BY 1, 2),
            b AS (
                SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_b
                FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2)
            SELECT COALESCE(a.lang, b.lang) AS lang,
                   COALESCE(a.source, b.source) AS source,
                   COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
            FROM a FULL JOIN b ON a.lang IS NOT DISTINCT FROM b.lang
                              AND a.source IS NOT DISTINCT FROM b.source
            WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0)
        """,
        "clip_events_by_type": """
            WITH p AS (
                SELECT ln((1.0+0.01)/(1.0-0.01)) AS lg
            ),
            v AS (
                SELECT event_id, event_type, CAST(value AS DOUBLE) AS x
                FROM events
                WHERE event_type IS NOT NULL AND value > 0
            ),
            b AS (
                SELECT event_type,
                       CAST(ceil(ln(x) * (1.0/(SELECT lg FROM p)))
                            AS BIGINT) AS k,
                       COUNT(*) AS c
                FROM v GROUP BY 1, 2
            ),
            o AS (
                SELECT event_type, k,
                       SUM(c) OVER (PARTITION BY event_type ORDER BY k)
                           AS cum,
                       SUM(c) OVER (PARTITION BY event_type) AS n
                FROM b
            ),
            qs(q) AS (VALUES (0.05), (0.95)),
            band AS (
                SELECT o.event_type, qs.q,
                       CAST(FLOOR(2*exp(MIN(o.k) * (SELECT lg FROM p))
                                  / (exp((SELECT lg FROM p)) + 1)
                                  * 1000000.0 + 0.5) AS BIGINT) AS vm
                FROM qs JOIN o ON o.cum > qs.q * (o.n - 1)
                GROUP BY o.event_type, qs.q
            ),
            wide AS (
                SELECT event_type,
                       MAX(vm) FILTER (q = 0.05) AS lo,
                       MAX(vm) FILTER (q = 0.95) AS hi
                FROM band GROUP BY event_type
            )
            SELECT v.event_id, v.event_type,
                   CAST(FLOOR(v.x * 1000000.0 + 0.5) AS BIGINT) AS value_e6,
                   LEAST(GREATEST(
                       CAST(FLOOR(v.x * 1000000.0 + 0.5) AS BIGINT),
                       w.lo), w.hi) AS clipped_e6
            FROM v JOIN wide w USING (event_type)
        """,
        "user_features": """
            WITH pv AS (
                SELECT user_id,
                       COUNT(*) FILTER (event_type = 'click')    AS n_click,
                       COUNT(*) FILTER (event_type = 'view')     AS n_view,
                       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                       COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
                       COUNT(*) FILTER (event_type = 'error')    AS n_error,
                       COUNT(*) FILTER (event_type IS NULL OR event_type
                           NOT IN ('click','view','purchase','signup','error'))
                           AS n_other
                FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
            starts AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR date_diff('microsecond', lag(ts) OVER w, ts)
                                 > 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
                SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions
                FROM starts GROUP BY user_id),
            e AS (
                SELECT user_id, ts, event_type FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            fun AS (
                SELECT DISTINCT a.user_id FROM e a
                WHERE a.event_type = 'view' AND EXISTS (
                    SELECT 1 FROM e b
                    WHERE b.user_id = a.user_id AND b.event_type = 'click'
                      AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
                      AND EXISTS (
                        SELECT 1 FROM e c
                        WHERE c.user_id = b.user_id
                          AND c.event_type = 'purchase'
                          AND c.ts > b.ts
                          AND c.ts <= b.ts + INTERVAL 6 HOUR))),
            val AS (
                SELECT user_id,
                       CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0
                                           + 0.5) AS BIGINT)) AS BIGINT)
                           AS total_value_cents
                FROM events
                WHERE user_id IS NOT NULL AND value IS NOT NULL
                      AND NOT isnan(value)
                GROUP BY user_id)
            SELECT pv.user_id, pv.n_click, pv.n_view, pv.n_purchase,
                   pv.n_signup, pv.n_error, pv.n_other,
                   COALESCE(sess.n_sessions, 0) AS n_sessions,
                   CASE WHEN fun.user_id IS NOT NULL THEN 1 ELSE 0 END
                       AS converted,
                   COALESCE(val.total_value_cents, 0) AS total_value_cents
            FROM pv
            LEFT JOIN sess USING (user_id)
            LEFT JOIN fun  USING (user_id)
            LEFT JOIN val  USING (user_id)
        """,
        "events_funnel": """
            WITH e AS (
                SELECT user_id, ts, event_type FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            )
            SELECT a.user_id, MIN(a.ts) AS first_start_ts
            FROM e a
            WHERE a.event_type = 'view' AND EXISTS (
                SELECT 1 FROM e b
                WHERE b.user_id = a.user_id AND b.event_type = 'click'
                  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
                  AND EXISTS (
                    SELECT 1 FROM e c
                    WHERE c.user_id = b.user_id
                      AND c.event_type = 'purchase'
                      AND c.ts > b.ts AND c.ts <= b.ts + INTERVAL 6 HOUR))
            GROUP BY a.user_id
        """,
        "events_hourly_anomaly": """
            WITH h AS (
                SELECT event_type, date_trunc('hour', ts) AS hour,
                       CAST(COUNT(*) AS BIGINT) AS n_events
                FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL
                GROUP BY 1, 2)
            SELECT event_type, hour, n_events,
                   CAST(LAG(n_events) OVER (PARTITION BY event_type
                                            ORDER BY hour) AS BIGINT)
                       AS prev_n,
                   COALESCE(n_events > 2 * LAG(n_events) OVER (
                       PARTITION BY event_type ORDER BY hour), FALSE)
                       AS is_spike
            FROM h
        """,
        "chunk_pairs_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''), '\\S+') AS t
              FROM documents),
            ch AS (
              SELECT doc_id,
                     CAST((x - 1) // 32 AS BIGINT) AS chunk_id,
                     array_to_string(t[x:least(x + 31, len(t))], ' ')
                         AS chunk_text
              FROM toks,
                   LATERAL (SELECT unnest(generate_series(1, len(t), 32))
                            AS x))
            SELECT a.doc_id, a.chunk_id AS pair_id,
                   a.chunk_text AS text_a, b.chunk_text AS text_b
            FROM ch a JOIN ch b
              ON b.doc_id = a.doc_id AND b.chunk_id = a.chunk_id + 1
        """,
        "revenue_by_nation": """
            SELECT n.n_name,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_e4
            FROM customer c
            JOIN orders o   ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN nation n   ON n.n_nationkey = c.c_nationkey
            GROUP BY 1
        """,
        "token_budget_docs": f"""
            SELECT lang, doc_id, n_chars, cum_n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       CAST(SUM(n_chars) OVER (
                           PARTITION BY lang
                           ORDER BY {_h60.format(salt="budget")}, doc_id
                       ) AS BIGINT) AS cum_n_chars
                FROM documents
                WHERE lang IS NOT NULL AND doc_id IS NOT NULL
                      AND n_chars IS NOT NULL)
            WHERE cum_n_chars <= 20000
        """,
        "order_reconciliation": """
            WITH li AS (
                SELECT l_orderkey,
                       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                           AS items_cents
                FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
            o AS (
                SELECT o_orderkey, o_orderstatus,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           AS header_cents
                FROM orders)
            SELECT o.o_orderstatus,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CASE WHEN COALESCE(li.items_cents, 0)
                                      <> o.header_cents
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_mismatched,
                   CAST(SUM(ABS(o.header_cents
                                - COALESCE(li.items_cents, 0))) AS BIGINT)
                       AS sum_abs_diff_cents
            FROM o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "inverted_index_terms": """
            WITH td AS (
                SELECT DISTINCT t.term, t.doc_id
                FROM (
                    SELECT doc_id,
                           unnest(regexp_extract_all(
                               lower(coalesce(text, '')), '\\S+')) AS term
                    FROM documents WHERE doc_id IS NOT NULL) t
                WHERE t.term <> ''),
            g AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM td GROUP BY 1
                HAVING COUNT(*) BETWEEN 2 AND 100000),
            r AS (
                SELECT term, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY term
                                          ORDER BY doc_id) AS rn
                FROM td)
            SELECT g.term, g.df,
                   string_agg(CAST(r.doc_id AS VARCHAR), ','
                              ORDER BY r.doc_id) AS postings
            FROM g JOIN r USING (term)
            WHERE r.rn <= 5
            GROUP BY 1, 2
        """,
        "customer_order_counts": """
            SELECT c.c_custkey, c.c_mktsegment,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        """,
        "active_users_24h": """
            WITH p AS (
                SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            hours AS (
                SELECT DISTINCT date_trunc('hour', ts) AS hour
                FROM events WHERE ts IS NOT NULL)
            SELECT hh.hour,
                   CAST(COUNT(DISTINCT p.user_id) AS BIGINT)
                       AS n_active_users
            FROM hours hh JOIN p
              ON p.h BETWEEN hh.hour - INTERVAL 23 HOUR AND hh.hour
            GROUP BY 1
        """,
        "user_event_paths": """
            WITH r AS (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_type IS NOT NULL)
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path,
                   CAST(COUNT(*) AS BIGINT) AS n_path_events
            FROM r WHERE rn <= 8 GROUP BY user_id
        """,
        "copurchase_suppliers": """
            WITH s AS (
                SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL),
            p AS (
                SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
                       COUNT(*) AS n_orders
                FROM s a JOIN s b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
                GROUP BY 1, 2)
            SELECT supp_a, supp_b, n_orders
            FROM p ORDER BY n_orders DESC, supp_a, supp_b LIMIT 50
        """,
        # triangle counting is orientation-invariant: the engine's
        # degree-ordered node-iterator finds the same triangle SET as this
        # triple self-join, so per-node counts hash-match exactly. The md5
        # edge thinning keeps the graph sparse at every sf and is replayed
        # verbatim (same 'tri|u|v' salt, low-60-bit md5, % 10).
        "triangle_suppliers": """
            WITH pairs0 AS (
                SELECT a.l_suppkey AS u, b.l_suppkey AS v
                FROM lineitem a JOIN lineitem b
                     ON a.l_orderkey = b.l_orderkey
                WHERE a.l_suppkey < b.l_suppkey
                GROUP BY 1, 2
                HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
            e AS (
                SELECT u, v FROM pairs0
                WHERE (md5_number_lower(
                           'tri|' || CAST(u AS VARCHAR) || '|'
                                  || CAST(v AS VARCHAR))
                       & ((1::UBIGINT << 60) - 1)) % 4 = 0),
            tri AS (
                SELECT e1.u AS x, e1.v AS y, e2.v AS z
                FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
            n AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM n GROUP BY node
        """,
        # PMI in lnq fixed-point (floor(ln·1e6 + 0.5)) — the same integer
        # log the entropy oracle replays, so hashes can't drift on float
        # evaluation order
        "collocations_docs": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '\\S+') AS t
                FROM documents),
            big AS (
                SELECT t[x] AS w1, t[x + 1] AS w2
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
                              AS x)),
            uni AS (SELECT unnest(t) AS w FROM toks),
            nb AS (SELECT COUNT(*) AS n FROM big),
            nu AS (SELECT COUNT(*) AS n FROM uni),
            bc AS (SELECT w1, w2, COUNT(*) AS c FROM big
                   GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1)
            SELECT bc.w1, bc.w2, CAST(bc.c AS BIGINT) AS c_xy,
                   CAST(
                     CAST(FLOOR(ln(CAST(bc.c AS DOUBLE)) * 1000000.0 + 0.5)
                          AS BIGINT)
                   - CAST(FLOOR(ln(CAST(nb.n AS DOUBLE)) * 1000000.0 + 0.5)
                          AS BIGINT)
                   - CAST(FLOOR(ln(CAST(u1.c AS DOUBLE)) * 1000000.0 + 0.5)
                          AS BIGINT)
                   - CAST(FLOOR(ln(CAST(u2.c AS DOUBLE)) * 1000000.0 + 0.5)
                          AS BIGINT)
                   + 2 * CAST(FLOOR(ln(CAST(nu.n AS DOUBLE)) * 1000000.0
                                    + 0.5) AS BIGINT)
                   AS BIGINT) AS pmi_e6
            FROM bc
            CROSS JOIN nb CROSS JOIN nu
            JOIN uc u1 ON u1.w = bc.w1
            JOIN uc u2 ON u2.w = bc.w2
            ORDER BY pmi_e6 DESC, bc.w1, bc.w2
            LIMIT 30
        """,
        # centroid means e3-quantized with an EXACT floor: |sum_e6| < 2^53
        # so FLOOR(sum_e6 / (n*1000.0)) in double equals integer floor
        # division (DuckDB's // truncates toward zero on negatives, so the
        # double-FLOOR form is the portable exact floor)
        "centroid_similarity_labels": """
            WITH e AS (
              SELECT label, u.dim,
                     CAST(FLOOR(1e6 * u.v + 0.5) AS BIGINT) AS q
              FROM embeddings,
              LATERAL (SELECT unnest(embedding) AS v,
                              unnest(generate_series(1, len(embedding)))
                                  AS dim) u),
            s AS (SELECT label, dim, SUM(q) AS sum_e6, COUNT(*) AS n
                  FROM e GROUP BY 1, 2),
            m AS (SELECT label, dim,
                         CAST(FLOOR(CAST(sum_e6 AS DOUBLE)
                                    / (n * 1000.0)) AS BIGINT) AS v
                  FROM s),
            norms AS (SELECT label, CAST(SUM(v * v) AS BIGINT) AS norm2
                      FROM m GROUP BY 1),
            dots AS (
              SELECT a.label AS label_a, b.label AS label_b,
                     CAST(SUM(a.v * b.v) AS BIGINT) AS dot_e6
              FROM m a JOIN m b ON a.dim = b.dim AND a.label < b.label
              GROUP BY 1, 2)
            SELECT d.label_a, d.label_b, d.dot_e6,
                   na.norm2 AS norm2_a_e6, nb.norm2 AS norm2_b_e6
            FROM dots d
            JOIN norms na ON na.label = d.label_a
            JOIN norms nb ON nb.label = d.label_b
        """,
        "supplier_hhi_by_nation": """
            WITH v AS (
                SELECT s_nationkey AS nk,
                       CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bc
                FROM supplier
                WHERE s_nationkey IS NOT NULL AND s_acctbal > 0),
            tot AS (SELECT nk, SUM(bc) AS total FROM v GROUP BY 1),
            sh AS (SELECT v.nk, (v.bc * 1000000) // t.total AS s
                   FROM v JOIN tot t USING (nk))
            SELECT nk AS n_nationkey,
                   CAST(SUM(s * s) // 1000000 AS BIGINT) AS hhi_e6
            FROM sh GROUP BY 1
        """,
        # OHLC: open/close are the values at the min/max (ts, event_id) of
        # each (type, hour) bucket — FIRST_VALUE/LAST_VALUE semantics with
        # a total tie-break
        "events_ohlc_hourly": """
            WITH v AS (
                SELECT event_type,
                       (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
                       epoch_us(ts) AS tsu, event_id,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc
                FROM events
                WHERE event_type IS NOT NULL AND ts IS NOT NULL
                      AND event_id IS NOT NULL
                      AND value IS NOT NULL AND NOT isnan(value)),
            r AS (
                SELECT *,
                       ROW_NUMBER() OVER (PARTITION BY event_type, hour_us
                                          ORDER BY tsu, event_id) AS ra,
                       ROW_NUMBER() OVER (PARTITION BY event_type, hour_us
                                          ORDER BY tsu DESC,
                                                   event_id DESC) AS rd
                FROM v),
            agg AS (
                SELECT event_type, hour_us,
                       CAST(MIN(vc) AS BIGINT) AS low_cents,
                       CAST(MAX(vc) AS BIGINT) AS high_cents,
                       CAST(COUNT(*) AS BIGINT) AS n_events
                FROM v GROUP BY 1, 2)
            SELECT a.event_type, CAST(a.hour_us AS BIGINT) AS hour_us,
                   o.vc AS open_cents, a.high_cents, a.low_cents,
                   c.vc AS close_cents, a.n_events
            FROM agg a
            JOIN r o ON o.event_type = a.event_type
                    AND o.hour_us = a.hour_us AND o.ra = 1
            JOIN r c ON c.event_type = a.event_type
                    AND c.hour_us = a.hour_us AND c.rd = 1
        """,
        # local clustering coefficient: floor(1e6*2*tri/(d*(d-1))), nodes
        # with degree >= 2 (triangle set is orientation-invariant; the
        # degree comes from the same canonical edge set)
        "clustering_coeff_suppliers": """
            WITH pairs0 AS (
                SELECT a.l_suppkey AS u, b.l_suppkey AS v
                FROM lineitem a JOIN lineitem b
                     ON a.l_orderkey = b.l_orderkey
                WHERE a.l_suppkey < b.l_suppkey
                GROUP BY 1, 2
                HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
            e AS (
                SELECT u, v FROM pairs0
                WHERE (md5_number_lower(
                           'tri|' || CAST(u AS VARCHAR) || '|'
                                  || CAST(v AS VARCHAR))
                       & ((1::UBIGINT << 60) - 1)) % 4 = 0),
            deg AS (
                SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
                    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                GROUP BY 1),
            tri AS (
                SELECT e1.u AS x, e1.v AS y, e2.v AS z
                FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
            tcnt AS (
                SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
                    SELECT x AS node FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri)
                GROUP BY 1)
            SELECT d.node, d.degree,
                   CAST((2000000 * COALESCE(t.t, 0))
                        // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_e6
            FROM deg d LEFT JOIN tcnt t USING (node)
            WHERE d.degree >= 2
        """,
        "minmax_events_by_type": """
            WITH v AS (
                SELECT event_id, event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc
                FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
                      AND event_type IS NOT NULL AND event_id IS NOT NULL),
            b AS (SELECT event_type, MIN(vc) AS lo, MAX(vc) AS hi
                  FROM v GROUP BY 1)
            SELECT v.event_id, v.event_type,
                   CASE WHEN b.hi > b.lo
                        THEN ((v.vc - b.lo) * 1000000) // (b.hi - b.lo)
                        ELSE 0 END AS norm_e6
            FROM v JOIN b USING (event_type)
        """,
        # robust outliers: lower median + lower-median MAD + a 5*MAD flag
        # count, all under the engine's ROW_NUMBER (n+1)//2 definition
        "mad_outliers_by_type": """
            WITH v AS (
                SELECT event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc,
                       event_id
                FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
                      AND event_type IS NOT NULL AND event_id IS NOT NULL),
            med AS (
                SELECT event_type, vc AS median_cents FROM (
                    SELECT event_type, vc,
                           ROW_NUMBER() OVER (PARTITION BY event_type
                                              ORDER BY vc, event_id) AS rn,
                           COUNT(*) OVER (PARTITION BY event_type) AS n
                    FROM v)
                WHERE rn = (n + 1) // 2),
            dev AS (
                SELECT v.event_type, ABS(v.vc - m.median_cents) AS d,
                       v.event_id
                FROM v JOIN med m USING (event_type)),
            mad AS (
                SELECT event_type, d AS mad_cents FROM (
                    SELECT event_type, d,
                           ROW_NUMBER() OVER (PARTITION BY event_type
                                              ORDER BY d, event_id) AS rn,
                           COUNT(*) OVER (PARTITION BY event_type) AS n
                    FROM dev)
                WHERE rn = (n + 1) // 2)
            SELECT m.event_type, m.median_cents, a.mad_cents,
                   CAST((SELECT COUNT(*) FROM dev d
                         WHERE d.event_type = m.event_type
                           AND d.d > 5 * a.mad_cents) AS BIGINT)
                       AS n_outliers
            FROM med m JOIN mad a USING (event_type)
        """,
        "revenue_share_by_nation": """
            WITH rev AS (
                SELECT n.n_name,
                       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100)
                                     AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100)
                                          AS BIGINT)))
                            AS BIGINT) AS revenue_e4
                FROM customer c
                JOIN orders o   ON o.o_custkey = c.c_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                JOIN nation n   ON n.n_nationkey = c.c_nationkey
                GROUP BY 1)
            SELECT n_name, revenue_e4,
                   CAST((CAST(revenue_e4 AS HUGEINT) * 1000000)
                        // (SELECT SUM(CAST(revenue_e4 AS HUGEINT))
                            FROM rev) AS BIGINT) AS share_e6
            FROM rev
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE c_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000)
        """,
        # exact grouped quartiles: the value at ROW_NUMBER ceil(n*q/4)
        # under (value, event_id) order per group — same composite-key rank
        # plan as median_value_by_type
        "quartiles_value_by_type_exact": """
            WITH v AS (
                SELECT event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc,
                       event_id
                FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
                      AND event_type IS NOT NULL AND event_id IS NOT NULL),
            r AS (
                SELECT event_type, vc,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY vc, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM v),
            q(quarter) AS (VALUES (1), (2), (3))
            SELECT event_type,
                   CAST(quarter * 25 AS BIGINT) AS quartile,
                   CAST(vc AS BIGINT) AS value_cents
            FROM r CROSS JOIN q
            WHERE rn = (n * quarter + 3) // 4
        """,
        "events_user_next": """
            SELECT user_id, event_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   LEAD(event_id) OVER w AS next_id,
                   CAST(epoch_us(LEAD(ts) OVER w)
                        - epoch_us(ts) AS BIGINT) AS gap_us
            FROM events
            WHERE user_id IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # k-core: fixed peeling rounds unrolled as CTEs (the pagerank
        # oracle pattern); the engine early-breaks on convergence, which
        # leaves identical results because further rounds are no-ops
        "kcore_suppliers": _kcore_sql(k=2, rounds=4),
        # Efraimidis-Spirakis weighted sampling: -ln(u)/w quantized to an
        # int64 key (lnq9 then integer floor-division) so the order — and
        # therefore the sample — is identical on both sides
        "weighted_sample_docs": """
            SELECT doc_id, n_chars, es_key FROM (
                SELECT doc_id, n_chars,
                       ((-CAST(FLOOR(ln(
                            (CAST(md5_number_lower('wsample|'
                                  || CAST(doc_id AS VARCHAR))
                                  & ((1::UBIGINT << 60) - 1) AS DOUBLE)
                             + 1.0) / 1152921504606846976.0)
                            * 1000000000.0 + 0.5) AS BIGINT))
                        * 1000000) // n_chars AS es_key
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                      AND n_chars > 0)
            ORDER BY es_key, doc_id
            LIMIT 100
        """,
        # entity-resolution composition: components of the ED<=1 name graph,
        # labels = min suppkey per component (singletons label themselves) —
        # the recursive CTE computes full reachability then takes MIN
        "fuzzy_supplier_clusters": """
            WITH RECURSIVE v AS (
                SELECT s_name AS t, s_suppkey AS k FROM supplier
                WHERE s_name IS NOT NULL AND s_suppkey IS NOT NULL
                      AND len(s_name) <= 32),
            e AS (
                SELECT a.k AS ka, b.k AS kb
                FROM v a JOIN v b
                  ON a.t < b.t AND levenshtein(a.t, b.t) <= 1),
            sym AS (SELECT ka AS a, kb AS b FROM e
                    UNION SELECT kb, ka FROM e),
            reach(n, m) AS (
                SELECT k, k FROM v
                UNION
                SELECT r.n, s.b FROM reach r JOIN sym s ON s.a = r.m)
            SELECT n AS s_suppkey, CAST(MIN(m) AS BIGINT) AS cluster_id
            FROM reach GROUP BY n
        """,
        "returned_revenue_customers": """
            SELECT c.c_custkey, c.c_name,
                   CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                       AS acctbal_cents,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100)
                                          AS BIGINT)))
                        AS BIGINT) AS revenue_e4
            FROM customer c
            JOIN orders o   ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1, 2, 3
            ORDER BY revenue_e4 DESC, c.c_custkey
            LIMIT 20
        """,
        "events_user_cumsum": """
            WITH q AS (
                SELECT user_id, event_id, ts,
                       CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5)
                            AS BIGINT) AS value_e
                FROM events WHERE user_id IS NOT NULL)
            SELECT user_id, event_id, value_e,
                   CAST(SUM(value_e)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS run_sum_e
            FROM q
        """,
        # chi-square on the FULL lang x source cross product (unseen combos
        # contribute r*c/N); per-cell floor in HUGEINT matches the engine's
        # Python-int floor bit for bit
        "chi2_lang_source": """
            WITH v AS (SELECT lang, source FROM documents
                       WHERE lang IS NOT NULL AND source IS NOT NULL),
            o AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
                  FROM v GROUP BY 1, 2),
            r AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS r FROM v
                  GROUP BY 1),
            c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM v
                  GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
            cell AS (
                SELECT r.lang, c.source, r.r, c.c,
                       COALESCE(o.o, 0) AS o
                FROM r CROSS JOIN c
                LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
            diff AS (
                SELECT r, c,
                       CAST(o AS HUGEINT) * n.n
                         - CAST(r AS HUGEINT) * c AS d,
                       CAST(n.n AS HUGEINT) AS nh
                FROM cell CROSS JOIN n),
            contrib AS (
                -- d * d, not d ** 2: DuckDB's ** returns DOUBLE
                SELECT (1000000::HUGEINT * d * d) // (nh * r * c) AS x
                FROM diff)
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cell) AS n_cells,
                   (SELECT CAST((COUNT(DISTINCT lang) - 1)
                                * (COUNT(DISTINCT source) - 1) AS BIGINT)
                    FROM v) AS dof,
                   CAST(SUM(x) AS BIGINT) AS chi2_e6
            FROM contrib
        """,
        # BM25 with k1=1.2, b=0.75 as exact integer arithmetic:
        # idf_e6 = lnq(2N+2) - lnq(2df+1)   (= ln((N-df+.5)/(df+.5)+1) with
        #          integer log arguments), tf saturation as one rational
        # (num/den scaled by 20*sumlen), per-term floor products — replayed
        # verbatim, so the engine hash-matches including tie sets
        "bm25_topk_docs": f"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '\\S+') AS t
                FROM documents WHERE doc_id IS NOT NULL),
            s AS (SELECT COUNT(*) AS n, SUM(len(t)) AS sl FROM toks),
            q(query_id, term) AS (VALUES {_bm25_values()}),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM (SELECT doc_id, unnest(t) AS term FROM toks)
                   WHERE term IN (SELECT term FROM q)
                   GROUP BY 1, 2),
            dl AS (SELECT doc_id, len(t) AS l FROM toks),
            df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf
                   GROUP BY 1),
            contrib AS (
                SELECT q.query_id, tf.doc_id,
                       ((CAST(FLOOR(ln(CAST(2 * s.n + 2 AS DOUBLE))
                                    * 1000000.0 + 0.5) AS BIGINT)
                         - CAST(FLOOR(ln(CAST(2 * df.df + 1 AS DOUBLE))
                                      * 1000000.0 + 0.5) AS BIGINT))
                        * ((44 * tf.tf * s.sl * 1000000)
                           // (20 * tf.tf * s.sl + 6 * s.sl
                               + 18 * dl.l * s.n))) // 1000000 AS c
                FROM q
                JOIN tf ON tf.term = q.term
                JOIN df ON df.term = q.term
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN s),
            score AS (SELECT query_id, doc_id,
                             CAST(SUM(c) AS BIGINT) AS score_e6
                      FROM contrib GROUP BY 1, 2)
            SELECT query_id, doc_id, score_e6 FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY score_e6 DESC,
                                                      doc_id) AS rn
                FROM score)
            WHERE rn <= 10
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_cents
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY ts DESC,
                                                      event_id DESC) AS rn
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_id IS NOT NULL)
            WHERE rn = 1
        """,
        # lower median = the value at ROW_NUMBER (n+1)//2 under
        # (value, event_id) order — tie order can't change the value at
        # the median rank, so the composite-key rank plan is exact
        "median_value_by_type": """
            WITH v AS (
                SELECT event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc,
                       event_id
                FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
                      AND event_type IS NOT NULL AND event_id IS NOT NULL),
            r AS (
                SELECT event_type, vc,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY vc, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM v)
            SELECT event_type, CAST(vc AS BIGINT) AS median_cents
            FROM r WHERE rn = (n + 1) // 2
        """,
        "intersect_docs_halves": """
            WITH a AS (SELECT lang, CAST(n_chars // 10 AS BIGINT) AS nb
                       FROM documents WHERE doc_id % 2 = 0),
            b AS (SELECT lang, CAST(n_chars // 10 AS BIGINT) AS nb
                  FROM documents WHERE doc_id % 2 = 1),
            i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
            SELECT lang, nb, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM i GROUP BY 1, 2
        """,
        "unpivot_lineitem": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   m.measure,
                   CAST(ROUND(CASE m.measure
                        WHEN 'l_quantity' THEN l_quantity
                        WHEN 'l_extendedprice' THEN l_extendedprice
                        WHEN 'l_discount' THEN l_discount
                        ELSE l_tax END * 100) AS BIGINT) AS value_cents
            FROM lineitem
            CROSS JOIN (SELECT unnest(['l_quantity', 'l_extendedprice',
                                       'l_discount', 'l_tax']) AS measure) m
            WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
        """,
        # intra-doc line dedup: the same 2-word planting CTE on both sides,
        # first occurrence kept by ROW_NUMBER over (doc, line) ordered by
        # line index — byte-exact text_clean
        "dedup_lines_docs": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(coalesce(text, ''), '\\S+') AS t
                FROM documents),
            lines AS (
                SELECT doc_id,
                       CAST((x - 1) // 2 AS BIGINT) AS li,
                       array_to_string(t[x:least(x + 1, len(t))], ' ') ||
                         CASE WHEN (doc_id + (x - 1) // 2) % 2 = 0
                              THEN '.' ELSE '' END AS line
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(1, len(t), 2))
                              AS x)),
            kept AS (
                SELECT doc_id, li, line FROM (
                    SELECT doc_id, li, line,
                           ROW_NUMBER() OVER (PARTITION BY doc_id, line
                                              ORDER BY li) AS rn
                    FROM lines)
                WHERE rn = 1),
            agg AS (
                SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY li) AS text_clean,
                       COUNT(*) AS n_kept
                FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines
                    GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.text_clean, '') AS text_clean,
                   CAST(coalesce(t.n_lines - a.n_kept, 0) AS BIGINT)
                       AS n_removed
            FROM documents d
            LEFT JOIN agg a USING (doc_id)
            LEFT JOIN tot t USING (doc_id)
        """,
        # the engine's deletion-neighborhood join verifies every candidate
        # with an exact ED <= 1 kernel, so it equals the brute-force
        # levenshtein cross join
        "fuzzy_supplier_names": """
            WITH v AS (
                SELECT DISTINCT s_name AS t FROM supplier
                WHERE s_name IS NOT NULL AND len(s_name) <= 32)
            SELECT a.t AS w1, b.t AS w2
            FROM v a JOIN v b
              ON a.t < b.t AND levenshtein(a.t, b.t) <= 1
        """,
        "pagerank_lineitem": """
            WITH edges AS (
                SELECT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM lineitem
                WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL
                UNION ALL
                SELECT l_suppkey * 2 + 1, l_orderkey * 2
                FROM lineitem
                WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL),
            deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
                    FROM edges GROUP BY 1),
            nodes AS (SELECT DISTINCT node FROM (
                          SELECT src AS node FROM edges
                          UNION SELECT dst FROM edges)),
            r0 AS (SELECT n.node, CAST(1000000000 AS BIGINT) AS r,
                          COALESCE(g.d, 0) AS d
                   FROM nodes n LEFT JOIN deg g USING (node)),
            s1 AS (SELECT e.dst AS node, SUM(r.r // r.d) AS s
                   FROM edges e JOIN r0 r ON e.src = r.node
                   WHERE r.d > 0 GROUP BY 1),
            r1 AS (SELECT n.node,
                          CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100
                               AS BIGINT) AS r, n.d
                   FROM r0 n LEFT JOIN s1 s USING (node)),
            s2 AS (SELECT e.dst AS node, SUM(r.r // r.d) AS s
                   FROM edges e JOIN r1 r ON e.src = r.node
                   WHERE r.d > 0 GROUP BY 1),
            r2 AS (SELECT n.node,
                          CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100
                               AS BIGINT) AS r, n.d
                   FROM r1 n LEFT JOIN s2 s USING (node)),
            s3 AS (SELECT e.dst AS node, SUM(r.r // r.d) AS s
                   FROM edges e JOIN r2 r ON e.src = r.node
                   WHERE r.d > 0 GROUP BY 1),
            r3 AS (SELECT n.node,
                          CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100
                               AS BIGINT) AS r, n.d
                   FROM r2 n LEFT JOIN s3 s USING (node))
            SELECT node, r AS rank FROM r3
        """,
        "k_anonymity_docs": """
            SELECT lang, source,
                   CASE WHEN n_chars IS NULL THEN NULL
                        ELSE n_chars // 50 END AS nchars_bucket,
                   COUNT(*) AS n_rows
            FROM documents
            GROUP BY 1, 2, 3
            HAVING COUNT(*) < 5
        """,
        "vocab_overlap_langs": """
            WITH toks AS (
                SELECT DISTINCT lang, t.term
                FROM (
                    SELECT lang,
                           unnest(regexp_extract_all(
                               lower(coalesce(text, '')), '\\S+')) AS term
                    FROM documents WHERE lang IS NOT NULL) t
                WHERE t.term <> ''),
            sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
                      FROM toks GROUP BY lang),
            pairs AS (
                SELECT a.lang AS lang_a, b.lang AS lang_b,
                       CAST(COUNT(*) AS BIGINT) AS n_common
                FROM toks a JOIN toks b
                  ON a.term = b.term AND a.lang < b.lang
                GROUP BY 1, 2)
            SELECT p.lang_a, p.lang_b, p.n_common,
                   sa.n AS n_a, sb.n AS n_b,
                   (p.n_common * 1000000) // (sa.n + sb.n - p.n_common)
                       AS jaccard_e6
            FROM pairs p
            JOIN sizes sa ON sa.lang = p.lang_a
            JOIN sizes sb ON sb.lang = p.lang_b
        """,
        "new_users_hourly": """
            WITH f AS (
                SELECT user_id, MIN(ts) AS fts FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                GROUP BY user_id),
            h AS (
                SELECT date_trunc('hour', fts) AS hour,
                       CAST(COUNT(*) AS BIGINT) AS n_new
                FROM f GROUP BY 1)
            SELECT hour, n_new,
                   CAST(SUM(n_new) OVER (ORDER BY hour) AS BIGINT) AS cum_users
            FROM h
        """,
        "rollup_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS sum_qty_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_price_cents
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "cube_events": """
            WITH e AS (
                SELECT event_type,
                       CAST(hour(ts) AS BIGINT) AS hod,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc
                FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL
                      AND value IS NOT NULL AND NOT isnan(value))
            SELECT event_type, hod,
                   CAST(GROUPING(event_type, hod) AS BIGINT) AS lvl,
                   COUNT(*) AS n_rows,
                   CAST(SUM(vc) AS BIGINT) AS sum_value_cents
            FROM e
            GROUP BY CUBE(event_type, hod)
        """,
        "user_retention": """
            WITH e AS (
                SELECT user_id, date_trunc('week', ts) AS wk FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            c AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY 1),
            a AS (SELECT DISTINCT user_id, wk FROM e)
            SELECT c.cohort, a.wk AS week, CAST(COUNT(*) AS BIGINT)
                       AS n_users
            FROM a JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "exact_quantiles_events": """
            WITH v AS (
                SELECT event_id, CAST(value AS DOUBLE) AS value FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
                      AND event_id IS NOT NULL),
            r AS (
                SELECT event_id, value,
                       ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
                       COUNT(*) OVER () AS n
                FROM v),
            qs(q) AS (VALUES (0.25), (0.5), (0.9), (0.99))
            SELECT qs.q,
                   CAST(FLOOR(r.value * 1000000.0 + 0.5) AS BIGINT)
                       AS value_e6,
                   CAST(r.rn AS BIGINT) AS rank
            FROM qs JOIN r
              ON r.rn = CAST(FLOOR(qs.q * (r.n - 1)) AS BIGINT) + 1
        """,
        "events_funnel_dropoff": """
            WITH e AS (
                SELECT user_id, ts, event_type FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            ),
            s1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
            s2 AS (
                SELECT DISTINCT a.user_id FROM e a
                WHERE a.event_type = 'view' AND EXISTS (
                    SELECT 1 FROM e b
                    WHERE b.user_id = a.user_id AND b.event_type = 'click'
                      AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR)),
            s3 AS (
                SELECT DISTINCT a.user_id FROM e a
                WHERE a.event_type = 'view' AND EXISTS (
                    SELECT 1 FROM e b
                    WHERE b.user_id = a.user_id AND b.event_type = 'click'
                      AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
                      AND EXISTS (
                        SELECT 1 FROM e c
                        WHERE c.user_id = b.user_id
                          AND c.event_type = 'purchase'
                          AND c.ts > b.ts
                          AND c.ts <= b.ts + INTERVAL 6 HOUR)))
            SELECT 1 AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
            UNION ALL
            SELECT 2, CAST(COUNT(*) AS BIGINT) FROM s2
            UNION ALL
            SELECT 3, CAST(COUNT(*) AS BIGINT) FROM s3
        """,
        "percent_rank_docs": """
            WITH r AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
                       COUNT(*) OVER () AS n
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL)
            SELECT doc_id, CAST(rn AS BIGINT) AS rank,
                   CAST(FLOOR((rn - 1.0) / (n - 1) * 1000000.0 + 0.5)
                        AS BIGINT) AS pct_e6
            FROM r
        """,
        "tag_docs": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                        '[0-9]+')) AS BIGINT) AS n_numbers,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                        '[A-Za-z_][A-Za-z0-9_]*\\(')) AS BIGINT)
                       AS n_code_tokens,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                        '\\b[A-Z]{2,}\\b')) AS BIGINT) AS n_upper_words
            FROM documents
        """,
        "ntile_docs": """
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
                   CAST(NTILE(4) OVER w AS BIGINT) AS bucket
            FROM documents
            WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
            WINDOW w AS (ORDER BY n_chars, doc_id)
        """,
        "top_terms_per_lang": """
            WITH words AS (
              SELECT lang,
                     unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '\\S+')) AS term
              FROM documents WHERE lang IS NOT NULL),
            counts AS (
              SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
              FROM words GROUP BY 1, 2),
            ranked AS (
              SELECT lang, term, n,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY n DESC, term) AS rn
              FROM counts)
            SELECT lang, term, n, CAST(rn AS BIGINT) AS rnk
            FROM ranked WHERE rn <= 5
        """,
        "entropy_docs": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '\\S+')) AS term
                FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS c
                   FROM toks GROUP BY 1, 2),
            agg AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                       SUM(c * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000.0
                                          + 0.5) AS BIGINT)) AS s
                FROM tf GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(a.n * CAST(FLOOR(ln(CAST(a.n AS DOUBLE))
                                 * 1000000.0 + 0.5) AS BIGINT) - a.s, 0)
                        AS BIGINT) AS ent_num_e6
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "token_count_docs": """
            SELECT doc_id,
                   CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "lang_id_docs": f"""
            WITH base AS (
              SELECT doc_id, lang, coalesce(text,'') AS t,
                     len(coalesce(text,'')) AS nc,
                     len(regexp_extract_all(coalesce(text,''), '[一-鿿]')) AS cjk,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-zà-ÿ]+') AS ws
              FROM documents),
            words AS (SELECT doc_id, unnest(ws) AS w FROM base),
            scores AS (
              SELECT doc_id,
                CAST(SUM(CASE WHEN w IN ({en_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_en,
                CAST(SUM(CASE WHEN w IN ({de_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_de,
                CAST(SUM(CASE WHEN w IN ({fr_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_fr,
                CAST(SUM(CASE WHEN w IN ({es_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_es
              FROM words GROUP BY doc_id)
            SELECT b.doc_id, b.lang,
              CASE
                WHEN b.nc = 0 THEN 'und'
                WHEN b.cjk > 0.05 * greatest(1, b.nc) THEN 'zh'
                WHEN len(b.ws) = 0 THEN 'und'
                WHEN greatest(s.s_en, s.s_de, s.s_fr, s.s_es) <= 0.01 THEN 'und'
                WHEN s.s_en >= s.s_de AND s.s_en >= s.s_fr AND s.s_en >= s.s_es THEN 'en'
                WHEN s.s_de >= s.s_fr AND s.s_de >= s.s_es THEN 'de'
                WHEN s.s_fr >= s.s_es THEN 'fr'
                ELSE 'es' END AS lang_pred
            FROM base b LEFT JOIN scores s USING (doc_id)
        """,
        "lang_confusion_docs": f"""
            WITH base AS (
              SELECT doc_id, lang, coalesce(text,'') AS t,
                     len(coalesce(text,'')) AS nc,
                     len(regexp_extract_all(coalesce(text,''), '[一-鿿]')) AS cjk,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-zà-ÿ]+') AS ws
              FROM documents),
            words AS (SELECT doc_id, unnest(ws) AS w FROM base),
            scores AS (
              SELECT doc_id,
                CAST(SUM(CASE WHEN w IN ({en_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_en,
                CAST(SUM(CASE WHEN w IN ({de_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_de,
                CAST(SUM(CASE WHEN w IN ({fr_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_fr,
                CAST(SUM(CASE WHEN w IN ({es_sw}) THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS s_es
              FROM words GROUP BY doc_id),
            pred AS (
              SELECT b.lang,
                CASE
                  WHEN b.nc = 0 THEN 'und'
                  WHEN b.cjk > 0.05 * greatest(1, b.nc) THEN 'zh'
                  WHEN len(b.ws) = 0 THEN 'und'
                  WHEN greatest(s.s_en, s.s_de, s.s_fr, s.s_es) <= 0.01 THEN 'und'
                  WHEN s.s_en >= s.s_de AND s.s_en >= s.s_fr AND s.s_en >= s.s_es THEN 'en'
                  WHEN s.s_de >= s.s_fr AND s.s_de >= s.s_es THEN 'de'
                  WHEN s.s_fr >= s.s_es THEN 'fr'
                  ELSE 'es' END AS lang_pred
              FROM base b LEFT JOIN scores s USING (doc_id))
            SELECT lang, lang_pred, COUNT(*) AS n_docs
            FROM pred GROUP BY 1, 2
        """,
        "quality_docs": f"""
            WITH base AS (
              SELECT doc_id, len(coalesce(text,'')) AS nc,
                     len(regexp_extract_all(coalesce(text,''), '[^\\w\\s]')) AS npunct,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-zà-ÿ]+') AS ws
              FROM documents),
            words AS (SELECT doc_id, unnest(ws) AS w FROM base),
            agg AS (
              SELECT doc_id, COUNT(*) AS nw, SUM(len(w)) AS len_sum,
                     SUM(CASE WHEN w IN ({all_sw}) THEN 1 ELSE 0 END) AS nstop,
                     COUNT(DISTINCT w) AS ndistinct
              FROM words GROUP BY doc_id),
            feat AS (
              SELECT b.doc_id, b.nc AS n_chars_q,
                     CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
                     CAST(coalesce(a.nstop, 0) AS BIGINT) AS n_stop_words,
                     b.npunct AS n_punct_chars,
                     CAST(coalesce(a.ndistinct, 0) AS BIGINT) AS n_distinct_words,
                     CASE WHEN a.nw IS NULL THEN 0.0
                          ELSE CAST(a.len_sum AS DOUBLE)/a.nw END AS mwl,
                     CASE WHEN b.nc = 0 THEN 0.0
                          ELSE CAST(b.npunct AS DOUBLE)/b.nc END AS punct_r,
                     CASE WHEN a.nw IS NULL THEN 0.0
                          ELSE CAST(a.ndistinct AS DOUBLE)/a.nw END AS distinct_r
              FROM base b LEFT JOIN agg a USING (doc_id)),
            scored AS (
              SELECT doc_id, n_chars_q, n_words, n_stop_words, n_punct_chars,
                     n_distinct_words,
                 (CASE WHEN n_chars_q BETWEEN 50 AND 100000 THEN 0 ELSE 1 END
                + CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 0 ELSE 1 END
                + CASE WHEN punct_r > 0.3 THEN 1 ELSE 0 END
                + CASE WHEN distinct_r < 0.2 THEN 1 ELSE 0 END) AS fails
              FROM feat)
            SELECT doc_id, n_chars_q, n_words, n_stop_words, n_punct_chars,
                   n_distinct_words,
                   CAST(10000 // POWER(2, fails) AS BIGINT) AS quality_score_e4
            FROM scored
        """,
        "fingerprint_docs": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            basis AS (
              SELECT doc_id,
                CASE WHEN len(t) = 0 THEN ['']
                     WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                     ELSE [array_to_string(t[x:x+4], ' ')
                           for x in generate_series(1, len(t)-4)]
                END AS grams
              FROM toks),
            h AS (
              SELECT doc_id, g.i,
                     CAST(md5_number_lower(g.gram) & 1152921504606846975 AS BIGINT) AS hv
              FROM basis, LATERAL (SELECT unnest(grams) AS gram,
                                          unnest(generate_series(1, len(grams))) AS i) g),
            w AS (
              SELECT doc_id, i, hv, COUNT(*) OVER (PARTITION BY doc_id) AS cnt,
                     MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
              FROM h),
            fp AS (
              SELECT doc_id, CASE WHEN cnt <= 4 THEN hv ELSE wmin END AS f
              FROM w WHERE cnt <= 4 OR i <= cnt - 3)
            SELECT doc_id, MIN(f) AS fingerprint_min,
                   CAST(COUNT(DISTINCT f) AS BIGINT) AS n_fingerprints
            FROM fp GROUP BY doc_id
        """,
        "events_asof_purchase": """
            SELECT c.event_id, c.user_id,
                   CAST(p.event_id AS DOUBLE) AS purchase_id,
                   CAST(date_diff('microsecond', p.ts, c.ts) AS DOUBLE) AS gap_us
            FROM (SELECT * FROM events WHERE event_type='click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "events_range_neighbors": """
            SELECT a.event_id, a.user_id,
                   CAST(COUNT(b.event_id) AS BIGINT) AS n_neighbors
            FROM events a
            LEFT JOIN events b
              ON a.user_id = b.user_id
             AND b.event_id <> a.event_id
             AND b.ts BETWEEN a.ts - INTERVAL 5 MINUTE
                          AND a.ts + INTERVAL 5 MINUTE
            GROUP BY a.event_id, a.user_id
        """,
        "events_user_deltas": """
            WITH q AS (
                SELECT user_id, event_id,
                       CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                            AS BIGINT) AS value_e,
                       ts
                FROM events
                WHERE user_id IS NOT NULL
            )
            SELECT user_id, event_id, value_e,
                   LAG(value_e) OVER w AS prev_value_e,
                   value_e - LAG(value_e) OVER w AS delta_e
            FROM q
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "locf_events_by_user": """
            WITH q AS (
                SELECT user_id, event_id, ts,
                       CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                            AS BIGINT) AS value_e
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            )
            SELECT user_id, event_id, value_e,
                   LAST_VALUE(value_e IGNORE NULLS) OVER w AS filled_e
            FROM q
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "events_user_window": """
            WITH q AS (
                SELECT user_id, event_id, ts,
                       CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5)
                            AS BIGINT) AS value_e
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            )
            SELECT user_id, event_id,
                   CAST(SUM(value_e) OVER w AS BIGINT) AS win_sum_e,
                   CAST(COUNT(*) OVER w AS BIGINT) AS win_n
            FROM q
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW)
        """,
        "events_sessionize": """
            WITH e AS (
              SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts, event_id,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
              FROM e),
            per_sess AS (
              SELECT user_id, sess, COUNT(*) AS n FROM s GROUP BY user_id, sess)
            SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(MAX(n) AS BIGINT) AS longest_session
            FROM per_sess GROUP BY user_id
        """,
        # fuzzy decontamination: corpus × benchmark (doc_id % 97) exact
        # 3-gram Jaccard ≥ 0.5, per-doc max — the same gram/jaccard CASE as
        # dedup_ngram_jaccard, cross join instead of same-lang self join
        # (self-pairs doc vs its own benchmark copy included by design).
        "decontaminate_fuzzy_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            sets AS (
              SELECT doc_id,
                CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE list_distinct([array_to_string(t[x:x+2], ' ')
                                         for x in generate_series(1, len(t)-2)])
                END AS g
              FROM toks),
            bsets AS (SELECT g FROM sets WHERE doc_id % 97 = 0),
            pairs AS (
              SELECT a.doc_id,
                CASE WHEN len(a.g) = 0 AND len(b.g) = 0 THEN 1.0
                     WHEN len(list_distinct(list_concat(a.g, b.g))) = 0 THEN 0.0
                     ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / len(list_distinct(list_concat(a.g, b.g))) END AS jaccard
              FROM sets a CROSS JOIN bsets b)
            SELECT doc_id, CAST(MAX(jaccard) AS DOUBLE) AS jaccard_max
            FROM pairs WHERE jaccard >= 0.5
            GROUP BY doc_id
        """,
        "dedup_ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            sets AS (
              SELECT doc_id, lang,
                CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE list_distinct([array_to_string(t[x:x+2], ' ')
                                         for x in generate_series(1, len(t)-2)])
                END AS g
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CASE WHEN len(a.g) = 0 AND len(b.g) = 0 THEN 1.0
                     WHEN len(list_distinct(list_concat(a.g, b.g))) = 0 THEN 0.0
                     ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / len(list_distinct(list_concat(a.g, b.g))) END AS jaccard
              FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id)
            SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
        """,
        "dedup_clusters": """
            WITH RECURSIVE toks AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            sets AS (
              SELECT doc_id, lang,
                CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE list_distinct([array_to_string(t[x:x+2], ' ')
                                         for x in generate_series(1, len(t)-2)])
                END AS g
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE (CASE WHEN len(a.g) = 0 AND len(b.g) = 0 THEN 1.0
                     WHEN len(list_distinct(list_concat(a.g, b.g))) = 0 THEN 0.0
                     ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / len(list_distinct(list_concat(a.g, b.g))) END) >= 0.5),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
            SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
        """,
        "dedup_jaccard_keep": """
            WITH RECURSIVE toks AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(coalesce(text,'')), '\\S+') AS t
              FROM documents),
            sets AS (
              SELECT doc_id, lang,
                CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE list_distinct([array_to_string(t[x:x+2], ' ')
                                         for x in generate_series(1, len(t)-2)])
                END AS g
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE (CASE WHEN len(a.g) = 0 AND len(b.g) = 0 THEN 1.0
                     WHEN len(list_distinct(list_concat(a.g, b.g))) = 0 THEN 0.0
                     ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / len(list_distinct(list_concat(a.g, b.g))) END) >= 0.5),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
            comp AS (SELECT id, MIN(r) AS c FROM reach GROUP BY id)
            SELECT doc_id, lang FROM documents
            WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> c)
        """,
        # sliding-window chunking: stride-16 starts, up to 32 tokens per
        # chunk, single-space joins (array_to_string over list slices).
        "chunk_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''), '\\S+') AS t
              FROM documents)
            SELECT doc_id,
                   CAST((x - 1) // 16 AS BIGINT) AS chunk_id,
                   array_to_string(t[x:least(x + 31, len(t))], ' ') AS chunk_text,
                   CAST(least(x + 31, len(t)) - x + 1 AS BIGINT) AS n_tokens
            FROM toks,
                 LATERAL (SELECT unnest(generate_series(1, len(t), 16)) AS x)
        """,
        # exact heavy hitters: terms with frequency > n_tokens/1000 (the
        # engine's two-pass MG-candidates + exact-recount plan must equal
        # the full exact groupby)
        "heavy_terms_docs": """
            WITH toks AS (
              SELECT regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS t
              FROM documents),
            words AS (SELECT unnest(t) AS w FROM toks),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM words),
            wc AS (SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM words GROUP BY w)
            SELECT term, cnt FROM wc, tot WHERE cnt * 1000 > n
        """,
        # SQ8 scalar quantization: exact per-dim min/max, then the same
        # subtract/divide/multiply/add/floor IEEE sequence as SQ8Stage
        # (float32 values promoted to float64 on both sides)
        "quantize_embeddings": """
            WITH e AS (
              SELECT vec_id, CAST(x AS BIGINT) AS dim,
                     CAST(embedding[x] AS DOUBLE) AS val
              FROM embeddings,
                   LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS x)),
            mm AS (SELECT dim, MIN(val) AS mn, MAX(val) AS mx
                   FROM e GROUP BY dim)
            SELECT e.vec_id, e.dim,
                   CAST(CASE WHEN mm.mx = mm.mn THEN 0
                        ELSE FLOOR((e.val - mm.mn) / (mm.mx - mm.mn) * 255 + 0.5)
                   END AS BIGINT) AS code
            FROM e JOIN mm USING (dim)
        """,
        # feature hashing: dim = md5-low60 % 64, sign from bit 6 (disjoint
        # from the dim bits), signed occurrence counts per (doc, dim)
        "hash_vectorize_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS t
              FROM documents),
            words AS (SELECT doc_id, unnest(t) AS w FROM toks),
            h AS (SELECT doc_id,
                         md5_number_lower(w) & ((1::UBIGINT << 60) - 1) AS hv
                  FROM words)
            SELECT doc_id, CAST(hv % 64 AS BIGINT) AS dim,
                   CAST(SUM(CASE WHEN (hv >> 6) & 1 = 0 THEN 1 ELSE -1 END)
                        AS BIGINT) AS val
            FROM h GROUP BY doc_id, dim
        """,
        # linear classifier inference over the same hashed features:
        # w[d] = md5('w|'||d) % 2000001 - 1000000; score = Σ sign·w[dim]
        "classifier_score_docs": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS t
              FROM documents),
            words AS (SELECT doc_id, unnest(t) AS w FROM toks),
            h AS (SELECT doc_id,
                         md5_number_lower(w) & ((1::UBIGINT << 60) - 1) AS hv
                  FROM words),
            c AS (
              SELECT doc_id,
                (CASE WHEN (hv >> 6) & 1 = 0 THEN 1 ELSE -1 END)
                * (CAST((md5_number_lower('w|' ||
                         CAST(CAST(hv % 64 AS BIGINT) AS VARCHAR))
                         & ((1::UBIGINT << 60) - 1)) % 2000001 AS BIGINT)
                   - 1000000) AS contrib
              FROM h),
            agg AS (SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS score_i
                    FROM c GROUP BY doc_id),
            nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
            SELECT nt.doc_id, nt.n_tokens, coalesce(agg.score_i, 0) AS score_i
            FROM nt LEFT JOIN agg USING (doc_id)
        """,
        # frequency-balanced subsampling: keep with p ∝ 1/sqrt(n_lang),
        # saturating at 1 — conversion/sqrt/multiply are all IEEE-identical
        # between numpy and DuckDB (no pow/exp)
        "subsample_docs": """
            WITH lc AS (
              SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN lc USING (lang)
            WHERE CAST(md5_number_lower('sub|' || CAST(d.doc_id AS VARCHAR))
                       & ((1::UBIGINT << 60) - 1) AS DOUBLE)
                  * sqrt(CAST(lc.n AS DOUBLE))
                  < 16.0 * 1152921504606846976
        """,
    }
    # CCNet head/middle/tail: per-lang NTILE(3) tertiles over the SAME
    # quantized-NLL scoring query as lm_score_docs (composed verbatim so
    # the two oracles can never drift apart).
    d["ccnet_buckets"] = f"""
        WITH scored AS ({d["lm_score_docs"]}),
        lg AS (SELECT doc_id, lang FROM documents)
        SELECT s.doc_id, lg.lang,
               CASE NTILE(3) OVER (PARTITION BY lg.lang
                                   ORDER BY s.nll_e6_sum, s.doc_id)
                    WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored s JOIN lg USING (doc_id)
    """
    return d
