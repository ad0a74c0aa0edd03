"""Build mutated copies of a testdata directory to prove cross-engine
parity holds on data shapes the per-round regeneration could introduce.

Variant "whitespace" (advisor-finding class): edge whitespace, tabs,
vertical tabs, doubled spaces in documents.text — these silently split
Java-\\s-based Spark tokenizers from RE2-based DuckDB oracles unless every
character class is pinned explicitly.

Variant "nulls": NULL l_partkey/l_suppkey, NULL events.value/props/ts/
user_id, NULL documents.text, and NULL orders payload columns
(o_totalprice/o_orderstatus/o_orderpriority — never the PK) — this class
exposed four real parity splits in round 3 (NOT IN vs anti-join NULL-key
semantics, json_valid(NULL), last(ignorenulls) tearing a (ts, value)
pair, engine-native avg() rounding-boundary flips) and the round-4
seventh-review set (concat_ws NULL-skip fingerprints, untouched-file
NULL retention in targeted delete, NULL-key rows vanishing from a
parity-split write).

Variant "edge": empty / single-char / whitespace-only / exact-duplicate
documents — this class exposed two ANSI-mode crashes (sequence over an
empty token list, DIVIDE_BY_ZERO on a 0-token ratio: ANSI Spark raises
even for double division) and one NaN-vs-coalesce split in the quality
formula.

Variant "values": zero / negated o_totalprice, l_quantity,
l_extendedprice and events.value, plus epoch / DST-gap / year-boundary
timestamps — probes divide-by-zero guards (signed sums can cancel a mean
to exactly 0) and UTC calendar pinning.

Variant "unicode": NFC/NFD-split accents, Turkish dotted capital I,
CJK without spaces, ZWJ emoji, RTL scripts, ligature/sharp-s/full-width
forms, and NBSP token glue appended/injected into documents.text — probes
the utf8proc (DuckDB) vs JVM/Python Unicode semantics the text family
depends on. First run: 249/249 bit-exact, no divergence.

Variant "sparse": every fact table decimated 20-40× (dims untouched) —
probes empty intermediate slices a small regenerated SF could produce:
empty language slices, empty join/filter results feeding aggregates,
near-empty graphs for the iterative keys, fewer vectors than ANN/k-means
parameters assume. First run exposed three real defects (all fixed):
ANSI corr()/z-test divide-by-zero on zero-variance frames (q_rolling_corr
rewritten to exact-DECIMAL sufficient statistics, q_abtest to try_divide)
and q_compact_files counting Spark's empty schema-only file as a fragment
when rows < shards.

Variant "ties": events.ts collapsed to day-start for 1-in-3 users (heavy
same-user tie groups) and floored to whole seconds for the rest — breaks
the per-user-unique-ts invariant (TESTDATA microsecond-random) that
as-of joins, SCD2 and the lag/sessionize family document relying on. The driver has already changed
ts PRECISION between rounds (nanos → micros); a further drop to seconds
would create exactly these ties, so every ts-ordered construction must
either carry an event_id tiebreak or produce tie-order-free outputs.

All mutations use ``SELECT * REPLACE`` so a driver-side schema change
(added or reordered columns — the repo's documented regeneration gotcha)
flows through untouched instead of erroring or silently dropping columns.

Usage:
    python tools/mutate_testdata.py [pk|whitespace|nulls|edge|values|sparse|unicode|ties|empty|dims|schema|halfbound|markup|ragged|physical|dupheavy] [src] [dst]
    PYTHONPATH=. python tools/check_oracles.py <dst_dir> [--exact]

Round-3 result (2026-08-14): whitespace variant 228/228 bit-exact; nulls,
edge, and values variants 228/228 (tolerance mode — value injection
shifts floats onto different rounding boundaries run-to-run, parity is
the claim).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# variant -> {table_file: REPLACE clause}
MUTATIONS: dict[str, dict[str, str]] = {
    # Variant "pk" (round-7 review class): the battery never violated
    # primary-key integrity, yet the driver has changed table shapes
    # between rounds — NULL ids and duplicated rows probe NULL-equality
    # joins (NULL = NULL is UNKNOWN, so annotations must drop, not fan
    # out), rn=1 survivor picks whose tiebreak is the id itself, and
    # count parity when the same id appears twice.
    "pk": {
        "events.parquet": """SELECT * FROM (
            SELECT * REPLACE (
              CASE WHEN event_id % 149 = 0 THEN NULL ELSE event_id END
                AS event_id)
            FROM src_table
            UNION ALL
            SELECT * FROM src_table WHERE event_id % 101 = 0
        )""",
        "documents.parquet": """SELECT * FROM (
            SELECT * REPLACE (
              CASE WHEN doc_id % 97 = 0 THEN NULL ELSE doc_id END AS doc_id)
            FROM src_table
            UNION ALL
            SELECT * FROM src_table WHERE doc_id % 83 = 0
        )""",
        "embeddings.parquet": """SELECT * FROM (
            SELECT * REPLACE (
              CASE WHEN vec_id % 91 = 0 THEN NULL ELSE vec_id END AS vec_id)
            FROM src_table
            UNION ALL
            SELECT * FROM src_table WHERE vec_id % 73 = 0
        )""",
    },
    "whitespace": {
        "documents.parquet": """* REPLACE (
            CASE doc_id % 7
              WHEN 0 THEN ' ' || text                 -- leading space
              WHEN 1 THEN text || E'\t'               -- trailing tab
              WHEN 2 THEN replace(text, ' ', '  ')    -- doubled spaces
              WHEN 3 THEN replace(text, ' ', E'\t')   -- tabs between words
              WHEN 4 THEN replace(text, ' ', chr(11)) -- vertical tab \\x0B
              WHEN 5 THEN E'\n' || text || E'\r'      -- edge newline/CR
              ELSE text
            END AS text)""",
    },
    "edge": {
        "documents.parquet": """* REPLACE (
            CASE doc_id % 11
              WHEN 0 THEN ''        -- empty doc
              WHEN 1 THEN 'x'       -- single char
              WHEN 2 THEN '   '     -- whitespace-only
              WHEN 3 THEN (SELECT text FROM src_table WHERE doc_id = 7)
              ELSE text
            END AS text)""",
    },
    "nulls": {
        "lineitem.parquet": """* REPLACE (
            CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_partkey END AS l_partkey,
            CASE WHEN l_orderkey % 89 = 0 THEN NULL ELSE l_suppkey END AS l_suppkey)""",
        "events.parquet": """* REPLACE (
            CASE WHEN event_id % 53 = 0 THEN NULL ELSE value END AS value,
            CASE WHEN event_id % 71 = 0 THEN NULL ELSE props END AS props,
            -- NULL user_ids probe NOT-IN / anti-join / groupBy-key NULL
            -- semantics on the dimension FK (the q_targeted_delete class:
            -- a NULL user is never a delete victim, and a bare NOT IN
            -- would drop it on one engine only).
            CASE WHEN event_id % 113 = 0 THEN NULL ELSE user_id END
              AS user_id,
            -- NULL event-times probe the round-4 NULLS LAST pins and the
            -- window()/session_window() NULL-drop mirroring; outputs must
            -- not depend on order WITHIN a same-user NULL-ts tie group
            -- (several collide at sf0.01). NOTE: the FIRST row of a tie
            -- group inherits a non-NULL lag from the last real event, so
            -- any ts-ordered lag/lead query needs an event_id tiebreak —
            -- exactly the q_sessionize defect this leg caught in round 4.
            CASE WHEN event_id % 149 = 0 THEN NULL ELSE ts END AS ts)""",
        "documents.parquet": """* REPLACE (
            CASE WHEN doc_id % 61 = 0 THEN NULL ELSE text END AS text)""",
        # NULL order payloads (never the o_orderkey PK): price sums must
        # skip NULLs identically under DECIMAL accumulation, checksum /
        # concat fingerprints must encode NULL fields explicitly
        # (concat_ws skips, || propagates), and NULL grouping keys must
        # bucket together on both engines.
        "orders.parquet": """* REPLACE (
            CASE WHEN o_orderkey % 127 = 0 THEN NULL ELSE o_totalprice END
              AS o_totalprice,
            CASE WHEN o_orderkey % 131 = 0 THEN NULL ELSE o_orderstatus END
              AS o_orderstatus,
            CASE WHEN o_orderkey % 137 = 0 THEN NULL ELSE o_orderpriority
              END AS o_orderpriority)""",
        # NULL dimension payloads (never the PKs/FKs joins key on): group
        # keys, LIKE/IN filter columns, and balance aggregates across the
        # TPC-H family must treat a NULL attribute identically — filters
        # drop it on both engines, group-bys bucket it together, and any
        # ordered LIMIT over it needs its null order pinned.
        "customer.parquet": """* REPLACE (
            CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END
              AS c_mktsegment,
            CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_acctbal END
              AS c_acctbal)""",
        "part.parquet": """* REPLACE (
            CASE WHEN p_partkey % 17 = 0 THEN NULL ELSE p_brand END
              AS p_brand,
            CASE WHEN p_partkey % 19 = 0 THEN NULL ELSE p_size END
              AS p_size)""",
    },
    "values": {
        "orders.parquet": """* REPLACE (
            CASE o_orderkey % 101 WHEN 0 THEN 0.0 WHEN 1 THEN -o_totalprice
                 ELSE o_totalprice END AS o_totalprice)""",
        "lineitem.parquet": """* REPLACE (
            -- + 0.5 probes the double->int cast pin (Spark truncates,
            -- DuckDB's bare CAST rounds — q_cast pins trunc()) and every
            -- quantity aggregate's exactness off the integer grid.
            CASE l_orderkey % 103 WHEN 0 THEN 0.0 WHEN 1 THEN -l_quantity
                 WHEN 2 THEN l_quantity + 0.5
                 WHEN 3 THEN -(l_quantity + 0.5)
                 ELSE l_quantity END AS l_quantity,
            CASE l_orderkey % 107 WHEN 0 THEN 0.0 WHEN 1 THEN -l_extendedprice
                 ELSE l_extendedprice END AS l_extendedprice)""",
        # + to_microseconds(event_id) keeps every injected timestamp UNIQUE
        # per row: collapsing many events onto one literal would create
        # duplicate (user_id, ts) pairs, breaking the per-user-unique-ts
        # invariant q_join_asof/q_scd2 tie-determinism relies on and making
        # the fuzz gate partitioning-dependent.
        "events.parquet": """* REPLACE (
            CASE event_id % 113
              WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                          + to_microseconds(event_id)        -- near epoch
              WHEN 1 THEN TIMESTAMP '2027-03-14 02:30:00'
                          + to_microseconds(event_id)        -- US DST gap
              WHEN 2 THEN TIMESTAMP '2026-12-31 23:59:00'
                          + to_microseconds(event_id)        -- year edge
              ELSE ts END AS ts,
            CASE event_id % 127 WHEN 0 THEN 0.0 WHEN 1 THEN -value
                 ELSE value END AS value)""",
    },
    # Non-ASCII text shapes: NFC/NFD split accents, Turkish dotted capital I
    # (utf8proc vs java.lang/Python lower() divergence risk), CJK with no
    # internal spaces, ZWJ emoji, RTL scripts, ligature/sharp-s/full-width
    # forms, and NBSP (NOT in the pinned [ \t\n\x0B\f\r] whitespace class,
    # so it must glue tokens identically in both engines).
    "unicode": {
        "documents.parquet": """* REPLACE (
            CASE doc_id % 13
              WHEN 0 THEN text || ' café'                 -- NFC precomposed
              WHEN 1 THEN text || ' caf' || 'e' || chr(769)    -- NFD decomposed
              WHEN 2 THEN text || ' İstanbul'             -- dotted capital I
              WHEN 3 THEN text || ' 東京都データ' -- CJK
              WHEN 4 THEN text || ' \U0001F469‍\U0001F680' -- ZWJ emoji
              WHEN 5 THEN text || ' שלום'  -- RTL Hebrew
              WHEN 6 THEN text || ' ﬃ ß ＡＢ' -- ligature/ß/fullwidth
              WHEN 7 THEN replace(text, ' ', chr(160))         -- NBSP glue
              ELSE text
            END AS text)""",
    },
    # Fully-empty behavioral tables (dims untouched): the limiting case of
    # sparse. First run exposed five empty-slice crashes (all fixed):
    # LSH raising instead of returning empty, PageRank teleport
    # divide-by-zero, parts[0] on an empty stats list, schema inference
    # over a data-file-less partitioned write, and a zero-row wholetext
    # read-back.
    "empty": {
        "events.parquet": "SELECT * FROM src_table WHERE 1 = 0",
        "documents.parquet": "SELECT * FROM src_table WHERE 1 = 0",
        "embeddings.parquet": "SELECT * FROM src_table WHERE 1 = 0",
    },
    # Schema-drift regeneration: physical column ORDER shuffled and one
    # extra column appended on the behavioral tables — the documented
    # regeneration gotcha (the driver has added/reordered columns before).
    # Every query and oracle must bind columns BY NAME; any positional
    # access, SELECT-* leak into a final projection, or schema'd read
    # pinned to the old column order diverges or crashes here.
    "schema": {
        "events.parquet": """
            SELECT props, value, event_type, ts, user_id, event_id,
                   event_id * 2 AS _extra_col
            FROM src_table""",
        "orders.parquet": """
            SELECT o_orderpriority, o_orderdate, o_totalprice,
                   o_orderstatus, o_custkey, o_orderkey,
                   'x' AS _extra_col
            FROM src_table""",
        "documents.parquet": """
            SELECT n_chars, source, lang, text, doc_id,
                   doc_id % 7 AS _extra_col
            FROM src_table""",
    },
    # Embedding-geometry regeneration: dimensionality dropped 64 → 48 (even
    # but not a power of two — breaks both literal-64 and pow2 assumptions)
    # and 1-in-101 vectors zeroed (zero norm probes every cosine/normalize
    # divisor). The driver has already changed a physical type between
    # rounds (events.ts nanos → micros); an embedding-dim change is the
    # same class of hazard for the ANN/k-means/quantize family, which must
    # derive dims from the data on BOTH engine and oracle sides.
    "dims": {
        "embeddings.parquet": """* REPLACE (
            CASE WHEN vec_id % 101 = 0
                 THEN list_transform(embedding[1:48],
                                     x -> CAST(0.0 AS FLOAT))
                 ELSE embedding[1:48]
            END AS embedding)""",
    },
    # Physical-type drift (the documented regeneration class that ACTUALLY
    # happened: events.ts shipped as TIMESTAMP(NANOS) in round 1, micros
    # since round 2): narrower ids (int32/int16), DOUBLE embeddings
    # instead of FLOAT, FLOAT quantities instead of DOUBLE, and
    # nano-precision event times. Every query/oracle must bind semantics,
    # not physical width — catalog.normalize_events_ts's nanos branch gets
    # exercised, hash-gated logic must key on type-independent forms
    # (strings/decimals), and emitted columns must compare by value kind.
    "physical": {
        "documents.parquet": """* REPLACE (
            CAST(doc_id AS INTEGER) AS doc_id)""",
        "embeddings.parquet": """* REPLACE (
            CAST(vec_id AS INTEGER) AS vec_id,
            CAST(embedding AS DOUBLE[]) AS embedding,
            CAST(label AS SMALLINT) AS label)""",
        # ts is NOT cast here: DuckDB's parquet writer downcasts
        # TIMESTAMP_NS back to micros on write regardless, so the ns
        # physical type comes from the pyarrow rewrite in main() — the
        # only step that actually produces TIMESTAMP(NANOS).
        "events.parquet": """* REPLACE (
            CAST(event_id AS INTEGER) AS event_id)""",
        "orders.parquet": """* REPLACE (
            CAST(o_orderkey AS INTEGER) AS o_orderkey,
            CAST(o_custkey AS INTEGER) AS o_custkey)""",
        "lineitem.parquet": """* REPLACE (
            CAST(l_orderkey AS INTEGER) AS l_orderkey,
            CAST(l_quantity AS FLOAT) AS l_quantity)""",
    },
    # Ragged embedding lengths (round-7 advice, SemDeDup family): a FEW
    # vectors shortened/lengthened while the bulk keeps the modal dim.
    # Cross-engine hazard: DuckDB list_sum skips the NULL out-of-range
    # terms of a length-mismatched zip (partial distance) while Spark
    # zip_with/aggregate NULL-propagates — the SemDeDup contract now pins
    # the modal dimension on BOTH sides, so off-dimension vectors are
    # excluded rather than silently diverging.
    "ragged": {
        "embeddings.parquet": """* REPLACE (
            CASE vec_id % 17
              WHEN 0 THEN embedding[1:32]
              WHEN 1 THEN list_concat(embedding,
                                      [CAST(0.25 AS FLOAT)])
              ELSE embedding
            END AS embedding)""",
    },
    # FP rounding-boundary prices (the q_offers_pipeline r6 driver-fail
    # class): values where round() and floor(x+0.5) are DIFFERENT functions
    # — HALF_UP rounds -0.5 away from zero (-1) while floor(-0.5+0.5)=0, and
    # 0.49999999999999994+0.5 == 1.0 in IEEE double (so floor says 1, exact
    # HALF_UP says 0). Any engine/oracle pair that derives the same integer
    # with round() on one side and floor(+0.5) on the other diverges here;
    # the fix is sharing ONE expression on both sides. Exact .5 values at
    # price magnitude (…WHEN 3/4) additionally probe ties-at-scale.
    "halfbound": {
        "part.parquet": """* REPLACE (
            CASE p_partkey % 5
              WHEN 0 THEN -0.5
              WHEN 1 THEN 0.49999999999999994
              WHEN 2 THEN -(p_retailprice + 0.5)
              WHEN 3 THEN floor(p_retailprice) + 0.5
              ELSE p_retailprice
            END AS p_retailprice)""",
    },
    # Markup-hostile part names (the q_offers_pipeline r6/r7 driver-fail
    # suspect class): entities, tags, quotes and even a forged sibling
    # <li data-index> injected into p_name. Pre-hardening these split the
    # html.parser view (entity-decodes &amp;→&, swallows <tags>, the forged
    # <li> spawns a phantom offer row) from the oracle's regex-on-raw-string
    # view; post-hardening (round 8: p_name sanitized with the oracle's own
    # whitelist BEFORE HTML embedding) the rendered document is markup-inert
    # by construction and the variant must be bit-exact.
    "markup": {
        "part.parquet": """* REPLACE (
            CASE p_partkey % 8
              WHEN 0 THEN p_name || ' & <b>bold</b>'
              WHEN 1 THEN 'Tom &amp; Jerry ' || p_name
              WHEN 2 THEN p_name || ' &#65;&#x42; &nbsp;'
              WHEN 3 THEN '<h3>' || p_name || '</h3>'
              WHEN 4 THEN p_name || ' <span>999</span>'
              WHEN 5 THEN '"' || p_name || ''' <li data-index="7">'
              WHEN 6 THEN NULL
              ELSE p_name
            END AS p_name,
            CASE WHEN p_partkey % 11 = 0 THEN NULL ELSE p_retailprice END
              AS p_retailprice)""",
    },
    "ties": {
        # CAST AS TIMESTAMP: date_trunc yields DATE and to_timestamp
        # TIMESTAMPTZ; unguarded, the CASE unifies to TIMESTAMPTZ and the
        # written parquet drifts to timestamp[us, tz=UTC] — no longer the
        # production physical type, and local-tz-dependent on a non-UTC
        # host.
        "events.parquet": """* REPLACE (
            CASE WHEN user_id % 3 = 0
                 THEN CAST(date_trunc('day', ts) AS TIMESTAMP)
                 ELSE CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT))
                      AS TIMESTAMP)
            END AS ts)""",
    },
    # Variant "dupheavy" (round 10, new class): MASS duplication — the
    # opposite tail from "sparse". 1-in-3 documents collapse onto a pool
    # of 5 texts (five exact-duplicate clusters of ~30 docs each), 1-in-7
    # become near-duplicates of a pool text (one appended word — inside
    # MinHash/SimHash band tolerance, outside exact-hash equality), and
    # 1-in-37 become 25x-repeated long documents (heavy within-doc 8-gram
    # repetition for the substring/span family, fat token lists for
    # BPE/chunking/packing). 1-in-4 embeddings collapse onto 3 pool
    # vectors (identical-vector clusters → cosine-1.0 ties). Probes the
    # paths a duplicate-riddled crawl actually exercises: O(k^2)
    # within-cluster pair generation, big connected components, keep-best
    # over wide groups, and the ANN families' tie-ranking on equal
    # stable-rounded cosines (the round-10 neighbor_id tiebreak).
    "dupheavy": {
        "documents.parquet": """WITH pool AS (
            SELECT list(text ORDER BY doc_id) AS texts
            FROM (SELECT doc_id, text FROM src_table ORDER BY doc_id LIMIT 5)
        )
        SELECT s.* REPLACE (
            CASE
              WHEN s.doc_id % 37 = 5 THEN repeat(coalesce(s.text, '') || ' ', 25)
              -- index modulo the ACTUAL pool size: on a tiny source
              -- (< 5 docs) a fixed %5 would read past the list and
              -- silently NULL texts instead of duplicating them
              -- (round-10 advice); greatest() guards the empty pool.
              WHEN s.doc_id % 3 = 0
                   THEN p.texts[1 + (s.doc_id % greatest(len(p.texts), 1))]
              WHEN s.doc_id % 7 = 1
                   THEN p.texts[1 + (s.doc_id % greatest(len(p.texts), 1))]
                   || ' extraword' || CAST(s.doc_id % 4 AS VARCHAR)
              ELSE s.text
            END AS text)
        FROM src_table s CROSS JOIN pool p""",
        "embeddings.parquet": """WITH pool AS (
            SELECT list(embedding ORDER BY vec_id) AS vs
            FROM (SELECT vec_id, embedding FROM src_table ORDER BY vec_id LIMIT 3)
        )
        SELECT s.* REPLACE (
            CASE WHEN s.vec_id % 4 = 0
                 THEN p.vs[1 + (s.vec_id % greatest(len(p.vs), 1))]
                 ELSE s.embedding END AS embedding)
        FROM src_table s CROSS JOIN pool p""",
    },
    # Full SELECTs (decimation needs WHERE, not REPLACE); modulo keeps the
    # surviving key sets deterministic and referentially plausible.
    "sparse": {
        "documents.parquet": "SELECT * FROM src_table WHERE doc_id % 29 = 0",
        "embeddings.parquet": "SELECT * FROM src_table WHERE vec_id % 31 = 0",
        "events.parquet": "SELECT * FROM src_table WHERE event_id % 23 = 0",
        "orders.parquet": "SELECT * FROM src_table WHERE o_orderkey % 37 = 0",
        "lineitem.parquet": "SELECT * FROM src_table WHERE l_orderkey % 41 = 0",
        "customer.parquet": "SELECT * FROM src_table WHERE c_custkey % 13 = 0",
    },
}


def main() -> None:
    args = sys.argv[1:]
    variant = args[0] if args and args[0] in MUTATIONS else "whitespace"
    rest = args[1:] if args and args[0] in MUTATIONS else args
    src = rest[0] if rest else "/root/testdata/sf0.001"
    dst = rest[1] if len(rest) > 1 else f"/tmp/sf_{variant}"
    mutations = MUTATIONS[variant]
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for f in os.listdir(src):
        if f not in mutations:
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW src_table AS "
            f"SELECT * FROM read_parquet('{src}/{f}')"
        )
        clause = mutations[f]
        query = (
            clause if clause.lstrip().upper().startswith(("SELECT", "WITH"))
            else f"SELECT {clause} FROM src_table"
        )
        con.execute(f"COPY ({query}) TO '{dst}/{f}' (FORMAT PARQUET)")
    if variant == "physical":
        # DuckDB's parquet writer downcasts TIMESTAMP_NS to micros on
        # write, so the round-1 TIMESTAMP(NANOS) physical type — the drift
        # this variant exists to replay — needs a pyarrow rewrite.
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(dst, "events.parquet")
        t = pq.read_table(path)
        idx = t.schema.get_field_index("ts")
        t = t.set_column(
            idx, "ts", t.column("ts").cast(pa.timestamp("ns"))
        )
        pq.write_table(t, path, store_schema=False)
    print(f"wrote {dst} ({variant} variant)")


if __name__ == "__main__":
    main()
