"""Build mutated copies of a testdata directory to prove cross-engine
parity holds on data shapes the per-round regeneration could introduce.

Variant "whitespace" (advisor-finding class): edge whitespace, tabs,
vertical tabs, doubled spaces in documents.text — these silently split
Java-\\s-based Spark tokenizers from RE2-based DuckDB oracles unless every
character class is pinned explicitly.

Variant "nulls": NULL l_partkey/l_suppkey and NULL events.value/props —
this class exposed four real parity splits in round 3 (NOT IN vs
anti-join NULL-key semantics, json_valid(NULL), last(ignorenulls) tearing
a (ts, value) pair, engine-native avg() rounding-boundary flips).

Variant "edge": empty / single-char / whitespace-only / exact-duplicate
documents — this class exposed two ANSI-mode crashes (sequence over an
empty token list, DIVIDE_BY_ZERO on a 0-token ratio: ANSI Spark raises
even for double division) and one NaN-vs-coalesce split in the quality
formula.

Usage:
    python tools/mutate_testdata.py [whitespace|nulls|edge] [src] [dst]
    PYTHONPATH=. python tools/check_oracles.py <dst_dir> [--exact]

Round-3 result (2026-08-14): whitespace variant 228/228 bit-exact; nulls
and edge variants 228/228 (tolerance mode — value injection shifts floats
onto different rounding boundaries run-to-run, parity is the claim).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def main() -> None:
    args = sys.argv[1:]
    variants = ("whitespace", "nulls", "edge")
    variant = args[0] if args and args[0] in variants else "whitespace"
    rest = args[1:] if args and args[0] in variants else args
    src = rest[0] if rest else "/root/testdata/sf0.001"
    dst = rest[1] if len(rest) > 1 else f"/tmp/sf_{variant}"
    keep = {
        "whitespace": ("documents.parquet",),
        "nulls": ("lineitem.parquet", "events.parquet"),
        "edge": ("documents.parquet",),
    }[variant]
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        if f not in keep:
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))
    con = duckdb.connect()
    if variant == "whitespace":
        con.execute(f"""
        COPY (
          SELECT doc_id,
                 CASE doc_id % 7
                   WHEN 0 THEN ' ' || text                 -- leading space
                   WHEN 1 THEN text || E'\t'               -- trailing tab
                   WHEN 2 THEN replace(text, ' ', '  ')    -- doubled spaces
                   WHEN 3 THEN replace(text, ' ', E'\t')   -- tabs between words
                   WHEN 4 THEN replace(text, ' ', chr(11)) -- vertical tab \\x0B
                   WHEN 5 THEN E'\n' || text || E'\r'      -- edge newline/CR
                   ELSE text
                 END AS text,
                 lang, source, n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """)
    elif variant == "edge":
        con.execute(f"""
        COPY (
          SELECT doc_id,
                 CASE doc_id % 11
                   WHEN 0 THEN ''        -- empty doc
                   WHEN 1 THEN 'x'       -- single char
                   WHEN 2 THEN '   '     -- whitespace-only
                   WHEN 3 THEN (SELECT text
                                FROM read_parquet('{src}/documents.parquet')
                                WHERE doc_id = 7)  -- exact duplicate
                   ELSE text
                 END AS text,
                 lang, source, n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """)
    else:
        con.execute(f"""
        COPY (
          SELECT l_orderkey,
                 CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_partkey END AS l_partkey,
                 CASE WHEN l_orderkey % 89 = 0 THEN NULL ELSE l_suppkey END AS l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet')
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """)
        con.execute(f"""
        COPY (
          SELECT event_id, ts, user_id, event_type,
                 CASE WHEN event_id % 53 = 0 THEN NULL ELSE value END AS value,
                 CASE WHEN event_id % 71 = 0 THEN NULL ELSE props END AS props
          FROM read_parquet('{src}/events.parquet')
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """)
    print(f"wrote {dst} ({variant} variant)")


if __name__ == "__main__":
    main()
