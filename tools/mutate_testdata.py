"""Build a whitespace-mutated copy of a testdata directory to prove
cross-engine parity holds on data shapes the per-round regeneration could
introduce (the round-2/3 advisor findings: edge whitespace, tabs, vertical
tabs, doubled spaces silently split Java-\\s-based Spark tokenizers from
RE2-based DuckDB oracles unless every class is pinned explicitly).

Usage:
    python tools/mutate_testdata.py [src_sf_dir] [dst_dir]
    PYTHONPATH=. python tools/check_oracles.py <dst_dir> --exact

Round-3 result (2026-08-14): 228/228 keys bit-exact on the mutated copy.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_mutated"
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        if f != "documents.parquet":
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))
    con = duckdb.connect()
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
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')"
    ).fetchone()[0]
    print(f"wrote {dst}: {n} mutated document rows")


if __name__ == "__main__":
    main()
