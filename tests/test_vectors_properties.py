"""Mathematical invariants of the vector expression builders
(functions/vectors.py), checked against numpy on one seeded random batch —
a single Spark job covers every property (per-example jobs would make a
hypothesis-style loop pay 100× the scheduler cost for the same coverage).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_etl_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

N, DIM = 64, 16


@pytest.fixture(scope="module")
def batch(spark):
    rng = np.random.RandomState(7)
    a = rng.randn(N, DIM).astype(np.float32)
    b = rng.randn(N, DIM).astype(np.float32)
    a[0] = 0.0  # zero vector: cosine must be NULL, norm must be 0
    b[1] = a[1]  # identical vectors: cosine must be 1
    b[2] = -a[2]  # opposite vectors: cosine must be -1
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("a", T.ArrayType(T.FloatType())),
            T.StructField("b", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, a[i].tolist(), b[i].tolist()) for i in range(N)], schema
    )
    rows = (
        df.select(
            "i",
            dot("a", "b").alias("dot"),
            l2_norm("a").alias("na"),
            l2_norm("b").alias("nb"),
            cosine_similarity("a", "b").alias("cos"),
        )
        .collect()
    )
    return a, b, {r["i"]: r for r in rows}


def test_dot_and_norm_match_numpy(batch):
    a, b, rows = batch
    for i in range(N):
        assert rows[i]["dot"] == pytest.approx(float(np.dot(a[i].astype(np.float64), b[i].astype(np.float64))), rel=1e-9, abs=1e-9)
        assert rows[i]["na"] == pytest.approx(float(np.linalg.norm(a[i].astype(np.float64))), rel=1e-9, abs=1e-12)


def test_cosine_bounds_and_special_cases(batch):
    _, _, rows = batch
    assert rows[0]["cos"] is None  # zero vector → NULL, not NaN/crash
    assert rows[1]["cos"] == pytest.approx(1.0, abs=1e-9)
    assert rows[2]["cos"] == pytest.approx(-1.0, abs=1e-9)
    for i in range(3, N):
        assert -1.0 - 1e-9 <= rows[i]["cos"] <= 1.0 + 1e-9


def test_cauchy_schwarz(batch):
    a, b, rows = batch
    for i in range(1, N):
        assert abs(rows[i]["dot"]) <= rows[i]["na"] * rows[i]["nb"] + 1e-6


def test_filter_modal_dim_contract(spark, tmp_path):
    """filter_modal_dim must agree with MODAL_DIM_SQL on every clause of
    the contract: modal length wins, ties break to the SMALLER length,
    NULL vectors and off-modal vectors drop, and empty input yields empty
    output (not an error)."""
    import duckdb

    from e2e_etl_pipeline_spark.operators.similarity import (
        MODAL_DIM_SQL,
        filter_modal_dim,
    )

    rows = [
        # 3 × len-4 and 3 × len-2: a TIE — modal must break to 2
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [1.0, 2.0, 3.0, 4.0]),
        (3, [1.0, 2.0, 3.0, 4.0]),
        (4, [1.0, 2.0]),
        (5, [1.0, 2.0]),
        (6, [5.0, 6.0]),
        (7, [9.0]),  # minority length
        (8, None),  # NULL vector: not counted, not kept
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    kept = sorted(
        r.vec_id for r in filter_modal_dim(df).select("vec_id").collect()
    )
    assert kept == [4, 5, 6]

    # SQL twin on the same rows, via a parquet round-trip
    path = str(tmp_path / "embeddings.parquet")
    df.write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    sql_kept = sorted(
        r[0]
        for r in con.execute(
            f"WITH __dim AS ({MODAL_DIM_SQL}) "
            "SELECT vec_id FROM embeddings "
            "WHERE len(embedding) = (SELECT d FROM __dim)"
        ).fetchall()
    )
    assert sql_kept == kept

    empty = df.where(F.lit(False))
    assert filter_modal_dim(empty).count() == 0


def test_filter_modal_dim_memo_is_path_aware(spark, tmp_path):
    """Two same-schema corpora at DIFFERENT paths in one session must each
    get their OWN modal dimension. Regression for the round-9 memoization
    bug: the canonicalized-plan toString is PATH-BLIND for file relations
    ("Relation [...] parquet" prints no location), so a string-keyed memo
    served the first corpus's cached modal-dim frame to every same-schema
    corpus that followed (caught live: the 8-dim semdedup fixture got the
    sf0.01 corpus's 64-dim gate and filtered itself to empty). The memo
    now compares JVM canonicalized plans via .equals."""
    from e2e_etl_pipeline_spark.operators.similarity import filter_modal_dim

    wide = str(tmp_path / "wide")
    narrow = str(tmp_path / "narrow")
    spark.createDataFrame(
        [(1, [1.0] * 8), (2, [2.0] * 8)], "vec_id long, embedding array<float>"
    ).write.parquet(wide)
    spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<float>"
    ).write.parquet(narrow)

    gated_wide = filter_modal_dim(spark.read.parquet(wide))
    # Materialize the wide gate FIRST so a path-blind memo would already
    # hold its 8-dim frame when the narrow corpus asks.
    assert gated_wide.count() == 2
    gated_narrow = filter_modal_dim(spark.read.parquet(narrow))
    assert gated_narrow.count() == 2, (
        "narrow corpus was gated by another corpus's modal dimension — "
        "the similarity frame memo is not path-aware"
    )


def test_filter_modal_dim_memo_hits_after_materialization(spark, tmp_path):
    """A same-corpus repeat AFTER the gate has materialized must HIT the
    memo, and an in-place file regeneration must MISS it. Regression for
    the round-9 second memo bug: Dataset.inputFiles reads the OPTIMIZED
    plan, which cache-substitutes the persisted frame to an
    InMemoryRelation with no file scans — a signature computed from the
    memoized frame came back empty on every post-action lookup, so the
    memo silently degraded to one persist per invocation. The signature
    is now read from the raw input frame."""
    from e2e_etl_pipeline_spark.operators import similarity as sim

    path = str(tmp_path / "memo_corpus")
    spark.createDataFrame(
        [(1, [1.0] * 4), (2, [2.0] * 4)], "vec_id long, embedding array<float>"
    ).write.parquet(path)

    def gated():
        return sim.filter_modal_dim(spark.read.parquet(path))

    assert gated().count() == 2  # materialize: the memoized frame caches
    bucket = sim._FRAME_MEMO[spark]["modal_dim:embedding"]
    before = len(bucket)
    assert gated().count() == 2
    assert len(bucket) == before, (
        "same-corpus repeat after materialization appended a new memo "
        "entry — the input-files signature degraded (optimized-plan "
        "cache substitution?)"
    )

    # In-place regeneration (same path, new content/mtime) must re-gate.
    import shutil

    shutil.rmtree(path)
    spark.createDataFrame(
        [(1, [1.0] * 7), (2, [2.0] * 7), (3, [3.0] * 7)],
        "vec_id long, embedding array<float>",
    ).write.parquet(path)
    assert gated().count() == 3, (
        "regenerated corpus was served the stale memoized modal dim"
    )
    # The superseded version's entry is EVICTED (its mtime/size key can
    # never hit again), so the bucket does not grow across regenerations.
    assert len(bucket) == before
