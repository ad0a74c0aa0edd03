"""Behavioral coverage for the curation composites (queries/curation.py):
connected-components cluster assignment must be transitive (chains merge
even when the endpoints' pairwise similarity is below threshold), SemDeDup
pruning must drop planted semantic duplicates and keep orthogonal vectors,
and the readability score must match a hand computation.
"""

from __future__ import annotations

from e2e_etl_pipeline_spark.registry import QUERIES, load_all

load_all()


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_cluster_cc_merges_transitive_chain(spark, tmp_path):
    """a~b and b~c clear the 0.5 Jaccard threshold but a~c does NOT
    (0.375) — pairwise dedup emits two edges; the cluster assignment must
    still put all three in ONE component (transitive closure), with an
    unrelated doc as its own singleton."""
    w = [f"w{i}" for i in range(10)]
    x = ["x0", "x1"]
    y = [f"y{i}" for i in range(4)]
    a = " ".join(w)                          # {w0..w9}
    b = " ".join(w + x)                      # j(a,b) = 10/12 ≈ 0.83
    c = " ".join(w[4:] + x + y)              # j(b,c) = 8/16 = 0.5; j(a,c) = 6/16
    d = " ".join(f"z{i}" for i in range(8))  # singleton
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (10, a, "de", "s", len(a)),
            (11, b, "de", "s", len(b)),
            (12, c, "de", "s", len(c)),
            (13, d, "de", "s", len(d)),
            (14, "english text outside the slice", "en", "s", 31),
            # NULL doc_id: identity-less rows are OUT of the cluster
            # contract (the oracle's recursive UNION would dedup
            # (NULL, NULL) reach rows while Spark counted every input row)
            (None, d, "de", "s", len(d)),
        ],
    )
    out = {r.component_id: r for r in QUERIES["q_dedup_cluster_cc"](spark, sf).collect()}
    assert set(out) == {10, 13}
    assert out[10].n_members == 3
    assert out[10].member_ids == "10,11,12"
    assert out[13].n_members == 1
    assert out[13].member_ids == "13"


def test_semdedup_drops_planted_duplicate_keeps_orthogonal(spark, tmp_path):
    """Seeds are the 8 one-hot basis vectors. vec 8 (= e0) lands in cluster
    0 and must be dropped (cosine 1.0 to the seed); vec 9 (= e1) likewise
    in cluster 1; vec 10 (= -e2) tie-breaks into cluster 0 but is
    orthogonal to every lower-id member there, so it must be KEPT."""
    import numpy as np

    def one_hot(i, sign=1.0):
        v = np.zeros(8, dtype="float32")
        v[i] = sign
        return [float(x) for x in v]

    rows = [(i, one_hot(i), i) for i in range(8)]
    rows.append((8, one_hot(0), 0))
    rows.append((9, one_hot(1), 1))
    rows.append((10, one_hot(2, sign=-1.0), 2))
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    em.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.cluster_id: r for r in QUERIES["q_semdedup_prune"](spark, str(tmp_path)).collect()}
    assert set(out) == set(range(8))
    assert (out[0].n_total, out[0].n_dropped, out[0].n_kept) == (3, 1, 2)
    assert (out[1].n_total, out[1].n_dropped, out[1].n_kept) == (2, 1, 1)
    for cid in range(2, 8):
        assert (out[cid].n_total, out[cid].n_dropped, out[cid].n_kept) == (1, 0, 1)


def test_readability_hand_computed(spark, tmp_path):
    """Flesch on 'The cat sat. The dog ran!': 6 words, 2 sentences, 6
    vowel-group syllables → 206.835 - 1.015·3 - 84.6·1 = 119.19. A
    sentence-less doc clamps S to 1; an empty doc reports band 'empty'
    with NULL flesch."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "The cat sat. The dog ran!", "en", "s", 25),
            (1, "hello world", "en", "s", 11),
            (2, "", "en", "s", 0),
            (3, None, "en", "s", 0),
        ],
    )
    out = {r.doc_id: r for r in QUERIES["q_text_readability"](spark, sf).collect()}
    r0 = out[0]
    assert (r0.n_words, r0.n_sentences, r0.n_syllables) == (6, 2, 6)
    assert abs(r0.flesch - 119.19) < 1e-9
    assert r0.band == "easy"
    r1 = out[1]
    assert (r1.n_words, r1.n_sentences) == (2, 0)  # raw count; clamp is score-side
    # hello → vowel groups e,o (2); world → o (1) → 3 syllables over 2 words
    assert abs(r1.flesch - (206.835 - 1.015 * 2.0 - 84.6 * (3.0 / 2.0))) < 1e-9
    for i in (2, 3):
        assert out[i].band == "empty"
        assert out[i].flesch is None
        assert (out[i].n_words, out[i].n_syllables) == (0, 0)


def test_curation_pipeline_funnel_counts(spark, tmp_path):
    """Planted funnel: 11 docs — one quality-fail, one exact-dup of doc 0,
    one semantic victim (embedding identical to seed 0) — must report
    n_docs=11 → n_quality=10 → n_exact=9 → n_final=8."""
    import numpy as np

    def one_hot(i, sign=1.0):
        v = np.zeros(8, dtype="float32")
        v[i] = sign
        return [float(x) for x in v]

    texts = {i: " ".join(f"w{i}x{j}" for j in range(12)) for i in range(9)}
    texts[9] = texts[0]  # exact duplicate of doc 0
    texts[10] = "tiny"   # quality fail (<10 words, <50 chars)
    docs = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    em = [(i, one_hot(i), i) for i in range(8)]
    em.append((8, one_hot(0), 0))            # semantic victim of seed 0
    em.append((9, one_hot(1, sign=-1.0), 1))  # orthogonal to cluster-0 mates
    em.append((10, one_hot(2, sign=-1.0), 2))
    spark.createDataFrame(
        em, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    out = {r.source: r for r in QUERIES["q_curation_pipeline"](spark, str(tmp_path)).collect()}
    r = out["s"]
    assert (r.n_docs, r.n_quality, r.n_exact, r.n_final) == (11, 10, 9, 8)


def test_trigram_kernel_matches_explode_counts(spark):
    """The round-12 Arrow trigram-count kernel must emit EXACTLY the
    (doc, trigram, count) multiset the explode form produced — including
    duplicated doc_id rows (pooled downstream, not in the kernel), NULL
    ids, NULL/short text (no rows), and astral code points (Spark
    substring counts code points; the kernel's UTF-32 view must agree)."""
    from pyspark.sql import functions as F

    from e2e_etl_pipeline_spark.queries.curation import _trigram_count_kernel

    rows = [
        (1, "abcabc"),
        (1, "abcx"),          # duplicated id row: pools with the row above
        (2, "aaaa"),
        (3, None),            # NULL text: no rows
        (4, "ab"),            # too short: no rows
        (5, "x\U0001F600y\U0001F600z"),  # astral chars count as ONE char
        (None, "abcd"),       # NULL id keeps its gram rows (NULL group)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kernel = (
        d.select("doc_id", "text")
        .mapInArrow(
            _trigram_count_kernel(),
            "doc_id long, gram_code bigint, cnt bigint",
        )
        .groupBy("doc_id", "gram_code")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # decode the packed code back to the gram string for comparison
    got = {
        (
            r.doc_id,
            chr(r.gram_code >> 42)
            + chr((r.gram_code >> 21) & 0x1FFFFF)
            + chr(r.gram_code & 0x1FFFFF),
        ): r.cnt
        for r in kernel.collect()
    }
    raw = F.transform(
        F.sequence(F.lit(1), F.length("text") - 2),
        lambda i: F.substring(F.col("text"), i, F.lit(3)),
    )
    ref_rows = (
        d.where(F.length("text") >= 3)
        .select("doc_id", F.explode(raw).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    ref = {(r.doc_id, r.gram): r.cnt for r in ref_rows}
    assert got == ref
