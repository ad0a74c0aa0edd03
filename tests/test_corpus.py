"""Behavioral tests for the corpus family (queries/corpus.py): properties
the oracle hash-compare can't express — rank totality, sampling caps and
determinism, and unigram-LM score monotonicity."""

from __future__ import annotations

import pyspark.sql.functions as F

from e2e_etl_pipeline_spark.catalog import load_table
from e2e_etl_pipeline_spark.queries.corpus import LANG_CAP
from e2e_etl_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_vocab_ids_are_dense_and_frequency_ordered(spark, sf_dir):
    vocab = QUERIES["q_vocab_topk"](spark, sf_dir).collect()
    ids = sorted(r.token_id for r in vocab)
    assert ids == list(range(1, len(vocab) + 1))
    by_id = sorted(vocab, key=lambda r: r.token_id)
    # Non-increasing frequency along the id order; ties broken by token.
    for a, b in zip(by_id, by_id[1:]):
        assert a.n_occ > b.n_occ or (a.n_occ == b.n_occ and a.token < b.token)
        assert a.n_docs <= a.n_occ


def test_unigram_logprob_prefers_frequent_tokens(spark, sf_dir):
    scored = QUERIES["q_unigram_logprob"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert scored.count() == docs.count()
    rows = scored.collect()
    # Probabilities are < 1 so every mean log10 is strictly negative, and
    # every doc's mean is bounded by the best/worst single-token logprob.
    import math

    from e2e_etl_pipeline_spark.queries.corpus import VOCAB_SIZE

    vocab = QUERIES["q_vocab_topk"](spark, sf_dir).collect()
    for r in rows:
        assert r.logprob < 0
    if len(vocab) < VOCAB_SIZE:  # vocab is complete → bounds are exact
        total = sum(r.n_occ for r in vocab)
        lo = math.log10(min(r.n_occ for r in vocab) / total)
        hi = math.log10(max(r.n_occ for r in vocab) / total)
        for r in rows:
            assert lo - 1e-4 <= r.logprob <= hi + 1e-4


def test_balanced_sample_caps_every_language(spark, sf_dir):
    sample = QUERIES["q_sample_balanced"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    per_lang = {
        r.lang: r.n
        for r in sample.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_lang) == set(totals)
    for lang, n in per_lang.items():
        assert n == min(LANG_CAP, totals[lang])
    # Hash-derived sampling is deterministic across reruns.
    first = {(r.doc_id, r.lang_rank) for r in sample.collect()}
    again = {(r.doc_id, r.lang_rank) for r in QUERIES["q_sample_balanced"](spark, sf_dir).collect()}
    assert first == again


def test_vocab_topk_plan_take_ordered(spark, sf_dir):
    plan = QUERIES["q_vocab_topk"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # The global top-k must be TakeOrderedAndProject over the reduced
    # vocabulary, not a full sort of the token table.
    assert "TakeOrderedAndProject" in plan


def test_tfidf_ranks_and_bounds(spark, sf_dir):
    t = QUERIES["q_tfidf"](spark, sf_dir)
    rows = t.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, terms in per_doc.items():
        ranks = sorted(r.term_rank for r in terms)
        assert ranks == list(range(1, len(terms) + 1))  # dense, ≤3
        assert len(terms) <= 3
        by_rank = sorted(terms, key=lambda r: r.term_rank)
        for a, b in zip(by_rank, by_rank[1:]):
            assert a.tfidf > b.tfidf or (a.tfidf == b.tfidf and a.token < b.token)
    # idf ≥ 0 and tf ≥ 1 → every score is non-negative.
    assert all(r.tfidf >= 0 for r in rows)


def test_ntile_bins_partition_the_orders(spark, sf_dir):
    bins = QUERIES["q_ntile_bins"](spark, sf_dir).collect()
    assert sorted(r.decile for r in bins) == list(range(1, 11))
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in bins) == n_orders
    # Bucket sizes differ by at most one; boundaries are non-decreasing.
    sizes = [r.n_orders for r in bins]
    assert max(sizes) - min(sizes) <= 1
    by_decile = sorted(bins, key=lambda r: r.decile)
    for r in by_decile:
        assert r.lo <= r.hi
    for a, b in zip(by_decile, by_decile[1:]):
        assert a.hi <= b.lo


def test_unigram_logprob_plan_reuses_token_shuffle(spark, sf_dir):
    df = QUERIES["q_unigram_logprob"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Corpus counts derive from the same (doc_id, token) tf aggregate the
    # score join consumes: the explode shuffle must be computed once and
    # served to the second branch via ReuseExchange.
    assert "ReusedExchange" in plan
    assert "SortMergeJoin" not in plan


def test_training_pipeline_shuffles_no_document_bodies(spark, sf_dir):
    df = QUERIES["q_training_pipeline"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Digest/score/token-count are computed in the scan stage; no exchange
    # may carry the raw text column (5-gram shingle strings are the only
    # text-derived join payload, by design).
    assert not [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "text" in line
    ]
    # The capstone result is capped per language and non-empty.
    from e2e_etl_pipeline_spark.queries.corpus import LANG_CAP

    counts = df.groupBy("lang").count().collect()
    assert counts and all(r["count"] <= LANG_CAP for r in counts)


def test_bpe_train_matches_hand_derivation(spark):
    # Corpus: "low"×5, "lowest"×2 — small enough to run BPE by hand.
    #   iter1: (l,o)=7 ties (o,w)=7 → 'l o' wins on the pair tiebreak
    #   iter2: (lo,w)=7
    #   iter3: all remaining pairs tie at 2 → 'e s' is binary-least
    #   iter4: (es,t)=2 beats (low,es)=2 on the tiebreak
    #   iter5: only (low,est)=2 remains
    from e2e_etl_pipeline_spark.operators.bpe import bpe_train_merges

    words = spark.createDataFrame(
        [("low", 5), ("lowest", 2)], "token string, cnt bigint"
    )
    got = [
        (r.iteration, r.merge_rule, r.pair_count)
        for r in bpe_train_merges(words, 5).collect()
    ]
    assert got == [
        (1, "l o", 7),
        (2, "lo w", 7),
        (3, "e s", 2),
        (4, "es t", 2),
        (5, "low est", 2),
    ]


def test_bpe_train_dries_up_and_stops_early(spark):
    # One two-char word: a single merge exhausts every pair; asking for 5
    # merges must return exactly 1 row, not loop or crash.
    from e2e_etl_pipeline_spark.operators.bpe import bpe_train_merges

    words = spark.createDataFrame([("ab", 3)], "token string, cnt bigint")
    got = [
        (r.iteration, r.merge_rule, r.pair_count)
        for r in bpe_train_merges(words, 5).collect()
    ]
    assert got == [(1, "a b", 3)]
    # Monotone invariant on real data: the best pair count never increases
    # across iterations (a merge can only create pairs at most as frequent
    # as the pair it consumed).


def test_bpe_batches_disjoint_merges_in_one_round(spark):
    # Four symbol-disjoint top pairs with strictly decreasing counts and
    # nothing beyond them: one driver round must emit all four merges,
    # in sequential (count desc, pair asc) order with sequential counts.
    from e2e_etl_pipeline_spark.operators.bpe import bpe_learn

    words = spark.createDataFrame(
        [("ab", 9), ("cd", 7), ("ef", 5), ("gh", 3)],
        "token string, cnt bigint",
    )
    stats: dict = {}
    merges = bpe_learn(words, 4, stats=stats)
    assert [(it, rule, pc) for it, rule, pc, _ in merges] == [
        (1, "a b", 9),
        (2, "c d", 7),
        (3, "e f", 5),
        (4, "g h", 3),
    ]
    assert stats["rounds"] == 1 and stats["merges"] == 4


def test_bpe_batched_equals_sequential_reference(spark):
    # Fuzz the batched trainer against a pure-Python one-merge-at-a-time
    # reference on small random vocabularies, with a tiny batch_window to
    # force the window-full truncation and fallback paths. Exercises the
    # proof in operators/bpe.py including ties, conflicts, and merged
    # symbols recreating adjacency.
    import random

    from e2e_etl_pipeline_spark.operators.bpe import BPE_L, BPE_R, bpe_learn

    def py_bpe(words, n_merges):
        seqs = [([BPE_L + c + BPE_R for c in w], cnt) for w, cnt in words]
        out = []
        for it in range(1, n_merges + 1):
            counts: dict = {}
            for syms, cnt in seqs:
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + cnt
            if not counts:
                break
            (a, b), pc = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
            )
            out.append(
                (
                    it,
                    (a + " " + b).replace(BPE_L, "").replace(BPE_R, ""),
                    pc,
                )
            )
            ab = a[:-1] + b[1:]  # "<a>" + "<b>" -> "<ab>", markers kept
            new = []
            for syms, cnt in seqs:
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(ab)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                new.append((merged, cnt))
            seqs = new
        return out

    rng = random.Random(20260815)
    for trial in range(8):
        vocab = sorted(
            {
                "".join(
                    rng.choice("abc") for _ in range(rng.randint(1, 6))
                )
                for _ in range(rng.randint(3, 10))
            }
        )
        words = [(w, rng.randint(1, 9)) for w in vocab]
        df = spark.createDataFrame(words, "token string, cnt bigint")
        got = [
            (it, rule, pc)
            for it, rule, pc, _ in bpe_learn(
                df, 6, batch_window=3, checkpoint_every=2
            )
        ]
        assert got == py_bpe(words, 6), f"trial {trial}: {words}"


def test_bpe_train_counts_are_nonincreasing(spark, sf_dir):
    rows = sorted(
        QUERIES["q_bpe_train"](spark, sf_dir).collect(),
        key=lambda r: r.iteration,
    )
    assert [r.iteration for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.pair_count >= b.pair_count
        left, right = b.merge_rule.split(" ", 1)
        assert left and right


def test_span_corruption_reconstructs_original(spark, sf_dir):
    """Denoising-pair contract: splicing each target span back into its
    input sentinel reproduces the original whitespace-tokenized document,
    and span/mask counts are consistent."""
    import re

    from e2e_etl_pipeline_spark.registry import QUERIES

    rows = QUERIES["q_span_corruption"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert rows
    n_with_spans = 0
    for r in rows:
        toks = [t for t in re.split(r"[ \t\n\x0B\f\r]+", docs[r.doc_id] or "") if t]
        assert r.n_tokens == len(toks)
        assert 0 <= r.n_spans <= r.n_masked <= r.n_tokens
        # parse target into {sentinel_id: [tokens...]}
        spans: dict[int, list[str]] = {}
        cur = None
        for t in r.target_text.split(" ") if r.target_text else []:
            m = re.fullmatch(r"<extra_id_(\d+)>", t)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                # A target token before any sentinel means either a corpus
                # token literally shaped like <extra_id_N> (the operator's
                # output is ambiguous for those — documented assumption in
                # q_span_corruption's docstring) or a malformed target.
                assert cur is not None, (
                    f"doc {r.doc_id}: target_text has token {t!r} before "
                    "the first sentinel — sentinel-shaped corpus token?"
                )
                spans[cur].append(t)
        assert len(spans) == r.n_spans
        assert sum(len(v) for v in spans.values()) == r.n_masked
        rebuilt: list[str] = []
        for t in r.input_text.split(" ") if r.input_text else []:
            m = re.fullmatch(r"<extra_id_(\d+)>", t)
            if m:
                rebuilt.extend(spans[int(m.group(1))])
            else:
                rebuilt.append(t)
        assert rebuilt == toks
        if r.n_spans:
            n_with_spans += 1
    assert n_with_spans > 0  # masking actually fires on this corpus


def test_dedup_url_groups_cover_corpus(spark, sf_dir):
    """Survivors + duplicate counts partition the corpus: group sizes sum
    to the document count, each survivor is the min doc_id of its group,
    and every canonical URL is lowercase with no tracking params, default
    port, fragment, or trailing slash."""
    from e2e_etl_pipeline_spark.registry import QUERIES

    rows = QUERIES["q_dedup_url"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_dups for r in rows) == n_docs
    assert any(r.n_dups > 1 for r in rows)  # dedup actually collapses
    for r in rows:
        u = r.canon_url
        assert u == u.lower()
        assert u.startswith("https://")
        for banned in ("utm_", ":443", "#", "www."):
            assert banned not in u
        assert "/?" in u or not u.split("?")[0].endswith("/")
