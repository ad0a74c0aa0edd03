"""Iterative BPE merge training over a word-frequency table.

q_bpe_pairs (queries/corpus.py) is the trainer's inner loop run once; this
operator runs the actual training iteration: count adjacent symbol pairs
weighted by word frequency, pick the most frequent pair (deterministic
(count DESC, pair ASC) tiebreak), rewrite every word's symbol sequence with
the merge, repeat. It generalizes the reference's tokenizer-free text
handling (DataTransform/transform_data.py works on raw strings only) to the
vocabulary-learning step an LLM data pipeline runs before tokenizing.

Representation: each word is a single string of marker-wrapped symbols
joined by spaces — ``\\x01l\\x02 \\x01o\\x02 \\x01w\\x02`` for "low".
Applying a merge is then one literal ``replace(seq, '<a> <b>', '<ab>')``:
both Spark's and DuckDB's ``replace`` scan left-to-right without overlap,
which is exactly BPE's greedy-leftmost application, so the DuckDB oracle
(an unrolled CTE chain, see queries/corpus.py) reproduces the Spark loop
bit-for-bit. The markers make the pair pattern token-exact (a bare
``'a b'`` would also match token "a" followed by token "bc").

Scale: the loop runs over the VOCABULARY (token, count) table, not the
corpus — the corpus-scale shuffle happens once, in the word count that
feeds it. Each iteration is one vocab-scale pair explode into a
partially-aggregated 1-row top-k (TakeOrderedAndProject) plus a map-only
string rewrite; the only driver traffic is that single best-pair row per
iteration (the same metadata-sized sync point as the BFS frontier or a
k-means centroid update). A production trainer doing ~30k merges batches
top-k non-overlapping merges per round to cut the sync count; the
per-merge semantics are the ones implemented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Symbol markers: ASCII control chars that whitespace-split tokens cannot
# normally contain. If a pathological corpus does contain them the training
# stays deterministic and engine-identical (it is pure string algebra on
# both sides) — only the linguistic reading of the merges degrades.
BPE_L = "\x01"
BPE_R = "\x02"


def encode_words(words: DataFrame) -> DataFrame:
    """(token, cnt) -> (token, seq, cnt): marker-wrapped space-joined
    symbols; token is carried through so the encoded vocabulary can be
    joined back to a token stream (bpe_apply / q_bpe_encode)."""
    enc = (
        "array_join(transform(sequence(1, length(token)), "
        f"i -> concat('{BPE_L}', substring(token, i, 1), '{BPE_R}')), ' ')"
    )
    return words.select("token", F.expr(enc).alias("seq"), F.col("cnt"))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency.

    sequence(1, n) with n < 1 would generate a DESCENDING sequence in
    Spark (step defaults to -1), so single-symbol words are filtered out
    before the transform rather than relying on an empty sequence.
    """
    t = seqs.select(F.split("seq", " ").alias("t"), "cnt")
    pairs = t.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("pair"),
        "cnt",
    )
    return pairs.groupBy("pair").agg(F.sum("cnt").cast("bigint").alias("pc"))


def bpe_learn(words: DataFrame, n_merges: int) -> list[tuple[int, str, int, str]]:
    """Learn up to ``n_merges`` BPE merges from a (token, cnt) table.

    Returns one (iteration, merge_rule, pair_count, raw_pair) tuple per
    completed merge — fewer than ``n_merges`` when the pairs dry up (every
    word reduced to a single symbol). ``merge_rule`` is the human-readable
    "left right" pair with the markers stripped; ``raw_pair`` is the
    marker-wrapped replace needle bpe_apply consumes.
    """
    seqs = encode_words(words).persist()
    try:
        merges: list[tuple[int, str, int, str]] = []
        df = seqs
        for it in range(1, n_merges + 1):
            best = (
                _pair_counts(df)
                .orderBy(F.desc("pc"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            pair, pc = best[0]["pair"], int(best[0]["pc"])
            merges.append(
                (it, pair.replace(BPE_L, "").replace(BPE_R, ""), pc, pair)
            )
            df = _apply_one(df, pair)
        return merges
    finally:
        seqs.unpersist(blocking=False)


def _apply_one(seqs: DataFrame, raw_pair: str) -> DataFrame:
    """Rewrite every sequence with one merge: a literal left-to-right
    replace of the marker-wrapped pair with its concatenation."""
    merged = raw_pair.replace(BPE_R + " " + BPE_L, "")
    keep = [c for c in seqs.columns if c != "seq"]
    return seqs.select(
        *keep,
        F.replace(F.col("seq"), F.lit(raw_pair), F.lit(merged)).alias("seq"),
    )


def bpe_apply(words: DataFrame, raw_pairs: list[str]) -> DataFrame:
    """Encode a (token, cnt) vocabulary with an ordered merge list:
    (token, seq, cnt) after every merge is applied in training order."""
    df = encode_words(words)
    for pair in raw_pairs:
        df = _apply_one(df, pair)
    return df


def bpe_train_merges(words: DataFrame, n_merges: int) -> DataFrame:
    """bpe_learn as a DataFrame:
    (iteration int, merge_rule string, pair_count bigint)."""
    merges = [(it, rule, pc) for it, rule, pc, _ in bpe_learn(words, n_merges)]
    return words.sparkSession.createDataFrame(
        merges, "iteration int, merge_rule string, pair_count bigint"
    )
