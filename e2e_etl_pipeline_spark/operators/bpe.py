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
feeds it. Each ROUND is one vocab-scale pair explode into a partially
aggregated top-W collect (TakeOrderedAndProject, W = ``batch_window``
rows of driver traffic) plus ONE map-only string rewrite applying every
merge the round proved safe to batch — so a production ~30k-merge train
costs far fewer job launches than merges. Lineage is truncated with an
eager ``localCheckpoint`` every ``checkpoint_every`` rounds (the
BFS/PageRank pattern in queries/graph.py), so the plan never accumulates
the full rewrite chain.

Batched-equals-sequential proof (this is why the unrolled per-merge
DuckDB oracle in queries/corpus.py stays exact over the batched trainer):
a round's batch is the maximal PREFIX of the (count DESC, pair ASC)
pair list such that
  (1) members are pairwise symbol-disjoint, counting each member's two
      symbols AND its merged concatenation (so no member consumes,
      produces, or borders another member's symbols), and
  (2) no member's merged symbol already exists in the vocabulary —
      checked exactly against the driver-side merge history, since every
      multi-char symbol is by construction the concatenation of some
      earlier recorded merge (initial symbols are single chars), and
  (3) every member's count is STRICTLY greater than the count of the
      first conflicting pair (the first sorted pair sharing a symbol
      with the prefix; when the window is full and conflict-free, the
      last fetched row's count bounds all unseen pairs instead).
Under (1)+(2), applying earlier batch members cannot change a later
member's count (disjoint), and every pair it creates contains a
brand-new symbol, so that pair's count is bounded by the count of the
old pair its occurrences decompose through — a symbol-sharing pair,
which sorts at-or-after the first conflict. With (3), each batch member
therefore still strictly outranks every changed or created pair at its
sequential turn, and its recorded count is its original (invariant)
count — exactly what the sequential loop would emit. When truncation
empties the batch (ties at the conflict count), the round falls back to
the plain top-1 sequential merge, which is always correct.
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


def _plan_batch(
    rows: list, window: int, history: set[str]
) -> list[tuple[str, int]]:
    """Pick the sequential-equivalent merge batch from one round's sorted
    top-``window`` (pair, pc) rows — the prefix satisfying conditions
    (1)-(3) of the module docstring's proof. Always returns ≥1 merge."""
    touched: set[str] = set()
    batch: list[tuple[str, int]] = []
    bound: int | None = None  # count of the first conflicting pair
    for r in rows:
        left, right = r["pair"].split(" ")
        merged = r["pair"].replace(BPE_R + " " + BPE_L, "")
        if left in touched or right in touched or merged in touched \
                or merged in history:
            bound = int(r["pc"])
            break
        batch.append((r["pair"], int(r["pc"])))
        touched.update((left, right, merged))
    if bound is None and len(rows) == window:
        # Window full, conflict-free: unseen pairs sort at-or-after the
        # last fetched row, so its count bounds everything unchecked.
        bound = int(rows[-1]["pc"])
    if bound is not None:
        batch = [m for m in batch if m[1] > bound]
    # Fallback: the plain sequential top-1 merge is always correct.
    return batch or [(rows[0]["pair"], int(rows[0]["pc"]))]


def bpe_learn(
    words: DataFrame,
    n_merges: int,
    *,
    batch_window: int = 16,
    checkpoint_every: int = 16,
    stats: dict | None = None,
) -> list[tuple[int, str, int, str]]:
    """Learn up to ``n_merges`` BPE merges from a (token, cnt) table.

    Returns one (iteration, merge_rule, pair_count, raw_pair) tuple per
    completed merge — fewer than ``n_merges`` when the pairs dry up (every
    word reduced to a single symbol). ``merge_rule`` is the human-readable
    "left right" pair with the markers stripped; ``raw_pair`` is the
    marker-wrapped replace needle bpe_apply consumes. Output is
    bit-identical to the one-merge-per-iteration sequential loop (proof in
    the module docstring) while batching safe merges per driver round.

    ``stats``, when given, receives {"rounds": driver sync count,
    "merges": total merges} so tests can assert merges-per-round > 1.
    """
    seqs = encode_words(words).persist()
    checkpointed: DataFrame | None = None
    try:
        merges: list[tuple[int, str, int, str]] = []
        history: set[str] = set()  # merged symbols — preexistence guard
        rounds = 0
        df = seqs
        while len(merges) < n_merges:
            rows = (
                _pair_counts(df)
                .orderBy(F.desc("pc"), F.asc("pair"))
                .limit(batch_window)
                .collect()
            )
            if not rows:
                break
            rounds += 1
            batch = _plan_batch(rows, batch_window, history)
            batch = batch[: n_merges - len(merges)]
            for pair, pc in batch:
                merges.append(
                    (
                        len(merges) + 1,
                        pair.replace(BPE_L, "").replace(BPE_R, ""),
                        pc,
                        pair,
                    )
                )
                history.add(pair.replace(BPE_R + " " + BPE_L, ""))
            df = _apply_batch(df, [pair for pair, _ in batch])
            if rounds % checkpoint_every == 0:
                df = df.localCheckpoint(eager=True)
                if checkpointed is not None:
                    checkpointed.unpersist(blocking=False)
                checkpointed = df
        if stats is not None:
            stats["rounds"] = rounds
            stats["merges"] = len(merges)
        return merges
    finally:
        seqs.unpersist(blocking=False)
        if checkpointed is not None:
            checkpointed.unpersist(blocking=False)


def _apply_batch(seqs: DataFrame, raw_pairs: list[str]) -> DataFrame:
    """Rewrite every sequence with a round's merges in ONE map-only
    projection: nested literal left-to-right replaces of each
    marker-wrapped pair with its concatenation. Batch members are
    symbol-disjoint (see _plan_batch), so the nested replaces cannot
    interfere and any application order yields the same string."""
    col = F.col("seq")
    for raw_pair in raw_pairs:
        merged = raw_pair.replace(BPE_R + " " + BPE_L, "")
        col = F.replace(col, F.lit(raw_pair), F.lit(merged))
    keep = [c for c in seqs.columns if c != "seq"]
    return seqs.select(*keep, col.alias("seq"))


def _apply_one(seqs: DataFrame, raw_pair: str) -> DataFrame:
    """Rewrite every sequence with one merge (bpe_apply's per-merge step;
    training rounds go through _apply_batch)."""
    return _apply_batch(seqs, [raw_pair])


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
