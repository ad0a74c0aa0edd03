"""Deduplication operators: exact, MinHash+LSH, SimHash, token-set Jaccard.

Scale design notes (the part that matters at 100 TB):
  * Exact dedup is a hash aggregate on a digest of the dedup key — group on
    xxhash64(text) (8 bytes) instead of shuffling full document bodies.
  * MinHash is computed as (doc × shingle) rows hashed k ways via xxhash64
    with per-hash seeds, aggregated with min() — map-side partial
    aggregation shrinks the shuffle to k values per doc. Banding then turns
    near-dup detection into an equi-join on (band_id, band_hash): candidate
    pairs only, never all pairs.
  * SimHash reduces each doc to a 64-bit fingerprint; the banded join on
    16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal) again avoids
    the cross product.
  * Everything is built-in expressions — no Python in the hot path.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.functions.digests import md5_u60, md5_u60_spark_sql
from e2e_etl_pipeline_spark.functions.rounding import stable_round


# ---------------------------------------------------------------------------
# Exact dedup (A24 generalized; q_dedup_exact)
# ---------------------------------------------------------------------------
def content_digest(col: Column | str, bits: int = 64) -> Column:
    """Content digest for shuffle-light dedup grouping.

    bits=64: one xxhash64 (8 bytes through the shuffle) — fine to ~10^8
    docs. bits=128: a struct of two xxhash64 passes over domain-separated
    input (the second appends a \\x01 salt byte), pushing the birthday
    bound past any real corpus (~2^64 effective) while staying JVM-side —
    16 bytes through the shuffle, same plan shape. This is the upgrade
    path the 64-bit dedup docstrings reference."""
    c = F.col(col) if isinstance(col, str) else col
    if bits == 64:
        return F.xxhash64(c)
    if bits == 128:
        return F.struct(
            F.xxhash64(c).alias("h1"),
            F.xxhash64(F.concat(c, F.lit("\x01"))).alias("h2"),
        )
    raise ValueError(f"unsupported digest width: {bits}")


def dedup_exact_first_wins(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key: the first under (order_col NULLS LAST,
    remaining columns) — a total order, so ties on order_col and NULL keys
    or NULL order values still yield exactly one survivor per key group
    (the previous min+semi-join formulation dropped all-NULL-order groups
    — NULL never equi-joins — and kept BOTH rows of an order tie).

    Deterministic (unlike dropDuplicates, whose survivor depends on
    partitioning). One shuffle on the keys; at very hot keys prefer a
    min_by(struct(...)) aggregate, which map-side combines.
    """
    # asc_nulls_last on the tiebreaks too: a bare column is ASC NULLS
    # FIRST in Spark but NULLS LAST under a DuckDB window default, so an
    # unpinned nullable tiebreak would pick opposite survivors on an
    # order_col tie (the family-wide pinning rule).
    tiebreak = [
        F.col(c).asc_nulls_last()
        for c in df.columns
        if c not in key_cols and c != order_col
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).asc_nulls_last(), *tiebreak
    )
    return (
        df.withColumn("_fw_rn", F.row_number().over(w))
        .where(F.col("_fw_rn") == 1)
        .drop("_fw_rn")
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash + LSH banding (q_dedup_near)
# ---------------------------------------------------------------------------
def _words(col: Column | str) -> Column:
    # Explicit [ \t\n\x0B\f\r]+ (== Java \s): RE2-based oracles exclude \x0B
    # from \s, so the shorthand would silently diverge between engines.
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"[ \t\n\x0B\f\r]+"), lambda w: w != "")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams as array<string> ('a b c' style shingles) —
    the dedup'd view of positional_shingles (one gram construction)."""
    return F.array_distinct(positional_shingles(col, n))


def positional_shingles(col: Column | str, n: int = 3) -> Column:
    """ALL word n-grams in position order (repeats kept) as array<string> —
    the positional variant of word_shingles for span-coverage operators
    (posexplode gives back the 0-based gram start).

    The word array is BOUND as a lambda variable (transform over a 1-element
    array, then flatten) instead of being referenced from inside the gram
    lambda: higher-order functions re-evaluate captured argument expressions
    on every lambda invocation, so the split+filter tokenization was being
    re-run once per gram — measured 4.3 s → 0.6 s at sf0.1 for the shingle
    stream (optimization guide §1.2 per-task work). Gram text is built with
    element_at + concat_ws (no per-gram array slice allocation); output is
    string-identical to the previous slice + array_join form."""
    ws = _words(col)

    def grams_of(w: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(w, i + F.lit(k)) for k in range(1, n + 1)]
        )
        return F.when(F.size(w) >= n, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )

    return F.flatten(F.transform(F.array(ws), grams_of))


def minhash_signature_vector(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_size: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, _m0 .. _m{k-1}) — ONE wide row per document holding all k
    minhashes (round 12). This is the frame minhash_signatures posexplodes;
    exposing it lets multi-consumer pipelines (banding sides, the pairwise
    agreement estimate) run as cheap PROJECTIONS of one AQE-reused
    exchange instead of each re-running the final min-merge aggregate and
    a posexplode, then re-aggregating rows back together
    (plans/r12/q_dedup_near_executed_before.txt: 4 consumers = 4
    Generate posexplode + collect_list/avg re-aggregations downstream of
    the reused exchange; guide §2.3/§2.4).

    Each of the k hash functions is seeded by hash_id (mixing the id into
    the hashed tuple). The min() aggregate partial-combines map-side, so
    the shuffle volume is k longs per document regardless of doc size.

    ``hasher``: "xxhash64" (default — JVM-native, the production path) or
    "md5" (60-bit integer carved from md5(shingle '\\n' hash_id) — the
    delimiter is a newline because whitespace-split tokens can never
    contain one, so no (shingle, hash_id) pairing can alias another the
    way a ':' could inside URL-like tokens (round-10 advice);
    functions/digests.md5_u60): slower per byte but EXACTLY reproducible
    in DuckDB SQL, which is what upgrades q_dedup_near from rows-only to
    hash-checked (round-9 verdict item 3). Identical plan shape either
    way — only the hash expression changes.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_size)).alias("shingle"),
    )

    # Hash expressions as SQL TEXT (F.expr / selectExpr), not Column
    # chains: 32 md5_u60(concat(...)) Column trees cost hundreds of py4j
    # round-trips per construction (the q_salary_parse rule). '\n' inside
    # a Spark SQL string literal parses to the same newline byte F.lit
    # shipped; values are expression-identical either way.
    def h_sql(i: int) -> str:
        if hasher == "md5":
            return md5_u60_spark_sql(f"concat(shingle, '\\n', '{i}')")
        if hasher == "xxhash64":
            return f"xxhash64(shingle, CAST({i} AS BIGINT))"
        raise ValueError(f"unsupported hasher: {hasher}")

    # k min-aggregates over the shingle stream, one per hash function — NOT
    # a k-way broadcast-join row explosion: joining the k-row hash_id frame
    # multiplied every shingle row k× before the partial aggregation
    # (measured 15 s at sf0.1 for k=32 vs ~3 s for this shape; optimization
    # guide §2.3 "aggregate before you shuffle"). The hash values are
    # unchanged expression-for-expression (hash_id enters as the literal it
    # always was), the per-(id, hash_id) min is the same min, and the
    # shuffle carries k longs per document in ONE row instead of k.
    if hasher == "md5":
        # md5 is ~20× costlier per call than xxhash64 (concat + digest +
        # hex + conv chain), and corpora repeat shingles heavily across
        # documents (sf0.1: 260k (doc, shingle) pairs over 27k distinct
        # shingles — and mass duplication only widens that ratio). Hash
        # each DISTINCT shingle once, then join the k-column hash table
        # back to the (id, shingle) stream for the per-document min —
        # identical value set per document, so identical mins. Costs two
        # exchanges of the (short) shingle strings; saves (pairs/distinct)×
        # of the dominant md5 work. The cheap xxhash64 production path
        # keeps the join-free single-exchange shape below.
        hashed = shingled.select("shingle").distinct().selectExpr(
            "shingle", *[f"{h_sql(i)} AS _m{i}" for i in range(num_hashes)]
        )
        # SHUFFLE_HASH on the hashed side: both sides arrive partitioned by
        # shingle and the (distinct) side builds per-partition hash tables —
        # no sort of either side, no driver-side broadcast collect. Without
        # the hint AQE broadcast-converts this join with BuildLeft (it
        # compares compressed shuffle bytes, and the id+shingle stream
        # compresses below the 32-column hash table), collecting the BIG
        # row-count side to the driver — measured 8.7 s vs 1.2 s here. The
        # hint stays scale-safe: the build side is per-partition distinct
        # shingles, which more partitions always shrink (guide §3.1).
        sums = (
            shingled.join(hashed.hint("shuffle_hash"), "shingle")
            .groupBy("id")
            .agg(*[F.min(f"_m{i}").alias(f"_m{i}") for i in range(num_hashes)])
        )
    else:
        sums = shingled.groupBy("id").agg(
            *[
                F.expr(f"min({h_sql(i)})").alias(f"_m{i}")
                for i in range(num_hashes)
            ]
        )
    return sums


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_size: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, hash_id, minhash) — one row per document per hash function;
    the narrow row view of minhash_signature_vector (see its docstring
    for the hashing/shuffle analysis). The trailing posexplode restores
    the row shape consumers expect — and leaves the frame partitioned by
    id, which keyed aggregations downstream reuse exchange-free."""
    sums = minhash_signature_vector(
        df, id_col, text_col, num_hashes, shingle_size, hasher
    )
    return sums.select(
        "id",
        F.posexplode(F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])).alias(
            "hash_id", "minhash"
        ),
    ).select("id", F.col("hash_id").cast("long").alias("hash_id"), "minhash")


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    hasher: str = "xxhash64",
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a candidate
    pair. Returns (id_a, id_b, n_shared_bands) with id_a < id_b.

    The join key is (band_id, band_hash) — a fine-grained key whose groups
    are tiny for non-duplicate data, so the pair explosion is bounded by the
    true near-duplicate clusters, not by corpus size. ``hasher`` picks the
    band-string hash ("xxhash64" default / "md5" for the SQL-reproducible
    md5_u60, matching minhash_signatures) — equality of the band hash
    stands in for equality of the comma-joined minhash string either way.
    """
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}); a floor split would silently create extra short "
            "bands with far looser matching probability"
        )
    if hasher == "md5":
        band_hash_fn = md5_u60
    elif hasher == "xxhash64":
        band_hash_fn = F.xxhash64
    else:
        raise ValueError(f"unsupported hasher: {hasher}")
    rows_per_band = num_hashes // bands
    banded = (
        signatures.withColumn("band_id", (F.col("hash_id") / rows_per_band).cast("int"))
        .groupBy("id", "band_id")
        .agg(
            band_hash_fn(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("hash_id", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_hash")
        )
    )
    return _band_self_join(banded)


def _band_self_join(banded: DataFrame) -> DataFrame:
    """Shared banding epilogue: self-join (id, band_id, band_hash) on the
    band key, count shared bands per ordered pair."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def lsh_candidate_pairs_vec(
    sums: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    hasher: str = "xxhash64",
) -> DataFrame:
    """LSH banding over the WIDE signature frame (minhash_signature_vector):
    identical output to lsh_candidate_pairs(minhash_signatures(...)) —
    the band string is the same hash_id-ordered comma join of minhash
    values (every hash_id is always present in the wide row, so
    concat_ws over the k columns in order IS the sorted collect_list) —
    but built as a pure PROJECTION + 1-struct-per-band explode instead of
    re-aggregating k posexploded rows back into bands with
    collect_list/array_sort (round 12, guide §2.3/§2.4: each banding
    side becomes a map-side projection of the one AQE-reused signature
    exchange)."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}); a floor split would silently create extra short "
            "bands with far looser matching probability"
        )
    if hasher not in ("md5", "xxhash64"):
        raise ValueError(f"unsupported hasher: {hasher}")
    rows_per_band = num_hashes // bands
    # One F.expr string for the whole band array (the q_salary_parse
    # construction-cost rule: a ~40-node-per-band Column tree costs
    # hundreds of py4j round-trips per construction; the SQL text parses
    # JVM-side in one call). Expression-identical to the Column form:
    # CAST(b AS INT) ≡ F.lit(b).cast("int"), concat_ws of the CAST(...)
    # columns is the hash_id-ordered band string, and the hash twins are
    # xxhash64(e) / the md5_u60 conv chain.
    if hasher == "md5":
        def bh(e: str) -> str:
            return md5_u60_spark_sql(e)
    else:
        def bh(e: str) -> str:
            return f"xxhash64({e})"

    def band_str(band: int) -> str:
        cols = ",".join(
            f"CAST(_m{band * rows_per_band + j} AS STRING)"
            for j in range(rows_per_band)
        )
        return f"concat_ws(',',{cols})"

    band_structs = F.expr(
        "array("
        + ",".join(
            f"named_struct('band_id', CAST({band} AS INT),"
            f" 'band_hash', {bh(band_str(band))})"
            for band in range(bands)
        )
        + ")"
    )
    banded = sums.select("id", F.explode(band_structs).alias("_bb")).selectExpr(
        "id", "_bb.band_id AS band_id", "_bb.band_hash AS band_hash"
    )
    return _band_self_join(banded)


def minhash_similarity_vec(
    sums: DataFrame, pairs: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """Estimated Jaccard for candidate pairs over the WIDE signature frame:
    two single-row joins (id_a, id_b) and a column-wise agreement
    expression — no per-hash row explosion, no (id, hash_id) join, no
    re-aggregation (round 12; the old shape joined 2·k rows per pair and
    averaged them back). Bit-identical to minhash_similarity: agreement
    counts are exact small integers and k is a power-of-two-free exact
    divisor — every sum of 0.0/1.0 terms and the final division are
    exactly representable, so F.avg over rows and this column sum produce
    the same double regardless of order. ``pairs`` must be unique per
    (id_a, id_b) (both producers group by the pair); a pair whose id is
    absent from ``sums`` drops, exactly like the old inner joins."""
    # selectExpr / F.expr strings, not per-column Column chains — the wide
    # renames and the 32-term agreement sum otherwise cost ~0.6 s of py4j
    # construction per query (measured; the q_salary_parse rule).
    a = sums.selectExpr(
        "id AS id_a", *[f"_m{i} AS _a{i}" for i in range(num_hashes)]
    )
    b = sums.selectExpr(
        "id AS id_b", *[f"_m{i} AS _b{i}" for i in range(num_hashes)]
    )
    est = F.expr(
        "("
        + " + ".join(
            f"CAST((_a{i} = _b{i}) AS DOUBLE)" for i in range(num_hashes)
        )
        + f") / CAST({num_hashes} AS DOUBLE)"
    )
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", stable_round(est, 4).alias("est_jaccard"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", public): every node u computes m = min(Γ(u) ∪
    {u}) and re-attaches each STRICTLY LARGER neighbor v > u directly to
    m. Input/output are symmetric-closure-free canonical edge lists
    (big, small); connectivity and the component minimum are preserved.
    """
    sym = edges.select(F.col("big").alias("src"), F.col("small").alias("dst")).unionByName(
        edges.select(F.col("small").alias("src"), F.col("big").alias("dst"))
    )
    m = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    m = m.select("src", F.least(F.col("src"), F.col("mn")).alias("m"))
    return (
        sym.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("big"), F.col("m").alias("small"))
        .where(F.col("big") != F.col("small"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: for each node u over its SMALLER neighbors
    N = {v ∈ Γ(u) : v < u}, let m = min(N); re-attach u and every other
    member of N to m. Operates directly on the (big, small) orientation.
    """
    m = edges.groupBy("big").agg(F.min("small").alias("m"))
    joined = edges.join(m, "big")
    centers = joined.select(F.col("big"), F.col("m").alias("small")).where(
        F.col("big") != F.col("small")
    )
    siblings = joined.where(F.col("small") != F.col("m")).select(
        F.col("small").alias("big"), F.col("m").alias("small")
    )
    return centers.unionByName(siblings).distinct()


def connected_components(
    pairs: DataFrame, max_iters: int = 20, stats: dict | None = None
) -> DataFrame:
    """(id, component) for every id appearing in (id_a, id_b) pairs —
    component = min id reachable through the pair graph.

    Alternating large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond" — the published two-phase
    algorithm): each round contracts the graph toward min-rooted stars and
    converges in O(log n) rounds on ANY diameter — a 100 TB corpus with
    long duplication chains costs log-many shuffles, where the previous
    min-label propagation needed O(diameter) rounds (the round-10 verdict
    watch item). At the fixpoint the edge list IS the component map: every
    surviving edge points a node at its component's minimum id. Each round
    is three shuffles over the EDGE list (one groupBy+join per star phase
    plus the convergence probe); localCheckpoint truncates lineage so the
    plan does not grow exponentially. Convergence is an exact set check
    (count + one-sided anti-join on the canonical orientation), never a
    hash heuristic, and non-convergence still raises loudly rather than
    returning split clusters. ``stats`` (optional dict) receives
    ``{"rounds": n}`` — the number of large+small alternations executed —
    so tests can assert the O(log n) round bound.
    """
    # Canonical (big, small) orientation; self-pairs carry no connectivity
    # but their node must still label itself — the node universe is
    # captured up front and re-joined at the end.
    nodes = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias("big"),
            F.least(F.col("id_a"), F.col("id_b")).alias("small"),
        )
        .where(F.col("big") != F.col("small"))
        .distinct()
        .localCheckpoint()
    )
    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        # Exact fixpoint test: |new| == |old| and new ⊆ old ⇒ new == old
        # (both sides are distinct canonical pairs). One count + one
        # anti-join probe per round — no probabilistic hash shortcut.
        n_new = new_edges.count()
        n_old = edges.count()
        if n_new == n_old:
            extra = new_edges.join(edges, ["big", "small"], "left_anti").limit(1).count()
            if extra == 0:
                edges = new_edges
                converged = True
                break
        edges = new_edges
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # Returning silently here would split components into multiple
        # clusters — dedup would keep phantom "survivors" with no signal
        # anything went wrong. Star rounds converge in ~2·log2(n); a
        # non-convergence at max_iters=20 means a pathological graph —
        # raise max_iters explicitly rather than trust a partial result.
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "iterations; component diameter exceeds the round budget — "
            "raise max_iters"
        )
    # At the star fixpoint every edge is (member, component_min); roots and
    # isolated/self-paired nodes label themselves via the universe join.
    member_labels = edges.select(F.col("big").alias("id"), F.col("small").alias("component"))
    return (
        nodes.join(member_labels, "id", "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
    )


def dedup_corpus(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The end-to-end near-dup dedup: keep ONE row per duplicate cluster
    (the min-id survivor), pass through all rows not in any pair.

    This is what a training-data pipeline actually ships: candidate pairs →
    clusters → survivor selection → filtered corpus, all as joins (the
    survivor set is small relative to the corpus and semi-joins against it).
    """
    comps = connected_components(pairs)
    survivors = comps.groupBy("component").agg(F.min("id").alias(id_col)).select(id_col)
    in_pairs = comps.select(F.col("id").alias(id_col))
    keep_clustered = df.join(survivors, id_col, "left_semi")
    untouched = df.join(in_pairs, id_col, "left_anti")
    return untouched.unionByName(keep_clustered)


def minhash_similarity(signatures: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of agreeing
    minhashes. stable_round, not round (registry rule: thresholds compare
    the rounded value): k/num_hashes is an exact dyadic double, but the
    floor form is the one the SQL twin reproduces verbatim."""
    sig_a = signatures.select(
        F.col("id").alias("id_a"), "hash_id", F.col("minhash").alias("mh_a")
    )
    sig_b = signatures.select(
        F.col("id").alias("id_b"), "hash_id", F.col("minhash").alias("mh_b")
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, ["id_b", "hash_id"])
        .groupBy("id_a", "id_b")
        .agg(
            stable_round(
                F.avg((F.col("mh_a") == F.col("mh_b")).cast("double")), 4
            ).alias("est_jaccard")
        )
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) + banded hamming join
# ---------------------------------------------------------------------------
def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, hasher: str = "xxhash64"
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over whitespace tokens.

    Per token: a 64-bit hash → each bit contributes ±1; the per-doc bit
    sums' signs form the fingerprint. Expressed as a single aggregate over
    an array of 64 bit-contributions (still pure column expressions).

    ``hasher``: "xxhash64" (default, production) or "md5" — the token's 64
    bits come from the first 16 md5 hex nibbles as two 32-bit halves
    (chars 1-8 = bits 63..32, chars 9-16 = bits 31..0), which a DuckDB
    oracle reproduces verbatim (functions/digests rationale; round-9
    verdict item 3 upgraded q_dedup_simhash from rows-only this way).
    Same plan shape either way.
    """
    tokens = df.select(
        F.col(id_col).alias("id"), F.explode(_words(text_col)).alias("token")
    )
    # Python-level loop over the 64 bit positions: shiftright's numBits must
    # be a literal int in the DataFrame API, so the array is built from 64
    # closed-form expressions (still one codegen'd projection).
    if hasher == "md5":
        tokens = tokens.withColumn(
            "th_hi", F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
        ).withColumn(
            "th_lo", F.conv(F.substring(F.md5("token"), 9, 8), 16, 10).cast("long")
        )

        def bit_ind(b: int) -> Column:
            src = F.col("th_lo") if b < 32 else F.col("th_hi")
            return F.shiftright(src, b % 32).bitwiseAND(F.lit(1))

    elif hasher == "xxhash64":
        tokens = tokens.withColumn("th", F.xxhash64("token"))

        def bit_ind(b: int) -> Column:
            return F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1))

    else:
        raise ValueError(f"unsupported hasher: {hasher}")
    # 64 sum-aggregates over the token stream, one per bit position —
    # NOT a 64-wide posexplode into a (id, bit) shuffle: the explode form
    # multiplied every token row 64× before the exchange (measured 30 s at
    # sf0.1 vs ~2 s for this shape; optimization guide §2.3 "aggregate
    # before you shuffle" / §1.2 "fix the distributed algorithm first").
    # The integer math is unchanged row-for-row: per (id, bit) the ±1
    # contributions sum map-side into one long buffer, and the shuffle
    # carries 64 longs per document instead of 64 rows per token.
    sums = tokens.groupBy("id").agg(
        *[
            F.sum(F.when(bit_ind(b) == 1, 1).otherwise(-1)).alias(f"_s{b}")
            for b in range(64)
        ]
    )
    # bit 63's weight is written as the explicit two's-complement literal:
    # Spark's shiftleft(1L, 63) silently wraps to Long.MIN, but a DuckDB
    # twin ERRORS on 1::BIGINT << 63 (checked overflow) — the literal is
    # the one rendering both dialects share. Each selected weight is a
    # distinct power of two, so the row-level long addition sets bits and
    # can never overflow — identical to the old F.sum over 64 rows.
    def _weight(b: int) -> int:
        return -9223372036854775808 if b == 63 else (1 << b)

    simhash = reduce(
        operator.add,
        [
            F.when(F.col(f"_s{b}") > 0, F.lit(_weight(b)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(64)
        ],
    )
    return sums.select("id", simhash.alias("simhash"))


def simhash_near_pairs(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by hamming distance ≤ max_hamming.

    Banding on four 16-bit chunks: any pair within hamming 3 shares at least
    one exact chunk (pigeonhole), so candidates come from 4 equi-joins, not a
    cross product. bit_count(a XOR b) verifies exactly.
    """
    chunks = fingerprints.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_id"),
                    F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("id", "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# Exact token-set Jaccard via inverted-index join (q_dedup_jaccard)
# ---------------------------------------------------------------------------
def token_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, max_df: int | None = None
) -> DataFrame:
    """All-pairs exact Jaccard over word sets, via the inverted index:
    join docs on shared token, count intersections, derive the union from
    per-doc set sizes. Shuffles on token — proportional to the index size,
    not |docs|² (pairs sharing no token never meet).

    ``max_df`` is the scale guard: a token appearing in n documents emits
    n(n-1)/2 candidate rows, so one stop-word-grade token makes the join
    quadratic in corpus size. The cutoff is prefix-filter-style
    candidate-verify: tokens with document frequency > max_df are excluded
    from CANDIDATE GENERATION, then each surviving candidate pair's
    intersection is re-counted against the FULL token sets — so reported
    Jaccard values are exact. What's lost is only pairs whose entire overlap
    is ultra-common tokens, which cannot be high-Jaccard pairs unless their
    sets are tiny. None = no cutoff (exact all-pairs semantics)."""
    # .distinct() mirrors the oracle's SELECT DISTINCT (id, token): a
    # DUPLICATED document row (the pk fuzz variant; a regenerated table
    # could carry one) would otherwise double its set_size and
    # intersection counts engine-side only. array_distinct dedups within
    # a row; this dedups across rows of the same id.
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_words(text_col))).alias("token"),
    ).distinct()
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    if max_df is None:
        a = toks.alias("a")
        b = toks.alias("b")
        inter = (
            a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        # toks is one row per (doc, distinct token), so count(*) per token is
        # its document frequency. Anti-join drops the hot tokens before the
        # quadratic step. Unhinted: |hot| is usually tiny (Zipf tail) and AQE
        # broadcasts it, but it's corpus-dependent (≤ index/max_df), so a
        # forced broadcast could OOM; the anti-join shares the token-keyed
        # partitioning the candidate join needs anyway.
        hot = (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("token")
        )
        rare = toks.join(hot, "token", "left_anti")
        a = rare.alias("a")
        b = rare.alias("b")
        cand = (
            a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        # Verify: exact intersection count over the full (uncut) index,
        # restricted to candidate pairs — two id-keyed equi-joins, each
        # |cand| × avg-set-size, never quadratic in the corpus.
        ta = toks.alias("ta")
        tb = toks.alias("tb")
        inter = (
            cand.join(ta, F.col("ta.id") == F.col("id_a"))
            .join(
                tb,
                (F.col("tb.id") == F.col("id_b"))
                & (F.col("tb.token") == F.col("ta.token")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    return inter.join(sa, "id_a").join(sb, "id_b").select(
        "id_a",
        "id_b",
        # stable_round, not F.round: downstream thresholds compare the
        # ROUNDED value, and integer ratios can land on exact 4dp midpoints
        # where Spark's HALF_UP and DuckDB's half-even round() split —
        # flipping pair MEMBERSHIP, not just a display cell (round-7
        # review; functions/rounding.py documents the class).
        stable_round(
            F.col("n_inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_inter")).cast("double"),
            4,
        ).alias("jaccard"),
    )
