"""Deduplication operators for training-data pipelines (extension
surface, SURVEY.md §7.5 — no reference counterpart; the reference's only
dedup is pandas drop_duplicates, ref ``ET_combined.py:118-132``).

Scale design — the non-negotiable at 100 TB is that NOTHING here is
O(n²) over documents:

* exact dedup: hash-groupBy — one shuffle on the content hash.
* MinHash-LSH: signatures are row-local (array exprs, no explode, no
  shuffle); candidates come from a bucket self-join on (band, band_hash)
  — cost O(Σ bucket²) which LSH keeps tiny, never all-pairs.
* SimHash: one explode + one wide aggregation — one shuffle.
* n-gram Jaccard: computed only ON candidate pairs, row-local
  array_intersect after the pair join.

Cross-engine determinism: every hash is md5 (lower-hex in Spark, DuckDB,
Postgres alike); min-hash minimizes the HEX STRING lexicographically, so
no engine-specific 64-bit hash is ever involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.caching import pin
from data_warehousing_assignment_spark.operators.text import tokens, word_shingles


def scale_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up when the scan produced fewer partitions than cores.

    Hash/HOF-heavy row-local stages (minhash, simhash, hyperplane
    projections) are CPU-bound: a single small parquet file would otherwise
    pin the whole stage to one task (minhash at sf0.1: 0.6 s widened vs
    35 s single-task). On a real cluster the input split count usually
    suffices; this only widens, never narrows.

    The width probe is ``df.rdd.getNumPartitions()`` — the ACTUAL scan
    width after Spark's file splitting/packing. It plans partitions on
    the driver but runs no job. The round-3 ``inputFiles()`` count probe
    was wrong on both ends: a source Spark already split wide still
    counts 1 file (spurious full shuffle of the bodies), and non-file
    sources return [] (always repartitioned). Reserve this wrapper for
    genuinely CPU-bound stages — a shuffle-bound op like
    :func:`exact_dedup` loses more to the extra body shuffle than the
    map parallelism returns (benchmarked 0.83 s vs 0.18 s at sf0.1)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        width = df.rdd.getNumPartitions()
    except Exception:  # unplannable source — widen defensively
        width = 0
    if width < target:
        return df.repartition(target)
    return df


def duplicate_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """op-dup-capture building block: the (cols...) combos occurring more
    than once, with their multiplicity (ref ``ET_combined.py:118-132``
    pandas df[df.duplicated()], as one hash aggregation)."""
    cols = cols or df.columns
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str, normalize: bool = True
) -> DataFrame:
    """Exact dedup by content hash, keeping the lowest id per hash group
    (deterministic survivor rule). One shuffle on the 32-byte hash, never
    on the document body — at 100 TB the shuffle carries ~40 bytes/row.
    """
    c = F.col(content_col)
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    hashed = df.select(F.col(id_col), F.md5(c).alias("content_hash"))
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def _seeded_md5(seed: int):
    # NB: must be a unary lambda — a two-arg lambda would be taken as
    # F.transform's (element, index) form and the index would clobber
    # the seed.
    return lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))


def minhash_from_shingles(sh: Column, k: int = 12) -> Column:
    """k-permutation MinHash over an already-computed shingle array: for
    each seed i, the lexicographic-min md5('<i>:'||shingle). Row-local
    (transform + array_min) — zero shuffles."""
    return F.array(*[F.array_min(F.transform(sh, _seeded_md5(i))) for i in range(k)])


def minhash_signature(text_col: Column | str, k: int = 12, n: int = 3) -> Column:
    """Column-level MinHash signature. Prefer :func:`minhash_signatures`
    (the DataFrame form) in plans: it projects the shingle array ONCE
    before fanning out to k seeds — inlined here, the optimizer cannot
    share the shingle subtree across the k array elements and the
    tokenize+shingle work runs k times per row."""
    return minhash_from_shingles(word_shingles(tokens(text_col), n), k)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 12, n: int = 3
) -> DataFrame:
    """(id, sig) MinHash signatures, the scale path: widen partitions for
    the CPU-bound hash stage, project shingles once (a separate Project
    node — CollapseProject keeps non-cheap exprs used k times
    unmerged), then fan out to the k seeded mins."""
    docs = scale_out(df.select(id_col, text_col))
    return docs.withColumn("_sh", word_shingles(tokens(text_col), n)).select(
        id_col, minhash_from_shingles(F.col("_sh"), k).alias("sig")
    )


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Banded LSH keys: array of (band_idx, md5(sig slice)) structs.
    Two docs sharing ANY band hash are candidate near-dups.

    band_hash is the 16-byte ``unhex`` packing of the md5 hex digest
    (r14, guide §2.3 shuffle fewer bytes): the key is internal to the
    bucket self-joins — never an output column — and unhex is bijective
    on md5 output, so every join/group matches exactly the same pairs
    while the keyed frames shuffle and compare half the key bytes."""
    out = []
    for b in range(bands):
        parts = [F.element_at(sig, b * rows_per_band + j + 1) for j in range(rows_per_band)]
        out.append(
            F.struct(
                F.lit(b).alias("band"),
                F.unhex(F.md5(F.concat_ws("|", *parts))).alias("band_hash"),
            )
        )
    return F.array(*out)


def shingle_frame(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Pinned ``(id_col, _sh)`` raw (multiset) word-shingle frame — the
    shared tokenize+shingle pass for pipelines that consume shingles
    more than once (r14: MinHash signatures for candidate generation
    AND the n-gram Jaccard verify both derive from this one frame in
    :func:`near_dup_clusters`, where the shingle build was measured as
    the dominant map-side cost — built twice before, once now).
    Scope-owned persist (caching.pin)."""
    return pin(
        scale_out(df.select(id_col, text_col)).select(
            F.col(id_col), word_shingles(tokens(text_col), n).alias("_sh")
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH: explode the band
    keys and self-join on (band, band_hash) with id< id to orient pairs.

    The join is a plain equi-join on the band key → shuffled hash join
    partitioned by bucket; work is Σ|bucket|², never |docs|². Returned
    pairs are distinct across bands.

    The band-key frame is persisted before the self-join: the two join
    sides carry different projections, so exchange reuse can't kick in
    and each side would otherwise recompute every signature. Band keys
    are ~(bands × 36) bytes/doc — at 100 TB of text that's a few hundred
    GB cluster-wide, MEMORY_AND_DISK-safe. The persist is scope-owned
    (caching.pin): run inside ``cache_scope()`` to release it once the
    pairs are materialized.

    r14 MEASURED NEGATIVE, reverted: the first-agreeing-band dedup that
    replaced simhash_neardup_pairs' candidate DISTINCT does NOT carry
    over here — each side's dedup state is the bands-element md5 array
    (~64 B vs simhash's 16-byte fingerprint), and dragging two of those
    through the ~100 M-row band join at the 100× synthesis spilled the
    probe stage into a >20 min stall where the DISTINCT shape finishes
    in ~5 s. The DISTINCT exchange carries two int64s per row — the
    cheaper side of that trade at every tested SF.

    ``shingles``: optional prebuilt :func:`shingle_frame` — signatures
    are then derived from it instead of re-tokenizing ``df`` (the same
    seeded-md5 mins over the same arrays → identical signatures)."""
    r = k // bands
    if shingles is not None:
        sigs = shingles.select(
            id_col, minhash_from_shingles(F.col("_sh"), k).alias("sig")
        )
    else:
        sigs = minhash_signatures(df, id_col, text_col, k, n)
    keyed = pin(
        sigs.select(
            F.col(id_col).alias("doc_a"),
            F.explode(minhash_bands(F.col("sig"), bands, r)).alias("bk"),
        ).select("doc_a", "bk.band", "bk.band_hash")
    )
    left = keyed
    right = keyed.withColumnRenamed("doc_a", "doc_b")
    return (
        left.join(right, on=["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.0,
    size_prefilter: bool = False,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs: join each
    side's (deduplicated) shingle array onto the pair, then row-local
    array_intersect / union sizes — integer counts, one IEEE division.

    Verification stage of the dedup pipeline: cost O(|candidates|), and
    candidates come from LSH, so the full pipeline never goes quadratic.

    ``size_prefilter`` (r10 verdict #4) inserts a PROVABLY no-loss
    length-ratio gate before the array join: J(A,B) = |A∩B|/|A∪B| ≤
    min(|A|,|B|)/max(|A|,|B|) (numerator ≤ the smaller set, denominator
    ≥ the larger), so any pair with min/max < threshold cannot reach it
    and may skip the full intersect. The gate joins ONLY int sizes onto
    the candidate frame (8 bytes/side vs the full shingle arrays), then
    the arrays join on survivors. The 1e-9 epsilon matches the PPJoin
    prefix guard: IEEE drift in threshold·max can only ADMIT a boundary
    pair (re-checked exactly by the verify), never drop one.

    MEASURED NEGATIVE at the synthesized sf10 (BASELINE.md, r11): the
    LSH candidates are 99.93 % true edges at θ=0.5 (27.05 M cands →
    27.03 M verified edges — mutated-copy corpora give LSH very high
    precision), so the gate can prune at most 0.07 % of pairs while
    adding two extra joins over the 27 M-pair frame. Default stays OFF;
    the option exists for corpora where LSH precision is genuinely low
    (short docs, tiny band counts)."""
    if shingles is not None:
        # prebuilt raw-shingle frame (see shingle_frame): dedup to the
        # SET row-locally — array_distinct over the identical array the
        # inline path would have built, so _sh is value-identical.
        sh = shingles.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(F.col("_sh")).alias("_sh"),
        )
    else:
        sh = pin(  # joined twice (a- and b-side) — don't shingle twice
            scale_out(df.select(id_col, text_col)).select(
                F.col(id_col).alias("_id"),
                F.array_distinct(word_shingles(tokens(text_col), n)).alias("_sh"),
            )
        )
    if size_prefilter and threshold > 0:
        sz = sh.select("_id", F.size("_sh").alias("_n"))
        candidates = (
            candidates.join(
                sz.select(F.col("_id").alias("doc_a"), F.col("_n").alias("_na")),
                "doc_a",
            )
            .join(
                sz.select(F.col("_id").alias("doc_b"), F.col("_n").alias("_nb")),
                "doc_b",
            )
            .filter(
                F.least("_na", "_nb").cast("double")
                >= F.lit(threshold) * F.greatest("_na", "_nb").cast("double")
                - F.lit(1e-9)
            )
            .select("doc_a", "doc_b")
        )
    a = sh.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(a, on="doc_a")
        .join(b, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 48  # keep the fingerprint positive in an int64 across engines


def _hex_nibble(h: Column, pos: int) -> Column:
    """Value 0-15 of hex digit `pos` (0-based) of md5 hex string `h` —
    via strpos on the hex alphabet (portable to DuckDB, no conv()).

    The ORACLE-side formulation (and the engine-side reference the
    packed-chunk fast path below is tested against): per bit it costs a
    substring + strpos per ROW, which at 48-128 bits per token
    dominated the simhash map side (r14 optimization round)."""
    ch = F.substring(h, pos + 1, 1)
    return F.instr(F.lit("0123456789abcdef"), ch) - F.lit(1)


def _packed_hex_chunks(h: Column, n_nibbles: int) -> list[Column]:
    """The first ``n_nibbles`` hex digits of ``h`` parsed into int64
    chunks of ≤12 nibbles (48 bits — conv() of 12 hex chars fits int64
    exactly). Chunk c covers digit positions [12c, 12c+L); digit p of
    chunk c sits at bit 4·(L−1−(p−12c)) (most-significant-first), so

        nibble(p) bit b  ==  (chunk[p div 12] >> shift) & 1

    with ``shift = _packed_bit_shift(p, b, n_nibbles)``. Value-identical
    to :func:`_hex_nibble` per bit (pinned in tests/test_dedup.py), at
    one string parse per 12 nibbles instead of one per BIT."""
    return [
        F.conv(F.substring(h, c0 + 1, min(12, n_nibbles - c0)), 16, 10)
        .cast("bigint")
        .alias(f"_p{c0 // 12}")
        for c0 in range(0, n_nibbles, 12)
    ]


def _packed_bit_shift(pos: int, bit: int, n_nibbles: int) -> int:
    """Bit offset of ``_hex_nibble(h, pos) & (1 << bit)`` inside its
    :func:`_packed_hex_chunks` chunk."""
    c0 = 12 * (pos // 12)
    chunk_len = min(12, n_nibbles - c0)
    return 4 * (c0 + chunk_len - 1 - pos) + bit


def _packed_votes(bits: int) -> list[Column]:
    """±1 SimHash vote per md5 bit j (nibble j//4, bit j%4), reading the
    pre-projected ``_p{c}`` chunk columns of :func:`_packed_hex_chunks`
    — integer shift+mask per bit on the aggregation map side."""
    n_nib = bits // 4
    out = []
    for j in range(bits):
        pos = j // 4
        shift = _packed_bit_shift(pos, j % 4, n_nib)
        out.append(
            F.when(
                F.shiftright(F.col(f"_p{pos // 12}"), shift)
                .bitwiseAND(F.lit(1)) > 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
        )
    return out


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash fingerprint: per token, md5 supplies `bits` pseudo-random
    bits; each bit votes ±1; the sign of the per-document vote sum forms
    the fingerprint. Near-identical docs differ in few bits (Hamming).

    Plan shape: one explode(tokens) + one wide groupBy aggregation (bits
    SUM columns, map-side combined) — a single shuffle keyed by doc id;
    then the fingerprint assembles row-locally. At 100 TB this is the
    same cost as any per-doc token aggregate."""
    tok = scale_out(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).withColumn("_h", F.md5("_tok"))
    # Parse the needed md5 digits ONCE per token into int64 chunks (a
    # dedicated Project so each conv() runs once per row), then each
    # per-bit vote is a shift+mask — value-identical to the original
    # per-bit _hex_nibble extraction (pinned in tests/test_dedup.py)
    # at 1/`bits` the map-side string work (guide §1.2 per-task work).
    packed = tok.select(
        F.col(id_col), *_packed_hex_chunks(F.col("_h"), bits // 4)
    )
    votes = [
        F.sum(v).alias(f"_v{j}")
        for j, v in enumerate(_packed_votes(bits))
    ]
    agg = packed.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"_v{j}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ) * F.lit(1 << j).cast("bigint")
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.alias("simhash"))


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-duplicate CLUSTERING pipeline, production shape:

    1. EXACT-dedup collapse — identical (normalized) texts map to one
       representative (min id per content hash). In a web-scale corpus
       exact copies outnumber near-dups by orders of magnitude; doing
       this first shrinks every later stage. LSH bucket self-join cost
       is Σ|bucket|², so collapsing a d-copy document cuts its bucket
       term d² → 1 (benchmarked 10× fewer edges / ~3× faster at the
       10× bench probe, where every doc has 10 exact copies).
    2. MinHash-LSH candidates + n-gram Jaccard verification on the
       REPRESENTATIVES only.
    3. Connected components (operators/graph.py) on the rep graph.
    4. Labels broadcast back through the rep mapping to every row.

    The result is IDENTICAL to running LSH+CC on the raw corpus: exact
    copies share signatures, so the raw graph is the rep graph with
    each node blown up into a clique, and quotienting by the exact
    groups preserves both connectivity and the min-id component label
    (each rep is already the min id of its exact group). Returns
    ``(id_col, cluster_id)``."""
    from data_warehousing_assignment_spark.operators.graph import (
        connected_components,
    )

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    hashed = df.select(F.col(id_col), F.md5(norm).alias("_h"))
    rep_of_hash = hashed.groupBy("_h").agg(F.min(id_col).alias("_rep"))
    # id → representative; joined twice (rep filter + final label fan-out)
    mapping = pin(hashed.join(rep_of_hash, "_h").select(id_col, "_rep"))

    rep_rows = df.join(
        mapping.filter(F.col(id_col) == F.col("_rep")).select(id_col),
        id_col,
    )
    # ONE tokenize+shingle pass feeds both candidate generation and the
    # Jaccard verify (r14; measured as the dominant map-side cost of
    # this pipeline — it ran twice before). Arrays identical, so both
    # consumers see exactly the values they built inline before.
    shf = shingle_frame(rep_rows, id_col, text_col, n=3)
    cands = minhash_lsh_candidates(
        rep_rows, id_col, text_col, k, bands, shingles=shf
    )
    edges = ngram_jaccard_pairs(
        rep_rows, cands, id_col, text_col, threshold=threshold, shingles=shf
    ).select("doc_a", "doc_b")
    comp = connected_components(
        rep_rows.select(id_col), edges, id_col=id_col,
        src_col="doc_a", dst_col="doc_b",
    )
    return mapping.join(
        comp.withColumnRenamed(id_col, "_rep"), "_rep"
    ).select(id_col, F.col("component").alias("cluster_id"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = SIMHASH_BITS,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """All document pairs whose SimHash fingerprints differ in at most
    ``max_hamming`` bits — EXACTLY, but without an all-pairs join.

    Banding argument (pigeonhole): split the ``bits``-bit fingerprint
    into ``bands`` contiguous bands. Two fingerprints within Hamming
    distance d < bands must agree on at least one whole band (d flipped
    bits can touch at most d bands), so a hash self-join on
    (band_index, band_value) has recall 1.0 for d <= bands-1; the
    residual ``bit_count(xor) <= d`` filter restores precision. Cost is
    O(Σ band-bucket²) — duplicate-density-bounded like MinHash-LSH,
    never O(n²) over the corpus.

    First-agreeing-band dedup (r14, guide §2.4 remove shuffles
    outright): the band self-join finds a qualifying pair once per
    AGREEING band; the old shape collapsed those duplicates with a
    DISTINCT exchange over the full candidate volume and then re-joined
    the fingerprint table TWICE to score. The keyed frame now carries
    the fingerprint (8-16 extra bytes over a doc×bands-row frame), so
    each candidate row can (a) keep itself only when its band is the
    pair's FIRST agreeing band — exactly one surviving row per
    qualifying pair, the same set DISTINCT produced — and (b) score the
    Hamming distance inline. Zero exchanges between the band join and
    the output.

    Returns ``(doc_a, doc_b, hamming)`` with doc_a < doc_b."""
    if max_hamming >= bands:
        raise ValueError(
            f"exact recall needs max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    if bits % bands:
        raise ValueError(f"bands must divide bits ({bits} % {bands})")
    width = bits // bands
    fp = pin(simhash(df, id_col, text_col, bits))

    def _bv(side: str, b: int) -> Column:
        return F.shiftright(F.col(f"{side}.simhash"), b * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )

    band_vals = F.array(*[
        F.shiftright(F.col("simhash"), b * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        for b in range(bands)
    ])
    keyed = fp.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(band_vals).alias("_band", "_val"),
    )
    first_band = F.when(_bv("x", 0) == _bv("y", 0), F.lit(0))
    for b in range(1, bands - 1):
        first_band = first_band.when(_bv("x", b) == _bv("y", b), F.lit(b))
    first_band = first_band.otherwise(F.lit(bands - 1))
    ham = F.bit_count(
        F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
    ).cast("bigint")
    return (
        keyed.alias("x")
        .join(
            keyed.alias("y"),
            (F.col("x._band") == F.col("y._band"))
            & (F.col("x._val") == F.col("y._val"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .filter(F.col("x._band") == first_band)
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def _sign_bit_votes(agg, lo_j: int) -> Column:
    """Assemble one signed-int64 half of a wide SimHash from 64 vote
    columns ``_v{lo_j}.._v{lo_j+63}``: bits 0-62 add their power of two;
    bit 63 adds −2⁶³ (two's complement — +2⁶³ doesn't exist in int64).
    Both engines share the representation, so xor/bit_count agree."""
    half = None
    for k in range(63):
        bit = F.when(
            F.col(f"_v{lo_j + k}") > 0, F.lit(1 << k).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        half = bit if half is None else half + bit
    sign = F.when(
        F.col(f"_v{lo_j + 63}") > 0,
        F.lit(-9223372036854775808).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return half + sign


def simhash128(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """128-bit SimHash as two signed int64 halves (``lo``, ``hi``) —
    md5 supplies all 32 nibbles, so this is :func:`simhash` with the
    full hash instead of its first 48 bits. Same plan shape: one
    explode + one wide (128-column) map-side-combined aggregation,
    a single shuffle keyed by doc id."""
    tok = scale_out(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).withColumn("_h", F.md5("_tok"))
    # chunked md5 parse + shift/mask votes — see simhash() (the 128-bit
    # variant reads all 32 nibbles as three ≤12-digit chunks).
    packed = tok.select(
        F.col(id_col), *_packed_hex_chunks(F.col("_h"), 32)
    )
    votes = [
        F.sum(v).alias(f"_v{j}")
        for j, v in enumerate(_packed_votes(128))
    ]
    agg = packed.groupBy(id_col).agg(*votes)
    return agg.select(
        F.col(id_col),
        _sign_bit_votes(agg, 0).alias("lo"),
        _sign_bit_votes(agg, 64).alias("hi"),
    )


def simhash_neardup_pairs_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SCALE twin of :func:`simhash_neardup_pairs`: same banded
    pigeonhole (4 bands, d ≤ 3 flips leave ≥ 1 band clean) over a
    128-bit fingerprint, so each band key is 32 bits — 2³² buckets
    instead of the 48-bit version's 2¹². Band-join cost is
    Σ_bucket |bucket|² with buckets ≈ min(n, 2³²): the 12-bit bands
    saturate at a few thousand buckets and go O(n²/4096) — measured
    r11 at the 100× synthesis (500k docs → ~250M candidates, 58 GB of
    shuffle spill, disk-full); 32-bit bands keep collisions
    content-driven (true near-dups plus 2⁻³²-rate noise) at any
    realistic corpus size. Hamming is over the full 128 bits
    (bit_count of both xor'd halves), so this is a DIFFERENT (finer)
    fingerprint than the 48-bit op — the 48-bit op stays the pinned
    small-scale anchor; this is the 100 TB operating point.

    First-agreeing-band dedup + inline verify, exactly like
    :func:`simhash_neardup_pairs` (r14): the keyed frame carries both
    fingerprint halves, each qualifying pair survives only at its FIRST
    agreeing band (≡ the former DISTINCT of all agreeing bands), and
    the 128-bit Hamming distance scores inline — no candidate DISTINCT
    exchange, no fingerprint re-joins. At the 100× synthesis the former
    shape pushed ~4× the distinct pair volume through an exchange and
    then shuffled the pair frame twice more for scoring.

    Returns ``(doc_a, doc_b, hamming)`` with doc_a < doc_b."""
    fp = pin(simhash128(df, id_col, text_col))
    band_vals = F.array(
        F.col("lo").bitwiseAND(F.lit(4294967295).cast("bigint")),
        F.shiftright(F.col("lo"), 32)
        .bitwiseAND(F.lit(4294967295).cast("bigint")),
        F.col("hi").bitwiseAND(F.lit(4294967295).cast("bigint")),
        F.shiftright(F.col("hi"), 32)
        .bitwiseAND(F.lit(4294967295).cast("bigint")),
    )
    keyed = fp.select(
        F.col(id_col), F.col("lo"), F.col("hi"),
        F.posexplode(band_vals).alias("_band", "_val"),
    )

    def _bv(side: str, b: int) -> Column:
        src = F.col(f"{side}.lo") if b < 2 else F.col(f"{side}.hi")
        return F.shiftright(src, 32 * (b % 2)).bitwiseAND(
            F.lit(4294967295).cast("bigint")
        )

    first_band = F.when(_bv("x", 0) == _bv("y", 0), F.lit(0))
    for b in (1, 2):
        first_band = first_band.when(_bv("x", b) == _bv("y", b), F.lit(b))
    first_band = first_band.otherwise(F.lit(3))
    ham = (
        F.bit_count(F.col("x.lo").bitwiseXOR(F.col("y.lo")))
        + F.bit_count(F.col("x.hi").bitwiseXOR(F.col("y.hi")))
    ).cast("bigint")
    return (
        keyed.alias("x")
        .join(
            keyed.alias("y"),
            (F.col("x._band") == F.col("y._band"))
            & (F.col("x._val") == F.col("y._val"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .filter(F.col("x._band") == first_band)
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def set_similarity_join_prefix(
    docs: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
) -> DataFrame:
    """EXACT set-similarity self-join (Jaccard ≥ threshold) with
    PPJoin-style prefix filtering — the exact counterpart to the
    MinHash-LSH approximate path.

    Tokens get a global rarity rank (document frequency ascending, then
    token — vocab-sized frame, broadcast); each set is re-sorted
    rarest-first and only its PREFIX of length |s| − ⌈t·|s|⌉ + 1 is
    exploded into the candidate join: two sets with Jaccard ≥ t must
    share at least one prefix token under any common global order (the
    pigeonhole behind prefix filtering), so candidates are complete.
    The equi-join runs on the prefix token — O(Σ per-token prefix²),
    concentrated on RARE tokens by construction (rarest-first ordering
    makes hot frequent tokens fall outside prefixes) — then the exact
    Jaccard verifies on the full sets. Output: id_a, id_b, jaccard.
    """
    d = docs.select(
        F.col(id_col).alias("_id"), F.col(set_col).alias("_s")
    ).withColumn("_sz", F.size("_s"))
    toks = d.select("_id", F.explode("_s").alias("_tok"))
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    # the global order only needs to be CONSISTENT: sort by (df, token)
    # directly — no dense rank, so no global-window pass over the vocab
    ranked = toks.join(F.broadcast(vocab), "_tok")
    sorted_sets = ranked.groupBy("_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_df", "_tok"))),
            lambda kv: kv["_tok"],
        ).alias("_sorted")
    )
    # prefix length = sz - ceil(t*sz) + 1  (0-based: pos < that).
    # The epsilon guards IEEE drift: products like 0.55*100 evaluate to
    # 55.000000000000007, whose bare ceil (56) would shorten the prefix by
    # one token and silently drop pairs sitting exactly AT the threshold.
    # Under-ceiling by < 1e-9 can only LENGTHEN a prefix (more candidates,
    # never fewer), so completeness is preserved for every threshold.
    pre = sorted_sets.select(
        "_id",
        F.size("_sorted").alias("_sz"),
        F.posexplode("_sorted").alias("_pos", "_tok"),
    ).filter(
        F.col("_pos")
        < F.col("_sz")
        - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9))
        + 1
    )
    a = pre.select(F.col("_id").alias("_ida"), "_tok")
    b = pre.select(F.col("_id").alias("_idb"), "_tok")
    cand = (
        a.join(b, "_tok")
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    sa = d.select(F.col("_id").alias("_ida"), F.col("_s").alias("_sa"),
                  F.col("_sz").alias("_sza"))
    sb = d.select(F.col("_id").alias("_idb"), F.col("_s").alias("_sb"),
                  F.col("_sz").alias("_szb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac = inter.cast("double") / (
        F.col("_sza") + F.col("_szb") - inter
    ).cast("double")
    # The verify join carries BOTH full token arrays per pair — at the
    # 100× synthesis that is ~100 GB through what would otherwise be a
    # 32-wide shuffle (3 GB+/task → Java heap OOM, measured r11 via
    # op-ext-lsh-eval; AQE cannot split uniform-large partitions).
    # Pre-partition each join input ON ITS JOIN KEY to a width that
    # bounds per-task array volume: Catalyst reuses the matching hash
    # partitioning, so the joins run at `nv` without an extra exchange;
    # AQE coalesces the near-empty tasks away at small sf. 64× the
    # shuffle width (not 16×): the r11 sf10 re-run showed 512 tasks
    # still hold ~200 MB of pair+array rows each — × the 32 concurrent
    # task slots that is 6.4 GB of simultaneously-live join rows, over
    # the 8 g local heap; 2048 tasks put ~50 MB in flight per slot, and
    # on a real cluster the same math bounds per-executor pressure.
    nv = min(
        4096,
        64 * int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        ),
    )
    return (
        cand.repartition(nv, "_ida")
        .join(sa.repartition(nv, "_ida"), "_ida")
        .repartition(nv, "_idb")
        .join(sb.repartition(nv, "_idb"), "_idb")
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_join(
    docs: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
) -> DataFrame:
    """EXACT directed containment self-join: pairs (a, b), a ≠ b, with
    C(a→b) = |a ∩ b| / |a| ≥ threshold — the subset-duplicate detector
    (a quote or article fully wrapped in another document) that the
    symmetric Jaccard joins structurally miss: containment of a small
    set in a huge one has near-zero Jaccard.

    Asymmetric prefix filter: tokens get the same rarity-first global
    order as :func:`set_similarity_join_prefix`; a qualifying pair must
    share a token from A's prefix of length |a| − ⌈t·|a|⌉ + 1 (the
    pigeonhole over the CONTAINED side only), but — unlike the Jaccard
    case — B contributes its FULL token set, because containment puts no
    lower bound on B's overlap fraction. Candidate volume is
    Σ_token prefix_count(tok)·df(tok), concentrated on rare tokens by
    the rarity-first ordering (hot tokens fall outside prefixes).
    Exact verification on the full sets; one final IEEE division.
    Empty sets are excluded (containment undefined). Output:
    id_a (contained), id_b (container), containment.
    """
    d = docs.select(
        F.col(id_col).alias("_id"), F.col(set_col).alias("_s")
    ).withColumn("_sz", F.size("_s"))
    toks = d.select("_id", F.explode("_s").alias("_tok"))
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    ranked = toks.join(F.broadcast(vocab), "_tok")
    sorted_sets = ranked.groupBy("_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_df", "_tok"))),
            lambda kv: kv["_tok"],
        ).alias("_sorted")
    )
    # same epsilon guard as set_similarity_join_prefix (IEEE ceil drift)
    pre = sorted_sets.select(
        "_id",
        F.size("_sorted").alias("_sz"),
        F.posexplode("_sorted").alias("_pos", "_tok"),
    ).filter(
        F.col("_pos")
        < F.col("_sz")
        - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9))
        + 1
    )
    a = pre.select(F.col("_id").alias("_ida"), "_tok")
    b = toks.select(F.col("_id").alias("_idb"), "_tok")
    cand = (
        a.join(b, "_tok")
        .filter(F.col("_ida") != F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    sa = d.select(F.col("_id").alias("_ida"), F.col("_s").alias("_sa"),
                  F.col("_sz").alias("_sza"))
    sb = d.select(F.col("_id").alias("_idb"), F.col("_s").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    cont = inter.cast("double") / F.col("_sza").cast("double")
    return (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .filter(F.col("_sza") > 0)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def minhash_lsh_incremental_candidates(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Incremental banded-LSH candidates: only the NEW batch computes
    signatures; its band keys probe the existing corpus's band index
    plus themselves. Work is O(Δ) signature hashing + a bucket join
    carrying Δ band keys — never a recompute or re-pair of the settled
    corpus, which is the whole point of incremental dedup at 100 TB
    (the exact-hash twin is exact_dedup_incremental). In production
    ``old_df``'s band keys are READ from the stored index (the same
    (doc, band, band_hash) layout save_ivf_index uses for cells);
    here they're derived so the operator is self-contained.

    Invariant (the registry oracle states it directly): the output is
    exactly the FULL-corpus candidate set restricted to pairs touching
    the new batch — bucket joins on identical keys make incremental ≡
    full∖(old×old) by construction. Returns (doc_a, doc_b, pair_type ∈
    {'cross', 'new-new'}) with doc_a < doc_b. Id overlap between the
    frames (a batch re-ingesting a settled doc) is tolerated: the cross
    branch drops self-collisions, so the contract holds either way."""
    r = k // bands

    def keyed(df: DataFrame, alias: str) -> DataFrame:
        sigs = minhash_signatures(df, id_col, text_col, k, n)
        return pin(
            sigs.select(
                F.col(id_col).alias(alias),
                F.explode(minhash_bands(F.col("sig"), bands, r)).alias("bk"),
            ).select(alias, "bk.band", "bk.band_hash")
        )

    old_keyed = keyed(old_df, "_old")
    new_keyed = keyed(new_df, "_new")
    cross = (
        new_keyed.join(old_keyed, on=["band", "band_hash"])
        # A doc id present in BOTH frames (a batch re-ingesting a settled
        # doc) would otherwise collide with itself on every shared band
        # key and emit a degenerate (x, x) row — least==greatest violates
        # the doc_a < doc_b contract below.
        .filter(F.col("_new") != F.col("_old"))
        .select(
            F.least("_new", "_old").alias("doc_a"),
            F.greatest("_new", "_old").alias("doc_b"),
            F.lit("cross").alias("pair_type"),
        )
    )
    nn_left = new_keyed.withColumnRenamed("_new", "doc_a")
    nn_right = new_keyed.withColumnRenamed("_new", "doc_b")
    new_new = (
        nn_left.join(nn_right, on=["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit("new-new").alias("pair_type"))
    )
    # ONE pair-keyed aggregate replaces two per-branch distincts (one
    # shuffle instead of two) and makes the output a set even when the
    # frames' ids overlap: a pair with both endpoints in the batch also
    # surfaces through its corpus copies in the cross branch, and the
    # honest label must win exactly once. The priority is an EXPLICIT
    # integer (new-new=1 > cross=0), not lexicographic max over the
    # label strings — renaming a label can't silently flip the winner
    # (r13 advice 3).
    return (
        cross.unionByName(new_new)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.when(
                F.max((F.col("pair_type") == "new-new").cast("int")) == 1,
                F.lit("new-new"),
            )
            .otherwise(F.lit("cross"))
            .alias("pair_type")
        )
    )
