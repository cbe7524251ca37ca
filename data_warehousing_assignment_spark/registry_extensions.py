"""Extension registry: the 100 TB training-data-pipeline operators
(dedup, similarity search, text analysis, streaming windows) wired to
the documents/embeddings/events testdata, with DuckDB oracles wherever
the computation is SQL-expressible.

The md5-based hashing strategy (see operators/dedup.py) exists precisely
so these oracles are possible: min-hash minimizes lexicographic HEX
strings, SimHash votes on md5 nibbles, and embedding scores run on
floor-quantized int64 micro-units — all bit-reproducible in DuckDB.

Oracle-less entries (rows-only check, by design): only the
approximate-by-spec paths — lsh_cosine_topk, ivf_cosine_topk,
embedding_near_dup_pairs, approx_count_distinct — whose contract is
approximation quality, pinned by recall/error-bound tests
(tests/test_similarity.py, test_ivf.py, test_approx.py) rather than SQL
equivalence. The true readStream paths are exercised in
tests/test_streaming.py, test_stateful.py, test_watermark.py,
test_stream_sink.py, test_stream_dedup.py, test_stream_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import dec, query, t
from data_warehousing_assignment_spark.operators import dedup as dd
from data_warehousing_assignment_spark.operators import similarity as sim
from data_warehousing_assignment_spark.operators import text as tx
from data_warehousing_assignment_spark.streaming import windows as sw


def docs_t(spark, sf_dir):
    """documents table widened for CPU-bound row-local hash stages
    (single small parquet file → single task otherwise)."""
    return dd.scale_out(t(spark, sf_dir, "documents"))

# Shared DuckDB fragments -------------------------------------------------

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

# word 3-gram shingles with the same <3-token fallback as word_shingles()
_SHINGLES = f"""
    CASE WHEN len({_TOKS}) >= 3
         THEN list_transform(range(1, len({_TOKS}) - 1),
                i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2])
         ELSE [array_to_string({_TOKS}, ' ')] END
"""

_K, _BANDS, _R = 12, 4, 3


def _sig_sql() -> str:
    """DuckDB expression list for the 12 min-hash values over shingles
    (mirrors dedup.minhash_signature)."""
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s)))" for i in range(_K)
    )
    return mins


_SIG_CTE = f"""
    sigs AS (
      SELECT doc_id, list_value({_sig_sql()}) AS sig
      FROM (SELECT doc_id, {_SHINGLES} AS sh FROM documents)
    )
"""

_BANDS_CTE = (
    "bands AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(sig[{b*_R+1}] || '|' || sig[{b*_R+2}] || '|' || sig[{b*_R+3}]) AS band_hash "
        "FROM sigs"
        for b in range(_BANDS)
    )
    + ")"
)

_CAND_SQL = f"""
    WITH {_SIG_CTE}, {_BANDS_CTE}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash
    WHERE a.doc_id < b.doc_id
"""


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------


@query(
    "op-ext-dedup-exact",
    oracle=r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             AS content_hash,
           min(doc_id) AS keep_id, COUNT(*) AS group_size
    FROM documents GROUP BY 1
    """,
)
def op_ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized content hash; survivor = min(doc_id).
    One shuffle on the 32-char hash — never on document bodies. No
    scale_out here: md5+groupBy is shuffle-bound, and widening first
    shuffles the bodies themselves (benchmarked 4.5× slower at sf0.1);
    at cluster scale the scan is already wide."""
    return dd.exact_dedup(t(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "op-ext-dedup-dupcapture",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_rows
    FROM documents GROUP BY lang, source HAVING COUNT(*) > 1
    """,
)
def op_ext_dedup_dupcapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duplicate_rows over a projection (metadata-level dup capture)."""
    return dd.duplicate_rows(t(spark, sf_dir, "documents"), ["lang", "source"])


@query(
    "op-ext-minhash-sig",
    # Arrays never cross the oracle boundary (the driver's pandas
    # canonicalization can't sort/hash list cells — r3 `err`): the
    # signature is surfaced as a '|'-joined string, array-native form
    # stays the operator contract (tests/test_dedup.py).
    oracle=f"""WITH {_SIG_CTE}
    SELECT doc_id, array_to_string(sig, '|') AS sig FROM sigs""",
)
def op_ext_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=12): row-local array expressions, zero
    shuffle — the signature stage scales linearly with corpus bytes."""
    docs = t(spark, sf_dir, "documents")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", _K)
    return sigs.select("doc_id", F.concat_ws("|", "sig").alias("sig"))


@query("op-ext-minhash-lsh", oracle=_CAND_SQL)
def op_ext_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs (k=12, 4 bands × 3 rows):
    bucket equi-join, O(Σ bucket²), never all-pairs."""
    return dd.minhash_lsh_candidates(
        t(spark, sf_dir, "documents"), "doc_id", "text", _K, _BANDS
    )


@query(
    "op-ext-jaccard",
    oracle=f"""
    WITH {_SIG_CTE}, {_BANDS_CTE},
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ),
    sh AS (SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents)
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
             / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))
                    AS DOUBLE) AS jaccard
    FROM cands c
    JOIN sh x ON c.doc_a = x.doc_id
    JOIN sh y ON c.doc_b = y.doc_id
    """,
)
def op_ext_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification of LSH candidates — integer
    set-intersection sizes, one IEEE division; cost O(|candidates|)."""
    docs = t(spark, sf_dir, "documents")
    cands = dd.minhash_lsh_candidates(docs, "doc_id", "text", _K, _BANDS)
    return dd.ngram_jaccard_pairs(docs, cands, "doc_id", "text")


def _simhash_oracle(bits: int = dd.SIMHASH_BITS) -> str:
    votes = ", ".join(
        "SUM(CASE WHEN ((strpos('0123456789abcdef', "
        f"substr(md5(tok), {j // 4 + 1}, 1)) - 1) & {1 << (j % 4)}) > 0 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, t.tok FROM (
        SELECT doc_id, {_TOKS} AS tk FROM documents) d, unnest(d.tk) AS t(tok)
    ), votes AS (
      SELECT doc_id, {votes} FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {fp} AS simhash FROM votes
    """


@query("op-ext-simhash", oracle=_simhash_oracle())
def op_ext_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (48 bits from md5 nibbles): one explode + one
    wide map-side-combined aggregation — a single shuffle keyed by doc."""
    return dd.simhash(t(spark, sf_dir, "documents"), "doc_id", "text")


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


@query(
    "op-ext-text-stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform({_TOKS}, s -> length(s))) AS DOUBLE)
             / CAST(len({_TOKS}) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
)
def op_ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats — row-local, zero shuffle."""
    docs = docs_t(spark, sf_dir)
    f = tx.quality_features("text")
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars_calc"),
        f["n_tokens"].alias("n_tokens"),
        f["avg_token_len"].alias("avg_token_len"),
    )


def _lang_oracle() -> str:
    hits = {
        lang: (
            f"len(list_filter({_TOKS}, "
            f"tk -> tk IN ({', '.join(repr(w) for w in ws)})))"
        )
        for lang, ws in tx.STOPWORDS.items()
    }
    langs = list(tx.STOPWORDS)
    case = "CASE "
    for lang in langs:  # first match wins → en priority like the Spark chain
        conds = [f"{hits[lang]} > 0"] + [
            f"{hits[lang]} >= {hits[o]}" for o in langs if o != lang
        ]
        case += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"SELECT doc_id, {case} AS lang_guess FROM documents"


@query("op-ext-lang-id", oracle=_lang_oracle())
def op_ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (argmax with fixed tie order)."""
    return docs_t(spark, sf_dir).select(
        "doc_id", tx.lang_id("text").alias("lang_guess")
    )


@query(
    "op-ext-quality",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len({_TOKS}) AS DOUBLE) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                  AS DOUBLE) AS punct,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS DOUBLE) AS digits,
             CAST(len(list_filter({_TOKS},
                  tk -> tk IN ('the','a','and','of','to','in','is','that','it','for')))
                  AS DOUBLE) AS sw
      FROM documents
    )
    SELECT doc_id,
           punct / n_chars AS punct_ratio,
           digits / n_chars AS digit_ratio,
           sw / n_tokens AS stopword_ratio,
           0.4 * least(sw / n_tokens * 4.0, 1.0)
           + 0.3 * least(n_tokens / 100.0, 1.0)
           + 0.2 * (1.0 - least(punct / n_chars * 10.0, 1.0))
           + 0.1 * (1.0 - least(digits / n_chars * 10.0, 1.0)) AS score
    FROM f
    """,
)
def op_ext_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: ratio features + fixed-weight composite
    (every term is ints-then-one-division → bit-stable doubles)."""
    docs = docs_t(spark, sf_dir)
    f = tx.quality_features("text")
    return docs.select(
        "doc_id",
        f["punct_ratio"].alias("punct_ratio"),
        f["digit_ratio"].alias("digit_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
        tx.quality_score("text").alias("score"),
    )


@query(
    "op-ext-fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_min(list_transform({_SHINGLES}, s -> md5(s))) AS fingerprint
    FROM documents
    """,
)
def op_ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min shingle md5 (k=1 min-hash)."""
    return docs_t(spark, sf_dir).select(
        "doc_id", tx.doc_fingerprint("text").alias("fingerprint")
    )


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

_QUANT_SQL = (
    "list_transform(embedding, x -> "
    "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
)

_ANN_ORACLE = f"""
    WITH qv AS (
      SELECT vec_id AS query_id, {_QUANT_SQL} AS e
      FROM embeddings WHERE vec_id % 100 = 0
    ), cv AS (
      SELECT vec_id AS neighbor_id, {_QUANT_SQL} AS e FROM embeddings
    ), idx AS (SELECT unnest(range(1, 65)) AS i),
    dots AS (
      SELECT q.query_id, c.neighbor_id,
             CAST(SUM(q.e[idx.i] * c.e[idx.i]) AS BIGINT) AS dot
      FROM qv q, cv c, idx
      WHERE q.query_id <> c.neighbor_id
      GROUP BY 1, 2
    ), norms AS (
      SELECT vec_id, CAST(SUM(p) AS BIGINT) AS nrm FROM (
        SELECT vec_id, e[idx.i] * e[idx.i] AS p
        FROM (SELECT vec_id, {_QUANT_SQL} AS e FROM embeddings), idx) GROUP BY 1
    ), scored AS (
      SELECT d.query_id, d.neighbor_id,
             CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(nq.nrm AS DOUBLE)) * sqrt(CAST(nc.nrm AS DOUBLE)))
               AS score
      FROM dots d
      JOIN norms nq ON d.query_id = nq.vec_id
      JOIN norms nc ON d.neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, rank, score FROM (
      SELECT query_id, neighbor_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS INT) AS rank
      FROM scored)
    WHERE rank <= 5
"""


@query("op-ext-ann-bruteforce", oracle=_ANN_ORACLE)
def op_ext_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (k=5) for the vec_id%100=0 query set —
    the exact baseline the LSH path is measured against. Quantized int64
    scoring makes ranks and scores bit-stable across engines."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.brute_force_cosine_topk(emb, queries, k=5)


@query("op-ext-ann-lsh")  # approximate by design → rows-only + pytest recall
def op_ext_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k: same output contract as the
    brute-force baseline, candidates limited to the query's sign bucket.
    Verified by recall tests (tests/test_similarity.py), not an oracle —
    approximation quality, not SQL equivalence, is the spec."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.lsh_cosine_topk(emb, queries, k=5)


@query("op-ext-embed-neardup")  # rows-only: see tests/test_similarity.py
def op_ext_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within hyperplane buckets
    (threshold 0.5 on this synthetic data)."""
    return sim.embedding_near_dup_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.5
    )


# --------------------------------------------------------------------------
# streaming windows (batch semantics on events; true readStream in tests)
# --------------------------------------------------------------------------


@query(
    "op-ext-stream-tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def op_ext_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows per event_type — identical code
    path runs under readStream (tests/test_streaming.py)."""
    return sw.tumbling_counts(t(spark, sf_dir, "events"))


@query(
    "op-ext-stream-sliding",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR, value
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM b GROUP BY ws
    """,
)
def op_ext_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h windows: every event lands in exactly two windows
    (oracle: union of the two bucket offsets)."""
    return sw.sliding_counts(t(spark, sf_dir, "events"))


@query(
    "op-ext-stream-session",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM seq
    )
    SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_no
    """,
)
def op_ext_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user — F.session_window; oracle
    replays the gaps-and-islands equivalent."""
    return sw.session_counts(t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# multimodal columns (binary payload + typed metadata; decode stubbed)
# --------------------------------------------------------------------------

from data_warehousing_assignment_spark.operators import multimodal as mm  # noqa: E402


@query(
    "op-ext-mm-bytestats",
    oracle="""
    SELECT doc_id,
           CAST(5 + octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5('FAKE1' || text) AS payload_md5
    FROM documents
    """,
)
def op_ext_mm_bytestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload stats via Arrow-batched mapInPandas — the canonical
    decode-stage plumbing (bytes in, features out, bounded batches). The
    deterministic FAKE payload ('FAKE1' magic + utf-8 text) makes the
    md5/byte-count oracle exact."""
    docs = mm.with_media_columns(docs_t(spark, sf_dir))
    return mm.byte_stats(docs).select("doc_id", "n_bytes", "payload_md5")


#: 8×8 → 4×4 nearest-neighbor resample picks row-major source indices
#: {0,2,4,6}×8 + {0,2,4,6}; the fake decoder tiles the text bytes
#: cyclically (np.resize), so pixel[i] = ord(text[idx % len]) / 255.
_DECODE_IDX = [8 * y + x for y in (0, 2, 4, 6) for x in (0, 2, 4, 6)]


@query(
    "op-ext-mm-decode",
    # The pixel array crosses the oracle boundary as '|'-joined integer
    # byte values (r3: the driver's pandas canonicalization `err`s on
    # list cells). pixel = byte/255.0 exactly, so round(pixel*255) is a
    # lossless inverse — the value check stays exact, not a hash.
    oracle=f"""
    -- ASCII corpus (pinned in pytest): ord(substr) = payload byte value
    SELECT doc_id, 4 AS width, 4 AS height,
           CASE WHEN length(text) = 0
                THEN '{'|'.join(['0'] * 16)}'
                ELSE array_to_string(
                       list_transform([{', '.join(map(str, _DECODE_IDX))}],
                         i -> ord(substr(text, (i % length(text)) + 1, 1))),
                       '|')
           END AS pixel_bytes
    FROM documents
    """,
)
def op_ext_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed image decode (real codec = NotImplementedError integration
    point) + 4×4 nearest-neighbor resize: payload bytes → grayscale pixel
    array through the same mapInPandas contract a Pillow-backed decoder
    would use. The oracle replays the cyclic-tile + resample arithmetic
    on the ASCII text bytes — the pandas stages are value-verified, not
    just shape-checked."""
    docs = mm.with_media_columns(docs_t(spark, sf_dir))
    decoded = mm.decode(docs)
    resized = mm.resize(decoded, 4, 4)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.concat_ws(
            "|",
            F.transform(
                "pixels", lambda v: F.round(v * 255).cast("int").cast("string")
            ),
        ).alias("pixel_bytes"),
    )


@query(
    "op-ext-mm-framesample",
    oracle="""
    -- DuckDB 1.0 has no BLOB substr; the test corpus is pure ASCII
    -- (octet_length == length for every row, asserted in pytest), so
    -- char slicing is byte slicing here.
    WITH b AS (
      SELECT doc_id, text AS body,
             greatest(octet_length(CAST(text AS BLOB)) // 4, 1) AS step
      FROM documents
    )
    SELECT doc_id, f AS frame_idx,
           md5(substr(body, f * step + 1, step)) AS frame_md5
    FROM b, (SELECT unnest([0, 2]) AS f)
    """,
)
def op_ext_mm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling stub: one media row fans out to one row per
    sampled frame (every 2nd of 4 fake frames). Frames cross the oracle
    boundary as md5 hex (raw bytes canonicalize differently per engine),
    so the byte-slicing semantics are exactly verified."""
    docs = mm.with_media_columns(docs_t(spark, sf_dir)).withColumn(
        "meta",
        F.struct(
            F.lit("video/x-fake").alias("mime"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.lit(4).alias("n_frames"),
            F.lit(0).alias("sample_rate"),
        ),
    )
    return mm.sample_frames(docs, every_n=2).select(
        "doc_id", "frame_idx", F.md5("frame_payload").alias("frame_md5")
    )


from data_warehousing_assignment_spark.streaming import stateful as st  # noqa: E402


@query(
    "op-ext-stream-stateful",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           COUNT(*) AS max_batch
    FROM events GROUP BY user_id
    """,
)
def op_ext_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState on streams; its
    applyInPandas twin here): per-user running totals + burst counter.
    Cross-batch state accumulation is pinned by tests/test_stateful.py;
    this entry verifies the state math itself against SQL."""
    return st.user_totals_stateful(t(spark, sf_dir, "events"))


from data_warehousing_assignment_spark.operators import asof as ao  # noqa: E402


@query(
    "op-ext-asof-join",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts_us, r.value AS value_asof
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'view') l
    ASOF LEFT JOIN
         (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
          WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
    """,
)
def op_ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: for every view event, the user's most recent
    purchase value at-or-before it. Window formulation — one shuffle on
    (user, ts), no pandas in the hot path; joins on exact int64 MICROS
    both sides (DuckDB truncates the parquet ns timestamp to us, so us is
    the precision the two engines share)."""
    ev = t(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts_ns div 1000"))
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "value"
    )
    return ao.asof_join(views, purchases, "ts_us", ["user_id"], ["value"])


from data_warehousing_assignment_spark.operators.skew import salted_join  # noqa: E402


@query(
    "op-ext-salted-join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def op_ext_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: hot keys spread across n_salts reducers, small
    side replicated. The oracle is the PLAIN join — salting must be a
    pure physical rewrite with identical semantics."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return salted_join(orders, cust, on=["o_custkey"], n_salts=8)


from data_warehousing_assignment_spark.operators import ivf as iv  # noqa: E402


@query("op-ext-ann-ivf")  # approximate by design → rows-only + pytest recall
def op_ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: deterministic k-means cells (2 Lloyd rounds
    of pure DataFrame aggregation), queries probe their 4 nearest of 16
    cells. Recall vs brute force + full-probe≡exact equivalence are
    pinned in tests/test_ivf.py."""
    corpus = t(spark, sf_dir, "embeddings")
    queries = corpus.filter(F.col("vec_id") % 100 == 0)
    return iv.ivf_cosine_topk(corpus, queries, k=5, n_clusters=16, n_probe=4)


@query(
    "op-ext-token-bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text),
                ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')) AS INT) AS n_bpe_tokens
    FROM documents
    """,
)
def op_ext_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (GPT-2-style pre-tokenizer shape) —
    the LLM-pipeline token-budget estimator; row-local regex pass."""
    return docs_t(spark, sf_dir).select(
        "doc_id", tx.bpe_token_count("text").alias("n_bpe_tokens")
    )


def _rolling_oracle(k: int = tx.ROLL_K) -> str:
    return f"""
    SELECT doc_id,
           list_min(list_transform(
             range(1, greatest(length(lower(text)) - {k} + 1, 1) + 1),
             i -> list_reduce(
                    list_transform(
                      range(i, least(i + {k} - 1, length(lower(text))) + 1),
                      p -> CAST(ord(substr(lower(text), CAST(p AS INT), 1)) AS BIGINT)),
                    (a, b) -> (a * {tx.ROLL_BASE} + b) % {tx.ROLL_MOD})
           )) AS fingerprint
    FROM documents
    """


@query("op-ext-fingerprint-rolling", oracle=_rolling_oracle())
def op_ext_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprint: min polynomial hash over all
    16-char windows — suffix/prefix edits still collide on shared
    windows. Row-local integer folds, JVM-side."""
    return docs_t(spark, sf_dir).select(
        "doc_id", tx.rolling_hash_fingerprint("text").alias("fingerprint")
    )


@query("op-ext-approx-count-distinct")  # approximate by design → rows-only
def op_ext_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx_count_distinct per order-month — the scale option for
    op-agg-count-distinct (SURVEY §2.4): fixed-size sketches merge
    map-side, so the shuffle carries KBs per group instead of the full
    distinct-key set. rsd=0.01; error bound pinned in
    tests/test_approx.py against the exact count."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers")
        )
    )


from data_warehousing_assignment_spark.streaming.dedup import dedup_events  # noqa: E402


@query(
    "op-ext-stream-dedup",
    oracle="""
    SELECT event_id, COUNT(*) AS n FROM (
      SELECT event_id FROM events UNION ALL SELECT event_id FROM events
    ) GROUP BY event_id HAVING COUNT(*) = 2
    """,
)
def op_ext_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicatesWithinWatermark on streams; exact
    dedup twin on static frames): a doubled events feed dedups back to
    one row per key. The oracle pins input doubling + survivor-per-key;
    the watermark-bounded streaming state path is exercised in
    tests/test_stream_dedup.py."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")
    doubled = ev.unionByName(ev)
    return dedup_events(doubled, ["event_id"]).select(
        "event_id", F.lit(2).alias("n")
    )


from data_warehousing_assignment_spark.streaming.joins import (  # noqa: E402
    view_purchase_conversions,
)


@query(
    "op-ext-stream-join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id, p.value AS purchase_value,
           CAST(epoch(date_trunc('second', p.ts))
                - epoch(date_trunc('second', v.ts)) AS BIGINT) AS delay_sec
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     -- compare in µs: Spark truncates the ns parquet timestamp to µs,
     -- so ns-precision bounds could disagree exactly at the horizon
     AND epoch_us(p.ts) >= epoch_us(v.ts)
     AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000
    """,
)
def op_ext_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view→purchase conversion within 1h):
    the same builder runs under readStream with two watermarked sides
    (tests/test_stream_join.py proves stream ≡ batch); registered here on
    the static frames against a DuckDB range-join oracle."""
    ev = t(spark, sf_dir, "events")
    return view_purchase_conversions(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@query(
    "op-ext-rollup",
    oracle="""
    SELECT n_name, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderpriority)
    """,
)
def op_ext_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (nation → priority → grand total) — the
    subtotal surface the reference lacks entirely. Decimal-exact sums so
    every subtotal level hash-matches; Catalyst expands the rollup into
    one Expand + single aggregation (one shuffle for all levels)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "o_orderpriority")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "op-ext-cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def op_ext_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations in one
    Expand + aggregation pass."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "op-ext-pivot",
    oracle="""
    SELECT n_name,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN
                CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN
                CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN
                CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def op_ext_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order totals by status — with the pivot values DECLARED
    (pivot without values triggers an extra distinct-scan job; never do
    that on a 100 TB fact)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec("o_totalprice")).cast("double"))
    )
