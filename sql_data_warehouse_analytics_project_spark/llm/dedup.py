"""Deduplication operators for training-data pipelines: exact (hash),
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design:
- exact: one shuffle on the 32-byte fingerprint, never on the text.
- ngram-Jaccard: exact pairwise similarity but candidates come from an
  inverted shingle index (self-join on shingle), so cost is
  Σ|docs per shingle|² — not |docs|². Hot shingles are capped.
- MinHash+LSH: the 100 TB path — fixed-size signatures (one aggregation
  pass), banding join for candidates, exact Jaccard verify on candidates.
- SimHash: 64-bit signature per doc in one aggregation pass; near-dups =
  small Hamming distance.
All logic is built-in expressions (xxhash64, explode, groupBy) — no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence  # noqa: F401 — used in annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_data_warehouse_analytics_project_spark.llm.text import (
    fingerprint,
    md5_60bit,
    shingles,
    tokens,
)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the lowest-id document per normalized-content fingerprint.
    Deterministic winner (min id), one shuffle on the hash."""
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    return (
        df.withColumn("_fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Duplicate report: (fingerprint, n_docs, keeper_id) for groups > 1."""
    return (
        df.withColumn("_fp", fingerprint(text_col))
        .groupBy(F.col("_fp").alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def snapshot_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Prior-corpus exact-dedup ledger: the DISTINCT normalized-content
    fingerprints of a corpus snapshot — 32 bytes per distinct content,
    the durable state an incremental refresh dedups against. Persist it
    (``write_dataset``) once per snapshot; it never re-reads the text."""
    return df.select(fingerprint(text_col).alias("fingerprint")).distinct()


def dedup_against_snapshot(
    new_docs: DataFrame,
    prior_fingerprints: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Incremental corpus refresh: exact-dedup a NEW document batch both
    against a prior snapshot's fingerprint ledger (anti join) and within
    itself (lowest id per fingerprint) — the cross-snapshot twin of
    :func:`exact_dedup` for the recurring-crawl pipeline, where
    re-fingerprinting the whole historical corpus per refresh would be
    corpus-sized work.

    Scale shape: only 32-byte hashes shuffle (the text never does); the
    ledger side is distinct-content sized; the anti join + the
    keep-lowest window both key on the same fingerprint, so the batch
    shuffles once. Union the survivors' fingerprints into the ledger to
    roll the snapshot forward."""
    for reserved in ("_fp", "_rn"):
        if reserved in new_docs.columns:
            raise ValueError(
                f"dedup_against_snapshot: column {reserved!r} already exists"
            )
    fresh = new_docs.withColumn("_fp", fingerprint(text_col)).join(
        prior_fingerprints.select(F.col("fingerprint").alias("_fp")),
        "_fp",
        "left_anti",
    )
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (inverted-index candidate join + exact verify)
# ---------------------------------------------------------------------------


def shingle_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    *,
    tokens_col: str | None = None,
) -> DataFrame:
    """Inverted shingle index (doc, shingle:int64). Shingles are hashed to
    64-bit ints immediately after explode so every downstream shuffle and
    join moves 8-byte keys instead of ~20-byte strings; set equality is
    preserved (collision odds across a corpus are ~|shingles|²/2⁶⁵ — at
    300k distinct shingles that is ~2e-9, far below the double-rounding
    noise floor the oracles already tolerate).

    The input is hash-repartitioned on the doc id before explode: the
    tokenize/shingle expression pipeline is the CPU hot spot, and a corpus
    that arrives in few (or one) file splits would otherwise run it on few
    cores; repartitioning the raw text is a tiny shuffle, and because
    explode preserves the partitioning, every downstream
    ``groupBy("doc")`` (sizes, minhash signatures) then aggregates
    shuffle-free.

    ``tokens_col`` names a pre-tokenized array column (see
    ``curate.curate_corpus``): the shingle expression then derives from
    the materialized token arrays instead of re-running the tokenizer
    regex — the dominant CPU of the pass."""
    from sql_data_warehouse_analytics_project_spark.llm.text import shingles_of, tokens

    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    d = df.repartition(nparts, F.col(id_col))
    if tokens_col is None:
        # Materialize the token arrays in their OWN projection before the
        # shingle expression consumes them: the shingle transform
        # references its token input repeatedly (size + per-element
        # slice), and an inline tokenizer expression gets re-evaluated
        # per reference — measured ~35% of the pass on this corpus.
        d = d.select(F.col(id_col), tokens(text_col).alias("__toks"))
        tokens_col = "__toks"
    sh = shingles_of(F.col(tokens_col), n)
    return (
        d.select(F.col(id_col).alias("doc"), F.explode(sh).alias("s"))
        # Stamp the shingle width into column metadata so consumers that
        # accept a pre-built index can detect an n-mismatch (a wrong-n
        # index silently yields wrong similarities otherwise). Metadata
        # survives select/checkpoint as long as the column isn't rebuilt.
        .select("doc", F.xxhash64("s").alias("shingle", metadata={"shingle_n": n}))
    )


def _require_index_n(index: DataFrame, n: int) -> None:
    """Reject a pre-built shingle index whose recorded shingle width
    disagrees with the caller's ``n``. Indexes built outside
    :func:`shingle_index` carry no metadata and are accepted as-is
    (caller contract)."""
    try:
        meta = index.schema["shingle"].metadata or {}
    except KeyError:
        raise ValueError(
            "pre-built index must have a 'shingle' column (got: "
            f"{index.columns})"
        ) from None
    built_n = meta.get("shingle_n")
    if built_n is not None and int(built_n) != n:
        raise ValueError(
            f"pre-built shingle index was built with n={built_n} but the "
            f"call requested n={n}; pass the matching n (the df/text_col/n "
            "arguments are otherwise ignored when an index is supplied)"
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    *,
    max_docs_per_shingle: int = 1000,
    index: DataFrame | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with shingle-set Jaccard ≥ threshold.

    Plan: doc→distinct shingles → explode (inverted index) → self-join on
    shingle → per-pair intersection count → |A∪B| from per-doc sizes →
    filter. ``max_docs_per_shingle`` drops degenerate stop-shingles that
    would otherwise create quadratic candidate blowup (standard trick; at
    scale prefer MinHash banding below).

    The index is materialized once (localCheckpoint): four downstream
    consumers (sizes, hot-shingle stats, both join sides) would otherwise
    re-run the interpreted tokenize/shingle expression pipeline four times
    — the dominant cost. The pin stays EAGER here (and at every other
    fan-out site in this module): with a lazy checkpoint the consumers
    become INDEPENDENT leaf stages of one job, the scheduler runs them
    concurrently, and their tasks race on the unmaterialized partitions'
    block locks — measured ~2× wall on the fan-out keys versus the eager
    materialize-then-consume order. Lazy pins (eager=False) are used in
    this engine only where the next in-function action scans the frame
    through a single leaf, so that action doubles as the materializer
    with no stage-level contention. localCheckpoint rather than persist:
    persist
    registers the (large) plan with the CacheManager, and EVERY later
    query in the session then pays plan-canonicalization matching against
    it; a checkpoint gives the same reuse with no session-wide residue.

    ``index`` accepts a pre-built (ideally checkpointed) ``shingle_index``
    so pipelines running both dedup paths over one corpus (e.g. the
    exact-vs-LSH recall gate) don't re-tokenize.
    """
    paired = _pair_intersections(
        df, id_col, text_col, n, max_docs_per_shingle, index
    )
    out = paired.withColumn(
        "jaccard",
        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
    ).filter(F.col("jaccard") >= threshold)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _pair_intersections(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_docs_per_shingle: int,
    index: DataFrame | None,
) -> DataFrame:
    """Shared candidate stage of the set-overlap detectors: inverted
    shingle index → self-join → per-pair ``n_common`` with per-doc sizes
    ``n_a``/``n_b`` attached. Hot shingles are dropped BEFORE sizes are
    computed so every verify formula's numerator and denominator count
    one universe (a cap applied to the join only would systematically
    underestimate overlap for docs sharing a hot shingle)."""
    if index is not None:
        _require_index_n(index, n)
        sh = index
    else:
        sh = shingle_index(df, id_col, text_col, n).localCheckpoint(eager=True)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") > max_docs_per_shingle)
        .select("shingle")
    )
    sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc").alias("id_a"), "shingle")
    b = sh.select(F.col("doc").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return common.join(
        sizes.withColumnsRenamed({"doc": "id_a", "n_shingles": "n_a"}), "id_a"
    ).join(sizes.withColumnsRenamed({"doc": "id_b", "n_shingles": "n_b"}), "id_b")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    *,
    max_docs_per_shingle: int = 1000,
    index: DataFrame | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) where the SMALLER shingle set is ≥``threshold``
    contained in the other: C = |A∩B| / min(|A|,|B|).

    Jaccard misses asymmetric duplication — a tweet quoted inside a long
    article has tiny |A∩B|/|A∪B| but containment ≈ 1. This is the
    detector for subset/quote/boilerplate-envelope duplication (the same
    inverted-index plan as :func:`ngram_jaccard_pairs`: shingle self-join
    → per-pair intersection → per-doc sizes → filter; identical hot-
    shingle cap so numerator and denominator count one universe).
    """
    paired = _pair_intersections(
        df, id_col, text_col, n, max_docs_per_shingle, index
    )
    out = paired.withColumn(
        "containment", F.col("n_common") / F.least("n_a", "n_b")
    ).filter(F.col("containment") >= threshold)
    return out.select("id_a", "id_b", F.round("containment", 6).alias("containment"))


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    n: int = 3,
    *,
    index: DataFrame | None = None,
) -> DataFrame:
    """k min-hashes per doc in ONE aggregation pass: explode shingles, each
    hash_i = min(xxhash64(shingle, seed_i)). Output: (id, sig:array<long>).

    ``index`` accepts a pre-built (ideally checkpointed) ``shingle_index`` so
    pipelines sharing the index don't re-tokenize; the shingle is already
    an int64 there, so the 64 seeded re-hashes run over 8-byte ints, not
    strings."""
    if index is not None:
        _require_index_n(index, n)
        sh = index
    else:
        sh = shingle_index(df, id_col, text_col, n)
    mins = sh.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col("doc").alias(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("minhash_sig"),
    )


def minhash_signatures_portable(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 8,
    n: int = 3,
) -> DataFrame:
    """MinHash signatures from md5-derived 60-bit ints — slower than the
    xxhash64 production path (``minhash_signatures``) but computable
    bit-identically in any engine with md5, so the DuckDB oracle can check
    the MinHash math end-to-end (the xxhash64 path has no SQL twin and is
    only recall-gated). Seed i = suffix ``#i`` on the shingle."""
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(text_col, n)).alias("s")
    )
    mins = sh.groupBy("doc").agg(
        *[
            F.min(md5_60bit(F.concat(F.col("s"), F.lit(f"#{i}")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col("doc").alias(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("minhash_sig"),
    )


def minhash_dedup_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 8,
    num_bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """The FULL banding pipeline — signatures → band buckets → candidate
    join → exact-Jaccard verify — parameterized on the md5 portable hash so
    a DuckDB oracle can replay every stage bit-exactly (the xxhash64
    production pipeline, :func:`minhash_dedup_pairs`, has no SQL twin and
    is recall-gated only; this twin closes the gap by oracle-checking the
    banding/verify *plumbing* end-to-end, not just the signature math).

    Band buckets are plain strings ``"<band>,<h_i>,...,<h_j>"`` instead of
    the production path's xxhash64(bucket) int64 — portable, and the join
    semantics (docs sharing any band collide) are identical."""
    if num_bands <= 0 or num_hashes % num_bands != 0:
        # silent trailing-hash truncation would quietly lower recall, and
        # rows_per_band=0 would collapse every band into one bucket
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of"
            f" num_bands ({num_bands})"
        )
    rows_per_band = num_hashes // num_bands
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(text_col, n)).alias("s")
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    mins = sh.groupBy("doc").agg(
        *[
            F.min(md5_60bit(F.concat(F.col("s"), F.lit(f"#{i}")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    bands = mins.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        F.lit(str(b)),
                        *[
                            F.col(f"h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bucket"),
    )
    a = bands.select(F.col("doc").alias("id_a"), "bucket")
    b = bands.select(F.col("doc").alias("id_b"), "bucket")
    cands = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sh.select(F.col("doc").alias("id_a"), "s")
    sb = sh.select(F.col("doc").alias("id_b"), "s")
    common = (
        sa.join(cands, "id_a")
        .join(sb, ["s", "id_b"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"doc": "id_a", "n_shingles": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc": "id_b", "n_shingles": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_portable(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_bits: int = 16,
) -> DataFrame:
    """SimHash from md5-derived token hashes (portable twin of ``simhash``,
    same rationale as ``minhash_signatures_portable``): per token,
    h = first 60 bits of md5; bit j of the signature is the sign of
    Σ±1 over tokens for h's bit j. Bounded to ``num_bits`` so the oracle
    SQL stays readable."""
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t")
    ).select("doc", md5_60bit(F.col("t")).alias("h"))
    h = F.col("h")
    sums = tok.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_"),
        *[
            F.sum(F.shiftright(h, j).bitwiseAND(F.lit(1))).alias(f"b{j}")
            for j in range(num_bits)
        ],
    )
    return sums.select(
        F.col("doc").alias(id_col),
        sum(
            [
                F.when(F.col(f"b{j}") * 2 > F.col("n_"), F.lit(1 << j)).otherwise(0)
                for j in range(num_bits)
            ],
            F.lit(0),
        )
        .cast("long")
        .alias("simhash"),
    )


def _sig_len(signatures: DataFrame, sig_col: str, num_bands: int) -> int:
    sig_len_row = signatures.select(F.size(sig_col).alias("n")).limit(1).collect()
    sig_len = sig_len_row[0]["n"] if sig_len_row else 0
    if sig_len and (num_bands <= 0 or sig_len % num_bands != 0):
        # a ragged split would band only the leading hashes (silent recall
        # loss) or, past sig_len bands, bucket every doc together (O(n²))
        raise ValueError(
            f"signature length ({sig_len}) must be a positive multiple of"
            f" num_bands ({num_bands})"
        )
    return sig_len


def _band_rows(
    signatures: DataFrame,
    id_col: str,
    num_bands: int,
    sig_col: str,
    *,
    portable: bool = False,
) -> DataFrame:
    """(doc, band, bucket) — one row per signature band. Production bucket
    is ``xxhash64(concat of the band's hashes)`` (int64, joins cheap);
    ``portable=True`` keeps the concat STRING so an md5-based SQL oracle
    can reproduce the bucketing."""
    sig_len = _sig_len(signatures, sig_col, num_bands)
    rows_per_band = sig_len // num_bands or 1

    def bucket(b):
        joined = F.concat_ws(
            ",",
            *[
                F.element_at(F.col(sig_col), b * rows_per_band + r + 1)
                for r in range(rows_per_band)
            ],
        )
        return joined if portable else F.xxhash64(joined)

    return signatures.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket"))
                    for b in range(num_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 16,
    sig_col: str = "minhash_sig",
) -> DataFrame:
    """Banding: split the signature into bands, hash each band, join docs
    sharing any band bucket → candidate pairs (id_a < id_b). With 64 hashes
    and 16 bands (r=4) the S-curve crosses ~0.5 at j≈0.7."""
    bands = _band_rows(signatures, id_col, num_bands, sig_col)
    a = bands.select(F.col("doc").alias("id_a"), "band", "bucket")
    b = bands.select(F.col("doc").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def signature_agreement(a: Column, b: Column) -> Column:
    """Fraction of agreeing positions between two equal-length MinHash
    signatures — the standard unbiased estimator of Jaccard similarity
    (each position agrees with probability J). Pure array expression,
    codegen'd: no UDF, no explode."""
    return (
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.size(a)
    )


def near_dup_against_snapshot(
    new_docs: DataFrame,
    snapshot_sigs: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    threshold: float = 0.7,
    num_bands: int = 16,
    n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs between a NEW document batch and a PRIOR corpus
    snapshot represented ONLY by its persisted MinHash signatures —
    the recurring-crawl companion of :func:`dedup_against_snapshot` for
    near-duplicates: the historical text can live in cold storage, the
    refresh probes the signature index.

    Returns ``(id_new, id_snapshot, est_jaccard)`` where ``est_jaccard``
    is the signature-agreement estimate (the production verify when the
    snapshot text is unavailable; ±1/num_hashes resolution). Candidates
    come from the same LSH banding as the in-corpus path — the new
    batch's bands equi-join the snapshot's bands, so work scales with
    the batch and the collision count, never |snapshot| × |batch|.

    Signature parameters (``num_hashes``, inferred from the snapshot
    signature length; ``num_bands``; shingle ``n``) must match the ones
    the snapshot was built with — banding positions are positional.
    ``portable=True`` switches both the signature hash (md5 60-bit,
    :func:`minhash_signatures_portable`) and the band bucket (plain
    string) so a SQL oracle can replay the whole probe bit-exactly; the
    default is the fast xxhash64 production path."""
    sig_col = "minhash_sig"
    num_hashes = _sig_len(snapshot_sigs, sig_col, num_bands)
    sig_fn = minhash_signatures_portable if portable else minhash_signatures
    # the batch's signature pipeline (tokenize + shingle + k hashes — the
    # CPU hot spot) feeds BOTH the band join and the agreement join:
    # materialize once, like every multi-consumer intermediate here
    new_sigs = sig_fn(new_docs, id_col, text_col, num_hashes, n).localCheckpoint(
        eager=True
    )
    nb = _band_rows(new_sigs, id_col, num_bands, sig_col, portable=portable)
    sb = _band_rows(snapshot_sigs, id_col, num_bands, sig_col, portable=portable)
    cands = (
        nb.select(F.col("doc").alias("id_new"), "band", "bucket")
        .join(sb.select(F.col("doc").alias("id_snapshot"), "band", "bucket"),
              ["band", "bucket"])
        .select("id_new", "id_snapshot")
        .distinct()
    )
    a = new_sigs.select(F.col(id_col).alias("id_new"), F.col(sig_col).alias("_sa"))
    b = snapshot_sigs.select(
        F.col(id_col).alias("id_snapshot"), F.col(sig_col).alias("_sb")
    )
    return (
        cands.join(a, "id_new")
        .join(b, "id_snapshot")
        .withColumn("est_jaccard", signature_agreement(F.col("_sa"), F.col("_sb")))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_new", "id_snapshot", "est_jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    num_bands: int = 16,
    n: int = 3,
    *,
    index: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash+LSH pipeline: signatures → banding candidates → exact
    Jaccard verification of candidates only. Returns (id_a, id_b, jaccard).
    One materialized shingle index feeds sizes, signatures, and the
    verify join (single tokenize pass, int64 join keys throughout).

    ``index`` accepts a pre-built (ideally checkpointed) ``shingle_index``
    over the SAME docs and n — pipelines that already materialized one
    (``curate.curate_corpus``) then never re-tokenize here."""
    if index is not None:
        _require_index_n(index, n)
        sh = index
    else:
        sh = shingle_index(df, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n, index=sh)
    cands = lsh_candidate_pairs(sigs, id_col, num_bands)
    a = sh.select(F.col("doc").alias("id_a"), "shingle")
    b = sh.select(F.col("doc").alias("id_b"), "shingle")
    common = (
        a.join(cands, "id_a")  # restrict the inverted-index join to candidates
        .join(b, ["shingle", "id_b"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"doc": "id_a", "n_shingles": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc": "id_b", "n_shingles": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def contaminated_ids(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    min_common: int = 1,
    *,
    tokens_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination scan: training docs sharing ≥``min_common``
    word ``n``-gram shingles with an evaluation corpus — the standard
    guard against eval leakage into a training set. Returns
    (id, n_common_shingles).

    Plan: both corpora ride the int64 ``shingle_index``; the eval side is
    reduced to DISTINCT shingles (benchmark suites are tiny next to the
    training corpus — AQE broadcasts that side), the join output is just
    (doc, shingle) hits, and the per-doc count is map-side combined.
    The training text itself never shuffles."""
    train = shingle_index(df, id_col, text_col, n, tokens_col=tokens_col)
    evals = shingle_index(
        eval_df, id_col, text_col, n, tokens_col=tokens_col
    ).select("shingle").distinct()
    return (
        train.join(evals, "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_common_shingles"))
        .filter(F.col("n_common_shingles") >= min_common)
        .select(F.col("doc").alias(id_col), "n_common_shingles")
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    min_common: int = 1,
) -> DataFrame:
    """Drop the contaminated docs (anti join on :func:`contaminated_ids`)."""
    flagged = contaminated_ids(df, eval_df, id_col, text_col, n, min_common)
    return df.join(flagged.select(id_col), id_col, "left_anti")


def contamination_score(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Graded leakage score per training doc — the measured companion of
    the binary :func:`contaminated_ids` flag: ``overlap_frac`` is the
    fraction of the doc's DISTINCT word ``n``-gram shingles present
    anywhere in the eval corpus (1.0 ⇒ verbatim inclusion; small values
    ⇒ shared idioms). Lets a curation run set a threshold instead of
    dropping on a single shared shingle.

    Same plan shape as ``contaminated_ids`` (training text never
    shuffles, eval side distinct + broadcast-sized) plus the per-doc
    shingle sizes the Jaccard path already computes. All integer counts
    until one final division — oracle hash-matches exactly (modulo the
    xxhash64 collision class every hashed-shingle path accepts).
    """
    # Materialize the training index ONCE: sizes and hits both consume it,
    # and without the checkpoint the tokenize/shingle pass plus the doc-id
    # repartition shuffle over the (large) training corpus would execute
    # twice — mirroring ngram_jaccard_pairs' convention.
    train = shingle_index(df, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = train.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    evals = shingle_index(eval_df, id_col, text_col, n).select("shingle").distinct()
    hits = (
        train.join(evals, "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        sizes.join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0)) / F.col("n_shingles"), 6
            ).alias("overlap_frac"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc in one pass: token → xxhash64 → each bit
    contributes ±1; signature bit = sign of the sum. Output (id, simhash).
    Repartitioned on doc id like shingle_index: parallelizes the tokenizer
    and makes the per-doc bit aggregation shuffle-free.

    The token hash is projected ONCE before the aggregation — aggregate
    expressions get no common-subexpression elimination, so folding
    ``xxhash64(t)`` into each of the 64 sums would re-hash the string 64×
    per row (the dominant cost, verified in the physical plan). The ±1 sum
    is computed as a plain ones-count with a majority test afterwards
    (sign(Σ±1) > 0 ⇔ 2·ones > n): dropping the per-bit CASE WHEN halves
    the generated-code size, and this aggregation's one-time janino
    compile is the operator's fixed cost."""
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    tok = (
        df.repartition(nparts, F.col(id_col))
        .select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t"))
        .select("doc", F.xxhash64("t").alias("h"))
    )
    h = F.col("h")
    sums = tok.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_"),
        *[
            F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"b{i}")
            for i in range(64)
        ],
    )
    sig = sums.select(
        F.col("doc").alias(id_col),
        sum(
            [
                F.when(F.col(f"b{i}") * 2 > F.col("n_"), F.lit(1).cast("long") * (1 << i)).otherwise(0)
                for i in range(63)  # bit 63 kept clear to stay in signed range
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k. Candidates via
    4-block banding (docs sharing any 16-bit block), exact popcount verify.
    Signatures are materialized: the banding self-join would otherwise
    execute the signature aggregation twice (once per side)."""
    sigs = simhash(df, id_col, text_col).localCheckpoint(eager=True)
    blocks = sigs.select(
        F.col(id_col).alias("doc"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc", "simhash", "bb.blk", "bb.v")
    a = blocks.select(F.col("doc").alias("id_a"), F.col("simhash").alias("sig_a"), "blk", "v")
    b = blocks.select(F.col("doc").alias("id_b"), F.col("simhash").alias("sig_b"), "blk", "v")
    cands = (
        a.join(b, ["blk", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine between two array<numeric> columns, computed in double.
    zip_with + aggregate stay inside codegen — no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na == 0) | (nb == 0), F.lit(None)).otherwise(dot / (na * nb))


def embedding_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "matmul",
    max_broadcast_bytes: int = 2 * 1024**3,
) -> DataFrame:
    """Brute-force O(n²/2) cosine pairs ≥ threshold — the exact baseline.

    ``method='matmul'`` (default): Arrow-batched blocked matrix multiply —
    the corpus is broadcast as one normalized float64 matrix (same
    fits-in-memory contract as a broadcast join side) and each partition's
    block of vectors hits it with a single BLAS GEMM inside
    ``mapInPandas``. This is ~50× faster than evaluating interpreted
    array-fold expressions per pair and is how an exact all-pairs pass
    should look on a cluster: corpus broadcast once, O(n²) flops
    distributed across executors, only (id, id, cos) survivors shuffled.

    ``method='expr'``: pure Column-expression cross join (no Python, no
    broadcast-size ceiling on either side) — the fallback when the corpus
    out-sizes a broadcast; at that scale prefer similarity.lsh_ann to cut
    candidates first.

    The fits-in-memory contract is ENFORCED, not assumed:
    ``max_broadcast_bytes`` (default 2 GiB) caps the estimated matrix
    size (rows × dim × 8 bytes, probed with one tiny aggregate before
    any collect) and the matmul path raises a clear error instead of
    OOMing the driver when the corpus exceeds it."""
    from pyspark.sql import types as T

    id_type = embeddings.schema[id_col].dataType
    integral = isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    if method == "expr" or not integral:
        # non-integral ids can't ride the int64 numpy kernel — the expr
        # path compares ids with Spark's own ordering and supports any type
        a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
        )

    import numpy as np
    import pandas as pd

    # NULL embeddings produce NULL cosine in the expr path and can never
    # pass the threshold — dropping them up front preserves semantics and
    # keeps np.vstack well-defined
    base = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # Materialize before probing: the probe aggregate and the broadcast
    # collect would otherwise each execute the full upstream embedding
    # plan — doubling the cost of any derived pipeline feeding this. The
    # checkpoint lives on executors (distributed), so it is not itself
    # bounded by the driver-memory cap being enforced here; mapInPandas
    # below also reads from it instead of re-deriving.
    base = base.localCheckpoint(eager=False)  # pinned by the probe collect
    probe = base.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size("v")).alias("dim")
    ).collect()[0]
    est_bytes = int(probe["n"] or 0) * int(probe["dim"] or 0) * 8
    if est_bytes > max_broadcast_bytes:
        raise ValueError(
            f"embedding corpus ≈{est_bytes / 1024**3:.1f} GiB "
            f"({probe['n']} vectors × {probe['dim']} dims × 8 B) exceeds the "
            f"matmul broadcast cap of {max_broadcast_bytes / 1024**3:.1f} GiB "
            "— use method='expr' (no broadcast ceiling) or "
            "similarity.lsh_ann (the scale path), or raise "
            "max_broadcast_bytes if the driver really has the memory"
        )
    # Arrow transfer, not row collect: ``collect()`` pickles every row's
    # array<double> element-by-element through Py4J (measured as the
    # dominant driver cost of this pull at a few thousand vectors), while
    # ``toPandas()`` rides the session's Arrow path and lands columnar
    # buffers that vstack straight into the GEMM operand.
    corpus = base.toPandas()
    ids_b = corpus["id"].to_numpy(dtype=np.int64)
    mat_b = (
        np.vstack(corpus["v"].to_numpy())
        if len(corpus)
        else np.empty((0, 0), dtype=np.float64)
    ).astype(np.float64)
    norms_b = np.sqrt((mat_b * mat_b).sum(axis=1))
    bc = embeddings.sparkSession.sparkContext.broadcast((ids_b, mat_b, norms_b))

    def block(batches):
        jds, jmat, jnorm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a_mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            a_ids = pdf["id"].to_numpy(dtype=np.int64)
            a_norm = np.sqrt((a_mat * a_mat).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (a_mat @ jmat.T) / (a_norm[:, None] * jnorm[None, :])
            # NaN (zero-norm) compares False, matching the expr path's NULL
            mask = (a_ids[:, None] < jds[None, :]) & (sims >= threshold)
            r, c = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": a_ids[r], "id_b": jds[c], "cos": sims[r, c]}
            )

    pairs = base.mapInPandas(block, schema="id_a long, id_b long, cos double")
    return pairs.select(
        F.col("id_a").cast(embeddings.schema[id_col].dataType),
        F.col("id_b").cast(embeddings.schema[id_col].dataType),
        F.round("cos", 6).alias("cosine"),
    )


def source_dup_matrix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Cross-source duplication matrix: for every (source, source) pair,
    how many near-dup document pairs span it and their mean similarity —
    ``(source_a, source_b, n_pairs, avg_jaccard)``, sources ordered
    lexicographically within each row so the matrix is one canonical
    triangle (diagonal rows = within-source duplication).

    The curation diagnostic behind source-level decisions: a source
    whose row against an existing corpus is hot is a mirror/scrape and
    gets dropped WHOLESALE before any per-document work; a hot diagonal
    means boilerplate within the source. Candidates come from the same
    inverted shingle index as :func:`ngram_jaccard_pairs` (never
    all-pairs); attaching sources is two id-keyed equi joins against the
    (id → source) projection, and the matrix aggregate is vocab-of-
    sources sized — nothing here scales with |corpus|².

    ``avg_jaccard`` averages the already-6dp-rounded pair similarities
    and rounds to 4dp (the qd03 convention), so engine summation-order
    ulps can't surface.

    A null ``group_col`` coalesces to the ``'(null)'`` sentinel BEFORE
    canonicalization — ``least``/``greatest`` over a null would otherwise
    null the whole cell key and fold every unlabelled document into one
    ambiguous matrix row that joins to nothing downstream."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    meta = df.select(
        F.col(id_col), F.coalesce(F.col(group_col), F.lit("(null)")).alias(group_col)
    )
    labelled = (
        pairs.join(
            meta.select(
                F.col(id_col).alias("id_a"), F.col(group_col).alias("_ga")
            ),
            "id_a",
        )
        .join(
            meta.select(
                F.col(id_col).alias("id_b"), F.col(group_col).alias("_gb")
            ),
            "id_b",
        )
        .select(
            F.least("_ga", "_gb").alias("source_a"),
            F.greatest("_ga", "_gb").alias("source_b"),
            "jaccard",
        )
    )
    return labelled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("jaccard"), 4).alias("avg_jaccard"),
    )


def _dup_window_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    widths: "list[int]",
    salt: str,
    *,
    width_in_salt: bool,
):
    """Shared core of the span-dedup operators: tokenize ONCE, emit every
    ``w``-token window of every width as ``(id, _w, _pos, _end, _g)``
    via in-row ``transform(sequence)`` (no self-join, no extra corpus
    pass per width), hash windows to md5-portable 60-bit ints (the
    shuffle moves fixed-width ints, never text), and keep only windows
    seen in MORE THAN ONE distinct document (two map-side-combined
    aggregations — no count_distinct Expand blowup). Returns
    ``(base, dup_pos)`` where ``base`` is ``(id, n_tokens, _t)`` for
    the zero-fill join. Cost is Σ windows ≈ |widths| × Σ tokens, linear in
    the corpus.

    ``width_in_salt`` prefixes the width into the hash salt (so a
    w-window can never collide with a 2w-window when several widths
    share one frequency pass); the single-width callers keep the
    historical ``{salt}|`` format the qd61 oracle replays. ``base``
    also carries the token array ``_t`` so the removal operator can
    rebuild text without a second tokenize (the stats callers project
    it away).

    The per-width window arrays are PLAIN ``array<long>`` hash columns,
    one explode branch per width unioned afterwards — NOT structs built
    inside ``transform``: a ``named_struct`` in the lambda body drops
    the whole stage out of codegen and measured 10× slower at sf0.1;
    position and end re-derive from ``posexplode``'s index + the
    branch's literal width for free.

    Collisions: two DIFFERENT spans hashing together would count as
    cross-doc duplicates; at 60 bits the birthday bound is ~2^30
    distinct windows per expected collision — and the SQL twins replay
    the same hash, so the gate check is exact either way."""
    t = tokens(text_col)
    # PIN the tokenized base: it feeds one explode branch PER WIDTH plus
    # the caller's zero-fill grid (and, for removal, the text rebuild) —
    # as a lazy plan each consumer re-ran the tokenizer regex over the
    # corpus, so a 3-width profile tokenized 4×. One materialized pass
    # is the "tokenize ONCE" the operator always claimed.
    base = df.select(F.col(id_col), t.alias("_t")).select(
        F.col(id_col), F.size("_t").alias("n_tokens"), "_t"
    ).localCheckpoint(eager=True)

    def width_branch(w: int) -> DataFrame:
        gram_salt = f"{salt}|{w}|" if width_in_salt else f"{salt}|"
        grams = F.when(
            F.size("_t") >= w,
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - w + 1),
                lambda i: md5_60bit(
                    F.concat(
                        F.lit(gram_salt),
                        F.concat_ws(" ", F.slice("_t", i, w)),
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<long>"))
        return (
            base.select(F.col(id_col), F.posexplode(grams).alias("_i", "_g"))
            .select(
                F.col(id_col),
                F.lit(w).cast("int").alias("_w"),
                (F.col("_i") + 1).cast("int").alias("_pos"),
                (F.col("_i") + 1 + w).cast("int").alias("_end"),
                "_g",
            )
        )

    pos = width_branch(widths[0])
    for w in widths[1:]:
        pos = pos.unionByName(width_branch(w))
    # "occurs in MORE THAN ONE document" as two stacked window counts
    # instead of [groupBy(_g, id) → groupBy(_g) → join back to pos]: the
    # lazy ``pos`` union fed BOTH the aggregation chain and the join, so
    # every window was md5-hashed and exploded TWICE and the plan paid
    # three exchanges. A gram is cross-doc duplicated iff its total
    # occurrence count exceeds its own-document count — per-row longs,
    # no sets — and hashpartitioning(_g) satisfies both window specs
    # (exprs ⊆ partition keys), so the whole dup test is ONE exchange +
    # one sort over a single md5 pass. Identical row set: kept ⟺ the
    # gram has an occurrence outside the row's document.
    n_all = F.count(F.lit(1)).over(Window.partitionBy("_g"))
    n_own = F.count(F.lit(1)).over(Window.partitionBy("_g", id_col))
    dup_pos = (
        pos.withColumn("_xdoc", n_all > n_own)
        .filter(F.col("_xdoc"))
        .drop("_xdoc")
    )
    return base.select(id_col, "n_tokens", "_t"), dup_pos


def _interval_union(dup_pos: DataFrame, keys: "list[str]") -> DataFrame:
    """Covered-token union of ``[pos, end)`` intervals per key group:
    classic running-max sweep over start-sorted intervals — each row
    contributes how far its window extends past everything before it
    (any tie order among equal starts sums to the same union length).
    Each group's dup windows are a short sorted list, so the window
    function is cheap and key-parallel."""
    w = (
        Window.partitionBy(*keys)
        .orderBy("_pos", "_end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        dup_pos.withColumn("_prev_end", F.max(F.col("_end")).over(w))
        .withColumn(
            "_cov",
            F.greatest(
                F.lit(0),
                F.col("_end")
                - F.greatest(
                    F.coalesce("_prev_end", F.col("_pos")), F.col("_pos")
                ),
            ),
        )
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("dup_spans"),
            F.sum("_cov").cast("long").alias("dup_tokens"),
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    span: int = 8,
    salt: str = "dupspan",
) -> DataFrame:
    """Span-level exact substring dedup (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" move, at
    fixed token-window granularity): find every ``span``-token window
    that occurs in MORE THAN ONE document, merge each document's
    duplicated windows into covered-token intervals, and report
    ``(id, n_tokens, dup_spans, dup_tokens, dup_fraction)``. Where
    :func:`ngram_jaccard_pairs` asks "are these two DOCUMENTS near-dups",
    this asks "which PARTS of this document are copied from elsewhere" —
    the boilerplate/quotation signal used to cut memorization, filtering
    on ``dup_fraction``. Documents shorter than ``span`` tokens have no
    windows and report zero duplication. Because windows slide at stride
    1, the covered union is EXACTLY the tokens inside maximal cross-doc
    shared runs of length ≥ ``span`` — i.e. Lee et al.'s any-length
    "matches of at least N tokens" semantics with N = ``span``; for the
    duplication profile across several thresholds use
    :func:`duplicate_span_profile`.

    Plan (100 TB story): see :func:`_dup_window_positions` (one
    tokenize, in-row window generation, int-only shuffles) and
    :func:`_interval_union` (per-document sweep). The qd61 oracle
    replays hash, sweep, and rounding bit-exactly."""
    base, dup_pos = _dup_window_positions(
        df, id_col, text_col, [int(span)], salt, width_in_salt=False
    )
    covered = _interval_union(dup_pos, [id_col])
    return (
        base.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    min_len: int = 8,
    salt: str = "dupspan",
) -> DataFrame:
    """Span-level exact substring dedup REMOVAL — the ACTION step of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"): where :func:`duplicate_span_stats` measures which tokens
    sit inside cross-document shared runs of ≥ ``min_len`` tokens, this
    CUTS those tokens out of each document and returns
    ``(id, text, n_tokens, n_removed_tokens)`` — every input row
    preserved, a fully-covered document becoming the empty string (the
    empty-doc convention), and ``n_removed_tokens`` equal to the
    profile's ``dup_tokens`` at the same threshold by construction
    (gate qd68 ties them independently).

    The output ``text`` is the space-joined KEPT tokens — the engine's
    canonical tokenized form (:func:`~...text.tokens` lowercases and
    strips punctuation), the representation every downstream span/dedup
    operator consumes; original whitespace/casing is not reconstructed.

    Plan (100 TB story): one tokenize + one window-frequency shuffle
    (:func:`_dup_window_positions` — the shuffle moves 60-bit ints,
    never text); overlapping duplicated windows merge into disjoint
    intervals with the running-max sweep (a new interval starts where
    ``_pos`` clears the running max end; intervals are per-document and
    few, so the window function is cheap and key-parallel); each
    document then rebuilds its text IN-ROW from the gap slices between
    its sorted intervals — ``flatten(zip_with(gap_starts, gap_ends,
    slice))``, plain long arrays and field-free lambdas that stay
    inside whole-stage codegen (the named-struct-in-transform cliff
    documented on :func:`_dup_window_positions`). Because merged
    intervals are disjoint, independently sorting starts and ends keeps
    them aligned — no struct collection anywhere. Work is linear in
    corpus tokens; nothing driver-side."""
    w = int(min_len)
    if w < 1:
        raise ValueError(f"min_len must be a positive int, got {min_len!r}")
    base, dup_pos = _dup_window_positions(
        df, id_col, text_col, [w], salt, width_in_salt=False
    )
    sweep = (
        Window.partitionBy(id_col)
        .orderBy("_pos", "_end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy(id_col)
        .orderBy("_pos", "_end")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        dup_pos.withColumn("_prev_end", F.max("_end").over(sweep))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_end").isNull()
                | (F.col("_pos") > F.col("_prev_end")),
                1,
            ).otherwise(0),
        )
        .withColumn("_grp", F.sum("_new").over(run))
        .groupBy(id_col, "_grp")
        .agg(F.min("_pos").alias("_s"), F.max("_end").alias("_e"))
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list("_s")).alias("_ss"),
            F.array_sort(F.collect_list("_e")).alias("_es"),
        )
    )
    ss = F.coalesce("_ss", F.array().cast("array<int>"))
    es = F.coalesce("_es", F.array().cast("array<int>"))
    gap_s = F.concat(F.array(F.lit(1).cast("int")), es)
    gap_e = F.concat(ss, F.array((F.size("_t") + 1).cast("int")))
    kept = F.flatten(
        F.zip_with(
            gap_s,
            gap_e,
            lambda s, e: F.slice(F.col("_t"), s, F.greatest(e - s, F.lit(0))),
        )
    )
    return (
        base.join(merged, id_col, "left")
        .withColumn("_kept", kept)
        .select(
            F.col(id_col),
            F.concat_ws(" ", "_kept").alias(text_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.size("_kept"))
            .cast("long")
            .alias("n_removed_tokens"),
        )
    )


def duplicate_span_profile(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    min_lens: "Sequence[int]" = (8, 16, 32, 64),
    salt: str = "dupspan",
) -> DataFrame:
    """Variable-length substring-dedup PROFILE (round-10 verdict #3 —
    the full Lee et al. 2021 semantics): for EACH minimum match length
    in ``min_lens``, report per document the tokens lying inside
    cross-document exact shared runs of AT LEAST that length —
    ``(id, min_len, n_tokens, dup_spans, dup_tokens, dup_fraction)``,
    one row per (document, threshold), zeros where nothing matches.

    Why this is exact for ANY match length (no suffix array needed):
    windows slide at stride 1, so a shared run of length L ≥ w produces
    L−w+1 duplicated w-windows whose interval union covers exactly its
    L tokens — non-aligned run boundaries included; conversely every
    duplicated w-window lies inside such a run. The union of duplicated
    w-windows therefore EQUALS the coverage of shared runs ≥ w, and the
    per-width unions form the match-length profile (monotone
    non-increasing in ``min_len`` — gate-checked, qd64). Lee et al.'s
    "remove matches ≥ 50 tokens" is ``min_len=50``'s row; the smaller
    thresholds expose the boilerplate tail.

    Plan (100 TB story): ONE tokenize and ONE window-frequency shuffle
    for all widths (:func:`_dup_window_positions`, widths salted apart);
    the sweep partitions by (document, width) (:func:`_interval_union`);
    the zero-fill grid is |docs| × |widths| rows. Cost ≈ |widths| ×
    Σ tokens, linear in the corpus."""
    widths = sorted({int(w) for w in min_lens})
    if not widths or widths[0] < 1:
        raise ValueError(f"min_lens must be positive ints, got {min_lens!r}")
    base, dup_pos = _dup_window_positions(
        df, id_col, text_col, widths, salt, width_in_salt=True
    )
    covered = _interval_union(dup_pos, [id_col, "_w"])
    grid = base.select(
        F.col(id_col),
        "n_tokens",
        F.explode(F.array(*[F.lit(w) for w in widths])).alias("min_len"),
    )
    return (
        grid.join(
            covered.withColumnRenamed("_w", "min_len"), [id_col, "min_len"], "left"
        )
        .select(
            F.col(id_col),
            F.col("min_len").cast("int").alias("min_len"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )
