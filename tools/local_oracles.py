"""Gate-local DuckDB oracle twins for the xxhash64-based production paths.

The four registry keys qd09/qd10/qd11/qd16 run Spark's seeded ``xxhash64``
(MinHash seeds, LSH band buckets, SimHash token hashes) or the IVF
k-means refinement — none of which vanilla ANSI SQL can reproduce, so the
DRIVER's correctness gate records a rows-only check for them (their
``oracle_sql()`` entries are deliberately absent: the driver's DuckDB
connection has no way to register a Python scalar, and an unknown
function would turn a by-design rows-only key into a hard FAIL).

This module closes the gap for the LOCAL gate (tools/oracle_check.py):

- :func:`register` installs numpy-vectorized ``xxh64long``/``xxh64int``
  and a ``xxh64str`` scalar on the gate's DuckDB connection — validated
  bit-exact against Spark's ``xxhash64`` in tests/test_local_oracles.py
  (strings incl. unicode + >32-byte stripes, longs, and the chained
  (long, int-literal) MinHash seed pattern).
- :func:`local_oracle_sql` returns full-pipeline SQL twins keyed like the
  registry; oracle_check merges them over ``oracle_sql()`` so the gate
  value-checks EVERY key (0 SKIP target), while the driver-facing
  ``oracle_sql()`` contract is unchanged.
- Round 9 adds ``bpe_merges_py`` — an independent pure-Python reference
  BPE trainer (qd62's twin): the merge loop is not ANSI-SQL-expressible,
  so like the seeded-hash keys it is value-checked locally and rows-only
  at the driver.

Every twin replays the ENTIRE production pipeline — tokenize → shingle →
seeded min-hash → banding → candidate join → verify (qd09), token-hash
bit-majority signature → block banding → Hamming verify (qd10),
hyperplane sign bits → band join → exact cosine rerank (qd11), and
seeded centroids → 2 spherical-Lloyd iterations → cell assignment →
n_probe search → rerank (qd16) — with the same tie-breaks the Spark
operators use. The recall gates qd25/qd26/qd27 remain the semantic
safety net; these twins add value-level equality on top.

Float caveat (qd16): the k-means means/dots reduce in a different order
than numpy's GEMM, so sims differ at ~1e-15; an argmax/rank flip needs
two genuinely tied similarities, which the synthetic corpus does not
produce (and the gate would surface loudly if it ever did).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tools.xxh64_py import hash4_vec, hash8_vec, xxh64_bytes

# Shared tokenizer fragment — keep in lockstep with queries_llm._TOKS.
_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_COS = f"{_DOT.format(a='{a}', b='{b}')} / ({_NORM.format(v='{a}')} * {_NORM.format(v='{b}')})"


def _np_in(arr: pa.ChunkedArray | pa.Array, dtype) -> np.ndarray:
    """pyarrow → numpy with nulls zero-filled (inputs here are never null
    in the replayed pipelines; zero-fill just keeps the kernel total)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(arr.fill_null(0).to_numpy(zero_copy_only=False), dtype=dtype)


def register(con) -> None:
    """Install the Spark-xxhash64 twins on a DuckDB connection."""

    def _long(x, seed):
        h = hash8_vec(_np_in(x, np.int64).view(np.uint64), _np_in(seed, np.int64).view(np.uint64))
        return pa.array(h.view(np.int64), type=pa.int64())

    def _int(x, seed):
        # Spark hashes IntegerType via the 4-byte path on (input & 0xFFFFFFFF)
        v = _np_in(x, np.int64).view(np.uint64) & np.uint64(0xFFFFFFFF)
        h = hash4_vec(v, _np_in(seed, np.int64).view(np.uint64))
        return pa.array(h.view(np.int64), type=pa.int64())

    def _str(s, seed):
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(seed, pa.ChunkedArray):
            seed = seed.combine_chunks()
        seeds = np.asarray(seed.fill_null(0).to_numpy(zero_copy_only=False), dtype=np.uint64)
        out = np.empty(len(s), dtype=np.uint64)
        for i, v in enumerate(s):
            sv = v.as_py()
            out[i] = xxh64_bytes(("" if sv is None else sv).encode("utf-8"), int(seeds[i]))
        return pa.array(out.view(np.int64), type=pa.int64())

    con.create_function("xxh64long", _long, ["BIGINT", "BIGINT"], "BIGINT", type="arrow")
    con.create_function("xxh64int", _int, ["BIGINT", "BIGINT"], "BIGINT", type="arrow")
    con.create_function("xxh64str", _str, ["VARCHAR", "BIGINT"], "BIGINT", type="arrow")
    con.create_function(
        "bpe_merges_py",
        _bpe_reference,
        ["VARCHAR[]", "BIGINT[]", "INTEGER", "INTEGER"],
        "STRUCT(rank INTEGER, s1 VARCHAR, s2 VARCHAR, freq BIGINT)[]",
    )
    con.create_function(
        "unigram_pieces_py",
        _unigram_reference,
        ["VARCHAR[]", "BIGINT[]", "INTEGER", "INTEGER", "INTEGER", "INTEGER"],
        "STRUCT(piece VARCHAR, count BIGINT, logp DOUBLE)[]",
    )


def _bpe_reference(ws, cs, k, min_freq):
    """Independent pure-Python reference BPE trainer (Sennrich semantics:
    overlap-counted pair statistics, greedy left-to-right merge
    application, (freq desc, s1, s2) argmax tie-break) — the qd62 twin.
    Deliberately shares no code with ``vocab.train_bpe``'s JVM
    expressions; agreement of the two merge tables is the check."""
    segs = {w: tuple(w) for w in ws}
    wcnt = dict(zip(ws, cs))
    merges = []
    for rank in range(1, k + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, cnt in wcnt.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnt
        if not pc:
            break
        (s1, s2), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_freq:
            break
        merges.append({"rank": rank, "s1": s1, "s2": s2, "freq": freq})
        m = s1 + s2
        for w, s in segs.items():
            out: list[str] = []
            prev = None
            for x in s:
                if prev == s1 and x == s2:
                    out.append(m)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            segs[w] = tuple(out)
    return merges


def _unigram_reference(ws, cs, vocab_size, max_piece_len, em_iters, seed_mult):
    """Independent pure-Python reference unigram-LM trainer (Kudo 2018
    semantics as specified by ``llm/unigram.py``'s determinism contract:
    substring seeding with (count desc, piece asc) top-k, Viterbi ties
    toward the longer last piece, integer E-step counts, single-char
    floor at 1, likelihood-loss pruning ranked (loss desc, count desc,
    piece asc)) — the qd65 twin. Deliberately shares no code with the
    engine module; agreement of the final (piece, count, logp) tables is
    the check."""
    from math import log

    wn = dict(zip(ws, cs))
    L = int(max_piece_len)

    def probs(cnt):
        kept = {}
        for p, c in cnt.items():
            c2 = c if len(p) > 1 else max(c, 1)
            if c2 > 0:
                kept[p] = c2
        tot = sum(kept.values())
        return {p: log(c / tot) for p, c in kept.items()}

    def viterbi(word, lp):
        n = len(word)
        score = {0: 0.0}
        back = {}
        for i in range(1, n + 1):
            # descending length + strict > keeps the LONGEST tied piece
            for ln in range(min(i, L), 0, -1):
                if i - ln not in score:
                    continue
                pc = word[i - ln:i]
                w_lp = lp.get(pc, -1e9 if ln == 1 else None)
                if w_lp is None:
                    continue
                cand = score[i - ln] + w_lp
                if i not in score or cand > score[i]:
                    score[i], back[i] = cand, ln
        pieces = []
        j = n
        while j > 0:
            pieces.insert(0, word[j - back[j]:j])
            j -= back[j]
        return pieces, score[n]

    # seeding: weighted substring counts over word types
    cand: dict[str, int] = {}
    for w, c in wn.items():
        for i in range(len(w)):
            for ln in range(1, min(L, len(w) - i) + 1):
                s = w[i:i + ln]
                cand[s] = cand.get(s, 0) + c
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multi_top = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[: int(seed_mult) * int(vocab_size)]
    counts = dict(singles)
    counts.update(dict(multi_top))

    def prune(cnt):
        budget = int(vocab_size)
        multis = [p for p in cnt if len(p) > 1]
        if len(multis) <= budget:
            return cnt
        lp = probs(cnt)
        ranked = []
        for p in sorted(multis):
            rest = dict(lp)
            del rest[p]
            _, alt = viterbi(p, rest)
            ranked.append((cnt[p] * (lp[p] - alt), cnt[p], p))
        ranked.sort(key=lambda t: (-t[0], -t[1], t[2]))
        keep = {t[2] for t in ranked[:budget]}
        return {p: c for p, c in cnt.items() if len(p) == 1 or p in keep}

    for _ in range(int(em_iters)):
        lp = probs(counts)
        used: dict[str, int] = {}
        for w, c in wn.items():
            for p in viterbi(w, lp)[0]:
                used[p] = used.get(p, 0) + c
        counts = {p: c for p, c in used.items() if c > 0}
        for ch in singles:
            if ch not in counts:
                counts[ch] = 0
        counts = prune(counts)

    final = probs(counts)
    return [
        {"piece": p, "count": counts[p], "logp": final[p]}
        for p in sorted(final)
    ]


# ---------------------------------------------------------------------------
# SQL twins
# ---------------------------------------------------------------------------


def _qd09_sql(num_hashes: int = 64, num_bands: int = 16) -> str:
    """minhash_dedup_pairs(docs, 'doc_id', threshold=0.8): n=3 shingles →
    xxhash64(str) int64 shingles → per-seed MIN of the chained
    xxhash64(shingle, lit(i)) → 16 string-concat band buckets hashed with
    xxhash64 → (band, bucket) candidate join → exact Jaccard ≥ 0.8."""
    rpb = num_hashes // num_bands
    mins = ", ".join(
        f"MIN(xxh64int({i}, base)) AS h{i}" for i in range(num_hashes)
    )
    bands = ", ".join(
        "{'band': %d, 'bucket': xxh64str(concat_ws(',', %s), 42)}"
        % (b, ", ".join(f"h{b * rpb + r}" for r in range(rpb)))
        for b in range(num_bands)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS shingles
      FROM toks WHERE len(t) >= 3
    ), exs AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), ex AS MATERIALIZED (
      SELECT doc_id, xxh64str(s, 42) AS sh64 FROM exs
    ), sizes AS (
      SELECT doc_id, len(shingles) AS n FROM sh
    ), seeded AS MATERIALIZED (
      SELECT doc_id, xxh64long(sh64, 42) AS base FROM ex
    ), mins AS MATERIALIZED (
      SELECT doc_id, {mins} FROM seeded GROUP BY doc_id
    ), bands AS MATERIALIZED (
      SELECT doc_id, unnest([{bands}], recursive := true) FROM mins
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), common AS (
      SELECT c.id_a, c.id_b, count(*) AS cnt
      FROM cands c
      JOIN ex ea ON ea.doc_id = c.id_a
      JOIN ex eb ON eb.doc_id = c.id_b AND eb.sh64 = ea.sh64
      GROUP BY 1, 2
    )
    SELECT c.id_a, c.id_b,
           round(CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt), 6) AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.doc_id
    JOIN sizes sb ON c.id_b = sb.doc_id
    WHERE CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) >= 0.8
    """


def _qd10_sql(max_hamming: int = 3) -> str:
    """simhash_pairs(docs, 'doc_id', max_hamming=3): token → xxhash64 →
    63-bit majority signature → 4×16-bit block candidates → popcount."""
    sums = ", ".join(f"SUM((h >> {i}) & 1) AS b{i}" for i in range(63))
    sig = " + ".join(
        f"(CASE WHEN 2 * b{i} > n_ THEN {1 << i} ELSE 0 END)" for i in range(63)
    )
    blocks = ", ".join(
        "{'blk': %d, 'v': (simhash >> %d) & 65535}" % (b, b * 16) for b in range(4)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ), h AS MATERIALIZED (
      SELECT doc_id, xxh64str(t, 42) AS h FROM tok
    ), sums AS (
      SELECT doc_id, count(*) AS n_, {sums} FROM h GROUP BY doc_id
    ), sig AS MATERIALIZED (
      SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM sums
    ), blocks AS (
      SELECT doc_id, simhash, unnest([{blocks}], recursive := true) FROM sig
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM blocks a JOIN blocks b
        ON a.blk = b.blk AND a.v = b.v AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
    FROM cands WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


def _qd11_sql(k: int = 5, num_bands: int = 4, rows_per_band: int = 4) -> str:
    """lsh_ann_topk(emb, emb[vec_id<8], k=5): hyperplane sign signature
    (identical plane literals to qd15's oracle) → band buckets → candidate
    join → exact cosine rerank, ties → lower neighbor_id."""
    from sql_data_warehouse_analytics_project_spark.queries_llm import _lsh_plane_sql

    mask = (1 << rows_per_band) - 1
    bands = ", ".join(
        "{'band': %d, 'bucket': (lsh_sig >> %d) & %d}" % (b, b * rows_per_band, mask)
        for b in range(num_bands)
    )
    cos = _COS.format(a="query_vec", b="neighbor_vec")
    return f"""
    WITH sig AS MATERIALIZED (
      SELECT vec_id, embedding, CAST({_lsh_plane_sql()} AS BIGINT) AS lsh_sig
      FROM embeddings
    ), qb AS (
      SELECT vec_id AS query_id, embedding AS query_vec,
             unnest([{bands}], recursive := true)
      FROM sig WHERE vec_id < 8
    ), cb AS (
      SELECT vec_id AS neighbor_id, embedding AS neighbor_vec,
             unnest([{bands}], recursive := true)
      FROM sig
    ), cands AS (
      SELECT DISTINCT query_id, query_vec, neighbor_id, neighbor_vec
      FROM qb JOIN cb ON qb.band = cb.band AND qb.bucket = cb.bucket
                     AND query_id <> neighbor_id
    ), scored AS (
      SELECT query_id, neighbor_id, {cos} AS cos FROM cands
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _qd16_sql(
    n_centroids: int = 16, kmeans_iters: int = 2, n_probe: int = 4, k: int = 5
) -> str:
    """ivf_ann_topk(emb, emb[vec_id<8], k=5): seed centroids = the 16
    lowest-vec_id vectors; 2 spherical-Lloyd refinements (assign unit
    vectors to argmax unit-centroid dot, ties → lower cid; centroid =
    element-wise mean of assigned unit vectors, empty keeps previous);
    corpus cell assignment + 4-probe query search on raw-vector cosine
    (zero norms → -2 sentinel, matching the kernel's nan_to_num); exact
    cosine rerank of probed cells only."""
    unit = (
        "CASE WHEN {n} = 0 THEN {v} ELSE list_transform({v}, x -> x / {n}) END"
    )
    iters = []
    prev = "c0"
    for it in range(1, kmeans_iters + 1):
        iters.append(f"""
    cu{it} AS (
      SELECT cid, {unit.format(v='c', n=_NORM.format(v='c'))} AS cu FROM {prev}
    ), a{it} AS (
      SELECT vec_id, u, cid FROM (
        SELECT un.vec_id, un.u, cu.cid,
               row_number() OVER (PARTITION BY un.vec_id
                                  ORDER BY {_DOT.format(a='un.u', b='cu.cu')} DESC, cu.cid) AS rn
        FROM unit un CROSS JOIN cu{it} cu
      ) WHERE rn = 1
    ), m{it} AS (
      SELECT cid, list(avg_val ORDER BY i) AS c FROM (
        SELECT cid, i, avg(val) AS avg_val FROM (
          SELECT cid, unnest(u) AS val, generate_subscripts(u, 1) AS i FROM a{it}
        ) GROUP BY cid, i
      ) GROUP BY cid
    ), c{it} AS MATERIALIZED (
      SELECT p.cid, coalesce(m.c, p.c) AS c FROM {prev} p LEFT JOIN m{it} m USING (cid)
    )""")
        prev = f"c{it}"
    iter_sql = ",".join(iters)
    sim = (
        f"CASE WHEN {_NORM.format(v='e.v')} * n.cn = 0 THEN -2.0 "
        f"ELSE {_DOT.format(a='e.v', b='n.c')} / ({_NORM.format(v='e.v')} * n.cn) END"
    )
    cos = _COS.format(a="q.embedding", b="e2.embedding")
    return f"""
    WITH emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ), unit AS MATERIALIZED (
      SELECT vec_id, {unit.format(v='v', n=_NORM.format(v='v'))} AS u FROM emb
    ), c0 AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS c
      FROM emb ORDER BY vec_id LIMIT {n_centroids}
    ),{iter_sql}
    , cnorm AS MATERIALIZED (
      SELECT cid, c, {_NORM.format(v='c')} AS cn FROM {prev}
    ), assign AS MATERIALIZED (
      SELECT vec_id AS neighbor_id, cid AS centroid_id FROM (
        SELECT e.vec_id, n.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {sim} DESC, n.cid) AS rn
        FROM emb e CROSS JOIN cnorm n
      ) WHERE rn = 1
    ), qprobe AS (
      SELECT vec_id AS query_id, cid AS centroid_id FROM (
        SELECT e.vec_id, n.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {sim} DESC, n.cid) AS rn
        FROM emb e CROSS JOIN cnorm n WHERE e.vec_id < 8
      ) WHERE rn <= {n_probe}
    ), scored AS (
      SELECT qp.query_id, a.neighbor_id, {cos} AS cos
      FROM qprobe qp
      JOIN assign a USING (centroid_id)
      JOIN embeddings q ON q.vec_id = qp.query_id
      JOIN embeddings e2 ON e2.vec_id = a.neighbor_id
      WHERE qp.query_id <> a.neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """


def local_oracle_sql() -> dict[str, str]:
    """Gate-local oracle twins (merged OVER ``oracle_sql()`` by
    tools/oracle_check.py after :func:`register` has run)."""
    return {
        "qd09_minhash_lsh_pairs": _qd09_sql(),
        "qd10_simhash_pairs": _qd10_sql(),
        "qd11_lsh_ann_topk": _qd11_sql(),
        "qd16_ivf_ann_topk": _qd16_sql(),
        "qd62_bpe_train_merges": f"""
        WITH wc AS (
          SELECT w, count(*) AS c
          FROM (SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY 1
        ),
        packed AS (
          SELECT bpe_merges_py(list(w ORDER BY w), list(c ORDER BY w),
                               16, 2) AS ms
          FROM wc
        )
        SELECT unnest(ms, recursive := true) FROM packed
        """,
        "qd65_unigram_train_pieces": f"""
        WITH wc AS (
          SELECT w, count(*) AS c
          FROM (SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY 1
        ),
        packed AS (
          SELECT unigram_pieces_py(list(w ORDER BY w), list(c ORDER BY w),
                                   32, 4, 2, 4) AS ps
          FROM wc
        )
        SELECT unnest(ps, recursive := true) FROM packed
        """,
    }
