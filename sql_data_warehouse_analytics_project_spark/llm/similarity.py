"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and random-hyperplane LSH ANN (the scale path).

Everything is array-expression math in double precision — no UDFs, no
numpy in the hot path. LSH hyperplanes are DETERMINISTIC (seeded from
sha256 of (plane, dim)) so plans are reproducible run-to-run.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_data_warehouse_analytics_project_spark.llm.dedup import cosine


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, self excluded,
    ties broken by neighbor id. ``queries`` is usually small → broadcast it
    so the corpus never shuffles; the per-query ranking is a window over
    query_id (uniform key distribution)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim: each weight
    is derived from sha256(plane, dim) — reproducible with no RNG state."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(struct.pack("<II", p, d)).digest()
            val = int.from_bytes(h[:8], "little") / 2**64  # [0, 1)
            row.append(2.0 * val - 1.0)
        planes.append(row)
    return planes


def lsh_signatures(
    embeddings: DataFrame,
    num_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane signature: bit_p = (v · plane_p) > 0, packed into a
    long. sign-cosine property: P(bit differs) = angle/π.

    Computed as ONE Arrow-batched pandas UDF doing a (batch × dim) @
    (dim × planes) GEMM — evaluating num_planes interpreted array-fold
    expressions per row is ~20× slower (measured). The plane matrix is a
    tiny deterministic constant baked into the UDF closure, so there is no
    broadcast and the operator scales embarrassingly."""
    if dim is None:
        row = embeddings.select(F.size(vec_col).alias("n")).limit(1).collect()
        dim = row[0]["n"] if row else 0

    from pyspark.sql.functions import pandas_udf

    plane_mat = np.array(_hyperplanes(num_planes, dim), dtype=np.float64)  # (p, d)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf("long")
    def sig_udf(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype=np.int64)
        # NULL embeddings → signature 0, matching the expr formulation
        # (null dot → no bit set) instead of crashing np.vstack
        valid = vecs.notna().to_numpy()
        out = np.zeros(len(vecs), dtype=np.int64)
        if valid.any():
            mat = np.vstack(vecs[valid].to_numpy()).astype(np.float64)  # (n, d)
            bits = (mat @ plane_mat.T) > 0  # (n, p)
            out[valid] = (bits * weights).sum(axis=1).astype(np.int64)
        return pd.Series(out)

    return embeddings.select(
        F.col(id_col), F.col(vec_col), sig_udf(F.col(vec_col)).alias("lsh_sig")
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 16,
    num_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing ≥1 LSH band
    with the query, then exact cosine rank on candidates only. Recall is
    tunable via planes/bands; candidates shrink the cross join from |corpus|
    to the bucket size — that is the 100 TB path (bucket-partitioned join
    instead of broadcast-everything)."""
    rows_per_band = num_planes // num_bands
    dim_row = embeddings.select(F.size(vec_col).alias("n")).limit(1).collect()
    dim = dim_row[0]["n"] if dim_row else 0

    def with_bands(df: DataFrame, prefix: str) -> DataFrame:
        sigs = lsh_signatures(df, num_planes, id_col, vec_col, dim)
        mask = (1 << rows_per_band) - 1
        return sigs.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright("lsh_sig", b * rows_per_band)
                            .bitwiseAND(F.lit(mask))
                            .alias("bucket"),
                        )
                        for b in range(num_bands)
                    ]
                )
            ).alias("bb"),
        ).select(f"{prefix}_id", f"{prefix}_vec", "bb.band", "bb.bucket")

    qb = with_bands(queries, "query")
    cb = with_bands(embeddings, "neighbor")
    cands = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_vec", "neighbor_id", "neighbor_vec")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("cos", cosine(F.col("query_vec"), F.col("neighbor_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _kmeans_refine(base: DataFrame, cmat, n_iter: int):
    """Spherical k-means (Lloyd) refinement of the IVF coarse quantizer.

    Each iteration is ONE distributed pass: an Arrow-batched kernel
    assigns its partition's vectors to the nearest (unit) centroid and
    emits per-partition partial sums — (centroid, count, Σ unit-vector) —
    so the driver combines at most ``partitions × centroids`` tiny rows,
    never the corpus. Updated centroid = renormalized mean of assigned
    unit vectors (the spherical-k-means update, which optimizes cosine
    assignment); empty clusters keep their previous centroid. Partials
    are combined in sorted order so the float reduction is reproducible.
    """
    import numpy as np
    import pandas as pd

    spark = base.sparkSession
    k, dim = cmat.shape
    for _ in range(n_iter):
        cn = np.linalg.norm(cmat, axis=1)
        cn[cn == 0] = 1.0
        bc = spark.sparkContext.broadcast(cmat / cn[:, None])

        def partial(batches):
            cu = bc.value
            sums = np.zeros((k, dim))
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
                norms = np.linalg.norm(mat, axis=1)
                norms[norms == 0] = 1.0
                unit = mat / norms[:, None]
                # ties break toward the lower centroid index (np.argmax
                # returns the first max), matching the assign kernel
                a = np.argmax(unit @ cu.T, axis=1)
                np.add.at(sums, a, unit)
                np.add.at(counts, a, 1)
            nz = np.nonzero(counts)[0]
            if len(nz):
                yield pd.DataFrame(
                    {"cid": nz.astype(np.int32), "n": counts[nz], "s": list(sums[nz])}
                )

        rows = base.select("v").mapInPandas(
            partial, schema="cid int, n long, s array<double>"
        ).collect()
        bc.unpersist()  # one broadcast per iteration — don't accumulate
        acc = np.zeros((k, dim))
        tot = np.zeros(k, dtype=np.int64)
        for r in sorted(rows, key=lambda r: (r["cid"], r["n"], r["s"])):
            acc[r["cid"]] += np.asarray(r["s"], dtype=np.float64)
            tot[r["cid"]] += r["n"]
        nxt = cmat.copy()
        occupied = tot > 0
        nxt[occupied] = acc[occupied] / tot[occupied, None]
        cmat = nxt
    return cmat


def build_ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
) -> dict:
    """Build the IVF index ONCE, search it many times — the production
    ANN lifecycle (index construction is the expensive, corpus-sized
    part; query batches arrive continuously and must not rebuild it).

    Returns a plain dict index:
    - ``"centroids"`` — the refined coarse-quantizer matrix (driver-side
      list of lists; json-serializable, tiny)
    - ``"assignments"`` — LAZY DataFrame ``(neighbor_id, nv, centroid_id)``:
      every corpus vector with its nearest-centroid cell. Callers persist
      this however they like (``localCheckpoint`` for a session,
      ``write_dataset(partition_by=["centroid_id"])`` for reuse across
      jobs — then each probe prunes to its cells' partition dirs).
    - ``"id_type"`` — id column's Spark type (output schema of searches)

    The quantizer seeds deterministically (the ``n_centroids`` lowest-id
    vectors) and is refined with ``kmeans_iters`` spherical-Lloyd passes
    (:func:`_kmeans_refine` — one distributed partial-sum pass each), so
    cells track the data distribution instead of the seed draw; 0 turns
    refinement off. Recall is gated in tests against brute force.
    """
    import numpy as np

    nonnull = embeddings.filter(F.col(vec_col).isNotNull())
    cent_rows = (
        nonnull.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    id_sql = embeddings.schema[id_col].dataType.simpleString()
    spark = embeddings.sparkSession
    if not cent_rows:  # empty/all-null corpus: searchable, zero results
        return {
            "centroids": [],
            "assignments": spark.createDataFrame(
                [], f"neighbor_id {id_sql}, nv array<float>, centroid_id int"
            ),
            "id_type": id_sql,
        }
    cmat = np.array([r[1] for r in cent_rows], dtype=np.float64)
    if kmeans_iters and len(cent_rows) > 1:
        refine_base = nonnull.select(F.col(vec_col).cast("array<double>").alias("v"))
        cmat = _kmeans_refine(refine_base, cmat, kmeans_iters)
    base = nonnull.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    corpus_assign = base.mapInPandas(
        _ivf_assign_kernel(spark, cmat, 1), schema=f"id {id_sql}, centroid_id int"
    )
    assignments = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    ).join(corpus_assign.withColumnsRenamed({"id": "neighbor_id"}), "neighbor_id")
    return {
        "centroids": cmat.tolist(),
        "assignments": assignments,
        "id_type": id_sql,
    }


def _ivf_assign_kernel(spark, cmat, n_nearest: int):
    """Arrow-batched nearest-centroid assignment against a broadcast
    centroid matrix; emits ``n_nearest`` (id, centroid_id) rows per
    vector with deterministic low-index tie-breaks."""
    import numpy as np
    import pandas as pd

    cn = np.linalg.norm(cmat, axis=1)
    bc = spark.sparkContext.broadcast((cmat, cn))

    def kernel(batches):
        cm, cn_ = bc.value
        # fewer centroids than n_probe (tiny/empty corpus): clamp, or
        # np.repeat(ids, n_nearest) mismatches order's row width
        k_near = min(n_nearest, cm.shape[0])
        for pdf in batches:
            if pdf.empty or k_near == 0:
                continue
            mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (mat @ cm.T) / (norms[:, None] * cn_[None, :])
            sims = np.nan_to_num(sims, nan=-2.0)
            # deterministic: ties break toward the lower centroid index
            order = np.argsort(-sims, axis=1, kind="stable")[:, :k_near]
            out_ids = np.repeat(pdf["id"].to_numpy(), k_near)
            yield pd.DataFrame({"id": out_ids, "centroid_id": order.reshape(-1)})

    return kernel


def search_ivf_index(
    index: dict,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k search against a prebuilt IVF index: each query probes its
    ``n_probe`` nearest cells, exact cosine reranks only those cells'
    vectors (~n_probe/n_centroids of the corpus). Query side is tiny and
    broadcast; the corpus assignment table never reshuffles."""
    import numpy as np

    spark = queries.sparkSession
    id_sql = index["id_type"]
    cmat = np.array(index["centroids"], dtype=np.float64)
    if cmat.size == 0:
        return spark.createDataFrame(
            [],
            f"query_id {id_sql}, neighbor_id {id_sql}, cosine double, rank int",
        )
    qbase = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    qprobe = qbase.mapInPandas(
        _ivf_assign_kernel(spark, cmat, n_probe),
        schema=f"id {id_sql}, centroid_id int",
    )
    qside = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .join(qprobe.withColumnsRenamed({"id": "query_id"}), "query_id")
    )
    cands = qside.join(index["assignments"], "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("cos", cosine(F.col("qv"), F.col("nv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors — the second
    scale path alongside LSH bucketing. One-shot convenience over
    :func:`build_ivf_index` + :func:`search_ivf_index`; when several
    query batches hit the same corpus, build the index once and search
    it repeatedly instead."""
    index = build_ivf_index(
        embeddings,
        n_centroids=n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        kmeans_iters=kmeans_iters,
    )
    return search_ivf_index(
        index, queries, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )
