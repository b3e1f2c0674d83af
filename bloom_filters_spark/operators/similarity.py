"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k per query: broadcast the
  (small) query side, dot products via built-in zip_with/aggregate in
  double precision, rank with a window.  The exactness baseline.
* ``lsh_cosine_topk`` — the scale path: random-hyperplane LSH buckets
  (signed projections → bit key), candidates only within matching
  buckets across tables, then exact re-rank.  Probes multiple hash
  tables to trade recall for candidate count.
* ``ivf_cosine_topk`` — the other scale path: IVF (inverted-file)
  index with a spherical-k-means coarse quantizer trained on a bounded
  deterministic sample; items live in one inverted list each, queries
  probe their ``nprobe`` nearest lists, exact re-rank on candidates.
  Trades recall for candidate count via nprobe/n_centroids.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sql_type(df: DataFrame, col: str) -> str:
    """Spark SQL type string of ``col`` — mapInArrow output schemas
    derive id/vector field types from the input instead of hardcoding
    ``long``, so int32/string ids survive the Arrow round-trip."""
    return dict(df.dtypes)[col]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries(query_id, embedding) × items(vec_id, embedding) →
    (query_id, vec_id, cosine, rank).  Query side is broadcast —
    the item scan streams once, no shuffle until the final top-k.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    scored = items.join(q).select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mutual_nn_pairs(
    items: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 1024,
    impl: str = "block",
) -> DataFrame:
    """Embedding-space near-duplicate pairs: (a, b) that are each
    other's exact nearest neighbor by cosine (a < b).

    Rank-based rather than threshold-based, so the result is robust to
    float rounding across engines (cosines rounded 6dp before ranking,
    ties broken by smallest id — same convention as ``cosine_topk``).

    ``impl="block"`` (default, the distributed path): vectors hash into
    ceil(n/block_size) blocks; every block PAIR becomes one task that
    computes its similarity tile as a single numpy matmul and emits
    per-row tile-local winners; a groupBy max reduces tiles to the
    global nearest neighbor.  Exact, no driver materialization — driver
    and executors each hold O(block_size·dim), not O(n·dim).  Work is
    inherently O(n²/block_size²) tiles: the exactness baseline for
    corpora up to ~10^7 vectors; beyond that, ``lsh_cosine_topk``
    bucketing is the sublinear path.

    ``impl="driver"`` (test oracle): the original collect + closure
    broadcast variant — O(n·dim) on the driver, kept to cross-check the
    block path in pytest.

    Requires bigint ids: the tile kernels use an int64 sentinel for the
    smallest-id tie-break (the LSH/IVF/PQ/SemDeDup paths derive their id
    type from the input and accept int32/string ids).
    """
    if impl == "driver":
        nn = _exact_nn_driver(items, id_col, vec_col)
    else:
        nn = _exact_nn_block(items, id_col, vec_col, block_size)
    rev = nn.select(F.col("src").alias("dst2"), F.col("dst").alias("src2"))
    return (
        nn.join(
            rev,
            (nn.src == F.col("src2")) & (nn.dst == F.col("dst2")),
        )
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id1"), F.col("dst").alias("id2"))
    )


def _exact_nn_block(items: DataFrame, id_col: str, vec_col: str,
                    block_size: int) -> DataFrame:
    """(src, dst): exact cosine nearest neighbor per vector, computed as
    a distributed blocked matmul over all block pairs."""
    import math

    import pyarrow as pa

    n = items.count()
    n_blocks = max(1, math.ceil(n / block_size))
    blocks = items.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_b"),
        F.col(id_col),
        F.col(vec_col),
    )
    packed = blocks.groupBy("_b").agg(
        F.collect_list(
            F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        ).alias("rows")
    )
    # unordered block pairs only: tile (j,i) is the transpose of (i,j),
    # so one matmul serves both orientations — halves the O(n²) kernel
    # work this operator's docstring names as the scaling bottleneck
    cells = (
        packed.select(F.col("_b").alias("_bl"), F.col("rows").alias("rows_l"))
        .crossJoin(
            packed.select(F.col("_b").alias("_br"), F.col("rows").alias("rows_r"))
        )
        .filter(F.col("_bl") <= F.col("_br"))
        .select("_bl", "_br", "rows_l", "rows_r")
    )

    def _unpack(list_col, i):
        sa = list_col.slice(i, 1).flatten()  # offset-aware
        ids = sa.field("id").to_numpy(zero_copy_only=False)
        vl = sa.field("v")
        flat = vl.flatten().to_numpy(zero_copy_only=False)
        m = flat.astype(np.float64).reshape(len(ids), -1) if len(ids) else None
        return ids, m

    def _winners(sims, src_ids, dst_ids):
        """Per-row tile-local winner arrays (src, dst, cosine) with the
        smallest-dst-id tie-break; rows with no finite entry dropped."""
        best = sims.max(axis=1)
        has = best > -np.inf
        if not has.any():
            return None
        cand = np.where(
            sims == best[:, None], dst_ids[None, :], np.iinfo(np.int64).max
        )
        return src_ids[has], cand.min(axis=1)[has], best[has]

    def tile(batches):
        for batch in batches:
            bl_arr = batch.column(0).to_numpy(zero_copy_only=False)
            br_arr = batch.column(1).to_numpy(zero_copy_only=False)
            rows_l, rows_r = batch.column(2), batch.column(3)
            for i in range(len(batch)):
                ids_l, ml = _unpack(rows_l, i)
                ids_r, mr = _unpack(rows_r, i)
                if ml is None or mr is None:
                    continue
                nl = np.linalg.norm(ml, axis=1)
                nl[nl == 0] = 1.0
                nr = np.linalg.norm(mr, axis=1)
                nr[nr == 0] = 1.0
                sims = np.round((ml / nl[:, None]) @ (mr / nr[:, None]).T, 6)
                self_mask = ids_l[:, None] == ids_r[None, :]
                sims[self_mask] = -np.inf
                out = _winners(sims, ids_l, ids_r)
                if out is not None:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(c) for c in out],
                        names=["src", "dst", "cosine"],
                    )
                if bl_arr[i] != br_arr[i]:
                    # off-diagonal tile: the transpose serves the other
                    # orientation without a second matmul
                    out = _winners(sims.T, ids_r, ids_l)
                    if out is not None:
                        yield pa.RecordBatch.from_arrays(
                            [pa.array(c) for c in out],
                            names=["src", "dst", "cosine"],
                        )

    cand = cells.mapInArrow(tile, "src long, dst long, cosine double")
    best = (
        cand.groupBy("src")
        .agg(
            F.max(
                F.struct(
                    F.col("cosine").alias("c"), (-F.col("dst")).alias("nd")
                )
            ).alias("m")
        )
        .select("src", (-F.col("m.nd")).alias("dst"))
    )
    return best


def _exact_nn_driver(items: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    import pyarrow as pa

    rows = items.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.array([rows[i][1] for i in order], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]

    def nn_block(batches):
        for batch in batches:
            bids = batch.column(0).to_numpy(zero_copy_only=False)
            flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
            n = len(bids)
            if n == 0:
                continue
            block = flat.astype(np.float64).reshape(n, -1)
            bn = np.linalg.norm(block, axis=1)
            bn[bn == 0] = 1.0
            sims = np.round((block / bn[:, None]) @ matn.T, 6)
            # mask self-matches, then argmax = highest cosine, and ties
            # resolve to the smallest id because ids are sorted ascending
            self_pos = np.searchsorted(ids, bids)
            row_has_self = (self_pos < len(ids)) & (
                ids[np.minimum(self_pos, len(ids) - 1)] == bids
            )
            sims[np.flatnonzero(row_has_self),
                 self_pos[row_has_self]] = -np.inf
            best = sims.argmax(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(bids), pa.array(ids[best])],
                names=["src", "dst"],
            )

    return items.select(id_col, vec_col).mapInArrow(
        nn_block, "src long, dst long"
    )


def hyperplane_bucket_expr(vec, planes: np.ndarray):
    """Random-hyperplane LSH bucket id: sign bits of <vec, plane_j>
    packed into a long — all built-ins (no Python)."""
    bits = []
    for j in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(v)) for v in planes[j]])
        bits.append(
            F.when(_dot(vec, plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = items sharing any hash-table
    bucket with the query, exact cosine re-rank on candidates only.

    At 100TB scale this replaces the full scan per query with
    ``n_tables`` equi-joins on small bucket keys; candidate volume is
    ~n/2^n_planes per table."""
    rng = np.random.default_rng(seed)
    planes = [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]
    # all tables' hyperplanes as one (n_tables*n_planes, dim) matrix so a
    # batch's bucket ids come from a single matmul (the expression-level
    # variant evaluates n_tables*n_planes interpreted dot products per
    # row — measured ~6s vs <1s at 2000 vectors)
    planes_all = np.vstack(planes)
    pow2 = (1 << np.arange(n_planes, dtype=np.int64))

    def bucketed(df, idc):
        import pyarrow as pa
        import pyarrow.compute as pc

        def compute(batches):
            for batch in batches:
                n = len(batch)
                if n == 0:
                    continue
                flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
                m = flat.astype(np.float64).reshape(n, -1)
                signs = (m @ planes_all.T) >= 0          # (n, T*P)
                bits = signs.reshape(n, n_tables, n_planes)
                buckets = (bits * pow2[None, None, :]).sum(axis=2)
                idx = pa.array(np.repeat(np.arange(n), n_tables))
                yield pa.RecordBatch.from_arrays(
                    [
                        pc.take(batch.column(0), idx),
                        pc.take(batch.column(1), idx),
                        pa.array(
                            np.tile(np.arange(n_tables, dtype=np.int32), n)
                        ),
                        pa.array(buckets.reshape(-1)),
                    ],
                    names=[idc, vec_col, "table_id", "bucket"],
                )

        vec_type = _sql_type(df, vec_col)
        id_type = _sql_type(df, idc)
        return df.select(idc, vec_col).mapInArrow(
            compute,
            f"{idc} {id_type}, {vec_col} {vec_type},"
            " table_id int, bucket long",
        )

    bi = bucketed(items, id_col)
    bq = bucketed(queries, query_id_col).select(
        query_id_col, F.col(vec_col).alias("_qvec"), "table_id", "bucket"
    )
    cands = (
        bi.join(F.broadcast(bq), ["table_id", "bucket"])
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def train_ivf_centroids(
    items: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF, trained on a
    DETERMINISTIC bounded sample (the ``sample_size`` smallest ids —
    a TakeOrdered heap, one scan, no full sort) so the index is stable
    across runs and partitionings.  Driver cost is O(sample·dim) —
    bounded and constant in corpus size, the standard IVF recipe
    (train on a sample, assign everything); executors never see the
    training loop.  Returns unit-norm (n_centroids, dim) float64.

    Deterministic throughout: seeded k-means++ init over the fixed
    sample, stable argmax assignment (ties → lowest centroid id),
    empty clusters reseeded to the point farthest from its centroid
    (ties → lowest sample index).
    """
    rows = (
        items.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    x = mat / norms[:, None]
    n = len(x)
    if n < n_centroids:
        raise ValueError(
            f"train_ivf_centroids: sample has {n} vectors < "
            f"n_centroids={n_centroids}"
        )
    rng = np.random.default_rng(seed)
    # k-means++ seeding on cosine distance (1 - dot on unit sphere)
    cent = np.empty((n_centroids, x.shape[1]))
    cent[0] = x[rng.integers(n)]
    d2 = np.maximum(1.0 - x @ cent[0], 0.0) ** 2
    for j in range(1, n_centroids):
        p = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cent[j] = x[rng.choice(n, p=p)]
        d2 = np.minimum(d2, np.maximum(1.0 - x @ cent[j], 0.0) ** 2)
    for _ in range(n_iters):
        sims = x @ cent.T                       # (n, C)
        assign = sims.argmax(axis=1)            # stable: lowest id wins ties
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members) == 0:
                # farthest point from its own centroid, lowest index tie
                worst = int((sims.max(axis=1)).argmin())
                cent[j] = x[worst]
                continue
            m = members.mean(axis=0)
            nm = np.linalg.norm(m)
            cent[j] = m / nm if nm > 0 else cent[j]
    return cent


def ivf_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: a spherical-k-means coarse quantizer
    partitions items into ``n_centroids`` inverted lists; each query
    probes its ``nprobe`` nearest lists and re-ranks candidates by
    exact cosine.  The faiss-IVF shape re-expressed as DataFrames:

    * item assignment is ONE Arrow matmul pass (`mapInArrow`), emitting
      an 8-byte ``centroid_id`` — the only extra column shuffled;
    * candidates come from a single equi-join on ``centroid_id`` with
      the (small) probe side broadcast — candidate volume is
      ~n·nprobe/n_centroids per query, the sublinear knob;
    * skewed lists (natural cluster imbalance) are AQE skew-join
      territory; at fleet scale also raise n_centroids so lists stay
      ~partition-sized.

    Deterministic for fixed (seed, sample_size): training sample is
    id-ordered, assignment ties resolve to the lowest centroid id, and
    the re-rank rounds to 6dp with id tiebreaks — same convention as
    ``cosine_topk``/``lsh_cosine_topk``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cent = train_ivf_centroids(
        items, n_centroids, n_iters, sample_size, seed, id_col, vec_col
    )

    def assigned(df, idc, topn):
        def compute(batches):
            for batch in batches:
                nrows = len(batch)
                if nrows == 0:
                    continue
                flat = batch.column(1).flatten().to_numpy(
                    zero_copy_only=False
                )
                m = flat.astype(np.float64).reshape(nrows, -1)
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0] = 1.0
                sims = (m / norms[:, None]) @ cent.T    # (nrows, C)
                if topn == 1:
                    cids = sims.argmax(axis=1).astype(np.int32)
                    idx = pa.array(np.arange(nrows))
                    cid_arr = pa.array(cids)
                else:
                    order = np.argsort(-sims, axis=1, kind="stable")
                    cids = order[:, :topn].astype(np.int32)
                    idx = pa.array(np.repeat(np.arange(nrows), topn))
                    cid_arr = pa.array(cids.reshape(-1))
                yield pa.RecordBatch.from_arrays(
                    [
                        pc.take(batch.column(0), idx),
                        pc.take(batch.column(1), idx),
                        cid_arr,
                    ],
                    names=[idc, vec_col, "centroid_id"],
                )

        vec_type = _sql_type(df, vec_col)
        id_type = _sql_type(df, idc)
        return df.select(idc, vec_col).mapInArrow(
            compute,
            f"{idc} {id_type}, {vec_col} {vec_type}, centroid_id int",
        )

    bi = assigned(items, id_col, 1)
    bq = assigned(queries, query_id_col, nprobe).select(
        query_id_col, F.col(vec_col).alias("_qvec"), "centroid_id"
    )
    cands = bi.join(F.broadcast(bq), "centroid_id")
    scored = cands.select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def semantic_dedup(
    items: DataFrame,
    eps: float = 0.05,
    cluster_col: str | None = None,
    n_centroids: int = 16,
    n_iters: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_block: int = 8192,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop documents
    whose EMBEDDINGS nearly coincide — the semantic tier above
    MinHash/SimHash lexical dedup.  Cluster the embedding space, then
    inside each cluster call two items duplicates when their cosine
    similarity (rounded to 6dp) is >= 1 - ``eps``; every duplicate
    group keeps exactly one representative (the lowest id — a
    deterministic stand-in for the paper's keep-farthest-from-centroid,
    which it offers as one of several equivalent choices).

    ``cluster_col``: a precomputed cluster assignment column name (any
    deterministic coarse partitioner — hyperplane sign buckets, an IVF
    assignment, a domain key).  When None, a spherical-k-means
    quantizer is trained on a bounded sample and items are assigned by
    one Arrow matmul pass (same machinery as ``ivf_cosine_topk``).

    Returns ``(id, cluster_id, keep)`` for every input item.

    Scale shape — the paper's own complexity, re-expressed in joins:
    the within-cluster self-join is O(Σ c_i²), the SemDeDup trade: at
    fleet scale raise ``n_centroids`` ∝ corpus size so clusters stay
    ~constant-sized (the paper uses 50k clusters for LAION-440M).
    Natural imbalance is handled STRUCTURALLY, not just by AQE: a
    cluster larger than ``max_cluster_block`` is split into
    ``p = ceil(c / max_cluster_block)`` hash blocks per side and joined
    on ``(cluster_id, block_i, block_j)`` — the two-sided salted
    quadratic split (each side replicated p times, p² cells of
    ~max_cluster_block² expected pair evaluations each; per-cell size
    is binomial around c/p, so the bound is sharp up to hash variance),
    so one viral cluster can never pin its c² pairs on a single task.  Every pair meets in
    exactly one (i, j) cell, so the output is IDENTICAL to the plain
    join.  Nothing here is all-pairs across clusters.
    """
    if cluster_col is None:
        cent = train_ivf_centroids(
            items, n_centroids, n_iters, sample_size, seed, id_col, vec_col
        )

        def compute(batches):
            import pyarrow as pa

            for batch in batches:
                nrows = len(batch)
                if nrows == 0:
                    continue
                flat = batch.column(1).flatten().to_numpy(
                    zero_copy_only=False
                )
                m = flat.astype(np.float64).reshape(nrows, -1)
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0] = 1.0
                cids = ((m / norms[:, None]) @ cent.T).argmax(axis=1)
                yield pa.RecordBatch.from_arrays(
                    [batch.column(0), batch.column(1),
                     pa.array(cids.astype(np.int32))],
                    names=[id_col, vec_col, "cluster_id"],
                )

        vec_type = _sql_type(items, vec_col)
        id_type = _sql_type(items, id_col)
        assigned = items.select(id_col, vec_col).mapInArrow(
            compute,
            f"{id_col} {id_type}, {vec_col} {vec_type}, cluster_id int",
        )
    else:
        assigned = items.select(
            id_col, vec_col, F.col(cluster_col).alias("cluster_id")
        )

    tau = 1.0 - eps
    if max_cluster_block < 1:
        raise ValueError(
            f"max_cluster_block must be >= 1, got {max_cluster_block}"
        )
    # per-cluster block count p = ceil(c / max_cluster_block): tiny
    # histogram, broadcast back; p = 1 (the common case) degenerates to
    # the plain within-cluster join with a constant block key
    sizes = assigned.groupBy("cluster_id").agg(
        F.ceil(
            F.count(F.lit(1)).cast("double") / F.lit(float(max_cluster_block))
        ).cast("int").alias("_p")
    )
    blocks = F.explode(F.sequence(F.lit(0), F.col("_p") - 1))
    own = F.pmod(F.xxhash64(F.col(id_col)), F.col("_p")).cast("int")
    salted = assigned.join(F.broadcast(sizes), "cluster_id")
    # pair (a, b) meets in exactly one cell: (i = h(a)%p from the left
    # row, j = h(b)%p from the right row) — the left explodes over j,
    # the right over i, so each side is replicated p times and every
    # (cluster, i, j) cell evaluates ~max_cluster_block^2 pairs
    left = salted.select(
        F.col("cluster_id"),
        own.alias("_bi"),
        blocks.alias("_bj"),
        F.col(id_col).alias("_id1"),
        F.col(vec_col).alias("_v1"),
    )
    right = salted.select(
        F.col("cluster_id"),
        blocks.alias("_bi"),
        own.alias("_bj"),
        F.col(id_col).alias("_id2"),
        F.col(vec_col).alias("_v2"),
    )
    dropped = (
        left.join(right, ["cluster_id", "_bi", "_bj"])
        .where(F.col("_id1") < F.col("_id2"))
        .where(F.round(cosine_expr(F.col("_v1"), F.col("_v2")), 6) >= tau)
        .select(F.col("_id2").alias(id_col))
        .distinct()
    )
    return (
        assigned.select(id_col, "cluster_id")
        .join(dropped.withColumn("_dropped", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
    )


def train_pq_codebooks(
    items: DataFrame,
    m: int = 8,
    ks: int = 16,
    n_iters: int = 12,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, the faiss
    IVF-PQ building block): split the (unit-normalized) vector into
    ``m`` subspaces and run plain L2 k-means with ``ks`` centroids in
    each, on the SAME deterministic bounded id-ordered sample the IVF
    trainer uses.  Returns float64 ``(m, ks, dim/m)``.

    Deterministic: seeded k-means++ per subspace, stable assignment
    (ties → lowest centroid id), empty clusters reseeded to the point
    farthest from its centroid (ties → lowest sample index).
    """
    rows = (
        items.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    x = mat / norms[:, None]
    n, dim = x.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if n < ks:
        raise ValueError(f"sample has {n} vectors < ks={ks}")
    rng = np.random.default_rng(seed)
    sub = dim // m
    books = np.empty((m, ks, sub))
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cent = np.empty((ks, sub))
        cent[0] = xs[rng.integers(n)]
        d2 = ((xs - cent[0]) ** 2).sum(axis=1)
        for c in range(1, ks):
            p = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
            cent[c] = xs[rng.choice(n, p=p)]
            d2 = np.minimum(d2, ((xs - cent[c]) ** 2).sum(axis=1))
        for _ in range(n_iters):
            dist = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)        # stable: lowest id wins
            for c in range(ks):
                members = xs[assign == c]
                if len(members) == 0:
                    cent[c] = xs[int(dist.min(axis=1).argmax())]
                    continue
                cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    rerank_factor: int = 4,
    n_iters: int = 12,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ approximate top-k with exact re-rank — the memory-bandwidth
    scale path: each item is scored from ``m`` one-byte codes via
    query-specific lookup tables (asymmetric distance computation), so
    the scan reads m bytes/vector instead of 8·dim, and only
    ``k·rerank_factor`` candidates per query ever touch their full
    vectors again.

    Spark shape: codebooks train on the bounded driver sample; ONE
    mapInArrow pass encodes each item batch and scores it against the
    broadcast query LUTs, emitting only each batch's per-query top
    ``k·rerank_factor`` (an item in the global top-t is top-t in its
    own batch, so the union is a superset of the global top-t —
    partition-independent); a per-query window takes the global
    candidate set; exact cosine re-ranks it.  Same determinism
    conventions as the LSH/IVF paths (6dp round, id tiebreaks).
    """
    books = train_pq_codebooks(
        items, m, ks, n_iters, sample_size, seed, id_col, vec_col
    )
    qrows = sorted(
        queries.select(query_id_col, vec_col).collect(), key=lambda r: r[0]
    )
    q_id_type = _sql_type(queries, query_id_col)
    i_id_type = _sql_type(items, id_col)
    if not qrows:
        # an empty query slice returns an empty result like the other
        # top-k variants (np.linalg.norm on a (0,)-shaped matrix would
        # raise AxisError on the driver otherwise)
        return items.sparkSession.createDataFrame(
            [],
            f"{query_id_col} {q_id_type}, {id_col} {i_id_type}, "
            "cosine double, rank int",
        )
    # coerce the collected query ids to the exact width the declared
    # Arrow schema expects (np.array defaults to int64 for python ints)
    np_id = {"tinyint": np.int8, "smallint": np.int16,
             "int": np.int32, "bigint": np.int64}
    qids = np.array([r[0] for r in qrows])
    if q_id_type in np_id:
        qids = qids.astype(np_id[q_id_type])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    qmat = qmat / qn[:, None]
    dim = qmat.shape[1]
    sub = dim // m
    # LUT[q, j, c] = <query subvector j, codebook[j][c]>
    lut = np.einsum(
        "qjd,jcd->qjc", qmat.reshape(len(qids), m, sub), books
    )
    t = k * rerank_factor

    def compute(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            n = len(batch)
            if n == 0:
                continue
            flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
            x = flat.astype(np.float64).reshape(n, -1)
            norms = np.linalg.norm(x, axis=1)
            norms[norms == 0] = 1.0
            x = x / norms[:, None]
            codes = np.empty((n, m), dtype=np.int64)
            for j in range(m):
                xs = x[:, j * sub:(j + 1) * sub]
                dist = (
                    (xs ** 2).sum(axis=1)[:, None]
                    - 2.0 * xs @ books[j].T
                    + (books[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = dist.argmin(axis=1)
            # approx cosine: sum of per-subspace LUT entries
            scores = np.zeros((len(qids), n))
            for j in range(m):
                scores += lut[:, j, :][:, codes[:, j]]
            t_eff = min(t, n)
            # per-batch per-query top-t by (-score, id): stable superset
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            order = np.lexsort((ids[None, :].repeat(len(qids), 0),
                                -scores), axis=1)[:, :t_eff]
            q_idx = np.repeat(np.arange(len(qids)), t_eff)
            i_idx = order.reshape(-1)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qids[q_idx]),
                    pa.array(ids[i_idx]),
                    pa.array(scores[q_idx, i_idx]),
                ],
                names=[query_id_col, id_col, "_approx"],
            )

    cands = items.select(id_col, vec_col).mapInArrow(
        compute,
        f"{query_id_col} {q_id_type}, {id_col} {i_id_type}, _approx double",
    )
    wa = Window.partitionBy(query_id_col).orderBy(
        F.desc("_approx"), F.asc(id_col)
    )
    shortlist = (
        cands.withColumn("_arank", F.row_number().over(wa))
        .filter(F.col("_arank") <= t)
        .select(query_id_col, id_col)
    )
    qdf = queries.select(
        query_id_col, F.col(vec_col).alias("_qvec")
    )
    scored = (
        shortlist.join(items.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_expr(F.col("_qvec"), F.col(vec_col)), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
