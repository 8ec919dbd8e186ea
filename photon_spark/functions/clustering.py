"""Deterministic k-means over an embedding column — the semantic
clustering primitive behind cluster-balanced sampling, semantic dedup
(SemDeDup-style: near-dups live in the same cell), and IVF index training
(similarity.ivf_topk consumes exactly these centroids at scale).

Determinism contract (what makes this hash-gateable cross-engine):

- init: the ``k`` lowest-id vectors, in id order → cluster ids 0..k-1;
- assignment: argmin squared L2, expanded as ``|c|² - 2·v·c`` (the ``|v|²``
  term is constant per row), ties → lowest cluster id;
- update: the *mean is computed over integer-quantized coordinates* —
  ``sum(round(x·10⁶)) / count / 10⁶``. Long sums are order-free, so the
  updated centroids are bit-identical regardless of partitioning,
  aggregation order, or engine — the float-group-sum nondeterminism that
  makes naive distributed k-means unreproducible is quantized away at a
  cost of ≤ 5e-7 per coordinate;
- empty clusters keep their previous centroid.

Scale shape per iteration: one map-only Arrow-batched GEMM for assignment
(batch×dim @ dim×k — no join, no window; the r1-verdict ivf_topk lesson),
then one shuffle of (cluster, pos) keyed *quantized partial sums* —
k·dim·n_partitions longs, independent of row count — and a k·dim driver
collect. 100 TB passes over the vectors stay map-local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: coordinate quantization for order-free centroid sums (millionths)
Q = 1_000_000


def _init_centroids(df: DataFrame, k: int, vec_col: str,
                    id_col: str) -> list[list[float]]:
    rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(rows) < k:
        raise ValueError(f"need ≥ {k} vectors, got {len(rows)}")
    return [[float(x) for x in r[0]] for r in rows]


def assign_cells(df: DataFrame, centroids: list[list[float]],
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Map-only nearest-centroid assignment: (id, vec, cluster_id).

    argmin over ``|c|² - 2·v·c`` via one numpy GEMM per Arrow batch;
    numpy argmin takes the first minimum → lowest cluster id on ties,
    matching the oracle's ``ORDER BY score, cl``. Row-wise deterministic:
    a row's scores never depend on batch composition.
    """
    cmat = np.array(centroids, dtype=np.float64).T  # dim × k
    nc2 = np.einsum("dk,dk->k", cmat, cmat)

    @F.pandas_udf("long")
    def _assign(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)
        return pd.Series(np.argmin(nc2 - 2.0 * (m @ cmat), axis=1))

    return df.select(F.col(id_col), F.col(vec_col),
                     _assign(F.col(vec_col)).alias("cluster_id"))


def _update_centroids(assigned: DataFrame,
                      centroids: list[list[float]],
                      vec_col: str) -> list[list[float]]:
    """Quantized-mean update; empty clusters keep their old centroid."""
    sums = (assigned
            .select("cluster_id",
                    F.posexplode(F.transform(F.col(vec_col),
                                             lambda x: x.cast("double")))
                    .alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.sum(F.round(F.col("x") * Q).cast("long")).alias("s"),
                 F.count(F.lit(1)).alias("c"))
            .collect())
    dim = len(centroids[0])
    out = [list(c) for c in centroids]
    by_cluster: dict[int, list] = {}
    for r in sums:
        by_cluster.setdefault(int(r["cluster_id"]), []).append(r)
    for cl, rows in by_cluster.items():
        coords = [0.0] * dim
        for r in rows:
            coords[int(r["pos"])] = r["s"] / r["c"] / Q
        out[cl] = coords
    return out


def kmeans_fit(df: DataFrame, k: int = 8, iters: int = 2,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> tuple[DataFrame, list[list[float]]]:
    """``iters`` Lloyd updates from the deterministic init, then a final
    assignment against the converged centroids. Returns (assignment df,
    centroids)."""
    cents = _init_centroids(df, k, vec_col, id_col)
    base = df.select(id_col, vec_col)
    for _ in range(iters):
        assigned = assign_cells(base, cents, vec_col, id_col)
        cents = _update_centroids(assigned, cents, vec_col)
    return assign_cells(base, cents, vec_col, id_col), cents


def member_dist2(assigned: DataFrame, centroids: list[list[float]],
                 vec_col: str = "embedding") -> DataFrame:
    """Per-member squared distance to its assigned centroid, as the
    quantized long ``ri = round(dist² · 10⁶)``.

    The distance is the same *sequential* higher-order fold as the DuckDB
    oracle — ``(|v|² - 2·v·c) + |c|²`` in exactly that association, with
    ``|c|²`` pre-folded on the driver by the identical left fold — so
    ``ri`` is bit-identical cross-engine (the kmeans profile and prune
    oracles both hash it). Map-only: centroids ride along as literals.
    """
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in c])
                          for c in centroids])
    nc2_lit = F.array(*[F.lit(_seq_dot(c, c)) for c in centroids])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cvec = F.element_at(cents_lit, F.col("cluster_id").cast("int") + 1)
    dot = F.aggregate(F.zip_with(v, cvec, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, t: acc + t)
    na2 = F.aggregate(F.zip_with(v, v, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, t: acc + t)
    nc2 = F.element_at(nc2_lit, F.col("cluster_id").cast("int") + 1)
    dist2 = (na2 - 2.0 * dot) + nc2
    return assigned.withColumn("ri", F.round(dist2 * Q).cast("long"))


def kmeans_cluster_profile(df: DataFrame, k: int = 8, iters: int = 2,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """Per-cluster audit: size, total and mean squared-L2 inertia.

    The inertia distance is recomputed in Catalyst with *sequential*
    higher-order folds — ``(|v|² - 2·v·c) + |c|²`` in that exact
    association — so the DuckDB oracle (list_dot_product is the same left
    fold) reproduces it bit-for-bit; per-row dist² is then quantized to
    integer millionths before the order-free long sum.
    """
    assigned, cents = kmeans_fit(df, k, iters, vec_col, id_col)
    return (member_dist2(assigned, cents, vec_col)
            .select("cluster_id", "ri")
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.round(F.sum("ri") / Q, 6).alias("inertia"),
                 F.round(F.sum("ri") / F.count(F.lit(1)) / Q, 6)
                  .alias("avg_dist2"))
            .orderBy("cluster_id"))


def within_cluster_pairs(assigned: DataFrame, threshold: float,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """SemDeDup pair-mining kernel: exact cosine ≥ threshold pairs WITHIN
    each cluster of an :func:`assign_cells`/:func:`kmeans_fit` assignment.

    One shuffle of the vectors keyed by cluster_id (at 100 TB: zero — the
    table is written bucketed by cluster), then per cluster a dense
    normalized GEMM screens candidates at ``threshold − 1e-6`` and a
    strictly sequential left-associated float64 fold re-verifies — the
    same screen-then-exact contract as dedup.embedding_near_duplicates,
    so results are bit-identical to the interpreted Catalyst cosine and
    its DuckDB oracle at 6dp."""
    import math

    def _seq_cosine(a, b):
        s = na = nb = 0.0
        for x, y in zip(a, b):
            s += x * y
            na += x * x
            nb += y * y
        d = math.sqrt(na) * math.sqrt(nb)
        return s / d if d else 0.0

    margin = threshold - 1e-6

    def mine(key, pdf):
        ids = pdf["_id"].to_numpy(dtype="int64")
        mat = np.array(pdf["_v"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        nmat = mat / nrm
        sims = nmat @ nmat.T
        mask = (sims >= margin) & (ids[:, None] < ids[None, :])
        lo, hi, cos = [], [], []
        for i, j in zip(*np.nonzero(mask)):
            c = round(_seq_cosine(mat[i].tolist(), mat[j].tolist()), 6)
            if c >= threshold:
                lo.append(int(ids[i]))
                hi.append(int(ids[j]))
                cos.append(c)
        return pd.DataFrame({"cluster_id": int(key[0]), "lo_id": lo,
                             "hi_id": hi, "cosine": cos})

    return (assigned.select(F.col("cluster_id"),
                            F.col(id_col).alias("_id"),
                            F.col(vec_col).alias("_v"))
            .groupBy("cluster_id")
            .applyInPandas(mine, schema="cluster_id long, lo_id long, "
                                        "hi_id long, cosine double"))


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Driver-side sequential left-fold dot product — the same association
    as F.aggregate / DuckDB list_dot_product."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc
