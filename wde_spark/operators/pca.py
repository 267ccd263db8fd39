"""Distributed PCA via power iteration — the classic dense-corpus
dimensionality probe (leading principal component of the embedding
cloud), shaped for the engine's bounded-driver-state discipline.

Why power iteration and not a matrix factorization: at 100 TB the data
matrix never materializes — but X·v and Xᵀ(X·v) are ONE aggregation pass
each over the rows (per-dimension sums, map-side combined), and the only
state that ever leaves the executors is the dim-sized iterate itself —
the same class as IVF centroids (`similarity.train_ivf_centroids`) or
the BPE argmax row. Each Lloyd-style iteration is:

    t_x = (x − μ) · v          -- per-row dot, column arithmetic only
    w   = Σ_x t_x (x − μ)      -- dim per-dimension SUMs in one agg row
    v   = w / ‖w‖              -- driver-side normalize (dim doubles)

Convergence is geometric in the eigengap; a PINNED iteration count keeps
the model replayable by a declarative engine (the unrolled-SQL-oracle
discipline of the k-means and BPE trainers). The deterministic init
comes from the md5 hyperplane family (`similarity.hyperplanes`) — no RNG
state, identical on every engine/run, and orthogonal-ish to any single
data direction with overwhelming probability, so the iterate can't start
in the (measure-zero) null space of Σ.

Top-k components: deflate (subtract λ v vᵀ projections from the scores,
i.e. re-run on x − (x·v₁)v₁) — each extra component is the same
two-pass iteration. Only PC1 is registered as a query; the operator
takes any init/seed so deflation composes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import hyperplanes


def _dims(vec: Column, dim: int) -> list[Column]:
    return [vec.getItem(i).cast("double") for i in range(dim)]


def power_iteration_pc1(emb: DataFrame, dim: int = 64, iters: int = 3,
                        vec_col: str = "embedding",
                        seed: str = "pca") -> tuple[list[float],
                                                    list[float]]:
    """(mu, v): the per-dimension mean and the unit leading-eigenvector
    estimate of the centered covariance after `iters` power iterations.
    Driver traffic: one dim-wide row per iteration plus one for the mean
    — bounded model state, never rows."""
    x = _dims(F.col(vec_col), dim)
    mu_row = emb.agg(*[F.avg(x[i]).alias(f"m{i}")
                       for i in range(dim)]).first()

    v = hyperplanes(dim, 1, seed)[0]
    nrm = math.sqrt(sum(c * c for c in v))
    v = [c / nrm for c in v]

    if mu_row is None or mu_row["m0"] is None:
        # empty corpus (the date-filter-leaves-zero-rows case): no model
        # to fit — zero mean + the init direction keep projection total
        return [0.0] * dim, v
    mu = [float(mu_row[f"m{i}"]) for i in range(dim)]

    for _ in range(iters):
        c = [x[i] - F.lit(mu[i]) for i in range(dim)]
        t = sum((c[i] * F.lit(v[i]) for i in range(1, dim)),
                c[0] * F.lit(v[0]))
        w_row = emb.agg(*[F.sum(c[i] * t).alias(f"w{i}")
                          for i in range(dim)]).first()
        if w_row is None or w_row["w0"] is None:
            break
        w = [float(w_row[f"w{i}"]) for i in range(dim)]
        nrm = math.sqrt(sum(c_ * c_ for c_ in w))
        if nrm == 0.0:  # degenerate corpus (all rows identical)
            break
        v = [c_ / nrm for c_ in w]
    return mu, v


def pca_project(emb: DataFrame, mu: list[float], v: list[float],
                vec_col: str = "embedding", id_col: str = "vec_id",
                score_col: str = "pc1_score") -> DataFrame:
    """(id, score): each vector's coordinate along the component —
    centered dot product, pure column arithmetic (whole-stage codegen),
    rounded to 6 dp for engine-replayable output. The score is the
    standard embedding-cloud diagnostic: extreme |score| rows are the
    corpus's dominant-direction outliers, and score quantiles drive
    variance-balanced sharding."""
    dim = len(v)
    x = _dims(F.col(vec_col), dim)
    t = sum(((x[i] - F.lit(mu[i])) * F.lit(v[i]) for i in range(1, dim)),
            (x[0] - F.lit(mu[0])) * F.lit(v[0]))
    return emb.select(F.col(id_col), F.round(t, 6).alias(score_col))
