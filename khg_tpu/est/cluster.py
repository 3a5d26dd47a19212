"""Clusterable statistics and k-means clustering.

Sum-able sufficient-statistics objects with an objective function, plus
k-means over them (random init, multiple tries, local-move refinement) —
used for Gaussian merge-by-clustering and available for tree building.

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/clusterable-classes.cc,
cluster-utils.cc:66-299 (ClusterKMeans / RefineClusterer).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from khg_tpu.utils.math_utils import M_LOG_2PI


class Clusterable:
    def copy(self) -> "Clusterable":
        raise NotImplementedError

    def objf(self) -> float:
        raise NotImplementedError

    def normalizer(self) -> float:
        raise NotImplementedError

    def add(self, other: "Clusterable") -> None:
        raise NotImplementedError

    def sub(self, other: "Clusterable") -> None:
        raise NotImplementedError

    def objf_plus(self, other: "Clusterable") -> float:
        tmp = self.copy()
        tmp.add(other)
        return tmp.objf()

    def objf_minus(self, other: "Clusterable") -> float:
        tmp = self.copy()
        tmp.sub(other)
        return tmp.objf()

    def distance(self, other: "Clusterable") -> float:
        """Negated objf change from merging: >= 0."""
        tmp = self.copy()
        tmp.add(other)
        ans = self.objf() + other.objf() - tmp.objf()
        return max(ans, 0.0)


class ScalarClusterable(Clusterable):
    """(count, sum x, sum x^2); objf = -count * var."""

    def __init__(self, x: Optional[float] = None):
        self.x_ = 0.0
        self.x2_ = 0.0
        self.count_ = 0.0
        if x is not None:
            self.x_ = x
            self.x2_ = x * x
            self.count_ = 1.0

    def copy(self):
        c = ScalarClusterable()
        c.x_, c.x2_, c.count_ = self.x_, self.x2_, self.count_
        return c

    def objf(self) -> float:
        if self.count_ == 0:
            return 0.0
        return -(self.x2_ - self.x_ * self.x_ / self.count_)

    def normalizer(self) -> float:
        return self.count_

    def add(self, other):
        self.x_ += other.x_
        self.x2_ += other.x2_
        self.count_ += other.count_

    def sub(self, other):
        self.x_ -= other.x_
        self.x2_ -= other.x2_
        self.count_ -= other.count_

    def mean(self) -> float:
        return self.x_ / self.count_ if self.count_ else 0.0


class GaussClusterable(Clusterable):
    """Diagonal-Gaussian stats: count, sum x, sum x^2; objf = expected
    log-likelihood of the data under the ML Gaussian (with var floor)."""

    def __init__(
        self,
        x_stats: Optional[np.ndarray] = None,
        x2_stats: Optional[np.ndarray] = None,
        var_floor: float = 0.0,
        count: float = 0.0,
        dim: Optional[int] = None,
    ):
        if x_stats is not None:
            self.x_stats = np.asarray(x_stats, dtype=np.float64).copy()
            self.x2_stats = np.asarray(x2_stats, dtype=np.float64).copy()
        else:
            d = dim or 0
            self.x_stats = np.zeros(d, dtype=np.float64)
            self.x2_stats = np.zeros(d, dtype=np.float64)
        self.count = float(count)
        self.var_floor = var_floor

    @staticmethod
    def from_point(x: np.ndarray, weight: float = 1.0, var_floor: float = 0.01):
        return GaussClusterable(
            x_stats=np.asarray(x, dtype=np.float64) * weight,
            x2_stats=np.asarray(x, dtype=np.float64) ** 2 * weight,
            var_floor=var_floor,
            count=weight,
        )

    def copy(self):
        c = GaussClusterable(
            self.x_stats, self.x2_stats, self.var_floor, self.count
        )
        return c

    def objf(self) -> float:
        if self.count <= 0:
            return 0.0
        mean = self.x_stats / self.count
        var = self.x2_stats / self.count - mean**2
        var = np.maximum(var, self.var_floor)
        d = len(mean)
        return float(-0.5 * self.count * (d * (M_LOG_2PI + 1.0) + np.sum(np.log(var))))

    def normalizer(self) -> float:
        return self.count

    def add(self, other):
        self.x_stats = self.x_stats + other.x_stats
        self.x2_stats = self.x2_stats + other.x2_stats
        self.count += other.count

    def sub(self, other):
        self.x_stats = self.x_stats - other.x_stats
        self.x2_stats = self.x2_stats - other.x2_stats
        self.count -= other.count


def sum_clusterable(items: Sequence[Clusterable]) -> Optional[Clusterable]:
    if not items:
        return None
    total = items[0].copy()
    for it in items[1:]:
        total.add(it)
    return total


def sum_clusterable_objf(items: Sequence[Clusterable]) -> float:
    return sum(it.objf() for it in items)


@dataclass
class ClusterKMeansOptions:
    refine_iters: int = 100
    num_iters: int = 100
    num_tries: int = 2
    verbose: bool = False


def cluster_kmeans(
    points: Sequence[Clusterable],
    num_clusters: int,
    opts: ClusterKMeansOptions = ClusterKMeansOptions(),
    rng: Optional[np.random.Generator] = None,
) -> Tuple[List[Clusterable], List[int], float]:
    """K-means over clusterables.  Returns (clusters, assignments, objf).

    Random init (shuffled round-robin), Lloyd-style local moves until
    convergence, best of ``num_tries``.  Deterministic given ``rng``.
    """
    assert num_clusters > 0 and len(points) >= num_clusters
    if rng is None:
        rng = np.random.default_rng()

    best_ans = None
    best_objf = -math.inf
    for _ in range(max(opts.num_tries, 1)):
        order = rng.permutation(len(points))
        assignments = [0] * len(points)
        clusters: List[Optional[Clusterable]] = [None] * num_clusters
        for j, i in enumerate(order):
            c = j % num_clusters
            assignments[i] = c
            if clusters[c] is None:
                clusters[c] = points[i].copy()
            else:
                clusters[c].add(points[i])

        for _ in range(opts.num_iters):
            moved = 0
            for i, p in enumerate(points):
                cur = assignments[i]
                # objf delta of removing from cur
                best_c, best_delta = cur, 0.0
                base_cur = clusters[cur].objf()
                removed = clusters[cur].copy()
                removed.sub(p)
                removed_objf = removed.objf()
                for c in range(num_clusters):
                    if c == cur:
                        continue
                    gained = clusters[c].objf_plus(p) - clusters[c].objf()
                    lost = base_cur - removed_objf
                    delta = gained - lost
                    if delta > best_delta + 1e-10:
                        best_delta = delta
                        best_c = c
                if best_c != cur:
                    clusters[cur].sub(p)
                    clusters[best_c].add(p)
                    assignments[i] = best_c
                    moved += 1
            if moved == 0:
                break
        objf = sum(c.objf() for c in clusters)
        if objf > best_objf:
            best_objf = objf
            best_ans = ([c.copy() for c in clusters], list(assignments))
    clusters, assignments = best_ans
    return clusters, assignments, best_objf
