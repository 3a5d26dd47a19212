"""Diagonal-covariance GMM in exponential form (host view).

Stores ``weights``, ``inv_vars``, ``means_invvars`` and cached ``gconsts``;
per-frame log-likelihoods are ``gconst + (m/v)·x - 0.5 (1/v)·x²``, i.e. one
matvec — which is what lets the device engine batch all pdfs into a single
fused GEMM (see khg_tpu.gmm.likelihoods).

This host class (numpy) is the mutable model object used by the M-step,
split/merge, and serialization.  Shapes: weights (K,), inv_vars (K, D),
means_invvars (K, D), gconsts (K,).

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/diag-gmm.cc
(gconsts 103-147, loglikes 167-189, posteriors 368-392, split 780-851,
merge 557-778), diag-gmm-normal.h.
"""

from __future__ import annotations

import logging
import math
from typing import List, Optional, Tuple

import numpy as np

from khg_tpu.utils.math_utils import M_LOG_2PI

logger = logging.getLogger(__name__)


class DiagGmm:
    def __init__(self, nmix: int = 0, dim: int = 0):
        self.weights = np.zeros(0, dtype=np.float32)
        self.gconsts = np.zeros(0, dtype=np.float32)
        self.inv_vars = np.zeros((0, 0), dtype=np.float32)
        self.means_invvars = np.zeros((0, 0), dtype=np.float32)
        self.valid_gconsts = False
        if nmix > 0 and dim > 0:
            self.resize(nmix, dim)

    # ------------------------------------------------------------ shape mgmt

    def resize(self, nmix: int, dim: int) -> None:
        assert nmix > 0 and dim > 0
        self.weights = np.zeros(nmix, dtype=np.float32)
        self.gconsts = np.zeros(nmix, dtype=np.float32)
        # Unit inv-vars so set_means before set_invvars is well-defined.
        self.inv_vars = np.ones((nmix, dim), dtype=np.float32)
        self.means_invvars = np.zeros((nmix, dim), dtype=np.float32)
        self.valid_gconsts = False

    @property
    def num_gauss(self) -> int:
        return len(self.weights)

    @property
    def dim(self) -> int:
        return self.inv_vars.shape[1]

    def copy(self) -> "DiagGmm":
        g = DiagGmm()
        g.weights = self.weights.copy()
        g.gconsts = self.gconsts.copy()
        g.inv_vars = self.inv_vars.copy()
        g.means_invvars = self.means_invvars.copy()
        g.valid_gconsts = self.valid_gconsts
        return g

    # -------------------------------------------------------------- setters

    def set_weights(self, w: np.ndarray) -> None:
        assert w.shape == self.weights.shape
        self.weights = np.asarray(w, dtype=np.float32).copy()
        self.valid_gconsts = False

    def set_means(self, means: np.ndarray) -> None:
        assert means.shape == self.means_invvars.shape
        self.means_invvars = (means * self.inv_vars).astype(np.float32)
        self.valid_gconsts = False

    def set_invvars(self, invvars: np.ndarray) -> None:
        assert invvars.shape == self.inv_vars.shape
        self.means_invvars = (
            self.means_invvars / self.inv_vars * invvars
        ).astype(np.float32)
        self.inv_vars = np.asarray(invvars, dtype=np.float32).copy()
        self.valid_gconsts = False

    def set_invvars_and_means(self, invvars: np.ndarray, means: np.ndarray) -> None:
        assert invvars.shape == self.inv_vars.shape
        assert means.shape == self.means_invvars.shape
        self.inv_vars = np.asarray(invvars, dtype=np.float32).copy()
        self.means_invvars = (means * self.inv_vars).astype(np.float32)
        self.valid_gconsts = False

    def get_means(self) -> np.ndarray:
        return self.means_invvars / self.inv_vars

    def get_vars(self) -> np.ndarray:
        return 1.0 / self.inv_vars

    def set_component_weight(self, g: int, w: float) -> None:
        assert w > 0.0 and g < self.num_gauss
        self.weights[g] = w
        self.valid_gconsts = False

    def set_component_mean(self, g: int, v: np.ndarray) -> None:
        assert g < self.num_gauss and v.shape == (self.dim,)
        self.means_invvars[g] = self.inv_vars[g] * v
        self.valid_gconsts = False

    def set_component_inv_var(self, g: int, v: np.ndarray) -> None:
        assert g < self.num_gauss and v.shape == (self.dim,)
        self.means_invvars[g] = self.means_invvars[g] / self.inv_vars[g] * v
        self.inv_vars[g] = v
        self.valid_gconsts = False

    def get_component_mean(self, g: int) -> np.ndarray:
        return self.means_invvars[g] / self.inv_vars[g]

    def get_component_variance(self, g: int) -> np.ndarray:
        return 1.0 / self.inv_vars[g]

    def component_log_likelihood(self, data: np.ndarray, comp: int) -> float:
        assert data.shape == (self.dim,)
        return float(
            self.means_invvars[comp] @ data
            - 0.5 * self.inv_vars[comp] @ (data**2)
            + self.gconsts[comp]
        )

    # ------------------------------------------------------------- gconsts

    def compute_gconsts(self) -> int:
        """Recompute cached per-component constants; returns #bad components.

        gconst = log w - 0.5 (D log 2π - Σ log(1/v) + Σ (m/v)²·v)
        i.e. the log-likelihood at a zero feature value.
        """
        nmix, dim = self.num_gauss, self.dim
        offset = -0.5 * M_LOG_2PI * dim
        with np.errstate(divide="ignore"):
            gc = (
                np.log(self.weights)
                + offset
                + 0.5 * np.sum(np.log(self.inv_vars), axis=1)
                - 0.5 * np.sum(self.means_invvars**2 / self.inv_vars, axis=1)
            ).astype(np.float32)
        if np.any(np.isnan(gc)):
            raise ValueError("NaN in gconst computation")
        num_bad = int(np.sum(np.isinf(gc)))
        gc = np.where(np.isposinf(gc), -gc, gc)
        self.gconsts = gc
        self.valid_gconsts = True
        return num_bad

    # ---------------------------------------------------------- likelihoods

    def log_likelihoods(self, data: np.ndarray) -> np.ndarray:
        """Per-component loglikes for one frame (D,) -> (K,)."""
        assert data.shape == (self.dim,)
        return (
            self.gconsts
            + self.means_invvars @ data
            - 0.5 * self.inv_vars @ (data**2)
        )

    def log_likelihoods_matrix(self, data: np.ndarray) -> np.ndarray:
        """(T, D) -> (T, K)."""
        return (
            self.gconsts[None, :]
            + data @ self.means_invvars.T
            - 0.5 * (data**2) @ self.inv_vars.T
        )

    def log_likelihood(self, data: np.ndarray) -> float:
        if not self.valid_gconsts:
            raise RuntimeError("Call compute_gconsts() first")
        ll = self.log_likelihoods(data)
        m = np.max(ll)
        ans = float(m + np.log(np.sum(np.exp(ll - m))))
        if not np.isfinite(ans):
            raise ValueError("Invalid log-likelihood")
        return ans

    def component_posteriors(self, data: np.ndarray) -> Tuple[float, np.ndarray]:
        """Returns (total loglike, per-component posteriors) for one frame."""
        if not self.valid_gconsts:
            raise RuntimeError("Call compute_gconsts() first")
        ll = self.log_likelihoods(data)
        m = np.max(ll)
        e = np.exp(ll - m)
        s = np.sum(e)
        return float(m + np.log(s)), (e / s).astype(np.float32)

    def gaussian_selection(self, data: np.ndarray, num_gselect: int) -> Tuple[float, List[int]]:
        """Top-k component indices (best-first) and their total loglike."""
        ll = self.log_likelihoods(data)
        k = min(num_gselect, self.num_gauss)
        idx = np.argsort(-ll)[:k]
        m = np.max(ll[idx])
        tot = float(m + np.log(np.sum(np.exp(ll[idx] - m))))
        return tot, idx.tolist()

    def log_likelihoods_preselect(
        self, data: np.ndarray, indices: List[int]
    ) -> np.ndarray:
        """Per-component loglikes restricted to ``indices``."""
        idx = np.asarray(indices, dtype=np.int64)
        return (
            self.gconsts[idx]
            + self.means_invvars[idx] @ data
            - 0.5 * self.inv_vars[idx] @ (data**2)
        )

    def gaussian_selection_preselect(
        self, data: np.ndarray, preselect: List[int], num_gselect: int
    ) -> Tuple[float, List[int]]:
        """Top-k within a preselected subset (best-first)."""
        ll = self.log_likelihoods_preselect(data, preselect)
        k = min(num_gselect, len(preselect))
        order = np.argsort(-ll)[:k]
        m = np.max(ll[order])
        tot = float(m + np.log(np.sum(np.exp(ll[order] - m))))
        return tot, [preselect[i] for i in order]

    # ----------------------------------------------------------- structural

    def split(
        self,
        target_components: int,
        perturb_factor: float,
        rng: Optional[np.random.Generator] = None,
        history: Optional[List[int]] = None,
    ) -> None:
        """Split highest-weight components until reaching the target.

        Each split halves the weight and perturbs means_invvars by
        ±perturb_factor · N(0,1) · sqrt(inv_var) (the perturbation has the
        dimension of an inverse standard deviation because it is applied to
        means·inv_vars).  The reference's RNG is unseedable; ours takes an
        explicit generator for reproducibility.
        """
        if target_components < self.num_gauss or self.num_gauss == 0:
            raise ValueError(
                f"Cannot split from {self.num_gauss} to {target_components}"
            )
        if target_components == self.num_gauss:
            return
        if rng is None:
            rng = np.random.default_rng()
        cur = self.num_gauss
        dim = self.dim
        self.weights = np.resize(self.weights, target_components)
        self.means_invvars = np.vstack(
            [self.means_invvars, np.zeros((target_components - cur, dim), np.float32)]
        )
        self.inv_vars = np.vstack(
            [self.inv_vars, np.zeros((target_components - cur, dim), np.float32)]
        )
        while cur < target_components:
            max_idx = int(np.argmax(self.weights[:cur]))
            if history is not None:
                history.append(max_idx)
            self.weights[max_idx] /= 2
            self.weights[cur] = self.weights[max_idx]
            rand_vec = rng.standard_normal(dim).astype(np.float32) * np.sqrt(
                self.inv_vars[max_idx]
            )
            self.inv_vars[cur] = self.inv_vars[max_idx]
            self.means_invvars[cur] = (
                self.means_invvars[max_idx] + rand_vec * perturb_factor
            )
            self.means_invvars[max_idx] = (
                self.means_invvars[max_idx] - rand_vec * perturb_factor
            )
            cur += 1
        self.compute_gconsts()

    def perturb(
        self, perturb_factor: float, rng: Optional[np.random.Generator] = None
    ) -> None:
        if rng is None:
            rng = np.random.default_rng()
        self.means_invvars = (
            self.means_invvars
            + rng.standard_normal(self.means_invvars.shape).astype(np.float32)
            * np.sqrt(self.inv_vars)
            * perturb_factor
        )
        self.compute_gconsts()

    def merge(
        self, target_components: int, history: Optional[List[int]] = None
    ) -> None:
        """Greedy pairwise merge minimizing the log-likelihood decrease."""
        if target_components <= 0 or self.num_gauss < target_components:
            raise ValueError(
                f"Cannot merge from {self.num_gauss} to {target_components}"
            )
        if self.num_gauss == target_components:
            return
        num_comp = self.num_gauss

        if target_components == 1:
            vars_ = 1.0 / self.inv_vars
            means = self.means_invvars * vars_
            second = vars_ + means**2
            w = self.weights
            mean1 = w @ means  # (D,)
            var1 = w @ second
            wsum = float(w.sum())
            if not math.isclose(wsum, 1.0, rel_tol=1e-6):
                mean1 *= wsum
                var1 *= wsum
                wsum = 1.0
            inv_var1 = 1.0 / (var1 - mean1**2)
            self.weights = np.array([wsum], dtype=np.float32)
            self.inv_vars = inv_var1[None, :].astype(np.float32)
            self.means_invvars = (mean1 * inv_var1)[None, :].astype(np.float32)
            self.gconsts = np.zeros(1, dtype=np.float32)
            self.compute_gconsts()
            return

        discarded = np.zeros(num_comp, dtype=bool)
        logdet = 0.5 * np.sum(np.log(self.inv_vars), axis=1)
        vars_ = 1.0 / self.inv_vars
        means = self.means_invvars * vars_
        vars_ = vars_ + means**2  # second-order stats (normalized)

        def merged_logdet(w1, w2, f1, f2, s1, s2):
            w_sum = w1 + w2
            tmp_mean = (f1 + f2 * (w2 / w1)) * (w1 / w_sum)
            tmp_var = (s1 + s2 * (w2 / w1)) * (w1 / w_sum) - tmp_mean**2
            return -0.5 * float(np.sum(np.log(tmp_var)))

        delta_like = np.full((num_comp, num_comp), -np.inf, dtype=np.float64)
        for i in range(num_comp):
            for j in range(i):
                w1, w2 = float(self.weights[i]), float(self.weights[j])
                w_sum = w1 + w2
                ml = merged_logdet(w1, w2, means[i], means[j], vars_[i], vars_[j])
                delta_like[i, j] = w_sum * ml - w1 * logdet[i] - w2 * logdet[j]

        for _ in range(num_comp - target_components):
            max_delta = -np.inf
            max_i = max_j = -1
            for i in range(num_comp):
                if discarded[i]:
                    continue
                for j in range(i):
                    if discarded[j]:
                        continue
                    if delta_like[i, j] > max_delta:
                        max_delta = delta_like[i, j]
                        max_i, max_j = i, j
            assert max_i >= 0 and max_j >= 0 and max_i != max_j
            if history is not None:
                history.extend([max_i, max_j])
            w1, w2 = float(self.weights[max_i]), float(self.weights[max_j])
            w_sum = w1 + w2
            means[max_i] = (means[max_i] + (w2 / w1) * means[max_j]) * (w1 / w_sum)
            vars_[max_i] = (vars_[max_i] + (w2 / w1) * vars_[max_j]) * (w1 / w_sum)
            self.weights[max_i] = w_sum
            self.inv_vars[max_i] = 1.0 / (vars_[max_i] - means[max_i] ** 2)
            self.means_invvars[max_i] = means[max_i] * self.inv_vars[max_i]
            logdet[max_i] = 0.5 * float(np.sum(np.log(self.inv_vars[max_i])))
            discarded[max_j] = True
            for j in range(num_comp):
                if j == max_i or discarded[j]:
                    continue
                w1 = float(self.weights[max_i])
                w2 = float(self.weights[j])
                w_sum = w1 + w2
                ml = merged_logdet(
                    w1, w2, means[max_i], means[j], vars_[max_i], vars_[j]
                )
                tmp = w_sum * ml - w1 * logdet[max_i] - w2 * logdet[j]
                delta_like[max_i, j] = tmp
                delta_like[j, max_i] = tmp

        keep = ~discarded
        self.weights = self.weights[keep]
        self.means_invvars = self.means_invvars[keep]
        self.inv_vars = self.inv_vars[keep]
        self.compute_gconsts()

    def merge_kmeans(
        self,
        target_components: int,
        rng: Optional[np.random.Generator] = None,
    ) -> None:
        """Merge components by k-means clustering of their Gaussian stats
        (the clustering analogue of greedy pairwise merge)."""
        from khg_tpu.est.cluster import (
            ClusterKMeansOptions,
            GaussClusterable,
            cluster_kmeans,
        )

        if target_components <= 0 or self.num_gauss < target_components:
            raise ValueError(
                f"Cannot merge from {self.num_gauss} to {target_components}"
            )
        if self.num_gauss == target_components:
            return
        min_var = 1.0e-10
        points = []
        for g in range(self.num_gauss):
            count = float(self.weights[g])
            if count == 0:
                logger.warning("Skipping zero-weight component in clustering")
                continue
            var = 1.0 / self.inv_vars[g]
            mean = self.means_invvars[g] * var
            x_stats = mean * count
            x2_stats = (var + mean**2) * count
            points.append(
                GaussClusterable(
                    x_stats.astype(np.float64),
                    x2_stats.astype(np.float64),
                    min_var,
                    count,
                )
            )
        if len(points) <= target_components:
            logger.warning("Too few nonzero components; not clustering")
            return
        clusters, _, _ = cluster_kmeans(
            points, target_components, ClusterKMeansOptions(), rng=rng
        )
        self.resize(len(clusters), self.dim)
        for g, gc in enumerate(clusters):
            self.weights[g] = gc.count
            mean = gc.x_stats / gc.count
            var = gc.x2_stats / gc.count - mean**2
            inv_var = 1.0 / np.maximum(var, min_var)
            self.inv_vars[g] = inv_var.astype(np.float32)
            self.means_invvars[g] = (mean * inv_var).astype(np.float32)
        self.compute_gconsts()

    def remove_components(self, indices: List[int], renorm_weights: bool) -> None:
        indices = sorted(set(indices))
        if self.num_gauss - len(indices) < 1:
            raise ValueError("Cannot remove all components")
        keep = np.ones(self.num_gauss, dtype=bool)
        keep[indices] = False
        self.weights = self.weights[keep]
        self.gconsts = self.gconsts[keep]
        self.means_invvars = self.means_invvars[keep]
        self.inv_vars = self.inv_vars[keep]
        if renorm_weights:
            self.weights = self.weights / self.weights.sum()
            self.valid_gconsts = False

    def interpolate(self, rho: float, source: "DiagGmm", flags: int = 0b111) -> None:
        from khg_tpu.est.flags import GMM_MEANS, GMM_VARIANCES, GMM_WEIGHTS

        assert self.num_gauss == source.num_gauss and self.dim == source.dim
        w, m, v = self.weights.copy(), self.get_means(), self.get_vars()
        sw, sm, sv = source.weights, source.get_means(), source.get_vars()
        if flags & GMM_WEIGHTS:
            w = w * (1 - rho) + sw * rho
            w /= w.sum()
        if flags & GMM_MEANS:
            m = m * (1 - rho) + sm * rho
        if flags & GMM_VARIANCES:
            v = v * (1 - rho) + sv * rho
        self.weights = w.astype(np.float32)
        self.inv_vars = (1.0 / v).astype(np.float32)
        self.means_invvars = (m / v).astype(np.float32)
        self.compute_gconsts()

    def generate(self, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Sample one feature vector from the mixture."""
        if rng is None:
            rng = np.random.default_rng()
        w = self.weights / self.weights.sum()
        i = int(rng.choice(len(w), p=w))
        var = 1.0 / self.inv_vars[i]
        mean = self.means_invvars[i] * var
        return (mean + rng.standard_normal(self.dim) * np.sqrt(var)).astype(
            np.float32
        )

    # ------------------------------------------------------------- pickling

    def __getstate__(self):
        return {
            "weights": self.weights,
            "gconsts": self.gconsts,
            "inv_vars": self.inv_vars,
            "means_invvars": self.means_invvars,
            "valid_gconsts": self.valid_gconsts,
        }

    def __setstate__(self, state):
        self.__init__()
        self.__dict__.update(state)
