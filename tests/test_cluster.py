import math

import numpy as np

from khg_tpu.est.cluster import (
    ClusterKMeansOptions,
    GaussClusterable,
    ScalarClusterable,
    cluster_kmeans,
    sum_clusterable,
)
from tests.test_align import random_am


def test_scalar_clusterable():
    a = ScalarClusterable(1.0)
    b = ScalarClusterable(3.0)
    a.add(b)
    assert a.normalizer() == 2.0
    assert math.isclose(a.mean(), 2.0)
    # objf = -count*var = -(sum x2 - (sum x)^2/count) = -(10 - 8) = -2
    assert math.isclose(a.objf(), -2.0)
    # distance of identical points is 0
    c = ScalarClusterable(5.0)
    d = ScalarClusterable(5.0)
    assert math.isclose(c.distance(d), 0.0, abs_tol=1e-9)


def test_gauss_clusterable_objf_peak_at_tight_cluster():
    rng = np.random.default_rng(0)
    tight = sum_clusterable(
        [GaussClusterable.from_point(rng.standard_normal(3) * 0.01 + 5.0)
         for _ in range(20)]
    )
    loose = sum_clusterable(
        [GaussClusterable.from_point(rng.standard_normal(3) * 3.0)
         for _ in range(20)]
    )
    assert tight.objf() > loose.objf()


def test_kmeans_separates_clear_clusters():
    rng = np.random.default_rng(1)
    pts = []
    labels = []
    centers = [np.array([0.0, 0.0]), np.array([10.0, 10.0]), np.array([-10.0, 5.0])]
    for i, c in enumerate(centers):
        for _ in range(15):
            pts.append(GaussClusterable.from_point(c + rng.standard_normal(2) * 0.2))
            labels.append(i)
    clusters, assignments, objf = cluster_kmeans(
        pts, 3, ClusterKMeansOptions(num_tries=3), rng=rng
    )
    # all points with same true label share the same assignment
    for i in range(3):
        assigned = {assignments[j] for j in range(len(pts)) if labels[j] == i}
        assert len(assigned) == 1, (i, assigned)
    # cluster means recover the centers
    means = sorted(
        (c.x_stats / c.count).tolist() for c in clusters
    )
    expected = sorted(c.tolist() for c in centers)
    for m, e in zip(means, expected):
        np.testing.assert_allclose(m, e, atol=0.5)


def test_merge_kmeans_on_gmm():
    rng = np.random.default_rng(2)
    am = random_am(1, 4, rng, max_mix=1)
    g = am.get_pdf(0)
    g.split(8, 0.2, rng=rng)
    w0 = g.weights.sum()
    g.merge_kmeans(3, rng=rng)
    assert g.num_gauss == 3
    assert math.isclose(g.weights.sum(), w0, rel_tol=1e-4)
    assert g.valid_gconsts
