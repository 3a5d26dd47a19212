import numpy as np
import pytest

from khg_tpu.data.loader import BucketingLoader, LoaderConfig


def make_dataset(rng, n=37, dim=8):
    lengths = rng.integers(20, 200, n)
    feats = [rng.standard_normal((int(t), dim)).astype(np.float32) for t in lengths]
    return feats, lengths


def test_loader_covers_all_utterances_once():
    rng = np.random.default_rng(0)
    feats, lengths = make_dataset(rng)
    loader = BucketingLoader(
        len(feats), lambda i: feats[i], lengths,
        LoaderConfig(batch_size=8, num_workers=2, prefetch=2),
    )
    seen = []
    for batch in loader.epoch(0):
        seen.extend(batch.indices.tolist())
        assert batch.feats.shape[0] == len(batch.indices)
        assert batch.feats.shape[1] % 32 == 0
        for j, i in enumerate(batch.indices):
            t = int(batch.num_frames[j])
            assert t == feats[i].shape[0]
            np.testing.assert_array_equal(batch.feats[j, :t], feats[i])
            assert np.all(batch.feats[j, t:] == 0)
    assert sorted(seen) == list(range(len(feats)))


def test_loader_bucketing_bounds_padding():
    rng = np.random.default_rng(1)
    feats, lengths = make_dataset(rng, n=64)
    loader = BucketingLoader(
        len(feats), lambda i: feats[i], lengths,
        LoaderConfig(batch_size=8, num_buckets=4, num_workers=0, shuffle=False),
    )
    waste = 0
    total = 0
    for batch in loader.epoch(0):
        waste += int(np.sum(batch.feats.shape[1] - batch.num_frames))
        total += int(np.sum(batch.num_frames))
    # bucketing keeps pad waste modest
    assert waste < 0.8 * total, (waste, total)


def test_loader_deterministic_per_seed():
    rng = np.random.default_rng(2)
    feats, lengths = make_dataset(rng, n=20)
    mk = lambda: BucketingLoader(  # noqa: E731
        len(feats), lambda i: feats[i], lengths,
        LoaderConfig(batch_size=4, num_workers=2), seed=7,
    )
    a = [b.indices.tolist() for b in mk().epoch(3)]
    b = [b.indices.tolist() for b in mk().epoch(3)]
    assert a == b
    c = [b2.indices.tolist() for b2 in mk().epoch(4)]
    assert a != c


def test_loader_worker_error_propagates():
    def bad(i):
        if i == 3:
            raise ValueError("boom")
        return np.zeros((10, 4), dtype=np.float32)

    loader = BucketingLoader(
        6, bad, [10] * 6, LoaderConfig(batch_size=2, num_workers=2)
    )
    with pytest.raises(ValueError, match="boom"):
        list(loader.epoch(0))
