"""Goldens for the legacy-loss tail and the sampler module.

Loss oracles are independent torch implementations written from the formulas
in the reference (clamped CE, mean-reduced focal, global soft dice) — the
same methodology as tests/test_losses.py.
"""

import collections

import numpy as np
import torch
import torch.nn.functional as F

from passion_tpu import losses_legacy as LL
from passion_tpu.data import samplers


def _rand_probs(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def _t(x_bhwzc):  # channels-last numpy -> torch NCDHW
    return torch.from_numpy(np.moveaxis(x_bhwzc, -1, 1).copy())


RNG = np.random.default_rng(7)
SHAPE = (2, 6, 5, 4)  # B,H,W,Z


def test_softmax_loss_matches_torch():
    c = 5
    probs = _rand_probs(RNG, SHAPE + (c,))
    onehot = np.eye(c, dtype=np.float32)[RNG.integers(0, c, size=SHAPE)]
    o, t = _t(probs), _t(onehot)
    cross = -(t * torch.log(torch.clamp(o, 0.005, 1.0))).sum(dim=1)
    want = cross.mean().item()
    got = float(LL.softmax_loss(probs, onehot, num_cls=c))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_matches_torch_mean_reduction():
    c = 4
    logits = RNG.standard_normal(SHAPE + (c,)).astype(np.float32)
    # labels include 4s that must be relabelled to 3 before the CE
    labels = RNG.choice([0, 1, 2, 4], size=SHAPE)
    o = _t(logits).reshape(SHAPE[0], c, -1).transpose(1, 2).reshape(-1, c)
    t4 = torch.from_numpy(np.where(labels == 4, 3, labels)).reshape(-1)
    logpt = -F.cross_entropy(o, t4)
    pt = torch.exp(logpt)
    want = (-((1 - pt) ** 2.0) * logpt).item()
    got = float(LL.focal_loss(logits, labels, gamma=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_global_and_asymmetric_eps():
    o = RNG.random(SHAPE).astype(np.float32)
    t = (RNG.random(SHAPE) > 0.5).astype(np.float32)
    want = 1.0 - (2 * (o * t).sum()) / (o.sum() + t.sum() + 1e-5)
    np.testing.assert_allclose(float(LL.dice(o, t)), want, rtol=1e-6)
    # empty target + empty output: loss -> 1 (num=0), eps only in the denom
    z = np.zeros(SHAPE, np.float32)
    np.testing.assert_allclose(float(LL.dice(z, z)), 1.0)


def test_sigmoid_and_softmax_dice_label_mapping():
    labels = RNG.choice([0, 1, 2, 4], size=SHAPE)
    sig = RNG.random(SHAPE + (3,)).astype(np.float32)
    soft = _rand_probs(RNG, SHAPE + (4,))

    def ref_dice(o, t, eps=1e-5):
        return 1.0 - (2 * (o * t).sum()) / (o.sum() + t.sum() + eps)

    want_sig = sum(
        ref_dice(sig[..., i], (labels == l).astype(np.float32))
        for i, l in enumerate([1, 2, 4]))
    np.testing.assert_allclose(
        float(LL.sigmoid_dice_loss(sig, labels)), want_sig, rtol=1e-5)

    want_soft = sum(
        ref_dice(soft[..., i], (labels == l).astype(np.float32))
        for i, l in zip([1, 2, 3], [1, 2, 4]))
    np.testing.assert_allclose(
        float(LL.softmax_dice_loss(soft, labels)), want_soft, rtol=1e-5)


# ---------------------------------------------------------------- samplers


def test_random_cycle_iter_covers_every_wrap():
    it = samplers.RandomCycleIter(range(5), seed=0)
    for _ in range(4):  # four full passes, each must be a permutation of 0..4
        assert sorted(next(it) for _ in range(5)) == list(range(5))


def test_msampler_slot_ownership_and_balance():
    ms = samplers.MSampler(batch_sizes=[3, 1], sizes=[9, 4], num_iters=8, seed=1)
    draws = list(ms)
    assert len(ms) == len(draws) == 32
    # slot ownership: within each conceptual batch of 4, slots 0-2 are
    # source 0 and slot 3 is source 1 — the reference's index_data table
    for i, (src, idx) in enumerate(draws):
        assert src == (0 if i % 4 < 3 else 1)
        assert 0 <= idx < (9 if src == 0 else 4)
    # each source's stream is cycle-balanced: counts differ by at most 1
    for src, size in ((0, 9), (1, 4)):
        counts = collections.Counter(i for s, i in draws if s == src)
        assert max(counts.values()) - min(counts.values()) <= 1


def test_cycle_sampler_length_modes():
    assert len(samplers.CycleSampler(6, num_epochs=3, seed=0)) == 18
    s = samplers.CycleSampler(4, num_samples=10, seed=0)
    out = list(s)
    assert len(out) == 10 and set(out) <= set(range(4))


def test_random_sampler_state_roundtrip_replays_stream():
    src = list(range(12))
    a = samplers.RandomSampler(src, seed=3)
    _ = list(a)  # advance one epoch
    state = a.get_state()
    epoch2 = list(a)
    b = samplers.RandomSampler(src, state=state, seed=999)
    assert list(b) == epoch2  # state, not seed, determines the stream
    assert sorted(epoch2) == src  # still a permutation
