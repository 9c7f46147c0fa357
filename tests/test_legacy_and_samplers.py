"""Goldens for the legacy-loss tail and the sampler module.

Loss oracles are independent torch implementations written from the formulas
in the reference (clamped CE, mean-reduced focal, global soft dice) — the
same methodology as tests/test_losses.py.
"""

import collections

import numpy as np
import pytest
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


# ----------------------------------------------- r4 dead-code shim closure


def test_prototype_pmr_loss_matches_torch():
    # independent torch oracle of criterions.py:183-206: class kept only if
    # present in EVERY sample; softmax of negative L2 distance-to-prototype
    # maps over the kept classes; clamped NLL of the true-class probability
    rng = np.random.default_rng(11)
    b, h, w, z, cf, ncls = 2, 5, 4, 3, 6, 4
    feats = rng.standard_normal((b, h, w, z, cf)).astype(np.float32)
    lab = rng.integers(0, ncls, size=(b, h, w, z))
    lab[0][lab[0] == 3] = 1  # class 3 absent in sample 0 -> skipped
    onehot = np.eye(ncls, dtype=np.float32)[lab]

    fs = _t(feats).double()  # (B, C, H, W, Z)
    tg = _t(onehot).double()
    eps = 1e-5
    ss, gts = [], []
    for i in range(ncls):
        ti = tg[:, i]
        if (ti.sum(dim=(-3, -2, -1)) > 0).all():
            proto = (fs * ti[:, None]).sum(dim=(-3, -2, -1)) / (
                ti[:, None].sum(dim=(-3, -2, -1)) + eps)
            pm = -torch.sqrt(
                ((fs - proto[:, :, None, None, None]) ** 2).sum(dim=1))
            ss.append(pm.unsqueeze(1))
            gts.append(ti[:, None])
    soft = torch.softmax(torch.cat(ss, 1), 1)
    gtc = torch.cat(gts, 1)
    pd = (soft * gtc).sum(1)
    want_proto = (-(pd.clamp(0.005, 1).log())).mean().item()
    want_kl = pd.mean().item()

    got_proto, got_kl = LL.prototype_pmr_loss(feats, feats, onehot,
                                              num_cls=ncls)
    np.testing.assert_allclose(float(got_proto), want_proto, rtol=2e-4)
    np.testing.assert_allclose(float(got_kl), want_kl, rtol=2e-4)


def test_js_div_matches_torch_kldivloss_mean():
    rng = np.random.default_rng(12)
    p = rng.random((3, 4, 5)).astype(np.float32) + 0.1
    q = rng.random((3, 4, 5)).astype(np.float32) + 0.1
    kld = torch.nn.KLDivLoss()  # reduction='mean' over ALL elements
    log_pq = ((torch.from_numpy(p) + torch.from_numpy(q)) / 2).log()
    want = ((kld(log_pq, torch.from_numpy(p))
             + kld(log_pq, torch.from_numpy(q))) / 2).item()
    np.testing.assert_allclose(float(LL.js_div(p, q)), want, rtol=1e-5)


def test_mutual_learning_loss_pairwise_masked():
    # oracle: per-sample sum of JS over present-modality pairs across
    # scales, / (2K(K-1)); K<=1 -> 0 (lr_scheduler.py:74-88 semantics with
    # the per-sample mask applied per sample, see the port's docstring)
    rng = np.random.default_rng(13)
    b, m, c, s = 3, 4, 5, 2
    feats = [rng.random((b, m, c, s, s)).astype(np.float32) + 0.1
             for _ in range(2)]
    mask = np.array([[1, 1, 1, 0], [1, 0, 0, 0], [0, 1, 0, 1]], bool)

    def js(pn, qn):
        pt, qt = torch.from_numpy(pn), torch.from_numpy(qn)
        logm = ((pt + qt) / 2).log()
        return (((pt * (pt.log() - logm)).mean()
                 + (qt * (qt.log() - logm)).mean()) / 2).item()

    want = np.zeros((b,))
    for i in range(b):
        k_cnt = int(mask[i].sum())
        if k_cnt <= 1:
            continue
        acc = 0.0
        for f in feats:
            sm = torch.softmax(torch.from_numpy(f[i]), dim=1).numpy()
            present = np.where(mask[i])[0]
            for a in range(len(present)):
                for bb in range(a + 1, len(present)):
                    acc += js(sm[present[a]], sm[present[bb]])
        want[i] = acc / (2 * k_cnt * (k_cnt - 1))

    got = np.asarray(LL.mutual_learning_loss(feats, mask))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_get_temperature_schedule():
    from passion_tpu.engine.schedule import get_temperature
    assert [get_temperature(e) for e in (0, 1, 29, 30, 299)] == [30, 29, 1,
                                                                 1, 1]


def test_record_loss_tags_and_values():
    from passion_tpu.logging_utils import record_loss

    class FakeWriter:
        def __init__(self):
            self.rows = []

        def add_scalar(self, tag, value, global_step):
            self.rows.append((tag, value, global_step))

    wr = FakeWriter()
    table = np.array([[1, 0, 0, 0], [1, 1, 0, 0]], bool)
    masks = np.array([[1, 1, 0, 0], [1, 0, 0, 0]], bool)
    losses = [np.array([0.5, 0.25]), np.array([2.0, 4.0])]
    record_loss(wr, masks, losses, ["dice", "ce"], step=7,
                mask_table=table, mask_names=["t1", "t1ce"],
                p_types=["idt", "idt"])
    assert wr.rows == [("idt_t1ce_dice", 0.5, 7), ("idt_t1ce_ce", 2.0, 7),
                       ("idt_t1_dice", 0.25, 7), ("idt_t1_ce", 4.0, 7)]


def test_str2bool_and_attrdict_and_yaml(tmp_path):
    from passion_tpu.config import (AttrDict, load_yaml_config, parse_value,
                                    str2bool)
    for s in ("yes", "True", "T", "y", "1"):
        assert str2bool(s) is True
    for s in ("no", "False", "f", "N", "0"):
        assert str2bool(s) is False
    with pytest.raises(ValueError):
        str2bool("maybe")

    d = AttrDict()
    d.a.b = 3  # auto-vivify nested
    assert d["a"]["b"] == 3 and d.a.b == 3
    d.merge({"a": {"c": 4}, "e": 5})
    assert d.a.b == 3 and d.a.c == 4 and d.e == 5

    assert parse_value("(1, 2)") == (1, 2)
    assert parse_value("3/4") == 0.75
    assert parse_value("hello") == "hello"

    f = tmp_path / "cfg.yaml"
    f.write_text("model: mmformer\nopt:\n  lr: '2e-4'\n  betas: '(0.9, 0.999)'\n")
    cfg = load_yaml_config(str(f))
    assert cfg.model == "mmformer"
    assert cfg.opt.lr == 2e-4
    assert cfg.opt.betas == (0.9, 0.999)


def test_tonumpy_transform():
    import jax.numpy as jnp

    from passion_tpu.data.transforms import ToNumpy, from_string
    t = ToNumpy()
    out = t.apply(jnp.ones((2, 2)), 0, None)
    assert isinstance(out, np.ndarray)
    assert from_string("Compose([ToNumpy(),])") is not None
