"""Golden tests for losses against independent torch implementations.

The torch oracles below are written directly from the mathematical
definitions (weighted CE, soft dice, temperature KL, prototype cosine maps)
using torch built-ins, and serve as an independent check of the jnp ports.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from passion_tpu import losses


def _rand_probs(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def _rand_onehot(rng, b, h, w, z, c):
    lab = rng.integers(0, c, size=(b, h, w, z))
    return np.eye(c, dtype=np.float32)[lab]


def _t(x_bhwzc):  # channels-last numpy -> torch NCDHW
    return torch.from_numpy(np.moveaxis(x_bhwzc, -1, 1).copy())


def torch_dice_bs(output, target, num_cls=4, eps=1e-7):
    o, t = _t(output), _t(target)
    num = (o * t).sum(dim=(2, 3, 4))
    l = o.sum(dim=(2, 3, 4))
    r = t.sum(dim=(2, 3, 4))
    dice = (2.0 * num / (l + r + eps)).sum(dim=1)
    return (1.0 - dice / num_cls).unsqueeze(1).numpy()


def torch_wce_bs(output, target, num_cls=4):
    o, t = _t(output), _t(target)
    w = 1.0 - t.sum(dim=(2, 3, 4)) / t.sum(dim=(1, 2, 3, 4), keepdim=False).unsqueeze(1)
    logp = torch.log(torch.clamp(o, 0.005, 1.0))
    cross = -(w[:, :, None, None, None] * t * logp).sum(dim=1)
    return cross.mean(dim=(1, 2, 3)).unsqueeze(1).numpy()


def torch_kl_bs(logit_s, logit_t, temp):
    s = F.softmax(_t(logit_s) / temp, dim=1).clamp(0.005, 1.0)
    t = F.softmax(_t(logit_t) / temp, dim=1).clamp(0.005, 1.0)
    kl = temp * temp * t * (t.log() - s.log())
    return kl.mean(dim=(1, 2, 3, 4)).unsqueeze(1).numpy()


def torch_proto_bs(fs, ft, target, num_cls=4):
    eps = 1e-5
    f_s, f_t, tgt = _t(fs), _t(ft), _t(target)
    s_maps, t_maps = [], []
    for i in range(num_cls):
        ti = tgt[:, i]
        if not (ti.sum(dim=(-3, -2, -1)) > 0).all():
            continue
        ps = (f_s * ti[:, None]).sum(dim=(-3, -2, -1)) / (ti[:, None].sum(dim=(-3, -2, -1)) + eps)
        pt = (f_t * ti[:, None]).sum(dim=(-3, -2, -1)) / (ti[:, None].sum(dim=(-3, -2, -1)) + eps)
        s_maps.append(F.cosine_similarity(f_s, ps[:, :, None, None, None], dim=1, eps=eps).unsqueeze(1))
        t_maps.append(F.cosine_similarity(f_t, pt[:, :, None, None, None], dim=1, eps=eps).unsqueeze(1))
    sm = torch.cat(s_maps, dim=1)
    tm = torch.cat(t_maps, dim=1)
    proto = ((sm - tm) ** 2).mean(dim=(1, 2, 3, 4)).unsqueeze(1)
    dist = ((sm - tm) ** 2).sqrt().mean(dim=(1, 2, 3, 4)).unsqueeze(1)
    return proto.numpy(), dist.numpy()


def test_dice_loss_bs(rng):
    o = _rand_probs(rng, (3, 6, 5, 4, 4))
    t = _rand_onehot(rng, 3, 6, 5, 4, 4)
    ours = np.asarray(losses.dice_loss_bs(jnp.asarray(o), jnp.asarray(t), num_cls=4))
    np.testing.assert_allclose(ours, torch_dice_bs(o, t), rtol=1e-5, atol=1e-6)


def test_softmax_weighted_loss_bs(rng):
    o = _rand_probs(rng, (2, 6, 5, 4, 4))
    t = _rand_onehot(rng, 2, 6, 5, 4, 4)
    ours = np.asarray(losses.softmax_weighted_loss_bs(jnp.asarray(o), jnp.asarray(t)))
    np.testing.assert_allclose(ours, torch_wce_bs(o, t), rtol=1e-5, atol=1e-6)


def test_temp_kl_loss_bs(rng):
    ls = rng.standard_normal((2, 6, 5, 4, 4)).astype(np.float32)
    lt = rng.standard_normal((2, 6, 5, 4, 4)).astype(np.float32)
    ours = np.asarray(losses.temp_kl_loss_bs(jnp.asarray(ls), jnp.asarray(lt),
                                             None, temp=4.0))
    np.testing.assert_allclose(ours, torch_kl_bs(ls, lt, 4.0), rtol=1e-4, atol=1e-5)


def test_kl_with_upsample_matches_torch(rng):
    ls = rng.standard_normal((2, 3, 3, 3, 4)).astype(np.float32)
    lt = rng.standard_normal((2, 3, 3, 3, 4)).astype(np.float32)
    ours = np.asarray(losses.temp_kl_loss_bs(jnp.asarray(ls), jnp.asarray(lt),
                                             None, temp=2.0, up_scale=2))
    s = F.interpolate(F.softmax(_t(ls) / 2.0, dim=1), scale_factor=2,
                      mode="trilinear", align_corners=True).clamp(0.005, 1.0)
    t = F.interpolate(F.softmax(_t(lt) / 2.0, dim=1), scale_factor=2,
                      mode="trilinear", align_corners=True).clamp(0.005, 1.0)
    kl = 4.0 * t * (t.log() - s.log())
    theirs = kl.mean(dim=(1, 2, 3, 4)).unsqueeze(1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_prototype_passion_loss_all_classes_present(rng):
    b, h, w, z, c, k = 2, 4, 4, 4, 6, 4
    fs = rng.standard_normal((b, h, w, z, c)).astype(np.float32)
    ft = rng.standard_normal((b, h, w, z, c)).astype(np.float32)
    # guarantee all classes present in every sample
    lab = rng.integers(0, k, size=(b, h, w, z))
    lab[:, 0, 0, :] = np.arange(k)[None, :]
    t = np.eye(k, dtype=np.float32)[lab]
    ours_p, ours_d = losses.prototype_passion_loss_bs(
        jnp.asarray(fs), jnp.asarray(ft), jnp.asarray(t), None, None, num_cls=k)
    ref_p, ref_d = torch_proto_bs(fs, ft, t, num_cls=k)
    np.testing.assert_allclose(np.asarray(ours_p), ref_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_d), ref_d, rtol=1e-4, atol=1e-5)


def test_prototype_passion_loss_missing_class(rng):
    """A class absent in one sample is excluded for the WHOLE batch."""
    b, h, w, z, c, k = 2, 4, 4, 4, 5, 4
    fs = rng.standard_normal((b, h, w, z, c)).astype(np.float32)
    ft = rng.standard_normal((b, h, w, z, c)).astype(np.float32)
    lab = rng.integers(0, 3, size=(b, h, w, z))  # class 3 absent by default
    lab[0, 0, 0, 0] = 3  # present only in sample 0 -> excluded batch-wide
    for cls in range(3):
        lab[:, 1, 1, cls] = cls  # classes 0-2 in every sample
    t = np.eye(k, dtype=np.float32)[lab]
    ours_p, ours_d = losses.prototype_passion_loss_bs(
        jnp.asarray(fs), jnp.asarray(ft), jnp.asarray(t), None, None, num_cls=k)
    ref_p, ref_d = torch_proto_bs(fs, ft, t, num_cls=k)
    np.testing.assert_allclose(np.asarray(ours_p), ref_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_d), ref_d, rtol=1e-4, atol=1e-5)
