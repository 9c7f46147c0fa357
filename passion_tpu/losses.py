"""Segmentation + distillation losses (channels-last, per-sample shapes).

Exact functional ports of the reference loss semantics
(code/utils/criterions.py) re-expressed as vectorized jnp:

* `dice_loss_bs`              — criterions.py:25-38
* `softmax_weighted_loss_bs`  — criterions.py:59-76
* `temp_kl_loss_bs`           — criterions.py:92-103
* `prototype_passion_loss_bs` — criterions.py:144-180 (the data-dependent
  `if (sum(target_i)>0).all()` class skipping becomes masked arithmetic that
  produces identical values, including the empty-class case)

All `_bs` functions return per-sample `(B, 1)` losses so the train step can
re-weight per modality, mirroring the reference's DataParallel gather
convention (README.md:15). Inputs are channels-last: `(B, H, W, Z, C)`.
`up_scale` replaces the reference's `up_op` argument: probabilities are
trilinearly upsampled (align_corners=True) by that integer factor before the
loss, matching `nn.Upsample` applied to softmax outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from passion_tpu.ops.resize import upsample_trilinear

CLAMP_MIN = 0.005  # probability clamp used throughout criterions.py


def _maybe_upsample(p: jnp.ndarray, up_scale: int) -> jnp.ndarray:
    if up_scale and up_scale != 1:
        return upsample_trilinear(p, up_scale, align_corners=True)
    return p


def _f32(*arrays):
    """Losses always reduce in fp32: the model forward may run in bf16
    (mixed-precision training), but summing ~512k voxel terms in bf16 loses
    the low bits that the preference signals (dist) are made of."""
    return tuple(a.astype(jnp.float32) for a in arrays)


def dice_loss_bs(
    output: jnp.ndarray,
    target: jnp.ndarray,
    num_cls: int = 4,
    eps: float = 1e-7,
    up_scale: int = 1,
) -> jnp.ndarray:
    """Soft multi-class dice loss, per sample. output: probabilities."""
    (output,) = _f32(output)
    output = _maybe_upsample(output, up_scale)
    target = target.astype(output.dtype)
    spatial = (1, 2, 3)
    num = jnp.sum(output * target, axis=spatial)  # (B, C)
    l = jnp.sum(output, axis=spatial)
    r = jnp.sum(target, axis=spatial)
    dice = jnp.sum(2.0 * num / (l + r + eps), axis=-1)  # (B,)
    return (1.0 - dice / num_cls)[:, None]


def softmax_weighted_loss_bs(
    output: jnp.ndarray,
    target: jnp.ndarray,
    num_cls: int = 4,
    up_scale: int = 1,
) -> jnp.ndarray:
    """Class-frequency-weighted cross entropy, per sample. output: probs."""
    (output,) = _f32(output)
    output = _maybe_upsample(output, up_scale)
    target = target.astype(output.dtype)
    spatial = (1, 2, 3)
    cls_sum = jnp.sum(target, axis=spatial)  # (B, C)
    total = jnp.sum(cls_sum, axis=-1, keepdims=True)  # (B, 1)
    weighted = 1.0 - cls_sum / total  # (B, C)
    logp = jnp.log(jnp.clip(output, CLAMP_MIN, 1.0))
    cross = -(weighted[:, None, None, None, :] * target * logp)
    # reference sums over classes, then means over spatial dims only
    return jnp.mean(jnp.sum(cross, axis=-1), axis=spatial)[:, None]


def fuse_loss_bs(output, target, num_cls: int = 4) -> jnp.ndarray:
    """WCE + dice on final fused softmax prediction (train.py:228)."""
    return softmax_weighted_loss_bs(output, target, num_cls) + dice_loss_bs(
        output, target, num_cls
    )


def temp_kl_loss_bs(
    logit_s: jnp.ndarray,
    logit_t: jnp.ndarray,
    target: jnp.ndarray,  # unused; kept for reference-API parity
    num_cls: int = 4,
    temp: float = 1.0,
    up_scale: int = 1,
) -> jnp.ndarray:
    """Temperature-softmax KL(teacher ‖ student) with T² scaling, per sample."""
    del target, num_cls
    logit_s, logit_t = _f32(logit_s, logit_t)
    pred_s = jax.nn.softmax(logit_s / temp, axis=-1)
    pred_t = jax.nn.softmax(logit_t / temp, axis=-1)
    pred_s = _maybe_upsample(pred_s, up_scale)
    pred_t = _maybe_upsample(pred_t, up_scale)
    pred_s = jnp.clip(pred_s, CLAMP_MIN, 1.0)
    pred_t = jnp.clip(pred_t, CLAMP_MIN, 1.0)
    kl = (temp * temp) * pred_t * (jnp.log(pred_t) - jnp.log(pred_s))
    return jnp.mean(kl, axis=(1, 2, 3, 4))[:, None]


def _safe_norm(x, axis, eps):
    """max(||x||, eps) with a NaN-free gradient at x == 0.

    sqrt(max(Σx², eps²)) equals max(sqrt(Σx²), eps) exactly (monotonicity)
    but never differentiates sqrt at 0 — zero vectors arise routinely from
    fully-masked modality paths.
    """
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), eps * eps))


def _cosine_similarity(x, y, axis, eps=1e-5):
    """torch.nn.functional.cosine_similarity semantics."""
    xn = _safe_norm(x, axis, eps)
    yn = _safe_norm(y, axis, eps)
    return jnp.sum(x * y, axis=axis) / (xn * yn)


def prototype_passion_loss_bs(
    feature_s: jnp.ndarray,
    feature_t: jnp.ndarray,
    target: jnp.ndarray,
    logit_s: jnp.ndarray,  # unused by the reference's final value; kept for parity
    logit_t: jnp.ndarray,
    num_cls: int = 4,
    temp: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Prototype similarity-map distillation loss + preference distance.

    Class prototypes are masked GAPs of features over the GT region; the loss
    is the MSE between student/teacher cosine-similarity maps, and `dist` is
    the mean absolute similarity gap used as PASSION's preference signal.

    A class participates only if EVERY batch element contains it (reference
    criterions.py:155-157). Under jit this is a per-class include flag; the
    means divide by the number of included classes exactly as the reference's
    `torch.cat` + `mean(dim=1..)` does. With zero included classes the
    reference would crash; we return zeros.

    Args:
      feature_s/feature_t: (B, H, W, Z, C) decoder features (student/teacher).
      target: (B, H, W, Z, num_cls) one-hot labels.

    Returns:
      (proto_loss (B,1), dist (B,1))
    """
    del logit_s, logit_t, temp
    eps = 1e-5
    f32 = jnp.float32
    target = target[..., :num_cls]
    feature_s = feature_s.astype(f32)
    feature_t = feature_t.astype(f32)
    target = target.astype(f32)
    spatial = (1, 2, 3)

    cls_count = jnp.sum(target, axis=spatial)  # (B, num_cls)
    include = jnp.all(cls_count > 0, axis=0)  # (num_cls,)
    n_incl = jnp.sum(include.astype(f32))

    # prototypes: (B, num_cls, C)
    proto_s = jnp.einsum("bhwzc,bhwzk->bkc", feature_s, target) / (
        cls_count[:, :, None] + eps
    )
    proto_t = jnp.einsum("bhwzc,bhwzk->bkc", feature_t, target) / (
        cls_count[:, :, None] + eps
    )

    # cosine similarity maps: (B, num_cls, H, W, Z)
    def sim_maps(feature, proto):
        fn = _safe_norm(feature, -1, eps)  # (B,H,W,Z)
        pn = _safe_norm(proto, -1, eps)  # (B,K)
        dots = jnp.einsum("bhwzc,bkc->bkhwz", feature, proto)
        return dots / (fn[:, None] * pn[:, :, None, None, None])

    sim_s = sim_maps(feature_s, proto_s)
    sim_t = sim_maps(feature_t, proto_t)

    sq = jnp.square(sim_s - sim_t)  # (B, K, H, W, Z)
    ab = jnp.abs(sim_s - sim_t)
    incl = include[None, :, None, None, None].astype(f32)
    denom = jnp.maximum(n_incl, 1.0) * sq.shape[2] * sq.shape[3] * sq.shape[4]
    proto_loss = jnp.sum(sq * incl, axis=(1, 2, 3, 4)) / denom
    dist = jnp.sum(ab * incl, axis=(1, 2, 3, 4)) / denom
    return proto_loss[:, None], dist[:, None]


# ---------------------------------------------------------------------------
# Scalar (batch-mean) variants kept for API parity with criterions.py:11-23,
# 40-57, 79-90, 106-142. The drivers use only the _bs forms.
# ---------------------------------------------------------------------------

def dice_loss(output, target, num_cls=4, eps=1e-7, up_scale=1):
    output = _maybe_upsample(output, up_scale)
    target = target.astype(output.dtype)
    num = jnp.sum(output * target, axis=(0, 1, 2, 3))
    l = jnp.sum(output, axis=(0, 1, 2, 3))
    r = jnp.sum(target, axis=(0, 1, 2, 3))
    dice = jnp.sum(2.0 * num / (l + r + eps))
    return 1.0 - dice / num_cls


def softmax_weighted_loss(output, target, num_cls=4, up_scale=1):
    output = _maybe_upsample(output, up_scale)
    target = target.astype(output.dtype)
    cls_sum = jnp.sum(target, axis=(1, 2, 3))
    total = jnp.sum(cls_sum, axis=-1, keepdims=True)
    weighted = 1.0 - cls_sum / total
    logp = jnp.log(jnp.clip(output, CLAMP_MIN, 1.0))
    cross = -(weighted[:, None, None, None, :] * target * logp)
    return jnp.mean(jnp.sum(cross, axis=-1))


def temp_kl_loss(logit_s, logit_t, target, num_cls=4, temp=1.0, up_scale=1):
    return jnp.mean(
        temp_kl_loss_bs(logit_s, logit_t, target, num_cls, temp, up_scale)
    )


def prototype_passion_loss(feature_s, feature_t, target, logit_s, logit_t,
                           num_cls=4, temp=1.0):
    pl, d = prototype_passion_loss_bs(
        feature_s, feature_t, target, logit_s, logit_t, num_cls, temp
    )
    return jnp.mean(pl), jnp.mean(d)
