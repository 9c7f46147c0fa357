"""Legacy losses shipped (but never wired) by the reference.

Functional ports of the dead-code tail of ``code/utils/criterions.py``:

* ``softmax_loss``       — criterions.py:208-219 (per-class clamped CE summed
  over classes, then a global mean)
* ``focal_loss``         — criterions.py:221-240 (NB: the reference applies
  the focal factor to the MEAN cross-entropy — ``F.cross_entropy`` reduces
  before ``pt`` is formed — so the "per-voxel" modulation is actually a
  single scalar gate.  We reproduce that semantics exactly; ``alpha`` is
  accepted and ignored, as in the reference.)
* ``dice``               — criterions.py:242-247 (global soft dice, the
  ``num`` term does NOT add eps)
* ``sigmoid_dice_loss``  — criterions.py:249-257 (3-channel one-vs-rest dice
  against labels {1, 2, 4})
* ``softmax_dice_loss``  — criterions.py:260-267 (channels 1..3 of a 4-class
  softmax against labels {1, 2, 4})
* ``prototype_pmr_loss`` — criterions.py:183-206 (the unused prototype-
  distribution alternative to the PASSION prototype loss; the reference's
  data-dependent class-skip becomes masked arithmetic under jit)
* ``js_div`` / ``mutual_learning_loss`` — utils/lr_scheduler.py:71-88 (dead
  mutual-learning helpers; the reference's ``mutual_learning_loss`` computes
  the per-sample vector but FORGETS the return statement — we return it)

No PASSION driver calls these (the reference imports only the ``*_loss``
family rebuilt in :mod:`passion_tpu.losses`), but they are part of the public
loss surface, so they live here — channels-last, fp32 reductions, jit-safe.

Conventions match :mod:`passion_tpu.losses`: dense inputs are channels-last
``(B, H, W, Z, C)``; integer label volumes are ``(B, H, W, Z)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLAMP_MIN = 0.005  # same probability clamp as criterions.py


def softmax_loss(output: jnp.ndarray, target: jnp.ndarray,
                 num_cls: int = 5) -> jnp.ndarray:
    """Clamped cross-entropy: mean over voxels of -sum_c t_c * log(p_c).

    ``output`` is probabilities ``(B, H, W, Z, C)``; ``target`` is one-hot of
    the same shape.  Mirrors criterions.py:208-219, where the per-class terms
    are accumulated into one ``(B, H, W, Z)`` tensor and then averaged.
    """
    o = output.astype(jnp.float32)[..., :num_cls]
    t = target.astype(jnp.float32)[..., :num_cls]
    logp = jnp.log(jnp.clip(o, CLAMP_MIN, 1.0))
    return jnp.mean(jnp.sum(-t * logp, axis=-1))


def focal_loss(output: jnp.ndarray, target: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss over logits, reproducing the reference's reduction order.

    ``output``: logits ``(B, H, W, Z, C)``; ``target``: integer labels
    ``(B, H, W, Z)`` possibly containing 4 (relabelled to 3, the ET class).
    criterions.py:221-240 computes ``logpt = -F.cross_entropy(...)`` — a
    MEAN over all voxels — then ``-((1-exp(logpt))**gamma) * logpt``.
    ``alpha`` is unused there too.
    """
    del alpha  # accepted-but-ignored, as in the reference signature
    t = jnp.where(target == 4, 3, target).astype(jnp.int32)
    logits = output.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    logpt = jnp.mean(picked)  # == -F.cross_entropy(output, target)
    pt = jnp.exp(logpt)
    return -((1.0 - pt) ** gamma) * logpt


def dice(output: jnp.ndarray, target: jnp.ndarray,
         eps: float = 1e-5) -> jnp.ndarray:
    """Global soft dice over ALL elements (criterions.py:242-247).

    Note the asymmetric eps: only the denominator is regularized.
    """
    o = output.astype(jnp.float32)
    t = target.astype(jnp.float32)
    num = 2.0 * jnp.sum(o * t)
    den = jnp.sum(o) + jnp.sum(t) + eps
    return 1.0 - num / den


def sigmoid_dice_loss(output: jnp.ndarray, target: jnp.ndarray,
                      alpha: float = 1e-5) -> jnp.ndarray:
    """3-channel one-vs-rest dice vs labels {1, 2, 4} (criterions.py:249-257).

    ``output``: per-channel probabilities ``(B, H, W, Z, 3)`` (the reference
    feeds sigmoid outputs); ``target``: integer labels ``(B, H, W, Z)``.
    """
    loss1 = dice(output[..., 0], (target == 1), eps=alpha)
    loss2 = dice(output[..., 1], (target == 2), eps=alpha)
    loss3 = dice(output[..., 2], (target == 4), eps=alpha)
    return loss1 + loss2 + loss3


def softmax_dice_loss(output: jnp.ndarray, target: jnp.ndarray,
                      eps: float = 1e-5) -> jnp.ndarray:
    """Softmax-channel dice vs labels {1, 2, 4} (criterions.py:260-267).

    ``output``: 4-class softmax probabilities ``(B, H, W, Z, 4)``; channels
    1..3 score labels 1, 2, 4.  The inner ``dice`` calls use dice's own
    default eps (the reference accepts ``eps`` but never forwards it); we
    keep that quirk so values match for any caller.
    """
    del eps  # accepted-but-unforwarded, as in the reference
    loss1 = dice(output[..., 1], (target == 1))
    loss2 = dice(output[..., 2], (target == 2))
    loss3 = dice(output[..., 3], (target == 4))
    return loss1 + loss2 + loss3


def prototype_pmr_loss(feature_s, feature_t, target, logit_s=None,
                       logit_t=None, num_cls: int = 5, temp: float = 1.0,
                       up_op=None):
    """Prototype-distribution loss (criterions.py:183-206, unused PMR
    alternative to ``prototype_passion_loss``).

    ``feature_s``: student features ``(B, H, W, Z, C)`` channels-last;
    ``feature_t``/``logit_*``/``temp``/``up_op`` are accepted-but-unused, as
    in the reference (its ``proto_t`` line is commented out).  ``target``:
    one-hot ``(B, H, W, Z, num_cls)``.

    The reference keeps only classes present in EVERY batch sample (the
    ``(sum(targeti) > 0).all()`` skip), softmaxes the negative L2
    distance-to-prototype maps over the kept classes, and reads off the
    probability of each voxel's true (kept) class.  Here the data-dependent
    subset becomes a masked softmax — identical values, jit-safe.  Degenerate
    all-classes-absent inputs (where the reference crashes in ``torch.cat``
    of an empty list) return NaN instead.

    Returns ``(proto_loss, kl_loss)`` scalars — the clamped NLL and the mean
    true-class probability (the reference's misnamed second output).
    """
    eps = 1e-5
    f = feature_s.astype(jnp.float32)
    t = target.astype(jnp.float32)[..., :num_cls]
    keep = jnp.all(jnp.sum(t, axis=(1, 2, 3)) > 0, axis=0)  # (num_cls,)
    # per-sample per-class prototypes (B, num_cls, C)
    tsum = jnp.sum(t, axis=(1, 2, 3))  # (B, num_cls)
    proto = jnp.einsum("bhwzc,bhwzk->bkc", f, t) / (tsum[..., None] + eps)
    # negative L2 distance maps (B, H, W, Z, num_cls)
    d2 = (jnp.sum(f * f, axis=-1)[..., None]
          - 2.0 * jnp.einsum("bhwzc,bkc->bhwzk", f, proto)
          + jnp.sum(proto * proto, axis=-1)[:, None, None, None, :])
    dist_map = -jnp.sqrt(jnp.maximum(d2, 0.0))
    soft = jax.nn.softmax(dist_map, axis=-1, where=keep[None, None, None,
                                                       None, :])
    proto_distri = jnp.sum(soft * t * keep, axis=-1)  # (B, H, W, Z)
    proto_loss = jnp.mean(-jnp.log(jnp.clip(proto_distri, CLAMP_MIN, 1.0)))
    kl_loss = jnp.mean(proto_distri)
    return proto_loss, kl_loss


def js_div(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Jensen-Shannon divergence with torch-``KLDivLoss('mean')`` reduction
    (utils/lr_scheduler.py:71-73): the KL terms are means over ALL elements
    (not sums over a distribution axis), exactly as the reference's
    ``Js_div(log((p+q)/2), ·)`` computes them."""
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    logm = jnp.log((p + q) / 2.0)
    kl_pm = jnp.mean(p * (jnp.log(p) - logm))
    kl_qm = jnp.mean(q * (jnp.log(q) - logm))
    return (kl_pm + kl_qm) / 2.0


def mutual_learning_loss(mutual_feats, mask) -> jnp.ndarray:
    """Pairwise-modality JS mutual-learning loss
    (utils/lr_scheduler.py:74-88, dead code).

    ``mutual_feats``: sequence (the reference passes 4 scales) of arrays
    ``(B, M, C, ...)`` — per-modality feature stacks, softmaxed over ``C``;
    ``mask``: ``(B, M)`` bool modality presence.  For each sample the JS
    divergence is summed over present-modality pairs and all scales, then
    divided by ``2*K*(K-1)``; samples with ``K <= 1`` contribute 0.

    Two documented deviations from the (buggy, unused) reference: it indexes
    every dim-0 row with sample ``i``'s mask and then FORGETS the return
    statement — we apply each sample's own mask and return the ``(B,)``
    vector it computed.
    """
    mask = jnp.asarray(mask).astype(jnp.float32)  # (B, M)
    b, m = mask.shape
    total = jnp.zeros((b,), jnp.float32)
    for feats in mutual_feats:
        feats = jax.nn.softmax(feats.astype(jnp.float32), axis=2)
        for k in range(m):
            for k1 in range(k + 1, m):
                pair_ok = mask[:, k] * mask[:, k1]  # (B,)
                p, q = feats[:, k], feats[:, k1]
                logm = jnp.log((p + q) / 2.0)
                red = tuple(range(1, p.ndim))
                kl_pm = jnp.mean(p * (jnp.log(p) - logm), axis=red)
                kl_qm = jnp.mean(q * (jnp.log(q) - logm), axis=red)
                total = total + pair_ok * (kl_pm + kl_qm) / 2.0
    k_count = jnp.sum(mask, axis=1)
    denom = 2.0 * k_count * (k_count - 1.0)
    return jnp.where(k_count > 1, total / jnp.maximum(denom, 1.0), 0.0)
