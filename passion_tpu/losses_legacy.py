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
