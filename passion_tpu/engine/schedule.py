"""Learning-rate schedules and the AdamW(amsgrad) optimizer.

The four epoch-indexed schedule modes of the reference `LR_Scheduler`
(utils/lr_scheduler.py:8-43) as pure functions epoch -> lr, including its
`round(x, 8)`. Training uses 'poly' (power 0.9) with AdamW(betas=(0.9,0.999),
eps=1e-8, amsgrad=True, weight_decay) — train.py:94-96.
"""

from __future__ import annotations

import math

import numpy as np
import optax


def lr_at_epoch(epoch: int, base_lr: float, num_epochs: int,
                mode: str = "poly", warmup: int = 100) -> float:
    e = float(epoch)
    n = float(num_epochs)
    if mode == "poly":
        lr = base_lr * np.power(1 - e / n, 0.9)
    elif mode == "warmup":
        if epoch < warmup * 2:
            lr = 0.5 * base_lr * (1.0 + math.cos((e / warmup) * math.pi))
        else:
            lr = base_lr * np.power(1 - (e - warmup * 2) / (n - warmup * 2), 0.9)
    elif mode == "cousinewarmup":
        if warmup == 0:
            if epoch < 100:
                lr = base_lr * math.sin((e / 200.0) * math.pi)
            else:
                lr = 0.5 * base_lr * (1.0 + math.cos(((e - 100.0) / (n - 100.0)) * math.pi))
        else:
            if epoch < warmup * 2:
                lr = 0.5 * base_lr * (1.0 + math.cos((e / warmup) * math.pi))
            else:
                lr = 0.5 * base_lr * (1.0 + math.cos(((e - warmup * 2) / (n - warmup * 2)) * math.pi))
    elif mode == "warmuppoly":
        if epoch < 100:
            lr = base_lr * (e / 100.0)
        else:
            lr = base_lr * np.power(1 - (e - 100.0) / (n - 100.0), 0.9)
    else:
        raise ValueError(f"unknown LR mode {mode!r}")
    return round(float(lr), 8)


def get_temperature(epoch: int) -> int:
    """Linear 30->1 temperature decay over the first 30 epochs
    (utils/lr_scheduler.py:45-49 — dead code in the reference, whose drivers
    pass the constant ``--temp`` instead; kept for surface parity).

    Justified skip note (inventory completeness): the neighboring
    ``get_params`` (utils/lr_scheduler.py:51-62) is NOT ported — it reads
    ``model.module.decoder_all.abstraction1..4`` attributes that exist on
    none of the reference's three models (a leftover from a different
    codebase); there is no behavior to reproduce.  The rest of that dead
    block IS ported: ``record_loss`` (logging_utils.py), ``Js_div`` and
    ``mutual_learning_loss`` (losses_legacy.py)."""
    return 31 - (epoch + 1) if epoch <= 29 else 1


def make_optimizer(weight_decay: float = 1e-4, b1: float = 0.9,
                   b2: float = 0.999, eps: float = 1e-8):
    """AdamW with amsgrad (train.py:96), learning rate injected per epoch.

    torch AdamW semantics: p <- p - lr * (adam_update + wd * p); realized as
    scale_by_amsgrad -> add_decayed_weights -> scale_by_learning_rate. The
    returned optimizer is wrapped in `optax.inject_hyperparams`, so the host
    loop sets `opt_state.hyperparams['learning_rate']` each epoch
    (lr_scheduler poly mode, train.py:183).
    """

    def _amsgrad_w(learning_rate):
        return optax.chain(
            optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(_amsgrad_w)(learning_rate=0.0)


def set_learning_rate(opt_state, lr: float):
    """Set the injected learning rate on an inject_hyperparams state."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
