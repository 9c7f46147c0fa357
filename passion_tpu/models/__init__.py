"""PASSION-TPU backbones: RFNet, mmFormer, M2FTrans.

Each backbone is a flax module exposing:
  * `__call__(x, mask)` — inference, returns softmax fused prediction;
  * `train_losses(x, mask, target, temp, use_passion)` — training forward
    with in-graph per-sample losses mirroring the reference's 6-output
    `Model.forward` (rfnet.py:217-403, mmformer.py:381-659,
    m2ftrans.py:514-771).

`get_model(name, ...)` resolves the reference's `--model` flag values.
"""

from __future__ import annotations


def init_params(model, key, patch_size: int = 80, batch_size: int = 1):
    """Initialize all parameter collections of a backbone.

    Runs the FULL training forward (`train_losses` with use_passion=True) so
    every submodule — fusion decoder, shared sep decoder, transformers —
    creates its parameters; a plain `__call__` init would skip the
    training-only modules.
    """
    import jax.numpy as jnp

    s = patch_size
    x = jnp.zeros((batch_size, s, s, s, 4), jnp.float32)
    mask = jnp.ones((batch_size, 4), bool)
    target = jnp.zeros((batch_size, s, s, s, model.num_cls), jnp.float32)
    return model.init(key, x, mask, target, 1.0, True,
                      method=type(model).train_losses)


def init_params_host(model, seed: int = 0, patch_size: int = 80,
                     batch_size: int = 1, scale: float = 0.02):
    """Uncalibrated host-side parameter tree for tests/dryruns.

    `model.init` jit-compiles ~a thousand tiny per-parameter initializer
    programs (~40-100 s cold per backbone on a 1-core CPU box, and too
    small for the persistent compile cache to amortize well). Shape/gating/
    engine tests don't need calibrated initializers — this traces the init
    with `jax.eval_shape` (no compilation, no execution) and fills the tree
    with small host-numpy normals, exactly the scheme
    `__graft_entry__._dryrun_one` uses. NOT for training runs: real
    variance-scaled init matters there (use `init_params`).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = jax.eval_shape(
        lambda k: init_params(model, k, patch_size=patch_size,
                              batch_size=batch_size),
        jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda s: (scale * rng.standard_normal(s.shape)).astype(s.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else np.zeros(s.shape, s.dtype), shapes)


def get_model(name: str, num_cls: int = 4, mask_type: str = "idt",
              patch_size: int = 80, **kwargs):
    """Resolve the reference's `--model` flag. `patch_size` sizes the
    transformer backbones' learned positional embeddings ((ps/16)^3 tokens,
    reference mmformer.py:21-22, m2ftrans.py:21-23)."""
    if name == "rfnet":
        from passion_tpu.models.rfnet import RFNet
        return RFNet(num_cls=num_cls, mask_type=mask_type, **kwargs)
    if name == "mmformer":
        from passion_tpu.models.mmformer import MMFormer
        return MMFormer(num_cls=num_cls, mask_type=mask_type,
                        patch_size=patch_size, **kwargs)
    if name == "m2ftrans":
        from passion_tpu.models.m2ftrans import M2FTrans
        return M2FTrans(num_cls=num_cls, mask_type=mask_type,
                        patch_size=patch_size, **kwargs)
    raise ValueError(f"unknown model: {name!r} (rfnet | mmformer | m2ftrans)")
