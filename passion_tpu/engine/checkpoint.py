"""Checkpointing: save/restore {epoch, params, opt_state} pytrees.

Mirrors the reference's retention policy (train.py:357-373): `model_last` every
epoch plus `model_{N}` snapshots every 100 epochs and for the final 5. Uses
flax msgpack serialization (framework-native, no torch). Supports the
`--use_pretrain` filtered merge (train.py:144-152): only keys present in the
target template are restored, the rest keep their fresh values.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization, traverse_util


def save_checkpoint(path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.tree_util.tree_map(np.asarray, state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)


def load_checkpoint(path: str, target: dict) -> dict:
    """Strict restore into a template pytree (eval.py:154-157 parity)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_params(path: str, target_params):
    """Params-only strict restore from a full checkpoint (eval path)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    state = raw.get("params", raw)
    return serialization.from_state_dict(target_params, state), raw.get("epoch")


def load_pretrained_params(path: str, target_params):
    """Filtered state-dict merge (train.py:144-152): restore the checkpoint's
    params into `target_params` wherever the flattened keys exist in BOTH;
    everything else keeps the fresh initialization."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    ckpt_params = raw.get("params", raw)
    flat_t = traverse_util.flatten_dict(target_params)
    flat_c = traverse_util.flatten_dict(ckpt_params)
    merged = dict(flat_t)
    for k, v in flat_c.items():
        if k in flat_t and np.shape(flat_t[k]) == np.shape(v):
            merged[k] = np.asarray(v)
    return traverse_util.unflatten_dict(merged)


def checkpoint_paths(savepath: str, epoch: int, num_epochs: int):
    """Which files to write after `epoch` (train.py:357-373)."""
    paths = [os.path.join(savepath, "model_last.msgpack")]
    if (epoch + 1) % 100 == 0 or epoch >= num_epochs - 5:
        paths.append(os.path.join(savepath, f"model_{epoch + 1}.msgpack"))
    return paths
