"""Mask-independent feature reuse: the 15-mask sweep must be EXACTLY the
single-mask inference path per mask (sliding_window.SlidingWindowSweep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passion_tpu.engine.sliding_window import (
    SlidingWindowInference,
    SlidingWindowSweep,
)
from passion_tpu.masks import MASK_ARRAY
from passion_tpu.models import get_model

PATCH = 16

SOME_MASKS = [
    [True, True, True, True],
    [False, True, False, False],
    [True, False, True, False],
    [False, True, True, True],
]


def _make(name, rng):
    kw = {"basic_dims": 4}
    if name == "mmformer":
        kw = {"basic_dims": 4, "trans_dim": 32, "mlp_dim": 64, "heads": 4}
    elif name == "m2ftrans":
        kw = {"basic_dims": 4, "mlp_dim": 64, "heads": 4}
    model = get_model(name, mask_type="idt", patch_size=PATCH, **kw)
    x = jnp.asarray(rng.standard_normal((2, PATCH, PATCH, PATCH, 4)),
                    jnp.float32)
    from passion_tpu.models import init_params_host
    params = init_params_host(model, seed=0, patch_size=PATCH, batch_size=2)
    return model, params, x


@pytest.mark.parametrize("name", [
    "rfnet",
    pytest.param("mmformer", marks=pytest.mark.slow),
    pytest.param("m2ftrans", marks=pytest.mark.slow),
])
def test_features_fuse_matches_call(name, rng):
    model, params, x = _make(name, rng)
    fts = model.apply(params, x, method=type(model).features)
    for mask in SOME_MASKS:
        m = jnp.asarray([mask, mask])
        ref = np.asarray(model.apply(params, x, m))
        got = np.asarray(model.apply(params, fts, m,
                                     method=type(model).fuse_inference))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"{name} mask={mask}")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["rfnet", "mmformer", "m2ftrans"])
def test_mesh_sweep_matches_single_device(name, rng):
    """Window chunks sharded over an 8-device CPU mesh produce the same
    coverage-averaged probabilities as the single-device sweep (BASELINE
    config 5 / SURVEY §5 window batching) — for all three backbones
    (VERDICT r1 item 4: the transformer fuse paths under shard_map)."""
    from passion_tpu.parallel.mesh import make_mesh

    model, params, _ = _make(name, rng)
    vol = rng.standard_normal((24, 24, 20, 4)).astype(np.float32)
    masks = [np.asarray(MASK_ARRAY[14]), np.asarray(MASK_ARRAY[3])]

    plain = SlidingWindowSweep(model, num_cls=4, patch=PATCH,
                               window_batch=4, compute_dtype=jnp.float32)
    meshed = SlidingWindowSweep(model, num_cls=4, patch=PATCH,
                                window_batch=4, compute_dtype=jnp.float32,
                                mesh=make_mesh(8))
    prep_p = plain.prepare(vol)
    prep_m = meshed.prepare(vol)
    fts_p = plain.encode_case(params, prep_p)
    fts_m = meshed.encode_case(params, prep_m)
    for m in masks:
        lab_p = plain.infer_labels_masked(params, prep_p, fts_p, m)
        lab_m = meshed.infer_labels_masked(params, prep_m, fts_m, m)
        np.testing.assert_array_equal(lab_m, lab_p)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["rfnet"])
def test_sweep_engine_matches_single_mask_engine(name, rng):
    model, params, _ = _make(name, rng)
    vol = rng.standard_normal((24, 24, 20, 4)).astype(np.float32)

    single = SlidingWindowInference(model.apply, num_cls=4, patch=PATCH,
                                    window_batch=4,
                                    compute_dtype=jnp.float32)
    sweep = SlidingWindowSweep(model, num_cls=4, patch=PATCH,
                               window_batch=4, compute_dtype=jnp.float32)
    prepared = sweep.prepare(vol)
    masks = [np.asarray(m) for m in (MASK_ARRAY[14], MASK_ARRAY[0],
                                     MASK_ARRAY[9])]
    labels = sweep.sweep_labels(params, prepared, masks)
    for m, lab in zip(masks, labels):
        ref = single.infer_labels(params, single.prepare(vol), m)
        np.testing.assert_array_equal(lab, ref)
