"""Batched sliding-window inference engine.

The reference evaluates each test case with a Python triple loop of ~75
single-window forward passes (utils/predict.py:182-215) — 112,500 forwards
per full 15-mask sweep. The TPU rebuild keeps the EXACT window protocol
(50%-overlap starts + tail window flush with the far edge, identical
coverage-weighted averaging) but executes it as device-wide batches:

  * window start coordinates are precomputed on the host (same lists as
    predict.py:182-195);
  * the volume is zero-padded up to a spatial bucket (multiple of
    `spatial_bucket`) so XLA compiles once per bucket, not once per case
    shape; window coords always address the true extent, so padding never
    changes any window's content;
  * windows are gathered with `lax.dynamic_slice` in chunks of
    `window_batch` and run through ONE jitted batched forward;
  * window softmax probs accumulate into the volume with STATIC-index
    in-place adds (the window grid is compile-time constant per shape
    bucket), replacing a serialized dynamic-update-slice chain — profiling
    showed the dynamic scatter at ~21% of per-mask fuse time;
  * the per-voxel coverage weight is separable over axes
    (cov(h,w,z) = cov_h(h)*cov_w(w)*cov_z(z)) and mask-independent, so it
    is computed analytically on the host ONCE per case instead of being
    scatter-accumulated per mask on device.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from passion_tpu.ops import fused_norm, s2d

# Pallas fused IN+LReLU on the inference traces — resolved PER MODEL:
#   * mmFormer (premasked fuse, r5): XLA's native norm now fuses its
#     statistics into the conv epilogue fusions while the Pallas custom
#     calls pin row-major layouts costing ~15 ms/pass of boundary copies
#     (scripts/fuse_op_table.py: fuse 253 -> 216 ms device, sweep
#     3.39 -> 3.94 mask-cases/s) -> models.MMFormer.PALLAS_INFER_NORM =
#     False.
#   * RFNet / M2FTrans: the XLA norm's fp32 normalize intermediates in the
#     region-fusion path EXCEED 16 GB at the auto wb=75 chunking (measured
#     RESOURCE_EXHAUSTED on the v5e; the Pallas kernel normalizes with
#     bf16 residuals and fits — the r4-validated envelope) -> keep the
#     Pallas kernel (default True).
# PASSION_FUSED_NORM=0/1/mixed force-overrides for experiments ("mixed" =
# Pallas only on lane-aligned channel counts, XLA norm elsewhere — see
# ops/fused_norm.enabled()).
_FUSED_NORM_ENV = os.environ.get("PASSION_FUSED_NORM")


def _resolve_fused_norm(model):
    if _FUSED_NORM_ENV is not None:
        if _FUSED_NORM_ENV == "mixed":
            return "mixed"
        return _FUSED_NORM_ENV == "1"
    return getattr(model, "PALLAS_INFER_NORM", True)

# Auto window_batch cap: the largest per-dispatch window batch. 75 (all
# windows of a canonical 240x240x155 BraTS case in ONE chunk) is measured
# on a 16 GB v5e chip: sweep 2.83 mask-cases/s vs 2.02 at wb=25 and 1.94
# at wb=16 (scripts/profile_sweep_wb.py) — zero pad waste and no scan
# carry. 80 gives headroom for slightly larger volumes while bounding
# activation memory near the measured point. Memory validated (r4) for ALL
# three backbones at patch=80 on the 16 GB v5e — one-chunk canonical-case
# sweeps fit and run: mmFormer 3.07, RFNet 1.94, M2FTrans 1.15
# mask-cases/s (the sweep engine stores all-window features besides).
# NOTE: activation memory per dispatch still scales with backbone size and
# patch³; on memory-tighter configs (bigger models, in-training validation
# sharing HBM with the optimizer state) `--window_batch` is the escape
# hatch if auto OOMs.
_AUTO_WINDOW_BATCH_CAP = 80


def _auto_window_batch(n: int, n_shards: int = 1,
                       cap: int = _AUTO_WINDOW_BATCH_CAP) -> tuple[int, int]:
    """(window_batch, n_chunks) minimizing pad waste for `n` windows.

    Picks the smallest chunk count that (a) keeps each chunk under `cap`
    windows and (b) is a multiple of `n_shards` (mesh mode shards chunks
    across devices), then sizes chunks evenly. Callers must pad the window
    list to n_chunks * window_batch — n_chunks is returned (rather than
    recomputed as ceil(n/wb)) precisely so the n_shards multiple survives:
    n=9, n_shards=8 gives (wb=2, nc=8), not the collapsed ceil(9/2)=5.
    Single device, n=75 -> (75, 1); 8-device mesh -> (10, 8) (5 padded
    windows, 6.7%)."""
    nc = max(1, -(-n // cap))
    nc = -(-nc // n_shards) * n_shards
    return -(-n // nc), nc


def window_starts(extent: int, patch: int) -> list[int]:
    """50%-overlap start indices + tail window (predict.py:182-195)."""
    stride = int(patch * 0.5)
    cnt = int(np.ceil((extent - patch) / stride))
    starts = [i * stride for i in range(cnt)]
    starts.append(extent - patch)
    return starts


def window_coords(shape, patch: int) -> np.ndarray:
    """(N, 3) int32 window origins for an (H, W, Z) extent."""
    hs = window_starts(shape[0], patch)
    ws = window_starts(shape[1], patch)
    zs = window_starts(shape[2], patch)
    coords = [(h, w, z) for h in hs for w in ws for z in zs]
    return np.asarray(coords, dtype=np.int32)


def _axis_runs(starts, patch: int):
    """Partition sorted start positions into maximal arithmetic runs with
    common difference exactly `patch` (so a run's windows tile a contiguous
    box without overlap). 50%-overlap starts split into even/odd runs plus
    a possibly-singleton tail run."""
    runs = []  # [start0, count]; open run expects next = start0 + count*patch
    for s in starts:
        for r in runs:
            if r[0] + r[1] * patch == s:
                r[1] += 1
                break
        else:
            runs.append([s, 1])
    return [tuple(r) for r in runs]


def coset_layout(shape3, patch: int):
    """Coset-major window ordering for non-overlapping block accumulation.

    Returns (coords (N,3) int32 in coset order, cosets): each coset is
    (h0, w0, z0, nh, nw, nz) — its nh*nw*nz windows are CONTIGUOUS in the
    returned order and tile the box starting at (h0, w0, z0) exactly. The
    accumulator then adds ~12 large disjoint blocks per volume instead of
    ~75 overlapping windows (each block add is one static in-place update).
    """
    runs = [_axis_runs(window_starts(e, patch), patch) for e in shape3]
    coords, cosets = [], []
    for h0, nh in runs[0]:
        for w0, nw in runs[1]:
            for z0, nz in runs[2]:
                cosets.append((h0, w0, z0, nh, nw, nz))
                for i in range(nh):
                    for j in range(nw):
                        for k in range(nz):
                            coords.append((h0 + i * patch, w0 + j * patch,
                                           z0 + k * patch))
    return np.asarray(coords, dtype=np.int32), tuple(cosets)


def _accumulate_cosets(probs, cosets, patch: int, vol_shape3):
    """Sum per-window class probs into the padded volume via per-coset
    tiled block adds. probs: (N_padded, p, p, p, C) in coset order."""
    p, c = patch, probs.shape[-1]
    acc = jnp.zeros(tuple(vol_shape3) + (c,), jnp.float32)
    off = 0
    for h0, w0, z0, nh, nw, nz in cosets:
        n = nh * nw * nz
        blk = probs[off:off + n].reshape(nh, nw, nz, p, p, p, c)
        blk = blk.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            nh * p, nw * p, nz * p, c).astype(jnp.float32)
        acc = acc.at[h0:h0 + nh * p, w0:w0 + nw * p, z0:z0 + nz * p].add(blk)
        off += n
    return acc


def coverage_weight(shape3, padded3, patch: int) -> np.ndarray:
    """Per-voxel window-coverage count (predict.py:198-203), computed
    analytically: coverage is a product of independent per-axis counts."""
    axes = []
    for extent, padded in zip(shape3, padded3):
        cov = np.zeros((padded,), np.float32)
        for s in window_starts(extent, patch):
            cov[s:s + patch] += 1.0
        axes.append(cov)
    w = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    return w[..., None]  # (Hp, Wp, Zp, 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack_labels2(lab: jnp.ndarray) -> jnp.ndarray:
    """Pack (H, W, Z) class labels (values < 4, Z % 4 == 0) four voxels per
    byte along Z. Label volumes cross the host boundary on every (case,
    mask) fetch — 2-bit packing cuts that D2H traffic 4x (the tunnel
    transfer was a measurable, jittery share of the sweep)."""
    v = lab.astype(jnp.uint8).reshape(lab.shape[0], lab.shape[1], -1, 4)
    return (v[..., 0] | (v[..., 1] << 2) | (v[..., 2] << 4) | (v[..., 3] << 6))


_UNPACK_SHIFTS = np.array([0, 2, 4, 6], np.uint8)


def _unpack_labels2(packed: np.ndarray) -> np.ndarray:
    """Host inverse of `_pack_labels2`: (H, W, Zp/4) uint8 -> (H, W, Zp)."""
    v = (packed[..., None] >> _UNPACK_SHIFTS) & np.uint8(3)
    return v.reshape(packed.shape[0], packed.shape[1], -1)


class SlidingWindowInference:
    """Batched sliding-window evaluator around a jittable window forward.

    Args:
      apply_fn: (params, windows (wb, p, p, p, 4), mask (wb, 4)) -> softmax
        probs (wb, p, p, p, C). Typically `model.apply`.
      num_cls: output classes.
      patch: window edge (reference patch_size=80, predict.py:21).
      window_batch: windows per device batch; None (default) sizes chunks
        per case via `_auto_window_batch` (one chunk for the canonical
        75-window BraTS case — the measured-fastest configuration).
      spatial_bucket: pad volumes up to multiples of this per axis to bound
        the number of XLA compilations across differently-cropped cases.
    """

    def __init__(self, apply_fn, num_cls: int = 4, patch: int = 80,
                 window_batch: int | None = None, spatial_bucket: int = 16,
                 compute_dtype=jnp.bfloat16):
        self.apply_fn = apply_fn
        self.num_cls = num_cls
        self.patch = patch
        # set BEFORE jitting: the traced contexts read it (per-model
        # resolution happens in SlidingWindowSweep, which knows the model)
        if not hasattr(self, "_fused_norm"):
            self._fused_norm = _resolve_fused_norm(None)
        self.window_batch = window_batch or None  # 0 (CLI) == None == auto
        self.spatial_bucket = spatial_bucket
        # bf16 is the serving dtype on TPU (MXU-native, halves HBM traffic);
        # accumulation of window probs stays fp32. Pass jnp.float32 for
        # bit-faithful parity runs.
        self.compute_dtype = compute_dtype
        self._jitted = jax.jit(self._run, static_argnames=("cosets",
                                                           "normalize"))

        def _labels_fn(params, xpad, coords, wgt, mask, *, cosets, pack):
            # weight is a positive scalar across classes: argmax needs no
            # normalize; pack on device so the fetch is 2 bits/voxel
            acc = self._run(params, xpad, coords, wgt, mask, cosets=cosets,
                            normalize=False)
            lab = jnp.argmax(acc, axis=-1).astype(jnp.uint8)
            return _pack_labels2(lab) if pack else lab

        self._jit_labels = jax.jit(_labels_fn,
                                   static_argnames=("cosets", "pack"))

    def _run(self, params, xpad, coords, wgt, mask, *, cosets,
             normalize: bool = True):
        """xpad: (Hp, Wp, Zp, 4); coords: (Nc, wb, 3) int32 (device, for the
        gather, coset-major order); wgt: (Hp, Wp, Zp, 1); mask: (4,) bool;
        cosets: static coset tuple from `coset_layout`."""
        p, c = self.patch, self.num_cls
        wb = coords.shape[1]
        mask_b = jnp.broadcast_to(mask[None], (wb, mask.shape[0]))
        params = jax.tree_util.tree_map(
            lambda v: v.astype(self.compute_dtype)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, params)
        xpad = xpad.astype(self.compute_dtype)

        def gather(cc):
            return jax.lax.dynamic_slice(
                xpad, (cc[0], cc[1], cc[2], 0), (p, p, p, xpad.shape[3]))

        def chunk_step(_, cs):
            wins = jax.vmap(gather)(cs)
            return None, self.apply_fn(params, wins, mask_b)

        with fused_norm.enabled(self._fused_norm), s2d.no_pad_barrier():
            # inference trace: norm impl per _INFER_FUSED_NORM (module
            # docstring above), training-only pad barrier off
            _, probs = jax.lax.scan(chunk_step, None, coords)
        probs = probs.reshape((-1, p, p, p, c))
        acc = _accumulate_cosets(probs, cosets, p, xpad.shape[:3])
        if not normalize:
            return acc
        return acc / jnp.maximum(wgt, 1e-8)

    def prepare(self, x):
        """Stage one volume for repeated inference (e.g. the 15-mask sweep):
        pads + transfers to device ONCE; returns an opaque prepared case.

        Volumes smaller than the patch on any axis are zero-padded up to the
        patch (one window covers the whole axis) — the reference never sees
        such inputs (preprocessing guarantees >=128 per axis,
        preprocess_brats.py:15-24) but a negative window start must not
        crash at trace time; the pad region is cropped away by
        `fetch_labels`, and z-scored background is 0 so padding matches the
        background statistics the models were trained on."""
        x = np.asarray(x)
        h, w, z, _ = x.shape
        eff = tuple(max(e, self.patch) for e in (h, w, z))
        coords, cosets = coset_layout(eff, self.patch)
        n = coords.shape[0]
        wb = self.window_batch
        if wb is None:
            mesh = getattr(self, "mesh", None)
            wb, nc = _auto_window_batch(n,
                                        mesh.size if mesh is not None else 1)
        else:
            nc = -(-n // wb)
        n_pad = nc * wb
        coords_pad = np.zeros((n_pad, 3), np.int32)
        coords_pad[:n] = coords

        hp = _round_up(max(h, self.patch), self.spatial_bucket)
        wp = _round_up(max(w, self.patch), self.spatial_bucket)
        zp = _round_up(max(z, self.patch), self.spatial_bucket)
        xpad = np.zeros((hp, wp, zp, x.shape[3]), np.float32)
        xpad[:h, :w, :z] = x

        return dict(
            xpad=jnp.asarray(xpad),
            coords=jnp.asarray(coords_pad.reshape(nc, wb, 3)),
            coords_flat=coords,
            cosets=cosets,
            n_windows=n,
            wgt=jnp.asarray(coverage_weight(eff, (hp, wp, zp), self.patch)),
            shape=(h, w, z),
        )

    def _rechunk(self, prepared, cap: int) -> None:
        """Re-partition the prepared case's window list into chunks of at
        most `cap` windows (coset order is chunking-independent, so only
        the (nc, wb) reshape changes)."""
        n = prepared["n_windows"]
        mesh = getattr(self, "mesh", None)
        wb, nc = _auto_window_batch(
            n, mesh.size if mesh is not None else 1, cap)
        coords_pad = np.zeros((nc * wb, 3), np.int32)
        coords_pad[:n] = prepared["coords_flat"]
        prepared["coords"] = jnp.asarray(coords_pad.reshape(nc, wb, 3))
        if mesh is not None:
            self._mesh_shard_prepared(prepared)

    def _with_oom_fallback(self, prepared, fn):
        """Run `fn`; on device OOM halve the window-chunk size and retry.

        The auto window batch (`_AUTO_WINDOW_BATCH_CAP`) is sized against
        the measured patch-80 / 16 GB envelope; a larger `--basic_dims` or
        patch must DEGRADE (smaller chunks, logged warning), not die
        (VERDICT r4 weak #6). An explicit `--window_batch` is an exact
        user instruction, so it never silently falls back."""
        while True:
            try:
                return fn()
            except Exception as e:  # jaxlib runtime error types are not
                # stable across versions; match the status name instead
                wb = int(prepared["coords"].shape[-2])
                if ("RESOURCE_EXHAUSTED" not in str(e) or wb <= 1
                        or self.window_batch is not None):
                    raise
                cap = max(1, wb // 2)
                logging.warning(
                    "sliding-window dispatch OOMed at window_batch=%d; "
                    "retrying with chunks of <= %d windows (pass "
                    "--window_batch to pin a size)", wb, cap)
                # the axon tunnel deallocates asynchronously: give the
                # failed attempt's buffers a moment to actually free
                # before the retry allocates, or the retry inherits a
                # full chip and cascades all the way down to wb=1
                if jax.default_backend() != "cpu":
                    import time
                    time.sleep(5.0)
                self._rechunk(prepared, cap)

    def run(self, params, prepared, mask):
        """Coverage-averaged softmax probs on DEVICE, padded extent."""
        return self._jitted(params, prepared["xpad"], prepared["coords"],
                            prepared["wgt"],
                            jnp.asarray(np.asarray(mask, bool)),
                            cosets=prepared["cosets"])

    def fetch_labels(self, prepared, labels_dev) -> np.ndarray:
        """Transfer device labels (possibly 2-bit packed) and crop to the
        true extent. Separated from dispatch so callers can queue every
        mask's fusion before paying any host sync (sweep pipelining)."""
        h, w, z = prepared["shape"]
        lab = np.asarray(labels_dev)
        if lab.shape[2] != prepared["xpad"].shape[2]:
            lab = _unpack_labels2(lab)
        return lab[:h, :w, :z]

    def infer_labels(self, params, prepared, mask) -> np.ndarray:
        """Argmax labels (H, W, Z) uint8 — the evaluation consumable.

        Keeps the argmax (+ label packing) on device so only ~2 bits/voxel
        cross the host boundary instead of 16 bytes (4 fp32 class probs)."""
        pack = prepared["xpad"].shape[2] % 4 == 0

        def go():
            labels = self._jit_labels(params, prepared["xpad"],
                                      prepared["coords"], prepared["wgt"],
                                      jnp.asarray(np.asarray(mask, bool)),
                                      cosets=prepared["cosets"], pack=pack)
            return self.fetch_labels(prepared, labels)

        return self._with_oom_fallback(prepared, go)

    def __call__(self, params, x, mask):
        """x: (H, W, Z, 4) volume; mask: (4,) bool. Returns (H, W, Z, C)
        coverage-averaged softmax probabilities (predict.py:198-215)."""
        prepared = self.prepare(x)
        h, w, z = prepared["shape"]
        return np.asarray(self.run(params, prepared, mask))[:h, :w, :z]


def make_engine(model, num_cls: int = 4, patch: int = 80,
                window_batch: int | None = None, mesh=None, **kw):
    """Best sliding-window engine for `model`: the feature-reusing sweep
    engine when the backbone exposes the features/fuse_inference split,
    else the plain batched engine. `mesh` (a jax.sharding.Mesh with a
    'data' axis) shards the window chunks — sweep engine only."""
    if hasattr(type(model), "features") and hasattr(type(model),
                                                    "fuse_inference"):
        return SlidingWindowSweep(model, num_cls, patch, window_batch,
                                  mesh=mesh, **kw)
    if mesh is not None:
        logging.warning("mesh sharding requires the sweep engine; %s lacks "
                        "the features/fuse_inference split — running "
                        "single-device", type(model).__name__)
    return SlidingWindowInference(model.apply, num_cls, patch, window_batch,
                                  **kw)


class SlidingWindowSweep(SlidingWindowInference):
    """Multi-mask sliding-window evaluator with mask-independent features
    computed ONCE per window.

    The backbones' per-modality encoders (and mmFormer's IntraFormer) do not
    depend on the modality mask — all masking happens inside the fusion path
    (PRM generators / RFM / FusePath re-mask their inputs). The reference's
    15-combination sweep therefore re-computes identical encoder work 15x
    (train.py:589-604, 112,500 forwards). Here each window is ENCODED once
    (`model.features`) and only the fusion decoder runs per mask
    (`model.fuse_inference`) — exact, verified against `model.__call__`
    per mask in tests.

    Requires a backbone exposing `features(x)` and `fuse_inference(fts,
    mask)` (RFNet, MMFormer, M2FTrans). Use SlidingWindowInference for
    backbones without the split.
    """

    def __init__(self, model, num_cls: int = 4, patch: int = 80,
                 window_batch: int | None = None, spatial_bucket: int = 16,
                 compute_dtype=jnp.bfloat16, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — window
        chunks are sharded across devices (each device encodes/fuses its
        share; partial volume accumulators are psum-reduced over ICI), so a
        slice divides the 112,500-forward evaluation sweep (SURVEY §5
        window batching; replaces the reference loop predict.py:209-215)."""
        self.model = model
        self.mesh = mesh
        self._fused_norm = _resolve_fused_norm(model)
        super().__init__(model.apply, num_cls, patch, window_batch,
                         spatial_bucket, compute_dtype)
        if mesh is None:
            self._jit_encode = jax.jit(self._encode_chunks)
            self._jit_fuse = jax.jit(
                self._fuse_run, static_argnames=("cosets", "normalize"))

            def _fuse_labels_fn(params, fts, wgt, mask, *, cosets, pack):
                acc = self._fuse_run(params, fts, wgt, mask, cosets=cosets,
                                     normalize=False)
                lab = jnp.argmax(acc, axis=-1).astype(jnp.uint8)
                return _pack_labels2(lab) if pack else lab

            self._jit_fuse_labels = jax.jit(
                _fuse_labels_fn, static_argnames=("cosets", "pack"))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            d = mesh.size
            shard_chunks = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())

            def enc(params, xpad, coords):
                # coords (D, NcD, wb, 3) sharded over devices on axis 0
                def local(params, xpad, coords):
                    fts = self._encode_chunks(params, xpad, coords[0])
                    return jax.tree_util.tree_map(lambda v: v[None], fts)

                return jax.shard_map(
                    local, mesh=mesh, in_specs=(P(), P(), P("data")),
                    out_specs=P("data"))(params, xpad, coords)

            def fuse(params, fts, coords, valid, mask, vol_shape3):
                def local(params, fts, coords, valid, mask):
                    fts = jax.tree_util.tree_map(lambda v: v[0], fts)
                    probs_sum = self._fuse_run_dynamic(
                        params, fts, coords[0], valid[0], mask, vol_shape3,
                        normalize=False)
                    acc, wgt = probs_sum
                    acc = jax.lax.psum(acc, "data")
                    wgt = jax.lax.psum(wgt, "data")
                    return acc / jnp.maximum(wgt, 1e-8)

                return jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P("data"), P("data"), P("data"), P()),
                    out_specs=P())(params, fts, coords, valid, mask)

            def fuse_labels(params, fts, coords, valid, mask, vol_shape3,
                            pack):
                probs = fuse(params, fts, coords, valid, mask, vol_shape3)
                lab = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
                return _pack_labels2(lab) if pack else lab

            self._jit_encode = jax.jit(enc)
            self._jit_fuse = jax.jit(fuse, static_argnames=("vol_shape3",))
            self._jit_fuse_labels = jax.jit(
                fuse_labels, static_argnames=("vol_shape3", "pack"))
            self._mesh_size = d
            self._shard_chunks = shard_chunks
            self._rep = rep

    def _cast(self, tree):
        return jax.tree_util.tree_map(
            lambda v: v.astype(self.compute_dtype)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, tree)

    def _encode_chunks(self, params, xpad, coords):
        """Window features for every chunk: pytree with leading (Nc, wb)."""
        p = self.patch
        params = self._cast(params)
        xpad = xpad.astype(self.compute_dtype)

        def gather(cc):
            return jax.lax.dynamic_slice(
                xpad, (cc[0], cc[1], cc[2], 0), (p, p, p, xpad.shape[3]))

        def step(_, cs):
            wins = jax.vmap(gather)(cs)
            fts = self.model.apply(params, wins,
                                   method=type(self.model).features)
            return None, fts

        with fused_norm.enabled(self._fused_norm), s2d.no_pad_barrier():
            # inference trace: norm impl per _INFER_FUSED_NORM (module
            # docstring above), training-only pad barrier off
            _, fts = jax.lax.scan(step, None, coords)
        return fts

    def _fuse_run(self, params, fts, wgt, mask, *, cosets,
                  normalize: bool = True):
        """Coverage-averaged softmax probs for ONE mask from stored
        features (single-device fast path: static coset block adds).
        normalize=False returns the raw coverage-sum — the per-voxel weight
        is a positive scalar across classes, so argmax is unchanged and the
        label path skips a full-volume divide."""
        p, c = self.patch, self.num_cls
        params = self._cast(params)
        leaf0 = jax.tree_util.tree_leaves(fts)[0]
        wb = leaf0.shape[1]
        mask_b = jnp.broadcast_to(mask[None], (wb, mask.shape[0]))

        def chunk_step(_, ft):
            probs = self.model.apply(params, ft, mask_b,
                                     method=type(self.model).fuse_inference)
            return None, probs

        with fused_norm.enabled(self._fused_norm), s2d.no_pad_barrier():
            # inference trace: norm impl per _INFER_FUSED_NORM (module
            # docstring above), training-only pad barrier off
            _, probs = jax.lax.scan(chunk_step, None, fts)
        probs = probs.reshape((-1, p, p, p, c))
        acc = _accumulate_cosets(probs, cosets, p, wgt.shape[:3])
        if not normalize:
            return acc
        return acc / jnp.maximum(wgt, 1e-8)

    def _fuse_run_dynamic(self, params, fts, coords, valid, mask, vol_shape3,
                          normalize: bool = True):
        """Dynamic-coords variant for the mesh path (per-device window lists
        are data, not compile-time constants). vol_shape3: static (Hp, Wp,
        Zp). With normalize=False returns the raw (acc, wgt) partial sums
        (psum-reduced across devices before dividing)."""
        p, c = self.patch, self.num_cls
        wb = coords.shape[1]
        params = self._cast(params)
        acc = jnp.zeros(tuple(vol_shape3) + (c,), jnp.float32)
        wgt = jnp.zeros(tuple(vol_shape3) + (1,), jnp.float32)
        if not normalize:
            # running per-device inside shard_map: the scan carry becomes
            # device-varying after the first chunk, so mark it varying
            # up front (jax shard_map VMA rules)
            acc = jax.lax.pcast(acc, ("data",), to="varying")
            wgt = jax.lax.pcast(wgt, ("data",), to="varying")
        mask_b = jnp.broadcast_to(mask[None], (wb, mask.shape[0]))
        ones = jnp.ones((p, p, p, 1), jnp.float32)

        def chunk_step(carry, inp):
            acc, wgt = carry
            cs, vs, ft = inp
            with fused_norm.enabled(self._fused_norm), \
                    s2d.no_pad_barrier():  # inference trace (mesh path):
                # same norm config as _fuse_run
                probs = self.model.apply(
                    params, ft, mask_b,
                    method=type(self.model).fuse_inference).astype(jnp.float32)
            probs = probs * vs[:, None, None, None, None]

            def add_one(i, aw):
                a, wg = aw
                at = (cs[i, 0], cs[i, 1], cs[i, 2], 0)
                cur = jax.lax.dynamic_slice(a, at, (p, p, p, c))
                a = jax.lax.dynamic_update_slice(a, cur + probs[i], at)
                curw = jax.lax.dynamic_slice(wg, at, (p, p, p, 1))
                wg = jax.lax.dynamic_update_slice(wg, curw + vs[i] * ones, at)
                return a, wg

            acc, wgt = jax.lax.fori_loop(0, wb, add_one, (acc, wgt))
            return (acc, wgt), None

        (acc, wgt), _ = jax.lax.scan(chunk_step, (acc, wgt),
                                     (coords, valid, fts))
        if not normalize:
            return acc, wgt
        return acc / jnp.maximum(wgt, 1e-8)

    def prepare(self, x):
        prepared = super().prepare(x)
        if self.mesh is None:
            return prepared
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._mesh_shard_prepared(prepared)
        prepared["xpad"] = jax.device_put(
            np.asarray(prepared["xpad"]), NamedSharding(self.mesh, P()))
        return prepared

    def _mesh_shard_prepared(self, prepared) -> None:
        """Shard the (nc, wb, 3) chunk list over the mesh and rebuild the
        chunk-validity mask (the dynamic accumulator needs it; the static
        path does not). Also used after an OOM `_rechunk`."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        d = self.mesh.size
        coords = np.asarray(prepared["coords"])
        if coords.ndim == 4:  # already sharded (rechunk path re-flattens)
            coords = coords.reshape(-1, *coords.shape[2:])
        nc, wb = coords.shape[:2]
        n = prepared["n_windows"]
        valid = np.zeros((nc * wb,), np.float32)
        valid[:n] = 1.0
        valid = valid.reshape(nc, wb)
        ncp = _round_up(nc, d)
        if ncp != nc:
            pad_c = np.zeros((ncp - nc, wb, 3), coords.dtype)
            pad_v = np.zeros((ncp - nc, wb), valid.dtype)
            coords = np.concatenate([coords, pad_c], axis=0)
            valid = np.concatenate([valid, pad_v], axis=0)
        sh = NamedSharding(self.mesh, P("data"))
        prepared["coords"] = jax.device_put(
            coords.reshape(d, ncp // d, wb, 3), sh)
        prepared["valid"] = jax.device_put(
            valid.reshape(d, ncp // d, wb), sh)

    def encode_case(self, params, prepared):
        """Run the mask-independent encode for all windows of a prepared
        case. Returns an opaque device pytree reused by every mask."""
        return self._jit_encode(params, prepared["xpad"], prepared["coords"])

    def _fuse_labels_device(self, params, prepared, fts, mask):
        """Device argmax labels (2-bit packed) for one mask (no host sync)."""
        m = jnp.asarray(np.asarray(mask, bool))
        pack = prepared["xpad"].shape[2] % 4 == 0
        if self.mesh is None:
            return self._jit_fuse_labels(params, fts, prepared["wgt"], m,
                                         cosets=prepared["cosets"], pack=pack)
        vol_shape3 = tuple(int(d) for d in prepared["xpad"].shape[:3])
        return self._jit_fuse_labels(params, fts, prepared["coords"],
                                     prepared["valid"], m,
                                     vol_shape3=vol_shape3, pack=pack)

    def infer_labels_masked(self, params, prepared, fts, mask) -> np.ndarray:
        """Argmax labels (H, W, Z) uint8 for one mask from stored features."""
        labels = self._fuse_labels_device(params, prepared, fts, mask)
        return self.fetch_labels(prepared, labels)

    def sweep_labels(self, params, prepared, masks) -> list[np.ndarray]:
        """Labels for every mask in `masks`, encoding each window once.

        All fusion passes are DISPATCHED before any result is fetched, so
        the device pipeline never stalls on the host reading labels. On a
        device OOM (auto window batching outside its measured memory
        envelope) the whole sweep retries at half the chunk size
        (`_with_oom_fallback`)."""

        def go():
            fts = self.encode_case(params, prepared)
            pending = [self._fuse_labels_device(params, prepared, fts, m)
                       for m in masks]
            return [self.fetch_labels(prepared, lab) for lab in pending]

        return self._with_oom_fallback(prepared, go)
