"""Data layer: transforms, synthetic dataset round-trip, loader, imb-MR CSV."""

import ast
import csv
import os
import time

import numpy as np
import pytest

from passion_tpu.data import transforms as T
from passion_tpu.data.datasets import BratsTest, BratsTrainIDT, BratsTrainPDT
from passion_tpu.data.loader import PrefetchLoader
from passion_tpu.data.preprocess import generate_imb_mr, normalize, crop_bounds
from passion_tpu.data.synth import make_synthetic_dataset
from passion_tpu.masks import MASK_ARRAY, sub_combination_ids


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(str(root), n_cases=5, shape=(64, 64, 48), seed=3)
    return str(root)


def test_train_transform_pipeline(rng):
    tf = T.from_string(
        "Compose([RandCrop3D((32,32,32)), RandomRotion(10), "
        "RandomIntensityChange((0.1,0.1)), RandomFlip(0), "
        "NumpyType((np.float32, np.int64)),])")
    x = rng.standard_normal((1, 48, 50, 40, 4)).astype(np.float32)
    y = rng.integers(0, 4, size=(1, 48, 50, 40))
    xo, yo = tf([x, y], rng)
    assert xo.shape == (1, 32, 32, 32, 4) and xo.dtype == np.float32
    assert yo.shape == (1, 32, 32, 32) and yo.dtype == np.int64


def test_geometric_transforms_consistent_between_img_and_label(rng):
    """Crop/rotate/flip must use the SAME randomness for image and label."""
    tf = T.Compose([T.RandCrop3D((16, 16, 16)), T.RandomRotion(10),
                    T.RandomFlip(0)])
    y = rng.integers(0, 4, size=(1, 32, 32, 32)).astype(np.float32)
    x = np.repeat(y[..., None], 4, axis=-1)  # image IS the label, per channel
    xo, yo = tf([x, y], rng)
    for c in range(4):
        np.testing.assert_array_equal(xo[..., c], yo)


def test_intensity_change_image_only(rng):
    tf = T.RandomIntensityChange((0.1, 0.1))
    x = np.ones((1, 8, 8, 8, 4), np.float32)
    y = np.ones((1, 8, 8, 8), np.float32)
    xo, yo = tf([x, y], rng)
    assert not np.allclose(xo, x)
    np.testing.assert_array_equal(yo, y)


def test_crop_bounds_and_normalize():
    vol = np.zeros((4, 160, 160, 160), np.float32)
    vol[:, 20:100, 30:110, 40:120] = (
        1.0 + np.arange(4)[:, None, None, None]
        + np.random.default_rng(0).random((4, 80, 80, 80), np.float32))
    bounds = crop_bounds(vol, min_size=128)
    for lo, hi in bounds:
        assert hi - lo >= 128
    normed = normalize(vol.copy())
    mask = vol.sum(0) > 0
    for k in range(4):
        np.testing.assert_allclose(normed[k][mask].mean(), 0.0, atol=1e-5)
        np.testing.assert_allclose(normed[k][mask].std(), 1.0, atol=1e-4)


def test_synth_dataset_roundtrip(synth_root, rng):
    ds = BratsTrainPDT(transforms="Compose([RandCrop3D((32,32,32)), "
                                  "NumpyType((np.float32, np.int64)),])",
                       root=synth_root, num_cls=4)
    item = ds.get(0, rng)
    assert item["x"].shape == (32, 32, 32, 4)
    assert item["target"].shape == (32, 32, 32, 4)
    assert item["mask"].shape == (4,) and item["mask"].any()
    np.testing.assert_allclose(item["target"].sum(-1), 1.0)

    test_ds = BratsTest(transforms="Compose([NumpyType((np.float32, "
                                   "np.int64)),])", root=synth_root)
    t = test_ds.get(0)
    assert t["x"].shape == (64, 64, 48, 4)
    assert t["target"].shape == (64, 64, 48)


def test_idt_dataset_and_modal_counts(synth_root):
    csv_path = os.path.join(synth_root, "imb_split.csv")
    ds = BratsTrainIDT(transforms="Compose([RandCrop3D((32,32,32)), "
                                  "NumpyType((np.float32, np.int64)),])",
                       root=synth_root, mask_type="idt", train_file=csv_path)
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        item = ds.get(i, rng)
        # idt: mask is FIXED per sample, equal to the CSV row's mask
        np.testing.assert_array_equal(item["mask"],
                                      MASK_ARRAY[ds.mask_ids[i]])
    counts = ds.modal_counts()
    assert counts.shape == (4,) and counts.sum() > 0

    drop = BratsTrainIDT(transforms="", root=synth_root,
                         mask_type="idt_drop", train_file=csv_path)
    item = drop.get(0, rng)
    # idt_drop mask must be a sub-combination of the assigned mask
    assigned = np.array(drop.sample_masks[0])
    assert not (item["mask"] & ~assigned).any()


def test_generate_imb_mr_structure(tmp_path):
    names = [f"C{i:03d}" for i in range(50)]
    csv_path = str(tmp_path / "split.csv")
    counts = generate_imb_mr(names, csv_path, p=(0.2, 0.4, 0.6, 0.8), seed=7)
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 50
    for r in rows:
        mask = ast.literal_eval(r["mask"])
        assert any(mask), "all-missing row"
        mid = int(r["mask_id"])
        np.testing.assert_array_equal(MASK_ARRAY[mid], mask)
        assert ast.literal_eval(r["pos_mask_ids"]) == sub_combination_ids(mask)
    # imbalance direction: p = (t1, t1c, flair, t2) missing -> t1 most present
    # counts are (flair, t1ce, t1, t2)
    assert counts[2] > counts[1] > counts[0] > counts[3]


REF_TRAIN_TXT = "/root/reference/datasets/BraTS/BRATS2020_Training_none_npy/train.txt"
REF_MR2468_CSV = "/root/reference/datasets/BraTS/brats_split/Brats2020_imb_split_mr2468.csv"


@pytest.mark.skipif(not os.path.exists(REF_MR2468_CSV),
                    reason="reference datasets not available")
def test_generate_imb_mr_matches_shipped_mr2468(tmp_path):
    """Gold test: our generator is byte-identical to the reference's shipped
    mr2468 CSV (same legacy MT19937 stream, seed 1037), and the per-modality
    present counts match the reference's comment table
    (generate_imb_mr.py:175-188: mr2468 -> T1 184, T1c 135, FLAIR 90, T2 43).
    """
    with open(REF_TRAIN_TXT) as f:
        names = [l.strip() for l in f if l.strip()]
    out = str(tmp_path / "mr2468.csv")
    counts = generate_imb_mr(names, out, p=(0.2, 0.4, 0.6, 0.8), seed=1037)
    # counts in canonical (flair, t1ce, t1, t2) order
    np.testing.assert_array_equal(counts, [90, 135, 184, 43])
    with open(out, "rb") as a, open(REF_MR2468_CSV, "rb") as b:
        assert a.read() == b.read()


def test_loader_batches_and_determinism(synth_root):
    ds = BratsTrainPDT(transforms="Compose([RandCrop3D((16,16,16)), "
                                  "NumpyType((np.float32, np.int64)),])",
                       root=synth_root, num_cls=4)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=11,
                            num_threads=2)
    batches = list(loader)
    assert len(batches) == len(loader)
    assert batches[0]["x"].shape == (2, 16, 16, 16, 4)
    assert batches[0]["mask"].shape == (2, 4)

    loader2 = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=11,
                             num_threads=4)
    batches2 = list(loader2)
    # same seed + epoch -> identical batches regardless of thread count
    np.testing.assert_array_equal(batches[0]["x"], batches2[0]["x"])
    np.testing.assert_array_equal(batches[0]["mask"], batches2[0]["mask"])
    # next epoch shuffles differently
    batches3 = list(loader2)
    assert not all(b1["name"] == b3["name"]
                   for b1, b3 in zip(batches2, batches3))


def test_loader_forwards_worker_exceptions():
    # a dataset.get error in a producer thread must RAISE in the consumer,
    # not leave it blocked on the queue forever (r4 loader hardening)
    class Exploding:
        def __len__(self):
            return 4

        def get(self, index, rng):
            if index == 2:
                raise RuntimeError("boom at 2")
            return {"x": np.zeros((2, 2), np.float32), "name": f"c{index}"}

    loader = PrefetchLoader(Exploding(), batch_size=1, shuffle=False,
                            num_threads=2, prefetch=1)
    with pytest.raises(RuntimeError, match="boom at 2"):
        for _ in loader:
            pass


def test_loader_abandoned_iterator_releases_producer():
    import threading

    class Slow:
        def __len__(self):
            return 64

        def get(self, index, rng):
            return {"x": np.zeros((4, 4), np.float32), "name": str(index)}

    loader = PrefetchLoader(Slow(), batch_size=1, shuffle=False,
                            num_threads=2, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # the producer must unblock from its bounded put and exit
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
