"""Data layer: pair matching, layouts, augmentation, cached dataset."""

import numpy as np
import pytest
from pathlib import Path

from freqfusion_tpu.data import augment
from freqfusion_tpu.data.cached import CachedFeatureDataset, batch_iterator
from freqfusion_tpu.data.dataset import (
    SRDataset, ValidationDataset, clean_lr_stem, find_split_dirs, match_pairs)
from freqfusion_tpu.utils.imageio import save_image


def _write_pairs(root: Path, n=3, lr_size=16, scale=4, lr_suffix="x4",
                 lr_dir="train_LR", hr_dir="train_HR"):
    rng = np.random.default_rng(0)
    (root / lr_dir).mkdir(parents=True, exist_ok=True)
    (root / hr_dir).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        hr = rng.uniform(size=(lr_size * scale, lr_size * scale, 3))
        lr = hr[::scale, ::scale]
        save_image(lr, str(root / lr_dir / f"img_{i:04d}{lr_suffix}.png"))
        save_image(hr, str(root / hr_dir / f"img_{i:04d}.png"))
    return root / lr_dir, root / hr_dir


def test_stem_cleaning():
    assert clean_lr_stem("0001x4") == "0001"
    assert clean_lr_stem("0001_LR") == "0001"
    assert clean_lr_stem("img_001_bicubic") == "img_001"
    assert clean_lr_stem("0001") == "0001"


def test_pair_matching_and_dataset(tmp_path):
    lr_dir, hr_dir = _write_pairs(tmp_path)
    pairs = match_pairs(
        sorted(lr_dir.iterdir()), sorted(hr_dir.iterdir()))
    assert len(pairs) == 3
    ds = SRDataset(lr_dir, hr_dir, lr_patch=8, scale=4, repeat=2)
    assert len(ds) == 6
    item = ds[0]
    assert item["lr"].shape == (8, 8, 3)
    assert item["hr"].shape == (32, 32, 3)


def test_layout_autodetect(tmp_path):
    _write_pairs(tmp_path)
    lr_dir, hr_dir = find_split_dirs(tmp_path, "train")
    assert lr_dir.name == "train_LR"
    with pytest.raises(FileNotFoundError):
        find_split_dirs(tmp_path, "val")


def test_validation_dataset_resizes(tmp_path):
    lr_dir, hr_dir = _write_pairs(tmp_path, n=1, lr_size=40)
    ds = ValidationDataset(lr_dir, hr_dir, max_lr_size=16)
    item = ds[0]
    assert max(item["lr"].shape[:2]) == 16
    assert item["hr"].shape[0] == item["lr"].shape[0] * 4


def test_create_dataloaders_factory(tmp_path):
    from freqfusion_tpu.data.dataset import create_dataloaders
    _write_pairs(tmp_path, n=4, lr_size=16)
    _write_pairs(tmp_path, n=2, lr_size=16, lr_dir="val_LR", hr_dir="val_HR")
    train_ds, val_ds, train_iter = create_dataloaders(
        tmp_path, lr_patch=8, batch_size=2)
    assert len(train_ds) == 4 and len(val_ds) == 2
    batches = list(train_iter(0))
    assert len(batches) == 2
    assert batches[0]["lr"].shape == (2, 8, 8, 3)
    assert batches[0]["hr"].shape == (2, 32, 32, 3)


def test_paired_crop_alignment():
    rng = np.random.default_rng(0)
    hr = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    lr = hr[::4, ::4]
    lr_c, hr_c = augment.paired_random_crop(lr, hr, 4, 4, rng)
    # the HR crop must contain exactly the upsampled LR grid positions
    np.testing.assert_allclose(hr_c[::4, ::4], lr_c)


def test_geometric_group_consistency():
    rng = np.random.default_rng(3)
    lr = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    hr = np.repeat(np.repeat(lr, 4, 0), 4, 1)
    lr2, hr2 = augment.geometric_augment_group([lr, hr], rng)
    np.testing.assert_allclose(hr2[::4, ::4], lr2)


def test_cached_dataset_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(4):
        np.savez_compressed(
            tmp_path / f"s{i}.npz",
            lr=rng.uniform(size=(8, 8, 3)).astype(np.float32),
            hr=rng.uniform(size=(32, 32, 3)).astype(np.float32),
            **{f"out_{n}": rng.uniform(size=(32, 32, 3)).astype(np.float32)
               for n in ("hat", "dat", "nafnet")},
            feat_hat=rng.normal(size=(8, 8, 180)).astype(np.float32),
            feat_dat=rng.normal(size=(8, 8, 180)).astype(np.float32),
            feat_nafnet=rng.normal(size=(8, 8, 64)).astype(np.float32))
    ds = CachedFeatureDataset(tmp_path, augment=True)
    assert len(ds) == 4
    batches = list(batch_iterator(ds, batch_size=2, seed=1))
    assert len(batches) == 2
    b = batches[0]
    assert b["lr"].shape == (2, 8, 8, 3)
    assert b["expert_outputs"]["hat"].shape == (2, 32, 32, 3)
    assert b["expert_features"]["nafnet"].shape == (2, 8, 8, 64)


def test_prefetch_preserves_order_and_count():
    from freqfusion_tpu.data.cached import prefetch
    items = list(prefetch(iter(range(17)), depth=3))
    assert items == list(range(17))


def test_cached_dataset_reads_reference_pt_format(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    # write the reference's two-file .pt contract with drct/grl remap keys
    torch.save({
        "lr": torch.rand(3, 8, 8), "hr": torch.rand(3, 32, 32),
        "outputs": {"drct": torch.rand(1, 3, 32, 32)},
        "features": {"drct": torch.rand(1, 180, 8, 8)},
        "filename": "a.png",
    }, tmp_path / "a_hat_part.pt")
    torch.save({
        "outputs": {"grl": torch.rand(1, 3, 32, 32),
                    "nafnet": torch.rand(1, 3, 32, 32)},
        "features": {"grl": torch.rand(1, 180, 8, 8),
                     "nafnet": torch.rand(1, 64, 8, 8)},
    }, tmp_path / "a_rest_part.pt")
    ds = CachedFeatureDataset(tmp_path, augment=False)
    item = ds[0]
    assert item["lr"].shape == (8, 8, 3)
    assert item["out_hat"].shape == (32, 32, 3)      # drct → hat
    assert item["feat_dat"].shape == (8, 8, 180)     # grl → dat
    assert item["feat_nafnet"].shape == (8, 8, 64)
