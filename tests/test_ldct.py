"""LDCT dataset tests: volume expansion, windowing, HU mapping, cache naming,
conditioning, output writers (mirrors reference ldct.py:323-349 self-tests and
extends them)."""

import numpy as np
import pytest

from fmdm_tpu.data.ldct import LDCTAttentionDataset, LDCTDataset, build_ldct_from_config


def _make_ldct_root(tmp_path, depth=3, size=4):
    data_dir = tmp_path / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    volume = np.arange(depth * size * size, dtype=np.float32).reshape(depth, size, size)
    np.save(data_dir / "sdct.npy", volume)
    np.save(data_dir / "ldct.npy", volume * 0.5)
    (tmp_path / "train.txt").write_text("Case\tSDCT\tLDCT\nC1\tdata/sdct.npy\tdata/ldct.npy\n")
    (tmp_path / "test.txt").write_text("Case\tSDCT\tLDCT\nC1\tdata/sdct.npy\tdata/ldct.npy\n")
    return tmp_path


def test_volume_expansion_and_channel_dim(tmp_path):
    root = _make_ldct_root(tmp_path)
    ds = LDCTDataset(file_path=str(root), window_size=1, img_size=None, load_ldct=True,
                     use_tensor_cache=False)
    assert len(ds) == 3
    sample = ds[0]
    assert sample["target"].shape[0] == 1  # channel dim added
    assert sample["image"] is not None


def test_windowed_volume(tmp_path):
    root = _make_ldct_root(tmp_path, depth=5)
    ds = LDCTDataset(file_path=str(root), window_size=2, use_tensor_cache=False)
    # depth 5, window 2 -> 4 windows
    assert len(ds) == 4
    sample = ds[0]
    assert sample["target"].shape[0] == 2  # window of 2 slices


def test_hu_mapping_invertible(tmp_path):
    root = _make_ldct_root(tmp_path)
    ds = LDCTDataset(file_path=str(root), use_tensor_cache=False)
    hu = np.array([[-1024.0, 0.0], [1024.0, 3072.0]], dtype=np.float32)
    img = ds.to_image(hu)
    np.testing.assert_allclose(img, (hu + 1024) / 4096, rtol=1e-6)
    back = ds.from_image(img)
    np.testing.assert_allclose(back, hu, atol=1e-3)


def test_preprocess_uses_metadata_slope(tmp_path):
    root = _make_ldct_root(tmp_path)
    ds = LDCTDataset(file_path=str(root), use_tensor_cache=False)
    payload = {"Image": np.full((4, 4), 100.0, np.float32),
               "Metadata": {"RescaleSlope": 2.0, "RescaleIntercept": -1000.0}}
    out = ds.preprocess(payload)
    # HU = 100*2 - 1000 = -800 -> (−800+1024)/4096
    np.testing.assert_allclose(out[0, 0, 0], (2 * 100 - 1000 + 1024) / 4096, rtol=1e-5)


def test_mismatched_slice_counts_skipped(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    np.save(data_dir / "sdct.npy", np.zeros((3, 4, 4), np.float32))
    np.save(data_dir / "ldct.npy", np.zeros((2, 4, 4), np.float32))
    np.save(data_dir / "sdct2.npy", np.zeros((2, 4, 4), np.float32))
    np.save(data_dir / "ldct2.npy", np.zeros((2, 4, 4), np.float32))
    (tmp_path / "train.txt").write_text(
        "Case\tSDCT\tLDCT\nC1\tdata/sdct.npy\tdata/ldct.npy\nC2\tdata/sdct2.npy\tdata/ldct2.npy\n"
    )
    ds = LDCTDataset(file_path=str(tmp_path), window_size=1, use_tensor_cache=False)
    # C1 skipped (3 vs 2 slices), C2 expands to 2
    assert len(ds) == 2


def test_tensor_cache_roundtrip(tmp_path):
    root = _make_ldct_root(tmp_path)
    ds = LDCTDataset(file_path=str(root), window_size=1, use_tensor_cache=True,
                     save_tensor_cache=True, cache_subdir="cache")
    first = np.array(ds[0]["target"])
    ds.flush_tensor_cache_writes()  # cache writes are async (off the fetch path)
    cache_file = root / "cache" / "data" / "sdct_split_0.pt"
    assert cache_file.exists()
    # overwrite the source; cache should still serve the original values
    np.save(root / "data" / "sdct.npy", np.zeros((3, 4, 4), np.float32))
    second = np.array(ds[0]["target"])
    np.testing.assert_allclose(first, second)


def test_attention_dataset_skips_cond_preprocess(tmp_path):
    root = _make_ldct_root(tmp_path)
    ds = LDCTAttentionDataset(file_path=str(root), window_size=1, load_ldct=True,
                              use_tensor_cache=False)
    sample = ds[0]
    # conditioning loaded raw (no HU windowing/clipping to [0,1])
    assert float(np.max(sample["image"])) > 1.0


def test_save_output_writers(tmp_path):
    root = _make_ldct_root(tmp_path)
    ds = LDCTDataset(file_path=str(root), window_size=1, use_tensor_cache=False)
    row = ds.data[0]
    out_root = tmp_path / "outputs"
    ds.save_output(row, ds.target_key, np.random.rand(1, 4, 4).astype(np.float32), out_root)
    written = list(out_root.rglob("*"))
    # PNG always; DICOM or .npy fallback depending on pydicom availability
    assert any(p.suffix == ".png" for p in written)
    assert any(p.suffix in (".dcm", ".npy") for p in written)


def test_build_from_config_factory(tmp_path):
    root = _make_ldct_root(tmp_path)
    ds = build_ldct_from_config(
        {"data_root": str(root), "window_size": 1, "load_ldct": True,
         "use_tensor_cache": False}, None, train=False,
    )
    assert isinstance(ds, LDCTDataset)
    assert len(ds) == 3


def test_concurrent_cache_writes_are_atomic(tmp_path):
    """The tensor cache's tmp+fsync+rename write (dataset_utils.py:452-472
    semantics) must survive concurrent writers — the reference's only
    concurrency-safety mechanism (SURVEY.md §5.2)."""
    import threading

    from fmdm_tpu.data.dataset_utils import load_tensor_cache, save_tensor_cache

    target = tmp_path / "cache" / "entry.pt"
    arrays = [np.full((64, 64), float(i), np.float32) for i in range(8)]

    def writer(i):
        for _ in range(5):
            save_tensor_cache(arrays[i], target)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out = load_tensor_cache(target)
    # whatever writer won, the file must be a complete, uncorrupted tensor
    assert out.shape == (64, 64)
    assert float(out.min()) == float(out.max())
