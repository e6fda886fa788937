"""dataset_utils coverage mirroring the reference self-tests
(dataset_utils.py:540-593) plus IO loader checks."""

import json
from pathlib import Path

import numpy as np
import pytest

from fmdm_tpu.data.dataset_utils import (
    build_dataset_from_config,
    cache_path_for_entry,
    consecutive_paths,
    load_tensor_cache,
    maybe_unwrap,
    resolve_entry,
    save_tensor_cache,
    split_volume_entry,
    to_2d_image,
)
from fmdm_tpu.data.io import load, load_composite, load_image, resize_array


@pytest.fixture()
def data_root(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for idx in range(3):
        np.save(data_dir / f"img_{idx}.npy", np.zeros((2, 2), np.float32) + idx)
    np.save(data_dir / "volume.npy", np.arange(12, dtype=np.float32).reshape(3, 2, 2))
    return tmp_path


def test_consecutive_paths(data_root):
    files = sorted(str(p) for p in (data_root / "data").iterdir())
    assert consecutive_paths(str(data_root / "data"), 1) == [[f] for f in files]
    assert len(consecutive_paths(str(data_root / "data"), 2)) == len(files) - 1
    assert consecutive_paths(str(data_root / "data"), -1) == [files]
    assert consecutive_paths(str(data_root / "missing"), 1) == []


def test_resolve_entry_and_unwrap(data_root):
    resolved = resolve_entry(data_root, "data", 2)
    assert len(resolved) == 3  # 4 files, window 2 -> 3 groups
    resolved_file = resolve_entry(data_root, "data/img_0.npy", 2)
    assert resolved_file == [[str(data_root / "data" / "img_0.npy")]]
    assert maybe_unwrap(["a"]) == "a"
    assert maybe_unwrap(["a", "b"]) == ["a", "b"]


def test_split_volume_entry(data_root):
    path = str(data_root / "data" / "volume.npy")
    splits = split_volume_entry(path, 1)
    assert len(splits) == 3 and splits[0]["window"] == 1
    splits_w2 = split_volume_entry(path, 2)
    assert len(splits_w2) == 2 and splits_w2[0]["split_count"] == 2
    assert split_volume_entry(path, -1) == [path]
    # 2D file has no depth dimension
    assert split_volume_entry(str(data_root / "data" / "img_0.npy"), 1) == [
        str(data_root / "data" / "img_0.npy")
    ]


def test_cache_path_for_entry(data_root):
    cache_root = data_root / "cache"
    p = cache_path_for_entry(data_root, cache_root, "data/img_0.npy", 0, 3)
    assert p == cache_root / "data" / "img_0_split_0.pt"
    p2 = cache_path_for_entry(data_root, cache_root, "data/img_0.npy", None, 1)
    assert p2 == cache_root / "data" / "img_0.pt"
    # dict entries use their path; lists their first element
    p3 = cache_path_for_entry(data_root, cache_root, {"path": "data/volume.npy"}, 1, 3)
    assert p3.name == "volume_split_1.pt"
    p4 = cache_path_for_entry(data_root, cache_root, ["data/a.npy", "data/b.npy"])
    assert p4.name == "a.pt"
    assert cache_path_for_entry(data_root, None, "x") is None


def test_tensor_cache_roundtrip_and_torch_readable(tmp_path):
    path = tmp_path / "cache" / "t.pt"
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    save_tensor_cache(arr, path)
    np.testing.assert_array_equal(load_tensor_cache(path), arr)
    torch = pytest.importorskip("torch")
    t = torch.load(path, weights_only=False)
    np.testing.assert_array_equal(t.numpy(), arr)


def test_to_2d_image_layouts():
    assert to_2d_image(np.zeros((4, 4))).shape == (4, 4)
    assert to_2d_image(np.zeros((1, 4, 4))).shape == (4, 4)
    assert to_2d_image(np.zeros((3, 4, 4))).shape == (4, 4)
    assert to_2d_image(np.zeros((2, 4, 4))) is None
    assert to_2d_image(np.zeros((4,))) is None


def test_io_loaders(data_root, tmp_path):
    payload = load_image(data_root / "data" / "img_0.npy")
    assert payload["Image"].shape == (2, 2)
    np.savez(tmp_path / "z.npz", x=np.ones((3, 3), np.float32))
    assert load_image(tmp_path / "z.npz")["Image"].shape == (3, 3)
    comp = load_composite([data_root / "data" / f"img_{i}.npy" for i in range(3)])
    assert comp["Image"].shape == (3, 2, 2)
    # threaded fan-out (deep stacks) is order-preserving and value-identical
    # to the serial path (reference fans over multiprocessing.Pool,
    # io_utils.py:66-92)
    deep_dir = tmp_path / "deep"
    deep_dir.mkdir()
    for i in range(12):
        np.save(deep_dir / f"s{i:02d}.npy", np.full((2, 2), float(i), np.float32))
    serial = load_composite(sorted(deep_dir.iterdir()), num_workers=0)
    threaded = load_composite(sorted(deep_dir.iterdir()), num_workers=4)
    np.testing.assert_array_equal(serial["Image"], threaded["Image"])
    assert threaded["Image"].shape == (12, 2, 2)
    np.testing.assert_array_equal(threaded["Image"][:, 0, 0], np.arange(12.0))
    # directory dispatch stacks sorted files
    vol_dir = tmp_path / "vol"
    vol_dir.mkdir()
    for i in range(2):
        np.save(vol_dir / f"s{i}.npy", np.zeros((2, 2), np.float32))
    assert load(vol_dir)["Image"].shape == (2, 2, 2)
    # PNG via PIL
    from PIL import Image as PILImage

    PILImage.fromarray(np.zeros((5, 6), np.uint8)).save(tmp_path / "i.png")
    assert load_image(tmp_path / "i.png")["Image"].shape == (5, 6)


def test_resize_array():
    x = np.random.rand(8, 8).astype(np.float32)
    assert resize_array(x, (4, 4)).shape == (4, 4)
    v = np.random.rand(3, 8, 8).astype(np.float32)
    assert resize_array(v, (4, 4)).shape == (3, 4, 4)
    assert resize_array(v, (4, 4, 4)).shape == (4, 4, 4)


def test_base_dataset_via_dataset_json(tmp_path):
    (tmp_path / "data").mkdir()
    np.save(tmp_path / "data" / "s.npy", np.arange(6, dtype=np.float32).reshape(2, 3))
    (tmp_path / "train.txt").write_text("target\ndata/s.npy\n")
    (tmp_path / "dataset.json").write_text(json.dumps({"dataset_class": "datasets.base:BaseDataset"}))
    cfg_path = tmp_path / "train_config.json"
    cfg_path.write_text("{}")
    ds = build_dataset_from_config({"data_root": str(tmp_path)}, train=True, cfg_path=cfg_path)
    assert len(ds) == 1
    sample = ds[0]
    # generic float data outside [0,1] min-max normalizes (base.py:94-114)
    assert float(np.max(sample["target"])) <= 1.0


def test_mnist_loads_keras_npz(tmp_path):
    """Real-MNIST acquisition via the keras-style mnist.npz artifact
    (torchvision download is impossible in this image; npz or IDX files
    dropped under data_root are picked up with no code change)."""
    import numpy as np

    from fmdm_tpu.data.mnist import MNISTDataset

    rng = np.random.RandomState(0)
    np.savez(tmp_path / "mnist.npz",
             x_train=rng.randint(0, 255, (12, 28, 28), dtype=np.uint8),
             y_train=rng.randint(0, 10, (12,)).astype(np.int64),
             x_test=rng.randint(0, 255, (5, 28, 28), dtype=np.uint8),
             y_test=rng.randint(0, 10, (5,)).astype(np.int64))
    train = MNISTDataset(str(tmp_path), train=True, img_size=32)
    test = MNISTDataset(str(tmp_path), train=False, img_size=32)
    assert not train.synthetic and not test.synthetic
    assert len(train) == 12 and len(test) == 5
    s = train[0]
    img = np.asarray(s["target"])
    assert img.shape[-2:] == (32, 32)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
