"""Native C++ loader tests: decode parity, prefetch ordering, packing."""

import os

import numpy as np
import pytest

from tpu_vo.io import native_loader
from tpu_vo.io.dataset import load_frame
from tpu_vo.utils.synthetic import make_sequence, write_dataset

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    frames, _, _, _ = make_sequence(n_frames=6, width=160, height=120, seed=2)
    write_dataset(str(d), frames)
    return str(d), frames


def test_enumeration_and_dims(dataset):
    path, frames = dataset
    ds = native_loader.NativeDataset(path)
    assert ds.num_frames == 6
    assert (ds.width, ds.height) == (160, 120)


def test_decode_matches_python_loader(dataset):
    path, frames = dataset
    ds = native_loader.NativeDataset(path)
    for i in (0, 3, 5):
        native = ds.read(i)
        ref = load_frame(os.path.join(path, f"{i:06d}.png"))
        np.testing.assert_array_equal(native, ref)
        np.testing.assert_array_equal(native, frames[i])


def test_color_png_gray_conversion(tmp_path):
    """RGB PNG: native BT.601 fixed point must match the Python/cv2 rule."""
    from PIL import Image

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    p = str(tmp_path / "c.png")
    Image.fromarray(rgb).save(p)
    ds = native_loader.NativeDataset(str(tmp_path))
    native = ds.read(0)
    ref = load_frame(p)
    np.testing.assert_array_equal(native, ref)


def test_prefetch_streams_in_order(dataset):
    path, frames = dataset
    ds = native_loader.NativeDataset(path, n_threads=3, depth=4)
    seen = [(i, f.copy()) for i, f in ds]
    assert [i for i, _ in seen] == list(range(6))
    for i, f in seen:
        np.testing.assert_array_equal(f, frames[i])


def test_pack_roundtrip(dataset, tmp_path):
    path, frames = dataset
    pack = str(tmp_path / "seq.vobin")
    n = native_loader.pack_dataset(path, pack)
    assert n == 6
    ps = native_loader.PackedSequence(pack)
    assert (ps.num_frames, ps.height, ps.width) == (6, 120, 160)
    arr = ps.read()
    np.testing.assert_array_equal(arr, np.stack(frames))
    # partial read
    np.testing.assert_array_equal(ps.read(2, 3), np.stack(frames[2:5]))


def test_open_missing_dataset():
    with pytest.raises(FileNotFoundError):
        native_loader.NativeDataset("/nonexistent_dir_abc")
