"""Native C++ image pipeline tests: parity with the PIL path + threading."""
import numpy as np
import pytest
from PIL import Image

from radialog_tpu.native.loader import (CxrLoader, build_native,
                                        native_available, preprocess_file)
from radialog_tpu.ops.image import load_image_grayscale, preprocess_cxr_np


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(600, 520), (512, 640), (700, 700), (480, 600)]):
        img = rng.normal(120 + 10 * i, 40, (h, w)).clip(0, 255).astype(np.uint8)
        p = d / f"scan{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_native_builds():
    assert native_available(), "C++ loader failed to build (g++/libjpeg)"


def test_single_image_parity(jpgs):
    if not native_available():
        pytest.skip("no native build")
    for p in jpgs[:2]:
        native = preprocess_file(p, resize=256, crop=224)
        ref = preprocess_cxr_np(load_image_grayscale(p), 256, 224)
        assert native.shape == ref.shape == (224, 224, 3)
        # JPEG decode + bilinear differences are small but nonzero
        diff = np.abs(native - ref).mean()
        assert diff < 0.02, f"mean abs diff {diff}"
        # channels replicated
        np.testing.assert_array_equal(native[..., 0], native[..., 1])


def test_loader_epoch_covers_all(jpgs):
    with CxrLoader(jpgs, batch=3, resize=128, crop=112, threads=2,
                   shuffle=True, seed=1) as ld:
        seen = []
        for images, idx in ld.epoch(seed=1):
            assert images.shape[1:] == (112, 112, 3)
            assert images.dtype == np.float32
            assert images.min() >= 0.0 and images.max() <= 1.0
            seen.extend(idx.tolist())
        assert sorted(seen) == list(range(len(jpgs)))
        # second epoch with a different seed also covers everything
        seen2 = [i for _, idx in ld.epoch(seed=2) for i in idx.tolist()]
        assert sorted(seen2) == list(range(len(jpgs)))


def test_loader_skips_bad_files(jpgs, tmp_path):
    bad = tmp_path / "broken.jpg"
    bad.write_bytes(b"not a jpeg")
    with CxrLoader(jpgs + [str(bad)], batch=8, resize=128, crop=112,
                   threads=2, shuffle=False) as ld:
        batches = list(ld.epoch())
        total = sum(len(i) for _, i in batches)
        assert total == len(jpgs)  # bad file silently skipped


def test_python_fallback_path(jpgs, monkeypatch):
    import radialog_tpu.native.loader as L
    monkeypatch.setattr(L, "build_native", lambda force=False: None)
    ld = CxrLoader(jpgs, batch=2, resize=128, crop=112, shuffle=False)
    images, idx = next(iter(ld.epoch()))
    assert images.shape == (2, 112, 112, 3)
