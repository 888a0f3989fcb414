"""Native C++ batch loader: PIL parity and failure handling."""

import numpy as np
import pytest
from PIL import Image

from nextgen_uia_tpu.data import native_loader as NL

pytestmark = pytest.mark.skipif(not NL.available(),
                                reason="native loader not built (toolchain missing)")


@pytest.fixture()
def images(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w, mode) in enumerate([(96, 128, "RGB"), (64, 64, "L"), (200, 150, "RGB")]):
        a = rng.integers(0, 255, (h, w) + ((3,) if mode == "RGB" else ()), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(a, mode).save(p)
        paths.append(str(p))
    # one jpeg
    a = rng.integers(0, 255, (120, 80, 3), dtype=np.uint8)
    p = tmp_path / "img_j.jpg"
    Image.fromarray(a, "RGB").save(p, quality=95)
    paths.append(str(p))
    return paths


def test_decode_parity_with_pil(images):
    out, status = NL.decode_batch(images, 48, gray=True)
    assert status.all()
    assert out.shape == (len(images), 48, 48, 1)
    for i, p in enumerate(images):
        ref = np.asarray(Image.open(p).convert("L").resize((48, 48)))
        diff = np.abs(out[i, :, :, 0].astype(int) - ref.astype(int))
        # PIL uses fixed-point filter coefficients; float path differs slightly
        assert diff.max() <= 3, f"{p}: max diff {diff.max()}"
        assert diff.mean() < 1.0


def test_rgb_output_and_gray_replication(images):
    out, status = NL.decode_batch(images, 32, gray=False)
    assert status.all() and out.shape[-1] == 3
    # grayscale source must be replicated across channels
    assert np.array_equal(out[1, :, :, 0], out[1, :, :, 1])


def test_missing_and_corrupt_files(tmp_path, images):
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"not a png at all")
    out, status = NL.decode_batch([images[0], str(bad), "/nonexistent.png"], 32)
    assert status.tolist() == [1, 0, 0]
    assert out[1].sum() == 0 and out[2].sum() == 0
