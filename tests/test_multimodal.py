"""PPM codec round-trip + multimodal plumbing (pipeline/multimodal.py).
The oracled image_stats query covers the distributed decode path; these
pin the codec itself."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import REPO  # noqa: F401

from ontoea_spark.pipeline import multimodal as MM


def test_ppm_roundtrip_exact():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert np.array_equal(MM.decode_ppm(MM.encode_ppm(arr)), arr)


def test_ppm_decode_rejects_other_formats():
    with pytest.raises(ValueError):
        MM.decode_ppm(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\xff\xd8\xff\xe0jpeg")


def test_resize_nearest_shape_and_corners():
    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = MM.resize_nearest(arr, w=3, h=2)
    assert out.shape == (2, 3, 3)
    # nearest-neighbor keeps exact source pixels: top-left maps to (0,0)
    assert np.array_equal(out[0, 0], arr[0, 0])
    blob = MM.resize_image(MM.encode_ppm(arr), w=3, h=2)
    assert np.array_equal(MM.decode_ppm(blob), out)


def test_synth_ppm_stats_match_formula():
    """The generator formula IS the oracle contract — decode must
    reproduce it byte-for-byte."""
    arr = MM.decode_ppm(MM.synth_ppm(42, w=5, h=4))
    y, x = np.mgrid[0:4, 0:5]
    assert np.array_equal(arr[..., 0], (42 * 7 + x * 3 + y * 5) % 256)
    assert np.array_equal(arr[..., 1], (42 * 11 + x + y * 2) % 256)
    assert np.array_equal(arr[..., 2], (42 * 13 + x * 2 + y) % 256)
