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


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(5)
    samples = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    out, rate = MM.decode_wav(MM.encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_wav_rejects_non_riff_and_compressed():
    with pytest.raises(ValueError):
        MM.decode_wav(b"ID3\x03mp3data")


def test_synth_wav_matches_formula():
    samples, rate = MM.decode_wav(MM.synth_wav(7, n_samples=10))
    i = np.arange(10)
    assert np.array_equal(samples, ((7 * 17 + i * 31) % 4096 - 2048).astype(np.int16))
    assert rate == 16000


def test_sample_frames_concat_ppm():
    frames_in = [MM.synth_ppm(i, w=4, h=3) for i in range(7)]
    video = b"".join(frames_in)
    out = MM.sample_frames(video, every_n=3)
    assert out == [frames_in[0], frames_in[3], frames_in[6]]
    # each sampled frame decodes back to the original array
    for f, i in zip(out, (0, 3, 6)):
        assert np.array_equal(MM.decode_ppm(f), MM.decode_ppm(frames_in[i]))
    with pytest.raises(ValueError):
        MM.sample_frames(b"notppm" + video, every_n=2)


def test_ppm_header_comments_and_truncation_guards():
    """ADVICE r3: header comments are legal P6; truncated headers and
    payloads must raise instead of spinning."""
    arr = MM.decode_ppm(MM.synth_ppm(3, w=4, h=2))
    commented = b"P6\n# synth fixture\n4 2\n# maxval next\n255\n" + arr.tobytes()
    assert np.array_equal(MM.decode_ppm(commented), arr)
    with pytest.raises(ValueError):
        MM.decode_ppm(b"P6\n4 2")  # header cut mid-fields
    with pytest.raises(ValueError):
        MM.decode_ppm(b"P6\n# comment never ends")
    with pytest.raises(ValueError):
        MM.sample_frames(b"P6\n4 2", every_n=1)  # truncated frame header
    with pytest.raises(ValueError):
        # header complete but payload short of w*h*3 bytes
        MM.sample_frames(b"P6\n4 2\n255\n" + b"\x00" * 5, every_n=1)
