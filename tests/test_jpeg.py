"""Baseline JPEG codec (stages/jpeg.py): round-trip fidelity, entropy-coder
edge paths, rejection of non-baseline streams, and the feature-stage hook."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_data_loader_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(err ** 2))
    return float("inf") if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def _test_image(h: int = 45, w: int = 61, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 / w, yy * 255 / h,
                    (xx + yy) * 127 / (h + w)], axis=-1)
    return np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)


def test_rgb_roundtrip_psnr_odd_dims():
    img = _test_image()  # 45x61: exercises edge-block padding + crop
    payload = encode_jpeg(img, quality=90)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    dec = decode_jpeg(payload)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(dec, img) > 28.0


def test_grayscale_roundtrip():
    g = _test_image()[..., 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert _psnr(dec, g) > 32.0


def test_quality_monotone():
    img = _test_image()
    lo = decode_jpeg(encode_jpeg(img, quality=20))
    hi = decode_jpeg(encode_jpeg(img, quality=95))
    assert _psnr(hi, img) > _psnr(lo, img)
    assert len(encode_jpeg(img, quality=20)) < len(encode_jpeg(img, 95))


def test_sparse_blocks_exercise_eob_and_zrl():
    """A flat image with isolated bright pixels produces long AC zero runs
    (ZRL) and early EOBs — the entropy coder's skip paths."""
    img = np.full((32, 32), 128, dtype=np.uint8)
    img[3, 29] = 255
    img[20, 5] = 0
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert _psnr(dec, img) > 30.0
    assert abs(int(dec[3, 29]) - 255) < 60  # spot survives


def test_flat_image_exact_dc_path():
    img = np.full((16, 24, 3), 77, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.all(np.abs(dec.astype(int) - 77) <= 2)


def test_rejects_progressive_and_garbage():
    img = _test_image(16, 16)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_feature_stage_decodes_jpeg():
    from elasticsearch_data_loader_ray.stages.multimodal import (
        ImageFeatureStage,
    )

    img = _test_image(24, 24)
    batch = pa.table({
        "media_id": pa.array(["a", "b"], pa.string()),
        "media_type": pa.array(["image/jpeg", "image/jpeg"], pa.string()),
        "payload": pa.array([encode_jpeg(img), b"\xff\xd8broken"],
                            pa.binary()),
        "width": pa.array([24, 24], pa.int32()),
        "height": pa.array([24, 24], pa.int32()),
    })
    # strict: a real baseline JPEG must decode natively (no Pillow here),
    # while a corrupt payload reports undecoded rather than faking
    out = ImageFeatureStage(strict=True)(batch)
    assert out["decoded"].to_pylist() == [True, False]
    feats = out["features"][0].as_py()
    assert len(feats) == 16 and abs(sum(feats) - 1.0) < 1e-6


def test_progressive_equals_baseline_bitwise():
    """Progressive encoding carries the SAME final coefficients as the
    baseline encoding, so full progressive decode must be bitwise-equal to
    baseline decode — this pins every progressive path (interleaved DC
    first/refine, per-component AC bands, successive approximation,
    EOBRUN) against the sequential reference."""
    for shape, q in [((45, 61, 3), 90), ((16, 24), 85), ((8, 8, 3), 50),
                     ((33, 17), 30), ((64, 48, 3), 95)]:
        rng = np.random.default_rng(11)
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
        base = (xx * 255 / shape[1] + yy * 200 / shape[0]) % 256
        img = base if len(shape) == 2 else np.stack(
            [base, 255 - base, (base + 64) % 256], axis=-1)
        img = np.clip(img + rng.normal(0, 6, shape), 0, 255).astype(np.uint8)
        b = decode_jpeg(encode_jpeg(img, quality=q))
        p = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
        assert np.array_equal(b, p), (shape, q)


def test_progressive_sparse_exercises_eobrun():
    """A nearly-flat image makes whole AC bands empty, producing EOB runs
    spanning many blocks (EOBn, n > 0) — plus refinement correction bits
    for the isolated spikes."""
    img = np.full((128, 128, 3), 128, np.uint8)
    img[5, 5] = 255
    img[100, 90] = 0
    pay = encode_jpeg(img, quality=85, progressive=True)
    sof = pay.find(b"\xff\xc2")
    assert sof > 0  # really progressive
    assert pay.count(b"\xff\xda") == 11  # DC + 3x2 AC + DC/3xAC refine
    assert np.array_equal(decode_jpeg(pay),
                          decode_jpeg(encode_jpeg(img, quality=85)))


def test_progressive_grayscale_spectral_bands():
    g = _test_image(40, 56)[..., 1]
    pay = encode_jpeg(g, quality=80, progressive=True)
    assert pay.count(b"\xff\xda") == 5  # DC, AC 1-5/6-63, 2 refines
    dec = decode_jpeg(pay)
    assert dec.shape == g.shape
    assert np.array_equal(dec, decode_jpeg(encode_jpeg(g, quality=80)))


def test_rejects_lossless_and_bad_scan_params():
    img = _test_image(16, 16)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC3  # lossless
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
