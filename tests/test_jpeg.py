"""Baseline JPEG codec (operators/jpeg.py): encode/decode round trips,
restart-marker equivalence, grayscale, subsampling, and the documented
mode gates.  The encoder doubles as the fixture generator — both sides
share only the DCT basis and the Annex-K tables, so a round trip
exercises real entropy coding (canonical Huffman, byte stuffing, EXTEND),
not a mirrored in-memory path."""

from __future__ import annotations

import numpy as np
import pytest

from vector_graph_rag_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b) -> float:
    e = a.astype(np.float64) - b.astype(np.float64)
    return float(10 * np.log10(255**2 / (e**2).mean()))


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 7 + xx * 3) % 256, (yy * 2 + xx * 9) % 256, (xx * 5 + yy * 11) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_solid_color_near_exact():
    """DC-only blocks (solid color) reconstruct within rounding: the only
    loss channels are quantization of one coefficient and color-space
    round trips."""
    px = np.full((16, 16, 3), (200, 60, 120), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(px, quality=95))
    assert d["width"] == 16 and d["height"] == 16
    assert np.abs(d["pixels"].astype(int) - px.astype(int)).max() <= 3


def test_roundtrip_444_and_non_multiple_of_8_dims():
    px = _gradient(33, 40)  # dims force edge-padded partial blocks
    d = decode_jpeg(encode_jpeg(px, quality=95))
    assert (d["width"], d["height"]) == (40, 33)
    assert _psnr(d["pixels"], px) > 35  # measured 38.2 on this sawtooth
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert abs(d["feature"] - luma.mean() / 255.0) < 0.02


def test_roundtrip_420_subsampling():
    """4:2:0 halves the chroma grid; on smooth content the loss is small
    (sharp chroma edges legitimately alias — that's the format)."""
    yy, xx = np.mgrid[0:33, 0:40]
    smooth = np.stack([yy * 3, xx * 2, (yy + xx) * 2], axis=-1).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(smooth, quality=90, subsample="420"))
    assert _psnr(d["pixels"], smooth) > 40


def test_restart_markers_are_lossless_equivalent():
    """DRI/RSTn only re-anchor the entropy stream (DC predictor resets);
    the quantized coefficients are identical, so decoded pixels must be
    BIT-identical with and without restart intervals."""
    px = _gradient(33, 40)
    plain = decode_jpeg(encode_jpeg(px, quality=90))
    rst = decode_jpeg(encode_jpeg(px, quality=90, restart_interval=2))
    assert (plain["pixels"] == rst["pixels"]).all()
    rst420 = decode_jpeg(
        encode_jpeg(px, quality=90, subsample="420", restart_interval=3)
    )
    plain420 = decode_jpeg(encode_jpeg(px, quality=90, subsample="420"))
    assert (plain420["pixels"] == rst420["pixels"]).all()


def test_grayscale_single_component():
    px = _gradient(24, 17)
    d = decode_jpeg(encode_jpeg(px, quality=95, grayscale=True))
    luma = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).astype(
        np.uint8
    )
    assert _psnr(d["pixels"][..., 0], luma) > 40
    assert (d["pixels"][..., 0] == d["pixels"][..., 1]).all()  # grey → replicated


def test_noise_worst_case_entropy():
    """Random noise maximizes AC activity (ZRL runs, high categories) —
    the entropy coder must still round-trip at high quality."""
    noise = np.random.RandomState(0).randint(0, 256, (24, 24, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(noise, quality=98))
    assert _psnr(d["pixels"], noise) > 25


def test_unsupported_modes_gate():
    px = _gradient(8, 8)
    base = encode_jpeg(px)
    i = base.find(b"\xff\xc0")
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(base[:i] + b"\xff\xc2" + base[i + 2 :])
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a")
    with pytest.raises(ValueError, match="missing SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_multi_scan_baseline_gate():
    """A baseline frame split into multiple sequential scans (SOS ns <
    frame ncomp) is spec-legal but outside the single-interleaved-scan
    decoder: it must gate cleanly at SOS parse, not KeyError mid-decode
    (r14 advisor item)."""
    px = _gradient(8, 8)
    base = encode_jpeg(px)  # 3-component color frame
    i = base.find(b"\xff\xda")
    assert i != -1
    # original SOS for ns=3: len=12, ns, 3x(id,tabs), 3 spectral bytes.
    # Replace with a single-component scan header (len=8, ns=1).
    sos_len = int.from_bytes(base[i + 2 : i + 4], "big")
    single = b"\xff\xda" + bytes([0, 8, 1, 1, 0x00, 0, 63, 0])
    patched = base[:i] + single + base[i + 2 + sos_len :]
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(patched)


def test_jpeg_through_spark_kernel(spark):
    """JPEG rows dispatch through decode_assets(stdlib_kernel) on the
    \\xff\\xd8\\xff magic — feature is the decoded mean luma."""
    from vector_graph_rag_spark.operators.multimodal import (
        decode_assets,
        stdlib_kernel,
    )

    px = np.full((8, 8, 3), (255, 255, 255), dtype=np.uint8)
    data = encode_jpeg(px, quality=95)
    assets = spark.createDataFrame(
        [("j", "image", data, 8, 8, 0)],
        "asset_id string, modality string, content binary, width int, height int, duration_ms int",
    )
    rows = decode_assets(assets, kernel=stdlib_kernel).collect()
    assert abs(rows[0]["feature"] - 1.0) < 0.02
