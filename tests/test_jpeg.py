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
    # arithmetic-coded sequential (SOF9) stays a clean capability gate
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(base[:i] + b"\xff\xc9" + base[i + 2 :])
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a")
    with pytest.raises(ValueError, match="missing SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_multi_scan_sequential_decodes_identically():
    """A baseline frame split into one NON-interleaved scan per component
    (SOS ns < frame ncomp, spec-legal, the r14 advisor's shape) now
    DECODES — via the coefficient-accumulating path — to the exact same
    pixels as the single interleaved scan (r16: the gate became a
    capability)."""
    import numpy as np

    from vector_graph_rag_spark.operators.jpeg import encode_jpeg_multiscan

    rs = np.random.RandomState(11)
    for shape, sub, gray in [
        ((16, 24, 3), "444", False),
        ((20, 28, 3), "420", False),
        ((15, 9, 3), "444", True),
    ]:
        px = rs.randint(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, quality=85, subsample=sub, grayscale=gray))
        ms = decode_jpeg(
            encode_jpeg_multiscan(px, quality=85, subsample=sub, grayscale=gray)
        )
        assert (base["pixels"] == ms["pixels"]).all()
        assert base["feature"] == ms["feature"]
    # restarts across non-interleaved scans (block-counted, not MCU)
    px = rs.randint(0, 256, (32, 48, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=85))
    ms = decode_jpeg(encode_jpeg_multiscan(px, quality=85, restart_interval=5))
    assert (base["pixels"] == ms["pixels"]).all()


def test_progressive_decodes_identically_across_scan_plans():
    """Progressive (SOF2): spectral selection + successive approximation
    over the SAME quantized coefficients the baseline encoder produces —
    so decode(progressive) == decode(baseline) pixel-for-pixel.  Covers
    4:4:4 / 4:2:0 (where the luma AC scans span fewer blocks than the
    MCU-padded DC grid), grayscale, non-multiple-of-8/16 dims, restarts
    (per-scan RSTn with EOB-run flushes), and a solid image whose AC
    scans are one long EOB run (the added EOBn symbols)."""
    import numpy as np

    from vector_graph_rag_spark.operators.jpeg import encode_jpeg_progressive

    rs = np.random.RandomState(5)
    cases = [
        ((16, 16, 3), "444", False, 80, 0),
        ((20, 28, 3), "420", False, 80, 0),
        ((33, 17, 3), "420", False, 60, 0),
        ((15, 9, 3), "444", False, 95, 0),
        ((21, 13, 3), "444", True, 90, 0),
        ((32, 48, 3), "420", False, 85, 3),
    ]
    for shape, sub, gray, q, ri in cases:
        px = rs.randint(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(
            encode_jpeg(px, quality=q, subsample=sub, grayscale=gray)
        )
        prog = decode_jpeg(
            encode_jpeg_progressive(
                px, quality=q, subsample=sub, grayscale=gray,
                restart_interval=ri,
            )
        )
        assert (base["pixels"] == prog["pixels"]).all(), (shape, sub, q, ri)
        assert base["feature"] == prog["feature"]
    # solid color: every AC scan is a pure EOBn run
    px = np.full((48, 64, 3), 77, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=90))
    prog = decode_jpeg(encode_jpeg_progressive(px, quality=90))
    assert (base["pixels"] == prog["pixels"]).all()
    # smooth gradient at several qualities: mixed EOB runs + refinements
    gx = np.linspace(0, 255, 80).astype(np.uint8)
    px = np.repeat(np.repeat(gx[None, :, None], 56, 0), 3, 2)
    for q in (30, 60, 95):
        assert (
            decode_jpeg(encode_jpeg(px, quality=q))["pixels"]
            == decode_jpeg(encode_jpeg_progressive(px, quality=q))["pixels"]
        ).all()


def test_progressive_prefix_scans_decode_coarse():
    """The progressive CONTRACT: a stream truncated to a prefix of the
    scan plan (at scan boundaries) still decodes at full dimensions —
    each further scan refines the image toward the baseline decode."""
    import numpy as np

    from vector_graph_rag_spark.operators.jpeg import (
        _DEFAULT_PROG_SCANS_COLOR,
        encode_jpeg_progressive,
    )

    rs = np.random.RandomState(9)
    px = rs.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    full = decode_jpeg(encode_jpeg_progressive(px, quality=85))
    errs = []
    for n in range(1, len(_DEFAULT_PROG_SCANS_COLOR) + 1):
        part = decode_jpeg(
            encode_jpeg_progressive(
                px, quality=85, scans=_DEFAULT_PROG_SCANS_COLOR[:n]
            )
        )
        assert part["pixels"].shape == (24, 24, 3)
        errs.append(
            float(
                np.mean(
                    np.abs(
                        part["pixels"].astype(np.int32)
                        - full["pixels"].astype(np.int32)
                    )
                )
            )
        )
    assert errs[-1] == 0.0  # the full plan IS the full image
    assert errs[0] > errs[-1]  # the DC-only preview is genuinely coarser


def test_jpeg_through_spark_kernel(spark):
    """JPEG rows dispatch through decode_assets(stdlib_kernel) on the
    \\xff\\xd8\\xff magic — feature is the decoded mean luma."""
    from vector_graph_rag_spark.operators.multimodal import (
        decode_assets,
        stdlib_kernel,
    )

    from vector_graph_rag_spark.operators.jpeg import encode_jpeg_progressive

    px = np.full((8, 8, 3), (255, 255, 255), dtype=np.uint8)
    data = encode_jpeg(px, quality=95)
    prog = encode_jpeg_progressive(px, quality=95)
    assets = spark.createDataFrame(
        [("j", "image", data, 8, 8, 0), ("p", "image", prog, 8, 8, 0)],
        "asset_id string, modality string, content binary, width int, height int, duration_ms int",
    )
    rows = {r["asset_id"]: r for r in decode_assets(assets, kernel=stdlib_kernel).collect()}
    assert abs(rows["j"]["feature"] - 1.0) < 0.02
    # progressive streams ride the same magic dispatch and decode equal
    assert rows["p"]["feature"] == rows["j"]["feature"]


def test_16bit_quant_tables_decode():
    """r16: DQT with Pq=1 (16-bit big-endian entries, B.2.4.1) decodes —
    previously a NotImplementedError gate.  A baseline stream whose DQTs
    are rewritten to 16-bit with identical values must decode to the
    exact same pixels."""
    import struct

    rs = np.random.RandomState(2)
    im = rs.randint(0, 256, (16, 16, 3), np.uint8)
    s = encode_jpeg(im, quality=85)
    base = decode_jpeg(s)
    out = bytearray()
    pos = 0
    while pos < len(s):
        if s[pos] == 0xFF and pos + 1 < len(s) and s[pos + 1] == 0xDB:
            (ln,) = struct.unpack_from(">H", s, pos + 2)
            payload = s[pos + 4 : pos + 2 + ln]
            new_payload = bytearray()
            p = 0
            while p < len(payload):
                new_payload += bytes([0x10 | (payload[p] & 0xF)])
                new_payload += b"".join(
                    struct.pack(">H", v) for v in payload[p + 1 : p + 65]
                )
                p += 65
            out += bytes([0xFF, 0xDB])
            out += struct.pack(">H", len(new_payload) + 2) + new_payload
            pos += 2 + ln
        else:
            out.append(s[pos])
            pos += 1
    assert (decode_jpeg(bytes(out))["pixels"] == base["pixels"]).all()


def test_corrupt_streams_raise_valueerror_only():
    """Hostile-input contract (r16 fuzz pass — 4000 seeded mutations,
    zero hangs): corrupt JPEG bytes raise ValueError uniformly (internal
    struct/index/key/overflow errors are normalized), while
    NotImplementedError stays a capability gate.  A seeded slice of the
    fuzz corpus runs here as the regression."""
    import random

    from vector_graph_rag_spark.operators.jpeg import (
        encode_jpeg_multiscan,
        encode_jpeg_progressive,
    )

    rs = np.random.RandomState(1)
    px = rs.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    streams = [
        encode_jpeg(px, quality=80),
        encode_jpeg_progressive(px, quality=80),
        encode_jpeg_progressive(px, quality=80, subsample="420"),
        encode_jpeg_multiscan(px, quality=80),
    ]
    rng = random.Random(7)
    for _ in range(400):
        s = bytearray(rng.choice(streams))
        op = rng.random()
        if op < 0.4:
            i = rng.randrange(len(s))
            s[i] = rng.randrange(256)
        elif op < 0.7:
            s = s[: rng.randrange(2, len(s))]
        else:
            for _ in range(rng.randrange(1, 8)):
                i = rng.randrange(len(s))
                s[i] = rng.randrange(256)
        try:
            decode_jpeg(bytes(s))
        except (ValueError, NotImplementedError):
            pass  # the contract: data error or capability gate, only
