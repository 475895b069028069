"""Pure-stdlib baseline-JPEG decoder tests (multimodal/codecs.py::decode_jpeg).

The test side carries its own minimal ENCODER (canonical Huffman codes +
bit-stuffing writer built from the T.81 spec text, independent of the
decoder's table walk), so the real-decode branch for the dominant corpus
image format has executing, engine-independent coverage in this container
— no Pillow required. Expected pixels come from analytic DC-only blocks
(IDCT of a lone DC coefficient is flat = DC/8 + 128) and an independent
numpy IDCT for AC cases.
"""

from __future__ import annotations

import struct

import pytest

from pyrecount_spark.multimodal.codecs import decode_image_py, decode_jpeg

# --- minimal test-side encoder --------------------------------------------

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # Annex K.3.1
DC_VALS = list(range(12))
AC_EOB_BITS = [1] + [0] * 15  # single length-1 code: EOB
AC_EOB_VALS = [0x00]
AC_RS_BITS = [1, 1] + [0] * 14  # '0' -> EOB, '10' -> (run 0, size 1)
AC_RS_VALS = [0x00, 0x01]


def _canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)  # 1-padding per spec
        return bytes(self.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _tables_segs(ac_bits, ac_vals) -> bytes:
    return _seg(0xDB, bytes([0]) + bytes([1] * 64)) + _seg(
        0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    ) + _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))


def _put_dc(bw: _BitWriter, dc_codes, diff: int) -> None:
    t = abs(diff).bit_length()
    length, code = dc_codes[t]
    bw.put(code, length)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def gray_jpeg(w: int, h: int, dcs: list[int], restart: int = 0) -> bytes:
    """Grayscale baseline JPEG, flat (DC-only) 8×8 blocks, quant all-1s."""
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = _seg(0xDD, struct.pack(">H", restart)) if restart else b""
    dc_codes = _canonical(DC_BITS, DC_VALS)
    ac_codes = _canonical(AC_EOB_BITS, AC_EOB_VALS)
    body = bytearray()
    bw = _BitWriter()
    pred = 0
    for i, dc in enumerate(dcs):
        if restart and i and i % restart == 0:
            body += bw.flush()
            body += bytes([0xFF, 0xD0 + ((i // restart - 1) % 8)])
            bw = _BitWriter()
            pred = 0
        _put_dc(bw, dc_codes, dc - pred)
        pred = dc
        length, code = ac_codes[0x00]
        bw.put(code, length)  # EOB
    body += bw.flush()
    return (
        b"\xff\xd8" + _tables_segs(AC_EOB_BITS, AC_EOB_VALS) + dri + sof + sos
        + bytes(body) + b"\xff\xd9"
    )


def color_jpeg_420(y_dcs: list[int], cb_dc: int, cr_dc: int) -> bytes:
    """One 16×16 MCU, 4:2:0: four DC-only Y blocks + one Cb + one Cr."""
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 16, 16)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dc_codes = _canonical(DC_BITS, DC_VALS)
    ac_codes = _canonical(AC_EOB_BITS, AC_EOB_VALS)
    bw = _BitWriter()
    pred = 0
    for dc in y_dcs:  # Y blocks share one DC predictor chain
        _put_dc(bw, dc_codes, dc - pred)
        pred = dc
        bw.put(*reversed(ac_codes[0x00]))
    for dc in (cb_dc, cr_dc):  # each chroma component has its own predictor
        _put_dc(bw, dc_codes, dc)
        bw.put(*reversed(ac_codes[0x00]))
    return (
        b"\xff\xd8" + _tables_segs(AC_EOB_BITS, AC_EOB_VALS) + sof + sos
        + bw.flush() + b"\xff\xd9"
    )


def _flat(dc: int) -> int:
    v = round(dc / 8 + 128)
    return 0 if v < 0 else (255 if v > 255 else v)


# --- tests -----------------------------------------------------------------


def test_gray_single_block_flat():
    out = decode_jpeg(gray_jpeg(8, 8, [40]))
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (8, 8)
    assert set(rgb) == {_flat(40)}


def test_gray_dc_prediction_across_blocks():
    w, h, rgb = decode_jpeg(gray_jpeg(16, 8, [40, -16]))
    assert (w, h) == (16, 8)
    assert rgb[0] == _flat(40) and rgb[8 * 3] == _flat(-16)
    # row stride: second row same pattern
    assert rgb[16 * 3] == _flat(40) and rgb[16 * 3 + 8 * 3] == _flat(-16)


def test_gray_crop_to_non_multiple_of_8():
    w, h, rgb = decode_jpeg(gray_jpeg(5, 6, [24]))
    assert (w, h) == (5, 6) and len(rgb) == 5 * 6 * 3
    assert set(rgb) == {_flat(24)}


def test_gray_restart_markers_reset_predictor():
    # DRI=1: every block preceded by RSTn after the first; predictors reset,
    # so each block's stored diff is vs 0, not the previous block
    w, h, rgb = decode_jpeg(gray_jpeg(24, 8, [40, -16, 88], restart=1))
    assert (w, h) == (24, 8)
    assert rgb[0] == _flat(40)
    assert rgb[8 * 3] == _flat(-16)
    assert rgb[16 * 3] == _flat(88)


def test_color_420_chroma_upsampling():
    # Y quadrants 40/-16/88/0; blue-ish chroma
    w, h, rgb = decode_jpeg(color_jpeg_420([40, -16, 88, 0], cb_dc=200, cr_dc=-80))
    assert (w, h) == (16, 16)
    ys = [_flat(40), _flat(-16), _flat(88), _flat(0)]
    cb = _flat(200) - 128
    cr = _flat(-80) - 128

    def expect(yv):
        r = min(255, max(0, round(yv + 1.402 * cr)))
        g = min(255, max(0, round(yv - 0.344136 * cb - 0.714136 * cr)))
        b = min(255, max(0, round(yv + 1.772 * cb)))
        return r, g, b

    # sample one pixel inside each Y quadrant (chroma constant over the MCU)
    for (px, py), yv in zip([(2, 2), (10, 2), (2, 10), (10, 10)], ys):
        o = (py * 16 + px) * 3
        assert tuple(rgb[o : o + 3]) == expect(yv), (px, py)


def test_ac_coefficient_against_numpy_idct():
    np = pytest.importorskip("numpy")
    # one AC coefficient: zigzag k=1 -> natural position (0,1), value 30
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_codes = _canonical(DC_BITS, DC_VALS)
    ac_codes = _canonical(AC_RS_BITS, AC_RS_VALS)
    bw = _BitWriter()
    _put_dc(bw, dc_codes, 40)
    # (run 0, size 5) is not in the tiny table; encode value 1 with RS 0x01
    length, code = ac_codes[0x01]
    bw.put(code, length)
    bw.put(1, 1)  # value +1
    length, code = ac_codes[0x00]
    bw.put(code, length)  # EOB
    raw = (
        b"\xff\xd8" + _tables_segs(AC_RS_BITS, AC_RS_VALS) + sof + sos
        + bw.flush() + b"\xff\xd9"
    )
    out = decode_jpeg(raw)
    assert out is not None
    w, h, rgb = out
    # independent IDCT straight from the T.81 definition (explicit loops):
    # F[v][u] with F[0][0]=40 (DC), F[0][1]=1 (lowest horizontal AC)
    import math

    def alpha(i):
        return 1 / math.sqrt(2) if i == 0 else 1.0

    def f(y, x):
        acc = 0.0
        for (v, u), val in {(0, 0): 40.0, (0, 1): 1.0}.items():
            acc += (
                alpha(u) * alpha(v) * val
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
            )
        return max(0, min(255, round(acc / 4 + 128)))

    expected = np.array([[f(y, x) for x in range(8)] for y in range(8)])
    got = np.array(
        [rgb[(y * 8 + x) * 3] for y in range(8) for x in range(8)]
    ).reshape(8, 8)
    assert np.abs(got - expected).max() <= 1, (got, expected)
    # the AC term must actually vary along x (guards against a transposed
    # or dropped coefficient): strict inequality at the pattern extremes
    assert got[0, 0] != got[0, 7] or expected[0, 0] == expected[0, 7]


def test_envelope_rejections():
    ok = gray_jpeg(8, 8, [40])
    assert decode_jpeg(b"\x89PNG") is None
    assert decode_jpeg(ok[:20]) is None  # truncated
    # progressive: flip SOF0 -> SOF2
    prog = ok.replace(b"\xff\xc0", b"\xff\xc2")
    assert decode_jpeg(prog) is None
    # dispatch picks it up by magic
    assert decode_image_py(ok) is not None


def test_byte_stuffing_roundtrip():
    # hunt a DC value whose encoding forces an 0xFF byte somewhere: encode
    # many blocks with max-category diffs so the writer emits stuffed bytes
    raw = gray_jpeg(8 * 8, 8, [255, -255] * 4)
    out = decode_jpeg(raw)
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (64, 8)
    assert rgb[0] == _flat(255) and rgb[8 * 3] == _flat(-255)


@pytest.mark.parametrize("fmt_check", [True])
def test_extract_image_features_decodes_jpeg_end_to_end(spark, fmt_check):
    """The Spark mapInPandas chain returns REAL dims for a JPEG payload with
    no Pillow installed — the stdlib decoder ships by value in the UDF."""
    import hashlib

    from pyrecount_spark.multimodal.binary import extract_image_features

    payload = gray_jpeg(16, 8, [40, -16])
    df = spark.createDataFrame([("j1", payload)], "path string, content binary")
    row = extract_image_features(df).collect()[0]
    assert (row.width, row.height) == (16, 8)
    assert row.content_sha == hashlib.sha256(payload).hexdigest()


def test_matches_pillow_when_available():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="JPEG", quality=90)
    raw = buf.getvalue()
    out = decode_jpeg(raw)
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (40, 24)
    ours = np.frombuffer(rgb, dtype=np.uint8).reshape(24, 40, 3).astype(int)
    theirs = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB")).astype(int)
    # decoders legitimately differ by a little (IDCT + rounding choices)
    assert np.abs(ours - theirs).max() <= 2
