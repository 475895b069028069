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


# --- progressive (SOF2) coverage -------------------------------------------
# The test-side encoder extends to progressive scan plans (T.81 Annex G
# spec text): DC first/refine via arithmetic point transform, AC first
# with spectral selection + EOB runs, AC refine with correction bits.
# Expected pixels come from decoding a BASELINE stream carrying the same
# quantized coefficients — the two paths must agree exactly.


def _cat(v: int) -> int:
    return abs(v).bit_length()


def _ext(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _tz(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero."""
    s = abs(v) >> al
    return s if v >= 0 else -s


def _make_huff(symbols):
    syms = sorted(set(symbols)) or [0x00]
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    codes = {s: (L, c) for c, s in enumerate(syms)}
    return bits, syms, codes


def _ops_dc1(blocks, al):
    ops, pred = [], 0
    for coef in blocks:
        v = coef[0] >> al  # arithmetic shift per spec for DC
        t = _cat(v - pred)
        ops.append(("sym", t))
        if t:
            ops.append(("bits", _ext(v - pred, t), t))
        pred = v
    return ops


def _ops_dcr(blocks, al):
    return [("bits", (coef[0] >> al) & 1, 1) for coef in blocks]


def _ops_ac1(blocks, ss, se, al):
    ops = []
    eob = 0

    def flush():
        nonlocal eob
        if eob:
            r = eob.bit_length() - 1
            ops.append(("sym", r << 4))
            if r:
                ops.append(("bits", eob - (1 << r), r))
            eob = 0

    for coef in blocks:
        band = [_tz(coef[k], al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(band) if v]
        if not nz:
            eob += 1
            continue
        flush()
        r = 0
        for i in range(nz[-1] + 1):
            v = band[i]
            if v == 0:
                r += 1
                continue
            while r >= 16:
                ops.append(("sym", 0xF0))
                r -= 16
            t = _cat(v)
            ops.append(("sym", (r << 4) | t))
            ops.append(("bits", _ext(v, t), t))
            r = 0
        if nz[-1] < len(band) - 1:
            eob += 1
    flush()
    return ops


def _ops_acr(blocks, ss, se, al):
    hist = lambda v: (abs(v) >> (al + 1)) != 0  # noqa: E731
    nb = lambda v: (abs(v) >> al) & 1  # noqa: E731
    ops = []
    eob, eob_corr = 0, []

    def flush():
        nonlocal eob, eob_corr
        if eob:
            r = eob.bit_length() - 1
            ops.append(("sym", r << 4))
            if r:
                ops.append(("bits", eob - (1 << r), r))
            for b in eob_corr:
                ops.append(("bits", b, 1))
            eob, eob_corr = 0, []

    for coef in blocks:
        band = [coef[k] for k in range(ss, se + 1)]
        newpos = [i for i, v in enumerate(band) if not hist(v) and nb(v)]
        if not newpos:
            eob += 1
            eob_corr += [nb(v) for v in band if hist(v)]
            continue
        flush()
        # pending events since the last symbol: zero-history skips and
        # correction bits, in POSITION order — a ZRL consumes exactly 16
        # zero events and the correction bits interleaved among them
        pending: list = []
        nzero = 0
        for i in range(newpos[-1] + 1):
            v = band[i]
            if hist(v):
                pending.append(("c", nb(v)))
            elif nb(v):
                assert (abs(v) >> al) == 1, "refine can only introduce ±1<<al"
                while nzero >= 16:
                    ops.append(("sym", 0xF0))
                    z = 0
                    while pending and z < 16:
                        ev = pending.pop(0)
                        if ev[0] == "z":
                            z += 1
                        else:
                            ops.append(("bits", ev[1], 1))
                    nzero -= 16
                ops.append(("sym", (nzero << 4) | 1))
                ops.append(("bits", 1 if v > 0 else 0, 1))
                for ev in pending:
                    if ev[0] == "c":
                        ops.append(("bits", ev[1], 1))
                pending, nzero = [], 0
            else:
                pending.append(("z",))
                nzero += 1
        rest = band[newpos[-1] + 1 :]
        if rest:
            eob = 1
            eob_corr = [nb(v) for v in rest if hist(v)]
    flush()
    return ops


def _emit_scan(ops, dc_scan, comp_spec, band) -> bytes:
    """DHT (tables the scan needs) + SOS + entropy body."""
    syms = [o[1] for o in ops if o[0] == "sym"]
    segs = b""
    if dc_scan:
        codes = _canonical(DC_BITS, DC_VALS)
        if syms:  # dc refine has no symbols, needs no table
            segs += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    else:
        bits, vals, codes = _make_huff(syms)
        segs += _seg(0xC4, bytes([0x11]) + bytes(bits) + bytes(vals))
    segs += _seg(0xDA, bytes([len(comp_spec) // 2]) + bytes(comp_spec) + bytes(band))
    bw = _BitWriter()
    for op in ops:
        if op[0] == "sym":
            length, code = codes[op[1]]
            bw.put(code, length)
        else:
            bw.put(op[1], op[2])
    return segs + bw.flush()


def prog_gray_jpeg(w: int, h: int, blocks, scans) -> bytes:
    """Grayscale SOF2 stream from per-block zigzag coefficients (all-1s
    quant) and a scan plan of ('dc1',al) ('dcr',al) ('ac1',ss,se,al)
    ('acr',ss,se,al) tuples."""
    out = b"\xff\xd8" + _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    for scan in scans:
        kind = scan[0]
        if kind == "dc1":
            ops = _ops_dc1(blocks, scan[1])
            out += _emit_scan(ops, True, [1, 0x00], [0, 0, scan[1]])
        elif kind == "dcr":
            ops = _ops_dcr(blocks, scan[1])
            out += _emit_scan(ops, True, [1, 0x00], [0, 0, (1 << 4) | scan[1]])
        elif kind == "ac1":
            _, ss, se, al = scan
            ops = _ops_ac1(blocks, ss, se, al)
            out += _emit_scan(ops, False, [1, 0x01], [ss, se, al])
        else:
            _, ss, se, al = scan
            ops = _ops_acr(blocks, ss, se, al)
            out += _emit_scan(ops, False, [1, 0x01], [ss, se, ((al + 1) << 4) | al])
    return out + b"\xff\xd9"


def seq_gray_jpeg_coefs(w: int, h: int, blocks) -> bytes:
    """Baseline SOF0 twin carrying the same per-block coefficients — the
    reference stream for progressive equality checks."""
    dc_codes = _canonical(DC_BITS, DC_VALS)
    ac_syms = []
    per_block = []
    for coef in blocks:
        band = coef[1:64]
        nz = [i for i, v in enumerate(band) if v]
        ops = []
        r = 0
        for i in range(nz[-1] + 1 if nz else 0):
            v = band[i]
            if v == 0:
                r += 1
                continue
            while r >= 16:
                ops.append(("sym", 0xF0))
                r -= 16
            t = _cat(v)
            ops.append(("sym", (r << 4) | t))
            ops.append(("bits", _ext(v, t), t))
            r = 0
        if not nz or nz[-1] < 62:
            ops.append(("sym", 0x00))  # EOB
        per_block.append(ops)
        ac_syms += [o[1] for o in ops if o[0] == "sym"]
    bits, vals, ac_codes = _make_huff(ac_syms)
    bw = _BitWriter()
    pred = 0
    for coef, ops in zip(blocks, per_block):
        _put_dc(bw, dc_codes, coef[0] - pred)
        pred = coef[0]
        for op in ops:
            if op[0] == "sym":
                length, code = ac_codes[op[1]]
                bw.put(code, length)
            else:
                bw.put(op[1], op[2])
    return (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0]) + bytes([1] * 64))
        + _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
        + _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )


def _blk(**kv) -> list[int]:
    """64-zero zigzag block with positional overrides: _blk(k0=40, k3=-7)."""
    b = [0] * 64
    for k, v in kv.items():
        b[int(k[1:])] = v
    return b


def test_progressive_dc_only_matches_flat():
    raw = prog_gray_jpeg(16, 8, [_blk(k0=40), _blk(k0=-16)], [("dc1", 1), ("dcr", 0)])
    out = decode_jpeg(raw)
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (16, 8)
    assert rgb[0] == _flat(40) and rgb[8 * 3] == _flat(-16)


def test_progressive_spectral_selection_matches_baseline():
    blocks = [_blk(k0=40, k1=7, k5=-12, k20=5), _blk(k0=-10, k2=3, k63=4)]
    seq = decode_jpeg(seq_gray_jpeg_coefs(16, 8, blocks))
    prog = decode_jpeg(
        prog_gray_jpeg(
            16, 8, blocks,
            [("dc1", 0), ("ac1", 1, 5, 0), ("ac1", 6, 63, 0)],
        )
    )
    assert seq is not None and prog is not None
    assert prog == seq


def test_progressive_successive_approximation_matches_baseline():
    blocks = [_blk(k0=41, k1=5, k3=-3, k7=1, k30=-9)]
    seq = decode_jpeg(seq_gray_jpeg_coefs(8, 8, blocks))
    prog = decode_jpeg(
        prog_gray_jpeg(
            8, 8, blocks,
            [("dc1", 1), ("ac1", 1, 63, 1), ("dcr", 0), ("acr", 1, 63, 0)],
        )
    )
    assert seq is not None and prog is not None
    assert prog == seq


def test_progressive_eobrun_and_refine_corrections():
    # blocks 2-4 have empty high bands -> EOB run; refine must route
    # correction bits through EOB-covered blocks too
    blocks = [
        _blk(k0=12, k1=6, k2=-5),
        _blk(k0=-8, k1=2),
        _blk(k0=30, k2=-2),
        _blk(k0=5),
    ]
    seq = decode_jpeg(seq_gray_jpeg_coefs(32, 8, blocks))
    prog = decode_jpeg(
        prog_gray_jpeg(
            32, 8, blocks,
            [("dc1", 0), ("ac1", 1, 63, 1), ("acr", 1, 63, 0)],
        )
    )
    assert seq is not None and prog is not None
    assert prog == seq


def test_progressive_zrl_long_runs():
    blocks = [_blk(k0=9, k1=4, k40=7, k62=-6)]  # gaps > 16 force ZRL
    seq = decode_jpeg(seq_gray_jpeg_coefs(8, 8, blocks))
    prog = decode_jpeg(
        prog_gray_jpeg(8, 8, blocks, [("dc1", 0), ("ac1", 1, 63, 0)])
    )
    assert seq is not None and prog is not None
    assert prog == seq


def test_progressive_envelope_rejections():
    ok = prog_gray_jpeg(8, 8, [_blk(k0=40)], [("dc1", 0), ("ac1", 1, 63, 0)])
    assert decode_jpeg(ok) is not None
    assert decode_jpeg(ok[: len(ok) - 10]) is None  # truncated mid-scan
    # sequential-style full-band scan inside SOF2 is illegal
    bad = gray_jpeg(8, 8, [40]).replace(b"\xff\xc0", b"\xff\xc2")
    assert decode_jpeg(bad) is None


def test_progressive_matches_pillow_when_available():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="JPEG", quality=90, progressive=True)
    out = decode_jpeg(buf.getvalue())
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (40, 24)
    ours = np.frombuffer(rgb, dtype=np.uint8).reshape(24, 40, 3).astype(int)
    theirs = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB")).astype(int)
    assert np.abs(ours - theirs).mean() <= 2.0


def test_progressive_color_interleaved_dc_matches_baseline():
    """3-component SOF2: one INTERLEAVED DC-first scan (MCU traversal,
    per-component predictors) + DC refine — must equal the baseline
    DC-only color stream."""
    y_dcs, cb, cr = [40, -16, 8, 0], 6, -11
    seq = decode_jpeg(color_jpeg_420(y_dcs, cb, cr))
    dc_codes = _canonical(DC_BITS, DC_VALS)
    out = b"\xff\xd8" + _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", 16, 16)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    for al in (1, None):  # dc first at Al=1, then refine Al=0
        segs = b""
        bw = _BitWriter()
        if al is not None:
            segs += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
            preds = {0: 0, 1: 0, 2: 0}
            for ci, dc in [(0, y_dcs[0]), (0, y_dcs[1]), (0, y_dcs[2]),
                           (0, y_dcs[3]), (1, cb), (2, cr)]:
                v = dc >> al
                _put_dc(bw, dc_codes, v - preds[ci])
                preds[ci] = v
            band = bytes([0, 0, al])
        else:
            for dc in y_dcs + [cb, cr]:
                bw.put(dc & 1, 1)
            band = bytes([0, 0, (1 << 4) | 0])
        segs += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + band)
        out += segs + bw.flush()
    out += b"\xff\xd9"
    prog = decode_jpeg(out)
    assert seq is not None and prog is not None
    assert prog == seq


# --- property fuzz: progressive ≡ baseline on identical coefficients -------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        blocks=st.lists(
            st.dictionaries(
                st.integers(0, 63),
                st.integers(-60, 60).filter(lambda v: v != 0),
                min_size=0,
                max_size=8,
            ),
            min_size=1,
            max_size=4,
        ),
        split=st.integers(1, 62),
        al=st.integers(0, 2),
        data=st.data(),
    )
    def test_progressive_equals_baseline_fuzz(blocks, split, al, data):
        """Any sparse coefficient set, any band split, any successive-
        approximation depth: the progressive path must reproduce the
        baseline decode bit-for-bit."""
        blks = []
        for d in blocks:
            b = [0] * 64
            for k, v in d.items():
                b[k] = v
            blks.append(b)
        w = 8 * len(blks)
        scans = [("dc1", al)]
        if al:
            scans += [("ac1", 1, split, al), ("ac1", split + 1, 63, al)]
            for a in range(al - 1, -1, -1):
                scans += [
                    ("dcr", a),
                    ("acr", 1, split, a),
                    ("acr", split + 1, 63, a),
                ]
        else:
            scans += [("ac1", 1, split, 0), ("ac1", split + 1, 63, 0)]
        seq = decode_jpeg(seq_gray_jpeg_coefs(w, 8, blks))
        prog = decode_jpeg(prog_gray_jpeg(w, 8, blks, scans))
        assert seq is not None and prog is not None
        assert prog == seq
except ImportError:  # pragma: no cover
    pass


def test_malformed_segments_return_none_not_raise():
    """Adversarial corpus bytes must FALL THROUGH (None), never raise —
    an escaped IndexError here kills the whole Spark task. Payloads are
    the reviewer repros: empty SOF, truncated DHT, short component spec,
    empty SOS, truncated DRI/DQT — sequential and progressive drivers."""
    from pyrecount_spark.multimodal.codecs import decode_image_py

    cases = [
        b"\xff\xd8\xff\xc0\x00\x02",                     # empty SOF
        b"\xff\xd8\xff\xc2\x00\x02",                     # empty SOF2
        b"\xff\xd8\xff\xc4\x00\x16" + bytes([0x00]) + bytes([5] + [0] * 15),
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x08\x00\x08\x01",  # short comp spec
        b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        b"\xff\xda\x00\x02",                             # empty SOS
        b"\xff\xd8\xff\xdd\x00\x03\x00",                 # truncated DRI
        b"\xff\xd8\xff\xdb\x00\x04\x00\x01",             # truncated DQT
        prog_gray_jpeg(8, 8, [_blk(k0=1)], [("dc1", 0)])[:40],  # cut mid-SOF2
    ]
    for payload in cases:
        assert decode_image_py(payload) is None, payload[:12].hex()
    # the dispatch-level backstop also covers decoders raising unexpectedly
    assert decode_image_py(b"\x89PNG\r\n\x1a\n" + b"\xff" * 40) is None
