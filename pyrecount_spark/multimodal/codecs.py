"""Pure-stdlib media codecs for the multimodal decode chain.

The executor-side decode order in ``multimodal.binary`` is:
PIL (when installed) → THESE decoders → deterministic content-hash fake.
PNG (8-bit non-interlaced), binary PPM, and uncompressed 24-bit BMP decode
to real RGB pixels with nothing but ``zlib``/``struct``; WAV parses with
the stdlib ``wave`` module. That makes the "real decode" branch genuinely
executable — and testable — on codec-less containers, not a stub waiting
for Pillow.

These are correctness-first reference decoders (per-byte unfiltering
loops); production throughput comes from PIL/libvips sitting ahead of
them in the chain. Returns are ``None`` for any payload outside the
supported envelope so the caller can fall through.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(raw: bytes) -> tuple[int, int, bytes] | None:
    """8-bit, non-interlaced gray / RGB / gray+alpha / RGBA → (w, h, rgb)."""
    if not raw.startswith(_PNG_MAGIC):
        return None
    pos, w, h, bit, color, interlace = 8, None, None, None, None, None
    idat = bytearray()
    while pos + 8 <= len(raw):
        ln = int.from_bytes(raw[pos : pos + 4], "big")
        typ = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            if ln < 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit, color, interlace = data[8], data[9], data[12]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    ch = _PNG_CHANNELS.get(color)
    if not w or not h or bit != 8 or interlace != 0 or ch is None:
        return None
    try:
        flat = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(flat) < h * (stride + 1):
        return None
    out = bytearray(h * stride)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        f = flat[p]
        line = bytearray(flat[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 255
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 255
        elif f != 0:
            return None
        out[y * stride : (y + 1) * stride] = line
        prev = line
    # normalize to 3-channel RGB
    if ch == 3:
        rgb = bytes(out)
    elif ch == 4:
        rgb = bytes(b for i in range(0, len(out), 4) for b in out[i : i + 3])
    elif ch == 1:
        rgb = bytes(b for v in out for b in (v, v, v))
    else:  # gray + alpha
        rgb = bytes(
            b for i in range(0, len(out), 2) for b in (out[i], out[i], out[i])
        )
    return w, h, rgb


def decode_ppm(raw: bytes) -> tuple[int, int, bytes] | None:
    """Binary PPM (P6), maxval ≤ 255 → (w, h, rgb)."""
    if not raw.startswith(b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(raw):
        c = raw[i : i + 1]
        if c == b"#":
            while i < len(raw) and raw[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(raw) and not raw[j : j + 1].isspace():
                j += 1
            tokens.append(raw[i:j])
            i = j
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval > 255:
        return None
    pixels = raw[i + 1 : i + 1 + w * h * 3]  # single whitespace after maxval
    if len(pixels) < w * h * 3:
        return None
    return w, h, bytes(pixels)


def decode_bmp(raw: bytes) -> tuple[int, int, bytes] | None:
    """Uncompressed (BI_RGB) 24-bit BMP → (w, h, rgb). Handles 4-byte row
    padding and bottom-up vs top-down row order; BGR → RGB swap."""
    if len(raw) < 54 or not raw.startswith(b"BM"):
        return None
    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        return None
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h_signed == 0:
        return None
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    if len(raw) < data_off + stride * h:
        return None
    rgb = bytearray(w * h * 3)
    for row in range(h):
        # positive height = bottom-up storage
        src_row = (h - 1 - row) if h_signed > 0 else row
        base = data_off + src_row * stride
        for x in range(w):
            b, g, r = raw[base + 3 * x : base + 3 * x + 3]
            o = (row * w + x) * 3
            rgb[o], rgb[o + 1], rgb[o + 2] = r, g, b
    return w, h, bytes(rgb)


def decode_image_py(raw: bytes) -> tuple[int, int, bytes] | None:
    """Magic-byte dispatch over the pure-stdlib decoders."""
    for dec in (decode_png, decode_ppm, decode_bmp):
        out = dec(raw)
        if out is not None:
            return out
    return None


def resize_nearest(
    rgb: bytes, w: int, h: int, dw: int, dh: int
) -> bytes:
    """Nearest-neighbor resample of packed RGB bytes (numpy index map —
    vectorized, deterministic; the PIL-less real-pixel resize path)."""
    import numpy as np

    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(dh) * h) // dh
    xs = (np.arange(dw) * w) // dw
    return arr[ys][:, xs].tobytes()


def parse_wav(raw: bytes) -> dict | None:
    """RIFF/WAV via the stdlib ``wave`` module → sample_rate, n_channels,
    sample_width, n_frames, and exact integer q15 RMS for PCM16."""
    try:
        with wave.open(io.BytesIO(raw), "rb") as wf:
            rate = wf.getframerate()
            channels = wf.getnchannels()
            width = wf.getsampwidth()
            n_frames = wf.getnframes()
            frames = wf.readframes(n_frames)
    except (wave.Error, EOFError, struct.error):
        return None
    rms_q15 = None
    if width == 2 and frames:
        import numpy as np

        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        rms_q15 = int(round(float(np.sqrt(np.mean(samples * samples)))))
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "sample_width": width,
        "n_frames": n_frames,
        "rms_q15": rms_q15,
    }
