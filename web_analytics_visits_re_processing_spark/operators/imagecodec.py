"""Pure-Python PNG / APNG codec on stdlib ``zlib`` + numpy.

This exists so the multimodal operators (``operators/multimodal.py``)
can run REAL image transforms — decode, nearest-neighbor resize,
re-encode, animated-frame extraction — in a container that ships no
image library. Everything here follows the public W3C PNG spec
(filters §9, chunk layout §5) and the Mozilla APNG extension spec
(acTL/fcTL/fdAT); nothing is derived from the reference repo, which
has no image handling at all.

Scope (documented, checked, raised on violation):
- bit depth 8, interlace 0 (no Adam7)
- color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA)
- all five scanline filters (None/Sub/Up/Average/Paeth) on decode;
  encode always writes filter 0 (correctness over ratio)

Performance note: these functions run *inside* Arrow batches on
executors (mapInPandas) — per-image Python cost is the accepted price
of a real codec path without native libraries, and it parallelizes
with file splits exactly like a PIL/ffmpeg UDF would. Rows, not the
driver, carry the pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: color type byte -> samples per pixel (PNG spec table 11.1)
CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> color type


def _chunk(ctype: bytes, data: bytes) -> bytes:
    """Length + type + data + CRC32(type||data) — PNG chunk layout."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def iter_chunks(blob: bytes):
    """Yield ``(type, data)`` for each chunk; stops at IEND. Raises
    ``ValueError`` on a bad signature or truncated chunk."""
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    off = 8
    n = len(blob)
    while off + 8 <= n:
        (length,) = struct.unpack(">I", blob[off : off + 4])
        ctype = bytes(blob[off + 4 : off + 8])
        end = off + 8 + length
        if end + 4 > n:
            raise ValueError(f"truncated {ctype!r} chunk")
        yield ctype, blob[off + 8 : end]
        off = end + 4  # skip CRC (validity is the writer's contract)
        if ctype == b"IEND":
            return
    raise ValueError("no IEND chunk")


def parse_ihdr(data: bytes) -> tuple[int, int, int, int]:
    """IHDR data -> (width, height, bit_depth, color_type); rejects
    configurations outside the documented scope."""
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data[:13])
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    if ctype not in CHANNELS:
        raise ValueError(f"unsupported color type {ctype}")
    return w, h, depth, ctype


def _unfilter(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    """Reverse the five PNG scanline filters → (h, w, ch) uint8.

    Up/None rows are pure vector ops; Sub is a per-lane cumulative sum;
    Average/Paeth recurse on the left neighbor so they run a per-pixel
    loop (vector across channels) — exact, and images this path serves
    are Arrow-batch-sized, not driver-sized.
    """
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("decompressed length != h*(stride+1)")
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(height):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        if ftype == 0:  # None
            recon = cur
        elif ftype == 1:  # Sub: recon[x] = cur[x] + recon[x-ch]
            recon = np.cumsum(cur.reshape(width, ch), axis=0).reshape(stride) & 0xFF
        elif ftype == 2:  # Up
            recon = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = np.empty(stride, np.int64)
            left = np.zeros(ch, np.int64)
            for x in range(width):
                s = slice(x * ch, (x + 1) * ch)
                left = (cur[s] + (left + prev[s]) // 2) & 0xFF
                recon[s] = left
        elif ftype == 4:  # Paeth
            recon = np.empty(stride, np.int64)
            left = np.zeros(ch, np.int64)
            ul = np.zeros(ch, np.int64)
            for x in range(width):
                s = slice(x * ch, (x + 1) * ch)
                up = prev[s]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (cur[s] + pred) & 0xFF
                recon[s] = left
                ul = up
        else:
            raise ValueError(f"bad filter type {ftype} in row {y}")
        out[y] = recon
        prev = recon.astype(np.int64)
    return out.reshape(height, width, ch)


def decode_png(blob: bytes) -> np.ndarray:
    """Full pixel decode → (h, w, channels) uint8 array."""
    ihdr = None
    idat: list[bytes] = []
    for ctype, data in iter_chunks(blob):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(bytes(data))
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    w, h, _depth, color_type = parse_ihdr(ihdr)
    raw = zlib.decompress(b"".join(idat))
    return _unfilter(raw, w, h, CHANNELS[color_type])


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w[, ch]) uint8 → PNG bytes (filter 0, valid CRCs)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    body = np.empty((h, w * ch + 1), np.uint8)
    body[:, 0] = 0
    body[:, 1:] = np.ascontiguousarray(img, np.uint8).reshape(h, w * ch)
    idat = zlib.compress(body.tobytes(), compress_level)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample: out[j, i] = in[j*H//height, i*W//width]
    (the floor mapping — closed-form replayable, which the DuckDB
    oracle for the resize query exploits)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[ys][:, xs]


# --- APNG (animated PNG) ------------------------------------------------------


def encode_apng(frames: list[np.ndarray], compress_level: int = 6) -> bytes:
    """Frames (equal dtype/channels; per-frame dims may differ, frame 0
    sets the canvas) → APNG bytes. Full-frame updates: every fcTL is at
    offset (0,0), dispose/blend 0, delay 1/10 s — sampling only needs
    the frame payloads, not composition semantics."""
    if not frames:
        raise ValueError("need at least one frame")
    f0 = frames[0] if frames[0].ndim == 3 else frames[0][:, :, None]
    h0, w0, ch = f0.shape
    ihdr = struct.pack(">IIBBBBB", w0, h0, 8, _COLOR_TYPE[ch], 0, 0, 0)
    out = [PNG_SIG, _chunk(b"IHDR", ihdr), _chunk(b"acTL", struct.pack(">II", len(frames), 0))]
    seq = 0
    for i, fr in enumerate(frames):
        fr = fr if fr.ndim == 3 else fr[:, :, None]
        fh, fw, fch = fr.shape
        if fch != ch:
            raise ValueError("all frames must share channel count")
        fctl = struct.pack(">IIIIIHHBB", seq, fw, fh, 0, 0, 1, 10, 0, 0)
        out.append(_chunk(b"fcTL", fctl))
        seq += 1
        body = np.empty((fh, fw * fch + 1), np.uint8)
        body[:, 0] = 0
        body[:, 1:] = np.ascontiguousarray(fr, np.uint8).reshape(fh, fw * fch)
        data = zlib.compress(body.tobytes(), compress_level)
        if i == 0:
            out.append(_chunk(b"IDAT", data))
        else:
            out.append(_chunk(b"fdAT", struct.pack(">I", seq) + data))
            seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def extract_frames(blob: bytes) -> list[tuple[int, int, bytes]]:
    """APNG → ``[(width, height, standalone_png_bytes), ...]`` in frame
    order. fdAT payloads become IDAT chunks (strip the 4-byte sequence
    number — the spec-defined conversion); each frame gets its own IHDR
    with the fcTL dims, so every output is a self-contained PNG that
    ``decode_png`` (or any viewer) reads directly.

    A plain single-image PNG (no acTL/fcTL) yields one frame."""
    ihdr = None
    frames: list[dict] = []
    cur: dict | None = None
    saw_fctl = False
    for ctype, data in iter_chunks(blob):
        if ctype == b"IHDR":
            ihdr = bytes(data)
        elif ctype == b"fcTL":
            saw_fctl = True
            _seq, fw, fh = struct.unpack(">III", data[:12])
            cur = {"w": fw, "h": fh, "data": [], "declared": True}
            frames.append(cur)
        elif ctype == b"IDAT":
            if cur is None:  # plain PNG (or IDAT before any fcTL)
                w, h, _d, _c = parse_ihdr(ihdr)
                cur = {"w": w, "h": h, "data": [], "declared": False}
                frames.append(cur)
            cur["data"].append(bytes(data))
        elif ctype == b"fdAT":
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            cur["data"].append(bytes(data[4:]))
    if ihdr is None:
        raise ValueError("missing IHDR")
    # APNG allows a default image that is NOT part of the animation
    # (IDAT with no preceding fcTL while fcTLs exist) — we only emit
    # fcTL-declared frames in that case. The declared flag, not empty
    # data, identifies it: a spec-legal default image DOES carry IDAT
    # payload and must still be excluded.
    if saw_fctl:
        frames = [f for f in frames if f["declared"] and f["data"]]
    _w, _h, depth, color_type = parse_ihdr(ihdr)
    out = []
    for f in frames:
        fihdr = struct.pack(">IIBBBBB", f["w"], f["h"], depth, color_type, 0, 0, 0)
        png = (
            PNG_SIG
            + _chunk(b"IHDR", fihdr)
            + b"".join(_chunk(b"IDAT", d) for d in f["data"])
            + _chunk(b"IEND", b"")
        )
        out.append((f["w"], f["h"], png))
    return out
