"""Multimodal column handling: image/audio/video as opaque ``binary``
columns + typed metadata structs, processed with Arrow-batched
``mapInPandas``.

The Spark-side plumbing is REAL and tested — schema contracts,
partition-preserving batch iteration, UDF signatures, batch shapes —
and so are the codecs: header-level metadata parses for PNG/WAV, and
a full pure-Python PNG/APNG pixel codec (``operators/imagecodec.py``,
stdlib zlib + numpy) behind ``resize_images`` / ``sample_frames`` /
``png_pixel_stats``. No image library is required; a PIL/ffmpeg
binding would slot into the identical mapInPandas shape with lower
per-image Python cost.

Design for 100 TB of blobs:
- blobs stay OFF the driver — every transform is mapInPandas over the
  scan, and metadata-only queries prune the binary column entirely
  (columnar parquet: the blob column is never read — check
  ``ReadSchema`` in the plan).
- decode parallelism = file-split parallelism; no shuffle is
  introduced by any operator here.
- batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (default 10k) — for multi-MB blobs set it low (e.g. 32) to cap
  executor memory.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Magic prefix of the synthetic blob format: 4 bytes magic, then
# 2 bytes width, 2 bytes height (big-endian), then payload.
MAGIC = b"\x89IMG"

# Real PNG container: 8-byte signature, then the IHDR chunk whose data
# starts at offset 16 (4 length + 4 type after the signature) — width
# is bytes [16:20], height [20:24], both big-endian u32 (PNG spec §5.3,
# public W3C standard). Pure byte parsing, no codec library needed.
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, n_bytes int, format string"
)


def with_synthetic_image_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic fake 'image' blob per document: header
    (magic, width, height derived from content length) + utf-8 payload.
    Pure native expressions — this is the test-fixture generator."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    width = (n % 640 + 16).cast("int")
    height = ((n % 480) + 9).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        _int_to_be2(width),
        _int_to_be2(height),
    )
    return docs.withColumn("image", F.concat(header, payload))


def _int_to_be2(col):
    """2-byte big-endian encoding of a small int, as binary
    (4 zero-padded hex chars → 2 bytes)."""
    return F.to_binary(F.lpad(F.hex(col), 4, "0"), F.lit("hex"))


def _be_uint(slices: pd.Series, width: int) -> np.ndarray:
    """Fixed-offset byte slices → big-endian uints, one frombuffer over
    the whole batch (short/None slices decode as 0 — callers mask)."""
    fill = b"\x00" * width
    buf = b"".join(
        s if isinstance(s, (bytes, bytearray)) and len(s) == width else fill
        for s in slices
    )
    return np.frombuffer(buf, dtype=f">u{width}").astype("int64")


def decode_image_meta(docs_with_blob: DataFrame, blob_col: str = "image") -> DataFrame:
    """mapInPandas decoder: blob → typed metadata (width, height,
    size, format). One Arrow batch in, one pandas frame out — the
    shape every real codec UDF (PIL decode, ffmpeg probe) plugs into.

    Recognizes real PNG headers (pure IHDR byte parse — no codec
    library) and the synthetic fixture format. Batch internals are
    vectorized: fixed-offset ``.str`` slices + one ``frombuffer`` per
    field, no per-row lambdas over whole blobs."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            nbytes = blobs.str.len().fillna(0).to_numpy(dtype="int64")
            # Classification requires the full fixed-offset header, not
            # just the signature: a PNG-signed blob truncated before
            # the IHDR fields (len < 24) must fall through to the
            # 'unknown'/-1 convention, not decode as a 0×0 png from the
            # _be_uint zero fill. Same guard for the 8-byte synthetic
            # header.
            is_syn = (blobs.str[:4] == MAGIC).to_numpy(dtype=bool) & (nbytes >= 8)
            is_png = (blobs.str[:8] == PNG_MAGIC).to_numpy(dtype=bool) & (
                nbytes >= 24
            )
            syn_w = _be_uint(blobs.str[4:6], 2)
            syn_h = _be_uint(blobs.str[6:8], 2)
            png_w = _be_uint(blobs.str[16:20], 4)
            png_h = _be_uint(blobs.str[20:24], 4)
            width = np.select([is_png, is_syn], [png_w, syn_w], default=-1)
            height = np.select([is_png, is_syn], [png_h, syn_h], default=-1)
            fmt = np.select([is_png, is_syn], ["png", "img"], default="unknown")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "n_bytes": blobs.str.len().fillna(0).astype("int32"),
                    "format": fmt,
                }
            )

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, IMAGE_META_SCHEMA
    )


def with_png_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a REAL-format PNG container per document (signature +
    well-formed IHDR chunk + payload), dimensions derived from content
    length like the synthetic fixture. Native expressions only; the
    IHDR CRC is not computed (header parsers don't read it — payload
    validity is the codec's job, exercised with fully valid zlib PNGs
    in the pytest)."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    width = (n % 640 + 16).cast("int")
    height = ((n % 480) + 9).cast("int")
    ihdr = F.concat(
        F.to_binary(F.lit("0000000D"), F.lit("hex")),  # length 13
        F.encode(F.lit("IHDR"), "utf-8"),
        _int_to_be4(width),
        _int_to_be4(height),
        # bit depth 8, color type 2 (truecolor), compression/filter/
        # interlace 0, then a 4-byte CRC placeholder
        F.to_binary(F.lit("080200000000000000"), F.lit("hex")),
    )
    return docs.withColumn("image", F.concat(F.lit(PNG_MAGIC), ihdr, payload))


def _int_to_be4(col):
    """4-byte big-endian encoding of an int, as binary."""
    return F.to_binary(F.lpad(F.hex(col), 8, "0"), F.lit("hex"))


RESIZED_IMAGE_SCHEMA = "doc_id long, image binary, width int, height int"

FRAME_SCHEMA = "doc_id long, frame_index int, frame binary, width int, height int"


def resize_images(
    docs_with_blob: DataFrame, width: int, height: int, blob_col: str = "image"
) -> DataFrame:
    """REAL image resize, no codec library: full PNG pixel decode →
    nearest-neighbor resample → PNG re-encode, per Arrow batch on the
    executors (``operators/imagecodec.py``). Undecodable blobs yield a
    null image with -1 dims rather than failing the batch — the
    permissive-reader convention. No shuffle: parallelism = file
    splits, blobs never touch the driver."""
    from web_analytics_visits_re_processing_spark.operators.imagecodec import (
        decode_png,
        encode_png,
        resize_nearest,
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            images, ws, hs = [], [], []
            for blob in pdf[blob_col]:
                try:
                    img = resize_nearest(decode_png(blob), width, height)
                    images.append(encode_png(img))
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                except (ValueError, TypeError, zlib.error):
                    images.append(None)
                    ws.append(-1)
                    hs.append(-1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "image": images,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        work, RESIZED_IMAGE_SCHEMA
    )


def sample_frames(
    video_df: DataFrame, every_n: int = 30, blob_col: str = "video"
) -> DataFrame:
    """REAL frame sampling over APNG containers (the animated-PNG
    extension — frame payloads extracted chunk-level, fdAT→IDAT per
    spec, each sampled frame re-emitted as a standalone PNG). Keeps
    every ``every_n``-th frame starting at 0. One input row explodes
    to ceil(n_frames / every_n) output rows inside the batch — no
    Spark-side explode, no shuffle. Undecodable containers yield a
    single null-frame row with -1 dims."""
    from web_analytics_visits_re_processing_spark.operators.imagecodec import (
        extract_frames,
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, ws, hs = [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                try:
                    extracted = extract_frames(blob)
                except (ValueError, TypeError, zlib.error):
                    ids.append(doc_id)
                    idxs.append(-1)
                    frames.append(None)
                    ws.append(-1)
                    hs.append(-1)
                    continue
                for i in range(0, len(extracted), every_n):
                    fw, fh, png = extracted[i]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(png)
                    ws.append(fw)
                    hs.append(fh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return video_df.select("doc_id", blob_col).mapInPandas(work, FRAME_SCHEMA)


def png_pixel_stats(
    df: DataFrame, blob_col: str = "image", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Full pixel decode → (width, height, pixel_sum) per blob, with
    ``id_cols`` passed through. ``pixel_sum`` (Σ of every sample value,
    int64) is the decode-verification aggregate the oracle queries
    replay in closed form. Undecodable → dims/sum = -1."""
    from pyspark.sql import types as T

    from web_analytics_visits_re_processing_spark.operators.imagecodec import (
        decode_png,
    )

    schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for blob in pdf[blob_col]:
                try:
                    img = decode_png(blob)
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                    sums.append(int(img.astype(np.int64).sum()))
                except (ValueError, TypeError, zlib.error):
                    ws.append(-1)
                    hs.append(-1)
                    sums.append(-1)
            out = {c: pdf[c] for c in id_cols}
            out["width"] = pd.array(ws, dtype="int32")
            out["height"] = pd.array(hs, dtype="int32")
            out["pixel_sum"] = pd.array(sums, dtype="int64")
            yield pd.DataFrame(out)

    return df.select(*id_cols, blob_col).mapInPandas(work, schema)


def with_gradient_png(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture: a fully valid PNG per document with REAL pixel data —
    a deterministic RGB gradient ``(doc_id*7 + x*3 + y*5 + c*11) % 256``
    whose dims derive from the utf-8 text length (w = n%24+4,
    h = n%16+4). Closed-form pixels are what lets a SQL oracle verify
    a real decode→resize→re-encode round trip value-exactly."""
    from web_analytics_visits_re_processing_spark.operators.imagecodec import (
        encode_png,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                n = len(str(text).encode("utf-8"))
                w, h = n % 24 + 4, n % 16 + 4
                img = _gradient(int(doc_id), w, h)
                blobs.append(encode_png(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "image": blobs})

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "doc_id long, image binary"
    )


def with_gradient_apng(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture: a valid APNG 'video' per document — n%5+2 frames of
    w = n%12+3 × h = n%10+3, frame ``f`` pixels offset by ``f*13`` over
    the same gradient. Real container (acTL/fcTL/fdAT), real zlib
    frame payloads."""
    from web_analytics_visits_re_processing_spark.operators.imagecodec import (
        encode_apng,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                n = len(str(text).encode("utf-8"))
                w, h, nf = n % 12 + 3, n % 10 + 3, n % 5 + 2
                frames = [
                    (_gradient(int(doc_id), w, h).astype(np.int64) + f * 13) % 256
                    for f in range(nf)
                ]
                blobs.append(encode_apng([fr.astype(np.uint8) for fr in frames]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "video": blobs})

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "doc_id long, video binary"
    )


def _gradient(doc_id: int, w: int, h: int) -> "np.ndarray":
    """(h, w, 3) uint8: (doc_id*7 + x*3 + y*5 + c*11) % 256."""
    xs = 3 * np.arange(w, dtype=np.int64)[None, :, None]
    ys = 5 * np.arange(h, dtype=np.int64)[:, None, None]
    cs = 11 * np.arange(3, dtype=np.int64)[None, None, :]
    return ((doc_id * 7 + xs + ys + cs) % 256).astype(np.uint8)


# --- audio (WAV/RIFF — real container, pure byte parse) ----------------------

WAV_MAGIC = b"RIFF"

AUDIO_META_SCHEMA = (
    "doc_id long, channels int, sample_rate int, bits_per_sample int, "
    "n_bytes int, format string"
)


def _le_uint(slices: pd.Series, width: int) -> np.ndarray:
    """Little-endian counterpart of ``_be_uint`` (RIFF/WAV fields)."""
    fill = b"\x00" * width
    buf = b"".join(
        s if isinstance(s, (bytes, bytearray)) and len(s) == width else fill
        for s in slices
    )
    return np.frombuffer(buf, dtype=f"<u{width}").astype("int64")


def decode_audio_meta(docs_with_blob: DataFrame, blob_col: str = "audio") -> DataFrame:
    """WAV (RIFF/WAVE) header parse: channels @22 (LE16), sample rate
    @24 (LE32), bits/sample @34 (LE16) — canonical 44-byte PCM header
    (public RIFF spec). Same vectorized mapInPandas shape as
    ``decode_image_meta``."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            is_wav = (
                (blobs.str[:4] == WAV_MAGIC) & (blobs.str[8:12] == b"WAVE")
            ).to_numpy(dtype=bool)
            channels = np.where(is_wav, _le_uint(blobs.str[22:24], 2), -1)
            rate = np.where(is_wav, _le_uint(blobs.str[24:28], 4), -1)
            bits = np.where(is_wav, _le_uint(blobs.str[34:36], 2), -1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "channels": channels.astype("int32"),
                    "sample_rate": rate.astype("int32"),
                    "bits_per_sample": bits.astype("int32"),
                    "n_bytes": blobs.str.len().fillna(0).astype("int32"),
                    "format": np.where(is_wav, "wav", "unknown"),
                }
            )

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, AUDIO_META_SCHEMA
    )


def _int_to_le2(col):
    """2-byte little-endian: zero-padded hex, byte-swapped."""
    h = F.lpad(F.hex(col), 4, "0")
    return F.to_binary(
        F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)), F.lit("hex")
    )


def _int_to_le4(col):
    h = F.lpad(F.hex(col), 8, "0")
    return F.to_binary(
        F.concat(
            F.substring(h, 7, 2),
            F.substring(h, 5, 2),
            F.substring(h, 3, 2),
            F.substring(h, 1, 2),
        ),
        F.lit("hex"),
    )


def with_wav_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a REAL-format 44-byte-header PCM WAV per document
    (audio parameters derived from content length; utf-8 payload as
    'samples'). Native expressions only."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    channels = (n % 2 + 1).cast("int")
    rate = (8000 + (n % 8) * 4000).cast("int")
    bits = F.lit(16)
    byte_rate = (rate * channels * 2).cast("int")
    block_align = (channels * 2).cast("int")
    header = F.concat(
        F.lit(b"RIFF"),
        _int_to_le4(n + 36),
        F.lit(b"WAVE"),
        F.lit(b"fmt "),
        _int_to_le4(F.lit(16)),
        _int_to_le2(F.lit(1)),  # PCM
        _int_to_le2(channels),
        _int_to_le4(rate),
        _int_to_le4(byte_rate),
        _int_to_le2(block_align),
        _int_to_le2(bits),
        F.lit(b"data"),
        _int_to_le4(n),
    )
    return docs.withColumn("audio", F.concat(header, payload))


AUDIO_ENERGY_SCHEMA = (
    "doc_id long, n_samples long, n_windows long, peak_energy long, "
    "peak_window long, mean_energy long"
)


def decode_audio_energy(
    docs_with_blob: DataFrame,
    blob_col: str = "audio",
    window_samples: int = 64,
    header_bytes: int = 44,
) -> DataFrame:
    """PCM RMS-energy profile: parse the 16-bit little-endian sample
    stream after the 44-byte WAV header, window it ``window_samples``
    wide, and emit per-doc loudness summary — sample count, window
    count, the peak window's energy Σv² (the clipping/voice-activity
    probe), its index (first on ties), and the floored mean window
    energy. Integer end to end: energies are int64 sums of squared
    int16 samples (≤ 2³⁰ per sample, so a window needs < 2³³ samples
    to overflow — never). A trailing odd byte is dropped, the
    trailing partial window is padded with silence (zeros change no
    sum). Same Arrow-batched mapInPandas shape as the metadata
    decoders: blobs never leave the executors, the driver sees only
    the bounded summary."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_samples": [],
                "n_windows": [],
                "peak_energy": [],
                "peak_window": [],
                "mean_energy": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                payload = bytes(blob)[header_bytes:] if blob else b""
                ns = len(payload) // 2
                arr = np.frombuffer(
                    payload[: ns * 2], dtype="<i2"
                ).astype(np.int64)
                nw = -(-ns // window_samples) if ns else 0
                if nw:
                    padded = np.zeros(nw * window_samples, dtype=np.int64)
                    padded[:ns] = arr
                    energies = (
                        (padded * padded)
                        .reshape(nw, window_samples)
                        .sum(axis=1)
                    )
                    peak = int(energies.max())
                    peak_w = int(energies.argmax())  # first max
                    mean = int(energies.sum()) // nw
                else:
                    peak, peak_w, mean = 0, -1, 0
                out["doc_id"].append(doc_id)
                out["n_samples"].append(ns)
                out["n_windows"].append(nw)
                out["peak_energy"].append(peak)
                out["peak_window"].append(peak_w)
                out["mean_energy"].append(mean)
            yield pd.DataFrame(out)

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, AUDIO_ENERGY_SCHEMA
    )


AUDIO_ZCR_SCHEMA = (
    "doc_id long, n_samples long, n_sign_flips long, zcr_ppm long, "
    "peak_abs long, silence_ppm long"
)


def decode_audio_zcr(
    docs_with_blob: DataFrame,
    blob_col: str = "audio",
    header_bytes: int = 44,
) -> DataFrame:
    """PCM zero-crossing profile — the voiced/unvoiced + noise
    discriminator beside ``decode_audio_energy``'s loudness probe:
    per doc, the count of SIGN changes between consecutive 16-bit
    samples (a crossing iff exactly one of the pair is negative —
    zeros count as non-negative, a deterministic convention both
    engines replay), the rate per transition in exact ppm, the peak
    absolute sample (clipping check) and the exact-zero sample share
    (digital-silence probe). Integer end to end; same Arrow-batched
    mapInPandas shape as the other decoders — blobs never leave the
    executors."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_samples": [],
                "n_sign_flips": [],
                "zcr_ppm": [],
                "peak_abs": [],
                "silence_ppm": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                payload = bytes(blob)[header_bytes:] if blob else b""
                ns = len(payload) // 2
                arr = np.frombuffer(
                    payload[: ns * 2], dtype="<i2"
                ).astype(np.int64)
                if ns:
                    flips = int(
                        np.count_nonzero((arr[:-1] < 0) != (arr[1:] < 0))
                    )
                    peak_abs = int(np.abs(arr).max())
                    zeros = int(np.count_nonzero(arr == 0))
                    zcr = flips * 1_000_000 // max(ns - 1, 1)
                    silence = zeros * 1_000_000 // ns
                else:
                    flips, peak_abs, zcr, silence = 0, 0, 0, 0
                out["doc_id"].append(doc_id)
                out["n_samples"].append(ns)
                out["n_sign_flips"].append(flips)
                out["zcr_ppm"].append(zcr)
                out["peak_abs"].append(peak_abs)
                out["silence_ppm"].append(silence)
            yield pd.DataFrame(out)

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, AUDIO_ZCR_SCHEMA
    )


AUDIO_STEREO_SCHEMA = (
    "doc_id long, channels int, n_frames long, dc_l long, dc_r long, "
    "peak_l long, peak_r long, eq_frames long, eq_ppm long"
)


def decode_audio_stereo(
    docs_with_blob: DataFrame,
    blob_col: str = "audio",
    header_bytes: int = 44,
) -> DataFrame:
    """Per-CHANNEL PCM profile — the first decoder in the audio family
    that HONORS the container's channel-count field instead of
    treating the payload as a flat mono stream (a new decode shape:
    header-driven stride demultiplex, the layout step every real
    multi-channel audio reader performs before any DSP). Parses
    channels from the WAV fmt chunk (LE16 at byte 22 — the field
    ``with_wav_blob`` wrote), then de-interleaves: stereo frames are
    (L, R) int16 pairs at stride 2, a trailing partial FRAME is
    dropped (sample-level truncation alone is not enough once frames
    span 4 bytes); mono plays back as dual-mono (R ≡ L), the standard
    upmix convention, so every doc emits one row and the fake-stereo
    detector below reads 10⁶ for mono by construction. Per doc:
    per-channel DC offset (Σ samples — a nonzero DC means a biased
    capture chain), per-channel peak |sample| (asymmetric clipping
    check), and the L=R frame count with its exact-ppm share — the
    dual-mono / fake-stereo detector a speech-curation pipeline uses
    to avoid paying stereo storage for mono content. Integer end to
    end (int64 sums of int16); same Arrow-batched mapInPandas shape
    as the sibling decoders — blobs never leave executor batches,
    one bounded row per doc. Reference scope note: the reference
    pipeline (main.py:22-240) has no binary columns at all; this is
    north-star extension surface."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "channels": [],
                "n_frames": [],
                "dc_l": [],
                "dc_r": [],
                "peak_l": [],
                "peak_r": [],
                "eq_frames": [],
                "eq_ppm": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(blob) if blob else b""
                ch = (
                    int.from_bytes(b[22:24], "little")
                    if len(b) >= 24
                    else -1
                )
                payload = b[header_bytes:]
                ns = len(payload) // 2
                arr = np.frombuffer(
                    payload[: ns * 2], dtype="<i2"
                ).astype(np.int64)
                if ch == 2:
                    nf = ns // 2
                    left = arr[0 : 2 * nf : 2]
                    right = arr[1 : 2 * nf : 2]
                elif ch == 1:
                    nf = ns
                    left = arr
                    right = arr
                else:
                    nf = 0
                    left = right = arr[:0]
                if nf:
                    eq = int(np.count_nonzero(left == right))
                    row = (
                        int(left.sum()),
                        int(right.sum()),
                        int(np.abs(left).max()),
                        int(np.abs(right).max()),
                        eq,
                        eq * 1_000_000 // nf,
                    )
                else:
                    row = (0, 0, 0, 0, 0, 0)
                out["doc_id"].append(doc_id)
                out["channels"].append(ch)
                out["n_frames"].append(nf)
                out["dc_l"].append(row[0])
                out["dc_r"].append(row[1])
                out["peak_l"].append(row[2])
                out["peak_r"].append(row[3])
                out["eq_frames"].append(row[4])
                out["eq_ppm"].append(row[5])
            yield pd.DataFrame(out)

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, AUDIO_STEREO_SCHEMA
    )


# --- JPEG (JFIF — variable-length marker-segment walk) -----------------------

JPEG_DIMS_SCHEMA = (
    "doc_id long, width int, height int, sof_offset int, "
    "n_segments_before_sof int, format string"
)


def with_jpeg_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a REAL-structure baseline JFIF/JPEG per document, built
    from native expressions: SOI, a spec-complete 18-byte APP0/JFIF
    segment, a VARIABLE number of COM padding segments (k = n % 3
    comments of m = n % 5 + 1 bytes each — so the SOF offset differs
    per doc and a fixed-offset read cannot fake the parse), the SOF0
    frame header carrying height = n % 480 + 8 and width =
    n % 640 + 8 (big-endian, precision 8, one component), then SOS +
    the utf-8 payload as entropy-coded data + EOI. Everything a
    dimension probe must walk is real; only the entropy data is
    fake (opaque payload — the stub-the-codec, real-plumbing
    contract of this module)."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    h = (n % 480 + 8).cast("int")
    w = (n % 640 + 8).cast("int")
    k = (n % 3).cast("int")
    m = (n % 5 + 1).cast("int")
    app0 = F.concat(
        F.lit(b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00"),
        F.lit(b"\x00\x01\x00\x01\x00\x00"),
    )
    com = F.concat(
        F.lit(b"\xff\xfe"),
        _int_to_be2(m + 2),
        F.encode(F.repeat(F.lit("x"), m), "utf-8"),
    )
    coms = (
        F.when(k == 0, F.lit(b""))
        .when(k == 1, com)
        .otherwise(F.concat(com, com))
    )
    sof0 = F.concat(
        F.lit(b"\xff\xc0\x00\x0b\x08"),
        _int_to_be2(h),
        _int_to_be2(w),
        F.lit(b"\x01\x01\x11\x00"),
    )
    sos = F.lit(b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00")
    return docs.withColumn(
        "jpeg",
        F.concat(
            F.lit(b"\xff\xd8"), app0, coms, sof0, sos, payload,
            F.lit(b"\xff\xd9"),
        ),
    )


def decode_jpeg_dimensions(
    docs_with_blob: DataFrame, blob_col: str = "jpeg"
) -> DataFrame:
    """JPEG dimension probe — the fourth decode shape in this module
    and the first VARIABLE-LENGTH container walk (PNG/WAV metadata
    are fixed-offset reads; PCM is a stride demux): after SOI, hop
    marker segments by their embedded big-endian lengths until the
    frame header (SOF0 baseline / SOF2 progressive), then read
    precision, height, width — exactly how every real header prober
    (PIL, exiftool, ffprobe) finds JPEG dimensions without decoding
    a single MCU. Emits the SOF byte offset and the number of
    segments walked so the gate verifies the WALK, not just the
    endpoint (the offset varies per doc via the generator's padding
    segments). Convention: missing SOI → format 'unknown'; SOS/EOI
    or a non-FF byte before any SOF → 'corrupt'; both read -1
    dimensions. Arrow-batched mapInPandas; the per-doc loop is over
    MARKERS (a handful), never bytes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "sof_offset": [], "n_segments_before_sof": [],
                "format": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(blob) if blob else b""
                w = h = off = -1
                nseg = 0
                fmt = "unknown"
                if b[:2] == b"\xff\xd8":
                    fmt = "corrupt"
                    i = 2
                    while i + 4 <= len(b) and b[i] == 0xFF:
                        marker = b[i + 1]
                        if marker in (0xD9, 0xDA):
                            break
                        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
                        if marker in (0xC0, 0xC2) and i + 9 <= len(b):
                            h = int.from_bytes(b[i + 5 : i + 7], "big")
                            w = int.from_bytes(b[i + 7 : i + 9], "big")
                            off = i
                            fmt = (
                                "baseline" if marker == 0xC0
                                else "progressive"
                            )
                            break
                        nseg += 1
                        i += 2 + seglen
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["sof_offset"].append(off)
                out["n_segments_before_sof"].append(nseg if off >= 0 else -1)
                out["format"].append(fmt)
            yield pd.DataFrame(out)

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, JPEG_DIMS_SCHEMA
    )


# --- MP4/ISO-BMFF container walk ----------------------------------------------
#
# The fifth decode shape, and the first RECURSIVE container walk:
# JPEG's marker hop is a flat chain, but ISO base-media boxes NEST
# (moov > trak > mdia > minf > stbl > stsd), so a real prober walks a
# tree by embedded big-endian sizes. Same stub-the-codec contract as
# the rest of the module: every byte a metadata prober must touch
# (box sizes/fourccs, mvhd timescale/duration, hdlr handler, stsd
# sample-entry fourcc) is real; only mdat's media payload is opaque.

_UNITY_MATRIX = (
    b"\x00\x01\x00\x00" + b"\x00" * 12
    + b"\x00\x01\x00\x00" + b"\x00" * 12
    + b"\x40\x00\x00\x00"
)

MP4_META_SCHEMA = (
    "doc_id long, major_brand string, moov_offset long, n_top_boxes int, "
    "timescale long, duration long, duration_ms long, n_tracks int, "
    "handlers string, codecs string, status string"
)


def _mp4_trak(track_id: int, handler: bytes, codec: bytes, ts, dur):
    """One minimal-but-spec-shaped trak box (fixed 221 bytes): tkhd
    (92) + mdia(121) = mdhd(32, carries the movie timescale/duration
    columns) + hdlr(33) + minf(48) > stbl(40) > stsd(32) with one
    16-byte sample entry whose fourcc is the codec."""
    tkhd = (
        (92).to_bytes(4, "big") + b"tkhd" + b"\x00\x00\x00\x07"
        + b"\x00" * 8 + track_id.to_bytes(4, "big") + b"\x00" * 4
        + b"\x00" * 4 + b"\x00" * 8 + b"\x00" * 8
        + _UNITY_MATRIX + b"\x00" * 8
    )
    mdhd = F.concat(
        F.lit((32).to_bytes(4, "big") + b"mdhd" + b"\x00" * 12),
        _int_to_be4(ts),
        _int_to_be4(dur),
        F.lit(b"\x55\xc4\x00\x00"),  # language 'und' + pre_defined
    )
    hdlr = (
        (33).to_bytes(4, "big") + b"hdlr" + b"\x00" * 8
        + handler + b"\x00" * 12 + b"\x00"
    )
    stsd = (
        (32).to_bytes(4, "big") + b"stsd" + b"\x00" * 4
        + (1).to_bytes(4, "big")
        + (16).to_bytes(4, "big") + codec + b"\x00" * 6 + b"\x00\x01"
    )
    stbl = (40).to_bytes(4, "big") + b"stbl" + stsd
    minf = (48).to_bytes(4, "big") + b"minf" + stbl
    mdia_tail = F.concat(mdhd, F.lit(hdlr + minf))
    mdia = F.concat(F.lit((121).to_bytes(4, "big") + b"mdia"), mdia_tail)
    return F.concat(F.lit((221).to_bytes(4, "big") + b"trak" + tkhd), mdia)


def with_mp4_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a REAL-structure ISO-BMFF/MP4 per document, built from
    native expressions: ftyp (major brand isom), k = n % 3 'free'
    padding boxes of m = n % 5 + 1 bytes each (so the moov offset
    varies and a fixed-offset read cannot fake the walk), a moov
    whose mvhd carries timescale = n % 900 + 100 and duration =
    n % 9000 + 1000 and which nests t = n % 2 + 1 trak trees
    (video avc1; + audio mp4a when t = 2), and an mdat wrapping the
    utf-8 payload as opaque media data. Layout alternates per doc on
    bit 1 of n: (n >> 1) & 1 = 0 → fast-start (moov before mdat),
    1 → streaming order (mdat first) — a correct prober must WALK to
    moov, not assume it follows ftyp."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    k = (n % 3).cast("int")
    m = (n % 5 + 1).cast("int")
    t = (n % 2 + 1).cast("int")
    streaming = F.shiftright(n, 1) % 2
    ts = (n % 900 + 100).cast("int")
    dur = (n % 9000 + 1000).cast("int")

    ftyp = F.lit(
        (24).to_bytes(4, "big") + b"ftyp" + b"isom"
        + b"\x00\x00\x02\x00" + b"isom" + b"mp42"
    )
    free = F.concat(
        _int_to_be4(m + 8), F.lit(b"free"),
        F.encode(F.repeat(F.lit("x"), m), "utf-8"),
    )
    frees = (
        F.when(k == 0, F.lit(b""))
        .when(k == 1, free)
        .otherwise(F.concat(free, free))
    )
    mvhd = F.concat(
        F.lit((108).to_bytes(4, "big") + b"mvhd" + b"\x00" * 12),
        _int_to_be4(ts),
        _int_to_be4(dur),
        F.lit(
            b"\x00\x01\x00\x00" + b"\x01\x00" + b"\x00" * 10
            + _UNITY_MATRIX + b"\x00" * 24
        ),
        _int_to_be4(t + 1),  # next_track_id
    )
    trak_v = _mp4_trak(1, b"vide", b"avc1", ts, dur)
    trak_a = _mp4_trak(2, b"soun", b"mp4a", ts, dur)
    traks = F.when(t == 1, trak_v).otherwise(F.concat(trak_v, trak_a))
    moov = F.concat(_int_to_be4(t * 221 + 116), F.lit(b"moov"), mvhd, traks)
    mdat = F.concat(_int_to_be4(n + 8), F.lit(b"mdat"), payload)
    body = F.when(streaming == 1, F.concat(mdat, moov)).otherwise(
        F.concat(moov, mdat)
    )
    return docs.withColumn("mp4", F.concat(ftyp, frees, body))


def decode_mp4_container_meta(
    docs_with_blob: DataFrame, blob_col: str = "mp4"
) -> DataFrame:
    """ISO-BMFF metadata probe: walk top-level boxes by their embedded
    big-endian sizes (size 1 → 64-bit largesize follows the fourcc;
    size 0 → box extends to end of file — both spec forms the
    fixture generator never emits, pinned by hand-built pytests),
    read the major brand from ftyp, then descend moov > mvhd for
    timescale/duration (version 0 and 1 layouts) and each
    moov > trak > mdia for the hdlr handler fourcc and the first
    stsd sample-entry fourcc — what ffprobe/mp4dump do without
    touching a media sample. Emits the moov byte offset and the
    top-level box count so the gate verifies the WALK (the offset
    varies per doc via padding boxes AND the fast-start/streaming
    layout flip). Convention: no ftyp first → status 'no_ftyp';
    truncated/undersized box → 'corrupt'; numeric fields -1.
    Arrow-batched mapInPandas; per-doc loops are over BOXES, never
    payload bytes."""

    def _children(b: bytes, start: int, end: int):
        """Yield (fourcc, body_start, body_end) of boxes in a range."""
        i = start
        while i + 8 <= end:
            size = int.from_bytes(b[i : i + 4], "big")
            fourcc = b[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    raise ValueError("truncated largesize")
                size = int.from_bytes(b[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr or i + size > end:
                raise ValueError("bad box size")
            yield fourcc, i, i + hdr, i + size
            i += size

    def _first(b, start, end, fourcc):
        for fc, _off, bs, be in _children(b, start, end):
            if fc == fourcc:
                return bs, be
        return None

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(blob) if blob else b""
                brand = ""
                moov_off = -1
                n_top = 0
                ts = dur = dur_ms = -1
                handlers, codecs = [], []
                status = "ok"
                try:
                    top = list(_children(b, 0, len(b)))
                    n_top = len(top)
                    if not top or top[0][0] != b"ftyp":
                        status = "no_ftyp"
                        raise ValueError
                    brand = b[top[0][2] : top[0][2] + 4].decode("ascii", "replace")
                    for fc, off, bs, be in top:
                        if fc != b"moov":
                            continue
                        moov_off = off
                        mv = _first(b, bs, be, b"mvhd")
                        if mv:
                            v = b[mv[0]]
                            if v == 1:  # 64-bit creation/modification
                                ts = int.from_bytes(b[mv[0] + 20 : mv[0] + 24], "big")
                                dur = int.from_bytes(b[mv[0] + 24 : mv[0] + 32], "big")
                            else:
                                ts = int.from_bytes(b[mv[0] + 12 : mv[0] + 16], "big")
                                dur = int.from_bytes(b[mv[0] + 16 : mv[0] + 20], "big")
                            dur_ms = dur * 1000 // ts if ts > 0 else -1
                        for fc2, _o2, bs2, be2 in _children(b, bs, be):
                            if fc2 != b"trak":
                                continue
                            md = _first(b, bs2, be2, b"mdia")
                            if not md:
                                continue
                            hd = _first(b, md[0], md[1], b"hdlr")
                            if hd:
                                handlers.append(
                                    b[hd[0] + 8 : hd[0] + 12].decode("ascii", "replace")
                                )
                            mi = _first(b, md[0], md[1], b"minf")
                            st = mi and _first(b, mi[0], mi[1], b"stbl")
                            sd = st and _first(b, st[0], st[1], b"stsd")
                            if sd:
                                codecs.append(
                                    b[sd[0] + 12 : sd[0] + 16].decode("ascii", "replace")
                                )
                except ValueError:
                    if status == "ok":
                        status = "corrupt"
                    moov_off, ts, dur, dur_ms = -1, -1, -1, -1
                rows.append(
                    (
                        doc_id, brand, moov_off, n_top, ts, dur, dur_ms,
                        len(handlers), ",".join(handlers), ",".join(codecs),
                        status,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "major_brand", "moov_offset", "n_top_boxes",
                    "timescale", "duration", "duration_ms", "n_tracks",
                    "handlers", "codecs", "status",
                ],
            )

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, MP4_META_SCHEMA
    )


# --- EXIF/TIFF: byte-order-switching IFD walk ---------------------------------
#
# The sixth container shape and the first whose walk must SWITCH
# ENDIANNESS per file: a TIFF stream declares its own byte order in
# the first two bytes ("II" little-endian / "MM" big-endian — TIFF 6.0
# specification, the structure EXIF embeds verbatim), then magic 42
# and the offset of IFD0. Each IFD is an entry TABLE (2-byte count,
# count x 12-byte entries, 4-byte next-IFD offset, 0 = end of chain);
# each entry is (tag, type, count, value-or-offset) with values packed
# INLINE in file order when they fit 4 bytes and offset-chased
# otherwise. Same contract as the JPEG/MP4/PNG/WAV walkers: container
# plumbing is real (header probe, per-row endianness, offset chasing,
# cycle guard), media payloads stay opaque.

EXIF_META_SCHEMA = (
    "doc_id long, byte_order string, ifd0_offset long, n_chain_ifds int, "
    "n_ifd0_entries int, width long, height long, make string, iso long, "
    "exif_ifd_offset long, status string"
)

_TIFF_T_ASCII = 2
_TIFF_T_SHORT = 3
_TIFF_T_LONG = 4


def _int_to_2e(col, be_col):
    """2-byte int in per-ROW byte order (be_col true → big-endian)."""
    return F.when(be_col, _int_to_be2(col)).otherwise(_int_to_le2(col))


def _int_to_4e(col, be_col):
    return F.when(be_col, _int_to_be4(col)).otherwise(_int_to_le4(col))


def _tiff_entry(tag: int, typ: int, count, value_field, be_col):
    """One 12-byte IFD entry; ``value_field`` must already be a 4-byte
    binary column (inline value packed in file order, or an offset)."""
    return F.concat(
        _int_to_2e(F.lit(tag), be_col),
        _int_to_2e(F.lit(typ), be_col),
        _int_to_4e(
            count if not isinstance(count, int) else F.lit(count), be_col
        ),
        value_field,
    )


def _tiff_short_inline(col, be_col):
    """SHORT count=1 inline value: 2 bytes in file order, left-
    justified in the 4-byte field (TIFF 6.0 value-offset rule)."""
    return F.concat(_int_to_2e(col, be_col), F.lit(b"\x00\x00"))


def with_tiff_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a REAL-structure TIFF/EXIF per document from native
    expressions, n = octet_length(text):

    - byte order: n odd → "MM" (big-endian), even → "II" — the walk
      itself must flip all integer decoding per row;
    - pad = n % 3 junk bytes between header and IFD0, so
      ifd0_offset = 8 + pad and a walker that assumes IFD0-at-8 breaks;
    - IFD0 (4 entries): ImageWidth (LONG, n % 1000 + 1), ImageLength
      (LONG, n % 800 + 1), Make (ASCII count 6 — OUT-OF-LINE, the
      offset-chased value path: "CAM" + 2 digits + NUL at 62 + pad),
      ExifIFD pointer (LONG → 68 + pad);
    - EXIF IFD (1 entry): ISO (SHORT, n % 3200 + 100) — INLINE short,
      the left-justified-in-file-order packing rule;
    - IFD1 chained via IFD0's next-IFD field when (n >> 2) & 1 (two
      LONG entries, thumbnail dims) — the offset-chased next-IFD path;
      else next-IFD = 0.

    Every emitted field is replayable from n in SQL — the oracle's
    side of the ``exif_tiff_meta`` gate."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    be = (n % 2) == 1
    pad = n % 3
    w = (n % 1000 + 1).cast("int")
    h = (n % 800 + 1).cast("int")
    iso = (n % 3200 + 100).cast("int")
    has1 = (F.shiftright(n, 2) % 2) == 1
    p0 = F.lit(8) + pad          # IFD0 offset
    m0 = F.lit(62) + pad         # make-string offset (p0 + 54)
    x0 = F.lit(68) + pad         # EXIF IFD offset (m0 + 6)
    i1 = F.lit(86) + pad         # IFD1 offset (x0 + 18)

    header = F.concat(
        F.when(be, F.lit(b"MM")).otherwise(F.lit(b"II")),
        _int_to_2e(F.lit(42), be),
        _int_to_4e(p0, be),
    )
    junk = F.encode(F.repeat(F.lit("z"), pad), "utf-8")
    ifd0 = F.concat(
        _int_to_2e(F.lit(4), be),
        _tiff_entry(0x0100, _TIFF_T_LONG, 1, _int_to_4e(w, be), be),
        _tiff_entry(0x0101, _TIFF_T_LONG, 1, _int_to_4e(h, be), be),
        _tiff_entry(0x010F, _TIFF_T_ASCII, 6, _int_to_4e(m0, be), be),
        _tiff_entry(0x8769, _TIFF_T_LONG, 1, _int_to_4e(x0, be), be),
        F.when(has1, _int_to_4e(i1, be)).otherwise(_int_to_4e(F.lit(0), be)),
    )
    make = F.concat(
        F.lit(b"CAM"),
        F.encode((n % 90 + 10).cast("string"), "utf-8"),
        F.lit(b"\x00"),
    )
    exif_ifd = F.concat(
        _int_to_2e(F.lit(1), be),
        _tiff_entry(0x8827, _TIFF_T_SHORT, 1, _tiff_short_inline(iso, be), be),
        _int_to_4e(F.lit(0), be),
    )
    ifd1 = F.concat(
        _int_to_2e(F.lit(2), be),
        _tiff_entry(
            0x0100, _TIFF_T_LONG, 1, _int_to_4e((n % 500 + 1).cast("int"), be), be
        ),
        _tiff_entry(
            0x0101, _TIFF_T_LONG, 1, _int_to_4e((n % 400 + 1).cast("int"), be), be
        ),
        _int_to_4e(F.lit(0), be),
    )
    blob = F.concat(
        header, junk, ifd0, make, exif_ifd,
        F.when(has1, ifd1).otherwise(F.lit(b"")),
    )
    return docs.withColumn("tiff", blob)


def decode_exif_tiff_meta(
    docs_with_blob: DataFrame, blob_col: str = "tiff"
) -> DataFrame:
    """TIFF/EXIF metadata probe: read the byte-order mark, verify
    magic 42 IN THAT ORDER, chase the header's IFD0 offset, then walk
    the IFD chain (entry tables + next-IFD offsets) pulling
    ImageWidth/ImageLength (SHORT or LONG, inline), Make (ASCII,
    inline when count ≤ 4 else offset-chased) and the ExifIFD pointer,
    descending once into the EXIF IFD for ISO (SHORT). Unknown tags
    are SKIPPED (a walker that requires a fixed tag set breaks on
    real files). Defensive paths pinned by never-generated-case
    pytests: 'bad_order' (mark not II/MM), 'bad_magic', 'corrupt'
    (truncated header/IFD, entry table past EOF, out-of-range value
    offset), 'cycle' (next-IFD offset loops — visited-set guard).
    Arrow-batched mapInPandas; per-doc loops are over IFD ENTRIES
    (≤ a few dozen), never payload bytes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(blob) if blob else b""
                order = ""
                ifd0_off = -1
                n_chain = 0
                n_e0 = -1
                width = height = iso = -1
                make = ""
                exif_off = -1
                status = "ok"
                try:
                    if len(b) < 8:
                        raise ValueError("corrupt")
                    mark = b[:2]
                    if mark == b"II":
                        endi = "little"
                    elif mark == b"MM":
                        endi = "big"
                    else:
                        raise ValueError("bad_order")
                    order = mark.decode("ascii")

                    def u(off: int, w_: int) -> int:
                        if off < 0 or off + w_ > len(b):
                            raise ValueError("corrupt")
                        return int.from_bytes(b[off : off + w_], endi)

                    if u(2, 2) != 42:
                        raise ValueError("bad_magic")
                    ifd0_off = u(4, 4)

                    def entries(ifd: int):
                        cnt = u(ifd, 2)
                        if ifd + 2 + cnt * 12 + 4 > len(b):
                            raise ValueError("corrupt")
                        out = []
                        for k in range(cnt):
                            e = ifd + 2 + k * 12
                            out.append(
                                (u(e, 2), u(e + 2, 2), u(e + 4, 4), e + 8)
                            )
                        return out, u(ifd + 2 + cnt * 12, 4)

                    def scalar(typ: int, cnt: int, vf: int) -> int:
                        # inline SHORT/LONG count=1 (left-justified,
                        # file order)
                        if typ == _TIFF_T_SHORT and cnt == 1:
                            return u(vf, 2)
                        if typ == _TIFF_T_LONG and cnt == 1:
                            return u(vf, 4)
                        raise ValueError("corrupt")

                    seen: set[int] = set()
                    ifd = ifd0_off
                    while ifd != 0:
                        if ifd in seen or len(seen) > 64:
                            raise ValueError("cycle")
                        seen.add(ifd)
                        ents, nxt = entries(ifd)
                        if n_chain == 0:
                            n_e0 = len(ents)
                            for tag, typ, cnt, vf in ents:
                                if tag == 0x0100:
                                    width = scalar(typ, cnt, vf)
                                elif tag == 0x0101:
                                    height = scalar(typ, cnt, vf)
                                elif tag == 0x010F and typ == _TIFF_T_ASCII:
                                    if cnt <= 4:
                                        raw = b[vf : vf + cnt]
                                    else:
                                        off = u(vf, 4)
                                        if off + cnt > len(b):
                                            raise ValueError("corrupt")
                                        raw = b[off : off + cnt]
                                    make = raw.rstrip(b"\x00").decode(
                                        "ascii", "replace"
                                    )
                                elif tag == 0x8769:
                                    exif_off = scalar(typ, cnt, vf)
                        n_chain += 1
                        ifd = nxt
                    if exif_off >= 0:
                        ents, _nxt = entries(exif_off)
                        for tag, typ, cnt, vf in ents:
                            if tag == 0x8827:
                                iso = scalar(typ, cnt, vf)
                except ValueError as ex:
                    status = str(ex) or "corrupt"
                    if status not in ("bad_order", "bad_magic", "cycle"):
                        status = "corrupt"
                    n_chain = 0
                    n_e0 = width = height = iso = exif_off = -1
                    ifd0_off = -1
                    make = ""
                rows.append(
                    (
                        doc_id, order, ifd0_off, n_chain, n_e0, width,
                        height, make, iso, exif_off, status,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "byte_order", "ifd0_offset", "n_chain_ifds",
                    "n_ifd0_entries", "width", "height", "make", "iso",
                    "exif_ifd_offset", "status",
                ],
            )

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, EXIF_META_SCHEMA
    )
