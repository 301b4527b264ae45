"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The reference already carries image bytes + media type through its IR
(``MarkdownParser.cs:147-148`` -> SURVEY.md §1.2 ``byte[]``+string). This
module generalizes that to first-class multimodal columns for a training
-data pipeline: schema, partition-friendly feature extraction, and
decode / resize / frame-sample stages as Arrow-batched ``mapInPandas``.

The actual codec work (image decode, resampling) needs libs not present
in this container — those steps are **stubbed**: ``decode_stub`` raises
``NotImplementedError`` unless given the deterministic fake, while every
piece of Spark plumbing (schemas, batch iteration, metadata extraction,
partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # e.g. image/png
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha", T.StringType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

# decoder: (media_type, bytes) -> (width, height, feature vector)
Decoder = Callable[[str, bytes], tuple[int, int, list[float]]]


def decode_stub(media_type: str, data: bytes):  # pragma: no cover - by design
    """Real decode needs an imaging/audio lib absent from this image."""
    raise NotImplementedError(
        "media decode requires an imaging/audio library; inject fake_decoder "
        "or a real Decoder"
    )


def pil_decoder(media_type: str, data: bytes) -> tuple[int, int, list[float]]:
    """Real image decode, gated on Pillow (absent from this container —
    ``fake_decoder`` stays the oracle path). Feature: 8-d summary of the
    RGB image (per-channel mean + std, aspect ratio, mean luminance) —
    deterministic for a given image, shape-compatible with FEATURE_SCHEMA.
    """
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "Pillow not installed; inject fake_decoder (deterministic) or "
            "install Pillow for real image decode"
        ) from e
    import io

    img = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = img.size
    import numpy as np

    px = np.asarray(img, dtype=np.float64) / 255.0  # (h, w, 3)
    means = px.mean(axis=(0, 1))
    stds = px.std(axis=(0, 1))
    lum = float(0.2126 * means[0] + 0.7152 * means[1] + 0.0722 * means[2])
    feat = [*means.tolist(), *stds.tolist(), w / h if h else 0.0, lum]
    return w, h, [round(float(x), 6) for x in feat]


def bmp_pixels(data: bytes):
    """Parse an uncompressed BI_RGB 24/32-bit BMP to (w, h, uint8 HxWx3
    RGB array, top-down). Shared by the feature decoder and the
    perceptual-hash operator. Handles bottom-up/top-down rows and the
    4-byte row stride padding."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(data) < 54:  # 14-byte file header + 40-byte BITMAPINFOHEADER
        raise ValueError(f"truncated BMP header ({len(data)} bytes)")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (compression={comp}, bpp={bpp})")
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError("degenerate BMP dimensions")
    nch = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = raw.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if h_raw > 0:
        rows = rows[::-1]  # bottom-up storage -> top-down
    return w, h, rows[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB


def bmp_decoder(media_type: str, data: bytes) -> tuple[int, int, list[float]]:
    """REAL image decode with zero dependencies: uncompressed BI_RGB
    24/32-bit BMP via :func:`bmp_pixels`, so a genuine decode path
    executes in CI instead of only the deterministic fake. Feature is
    the same 8-d recipe as ``pil_decoder`` (per-channel mean + std,
    aspect ratio, mean luminance) — the two agree on the same image."""
    import numpy as np

    w, h, rgb = bmp_pixels(data)
    px = rgb.astype(np.float64) / 255.0
    means = px.mean(axis=(0, 1))
    stds = px.std(axis=(0, 1))
    lum = float(0.2126 * means[0] + 0.7152 * means[1] + 0.0722 * means[2])
    feat = [*means.tolist(), *stds.tolist(), w / h if h else 0.0, lum]
    return w, h, [round(float(x), 6) for x in feat]


def fake_decoder(media_type: str, data: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake: dimensions and an 8-d feature derived from the
    sha256 of the payload — stable plumbing tests without codecs."""
    h = hashlib.sha256(data).digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    feat = [round(b / 255.0, 6) for b in h[2:10]]
    return w, ht, feat


def binary_with_metadata(df: DataFrame, id_col: str, type_col: str, content_col: str) -> DataFrame:
    """Normalize any (id, type, bytes) DataFrame into MEDIA_SCHEMA —
    metadata (size, content hash) computed JVM-side, no Python."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(type_col).cast("string").alias("media_type"),
        F.col(content_col).cast("binary").alias("content"),
        F.coalesce(F.length(F.col(content_col)), F.lit(0)).cast("long").alias("n_bytes"),
        F.sha2(F.coalesce(F.col(content_col), F.lit(b"")), 256).alias("content_sha"),
    )


TRANSFORM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("op", T.StringType(), False),  # resize|frame_sample
        T.StructField("param", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

# transformer: (op, param, media_type, bytes) -> transformed bytes
Transformer = Callable[[str, int, str, bytes], bytes]


def transform_stub(op: str, param: int, media_type: str, data: bytes) -> bytes:  # pragma: no cover
    """Real resize/frame-sample needs an imaging/video lib (absent here)."""
    raise NotImplementedError(
        f"media transform {op!r} requires an imaging/video library; inject "
        "fake_transformer or a real Transformer"
    )


def fake_transformer(op: str, param: int, media_type: str, data: bytes) -> bytes:
    """Deterministic fake preserving the contract shape: 'resize' truncates
    payloads proportionally, 'frame_sample' keeps every param-th byte —
    stand-ins with real batch plumbing until codecs are injected."""
    if op == "resize":
        keep = max(1, len(data) * min(param, 100) // 100)
        return data[:keep]
    if op == "frame_sample":
        return data[:: max(param, 1)]
    raise ValueError(op)


def transform_media(
    media: DataFrame, op: str, param: int, transformer: Transformer = transform_stub
) -> DataFrame:
    """Resize / frame-sample stage over BINARY content (Arrow-batched
    mapInPandas; per-item error isolation -> NULL content on failure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TRANSFORM_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                out = None
                if r.content is not None:
                    try:
                        out = transformer(op, param, r.media_type, bytes(r.content))
                    except NotImplementedError:
                        raise
                    except Exception:
                        pass
                rows.append(
                    {
                        "media_id": r.media_id,
                        "media_type": r.media_type,
                        "op": op,
                        "param": param,
                        "content": out,
                        "n_bytes": len(out) if out is not None else None,
                    }
                )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return media.mapInPandas(run, schema=TRANSFORM_SCHEMA)


def extract_features(media: DataFrame, decoder: Decoder = decode_stub) -> DataFrame:
    """Decode/feature-extract stage: Arrow batches in, per-row decode,
    errors isolated per item (failed decode -> NULL feature, job survives
    — the reference's per-document error isolation applied per-media)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                width = height = None
                feat = None
                if r.content is not None:
                    try:
                        width, height, feat = decoder(r.media_type, bytes(r.content))
                    except NotImplementedError:
                        raise
                    except Exception:
                        pass  # per-item isolation
                rows.append(
                    {
                        "media_id": r.media_id,
                        "media_type": r.media_type,
                        "n_bytes": r.n_bytes,
                        "width": width,
                        "height": height,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------- audio

AUDIO_SAMPLES = 1024
AUDIO_FRAME = 256


def synth_pcm16(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic little-endian PCM16 payload per row — the audio
    twin of the BMP builder: sample_i = ((id*7 + i*13) % 4096) - 2048,
    packed into REAL int16 bytes (numpy .tobytes()) so downstream
    stages exercise a genuine binary decode, while an SQL oracle can
    recompute every sample from the closed form. Output: (media_id,
    media_type='audio/pcm16', content binary)."""
    import numpy as np
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    i = np.arange(AUDIO_SAMPLES, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "media_type": "audio/pcm16",
                    "content": [
                        ((d * 7 + i * 13) % 4096 - 2048)
                        .astype("<i2")
                        .tobytes()
                        for d in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=schema)


def pcm16_samples(data: bytes):
    """Decode a little-endian PCM16 payload to an int64 sample vector —
    the audio twin of :func:`bmp_pixels` (one shared decode helper so
    every audio feature/fingerprint stage exercises the same real
    binary path). Raises ValueError on odd-length payloads."""
    import numpy as np

    buf = bytes(data)
    if len(buf) % 2:
        raise ValueError(f"PCM16 payload has odd length {len(buf)}")
    return np.frombuffer(buf, dtype="<i2").astype(np.int64)


def pack_video_frames(frames) -> bytes:
    """Pack per-frame payloads (each an encoded still, e.g. a BMP) into
    the engine's minimal seekable video container: ``b"VID0"`` magic,
    u16 frame count, then a u32 length-prefixed payload per frame. The
    video twin of the PCM16 pack: a REAL binary format a decode bug
    cannot fake its way through, while staying zero-dependency (the
    container carries stills; real codecs would plug in behind the same
    (pack, parse) pair)."""
    import struct

    if len(frames) > 0xFFFF:
        raise ValueError(f"too many frames for u16 count: {len(frames)}")
    out = [b"VID0", struct.pack("<H", len(frames))]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(bytes(fr))
    return b"".join(out)


# Canonical video near-dup bounds — the single source of truth shared
# by the batch queries (queries/ingestq.py re-exports them as
# _V_PAIR_T/_V_DROP) and the streaming screen's verify leg
# (streaming/ingest.py). Defined HERE because this module is the only
# video module importable standalone (the queries package must load via
# all_queries() in registration order).
VIDEO_PAIR_HAMMING_T = 12  # total keyframe-Hamming bound for near-dup pairs
VIDEO_DROP_T = 4  # incremental screens: auto-drop bound


def synth_video_clip(
    doc_id: int,
    scene_cache: dict | None = None,
    *,
    frames: int = 32,
    scene: int = 8,
    groups: int = 40,
) -> bytes:
    """REAL VID0 container bytes for deterministic corpus clip
    ``doc_id`` — ``frames // scene`` scenes of ``scene`` frames each,
    gid-shared scene stills (gid = doc_id % groups), 2 per-doc pixel
    perturbations, every frame a real 8x8 24-bpp bottom-up BMP.
    Extracted from the ``_video_frame_hashes`` mapInPandas builder
    (queries/ingestq.py) so the streaming parity test can feed the
    EXACT corpus clips over the JSON/base64 wire format that
    ``streaming.ingest.stream_video_screen`` consumes. ``scene_cache``
    memoizes the gid-shared stills across calls (the builder passes one
    dict per Arrow batch so md5 work scales with groups, not rows)."""
    import struct

    import numpy as np

    def mm(s: str, mod: int) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod

    hdr = b"BM" + struct.pack("<IHHI", 54 + 192, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, 192, 2835, 2835, 0, 0
    )
    doc_id = int(doc_id)
    gid = doc_id % groups
    if scene_cache is None:
        scene_cache = {}
    if gid not in scene_cache:
        scene_cache[gid] = [
            np.array(
                [mm(f"{gid}:vs{s}:{i}", 256) for i in range(64)],
                dtype=np.int64,
            )
            for s in range(frames // scene)
        ]
    pert = [
        (
            mm(f"{doc_id}:vfp:{j}", frames),
            mm(f"{doc_id}:vpp:{j}", 64),
            mm(f"{doc_id}:vpv:{j}", 256),
        )
        for j in range(2)
    ]
    out = []
    for f in range(frames):
        g = scene_cache[gid][f // scene]
        hit = [(pp, pv) for (pf, pp, pv) in pert if pf == f]
        if hit:
            g = g.copy()
            for pp, pv in hit:
                g[pp] = pv
        # REAL bytes: 8x8 24-bpp bottom-up BMP (stride 24)
        rows = np.repeat(
            g.reshape(8, 8)[::-1].astype(np.uint8).ravel(), 3
        ).tobytes()
        out.append(hdr + rows)
    return pack_video_frames(out)  # REAL container bytes


def video_frames(data: bytes):
    """Parse a ``VID0`` container back to its list of frame payloads —
    the video twin of :func:`pcm16_samples` (one shared parse helper so
    every video feature/fingerprint stage exercises the same real
    binary path). Raises ValueError on bad magic, truncated frames, or
    trailing garbage."""
    import struct

    buf = bytes(data)
    if buf[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    if len(buf) < 6:
        raise ValueError(f"truncated VID0 header ({len(buf)} bytes)")
    (n,) = struct.unpack_from("<H", buf, 4)
    off = 6
    frames = []
    for _ in range(n):
        if off + 4 > len(buf):
            raise ValueError("truncated VID0 frame header")
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        if off + ln > len(buf):
            raise ValueError("truncated VID0 frame payload")
        frames.append(buf[off : off + ln])
        off += ln
    if off != len(buf):
        raise ValueError(f"trailing bytes after last frame: {len(buf) - off}")
    return frames


def video_keyframe_hashes(media: DataFrame, every: int = 8) -> DataFrame:
    """Keyframe fingerprints over BINARY VID0 content: parse the
    container, keep every ``every``-th frame (the frame-SAMPLE stage),
    decode each kept BMP still, and emit its exact-integer 64-bit
    average hash split as (w_lo, w_hi) with the keyframe's slot index.
    Arrow-batched mapInPandas; per-row work is bounded by the payload
    and no shuffle is introduced. Errors isolate per item (a corrupt
    container or still yields no rows, the job survives) — the video
    twin of :func:`audio_frame_features`."""
    import numpy as np
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("slot", T.IntegerType(), False),
            T.StructField("w_lo", T.LongType(), False),
            T.StructField("w_hi", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        pow2 = 1 << np.arange(32, dtype=np.int64)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.content is None:
                    continue
                try:
                    frames = video_frames(bytes(r.content))
                    for f in range(0, len(frames), every):
                        _w, _h, rgb = bmp_pixels(frames[f])
                        dec = rgb[:, :, 0].astype(np.int64).ravel()
                        bits = len(dec) * dec >= int(dec.sum())
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "slot": f // every,
                                "w_lo": int(bits[:32] @ pow2[: min(32, len(dec))]),
                                "w_hi": int(
                                    bits[32:64] @ pow2[: max(0, min(32, len(dec) - 32))]
                                ),
                            }
                        )
                except (ValueError, struct.error):
                    # Isolate the bad item, don't fail the job. The parse
                    # helpers length-guard before every unpack so a short
                    # payload raises ValueError, but struct.error stays
                    # caught as defense in depth for any unguarded offset.
                    continue
            yield (
                pd.DataFrame(rows, columns=[f.name for f in schema.fields])
                if rows
                else pd.DataFrame(columns=[f.name for f in schema.fields])
            )

    return media.mapInPandas(run, schema=schema)


def audio_frame_features(media: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """Frame-level audio features over BINARY PCM16 content: per
    ``frame``-sample frame, RMS energy (sqrt of the exact integer
    sum-of-squares / frame) and the zero-crossing count (adjacent
    sign-flip pairs inside the frame, sign(x) := x >= 0). Arrow-batched
    mapInPandas, one output row per frame — the per-row work is bounded
    by the payload size and no shuffle is introduced, so the stage
    scales exactly like the image decode. Errors isolate per item
    (odd-length or NULL payloads yield no frames, the job survives)."""
    import numpy as np
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("rms", T.DoubleType(), True),
            T.StructField("n_zero_cross", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.content is None:
                    continue
                buf = bytes(r.content)
                if len(buf) % 2:
                    continue  # not PCM16 — isolate, don't fail the job
                s = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                n_frames = len(s) // frame
                for fi in range(n_frames):
                    fr = s[fi * frame : (fi + 1) * frame]
                    sq = int((fr * fr).sum())  # exact integer
                    nz = int(((fr[1:] >= 0) != (fr[:-1] >= 0)).sum())
                    # HALF_UP on the non-negative rms, like SQL round()
                    # (Python round() is half-to-even — the EMA-parity rule)
                    rms = float(np.floor(np.sqrt(sq / frame) * 1e6 + 0.5) / 1e6)
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": fi,
                            "rms": rms,
                            "n_zero_cross": nz,
                        }
                    )
            yield (
                pd.DataFrame(rows, columns=[f.name for f in schema.fields])
                if rows
                else pd.DataFrame(columns=[f.name for f in schema.fields])
            )

    return media.mapInPandas(run, schema=schema)
