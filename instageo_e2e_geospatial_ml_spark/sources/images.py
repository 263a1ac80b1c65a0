"""Multimodal binary-column operators (image / audio / video payloads).

The images table (input_hint schema) treats payloads as opaque binary +
typed metadata. These operators run Arrow-batched over `mapInPandas` —
schema, partitioning, UDF signature and batch shape are real and tested.
JPEG (baseline, jpeg.py) and TIFF-LZW (codecs.lzw_decode) decode for REAL
with no external libraries; audio/video codecs (MP3/MP4/webp) are STUBBED
behind NotImplementedError because the container ships no such libraries
(plug a decoder into codecs.decode / _SAMPLERS to enable them).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean double, std double, p05 double, "
    "p95 double, nonzero_frac double, phash long"
)


def image_features(images: DataFrame, batch_cols: tuple[str, ...] = ()) -> DataFrame:
    """Decode → per-image statistics + perceptual hash (one Arrow pass)."""

    def feats(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(bytes(r.bytes), int(r.w), int(r.h), 1, r.fmt)
                a = arr.astype(np.float64)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(r.w),
                        "h": int(r.h),
                        "mean": round(float(a.mean()), 6),
                        "std": round(float(a.std()), 6),
                        "p05": float(np.percentile(a, 5)),
                        "p95": float(np.percentile(a, 95)),
                        "nonzero_frac": round(float((a != 0).mean()), 6),
                        "phash": codecs.phash64(arr),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "mean", "std", "p05", "p95",
                    "nonzero_frac", "phash",
                ],
            )

    return images.mapInPandas(feats, IMAGE_FEATURES_SCHEMA)


def image_embeddings(
    images: DataFrame, grid: int = 4, id_col: str = "image_id"
) -> DataFrame:
    """Deterministic visual embeddings WITHOUT any model dependency:
    decode → grid×grid mean-pooled patches → per-image z-normalization →
    flat array<float> of dim grid². This is the real Spark plumbing for a
    model-backed encoder (swap the pooling for an ONNX/torch call inside
    the same mapInPandas) and produces vectors directly consumable by the
    similarity/dedup operators (lsh_buckets, *_topk,
    embedding_neardup_pairs) — the multimodal → embedding → ANN path end
    to end, no stubs."""

    def emb(it):
        for pdf in it:
            ids, vecs = [], []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(bytes(r.bytes), int(r.w), int(r.h), 1, r.fmt)
                _b, h, w = arr.shape
                fy, fx = max(1, h // grid), max(1, w // grid)
                pooled = (
                    arr[:, : grid * fy, : grid * fx]
                    .reshape(grid, fy, grid, fx)
                    .mean(axis=(1, 3))
                    .astype(np.float64)
                    .ravel()
                )
                std = pooled.std()
                v = (pooled - pooled.mean()) / (std if std > 0 else 1.0)
                ids.append(getattr(r, id_col))
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({id_col: ids, "embedding": vecs})

    return images.mapInPandas(emb, f"{id_col} string, embedding array<float>")


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Mean-pool resize (integer factors; general resampling would need an
    image lib). Output keeps the input schema with recomputed bytes/dims."""

    def rs(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(bytes(r.bytes), int(r.w), int(r.h), 1, r.fmt)
                _b, h, w = arr.shape
                fy, fx = max(1, h // out_h), max(1, w // out_w)
                pooled = (
                    arr[:, : out_h * fy, : out_w * fx]
                    .reshape(1, out_h, fy, out_w, fx)
                    .mean(axis=(2, 4))
                )
                out = pooled.astype(arr.dtype)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codecs.encode(out, r.fmt if r.fmt.startswith("raw") else "raw"),
                        "w": out_w,
                        "h": out_h,
                        "fmt": r.fmt if r.fmt.startswith("raw") else "raw",
                        "caption": r.caption,
                        "phash": codecs.phash64(out),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    from ..synth import IMAGES_SCHEMA

    return images.mapInPandas(rs, IMAGES_SCHEMA)


# --- JPEG-2000 header parsing (S5, reference s2_utils.py:360-407) -----------

_JP2_SIG = bytes.fromhex("0000000c6a5020200d0a870a")  # JP2 signature box
_SOC = b"\xff\x4f"  # codestream start
_SIZ = b"\xff\x51"  # image/tile size marker


def parse_jp2_header(buf: bytes) -> dict:
    """Parse a JPEG-2000 header to (w, h, n_components, bit_depth) — the
    metadata the catalog/validation path needs from S2 JP2 assets, parsed
    directly from the SIZ marker (ISO 15444-1 A.5.1), no image library.
    Accepts both a raw codestream (SOC..SIZ) and a JP2 container (the
    codestream lives in the 'jp2c' box). Pixel DECODE for the S2-shaped
    subset (reversible 5/3, single tile, grayscale, LRCP) is REAL —
    jp2.jp2_decode via decode_external('jp2'); other styles raise there.
    """
    cs = buf
    if buf[:12] == _JP2_SIG:
        # walk the box structure to the jp2c (contiguous codestream) box
        off = 0
        while off + 8 <= len(buf):
            ln = int.from_bytes(buf[off : off + 4], "big")
            btype = buf[off + 4 : off + 8]
            # LBox==1: extended-length box — the real 64-bit length (XLBox)
            # follows the type, and the box header is 16 bytes (ISO 15444-1
            # I.5.1); LBox==0: box runs to EOF
            hdr = 8
            if ln == 1:
                if off + 16 > len(buf):
                    break
                ln = int.from_bytes(buf[off + 8 : off + 16], "big")
                hdr = 16
            if btype == b"jp2c":
                cs = buf[off + hdr :]
                break
            if ln == 0:
                break
            off += ln if ln >= hdr else hdr
        else:
            raise ValueError("no jp2c codestream box in JP2 container")
    if cs[:2] != _SOC:
        raise ValueError("not a JPEG-2000 codestream (missing SOC)")
    if cs[2:4] != _SIZ:
        raise ValueError("SIZ marker must immediately follow SOC")
    # SIZ segment: Lsiz(2) Rsiz(2) Xsiz(4) Ysiz(4) XOsiz(4) YOsiz(4)
    # XTsiz(4) YTsiz(4) XTOsiz(4) YTOsiz(4) Csiz(2) then per-component
    # Ssiz(1) XRsiz(1) YRsiz(1)
    p = 4
    xsiz = int.from_bytes(cs[p + 4 : p + 8], "big")
    ysiz = int.from_bytes(cs[p + 8 : p + 12], "big")
    xosiz = int.from_bytes(cs[p + 12 : p + 16], "big")
    yosiz = int.from_bytes(cs[p + 16 : p + 20], "big")
    csiz = int.from_bytes(cs[p + 36 : p + 38], "big")
    ssiz = cs[p + 38]
    return {
        "w": xsiz - xosiz,
        "h": ysiz - yosiz,
        "n_components": csiz,
        "bit_depth": (ssiz & 0x7F) + 1,
        "signed": bool(ssiz & 0x80),
    }


# --- stubbed external-format decoders --------------------------------------

def decode_external(fmt: str, payload: bytes) -> np.ndarray:
    """Dispatch for formats beyond the core raw/png/qdct set. tiff_lzw,
    jpeg, gif, png_any and webp (lossless VP8L AND lossy VP8) are REAL
    pure-Python decoders validated against independent implementations
    (javax.imageio for JPEG/PNG/GIF, the system libwebp for both WebP
    flavors); only mp3/mp4 remain documented stubs."""
    if fmt == "tiff_lzw":
        from .tiff import read_geotiff_bytes

        arr, _ = read_geotiff_bytes(payload)
        return arr[None, ...] if arr.ndim == 2 else np.moveaxis(arr, -1, 0)
    if fmt in ("jpeg", "jpg"):
        from ..jpeg import jpeg_decode

        a = jpeg_decode(payload)
        return a[None, ...] if a.ndim == 2 else np.moveaxis(a, -1, 0)
    if fmt == "gif":
        a = codecs.decode_gif(payload)  # (frames, h, w, 3)
        return np.moveaxis(a[0], -1, 0)
    if fmt == "bmp":
        a = codecs.decode_bmp(payload)
        return a[None, ...] if a.ndim == 2 else np.moveaxis(a, -1, 0)
    if fmt == "ico":
        a = codecs.decode_ico(payload)
        return a[None, ...] if a.ndim == 2 else np.moveaxis(a, -1, 0)
    if fmt == "png_any":
        a = codecs.decode_png_any(payload)
        return a[None, ...] if a.ndim == 2 else np.moveaxis(a, -1, 0)
    if fmt == "webp":
        # BOTH WebP flavors decode for real: lossless VP8L (RFC 9649,
        # bit-exact vs system libwebp) and lossy VP8 key frames (RFC 6386,
        # vp8.py — bit-exact YUV vs libwebp, non-normative RGB conversion)
        from ..webp import webp_decode

        return np.moveaxis(webp_decode(payload), -1, 0)
    if fmt in ("jp2", "j2k"):
        # real from-scratch T.800 codec (jp2.py): 5/3 and 9/7, single- or
        # multi-tile, 1..255 components; remaining coding styles raise a
        # descriptive NotImplementedError inside
        from ..jp2 import jp2_decode

        return jp2_decode(payload)[None, ...]
    if fmt in ("mp3", "wav", "flac"):
        raise NotImplementedError(
            f"audio fmt={fmt!r}: sample decode needs a codec library this "
            "container lacks (and ships no validator to pin a from-scratch "
            "decoder against — see COVERAGE.md round-6 note); container/"
            "frame METADATA extraction is real — "
            "sources/media.parse_mp3_metadata / media_metadata()"
        )
    if fmt in ("mp4", "webm"):
        raise NotImplementedError(
            f"video fmt={fmt!r}: sample decode needs a codec library this "
            "container lacks; ISO-BMFF box METADATA extraction is real — "
            "sources/media.parse_mp4_metadata / media_metadata()"
        )
    raise NotImplementedError(fmt)


def _deterministic_frames(video_id: str, n_frames: int, w: int, h: int) -> np.ndarray:
    """Deterministic fake video frames (stand-in for a real mp4 decoder) so
    the frame-sampling plumbing is testable end to end."""
    seed = int.from_bytes(hashlib.md5(video_id.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (1, h, w), dtype=np.uint16)
    drift = np.arange(n_frames, dtype=np.uint16)[:, None, None] * 3
    return ((base + drift) % 256).astype(np.uint16)


FRAME_SCHEMA = "video_id string, frame_idx int, bytes binary, w int, h int, fmt string"


def sample_video_frames(
    videos: DataFrame, every_n: int = 10, fake_decode: bool = True,
    n_frames: int = 100, w: int = 64, h: int = 64,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame. With
    fake_decode=True (default in this container) frames come from the
    deterministic stand-in generator; otherwise decode_external raises
    until a real decoder is registered."""

    def sample(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt == "gif":
                    # REAL multi-frame decode (codecs.decode_gif): animated
                    # GIF frames -> luminance uint16
                    rgb = codecs.decode_gif(bytes(r.bytes))
                    frames = rgb.mean(axis=3).astype(np.uint16)
                elif fake_decode:
                    frames = _deterministic_frames(r.video_id, n_frames, w, h)
                else:
                    frames = decode_external(r.fmt, bytes(r.bytes))
                for i in range(0, frames.shape[0], every_n):
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": i,
                            "bytes": codecs.encode(frames[i : i + 1], "raw"),
                            "w": frames.shape[2],
                            "h": frames.shape[1],
                            "fmt": "raw",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "bytes", "w", "h", "fmt"]
            )

    return videos.mapInPandas(sample, FRAME_SCHEMA)


AUG_SCHEMA = "image_id string, aug string, bytes binary, w int, h int, fmt string"

_AUGS = ("identity", "hflip", "vflip", "rot90", "rot180", "rot270")


def augment_images(
    images: DataFrame, augs: tuple[str, ...] = ("hflip", "rot90")
) -> DataFrame:
    """Deterministic geometric augmentation: one output row per (image,
    aug) with REAL pixel transforms (numpy flips/rotations over the
    decoded array — no external libs needed). The standard train-time
    augmentation set; deterministic so augmented datasets are
    reproducible and resumable (same keys on re-run)."""
    bad = set(augs) - set(_AUGS)
    if bad:
        raise ValueError(f"unknown augs {bad}; available: {_AUGS}")

    def apply(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(bytes(r.bytes), r.w, r.h, 1, r.fmt)
                for a in augs:
                    if a == "identity":
                        out = arr
                    elif a == "hflip":
                        out = arr[:, :, ::-1]
                    elif a == "vflip":
                        out = arr[:, ::-1, :]
                    elif a == "rot90":
                        out = np.rot90(arr, 1, axes=(1, 2))
                    elif a == "rot180":
                        out = np.rot90(arr, 2, axes=(1, 2))
                    else:  # rot270
                        out = np.rot90(arr, 3, axes=(1, 2))
                    rows.append(
                        {
                            "image_id": f"{r.image_id}#{a}",
                            "aug": a,
                            "bytes": codecs.encode(np.ascontiguousarray(out), "raw"),
                            "w": out.shape[2],
                            "h": out.shape[1],
                            "fmt": "raw",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "aug", "bytes", "w", "h", "fmt"]
            )

    return images.mapInPandas(apply, AUG_SCHEMA)


def phash_table(images: DataFrame) -> DataFrame:
    """(image_id, phash): 64-bit perceptual hash per image (decode +
    DCT-free mean-hash in codecs.phash64) — one mapInPandas pass; the
    downstream near-dup join is pure JVM."""

    def hashes(it):
        for pdf in it:
            ids, hs = [], []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(bytes(r.bytes), r.w, r.h, 1, r.fmt)
                ids.append(r.image_id)
                # int64 view: Spark has no unsigned 64-bit
                hs.append(np.int64(np.uint64(codecs.phash64(arr))))
            yield pd.DataFrame({"image_id": ids, "phash": hs})

    return images.mapInPandas(hashes, "image_id string, phash long")


def phash_neardup_pairs(
    images: DataFrame, max_hamming: int = 8, max_bucket: int = 10_000
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance:
    one decode+hash pass (phash_table), then the exact pigeonhole
    block join over the hash column (hamming_neardup_pairs).
    Returns (id_a, id_b, hamming)."""
    ph = phash_table(images).localCheckpoint(eager=False)
    return hamming_neardup_pairs(ph, max_hamming=max_hamming, max_bucket=max_bucket)


def hamming_neardup_pairs(
    ph: DataFrame,
    max_hamming: int = 8,
    max_bucket: int = 10_000,
    id_col: str = "image_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate pairs over a 64-bit hash column — EXACT for the
    given threshold: the hash splits into (max_hamming + 1) blocks, so
    any pair within Hamming distance max_hamming shares at least one
    identical block (pigeonhole); the block equi-join generates
    candidates and bit_count(a XOR b) refines — all JVM. max_bucket
    drops degenerate blocks (e.g. all-black thumbnails), the LSH
    skew-guard pattern. This is the north-star per-row `phash:int64`
    column join (the table shape in BASELINE.json input_hint); feed it
    phash_table(images) to go from pixels. Returns (id_a, id_b, hamming)."""
    from pyspark.sql import functions as F

    ph = ph.select(F.col(id_col).alias("image_id"), F.col(hash_col).alias("phash"))
    n_blocks = max_hamming + 1
    if n_blocks > 64:
        raise ValueError("max_hamming must be < 64")
    # evenly-distributed block boundaries: every block is non-empty (a
    # fixed width of ceil(64/n) would leave trailing blocks empty — an
    # empty block has a constant key, i.e. one all-pairs bucket)
    bounds = [round(i * 64 / n_blocks) for i in range(n_blocks + 1)]
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.expr(
                    f"shiftright(phash, {bounds[b]}) & "
                    f"{(1 << (bounds[b + 1] - bounds[b])) - 1}"
                ).alias("key"),
            )
            for b in range(n_blocks)
        ]
    )
    banded = ph.select("image_id", "phash", F.inline(blocks))
    sizes = banded.groupBy("blk", "key").agg(F.count(F.lit(1)).alias("_n"))
    banded = banded.join(
        F.broadcast(sizes.filter(F.col("_n") > max_bucket)),
        ["blk", "key"],
        "left_anti",
    )
    a = banded.select(
        F.col("image_id").alias("id_a"), F.col("phash").alias("pa"), "blk", "key"
    )
    b = banded.select(
        F.col("image_id").alias("id_b"), F.col("phash").alias("pb"), "blk", "key"
    )
    pairs = (
        a.join(b, ["blk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# --- audio plumbing (PCM payloads; real numpy compute, no external libs) ----

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, n_samples long, rms double, peak long, zcr double"
)


def synth_audio_pdf(audio_ids: list[str], n_samples: int = 16000) -> pd.DataFrame:
    """Deterministic 16-bit mono PCM stand-ins (seeded per id): a few
    summed sinusoids + noise — enough structure that features are
    meaningful and reproducible."""
    rows = []
    for aid in audio_ids:
        seed = int.from_bytes(hashlib.md5(aid.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        t = np.arange(n_samples, dtype=np.float64)
        f1, f2 = rng.uniform(50, 400), rng.uniform(400, 3000)
        wave = (
            0.6 * np.sin(2 * np.pi * f1 * t / 16000.0)
            + 0.3 * np.sin(2 * np.pi * f2 * t / 16000.0)
            + 0.1 * rng.standard_normal(n_samples)
        )
        pcm = np.clip(wave * 20000.0, -32768, 32767).astype("<i2")
        rows.append(
            {"audio_id": aid, "bytes": pcm.tobytes(), "sr": 16000, "fmt": "pcm16"}
        )
    return pd.DataFrame(rows, columns=["audio_id", "bytes", "sr", "fmt"])


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip features straight off the PCM bytes (RMS energy, integer
    peak, zero-crossing rate) — the cheap audio quality/VAD gates a
    training pipeline applies before any model. Encoded formats (mp3/flac)
    raise via decode_external until a decoder is registered."""

    def feats(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "pcm16":
                    decode_external(r.fmt, bytes(r.bytes))  # raises (stub)
                x = np.frombuffer(bytes(r.bytes), dtype="<i2").astype(np.float64)
                zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append(
                    {
                        "audio_id": r.audio_id,
                        "n_samples": len(x),
                        "rms": round(float(np.sqrt((x * x).mean())), 6),
                        "peak": int(np.abs(x).max()),
                        "zcr": round(zc / max(len(x) - 1, 1), 6),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "n_samples", "rms", "peak", "zcr"]
            )

    return audio.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


def audio_windows(
    audio: DataFrame, window_samples: int = 4000, hop_samples: int = 4000
) -> DataFrame:
    """Split clips into fixed windows (the frame-sampling analogue for the
    audio modality): one row per window with its own PCM payload."""

    def wins(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                x = np.frombuffer(bytes(r.bytes), dtype="<i2")
                for i, s in enumerate(range(0, len(x) - window_samples + 1, hop_samples)):
                    rows.append(
                        {
                            "audio_id": r.audio_id,
                            "win_idx": i,
                            "bytes": x[s : s + window_samples].tobytes(),
                            "sr": int(r.sr),
                            "fmt": "pcm16",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["audio_id", "win_idx", "bytes", "sr", "fmt"]
            )

    return audio.mapInPandas(wins, "audio_id string, win_idx int, bytes binary, sr int, fmt string")


def wav_encode(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """16-bit PCM mono/stereo → RIFF/WAVE container ((n,) or (n, ch)
    int16). The standard uncompressed audio interchange format."""
    import struct

    x = np.asarray(pcm, dtype="<i2")
    ch = 1 if x.ndim == 1 else x.shape[1]
    data = x.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → ((n,) or (n, ch) int16, sample_rate). PCM (format 1)
    16-bit only; compressed WAV variants raise."""
    import struct

    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE", "not a WAV"
    pos = 12
    sr = ch = bits = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", chunk[:16])
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("PCM 16-bit WAV only")
        elif tag == b"data":
            data = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    assert data is not None and sr is not None, "missing fmt/data chunk"
    x = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        x = x.reshape(-1, ch)
    return x, sr


# --- G.711 companding (mu-law / A-law) — real telephony PCM ------------------

def mulaw_encode(pcm: np.ndarray) -> bytes:
    """16-bit linear PCM → G.711 μ-law bytes (ITU-T G.711 segmented
    approximation, the exact table javax.sound implements)."""
    x = np.asarray(pcm, dtype=np.int64)
    BIAS, CLIP = 0x84, 32635
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), CLIP) + BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()


def mulaw_decode(buf: bytes) -> np.ndarray:
    u = ~np.frombuffer(buf, dtype=np.uint8).astype(np.int64) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> bytes:
    """16-bit linear PCM → G.711 A-law bytes (the classic segmented
    algorithm on 13-bit magnitudes, even-bit inversion mask)."""
    x = np.asarray(pcm, dtype=np.int64) >> 3  # 13-bit domain
    mask = np.where(x >= 0, 0xD5, 0x55)
    m = np.where(x >= 0, x, -x - 1)
    # segment = index of the first boundary >= m over
    # {0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF}
    seg = np.searchsorted(
        np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]), m, "left"
    )
    seg = np.minimum(seg, 7)
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((m >> shift) & 0x0F)
    return ((aval ^ mask) & 0xFF).astype(np.uint8).tobytes()


def alaw_decode(buf: bytes) -> np.ndarray:
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.int64) ^ 0x55
    seg = (a >> 4) & 0x07
    # the <<4 plus segment offsets bake the 13->16-bit scaling in (g711
    # convention) — no further shift
    t = ((a & 0x0F) << 4) + 8
    t = np.where(seg >= 1, t + 0x100, t)
    t = np.where(seg > 1, t << np.maximum(seg - 1, 0), t)
    return np.where(a & 0x80, t, -t).astype(np.int16)


def build_overviews(
    images: DataFrame, max_level: int = 3
) -> DataFrame:
    """COG-style overview pyramid: for each image, emit reduced-resolution
    levels 1..max_level, level L being a 2^L x 2^L integer box filter of
    the BASE image (dimensions floor-cropped to a multiple of the factor
    first, GDAL's `gdaladdo -r average` shape). The average rounds
    half-up in integer arithmetic ((block_sum + f²/2) // f²) — bit-exact
    regardless of partitioning or build order, unlike a cascade of
    float means whose rounding would depend on the level chain.

    Pixels stay inside the Arrow batch (mapInPandas, numpy reshape-sum
    kernel); one input row fans out to max_level small rows, so the
    operator is embarrassingly parallel and shuffle-free. At 100 TB the
    natural composition is build_overviews -> skew.write_clustered
    keyed by (tile, level): overview scans then prune to one file span
    per zoom, the map-pyramid serving layout.
    """
    import hashlib

    def build(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(bytes(r.bytes), int(r.w), int(r.h), 1, r.fmt)
                bands, h, w = arr.shape
                base = arr.astype(np.uint32)
                for lvl in range(1, max_level + 1):
                    f = 1 << lvl
                    oh, ow = h // f, w // f
                    if oh == 0 or ow == 0:
                        break
                    s = (
                        base[:, : oh * f, : ow * f]
                        .reshape(bands, oh, f, ow, f)
                        .sum(axis=(2, 4), dtype=np.uint64)
                    )
                    red = ((s + f * f // 2) // (f * f)).astype(arr.dtype)
                    payload = codecs.encode_raw(red)
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "level": lvl,
                            "w": ow,
                            "h": oh,
                            "px_sum": int(red.sum(dtype=np.uint64)),
                            "digest": hashlib.md5(payload).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "level", "w", "h", "px_sum", "digest"],
            )

    return images.mapInPandas(
        build,
        "image_id string, level int, w int, h int, px_sum long, digest string",
    )


def audio_frame_energy(
    pcm: "np.ndarray", frame: int = 160
) -> "np.ndarray":
    """Per-frame energy of 16-bit mono PCM: int64 Σ x² over consecutive
    `frame`-sample windows (trailing partial frame dropped) — the
    primitive behind VAD/silence trimming and loudness normalization in
    audio-dataset curation. Exact integer (max |x| = 32768 → frame sums
    bounded by 160·2³⁰ ≪ 2⁶³)."""
    x = np.asarray(pcm, dtype=np.int64)
    n = (len(x) // frame) * frame
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    return (x[:n] ** 2).reshape(-1, frame).sum(axis=1)


def silence_runs(
    energy: "np.ndarray", threshold: int
) -> list[tuple[int, int]]:
    """Maximal runs of frames with energy < threshold → [(start_frame,
    n_frames)] — the trim/segment boundaries."""
    runs = []
    start = None
    for i, e in enumerate(list(energy) + [None]):
        quiet = e is not None and int(e) < threshold
        if quiet and start is None:
            start = i
        elif not quiet and start is not None:
            runs.append((start, i - start))
            start = None
    return runs
