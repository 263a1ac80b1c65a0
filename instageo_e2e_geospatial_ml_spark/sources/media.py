"""Container-level media metadata parsers (MP4/ISO-BMFF boxes, MP3 frame
headers) — the curation-side surface of the mp3/mp4 formats whose
SAMPLE DECODE remains an env-limited stub (no codec library in this
container, and full MPEG audio/AVC decoders are out of scope).

What a 100 TB multimodal curation pipeline actually needs from video and
audio BEFORE any decode is metadata: duration, codec identity,
resolution, sample counts, bitrate shape — to filter, dedup-by-shape,
shard, and budget decode cost. Both parsers here are real, from the
public specs (ISO/IEC 14496-12 box structure; the MPEG-1/2/2.5 Layer
I/II/III frame-header bit layout), and run inside Arrow batches via
media_metadata(). Fixtures in the tests are hand-constructed from the
same specs (no mp4/mp3 encoder exists in this container to produce
interop fixtures — documented, like jp2.py's validation note).
"""

from __future__ import annotations

from typing import Iterator

# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12)
# ---------------------------------------------------------------------------

def _iter_boxes(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(data[off : off + 4], "big")
        btype = data[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                return
            size = int.from_bytes(data[off + 8 : off + 16], "big")
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - off
        if size < hdr or off + size > end:
            return  # malformed/truncated: stop cleanly
        yield btype, off + hdr, off + size
        off += size


def parse_mp4_metadata(data: bytes) -> dict:
    """Parse the box structure of an ISO-BMFF (mp4/mov/m4a) payload into
    curation metadata: brands, movie duration, per-track codec / kind /
    dims / sample statistics. Raises ValueError if the payload is not
    ISO-BMFF at all."""
    out = {
        "major_brand": None,
        "compatible_brands": [],
        "duration_s": None,
        "timescale": None,
        "tracks": [],
        "has_fragments": False,
        "top_boxes": [],
    }
    saw_box = False
    for btype, b0, b1 in _iter_boxes(data, 0, len(data)):
        saw_box = True
        out["top_boxes"].append(btype.decode("latin1"))
        if btype == b"ftyp":
            out["major_brand"] = data[b0 : b0 + 4].decode("latin1")
            out["compatible_brands"] = [
                data[i : i + 4].decode("latin1") for i in range(b0 + 8, b1, 4)
            ]
        elif btype == b"moof":
            out["has_fragments"] = True
        elif btype == b"moov":
            _parse_moov(data, b0, b1, out)
    if not saw_box or (out["major_brand"] is None and not out["tracks"]):
        raise ValueError("not an ISO-BMFF (mp4) payload")
    return out


def _parse_moov(data: bytes, start: int, end: int, out: dict) -> None:
    for btype, b0, b1 in _iter_boxes(data, start, end):
        if btype == b"mvhd":
            ver = data[b0]
            if ver == 1:
                ts = int.from_bytes(data[b0 + 20 : b0 + 24], "big")
                dur = int.from_bytes(data[b0 + 24 : b0 + 32], "big")
            else:
                ts = int.from_bytes(data[b0 + 12 : b0 + 16], "big")
                dur = int.from_bytes(data[b0 + 16 : b0 + 20], "big")
            out["timescale"] = ts
            out["duration_s"] = round(dur / ts, 3) if ts else None
        elif btype == b"trak":
            out["tracks"].append(_parse_trak(data, b0, b1))
        elif btype == b"mvex":
            out["has_fragments"] = True


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    t = {
        "kind": None, "codec": None, "width": None, "height": None,
        "duration_s": None, "n_samples": None, "sample_bytes": None,
        "channels": None, "sample_rate": None,
    }
    for btype, b0, b1 in _iter_boxes(data, start, end):
        if btype == b"mdia":
            _parse_mdia(data, b0, b1, t)
    return t


def _parse_mdia(data: bytes, start: int, end: int, t: dict) -> None:
    timescale = None
    duration = None
    for btype, b0, b1 in _iter_boxes(data, start, end):
        if btype == b"mdhd":
            ver = data[b0]
            if ver == 1:
                timescale = int.from_bytes(data[b0 + 20 : b0 + 24], "big")
                duration = int.from_bytes(data[b0 + 24 : b0 + 32], "big")
            else:
                timescale = int.from_bytes(data[b0 + 12 : b0 + 16], "big")
                duration = int.from_bytes(data[b0 + 16 : b0 + 20], "big")
        elif btype == b"hdlr":
            handler = data[b0 + 8 : b0 + 12]
            t["kind"] = {b"vide": "video", b"soun": "audio", b"text": "text",
                         b"subt": "subtitle", b"meta": "metadata"}.get(
                handler, handler.decode("latin1", "replace")
            )
        elif btype == b"minf":
            for b2t, c0, c1 in _iter_boxes(data, b0, b1):
                if b2t == b"stbl":
                    _parse_stbl(data, c0, c1, t)
    if timescale:
        t["duration_s"] = round((duration or 0) / timescale, 3)


def _parse_stbl(data: bytes, start: int, end: int, t: dict) -> None:
    for btype, b0, b1 in _iter_boxes(data, start, end):
        if btype == b"stsd":
            n = int.from_bytes(data[b0 + 4 : b0 + 8], "big")
            if n >= 1 and b0 + 16 <= b1:
                entry_type = data[b0 + 12 : b0 + 16]
                t["codec"] = entry_type.decode("latin1")
                e0 = b0 + 16  # SampleEntry body
                if t["kind"] == "video" and e0 + 70 <= b1:
                    # VisualSampleEntry: 6 reserved + data_ref(2) + pre_defined/
                    # reserved(16) then width/height uint16
                    t["width"] = int.from_bytes(data[e0 + 24 : e0 + 26], "big")
                    t["height"] = int.from_bytes(data[e0 + 26 : e0 + 28], "big")
                elif t["kind"] == "audio" and e0 + 28 <= b1:
                    # AudioSampleEntry: 6+2 reserved, 2 version, 6 reserved,
                    # channelcount(2), samplesize(2), 4, samplerate(16.16)
                    t["channels"] = int.from_bytes(data[e0 + 16 : e0 + 18], "big")
                    t["sample_rate"] = int.from_bytes(data[e0 + 24 : e0 + 26], "big")
        elif btype == b"stsz":
            t["n_samples"] = int.from_bytes(data[b0 + 8 : b0 + 12], "big")
            fixed = int.from_bytes(data[b0 + 4 : b0 + 8], "big")
            if fixed:
                t["sample_bytes"] = fixed * (t["n_samples"] or 0)
            else:
                n = t["n_samples"] or 0
                sizes = data[b0 + 12 : b0 + 12 + 4 * n]
                t["sample_bytes"] = sum(
                    int.from_bytes(sizes[i : i + 4], "big")
                    for i in range(0, len(sizes), 4)
                )


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio) frame headers
# ---------------------------------------------------------------------------

_BITRATES_V1 = {  # kbps, layer -> index table (index 0 = free, 15 = bad)
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {  # version key -> rates
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}
_SAMPLES_PER_FRAME = {  # (version_is_v1, layer) -> samples
    (True, 1): 384, (True, 2): 1152, (True, 3): 1152,
    (False, 1): 384, (False, 2): 1152, (False, 3): 576,
}


def _skip_id3(data: bytes) -> int:
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        return 10 + size
    return 0


def parse_mp3_metadata(data: bytes, max_frames: int = 1_000_000) -> dict:
    """Walk MPEG audio frame headers: frame count, duration, bitrate
    statistics (CBR/VBR), sample rate, channel mode, layer/version.
    Raises ValueError when no valid frame sequence exists."""
    pos = _skip_id3(data)
    n = len(data)
    frames = 0
    total_kbps = 0
    kbps_seen = set()
    dur = 0.0
    meta = None
    while pos + 4 <= n and frames < max_frames:
        hdr = int.from_bytes(data[pos : pos + 4], "big")
        if (hdr >> 21) & 0x7FF != 0x7FF:
            if frames == 0:
                pos += 1  # resync until the first frame
                continue
            break
        version_bits = (hdr >> 19) & 3          # 0=2.5, 2=MPEG-2, 3=MPEG-1
        layer_bits = (hdr >> 17) & 3            # 1=III, 2=II, 3=I
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 3
        padding = (hdr >> 9) & 1
        mode = (hdr >> 6) & 3
        if version_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
            if frames == 0:
                pos += 1
                continue
            break
        layer = 4 - layer_bits                  # 1, 2, 3
        is_v1 = version_bits == 3
        kbps = (_BITRATES_V1 if is_v1 else _BITRATES_V2)[layer][br_idx]
        sr = _SAMPLE_RATES[version_bits][sr_idx]
        if layer == 1:
            flen = (12000 * kbps // sr + padding) * 4
        else:
            per = _SAMPLES_PER_FRAME[(is_v1, layer)]
            flen = per // 8 * 1000 * kbps // sr + padding
        if flen <= 4 or pos + flen > n:
            break
        frames += 1
        total_kbps += kbps
        kbps_seen.add(kbps)
        dur += _SAMPLES_PER_FRAME[(is_v1, layer)] / sr
        if meta is None:
            meta = {
                "version": {3: "MPEG-1", 2: "MPEG-2", 0: "MPEG-2.5"}[version_bits],
                "layer": layer,
                "sample_rate": sr,
                "channel_mode": ["stereo", "joint_stereo", "dual", "mono"][mode],
            }
        pos += flen
    if frames == 0 or meta is None:
        raise ValueError("no MPEG audio frames found")
    return {
        **meta,
        "n_frames": frames,
        "duration_s": round(dur, 3),
        "avg_kbps": round(total_kbps / frames, 1),
        "is_vbr": len(kbps_seen) > 1,
    }


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

MEDIA_METADATA_SCHEMA = (
    "media_id string, fmt string, ok boolean, err string, kind string, "
    "codec string, duration_s double, width int, height int, "
    "sample_rate int, channels int, n_samples long, avg_kbps double, "
    "is_vbr boolean, n_tracks int"
)


def media_metadata(df, id_col: str = "media_id", bytes_col: str = "bytes",
                   fmt_col: str = "fmt"):
    """mapInPandas metadata extraction over a (id, bytes, fmt) media table
    — each Arrow batch parses container metadata only (no sample decode),
    so the per-row cost is microseconds regardless of payload size. Rows
    that fail to parse come back ok=false with the error string (curation
    pipelines route them to quarantine rather than dying mid-scan)."""
    import pandas as pd

    def run(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(getattr(r, bytes_col))
                fmt = getattr(r, fmt_col)
                base = {
                    "media_id": getattr(r, id_col), "fmt": fmt, "ok": True,
                    "err": None, "kind": None, "codec": None,
                    "duration_s": None, "width": None, "height": None,
                    "sample_rate": None, "channels": None, "n_samples": None,
                    "avg_kbps": None, "is_vbr": None, "n_tracks": None,
                }
                try:
                    if fmt == "mp4":
                        m = parse_mp4_metadata(payload)
                        base["duration_s"] = m["duration_s"]
                        base["n_tracks"] = len(m["tracks"])
                        vids = [t for t in m["tracks"] if t["kind"] == "video"]
                        auds = [t for t in m["tracks"] if t["kind"] == "audio"]
                        if vids:
                            base["kind"] = "video"
                            base["codec"] = vids[0]["codec"]
                            base["width"] = vids[0]["width"]
                            base["height"] = vids[0]["height"]
                            base["n_samples"] = vids[0]["n_samples"]
                        elif auds:
                            base["kind"] = "audio"
                            base["codec"] = auds[0]["codec"]
                            base["sample_rate"] = auds[0]["sample_rate"]
                            base["channels"] = auds[0]["channels"]
                            base["n_samples"] = auds[0]["n_samples"]
                    elif fmt == "mp3":
                        m = parse_mp3_metadata(payload)
                        base.update(
                            kind="audio", codec=f"mp3-L{m['layer']}",
                            duration_s=m["duration_s"],
                            sample_rate=m["sample_rate"],
                            channels=1 if m["channel_mode"] == "mono" else 2,
                            n_samples=m["n_frames"], avg_kbps=m["avg_kbps"],
                            is_vbr=m["is_vbr"],
                        )
                    else:
                        raise ValueError(f"unsupported media fmt {fmt!r}")
                except Exception as e:  # quarantine, don't die
                    base["ok"] = False
                    base["err"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, MEDIA_METADATA_SCHEMA)
