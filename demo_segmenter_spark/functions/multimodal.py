"""Multimodal column plumbing (SURVEY.md §2 Layer C; driver north star
BASELINE.json:6).

Design for 100 TB: image/audio/video travel as opaque ``binary``
columns with typed metadata alongside; decode / feature-extraction
runs as Arrow-batched ``mapInPandas`` so bytes never round-trip
through Python row-at-a-time. The actual codecs (PIL/torchaudio/ffmpeg)
are NOT installed in this container, so the decode step is stubbed
behind ``DECODERS_AVAILABLE`` — the Spark-side plumbing (schema,
batching, partitioning) is real and tested with a deterministic fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

DECODERS_AVAILABLE = False
try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    DECODERS_AVAILABLE = True
except ImportError:
    pass

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, channel_mean double"
)


def decode_image(data: bytes) -> tuple[int, int, float]:
    """Real decoder — requires PIL, unavailable here by design."""
    if not DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "use fake_decode_image (deterministic stand-in) instead"
        )
    raise NotImplementedError("wire PIL decode here when codecs exist")


def fake_decode_image(data: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a decoder: derives (width, height,
    channel_mean) purely from the bytes, so tests and oracles are
    reproducible without any codec library. Rounding follows the
    repo's tie-stable EPS convention (compat.EPS[6]) so the DuckDB
    oracle of c_multimodal_features hash-matches bit for bit."""
    if not data:
        return (0, 0, 0.0)
    width = 16 + data[0] % 64
    height = 16 + data[-1] % 64
    channel_mean = round(
        sum(data[:256]) / min(len(data), 256) / 255.0 + 1e-10, 6
    )
    return (width, height, channel_mean)


def extract_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (doc_id, content_bin) → FEATURE_SCHEMA rows.
    One Arrow batch in, one out — no per-row Python/JVM crossings."""
    decode = decode_image if DECODERS_AVAILABLE else fake_decode_image
    for pdf in batches:
        meta = [decode(bytes(b)) for b in pdf["content_bin"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(bytes(b)) for b in pdf["content_bin"]],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "channel_mean": [m[2] for m in meta],
            }
        )


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """Real resize — requires PIL, unavailable here by design."""
    if not DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "the plumbing twin is frame/feature extraction below"
        )
    raise NotImplementedError("wire PIL resize here when codecs exist")


FRAME_BYTES = 256  # fake "frame" size inside a binary blob
FRAME_STRIDE = 4  # keep every 4th frame (temporal sampling)

FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_len bigint, frame_md5 string"


def sample_frames_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: video-style frame sampling over an opaque
    binary column. Each blob is treated as a sequence of FRAME_BYTES
    chunks ("frames"); every FRAME_STRIDE-th frame is emitted with its
    md5 — a deterministic stand-in for ffmpeg keyframe extraction with
    the identical Spark-side shape (binary in via Arrow, 1→many rows
    out). Real codecs slot into the loop body unchanged."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "frame_idx": [],
            "frame_len": [],
            "frame_md5": [],
        }
        for doc_id, blob in zip(pdf["doc_id"], pdf["content_bin"]):
            data = bytes(blob)
            n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                chunk = data[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_len"].append(len(chunk))
                out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int64"),
                "frame_len": pd.Series(out["frame_len"], dtype="int64"),
                "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
            }
        )
