"""Multimodal span processing — media spans as opaque references with typed
metadata (BASELINE.json input_hint: interleaved text + media documents).

The container ships no image/audio codecs, so the *decode* step is a
clearly-marked stub (`decode_media`), while everything Spark-side — the
explode of media spans, the Arrow `mapInPandas` batch shape, the schema,
the partitioning — is real and tested. Swap `_fake_feature` for a real
decoder on a cluster with codecs installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_uid string, span_idx int, kind string, media_ref string, "
    "feat_bytes bigint, feat_hash string"
)


def media_spans(docs: DataFrame) -> DataFrame:
    """Explode media (non-text) spans with their position — pure built-ins."""
    return (
        docs.select("doc_uid", F.posexplode("spans").alias("span_idx", "span"))
        .filter(F.col("span.kind") != "text")
        .select(
            "doc_uid",
            "span_idx",
            F.col("span.kind").alias("kind"),
            F.col("span.media_ref").alias("media_ref"),
        )
    )


def decode_media(real: bool = False):
    """Return the batch decode fn. With ``real=True`` raises — codecs are
    not available in this container (documented stub)."""
    if real:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "container; wire a real decoder here on a full cluster"
        )

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # deterministic fake: byte count and content hash derived from
            # the reference string itself (stands in for decoded payload)
            refs = pdf["media_ref"].astype(str)
            out = pd.DataFrame(
                {
                    "doc_uid": pdf["doc_uid"],
                    "span_idx": pdf["span_idx"],
                    "kind": pdf["kind"],
                    "media_ref": refs,
                    "feat_bytes": refs.str.len().astype("int64") * 1024,
                    "feat_hash": [
                        __import__("hashlib").md5(r.encode()).hexdigest()
                        for r in refs
                    ],
                }
            )
            yield out

    return fake_decode


def extract_features(docs: DataFrame, real: bool = False) -> DataFrame:
    """Media feature extraction: explode → mapInPandas (Arrow batches)."""
    spans = media_spans(docs)
    return spans.mapInPandas(decode_media(real), FEATURE_SCHEMA)


# ---- image decode → resize (real pooling math, fake pixels) ----

IMAGE_SCHEMA = (
    "doc_uid string, span_idx int, media_ref string, "
    "height int, width int, channels int, pixels array<double>"
)
THUMB_SCHEMA = (
    "doc_uid string, span_idx int, media_ref string, "
    "thumb_h int, thumb_w int, thumb array<double>"
)


def _ref_seed(ref: str) -> int:
    import hashlib

    return int.from_bytes(
        __import__("hashlib").md5(ref.encode()).digest()[:4], "big"
    )


def decode_image(real: bool = False):
    """Batch image decoder for ``mapInPandas``. The REAL branch raises
    (no codecs in this container); the fake produces a deterministic
    grayscale image per media_ref — dimensions and pixel values seeded by
    the ref hash — with the exact schema/batch shape a real decoder
    (PIL/opencv inside the iterator) would emit."""
    if real:
        raise NotImplementedError(
            "image decode requires codecs not present in this container"
        )
    import numpy as np

    def fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                seed = _ref_seed(str(r["media_ref"]))
                rng = np.random.default_rng(seed)
                h = 16 + seed % 33          # 16..48
                w = 16 + (seed // 7) % 33
                px = rng.random(h * w)
                rows.append((r["doc_uid"], r["span_idx"], r["media_ref"],
                             h, w, 1, px.tolist()))
            yield pd.DataFrame(rows, columns=[
                "doc_uid", "span_idx", "media_ref",
                "height", "width", "channels", "pixels",
            ])

    return fake


def _resize_batches(out_h: int, out_w: int):
    """REAL area mean-pool resize over the decoded pixel arrays —
    ``np.array_split`` row/col blocks averaged; only the pixels are fake,
    the resize math is what a cluster run executes."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = np.asarray(r["pixels"], dtype="f8").reshape(
                    int(r["height"]), int(r["width"])
                )
                pooled = np.array([
                    [c.mean() for c in np.array_split(rb, out_w, axis=1)]
                    for rb in np.array_split(img, out_h, axis=0)
                ])
                rows.append((r["doc_uid"], r["span_idx"], r["media_ref"],
                             out_h, out_w, pooled.ravel().tolist()))
            yield pd.DataFrame(rows, columns=[
                "doc_uid", "span_idx", "media_ref",
                "thumb_h", "thumb_w", "thumb",
            ])

    return fn


def image_thumbnails(
    docs: DataFrame, out_h: int = 8, out_w: int = 8, real: bool = False
) -> DataFrame:
    """Image pipeline: media spans (kind='image') → decode (stubbed) →
    area mean-pool resize (real) — two chained ``mapInPandas`` stages, no
    shuffle between them (both are per-row maps over the same
    partitioning)."""
    spans = media_spans(docs).filter(F.col("kind") == "image")
    imgs = spans.mapInPandas(decode_image(real), IMAGE_SCHEMA)
    return imgs.mapInPandas(_resize_batches(out_h, out_w), THUMB_SCHEMA)


# ---- audio decode → frame windows (real windowing math) ----

FRAME_SCHEMA = (
    "doc_uid string, span_idx int, media_ref string, "
    "frame_idx int, start int, rms double"
)


def frame_audio(
    docs: DataFrame, win: int = 400, hop: int = 160, real: bool = False
) -> DataFrame:
    """Audio pipeline: spans (kind='audio') → decode (stubbed waveform,
    length seeded by the ref) → sliding frames of ``win`` samples every
    ``hop`` with per-frame RMS — the windowing arithmetic and batch shape
    are the real cluster path."""
    if real:
        raise NotImplementedError(
            "audio decode requires codecs not present in this container"
        )
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                seed = _ref_seed(str(r["media_ref"]))
                rng = np.random.default_rng(seed)
                n = 2000 + seed % 6000
                wav = rng.standard_normal(n)
                n_frames = max(0, 1 + (n - win) // hop)
                for i in range(n_frames):
                    s = i * hop
                    frame = wav[s:s + win]
                    rows.append((r["doc_uid"], r["span_idx"], r["media_ref"],
                                 i, s, float(np.sqrt((frame ** 2).mean()))))
            yield pd.DataFrame(rows, columns=[
                "doc_uid", "span_idx", "media_ref",
                "frame_idx", "start", "rms",
            ])

    spans = media_spans(docs).filter(F.col("kind") == "audio")
    return spans.mapInPandas(fn, FRAME_SCHEMA)


def sample_frames_plan(
    spans: DataFrame, every_n: int = 10, n_frames: str = "n_frames"
) -> DataFrame:
    """Frame-sampling PLAN over media spans carrying an ``n_frames``
    metadata column (what real video containers ship): every
    ``every_n``-th frame index explodes to one row, ready to feed a
    decode stage. Pure built-ins, zero UDF — the narrow map that fans a
    video table out to its frame work-list without touching a codec."""
    return spans.withColumn(
        "frame_idx",
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames) - 1, F.lit(int(every_n)))
        ),
    )


def sample_video_frames(docs: DataFrame, every_n: int = 10) -> DataFrame:
    """Convenience wrapper: video spans with a deterministic fake frame
    count (xxhash64 of the ref stands in for container metadata) through
    :func:`sample_frames_plan`."""
    spans = media_spans(docs).filter(F.col("kind") == "video")
    spans = spans.withColumn(
        "n_frames", (F.abs(F.xxhash64("media_ref")) % 300 + 30).cast("int")
    )
    return sample_frames_plan(spans, every_n).select(
        "doc_uid", "span_idx", "media_ref", "n_frames", "frame_idx"
    )
