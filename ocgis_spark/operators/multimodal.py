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
