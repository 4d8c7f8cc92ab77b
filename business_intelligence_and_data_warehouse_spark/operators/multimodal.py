"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched Pandas
iterators (`mapInPandas`) so the (expensive) Python stage streams
batches instead of row-at-a-time serde.

The actual media codecs (PIL / torchaudio / av) are NOT available in
this environment — the decode step is STUBBED: `decode_image` raises
NotImplementedError unless PIL is importable, and the default feature
extractor computes deterministic byte-level features (length, digest,
leading byte) so the Spark-side plumbing — schema, batching, partition
flow — is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:
    # Ship this module's worker-side functions BY VALUE: the driver
    # process may import this package from a directory (cwd / an
    # injected sys.path entry) that Python workers don't have on their
    # path, and a by-reference pickle would then fail to unpickle on
    # the executor with ModuleNotFoundError. Pickling by value makes
    # the mapInPandas closures self-contained (their module-level
    # globals here are only stdlib/pandas, importable everywhere).
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older cloudpickle
    pass

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, first_byte int, fake_label int"
)


def attach_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload + metadata —
    the schema shape every multimodal column uses (the testdata has no
    real media, so text bytes stand in for the payload)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col("doc_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL, which this container lacks.
    STUB: clearly marked; the plumbing around it is fully tested with
    the byte-level feature extractor instead."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment"
        ) from exc


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor (streaming batches)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "first_byte": payloads.map(lambda b: int(b[0]) if len(b) else -1),
                "fake_label": payloads.map(
                    lambda b: (int(b[0]) % 10) if len(b) else -1
                ),
            }
        )


def extract_features(blobs: DataFrame, extractor=None, schema: str = FEATURE_SCHEMA) -> DataFrame:
    """Run a batch feature extractor over the payload column.

    `extractor` is an Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]
    mapInPandas function; defaults to the deterministic byte-feature
    stub. Swap in a real decode+embed function on a cluster with media
    libraries — the Spark plumbing is identical.
    """
    return blobs.mapInPandas(extractor or _byte_features, schema=schema)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_digest string"


def sample_frames(
    blobs: DataFrame, frame_bytes: int = 32, stride: int = 4
) -> DataFrame:
    """Deterministic frame sampling over a binary payload: the payload
    is treated as a sequence of fixed-size frames (a stand-in for
    video GOPs / audio windows) and every `stride`-th frame is emitted
    with its digest.

    This is the ONE-TO-MANY mapInPandas shape (each input row yields
    ~n_frames/stride output rows, assembled per Arrow batch) — the
    plumbing a real video frame-sampler uses, with the codec swapped
    for byte slicing in this environment. Map-side; output row count
    is linear in payload bytes / (frame_bytes * stride).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    ids.append(did)
                    idxs.append(i)
                    digs.append(
                        hashlib.md5(
                            b[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_digest": pd.Series(digs, dtype="object"),
                }
            )

    return blobs.mapInPandas(gen, schema=FRAME_SCHEMA)
