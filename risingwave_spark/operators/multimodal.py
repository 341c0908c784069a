"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes clearly marked below); everything around them —
schema contract, mapInPandas batch shape, partitioning, metadata struct —
is the real production plumbing you'd keep when swapping in PIL/ffmpeg.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; keep
`spark.sql.files.maxPartitionBytes` moderate (128 MB) so a partition of
blobs fits executor memory; decode is map-side only (no shuffle); frame
sampling emits ≤ max_frames rows per video (bounded explode).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Worker closures below reference module-level kernels (_fake_decode);
# cloudpickle would serialize those BY REFERENCE and Python workers can't
# import this package unless it's shipped to every executor. Registering
# the module for by-value pickling makes the closures self-contained —
# the same thing `spark-submit --py-files` solves on a real cluster.
try:  # pragma: no cover - depends on pyspark internals staying public
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

# metadata struct every decoded asset carries
MEDIA_META = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)

DECODE_SCHEMA = "doc_id long, meta struct<n_bytes:long,format:string,width:int,height:int,checksum:string>"


def _fake_decode(payload: bytes) -> dict:
    """STUB decode kernel — deterministic fake in place of PIL/ffmpeg
    (not installed in this container). Replace the body with the real
    codec; the signature and returned dict are the production contract."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "format": "fake/raw",
        "width": int(h[:4], 16) % 4096,
        "height": int(h[4:8], 16) % 4096,
        "checksum": h,
    }


def decode_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas (Arrow
    batches in, one metadata row per asset out)."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            metas = [_fake_decode(b) for b in pdf[bin_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "meta": metas})

    return df.select(id_col, bin_col).mapInPandas(op, DECODE_SCHEMA)


def resize_stub(df: DataFrame, id_col: str, bin_col: str, w: int, h: int) -> DataFrame:
    """STUB resize: passes bytes through, records target dims. Real impl
    swaps the body; plumbing (schema, batching) is final."""
    import pandas as pd

    schema = f"{id_col} long, resized binary, target_w int, target_h int"

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": pdf[bin_col].values,  # stub: no-op
                    "target_w": w,
                    "target_h": h,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(op, schema)


def frame_sample_stub(
    df: DataFrame, id_col: str, bin_col: str, max_frames: int = 4
) -> DataFrame:
    """STUB video frame sampler: emits ≤ max_frames deterministic 'frames'
    (md5-sliced fakes) per payload — the bounded-explode row shape a real
    ffmpeg sampler produces."""
    import hashlib

    import pandas as pd

    schema = f"{id_col} long, frame_idx int, frame binary"

    def op(batches):
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for i, b in zip(pdf[id_col].values, pdf[bin_col]):
                n = max(1, min(max_frames, len(b) // 64))
                for j in range(n):
                    out_id.append(i)
                    out_idx.append(j)
                    out_frame.append(hashlib.md5(b + bytes([j])).digest())
            yield pd.DataFrame({id_col: out_id, "frame_idx": out_idx, "frame": out_frame})

    return df.select(id_col, bin_col).mapInPandas(op, schema)
