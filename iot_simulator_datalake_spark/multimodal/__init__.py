"""Multimodal (image/audio/video) column support ([EXT] north star).

Payloads are opaque ``binary`` columns + a typed metadata struct; all
transforms run as Arrow-batched ``mapInPandas`` operators so bytes move
executor-side in columnar batches — never through the driver, never
row-at-a-time.  Actual codec work (JPEG decode, audio resample, video
frame extraction) is stubbed behind import-tries because the image/audio
libraries are not in this container; the Spark-side plumbing — schemas,
batch shapes, partition sizing — is real and tested.
"""

from .transforms import (
    MEDIA_SCHEMA,
    attach_payload,
    decode_image,
    extract_features,
    frame_sample,
    repartition_by_bytes,
)

__all__ = ["MEDIA_SCHEMA", "attach_payload", "extract_features",
           "decode_image", "frame_sample", "repartition_by_bytes"]
