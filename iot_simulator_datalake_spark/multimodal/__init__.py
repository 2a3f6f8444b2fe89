"""Multimodal (image/audio/video) column support ([EXT] north star).

Payloads are opaque ``binary`` columns + a typed metadata struct; all
transforms run as Arrow-batched ``mapInPandas`` operators so bytes move
executor-side in columnar batches — never through the driver, never
row-at-a-time.  Stdlib-decodable image formats (24bpp BMP, binary P6
PPM) decode for REAL in ``decode_image`` (oracle-gated round trip —
``multimodal_decode_image``); compressed codecs (JPEG/PNG, audio
resample, video frames) still need libraries this container lacks and
raise ``NotImplementedError`` per payload rather than fake pixels.
The Spark-side plumbing — schemas, batch shapes, partition sizing —
is real and tested either way.
"""

from .transforms import (
    MEDIA_SCHEMA,
    attach_payload,
    decode_audio,
    decode_image,
    encode_bmp,
    encode_ppm,
    encode_wav,
    extract_features,
    frame_sample,
    repartition_by_bytes,
)

__all__ = ["MEDIA_SCHEMA", "attach_payload", "extract_features",
           "decode_audio", "decode_image", "encode_bmp", "encode_ppm",
           "encode_wav", "frame_sample", "repartition_by_bytes"]
