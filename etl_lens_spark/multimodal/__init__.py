from etl_lens_spark.multimodal.binary import (
    attach_payload_metadata,
    decode_image_stub,
    extract_features_stub,
    frame_sample_stub,
)

__all__ = [
    "attach_payload_metadata",
    "decode_image_stub",
    "extract_features_stub",
    "frame_sample_stub",
]
