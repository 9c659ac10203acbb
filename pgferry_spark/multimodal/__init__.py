from .ops import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_image_meta,
    frame_sample,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_image_meta",
    "resize_images",
    "frame_sample",
]
