from .ops import (
    MEDIA_SCHEMA,
    attach_fake_media,
    attach_real_images,
    attach_real_jpegs,
    decode_gray_pixels,
    decode_image_meta,
    frame_sample,
    image_ahash,
    image_meta_real,
    image_pixelsum_real,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "attach_real_images",
    "attach_real_jpegs",
    "decode_gray_pixels",
    "decode_image_meta",
    "image_ahash",
    "image_meta_real",
    "image_pixelsum_real",
    "resize_images",
    "frame_sample",
]
