"""NumPy/stdlib image codecs and perceptual hashing.

The environment has no PIL/cv2/imageio, so the four formats in the
input schema ('raw', 'bmp', 'png', 'jpegq') are implemented from
scratch on public format specs: raw RGB8, 24-bit uncompressed BMP,
PNG (zlib + per-row filters), and a quantizing block-DCT lossy codec
('jpegq') guaranteed to hold PSNR >= 40 dB.
"""

from mehc_curation_spark.codecs.image import (
    decode_image,
    encode_image,
    psnr,
    DecodeError,
)
from mehc_curation_spark.codecs.phash import phash64

__all__ = ["decode_image", "encode_image", "psnr", "DecodeError", "phash64"]
