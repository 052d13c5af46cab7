"""Regenerate the FROZEN lossy-JPEG feature literals in
functions/media_golden.py (JPEG_FEAT3) after an INTENTIONAL codec
change: the decoded-raster channel-0 float32 mean for each baseline-
JPEG row of real_media_rows(64), exactly as the executor computes it
(decode → image_features element 3, float32 storage)."""
import numpy as np

from amadeus_spark.functions.jpeg import decode_jpeg
from amadeus_spark.functions.multimodal import real_media_rows

out = {}
for i, kind, fmt, _meta, payload in real_media_rows(64):
    if fmt != "jpeg":
        continue
    img = decode_jpeg(payload)
    f = img.astype(np.float32)
    out[i] = float(np.float32(f[..., 0].mean()))
print("JPEG_FEAT3: dict[int, float] = {")
for k, v in sorted(out.items()):
    print(f"    {k}: {v!r},")
print("}")
