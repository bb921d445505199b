"""Image recoding (C19): JPEG/PNG -> JPEG at quality Q, keep only if smaller.

Port of ``checkImageForRecode``/``recodeJPEG``/``recodePNG``
(scraper/images.go:17-99): recoding runs only when 1 <= quality <= 99
(scraper/scraper.go:132-135 clamps everything else to 0 = disabled) and the
recoded bytes replace the original only when strictly smaller
("keep the old file if it is smaller", images.go:62-79).

Pillow is not installed in this container, so the decode step is gated behind
an import-try: without PIL the operator is a deterministic passthrough (the
same behavior as quality=0) and ``PIL_AVAILABLE`` is False — the Spark-side
plumbing (Arrow batch shape, magic-byte routing, smaller-wins compare) is
real and tested either way.
"""

from __future__ import annotations

import io
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.filetype import sniff_extension

try:  # pragma: no cover - environment probe
    from PIL import Image  # noqa: F401
    PIL_AVAILABLE = True
except ImportError:
    PIL_AVAILABLE = False


def recode_image_bytes(data: bytes, quality: int) -> bytes:
    """Recode one image; returns the smaller of original/recoded
    (scraper/images.go:62-79).  Passthrough when PIL is unavailable or the
    payload is not JPEG/PNG."""
    if quality < 1 or quality > 99:
        return data
    ext = sniff_extension(data)
    if ext not in ("jpg", "png"):
        return data
    if not PIL_AVAILABLE:
        return data
    from PIL import Image as _Image

    try:
        img = _Image.open(io.BytesIO(data))
        buf = io.BytesIO()
        img.convert("RGB").save(buf, format="JPEG", quality=quality)
        recoded = buf.getvalue()
    except Exception:
        return data
    return recoded if len(recoded) < len(data) else data


def recode_images_df(fetched: DataFrame, quality: int,
                     url_col: str = "url",
                     body_col: str = "body") -> DataFrame:
    """Arrow-batched recode over fetched image rows (off the hot path —
    scraper/download.go:58-63 applies it only to the images queue)."""
    src = fetched.select(F.col(url_col).alias("url"),
                         F.col(body_col).alias("body"))

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            bodies = [recode_image_bytes(
                bytes(b) if b is not None else b"", quality)
                for b in pdf["body"]]
            yield pd.DataFrame({"url": pdf["url"], "body": bodies})

    return src.mapInPandas(run, schema="url string, body binary")
