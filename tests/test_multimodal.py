"""Optional-dependency gate for the real image decoder (multimodal.py).

The registered ``mm_decode`` query uses a deterministic fake decoder and is
oracle-checked like any other query (tests/test_oracle.py). The REAL
decoder is feature-gated on PIL: functional when the codec exists,
NotImplementedError when it doesn't. Exactly one of the two tests below
runs in any given environment — this container has no PIL, so the gate
test runs here and the round-trip runs wherever PIL is installed.
"""

from __future__ import annotations

import pytest

try:
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _png_bytes(width: int, height: int) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (width, height), color=(1, 2, 3)).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed — real decoder is gated off")
def test_decode_image_real_roundtrip():
    from air_quality_data_pipeline_spark.operators.multimodal import decode_image_real

    assert decode_image_real(_png_bytes(17, 9)) == (17, 9)


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed — real decoder is gated off")
def test_mm_decode_real_mapinpandas(spark):
    """The real decoder through the SAME mapInPandas plumbing as mm_decode:
    binary payloads in, (doc_id, kind, n_bytes, width, height) out."""
    import pyspark.sql.functions as F

    from air_quality_data_pipeline_spark.operators.multimodal import mm_decode_real

    rows = [(1, _png_bytes(32, 16), "image"), (2, _png_bytes(8, 64), "image")]
    media = spark.createDataFrame(rows, "doc_id long, payload binary, kind string")
    got = {r.doc_id: r for r in mm_decode_real(media).collect()}
    assert (got[1].width, got[1].height) == (32, 16)
    assert (got[2].width, got[2].height) == (8, 64)
    assert got[1].n_bytes == len(rows[0][1])
    assert media.select(F.col("doc_id")).count() == 2


@pytest.mark.skipif(HAS_PIL, reason="PIL installed — the NotImplementedError gate is unreachable")
def test_decode_image_real_gate_without_pil():
    from air_quality_data_pipeline_spark.operators.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\n not actually decodable")
