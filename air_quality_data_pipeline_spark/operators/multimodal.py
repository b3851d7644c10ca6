"""Multimodal-column operators (SURVEY.md §2.K): opaque binary payloads with
typed metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (md5-derived dimensions) clearly separated behind
``decode_image_real`` (NotImplementedError until PIL exists). Everything
Spark-side is real: the binary column, the typed metadata struct, the
``mapInPandas`` batch iteration, the output schema contract, and the
frame-sampling explode — which is what matters for the 100 TB pipeline
shape (payload bytes never leave the executor; only Arrow record batches
cross the JVM↔Python boundary, and only for the decode stage).

Because the fake decode is pure md5 arithmetic, even the Python
``mapInPandas`` path is oracle-checked bit-exact against DuckDB SQL — the
check proves the Arrow plumbing preserves every row and value.

Reference parity: the reference treats payloads as opaque JSON and never
decodes media; this implements the north-star multimodal mandate
(BASELINE.json).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..session import apply_engine_conf
from ..tables import table

# --- the synthetic media table ------------------------------------------------
# documents.text encoded to utf-8 bytes stands in for an image/audio payload;
# kind and a typed metadata struct ride alongside, as a real lakehouse media
# table would (payload binary + metadata columns, partitioned by kind).


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").cast("long").alias("content_length"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def _require_pil():
    """Import-gate for the optional image codec dependency."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "mm_decode uses the deterministic fake decoder"
        ) from exc
    return Image


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real image decode (width, height) — functional when PIL is
    installed, NotImplementedError otherwise (this container ships no
    codecs, so the engine's oracle-checked path is the deterministic fake
    in ``mm_decode``). tests/test_multimodal.py exercises both branches:
    a skipif(PIL)-gated round-trip and the gate itself."""
    Image = _require_pil()
    import io

    img = Image.open(io.BytesIO(payload))
    return img.width, img.height


def mm_decode_real(media: DataFrame) -> DataFrame:
    """REAL-codec variant of mm_decode over a (doc_id, payload, kind) frame:
    same mapInPandas plumbing, schema, and batch shape as the registered
    fake-decoder query, with PIL doing the decode. Not registered — it
    cannot run (or be oracle-checked) in a codec-less container — but the
    PIL-gated test proves it end-to-end where the dependency exists, so
    swapping decoders really is a one-function change."""

    def decode_batches(batches):
        import io

        import pandas as pd
        from PIL import Image

        for pdf in batches:
            dims = []
            for p in pdf["payload"]:
                with Image.open(io.BytesIO(bytes(p))) as img:
                    dims.append((img.width, img.height))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    _require_pil()  # fail fast on the driver, not inside executor tasks
    return media.select("doc_id", "payload", "kind").mapInPandas(
        decode_batches,
        schema="doc_id long, kind string, n_bytes long, width long, height long",
    )


# --- mm_decode: Arrow-batched decode via mapInPandas -------------------------

_DECODE_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(('0x' || substring(md5(text), 1, 4)) AS BIGINT) % 1920 AS width,
       CAST(('0x' || substring(md5(text), 5, 4)) AS BIGINT) % 1080 AS height
FROM documents
"""


@register("mm_decode", oracle=_DECODE_ORACLE, tags=("llm", "multimodal"))
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract binary payloads with ``mapInPandas``: Arrow
    batches of (doc_id, payload, kind) enter Python, a vectorized decoder
    emits (doc_id, kind, n_bytes, width, height). The decoder body is the
    deterministic md5 fake (see module docstring); swapping in
    ``decode_image_real`` changes one function, not the plumbing. Executors
    process batches independently — no shuffle, linear scale."""
    apply_engine_conf(spark)
    media = _media(spark, sf_dir)

    # defined inside the builder so cloudpickle ships it by value (driver
    # workers have no PYTHONPATH to this repo)
    def decode_batches(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            digests = [hashlib.md5(p).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": [int(d[0:4], 16) % 1920 for d in digests],
                    "height": [int(d[4:8], 16) % 1080 for d in digests],
                }
            )

    return media.select("doc_id", "payload", "kind").mapInPandas(
        decode_batches,
        schema="doc_id long, kind string, n_bytes long, width long, height long",
    )


# --- mm_frame_sample: per-payload frame explode ------------------------------

_FRAME_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         greatest(CAST(strlen(text) AS BIGINT) // 100, 1) AS n_frames
  FROM documents
)
SELECT m.doc_id, t.i AS frame_no,
       t.i * 1000 // m.n_frames AS ts_ms,
       CAST(('0x' || substring(md5(m.doc_id || ':' || t.i), 1, 8)) AS BIGINT)
         AS frame_sig
FROM m, UNNEST(range(0, m.n_frames)) AS t(i)
"""


@register("mm_frame_sample", oracle=_FRAME_ORACLE, tags=("llm", "multimodal"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over media payloads: derive a frame count from the
    payload size, explode one row per frame with a timestamp and a
    deterministic frame signature — the shape of video→frames fan-out
    (decode itself stubbed, §module docstring). Generate (explode) is
    pipelined; output cardinality = sum of frame counts, no shuffle."""
    apply_engine_conf(spark)
    media = _media(spark, sf_dir)
    m = media.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        # floor of 1 frame: sequence(0, -1) would generate a DESCENDING range
        F.greatest(F.expr("length(payload) div 100"), F.lit(1)).cast("long").alias("n_frames"),
    )
    frames = m.select(
        "doc_id", "n_frames", F.explode(F.expr("sequence(0, n_frames - 1)")).alias("frame_no")
    )
    return frames.select(
        "doc_id",
        "frame_no",
        F.expr("frame_no * 1000 div n_frames").alias("ts_ms"),
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string), ':', "
            "cast(frame_no as string))), 1, 8), 16, 10) as bigint)"
        ).alias("frame_sig"),
    )


# --- mm_image_resize: thumbnail-fit resize plumbing ---------------------------

# fit-longest-side-to-256 with integer math (w*256 div max(w,h)), floored at
# 1px — the standard thumbnail contract, computed on the fake-decoded dims
# so the whole path (decode → per-image arithmetic → output schema) is
# oracle-checkable; a real codec swaps the decode line only, exactly like
# mm_decode vs mm_decode_real.
_RESIZE_BOX = 256

_RESIZE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 4)) AS BIGINT) % 1920 + 1 AS width,
         CAST(('0x' || substring(md5(text), 5, 4)) AS BIGINT) % 1080 + 1 AS height
  FROM documents
  WHERE doc_id % 2 = 0
)
SELECT doc_id, width, height,
       greatest(width * {_RESIZE_BOX} // greatest(width, height), 1) AS out_w,
       greatest(height * {_RESIZE_BOX} // greatest(width, height), 1) AS out_h,
       greatest(width * {_RESIZE_BOX} // greatest(width, height), 1)
         * greatest(height * {_RESIZE_BOX} // greatest(width, height), 1) * 3 AS out_bytes
FROM d
"""


@register("mm_image_resize", oracle=_RESIZE_ORACLE, tags=("llm", "multimodal"))
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing over the media table: Arrow batches of image
    payloads enter ``mapInPandas``, the decoder yields (width, height), and
    vectorized pandas integer math computes the 256-box thumbnail dims and
    output byte size. The kind='image' predicate is applied BEFORE the
    Python boundary, so audio payloads never cross into Arrow — at 100 TB
    the decode stage only pays for the rows it transforms. Dims are +1
    offset from mm_decode's so zero-width degenerate images cannot occur
    (real codecs guarantee >=1px the same way)."""
    apply_engine_conf(spark)
    media = _media(spark, sf_dir).filter(F.col("kind") == "image")

    def resize_batches(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            digests = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            w = pd.Series([int(d[0:4], 16) % 1920 + 1 for d in digests], dtype="int64")
            h = pd.Series([int(d[4:8], 16) % 1080 + 1 for d in digests], dtype="int64")
            longest = w.combine(h, max)
            out_w = (w * _RESIZE_BOX // longest).clip(lower=1)
            out_h = (h * _RESIZE_BOX // longest).clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_bytes": out_w * out_h * 3,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        resize_batches,
        schema="doc_id long, width long, height long, out_w long, out_h long, out_bytes long",
    )
