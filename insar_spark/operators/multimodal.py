"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested. The codec step itself is STUBBED — the
sandbox image ships no image/audio libraries — behind ``_decode_image``:
swap in PIL/libvips/ffmpeg there and nothing else changes.

Batch-shape rule for 100 TB: payloads dominate row size, so
``spark.sql.execution.arrow.maxRecordsPerBatch`` must be sized by bytes not
rows — ``mapInPandas`` receives an iterator and re-chunks by
``max_batch_bytes`` to bound executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat_mean double, feat_std double, "
    "n_bytes int, thumb binary"
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-codec path; the deterministic fake is the default
    in this environment."""


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: real implementation would be PIL.Image.open(BytesIO(payload)).

    Deterministic fake: interpret the payload bytes as the pixel buffer
    (repeating/truncating to width*height), so the downstream plumbing is
    exercised with stable numbers.
    """
    need = width * height
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        return np.zeros((height, width), dtype=np.uint8)
    reps = int(np.ceil(need / len(buf)))
    return np.tile(buf, reps)[:need].reshape(height, width)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                rng = np.random.default_rng(np.random.SeedSequence([seed, int(i)]))
                w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                payload = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": ["image", "audio", "video"][int(i) % 3],
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "sample_rate": 16_000,
                            "n_frames": int(rng.integers(1, 100)),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def media_from_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table derived from a text corpus: the payload is
    the utf-8 text bytes and the metadata is pure arithmetic on
    (doc_id, length(text)) — so an independent SQL engine can re-derive the
    decoded-feature oracle without running the codec. The decode path
    downstream is byte-for-byte the same stub/real interface as synth_media.
    """
    did = F.col(id_col)
    return docs.select(
        did.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (did % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            (F.lit(8) + F.length(text_col) % 56).cast("int").alias("width"),
            (F.lit(8) + (did * 7) % 56).cast("int").alias("height"),
            F.lit(16_000).alias("sample_rate"),
            (F.lit(1) + did % 99).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, max_batch_bytes: int = 64 << 20, thumb_side: int = 4
) -> DataFrame:
    """Decode -> feature-extract -> thumbnail, re-chunked by payload bytes.

    The decode is the stub above; features (mean/std of the pixel buffer)
    and the subsampled thumbnail exercise the real batch plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # re-chunk by bytes so one Arrow batch never exceeds the budget
            sizes = pdf["payload"].map(len).to_numpy()
            cuts, acc = [0], 0
            for i, s in enumerate(sizes):
                acc += int(s)
                if acc > max_batch_bytes:
                    cuts.append(i + 1)
                    acc = 0
            cuts.append(len(pdf))
            for lo, hi in zip(cuts, cuts[1:]):
                chunk = pdf.iloc[lo:hi]
                if chunk.empty:
                    continue
                out = []
                for row in chunk.itertuples(index=False):
                    meta = row.meta
                    w = int(meta["width"]) if meta["width"] else 8
                    h = int(meta["height"]) if meta["height"] else 8
                    img = _decode_image(bytes(row.payload), w, h)
                    step_y = max(1, h // thumb_side)
                    step_x = max(1, w // thumb_side)
                    thumb = img[::step_y, ::step_x][:thumb_side, :thumb_side]
                    # uint8 pixel stats via EXACT integer sums, then one
                    # float division each — summation-order-independent, so
                    # an independent engine (the SQL oracle) lands on the
                    # bit-identical double. np.mean's pairwise float sum
                    # differs by an ulp and flips 4dp rounding boundaries
                    # (caught at sf0.1: 1/5000 rows off by 1e-4).
                    px = img.astype(np.int64, copy=False)
                    n_px = px.size
                    mean = float(int(px.sum()) / n_px)
                    ex2 = float(int((px * px).sum()) / n_px)
                    out.append(
                        {
                            "media_id": row.media_id,
                            "kind": row.kind,
                            "feat_mean": mean,
                            "feat_std": float(np.sqrt(ex2 - mean * mean)),
                            "n_bytes": len(row.payload),
                            "thumb": thumb.tobytes(),
                        }
                    )
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame index.

    JVM-side explode of the frame-index sequence (the decode of each frame
    would happen in a downstream extract_features-style UDF)."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
