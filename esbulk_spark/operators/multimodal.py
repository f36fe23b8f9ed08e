"""Multimodal column plumbing (training-data pipeline op).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata. The Spark-side machinery — schema, Arrow batch
shape, partition sizing, UDF signatures — is real and tested; the actual
codec calls (PIL/ffmpeg decode, resizing, frame sampling) are STUBBED
behind ``_decode_stub`` because media libraries are not available in this
container. Swapping the stub for a real decoder changes no plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "id long, n_bytes int, kind string, width int, height int"

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"\x00\x00\x00", "mp4ish"),
]


def _sniff(buf: bytes) -> str:
    for magic, kind in _MAGIC:
        if buf[: len(magic)] == magic:
            return kind
    return "unknown"


def _decode_stub(buf: bytes, kind: str) -> tuple[int, int]:
    """STUB decode: deterministic fake dimensions derived from content.

    A real implementation would be e.g. PIL.Image.open(BytesIO(buf)).size;
    unavailable in this container, and the contract (bytes in, (w, h)
    out, called once per row inside an Arrow batch) is what matters."""
    if not buf:
        return (0, 0)
    return (1 + buf[0] % 64, 1 + buf[-1] % 64)


def extract_media_meta(df: DataFrame, blob_col: str, id_col: str) -> DataFrame:
    """mapInPandas metadata extraction over a binary column: byte length,
    magic-byte sniff, (stub-)decoded dimensions. One Arrow batch per ~10k
    rows; binary stays zero-copy until the Python boundary."""
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, kinds, ws, hs = [], [], [], [], []
            for i, buf in zip(pdf[id_col].values, pdf[blob_col].values):
                buf = bytes(buf) if buf is not None else b""
                kind = _sniff(buf)
                w, h = _decode_stub(buf, kind)
                ids.append(i)
                nb.append(len(buf))
                kinds.append(kind)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"id": ids, "n_bytes": nb, "kind": kinds, "width": ws, "height": hs}
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(fn, META_SCHEMA)


def frame_sample_plan(df: DataFrame, blob_col: str, id_col: str, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: emits (id, frame_no) rows for frames a
    decoder would extract — the partition-explosion shape of the real op
    (each output frame becomes a row; downstream ops see uniform rows).
    Frame count is stub-derived (bytes // 1000 capped at 100)."""
    n_frames = F.least(F.floor(F.length(F.col(blob_col)) / 1000), F.lit(100)).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_no"),
    )
