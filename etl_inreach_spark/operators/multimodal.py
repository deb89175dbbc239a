"""Multimodal column convention + decode plumbing.

Convention (SURVEY.md §7 P3): media travel as
    STRUCT<uri: STRING, mime: STRING, bytes: BINARY,
           meta: MAP<STRING,STRING>>
— bytes opaque to the engine, metadata typed, decode/feature-extract
as Arrow-batched pandas stages over mapInPandas.

The actual image/audio decoders are STUBBED (libs not in this
container): ``decode_stub`` raises NotImplementedError unless the
deterministic fake is requested. The Spark-side plumbing — schema,
batch iteration, partition shape — is real and tested; swapping the
stub for PIL/ffmpeg is a pure function replacement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "struct<uri:string,mime:string,bytes:binary,meta:map<string,string>>"


def media_struct(uri: Column, mime: Column, data: Column, meta: Column | None = None) -> Column:
    meta_col = meta if meta is not None else F.create_map().cast("map<string,string>")
    return F.struct(
        uri.alias("uri"), mime.alias("mime"), data.alias("bytes"), meta_col.alias("meta")
    )


def decode_stub(payload: bytes, mime: str, fake: bool = True) -> dict:
    """Per-item decoder. Real decoders (PIL, soundfile, av) are not
    installed here; ``fake=True`` returns deterministic features
    derived from the raw bytes so the pipeline is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires PIL/soundfile/av — not available in this environment"
        )
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "byte_sum_mod": sum(payload[:64]) % 997,
    }


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """mapInPandas feature extraction over the media struct column.

    Arrow ships (id, mime, bytes) batches to Python; output schema is
    fixed and engine-friendly. This is THE pattern for any real
    decode: batch-wise, columnar in/out, no per-row UDF calls.
    """
    out_schema = f"{id_col} bigint, mime string, n_bytes int, first_byte int, byte_sum_mod int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        null_feats = {"n_bytes": None, "first_byte": None, "byte_sum_mod": None}
        for pdf in batches:
            media = pdf[media_col]
            # a NULL media struct (left joins, missing uploads) yields a
            # NULL feature row rather than a TypeError on the executor
            feats = [
                null_feats
                if m is None
                else decode_stub(m["bytes"] if m["bytes"] is not None else b"", m["mime"])
                for m in media
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mime": [None if m is None else m["mime"] for m in media],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "byte_sum_mod": [f["byte_sum_mod"] for f in feats],
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


_PIL_IMAGE = None  # resolved once per process; resize_stub runs per ROW


def _pil_image_cls():
    """PIL.Image, resolved and cached at first use. resize_stub sits
    inside the mapInPandas per-row loop — a find_spec() walk of
    sys.meta_path per image would dominate small payloads."""
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:
            from PIL import Image
        except ImportError:
            _PIL_IMAGE = False
        else:
            _PIL_IMAGE = Image
    return _PIL_IMAGE


def resize_stub(payload: bytes, width: int, height: int, fake: bool = True) -> bytes:
    """Image resize. ``fake=True`` (default in this container, which has
    no imaging libraries) cycles the payload to width*height bytes — a
    deterministic stand-in that keeps the Arrow plumbing testable and
    oracle-checkable. ``fake=False`` decodes the payload with PIL and
    returns the resized image's grayscale pixel buffer (width*height
    bytes — same output-size contract as the fake), raising
    NotImplementedError where PIL is absent. The real path is covered
    by a skipif-marked test (tests/test_extended.py) that runs
    automatically wherever PIL exists."""
    if not fake:
        import io

        Image = _pil_image_cls()
        if Image is False:
            raise NotImplementedError(
                "image resize requires PIL — not available in this environment"
            )
        img = Image.open(io.BytesIO(payload)).convert("L").resize((width, height))
        return img.tobytes()
    if not payload:
        return b"\x00" * (width * height)
    reps = (width * height + len(payload) - 1) // len(payload)
    return (payload * reps)[: width * height]


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 32,
    stride: int = 2,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling over opaque media bytes: every ``stride``-th
    chunk of ``frame_bytes`` becomes one output row (doc_id,
    frame_idx, n_bytes, checksum). The 1->N batch shape is the real
    pattern for video decode (one input row yields many frame rows,
    still columnar through Arrow); the chunking stands in for an
    ffmpeg keyframe iterator."""
    out_schema = f"{id_col} bigint, frame_idx int, n_bytes int, checksum int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for rid, m in zip(pdf[id_col], pdf[media_col]):
                if m is None:  # NULL media struct -> no frames
                    continue
                payload = m["bytes"] if m["bytes"] is not None else b""
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, stride):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(rid)
                    idxs.append(fi)
                    sizes.append(len(chunk))
                    sums.append(sum(chunk) % 997)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "n_bytes": pd.Series(sizes, dtype="int32"),
                 "checksum": pd.Series(sums, dtype="int32")}
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Batch image resize over the media struct column — the same
    Arrow mapInPandas plumbing a real PIL/opencv resize drops into
    (swap resize_stub for the library call; schema, batching and
    NULL handling are already production-shaped). Output carries the
    resized payload plus its dimensions; NULL media yields NULL bytes.
    """
    out_schema = f"{id_col} bigint, width int, height int, resized binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            resized = [
                None
                if m is None
                else resize_stub(
                    m["bytes"] if m["bytes"] is not None else b"", width, height,
                    fake=fake,
                )
                for m in media
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized": resized,
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)
