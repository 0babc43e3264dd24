"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract / frame-sample as Arrow-batched pandas UDFs.

The reference engine stores every cell as raw ``byte[]`` (kvs/Row.java:6-14)
but only ever indexes text. A training-data pipeline at 100 TB needs the
same table to carry images/audio/video next to text. This module makes that
real on the Spark side:

- **schema**: payload is an opaque ``BinaryType`` column plus a typed
  metadata struct (media_type, n_bytes, sha256) — metadata is computed
  JVM-side (whole-stage codegen), never in Python;
- **partitioning**: feature extraction runs via ``mapInPandas`` so each
  Arrow batch carries whole payloads; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
  sized by rows x payload, not rows x row-width;
- **decode**: the actual image/audio codec is NOT in this container, so
  ``decode_image``/``decode_audio`` raise ``NotImplementedError`` behind a
  clearly-marked stub, and the default path uses a *deterministic fake*
  decoder whose outputs are pure functions of the payload bytes — so the
  whole pipeline (schema, UDF signatures, batch shapes, explode fan-out)
  is testable end-to-end and SQL-oracle-able.

At 100 TB scale the payload column dominates bytes; every query here
projects only (doc_id, payload) or metadata so parquet column pruning keeps
text/other columns off the wire (ReadSchema verified in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic fake-decoder parameters (mirrored in the DuckDB oracles in
# contract_queries.py — change together)
_W_MOD, _H_MOD = 640, 480
_FRAME_MOD, _N_SAMPLES = 240, 8
AUDIO_CHUNK = 256


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL image decode — intentionally stubbed: no image codec library is
    available in this environment. The distributed plumbing around it is
    real; swap this body for cv2/PIL on a cluster that has them."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode_meta (deterministic) or install PIL/cv2")


def decode_audio(payload: bytes) -> "np.ndarray":
    """REAL audio decode — intentionally stubbed (see decode_image)."""
    raise NotImplementedError(
        "audio codecs are not installed in this environment")


def fake_decode_meta(n_bytes: np.ndarray) -> dict[str, np.ndarray]:
    """Deterministic stand-in for image decode: pure function of payload
    size (vectorized). Mirrors the SQL oracle exactly."""
    width = n_bytes % _W_MOD + 1
    height = (n_bytes * 31) % _H_MOD + 1
    # exact integer micro-units (width/height * 1e6, floor) — no float
    # rounding to disagree about between engines
    aspect_um = width * 1_000_000 // height
    return {"width": width, "height": height, "aspect_um": aspect_um}


def with_media_columns(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> add an opaque binary payload + typed
    metadata, all JVM-side. The payload is the utf-8 encoding of the text
    (the sandbox's deterministic stand-in for real media bytes); media_type
    cycles image/audio/video by doc_id so each branch gets coverage."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )


def image_features(media: DataFrame) -> DataFrame:
    """Feature-extract over image payloads via mapInPandas (Arrow batches of
    whole binary payloads -> per-payload features). byte_sum/first/last
    genuinely consume the bytes; width/height come from the deterministic
    fake decoder (real decode is the stubbed decode_image)."""
    imgs = media.where(F.col("media_type") == "image") \
                .select("doc_id", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bufs = pdf["payload"]
            n_bytes = bufs.map(len).to_numpy(dtype=np.int64)
            meta = fake_decode_meta(n_bytes)
            # vectorized byte math: one concatenated buffer + reduceat
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            offs = np.zeros(len(bufs), dtype=np.int64)
            np.cumsum(n_bytes[:-1], out=offs[1:])
            nz = n_bytes > 0
            if flat.size:
                # prefix sums, not reduceat: clamping reduceat indices for an
                # empty trailing payload would shift the previous segment's
                # boundary and drop its last bytes
                cum = np.concatenate(
                    ([0], np.cumsum(flat, dtype=np.int64)))
                byte_sum = cum[offs + n_bytes] - cum[offs]
                idx = np.minimum(offs, flat.size - 1)
                first = np.where(nz, flat[idx].astype(np.int64), -1)
            else:
                byte_sum = np.zeros(len(bufs), dtype=np.int64)
                first = np.full(len(bufs), -1, dtype=np.int64)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": meta["width"], "height": meta["height"],
                "aspect_um": meta["aspect_um"],
                "byte_sum": byte_sum, "first_byte": first,
            })

    return imgs.mapInPandas(
        extract,
        schema="doc_id long, width long, height long, aspect_um long, "
               "byte_sum long, first_byte long")


def frame_samples(media: DataFrame) -> DataFrame:
    """Frame-sample video payloads: derive a deterministic frame count from
    the payload, emit one row per sampled frame (uniform stride, first 8).
    Exercises the 1->N fan-out shape (mapInPandas yielding more rows than it
    consumes) that a real video pipeline needs."""
    vids = media.where(F.col("media_type") == "video") \
                .select("doc_id", "payload")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_idx, out_off = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = n % _FRAME_MOD + 1
                stride = max(1, -(-n_frames // _N_SAMPLES))  # ceil
                idxs = list(range(0, n_frames, stride))[:_N_SAMPLES]
                out_doc += [doc_id] * len(idxs)
                out_idx += idxs
                # byte offset of each fake frame within the payload
                out_off += [0 if n_frames == 0 else (i * n) // n_frames
                            for i in idxs]
            yield pd.DataFrame({"doc_id": out_doc, "frame_idx": out_idx,
                                "frame_off": out_off})

    return vids.mapInPandas(
        sample, schema="doc_id long, frame_idx long, frame_off long")


def audio_chunks(media: DataFrame) -> DataFrame:
    """Chunk audio payloads into fixed-size windows (stand-in for resample/
    spectrogram framing): per chunk emit (doc_id, chunk_idx, chunk_bytes).
    Pure JVM (no Python): sequence + transform over the binary column."""
    chunk = AUDIO_CHUNK
    # empty payloads emit no chunks: without the guard F.sequence(0, -1)
    # yields a DESCENDING [0, -1] (implicit step -1), two spurious rows
    auds = media.where((F.col("media_type") == "audio")
                       & (F.col("n_bytes") > 0))
    n_chunks = F.ceil(F.col("n_bytes") / F.lit(chunk)).cast("long")
    return (auds.select(
        "doc_id", "n_bytes",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             n_chunks - 1)).alias("chunk_idx"))
        .select("doc_id", "chunk_idx",
                F.least(F.lit(chunk).cast("long"),
                        F.col("n_bytes") - F.col("chunk_idx") * chunk)
                .alias("chunk_bytes")))
