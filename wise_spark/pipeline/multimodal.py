"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference decodes real media (torchaudio StreamReader,
/root/reference/src/dataloader/dataset.py:213-336) into fixed-shape tensors
and batch-extracts features. This container has no image/audio libraries, so
the DECODE step is stubbed (NotImplementedError or a deterministic fake),
while the Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested:

  binary_metadata      (real)  size/checksum over binary via mapInPandas
  decode_image         (STUB)  raises NotImplementedError — wire in a real
                               decoder (PIL/torchvision) on a cluster image
  fake_feature_extract (fake)  deterministic pseudo-embedding from payload
                               bytes — stands in for CLIP/CLAP extractors
                               (/root/reference/src/feature/
                               mlfoundation_openclip.py:92-101) and keeps the
                               downstream similarity pipeline testable
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = "doc_id long, byte_size long, checksum string"
FEAT_SCHEMA = "doc_id long, feature array<float>"


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, payload binary) — UTF-8 bytes of the text column; a stand-in
    for an html/image/audio blob column with the same Spark type."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def binary_metadata(blobs: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload): size + md5 checksum (the
    reference's streaming md5, /root/reference/src/dataloader/utils.py:16-22)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_size": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return blobs.mapInPandas(run, schema=META_SCHEMA)


def decode_image(blobs: DataFrame) -> DataFrame:
    """STUB — image decode requires PIL/torchvision, absent in this container.
    The signature and batch shape are the contract a real decoder plugs into."""
    raise NotImplementedError(
        "image decode is stubbed in this environment; plug a decoder into "
        "fake_feature_extract's mapInPandas slot (same schema/batch shape)"
    )


def fake_feature_extract(blobs: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic pseudo-embedding per payload: md5-seeded unit vector.
    Arrow-batched like a real extractor (tensor-batch in, matrix out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                h = hashlib.md5(bytes(b)).digest()
                rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
                v = rng.standard_normal(dim).astype(np.float32)
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return blobs.mapInPandas(run, schema=FEAT_SCHEMA)
