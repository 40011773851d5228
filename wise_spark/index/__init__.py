from .codec import (
    vb_encode,
    vb_decode,
    encode_postings,
    encode_postings_many,
    decode_postings,
    BLOCK,
)
from .build import build_index, IndexMeta
from .reader import FtsIndex
from .merge import merge_indexes, extend_index

__all__ = [
    "vb_encode",
    "vb_decode",
    "encode_postings",
    "encode_postings_many",
    "decode_postings",
    "BLOCK",
    "build_index",
    "IndexMeta",
    "FtsIndex",
    "merge_indexes",
    "extend_index",
]
