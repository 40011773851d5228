from .codec import vb_encode, vb_decode, encode_postings, decode_postings, BLOCK
from .build import build_index, IndexMeta
from .reader import FtsIndex

__all__ = [
    "vb_encode",
    "vb_decode",
    "encode_postings",
    "decode_postings",
    "BLOCK",
    "build_index",
    "IndexMeta",
    "FtsIndex",
]
