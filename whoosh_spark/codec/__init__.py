from whoosh_spark.codec.blocks import (
    BLOCKS_SCHEMA,
    decode_blocks_pdf,
    encode_term_bucket,
    varint_decode,
    varint_encode,
)
from whoosh_spark.codec.registry import (
    Codec,
    dump_index,
    get_codec,
    open_index,
    register_codec,
    sniff_codec,
)

__all__ = [
    "BLOCKS_SCHEMA",
    "Codec",
    "decode_blocks_pdf",
    "dump_index",
    "encode_term_bucket",
    "get_codec",
    "open_index",
    "register_codec",
    "sniff_codec",
    "varint_decode",
    "varint_encode",
]
