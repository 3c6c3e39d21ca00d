from whoosh_spark.codec.blocks import (
    BLOCKS_SCHEMA,
    decode_blocks_pdf,
    encode_term_bucket,
    varint_decode,
    varint_encode,
)

__all__ = [
    "BLOCKS_SCHEMA",
    "decode_blocks_pdf",
    "encode_term_bucket",
    "varint_decode",
    "varint_encode",
]
