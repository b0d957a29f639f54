from fdblucene_ray.codec.postings import (  # noqa: F401
    BLOCK_SIZE,
    PartitionPostings,
    encode_partition,
    EncodedPostings,
    decode_all,
    decode_block,
    encode_postings,
    read_skips,
)
from fdblucene_ray.codec.smallfloat import (  # noqa: F401
    byte4_to_int,
    decode_norms,
    encode_lengths,
    int_to_byte4,
)
from fdblucene_ray.codec.varint import varint_decode, varint_encode  # noqa: F401
