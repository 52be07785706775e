from tpuva.dist.multistream import (  # noqa: F401
    init_multistream_carry,
    make_multistream_processor,
    make_stream_mesh,
    merge_stream_rows,
)
