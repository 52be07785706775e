from tpuva.dist.multistream import (  # noqa: F401
    init_multistream_carry,
    make_multistream_processor,
    make_stream_mesh,
    merge_stream_rows,
)
from tpuva.dist.pipeline import (  # noqa: F401
    MultiStreamPipeline,
    load_multistream_checkpoint,
    save_multistream_checkpoint,
)
