from tpuva.dist.multistream import (  # noqa: F401
    init_multistream_carry,
    make_multistream_processor,
    make_stream_mesh,
    merge_stream_rows,
)
from tpuva.dist.pipeline import (  # noqa: F401
    MultiStreamPipeline,
    SpatialStreamPipeline,
    load_multistream_checkpoint,
    save_multistream_checkpoint,
)
from tpuva.dist.spatial import (  # noqa: F401
    make_space_mesh,
    make_spatial_processor,
)
