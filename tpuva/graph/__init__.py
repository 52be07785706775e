from tpuva.graph.config import (  # noqa: F401
    BackgroundConfig,
    BlurConfig,
    MedianConfig,
    MorphConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
