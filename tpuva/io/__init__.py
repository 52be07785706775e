from tpuva.io.base import VideoBase, VideoSlice, VideoImageStack  # noqa: F401
from tpuva.io.memory import VideoMemory  # noqa: F401
from tpuva.io.file import (  # noqa: F401
    RobustVideo,
    VideoFile,
    VideoFileStack,
    VideoFileWriter,
    load_any_video,
)
from tpuva.io.parallel_decode import ParallelVideoReader  # noqa: F401
from tpuva.io.pipe import VideoPipe  # noqa: F401
from tpuva.io.fork import VideoFork  # noqa: F401
from tpuva.io.staging import BatchStager  # noqa: F401
