from tpuva.app.tracks import Track, TrackCollection  # noqa: F401
from tpuva.app.passes import TrackingProject  # noqa: F401
from tpuva.app.params import Parameters  # noqa: F401
