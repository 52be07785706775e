from tpuva.track.table import TrackState, init_track_state, track_update  # noqa: F401
from tpuva.track.assign import greedy_assign, hungarian_assign  # noqa: F401
