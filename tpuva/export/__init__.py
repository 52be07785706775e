from tpuva.export.csvio import write_tracks_csv, read_tracks_csv  # noqa: F401
from tpuva.export.hdf5io import write_tracks_hdf5, read_tracks_hdf5  # noqa: F401
