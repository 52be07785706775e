"""Analysis algorithms (L3, reference: video/analysis/).

Host-side numpy utilities for geometry/curve/image measurement plus
device-backed helpers where batching pays off. Off the throughput metric
path (SURVEY.md §2.2): these serve the multi-pass application layer.
"""

from tpuva.analysis.regions import Rectangle  # noqa: F401
from tpuva.analysis.shapes import Circle, Ellipse  # noqa: F401
from tpuva.analysis.active_contour import ActiveContour  # noqa: F401
