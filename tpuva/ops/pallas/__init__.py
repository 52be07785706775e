from tpuva.ops.pallas.fused_segment import fused_segment  # noqa: F401
