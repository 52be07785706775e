from tpuva.compose.composer import VideoComposer  # noqa: F401
