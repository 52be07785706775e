from tpuva.compose.composer import VideoComposer, annotate_tracks  # noqa: F401
