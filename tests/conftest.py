"""Test configuration: run JAX on a simulated 8-device CPU mesh.

SURVEY.md §4.2 (verified recipe on this box): the env var alone is overridden
by the TPU platform plugin — jax.config must also be updated in-process
before first use. Golden tests compare against cv2 on CPU; the identical code
paths run on real TPU via bench.py / __graft_entry__.py.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: interpret-mode Pallas tests are
# compile-dominated on this 1-core box (~20 min cold); a warm cache cuts
# repeat suite runs to a fraction. Harmless no-op where unsupported.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
