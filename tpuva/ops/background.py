"""Running-average background model (component A, SURVEY.md §2.3).

cv2.accumulateWeighted semantics (verified §8): ``B <- (1-alpha)*B +
alpha*F`` with a float32 accumulator. The expression form is pinned
identically in refimpl.pipeline so both paths round the same way.

The model is carried as `lax.scan` state across frame batches
(BASELINE.json:10 "rolling background model"), never leaving the device.
"""

from __future__ import annotations

import jax.numpy as jnp


def background_update(bg: jnp.ndarray, frame: jnp.ndarray, alpha) -> jnp.ndarray:
    """One update step. bg, frame: (..., H, W) float32."""
    a = jnp.float32(alpha)
    return (jnp.float32(1) - a) * bg + a * frame


def background_update_masked(
    bg: jnp.ndarray, frame: jnp.ndarray, alpha, mask: jnp.ndarray
) -> jnp.ndarray:
    """cv2.accumulateWeighted's optional update mask: pixels where mask is
    False keep the old background."""
    return jnp.where(mask, background_update(bg, frame, alpha), bg)
