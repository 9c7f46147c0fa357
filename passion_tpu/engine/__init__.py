"""Runtime engine: sliding-window inference, evaluation sweep, training."""

from passion_tpu.engine.sliding_window import (  # noqa: F401
    SlidingWindowInference,
    window_coords,
    window_starts,
)
