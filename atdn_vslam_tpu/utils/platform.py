"""Backend detection."""

from __future__ import annotations

import jax


def is_tpu() -> bool:
    """True iff the default backend is a TPU. Used to pick bfloat16
    compute and Pallas-TPU kernel dispatch — anything else (cpu, gpu)
    must take the XLA paths."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
