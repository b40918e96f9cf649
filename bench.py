"""Benchmark: SLAM hot-path frames/s on one chip.

Measures the full per-frame odometry pipeline (GMA flow with 12
iterations + ATDNVO regression -> relative pose) at the reference
working resolution 376x1232 (ref: neural_slam.py:198,202-204) in
streaming (batch-1, carry-threaded) mode — the reference's own FPS
harness semantics (ref: test_slam.py:40-52, evaluate_odometry.py:66-77).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no FPS number (BASELINE.md).
The ATDN vSLAM paper (Periodica Polytechnica EECS 66(3), 2022) reports
the system running at ~10 frames/s on its single desktop GPU; we use
10 fps as the documented baseline denominator.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 10.0
H, W = 376, 1232
WARMUP = 3
ITERS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    step, (flow_vars, odo_vars, im1, im2, carry) = entry()
    fn = jax.jit(step, donate_argnums=(4,))

    # distinct frames so no call can alias a previous result
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
        for _ in range(8)
    ]

    # NOTE: block_until_ready alone is not a reliable fence through the
    # TPU tunnel used here — fetch the (tiny) pose matrix value every
    # step to force real execution before reading the clock.
    for i in range(WARMUP):
        mat, carry = fn(flow_vars, odo_vars, frames[i % 8], frames[(i + 1) % 8], carry)
    np.asarray(mat)

    times = []
    for i in range(ITERS):
        a, b = frames[i % 8], frames[(i + 1) % 8]
        t0 = time.perf_counter()
        mat, carry = fn(flow_vars, odo_vars, a, b, carry)
        np.asarray(mat)
        times.append(time.perf_counter() - t0)

    median = float(np.median(times))
    fps = 1.0 / median
    print(
        json.dumps(
            {
                "metric": "slam_odometry_frames_per_second_376x1232",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
