"""Array-backed keyframe store.

The reference keeps keyframes as a python list of ``Frame`` records and
dumps one torch ``.pth`` RGB file per keyframe plus a ``poses.pth``
(ref: slam_framework/frame.py:1-16, neural_slam.py:149-153,212-215);
relocalization then *loops in python* over every keyframe to find the
nearest embedding (neural_slam.py:373-384).

TPU-native design: poses and embeddings live in contiguous arrays
(append is an index write), nearest-neighbor search is one batched
distance computation, and persistence is three ``.npy`` artifacts
(poses.npy, embeddings.npy, rgb/NNNNNN.npy) — a format a multi-host
deployment can shard by keyframe range.
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import Future, ThreadPoolExecutor

import numpy as np


class KeyframeStore:
    """:param async_writes: spill keyframe RGB to disk on a background
    thread (bounded to ``max_pending`` outstanding writes) so the
    SLAM hot loop is not blocked on file IO — the reference writes a
    ``.pth`` synchronously inside the per-frame call
    (neural_slam.py:212-215). Reads and ``save()`` drain pending
    writes first; worker errors re-raise on the caller thread."""

    def __init__(self, base_path: str, capacity: int = 4096,
                 async_writes: bool = True, max_pending: int = 8):
        self.base_path = base_path
        self.rgb_dir = os.path.join(base_path, "rgb")
        self.capacity = capacity
        self.count = 0
        self.poses = np.zeros((capacity, 4, 4), np.float64)
        self.embeddings: np.ndarray | None = None
        self._pool = (
            ThreadPoolExecutor(max_workers=1, thread_name_prefix="kf-io")
            if async_writes else None
        )
        self._pending: list[Future] = []
        self._max_pending = max_pending

    def _drain(self) -> None:
        """Wait for outstanding RGB writes; propagate worker errors."""
        try:
            for f in self._pending:
                f.result()
        finally:
            self._pending.clear()

    def flush(self) -> None:
        """Public drain: call before process exit to surface any
        pending write errors (reads/save()/initialize_cold() drain
        implicitly)."""
        self._drain()

    def __del__(self):  # best-effort terminal drain
        try:
            self._drain()
        except Exception:
            pass

    # -- lifecycle ------------------------------------------------------

    def initialize_cold(self) -> None:
        """Create/wipe the on-disk store (ref: neural_slam.py:108-123)."""
        self._drain()  # a pending write must not land after the wipe
        os.makedirs(self.rgb_dir, exist_ok=True)
        for f in glob.glob(os.path.join(self.rgb_dir, "*.npy")):
            os.remove(f)
        for name in ("poses.npy", "embeddings.npy"):
            p = os.path.join(self.base_path, name)
            if os.path.exists(p):
                os.remove(p)
        self.count = 0
        self.embeddings = None

    def load(self, with_embeddings: bool = False) -> None:
        """Warm start from disk (ref: neural_slam.py:77-106)."""
        poses = np.load(os.path.join(self.base_path, "poses.npy"))
        n = len(poses)
        if n > self.capacity:
            self.capacity = n
            self.poses = np.zeros((self.capacity, 4, 4), np.float64)
        self.poses[:n] = poses
        self.count = n
        if with_embeddings:
            self.embeddings = np.load(
                os.path.join(self.base_path, "embeddings.npy")
            )

    def save(self) -> None:
        self._drain()
        np.save(
            os.path.join(self.base_path, "poses.npy"),
            self.poses[: self.count],
        )
        if self.embeddings is not None:
            np.save(
                os.path.join(self.base_path, "embeddings.npy"),
                self.embeddings[: self.count],
            )

    # -- append / access ------------------------------------------------

    def rgb_path(self, index: int) -> str:
        return os.path.join(self.rgb_dir, f"{index:06d}.npy")

    def append(self, rgb: np.ndarray, pose: np.ndarray) -> int:
        """Register a keyframe: RGB (H, W, 3) uint8 to disk, pose to the
        array (ref: neural_slam.py:212-215)."""
        if self.count >= self.capacity:
            grown = np.zeros((self.capacity * 2, 4, 4), np.float64)
            grown[: self.count] = self.poses[: self.count]
            self.poses = grown
            self.capacity *= 2
        idx = self.count
        os.makedirs(self.rgb_dir, exist_ok=True)
        if self._pool is not None:
            # copy: np.asarray aliases an already-uint8 caller buffer,
            # and the write may run several appends later — a reused
            # camera buffer would be persisted with the WRONG frame
            rgb = np.array(rgb, np.uint8, copy=True)
            if len(self._pending) >= self._max_pending:
                # backpressure: wait only for the oldest write (a full
                # drain would stall the hot loop on every burst)
                self._pending.pop(0).result()
            self._pending.append(
                self._pool.submit(np.save, self.rgb_path(idx), rgb)
            )
        else:
            np.save(self.rgb_path(idx), np.asarray(rgb, np.uint8))
        self.poses[idx] = pose
        self.count += 1
        return idx

    def read_rgb(self, index: int) -> np.ndarray:
        self._drain()
        return np.load(self.rgb_path(index))

    def set_embeddings(self, embeddings: np.ndarray) -> None:
        if len(embeddings) != self.count:
            raise ValueError(
                f"{len(embeddings)} embeddings for {self.count} keyframes"
            )
        self.embeddings = np.asarray(embeddings)

    def nearest(self, code: np.ndarray) -> tuple[int, np.ndarray]:
        """Nearest keyframe by L2 embedding distance — one vectorized
        distance computation (replaces the python loop at
        neural_slam.py:373-384).

        :return: (index, distances (count,))."""
        if self.embeddings is None:
            raise RuntimeError("Store has no embeddings; run mapping first")
        emb = self.embeddings[: self.count].reshape(self.count, -1)
        d = np.linalg.norm(emb - code.reshape(1, -1), axis=1)
        return int(np.argmin(d)), d

    def __len__(self) -> int:
        return self.count


def nearest_sharded(mesh, embeddings, code):
    """Device-sharded nearest-neighbor search over the keyframe map.

    The embedding matrix is sharded over the mesh "data" axis (each
    device holds a keyframe range); the distance computation runs
    locally per shard and GSPMD inserts the cross-device argmin
    reduction over ICI. This is the pod-scale replacement for the
    host-side ``KeyframeStore.nearest`` (and for the reference's
    python loop, neural_slam.py:373-384).

    :param embeddings: (K, D) array. K not divisible by the data-axis
        size is padded with +inf rows (never win the argmin; their
        distances are sliced off the return).
    :param code: (D,) query embedding.
    :return: (index, distances (K,)) on host.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    emb = np.asarray(embeddings, np.float32)
    k = len(emb)
    dsize = mesh.shape["data"]
    k_pad = -(-k // dsize) * dsize
    if k_pad != k:
        emb = np.concatenate(
            [emb, np.full((k_pad - k, emb.shape[1]), np.inf, np.float32)]
        )
    emb_sharded = jax.device_put(
        jnp.asarray(emb), NamedSharding(mesh, P("data"))
    )
    code_repl = jax.device_put(
        jnp.asarray(code, jnp.float32), NamedSharding(mesh, P())
    )

    @jax.jit
    def search(emb, q):
        d = jnp.linalg.norm(emb - q[None, :], axis=1)
        return jnp.argmin(d), d

    idx, d = search(emb_sharded, code_repl)
    return int(idx), np.asarray(d)[:k]
