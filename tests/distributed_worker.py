"""Worker process for the real 2-process distributed test.

Launched by ``tests/test_distributed_multiprocess.py`` (2 processes,
CPU backend, 2 virtual devices each -> 4-device global mesh). Exercises
the actual ``jax.distributed`` bootstrap the reference never had
(SURVEY.md 2.26/5.8): env-var driven ``initialize``, ``host_shard``,
``allgather_host_arrays``, and one data-parallel odometry train step
whose gradient psum crosses the process boundary.

Prints ``WORKER_OK <process_id> loss=<loss>`` on success; any assert
or mismatch exits non-zero.
"""

import sys


def main() -> int:
    # initialize() must run before anything touches the XLA backend —
    # this is exactly the regression the round-2 review caught.
    from atdn_vslam_tpu.parallel import distributed

    if not distributed.initialize():
        raise SystemExit("expected multi-process env config")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    pid = jax.process_index()

    # a second initialize() is an idempotent no-op
    assert distributed.initialize() is True

    # host_shard: round-robin partition of a work list
    shard = distributed.host_shard(list(range(10)))
    assert shard == list(range(pid, 10, 2)), shard

    # allgather of per-host arrays
    gathered = distributed.allgather_host_arrays(
        np.full((3,), pid, np.int32)
    )
    assert len(gathered) == 2, gathered
    got = np.stack(gathered)
    assert (got == np.arange(2, dtype=np.int32)[:, None]).all(), got

    # one dp train step over the global 4-device mesh: batch sharded
    # over "data" (2 devices per process), params replicated — the
    # gradient all-reduce runs across the process boundary.
    from atdn_vslam_tpu.config import LossConfig, MeshConfig, TrainConfig
    from atdn_vslam_tpu.models.odometry import ATDNVO
    from atdn_vslam_tpu.parallel import make_mesh
    from atdn_vslam_tpu.training.odometry import init_state, make_train_step

    mesh = make_mesh(MeshConfig(data=4, model=1))
    b, t, h, w = 4, 2, 96, 192
    model = ATDNVO()
    cfg = TrainConfig(batch_size=b, sequence_length=t, lr=1e-3)
    state = jax.device_get(
        init_state(model, cfg, 10, jnp.zeros((b, t, h, w, 2)))
    )

    def globalize(np_tree, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), sharding, lambda idx: np.asarray(x)[idx]
            ),
            np_tree,
        )

    state = globalize(state, P())
    rng = np.random.default_rng(0)  # same seed -> same batch everywhere
    batch = globalize(
        (
            rng.normal(size=(b, t, h, w, 2)).astype(np.float32),
            rng.normal(size=(b, t, 3)).astype(np.float32) * 0.02,
            rng.normal(size=(b, t, 3)).astype(np.float32),
        ),
        P("data"),
    )
    step = make_train_step(
        model, cfg, LossConfig(), 10, mesh=mesh, donate=False
    )
    state, metrics = step(state, *batch)
    loss = float(metrics["loss"])  # fully replicated -> readable
    assert np.isfinite(loss), loss
    assert int(jax.device_get(state.step)) == 1

    print(f"WORKER_OK {pid} loss={loss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
