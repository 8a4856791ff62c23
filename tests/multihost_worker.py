"""Worker process for the real 2-process multi-host DP test.

Launched by tests/test_multihost.py via subprocess: each process owns 2
virtual CPU devices (4 global), joins a `jax.distributed` cluster, and
drives train steps through the production multi-host input path —
`local_batch_slice` -> `prefetch_batches` -> `put_batch` ->
`jax.make_array_from_process_local_data` (train/data.py) — exactly the
code a real multi-host TPU pod would run (SURVEY §2.5).

Usage: python tests/multihost_worker.py <pid> <nprocs> <port> <outfile>
"""

import json
import os
import sys


def main():
    pid, nprocs, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"

    # a sitecustomize hook imports jax at interpreter start (see
    # tests/conftest.py) — backend/device-count must be set via config,
    # not env vars
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 2 * nprocs

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
    from convkan_tpu.parallel.mesh import data_sharding, make_mesh
    from convkan_tpu.train.data import local_batch_slice, prefetch_batches
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    mesh = make_mesh()  # 4 global devices on the 'data' axis
    model = MLP_KAN_FACTORY["KAN"]([64, 16, 4])

    x0 = jnp.zeros((8, 8, 8, 1), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(1), x0,
                               steps_per_epoch=4)
    step = make_train_step(model, "MNIST", augment=False, mesh=mesh)

    # Deterministic global batches; every process holds the same host copy
    # and contributes only its local_batch_slice rows.
    rs = np.random.RandomState(0)
    batches = [(rs.randint(0, 256, (8, 8, 8, 1), dtype=np.uint8),
                rs.randint(0, 4, (8,), dtype=np.int32)) for _ in range(3)]

    def local_it():
        for xb, yb in batches:
            s, e = local_batch_slice(len(xb))
            yield xb[s:e], yb[s:e]

    sharding = data_sharding(mesh, 4)
    rng = jax.random.PRNGKey(0)
    losses = []
    for xb, yb in prefetch_batches(local_it(), sharding=sharding):
        state, loss = step(state, rng, xb, yb)
        losses.append(float(jax.device_get(loss)))

    with open(outfile, "w") as f:
        json.dump({"process": pid, "losses": losses}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
