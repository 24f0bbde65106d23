"""Multi-process (multi-host) runtime check — the never-before-run leg of
the distributed backend (SURVEY.md §5.8: "multi-host pod slices" via
``jax.distributed.initialize`` + per-host batch feeding).

The reference is single-device throughout (no counterpart file); this is
new TPU-native surface. ``run_multihost_step`` is the function each
process of a pod-style launch executes: bring up the distributed runtime
(`mesh.initialize_distributed`), build ONE global mesh over all processes'
devices, replicate model/optimizer state onto it, feed this host's local
batch rows through ``host_local_batch_to_global``, and run the standard
SPMD ``make_train_step``. On a real pod the same code path runs with
``initialize_distributed()`` auto-detecting the topology; here it is
exercised by ``tests/test_multihost.py`` as 2 localhost processes × 4
virtual CPU devices each (gloo cross-process collectives), asserting the
loss trajectory is bit-comparable to the single-process 8-device mesh.

Run one worker:
    python -m umnn_tpu.parallel.multihost --process_id I --num_processes N \
        --coordinator 127.0.0.1:PORT
(with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=4
in the environment). Prints one JSON line with the per-step losses and a
parameter checksum.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["run_multihost_step", "GLOBAL_BATCH", "N_STEPS"]

# deterministic global batch: every process derives the same array and
# feeds only its own row range (what a per-host data loader would do)
GLOBAL_BATCH_ROWS = 32
N_FEATURES = 4
N_STEPS = 3


def global_batch() -> np.ndarray:
    return np.asarray(
        np.random.RandomState(0).randn(GLOBAL_BATCH_ROWS, N_FEATURES), np.float32
    )


def _replicate_tree(tree, rep_sharding):
    """Replicate a host-local pytree onto a (possibly multi-process) mesh.

    With a ``P()`` sharding every process holds the full value, so
    ``make_array_from_process_local_data`` assembles the global replicated
    array from identical per-process copies.
    """
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rep_sharding, np.asarray(x)
        ),
        tree,
    )


def run_multihost_step(
    num_processes: int,
    process_id: int,
    coordinator: str | None = None,
) -> dict:
    """The per-process body of a multi-host data-parallel training step.

    Returns ``{"losses": [...], "param_sum": float, "n_devices": int,
    "n_local": int}`` where losses/param_sum are from globally-replicated
    arrays (identical on every process).
    """
    import jax
    import jax.numpy as jnp

    from umnn_tpu.models.flow import UMNNMAFFlow
    from umnn_tpu.parallel.mesh import (
        batch_sharded,
        data_mesh,
        host_local_batch_to_global,
        initialize_distributed,
        replicated,
    )
    from umnn_tpu.training.loops import make_optimizer, make_train_step

    initialize_distributed(coordinator, num_processes, process_id)

    mesh = data_mesh()  # all processes' devices — the global mesh
    rep, shd = replicated(mesh), batch_sharded(mesh)

    flow = UMNNMAFFlow(
        nb_flow=2,
        nb_in=N_FEATURES,
        hidden_embedding=(32, 32),
        hidden_derivative=(16, 16),
        embedding_s=4,
        nb_steps=12,
        backend="xla",
    )
    # identical init on every process (same seed), then lifted to one
    # globally-replicated pytree
    params_host = flow.init(jax.random.PRNGKey(0))
    opt = make_optimizer("adam", lr=1e-3, weight_decay=0.0)
    opt_state_host = opt.init(params_host)
    params = _replicate_tree(params_host, rep)
    opt_state = _replicate_tree(opt_state_host, rep)

    def loss_fn(p, xb):
        ll, _ = flow.compute_ll(p, xb)
        return -jnp.mean(ll)

    step = make_train_step(loss_fn, opt, mesh)

    batch = global_batch()
    rows_per_proc = GLOBAL_BATCH_ROWS // num_processes
    local = batch[process_id * rows_per_proc : (process_id + 1) * rows_per_proc]

    losses = []
    for _ in range(N_STEPS):
        xb = host_local_batch_to_global(local, mesh)
        params, opt_state, loss = step(params, opt_state, xb)
        losses.append(float(loss))

    param_sum = float(
        sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(params))
    )
    return {
        "losses": losses,
        "param_sum": param_sum,
        "n_devices": len(jax.devices()),
        "n_local": len(jax.local_devices()),
    }


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    args = p.parse_args()

    import jax

    # gloo is the CPU cross-process collectives backend; set before any
    # backend initialization (no-op if it is already the default)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    out = run_multihost_step(args.num_processes, args.process_id, args.coordinator)
    print("MULTIHOST_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
