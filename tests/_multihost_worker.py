"""Worker process for tests/test_multihost.py.

Each process owns 4 virtual CPU devices; two processes form an 8-device
global mesh through ``parallel.distributed.initialize`` (localhost
coordinator).  The worker loads only ITS slice of a deterministic global
batch (``host_batch_slice``), assembles global arrays with
``global_batch_from_local``, runs one data-parallel SGD step of a small
convnet, and prints the resulting loss + a param checksum for the parent
test to compare against the single-process 8-device reference.

Run standalone:  python tests/_multihost_worker.py <pid> <nprocs> <port>
"""

import sys

import jax

if __name__ == "__main__":
    # worker-process platform setup ONLY — this module is also imported by
    # the parent pytest process (for the single-process reference), whose
    # backend is already configured by tests/conftest.py
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

GLOBAL_BATCH = 16
H = W = 8


def make_params():
    rng = np.random.RandomState(0)
    return {
        "w1": jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.1),
        "b1": jnp.zeros((8,), jnp.float32),
        "w2": jnp.asarray(rng.randn(3, 3, 8, 1).astype(np.float32) * 0.1),
        "b2": jnp.zeros((1,), jnp.float32),
    }


def make_global_batch():
    rng = np.random.RandomState(1)
    return {
        "x": rng.rand(GLOBAL_BATCH, H, W, 3).astype(np.float32),
        "y": rng.rand(GLOBAL_BATCH, H, W, 1).astype(np.float32),
    }


def loss_fn(params, batch):
    def conv(x, w, b):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn) + b

    h = jax.nn.relu(conv(batch["x"], params["w1"], params["b1"]))
    pred = conv(h, params["w2"], params["b2"])
    return jnp.mean((pred - batch["y"]) ** 2)


def train_step(params, batch, lr=0.1):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


def run_distributed(process_id, num_processes, port):
    from footprints_tpu.parallel import (distributed, make_mesh,
                                         replicate_tree)

    distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    mesh = make_mesh()
    global_batch = make_global_batch()
    start, size = distributed.host_batch_slice(GLOBAL_BATCH)
    local = {k: v[start:start + size] for k, v in global_batch.items()}
    batch = distributed.global_batch_from_local(mesh, local)

    params = replicate_tree(mesh, make_params())
    step = jax.jit(train_step, out_shardings=None)
    new_params, loss = step(params, batch)
    checksum = sum(float(jnp.sum(jnp.abs(p))) for p in jax.tree.leaves(new_params))
    print(f"RESULT pid={process_id} loss={float(loss):.10f} "
          f"checksum={checksum:.10f}", flush=True)


def reference_single_process():
    """The same step on whatever devices this process has (no distributed)."""
    from footprints_tpu.parallel import make_mesh, replicate_tree, shard_batch

    mesh = make_mesh()
    batch = shard_batch(mesh, make_global_batch())
    params = replicate_tree(mesh, make_params())
    new_params, loss = jax.jit(train_step)(params, batch)
    checksum = sum(float(jnp.sum(jnp.abs(p))) for p in jax.tree.leaves(new_params))
    return float(loss), checksum


if __name__ == "__main__":
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    run_distributed(pid, nprocs, port)
