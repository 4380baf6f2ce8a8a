"""Benchmark: FootprintNetwork inference throughput on one TPU chip.

Headline: images/sec/chip at KITTI resolution 192x640 (batched, steady
state), plus p50 single-image latency, vs a PyTorch-CPU implementation of
the reference network (BASELINE.md north-star: >=10x torch-CPU single-image
latency).

Timing method: through the axon TPU tunnel `block_until_ready()` does not
actually synchronize, so we time N chained executions (each step's input
depends on the previous output, forcing serial device execution) ending with
a tiny host fetch, at two different N, and take the slope — this cancels the
fixed tunnel round-trip cost.  Validated against a known-FLOP matmul
(8192^3 bf16 measures ~186 TFLOP/s on v5e, consistent with peak).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np

H, W = 192, 640
BATCH = 16
N_LO, N_HI = 2, 12


def _slope_time(step_fn, init_carry, n_lo=N_LO, n_hi=N_HI):
    """Seconds per iteration via two chained runs (fixed costs cancel)."""

    def run(n):
        carry = init_carry
        t0 = time.perf_counter()
        for _ in range(n):
            carry, probe = step_fn(carry)
        _ = np.asarray(probe)  # tiny fetch -> true synchronization
        return time.perf_counter() - t0

    run(1)  # warm
    t_lo, t_hi = run(n_lo), run(n_hi)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def bench_jax(precision: str, batch: int):
    """precision 'default' benches the serving config (bf16 weights +
    activations); 'highest' benches the f32 checkpoint-parity config."""
    import jax
    import jax.numpy as jnp

    from footprints_tpu.models import FootprintNetwork
    from footprints_tpu.nn import layers

    layers.set_default_precision(precision)
    net = FootprintNetwork(depth=34)
    params, state = net.init(jax.random.PRNGKey(0))
    bf16 = precision == "default"
    if bf16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a is not None else None, params)

    @jax.jit
    def step(image):
        inp = image.astype(jnp.bfloat16) if bf16 else image
        out, _ = net.apply(params, state, inp, train=False)
        o = out["1/1"].astype(jnp.float32)
        # feed a scalar of the output back into the next input: forces the
        # chain to execute serially on device, and returns a 1-element probe
        nxt = image * 0.999 + 1e-4 * jnp.mean(o)
        return nxt, jnp.sum(o[0, 0, 0])

    x = jnp.asarray(np.random.RandomState(0).rand(batch, H, W, 3), jnp.float32)
    sec_per_iter = _slope_time(lambda c: step(c), x)
    return batch / sec_per_iter, sec_per_iter


def bench_torch_cpu():
    """Reference-equivalent network in torch on CPU, single image median."""
    try:
        import torch

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.torch_oracle import FootprintNetwork as TorchNet
    except Exception as e:
        print(f"torch baseline unavailable: {e}", file=sys.stderr)
        return None
    torch.set_num_threads(os.cpu_count() or 1)
    net = TorchNet().eval()
    x = torch.rand(1, 3, H, W)
    with torch.no_grad():
        net(x)  # warmup
        lats = []
        for _ in range(3):
            t0 = time.perf_counter()
            net(x)
            lats.append(time.perf_counter() - t0)
    return statistics.median(lats)


def main():
    import jax

    device = jax.devices()[0]
    imgs_sec_bf16, _ = bench_jax("default", BATCH)
    imgs_sec_f32, _ = bench_jax("highest", BATCH)
    _, lat1_bf16 = bench_jax("default", 1)
    torch_p50 = bench_torch_cpu()

    vs_baseline = (torch_p50 / lat1_bf16) if torch_p50 else None
    record = {
        "metric": "imgs_per_sec_per_chip_192x640",
        "value": round(imgs_sec_bf16, 2),
        "unit": "imgs/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "device": str(device),
        "p50_latency_ms_bf16": round(lat1_bf16 * 1e3, 3),
        "imgs_per_sec_f32": round(imgs_sec_f32, 2),
        "torch_cpu_p50_ms": round(torch_p50 * 1e3, 1) if torch_p50 else None,
        "batch": BATCH,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
