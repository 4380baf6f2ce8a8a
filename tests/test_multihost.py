"""Multi-host (multi-process) data-parallel execution of
parallel/distributed.py — the actual pod-slice contract.

Launches 2 local processes x 4 virtual CPU devices each
(jax.distributed.initialize with a localhost coordinator), has each host
load only its shard of a deterministic global batch, assemble global
arrays via ``global_batch_from_local``, and run one DP train step; then
asserts both processes converge to the SAME loss/params, equal to the
single-process 8-device reference computed in this process.

Skips (rather than fails) if the sandbox forbids the coordinator socket or
cross-process init times out — the semantics are still pinned by the
in-process reference path.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(stdout):
    for line in stdout.splitlines():
        if line.startswith("RESULT"):
            parts = dict(kv.split("=") for kv in line.split()[1:])
            return float(parts["loss"]), float(parts["checksum"])
    raise AssertionError(f"no RESULT line in:\n{stdout}")


def test_two_process_dp_step_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["JAX_PLATFORMS"] = ""  # let the worker's jax.config.update win
    env["PYTHONPATH"] = REPO  # `python tests/_worker.py` puts tests/ on path
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process coordinator timed out in this sandbox")

    for rc, out, err in outs:
        if rc != 0:
            lowered = (out + err).lower()
            if any(s in lowered for s in
                   ("permission", "unavailable", "deadline",
                    "failed to connect", "operation not permitted")):
                pytest.skip(f"distributed init blocked by sandbox: "
                            f"{err.strip().splitlines()[-1][:200]}")
            raise AssertionError(f"worker failed rc={rc}\n{out}\n{err}")

    results = [_parse(out) for _, out, _ in outs]
    # both processes must agree exactly (same compiled global program)
    assert results[0] == results[1], results

    # and match the single-process 8-device reference
    from . import _multihost_worker as w

    ref_loss, ref_checksum = w.reference_single_process()
    np.testing.assert_allclose(results[0][0], ref_loss, rtol=1e-6)
    np.testing.assert_allclose(results[0][1], ref_checksum, rtol=1e-6)
