"""Dump the backend-optimized HLO of the train step (with layout
assignments) and summarize the pure-relayout ops.

The trace reporter (tools/trace_train.py) attributes "data formatting"
time to op NAMES (copy.1028, fusion.123 ...); this tool maps those names
back to operand/result shapes WITH layouts so the producer/consumer pair
responsible for a relayout can be identified before attempting a fix
(PERF.md r5 roadmap item 1: only act on a trace that names the exact
pair).

Usage:
  python tools/dump_hlo.py [batch] [outfile]      # default 12 /tmp/train_step.hlo
  grep -n "copy" /tmp/train_step.hlo | ...
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_step.hlo"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")

    from tools.ablate_train import make_batch
    from footprints_tpu.models import FootprintNetwork
    from footprints_tpu.nn import layers
    from footprints_tpu.train import TrainStepConfig, init_train_state
    from footprints_tpu.train.step import build_train_step

    layers.set_default_precision("default")
    net = FootprintNetwork(depth=34)
    b = make_batch(batch)
    cfg = TrainStepConfig(steps_per_epoch=1000, compute_dtype="bfloat16")
    ts = init_train_state(net, jax.random.PRNGKey(0), cfg)
    step = jax.jit(build_train_step(net, cfg, mesh=False), donate_argnums=(0,))

    compiled = step.lower(ts, b).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 2**20:.1f} MB of optimized HLO to {out}")

    # summarize standalone copies (pure relayout: same shape, layout differs)
    pat = re.compile(
        r"^\s*%?(?P<name>[\w.\-]+) = (?P<rshape>\S+) copy\("
        r"(?P<oshape>\S+) %?(?P<opnd>[\w.\-]+)\)", re.M)
    rows = []
    for m in pat.finditer(txt):
        rows.append((m.group("name"), m.group("oshape"), m.group("rshape"),
                     m.group("opnd")))
    print(f"{len(rows)} standalone copy ops:")
    for name, oshape, rshape, opnd in rows:
        print(f"  {name}: {oshape} <- {opnd}  ->  {rshape}")


if __name__ == "__main__":
    main()
