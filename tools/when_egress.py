#!/usr/bin/env python
"""Re-armable runner for the egress-gated parity evidence.

Two pieces of north-star evidence need network access this box doesn't have
(zero egress — see PARITY.md "Status of the real-artifact check"):

1. Published-checkpoint parity: download the three md5-pinned GCS zips the
   reference ships (reference ``utils.py:105-141``) and assert <1e-3 MAE of
   our torch-free stack vs torch at each native resolution
   (``tests/test_parity_full_res.py -k published``).
2. Real ImageNet encoder weights: download torchvision's resnet34 weights
   (reference ``network.py:38``) and golden-test the converter on them
   (``tests/test_pretrained_encoder.py -k real_imagenet``).

This script runs both, classifies the outcome (PASS / SKIP-no-egress /
FAIL), and appends a dated line to PARITY.md's attempt ledger so each
round's re-attempt is on the record.  Run it once per round:

    python tools/when_egress.py            # run + append to PARITY.md
    python tools/when_egress.py --dry-run  # run, print, don't touch docs
"""

from __future__ import annotations

import argparse
import datetime
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
PARITY = REPO / "PARITY.md"
LEDGER_HEADER = "## Egress-gated attempt ledger"

TARGETS = [
    (
        "published-checkpoints",
        ["tests/test_parity_full_res.py", "-k", "published"],
    ),
    (
        "imagenet-encoder",
        ["tests/test_pretrained_encoder.py", "-k", "real_imagenet"],
    ),
]


def run_target(name: str, args: list[str]) -> tuple[str, str]:
    """Run one pytest target; return (status, detail).

    status: PASS | SKIP | FAIL | ERROR.  SKIP means the tests self-skipped
    (no egress); anything collected-and-failed is FAIL.
    """
    cmd = [sys.executable, "-m", "pytest", "-q", "-rs", *args]
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    out = proc.stdout + proc.stderr
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    summary = re.search(
        r"(\d+ passed)?(?:, )?(\d+ skipped)?(?:, )?(\d+ failed)?", tail
    )
    if proc.returncode == 0:
        if "passed" in tail:
            return "PASS", tail
        if "skipped" in tail:
            reason = re.search(r"SKIPPED \[\d+\] [^:]+:\d+: (.+)", out)
            return "SKIP", reason.group(1).strip() if reason else tail
        return "ERROR", tail
    if "failed" in tail or "error" in tail.lower():
        return "FAIL", tail
    return "ERROR", f"rc={proc.returncode}: {tail}"


def append_ledger(lines: list[str]) -> None:
    text = PARITY.read_text()
    if LEDGER_HEADER not in text:
        text += (
            f"\n{LEDGER_HEADER}\n\n"
            "One line per `tools/when_egress.py` run (each round re-attempts"
            " the\nnetwork-gated tests and records the outcome):\n\n"
        )
    text = text.rstrip("\n") + "\n" + "\n".join(lines) + "\n"
    PARITY.write_text(text)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dry-run", action="store_true", help="don't edit PARITY.md")
    opts = ap.parse_args()

    today = datetime.date.today().isoformat()
    lines, worst = [], "PASS"
    rank = {"PASS": 0, "SKIP": 1, "ERROR": 2, "FAIL": 3}
    for name, args in TARGETS:
        status, detail = run_target(name, args)
        line = f"- {today} `{name}`: **{status}** — {detail}"
        print(line)
        lines.append(line)
        if rank[status] > rank[worst]:
            worst = status

    if not opts.dry_run:
        append_ledger(lines)
        print(f"appended {len(lines)} lines to {PARITY.relative_to(REPO)}")
    # SKIP (no egress) is the expected steady state here, not a failure.
    return 0 if worst in ("PASS", "SKIP") else 1


if __name__ == "__main__":
    sys.exit(main())
