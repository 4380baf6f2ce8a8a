"""Pin the train-loop log/val cadence to the reference's control flow.

The reference (training/train.py:161-185) nests the `% log_freq` tensorboard
+ validation check INSIDE the `% 100` console branch:

    if self.step % 100 == 0:
        ...console log...
        if self.step % self.opt.log_freq == 0:
            ...tensorboard log + val...

so tb+val fire at steps divisible by lcm(100, log_freq) — every 500 steps at
the default log_freq=250, and every 300 at log_freq=3.  `log_cadence`
preserves that exactly; this test compares it against a literal simulation
of the reference's nesting for many (step, log_freq) combinations.
"""

from footprints_tpu.train.trainer import log_cadence


def reference_cadence(step, log_freq):
    """Simulation of reference training/train.py:161-185 control flow."""
    console = False
    tb_and_val = False
    if step % 100 == 0:
        console = True
        if step % log_freq == 0:
            tb_and_val = True
    return console, tb_and_val


def test_cadence_matches_reference_control_flow():
    for log_freq in (1, 3, 7, 100, 250, 333, 500):
        for step in range(0, 2001):
            assert log_cadence(step, log_freq) == reference_cadence(step, log_freq), (
                f"divergence at step={step}, log_freq={log_freq}"
            )


def test_default_cadence_values():
    # Default log_freq=250: console at 0,100,200,...; tb+val at 0,500,1000,...
    console_steps = [s for s in range(1, 1200) if log_cadence(s, 250)[0]]
    tb_steps = [s for s in range(1, 1200) if log_cadence(s, 250)[1]]
    assert console_steps == [100, 200, 300, 400, 500, 600, 700, 800, 900, 1000, 1100]
    assert tb_steps == [500, 1000]


def test_log_freq_not_divisible_by_100():
    # log_freq=3 → tb+val at lcm(100, 3)=300 cadence, exactly as the
    # reference's nesting produces.
    tb_steps = [s for s in range(1, 1000) if log_cadence(s, 3)[1]]
    assert tb_steps == [300, 600, 900]
