"""Frame-budget loop helper (advisor r2: the truncation bug fixed in DDPG
was still in Rainbow; both now share ``frame_budget_rounds``)."""

import logging

from rl_mpc_lanemerging_tpu.agents.budget import frame_budget_rounds


def test_reaches_target_when_accrual_is_slow():
    """Even at ~5% valid-frame accrual the loop must reach the target
    (the old estimated-rounds cap silently stopped at a fraction)."""
    target = 10_000
    per_round_upper = 1_000   # theoretical max frames/round
    accrual = 50              # actual frames/round (5%)
    frames = 0
    rounds = 0
    for _ in frame_budget_rounds(target, per_round_upper):
        frames += accrual
        rounds += 1
        if frames >= target:
            break
    assert frames >= target
    assert rounds == target // accrual


def test_warns_when_cap_exhausted(caplog):
    with caplog.at_level(logging.WARNING,
                         logger="rl_mpc_lanemerging_tpu.agents.budget"):
        for _ in frame_budget_rounds(1_000, 100, safety=2):
            pass  # caller never breaks: accrual is zero
    assert any("training ends short" in r.message for r in caplog.records)


def test_zero_denominator_guard():
    gen = frame_budget_rounds(100, 0, safety=1)
    assert next(gen) == 0
