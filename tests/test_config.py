import json

from rl_mpc_lanemerging_tpu import Settings


REFERENCE_STYLE_CONFIG = {
    "TASK": "ST",
    "LOG_DIR": "st_default",
    "NUM_EPISODES": 4000,
    "SEED": 0,
    "BASE_TRAFFIC_INTERVAL": 1.2,
    "OTHER_CAR_SPEED": 7.0,
    "REWARD_FUNCTION": "Slotted Jerk",
    "ALT_J_WEIGHT": 0.1,
    "S_DISCRETIZATION": 0.05,
    "T_DISCRETIZATION": 0.30,
    "FUTURE_S": 150.0,
    "FUTURE_T": 5.0,
    "V_WEIGHT": 0.5,
    "A_WEIGHT": 10.0,
    "J_WEIGHT": 10.0,
    "D_WEIGHT": 10.0,
    "MIN_ALLOWED_DISTANCE": 5,
    "CRASH_MIN_S": 20,
    # int-keyed dict coercion (reference config.py:168-169)
    "JERK_VALUES_DQN": {"0": -5, "1": -2.5, "2": 0, "3": 2.5, "4": 5},
}


def test_load_reference_style_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(REFERENCE_STYLE_CONFIG))
    cfg = Settings.load_from_file(str(p))
    assert cfg.TASK == "ST"
    assert cfg.NUM_EPISODES == 4000
    assert cfg.CRASH_MIN_S == 20
    assert cfg.JERK_VALUES_DQN == (-5.0, -2.5, 0.0, 2.5, 5.0)
    # untouched defaults survive
    assert cfg.TICK_LENGTH == 0.2


def test_static_grid_shapes():
    cfg = Settings()
    assert cfg.num_t == 18
    assert cfg.num_s == 3001
    assert cfg.fine_horizon == 26
    assert cfg.ticks_per_plan_step == 1 or cfg.TICK_LENGTH < cfg.T_DISCRETIZATION


def test_frozen_and_hashable():
    cfg = Settings()
    hash(cfg)  # usable as a static jit argument
    cfg2 = cfg.replace(D_WEIGHT=100.0)
    assert cfg2.D_WEIGHT == 100.0 and cfg.D_WEIGHT == 10.0


def test_obs_dim_matches_reference_layout():
    cfg = Settings()
    # 4 per car * (2 ahead + 2 behind) + ego (v, a, x, y) = 20
    assert cfg.obs_dim == 20
    assert cfg.replace(USE_ACCELERATION_OF_OTHER_CARS=False).obs_dim == 16
