"""Tabular Q-learning legacy path."""

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.prediction import make_state
from rl_mpc_lanemerging_tpu.rl import tabular

CFG = Settings()


def test_discretize_matches_reference_buckets():
    # ego at x=-70 (bucket 2), v=7 (bucket 2), behind car 8m away (bucket 1),
    # ahead car 30m away (bucket 3), behind rel speed +2 (bucket 3),
    # ahead rel speed -20 (bucket 0)
    st = make_state(-70.0, 5.0, 7.0, 0.0,
                    [-40.0, -78.0], [-13.0, 9.0], [0.0, 0.0])
    idx = tabular.discretize_state(st)
    vals = [int(v) for v in idx]
    assert vals[0] == 2          # x bucket
    assert vals[1] == 2          # speed bucket
    assert vals[2] == 1          # behind distance 8m
    assert vals[3] == 3          # ahead distance 30m
    assert vals[4] == 3          # behind rel speed +2
    assert vals[5] == 0          # ahead rel speed -20


def test_q_update_moves_toward_reward():
    q = tabular.initialize_q(CFG)
    visits = tabular.initialize_q(CFG)
    t_len = 4
    states6 = tuple(jnp.zeros(t_len, jnp.int32) for _ in range(6))
    actions = jnp.asarray([0, 1, 2, 3], jnp.int32)
    rewards = jnp.asarray([0.0, 0.0, 0.0, 10.0])
    valid = jnp.ones(t_len, bool)
    q2, visits2 = tabular.q_update_episode(q, visits, states6, actions,
                                           rewards, valid, 1.0, 0.5)
    # terminal transition learned half the reward
    assert np.isclose(float(q2[0, 0, 0, 0, 0, 0, 3]), 5.0)
    # earlier transitions bootstrap through the updated table
    assert float(q2[0, 0, 0, 0, 0, 0, 2]) > 0.0
    assert float(visits2.sum()) == 4.0


def test_greedy_tabular_controller_runs():
    q = tabular.initialize_q(CFG)
    q = q.at[..., 3].set(1.0)  # prefer action 3 everywhere
    visits = jnp.ones_like(q)
    ctrl = tabular.greedy_tabular_controller(q, visits, CFG)
    st = make_state(-70.0, 5.0, 7.0, 0.0, [-40.0], [9.0], [0.0])
    batch = jax.tree.map(lambda x: x[None], st)
    v = np.asarray(ctrl(batch))
    # action 3 = jerk +2.5 -> accel 0.5 -> v = 7 + 0.1
    assert np.isclose(v[0], 7.0 + 0.5 * 0.2, atol=1e-6)
