"""RL agents: DQN, DDPG, Rainbow trainers and the combined arbiter."""
