"""RL primitives: observation vectors, rewards, replay, tabular Q."""
