"""Device kernels: ST lattice DP, QP smoother, PER segment tree, oracle."""
