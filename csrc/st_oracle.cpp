// Native spatio-temporal Dijkstra oracle.
//
// Freshly written C++ implementation of the lattice shortest-path problem
// solved by the reference's Cython kernels (reference: st_cy.pyx:315-399
// `solve_s_t_path_fast`, st_cy.pyx:209-312 `solve_s_t_path_no_jerk_fast`).
// It exists for two reasons:
//   1. golden differential testing: the JAX dense-DP solver must agree with
//      a label-setting (heap) algorithm including tie-breaking, and this
//      oracle reproduces the heap's semantics (lexicographic tuple ordering,
//      LIFO-biased entry order where applicable) in portable C++;
//   2. a fast host-side fallback when no accelerator is present.
//
// Exposed as a C ABI for ctypes.  Build: csrc/build.sh (g++ -O2 -shared).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Node {
  double cost;
  int t;
  int s;
  double s_val;
  int prev_s;
  double prev_val;
  int second_s;
  double second_val;
};

// Python's heapq pops the lexicographically smallest tuple
// (cost, t, s, s_val, prev_s, prev_val, second_s, second_val); replicate
// that ordering exactly (std::priority_queue pops the *largest*, so the
// comparator is "greater-than").
struct NodeGreater {
  bool operator()(const Node& a, const Node& b) const {
    if (a.cost != b.cost) return a.cost > b.cost;
    if (a.t != b.t) return a.t > b.t;
    if (a.s != b.s) return a.s > b.s;
    if (a.s_val != b.s_val) return a.s_val > b.s_val;
    if (a.prev_s != b.prev_s) return a.prev_s > b.prev_s;
    if (a.prev_val != b.prev_val) return a.prev_val > b.prev_val;
    if (a.second_s != b.second_s) return a.second_s > b.second_s;
    return a.second_val > b.second_val;
  }
};

inline double penalty(double min_distance, double min_allowed) {
  if (min_distance < min_allowed)
    return 1000000.0 / std::max(min_distance, 1.0);
  return 1.0 / min_distance;
}

struct Weights {
  double d_w, v_w, a_w, j_w, v_des, v_max, a_min, a_max, j_min, j_max, d_min;
};

inline double edge_cost_jerk(double s, double s1, double s2, double s3,
                             double dt, double dist, const Weights& w) {
  double v = (s - s1) / dt;
  double a = (s - 2.0 * s1 + s2) / (dt * dt);
  double j = (s - 3.0 * s1 + 3.0 * s2 - s3) / (dt * dt * dt);
  return w.v_w * (v - w.v_des) * (v - w.v_des) + w.a_w * a * a +
         w.j_w * j * j + w.d_w * penalty(dist, w.d_min);
}

inline double edge_cost_no_jerk(double s, double s1, double s2, double dt,
                                double dist, const Weights& w) {
  double v = (s - s1) / dt;
  double a = (s - 2.0 * s1 + s2) / (dt * dt);
  return w.v_w * (v - w.v_des) * (v - w.v_des) + w.a_w * a * a +
         w.d_w * penalty(dist, w.d_min);
}

// Inclusive [lo, hi] grid-index interval for s in [range_min, range_max];
// trunc-then-bump lower bound (== ceil for the non-negative offsets that
// occur here) and truncated upper bound.
inline void range_indices(double start_s, double ds, double rmin, double rmax,
                          int* lo, int* hi) {
  double lo_exact = (rmin - start_s) / ds;
  int l = static_cast<int>(lo_exact);
  if (static_cast<double>(l) < lo_exact) l += 1;
  *lo = l;
  *hi = static_cast<int>((rmax - start_s) / ds);
}

}  // namespace

extern "C" {

// Jerk-limited solver.  obstacles: row-major (num_t, num_s) uint8;
// distances: row-major (num_t, num_s) double; out: num_t doubles.
void st_oracle_solve_fast(const uint8_t* obstacles, const double* s_values,
                          int num_s, const double* t_values, int num_t,
                          double v0, double a0, const double* distances,
                          double d_w, double v_w, double a_w, double j_w,
                          double v_des, double v_max, double a_min,
                          double a_max, double j_min, double j_max,
                          double d_min, double* out) {
  Weights w{d_w, v_w, a_w, j_w, v_des, v_max, a_min, a_max, j_min, j_max,
            d_min};
  const double ds = s_values[1] - s_values[0];
  const double dt = t_values[1] - t_values[0];
  const double start_s = s_values[0];
  const double est_prev = start_s - v0 * dt;
  const double est_second = est_prev - dt * (v0 - a0 * dt);

  std::vector<uint8_t> settled(static_cast<size_t>(num_t) * num_s, 0);
  std::vector<int32_t> parent(static_cast<size_t>(num_t) * num_s, 0);

  std::priority_queue<Node, std::vector<Node>, NodeGreater> heap;
  heap.push({0.0, 0, 0, start_s, 0, est_prev, 0, est_second});

  int best_t = 0, best_s = 0;
  while (!heap.empty()) {
    Node n = heap.top();
    heap.pop();
    size_t key = static_cast<size_t>(n.t) * num_s + n.s;
    if (settled[key]) continue;
    settled[key] = 1;
    parent[key] = n.prev_s;

    if (n.t > best_t) {
      best_t = n.t;
      best_s = n.s;
    }
    if (n.t == num_t - 1) break;

    double prev_v = (n.prev_val - n.second_val) / dt;
    double v = (n.s_val - n.prev_val) / dt;
    double a = (v - prev_v) / dt;
    double lo_a = std::max(a + j_min * dt, a_min);
    double hi_a = std::min(a + j_max * dt, a_max);
    double lo_v = std::max(v + lo_a * dt, 0.0);
    double hi_v = std::min(v + hi_a * dt, v_max);
    int lo, hi;
    range_indices(start_s, ds, n.s_val + lo_v * dt, n.s_val + hi_v * dt, &lo,
                  &hi);
    int nt = n.t + 1;
    for (int j = lo; j <= hi; ++j) {
      if (j >= num_s) break;
      size_t nk = static_cast<size_t>(nt) * num_s + j;
      if (settled[nk] || obstacles[nk]) continue;
      double sj = s_values[j];
      double c = edge_cost_jerk(sj, n.s_val, n.prev_val, n.second_val, dt,
                                distances[nk], w);
      heap.push({n.cost + c, nt, j, sj, n.s, n.s_val, n.prev_s, n.prev_val});
    }
  }

  for (int t = 0; t < num_t; ++t) out[t] = 0.0;
  int idx = best_s;
  for (int t = best_t; t >= 1; --t) {
    out[t] = s_values[idx];
    idx = parent[static_cast<size_t>(t) * num_s + idx];
  }
  out[0] = s_values[idx];
}

// No-jerk (t, s)-keyed solver; heap entries carry an entry-order field that
// makes equal-cost pops LIFO, matching the reference's entry_order counter
// (st_cy.pyx:225-243, decremented on every push).
void st_oracle_solve_no_jerk_fast(const uint8_t* obstacles,
                                  const double* s_values, int num_s,
                                  const double* t_values, int num_t,
                                  double v0, const double* distances,
                                  double d_w, double v_w, double a_w,
                                  double v_des, double v_max, double a_min,
                                  double a_max, double d_min, double* out) {
  Weights w{d_w, v_w, a_w, 0.0, v_des, v_max, a_min, a_max, 0.0, 0.0, d_min};
  const double ds = s_values[1] - s_values[0];
  const double dt = t_values[1] - t_values[0];
  const double start_s = s_values[0];
  const double est_prev = start_s - v0 * dt;

  struct NJNode {
    double cost;
    long long order;
    int t, s, prev_s;
  };
  struct NJGreater {
    bool operator()(const NJNode& a, const NJNode& b) const {
      if (a.cost != b.cost) return a.cost > b.cost;
      if (a.order != b.order) return a.order > b.order;
      if (a.t != b.t) return a.t > b.t;
      if (a.s != b.s) return a.s > b.s;
      return a.prev_s > b.prev_s;
    }
  };

  std::vector<uint8_t> settled(static_cast<size_t>(num_t) * num_s, 0);
  std::vector<int32_t> parent(static_cast<size_t>(num_t) * num_s, 0);
  std::priority_queue<NJNode, std::vector<NJNode>, NJGreater> heap;

  long long order = 0;
  int lo, hi;
  {
    double v = (start_s - est_prev) / dt;
    double lo_v = std::max(v + a_min * dt, 0.0);
    double hi_v = std::min(v + a_max * dt, v_max);
    range_indices(start_s, ds, start_s + lo_v * dt, start_s + hi_v * dt, &lo,
                  &hi);
    for (int j = lo; j <= hi && j < num_s; ++j) {
      if (obstacles[num_s + j]) continue;
      double c = edge_cost_no_jerk(s_values[j], start_s, est_prev, dt,
                                   distances[num_s + j], w);
      heap.push({c, order--, 1, j, 0});
    }
  }

  int best_t = 0, best_s = 0;
  while (!heap.empty()) {
    NJNode n = heap.top();
    heap.pop();
    size_t key = static_cast<size_t>(n.t) * num_s + n.s;
    if (settled[key]) continue;
    settled[key] = 1;
    parent[key] = n.prev_s;
    if (n.t == num_t - 1) {
      best_t = n.t;
      best_s = n.s;
      break;
    } else if (n.t > best_t) {
      best_t = n.t;
      best_s = n.s;
    }
    double sv = s_values[n.s];
    double pv = s_values[n.prev_s];
    double v = (sv - pv) / dt;
    double lo_v = std::max(v + a_min * dt, 0.0);
    double hi_v = std::min(v + a_max * dt, v_max);
    range_indices(start_s, ds, sv + lo_v * dt, sv + hi_v * dt, &lo, &hi);
    int nt = n.t + 1;
    for (int j = lo; j <= hi; ++j) {
      if (j >= num_s) break;
      size_t nk = static_cast<size_t>(nt) * num_s + j;
      if (settled[nk] || obstacles[nk]) continue;
      double c = edge_cost_no_jerk(s_values[j], sv, pv, dt, distances[nk], w);
      heap.push({n.cost + c, order--, nt, j, n.s});
    }
  }

  for (int t = 0; t < num_t; ++t) out[t] = 0.0;
  int idx = best_s;
  for (int t = best_t; t >= 1; --t) {
    out[t] = s_values[idx];
    idx = parent[static_cast<size_t>(t) * num_s + idx];
  }
  out[0] = s_values[idx];
}

}  // extern "C"
