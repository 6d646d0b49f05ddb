// Native topology-burst kernel.
//
// C++ implementation of the host-side SPR/subtree-slide machinery, a direct
// port of THIS repo's validated Python modules (delphy_tpu/topo/{site_deltas,
// history,graft,study,mixer,vsc}.py — which are themselves TPU-era re-designs
// of the reference's core/spr_move.cpp, core/spr_study.cpp, core/subrun.cpp,
// core/very_scalable_coalescent.cpp).  One extern-"C" call runs a whole burst
// of topology moves on a CSR-serialized tree; the GIL is released for the
// duration, so bursts on different tree partitions run on a plain thread pool
// (the reference's ctpl architecture, run.cpp:682-693).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC topo_native.cpp -o _topo_native.so

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <stdexcept>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr int32_t NO_NODE = -1;
constexpr double ROOT_DELTA_T = -1.0e30;
constexpr double NEG_BIG = -1.7976931348623157e308;

struct Mut {
  int32_t site;
  int8_t from, to;
  double t;
};

static inline bool mut_less(const Mut& a, const Mut& b) {
  if (a.t != b.t) return a.t < b.t;
  return a.site < b.site;
}

// ---- sorted-site-set helpers (Python: plain `set` of sites) ---------------

using Sites = std::vector<int32_t>;  // sorted, unique

static inline bool sites_contains(const Sites& s, int32_t l) {
  return std::binary_search(s.begin(), s.end(), l);
}

static inline void sites_insert(Sites& s, int32_t l) {
  auto it = std::lower_bound(s.begin(), s.end(), l);
  if (it == s.end() || *it != l) s.insert(it, l);
}

static inline Sites sites_union(const Sites& a, const Sites& b) {
  Sites out;
  out.reserve(a.size() + b.size());
  std::set_union(a.begin(), a.end(), b.begin(), b.end(),
                 std::back_inserter(out));
  return out;
}

static inline Sites sites_minus(const Sites& a, const Sites& b) {
  Sites out;
  out.reserve(a.size());
  std::set_difference(a.begin(), a.end(), b.begin(), b.end(),
                      std::back_inserter(out));
  return out;
}

static inline Sites sites_intersect(const Sites& a, const Sites& b) {
  Sites out;
  std::set_intersection(a.begin(), a.end(), b.begin(), b.end(),
                        std::back_inserter(out));
  return out;
}

// Warm/hot site sets: either a concrete set or "all L sites except excluded"
// (Python: ComplementSites).
struct SiteSet {
  bool complement = false;
  Sites s;

  int64_t size(int32_t L) const {
    return complement ? (int64_t)L - (int64_t)s.size() : (int64_t)s.size();
  }
  bool contains(int32_t l) const {
    bool in = sites_contains(s, l);
    return complement ? !in : in;
  }
  SiteSet minus(const Sites& other) const {
    SiteSet out;
    if (complement) {
      out.complement = true;
      out.s = sites_union(s, other);
    } else {
      out.complement = false;
      out.s = sites_minus(s, other);
    }
    return out;
  }
};

// ---- tree -----------------------------------------------------------------

struct Node {
  int32_t parent = NO_NODE;
  int32_t c0 = NO_NODE, c1 = NO_NODE;
  double t = 0.0, t_min = 0.0, t_max = 0.0;
  std::vector<Mut> muts;                     // time-ordered (t, site)
  Sites miss;                                // missing sites on this branch
  std::unordered_map<int32_t, int8_t> fs;    // missation from_states != ref
};

struct Tree {
  std::vector<Node> nodes;
  int32_t root = NO_NODE;
  int32_t num_tips = 0;
  int32_t L = 0;
  const uint8_t* ref_seq = nullptr;

  bool is_tip(int32_t n) const { return nodes[n].c0 == NO_NODE; }
  int32_t sibling(int32_t parent, int32_t child) const {
    const Node& p = nodes[parent];
    return p.c0 == child ? p.c1 : p.c0;
  }
};

static inline int8_t get_from_state(const Tree& t, int32_t node, int32_t site) {
  auto it = t.nodes[node].fs.find(site);
  return it != t.nodes[node].fs.end() ? it->second
                                      : (int8_t)t.ref_seq[site];
}

static inline void set_from_state(Tree& t, int32_t node, int32_t site, int8_t s) {
  if (s == (int8_t)t.ref_seq[site])
    t.nodes[node].fs.erase(site);
  else
    t.nodes[node].fs[site] = s;
}

// ---- site-delta algebra (site_deltas.py) ----------------------------------

struct FT { int8_t from, to; };
using Deltas = std::unordered_map<int32_t, FT>;

struct DeltaChainBroken : std::runtime_error {
  DeltaChainBroken() : std::runtime_error("delta chain broken") {}
};

static inline void push_back_d(Deltas& d, int32_t site, int8_t frm, int8_t to) {
  auto it = d.find(site);
  if (it != d.end()) {
    if (it->second.to != frm) throw DeltaChainBroken();
    if (it->second.from == to)
      d.erase(it);
    else
      it->second.to = to;
  } else if (frm != to) {
    d.emplace(site, FT{frm, to});
  }
}

static inline void push_front_d(Deltas& d, int32_t site, int8_t frm, int8_t to) {
  auto it = d.find(site);
  if (it != d.end()) {
    if (it->second.from != to) throw DeltaChainBroken();
    if (frm == it->second.to)
      d.erase(it);
    else
      it->second.from = frm;
  } else if (frm != to) {
    d.emplace(site, FT{frm, to});
  }
}

static Deltas compose_d(const Deltas& d1, const Deltas& d2) {
  Deltas out = d1;
  for (const auto& kv : d2) push_back_d(out, kv.first, kv.second.from, kv.second.to);
  return out;
}

// State of `site` at point (branch, t): first mutation at/above wins.
static int8_t state_at(const Tree& tr, int32_t branch, double t, int32_t site) {
  int32_t cur = branch;
  bool first = true;
  while (cur != NO_NODE) {
    const auto& muts = tr.nodes[cur].muts;
    for (auto it = muts.rbegin(); it != muts.rend(); ++it) {
      if (first && it->t > t) continue;
      if (it->site == site) return it->to;
    }
    first = false;
    cur = tr.nodes[cur].parent;
  }
  return (int8_t)tr.ref_seq[site];
}

// Site deltas between two tree points, composed through the root.
static Deltas deltas_between(const Tree& tr, int32_t ba, double ta,
                             int32_t bb, double tb) {
  Deltas out;
  int32_t cur = ba;
  bool first = true;
  while (cur != NO_NODE) {
    const auto& muts = tr.nodes[cur].muts;
    for (auto it = muts.rbegin(); it != muts.rend(); ++it) {
      if (first && it->t > ta) continue;
      push_back_d(out, it->site, it->to, it->from);
    }
    first = false;
    cur = tr.nodes[cur].parent;
  }
  std::vector<int32_t> path;
  cur = bb;
  while (cur != NO_NODE) {
    path.push_back(cur);
    cur = tr.nodes[cur].parent;
  }
  for (size_t i = path.size(); i-- > 0;) {
    int32_t node = path[i];
    bool last = (i == 0);
    for (const Mut& m : tr.nodes[node].muts) {
      if (last && m.t > tb) break;
      push_back_d(out, m.site, m.from, m.to);
    }
  }
  return out;
}

// ---- incomplete gamma (study needs Q(a,x) and its inverse) ----------------

// Regularized upper incomplete gamma Q(a, x), series + continued fraction.
static double gamma_Q(double a, double x) {
  if (x < 0.0 || a <= 0.0) return 1.0;
  if (x == 0.0) return 1.0;
  if (x < a + 1.0) {
    // P(a,x) by series, Q = 1 - P
    double ap = a, sum = 1.0 / a, del = sum;
    for (int i = 0; i < 500; i++) {
      ap += 1.0;
      del *= x / ap;
      sum += del;
      if (std::fabs(del) < std::fabs(sum) * 1e-15) break;
    }
    double P = sum * std::exp(-x + a * std::log(x) - std::lgamma(a));
    return std::max(0.0, 1.0 - P);
  }
  // Q by Lentz continued fraction
  double b = x + 1.0 - a, c = 1e300, d = 1.0 / b, h = d;
  for (int i = 1; i < 500; i++) {
    double an = -1.0 * i * (i - a);
    b += 2.0;
    d = an * d + b;
    if (std::fabs(d) < 1e-300) d = 1e-300;
    c = b + an / c;
    if (std::fabs(c) < 1e-300) c = 1e-300;
    d = 1.0 / d;
    double del = d * c;
    h *= del;
    if (std::fabs(del - 1.0) < 1e-15) break;
  }
  return std::exp(-x + a * std::log(x) - std::lgamma(a)) * h;
}

// Inverse of Q(a, .): find x with Q(a, x) = q (bisection; rare path).
static double gamma_Qinv(double a, double q) {
  if (q >= 1.0) return 0.0;
  if (q <= 0.0) return a + 100.0 * std::sqrt(a) + 100.0;
  double lo = 0.0, hi = std::max(a, 1.0);
  while (gamma_Q(a, hi) > q) {
    hi *= 2.0;
    if (hi > 1e12) break;
  }
  for (int i = 0; i < 200; i++) {
    double mid = 0.5 * (lo + hi);
    if (gamma_Q(a, mid) > q)
      lo = mid;
    else
      hi = mid;
    if (hi - lo < 1e-12 * (1.0 + hi)) break;
  }
  return 0.5 * (lo + hi);
}

// log(Q(a, x_min) - Q(a, x_max))  (safe_gamma_math.h:82-90)
static double safe_log_gamma_integral(double a, double x_min, double x_max) {
  double diff = std::max(gamma_Q(a, x_min) - gamma_Q(a, x_max), 0.0);
  return diff > 0.0 ? std::log(diff) : -INFINITY;
}

// ---- RNG ------------------------------------------------------------------

struct Rng {
  std::mt19937_64 g;
  explicit Rng(uint64_t seed) : g(seed) {}
  double uniform() { return std::uniform_real_distribution<double>(0.0, 1.0)(g); }
  double uniform(double a, double b) {
    return std::uniform_real_distribution<double>(a, b)(g);
  }
  int64_t integers(int64_t lo, int64_t hi) {  // [lo, hi)
    return std::uniform_int_distribution<int64_t>(lo, hi - 1)(g);
  }
  double normal(double m, double s) {
    return std::normal_distribution<double>(m, s)(g);
  }
  double exponential(double scale) {
    return std::exponential_distribution<double>(1.0 / scale)(g);
  }
  int64_t poisson(double lam) {
    return std::poisson_distribution<int64_t>(lam)(g);
  }
};

// ---- population models (host mirrors of pop.py / mixer.py adapters) -------

struct PopModel {
  // kind 0: exp (t0, n0, g, min_pop); kind 1: skygrid (type, K knots x, gamma)
  int32_t kind = 0;
  double t0 = 0, n0 = 0, gr = 0, min_pop = 0;
  int32_t sg_type = 1;  // 1 = staircase, 0 = log-linear
  std::vector<double> x, gamma;

  double log_N(double t) const {  // skygrid only
    int32_t M = (int32_t)x.size() - 1;
    int32_t k = (int32_t)(std::lower_bound(x.begin(), x.end(), t) - x.begin());
    if (k == 0) return gamma[0];
    if (k > M) return gamma[M];
    if (sg_type == 1) return gamma[k];
    double c = (t - x[k - 1]) / (x[k] - x[k - 1]);
    return (1 - c) * gamma[k - 1] + c * gamma[k];
  }

  double pop_at(double t) const {
    if (kind == 0)
      return std::max(min_pop, n0 * std::exp((t - t0) * gr));
    return std::exp(log_N(t));
  }

  double pop_integral(double a, double b) const {
    if (kind == 0) {
      double g = gr, mp = min_pop;
      if (mp == 0.0) {
        if (g == 0.0) return (b - a) * n0;
        return n0 / g * std::exp(g * (a - t0)) * std::expm1(g * (b - a));
      }
      if (g == 0.0) return (b - a) * std::max(mp, n0);
      double t_c = t0 + std::log(mp / n0) / g;
      double lo_c = std::min(std::max(t_c, a), b);
      if (g > 0.0) {
        double unc = n0 / g * std::exp(g * (lo_c - t0)) * std::expm1(g * (b - lo_c));
        return (lo_c - a) * mp + unc;
      }
      double unc = n0 / g * std::exp(g * (a - t0)) * std::expm1(g * (lo_c - a));
      return unc + (b - lo_c) * mp;
    }
    // skygrid: piecewise over knot intervals intersecting [a, b]
    int32_t M = (int32_t)x.size() - 1;
    double total = 0.0;
    for (int32_t k = 0; k < M + 2; k++) {
      double lo = std::max(a, k == 0 ? -1e308 : x[k - 1]);
      double hi = std::min(b, k == M + 1 ? 1e308 : x[k]);
      if (hi <= lo) continue;
      if (k == 0)
        total += std::exp(gamma[0]) * (hi - lo);
      else if (k == M + 1)
        total += std::exp(gamma[M]) * (hi - lo);
      else if (sg_type == 1)
        total += std::exp(gamma[k]) * (hi - lo);
      else {
        double c_lo = (lo - x[k - 1]) / (x[k] - x[k - 1]);
        double c_hi = (hi - x[k - 1]) / (x[k] - x[k - 1]);
        double G_lo = (1 - c_lo) * gamma[k - 1] + c_lo * gamma[k];
        double G_hi = (1 - c_hi) * gamma[k - 1] + c_hi * gamma[k];
        double D = G_hi - G_lo;
        if (D == 0.0)
          total += std::exp(G_lo) * (hi - lo);
        else
          total += std::exp(G_lo) * (hi - lo) * std::expm1(D) / D;
      }
    }
    return total;
  }
};

// ---- coalescent adapters --------------------------------------------------

// Host cell grid over [t_lo, t_lo + C*t_step) (mixer.py HostCoalGrid).
struct CoalGrid {
  const PopModel* pop;
  double t_lo = 0, t_step = 0;
  int32_t C = 0;
  std::vector<double> k_bar, popsize_bar;
  std::pair<double, double> pending{0, 0};  // (old_t, new_t) of a proposal

  void build(const Tree& tr, const PopModel* p, int32_t num_cells,
             double t_max_tip) {
    pop = p;
    double t_root = tr.nodes[tr.root].t;
    double span = std::max(t_max_tip - t_root, 1.0);
    t_lo = t_root - 0.35 * span - 1.0;
    t_step = (t_max_tip - t_lo) / num_cells;
    C = num_cells;
    k_bar.assign(C, 0.0);
    for (size_t n = 0; n < tr.nodes.size(); n++) {
      double sign = tr.is_tip((int32_t)n) ? 1.0 : -1.0;
      double rel = (tr.nodes[n].t - t_lo) / t_step;
      // cell i gains sign * clip(rel - i, 0, 1)
      if (rel <= 0.0) continue;
      int32_t full = std::min((int32_t)std::floor(rel), C);
      for (int32_t i = 0; i < full; i++) k_bar[i] += sign;
      if (full < C && rel > full) k_bar[full] += sign * (rel - full);
    }
    popsize_bar.resize(C);
    for (int32_t i = 0; i < C; i++) {
      double lb = t_lo + t_step * i;
      popsize_bar[i] = std::max(pop->pop_integral(lb, lb + t_step) / t_step,
                                1e-100);
    }
  }

  // delta log-prior of moving an inner node old_t -> new_t (no commit)
  double displace_delta(double old_t, double new_t) {
    double delta = 0.0;
    for (int32_t i = 0; i < C; i++) {
      double lb = t_lo + t_step * i;
      double fo = std::min(std::max((old_t - lb) / t_step, 0.0), 1.0);
      double fn = std::min(std::max((new_t - lb) / t_step, 0.0), 1.0);
      double dk = -(fn - fo);  // inner node: sign = -1
      if (dk == 0.0) continue;
      double k = k_bar[i];
      double kn = k + dk;
      delta -= t_step * (kn * (kn - 1.0) - k * (k - 1.0)) / (2.0 * popsize_bar[i]);
    }
    delta -= std::log(pop->pop_at(new_t)) - std::log(pop->pop_at(old_t));
    pending = {old_t, new_t};
    return delta;
  }

  void commit() {
    double old_t = pending.first, new_t = pending.second;
    for (int32_t i = 0; i < C; i++) {
      double lb = t_lo + t_step * i;
      double fo = std::min(std::max((old_t - lb) / t_step, 0.0), 1.0);
      double fn = std::min(std::max((new_t - lb) / t_step, 0.0), 1.0);
      k_bar[i] += -(fn - fo);
    }
  }
};

// Very-scalable partition-decoupled partial prior (vsc.py VscPart).
// Cells grow INTO THE PAST from t_ref: cell_for(t) = floor((t_ref - t)/dt).
struct VscPart {
  const PopModel* pop;
  bool includes_tree_root = false;
  double t_ref = 0, t_step = 0;
  std::vector<double> k_bar_p, k_twiddle_bar_p, k_twiddle_bar, popsize_bar;
  std::vector<double> num_active;
  Rng* rng = nullptr;
  std::pair<double, double> pending{0, 0};

  int32_t cell_for(double t) const {
    return (int32_t)std::floor((t_ref - t) / t_step);
  }

  void ensure_space(double t) {
    if (!includes_tree_root) return;
    int32_t max_cell = cell_for(t);
    for (int32_t i = (int32_t)popsize_bar.size(); i <= max_cell; i++) {
      double lb = t_ref - t_step * (i + 1);
      double ub = t_ref - t_step * i;
      popsize_bar.push_back(std::max(pop->pop_integral(lb, ub) / t_step, 1e-100));
      num_active.push_back(1.0);
    }
    for (int32_t i = (int32_t)k_bar_p.size(); i <= max_cell; i++) {
      double sigma = std::sqrt(popsize_bar[i] / t_step);
      double kt = rng->normal(0.0, sigma);
      k_bar_p.push_back(1.0);
      k_twiddle_bar_p.push_back(kt);
      k_twiddle_bar.push_back(kt);
    }
  }

  void add_interval(double t_start, double t_end, double delta_k) {
    if (t_start < t_end) std::swap(t_start, t_end);
    int32_t cs = cell_for(t_start);
    int32_t ce = (int32_t)k_bar_p.size() - 1;
    double lb_last = t_ref - t_step * (ce + 1);
    if (t_end != lb_last) ce = cell_for(t_end);
    if (cs == ce) {
      k_bar_p[cs] += delta_k * (t_start - t_end) / t_step;
      return;
    }
    double lb_cs = t_ref - t_step * (cs + 1);
    k_bar_p[cs] += delta_k * (t_start - lb_cs) / t_step;
    double ub_ce = t_ref - t_step * ce;
    k_bar_p[ce] += delta_k * (ub_ce - t_end) / t_step;
    for (int32_t c = cs + 1; c < ce; c++) k_bar_p[c] += delta_k;
  }

  double cell_term(int32_t i, double dk) const {
    double old = k_bar_p[i], nw = old + dk;
    return -(t_step / popsize_bar[i]) *
           (0.5 * (nw * nw - old * old) * num_active[i] -
            (k_twiddle_bar_p[i] * num_active[i] - k_twiddle_bar[i] + 0.5) *
                (nw - old));
  }

  double delta_on_add_interval(double min_t, double max_t, double delta_k) {
    ensure_space(min_t);
    if (min_t == max_t) return 0.0;
    int32_t cs = cell_for(max_t), ce = cell_for(min_t);
    if (cs == ce) return cell_term(cs, delta_k * (max_t - min_t) / t_step);
    double out = 0.0;
    double lb_cs = t_ref - t_step * (cs + 1);
    out += cell_term(cs, delta_k * (max_t - lb_cs) / t_step);
    double ub_ce = t_ref - t_step * ce;
    out += cell_term(ce, delta_k * (ub_ce - min_t) / t_step);
    for (int32_t c = cs + 1; c < ce; c++) out += cell_term(c, delta_k);
    return out;
  }

  double displace_delta(double old_t, double new_t) {
    double d = (old_t <= new_t) ? delta_on_add_interval(old_t, new_t, -1.0)
                                : delta_on_add_interval(new_t, old_t, +1.0);
    d -= std::log(pop->pop_at(new_t) / pop->pop_at(old_t));
    pending = {old_t, new_t};
    return d;
  }

  void commit() {
    double old_t = pending.first, new_t = pending.second;
    ensure_space(new_t);
    double sign = (old_t <= new_t) ? -1.0 : +1.0;
    add_interval(old_t, new_t, sign);
  }
};

// Uniform interface used by the mixer.
struct Coal {
  CoalGrid* grid = nullptr;
  VscPart* vsc = nullptr;
  double displace_delta(double old_t, double new_t) {
    return grid ? grid->displace_delta(old_t, new_t)
                : vsc->displace_delta(old_t, new_t);
  }
  void commit() { grid ? grid->commit() : vsc->commit(); }
};

// ---- JC mutational-history samplers (history.py) --------------------------

// k ~ Poisson(lam) conditioned on k >= min_k (distributions.h:77-175).
static int64_t sample_k_truncated_poisson(Rng& rng, double lam, int64_t min_k) {
  if (min_k <= lam) {
    for (;;) {
      int64_t k = rng.poisson(lam);
      if (k >= min_k) return k;
    }
  }
  double max_k = std::max(10.0 * (double)min_k, 10.0 * lam);
  double last_term = 1.0;
  double normalization = std::expm1(lam);
  for (int64_t k = 1; k < min_k; k++) {
    last_term *= lam / (double)k;
    normalization -= last_term;
  }
  double term_before_min_k = last_term;
  if (normalization <= 0.0 ||
      std::fabs(normalization) < 1e-10 * std::expm1(lam)) {
    normalization = 0.0;
    double t = term_before_min_k;
    int64_t k = min_k;
    while ((double)k < max_k) {
      t *= lam / (double)k;
      normalization += t;
      k++;
    }
  }
  double u = rng.uniform(0.0, normalization);
  double cum = 0.0;
  int64_t k = min_k;
  double term_k = term_before_min_k;
  while ((double)k < max_k) {
    term_k *= lam / (double)k;
    cum += term_k;
    if (cum > u) break;
    k++;
  }
  return k;
}

static inline int8_t choose_different_state(Rng& rng, int8_t s) {
  return (int8_t)((s + rng.integers(1, 4)) % 4);
}

// JC trajectory over L sites on [-T, 0] with endpoint constraints `deltas`;
// unconstrained sites start AND end at A (rotated later).
static std::vector<Mut> sample_mutational_history(Rng& rng, int32_t L, double T,
                                                  double mu,
                                                  const Deltas& deltas) {
  std::vector<Mut> result;
  std::vector<int8_t> to_states;
  std::vector<double> times;

  for (const auto& kv : deltas) {
    int32_t l = kv.first;
    int8_t frm = kv.second.from, to = kv.second.to;
    int64_t n;
    for (;;) {
      n = sample_k_truncated_poisson(rng, mu * T, 1);
      int8_t s = frm;
      to_states.clear();
      for (int64_t i = 0; i < n; i++) {
        s = choose_different_state(rng, s);
        to_states.push_back(s);
      }
      if (s == to) break;
    }
    times.clear();
    for (int64_t i = 0; i < n; i++) times.push_back(rng.uniform(-T, 0.0));
    std::sort(times.begin(), times.end());
    int8_t prev = frm;
    for (int64_t i = 0; i < n; i++) {
      result.push_back(Mut{l, prev, to_states[i], times[i]});
      prev = to_states[i];
    }
  }

  double muT = mu * T;
  double p1 = muT * std::exp(-muT);
  double log_one_minus_p_tricky =
      (muT < 1e-4) ? -0.5 * muT * muT : -muT - std::log1p(-p1);
  int64_t l = 0;
  if ((double)L * muT * muT < 2e-6) l = L;
  while (l < L) {
    double rate = -log_one_minus_p_tricky;
    double u = rate > 0 ? rng.exponential(1.0 / rate) : INFINITY;
    if (!(u >= 0 && u < (double)L)) break;
    l += (int64_t)std::floor(u);
    if (l >= L) break;
    if (deltas.count((int32_t)l)) {
      l++;
      continue;
    }
    int64_t n = sample_k_truncated_poisson(rng, muT, 2);
    int8_t s = 0;
    to_states.clear();
    for (int64_t i = 0; i < n; i++) {
      s = choose_different_state(rng, s);
      to_states.push_back(s);
    }
    if (s == 0) {
      times.clear();
      for (int64_t i = 0; i < n; i++) times.push_back(rng.uniform(-T, 0.0));
      std::sort(times.begin(), times.end());
      int8_t prev = 0;
      for (int64_t i = 0; i < n; i++) {
        result.push_back(Mut{(int32_t)l, prev, to_states[i], times[i]});
        prev = to_states[i];
      }
      l++;
    }
    // else: reject, retry same site
  }
  std::sort(result.begin(), result.end(), mut_less);
  return result;
}

// Gillespie backwards from t=0 with per-site end state A.
static std::vector<Mut> sample_unconstrained_mutational_history(Rng& rng,
                                                                int32_t L,
                                                                double T,
                                                                double mu) {
  std::unordered_map<int32_t, int8_t> cur_state;
  std::vector<Mut> trajectory;
  double t = 0.0;
  for (;;) {
    t -= rng.exponential(1.0 / (mu * (double)L));
    if (t <= -T) break;
    int32_t l = (int32_t)rng.integers(0, L);
    auto it = cur_state.find(l);
    int8_t s = it != cur_state.end() ? it->second : (int8_t)0;
    int8_t next_s = choose_different_state(rng, s);
    trajectory.push_back(Mut{l, next_s, s, t});
    cur_state[l] = next_s;
  }
  std::reverse(trajectory.begin(), trajectory.end());
  return trajectory;
}

// Shift times to absolute (ending at end_loc) and rotate non-delta sites so
// the trajectory ends at the true state at end_loc.
static void adjust_mutational_history(std::vector<Mut>& history,
                                      const Deltas& site_deltas,
                                      const Tree& tree, int32_t end_branch,
                                      double end_t) {
  std::unordered_map<int32_t, int8_t> end_states;
  for (auto it = history.rbegin(); it != history.rend(); ++it) {
    Mut& m = *it;
    m.t += end_t;
    if (!site_deltas.count(m.site)) {
      int8_t end_state;
      auto es = end_states.find(m.site);
      if (es != end_states.end()) {
        end_state = es->second;
      } else {
        end_state = state_at(tree, end_branch, end_t, m.site);
        end_states[m.site] = end_state;
      }
      m.from = (int8_t)((m.from + end_state) % 4);
      m.to = (int8_t)((m.to + end_state) % 4);
    }
  }
}

// ---- graft machinery (graft.py / SprContext) ------------------------------

struct BranchInfo {
  int32_t A = NO_NODE, B = NO_NODE;
  bool is_open = false;
  double T_to_X = 0.0;
  double partial_lambda_at_A = 0.0, partial_lambda_at_X = 0.0;
  SiteSet warm_sites, hot_sites;
  std::vector<Mut> hot_muts_to_X;
  Deltas hot_deltas_to_X;
};

struct Graft {
  int32_t X = NO_NODE, S = NO_NODE;
  double t_P = 0.0;
  bool rooty = false;
  std::vector<BranchInfo> branch_infos;
  double delta_log_G = 0.0, log_alpha_mut = 0.0;
};

static void clamp_times(std::vector<Mut>& muts, double t_lo, double t_hi) {
  double span = t_hi - t_lo;
  double eps = 1e-12 * std::max({std::fabs(t_lo), std::fabs(t_hi), 1.0});
  double lo = t_lo + std::min(eps, 0.5 * span);
  for (Mut& m : muts) {
    if (m.t <= t_lo)
      m.t = lo;
    else if (m.t > t_hi)
      m.t = t_hi;
  }
}

struct SprContext {
  Tree& tree;
  double mu;
  const double* nu;     // [L]
  const double* q;      // [16] row-major
  double q_a[4];
  const double* pi;     // [4]
  bool can_change_root;
  std::vector<double> ref_cum_Q;  // [L+1]
  double lambda_ref;
  double mu_proposal = -1.0;

  SprContext(Tree& t, double mu_, const double* nu_, const double* q_,
             const double* pi_, bool ccr)
      : tree(t), mu(mu_), nu(nu_), q(q_), pi(pi_), can_change_root(ccr) {
    for (int a = 0; a < 4; a++) q_a[a] = -q_[a * 4 + a];
    ref_cum_Q.resize(t.L + 1);
    ref_cum_Q[0] = 0.0;
    for (int32_t l = 0; l < t.L; l++)
      ref_cum_Q[l + 1] = ref_cum_Q[l] + mu * nu[l] * q_a[t.ref_seq[l]];
    lambda_ref = ref_cum_Q[t.L];
  }

  void begin_move() { mu_proposal = mu_jc(); }

  double delta_lambda_across_branch(int32_t node) const {
    const Node& nd = tree.nodes[node];
    double out = 0.0;
    for (const Mut& m : nd.muts)
      out += mu * nu[m.site] * (q_a[m.to] - q_a[m.from]);
    // missations: stored as a site set; subtract per-site ref rate, then
    // correct for non-ref from_states
    for (int32_t l : nd.miss) out -= ref_cum_Q[l + 1] - ref_cum_Q[l];
    for (const auto& kv : nd.fs)
      out -= mu * nu[kv.first] *
             (q_a[kv.second] - q_a[tree.ref_seq[kv.first]]);
    return out;
  }

  double lambda_at(int32_t node) const {
    double out = lambda_ref;
    int32_t cur = node;
    while (cur != NO_NODE) {
      out += delta_lambda_across_branch(cur);
      cur = tree.nodes[cur].parent;
    }
    return out;
  }

  // lambda contribution of a sliding missation set just above its position
  double lam_over_miss(const Sites& sites,
                       const std::unordered_map<int32_t, int8_t>& from) const {
    double out = 0.0;
    for (int32_t l : sites) {
      auto it = from.find(l);
      int8_t s = it != from.end() ? it->second : (int8_t)tree.ref_seq[l];
      out += mu * nu[l] * q_a[s];
    }
    return out;
  }

  int64_t num_missing_at(int32_t node) const {
    int64_t out = 0;
    int32_t cur = node;
    while (cur != NO_NODE) {
      out += (int64_t)tree.nodes[cur].miss.size();
      cur = tree.nodes[cur].parent;
    }
    return out;
  }

  double mu_jc() const {
    return lambda_at(tree.root) /
           (double)((int64_t)tree.L - num_missing_at(tree.root));
  }

  double branch_log_G(double t_P, double t_X, double lam_X,
                      const std::vector<Mut>& muts) const {
    double r = -lam_X * (t_X - t_P);
    for (const Mut& m : muts) {
      r -= mu * nu[m.site] * (q_a[m.from] - q_a[m.to]) * (m.t - t_P);
      r += std::log(mu * nu[m.site] * q[m.from * 4 + m.to]);
    }
    return r;
  }

  bool is_site_missing_at(int32_t node, int32_t site) const {
    int32_t cur = node;
    while (cur != NO_NODE) {
      if (sites_contains(tree.nodes[cur].miss, site)) return true;
      cur = tree.nodes[cur].parent;
    }
    return false;
  }

  Sites miss_at_or_above(int32_t node) const {
    Sites out;
    int32_t cur = node;
    while (cur != NO_NODE) {
      out = sites_union(out, tree.nodes[cur].miss);
      cur = tree.nodes[cur].parent;
    }
    return out;
  }

  // -- analysis -------------------------------------------------------------

  Graft analyze_graft(int32_t X) {
    Graft g = start_graft_analysis(X);
    finish_graft_analysis(g);
    return g;
  }

  Graft propose_new_graft(int32_t X, Rng& rng) {
    Graft g = start_graft_analysis(X);
    propose_new_graft_mutations(g, rng);
    finish_graft_analysis(g);
    return g;
  }

  Graft start_graft_analysis(int32_t X) {
    if (tree.nodes[X].parent == tree.root) return start_rooty(X);
    return start_inner(X);
  }

  // X is a child of the root (graft.py _start_rooty)
  Graft start_rooty(int32_t X) {
    Tree& t = tree;
    int32_t P = t.nodes[X].parent;
    int32_t S = t.sibling(P, X);
    double t_X = t.nodes[X].t, t_P = t.nodes[P].t, t_S = t.nodes[S].t;
    const Sites& miss_P = t.nodes[P].miss;
    const Sites& miss_X = t.nodes[X].miss;
    const Sites& miss_S = t.nodes[S].miss;

    Graft g;
    g.X = X; g.S = S; g.t_P = t_P; g.rooty = true;
    g.branch_infos.resize(3);

    BranchInfo& px = g.branch_infos[0];
    px.A = P; px.B = X; px.is_open = true; px.T_to_X = t_X - t_P;
    px.warm_sites.s = miss_S;
    px.hot_sites = px.warm_sites;
    px.partial_lambda_at_A = lam_over_miss(miss_S, t.nodes[S].fs);
    px.partial_lambda_at_X = px.partial_lambda_at_A;
    for (const Mut& m : t.nodes[X].muts) {
      if (px.hot_sites.contains(m.site)) {
        px.hot_muts_to_X.push_back(m);
        px.partial_lambda_at_X += mu * nu[m.site] * (q_a[m.to] - q_a[m.from]);
      }
    }

    BranchInfo& ps = g.branch_infos[1];
    ps.A = P; ps.B = S; ps.is_open = true; ps.T_to_X = t_S - t_P;
    ps.warm_sites.s = miss_X;
    ps.hot_sites = ps.warm_sites;
    ps.partial_lambda_at_A = lam_over_miss(miss_X, t.nodes[X].fs);
    ps.partial_lambda_at_X = ps.partial_lambda_at_A;
    for (const Mut& m : t.nodes[S].muts) {
      if (ps.hot_sites.contains(m.site)) {
        ps.hot_muts_to_X.push_back(m);
        ps.partial_lambda_at_X += mu * nu[m.site] * (q_a[m.to] - q_a[m.from]);
      }
    }

    BranchInfo& spx = g.branch_infos[2];
    spx.A = S; spx.B = P; spx.is_open = false;
    spx.T_to_X = (t_S - t_P) + (t_X - t_P);
    spx.warm_sites.complement = true;
    spx.warm_sites.s = sites_union(sites_union(miss_P, miss_X), miss_S);
    spx.hot_sites = spx.warm_sites;
    spx.partial_lambda_at_X = lambda_at(X) - px.partial_lambda_at_X;
    spx.partial_lambda_at_A = lambda_at(S) - ps.partial_lambda_at_X;
    const auto& smuts = t.nodes[S].muts;
    for (auto it = smuts.rbegin(); it != smuts.rend(); ++it) {
      if (spx.hot_sites.contains(it->site)) {
        Mut rm{it->site, it->to, it->from, t_P - (it->t - t_P)};
        spx.hot_muts_to_X.push_back(rm);
        push_back_d(spx.hot_deltas_to_X, rm.site, rm.from, rm.to);
      }
    }
    for (const Mut& m : t.nodes[X].muts) {
      if (spx.hot_sites.contains(m.site)) {
        spx.hot_muts_to_X.push_back(m);
        push_back_d(spx.hot_deltas_to_X, m.site, m.from, m.to);
      }
    }
    return g;
  }

  // inner graft analysis (graft.py _start_inner)
  Graft start_inner(int32_t X) {
    Tree& t = tree;
    int32_t P = t.nodes[X].parent;
    int32_t S = t.sibling(P, X);
    double t_X = t.nodes[X].t, t_P = t.nodes[P].t;

    Graft g;
    g.X = X; g.S = S; g.t_P = t_P; g.rooty = false;

    BranchInfo px;
    px.A = P; px.B = X; px.is_open = false; px.T_to_X = t_X - t_P;
    px.warm_sites.complement = true;  // all sites
    const Sites& miss_S = t.nodes[S].miss;
    px.hot_sites = px.warm_sites.minus(miss_S);

    Sites sliding_sites = miss_S;
    std::unordered_map<int32_t, int8_t> sliding_from = t.nodes[S].fs;
    px.partial_lambda_at_A = lambda_at(X);
    const auto& xmuts = t.nodes[X].muts;
    for (auto it = xmuts.rbegin(); it != xmuts.rend(); ++it)
      px.partial_lambda_at_A += mu * nu[it->site] * (q_a[it->from] - q_a[it->to]);
    double next_plB = lam_over_miss(sliding_sites, sliding_from);
    px.partial_lambda_at_A -= next_plB;
    g.branch_infos.push_back(std::move(px));

    int32_t cur = P;
    int32_t parent = t.nodes[cur].parent;
    double partial_lambda = next_plB;
    while (!sliding_sites.empty()) {
      int32_t sib = t.sibling(parent, cur);
      BranchInfo bi;
      bi.A = parent; bi.B = cur; bi.is_open = false;
      bi.T_to_X = t_X - t.nodes[parent].t;
      bi.warm_sites.s = sliding_sites;

      const auto& cmuts = t.nodes[cur].muts;
      for (auto it = cmuts.rbegin(); it != cmuts.rend(); ++it) {
        if (sites_contains(sliding_sites, it->site)) {
          partial_lambda += mu * nu[it->site] * (q_a[it->from] - q_a[it->to]);
          if (it->from == (int8_t)t.ref_seq[it->site])
            sliding_from.erase(it->site);
          else
            sliding_from[it->site] = it->from;
        }
      }

      bi.hot_sites.s = sites_minus(bi.warm_sites.s, t.nodes[sib].miss);
      sliding_sites = sites_minus(bi.warm_sites.s, bi.hot_sites.s);
      for (auto it = sliding_from.begin(); it != sliding_from.end();) {
        if (!sites_contains(sliding_sites, it->first))
          it = sliding_from.erase(it);
        else
          ++it;
      }

      next_plB = lam_over_miss(sliding_sites, sliding_from);
      bi.partial_lambda_at_A = partial_lambda - next_plB;
      partial_lambda = next_plB;
      g.branch_infos.push_back(std::move(bi));
      BranchInfo& last = g.branch_infos.back();

      if (parent != t.root) {
        cur = parent;
        parent = t.nodes[cur].parent;
      } else {
        if (!can_change_root) {
          last.hot_sites = last.warm_sites;
          last.partial_lambda_at_A += partial_lambda;
        } else if (!sliding_sites.empty()) {
          BranchInfo fo;
          fo.A = NO_NODE; fo.B = t.root; fo.is_open = true;
          fo.T_to_X = t_X - t.nodes[parent].t;
          fo.warm_sites.s = sliding_sites;
          fo.hot_sites = fo.warm_sites;
          fo.partial_lambda_at_A = partial_lambda;
          g.branch_infos.push_back(std::move(fo));
        }
        sliding_sites.clear();
        sliding_from.clear();
      }
    }

    // distribute hot mutations along the hot path
    size_t nbi = g.branch_infos.size();
    for (size_t i = 0; i < nbi; i++) {
      BranchInfo& bi = g.branch_infos[i];
      if (bi.B == t.root) continue;
      const auto& bmuts = t.nodes[bi.B].muts;
      for (auto it = bmuts.rbegin(); it != bmuts.rend(); ++it) {
        if (bi.warm_sites.contains(it->site)) {
          for (size_t j = i; j < nbi; j++) {
            if (g.branch_infos[j].hot_sites.contains(it->site))
              g.branch_infos[j].hot_muts_to_X.push_back(*it);
          }
        }
      }
    }

    for (BranchInfo& bi : g.branch_infos) {
      std::reverse(bi.hot_muts_to_X.begin(), bi.hot_muts_to_X.end());
      bi.partial_lambda_at_X = bi.partial_lambda_at_A;
      for (const Mut& m : bi.hot_muts_to_X) {
        if (!bi.is_open)
          push_back_d(bi.hot_deltas_to_X, m.site, m.from, m.to);
        bi.partial_lambda_at_X += mu * nu[m.site] * (q_a[m.to] - q_a[m.from]);
      }
    }
    return g;
  }
