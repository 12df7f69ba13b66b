// Greedy quad-tree keypoint distribution — native host-side component.
//
// Functional equivalent of ORBextractor::DistributeOctTree (reference:
// ORBextractor.cc:529-731): recursively split the image region, always
// subdividing the node with the most candidate corners, until the node
// count reaches the desired feature quota; keep the highest-response
// corner of each final node.  This is data-dependent control flow that
// maps poorly onto XLA; the TPU pipeline uses a cell-winner approximation
// by default and can call this exact native version for strict parity.
//
// C ABI for ctypes.  No dependencies beyond the C++17 standard library.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <list>
#include <vector>

namespace {

struct Node {
  float x0, x1, y0, y1;
  std::vector<int> idx;   // candidate indices inside this node
  bool no_more = false;   // single candidate -> never split again
};

}  // namespace

extern "C" {

// xs/ys/responses: candidate corners (n of them) inside
// [min_x, max_x) x [min_y, max_y).  keep[i] is set to 1 for retained
// corners (about n_desired of them), 0 otherwise.  Returns the number kept.
int distribute_octree(const float* xs, const float* ys,
                      const float* responses, int n, float min_x,
                      float max_x, float min_y, float max_y, int n_desired,
                      uint8_t* keep) {
  std::fill(keep, keep + n, uint8_t{0});
  if (n == 0 || n_desired <= 0) return 0;

  // initial nodes: square-ish split of the root region
  const float w = max_x - min_x;
  const float h = max_y - min_y;
  const int n_ini = std::max(1, static_cast<int>(std::round(w / std::max(h, 1.0f))));
  const float hx = w / n_ini;

  std::list<Node> nodes;
  for (int i = 0; i < n_ini; ++i) {
    Node nd;
    nd.x0 = min_x + i * hx;
    nd.x1 = min_x + (i + 1) * hx;
    nd.y0 = min_y;
    nd.y1 = max_y;
    nodes.push_back(std::move(nd));
  }
  {
    auto it = nodes.begin();
    std::vector<std::list<Node>::iterator> slots;
    for (; it != nodes.end(); ++it) slots.push_back(it);
    for (int i = 0; i < n; ++i) {
      int s = std::min(static_cast<int>((xs[i] - min_x) / hx),
                       n_ini - 1);
      if (s < 0) s = 0;
      slots[s]->idx.push_back(i);
    }
  }
  nodes.remove_if([](const Node& nd) { return nd.idx.empty(); });
  for (auto& nd : nodes)
    if (nd.idx.size() == 1) nd.no_more = true;

  // iterative subdivision: largest-population node first
  bool finish = false;
  while (!finish) {
    const int prev_size = static_cast<int>(nodes.size());
    // collect splittable nodes sorted by population (descending)
    std::vector<std::pair<int, Node*>> to_expand;
    to_expand.reserve(nodes.size());
    for (auto& nd : nodes)
      if (!nd.no_more) to_expand.push_back({static_cast<int>(nd.idx.size()), &nd});
    if (to_expand.empty()) break;
    std::sort(to_expand.begin(), to_expand.end(),
              [](const auto& a, const auto& b) { return a.first > b.first; });

    std::list<Node> fresh;
    int splits_done = 0;
    for (auto& [cnt, ndp] : to_expand) {
      if (static_cast<int>(nodes.size()) - splits_done + 3 +
              static_cast<int>(fresh.size()) > 4 * n_desired &&
          static_cast<int>(nodes.size()) + static_cast<int>(fresh.size()) >=
              n_desired)
        break;
      Node& nd = *ndp;
      const float mx = 0.5f * (nd.x0 + nd.x1);
      const float my = 0.5f * (nd.y0 + nd.y1);
      Node quad[4];
      quad[0] = {nd.x0, mx, nd.y0, my, {}};
      quad[1] = {mx, nd.x1, nd.y0, my, {}};
      quad[2] = {nd.x0, mx, my, nd.y1, {}};
      quad[3] = {mx, nd.x1, my, nd.y1, {}};
      for (int i : nd.idx) {
        const int qx = xs[i] < mx ? 0 : 1;
        const int qy = ys[i] < my ? 0 : 2;
        quad[qx + qy].idx.push_back(i);
      }
      nd.idx.clear();
      nd.no_more = true;  // emptied parent will be removed below
      for (auto& q : quad) {
        if (q.idx.empty()) continue;
        q.no_more = q.idx.size() == 1;
        fresh.push_back(std::move(q));
      }
      ++splits_done;
      if (static_cast<int>(nodes.size()) + static_cast<int>(fresh.size()) -
              splits_done >= n_desired)
        break;
    }
    nodes.remove_if([](const Node& nd) { return nd.idx.empty(); });
    nodes.splice(nodes.end(), fresh);
    if (static_cast<int>(nodes.size()) >= n_desired ||
        static_cast<int>(nodes.size()) == prev_size)
      finish = true;
  }

  // keep the best-response candidate per node
  int kept = 0;
  for (auto& nd : nodes) {
    int best = -1;
    float best_r = -1e30f;
    for (int i : nd.idx)
      if (responses[i] > best_r) {
        best_r = responses[i];
        best = i;
      }
    if (best >= 0) {
      keep[best] = 1;
      ++kept;
    }
  }
  return kept;
}

}  // extern "C"
