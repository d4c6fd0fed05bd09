// Native BVH builder: binned-SAH top-down build + N-wide collapse.
//
// Plays the role of the reference's SplitBvhBuilder + BvhNTriMAdapter
// (src/driver/bvh.h, src/driver/converter.cpp:97-260), emitting the same
// node/packet encoding consumed by the traversal kernels:
//   bounds[6][N] per node (xmin,xmax,ymin,ymax,zmin,zmax), empty slot =
//   (+inf,-inf); child > 0 inner (index+1), < 0 leaf (~packet index);
//   Tri packets with e1 = v0-v1, e2 = v2-v0, n = cross(e1,e2);
//   prim_id -1 invalid lane, sign bit on the last lane of the final
//   packet of each leaf (converter.cpp:252-258).
//
// The SAH cost model matches converter.cpp CostFn (leaf = count*area,
// traversal = area); spatial splits (SBVH) are a planned extension.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float INF = std::numeric_limits<float>::infinity();

struct Vec3 {
    float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct BBox {
    Vec3 lo{INF, INF, INF};
    Vec3 hi{-INF, -INF, -INF};
    void extend(const BBox& o) {
        lo = vmin(lo, o.lo);
        hi = vmax(hi, o.hi);
    }
    float half_area() const {
        float ex = std::max(hi.x - lo.x, 0.0f);
        float ey = std::max(hi.y - lo.y, 0.0f);
        float ez = std::max(hi.z - lo.z, 0.0f);
        return ex * (ey + ez) + ey * ez;
    }
};

struct BinaryNode {
    BBox box;
    int32_t left = -1, right = -1;
    int64_t start = -1, count = -1;  // leaf range into `order`
    bool is_leaf() const { return count >= 0; }
};

struct Builder {
    int arity, packet, leaf_threshold;
    int64_t num_tris;
    std::vector<Vec3> v0, v1, v2;
    std::vector<int32_t> gid;
    std::vector<BBox> tri_box;
    std::vector<Vec3> center;
    std::vector<int64_t> order;
    std::vector<BinaryNode> bnodes;

    // outputs
    std::vector<float> out_bounds;  // num_nodes * 6 * arity
    std::vector<int32_t> out_child; // num_nodes * arity
    std::vector<float> t_v0, t_e1, t_e2, t_n;  // packets * packet * 3
    std::vector<int32_t> t_pid, t_gid;          // packets * packet

    int build_binary();
    void collapse_and_emit(int root);
    int64_t emit_leaf(int64_t start, int64_t count);
};

constexpr int NUM_BINS = 16;

int Builder::build_binary() {
    order.resize(num_tris);
    for (int64_t i = 0; i < num_tris; ++i) order[i] = i;
    bnodes.reserve(2 * size_t(num_tris) + 1);
    bnodes.emplace_back();
    struct Work { int32_t node; int64_t start, end; };
    std::vector<Work> stack{{0, 0, num_tris}};
    std::vector<int64_t> tmp(num_tris);

    while (!stack.empty()) {
        Work w = stack.back();
        stack.pop_back();
        BinaryNode& nref = bnodes[w.node];
        int64_t count = w.end - w.start;

        BBox box;
        BBox cbox;
        for (int64_t i = w.start; i < w.end; ++i) {
            box.extend(tri_box[order[i]]);
            const Vec3& c = center[order[i]];
            cbox.lo = vmin(cbox.lo, c);
            cbox.hi = vmax(cbox.hi, c);
        }
        nref.box = box;

        if (count <= leaf_threshold) {
            nref.start = w.start;
            nref.count = count;
            continue;
        }

        Vec3 ext{cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y,
                 cbox.hi.z - cbox.lo.z};
        int axis = 0;
        if (ext.y > ext.x) axis = 1;
        if (ext.z > (axis ? ext.y : ext.x)) axis = 2;
        float extent = axis == 0 ? ext.x : axis == 1 ? ext.y : ext.z;
        float base = axis == 0 ? cbox.lo.x : axis == 1 ? cbox.lo.y : cbox.lo.z;

        int64_t mid;
        bool did_sah = false;
        if (extent > 0.0f) {
            BBox bin_box[NUM_BINS];
            int64_t bin_cnt[NUM_BINS] = {};
            float scale = NUM_BINS / extent;
            auto bin_of = [&](int64_t t) {
                const Vec3& c = center[t];
                float v = axis == 0 ? c.x : axis == 1 ? c.y : c.z;
                int b = int((v - base) * scale);
                return std::min(std::max(b, 0), NUM_BINS - 1);
            };
            for (int64_t i = w.start; i < w.end; ++i) {
                int b = bin_of(order[i]);
                bin_box[b].extend(tri_box[order[i]]);
                bin_cnt[b]++;
            }
            // sweep
            float rarea[NUM_BINS];
            BBox acc;
            int64_t rcnt_arr[NUM_BINS];
            int64_t rc = 0;
            for (int b = NUM_BINS - 1; b >= 1; --b) {
                acc.extend(bin_box[b]);
                rc += bin_cnt[b];
                rarea[b] = acc.half_area();
                rcnt_arr[b] = rc;
            }
            BBox lacc;
            int64_t lc = 0;
            float best_cost = INF;
            int best_bin = -1;
            for (int b = 0; b < NUM_BINS - 1; ++b) {
                lacc.extend(bin_box[b]);
                lc += bin_cnt[b];
                if (lc == 0 || rcnt_arr[b + 1] == 0) continue;
                float cost = lacc.half_area() * lc
                             + rarea[b + 1] * rcnt_arr[b + 1];
                if (cost < best_cost) {
                    best_cost = cost;
                    best_bin = b;
                }
            }
            if (best_bin >= 0) {
                float leaf_cost = box.half_area() * count;
                float split_cost = best_cost + box.half_area();
                if (count <= 64 && leaf_cost <= split_cost) {
                    nref.start = w.start;
                    nref.count = count;
                    continue;
                }
                // stable partition by bin
                int64_t l = 0, r = 0;
                for (int64_t i = w.start; i < w.end; ++i) {
                    if (bin_of(order[i]) <= best_bin)
                        order[w.start + l++] = order[i];
                    else
                        tmp[r++] = order[i];
                }
                std::memcpy(&order[w.start + l], tmp.data(),
                            size_t(r) * sizeof(int64_t));
                mid = w.start + l;
                did_sah = true;
            }
        }
        if (!did_sah) {
            // identical centroids: halve by index
            if (count <= 64) {
                nref.start = w.start;
                nref.count = count;
                continue;
            }
            mid = w.start + count / 2;
        }

        int32_t l = int32_t(bnodes.size());
        bnodes.emplace_back();
        int32_t r = int32_t(bnodes.size());
        bnodes.emplace_back();
        bnodes[w.node].left = l;
        bnodes[w.node].right = r;
        stack.push_back({l, w.start, mid});
        stack.push_back({r, mid, w.end});
    }
    return 0;
}

int64_t Builder::emit_leaf(int64_t start, int64_t count) {
    int64_t first = int64_t(t_pid.size()) / packet;
    for (int64_t i = 0; i < count; i += packet) {
        int64_t c = std::min<int64_t>(packet, count - i);
        for (int64_t j = 0; j < packet; ++j) {
            if (j < c) {
                int64_t id = order[start + i + j];
                Vec3 a = v0[id], b = v1[id], cc = v2[id];
                Vec3 e1{a.x - b.x, a.y - b.y, a.z - b.z};
                Vec3 e2{cc.x - a.x, cc.y - a.y, cc.z - a.z};
                Vec3 nn{e1.y * e2.z - e1.z * e2.y,
                        e1.z * e2.x - e1.x * e2.z,
                        e1.x * e2.y - e1.y * e2.x};
                t_v0.insert(t_v0.end(), {a.x, a.y, a.z});
                t_e1.insert(t_e1.end(), {e1.x, e1.y, e1.z});
                t_e2.insert(t_e2.end(), {e2.x, e2.y, e2.z});
                t_n.insert(t_n.end(), {nn.x, nn.y, nn.z});
                t_pid.push_back(int32_t(id));
                t_gid.push_back(gid[id]);
            } else {
                t_v0.insert(t_v0.end(), {0, 0, 0});
                t_e1.insert(t_e1.end(), {0, 0, 0});
                t_e2.insert(t_e2.end(), {0, 0, 0});
                t_n.insert(t_n.end(), {0, 0, 0});
                t_pid.push_back(-1);
                t_gid.push_back(0);
            }
        }
    }
    // flag the last lane of the final packet of this leaf
    t_pid.back() = int32_t(uint32_t(t_pid.back()) | 0x80000000u);
    return first;
}

void Builder::collapse_and_emit(int root) {
    // group binary children under one wide node, expanding the largest-area
    // inner member first (bvh.h MultiNode semantics)
    struct Work { int32_t bnode; int64_t widx; int slot; };
    std::vector<Work> stack;

    auto collapse = [&](int32_t b, std::vector<int32_t>& group) {
        group.clear();
        group.push_back(b);
        while (int(group.size()) < arity) {
            int best = -1;
            float best_area = -1.0f;
            for (size_t gi = 0; gi < group.size(); ++gi) {
                const BinaryNode& m = bnodes[group[gi]];
                if (!m.is_leaf() && m.box.half_area() > best_area) {
                    best = int(gi);
                    best_area = m.box.half_area();
                }
            }
            if (best < 0) break;
            int32_t m = group[best];
            group.erase(group.begin() + best);
            group.push_back(bnodes[m].left);
            group.push_back(bnodes[m].right);
        }
    };

    auto alloc_node = [&]() {
        int64_t idx = int64_t(out_child.size()) / arity;
        out_bounds.resize(out_bounds.size() + size_t(6 * arity));
        out_child.resize(out_child.size() + size_t(arity), 0);
        float* bb = &out_bounds[size_t(idx) * 6 * arity];
        for (int s = 0; s < arity; ++s) {
            bb[0 * arity + s] = INF;
            bb[1 * arity + s] = -INF;
            bb[2 * arity + s] = INF;
            bb[3 * arity + s] = -INF;
            bb[4 * arity + s] = INF;
            bb[5 * arity + s] = -INF;
        }
        return idx;
    };

    std::vector<int32_t> group;
    auto emit_wide = [&](int32_t b) {
        int64_t widx = alloc_node();
        collapse(b, group);
        float* bb = &out_bounds[size_t(widx) * 6 * arity];
        for (int s = 0; s < int(group.size()); ++s) {
            const BinaryNode& m = bnodes[group[s]];
            bb[0 * arity + s] = m.box.lo.x;
            bb[1 * arity + s] = m.box.hi.x;
            bb[2 * arity + s] = m.box.lo.y;
            bb[3 * arity + s] = m.box.hi.y;
            bb[4 * arity + s] = m.box.lo.z;
            bb[5 * arity + s] = m.box.hi.z;
            if (m.is_leaf()) {
                int64_t first = emit_leaf(m.start, m.count);
                out_child[size_t(widx) * arity + s] = int32_t(~first);
            } else {
                stack.push_back({group[s], widx, s});
            }
        }
        return widx;
    };

    if (bnodes[root].is_leaf()) {
        // single-leaf scene: one wide node with the leaf in slot 0
        int64_t widx = alloc_node();
        float* bb = &out_bounds[0];
        const BinaryNode& m = bnodes[root];
        bb[0 * arity] = m.box.lo.x;
        bb[1 * arity] = m.box.hi.x;
        bb[2 * arity] = m.box.lo.y;
        bb[3 * arity] = m.box.hi.y;
        bb[4 * arity] = m.box.lo.z;
        bb[5 * arity] = m.box.hi.z;
        out_child[size_t(widx) * arity] = int32_t(~emit_leaf(m.start, m.count));
        return;
    }

    emit_wide(root);
    while (!stack.empty()) {
        Work w = stack.back();
        stack.pop_back();
        int64_t cidx = emit_wide(w.bnode);
        out_child[size_t(w.widx) * arity + w.slot] = int32_t(cidx + 1);
    }
}

} // namespace

extern "C" {

void* rt_bvh_build(const float* verts, const int32_t* idx4,
                   int64_t num_tris, int arity, int packet,
                   int leaf_threshold) {
    auto* b = new Builder();
    b->arity = arity;
    b->packet = packet;
    b->leaf_threshold = std::max(leaf_threshold, packet);
    b->num_tris = num_tris;
    b->v0.resize(num_tris);
    b->v1.resize(num_tris);
    b->v2.resize(num_tris);
    b->gid.resize(num_tris);
    b->tri_box.resize(num_tris);
    b->center.resize(num_tris);
    for (int64_t t = 0; t < num_tris; ++t) {
        auto fetch = [&](int32_t vi) {
            return Vec3{verts[vi * 3 + 0], verts[vi * 3 + 1],
                        verts[vi * 3 + 2]};
        };
        b->v0[t] = fetch(idx4[t * 4 + 0]);
        b->v1[t] = fetch(idx4[t * 4 + 1]);
        b->v2[t] = fetch(idx4[t * 4 + 2]);
        b->gid[t] = idx4[t * 4 + 3];
        BBox box;
        box.lo = vmin(vmin(b->v0[t], b->v1[t]), b->v2[t]);
        box.hi = vmax(vmax(b->v0[t], b->v1[t]), b->v2[t]);
        b->tri_box[t] = box;
        b->center[t] = {(box.lo.x + box.hi.x) * 0.5f,
                        (box.lo.y + box.hi.y) * 0.5f,
                        (box.lo.z + box.hi.z) * 0.5f};
    }
    b->build_binary();
    b->collapse_and_emit(0);
    return b;
}

int64_t rt_bvh_num_nodes(void* h) {
    auto* b = static_cast<Builder*>(h);
    return int64_t(b->out_child.size()) / b->arity;
}

int64_t rt_bvh_num_packets(void* h) {
    auto* b = static_cast<Builder*>(h);
    return int64_t(b->t_pid.size()) / b->packet;
}

void rt_bvh_copy(void* h, float* bounds, int32_t* child, float* tv0,
                 float* te1, float* te2, float* tn, int32_t* pid,
                 int32_t* gidp) {
    auto* b = static_cast<Builder*>(h);
    std::memcpy(bounds, b->out_bounds.data(),
                b->out_bounds.size() * sizeof(float));
    std::memcpy(child, b->out_child.data(),
                b->out_child.size() * sizeof(int32_t));
    std::memcpy(tv0, b->t_v0.data(), b->t_v0.size() * sizeof(float));
    std::memcpy(te1, b->t_e1.data(), b->t_e1.size() * sizeof(float));
    std::memcpy(te2, b->t_e2.data(), b->t_e2.size() * sizeof(float));
    std::memcpy(tn, b->t_n.data(), b->t_n.size() * sizeof(float));
    std::memcpy(pid, b->t_pid.data(), b->t_pid.size() * sizeof(int32_t));
    std::memcpy(gidp, b->t_gid.data(), b->t_gid.size() * sizeof(int32_t));
}

void rt_bvh_free(void* h) {
    delete static_cast<Builder*>(h);
}

} // extern "C"
