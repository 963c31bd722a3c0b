// Native marching-tetrahedra isosurface extraction.
//
// Mirrors spatially_aware_ai_tpu/meshing/marching.py exactly (same Kuhn
// 6-tet decomposition, case table, NaN handling, edge-keyed vertex dedup,
// gradient-based triangle orientation) — the Python tests assert parity.
// Exposed via a C ABI for ctypes; built by spatially_aware_ai_tpu.native.
//
// Single-threaded but ~10-50x faster than the vectorized numpy path at
// large grids (no materialized per-tet intermediates).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// corner numbering n = dx*4 + dy*2 + dz
const int CORNER_OFF[8][3] = {
    {0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
    {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1},
};

const int TETS[6][4] = {
    {0, 4, 6, 7}, {0, 4, 5, 7}, {0, 2, 6, 7},
    {0, 2, 3, 7}, {0, 1, 5, 7}, {0, 1, 3, 7},
};

const int TET_EDGES[6][2] = {
    {0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3},
};

// triangles (as tet-edge ids) per inside-mask; -1 padded, max 2 triangles
const int CASE_TRIS[16][6] = {
    {-1, -1, -1, -1, -1, -1},
    {0, 1, 2, -1, -1, -1},
    {0, 3, 4, -1, -1, -1},
    {1, 3, 4, 1, 4, 2},
    {1, 3, 5, -1, -1, -1},
    {0, 3, 5, 0, 5, 2},
    {0, 1, 5, 0, 5, 4},
    {2, 4, 5, -1, -1, -1},
    {2, 4, 5, -1, -1, -1},
    {0, 1, 5, 0, 5, 4},
    {0, 3, 5, 0, 5, 2},
    {1, 3, 5, -1, -1, -1},
    {1, 3, 4, 1, 4, 2},
    {0, 3, 4, -1, -1, -1},
    {0, 1, 2, -1, -1, -1},
    {-1, -1, -1, -1, -1, -1},
};

struct PairHash {
    size_t operator()(const std::pair<int64_t, int64_t>& p) const {
        return std::hash<int64_t>()(p.first * 0x9e3779b97f4a7c15LL ^ p.second);
    }
};

}  // namespace

extern "C" {

// Returns 0 on success. Outputs are malloc'd; caller frees via mt_free.
int mt_extract(const float* vol, int64_t X, int64_t Y, int64_t Z, float level,
               float** out_verts, int64_t* out_nverts,
               int64_t** out_faces, int64_t* out_nfaces) {
    *out_verts = nullptr;
    *out_faces = nullptr;
    *out_nverts = 0;
    *out_nfaces = 0;
    if (X < 2 || Y < 2 || Z < 2) return 0;

    const int64_t sx = Y * Z, sy = Z;
    std::unordered_map<std::pair<int64_t, int64_t>, int64_t, PairHash> edge_to_vert;
    std::vector<float> verts;       // xyz triples
    std::vector<int64_t> faces;     // index triples

    auto vert_for_edge = [&](int64_t a, int64_t b) -> int64_t {
        int64_t lo = a < b ? a : b, hi = a < b ? b : a;
        auto key = std::make_pair(lo, hi);
        auto it = edge_to_vert.find(key);
        if (it != edge_to_vert.end()) return it->second;
        float va = vol[lo], vb = vol[hi];
        float t = (level - va) / (vb - va);
        if (t < 0.f) t = 0.f;
        if (t > 1.f) t = 1.f;
        float pa[3] = {(float)(lo / sx), (float)((lo % sx) / sy),
                       (float)(lo % sy)};
        float pb[3] = {(float)(hi / sx), (float)((hi % sx) / sy),
                       (float)(hi % sy)};
        int64_t id = (int64_t)(verts.size() / 3);
        for (int k = 0; k < 3; k++)
            verts.push_back(pa[k] + t * (pb[k] - pa[k]));
        edge_to_vert.emplace(key, id);
        return id;
    };

    int64_t corner_lin[8];
    for (int c = 0; c < 8; c++)
        corner_lin[c] =
            CORNER_OFF[c][0] * sx + CORNER_OFF[c][1] * sy + CORNER_OFF[c][2];

    for (int64_t x = 0; x + 1 < X; x++)
        for (int64_t y = 0; y + 1 < Y; y++)
            for (int64_t z = 0; z + 1 < Z; z++) {
                int64_t base = x * sx + y * sy + z;
                float cv[8];
                bool finite = true;
                for (int c = 0; c < 8; c++) {
                    cv[c] = vol[base + corner_lin[c]];
                    if (!std::isfinite(cv[c])) finite = false;
                }
                // quick reject: all same side (only when finite)
                if (finite) {
                    bool any_in = false, any_out = false;
                    for (int c = 0; c < 8; c++)
                        (cv[c] < level ? any_in : any_out) = true;
                    if (!any_in || !any_out) continue;
                }
                for (int t = 0; t < 6; t++) {
                    int code = 0;
                    bool tfin = true;
                    for (int c = 0; c < 4; c++) {
                        float v = cv[TETS[t][c]];
                        if (!std::isfinite(v)) { tfin = false; break; }
                        if (v < level) code |= 1 << c;
                    }
                    if (!tfin) continue;
                    const int* tris = CASE_TRIS[code];
                    for (int k = 0; k < 6 && tris[k] >= 0; k += 3) {
                        int64_t ids[3];
                        for (int e = 0; e < 3; e++) {
                            int te = tris[k + e];
                            int ca = TETS[t][TET_EDGES[te][0]];
                            int cb = TETS[t][TET_EDGES[te][1]];
                            ids[e] = vert_for_edge(base + corner_lin[ca],
                                                   base + corner_lin[cb]);
                        }
                        if (ids[0] == ids[1] || ids[1] == ids[2] ||
                            ids[0] == ids[2])
                            continue;
                        faces.push_back(ids[0]);
                        faces.push_back(ids[1]);
                        faces.push_back(ids[2]);
                    }
                }
            }

    // orientation: normal toward increasing field (NaN-safe central diff)
    int64_t nfaces = (int64_t)(faces.size() / 3);
    for (int64_t i = 0; i < nfaces; i++) {
        float* v0 = &verts[faces[3 * i + 0] * 3];
        float* v1 = &verts[faces[3 * i + 1] * 3];
        float* v2 = &verts[faces[3 * i + 2] * 3];
        float n[3] = {
            (v1[1] - v0[1]) * (v2[2] - v0[2]) -
                (v1[2] - v0[2]) * (v2[1] - v0[1]),
            (v1[2] - v0[2]) * (v2[0] - v0[0]) -
                (v1[0] - v0[0]) * (v2[2] - v0[2]),
            (v1[0] - v0[0]) * (v2[1] - v0[1]) -
                (v1[1] - v0[1]) * (v2[0] - v0[0]),
        };
        float cx = (v0[0] + v1[0] + v2[0]) / 3.f;
        float cy = (v0[1] + v1[1] + v2[1]) / 3.f;
        float cz = (v0[2] + v1[2] + v2[2]) / 3.f;
        int64_t ix = (int64_t)std::lround(cx);
        int64_t iy = (int64_t)std::lround(cy);
        int64_t iz = (int64_t)std::lround(cz);
        if (ix < 1) ix = 1; if (ix > X - 2) ix = X - 2;
        if (iy < 1) iy = 1; if (iy > Y - 2) iy = Y - 2;
        if (iz < 1) iz = 1; if (iz > Z - 2) iz = Z - 2;
        auto safe = [&](int64_t a, int64_t b, int64_t c) -> float {
            float v = vol[a * sx + b * sy + c];
            return std::isfinite(v) ? v : 0.f;
        };
        float g[3] = {
            safe(ix + 1, iy, iz) - safe(ix - 1, iy, iz),
            safe(ix, iy + 1, iz) - safe(ix, iy - 1, iz),
            safe(ix, iy, iz + 1) - safe(ix, iy, iz - 1),
        };
        if (n[0] * g[0] + n[1] * g[1] + n[2] * g[2] < 0) {
            int64_t tmp = faces[3 * i + 1];
            faces[3 * i + 1] = faces[3 * i + 2];
            faces[3 * i + 2] = tmp;
        }
    }

    *out_nverts = (int64_t)(verts.size() / 3);
    *out_nfaces = nfaces;
    if (*out_nverts) {
        *out_verts = (float*)malloc(verts.size() * sizeof(float));
        std::memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
    }
    if (nfaces) {
        *out_faces = (int64_t*)malloc(faces.size() * sizeof(int64_t));
        std::memcpy(*out_faces, faces.data(), faces.size() * sizeof(int64_t));
    }
    return 0;
}

void mt_free(float* verts, int64_t* faces) {
    free(verts);
    free(faces);
}

// ---- 26-connected components over a class-id grid (union-find) ----
// out_labels: component id per voxel (-1 for null/empty classes).
// Components are numbered by first voxel in C scan order. Returns count.
int64_t cc_label(const int32_t* grid, int64_t X, int64_t Y, int64_t Z,
                 int32_t null_id, int32_t* out_labels) {
    const int64_t N = X * Y * Z;
    const int64_t sx = Y * Z, sy = Z;
    std::vector<int64_t> parent(N);
    for (int64_t i = 0; i < N; i++) parent[i] = i;

    std::vector<int64_t> stack;
    auto find = [&](int64_t i) {
        int64_t root = i;
        while (parent[root] != root) root = parent[root];
        while (parent[i] != root) {
            int64_t next = parent[i];
            parent[i] = root;
            i = next;
        }
        return root;
    };
    auto unite = [&](int64_t a, int64_t b) {
        int64_t ra = find(a), rb = find(b);
        if (ra == rb) return;
        // keep the smaller linear index as root -> scan-order numbering
        if (ra < rb) parent[rb] = ra; else parent[ra] = rb;
    };

    // scan with 13 "previous" neighbors (half of the 26-neighborhood)
    for (int64_t x = 0; x < X; x++)
        for (int64_t y = 0; y < Y; y++)
            for (int64_t z = 0; z < Z; z++) {
                int64_t i = x * sx + y * sy + z;
                int32_t c = grid[i];
                if (c == null_id || c == -1) continue;
                for (int dx = -1; dx <= 0; dx++)
                    for (int dy = -1; dy <= 1; dy++)
                        for (int dz = -1; dz <= 1; dz++) {
                            if (dx == 0 && (dy > 0 || (dy == 0 && dz >= 0)))
                                continue;
                            int64_t nx = x + dx, ny = y + dy, nz = z + dz;
                            if (nx < 0 || ny < 0 || ny >= Y || nz < 0 ||
                                nz >= Z)
                                continue;
                            int64_t j = nx * sx + ny * sy + nz;
                            if (grid[j] == c) unite(i, j);
                        }
            }

    // normalize: assign compact component ids in scan order of roots
    std::unordered_map<int64_t, int32_t> root_to_id;
    int32_t next_id = 0;
    for (int64_t i = 0; i < N; i++) {
        int32_t c = grid[i];
        if (c == null_id || c == -1) {
            out_labels[i] = -1;
            continue;
        }
        int64_t r = find(i);
        auto it = root_to_id.find(r);
        if (it == root_to_id.end()) {
            root_to_id.emplace(r, next_id);
            out_labels[i] = next_id++;
        } else {
            out_labels[i] = it->second;
        }
    }
    return next_id;
}

}  // extern "C"
