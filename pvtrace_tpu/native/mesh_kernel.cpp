// Native triangle-mesh ray casting kernel.
//
// Role: the reference delegates Mesh geometry to trimesh (optionally
// embree, C++) for ray casting (reference geometry/mesh.py:44-61).
// This kernel is the in-tree native replacement: Moller-Trumbore
// intersection, point containment by ray-parity, and nearest-triangle
// queries, exposed through a C ABI for ctypes. OpenMP parallelises the
// batched entry points.
//
// Build: python -m pvtrace_tpu.native.build
#include <cmath>
#include <cstdint>
#include <limits>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Vec3 {
    double x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) {
    return {a.x - b.x, a.y - b.y, a.z - b.z};
}
inline Vec3 cross(const Vec3& a, const Vec3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
inline double dot(const Vec3& a, const Vec3& b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}

inline Vec3 load(const double* p) { return {p[0], p[1], p[2]}; }

// Moller-Trumbore: returns t or NaN when the ray misses the triangle.
inline double triangle_t(const Vec3& orig, const Vec3& dir, const Vec3& v0,
                         const Vec3& e1, const Vec3& e2) {
    const double kEps = 1e-14;
    Vec3 pvec = cross(dir, e2);
    double det = dot(e1, pvec);
    if (std::fabs(det) < kEps) return std::numeric_limits<double>::quiet_NaN();
    double inv = 1.0 / det;
    Vec3 tvec = sub(orig, v0);
    double u = dot(tvec, pvec) * inv;
    if (u < -1e-12 || u > 1.0 + 1e-12)
        return std::numeric_limits<double>::quiet_NaN();
    Vec3 qvec = cross(tvec, e1);
    double v = dot(dir, qvec) * inv;
    if (v < -1e-12 || u + v > 1.0 + 1e-12)
        return std::numeric_limits<double>::quiet_NaN();
    return dot(e2, qvec) * inv;
}

}  // namespace

extern "C" {

// Precomputed triangle soup layout: for face f,
//   tris[f*9 + 0..2] = v0, tris[f*9 + 3..5] = e1, tris[f*9 + 6..8] = e2.
void pvtrace_build_tris(const double* vertices, const int64_t* faces,
                        int64_t n_faces, double* tris) {
    for (int64_t f = 0; f < n_faces; ++f) {
        const double* a = vertices + faces[f * 3 + 0] * 3;
        const double* b = vertices + faces[f * 3 + 1] * 3;
        const double* c = vertices + faces[f * 3 + 2] * 3;
        for (int k = 0; k < 3; ++k) {
            tris[f * 9 + 0 + k] = a[k];
            tris[f * 9 + 3 + k] = b[k] - a[k];
            tris[f * 9 + 6 + k] = c[k] - a[k];
        }
    }
}

// All forward hits (t >= t_min) of one ray, unsorted. Returns the hit
// count (capped at max_hits).
int64_t pvtrace_ray_hits(const double* tris, int64_t n_faces,
                         const double* origin, const double* direction,
                         double t_min, double* out_t, int64_t* out_face,
                         int64_t max_hits) {
    Vec3 o = load(origin), d = load(direction);
    int64_t n = 0;
    for (int64_t f = 0; f < n_faces && n < max_hits; ++f) {
        Vec3 v0 = load(tris + f * 9);
        Vec3 e1 = load(tris + f * 9 + 3);
        Vec3 e2 = load(tris + f * 9 + 6);
        double t = triangle_t(o, d, v0, e1, e2);
        if (std::isfinite(t) && t >= t_min) {
            out_t[n] = t;
            out_face[n] = f;
            ++n;
        }
    }
    return n;
}

// Parity containment test along a fixed direction; duplicate hits on
// shared edges are merged within `eps`.
int pvtrace_contains(const double* tris, int64_t n_faces,
                     const double* point, double eps) {
    const double dir[3] = {0.577350269189626, 0.577350269189626,
                           0.577350269189626};
    Vec3 o = load(point), d = load(dir);
    // Collect forward ts (small meshes: simple insertion into a local
    // buffer with dedup)
    double ts[512];
    int64_t n = 0;
    for (int64_t f = 0; f < n_faces && n < 512; ++f) {
        Vec3 v0 = load(tris + f * 9);
        Vec3 e1 = load(tris + f * 9 + 3);
        Vec3 e2 = load(tris + f * 9 + 6);
        double t = triangle_t(o, d, v0, e1, e2);
        if (std::isfinite(t) && t > eps) {
            bool dup = false;
            for (int64_t i = 0; i < n; ++i) {
                if (std::fabs(ts[i] - t) <= eps) { dup = true; break; }
            }
            if (!dup) ts[n++] = t;
        }
    }
    return static_cast<int>(n % 2);
}

// Nearest triangle to a point: writes distance, returns face index.
int64_t pvtrace_nearest_face(const double* tris, int64_t n_faces,
                             const double* point, double* out_dist) {
    Vec3 p = load(point);
    double best = std::numeric_limits<double>::infinity();
    int64_t best_face = -1;
    for (int64_t f = 0; f < n_faces; ++f) {
        Vec3 v0 = load(tris + f * 9);
        Vec3 e1 = load(tris + f * 9 + 3);
        Vec3 e2 = load(tris + f * 9 + 6);
        Vec3 w = sub(p, v0);
        double a = dot(e1, e1), b = dot(e1, e2), c = dot(e2, e2);
        double d1 = dot(e1, w), d2 = dot(e2, w);
        double det = a * c - b * b;
        if (std::fabs(det) < 1e-300) det = 1e-300;
        double u = (c * d1 - b * d2) / det;
        double v = (a * d2 - b * d1) / det;
        if (u < 0) u = 0;
        if (v < 0) v = 0;
        double s = u + v;
        if (s > 1.0) { u /= s; v /= s; }
        Vec3 q = {v0.x + u * e1.x + v * e2.x, v0.y + u * e1.y + v * e2.y,
                  v0.z + u * e1.z + v * e2.z};
        Vec3 diff = sub(p, q);
        double dist2 = dot(diff, diff);
        if (dist2 < best) {
            best = dist2;
            best_face = f;
        }
    }
    *out_dist = std::sqrt(best);
    return best_face;
}

// Batched first/second forward hits for many rays (OpenMP parallel).
// out_t is [n_rays, 2] (inf = no hit), out_count the number of forward
// hits per ray.
void pvtrace_batch_intersect(const double* tris, int64_t n_faces,
                             const double* origins, const double* dirs,
                             int64_t n_rays, double t_min, double* out_t,
                             int32_t* out_count) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t r = 0; r < n_rays; ++r) {
        Vec3 o = load(origins + r * 3), d = load(dirs + r * 3);
        double t1 = std::numeric_limits<double>::infinity();
        double t2 = std::numeric_limits<double>::infinity();
        int32_t count = 0;
        for (int64_t f = 0; f < n_faces; ++f) {
            Vec3 v0 = load(tris + f * 9);
            Vec3 e1 = load(tris + f * 9 + 3);
            Vec3 e2 = load(tris + f * 9 + 6);
            double t = triangle_t(o, d, v0, e1, e2);
            if (std::isfinite(t) && t >= t_min) {
                ++count;
                if (t < t1) {
                    t2 = t1;
                    t1 = t;
                } else if (t < t2) {
                    t2 = t;
                }
            }
        }
        out_t[r * 2] = t1;
        out_t[r * 2 + 1] = t2;
        out_count[r] = count;
    }
}

}  // extern "C"
