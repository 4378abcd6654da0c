// Serial double-precision cost model of the OpenMM Reference platform's
// per-step hot path, used to ground BASELINE.md's ">= 10x the Reference
// platform" target with a real measurement (the JAX-on-CPU f64 stand-in
// turned out ~80x SLOWER than a plain C++ loop, which would inflate the
// ratio; see bench_baseline.json).
//
// Models what ReferencePlatform does per step for a PME system
// (platforms/reference in OpenMM proper; our reference plugin delegates to
// it): a voxel-hash neighbor list rebuilt EVERY step, then the O(N*K)
// direct-space pass with erfc(alpha r)/r Coulomb + Lorentz-Berthelot LJ in
// double precision, single-threaded.  The reciprocal-space PME, bonded
// terms, constraints, and integrator kinematics are OMITTED — every
// omission makes this model FASTER than the real Reference platform, so
// the reported engine/baseline speedup is an underestimate.
//
// Build: g++ -O3 -march=native -o reference_cost reference_cost.cpp -lm
// Run:   ./reference_cost <n_atoms> <steps>   -> prints ms/step

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <vector>

int main(int argc, char** argv) {
    const int n = argc > 1 ? std::atoi(argv[1]) : 100000;
    const int steps = argc > 2 ? std::atoi(argv[2]) : 3;
    const double cutoff = 1.0, alpha = 2.628;
    const double density = 167.0;  // atoms/nm^3 (5-site water at ~1 g/mL)
    const double L = std::cbrt(n / density);

    std::mt19937_64 rng(7);
    std::uniform_real_distribution<double> ud(0.0, L);
    std::vector<double> x(n), y(n), z(n), q(n), sig(n), eps(n);
    std::vector<double> fx(n), fy(n), fz(n);
    for (int i = 0; i < n; i++) {
        x[i] = ud(rng); y[i] = ud(rng); z[i] = ud(rng);
        q[i] = (i % 5 == 0) ? 1.71636 : -0.42909;
        sig[i] = (i % 5 == 0) ? 0.318395 : 1.0;
        eps[i] = (i % 5 == 0) ? 0.88257 : 0.0;
    }

    const int g = std::max(1, (int)std::floor(L / cutoff));
    const double cell = L / g;
    const int ncell = g * g * g;

    double e_accum = 0.0;
    double best_ms = 1e30;
    for (int s = 0; s < steps; s++) {
        auto t0 = std::chrono::steady_clock::now();

        // voxel hash (rebuilt per step, like ReferenceNeighborList)
        std::vector<int> head(ncell, -1), next(n);
        for (int i = 0; i < n; i++) {
            int cx = std::min(g - 1, (int)(x[i] / cell));
            int cy = std::min(g - 1, (int)(y[i] / cell));
            int cz = std::min(g - 1, (int)(z[i] / cell));
            int c = (cx * g + cy) * g + cz;
            next[i] = head[c];
            head[c] = i;
        }

        double e = 0.0;
        const double rc2 = cutoff * cutoff;
        for (int i = 0; i < n; i++) { fx[i] = fy[i] = fz[i] = 0.0; }
        for (int cx = 0; cx < g; cx++)
        for (int cy = 0; cy < g; cy++)
        for (int cz = 0; cz < g; cz++) {
            int c = (cx * g + cy) * g + cz;
            for (int i = head[c]; i >= 0; i = next[i]) {
                // half stencil of 13 neighbors + the cell itself
                static const int off[14][3] = {
                    {0,0,0},{1,0,0},{0,1,0},{0,0,1},{1,1,0},{1,0,1},
                    {0,1,1},{1,1,1},{1,-1,0},{1,0,-1},{0,1,-1},{1,1,-1},
                    {1,-1,1},{-1,1,1}};
                for (int o = 0; o < 14; o++) {
                    int bx = (cx + off[o][0] + g) % g;
                    int by = (cy + off[o][1] + g) % g;
                    int bz = (cz + off[o][2] + g) % g;
                    int b = (bx * g + by) * g + bz;
                    for (int j = head[b]; j >= 0; j = next[j]) {
                        if (o == 0 && j <= i) continue;
                        double dx = x[i] - x[j];
                        double dy = y[i] - y[j];
                        double dz = z[i] - z[j];
                        dx -= L * std::round(dx / L);
                        dy -= L * std::round(dy / L);
                        dz -= L * std::round(dz / L);
                        double r2 = dx * dx + dy * dy + dz * dz;
                        if (r2 >= rc2 || r2 < 1e-12) continue;
                        double r = std::sqrt(r2);
                        double inv_r = 1.0 / r;
                        double qq = 138.935458 * q[i] * q[j];
                        double ec = qq * std::erfc(alpha * r) * inv_r;
                        double ep = std::sqrt(eps[i] * eps[j]);
                        double el = 0.0, gl = 0.0;
                        if (ep > 0) {
                            double sr = 0.5 * (sig[i] + sig[j]) * inv_r;
                            double sr6 = sr * sr * sr; sr6 *= sr6;
                            el = 4 * ep * sr6 * (sr6 - 1.0);
                            gl = 4 * ep * (12 * sr6 * sr6 - 6 * sr6) / r2;
                        }
                        double gc = (ec + qq * (2.0 / std::sqrt(M_PI))
                                     * alpha * std::exp(-alpha * alpha * r2))
                                    / r2;
                        double gt = gc + gl;
                        e += ec + el;
                        fx[i] += gt * dx; fy[i] += gt * dy; fz[i] += gt * dz;
                        fx[j] -= gt * dx; fy[j] -= gt * dy; fz[j] -= gt * dz;
                    }
                }
            }
        }
        e_accum += e;
        auto t1 = std::chrono::steady_clock::now();
        double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();
        if (ms < best_ms) best_ms = ms;
    }
    std::printf("{\"ms_per_step\": %.3f, \"checksum\": %.6e}\n",
                best_ms, e_accum);
    return 0;
}
