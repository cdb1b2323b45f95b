// Timing harness: reference ICET ctor (full registration) repeated N times.
#include <Eigen/Dense>
#include <fstream>
#include <iostream>
#include <chrono>
#include <cstdlib>
#include "icet.h"

static Eigen::MatrixXf load_xyz(const char* path) {
    std::ifstream f(path, std::ios::binary);
    f.seekg(0, std::ios::end);
    size_t bytes = f.tellg();
    f.seekg(0);
    size_t n = bytes / (3 * sizeof(float));
    Eigen::Matrix<float, Eigen::Dynamic, 3, Eigen::RowMajor> m(n, 3);
    f.read(reinterpret_cast<char*>(m.data()), bytes);
    return m;
}

int main(int argc, char** argv) {
    Eigen::MatrixXf s1 = load_xyz(argv[1]);
    Eigen::MatrixXf s2 = load_xyz(argv[2]);
    int runlen = atoi(argv[3]);
    int reps = atoi(argv[4]);
    Eigen::VectorXf X0(6);
    X0 << 0, 0, 0, 0, 0, 0;
    double best = 1e18, sum = 0;
    for (int r = 0; r < reps; r++) {
        Eigen::MatrixXf a = s1, b = s2;
        auto t0 = std::chrono::steady_clock::now();
        ICET it(a, b, runlen, X0, 24, 75, 25, 0.1f, 0.1f);
        volatile float sink = it.X[0];
        (void)sink;
        auto t1 = std::chrono::steady_clock::now();
        double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();
        sum += ms;
        if (ms < best) best = ms;
    }
    std::cout << "reps=" << reps << " runlen=" << runlen
              << " best_ms=" << best << " mean_ms=" << sum / reps << std::endl;
    return 0;
}
