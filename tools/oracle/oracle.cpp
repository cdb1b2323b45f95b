// Oracle harness: run the reference ICET (unmodified, from /root/reference)
// on raw float32 xyz binary clouds and print X + pred_stds.
#include <Eigen/Dense>
#include <fstream>
#include <iostream>
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
    if (argc < 8) { std::cerr << "usage: oracle s1.bin s2.bin runlen nphi ntheta n thresh buff [x0...]\n"; return 2; }
    Eigen::MatrixXf s1 = load_xyz(argv[1]);
    Eigen::MatrixXf s2 = load_xyz(argv[2]);
    int runlen = atoi(argv[3]);
    int nphi = atoi(argv[4]);
    int ntheta = atoi(argv[5]);
    int n = atoi(argv[6]);
    float thresh = atof(argv[7]);
    float buff = atof(argv[8]);
    Eigen::VectorXf X0(6);
    X0 << 0, 0, 0, 0, 0, 0;
    for (int k = 0; k < 6 && 9 + k < argc; k++) X0[k] = atof(argv[9 + k]);
    ICET it(s1, s2, runlen, X0, nphi, ntheta, n, thresh, buff);
    std::cout.precision(8);
    std::cout << "X:";
    for (int k = 0; k < 6; k++) std::cout << " " << it.X[k];
    std::cout << "\nstds:";
    for (int k = 0; k < 6; k++) std::cout << " " << it.pred_stds[k];
    std::cout << std::endl;
    return 0;
}
