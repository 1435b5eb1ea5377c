// CLI with the reference-compatible signature (rt_preprocessing/
// output_sites.cc):
//   output_sites sites_file neighbours_file x_min x_max y_min y_max z_min z_max
// sites_file rows: "id x y z" (1-based ids, io.jl:8-40); output rows:
// "id nb1 nb2 ..." with wall contacts -5 (bottom) / -6 (top).

#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" int vrt_build_neighbors(const double*, const double*,
                                   const double*, long long, double, double,
                                   double, double, double, double, int,
                                   int*, int*, int);

int main(int argc, char** argv) {
  if (argc < 9) {
    std::fprintf(stderr, "Too few input arguments\n");
    return 1;
  }
  const char* sites_file = argv[1];
  const char* neighbours_file = argv[2];
  double x_min = std::atof(argv[3]), x_max = std::atof(argv[4]);
  double y_min = std::atof(argv[5]), y_max = std::atof(argv[6]);
  double z_min = std::atof(argv[7]), z_max = std::atof(argv[8]);

  std::printf("---Calculating neighbours---\n");

  std::vector<double> xs, ys, zs;
  std::vector<long long> ids;
  {
    FILE* f = std::fopen(sites_file, "r");
    if (!f) {
      std::fprintf(stderr, "cannot open %s\n", sites_file);
      return 1;
    }
    long long id;
    double x, y, z;
    while (std::fscanf(f, "%lld %lf %lf %lf", &id, &x, &y, &z) == 4) {
      ids.push_back(id);
      xs.push_back(x);
      ys.push_back(y);
      zs.push_back(z);
    }
    std::fclose(f);
  }
  long long n = (long long)xs.size();

  int max_nb = 70;  // reference max_guess (voronoi_utils.jl:42)
  std::vector<int> counts(n), nbrs;
  int ret;
  for (;;) {
    nbrs.assign((size_t)n * max_nb, 0);
    ret = vrt_build_neighbors(xs.data(), ys.data(), zs.data(), n, x_min,
                              x_max, y_min, y_max, z_min, z_max, max_nb,
                              counts.data(), nbrs.data(), 0);
    if (ret >= 0) break;
    max_nb *= 2;
  }

  FILE* out = std::fopen(neighbours_file, "w");
  if (!out) {
    std::fprintf(stderr, "cannot open %s\n", neighbours_file);
    return 1;
  }
  for (long long i = 0; i < n; ++i) {
    std::fprintf(out, "%lld", ids[i]);
    for (int j = 0; j < counts[i]; ++j) {
      int v = nbrs[(size_t)i * max_nb + j];
      // map 0-based internal ids back to the input (1-based) ids
      std::fprintf(out, " %lld", v >= 0 ? ids[v] : (long long)v);
    }
    std::fprintf(out, "\n");
  }
  std::fclose(out);
  return 0;
}
