// Native IO core for gsdf_slam_tpu.
//
// The reference implements its entire data plane in C++
// (submodules/data_loader/*, PCL/tinyply readers); this library is the
// TPU-framework counterpart: the hot host-side byte work — point-cloud
// decoding and pose-file parsing — in C++17 behind a minimal C ABI consumed
// via ctypes (no pybind11 in the image). Python keeps a pure fallback, so
// the library is an accelerator, not a dependency.
//
// Build: `make -C native` (produces native/libgsdf_io.so).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

extern "C" {

// KITTI velodyne .bin: packed float32 (x, y, z, intensity) records
// (data_loader.cpp:141-160). Returns number of points written (xyz only),
// -1 on IO error. `max_points` bounds the output buffer.
int64_t gsdf_read_kitti_bin(const char* path, float* out_xyz, int64_t max_points) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t n_records = size / (4 * sizeof(float));
  const int64_t n = n_records < max_points ? n_records : max_points;
  std::vector<float> raw(static_cast<size_t>(n) * 4);
  const size_t got = std::fread(raw.data(), 4 * sizeof(float), n, f);
  std::fclose(f);
  for (size_t i = 0; i < got; ++i) {
    out_xyz[i * 3 + 0] = raw[i * 4 + 0];
    out_xyz[i * 3 + 1] = raw[i * 4 + 1];
    out_xyz[i * 3 + 2] = raw[i * 4 + 2];
  }
  return static_cast<int64_t>(got);
}

// Pose files (base_parser.cpp:321-437 formats):
//   type 0: 4x4, 4 numbers/line;  type 1: 16/line;  type 2: KITTI 12/line;
//   type 3: TUM "t x y z qx qy qz qw" (timestamps -> out_stamps).
// Writes row-major 4x4 matrices; returns pose count or -1.
int64_t gsdf_load_poses(const char* path, int pose_type, float* out_mats,
                        double* out_stamps, int64_t max_poses) {
  std::ifstream file(path);
  if (!file.is_open()) return -1;
  std::vector<double> values;
  values.reserve(1 << 16);
  std::string line;
  std::vector<std::vector<double>> rows;
  while (std::getline(file, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream iss(line);
    std::vector<double> row;
    double v;
    while (iss >> v) row.push_back(v);
    if (!row.empty()) rows.push_back(std::move(row));
  }
  int64_t n = 0;
  auto emit_identity = [&](float* m) {
    std::memset(m, 0, 16 * sizeof(float));
    m[0] = m[5] = m[10] = m[15] = 1.0f;
  };
  if (pose_type == 0) {
    for (size_t i = 0; i + 3 < rows.size() && n < max_poses; i += 4) {
      float* m = out_mats + n * 16;
      for (int r = 0; r < 4; ++r)
        for (int c = 0; c < 4; ++c)
          m[r * 4 + c] = static_cast<float>(rows[i + r][c]);
      ++n;
    }
  } else if (pose_type == 1 || pose_type == 2) {
    const int want = pose_type == 1 ? 16 : 12;
    for (auto& row : rows) {
      if (static_cast<int>(row.size()) < want || n >= max_poses) continue;
      float* m = out_mats + n * 16;
      emit_identity(m);
      for (int k = 0; k < want; ++k) m[k] = static_cast<float>(row[k]);
      ++n;
    }
  } else if (pose_type == 3) {
    for (auto& row : rows) {
      if (row.size() < 8 || n >= max_poses) continue;
      const double tx = row[1], ty = row[2], tz = row[3];
      double qx = row[4], qy = row[5], qz = row[6], qw = row[7];
      const double norm = std::sqrt(qx * qx + qy * qy + qz * qz + qw * qw);
      qx /= norm; qy /= norm; qz /= norm; qw /= norm;
      float* m = out_mats + n * 16;
      emit_identity(m);
      m[0] = static_cast<float>(1 - 2 * (qy * qy + qz * qz));
      m[1] = static_cast<float>(2 * (qx * qy - qw * qz));
      m[2] = static_cast<float>(2 * (qx * qz + qw * qy));
      m[4] = static_cast<float>(2 * (qx * qy + qw * qz));
      m[5] = static_cast<float>(1 - 2 * (qx * qx + qz * qz));
      m[6] = static_cast<float>(2 * (qy * qz - qw * qx));
      m[8] = static_cast<float>(2 * (qx * qz - qw * qy));
      m[9] = static_cast<float>(2 * (qy * qz + qw * qx));
      m[10] = static_cast<float>(1 - 2 * (qx * qx + qy * qy));
      m[3] = static_cast<float>(tx);
      m[7] = static_cast<float>(ty);
      m[11] = static_cast<float>(tz);
      if (out_stamps) out_stamps[n] = row[0];
      ++n;
    }
  } else {
    return -1;
  }
  return n;
}

// Binary little-endian PLY vertex reader (x/y/z float properties, arbitrary
// extra float properties skipped). Returns count or -1.
int64_t gsdf_read_ply_xyz(const char* path, float* out_xyz, int64_t max_points) {
  std::ifstream f(path, std::ios::binary);
  if (!f.is_open()) return -1;
  std::string line;
  int64_t count = 0;
  int stride_floats = 0;
  int xi = -1, yi = -1, zi = -1;
  bool binary_le = false;
  while (std::getline(f, line)) {
    if (line.rfind("format", 0) == 0) binary_le = line.find("binary_little_endian") != std::string::npos;
    if (line.rfind("element vertex", 0) == 0) count = std::atoll(line.c_str() + 14);
    if (line.rfind("property float", 0) == 0 || line.rfind("property double", 0) == 0) {
      const bool is_double = line.rfind("property double", 0) == 0;
      if (is_double) return -1;  // keep it simple: float-only fast path
      std::string name = line.substr(std::strlen("property float "));
      if (name == "x") xi = stride_floats;
      if (name == "y") yi = stride_floats;
      if (name == "z") zi = stride_floats;
      stride_floats += 1;
    }
    if (line.rfind("end_header", 0) == 0) break;
  }
  if (!binary_le || xi < 0 || yi < 0 || zi < 0 || count <= 0) return -1;
  const int64_t n = count < max_points ? count : max_points;
  std::vector<float> rec(stride_floats);
  for (int64_t i = 0; i < n; ++i) {
    f.read(reinterpret_cast<char*>(rec.data()), stride_floats * sizeof(float));
    if (!f) return i;
    out_xyz[i * 3 + 0] = rec[xi];
    out_xyz[i * 3 + 1] = rec[yi];
    out_xyz[i * 3 + 2] = rec[zi];
  }
  return n;
}

}  // extern "C"
