// Little-endian binary stream readers with hard failure on short reads.
#pragma once

#include <cstdint>
#include <istream>
#include <stdexcept>
#include <string>
#include <vector>

namespace nv {

inline void fail(const std::string& msg) { throw std::runtime_error(msg); }

inline void read_exact(std::istream& in, void* dst, size_t n,
                       const char* what) {
  in.read(static_cast<char*>(dst), static_cast<std::streamsize>(n));
  if (!in.good() && !(in.eof() && static_cast<size_t>(in.gcount()) == n)) {
    fail(std::string("truncated read: ") + what);
  }
}

inline uint32_t read_u32(std::istream& in, const char* what = "u32") {
  uint32_t v = 0;
  read_exact(in, &v, sizeof(v), what);
  return v;
}

inline float read_f32(std::istream& in, const char* what = "f32") {
  float v = 0;
  read_exact(in, &v, sizeof(v), what);
  return v;
}

template <typename T>
std::vector<T> read_vec(std::istream& in, size_t count, const char* what) {
  std::vector<T> v(count);
  read_exact(in, v.data(), count * sizeof(T), what);
  return v;
}

inline void expect(bool cond, const std::string& msg) {
  if (!cond) fail(msg);
}

}  // namespace nv
