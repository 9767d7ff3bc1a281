// Minimal OpenCV shim for building the reference encoder as a baseline
// anchor (only the cv:: surface used by EncCu.cpp:800-950: Mat over
// CV_16UC1/CV_32FC1, Size, absdiff, convertTo, at<float>, release).
// Not OpenCV; just enough to satisfy the reference's CNN feature-prep
// code path (which is inert without the .pt model anyway).
#pragma once
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <algorithm>

#define CV_16UC1 2
#define CV_32F 5
#define CV_32FC1 5

namespace cv {

struct Size {
  int width, height;
  Size(int w, int h) : width(w), height(h) {}
};

class Mat {
public:
  int rows = 0, cols = 0, type_ = 0;
  unsigned char* data = nullptr;
  bool owns_ = false;

  Mat() {}
  Mat(Size s, int type, void* external)
      : rows(s.height), cols(s.width), type_(type),
        data((unsigned char*)external), owns_(false) {}
  Mat(int r, int c, int type) { create(r, c, type); }
  Mat(const Mat& o) { *this = o; }
  Mat& operator=(const Mat& o) {
    release();
    rows = o.rows; cols = o.cols; type_ = o.type_;
    if (o.data) {
      create(o.rows, o.cols, o.type_);
      std::memcpy(data, o.data, bytes());
    }
    return *this;
  }
  ~Mat() { release(); }

  size_t elem_size() const { return type_ == CV_16UC1 ? 2 : 4; }
  size_t bytes() const { return (size_t)rows * cols * elem_size(); }

  void create(int r, int c, int type) {
    release();
    rows = r; cols = c; type_ = type;
    data = (unsigned char*)std::malloc((size_t)r * c * (type == CV_16UC1 ? 2 : 4));
    owns_ = true;
  }
  void release() {
    if (owns_ && data) std::free(data);
    data = nullptr; owns_ = false; rows = cols = 0;
  }
  template <typename T> T& at(int r, int c) {
    return ((T*)data)[(size_t)r * cols + c];
  }
  void convertTo(Mat& dst, int dtype, double alpha, double beta) const {
    dst.create(rows, cols, dtype);
    const uint16_t* src = (const uint16_t*)data;
    float* out = (float*)dst.data;
    for (size_t i = 0; i < (size_t)rows * cols; i++)
      out[i] = (float)(src[i] * alpha + beta);
  }
};

inline void absdiff(const Mat& a, const Mat& b, Mat& dst) {
  dst.create(a.rows, a.cols, a.type_);
  const uint16_t* pa = (const uint16_t*)a.data;
  const uint16_t* pb = (const uint16_t*)b.data;
  uint16_t* pd = (uint16_t*)dst.data;
  for (size_t i = 0; i < (size_t)a.rows * a.cols; i++)
    pd[i] = pa[i] > pb[i] ? pa[i] - pb[i] : pb[i] - pa[i];
}

}  // namespace cv

using cv::absdiff;
