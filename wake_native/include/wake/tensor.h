// Dense 2-D float tensor for the wake-detector library.
//
// The reference (wake_model/neuron/neuron.h) models data as
// vector<vector<Neuron>> with one heap object per scalar — pointer-chasing
// that defeats vectorization.  Here data is one contiguous float buffer with
// (rows, cols) shape; loops over it auto-vectorize.
#pragma once

#include <cassert>
#include <cstddef>
#include <vector>

namespace wake {

struct Tensor {
  int rows = 0;
  int cols = 0;
  std::vector<float> data;

  Tensor() = default;
  Tensor(int r, int c, float fill = 0.0f) : rows(r), cols(c), data((size_t)r * c, fill) {}

  float &at(int r, int c) { return data[(size_t)r * cols + c]; }
  float at(int r, int c) const { return data[(size_t)r * cols + c]; }
  size_t size() const { return data.size(); }
  bool same_shape(const Tensor &o) const { return rows == o.rows && cols == o.cols; }
};

}  // namespace wake
