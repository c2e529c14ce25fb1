// Sequential model container with a real binary checkpoint format.
//
// The reference's Model::save_model wrote ``sizeof(*this)`` of a vector-of-
// pointers (wake_model/model/model.cpp:5-23) — 24 meaningless bytes.  This
// format is: magic "WAKE" + version + layer count + per-layer (kind string,
// payload), and restores a working network.
#pragma once

#include <iosfwd>
#include <memory>
#include <string>
#include <vector>

#include "layers.h"

namespace wake {

class Model {
 public:
  std::vector<std::unique_ptr<Layer>> layers;

  Tensor forward(const Tensor &x);
  // full backprop from softmax+CE output; returns loss.  ``lr > 0`` applies
  // per-sample SGD (the reference trains per-sample, train.cpp:66-138)
  float train_step(const Tensor &x, int label, float lr);
  Tensor backward(const Tensor &grad_out);  // grad only (no update)
  void apply_gradients(float lr);

  void save(const std::string &path) const;
  static Model load(const std::string &path);

  static constexpr uint32_t kMagic = 0x57414B45;  // "WAKE"
  static constexpr uint32_t kVersion = 1;
};

// the reference detector topology (wake_model/train.cpp:27-56):
// Conv(32x1, relu) -> MaxPool(2x1) -> Conv(64x1) -> MaxPool(2x1) ->
// Conv(128x1) -> MaxPool(2x1) -> Flatten -> Linear(1024, relu) ->
// Linear(n_classes, softmax)
Model build_wake_detector(int seq_len, int n_features, int n_classes,
                          unsigned seed = 42);

}  // namespace wake
