// Layer interface + concrete layers for the wake-event detector.
//
// Re-engineered from the reference wake_model (layers/convolution.cpp,
// maxpool.cpp, linear.cpp, flatten.cpp): same layer set and topology, but
// with correct backpropagation through the whole stack (the reference's conv
// backward consumed stale activations — SURVEY.md §2.9 bug 7), decoupled
// gradient/update steps, and a real serialization format (model.h).
#pragma once

#include <cmath>
#include <memory>
#include <random>
#include <string>
#include <vector>

#include "tensor.h"

namespace wake {

enum class Activation { None, ReLU, Sigmoid, Tanh, Softmax };

Activation activation_from_string(const std::string &name);
std::string activation_to_string(Activation a);

// y = act(x) elementwise (softmax over the flattened tensor)
void apply_activation(Activation a, Tensor &x);
// dL/dpre given dL/dpost and post-activation values (softmax handled by the
// fused CE gradient instead)
void activation_grad_inplace(Activation a, const Tensor &post, Tensor &grad);

class Layer {
 public:
  virtual ~Layer() = default;
  virtual Tensor forward(const Tensor &x) = 0;
  // grad wrt output -> grad wrt input; accumulates parameter gradients
  virtual Tensor backward(const Tensor &grad_out) = 0;
  // apply accumulated parameter gradients with SGD and clear them
  virtual void apply_gradients(float lr) {}
  virtual std::string kind() const = 0;
  // serialization hooks
  virtual void write(std::ostream &os) const = 0;
  virtual void read(std::istream &is) = 0;
};

// Valid (no-pad) stride-1 2-D cross-correlation, single input plane,
// ``filters`` output planes stacked along rows (reference convolution.cpp
// used exactly one filter; multi-filter generalizes it).
class Conv2D : public Layer {
 public:
  Conv2D(int kh, int kw, Activation act, unsigned seed = 42);
  Tensor forward(const Tensor &x) override;
  Tensor backward(const Tensor &grad_out) override;
  void apply_gradients(float lr) override;
  std::string kind() const override { return "conv2d"; }
  void write(std::ostream &os) const override;
  void read(std::istream &is) override;

  Tensor kernel;  // (kh, kw)
  float bias = 0.0f;

 private:
  Activation act_;
  Tensor input_, output_;
  Tensor dkernel_;
  float dbias_ = 0.0f;
};

// Max pooling with window (ph, pw) and stride (sh, sw).  The reference
// driver uses a 2x1 window with stride 1 (maxpool.cpp; its ctor also had the
// input_height=input_width typo, SURVEY.md §2.9 bug 5 — fixed by design).
class MaxPool2D : public Layer {
 public:
  MaxPool2D(int ph, int pw, int sh = -1, int sw = -1);
  Tensor forward(const Tensor &x) override;
  Tensor backward(const Tensor &grad_out) override;
  std::string kind() const override { return "maxpool2d"; }
  void write(std::ostream &os) const override;
  void read(std::istream &is) override;

 private:
  int ph_, pw_, sh_, sw_;
  int in_rows_ = 0, in_cols_ = 0;
  std::vector<int> argmax_;  // flat input index per output element
  int out_rows_ = 0, out_cols_ = 0;
};

class Flatten : public Layer {
 public:
  Tensor forward(const Tensor &x) override;
  Tensor backward(const Tensor &grad_out) override;
  std::string kind() const override { return "flatten"; }
  void write(std::ostream &os) const override;
  void read(std::istream &is) override;

 private:
  int in_rows_ = 0, in_cols_ = 0;
};

class Linear : public Layer {
 public:
  Linear(int in_features, int out_features, Activation act, unsigned seed = 42);
  Tensor forward(const Tensor &x) override;  // x: (1, in)
  Tensor backward(const Tensor &grad_out) override;
  void apply_gradients(float lr) override;
  std::string kind() const override { return "linear"; }
  void write(std::ostream &os) const override;
  void read(std::istream &is) override;

  Tensor weight;  // (out, in)
  std::vector<float> bias;

 private:
  Activation act_;
  Tensor input_, output_;
  Tensor dweight_;
  std::vector<float> dbias_;
};

// categorical cross-entropy over a softmax output (1, n)
float cross_entropy(const Tensor &probs, int label);
// fused softmax+CE gradient: probs - onehot(label) (reference losses.h:16-22)
Tensor cross_entropy_grad(const Tensor &probs, int label);

}  // namespace wake
