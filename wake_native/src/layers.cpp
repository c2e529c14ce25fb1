#include "wake/layers.h"

#include <algorithm>
#include <istream>
#include <limits>
#include <ostream>
#include <stdexcept>

namespace wake {

Activation activation_from_string(const std::string &name) {
  if (name == "relu") return Activation::ReLU;
  if (name == "sigmoid") return Activation::Sigmoid;
  if (name == "tanh") return Activation::Tanh;
  if (name == "softmax") return Activation::Softmax;
  if (name == "none" || name.empty()) return Activation::None;
  throw std::invalid_argument("unknown activation: " + name);
}

std::string activation_to_string(Activation a) {
  switch (a) {
    case Activation::ReLU: return "relu";
    case Activation::Sigmoid: return "sigmoid";
    case Activation::Tanh: return "tanh";
    case Activation::Softmax: return "softmax";
    default: return "none";
  }
}

void apply_activation(Activation a, Tensor &x) {
  switch (a) {
    case Activation::None:
      return;
    case Activation::ReLU:
      for (float &v : x.data) v = v > 0.0f ? v : 0.0f;
      return;
    case Activation::Sigmoid:
      for (float &v : x.data) v = 1.0f / (1.0f + std::exp(-v));
      return;
    case Activation::Tanh:
      for (float &v : x.data) v = std::tanh(v);
      return;
    case Activation::Softmax: {
      // numerically stable softmax over all elements (reference
      // activations.h:29-41)
      float mx = -std::numeric_limits<float>::infinity();
      for (float v : x.data) mx = std::max(mx, v);
      double sum = 0.0;
      for (float &v : x.data) {
        v = std::exp(v - mx);
        sum += v;
      }
      for (float &v : x.data) v = (float)(v / sum);
      return;
    }
  }
}

void activation_grad_inplace(Activation a, const Tensor &post, Tensor &grad) {
  switch (a) {
    case Activation::None:
    case Activation::Softmax:  // fused with CE gradient
      return;
    case Activation::ReLU:
      for (size_t i = 0; i < grad.data.size(); ++i)
        if (post.data[i] <= 0.0f) grad.data[i] = 0.0f;
      return;
    case Activation::Sigmoid:
      for (size_t i = 0; i < grad.data.size(); ++i)
        grad.data[i] *= post.data[i] * (1.0f - post.data[i]);
      return;
    case Activation::Tanh:
      for (size_t i = 0; i < grad.data.size(); ++i)
        grad.data[i] *= 1.0f - post.data[i] * post.data[i];
      return;
  }
}

// ---------------------------------------------------------------------------
// Conv2D
// ---------------------------------------------------------------------------

Conv2D::Conv2D(int kh, int kw, Activation act, unsigned seed)
    : kernel(kh, kw), act_(act), dkernel_(kh, kw) {
  // He-style uniform init (reference convolution.cpp:13-25 uses
  // +-sqrt(6/(kw*kh)))
  std::mt19937 rng(seed);
  float limit = std::sqrt(6.0f / (float)(kh * kw));
  std::uniform_real_distribution<float> dist(-limit, limit);
  for (float &v : kernel.data) v = dist(rng);
}

Tensor Conv2D::forward(const Tensor &x) {
  input_ = x;
  int oh = x.rows - kernel.rows + 1;
  int ow = x.cols - kernel.cols + 1;
  if (oh <= 0 || ow <= 0) throw std::invalid_argument("conv input too small");
  Tensor out(oh, ow);
  for (int r = 0; r < oh; ++r) {
    for (int c = 0; c < ow; ++c) {
      float acc = bias;
      for (int i = 0; i < kernel.rows; ++i) {
        const float *xi = &x.data[(size_t)(r + i) * x.cols + c];
        const float *ki = &kernel.data[(size_t)i * kernel.cols];
        for (int j = 0; j < kernel.cols; ++j) acc += xi[j] * ki[j];
      }
      out.at(r, c) = acc;
    }
  }
  apply_activation(act_, out);
  output_ = out;
  return out;
}

Tensor Conv2D::backward(const Tensor &grad_out) {
  Tensor g = grad_out;
  activation_grad_inplace(act_, output_, g);
  // parameter grads
  for (int i = 0; i < kernel.rows; ++i)
    for (int j = 0; j < kernel.cols; ++j) {
      float acc = 0.0f;
      for (int r = 0; r < g.rows; ++r)
        for (int c = 0; c < g.cols; ++c)
          acc += input_.at(r + i, c + j) * g.at(r, c);
      dkernel_.at(i, j) += acc;
    }
  for (float v : g.data) dbias_ += v;
  // input grad: full correlation with flipped kernel
  Tensor gin(input_.rows, input_.cols);
  for (int r = 0; r < g.rows; ++r)
    for (int c = 0; c < g.cols; ++c) {
      float gv = g.at(r, c);
      for (int i = 0; i < kernel.rows; ++i)
        for (int j = 0; j < kernel.cols; ++j)
          gin.at(r + i, c + j) += gv * kernel.at(i, j);
    }
  return gin;
}

void Conv2D::apply_gradients(float lr) {
  for (size_t i = 0; i < kernel.data.size(); ++i) {
    kernel.data[i] -= lr * dkernel_.data[i];
    dkernel_.data[i] = 0.0f;
  }
  bias -= lr * dbias_;
  dbias_ = 0.0f;
}

void Conv2D::write(std::ostream &os) const {
  int kh = kernel.rows, kw = kernel.cols, act = (int)act_;
  os.write((const char *)&kh, sizeof kh);
  os.write((const char *)&kw, sizeof kw);
  os.write((const char *)&act, sizeof act);
  os.write((const char *)kernel.data.data(), kernel.data.size() * sizeof(float));
  os.write((const char *)&bias, sizeof bias);
}

void Conv2D::read(std::istream &is) {
  int kh, kw, act;
  is.read((char *)&kh, sizeof kh);
  is.read((char *)&kw, sizeof kw);
  is.read((char *)&act, sizeof act);
  kernel = Tensor(kh, kw);
  dkernel_ = Tensor(kh, kw);
  act_ = (Activation)act;
  is.read((char *)kernel.data.data(), kernel.data.size() * sizeof(float));
  is.read((char *)&bias, sizeof bias);
}

// ---------------------------------------------------------------------------
// MaxPool2D
// ---------------------------------------------------------------------------

MaxPool2D::MaxPool2D(int ph, int pw, int sh, int sw)
    : ph_(ph), pw_(pw), sh_(sh > 0 ? sh : 1), sw_(sw > 0 ? sw : 1) {}

Tensor MaxPool2D::forward(const Tensor &x) {
  in_rows_ = x.rows;
  in_cols_ = x.cols;
  out_rows_ = (x.rows - ph_) / sh_ + 1;
  out_cols_ = (x.cols - pw_) / sw_ + 1;
  if (out_rows_ <= 0 || out_cols_ <= 0)
    throw std::invalid_argument("pool input too small");
  Tensor out(out_rows_, out_cols_);
  argmax_.assign((size_t)out_rows_ * out_cols_, 0);
  for (int r = 0; r < out_rows_; ++r)
    for (int c = 0; c < out_cols_; ++c) {
      float best = -std::numeric_limits<float>::infinity();
      int best_idx = 0;
      for (int i = 0; i < ph_; ++i)
        for (int j = 0; j < pw_; ++j) {
          int rr = r * sh_ + i, cc = c * sw_ + j;
          float v = x.at(rr, cc);
          if (v > best) {
            best = v;
            best_idx = rr * x.cols + cc;
          }
        }
      out.at(r, c) = best;
      argmax_[(size_t)r * out_cols_ + c] = best_idx;
    }
  return out;
}

Tensor MaxPool2D::backward(const Tensor &grad_out) {
  Tensor gin(in_rows_, in_cols_);
  for (int r = 0; r < out_rows_; ++r)
    for (int c = 0; c < out_cols_; ++c)
      gin.data[argmax_[(size_t)r * out_cols_ + c]] += grad_out.at(r, c);
  return gin;
}

void MaxPool2D::write(std::ostream &os) const {
  int v[4] = {ph_, pw_, sh_, sw_};
  os.write((const char *)v, sizeof v);
}

void MaxPool2D::read(std::istream &is) {
  int v[4];
  is.read((char *)v, sizeof v);
  ph_ = v[0]; pw_ = v[1]; sh_ = v[2]; sw_ = v[3];
}

// ---------------------------------------------------------------------------
// Flatten
// ---------------------------------------------------------------------------

Tensor Flatten::forward(const Tensor &x) {
  in_rows_ = x.rows;
  in_cols_ = x.cols;
  Tensor out(1, x.rows * x.cols);
  out.data = x.data;
  return out;
}

Tensor Flatten::backward(const Tensor &grad_out) {
  Tensor gin(in_rows_, in_cols_);
  gin.data = grad_out.data;
  return gin;
}

void Flatten::write(std::ostream &) const {}
void Flatten::read(std::istream &) {}

// ---------------------------------------------------------------------------
// Linear
// ---------------------------------------------------------------------------

Linear::Linear(int in_features, int out_features, Activation act, unsigned seed)
    : weight(out_features, in_features),
      bias((size_t)out_features, 0.0f),
      act_(act),
      dweight_(out_features, in_features),
      dbias_((size_t)out_features, 0.0f) {
  // Kaiming-normal init (reference linear.h:18-33 uses N(0, sqrt(2/in)))
  std::mt19937 rng(seed);
  std::normal_distribution<float> dist(0.0f, std::sqrt(2.0f / (float)in_features));
  for (float &v : weight.data) v = dist(rng);
}

Tensor Linear::forward(const Tensor &x) {
  input_ = x;
  Tensor out(1, weight.rows);
  for (int o = 0; o < weight.rows; ++o) {
    const float *w = &weight.data[(size_t)o * weight.cols];
    float acc = bias[o];
    for (int i = 0; i < weight.cols; ++i) acc += w[i] * x.data[i];
    out.data[o] = acc;
  }
  apply_activation(act_, out);
  output_ = out;
  return out;
}

Tensor Linear::backward(const Tensor &grad_out) {
  Tensor g = grad_out;
  activation_grad_inplace(act_, output_, g);
  for (int o = 0; o < weight.rows; ++o) {
    float go = g.data[o];
    float *dw = &dweight_.data[(size_t)o * weight.cols];
    for (int i = 0; i < weight.cols; ++i) dw[i] += go * input_.data[i];
    dbias_[o] += go;
  }
  Tensor gin(1, weight.cols);
  for (int o = 0; o < weight.rows; ++o) {
    float go = g.data[o];
    const float *w = &weight.data[(size_t)o * weight.cols];
    for (int i = 0; i < weight.cols; ++i) gin.data[i] += go * w[i];
  }
  return gin;
}

void Linear::apply_gradients(float lr) {
  for (size_t i = 0; i < weight.data.size(); ++i) {
    weight.data[i] -= lr * dweight_.data[i];
    dweight_.data[i] = 0.0f;
  }
  for (size_t o = 0; o < bias.size(); ++o) {
    bias[o] -= lr * dbias_[o];
    dbias_[o] = 0.0f;
  }
}

void Linear::write(std::ostream &os) const {
  int out_f = weight.rows, in_f = weight.cols, act = (int)act_;
  os.write((const char *)&out_f, sizeof out_f);
  os.write((const char *)&in_f, sizeof in_f);
  os.write((const char *)&act, sizeof act);
  os.write((const char *)weight.data.data(), weight.data.size() * sizeof(float));
  os.write((const char *)bias.data(), bias.size() * sizeof(float));
}

void Linear::read(std::istream &is) {
  int out_f, in_f, act;
  is.read((char *)&out_f, sizeof out_f);
  is.read((char *)&in_f, sizeof in_f);
  is.read((char *)&act, sizeof act);
  weight = Tensor(out_f, in_f);
  dweight_ = Tensor(out_f, in_f);
  bias.assign((size_t)out_f, 0.0f);
  dbias_.assign((size_t)out_f, 0.0f);
  act_ = (Activation)act;
  is.read((char *)weight.data.data(), weight.data.size() * sizeof(float));
  is.read((char *)bias.data(), bias.size() * sizeof(float));
}

// ---------------------------------------------------------------------------
// loss
// ---------------------------------------------------------------------------

float cross_entropy(const Tensor &probs, int label) {
  // (reference losses.h:8-14 with the same 1e-15 epsilon)
  float p = probs.data[(size_t)label];
  return -std::log(p + 1e-15f);
}

Tensor cross_entropy_grad(const Tensor &probs, int label) {
  Tensor g = probs;
  g.data[(size_t)label] -= 1.0f;
  return g;
}

}  // namespace wake
