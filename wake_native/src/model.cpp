#include "wake/model.h"

#include <fstream>
#include <stdexcept>

namespace wake {

Tensor Model::forward(const Tensor &x) {
  Tensor y = x;
  for (auto &l : layers) y = l->forward(y);
  return y;
}

Tensor Model::backward(const Tensor &grad_out) {
  Tensor g = grad_out;
  for (auto it = layers.rbegin(); it != layers.rend(); ++it)
    g = (*it)->backward(g);
  return g;
}

void Model::apply_gradients(float lr) {
  for (auto &l : layers) l->apply_gradients(lr);
}

float Model::train_step(const Tensor &x, int label, float lr) {
  Tensor probs = forward(x);
  float loss = cross_entropy(probs, label);
  Tensor g = cross_entropy_grad(probs, label);
  backward(g);
  if (lr > 0.0f) apply_gradients(lr);
  return loss;
}

static void write_string(std::ostream &os, const std::string &s) {
  uint32_t n = (uint32_t)s.size();
  os.write((const char *)&n, sizeof n);
  os.write(s.data(), n);
}

static std::string read_string(std::istream &is) {
  uint32_t n = 0;
  is.read((char *)&n, sizeof n);
  std::string s(n, '\0');
  is.read(s.data(), n);
  return s;
}

void Model::save(const std::string &path) const {
  std::ofstream os(path, std::ios::binary);
  if (!os) throw std::runtime_error("cannot open " + path);
  uint32_t magic = kMagic, version = kVersion, count = (uint32_t)layers.size();
  os.write((const char *)&magic, sizeof magic);
  os.write((const char *)&version, sizeof version);
  os.write((const char *)&count, sizeof count);
  for (const auto &l : layers) {
    write_string(os, l->kind());
    l->write(os);
  }
}

Model Model::load(const std::string &path) {
  std::ifstream is(path, std::ios::binary);
  if (!is) throw std::runtime_error("cannot open " + path);
  uint32_t magic, version, count;
  is.read((char *)&magic, sizeof magic);
  is.read((char *)&version, sizeof version);
  is.read((char *)&count, sizeof count);
  if (magic != kMagic) throw std::runtime_error("bad magic in " + path);
  if (version != kVersion) throw std::runtime_error("bad version in " + path);
  Model m;
  for (uint32_t i = 0; i < count; ++i) {
    std::string kind = read_string(is);
    std::unique_ptr<Layer> l;
    if (kind == "conv2d") l = std::make_unique<Conv2D>(1, 1, Activation::None);
    else if (kind == "maxpool2d") l = std::make_unique<MaxPool2D>(1, 1);
    else if (kind == "flatten") l = std::make_unique<Flatten>();
    else if (kind == "linear")
      l = std::make_unique<Linear>(1, 1, Activation::None);
    else throw std::runtime_error("unknown layer kind " + kind);
    l->read(is);
    m.layers.push_back(std::move(l));
  }
  return m;
}

Model build_wake_detector(int seq_len, int n_features, int n_classes,
                          unsigned seed) {
  // conv stack (k=32,64,128) + three 2x1 pools shrink time by 225 rows
  if (seq_len < 226)
    throw std::invalid_argument(
        "wake detector needs seq_len >= 226 (conv 32/64/128 + pools)");
  Model m;
  int h = seq_len, w = n_features;
  auto add_conv = [&](int kh, int kw, Activation act, unsigned s) {
    m.layers.push_back(std::make_unique<Conv2D>(kh, kw, act, s));
    h = h - kh + 1;
    w = w - kw + 1;
  };
  auto add_pool = [&]() {
    m.layers.push_back(std::make_unique<MaxPool2D>(2, 1, 1, 1));
    h = h - 1;  // 2x1 window, stride 1
  };
  add_conv(32, 1, Activation::ReLU, seed);
  add_pool();
  add_conv(64, 1, Activation::ReLU, seed + 1);
  add_pool();
  add_conv(128, 1, Activation::ReLU, seed + 2);
  add_pool();
  m.layers.push_back(std::make_unique<Flatten>());
  m.layers.push_back(
      std::make_unique<Linear>(h * w, 1024, Activation::ReLU, seed + 3));
  m.layers.push_back(
      std::make_unique<Linear>(1024, n_classes, Activation::Softmax, seed + 4));
  return m;
}

}  // namespace wake
