// Native tests: layer oracles, finite-difference gradient checks (the
// reference's backprop was structurally broken through the conv stack —
// SURVEY.md §2.9 bug 7 — so gradients are checked numerically here),
// serialization roundtrip, and end-to-end convergence on a synthetic
// event-time task.
#include <cassert>
#include <cmath>
#include <cstdio>
#include <fstream>
#include <random>

#include "wake/dataset.h"
#include "wake/model.h"

using namespace wake;

static int failures = 0;
#define CHECK(cond)                                              \
  do {                                                           \
    if (!(cond)) {                                               \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      ++failures;                                                \
    }                                                            \
  } while (0)

static void test_conv_forward_oracle() {
  Conv2D conv(2, 2, Activation::None, 1);
  conv.kernel.at(0, 0) = 1; conv.kernel.at(0, 1) = 0;
  conv.kernel.at(1, 0) = 0; conv.kernel.at(1, 1) = -1;
  conv.bias = 0.5f;
  Tensor x(3, 3);
  for (int i = 0; i < 9; ++i) x.data[i] = (float)i;  // 0..8
  Tensor y = conv.forward(x);
  CHECK(y.rows == 2 && y.cols == 2);
  // y[0][0] = x00*1 + x11*(-1) + 0.5 = 0 - 4 + 0.5
  CHECK(std::fabs(y.at(0, 0) - (-3.5f)) < 1e-6f);
  CHECK(std::fabs(y.at(1, 1) - (4.0f - 8.0f + 0.5f)) < 1e-6f);
}

static void test_maxpool_roundtrip() {
  MaxPool2D pool(2, 1, 1, 1);
  Tensor x(4, 2);
  float vals[] = {1, 9, 5, 2, 8, 3, 4, 7};
  for (int i = 0; i < 8; ++i) x.data[i] = vals[i];
  Tensor y = pool.forward(x);
  CHECK(y.rows == 3 && y.cols == 2);
  CHECK(y.at(0, 0) == 5 && y.at(0, 1) == 9);
  Tensor g(3, 2, 1.0f);
  Tensor gin = pool.backward(g);
  CHECK(gin.rows == 4 && gin.cols == 2);
  float total = 0;
  for (float v : gin.data) total += v;
  CHECK(std::fabs(total - 6.0f) < 1e-6f);
}

// finite-difference check of dL/dinput through a small full model
static void test_input_gradient_fd() {
  Model m;
  m.layers.push_back(std::make_unique<Conv2D>(3, 1, Activation::ReLU, 7));
  m.layers.push_back(std::make_unique<MaxPool2D>(2, 1, 1, 1));
  m.layers.push_back(std::make_unique<Flatten>());
  m.layers.push_back(std::make_unique<Linear>(14, 8, Activation::ReLU, 8));
  m.layers.push_back(std::make_unique<Linear>(8, 5, Activation::Softmax, 9));

  std::mt19937 rng(3);
  std::uniform_real_distribution<float> dist(-1.0f, 1.0f);
  Tensor x(10, 2);
  for (float &v : x.data) v = dist(rng);
  int label = 2;

  Tensor probs = m.forward(x);
  Tensor g = cross_entropy_grad(probs, label);
  Tensor gin = m.backward(g);  // no update

  const float eps = 1e-3f;
  int checked = 0;
  for (size_t i = 0; i < x.data.size(); i += 3) {
    Tensor xp = x, xm = x;
    xp.data[i] += eps;
    xm.data[i] -= eps;
    float lp = cross_entropy(m.forward(xp), label);
    float lm = cross_entropy(m.forward(xm), label);
    float fd = (lp - lm) / (2 * eps);
    float an = gin.data[i];
    CHECK(std::fabs(fd - an) < 5e-2f * std::max(1.0f, std::fabs(fd)));
    ++checked;
  }
  CHECK(checked > 0);
}

// parameter gradients: loss decreases after an SGD step on the same sample
static void test_param_gradient_descent() {
  Model m = build_wake_detector(256, 2, 256, 5);
  std::mt19937 rng(4);
  std::uniform_real_distribution<float> dist(-1.0f, 1.0f);
  Tensor x(256, 2);
  for (float &v : x.data) v = dist(rng);
  int label = 20;
  float l0 = cross_entropy(m.forward(x), label);
  for (int i = 0; i < 5; ++i) m.train_step(x, label, 0.01f);
  float l1 = cross_entropy(m.forward(x), label);
  CHECK(l1 < l0);
}

static void test_serialization_roundtrip() {
  Model m = build_wake_detector(240, 2, 240, 11);
  std::mt19937 rng(5);
  std::uniform_real_distribution<float> dist(-1.0f, 1.0f);
  Tensor x(240, 2);
  for (float &v : x.data) v = dist(rng);
  Tensor y1 = m.forward(x);
  m.save("/tmp/wake_test_model.bin");
  Model m2 = Model::load("/tmp/wake_test_model.bin");
  Tensor y2 = m2.forward(x);
  CHECK(y1.size() == y2.size());
  for (size_t i = 0; i < y1.size(); ++i)
    CHECK(std::fabs(y1.data[i] - y2.data[i]) < 1e-6f);
}

static void write_synth_corpus(const std::string &dir, int n_files) {
  // catalog: filename,_,time_rel,_,type ; training rows: _,time_rel,velocity
  std::ofstream cat(dir + "/catalog.csv");
  cat << "filename,abs,time_rel(sec),extra,mq_type\n";
  std::mt19937 rng(6);
  for (int f = 0; f < n_files; ++f) {
    int event_row = 30 + 60 * (f % 3);  // averaged-row index of the impulse
    double time_rel = event_row * 7.0;
    std::string name = "evt" + std::to_string(f);
    cat << name << ",0," << time_rel << ",0,impulse\n";
    std::ofstream tf(dir + "/" + name + ".csv");
    tf << "abs,time_rel,velocity\n";
    int raw_rows = 240 * 7;  // 240 averaged rows
    std::normal_distribution<double> noise(0.0, 0.05);
    for (int r = 0; r < raw_rows; ++r) {
      double v = noise(rng);
      if (r / 7 == event_row) v += 5.0;  // impulse
      tf << "0," << (r * 1.0) << "," << v << "\n";
    }
  }
}

static void test_dataset_and_training_convergence() {
  std::string dir = "/tmp/wake_synth";
  std::system(("mkdir -p " + dir).c_str());
  write_synth_corpus(dir, 6);
  Dataset ds = load_dataset(dir + "/catalog.csv", dir);
  CHECK(ds.size() == 6);
  CHECK(ds.seq_len == 240);
  CHECK(ds.label_index(0) == 30);

  Model m = build_wake_detector(ds.seq_len, 2, ds.seq_len, 13);
  double first_loss = 0, last_loss = 0;
  for (int epoch = 0; epoch < 30; ++epoch) {
    ds.shuffle(epoch);
    double total = 0;
    for (size_t i = 0; i < ds.size(); ++i)
      total += m.train_step(ds.data[i], ds.label_index(i), 0.05f);
    if (epoch == 0) first_loss = total;
    last_loss = total;
  }
  CHECK(last_loss < 0.5 * first_loss);
  int correct = 0;
  for (size_t i = 0; i < ds.size(); ++i) {
    Tensor probs = m.forward(ds.data[i]);
    int pred = 0;
    for (int k = 1; k < (int)probs.data.size(); ++k)
      if (probs.data[k] > probs.data[pred]) pred = k;
    correct += pred == ds.label_index(i);
  }
  CHECK(correct >= 4);  // learns the impulse positions
}

int main() {
  test_conv_forward_oracle();
  test_maxpool_roundtrip();
  test_input_gradient_fd();
  test_param_gradient_descent();
  test_serialization_roundtrip();
  test_dataset_and_training_convergence();
  if (failures == 0) std::printf("ALL OK\n");
  return failures == 0 ? 0 : 1;
}
