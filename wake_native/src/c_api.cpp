// C ABI for ctypes bindings (imagined_speech_translation_tpu.wake.native).
//
// The reference wake_model has no library interface at all (compile
// train.cpp or nothing); this exposes create/forward/train/save/load so the
// Python framework can gate the streaming pipeline on the native detector.
#include <cstring>
#include <new>
#include <string>

#include "wake/dataset.h"
#include "wake/model.h"

using wake::Model;
using wake::Tensor;

extern "C" {

struct WakeModel {
  Model model;
  int seq_len;
  int n_features;
  int n_classes;
};

WakeModel *wake_create(int seq_len, int n_features, int n_classes,
                       unsigned seed) {
  try {
    auto *m = new WakeModel{
        wake::build_wake_detector(seq_len, n_features, n_classes, seed),
        seq_len, n_features, n_classes};
    return m;
  } catch (...) {
    return nullptr;
  }
}

void wake_free(WakeModel *m) { delete m; }

int wake_seq_len(const WakeModel *m) { return m->seq_len; }
int wake_n_classes(const WakeModel *m) { return m->n_classes; }

// input: seq_len * n_features floats (row-major); out: n_classes probs.
// returns argmax class or -1 on error.
int wake_forward(WakeModel *m, const float *input, float *out_probs) {
  try {
    Tensor x(m->seq_len, m->n_features);
    std::memcpy(x.data.data(), input, x.data.size() * sizeof(float));
    Tensor probs = m->model.forward(x);
    if (out_probs)
      std::memcpy(out_probs, probs.data.data(),
                  probs.data.size() * sizeof(float));
    int best = 0;
    for (int i = 1; i < (int)probs.data.size(); ++i)
      if (probs.data[i] > probs.data[best]) best = i;
    return best;
  } catch (...) {
    return -1;
  }
}

// one SGD step; returns the CE loss (or negative on error)
float wake_train_step(WakeModel *m, const float *input, int label, float lr) {
  try {
    Tensor x(m->seq_len, m->n_features);
    std::memcpy(x.data.data(), input, x.data.size() * sizeof(float));
    return m->model.train_step(x, label, lr);
  } catch (...) {
    return -1.0f;
  }
}

int wake_save(WakeModel *m, const char *path) {
  try {
    m->model.save(path);
    return 0;
  } catch (...) {
    return -1;
  }
}

WakeModel *wake_load(const char *path, int seq_len, int n_features,
                     int n_classes) {
  try {
    auto *m = new WakeModel{Model::load(path), seq_len, n_features, n_classes};
    return m;
  } catch (...) {
    return nullptr;
  }
}

}  // extern "C"
