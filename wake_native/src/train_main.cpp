// Wake-detector training CLI (reference driver: wake_model/train.cpp).
//
// Usage: wake_train <catalog.csv> <training_dir> [epochs] [lr] [out.bin]
//
// Reference hyperparameters: lr 0.1, 1000 epochs, per-sample SGD, shuffle
// each epoch (train.cpp:59-141); output model saved as a real checkpoint.
#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <string>

#include "wake/dataset.h"
#include "wake/model.h"

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <catalog.csv> <training_dir> [epochs] [lr] [out]\n",
                 argv[0]);
    return 2;
  }
  std::string catalog = argv[1];
  std::string training_dir = argv[2];
  int epochs = argc > 3 ? std::atoi(argv[3]) : 1000;
  float lr = argc > 4 ? (float)std::atof(argv[4]) : 0.1f;
  std::string out = argc > 5 ? argv[5] : "wake_detector.bin";

  wake::Dataset ds;
  try {
    ds = wake::load_dataset(catalog, training_dir);
  } catch (const std::exception &e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
  if (ds.size() == 0) {
    std::fprintf(stderr, "no samples found\n");
    return 1;
  }
  std::printf("samples=%zu seq_len=%d\n", ds.size(), ds.seq_len);

  wake::Model model =
      wake::build_wake_detector(ds.seq_len, 2, ds.seq_len, /*seed=*/42);

  for (int epoch = 0; epoch < epochs; ++epoch) {
    ds.shuffle(42 + epoch);
    double total = 0.0;
    int correct = 0;
    for (size_t i = 0; i < ds.size(); ++i) {
      int label = std::min(ds.label_index(i), ds.seq_len - 1);
      total += model.train_step(ds.data[i], label, lr);
      wake::Tensor probs = model.forward(ds.data[i]);
      int pred = (int)(std::max_element(probs.data.begin(), probs.data.end()) -
                       probs.data.begin());
      correct += pred == label;
      if (epoch == 0 || (epoch + 1) % 10 == 0)
        std::printf("epoch %d sample %zu: pred_t=%d expected_t=%d\n", epoch + 1,
                    i, pred * 7, label * 7);
    }
    std::printf("epoch %d loss=%.4f acc=%.3f\n", epoch + 1, total / ds.size(),
                (double)correct / ds.size());
  }
  model.save(out);
  std::printf("saved %s\n", out.c_str());
  return 0;
}
