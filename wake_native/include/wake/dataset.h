// CSV event-time dataset loader.
//
// Reference layout (wake_model/dataset/dataset.cpp:13-129): a catalog CSV
// whose rows are (filename, _, time_rel, _, type, ...) pointing at
// data/training/<filename>.csv files with rows (_, time_rel, velocity).
// Every 7 raw rows are averaged into one (time, velocity) sample pair;
// sequences are zero-padded to the corpus max length; the label is the class
// index time_rel / 7.
#pragma once

#include <string>
#include <vector>

#include "tensor.h"

namespace wake {

struct Dataset {
  std::vector<Tensor> data;            // each (seq_len, 2)
  std::vector<double> detection_time;  // seconds
  int seq_len = 0;

  int label_index(size_t i) const { return (int)(detection_time[i] / 7.0); }
  size_t size() const { return data.size(); }

  // deterministic shuffle (the reference seeds from random_device —
  // irreproducible; here the seed is explicit)
  void shuffle(unsigned seed);
};

// catalog_csv: path to the catalog; training files are
// <training_dir>/<filename>.csv
Dataset load_dataset(const std::string &catalog_csv,
                     const std::string &training_dir,
                     int average_every = 7);

}  // namespace wake
