#include "wake/dataset.h"

#include <algorithm>
#include <filesystem>
#include <fstream>
#include <numeric>
#include <random>
#include <sstream>
#include <stdexcept>

namespace wake {

static std::vector<std::string> split_csv(const std::string &line) {
  std::vector<std::string> out;
  std::stringstream ss(line);
  std::string word;
  while (std::getline(ss, word, ',')) out.push_back(word);
  return out;
}

Dataset load_dataset(const std::string &catalog_csv,
                     const std::string &training_dir, int average_every) {
  std::ifstream file(catalog_csv);
  if (!file.good()) throw std::runtime_error("cannot open " + catalog_csv);
  std::string line;
  std::getline(file, line);  // header

  struct Row {
    std::string path;
    double time_rel;
  };
  std::vector<Row> rows;
  int max_len = 0;

  // single pass over the catalog: record rows + find the longest sequence
  while (std::getline(file, line)) {
    auto cells = split_csv(line);
    if (cells.size() < 3) continue;
    std::string path = training_dir + "/" + cells[0] + ".csv";
    if (!std::filesystem::exists(path)) continue;
    std::ifstream tf(path);
    if (!tf.good()) continue;
    std::string l;
    std::getline(tf, l);  // header
    int n = 0;
    while (std::getline(tf, l)) ++n;
    max_len = std::max(max_len, n / average_every);
    rows.push_back({path, std::stod(cells[2])});
  }

  Dataset ds;
  ds.seq_len = max_len;
  for (const auto &row : rows) {
    std::ifstream tf(row.path);
    std::string l;
    std::getline(tf, l);  // header
    Tensor seq(max_len, 2);
    int count = 0, out_row = 0;
    double t_acc = 0.0, v_acc = 0.0;
    while (std::getline(tf, l)) {
      auto cells = split_csv(l);
      if (cells.size() < 3) continue;
      t_acc += std::stod(cells[1]);
      v_acc += std::stod(cells[2]);
      if (count % average_every == average_every - 1 && out_row < max_len) {
        seq.at(out_row, 0) = (float)(t_acc / average_every);
        seq.at(out_row, 1) = (float)(v_acc / average_every);
        t_acc = v_acc = 0.0;
        ++out_row;
      }
      ++count;
    }
    ds.data.push_back(std::move(seq));
    ds.detection_time.push_back(row.time_rel);
  }
  return ds;
}

void Dataset::shuffle(unsigned seed) {
  std::mt19937 g(seed);
  std::vector<size_t> idx(data.size());
  std::iota(idx.begin(), idx.end(), 0);
  std::shuffle(idx.begin(), idx.end(), g);
  std::vector<Tensor> d2;
  std::vector<double> t2;
  d2.reserve(idx.size());
  t2.reserve(idx.size());
  for (size_t i : idx) {
    d2.push_back(std::move(data[i]));
    t2.push_back(detection_time[i]);
  }
  data = std::move(d2);
  detection_time = std::move(t2);
}

}  // namespace wake
