#include "device/firmware.h"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace device {

namespace {

// xorshift64* — deterministic, dependency-free noise for the synthetic
// source (NOT the training PRNG; just an electrode-noise stand-in)
inline uint64_t next_rng(uint64_t& s) {
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  return s * 0x2545F4914F6CDD1DULL;
}

inline double uniform(uint64_t& s) {
  return double(next_rng(s) >> 11) / double(1ULL << 53);  // [0, 1)
}

// CONFIG1.DR code for a sample rate (16000 >> dr)
int dr_code(int sps) {
  for (int dr = 0; dr <= 6; ++dr)
    if ((16000 >> dr) <= sps) return dr;
  return 6;  // 250 SPS floor
}

// CHnSET gain bits
uint8_t gain_bits(int gain) {
  static const int kGain[7] = {1, 2, 4, 6, 8, 12, 24};
  for (int i = 0; i < 7; ++i)
    if (kGain[i] == gain) return uint8_t(i);
  return 6;  // default 24
}

}  // namespace

Board::Board(const BoardConfig& cfg)
    : cfg_(cfg),
      afes_(kNumAfes),
      queue_(kNumChannels),
      fed_(kNumChannels),
      rng_(cfg.noise_seed ? cfg.noise_seed : 1) {
  for (int a = 0; a < kNumAfes; ++a) {
    afes_[a].set_source([this, a](int ch, int64_t n) {
      int g = a * kChannelsPerChip + ch;
      if (!fed_[g].empty()) {
        double v = fed_[g].front();
        fed_[g].pop_front();
        return v;
      }
      return synthetic(g, n);
    });
  }
}

double Board::synthetic(int global_ch, int64_t n) {
  if (!cfg_.noise_seed) return 0.0;
  double sps = std::max(data_rate_sps(), 1);
  double t = double(n) / sps;
  // alpha-band sine per channel + white noise: enough spectral structure
  // for the host bandpass/notch chain to act on
  double f = 8.0 + (global_ch % 8);  // 8..15 Hz
  double v = 20.0 * std::sin(2.0 * M_PI * f * t + 0.3 * global_ch);
  v += cfg_.noise_uv * (2.0 * uniform(rng_) - 1.0);
  return v;
}

bool Board::bring_up() {
  for (auto& afe : afes_) {
    afe.command(Cmd::RESET);
    afe.command(Cmd::SDATAC);  // leave RDATAC before register traffic
    uint8_t v = 0xE0;          // CONFIG3: internal reference buffer on
    afe.wreg(REG_CONFIG3, &v, 1);
    v = uint8_t(0x90 | dr_code(cfg_.data_rate_sps));  // CONFIG1
    afe.wreg(REG_CONFIG1, &v, 1);
    v = uint8_t(gain_bits(cfg_.gain) << 4);  // CHnSET: gain, MUX normal
    for (int ch = 0; ch < kChannelsPerChip; ++ch)
      afe.wreg(uint8_t(REG_CH1SET + ch), &v, 1);
    // readback verification (catches the ignored-WREG-in-RDATAC case)
    uint8_t rb[3] = {0, 0, 0};
    afe.rreg(REG_CONFIG1, &rb[0], 1);
    afe.rreg(REG_CONFIG3, &rb[1], 1);
    afe.rreg(REG_CH1SET, &rb[2], 1);
    if (rb[0] != uint8_t(0x90 | dr_code(cfg_.data_rate_sps)) ||
        rb[1] != 0xE0 || rb[2] != uint8_t(gain_bits(cfg_.gain) << 4))
      return false;
    afe.command(Cmd::START);
    afe.command(Cmd::RDATAC);
  }
  return true;
}

void Board::feed(const float* ch_major, int64_t n_samples) {
  for (int c = 0; c < kNumChannels; ++c)
    for (int64_t i = 0; i < n_samples; ++i)
      fed_[c].push_back(ch_major[c * n_samples + i]);
}

int64_t Board::pump(int64_t n_samples) {
  // Stage the whole tick before committing: if any AFE fails mid-tick
  // (e.g. one chip in STANDBY), no channel may be left one sample ahead
  // of the others — drain() relies on rectangular queues.
  uint8_t frames[kNumAfes][kFrameBytes];
  int64_t produced = 0;
  for (int64_t i = 0; i < n_samples; ++i) {
    for (int a = 0; a < kNumAfes; ++a)
      if (!afes_[a].read_frame(frames[a])) return produced;
    for (int a = 0; a < kNumAfes; ++a) {
      int gain = afes_[a].gain(0);
      for (int ch = 0; ch < kChannelsPerChip; ++ch) {
        int32_t code = unpack24(frames[a] + 3 + 3 * ch);
        queue_[a * kChannelsPerChip + ch].push_back(
            float(code_to_microvolts(code, gain)));
      }
    }
    ++produced;
  }
  return produced;
}

int64_t Board::drain(float* out, int64_t n_samples) {
  // out rows are n_samples apart (the CALLER'S buffer capacity), so a
  // short drain leaves each row's tail untouched instead of packing a
  // dense (48, n) block the caller would misinterpret.
  int64_t n = std::min<int64_t>(n_samples, queued());
  for (int c = 0; c < kNumChannels; ++c) {
    for (int64_t i = 0; i < n; ++i) {
      out[c * n_samples + i] = queue_[c].front();
      queue_[c].pop_front();
    }
  }
  return n;
}

std::vector<uint8_t> Board::wire_frame(const std::string& auth_key,
                                       int64_t n_samples) {
  int64_t n = std::min<int64_t>(n_samples, queued());
  std::vector<float> samples(size_t(kNumChannels * n));
  drain(samples.data(), n);
  std::string head = std::string(kEegCommand) + "|" + auth_key + "|";
  std::vector<uint8_t> out(head.begin(), head.end());
  size_t base = out.size();
  out.resize(base + samples.size() * sizeof(float));
  std::memcpy(out.data() + base, samples.data(),
              samples.size() * sizeof(float));
  return out;
}

std::vector<uint8_t> Board::end_frame(const std::string& auth_key) {
  std::string s = "eeg_end|" + auth_key + "|";
  return std::vector<uint8_t>(s.begin(), s.end());
}

std::string Board::ip_frame(const std::string& key, const std::string& ip) {
  return "ip|" + key + "|" + ip;
}

std::string Board::volume_frame(const std::string& key, int volume) {
  return "volume|" + key + "|" + std::to_string(volume);
}

std::string Board::battery_frame(const std::string& key, int percent) {
  return "battery|" + key + "|" + std::to_string(percent);
}

}  // namespace device
