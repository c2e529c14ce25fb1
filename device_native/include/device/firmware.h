// Acquisition-firmware twin: 6x ADS1299 -> 48-channel sample pump ->
// binary wire frames.
//
// Mirrors the datapath of the reference's STM32H750 board
// (main_model/hardware/STM32.ioc: one AFE per SPI bus; SURVEY.md L-2;
// paper par. 166-168: 48 dry micro-needle electrodes, 6x ADS1299,
// WizFi360 WiFi uplink): bring-up sequencing, per-tick frame collection
// from every AFE, code->microvolt conversion, and packing into the
// framework's device protocol (`eeg|<key>|<float32le (C, n) row-major>`
// — runtime/protocol.py binary frames, docs/HARDWARE.md uplink spec).
// Plus the BLE-side status strings the companion consumes
// (`ip|<key>|...`, `volume|...`, `battery|...` — app/lib/helper/ble.dart).

#pragma once

#include <cstdint>
#include <deque>
#include <string>
#include <vector>

#include "device/ads1299.h"

namespace device {

constexpr int kNumAfes = 6;
constexpr int kNumChannels = kNumAfes * kChannelsPerChip;  // 48

struct BoardConfig {
  int data_rate_sps = 500;   // frontend contract default (FrontendConfig)
  int gain = 24;             // CHnSET reset gain
  uint32_t noise_seed = 0;   // synthetic-source seed (0 = silent)
  double noise_uv = 0.0;     // white-noise amplitude for the synthetic source
};

class Board {
 public:
  explicit Board(const BoardConfig& cfg);

  // Full bring-up: RESET -> SDATAC -> WREG CONFIG3 (internal reference
  // on) -> CONFIG1 (data rate) -> CHnSET (gain, normal input) -> START ->
  // RDATAC, with register readback verification.  Returns false if any
  // readback disagrees (the classic "forgot SDATAC" firmware bug is
  // surfaced here because the AFE ignores WREG during RDATAC).
  bool bring_up();

  // Enqueue explicit per-channel microvolt samples, shape (48, n)
  // row-major; consumed before the synthetic source.
  void feed(const float* ch_major, int64_t n_samples);

  // Advance n conversion ticks; quantized microvolts land in the
  // internal (48, .) sample queue. Returns samples actually produced
  // (0 if the board is not converting).
  int64_t pump(int64_t n_samples);

  // Pop up to n_samples queued samples into out, which must have capacity
  // (48, n_samples) row-major; rows stay n_samples floats apart even when
  // fewer samples are returned. Returns the samples written per channel.
  int64_t drain(float* out, int64_t n_samples);

  int64_t queued() const {
    return queue_.empty() ? 0 : int64_t(queue_[0].size());
  }

  // -- wire formats ----------------------------------------------------
  // eeg|<key>|<float32le payload>: pops up to n queued samples
  static constexpr const char* kEegCommand = "eeg";
  std::vector<uint8_t> wire_frame(const std::string& auth_key,
                                  int64_t n_samples);
  // eeg_end|<key>| utterance terminator
  static std::vector<uint8_t> end_frame(const std::string& auth_key);
  // BLE-side status strings (ble.dart dispatch surface)
  static std::string ip_frame(const std::string& key, const std::string& ip);
  static std::string volume_frame(const std::string& key, int volume);
  static std::string battery_frame(const std::string& key, int percent);

  Ads1299& afe(int i) { return afes_[i]; }
  int data_rate_sps() const { return afes_[0].data_rate_sps(); }

 private:
  double synthetic(int global_ch, int64_t n);

  BoardConfig cfg_;
  std::vector<Ads1299> afes_;
  // per-channel FIFO of quantized microvolt samples
  std::vector<std::deque<float>> queue_;
  std::vector<std::deque<float>> fed_;  // explicit injected analog samples
  uint64_t rng_;
};

}  // namespace device
