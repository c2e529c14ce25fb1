// C ABI for ctypes (imagined_speech_translation_tpu/device/native.py).

#include <cstring>
#include <string>

#include "device/firmware.h"

using device::Board;
using device::BoardConfig;

extern "C" {

void* device_create(int data_rate_sps, int gain, unsigned noise_seed,
                    double noise_uv) {
  BoardConfig cfg;
  cfg.data_rate_sps = data_rate_sps;
  cfg.gain = gain;
  cfg.noise_seed = noise_seed;
  cfg.noise_uv = noise_uv;
  return new Board(cfg);
}

void device_free(void* h) { delete static_cast<Board*>(h); }

int device_bring_up(void* h) {
  return static_cast<Board*>(h)->bring_up() ? 0 : 1;
}

int device_num_channels(void) { return device::kNumChannels; }

int device_data_rate(void* h) {
  return static_cast<Board*>(h)->data_rate_sps();
}

void device_feed(void* h, const float* ch_major, long long n_samples) {
  static_cast<Board*>(h)->feed(ch_major, n_samples);
}

long long device_pump(void* h, long long n_samples) {
  return static_cast<Board*>(h)->pump(n_samples);
}

long long device_queued(void* h) { return static_cast<Board*>(h)->queued(); }

long long device_drain(void* h, float* out, long long n_samples) {
  return static_cast<Board*>(h)->drain(out, n_samples);
}

// Builds eeg|key|payload into out (cap bytes); returns the frame length,
// or -(required length) if cap is too small (no samples are consumed).
long long device_wire_frame(void* h, const char* auth_key,
                            long long n_samples, unsigned char* out,
                            long long cap) {
  Board* b = static_cast<Board*>(h);
  long long n = n_samples < b->queued() ? n_samples : b->queued();
  long long need = (long long)(strlen("eeg|") + strlen(auth_key) + 1) +
                   n * device::kNumChannels * (long long)sizeof(float);
  if (need > cap) return -need;
  auto frame = b->wire_frame(auth_key, n_samples);
  std::memcpy(out, frame.data(), frame.size());
  return (long long)frame.size();
}

long long device_end_frame(const char* auth_key, unsigned char* out,
                           long long cap) {
  auto frame = Board::end_frame(auth_key);
  if ((long long)frame.size() > cap) return -(long long)frame.size();
  std::memcpy(out, frame.data(), frame.size());
  return (long long)frame.size();
}

int device_status_frame(const char* kind, const char* key, const char* arg,
                        char* out, long long cap) {
  std::string s;
  std::string k(kind);
  if (k == "ip")
    s = Board::ip_frame(key, arg);
  else if (k == "volume")
    s = Board::volume_frame(key, std::atoi(arg));
  else if (k == "battery")
    s = Board::battery_frame(key, std::atoi(arg));
  else
    return -1;
  if ((long long)s.size() + 1 > cap) return -1;
  std::memcpy(out, s.c_str(), s.size() + 1);
  return (int)s.size();
}

}  // extern "C"
