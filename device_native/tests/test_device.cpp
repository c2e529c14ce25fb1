// Self-contained assertions for the AFE simulator + firmware twin.

#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

#include "device/ads1299.h"
#include "device/firmware.h"

using namespace device;

static int failures = 0;
#define CHECK(cond)                                              \
  do {                                                           \
    if (!(cond)) {                                               \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      ++failures;                                                \
    }                                                            \
  } while (0)

static void test_pack24_edges() {
  uint8_t b[3];
  // positive full scale
  pack24(0x7FFFFF, b);
  CHECK(b[0] == 0x7F && b[1] == 0xFF && b[2] == 0xFF);
  CHECK(unpack24(b) == 0x7FFFFF);
  // negative full scale (-2^23)
  pack24(-8388608, b);
  CHECK(b[0] == 0x80 && b[1] == 0x00 && b[2] == 0x00);
  CHECK(unpack24(b) == -8388608);
  // -1 is all ones
  pack24(-1, b);
  CHECK(b[0] == 0xFF && b[1] == 0xFF && b[2] == 0xFF);
  CHECK(unpack24(b) == -1);
  pack24(0, b);
  CHECK(unpack24(b) == 0);
}

static void test_code_conversion() {
  // LSB at gain 24: 2*4.5/24/2^24 V = 22.35 nV -> 1 µV is ~44.7 codes
  for (int gain : {1, 2, 4, 6, 8, 12, 24}) {
    double fs_uv = 4.5e6 / gain;
    CHECK(microvolts_to_code(fs_uv, gain) == 0x7FFFFF);          // +FS clamps
    CHECK(microvolts_to_code(-2 * fs_uv, gain) == -8388608);     // -FS clamps
    CHECK(microvolts_to_code(0.0, gain) == 0);
    // roundtrip error under 1 LSB across the range
    for (double uv : {-1000.0, -3.7, 0.01, 5.0, 123.456, 40000.0}) {
      if (std::abs(uv) >= fs_uv) continue;
      double back = code_to_microvolts(microvolts_to_code(uv, gain), gain);
      double lsb = 2.0 * fs_uv / 16777216.0;
      CHECK(std::abs(back - uv) <= lsb);
    }
  }
}

static void test_reset_defaults() {
  Ads1299 afe;
  CHECK(afe.reg(REG_ID) == 0x3E);
  CHECK(afe.reg(REG_CONFIG1) == 0x96);
  CHECK(afe.reg(REG_CONFIG2) == 0xC0);
  CHECK(afe.reg(REG_CONFIG3) == 0x60);
  CHECK(afe.reg(REG_CH1SET) == 0x61);
  CHECK(afe.data_rate_sps() == 250);
  CHECK(afe.gain(0) == 24);
  CHECK(afe.continuous());  // wakes up in RDATAC
}

static void test_wreg_ignored_in_rdatac() {
  Ads1299 afe;  // powers up in RDATAC
  uint8_t v = 0x95;
  afe.wreg(REG_CONFIG1, &v, 1);
  CHECK(afe.reg(REG_CONFIG1) == 0x96);  // ignored
  afe.command(Cmd::SDATAC);
  afe.wreg(REG_CONFIG1, &v, 1);
  CHECK(afe.reg(REG_CONFIG1) == 0x95);  // applied after SDATAC
  CHECK(afe.data_rate_sps() == 500);
  // ID register is read-only
  v = 0x00;
  afe.wreg(REG_ID, &v, 1);
  CHECK(afe.reg(REG_ID) == 0x3E);
}

static void test_no_data_before_start() {
  Ads1299 afe;
  uint8_t frame[kFrameBytes];
  CHECK(!afe.read_frame(frame));  // RDATAC but no START
  afe.command(Cmd::START);
  CHECK(afe.read_frame(frame));
  afe.command(Cmd::STANDBY);
  CHECK(!afe.read_frame(frame));
  afe.command(Cmd::WAKEUP);
  CHECK(afe.read_frame(frame));
  afe.command(Cmd::SDATAC);
  CHECK(!afe.read_frame(frame));  // not continuous, no RDATA pending
  afe.command(Cmd::RDATA);
  CHECK(afe.read_frame(frame));   // single-shot read
  CHECK(!afe.read_frame(frame));  // consumed
}

static void test_status_word_and_samples() {
  Ads1299 afe;
  afe.command(Cmd::SDATAC);
  // MUX normal on ch0, gain 24
  uint8_t v = 0x60;
  afe.wreg(REG_CH1SET, &v, 1);
  afe.set_source([](int ch, int64_t) { return ch == 0 ? 100.0 : 0.0; });
  afe.command(Cmd::START);
  afe.command(Cmd::RDATAC);
  uint8_t frame[kFrameBytes];
  CHECK(afe.read_frame(frame));
  // status leads with 0b1100
  CHECK((frame[0] >> 4) == 0xC);
  int32_t c0 = unpack24(frame + 3);
  double uv = code_to_microvolts(c0, 24);
  CHECK(std::abs(uv - 100.0) < 0.01);
  // shorted channels read ~0
  CHECK(unpack24(frame + 6) == 0);
}

static void test_internal_test_signal() {
  Ads1299 afe;
  afe.command(Cmd::SDATAC);
  uint8_t v = 0x65;  // gain 24, MUX=101 test signal
  afe.wreg(REG_CH1SET, &v, 1);
  v = 0xD0;  // CONFIG2: internal test source
  afe.wreg(REG_CONFIG2, &v, 1);
  afe.command(Cmd::START);
  afe.command(Cmd::RDATAC);
  uint8_t frame[kFrameBytes];
  std::vector<double> seen;
  for (int i = 0; i < 200; ++i) {
    CHECK(afe.read_frame(frame));
    seen.push_back(code_to_microvolts(unpack24(frame + 3), 24));
  }
  // square wave: exactly two distinct levels, symmetric around zero
  double lo = 1e9, hi = -1e9;
  for (double s : seen) {
    lo = std::min(lo, s);
    hi = std::max(hi, s);
  }
  CHECK(hi > 0 && lo < 0);
  CHECK(std::abs(hi + lo) < 1.0);
  // amplitude ~ VREF/2.4 mV = 1875 µV (1x)
  CHECK(std::abs(hi - 1875000.0 / 1000.0) < 5.0);
}

static void test_board_bring_up_and_pump() {
  BoardConfig cfg;
  cfg.data_rate_sps = 500;
  cfg.gain = 24;
  Board board(cfg);
  CHECK(board.bring_up());
  CHECK(board.data_rate_sps() == 500);
  // inject a known staircase: channel c sample i = c + i µV
  const int64_t N = 10;
  std::vector<float> in(kNumChannels * N);
  for (int c = 0; c < kNumChannels; ++c)
    for (int64_t i = 0; i < N; ++i) in[c * N + i] = float(c + i);
  board.feed(in.data(), N);
  CHECK(board.pump(N) == N);
  CHECK(board.queued() == N);
  std::vector<float> out(kNumChannels * N);
  CHECK(board.drain(out.data(), N) == N);
  double lsb = 2.0 * (4.5e6 / 24.0) / 16777216.0;
  for (size_t i = 0; i < in.size(); ++i)
    CHECK(std::abs(out[i] - in[i]) <= lsb);
  CHECK(board.queued() == 0);
}

static void test_board_wire_frames() {
  BoardConfig cfg;
  cfg.noise_seed = 7;
  cfg.noise_uv = 2.0;
  Board board(cfg);
  CHECK(board.bring_up());
  board.pump(16);
  auto frame = board.wire_frame("KEY", 16);
  // header eeg|KEY| then 48*16 float32
  const char* head = "eeg|KEY|";
  CHECK(frame.size() == strlen(head) + size_t(kNumChannels) * 16 * 4);
  CHECK(std::memcmp(frame.data(), head, strlen(head)) == 0);
  // payload is (48, 16) row-major float32 — nonzero synthetic signal
  float f0;
  std::memcpy(&f0, frame.data() + strlen(head), 4);
  bool any = false;
  for (size_t i = strlen(head); i + 4 <= frame.size(); i += 4) {
    float v;
    std::memcpy(&v, frame.data() + i, 4);
    if (v != 0.0f) any = true;
  }
  CHECK(any);
  auto endf = Board::end_frame("KEY");
  CHECK(std::string(endf.begin(), endf.end()) == "eeg_end|KEY|");
  CHECK(Board::ip_frame("K", "10.0.0.2") == "ip|K|10.0.0.2");
  CHECK(Board::volume_frame("K", 7) == "volume|K|7");
  CHECK(Board::battery_frame("K", 93) == "battery|K|93");
}

static void test_bring_up_fails_without_sdatac() {
  // sanity that the readback verification is load-bearing: a raw AFE
  // in RDATAC silently ignores WREG, so configuring without SDATAC
  // leaves reset values in place
  Ads1299 afe;
  uint8_t v = 0x95;
  afe.wreg(REG_CONFIG1, &v, 1);
  uint8_t rb;
  afe.rreg(REG_CONFIG1, &rb, 1);
  CHECK(rb == 0x96);  // unchanged — the bug bring_up() guards against
}

int main() {
  test_pack24_edges();
  test_code_conversion();
  test_reset_defaults();
  test_wreg_ignored_in_rdatac();
  test_no_data_before_start();
  test_status_word_and_samples();
  test_internal_test_signal();
  test_board_bring_up_and_pump();
  test_bring_up_fails_without_sdatac();
  test_board_wire_frames();
  if (failures == 0) std::printf("ALL OK\n");
  return failures == 0 ? 0 : 1;
}
