// ADS1299 8-channel 24-bit EEG AFE simulator.
//
// The reference acquisition board (SURVEY.md L-2; main_model/hardware/
// STM32.ioc: STM32H750VBT6 with SPI1/2/3/4/6 + UART4; paper par. 166-168)
// reads 6 of these AFEs over SPI.  The reference repo ships only design
// files (pin config + ECAD), no firmware source; this simulator is the
// executable counterpart of that datapath, faithful to the public
// ADS1299 datasheet at the register/command/frame level so host code,
// tests, and load generators exercise the exact bytes real hardware
// would produce.
//
// Modeled: the SPI command set (WAKEUP/STANDBY/RESET/START/STOP/
// RDATAC/SDATAC/RDATA/RREG/WREG), the register file with datasheet reset
// values, data-rate decode from CONFIG1.DR, per-channel gain/mux from
// CHnSET, the internal test signal (CONFIG2), and the 27-byte RDATAC
// frame: 24-bit status (0b1100 + LOFF_STATP + LOFF_STATN + GPIO[7:4])
// followed by 8x 24-bit big-endian two's-complement channel codes.

#pragma once

#include <array>
#include <cstdint>
#include <functional>
#include <vector>

namespace device {

// SPI opcodes (ADS1299 datasheet table 13)
enum class Cmd : uint8_t {
  WAKEUP = 0x02,
  STANDBY = 0x04,
  RESET = 0x06,
  START = 0x08,
  STOP = 0x0A,
  RDATAC = 0x10,
  SDATAC = 0x11,
  RDATA = 0x12,
  // RREG = 0x20 | addr, WREG = 0x40 | addr (second byte: count-1)
};

// register addresses
enum Reg : uint8_t {
  REG_ID = 0x00,
  REG_CONFIG1 = 0x01,
  REG_CONFIG2 = 0x02,
  REG_CONFIG3 = 0x03,
  REG_LOFF = 0x04,
  REG_CH1SET = 0x05,  // .. CH8SET = 0x0C
  REG_BIAS_SENSP = 0x0D,
  REG_BIAS_SENSN = 0x0E,
  REG_LOFF_SENSP = 0x0F,
  REG_LOFF_SENSN = 0x10,
  REG_LOFF_FLIP = 0x11,
  REG_LOFF_STATP = 0x12,
  REG_LOFF_STATN = 0x13,
  REG_GPIO = 0x14,
  REG_MISC1 = 0x15,
  REG_MISC2 = 0x16,
  REG_CONFIG4 = 0x17,
  N_REGS = 0x18,
};

constexpr int kChannelsPerChip = 8;
constexpr int kFrameBytes = 27;  // 3 status + 8 * 3 channel bytes
constexpr double kVrefVolts = 4.5;
constexpr double kFullScaleCode = 8388607.0;  // 2^23 - 1

// 24-bit two's-complement <-> signed code
int32_t unpack24(const uint8_t* b);
void pack24(int32_t code, uint8_t* b);

// microvolts <-> code for a given PGA gain (LSB = 2*VREF/gain / 2^24)
int32_t microvolts_to_code(double uv, int gain);
double code_to_microvolts(int32_t code, int gain);

class Ads1299 {
 public:
  // signal source: (channel 0..7, sample_index) -> microvolts at the
  // analog input; only consulted for channels whose MUX is normal (000)
  using Source = std::function<double(int ch, int64_t n)>;

  Ads1299();

  // -- SPI transactions (what the MCU drives over MOSI) -----------------
  void command(Cmd c);
  void wreg(uint8_t addr, const uint8_t* data, int n);
  void rreg(uint8_t addr, uint8_t* out, int n) const;
  uint8_t reg(uint8_t addr) const { return regs_[addr]; }

  // -- state ------------------------------------------------------------
  bool converting() const { return started_ && !standby_; }
  bool continuous() const { return rdatac_; }
  int data_rate_sps() const;       // from CONFIG1.DR
  int gain(int ch) const;          // from CHnSET.GAIN
  int mux(int ch) const { return regs_[REG_CH1SET + ch] & 0x07; }
  bool powered_down(int ch) const {
    return (regs_[REG_CH1SET + ch] & 0x80) != 0;
  }

  void set_source(Source src) { source_ = std::move(src); }

  // Advance one conversion period and emit the 27-byte DRDY frame.
  // Returns false (no frame) unless START was issued and RDATAC (or a
  // pending RDATA) is active — the DRDY gating a real MCU polls.
  bool read_frame(uint8_t out[kFrameBytes]);

  int64_t sample_index() const { return n_; }

 private:
  double sample_input(int ch) const;  // resolves MUX: normal/short/test

  std::array<uint8_t, N_REGS> regs_;
  Source source_;
  bool started_ = false;
  bool rdatac_ = false;
  bool standby_ = false;
  bool rdata_once_ = false;
  int64_t n_ = 0;
};

}  // namespace device
