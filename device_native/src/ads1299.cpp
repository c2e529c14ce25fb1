#include "device/ads1299.h"

#include <cmath>
#include <cstring>

namespace device {

int32_t unpack24(const uint8_t* b) {
  int32_t v = (int32_t(b[0]) << 16) | (int32_t(b[1]) << 8) | int32_t(b[2]);
  if (v & 0x800000) v -= 0x1000000;  // sign-extend 24 -> 32
  return v;
}

void pack24(int32_t code, uint8_t* b) {
  uint32_t u = uint32_t(code) & 0xFFFFFF;
  b[0] = uint8_t(u >> 16);
  b[1] = uint8_t(u >> 8);
  b[2] = uint8_t(u);
}

int32_t microvolts_to_code(double uv, int gain) {
  // full scale = +/- VREF/gain; positive full scale maps to 0x7FFFFF
  double fs_uv = kVrefVolts / double(gain) * 1e6;
  double c = uv / fs_uv * kFullScaleCode;
  if (c > kFullScaleCode) c = kFullScaleCode;
  if (c < -kFullScaleCode - 1) c = -kFullScaleCode - 1;  // -2^23
  return int32_t(std::lround(c));
}

double code_to_microvolts(int32_t code, int gain) {
  double fs_uv = kVrefVolts / double(gain) * 1e6;
  return double(code) / kFullScaleCode * fs_uv;
}

Ads1299::Ads1299() {
  regs_.fill(0x00);
  // datasheet reset values
  regs_[REG_ID] = 0x3E;       // ADS1299, 8 channels
  regs_[REG_CONFIG1] = 0x96;  // daisy off, clk out off, DR=110 (250 SPS)
  regs_[REG_CONFIG2] = 0xC0;  // test signal internal, slow, 1x amplitude
  regs_[REG_CONFIG3] = 0x60;  // internal reference powered down
  for (int ch = 0; ch < kChannelsPerChip; ++ch)
    regs_[REG_CH1SET + ch] = 0x61;  // gain 24, input shorted
  regs_[REG_CONFIG4] = 0x00;
  regs_[REG_MISC1] = 0x00;
  // the part wakes up in read-data-continuous mode (datasheet 9.5.2):
  // register traffic is ignored until SDATAC — firmware MUST sequence
  // SDATAC first, which Board::bring_up verifies by readback
  rdatac_ = true;
}

void Ads1299::command(Cmd c) {
  switch (c) {
    case Cmd::WAKEUP:
      standby_ = false;
      break;
    case Cmd::STANDBY:
      standby_ = true;
      break;
    case Cmd::RESET: {
      Source electrodes = std::move(source_);  // electrodes stay attached
      *this = Ads1299();                       // registers + state to defaults
      source_ = std::move(electrodes);
      break;
    }
    case Cmd::START:
      started_ = true;
      break;
    case Cmd::STOP:
      started_ = false;
      break;
    case Cmd::RDATAC:
      rdatac_ = true;
      break;
    case Cmd::SDATAC:
      rdatac_ = false;
      break;
    case Cmd::RDATA:
      rdata_once_ = true;
      break;
  }
}

void Ads1299::wreg(uint8_t addr, const uint8_t* data, int n) {
  // real silicon ignores register traffic while in RDATAC (the serial
  // interface is dedicated to data) — a common firmware bug we keep
  // faithful so host-side bring-up sequencing is forced to SDATAC first
  if (rdatac_) return;
  for (int i = 0; i < n && addr + i < N_REGS; ++i) {
    if (addr + i == REG_ID) continue;  // read-only
    regs_[addr + i] = data[i];
  }
}

void Ads1299::rreg(uint8_t addr, uint8_t* out, int n) const {
  for (int i = 0; i < n; ++i)
    out[i] = (addr + i < N_REGS) ? regs_[addr + i] : 0;
}

int Ads1299::data_rate_sps() const {
  int dr = regs_[REG_CONFIG1] & 0x07;
  if (dr == 0x07) return 0;  // reserved
  return 16000 >> dr;  // 000=16k .. 110=250 SPS
}

int Ads1299::gain(int ch) const {
  static const int kGain[8] = {1, 2, 4, 6, 8, 12, 24, 24};
  return kGain[(regs_[REG_CH1SET + ch] >> 4) & 0x07];
}

double Ads1299::sample_input(int ch) const {
  if (powered_down(ch)) return 0.0;
  switch (mux(ch)) {
    case 0x0:  // normal electrode input
      return source_ ? source_(ch, n_) : 0.0;
    case 0x1:  // input shorted (offset measurement)
      return 0.0;
    case 0x5: {  // internal test signal: square wave, amplitude from
      // CONFIG2.CAL_AMP: 0 => 1x, 1 => 2x of +/-(VREFP-VREFN)/2.4 mV
      double amp_mv = (regs_[REG_CONFIG2] & 0x04) ? 2.0 * kVrefVolts / 2.4
                                                  : kVrefVolts / 2.4;
      // CAL_FREQ: fCLK/2^21 or /2^20 — model as a period in samples
      int period = (regs_[REG_CONFIG2] & 0x01) ? 64 : 128;
      return ((n_ / (period / 2)) % 2 == 0 ? amp_mv : -amp_mv) * 1e3;  // µV
    }
    default:  // MVDD / temperature / BIAS measurements: not modeled
      return 0.0;
  }
}

bool Ads1299::read_frame(uint8_t out[kFrameBytes]) {
  if (!converting() || (!rdatac_ && !rdata_once_)) return false;
  rdata_once_ = false;
  // status word: 0b1100 + LOFF_STATP + LOFF_STATN + GPIO[7:4]
  uint32_t status = (0xCu << 20) | (uint32_t(regs_[REG_LOFF_STATP]) << 12) |
                    (uint32_t(regs_[REG_LOFF_STATN]) << 4) |
                    (uint32_t(regs_[REG_GPIO]) >> 4);
  out[0] = uint8_t(status >> 16);
  out[1] = uint8_t(status >> 8);
  out[2] = uint8_t(status);
  for (int ch = 0; ch < kChannelsPerChip; ++ch) {
    int32_t code = microvolts_to_code(sample_input(ch), gain(ch));
    pack24(code, out + 3 + 3 * ch);
  }
  ++n_;
  return true;
}

}  // namespace device
