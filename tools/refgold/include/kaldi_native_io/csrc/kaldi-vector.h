// Minimal kaldiio::Vector<Real> shim (see io-funcs.h header comment).
// Wire format matches Kaldi / khg_tpu/model/kaldi_binary.py: binary is
// token "FV" (float) or "DV" (double) + int32 dim + raw data; text is
// " [ v0 v1 ... ]\n".
#ifndef REFGOLD_KALDI_NATIVE_IO_CSRC_KALDI_VECTOR_H_
#define REFGOLD_KALDI_NATIVE_IO_CSRC_KALDI_VECTOR_H_

#include <cstdint>
#include <iostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "kaldi_native_io/csrc/io-funcs.h"

namespace kaldiio {

template <typename Real>
class Vector {
 public:
  Vector() = default;
  explicit Vector(int32_t n) : data_(n, Real(0)) {}

  void Resize(int32_t n) { data_.assign(n, Real(0)); }

  int32_t Dim() const { return static_cast<int32_t>(data_.size()); }

  Real operator()(int32_t i) const { return data_[i]; }
  Real &operator()(int32_t i) { return data_[i]; }
  Real operator[](int32_t i) const { return data_[i]; }
  Real &operator[](int32_t i) { return data_[i]; }

  const Real *Data() const { return data_.data(); }
  Real *Data() { return data_.data(); }

  typename std::vector<Real>::iterator begin() { return data_.begin(); }
  typename std::vector<Real>::iterator end() { return data_.end(); }
  typename std::vector<Real>::const_iterator begin() const {
    return data_.begin();
  }
  typename std::vector<Real>::const_iterator end() const {
    return data_.end();
  }

  void Write(std::ostream &os, bool binary) const {
    if (binary) {
      WriteToken(os, binary, sizeof(Real) == 4 ? "FV" : "DV");
      WriteBasicType(os, binary, Dim());
      if (Dim() > 0) {
        os.write(reinterpret_cast<const char *>(data_.data()),
                 Dim() * sizeof(Real));
      }
    } else {
      os << " [ ";
      std::ostringstream ss;
      ss.precision(sizeof(Real) == 4 ? 9 : 17);
      for (const Real &e : data_) ss << e << " ";
      os << ss.str() << "]\n";
    }
  }

  void Read(std::istream &is, bool binary) {
    if (binary) {
      std::string tok;
      ReadToken(is, binary, &tok);
      int32_t dim;
      ReadBasicType(is, binary, &dim);
      data_.resize(dim);
      if (tok == (sizeof(Real) == 4 ? "FV" : "DV")) {
        if (dim > 0)
          is.read(reinterpret_cast<char *>(data_.data()),
                  dim * sizeof(Real));
      } else if (tok == "FV") {
        std::vector<float> tmp(dim);
        if (dim > 0)
          is.read(reinterpret_cast<char *>(tmp.data()), dim * 4);
        for (int32_t i = 0; i < dim; ++i) data_[i] = Real(tmp[i]);
      } else if (tok == "DV") {
        std::vector<double> tmp(dim);
        if (dim > 0)
          is.read(reinterpret_cast<char *>(tmp.data()), dim * 8);
        for (int32_t i = 0; i < dim; ++i) data_[i] = Real(tmp[i]);
      } else {
        throw std::runtime_error("Vector::Read: bad header token " + tok);
      }
    } else {
      is >> std::ws;
      if (is.get() != '[')
        throw std::runtime_error("Vector::Read: expected '['");
      data_.clear();
      while (true) {
        is >> std::ws;
        if (is.peek() == ']') {
          is.get();
          break;
        }
        Real e;
        is >> e;
        if (is.fail()) throw std::runtime_error("Vector::Read: bad element");
        data_.push_back(e);
      }
    }
    if (is.fail()) throw std::runtime_error("Vector::Read: stream failure");
  }

 private:
  std::vector<Real> data_;
};

}  // namespace kaldiio

#endif  // REFGOLD_KALDI_NATIVE_IO_CSRC_KALDI_VECTOR_H_
