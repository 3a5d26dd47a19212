// Minimal kaldi_native_io shim for compiling the reference model layer
// in-place (tools/refgold/README.md).  Implements the standard Kaldi
// binary/text stream primitives with the same wire format as
// khg_tpu/model/kaldi_binary.py:
//   - binary streams start with "\0B" (InitKaldiOutputStream);
//   - WriteToken: ASCII token + one space (both modes);
//   - WriteBasicType<T>: size byte sizeof(T) + raw little-endian value
//     (binary) / value + space (text);
//   - WriteIntegerVector<T>: size byte + raw int32 count + raw data
//     (binary) / "[ e1 e2 ... ]\n" (text).
//
// This header is ORIGINAL shim code (not copied from kaldi-native-io);
// only the wire format — a public, stable Kaldi convention — is shared.
#ifndef REFGOLD_KALDI_NATIVE_IO_CSRC_IO_FUNCS_H_
#define REFGOLD_KALDI_NATIVE_IO_CSRC_IO_FUNCS_H_

#include <cstdint>
#include <cstring>
#include <iostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <type_traits>
#include <vector>

namespace kaldiio {

inline void InitKaldiOutputStream(std::ostream &os, bool binary) {
  if (binary) {
    os.put('\0');
    os.put('B');
  }
}

inline bool InitKaldiInputStream(std::istream &is, bool *binary) {
  if (is.peek() == 0) {
    is.get();
    if (is.get() != 'B') return false;
    *binary = true;
  } else {
    *binary = false;
  }
  return true;
}

inline void WriteToken(std::ostream &os, bool /*binary*/, const char *token) {
  os << token << " ";
}

inline void WriteToken(std::ostream &os, bool binary,
                       const std::string &token) {
  WriteToken(os, binary, token.c_str());
}

inline int Peek(std::istream &is, bool binary) {
  if (!binary) is >> std::ws;
  return is.peek();
}

inline void ReadToken(std::istream &is, bool binary, std::string *token) {
  if (!binary) is >> std::ws;
  is >> *token;
  if (is.fail()) throw std::runtime_error("ReadToken: stream failure");
  if (is.peek() == ' ') is.get();  // consume the separating space
}

inline void ExpectToken(std::istream &is, bool binary, const char *token) {
  std::string got;
  ReadToken(is, binary, &got);
  if (got != token) {
    throw std::runtime_error(std::string("ExpectToken: expected '") + token +
                             "', got '" + got + "'");
  }
}

inline void ExpectToken(std::istream &is, bool binary,
                        const std::string &token) {
  ExpectToken(is, binary, token.c_str());
}

inline std::string CharToString(char c) {
  std::ostringstream ss;
  if (isprint(static_cast<unsigned char>(c))) {
    ss << "'" << c << "'";
  } else {
    ss << "[char " << static_cast<int>(c) << "]";
  }
  return ss.str();
}

template <class T>
void WriteBasicType(std::ostream &os, bool binary, T t) {
  static_assert(std::is_arithmetic<T>::value, "basic types only");
  if (binary) {
    char len = static_cast<char>(sizeof(T));
    os.put(len);
    os.write(reinterpret_cast<const char *>(&t), sizeof(T));
  } else {
    if (std::is_floating_point<T>::value) {
      std::ostringstream ss;
      ss.precision(sizeof(T) == 4 ? 9 : 17);
      ss << t;
      os << ss.str() << " ";
    } else {
      os << t << " ";
    }
  }
}

template <class T>
void ReadBasicType(std::istream &is, bool binary, T *t) {
  static_assert(std::is_arithmetic<T>::value, "basic types only");
  if (binary) {
    int len = is.get();
    if (len == static_cast<int>(sizeof(T))) {
      is.read(reinterpret_cast<char *>(t), sizeof(T));
    } else if (std::is_floating_point<T>::value && (len == 4 || len == 8)) {
      if (len == 4) {
        float f;
        is.read(reinterpret_cast<char *>(&f), 4);
        *t = static_cast<T>(f);
      } else {
        double d;
        is.read(reinterpret_cast<char *>(&d), 8);
        *t = static_cast<T>(d);
      }
    } else if (std::is_integral<T>::value && (len == 4 || len == 8)) {
      if (len == 4) {
        int32_t v;
        is.read(reinterpret_cast<char *>(&v), 4);
        *t = static_cast<T>(v);
      } else {
        int64_t v;
        is.read(reinterpret_cast<char *>(&v), 8);
        *t = static_cast<T>(v);
      }
    } else {
      throw std::runtime_error("ReadBasicType: unsupported size byte");
    }
  } else {
    is >> *t;
  }
  if (is.fail()) throw std::runtime_error("ReadBasicType: stream failure");
}

template <class T>
void WriteIntegerVector(std::ostream &os, bool binary,
                        const std::vector<T> &v) {
  static_assert(std::is_integral<T>::value, "integer vectors only");
  if (binary) {
    char len = static_cast<char>(sizeof(T));
    os.put(len);
    int32_t sz = static_cast<int32_t>(v.size());
    os.write(reinterpret_cast<const char *>(&sz), sizeof(sz));
    if (sz > 0) {
      os.write(reinterpret_cast<const char *>(v.data()), sz * sizeof(T));
    }
  } else {
    os << "[ ";
    for (const T &e : v) os << e << " ";
    os << "]\n";
  }
}

template <class T>
void ReadIntegerVector(std::istream &is, bool binary, std::vector<T> *v) {
  static_assert(std::is_integral<T>::value, "integer vectors only");
  if (binary) {
    int len = is.get();
    if (len != static_cast<int>(sizeof(T)))
      throw std::runtime_error("ReadIntegerVector: unsupported size byte");
    int32_t sz;
    is.read(reinterpret_cast<char *>(&sz), sizeof(sz));
    v->resize(sz);
    if (sz > 0) is.read(reinterpret_cast<char *>(v->data()), sz * sizeof(T));
  } else {
    is >> std::ws;
    if (is.get() != '[')
      throw std::runtime_error("ReadIntegerVector: expected '['");
    v->clear();
    while (true) {
      is >> std::ws;
      if (is.peek() == ']') {
        is.get();
        break;
      }
      T e;
      is >> e;
      if (is.fail())
        throw std::runtime_error("ReadIntegerVector: bad element");
      v->push_back(e);
    }
  }
  if (is.fail()) throw std::runtime_error("ReadIntegerVector: stream failure");
}

template <class Int>
bool ConvertStringToInteger(const std::string &str, Int *out) {
  static_assert(std::is_integral<Int>::value, "integers only");
  const char *s = str.c_str();
  char *end = nullptr;
  errno = 0;
  long long v = std::strtoll(s, &end, 10);
  if (end == s || *end != '\0' || errno != 0) return false;
  *out = static_cast<Int>(v);
  if (static_cast<long long>(*out) != v) return false;
  return true;
}

}  // namespace kaldiio

// The reference calls these unqualified from namespace khg.
using kaldiio::ReadIntegerVector;   // NOLINT
using kaldiio::WriteIntegerVector;  // NOLINT

#endif  // REFGOLD_KALDI_NATIVE_IO_CSRC_IO_FUNCS_H_
