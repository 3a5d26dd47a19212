// Shim: the reference only uses io primitives from here.
#ifndef REFGOLD_KALDI_NATIVE_IO_CSRC_KALDI_UTILS_H_
#define REFGOLD_KALDI_NATIVE_IO_CSRC_KALDI_UTILS_H_
#include "kaldi_native_io/csrc/io-funcs.h"
#endif  // REFGOLD_KALDI_NATIVE_IO_CSRC_KALDI_UTILS_H_
