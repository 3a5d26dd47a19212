// Shim: everything lives in fst/fst.h here.
#ifndef REFGOLD_FST_FSTLIB_H_
#define REFGOLD_FST_FSTLIB_H_
#include "fst/fst.h"
#endif  // REFGOLD_FST_FSTLIB_H_
