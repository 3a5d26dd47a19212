// Shim RemoveEpsLocal: the align runner extracts labels and total cost
// directly from the linear best-path lattice, both invariant under local
// epsilon removal, so a no-op preserves every quantity we compare.
#ifndef REFGOLD_KALDIFST_CSRC_REMOVE_EPS_LOCAL_H_
#define REFGOLD_KALDIFST_CSRC_REMOVE_EPS_LOCAL_H_

#include "fst/fst.h"

namespace fst {

template <class Arc>
void RemoveEpsLocal(MutableFst<Arc> * /*fst*/) {}

}  // namespace fst

#endif  // REFGOLD_KALDIFST_CSRC_REMOVE_EPS_LOCAL_H_
