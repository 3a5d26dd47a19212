// Forced-include compatibility header: the Eigen snapshot bundled with
// the tensorflow wheel keeps Eigen::all/last under Eigen::placeholders.
#ifndef REFGOLD_EIGEN_COMPAT_H_
#define REFGOLD_EIGEN_COMPAT_H_
#include "Eigen/Dense"
namespace Eigen {
using placeholders::all;  // NOLINT
using placeholders::last;  // NOLINT
}  // namespace Eigen
#endif
