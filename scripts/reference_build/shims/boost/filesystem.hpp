// Shim: maps the reference's tiny Boost.Filesystem surface (fs::path,
// fs::exists — System.cc:23-30,87 and Examples/*/FindFile) onto
// std::filesystem so the reference binaries build without Boost dev
// packages (absent in this container).  Baseline-measurement tooling only;
// not part of the TPU framework.
#pragma once
#include <filesystem>

namespace boost {
namespace filesystem {

using path = std::filesystem::path;

inline bool exists(const path &p) { return std::filesystem::exists(p); }

}  // namespace filesystem
}  // namespace boost
