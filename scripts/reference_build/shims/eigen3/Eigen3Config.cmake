# Shim Eigen3 CMake package: points at the full Eigen distribution bundled
# inside the container's TensorFlow wheel (header-only; no system Eigen or
# network access available).  Used to build the REFERENCE binaries for
# BASELINE.md measurement only.
if(NOT DEFINED EIGEN3_SHIM_INCLUDE_DIR)
  set(EIGEN3_SHIM_INCLUDE_DIR
      "/opt/venv/lib/python3.12/site-packages/tensorflow/include")
endif()

set(EIGEN3_INCLUDE_DIR "${EIGEN3_SHIM_INCLUDE_DIR}")
set(EIGEN3_INCLUDE_DIRS "${EIGEN3_INCLUDE_DIR}")
set(EIGEN3_FOUND TRUE)
set(EIGEN3_VERSION_STRING "3.4.90")
set(EIGEN3_VERSION "3.4.90")

if(NOT TARGET Eigen3::Eigen)
  add_library(Eigen3::Eigen INTERFACE IMPORTED)
  set_target_properties(Eigen3::Eigen PROPERTIES
    INTERFACE_INCLUDE_DIRECTORIES "${EIGEN3_INCLUDE_DIR}")
endif()
