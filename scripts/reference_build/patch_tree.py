#!/usr/bin/env python
"""Patch a COPY of the reference tree (never /root/reference itself) so it
builds in this offline container, for BASELINE.md measurement:

  * Pangolin (needs GL dev headers, absent): drop its ExternalProject, drop
    find_package(Pangolin) and the pango_* link lines, replace Viewer.cc /
    MapDrawer.cc with no-op stubs, and satisfy `#include <pangolin/pangolin.h>`
    with a one-struct shim header.  Examples are patched to bUseViewer=false
    (the flag the reference itself exposes, System.cc:151).
  * Boost.Filesystem (absent): find_package replaced by an INTERFACE target
    over a std::filesystem shim header.
  * Eigen (absent as a system package): Eigen3 config shim pointing at the
    TensorFlow wheel's bundled Eigen.

None of this touches SLAM algorithm code — trajectories and per-frame
timings are those of the unmodified reference pipeline (viewer disabled,
which the stock binaries also support).

Usage: patch_tree.py <copied-tree-root> <shim-dir> <stub-dir>
"""

import re
import sys


def sub_file(path, pattern, repl, count=0, flags=0):
    with open(path) as f:
        text = f.read()
    new, n = re.subn(pattern, repl, text, count=count, flags=flags)
    if n == 0:
        raise SystemExit(f"pattern not found in {path}: {pattern!r}")
    with open(path, "w") as f:
        f.write(new)
    print(f"patched {path} ({n} substitution(s))")


def main():
    root, shims, stubs = sys.argv[1], sys.argv[2], sys.argv[3]
    src = f"{root}/Source"

    # --- ThirdParty: remove the Pangolin external project ----------------
    sub_file(
        f"{src}/ThirdParty/CMakeLists.txt",
        r"# Pangolin.*?ExternalProject_Add\(Pangolin.*?\n\s*\)\n",
        "# (Pangolin removed: no GL dev packages in this container; viewer "
        "is\n# disabled at runtime via bUseViewer=false)\n",
        flags=re.S,
    )
    # Route g2o's find_package(Eigen3) at the shim config.
    sub_file(
        f"{src}/ThirdParty/CMakeLists.txt",
        r"set\(g2o_cmake_args \$\{common_cmake_args\}\)",
        "set(g2o_cmake_args ${common_cmake_args})\n"
        f"list(APPEND g2o_cmake_args -DEigen3_DIR={shims}/eigen3)",
    )

    # --- Source superbuild ------------------------------------------------
    sub_file(
        f"{src}/CMakeLists.txt",
        r"find_package\(Pangolin REQUIRED[^)]*\)",
        "# Pangolin removed (see ThirdParty): viewer stubbed, "
        "bUseViewer=false",
    )
    sub_file(
        f"{src}/CMakeLists.txt",
        r"find_package\(Boost REQUIRED COMPONENTS filesystem\)",
        "add_library(boost_filesystem_shim INTERFACE)\n"
        "add_library(Boost::filesystem ALIAS boost_filesystem_shim)\n"
        f"target_include_directories(boost_filesystem_shim INTERFACE {shims})",
    )
    sub_file(
        f"{src}/CMakeLists.txt",
        r"find_package\(Eigen3 REQUIRED\)",
        f"set(Eigen3_DIR {shims}/eigen3)\nfind_package(Eigen3 REQUIRED)",
    )

    # --- Core library: drop pango link libs, add shim include path -------
    lib_cmake = f"{src}/Libraries/ORB_SLAM2/CMakeLists.txt"
    sub_file(lib_cmake, r"pango_opengl\n", "")
    sub_file(lib_cmake, r"pango_display\n", "")
    sub_file(
        lib_cmake,
        r"target_include_directories\(\$\{PROJECT_NAME\} PUBLIC \$\{CMAKE_CURRENT_DIRECTORY\}\)",
        "target_include_directories(${PROJECT_NAME} PUBLIC "
        "${CMAKE_CURRENT_DIRECTORY})\n"
        f"target_include_directories(${{PROJECT_NAME}} PUBLIC {shims})",
    )

    # --- Stub out the GL-dependent translation units ----------------------
    for name in ("Viewer.cc", "MapDrawer.cc"):
        with open(f"{stubs}/{name}") as f:
            body = f.read()
        with open(f"{src}/Libraries/ORB_SLAM2/src/{name}", "w") as f:
            f.write(body)
        print(f"stubbed {name}")

    # --- Examples: viewer off --------------------------------------------
    for rel in (
        "Examples/Monocular/mono_tum.cc",
        "Examples/Monocular/mono_kitti.cc",
        "Examples/Monocular/mono_euroc.cc",
        "Examples/Stereo/stereo_kitti.cc",
        "Examples/Stereo/stereo_euroc.cc",
        "Examples/RGB-D/rgbd_tum.cc",
    ):
        sub_file(
            f"{src}/{rel}",
            r"(ORB_SLAM2::System SLAM\([^;]*?),\s*true\);",
            r"\1, false);",
            flags=re.S,
        )


if __name__ == "__main__":
    main()
