// Shim: minimal pangolin surface so the reference's headers compile in a
// container with no GL development packages.  Only MapDrawer.h names a
// pangolin type (OpenGlMatrix, MapDrawer.h:41,44); Viewer.cc/MapDrawer.cc
// are replaced by no-op stubs and the examples run with bUseViewer=false,
// so no GL is ever executed.  Baseline-measurement tooling only.
#pragma once

namespace pangolin {

struct OpenGlMatrix {
  double m[16] = {0};
  void SetIdentity() {
    for (int i = 0; i < 16; ++i) m[i] = (i % 5 == 0) ? 1.0 : 0.0;
  }
};

}  // namespace pangolin
