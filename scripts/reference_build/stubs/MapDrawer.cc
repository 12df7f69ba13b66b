// No-op replacement for the reference's MapDrawer.cc (GL rendering via
// Pangolin, absent in this container).  Keeps the exact MapDrawer.h API the
// rest of the library calls (Tracking.cc:385,499,661 SetCurrentCameraPose)
// so the SLAM core builds and runs unchanged with bUseViewer=false.
// Baseline-measurement tooling only; not part of the TPU framework.
#include "MapDrawer.h"

namespace ORB_SLAM2 {

MapDrawer::MapDrawer(Map *pMap, const std::string & /*strSettingPath*/)
    : mpMap(pMap),
      mKeyFrameSize(0.05f),
      mKeyFrameLineWidth(1.0f),
      mGraphLineWidth(0.9f),
      mPointSize(2.0f),
      mCameraSize(0.08f),
      mCameraLineWidth(3.0f) {}

void MapDrawer::DrawMapPoints() {}

void MapDrawer::DrawKeyFrames(const bool, const bool) {}

void MapDrawer::DrawCurrentCamera(pangolin::OpenGlMatrix &) {}

void MapDrawer::SetCurrentCameraPose(const cv::Mat &Tcw) {
  std::unique_lock<std::mutex> lock(mMutexCamera);
  mCameraPose = Tcw.clone();
}

void MapDrawer::SetReferenceKeyFrame(KeyFrame *) {}

void MapDrawer::GetCurrentOpenGLCameraMatrix(pangolin::OpenGlMatrix &M) {
  M.SetIdentity();
}

}  // namespace ORB_SLAM2
