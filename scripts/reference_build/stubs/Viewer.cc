// No-op replacement for the reference's Viewer.cc (Pangolin GUI loop).
// The examples are patched to construct System with bUseViewer=false, so a
// Viewer is never instantiated; this stub only satisfies the linker.
// Baseline-measurement tooling only; not part of the TPU framework.
#include "Viewer.h"

namespace ORB_SLAM2 {

Viewer::Viewer(System *pSystem, FrameDrawer *pFrameDrawer,
               MapDrawer *pMapDrawer, Tracking *pTracking,
               const std::string & /*strSettingPath*/)
    : mpSystem(pSystem),
      mpFrameDrawer(pFrameDrawer),
      mpMapDrawer(pMapDrawer),
      mpTracker(pTracking),
      mT(33.0),
      mImageWidth(640),
      mImageHeight(480),
      mDisplayImageWidth(640),
      mDisplayImageScale(1.0f),
      mViewpointX(0),
      mViewpointY(-0.7f),
      mViewpointZ(-1.8f),
      mViewpointF(500),
      mbFinishRequested(false),
      mbFinished(true),
      mbStopped(true),
      mbStopRequested(false) {}

void Viewer::Run() { SetFinish(); }

void Viewer::RequestFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  mbFinishRequested = true;
}

bool Viewer::CheckFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  return mbFinishRequested;
}

void Viewer::SetFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  mbFinished = true;
}

bool Viewer::isFinished() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  return mbFinished;
}

void Viewer::RequestStop() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  if (!mbStopped) mbStopRequested = true;
}

bool Viewer::isStopped() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  return mbStopped;
}

bool Viewer::Stop() { return false; }

void Viewer::Release() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  mbStopped = false;
}

void Viewer::SetDisplayImageWidth(int displayImageWidth) {
  mDisplayImageWidth = displayImageWidth;
}

}  // namespace ORB_SLAM2
