// Native EuRoC dataset loader with background decode prefetching.
//
// Plays the role of the reference's DatasetReader
// (okvis_multisensor_processing/src/DatasetReader.cpp: CSV parsing,
// image IO, its own streaming thread) for the TPU pipeline: CSV index
// parsing, camera sync-grouping with a timestamp tolerance, grayscale
// PNG decode via OpenCV imgcodecs, and an N-frames-ahead prefetcher
// built on the ThreadsafeQueue — all off the Python GIL, so host image
// IO overlaps device compute.
//
// Exposed as a C API consumed by okvis2_tpu/pipeline/native_loader.py
// via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "threadsafe_queue.hpp"

namespace {

struct ImuSample {
  double t;
  double gyr[3];
  double acc[3];
};

struct FrameEntry {
  double t;
  std::vector<std::string> paths;  // one per camera
};

struct DecodedFrame {
  int index = -1;
  double t = 0;
  std::vector<cv::Mat> images;  // CV_32F grayscale [0,1]
};

struct Dataset {
  std::vector<ImuSample> imu;
  std::vector<FrameEntry> frames;
  int num_cams = 0;
  int width = 0, height = 0;

  // prefetcher
  std::unique_ptr<okvis2tpu::ThreadsafeQueue<DecodedFrame>> queue;
  std::thread worker;
  std::atomic<bool> stop{false};
  int next_index = 0;
};

static bool ParseImuCsv(const std::string& path, std::vector<ImuSample>* out) {
  std::ifstream f(path);
  if (!f.is_open()) return false;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::replace(line.begin(), line.end(), ',', ' ');
    std::istringstream ss(line);
    long long ts;
    ImuSample s;
    if (!(ss >> ts >> s.gyr[0] >> s.gyr[1] >> s.gyr[2] >> s.acc[0] >>
          s.acc[1] >> s.acc[2]))
      continue;
    s.t = static_cast<double>(ts) * 1e-9;
    out->push_back(s);
  }
  return true;
}

static bool ParseCamCsv(const std::string& dir,
                        std::vector<std::pair<double, std::string>>* out) {
  std::ifstream f(dir + "/data.csv");
  if (!f.is_open()) return false;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::replace(line.begin(), line.end(), ',', ' ');
    std::istringstream ss(line);
    long long ts;
    std::string name;
    if (!(ss >> ts >> name)) continue;
    out->emplace_back(static_cast<double>(ts) * 1e-9, dir + "/data/" + name);
  }
  return true;
}

static void DecodeInto(const FrameEntry& e, int index, DecodedFrame* out) {
  out->index = index;
  out->t = e.t;
  out->images.clear();
  for (const auto& p : e.paths) {
    cv::Mat img = cv::imread(p, cv::IMREAD_GRAYSCALE);
    cv::Mat f32;
    if (!img.empty()) img.convertTo(f32, CV_32F, 1.0 / 255.0);
    out->images.push_back(f32);
  }
}

static void PrefetchLoop(Dataset* ds) {
  for (int i = 0; i < static_cast<int>(ds->frames.size()); ++i) {
    if (ds->stop.load()) break;
    DecodedFrame fr;
    DecodeInto(ds->frames[i], i, &fr);
    if (!ds->queue->PushBlockingIfFull(std::move(fr))) break;
  }
}

}  // namespace

extern "C" {

void* euroc_open(const char* path, int num_cams, double sync_tol) {
  auto ds = std::make_unique<Dataset>();
  ds->num_cams = num_cams;
  std::string root = std::string(path) + "/mav0";
  if (!ParseImuCsv(root + "/imu0/data.csv", &ds->imu)) return nullptr;

  std::vector<std::vector<std::pair<double, std::string>>> cams(num_cams);
  for (int c = 0; c < num_cams; ++c) {
    if (!ParseCamCsv(root + "/cam" + std::to_string(c), &cams[c]))
      return nullptr;
  }
  // sync: cam0 is master, pick nearest within tolerance from others
  std::vector<size_t> ptr(num_cams, 0);
  for (const auto& [t0, p0] : cams[0]) {
    FrameEntry e;
    e.t = t0;
    e.paths.push_back(p0);
    bool ok = true;
    for (int c = 1; c < num_cams; ++c) {
      auto& cc = cams[c];
      while (ptr[c] + 1 < cc.size() &&
             std::abs(cc[ptr[c] + 1].first - t0) <=
                 std::abs(cc[ptr[c]].first - t0))
        ++ptr[c];
      if (ptr[c] >= cc.size() ||
          std::abs(cc[ptr[c]].first - t0) > sync_tol) {
        ok = false;
        break;
      }
      e.paths.push_back(cc[ptr[c]].second);
    }
    if (ok) ds->frames.push_back(std::move(e));
  }
  if (!ds->frames.empty()) {
    cv::Mat probe = cv::imread(ds->frames[0].paths[0], cv::IMREAD_GRAYSCALE);
    if (!probe.empty()) {
      ds->width = probe.cols;
      ds->height = probe.rows;
    }
  }
  return ds.release();
}

void euroc_close(void* h) {
  auto* ds = static_cast<Dataset*>(h);
  if (!ds) return;
  ds->stop.store(true);
  if (ds->queue) ds->queue->Shutdown();
  if (ds->worker.joinable()) ds->worker.join();
  delete ds;
}

int euroc_num_frames(void* h) {
  return static_cast<int>(static_cast<Dataset*>(h)->frames.size());
}
int euroc_num_imu(void* h) {
  return static_cast<int>(static_cast<Dataset*>(h)->imu.size());
}
int euroc_width(void* h) { return static_cast<Dataset*>(h)->width; }
int euroc_height(void* h) { return static_cast<Dataset*>(h)->height; }

// copy all IMU samples: t[n], gyr[n*3], acc[n*3]
void euroc_imu_data(void* h, double* t, double* gyr, double* acc) {
  auto* ds = static_cast<Dataset*>(h);
  for (size_t i = 0; i < ds->imu.size(); ++i) {
    t[i] = ds->imu[i].t;
    std::memcpy(gyr + 3 * i, ds->imu[i].gyr, 3 * sizeof(double));
    std::memcpy(acc + 3 * i, ds->imu[i].acc, 3 * sizeof(double));
  }
}

double euroc_frame_time(void* h, int idx) {
  return static_cast<Dataset*>(h)->frames[idx].t;
}

// synchronous decode of frame idx into out [num_cams * H * W] float32
int euroc_read_frame(void* h, int idx, float* out) {
  auto* ds = static_cast<Dataset*>(h);
  if (idx < 0 || idx >= static_cast<int>(ds->frames.size())) return -1;
  DecodedFrame fr;
  DecodeInto(ds->frames[idx], idx, &fr);
  size_t hw = static_cast<size_t>(ds->width) * ds->height;
  for (int c = 0; c < ds->num_cams; ++c) {
    const cv::Mat& m = fr.images[c];
    if (m.empty() || m.cols != ds->width || m.rows != ds->height) return -2;
    std::memcpy(out + c * hw, m.ptr<float>(0), hw * sizeof(float));
  }
  return 0;
}

// start background prefetching with `ahead` decoded frames buffered
void euroc_prefetch_start(void* h, int ahead) {
  auto* ds = static_cast<Dataset*>(h);
  if (ds->worker.joinable()) return;
  ds->queue = std::make_unique<okvis2tpu::ThreadsafeQueue<DecodedFrame>>(
      static_cast<size_t>(ahead > 0 ? ahead : 4));
  ds->stop.store(false);
  ds->worker = std::thread(PrefetchLoop, ds);
}

// pop the next prefetched frame (blocking). Returns frame index or -1.
int euroc_prefetch_next(void* h, double* t, float* out) {
  auto* ds = static_cast<Dataset*>(h);
  if (!ds->queue) return -1;
  DecodedFrame fr;
  if (!ds->queue->PopBlocking(&fr)) return -1;
  *t = fr.t;
  size_t hw = static_cast<size_t>(ds->width) * ds->height;
  for (int c = 0; c < ds->num_cams; ++c) {
    const cv::Mat& m = fr.images[c];
    if (m.empty() || m.cols != ds->width || m.rows != ds->height) return -2;
    std::memcpy(out + c * hw, m.ptr<float>(0), hw * sizeof(float));
  }
  return fr.index;
}

}  // extern "C"
