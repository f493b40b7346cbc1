// Native host-side IO kernels for beluga_tpu.
//
// The reference's runtime is C++ end to end; in this framework the compute
// plane is compiled XLA/TPU code, and the host-side per-scan hot path (the
// sensor adapter work done by beluga_ros::LaserScan /
// beluga_ros::Amcl::update, beluga_ros/src/amcl.cpp:54-63) is implemented
// natively here: polar->cartesian conversion with range filtering and
// sensor-frame transform, evenly-spaced beam decimation
// (views/take_evenly.hpp) and a fast PGM map decoder.  Exposed through
// ctypes (see beluga_tpu/io/native.py); a numpy fallback keeps the package
// dependency-free when no compiler is available.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Convert a laser scan (ranges + implicit angles) to 2D points in the base
// frame.  Mirrors BaseLaserScan::points_in_cartesian_coordinates
// (sensor/data/laser_scan.hpp:59-93) + the planar sensor-origin transform
// (beluga_ros/src/amcl.cpp:57-62).  Invalid beams (NaN/inf or outside
// [min_range, max_range]) get mask 0 and a zero point.
void scan_to_points(
    const float* ranges, int64_t n,
    float angle_min, float angle_increment,
    float min_range, float max_range,
    // sensor pose in the base frame (x, y, yaw)
    float sx, float sy, float syaw,
    float* out_xy, uint8_t* out_mask) {
  const float c = std::cos(syaw);
  const float s = std::sin(syaw);
  for (int64_t i = 0; i < n; ++i) {
    const float r = ranges[i];
    const bool ok = std::isfinite(r) && r >= min_range && r <= max_range;
    if (ok) {
      const float a = angle_min + static_cast<float>(i) * angle_increment;
      const float px = r * std::cos(a);
      const float py = r * std::sin(a);
      out_xy[2 * i] = c * px - s * py + sx;
      out_xy[2 * i + 1] = s * px + c * py + sy;
      out_mask[i] = 1;
    } else {
      out_xy[2 * i] = 0.0f;
      out_xy[2 * i + 1] = 0.0f;
      out_mask[i] = 0;
    }
  }
}

// Evenly-spaced decimation of n source slots into k destination slots.
// Reference semantics (views/take_evenly.hpp, pinned by
// test_take_evenly.cpp): index_j = ceil((n-1) * j / (k-1)); first and last
// elements are always included when k > 1.
void take_evenly_indices(int64_t n, int64_t k, int64_t* out_idx) {
  if (k <= 0 || n <= 0) return;
  if (k == 1 || n == 1) {
    for (int64_t j = 0; j < k; ++j) out_idx[j] = 0;
    return;
  }
  for (int64_t j = 0; j < k; ++j) {
    const int64_t num = (n - 1) * j;
    out_idx[j] = (num + k - 2) / (k - 1);  // ceil(num / (k-1))
  }
}

// Parse a binary P5 PGM header.  Returns the offset of the pixel data, or
// -1 on malformed input.  Width/height/maxval written through pointers.
int64_t parse_pgm_p5(
    const uint8_t* buf, int64_t len, int64_t* w, int64_t* h, int64_t* maxval) {
  int64_t pos = 0;
  auto skip_ws_comments = [&]() {
    while (pos < len) {
      const uint8_t ch = buf[pos];
      if (ch == '#') {
        while (pos < len && buf[pos] != '\n') ++pos;
      } else if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> int64_t {
    skip_ws_comments();
    int64_t v = 0;
    bool any = false;
    while (pos < len && buf[pos] >= '0' && buf[pos] <= '9') {
      v = v * 10 + (buf[pos] - '0');
      ++pos;
      any = true;
    }
    return any ? v : -1;
  };

  if (len < 2 || buf[0] != 'P' || buf[1] != '5') return -1;
  pos = 2;
  const int64_t ww = read_int();
  const int64_t hh = read_int();
  const int64_t mv = read_int();
  if (ww <= 0 || hh <= 0 || mv <= 0) return -1;
  ++pos;  // single whitespace after maxval
  if (pos + ww * hh > len) return -1;
  *w = ww;
  *h = hh;
  *maxval = mv;
  return pos;
}

// Threshold PGM intensities into ROS trinary occupancy (map_server rule),
// flipping vertically (PGM row 0 = top; grid row 0 = bottom).
void pgm_to_trinary(
    const uint8_t* pixels, int64_t w, int64_t h, int64_t maxval,
    float occupied_thresh, float free_thresh, int negate,
    int8_t* out /* h*w, row 0 = bottom */) {
  const float inv = 1.0f / static_cast<float>(maxval);
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* src = pixels + y * w;
    int8_t* dst = out + (h - 1 - y) * w;
    for (int64_t x = 0; x < w; ++x) {
      const float v = static_cast<float>(src[x]) * inv;
      const float p = negate ? v : 1.0f - v;
      dst[x] = p > occupied_thresh ? 100 : (p < free_thresh ? 0 : -1);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// rosbag2 CDR message decoding (XCDR1 little-endian, the rosbag2 default).
//
// The reference ships its system-test inputs as rosbag2 .db3 bagfiles
// (beluga_example/bags/; replayed by beluga_system_tests).  A bag is a
// sqlite3 database (read host-side in Python) whose message blobs are
// DDS-CDR serialized; these decoders parse the two message types the
// localization pipeline needs.  Layout: 4-byte encapsulation header
// {representation id/options}, then fields in declaration order, with
// primitives aligned to their size relative to the end of the header.
// ---------------------------------------------------------------------------

namespace {

struct CdrCursor {
  const uint8_t* buf;
  int64_t len;
  int64_t pos;  // absolute; alignment is relative to byte 4

  bool ok() const { return pos >= 0 && pos <= len; }
  void align(int64_t n) {
    if (pos < 0) return;  // failed cursors stay failed
    const int64_t rel = pos - 4;
    const int64_t rem = rel % n;
    if (rem) pos += n - rem;
  }
  template <typename T>
  T read() {
    align(sizeof(T));
    if (pos < 0 || pos + static_cast<int64_t>(sizeof(T)) > len) {
      pos = -1;
      return T{};
    }
    T v;
    std::memcpy(&v, buf + pos, sizeof(T));
    pos += sizeof(T);
    return v;
  }
  void skip_string() {
    const uint32_t n = read<uint32_t>();  // length including NUL
    if (pos < 0 || pos + static_cast<int64_t>(n) > len) {
      pos = -1;
      return;
    }
    pos += n;
  }
  void skip_header() {       // std_msgs/Header
    read<int32_t>();         // stamp.sec
    read<uint32_t>();        // stamp.nanosec
    skip_string();           // frame_id
  }
};

}  // namespace

extern "C" {

// Decode sensor_msgs/msg/LaserScan.  Writes up to max_ranges range values
// and the 6 scan parameters (angle_min, angle_max, angle_increment,
// scan_time, range_min, range_max).  Returns the number of ranges in the
// message (may exceed max_ranges; caller re-calls with a larger buffer),
// or -1 on malformed input.  Intensities are ignored.
int64_t decode_laserscan_cdr(
    const uint8_t* buf, int64_t len,
    float* params6, float* out_ranges, int64_t max_ranges) {
  if (len < 4 || buf[1] != 0x01) return -1;  // CDR_LE only
  CdrCursor c{buf, len, 4};
  c.skip_header();
  const float angle_min = c.read<float>();
  const float angle_max = c.read<float>();
  const float angle_increment = c.read<float>();
  c.read<float>();  // time_increment
  const float scan_time = c.read<float>();
  const float range_min = c.read<float>();
  const float range_max = c.read<float>();
  const uint32_t n = c.read<uint32_t>();
  if (!c.ok() || c.pos + static_cast<int64_t>(n) * 4 > len) return -1;
  const int64_t copy = n < static_cast<uint32_t>(max_ranges)
                           ? static_cast<int64_t>(n)
                           : max_ranges;
  std::memcpy(out_ranges, buf + c.pos, copy * sizeof(float));
  params6[0] = angle_min;
  params6[1] = angle_max;
  params6[2] = angle_increment;
  params6[3] = scan_time;
  params6[4] = range_min;
  params6[5] = range_max;
  return static_cast<int64_t>(n);
}

// Decode nav_msgs/msg/Odometry: writes (x, y, z, qx, qy, qz, qw) of
// pose.pose.  Returns 0, or -1 on malformed input.
int64_t decode_odometry_cdr(const uint8_t* buf, int64_t len, double* out7) {
  if (len < 4 || buf[1] != 0x01) return -1;
  CdrCursor c{buf, len, 4};
  c.skip_header();
  c.skip_string();  // child_frame_id
  for (int i = 0; i < 7; ++i) out7[i] = c.read<double>();
  return c.ok() ? 0 : -1;
}

// Decode the stamp (sec, nanosec) of any message starting with a Header.
int64_t decode_header_stamp_cdr(
    const uint8_t* buf, int64_t len, int64_t* sec, int64_t* nanosec) {
  if (len < 4 || buf[1] != 0x01) return -1;
  CdrCursor c{buf, len, 4};
  *sec = c.read<int32_t>();
  *nanosec = c.read<uint32_t>();
  return c.ok() ? 0 : -1;
}

}  // extern "C"
