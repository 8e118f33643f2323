// A1 robot interface: UDP transport + safety clamp, C ABI for ctypes.
//
// TPU-native counterpart of the reference's pybind11 robot_interface
// (reference: third_party/unitree_legged_sdk/python_interface.cpp:17-100):
// same ReceiveObservation/SendCommand surface (12 motors x 5 command
// params = 60 floats; low-state observation vector) over UDP, with a
// C++-side safety layer that clamps joint position targets, gains, and
// torques to hardware limits before anything reaches the wire.
//
// The wire format here is the framework's own little-endian float packet
// (the vendor SDK's proprietary format requires their binary library); a
// robot-side bridge or the loopback simulator in tests speaks the same
// format. Packet layouts:
//   command:     tag 'C1A1' + 60 f32 (q, dq, kp, kd, tau) x 12 motors
//   observation: tag 'O1A1' + 50 f32
//     [q[12], dq[12], tau_est[12], quat[4], gyro[3], accel[3], foot[4]]
//
// Build: g++ -O2 -shared -fPIC -o librobot_interface.so robot_interface.cpp

#include <arpa/inet.h>
#include <cstdint>
#include <cstring>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

#include <algorithm>
#include <cmath>

namespace {

constexpr int kNumMotors = 12;
constexpr int kCmdFloats = 60;   // 5 per motor.
constexpr int kObsFloats = 50;
constexpr uint32_t kCmdTag = 0x43314131;  // 'C1A1'
constexpr uint32_t kObsTag = 0x4F314131;  // 'O1A1'

// Public A1 joint limits (hip, thigh, calf) repeated per leg, radians.
constexpr float kPosLow[3] = {-0.802f, -1.05f, -2.70f};
constexpr float kPosHigh[3] = {0.802f, 4.19f, -0.916f};
constexpr float kMaxTorque = 33.5f;   // Nm, A1 motor peak.
constexpr float kMaxVelocity = 21.0f; // rad/s.
constexpr float kMaxKp = 100.0f;
constexpr float kMaxKd = 8.0f;

struct Handle {
  int fd = -1;
  sockaddr_in remote{};
  float power_protect = 1.0f;  // Fraction of torque limit allowed.
  uint64_t sent = 0;
  uint64_t received = 0;
  uint64_t clamped = 0;
};

float clampf(float v, float lo, float hi) {
  return std::max(lo, std::min(hi, v));
}

}  // namespace

extern "C" {

// Create a UDP endpoint bound to local_port, targeting ip:remote_port.
void* a1_create(const char* ip, int local_port, int remote_port,
                int recv_timeout_ms) {
  Handle* h = new Handle();
  h->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (h->fd < 0) {
    delete h;
    return nullptr;
  }
  int reuse = 1;
  setsockopt(h->fd, SOL_SOCKET, SO_REUSEADDR, &reuse, sizeof(reuse));
  timeval tv{};
  tv.tv_sec = recv_timeout_ms / 1000;
  tv.tv_usec = (recv_timeout_ms % 1000) * 1000;
  setsockopt(h->fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  sockaddr_in local{};
  local.sin_family = AF_INET;
  local.sin_addr.s_addr = INADDR_ANY;
  local.sin_port = htons(static_cast<uint16_t>(local_port));
  if (bind(h->fd, reinterpret_cast<sockaddr*>(&local), sizeof(local)) < 0) {
    close(h->fd);
    delete h;
    return nullptr;
  }
  h->remote.sin_family = AF_INET;
  h->remote.sin_port = htons(static_cast<uint16_t>(remote_port));
  inet_pton(AF_INET, ip, &h->remote.sin_addr);
  return h;
}

void a1_set_power_protect(void* handle, float fraction) {
  Handle* h = static_cast<Handle*>(handle);
  h->power_protect = clampf(fraction, 0.0f, 1.0f);
}

// Safety clamp (in place): position targets to joint limits, gains and
// torques to hardware bounds scaled by the power-protect level.
void a1_safety_clamp(void* handle, float* cmd) {
  Handle* h = static_cast<Handle*>(handle);
  for (int m = 0; m < kNumMotors; ++m) {
    float* c = cmd + 5 * m;
    // Reject non-finite commands outright: freeze the motor (zero gains
    // and torque) instead of letting NaNs reach the clamp (where IEEE
    // comparisons would silently turn them into limit values).
    bool finite = true;
    for (int i = 0; i < 5; ++i) {
      if (!std::isfinite(c[i])) finite = false;
    }
    if (!finite) {
      const int joint = m % 3;
      c[0] = clampf(std::isfinite(c[0]) ? c[0] : 0.0f,
                    kPosLow[joint], kPosHigh[joint]);
      c[1] = 0.0f;
      c[2] = 0.0f;
      c[3] = 0.0f;
      c[4] = 0.0f;
      h->clamped += 1;
      continue;
    }
    const int joint = m % 3;
    const float q = clampf(c[0], kPosLow[joint], kPosHigh[joint]);
    const float dq = clampf(c[1], -kMaxVelocity, kMaxVelocity);
    const float kp = clampf(c[2], 0.0f, kMaxKp);
    const float kd = clampf(c[3], 0.0f, kMaxKd);
    const float tmax = kMaxTorque * h->power_protect;
    const float tau = clampf(c[4], -tmax, tmax);
    if (q != c[0] || tau != c[4]) {
      h->clamped += 1;
    }
    c[0] = q;
    c[1] = dq;
    c[2] = kp;
    c[3] = kd;
    c[4] = tau;
  }
}

// Clamp and send one 60-float command packet. Returns bytes sent or -1.
int a1_send_command(void* handle, float* cmd) {
  Handle* h = static_cast<Handle*>(handle);
  a1_safety_clamp(handle, cmd);
  char packet[4 + kCmdFloats * sizeof(float)];
  uint32_t tag = kCmdTag;
  std::memcpy(packet, &tag, 4);
  std::memcpy(packet + 4, cmd, kCmdFloats * sizeof(float));
  ssize_t n = sendto(
      h->fd, packet, sizeof(packet), 0,
      reinterpret_cast<sockaddr*>(&h->remote), sizeof(h->remote));
  if (n > 0) h->sent += 1;
  return static_cast<int>(n);
}

// Blocking receive of one 50-float observation. Returns 1 on success,
// 0 on timeout, -1 on error or malformed packet.
int a1_receive_observation(void* handle, float* obs) {
  Handle* h = static_cast<Handle*>(handle);
  char packet[4 + kObsFloats * sizeof(float)];
  ssize_t n = recv(h->fd, packet, sizeof(packet), 0);
  if (n < 0) {
    return 0;  // Timeout.
  }
  if (n != static_cast<ssize_t>(sizeof(packet))) {
    return -1;
  }
  uint32_t tag = 0;
  std::memcpy(&tag, packet, 4);
  if (tag != kObsTag) {
    return -1;
  }
  std::memcpy(obs, packet + 4, kObsFloats * sizeof(float));
  h->received += 1;
  return 1;
}

void a1_stats(void* handle, uint64_t* sent, uint64_t* received,
              uint64_t* clamped) {
  Handle* h = static_cast<Handle*>(handle);
  *sent = h->sent;
  *received = h->received;
  *clamped = h->clamped;
}

void a1_destroy(void* handle) {
  Handle* h = static_cast<Handle*>(handle);
  if (h->fd >= 0) close(h->fd);
  delete h;
}

}  // extern "C"
