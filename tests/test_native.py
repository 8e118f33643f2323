"""Tests for the native C++ components: UDP robot interface with safety
clamp (against a loopback robot simulator) and the threaded batch gather."""

import ctypes
import socket
import struct
import threading
import time

import numpy as np
import pytest

from daydreamer_tpu.native import load


def free_port():
  with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
    s.bind(('', 0))
    return s.getsockname()[1]


class LoopbackRobot(threading.Thread):
  """Python UDP endpoint speaking the framework's A1 wire format: echoes
  an observation for every received command, reporting the commanded
  positions back as joint positions."""

  def __init__(self, port, reply_port):
    super().__init__(daemon=True)
    self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    self.sock.bind(('127.0.0.1', port))
    self.sock.settimeout(2.0)
    self.reply = ('127.0.0.1', reply_port)
    self.commands = []
    self.running = True

  def run(self):
    while self.running:
      try:
        data, addr = self.sock.recvfrom(2048)
      except socket.timeout:
        return
      tag, = struct.unpack('<I', data[:4])
      assert tag == 0x43314131  # 'C1A1'
      cmd = np.frombuffer(data[4:], np.float32).reshape(12, 5)
      self.commands.append(cmd.copy())
      obs = np.zeros(50, np.float32)
      obs[:12] = cmd[:, 0]  # Echo commanded positions as joint positions.
      obs[36] = 1.0  # Unit quaternion w.
      packet = struct.pack('<I', 0x4F314131) + obs.tobytes()
      self.sock.sendto(packet, self.reply)


class TestRobotInterface:

  def test_roundtrip_and_safety_clamp(self):
    lib = load('robot_interface')
    local = free_port()
    remote = free_port()
    robot = LoopbackRobot(remote, local)
    robot.start()
    handle = lib.a1_create(b'127.0.0.1', local, remote, 500)
    assert handle
    # Command with out-of-limit positions and torques.
    cmd = np.zeros((12, 5), np.float32)
    cmd[:, 0] = 10.0   # Far beyond joint limits.
    cmd[:, 4] = 100.0  # Beyond torque limit.
    buf = (ctypes.c_float * 60)(*cmd.reshape(-1))
    assert lib.a1_send_command(handle, buf) > 0
    obs = (ctypes.c_float * 50)()
    ret = lib.a1_receive_observation(handle, obs)
    assert ret == 1
    received = np.ctypeslib.as_array(obs)
    # The robot saw CLAMPED positions: hip <= 0.802, thigh <= 4.19.
    assert received[0] <= 0.81
    assert received[1] <= 4.20
    time.sleep(0.1)
    assert len(robot.commands) == 1
    sent_cmd = robot.commands[0]
    assert (np.abs(sent_cmd[:, 4]) <= 33.6).all()  # Torque clamped.
    sent = ctypes.c_uint64()
    recv = ctypes.c_uint64()
    clamped = ctypes.c_uint64()
    lib.a1_stats(handle, ctypes.byref(sent), ctypes.byref(recv),
                 ctypes.byref(clamped))
    assert sent.value == 1 and recv.value == 1 and clamped.value > 0
    lib.a1_destroy(handle)
    robot.running = False

  def test_nonfinite_commands_neutralized(self):
    lib = load('robot_interface')
    local = free_port()
    remote = free_port()
    handle = lib.a1_create(b'127.0.0.1', local, remote, 50)
    cmd = np.zeros((12, 5), np.float32)
    cmd[0, 0] = np.nan
    cmd[0, 2] = 50.0
    cmd[0, 4] = 10.0
    buf = (ctypes.c_float * 60)(*cmd.reshape(-1))
    lib.a1_safety_clamp(handle, buf)
    out = np.ctypeslib.as_array(buf).reshape(12, 5)
    assert out[0, 2] == 0.0  # kp zeroed for non-finite command.
    assert out[0, 4] == 0.0  # torque zeroed.
    lib.a1_destroy(handle)

  def test_receive_timeout(self):
    lib = load('robot_interface')
    handle = lib.a1_create(b'127.0.0.1', free_port(), free_port(), 50)
    obs = (ctypes.c_float * 50)()
    assert lib.a1_receive_observation(handle, obs) == 0  # Timeout.
    lib.a1_destroy(handle)


class TestFastCopy:

  def test_gather_matches_numpy(self):
    lib = load('fastcopy')
    rng = np.random.RandomState(0)
    sources = [np.ascontiguousarray(rng.rand(16, 7).astype(np.float32))
               for _ in range(8)]
    out = np.empty((8, 4, 7), np.float32)
    srcs, offs, sizes = [], [], []
    starts = [rng.randint(0, 12) for _ in range(8)]
    row = 4 * 7 * 4
    for i, (src, start) in enumerate(zip(sources, starts)):
      window = src[start:start + 4]
      srcs.append(window.ctypes.data)
      offs.append(out.ctypes.data + i * row)
      sizes.append(row)
    n = len(srcs)
    lib.fast_gather(
        (ctypes.c_char_p * n)(*[ctypes.cast(s, ctypes.c_char_p)
                                for s in srcs]),
        (ctypes.c_int64 * n)(*offs),
        (ctypes.c_int64 * n)(*sizes),
        n, ctypes.c_char_p(0), 4)
    expected = np.stack(
        [src[start:start + 4] for src, start in zip(sources, starts)])
    assert np.array_equal(out, expected)


class TestNativeBatcher:

  def test_batches_match_store(self):
    from daydreamer_tpu import replay as replaylib
    from daydreamer_tpu.replay.batcher import NativeBatcher
    store = replaylib.RAMStore()
    replay = replaylib.FixedLength(store, chunk=4)
    for _ in range(3):
      for t in range(10):
        replay.add({
            'action': np.full(2, t, np.float32),
            'reward': np.float32(t),
            'is_first': t == 0,
            'is_last': t == 9,
            'is_terminal': False,
        })
    batcher = NativeBatcher(replay, batch_size=6)
    batch = next(batcher)
    assert batch['action'].shape == (6, 4, 2)
    assert batch['is_first'][:, 0].all()
    # Rows must be consistent windows: action[t] == reward[t].
    assert np.array_equal(
        batch['action'][..., 0], batch['reward'])


class TestQPSolver:

  def test_unconstrained_solution(self):
    from daydreamer_tpu.native.qp import solve_box_qp
    P = np.diag([2.0, 4.0])
    q = np.array([-2.0, -8.0])
    x, iters = solve_box_qp(P, q, [-10, -10], [10, 10])
    # Minimum of 0.5 x'Px + q'x at P^-1 (-q) = [1, 2].
    assert np.allclose(x, [1.0, 2.0], atol=1e-3), x

  def test_active_box_constraint(self):
    from daydreamer_tpu.native.qp import solve_box_qp
    P = np.eye(3)
    q = np.array([-5.0, 0.0, 5.0])
    x, iters = solve_box_qp(P, q, [-1, -1, -1], [1, 1, 1])
    assert np.allclose(x, [1.0, 0.0, -1.0], atol=1e-3), x

  def test_coupled_problem_matches_projection(self):
    from daydreamer_tpu.native.qp import solve_box_qp
    rng = np.random.RandomState(0)
    A = rng.randn(5, 5)
    P = A @ A.T + np.eye(5)
    q = rng.randn(5)
    x, iters = solve_box_qp(P, q, [-0.5] * 5, [0.5] * 5)
    # KKT check: gradient must point outward only at active bounds.
    grad = P @ x + q
    for i in range(5):
      if abs(x[i]) < 0.499:
        assert abs(grad[i]) < 1e-2, (i, grad[i])


# ---- Unitree vendor wire format (comm.h byte-exact parity) ------------------

LOWCMD_SIZE = 730
LOWSTATE_SIZE = 891


def crc32_core(words):
  """Reference implementation of the vendor CRC (public Unitree examples)."""
  crc = 0xFFFFFFFF
  poly = 0x04C11DB7
  for data in words:
    xbit = 1 << 31
    for _ in range(32):
      if crc & 0x80000000:
        crc = ((crc << 1) & 0xFFFFFFFF) ^ poly
      else:
        crc = (crc << 1) & 0xFFFFFFFF
      if data & xbit:
        crc ^= poly
      xbit >>= 1
  return crc


def expected_lowcmd_bytes(cmd):
  """Build the vendor LowCmd packet independently from the struct layout
  in the vendor header (comm.h:61-99, #pragma pack(1))."""
  out = bytearray()
  out += struct.pack('<BHHIB', 0xFF, 0, 0, 0, 0)  # header, levelFlag=LOWLEVEL
  for m in range(20):
    if m < 12:
      q, dq, kp, kd, tau = cmd[m]
    else:
      q, dq, kp, kd, tau = 2.146e9, 16000.0, 0.0, 0.0, 0.0  # Pos/VelStopF
    # MotorCmd: mode u8, q f32, dq f32, tau f32, Kp f32, Kd f32, u32[3]
    out += struct.pack('<Bfffff', 0x0A, q, dq, tau, kp, kd)
    out += b'\x00' * 12
  out += b'\x00' * 12  # led[4] * 3 bytes
  out += b'\x00' * 40  # wirelessRemote
  out += b'\x00' * 4   # reserve
  words = struct.unpack(f'<{(LOWCMD_SIZE >> 2) - 1}I',
                        bytes(out[:((LOWCMD_SIZE >> 2) - 1) * 4]))
  out += struct.pack('<I', crc32_core(words))
  assert len(out) == LOWCMD_SIZE
  return bytes(out)


class TestVendorWire:

  def test_lowcmd_bytes_match_vendor_struct(self):
    """Packet bytes for a known command match an independently constructed
    vendor LowCmd (VERDICT item 9 'done' criterion)."""
    lib = load('robot_interface')
    cmd = np.zeros((12, 5), np.float32)
    cmd[:, 0] = np.array([0.0, 0.9, -1.8] * 4, np.float32)  # standing pose
    cmd[:, 2] = 60.0  # kp
    cmd[:, 3] = 0.8   # kd
    cmd[3, 4] = 2.5   # some torque
    buf = (ctypes.c_float * 60)(*cmd.reshape(-1))
    packet = ctypes.create_string_buffer(LOWCMD_SIZE)
    n = lib.a1_pack_lowcmd(buf, packet)
    assert n == LOWCMD_SIZE
    expected = expected_lowcmd_bytes(cmd)
    assert packet.raw == expected

  def test_lowstate_roundtrip_and_crc(self):
    lib = load('robot_interface')
    obs = np.arange(50, dtype=np.float32) / 10.0
    obs[46:50] = np.array([10, 20, 30, 40], np.float32)  # int16 foot force
    packet = ctypes.create_string_buffer(LOWSTATE_SIZE)
    assert lib.a1_pack_lowstate(
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        packet) == LOWSTATE_SIZE
    parsed = (ctypes.c_float * 50)()
    assert lib.a1_parse_lowstate(packet, LOWSTATE_SIZE, parsed) == 1
    np.testing.assert_allclose(np.ctypeslib.as_array(parsed), obs, rtol=1e-6)
    # Corrupt one byte -> CRC must reject.
    bad = bytearray(packet.raw)
    bad[100] ^= 0xFF
    assert lib.a1_parse_lowstate(bytes(bad), LOWSTATE_SIZE, parsed) == -1

  def test_vendor_udp_loopback(self):
    """End-to-end vendor-mode UDP: send LowCmd, robot-sim replies with a
    LowState echoing commanded joint positions."""
    lib = load('robot_interface')
    local, remote = free_port(), free_port()
    done = []
    bound = threading.Event()

    def robot_sim():
      sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
      sock.bind(('127.0.0.1', remote))
      sock.settimeout(8.0)
      bound.set()
      data, _ = sock.recvfrom(4096)
      assert len(data) == LOWCMD_SIZE
      assert data[0] == 0xFF  # LOWLEVEL
      # Parse q of the first 12 motors out of the packed MotorCmd array.
      qs = []
      for m in range(12):
        off = 10 + m * 33 + 1
        qs.append(struct.unpack('<f', data[off:off + 4])[0])
      obs = np.zeros(50, np.float32)
      obs[:12] = qs
      obs[36] = 1.0
      reply = ctypes.create_string_buffer(LOWSTATE_SIZE)
      lib.a1_pack_lowstate(
          obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), reply)
      sock.sendto(reply.raw, ('127.0.0.1', local))
      sock.close()
      done.append(qs)

    thread = threading.Thread(target=robot_sim, daemon=True)
    thread.start()
    # UDP is fire-and-forget: the sim socket must be bound before the
    # command goes out or the packet is silently dropped (flaky under a
    # loaded scheduler).
    assert bound.wait(timeout=8.0)
    handle = lib.a1_create_wire(b'127.0.0.1', local, remote, 4000, 1)
    cmd = np.zeros((12, 5), np.float32)
    cmd[:, 0] = np.array([0.0, 0.9, -1.8] * 4, np.float32)
    buf = (ctypes.c_float * 60)(*cmd.reshape(-1))
    assert lib.a1_send_command(handle, buf) == LOWCMD_SIZE
    out = (ctypes.c_float * 50)()
    assert lib.a1_receive_observation(handle, out) == 1
    np.testing.assert_allclose(
        np.ctypeslib.as_array(out)[:12], cmd[:, 0], rtol=1e-6)
    lib.a1_destroy(handle)
    thread.join(timeout=2)
    assert done


class TestGeneralQP:
  """Linearly-constrained ADMM QP (the OSQP problem class backing the
  reference's MPC formulations)."""

  def test_equality_constrained_matches_kkt(self):
    from daydreamer_tpu.native.qp import solve_qp
    rng = np.random.default_rng(0)
    n, m = 6, 3
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    x, iters = solve_qp(P, q, A, b, b)  # lo == hi: equality rows.
    # Analytic KKT solution.
    kkt = np.block([[P, A.T], [A, np.zeros((m, m))]])
    sol = np.linalg.solve(kkt, np.concatenate([-q, b]))
    np.testing.assert_allclose(x, sol[:n], atol=1e-4)
    np.testing.assert_allclose(A @ x, b, atol=1e-5)

  def test_inequality_active_set(self):
    from daydreamer_tpu.native.qp import solve_qp
    # min (x0-2)^2 + (x1-2)^2  s.t. x0 + x1 <= 1: optimum (0.5, 0.5).
    P = 2 * np.eye(2)
    q = np.array([-4.0, -4.0])
    A = np.array([[1.0, 1.0]])
    x, _ = solve_qp(P, q, A, [-1e20], [1.0])
    np.testing.assert_allclose(x, [0.5, 0.5], atol=1e-4)

  def test_friction_pyramid_stance(self):
    """Whole-body stance allocation under the true friction pyramid:
    supports the weight, obeys |f_t| <= mu*f_z row-wise."""
    import examples.whole_body_controller as wbc
    desired = np.array([30.0, 0.0, wbc.MASS * wbc.GRAVITY, 0.0, 0.0, 0.0])
    forces, iters, residual = wbc.stance_force_qp(desired)
    assert np.abs(residual[:3]).max() < 1.0, residual
    for f in forces:
      assert f[2] >= -1e-6
      assert abs(f[0]) <= wbc.MU * f[2] + 1e-5, f
      assert abs(f[1]) <= wbc.MU * f[2] + 1e-5, f
    assert forces[:, 2].sum() == pytest.approx(
        wbc.MASS * wbc.GRAVITY, rel=0.02)
